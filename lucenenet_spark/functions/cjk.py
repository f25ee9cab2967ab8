"""CJKAnalyzer components: width folding + the bigram stream stage.

Reference chain (Analysis/Cjk/CJKAnalyzer.cs CreateComponents, 4.8):
StandardTokenizer -> CJKWidthFilter -> LowerCase -> CJKBigramFilter
(default flags HAN|HIRAGANA|KATAKANA|HANGUL, outputUnigrams=false) ->
StopFilter (an English-ish stop list).

Mapping onto this engine's tokenizer: CJKBigramFilter only chains
codepoints across tokens whose offsets are ADJACENT (IncrementToken's
`StartOffset != lastEndOffset` check clears the buffer), so the
reference's bigram buffers are exactly the maximal contiguous runs of
flagged-script characters — which is precisely what one letter-run token
of this engine's tokenizer contains. The bigram stage therefore runs as
a per-token STREAM EXPANSION (cjk_expand): each token splits into
maximal flagged-CJK segments and non-CJK remainders; a flagged segment
of n >= 2 chars emits its n-1 bigrams, a lone flagged char emits a
unigram, and non-CJK remainders pass through as their own tokens. Each
emitted token occupies one position slot (the reference's bigrams carry
posIncrement 1 and an n-char run spans n-1 positions).

Script classes are the BMP blocks of the StandardTokenizer token types:
Han (CJK Unified + ext A + compatibility), Hiragana, Katakana (including
the prolonged-sound mark), Hangul syllables. Supplementary-plane
ideographs and jamo are out of scope (documented).
"""
from __future__ import annotations

# CJKWidthFilter.cs KANA_NORM: halfwidth katakana FF65-FF9F -> fullwidth
_KANA_NORM = [
    0x30FB, 0x30F2, 0x30A1, 0x30A3, 0x30A5, 0x30A7, 0x30A9, 0x30E3, 0x30E5,
    0x30E7, 0x30C3, 0x30FC, 0x30A2, 0x30A4, 0x30A6, 0x30A8, 0x30AA, 0x30AB,
    0x30AD, 0x30AF, 0x30B1, 0x30B3, 0x30B5, 0x30B7, 0x30B9, 0x30BB, 0x30BD,
    0x30BF, 0x30C1, 0x30C4, 0x30C6, 0x30C8, 0x30CA, 0x30CB, 0x30CC, 0x30CD,
    0x30CE, 0x30CF, 0x30D2, 0x30D5, 0x30D8, 0x30DB, 0x30DE, 0x30DF, 0x30E0,
    0x30E1, 0x30E2, 0x30E4, 0x30E6, 0x30E8, 0x30E9, 0x30EA, 0x30EB, 0x30EC,
    0x30ED, 0x30EF, 0x30F3, 0x3099, 0x309A,
]

# CJKWidthFilter.cs kana combining diffs over 0x30A6-0x30FD
_KANA_COMBINE_VOICED = [
    78, 0, 0, 0, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1,
    0, 1, 0, 1, 0, 0, 1, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 1, 0, 0, 1, 0, 0, 1,
    0, 0, 1, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 8, 8, 8, 8, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1,
]
_KANA_COMBINE_HALF_VOICED = [
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 2, 0, 0, 2, 0, 0, 2,
    0, 0, 2, 0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
]


def cjk_width(token: str) -> str:
    """CJKWidthFilter.cs: fullwidth ASCII -> halfwidth; halfwidth katakana
    -> fullwidth, with the FF9E/FF9F voice marks combined into the
    preceding kana when a composed form exists."""
    out: list[str] = []
    for ch in token:
        cp = ord(ch)
        if 0xFF01 <= cp <= 0xFF5E:
            out.append(chr(cp - 0xFEE0))
        elif 0xFF65 <= cp <= 0xFF9F:
            if cp in (0xFF9E, 0xFF9F) and out:
                prev = ord(out[-1])
                if 0x30A6 <= prev <= 0x30FD:
                    diff = (
                        _KANA_COMBINE_HALF_VOICED[prev - 0x30A6]
                        if cp == 0xFF9F
                        else _KANA_COMBINE_VOICED[prev - 0x30A6]
                    )
                    if diff:
                        out[-1] = chr(prev + diff)
                        continue
            out.append(chr(_KANA_NORM[cp - 0xFF65]))
        else:
            out.append(ch)
    return "".join(out)


def _is_cjk(ch: str) -> bool:
    cp = ord(ch)
    return (
        0x4E00 <= cp <= 0x9FFF      # CJK Unified Ideographs (Han)
        or 0x3400 <= cp <= 0x4DBF   # Han extension A
        or 0xF900 <= cp <= 0xFAFF   # Han compatibility
        or 0x3041 <= cp <= 0x3096   # Hiragana
        or 0x30A1 <= cp <= 0x30FA   # Katakana
        or cp == 0x30FC             # prolonged sound mark (Katakana WB)
        or 0xAC00 <= cp <= 0xD7A3   # Hangul syllables
    )


def cjk_expand(token: str) -> list[str]:
    """CJKBigramFilter.cs over one offset-contiguous token: flagged-script
    segments emit their bigrams (or a lone unigram); non-CJK remainders
    pass through. Every emitted token occupies one position slot."""
    out: list[str] = []
    i, n = 0, len(token)
    while i < n:
        j = i
        cjk = _is_cjk(token[i])
        while j < n and _is_cjk(token[j]) == cjk:
            j += 1
        seg = token[i:j]
        if cjk and len(seg) >= 2:
            out.extend(seg[k : k + 2] for k in range(len(seg) - 1))
        else:
            out.append(seg)
        i = j
    return out
