"""Miscellaneous token filters, wave 2 (round 5n).

  * ScandinavianFoldingFilter (Miscellaneous/ScandinavianFoldingFilter.cs):
    one left-to-right scan — å/ä/æ fold to a (and uppercase), ø/ö to o;
    an ASCII a/A eats ONE following [aAeEoO], an o/O eats one [eEoO]
    (StemmerUtil.Delete, scan resumes after the eaten char). The scan
    tiles exactly like a single global regex pass, because the kept first
    char is never re-examined and special chars are in no pair class —
    so the SQL mirror is regexp_replace(
    '(?:([aA])[aAeEoO]|([oO])[eEoO])' -> '\\1\\2', 'g') then a translate.
  * ScandinavianNormalizationFilter (ScandinavianNormalizationFilter.cs):
    same scan shape, but pairs SUBSTITUTE (aa->å, ae->æ, oe/oo->ø, with
    uppercase variants) and ä->æ / ö->ø translate. Because the
    substituted char differs per pair, no single regexp_replace can
    express it — the SQL mirror is a recursive-CTE left fold
    (scandinavian_norm_cte below), one step per consumed 1-2 chars.
  * CapitalizationFilter (Miscellaneous/CapitalizationFilter.cs):
    full parameter surface (onlyFirstWord, keep, forceFirstLetter,
    okPrefix, minWordLength, maxWordCount, maxTokenLength), including the
    reference's double-advance quirk: after a separator (c <= ' ' or '.')
    ends a word, the NEXT char is skipped as a separator candidate, so a
    second consecutive separator becomes part of the following "word"
    (whose first char is then case-mapped in place).
  * TrimFilter (Miscellaneous/TrimFilter.cs): strip leading/trailing
    chars c <= ' ' (the reference compares against ' ', not IsWhiteSpace).
  * KeepWordFilter (Miscellaneous/KeepWordFilter.cs): FilteringTokenFilter
    keeping only set members — dropped tokens leave position gaps.
  * TypeTokenFilter (Core/TypeTokenFilter.cs): filter by token type
    (whitelist or blacklist) over any typed scan — standard_typed_scan
    below (StandardTokenizer types for the Latin subset: digit-only
    tokens <NUM>, else <ALPHANUM> — StandardTokenizer.cs TOKEN_TYPES)
    or ClassicTokenizer's typed scan (functions/classic.classic_scan).
  * HyphenatedWordsFilter (Miscellaneous/HyphenatedWordsFilter.cs):
    tokens ending in '-' accumulate (hyphen dropped) until a non-hyphen
    token closes the word; the combined token keeps the FIRST part's
    position state; a stream-final dangler gets its hyphen added back.
  * PatternCaptureGroupTokenFilter (Pattern/PatternCaptureGroupTokenFilter.cs):
    emits capture groups 1..n of each pattern as tokens at position
    increment 0, merged across patterns by minimum start offset with
    within-pattern group order; zero-length captures skip, and under
    preserve_original a capture equal to the whole token skips. Without
    preserve_original the first capture replaces the token (pass-through
    when nothing captures). Verified against the reference's own
    TestPatternCaptureGroupTokenFilter vectors.
"""
from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# ---------------------------------------------------------------------------
# Scandinavian filters
# ---------------------------------------------------------------------------
_FOLD_PAIR = re.compile(r"([aA])[aAeEoO]|([oO])[eEoO]")
_FOLD_MAP = str.maketrans("åäæÅÄÆøöØÖ", "aaaAAAooOO")


def scandinavian_fold(tok: str) -> str:
    """ScandinavianFoldingFilter.cs IncrementToken as the equivalent
    tiled pass (see module docstring for the equivalence argument)."""
    return _FOLD_PAIR.sub(lambda m: m.group(1) or m.group(2), tok).translate(
        _FOLD_MAP
    )


def scandinavian_fold_scan(tok: str) -> str:
    """The literal reference scan (used by tests to prove the tiled pass
    equivalent): one index loop with in-place delete/translate."""
    buf = list(tok)
    i = 0
    while i < len(buf):
        c = buf[i]
        if c in "åäæ":
            buf[i] = "a"
        elif c in "ÅÄÆ":
            buf[i] = "A"
        elif c in "øö":
            buf[i] = "o"
        elif c in "ØÖ":
            buf[i] = "O"
        elif i < len(buf) - 1:
            nxt = buf[i + 1]
            if c in "aA" and nxt in "aAeEoO":
                del buf[i + 1]
            elif c in "oO" and nxt in "eEoO":
                del buf[i + 1]
        i += 1
    return "".join(buf)


_NORM_MAP = {"ä": "æ", "Ä": "Æ", "ö": "ø", "Ö": "Ø"}


def scandinavian_normalize(tok: str) -> str:
    """ScandinavianNormalizationFilter.cs IncrementToken: the same scan,
    with substituting pairs (aa->å, ae->æ, oe/oo->ø + uppercase forms)
    and ä/ö translated to æ/ø."""
    buf = list(tok)
    i = 0
    while i < len(buf):
        c = buf[i]
        if c in _NORM_MAP:
            buf[i] = _NORM_MAP[c]
        elif i < len(buf) - 1:
            nxt = buf[i + 1]
            if c == "a" and nxt in "aoAO":
                del buf[i + 1]
                buf[i] = "å"
            elif c == "A" and nxt in "aAoO":
                del buf[i + 1]
                buf[i] = "Å"
            elif c == "a" and nxt in "eE":
                del buf[i + 1]
                buf[i] = "æ"
            elif c == "A" and nxt in "eE":
                del buf[i + 1]
                buf[i] = "Æ"
            elif c == "o" and nxt in "eEoO":
                del buf[i + 1]
                buf[i] = "ø"
            elif c == "O" and nxt in "eEoO":
                del buf[i + 1]
                buf[i] = "Ø"
        i += 1
    return "".join(buf)


def scandinavian_fold_sql(e: str) -> str:
    """DuckDB mirror of scandinavian_fold (tiled regex pass + translate)."""
    pairs = (
        f"regexp_replace({e}, '(?:([aA])[aAeEoO]|([oO])[eEoO])', "
        f"'\\1\\2', 'g')"
    )
    return f"translate({pairs}, 'åäæÅÄÆøöØÖ', 'aaaAAAooOO')"


def scandinavian_norm_cte(src: str = "rawtoks") -> str:
    """Recursive-CTE left fold over the distinct tokens of `src`(tok):
    emits normmap(tok, norm). State = (consumed prefix count via rest,
    accumulated output); each step consumes one char (translate/copy) or
    two (a substituting pair), exactly the reference scan order."""
    return f"""normseed AS (
  SELECT DISTINCT tok FROM {src}
),
normwalk(tok, rest, acc) AS (
  SELECT tok, tok, '' FROM normseed
  UNION ALL
  SELECT tok,
         CASE
           WHEN substr(rest, 1, 1) IN ('a', 'A', 'o', 'O')
                AND ((substr(rest, 1, 1) = 'a' AND substr(rest, 2, 1) IN ('a','o','A','O','e','E'))
                  OR (substr(rest, 1, 1) = 'A' AND substr(rest, 2, 1) IN ('a','A','o','O','e','E'))
                  OR (substr(rest, 1, 1) IN ('o','O') AND substr(rest, 2, 1) IN ('e','E','o','O')))
             THEN substr(rest, 3)
           ELSE substr(rest, 2)
         END,
         acc || CASE
           WHEN substr(rest, 1, 1) = 'ä' THEN 'æ'
           WHEN substr(rest, 1, 1) = 'Ä' THEN 'Æ'
           WHEN substr(rest, 1, 1) = 'ö' THEN 'ø'
           WHEN substr(rest, 1, 1) = 'Ö' THEN 'Ø'
           WHEN substr(rest, 1, 1) = 'a' AND substr(rest, 2, 1) IN ('a','o','A','O') THEN 'å'
           WHEN substr(rest, 1, 1) = 'A' AND substr(rest, 2, 1) IN ('a','A','o','O') THEN 'Å'
           WHEN substr(rest, 1, 1) = 'a' AND substr(rest, 2, 1) IN ('e','E') THEN 'æ'
           WHEN substr(rest, 1, 1) = 'A' AND substr(rest, 2, 1) IN ('e','E') THEN 'Æ'
           WHEN substr(rest, 1, 1) = 'o' AND substr(rest, 2, 1) IN ('e','E','o','O') THEN 'ø'
           WHEN substr(rest, 1, 1) = 'O' AND substr(rest, 2, 1) IN ('e','E','o','O') THEN 'Ø'
           ELSE substr(rest, 1, 1)
         END
  FROM normwalk WHERE rest <> ''
),
normmap AS (
  SELECT tok, acc AS norm FROM normwalk WHERE rest = ''
)"""


# ---------------------------------------------------------------------------
# CapitalizationFilter
# ---------------------------------------------------------------------------
def capitalization_filter(
    tok: str,
    only_first_word: bool = True,
    keep: frozenset | None = None,
    force_first_letter: bool = True,
    ok_prefix: tuple[str, ...] = (),
    min_word_length: int = 0,
    max_word_count: int = 2**31 - 1,
    max_token_length: int = 2**31 - 1,
) -> str:
    """CapitalizationFilter.cs IncrementToken + ProcessWord, including the
    separator double-advance quirk and the exceeded-maxWordCount restore."""
    if len(tok) >= max_token_length:
        return tok
    buf = list(tok)
    words: list[tuple[int, int]] = []  # (start, length)
    last_start = 0
    i = 0
    while i < len(buf):
        c = buf[i]
        if ord(c) <= 0x20 or c == ".":
            ln = i - last_start
            if ln > 0:
                words.append((last_start, ln))
                last_start = i + 1
                i += 1  # the reference's extra advance
        i += 1
    if last_start < len(buf):
        words.append((last_start, len(buf) - last_start))

    def up1(c: str) -> str:  # char-level case maps like .NET ToUpper(char):
        u = c.upper()  # multi-char expansions (ß, İ) stay unchanged
        return u if len(u) == 1 else c

    def lo1(c: str) -> str:
        lw = c.lower()
        return lw if len(lw) == 1 else c

    def process(start: int, length: int, word_count: int) -> None:
        if length < 1:
            return
        if only_first_word and word_count > 0:
            for j in range(length):
                buf[start + j] = lo1(buf[start + j])
            return
        w = "".join(buf[start : start + length])
        if keep is not None and w in keep:
            if word_count == 0 and force_first_letter:
                buf[start] = up1(buf[start])
            return
        if length < min_word_length:
            return
        for p in ok_prefix:
            if length >= len(p) and w.startswith(p):
                return
        buf[start] = up1(buf[start])
        for j in range(1, length):
            buf[start + j] = lo1(buf[start + j])

    for wc, (s, ln) in enumerate(words):
        process(s, ln, wc)
    if len(words) > max_word_count:
        return tok  # restore the backup
    return "".join(buf)


# ---------------------------------------------------------------------------
# Trim / KeepWord / TypeToken
# ---------------------------------------------------------------------------
def trim_filter(tok: str) -> str:
    """TrimFilter.cs: strip chars <= ' ' from both ends."""
    start = 0
    end = len(tok)
    while start < end and ord(tok[start]) <= 0x20:
        start += 1
    while end > start and ord(tok[end - 1]) <= 0x20:
        end -= 1
    return tok[start:end]


def keep_word_filter(
    tokens: list[str], positions: list[int], keep: frozenset
) -> tuple[list[str], list[int]]:
    """KeepWordFilter.cs: keep only set members; gaps preserved."""
    kept = [(t, p) for t, p in zip(tokens, positions) if t in keep]
    return [t for t, _ in kept], [p for _, p in kept]


_HAS_LETTER = re.compile(r"[^\W\d_]")
_HAS_DIGIT = re.compile(r"\d")


def standard_typed_scan(text: str) -> list[tuple[str, int, int, str]]:
    """UAX#29 standard-tokenizer matches carrying StandardTokenizer's
    type attribute for the Latin-script subset: a token with a digit and
    no letter matched the grammar's numeric rule -> <NUM>, everything
    else <ALPHANUM> (StandardTokenizer.cs TOKEN_TYPES; the CJK type rows
    belong to the multilingual slots, out of scope here)."""
    from .analysis import _raw_matches

    return [
        (
            tok,
            s,
            e,
            "<NUM>"
            if _HAS_DIGIT.search(tok) and not _HAS_LETTER.search(tok)
            else "<ALPHANUM>",
        )
        for tok, s, e in _raw_matches(text, "standard")
    ]


def type_token_filter(
    scanned: list[tuple[str, int, int, str]],
    types: frozenset,
    use_whitelist: bool = False,
) -> list[tuple[str, int, int, str]]:
    """TypeTokenFilter.cs over a typed scan (standard_typed_scan or
    classic_scan rows): keep tokens whose type is in `types`
    (whitelist) or not in it (default blacklist)."""
    if use_whitelist:
        return [r for r in scanned if r[3] in types]
    return [r for r in scanned if r[3] not in types]


# ---------------------------------------------------------------------------
# HyphenatedWordsFilter
# ---------------------------------------------------------------------------
def hyphenated_words(
    tokens: list[str], positions: list[int] | None = None
) -> tuple[list[str], list[int]]:
    """HyphenatedWordsFilter.cs over a (token, position) stream: '-'-final
    tokens accumulate (hyphen dropped); the closing token completes the
    word at the FIRST part's position; a stream-final dangler keeps its
    hyphen (the backwards-compatibility arm)."""
    if positions is None:
        positions = list(range(len(tokens)))
    out_t: list[str] = []
    out_p: list[int] = []
    acc: list[str] = []
    acc_pos = -1
    for t, p in zip(tokens, positions):
        if t.endswith("-") and len(t) > 0:
            if not acc:
                acc_pos = p
            acc.append(t[:-1])
        elif not acc:
            out_t.append(t)
            out_p.append(p)
        else:
            acc.append(t)
            out_t.append("".join(acc))
            out_p.append(acc_pos)
            acc = []
    if acc:
        out_t.append("".join(acc) + "-")
        out_p.append(acc_pos)
    return out_t, out_p


# ---------------------------------------------------------------------------
# PatternCaptureGroupTokenFilter
# ---------------------------------------------------------------------------
def pattern_capture_tokens(
    tok: str, patterns: list[re.Pattern], preserve_original: bool = False
) -> list[str]:
    """Emitted token texts for one input token (position increments are 0
    for everything after the first emission)."""
    n = len(patterns)
    iters: list = [None] * n
    matches: list = [None] * n
    cur_group = [-1] * n
    group_counts = [p.groups for p in patterns]
    sel = [-1, -1]  # (pattern index, group) of the pending capture

    def next_capture() -> bool:
        min_off = None
        sel[0] = -1
        i = 0
        while i < n:
            if cur_group[i] == -1:
                if iters[i] is None:
                    iters[i] = patterns[i].finditer(tok)
                matches[i] = next(iters[i], None)
                cur_group[i] = 1 if matches[i] is not None else 0
            if cur_group[i] != 0:
                m = matches[i]
                while cur_group[i] < group_counts[i] + 1:
                    g = cur_group[i]
                    s, e = m.start(g), m.end(g)
                    if s == e or (
                        preserve_original and s == 0 and e == len(tok)
                    ):
                        cur_group[i] += 1
                        continue
                    if min_off is None or s < min_off:
                        min_off = s
                        sel[0] = i
                    break
                if cur_group[i] == group_counts[i] + 1:
                    cur_group[i] = -1
                    continue  # advance this pattern to its next match
            i += 1
        if sel[0] == -1:
            return False
        sel[1] = cur_group[sel[0]]
        return True

    out: list[str] = []
    if preserve_original:
        out.append(tok)
        while next_capture():
            i, g = sel
            out.append(tok[matches[i].start(g) : matches[i].end(g)])
            cur_group[i] += 1
        return out
    if next_capture():
        i, g = sel
        out.append(tok[matches[i].start(g) : matches[i].end(g)])
        cur_group[i] += 1
        while next_capture():
            i, g = sel
            out.append(tok[matches[i].start(g) : matches[i].end(g)])
            cur_group[i] += 1
        return out
    return [tok]


# ---------------------------------------------------------------------------
# Gate UDFs
# ---------------------------------------------------------------------------
def _tokens_udf(fn):
    def batch(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [fn(t) if isinstance(t, str) else [] for t in texts],
            index=texts.index,
        )

    return F.pandas_udf(batch, ArrayType(StringType()))


def scandinavian_fold_udf(analyzer: str = "whitespace"):
    def fn(text: str) -> list[str]:
        from .analysis import tokenize_text

        return [scandinavian_fold(t) for t in tokenize_text(text, analyzer)]

    return _tokens_udf(fn)


def scandinavian_norm_udf(analyzer: str = "whitespace"):
    def fn(text: str) -> list[str]:
        from .analysis import tokenize_text

        return [
            scandinavian_normalize(t) for t in tokenize_text(text, analyzer)
        ]

    return _tokens_udf(fn)


def capitalization_udf():
    """KeywordTokenizer + CapitalizationFilter(defaults) — the Solr
    facet-label chain the filter was built for."""

    def fn(text: str) -> list[str]:
        from .analysis import tokenize_text

        return [
            capitalization_filter(t) for t in tokenize_text(text, "keyword")
        ]

    return _tokens_udf(fn)


def hyphenated_udf():
    def fn(text: str) -> list[str]:
        from .analysis import tokenize_text

        return hyphenated_words(tokenize_text(text, "whitespace"))[0]

    return _tokens_udf(fn)


def keep_word_udf(keep: frozenset, analyzer: str = "whitespace"):
    """Whitespace tokens filtered to set members (the reference test's
    MockTokenizer-WHITESPACE chain, no stop filter upstream)."""

    def fn(text: str) -> list[str]:
        from .analysis import tokenize_with_positions

        toks, poss = tokenize_with_positions(text, analyzer)
        return keep_word_filter(toks, poss, keep)[0]

    return _tokens_udf(fn)


def type_token_udf(types: frozenset, use_whitelist: bool = True):
    """StandardTokenizer typed scan filtered by token type (whitelist by
    default — the TestTypeFilterWhitelist chain)."""

    def fn(text: str) -> list[str]:
        return [
            t
            for t, _s, _e, _ty in type_token_filter(
                standard_typed_scan(text), types, use_whitelist
            )
        ]

    return _tokens_udf(fn)


def pattern_capture_udf(
    pattern_srcs: tuple[str, ...], preserve_original: bool = True
):
    def fn(text: str) -> list[str]:
        from .analysis import tokenize_text

        pats = [re.compile(p) for p in pattern_srcs]
        return [
            sub
            for t in tokenize_text(text, "whitespace")
            for sub in pattern_capture_tokens(t, pats, preserve_original)
        ]

    return _tokens_udf(fn)
