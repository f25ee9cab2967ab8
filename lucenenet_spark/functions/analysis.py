"""Analysis chain: StandardAnalyzer-equivalent tokenization, vectorized.

Reference semantics (SURVEY.md §2.2):
- StandardTokenizer (UAX#29-ish word break)      src/Lucene.Net.Analysis.Common/Analysis/Standard/StandardTokenizer.cs:60-105
- maxTokenLength=255 drop rule                   StandardAnalyzer.cs:52
- LowerCaseFilter (Unicode lowercase)            Analysis/Core/LowerCaseFilter.cs:55
- StopFilter with the 33 English stopwords       Analysis/Core/StopFilter.cs; StopAnalyzer.cs:52-55

The whole chain is fused into ONE vectorized pandas UDF (tokenize_udf) —
tokenizer -> lowercase -> stop removal — so ingestion stays Arrow-batched
end to end (no per-row Python at the DataFrame level).

Token grammar: a regex transcription of the UAX#29 word-break rules the
reference's generated JFlex DFA implements (Unicode 6.x classes,
StandardTokenizerImpl.cs) — deliberately expressible BOTH in Python `re`
and in RE2 (no lookaround) so the DuckDB oracle tokenizes identically:

    WB5/6/7   letter runs join across ONE MidLetter|MidNumLet ([':.·’‘])
              with a letter on both sides — "don't", "O'Reilly's", "A:B",
              "b.com" are single tokens; "A::B", "A.:B" split.
    WB8/11/12 digit runs join across ONE MidNum|MidNumLet ([',.;’‘]) with
              a digit on both sides — "21.35", "3,000.5", "216.239.63.104"
              single tokens; "1,,2", "1.,2" split.
    WB9/10    letters and digits concatenate freely — "B2B", "R2D2".
    WB13a/b   ExtendNumLet (underscore) joins at either edge — "foo_bar",
              "_tag", "x_" single tokens (but "_" alone is not a token:
              the JFlex word rule needs >=1 letter/digit).

Verified against the expectations in the reference's own
Lucene.Net.Tests.Analysis.Common/Analysis/Core/TestStandardAnalyzer.cs
(TestMid, TestApostrophesSA, TestNumericSA, TestAlphanumericSA).
Extend handling (round 5g): BMP combining marks (Mn/Mc/Me) + ZWNJ/ZWJ
continue a letter/digit run without breaking it (MARK_CLASS below), so
abugida scripts — Devanagari matras, Arabic harakat, Hebrew points —
tokenize whole, like the reference. Marks cannot START a token (the JFlex
word rule needs a letter/digit first).

Documented divergences (irrelevant to the ASCII transcript corpus):
CJK ideographs tokenize as whole runs, not per-character; the exotic
non-ASCII members of the Mid*/ExtendNumLet classes (U+05F4, U+FE13,
fullwidth forms, …) are not modeled; marks adjacent to Mid* chars or
leading a fragment are dropped rather than attached.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType


# UAX#29 Extend approximation: BMP Mn/Mc/Me combining marks + ZWNJ/ZWJ
# (U+200C/U+200D), frozen as (start, end) codepoint ranges so the Python
# and RE2 dialects render the IDENTICAL class (literal chars, no \p
# dependency). Marks may CONTINUE a letter/digit run but never start one —
# abugida scripts (Devanagari matras, Arabic harakat, Hebrew points) stay
# one token like the reference's StandardTokenizer.
_MARK_RANGES: tuple = tuple()  # populated below from the packed string

_MARK_RANGES_PACKED = (
    "0300-036F,0483-0489,0591-05BD,05BF,05C1-05C2,05C4-05C5,05C7,0610-061A,064B-065F,0670,06D6-06DC,06DF-06E4,06E7-06E8,06EA-06ED,0711,0730-074A,07A6-07B0,07EB-07F3,07FD,0816-0819,081B-0823,0825-0827,0829-082D,0859-085B,0898-089F,08CA-08E1,08E3-0903,093A-093C,093E-094F,0951-0957,0962-0963,0981-0983,09BC,09BE-09C4,09C7-09C8,09CB-09CD,09D7,09E2-09E3,09FE,0A01-0A03,0A3C,0A3E-0A42,0A47-0A48,0A4B-0A4D,0A51,0A70-0A71,0A75,0A81-0A83,0ABC,0ABE-0AC5,0AC7-0AC9,0ACB-0ACD,0AE2-0AE3,0AFA-0AFF,0B01-0B03,0B3C,0B3E-0B44,0B47-0B48,0B4B-0B4D,0B55-0B57,0B62-0B63,0B82,0BBE-0BC2,0BC6-0BC8,0BCA-0BCD,0BD7,0C00-0C04,0C3C,0C3E-0C44,0C46-0C48,0C4A-0C4D,0C55-0C56,0C62-0C63,0C81-0C83,0CBC,0CBE-0CC4,0CC6-0CC8,0CCA-0CCD,0CD5-0CD6,0CE2-0CE3,0D00-0D03,0D3B-0D3C,0D3E-0D44,0D46-0D48,0D4A-0D4D,0D57,0D62-0D63,0D81-0D83,0DCA,0DCF-0DD4,0DD6,0DD8-0DDF,0DF2-0DF3,0E31,0E34-0E3A,0E47-0E4E,0EB1,0EB4-0EBC,0EC8-0ECD,0F18-0F19,0F35,0F37,0F39,0F3E-0F3F,0F71-0F84,0F86-0F87,0F8D-0F97,0F99-0FBC,0FC6,102B-103E,1056-1059,105E-1060,1062-1064,1067-106D,1071-1074,1082-108D,108F,109A-109D,135D-135F,1712-1715,1732-1734,1752-1753,1772-1773,17B4-17D3,17DD,180B-180D,180F,1885-1886,18A9,1920-192B,1930-193B,1A17-1A1B,1A55-1A5E,1A60-1A7C,1A7F,1AB0-1ACE,1B00-1B04,1B34-1B44,1B6B-1B73,1B80-1B82,1BA1-1BAD,1BE6-1BF3,1C24-1C37,1CD0-1CD2,1CD4-1CE8,1CED,1CF4,1CF7-1CF9,1DC0-1DFF,200C-200D,20D0-20F0,2CEF-2CF1,2D7F,2DE0-2DFF,302A-302F,3099-309A,A66F-A672,A674-A67D,A69E-A69F,A6F0-A6F1,A802,A806,A80B,A823-A827,A82C,A880-A881,A8B4-A8C5,A8E0-A8F1,A8FF,A926-A92D,A947-A953,A980-A983,A9B3-A9C0,A9E5,AA29-AA36,AA43,AA4C-AA4D,AA7B-AA7D,AAB0,AAB2-AAB4,AAB7-AAB8,AABE-AABF,AAC1,AAEB-AAEF,AAF5-AAF6,ABE3-ABEA,ABEC-ABED,FB1E,FE00-FE0F,FE20-FE2F"
)
_MARK_RANGES = tuple(
    (int(p.split("-")[0], 16), int(p.split("-")[-1], 16))
    for p in _MARK_RANGES_PACKED.split(",")
)

MARK_CLASS = "[" + "".join(
    chr(a) if a == b else f"{chr(a)}-{chr(b)}" for a, b in _MARK_RANGES
) + "]"


def _token_pattern(letter: str, digit: str) -> str:
    """UAX#29 word-break regex over the given letter/digit classes.

    Letter runs chain across single MidLetter∪MidNumLet chars flanked by
    letters; digit runs across single MidNum∪MidNumLet chars flanked by
    digits; runs and underscores concatenate; combining marks + ZWNJ/ZWJ
    (the Extend approximation, MARK_CLASS) continue a run but cannot start
    one. Same construction for the Python and RE2 dialects — the language
    is regular, no lookaround, literal chars only.
    """
    mid_letter = "['‘’.:·]"  # MidLetter (: ·) ∪ MidNumLet (' ‘ ’ .)
    mid_num = "['‘’.,;]"  # MidNum (, ;) ∪ MidNumLet (' ‘ ’ .)
    lcont = f"(?:{letter}|{MARK_CLASS})"
    ncont = f"(?:{digit}|{MARK_CLASS})"
    lrun = f"{letter}{lcont}*(?:{mid_letter}{letter}{lcont}*)*"
    nrun = f"{digit}{ncont}*(?:{mid_num}{digit}{ncont}*)*"
    return f"_*(?:{lrun}|{nrun})(?:{lrun}|{nrun}|_)*"


# Python dialect: [^\W\d_] = Unicode letters, \d = Unicode decimal digits.
TOKEN_PATTERN = _token_pattern(r"[^\W\d_]", r"\d")
# RE2 dialect for DuckDB oracle SQL (regexp_extract_all / _split_to_array):
TOKEN_PATTERN_RE2 = _token_pattern(r"\p{L}", r"\p{Nd}")
# Same, with apostrophes doubled for embedding in a single-quoted SQL
# string literal. ALWAYS use this one inside f"... '{pattern}' ..." SQL.
TOKEN_PATTERN_RE2_SQL = TOKEN_PATTERN_RE2.replace("'", "''")

_TOKEN_RE = re.compile(TOKEN_PATTERN, re.UNICODE)

# Fast path: on text containing NONE of the joinable chars (Mid* classes +
# ExtendNumLet underscore) the full pattern degenerates to plain
# letter/digit runs — `(?:lrun|nrun)+` with every mid/underscore branch
# dead — so a much cheaper run regex tokenizes identically. One C-speed
# containment scan picks the path; the transcript corpus (pure [a-z0-9 ])
# takes the fast branch for every row.
_SIMPLE_RE = re.compile(r"[^\W_]+", re.UNICODE)
_NEEDS_FULL = re.compile("['‘’.:·,;_]|" + MARK_CLASS).search


def _findall(text: str) -> list[str]:
    return (_TOKEN_RE if _NEEDS_FULL(text) else _SIMPLE_RE).findall(text)

MAX_TOKEN_LENGTH = 255  # StandardAnalyzer.cs:52 — longer tokens are dropped

# The 33 ENGLISH_STOP_WORDS_SET — StopAnalyzer.cs:52-55
ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

# Snowball project stopword lists (public data, shipped by the reference as
# Analysis/Snowball/german_stop.txt and swedish_stop.txt — the default stop
# sets of GermanAnalyzer.cs / SwedishAnalyzer.cs)
GERMAN_STOP_WORDS = frozenset(
    """aber alle allem allen aller alles als also am an ander andere anderem
    anderen anderer anderes anderm andern anderr anders auch auf aus bei bin
    bis bist da damit dann der den des dem die das daß derselbe derselben
    denselben desselben demselben dieselbe dieselben dasselbe dazu dein deine
    deinem deinen deiner deines denn derer dessen dich dir du dies diese
    diesem diesen dieser dieses doch dort durch ein eine einem einen einer
    eines einig einige einigem einigen einiger einiges einmal er ihn ihm es
    etwas euer eure eurem euren eurer eures für gegen gewesen hab habe haben
    hat hatte hatten hier hin hinter ich mich mir ihr ihre ihrem ihren ihrer
    ihres euch im in indem ins ist jede jedem jeden jeder jedes jene jenem
    jenen jener jenes jetzt kann kein keine keinem keinen keiner keines können
    könnte machen man manche manchem manchen mancher manches mein meine meinem
    meinen meiner meines mit muss musste nach nicht nichts noch nun nur ob
    oder ohne sehr sein seine seinem seinen seiner seines selbst sich sie
    ihnen sind so solche solchem solchen solcher solches soll sollte sondern
    sonst über um und uns unse unsem unsen unser unses unter viel vom von vor
    während war waren warst was weg weil weiter welche welchem welchen welcher
    welches wenn werde werden wie wieder will wir wird wirst wo wollen wollte
    würde würden zu zum zur zwar zwischen""".split()
)

SWEDISH_STOP_WORDS = frozenset(
    """och det att i en jag hon som han på den med var sig för så till är men
    ett om hade de av icke mig du henne då sin nu har inte hans honom skulle
    hennes där min man ej vid kunde något från ut när efter upp vi dem vara
    vad över än dig kan sina här ha mot alla under någon eller allt mycket
    sedan ju denna själv detta åt utan varit hur ingen mitt ni bli blev oss
    din dessa några deras blir mina samma vilken er sådan vår blivit dess
    inom mellan sådant varför varje vilka ditt vem vilket sitta sådana vart
    dina vars vårt våra ert era vilkas""".split()
)


ANALYZERS = (
    "standard", "english", "german", "swedish",
    "french", "spanish", "italian", "portuguese", "norwegian", "finnish",
    "hungarian", "russian", "czech", "bulgarian", "latvian", "indonesian",
    "arabic", "persian", "sorani", "galician", "greek", "hindi",
    "brazilian", "cjk", "danish", "dutch", "armenian", "catalan",
    "romanian", "basque", "irish", "turkish",
    # Core-tokenizer slots (round 5n) — these change the TOKENIZER, not
    # just the filter chain:
    #   "whitespace": WhitespaceAnalyzer.cs (WhitespaceTokenizer — \S+
    #                 runs split at 255; NO lowercase, no stops)
    #   "simple":     SimpleAnalyzer.cs (LowerCaseTokenizer — letter runs
    #                 split at 255, lowercased; no stops)
    #   "stop":       StopAnalyzer.cs (LowerCaseTokenizer + English stops)
    #   "keyword":    KeywordAnalyzer.cs (whole input = ONE token, no cap,
    #                 no case fold, no stops)
    #   "classic":    ClassicAnalyzer.cs (ClassicTokenizer grammar +
    #                 ClassicFilter + LowerCase + English stops; >255 drop)
    "whitespace", "simple", "stop", "keyword", "classic",
)

# slots whose tokenizer is NOT the UAX#29 standard grammar
_CORE_TOKENIZER_BASES = frozenset(
    ("whitespace", "simple", "stop", "keyword", "classic")
)
# CharTokenizer subclasses SPLIT over-long runs at MAX_WORD_LEN=255
# (CharTokenizer.cs:108,183 — emit and continue, never drop);
# KeywordTokenizer has no cap at all (its buffer grows). Only the
# JFlex-scanner tokenizers (standard grammar + classic) DROP tokens
# longer than maxTokenLength with a position bump.
_NO_LONG_DROP = frozenset(("whitespace", "simple", "stop", "keyword"))
# slots with no LowerCaseFilter in the chain (WhitespaceAnalyzer.cs /
# KeywordAnalyzer.cs chains are tokenizer-only)
_CASELESS = frozenset(("whitespace", "keyword"))

_WS_RUN = re.compile(r"\S+")  # WhitespaceTokenizer: !IsWhiteSpace runs
_LETTER_RUN = re.compile(r"[^\W\d_]+")  # LetterTokenizer: IsLetter runs


def _token_triples(text: str, base: str):
    """(raw_or_filtered_token, start, end) triples for the non-standard
    tokenizer slots. Offsets are raw-text char spans; classic tokens carry
    ClassicFilter output (type-dependent) while their span stays raw."""
    if base in ("whitespace", "simple", "stop"):
        pat = _WS_RUN if base == "whitespace" else _LETTER_RUN
        for m in pat.finditer(text):
            s, e = m.span()
            # CharTokenizer MAX_WORD_LEN split (255 code points per chunk;
            # the reference counts UTF-16 units — identical on the BMP)
            for i in range(s, e, MAX_TOKEN_LENGTH):
                j = min(i + MAX_TOKEN_LENGTH, e)
                yield text[i:j], i, j
    elif base == "keyword":
        yield text, 0, len(text)
    elif base == "classic":
        from .classic import classic_matches

        yield from classic_matches(text)
    else:  # pragma: no cover - guarded by callers
        raise ValueError(base)


def split_analyzer(analyzer: str):
    """Parse the optional suffixes out of an analyzer name:
    "english:ascii:excl=merge,value" ->
    ("english", frozenset({"merge","value"})) — the ":ascii" flag is
    queried separately via has_ascii_fold().

    ":excl=" is this engine's encoding of the reference Analyzers' third
    constructor argument (stemExclusionSet -> SetKeywordMarkerFilter,
    e.g. GermanAnalyzer.cs:156,175): tokens in the set are indexed but NOT
    stemmed. ":ascii" composes ASCIIFoldingFilter
    (Analysis/Miscellaneous/ASCIIFoldingFilter.cs) into the chain as a
    PRE stage on the lowercased token, before the stop filter. Encoding
    both in the name lets the string-typed analyzer plumbing (manifest,
    parse, NRT, merge) carry them with no schema change.
    """
    if ":phonetic=" in analyzer:
        # ":phonetic=<encoder>[,replace]" — PhoneticFilter appended to the
        # chain (see phonetic_spec); stripped here so the base resolves
        analyzer = analyzer.partition(":phonetic=")[0]
    excl = frozenset()
    if ":excl=" in analyzer:
        analyzer, _, rest = analyzer.partition(":excl=")
        excl = frozenset(w for w in rest.split(",") if w)
    if analyzer.endswith(":ascii"):
        analyzer = analyzer[: -len(":ascii")]
    return analyzer, excl


def phonetic_spec(analyzer: str) -> tuple[str, bool] | None:
    """Parse the ":phonetic=<encoder>[,replace]" suffix — this engine's
    encoding of PhoneticFilter appended to the analyzer chain
    (Lucene.Net.Analysis.Phonetic/PhoneticFilter.cs). Returns
    (encoder, inject) or None. Inject mode emits the PHONETIC first with
    the original's position increment and the ORIGINAL as a posInc-0
    overlap at the same position (IncrementToken's save/restore order);
    replace mode rewrites the token (original kept when the code is
    empty or equal)."""
    if ":phonetic=" not in analyzer:
        return None
    spec = analyzer.partition(":phonetic=")[2]
    enc, _, mode = spec.partition(",")
    if mode not in ("", "replace"):
        raise ValueError(f"unknown phonetic mode {mode!r}")
    return enc, mode != "replace"


def analyzer_has_overlaps(analyzer: str) -> bool:
    """True when the chain can emit posInc-0 overlap tokens (phonetic
    inject) — the builder then discounts overlaps from the norm length
    (FieldInvertState.NumOverlap; BM25Similarity.cs:156-160
    discountOverlaps default true) while sumTotalTermFreq keeps counting
    every emitted token."""
    spec = phonetic_spec(analyzer)
    return spec is not None and spec[1]


def overlap_expand(analyzer: str):
    """The chain's same-position expansion stage: token -> emitted list
    (anchor first; the rest are posInc-0 overlaps). None when the chain
    has no such stage. PhoneticFilter semantics: empty/equal codes pass
    the original through; encode failures too."""
    spec = phonetic_spec(analyzer)
    if spec is None:
        return None
    enc_name, inject = spec
    from .phonetic import ENCODERS

    enc = ENCODERS[enc_name]
    memo: dict[str, str | None] = {}  # encode cost ∝ vocabulary

    def expand(t: str) -> list[str]:
        if t not in memo:
            try:
                v = enc(t)
            except Exception:
                v = None
            memo[t] = v if v and v != t else None
        ph = memo[t]
        if ph is None:
            return [t]
        return [ph, t] if inject else [ph]

    return expand


def has_ascii_fold(analyzer: str) -> bool:
    """True when the name carries the ":ascii" ASCIIFoldingFilter flag."""
    if ":excl=" in analyzer:
        analyzer = analyzer.partition(":excl=")[0]
    return analyzer.endswith(":ascii")


def validate_analyzer(analyzer: str) -> None:
    base, _excl = split_analyzer(analyzer)
    if base not in ANALYZERS:
        raise ValueError(f"unknown analyzer {analyzer!r} ({'|'.join(ANALYZERS)})")
    spec = phonetic_spec(analyzer)
    if spec is not None:
        from .phonetic import ENCODERS

        if spec[0] not in ENCODERS:
            raise ValueError(f"unknown phonetic encoder {spec[0]!r}")
        if base == "cjk" or base in _CORE_TOKENIZER_BASES:
            # the cjk stream stage and the core-tokenizer span chains
            # don't carry the phonetic expansion — reject loudly
            raise ValueError(f":phonetic= is not supported with {base}")
    if has_ascii_fold(analyzer) and (
        base in ("cjk", "hindi") or base in _CORE_TOKENIZER_BASES
    ):
        # cjk/hindi oracle SQL moves stop filtering into custom CTE shapes
        # the fold stage is not wired through, and the core-tokenizer
        # slots' SQL mirrors don't carry the fold either — reject loudly
        # rather than letting the two engines drift
        raise ValueError(f":ascii is not supported with the {base} chain")


def _analyzer_chain(analyzer: str):
    """The base chain of `analyzer` with its stem-exclusion suffix applied:
    excluded tokens skip the stem filter (SetKeywordMarkerFilter +
    the KeywordAttribute check every reference stem filter carries, e.g.
    PorterStemFilter.cs:72, GermanLightStemFilter.cs:49). German is the
    one special case: GermanNormalizationFilter does NOT consult the
    keyword attribute (its IncrementToken has no keywordAttr), so excluded
    German tokens still normalize — they only skip the light stem."""
    base, excl = split_analyzer(analyzer)
    stop, pre, post = _base_chain(base)
    if has_ascii_fold(analyzer):
        # ASCIIFoldingFilter composes after the base PRE stage (elision /
        # normalization), before the stop filter — the engine's documented
        # composition point for the :ascii flag
        from .asciifold import ascii_fold

        if pre is None:
            pre = ascii_fold
        else:
            def pre(t, _inner=pre):  # noqa: F811
                return ascii_fold(_inner(t))
    if excl and post is not None:
        if base in ("german", "arabic"):
            # normalization filters with no keyword check (German per its
            # IncrementToken; Arabic per the ArabicAnalyzer.cs:142 TODO —
            # ArabicNormalizationFilter runs BEFORE SetKeywordMarkerFilter):
            # excluded tokens still normalize, they only skip the stem
            if base == "german":
                from .lightstem import german_chain as _full
                from .lightstem import german_normalize as _norm
            else:
                from .lightstem import arabic_chain as _full
                from .lightstem import arabic_normalize as _norm

            def post(t, _excl=excl, _n=_norm, _f=_full):  # noqa: F811
                return _n(t) if t in _excl else _f(t)
        else:
            def post(t, _excl=excl, _inner=post):  # noqa: F811
                return t if t in _excl else _inner(t)
    return stop, pre, post


def _base_chain(analyzer: str):
    """(stopword set, pre-stop transform | None, post-stop transform | None)
    for the named analyzer slot. Each slot mirrors one reference Analyzer's
    CreateComponents chain over the shared StandardTokenizer+LowerCase
    front end. The PRE transform runs on the lowercased token BEFORE the
    stop filter (ElisionFilter's position in FrenchAnalyzer.cs /
    ItalianAnalyzer.cs CreateComponents — elision output must be
    stop-checkable: "l'est" -> "est" -> dropped); the POST transform is the
    stem filter. Neither changes token COUNT or positions — only text:

    - "standard":   StandardAnalyzer.cs (English stops, no stemming)
    - "english":    + PorterStemFilter (Analysis/En/PorterStemFilter.cs)
    - "german":     GermanAnalyzer.cs — snowball German stops,
                    GermanNormalizationFilter + GermanLightStemFilter
    - "french":     FrenchAnalyzer.cs — ElisionFilter(DEFAULT_ARTICLES),
                    snowball French stops, FrenchLightStemFilter
    - "italian":    ItalianAnalyzer.cs — ElisionFilter(DEFAULT_ARTICLES),
                    snowball Italian stops, ItalianLightStemFilter
    - "spanish":    SpanishAnalyzer.cs — snowball Spanish stops,
                    SpanishLightStemFilter
    - "portuguese": PortugueseAnalyzer.cs — snowball Portuguese stops,
                    PortugueseLightStemFilter
    - "swedish" / "norwegian" / "finnish": snowball stops + the reference's
      LIGHT stem filters (SwedishLightStemFilter,
      NorwegianLightStemFilter(BOKMAAL), FinnishLightStemFilter). NOTE:
      these three Analyzers default to Tartarus Snowball stemmers at 4.8;
      the slots implement the light FILTER components the reference ships
      alongside them (see functions/lightstem.py docstring).
    - "russian":    snowball Russian stops + RussianLightStemFilter (same
                    light-vs-snowball note as above)
    - "czech":      CzechAnalyzer.cs — Czech stops + CzechStemFilter
    - "bulgarian":  BulgarianAnalyzer.cs — stops + BulgarianStemFilter
    - "latvian":    LatvianAnalyzer.cs — stops + LatvianStemFilter
    - "indonesian": IndonesianAnalyzer.cs — stops + IndonesianStemFilter
                    (stemDerivational=true default)
    - "arabic":     ArabicAnalyzer.cs — UNnormalized stops, then
                    ArabicNormalizationFilter + ArabicStemFilter (POST)
    - "persian":    PersianAnalyzer.cs — PersianCharFilter (ZWNJ->space,
                    see char_filter), Arabic+Persian normalization (PRE,
                    stop list is normalized), no stemmer
    - "sorani":     SoraniAnalyzer.cs — SoraniNormalizationFilter (PRE) +
                    SoraniStemFilter (POST)
    - "galician":   stops + GalicianMinimalStemFilter (the RSLP-S plural
                    step the reference ships alongside the full-RSLP
                    default — same light-variant policy as sv/no/fi)
    - "greek":      GreekAnalyzer.cs — GreekLowerCaseFilter extras as the
                    PRE transform (folded stop list), GreekStemmer POST
    - "hindi":      HindiAnalyzer.cs — IndicNormalizer + HindiNormalizer
                    PRE (normalized stop list), HindiStemmer POST
    - "brazilian":  BrazilianAnalyzer.cs — raw-token stops +
                    BrazilianStemFilter (full 5-step stemmer)
    - "cjk":        CJKAnalyzer.cs — CJKWidthFilter PRE + the
                    CJKBigramFilter stream expansion (functions/cjk.py),
                    stops applied to the emitted stream
    - "danish":     DanishAnalyzer.cs — snowball stops + the full snowball
                    DanishStemmer (functions/snowball.py)
    - "dutch":      DutchAnalyzer.cs — snowball stops, StemmerOverrideFilter
                    (DEFAULT_STEM_DICT), snowball DutchStemmer
    - "armenian":   ArmenianAnalyzer.cs — stops + snowball ArmenianStemmer
    - "catalan":    CatalanAnalyzer.cs — ElisionFilter(d l m n s t),
                    stops, snowball CatalanStemmer
    - "romanian":   RomanianAnalyzer.cs — stops + snowball RomanianStemmer
    - "basque":     BasqueAnalyzer.cs — stops + snowball BasqueStemmer
    - "irish":      IrishAnalyzer.cs — raw-PRE chain (hyphenations stop,
                    elision, IrishLowerCaseFilter prothesis) + snowball
                    IrishStemmer
    - "turkish":    TurkishAnalyzer.cs — TurkishLowerCaseFilter as a char
                    filter (İ/I folds), ApostropheFilter PRE, snowball
                    TurkishStemmer
    """
    if analyzer == "standard":
        return ENGLISH_STOP_WORDS, None, None
    if analyzer in ("whitespace", "simple", "keyword"):
        # tokenizer-only chains (WhitespaceAnalyzer.cs, SimpleAnalyzer.cs,
        # KeywordAnalyzer.cs): no stop filter, no stemmer; casing is the
        # tokenizer's own (see _CASELESS / _norm_fn)
        return frozenset(), None, None
    if analyzer in ("stop", "classic"):
        # StopAnalyzer.cs (LowerCaseTokenizer + English stops) and
        # ClassicAnalyzer.cs (ClassicTokenizer + ClassicFilter + LowerCase
        # + English stops — ClassicFilter runs inside the tokenizer slot)
        return ENGLISH_STOP_WORDS, None, None
    if analyzer == "english":
        from .porter import porter_stem

        return ENGLISH_STOP_WORDS, None, porter_stem
    if analyzer == "german":
        from .lightstem import german_chain

        return GERMAN_STOP_WORDS, None, german_chain
    if analyzer == "swedish":
        from .lightstem import swedish_light_stem

        return SWEDISH_STOP_WORDS, None, swedish_light_stem
    if analyzer == "french":
        from .lightstem import FRENCH_ARTICLES, elide, french_light_stem
        from .stopsets import FRENCH_STOP_WORDS

        return (
            FRENCH_STOP_WORDS,
            lambda t: elide(t, FRENCH_ARTICLES),
            french_light_stem,
        )
    if analyzer == "italian":
        from .lightstem import ITALIAN_ARTICLES, elide, italian_light_stem
        from .stopsets import ITALIAN_STOP_WORDS

        return (
            ITALIAN_STOP_WORDS,
            lambda t: elide(t, ITALIAN_ARTICLES),
            italian_light_stem,
        )
    if analyzer == "spanish":
        from .lightstem import spanish_light_stem
        from .stopsets import SPANISH_STOP_WORDS

        return SPANISH_STOP_WORDS, None, spanish_light_stem
    if analyzer == "portuguese":
        from .lightstem import portuguese_light_stem
        from .stopsets import PORTUGUESE_STOP_WORDS

        return PORTUGUESE_STOP_WORDS, None, portuguese_light_stem
    if analyzer == "norwegian":
        from .lightstem import norwegian_light_stem
        from .stopsets import NORWEGIAN_STOP_WORDS

        return NORWEGIAN_STOP_WORDS, None, norwegian_light_stem
    if analyzer == "finnish":
        from .lightstem import finnish_light_stem
        from .stopsets import FINNISH_STOP_WORDS

        return FINNISH_STOP_WORDS, None, finnish_light_stem
    if analyzer == "hungarian":
        from .lightstem import hungarian_light_stem
        from .stopsets import HUNGARIAN_STOP_WORDS

        return HUNGARIAN_STOP_WORDS, None, hungarian_light_stem
    if analyzer == "russian":
        from .lightstem import russian_light_stem
        from .stopsets import RUSSIAN_STOP_WORDS

        return RUSSIAN_STOP_WORDS, None, russian_light_stem
    if analyzer == "czech":
        from .lightstem import czech_stem
        from .stopsets import CZECH_STOP_WORDS

        return CZECH_STOP_WORDS, None, czech_stem
    if analyzer == "bulgarian":
        from .lightstem import bulgarian_stem
        from .stopsets import BULGARIAN_STOP_WORDS

        return BULGARIAN_STOP_WORDS, None, bulgarian_stem
    if analyzer == "latvian":
        from .lightstem import latvian_stem
        from .stopsets import LATVIAN_STOP_WORDS

        return LATVIAN_STOP_WORDS, None, latvian_stem
    if analyzer == "indonesian":
        from .lightstem import indonesian_stem
        from .stopsets import INDONESIAN_STOP_WORDS

        return INDONESIAN_STOP_WORDS, None, indonesian_stem
    if analyzer == "arabic":
        # stop BEFORE normalization ("the stopword list is not normalized",
        # ArabicAnalyzer.cs:140) -> both normalize+stem live in POST
        from .lightstem import arabic_chain
        from .stopsets import ARABIC_STOP_WORDS

        return ARABIC_STOP_WORDS, None, arabic_chain
    if analyzer == "persian":
        # normalization BEFORE stop ("the stopword list is normalized",
        # PersianAnalyzer.cs:133); no stemmer in the reference chain
        from .lightstem import persian_normalize
        from .stopsets import PERSIAN_STOP_WORDS

        return PERSIAN_STOP_WORDS, persian_normalize, None
    if analyzer == "sorani":
        # SoraniAnalyzer.cs: normalization -> lowercase -> stop -> stem;
        # Arabic script is caseless so lower-then-normalize is identical
        from .lightstem import sorani_normalize, sorani_stem
        from .stopsets import SORANI_STOP_WORDS

        return SORANI_STOP_WORDS, sorani_normalize, sorani_stem
    if analyzer == "galician":
        from .lightstem import galician_minimal_stem
        from .stopsets import GALICIAN_STOP_WORDS

        return GALICIAN_STOP_WORDS, None, galician_minimal_stem
    if analyzer == "greek":
        # GreekAnalyzer.cs: GreekLowerCaseFilter REPLACES the generic
        # lowercase; its extras (final sigma, tonos/dialytika folds) run
        # as the PRE transform, before the (folded) stop list
        from .lightstem import greek_lowercase, greek_stem
        from .stopsets import GREEK_STOP_WORDS

        return GREEK_STOP_WORDS, greek_lowercase, greek_stem
    if analyzer == "hindi":
        # HindiAnalyzer.cs: IndicNormalization + HindiNormalization run
        # BEFORE the stop filter (the stop list carries normalized forms)
        from .lightstem import hindi_chain_pre, hindi_stem
        from .stopsets import HINDI_STOP_WORDS

        return HINDI_STOP_WORDS, hindi_chain_pre, hindi_stem
    if analyzer == "brazilian":
        # BrazilianAnalyzer.cs: stop on the raw lowercased token, then
        # BrazilianStemFilter (the full 5-step RSLP-style stemmer)
        from .lightstem import brazilian_stem
        from .stopsets import BRAZILIAN_STOP_WORDS

        return BRAZILIAN_STOP_WORDS, None, brazilian_stem
    if analyzer == "cjk":
        # CJKAnalyzer.cs: width fold PRE, no stemmer; the bigram stage is
        # a STREAM expansion (see stream_filter) applied before the stop
        # filter, exactly the reference's CJKBigramFilter -> StopFilter
        from .cjk import cjk_width
        from .stopsets import CJK_STOP_WORDS

        return CJK_STOP_WORDS, cjk_width, None
    if analyzer == "danish":
        # DanishAnalyzer.cs: snowball stops + SnowballFilter(DanishStemmer)
        # — the first slot whose stem filter is the full snowball
        # algorithm (no light variant exists; functions/snowball.py)
        from .snowball import danish_stem
        from .stopsets import DANISH_STOP_WORDS

        return DANISH_STOP_WORDS, None, danish_stem
    if analyzer == "dutch":
        # DutchAnalyzer.cs: snowball stops, StemmerOverrideFilter with the
        # DEFAULT_STEM_DICT, then SnowballFilter(DutchStemmer)
        from .snowball import dutch_chain
        from .stopsets import DUTCH_STOP_WORDS

        return DUTCH_STOP_WORDS, None, dutch_chain
    if analyzer == "armenian":
        # ArmenianAnalyzer.cs: Hy/stopwords.txt + SnowballFilter(
        # ArmenianStemmer)
        from .snowball import armenian_stem
        from .stopsets import ARMENIAN_STOP_WORDS

        return ARMENIAN_STOP_WORDS, None, armenian_stem
    if analyzer == "catalan":
        # CatalanAnalyzer.cs: ElisionFilter(DEFAULT_ARTICLES) runs before
        # the stop filter (so "d'un" -> "un" -> dropped), then
        # SnowballFilter(CatalanStemmer)
        from .lightstem import elide
        from .snowball import CATALAN_ARTICLES, catalan_stem
        from .stopsets import CATALAN_STOP_WORDS

        return (
            CATALAN_STOP_WORDS,
            lambda t: elide(t, CATALAN_ARTICLES),
            catalan_stem,
        )
    if analyzer == "romanian":
        # RomanianAnalyzer.cs: Ro/stopwords.txt + SnowballFilter(
        # RomanianStemmer)
        from .snowball import romanian_stem
        from .stopsets import ROMANIAN_STOP_WORDS

        return ROMANIAN_STOP_WORDS, None, romanian_stem
    if analyzer == "basque":
        # BasqueAnalyzer.cs: Eu/stopwords.txt + SnowballFilter(BasqueStemmer)
        from .snowball import basque_stem
        from .stopsets import BASQUE_STOP_WORDS

        return BASQUE_STOP_WORDS, None, basque_stem
    if analyzer == "irish":
        # IrishAnalyzer.cs: the PRE transform receives the RAW token
        # (pre_takes_raw) and runs hyphenations-stop ('' sentinel) ->
        # elision -> IrishLowerCaseFilter; then stop -> IrishStemmer
        from .snowball import irish_pre, irish_stem
        from .stopsets import IRISH_STOP_WORDS

        return IRISH_STOP_WORDS, irish_pre, irish_stem
    if analyzer == "turkish":
        # TurkishAnalyzer.cs: ApostropheFilter (PRE — truncation is
        # case-independent so post-lowercase placement is equivalent to
        # the reference's pre-lowercase slot), Turkish İ/I casing as the
        # char filter (see functions/turkish.turkish_fold), stop set,
        # then SnowballFilter(TurkishStemmer)
        from .stopsets import TURKISH_STOP_WORDS
        from .turkish import apostrophe_truncate, turkish_stem

        return TURKISH_STOP_WORDS, apostrophe_truncate, turkish_stem
    raise ValueError(f"unknown analyzer {analyzer!r} ({'|'.join(ANALYZERS)})")


def stop_words(analyzer: str = "standard") -> frozenset:
    return _analyzer_chain(analyzer)[0]


def pre_takes_raw(analyzer: str) -> bool:
    """True when the analyzer's PRE transform must see the RAW tokenizer
    match (and do its own lowercasing) instead of the generically
    lowercased token. Irish: IrishLowerCaseFilter's prothesis rule reads
    the original case ('nAthair' -> 'n-athair' but lowercase 'nathair',
    the word for snake, is untouched — IrishLowerCaseFilter.cs:55), and
    the HYPHENATIONS stop + ElisionFilter stages run before it."""
    base, _excl = split_analyzer(analyzer)
    return base == "irish"


def char_filter(analyzer: str):
    """Text-level transform ahead of the tokenizer (the Lucene CharFilter
    stage). Persian: PersianCharFilter.cs replaces ZWNJ with a space —
    1:1, so offsets need no correction. None for every other slot."""
    base, _excl = split_analyzer(analyzer)
    if base == "persian":
        return lambda t: t.replace("\u200c", " ")
    if base == "turkish":
        # TurkishLowerCaseFilter's \u0130/I handling lifted to the text level
        # (letters map to letters, so token boundaries are unchanged)
        from .turkish import turkish_fold

        return turkish_fold
    return None


def stream_filter(analyzer: str):
    """Token-COUNT-changing stream stage applied after the PRE transform
    and BEFORE the stop filter: maps one tokenizer match to the list of
    emitted tokens, each occupying one position slot. Only the cjk slot
    has one (CJKBigramFilter); None elsewhere."""
    base, _excl = split_analyzer(analyzer)
    if base == "cjk":
        from .cjk import cjk_expand

        return cjk_expand
    return None


def elision_articles(analyzer: str = "standard"):
    """The analyzer's ElisionFilter article set (None when the chain has no
    elision stage) — the SQL oracle generators consult this to emit the
    matching pre-stop regexp_replace."""
    base, _excl = split_analyzer(analyzer)
    if base == "french":
        from .lightstem import FRENCH_ARTICLES

        return FRENCH_ARTICLES
    if base == "italian":
        from .lightstem import ITALIAN_ARTICLES

        return ITALIAN_ARTICLES
    if base == "catalan":
        from .snowball import CATALAN_ARTICLES

        return CATALAN_ARTICLES
    return None


def elision_sql(articles) -> str:
    """RE2 pattern stripping `^(article)['’]` — longest-first alternation so
    'jusqu' wins over 'j'. Apply with regexp_replace(tok, pat, '') (first
    match only == ElisionFilter's single strip at the FIRST apostrophe;
    articles contain no apostrophe, so a match is always at the first one)."""
    alts = "|".join(sorted(articles, key=len, reverse=True))
    return f"^({alts})['’]"


def stem_filter(analyzer: str = "standard"):
    """The token-TEXT transform of the analyzer slot (None for "standard"):
    pre-stop elision composed with the post-stop stem — the highlighter
    uses it as the query-term match key, and query parsing runs terms
    through it."""
    _stop, pre, post = _analyzer_chain(analyzer)
    if pre is None:
        return post
    if post is None:
        return pre
    return lambda t: post(pre(t))


def _norm_fn(analyzer: str, pre):
    """lowercase+PRE composition for one raw tokenizer match: raw-pre
    analyzers (see pre_takes_raw) own their lowercasing; caseless slots
    (whitespace/keyword — no LowerCaseFilter in the reference chain) skip
    it; everything else lowercases generically first."""
    caseless = split_analyzer(analyzer)[0] in _CASELESS
    if pre is None:
        return (lambda t: t) if caseless else str.lower
    if pre_takes_raw(analyzer) or caseless:
        return pre
    return lambda t: pre(t.lower())


def _raw_matches(text: str, analyzer: str):
    """(token, start, end) triples of the analyzer's TOKENIZER (before any
    filter): the standard UAX#29 grammar for every language slot, or the
    core-tokenizer slot's own scanner (whitespace/letter runs split at
    255, keyword whole-input, classic grammar + ClassicFilter)."""
    base = split_analyzer(analyzer)[0]
    if base in _CORE_TOKENIZER_BASES:
        yield from _token_triples(text, base)
    else:
        for m in (_TOKEN_RE if _NEEDS_FULL(text) else _SIMPLE_RE).finditer(
            text
        ):
            yield m.group(0), m.start(), m.end()


def _long_drop(analyzer: str) -> bool:
    """True when the tokenizer DROPS >maxTokenLength matches (JFlex
    scanners); CharTokenizer slots split instead and KeywordTokenizer has
    no cap, so they never drop."""
    return split_analyzer(analyzer)[0] not in _NO_LONG_DROP


def tokenize_text(text: str | None, analyzer: str = "standard") -> list[str]:
    """Single-string analyzer chain (used by the pure-Python oracle and tests)."""
    stop, pre, stemf = _analyzer_chain(analyzer)
    if not text:
        return []
    cf = char_filter(analyzer)
    if cf:
        text = cf(text)
    stream = stream_filter(analyzer)
    norm = _norm_fn(analyzer, pre)
    drops = _long_drop(analyzer)
    ov = overlap_expand(analyzer)
    out = []
    for tok, s, e in _raw_matches(text, analyzer):
        if drops and e - s > MAX_TOKEN_LENGTH:
            continue
        low = norm(tok)
        for sub in (stream(low) if stream else (low,)):
            if sub in stop:
                continue
            emitted = stemf(sub) if stemf else sub
            if ov is None:
                out.append(emitted)
            else:
                out.extend(ov(emitted))
    return out


def tokenize_with_positions(
    text: str | None, analyzer: str = "standard"
) -> tuple[list[str], list[int]]:
    """Analyzer chain emitting (tokens, positions).

    Position semantics match the reference chain exactly: every token the
    tokenizer finds occupies one position slot, including tokens the chain
    then drops — too-long tokens bump skippedPositions
    (StandardTokenizer.cs:212,236,248) and StopFilter preserves increments
    (FilteringTokenFilter enablePositionIncrements, mandatory since 4.4) —
    so the position of an emitted token is its 0-based index over ALL raw
    tokenizer matches. len(tokens) stays the normed fieldLength."""
    stop, pre, stemf = _analyzer_chain(analyzer)
    if not text:
        return [], []
    cf = char_filter(analyzer)
    if cf:
        text = cf(text)
    stream = stream_filter(analyzer)
    norm = _norm_fn(analyzer, pre)
    drops = _long_drop(analyzer)
    toks: list[str] = []
    poss: list[int] = []
    if stream is None:
        ov = overlap_expand(analyzer)
        for i, (tok, s, e) in enumerate(_raw_matches(text, analyzer)):
            if drops and e - s > MAX_TOKEN_LENGTH:
                continue
            low = norm(tok)
            if low in stop:
                continue
            emitted = stemf(low) if stemf else low
            if ov is None:
                toks.append(emitted)
                poss.append(i)
            else:
                # same-position expansion (PhoneticFilter): anchor first,
                # overlaps share the slot
                for x in ov(emitted):
                    toks.append(x)
                    poss.append(i)
        return toks, poss
    # stream path (cjk): each EMITTED token consumes one position slot —
    # a skipped raw token consumes the slots its expansion would have
    slot = 0
    for tok, s, e in _raw_matches(text, analyzer):
        if drops and e - s > MAX_TOKEN_LENGTH:
            slot += 1
            continue
        low = norm(tok)
        for sub in stream(low):
            if sub not in stop:
                toks.append(stemf(sub) if stemf else sub)
                poss.append(slot)
            slot += 1
    return toks, poss


def tokenize_with_offsets(
    text: str | None, analyzer: str = "standard"
) -> tuple[list[str], list[int], list[int], list[int]]:
    """Analyzer chain emitting (tokens, positions, start_offsets,
    end_offsets) — the DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS payload
    (FieldInfo.cs:315-356). Offsets are char indexes into the RAW text of
    the tokenizer match (OffsetAttribute start/end, end exclusive), before
    lowercasing — exactly what PostingsHighlighter consumes."""
    stop, pre, stemf = _analyzer_chain(analyzer)
    if not text:
        return [], [], [], []
    cf = char_filter(analyzer)
    if cf:
        text = cf(text)
    stream = stream_filter(analyzer)
    norm = _norm_fn(analyzer, pre)
    toks: list[str] = []
    poss: list[int] = []
    starts: list[int] = []
    ends: list[int] = []
    drops = _long_drop(analyzer)
    it = _raw_matches(text, analyzer)
    if stream is None:
        ov = overlap_expand(analyzer)
        for i, (tok, ms, me) in enumerate(it):
            if drops and me - ms > MAX_TOKEN_LENGTH:
                continue
            low = norm(tok)
            if low in stop:
                continue
            emitted = stemf(low) if stemf else low
            # same-position expansion: overlaps clone the original's
            # offsets (PhoneticFilter CaptureState/RestoreState)
            for x in (ov(emitted) if ov else (emitted,)):
                toks.append(x)
                poss.append(i)
                starts.append(ms)
                ends.append(me)
        return toks, poss, starts, ends
    slot = 0
    for tok, ms, me in it:
        if drops and me - ms > MAX_TOKEN_LENGTH:
            slot += 1
            continue
        low = norm(tok)
        # sub-token offsets are derivable only while the transformed text
        # is length-aligned with the raw match; otherwise every emitted
        # token keeps the whole match's offsets (the reference's
        # "crazy offsets" fallback in CJKBigramFilter.Refill)
        aligned = len(low) == me - ms
        off = 0
        for sub in stream(low):
            if sub not in stop:
                toks.append(stemf(sub) if stemf else sub)
                poss.append(slot)
                if aligned:
                    starts.append(ms + off)
                    ends.append(ms + off + len(sub))
                else:
                    starts.append(ms)
                    ends.append(me)
            # consecutive bigrams overlap by one char; singleton segments
            # advance their full width
            off += max(1, len(sub) - 1) if len(sub) > 1 else len(sub)
            slot += 1
    return toks, poss, starts, ends


def _tokenize_series(texts: pd.Series, analyzer: str = "standard") -> pd.Series:
    # vectorized-enough: one findall per row, list-comp filtering; all work
    # happens inside a single Arrow batch (no Spark-row-level Python).
    if split_analyzer(analyzer)[0] in _CORE_TOKENIZER_BASES:
        # non-standard tokenizer slots: the span-aware single-string chain
        # per row (still one Python pass per Arrow batch)
        return pd.Series(
            [
                tokenize_text(t, analyzer) if isinstance(t, str) else []
                for t in texts
            ],
            index=texts.index,
        )
    stop, pre, stemf = _analyzer_chain(analyzer)
    maxlen = MAX_TOKEN_LENGTH
    cf = char_filter(analyzer)
    stream = stream_filter(analyzer)
    norm = _norm_fn(analyzer, pre)
    findall = (
        _findall if cf is None else (lambda t, _c=cf: _findall(_c(t)))
    )
    if stemf is None:
        def stemf(x):  # noqa: E306 - identity for the standard chain
            return x
    if stream is None:
        ov = overlap_expand(analyzer)
        if ov is not None:
            return pd.Series(
                [
                    [
                        x
                        for tok in findall(t)
                        if len(tok) <= maxlen
                        and (low := norm(tok)) not in stop
                        for x in ov(stemf(low))
                    ]
                    if isinstance(t, str) and t
                    else []
                    for t in texts
                ],
                index=texts.index,
            )
        return pd.Series(
            [
                [
                    stemf(low)
                    for tok in findall(t)
                    if len(tok) <= maxlen
                    and (low := norm(tok)) not in stop
                ]
                if isinstance(t, str) and t
                else []
                for t in texts
            ],
            index=texts.index,
        )
    return pd.Series(
        [
            [
                stemf(sub)
                for tok in findall(t)
                if len(tok) <= maxlen
                for sub in stream(norm(tok))
                if sub not in stop
            ]
            if isinstance(t, str) and t
            else []
            for t in texts
        ],
        index=texts.index,
    )


FILLER = "_"  # ShingleFilter.DEFAULT_FILLER_TOKEN


def shingle_tokens(
    text: str | None, size: int = 2, analyzer: str = "standard"
) -> list[str]:
    """ShingleFilter (Lucene.Net.Analysis.Common/Analysis/Shingle/
    ShingleFilter.cs): token n-grams joined by ' '
    (DEFAULT_TOKEN_SEPARATOR) over the analyzed stream. Stop-filtered /
    too-long position gaps become '_' filler slots (FillerToken inserted
    per skipped posIncrement), including leading gaps; shingles composed
    ONLY of fillers are suppressed (the isAllFiller check). This is the
    outputUnigrams=false shape (the unigram stream is the plain analyzer)."""
    toks, poss = tokenize_with_positions(text, analyzer)
    if not toks:
        return []
    slots = dict(zip(poss, toks))
    last = poss[-1]
    out = []
    for p in range(0, last - size + 2):
        gram = [slots.get(p + i, FILLER) for i in range(size)]
        if all(g == FILLER for g in gram):
            continue
        out.append(" ".join(gram))
    return out


def shingle_udf(size: int = 2, analyzer: str = "standard"):
    """pandas UDF: text:string -> shingles:array<string> (see
    shingle_tokens). One Arrow batch per partition chunk — no per-row
    Python round trips."""

    def batch(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [shingle_tokens(t, size, analyzer) for t in texts],
            index=texts.index,
        )

    return F.pandas_udf(batch, ArrayType(StringType()))


def tokenize_udf(analyzer: str = "standard"):
    """pandas UDF: text:string -> tokens:array<string> (post-stop, lowercase)."""

    def batch(texts: pd.Series) -> pd.Series:
        return _tokenize_series(texts, analyzer)

    return F.pandas_udf(batch, ArrayType(StringType()))


def tokenize_positions_udf():
    """pandas UDF: text -> array<struct<term,pos>> with reference position
    semantics (dropped stop/too-long tokens leave position gaps)."""

    def batch(texts: pd.Series) -> pd.Series:
        rows = []
        for t in texts:
            toks, poss = tokenize_with_positions(t if isinstance(t, str) else None)
            rows.append([{"term": tk, "pos": p} for tk, p in zip(toks, poss)])
        return pd.Series(rows, index=texts.index)

    return F.pandas_udf(batch, "array<struct<term:string,pos:int>>")


def tokens_col(text_col, analyzer: str = "standard"):
    """Column expression: analyzer chain applied to a text column."""
    return tokenize_udf(analyzer)(text_col)


def duckdb_tokens_sql(text_expr: str, analyzer: str = "standard") -> str:
    """DuckDB SQL expression producing the same token array as tokenize_text
    (PRE-stem: the stop-filtered lowercase stream of the named analyzer).

    Used by the __spark_entry__ oracle side so both engines tokenize
    identically. len filter uses 255 like MAX_TOKEN_LENGTH on the RAW token
    (elision runs after it, like the reference's tokenizer-level
    maxTokenLength); stopwords filtered after lower()+elision.

    Core-tokenizer slots: whitespace/simple/stop mirror their
    CharTokenizer (run extraction + the 255-chunk split), keyword mirrors
    whole-input; classic has no generic mirror (its gates carry a
    domain-restricted one) and raises.
    """
    base = split_analyzer(analyzer)[0]
    if base in _CORE_TOKENIZER_BASES:
        if base == "classic":
            raise ValueError(
                "classic has no generic SQL mirror; gates use a "
                "domain-restricted one"
            )
        if base == "keyword":
            return (
                f"CASE WHEN COALESCE({text_expr}, '') <> '' "
                f"THEN [{text_expr}] ELSE CAST([] AS VARCHAR[]) END"
            )
        run_pat = r"[^\s]+" if base == "whitespace" else r"\p{L}+"
        runs = f"regexp_extract_all(COALESCE({text_expr}, ''), '{run_pat}')"
        # CharTokenizer MAX_WORD_LEN=255 chunk split (emit-and-continue)
        chunks = (
            f"flatten(list_transform({runs}, t -> list_transform("
            f"generate_series(1, greatest(1, CAST(ceil(length(t) / 255.0)"
            f" AS BIGINT))), i -> substr(t, CAST((i - 1) * 255 + 1 AS"
            f" BIGINT), 255))))"
        )
        if base == "whitespace":
            return chunks
        lowered = f"list_transform({chunks}, t -> lower(t))"
        if base == "simple":
            return lowered
        stops = ", ".join(f"'{w}'" for w in sorted(ENGLISH_STOP_WORDS))
        return f"list_filter({lowered}, t -> t NOT IN ({stops}))"
    stop_list = ", ".join(f"'{w}'" for w in sorted(stop_words(analyzer)))
    arts = elision_articles(analyzer)
    lowered = (
        f"list_filter(list_transform(regexp_extract_all({text_expr}, "
        f"'{TOKEN_PATTERN_RE2_SQL}'), t -> lower(t)), "
        f"t -> length(t) <= {MAX_TOKEN_LENGTH})"
    )
    if arts is not None:
        pat = elision_sql(arts).replace("'", "''")
        lowered = (
            f"list_transform({lowered}, t -> regexp_replace(t, '{pat}', ''))"
        )
    return f"list_filter({lowered}, t -> t NOT IN ({stop_list}))"
