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
Documented divergences (irrelevant to the ASCII transcript corpus):
CJK ideographs tokenize as whole runs, not per-character; the exotic
non-ASCII members of the Mid*/ExtendNumLet classes (U+05F4, U+FE13,
fullwidth forms, …) and Extend/Format transparency are not modeled.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType


def _token_pattern(letter: str, digit: str) -> str:
    """UAX#29 word-break regex over the given letter/digit classes.

    Letter runs chain across single MidLetter∪MidNumLet chars flanked by
    letters; digit runs across single MidNum∪MidNumLet chars flanked by
    digits; runs and underscores concatenate. Same construction for the
    Python and RE2 dialects — the language is regular, no lookaround.
    """
    mid_letter = "['‘’.:·]"  # MidLetter (: ·) ∪ MidNumLet (' ‘ ’ .)
    mid_num = "['‘’.,;]"  # MidNum (, ;) ∪ MidNumLet (' ‘ ’ .)
    lrun = f"{letter}+(?:{mid_letter}{letter}+)*"
    nrun = f"{digit}+(?:{mid_num}{digit}+)*"
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
_NEEDS_FULL = re.compile(r"['‘’.:·,;_]").search


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


def _analyzer_chain(analyzer: str):
    """(stopword set, post-stop token transform | None) for the named
    analyzer slot. Each slot mirrors one reference Analyzer's
    CreateComponents chain over the shared StandardTokenizer+LowerCase
    front end; the transform never changes token COUNT or positions —
    only the token text:

    - "standard": StandardAnalyzer.cs (English stops, no stemming)
    - "english":  + PorterStemFilter (Analysis/En/PorterStemFilter.cs)
    - "german":   GermanAnalyzer.cs — snowball German stops,
                  GermanNormalizationFilter + GermanLightStemFilter
    - "swedish":  SwedishAnalyzer.cs — snowball Swedish stops,
                  SwedishLightStemFilter
    """
    if analyzer == "standard":
        return ENGLISH_STOP_WORDS, None
    if analyzer == "english":
        from .porter import porter_stem

        return ENGLISH_STOP_WORDS, porter_stem
    if analyzer == "german":
        from .lightstem import german_chain

        return GERMAN_STOP_WORDS, german_chain
    if analyzer == "swedish":
        from .lightstem import swedish_light_stem

        return SWEDISH_STOP_WORDS, swedish_light_stem
    raise ValueError(
        f"unknown analyzer {analyzer!r} (standard|english|german|swedish)"
    )


def stop_words(analyzer: str = "standard") -> frozenset:
    return _analyzer_chain(analyzer)[0]


def stem_filter(analyzer: str = "standard"):
    """The post-stop token transform of the analyzer slot (None for
    "standard") — the highlighter uses it as the query-term match key."""
    return _analyzer_chain(analyzer)[1]


def _stem_filter(analyzer: str):
    return _analyzer_chain(analyzer)[1]


def tokenize_text(text: str | None, analyzer: str = "standard") -> list[str]:
    """Single-string analyzer chain (used by the pure-Python oracle and tests)."""
    stop, stemf = _analyzer_chain(analyzer)
    if not text:
        return []
    out = []
    for tok in _findall(text):
        if len(tok) > MAX_TOKEN_LENGTH:
            continue
        low = tok.lower()
        if low in stop:
            continue
        out.append(stemf(low) if stemf else low)
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
    stop, stemf = _analyzer_chain(analyzer)
    if not text:
        return [], []
    toks: list[str] = []
    poss: list[int] = []
    for i, tok in enumerate(_findall(text)):
        if len(tok) > MAX_TOKEN_LENGTH:
            continue
        low = tok.lower()
        if low in stop:
            continue
        toks.append(stemf(low) if stemf else low)
        poss.append(i)
    return toks, poss


def tokenize_with_offsets(
    text: str | None, analyzer: str = "standard"
) -> tuple[list[str], list[int], list[int], list[int]]:
    """Analyzer chain emitting (tokens, positions, start_offsets,
    end_offsets) — the DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS payload
    (FieldInfo.cs:315-356). Offsets are char indexes into the RAW text of
    the tokenizer match (OffsetAttribute start/end, end exclusive), before
    lowercasing — exactly what PostingsHighlighter consumes."""
    stop, stemf = _analyzer_chain(analyzer)
    if not text:
        return [], [], [], []
    toks: list[str] = []
    poss: list[int] = []
    starts: list[int] = []
    ends: list[int] = []
    it = (_TOKEN_RE if _NEEDS_FULL(text) else _SIMPLE_RE).finditer(text)
    for i, m in enumerate(it):
        tok = m.group(0)
        if len(tok) > MAX_TOKEN_LENGTH:
            continue
        low = tok.lower()
        if low in stop:
            continue
        toks.append(stemf(low) if stemf else low)
        poss.append(i)
        starts.append(m.start())
        ends.append(m.end())
    return toks, poss, starts, ends


def _tokenize_series(texts: pd.Series, analyzer: str = "standard") -> pd.Series:
    # vectorized-enough: one findall per row, list-comp filtering; all work
    # happens inside a single Arrow batch (no Spark-row-level Python).
    stop, stemf = _analyzer_chain(analyzer)
    maxlen = MAX_TOKEN_LENGTH
    findall = _findall
    if stemf is None:
        def stemf(x):  # noqa: E306 - identity for the standard chain
            return x
    return pd.Series(
        [
            [
                stemf(low)
                for tok in findall(t)
                if len(tok) <= maxlen and (low := tok.lower()) not in stop
            ]
            if isinstance(t, str) and t
            else []
            for t in texts
        ],
        index=texts.index,
    )


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
    identically. len filter uses 255 like MAX_TOKEN_LENGTH; stopwords filtered
    after lower().
    """
    stop_list = ", ".join(f"'{w}'" for w in sorted(stop_words(analyzer)))
    return (
        f"list_filter(list_transform(regexp_extract_all({text_expr}, "
        f"'{TOKEN_PATTERN_RE2_SQL}'), t -> lower(t)), "
        f"t -> length(t) <= {MAX_TOKEN_LENGTH} AND t NOT IN ({stop_list}))"
    )
