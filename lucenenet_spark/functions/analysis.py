"""Analysis chain: StandardAnalyzer-equivalent tokenization, vectorized.

Reference semantics (SURVEY.md §2.2):
- StandardTokenizer (UAX#29-ish word break)      src/Lucene.Net.Analysis.Common/Analysis/Standard/StandardTokenizer.cs:60-105
- maxTokenLength=255 drop rule                   StandardAnalyzer.cs:52
- LowerCaseFilter (Unicode lowercase)            Analysis/Core/LowerCaseFilter.cs:55
- StopFilter with the 33 English stopwords       Analysis/Core/StopFilter.cs; StopAnalyzer.cs:52-55

The whole chain is fused into ONE vectorized pandas UDF (tokenize_udf) —
tokenizer -> lowercase -> stop removal — so ingestion stays Arrow-batched
end to end (no per-row Python at the DataFrame level).

Token grammar (deliberately also expressible in RE2 for the DuckDB oracle):
    [\\p{L}\\p{N}]+(?:\\.[0-9]+)*
i.e. runs of Unicode letters/digits, keeping dot-separated digit groups
attached ("3.14" one token, "foo.bar" two, "c3po" one) — the useful core of
UAX#29 ALPHANUM/NUM without the full JFlex DFA. Documented divergence from
the reference: "a@b.com" yields [a, b, com] here vs [a, b.com] in Lucene.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# Python \w minus underscore == Unicode letters+digits (L* and N*); the
# (?:\.[0-9]+)* tail keeps decimal/version numbers whole like UAX#29 MidNum.
TOKEN_PATTERN = r"[^\W_]+(?:\.[0-9]+)*"
# RE2-compatible equivalent for DuckDB oracle SQL (regexp_extract_all):
TOKEN_PATTERN_RE2 = r"[\p{L}\p{N}]+(?:\.[0-9]+)*"

_TOKEN_RE = re.compile(TOKEN_PATTERN, re.UNICODE)

MAX_TOKEN_LENGTH = 255  # StandardAnalyzer.cs:52 — longer tokens are dropped

# The 33 ENGLISH_STOP_WORDS_SET — StopAnalyzer.cs:52-55
ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)


def tokenize_text(text: str | None) -> list[str]:
    """Single-string analyzer chain (used by the pure-Python oracle and tests)."""
    if not text:
        return []
    out = []
    for tok in _TOKEN_RE.findall(text):
        if len(tok) > MAX_TOKEN_LENGTH:
            continue
        low = tok.lower()
        if low in ENGLISH_STOP_WORDS:
            continue
        out.append(low)
    return out


def tokenize_with_positions(text: str | None) -> tuple[list[str], list[int]]:
    """Analyzer chain emitting (tokens, positions).

    Position semantics match the reference chain exactly: every token the
    tokenizer finds occupies one position slot, including tokens the chain
    then drops — too-long tokens bump skippedPositions
    (StandardTokenizer.cs:212,236,248) and StopFilter preserves increments
    (FilteringTokenFilter enablePositionIncrements, mandatory since 4.4) —
    so the position of an emitted token is its 0-based index over ALL raw
    tokenizer matches. len(tokens) stays the normed fieldLength."""
    if not text:
        return [], []
    toks: list[str] = []
    poss: list[int] = []
    for i, tok in enumerate(_TOKEN_RE.findall(text)):
        if len(tok) > MAX_TOKEN_LENGTH:
            continue
        low = tok.lower()
        if low in ENGLISH_STOP_WORDS:
            continue
        toks.append(low)
        poss.append(i)
    return toks, poss


def tokenize_with_offsets(
    text: str | None,
) -> tuple[list[str], list[int], list[int], list[int]]:
    """Analyzer chain emitting (tokens, positions, start_offsets,
    end_offsets) — the DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS payload
    (FieldInfo.cs:315-356). Offsets are char indexes into the RAW text of
    the tokenizer match (OffsetAttribute start/end, end exclusive), before
    lowercasing — exactly what PostingsHighlighter consumes."""
    if not text:
        return [], [], [], []
    toks: list[str] = []
    poss: list[int] = []
    starts: list[int] = []
    ends: list[int] = []
    for i, m in enumerate(_TOKEN_RE.finditer(text)):
        tok = m.group(0)
        if len(tok) > MAX_TOKEN_LENGTH:
            continue
        low = tok.lower()
        if low in ENGLISH_STOP_WORDS:
            continue
        toks.append(low)
        poss.append(i)
        starts.append(m.start())
        ends.append(m.end())
    return toks, poss, starts, ends


def _tokenize_series(texts: pd.Series) -> pd.Series:
    # vectorized-enough: one findall per row, list-comp filtering; all work
    # happens inside a single Arrow batch (no Spark-row-level Python).
    stop = ENGLISH_STOP_WORDS
    maxlen = MAX_TOKEN_LENGTH
    findall = _TOKEN_RE.findall
    return pd.Series(
        [
            [
                low
                for tok in findall(t)
                if len(tok) <= maxlen and (low := tok.lower()) not in stop
            ]
            if isinstance(t, str) and t
            else []
            for t in texts
        ],
        index=texts.index,
    )


def tokenize_udf():
    """pandas UDF: text:string -> tokens:array<string> (post-stop, lowercase)."""
    return F.pandas_udf(_tokenize_series, ArrayType(StringType()))


def tokens_col(text_col):
    """Column expression: analyzer chain applied to a text column."""
    return tokenize_udf()(text_col)


def duckdb_tokens_sql(text_expr: str) -> str:
    """DuckDB SQL expression producing the same token array as tokenize_text.

    Used by the __spark_entry__ oracle side so both engines tokenize
    identically. len filter uses 255 like MAX_TOKEN_LENGTH; stopwords filtered
    after lower().
    """
    stop_list = ", ".join(f"'{w}'" for w in sorted(ENGLISH_STOP_WORDS))
    return (
        f"list_filter(list_transform(regexp_extract_all({text_expr}, "
        f"'{TOKEN_PATTERN_RE2}'), t -> lower(t)), "
        f"t -> length(t) <= {MAX_TOKEN_LENGTH} AND t NOT IN ({stop_list}))"
    )
