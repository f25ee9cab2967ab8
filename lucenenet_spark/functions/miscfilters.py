"""Miscellaneous token filters
(Lucene.Net.Analysis.Common/Analysis/Miscellaneous/*).

  * LengthFilter (LengthFilter.cs): a FilteringTokenFilter — keeps tokens
    with min <= length <= max; dropped tokens leave POSITION GAPS
    (enablePositionIncrements default).
  * TruncateTokenFilter (TruncateTokenFilter.cs): cap each (non-keyword)
    token at length n.
  * ReverseStringFilter (Reverse/ReverseStringFilter.cs): reverse each
    token, optionally prepending a marker char (ReversedWildcardFilter's
    U+0001 convention).
  * PatternReplaceFilter (Pattern/PatternReplaceFilter.cs): regex rewrite
    within each token; all=False replaces only the first occurrence.
  * LimitTokenCountFilter (LimitTokenCountFilter.cs): emit only the first
    max_count tokens.
  * KeywordRepeatFilter + RemoveDuplicatesTokenFilter
    (KeywordRepeatFilter.cs, RemoveDuplicatesTokenFilter.cs): each token
    is emitted twice — keyword-marked first, then a stemmable copy at
    position increment 0; after the stemmer, RemoveDuplicates drops the
    copy when (term, position) repeats, so the stream carries
    [original, stem] when the stem differs and [original] otherwise.

Each has a list-level function (token/position streams) and the gate
UDFs compose them; the SQL mirrors are plain DuckDB list expressions.
"""
from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType


def length_filter(
    tokens: list[str], positions: list[int], min_len: int, max_len: int
) -> tuple[list[str], list[int]]:
    keep = [
        (t, p)
        for t, p in zip(tokens, positions)
        if min_len <= len(t) <= max_len
    ]
    return [t for t, _ in keep], [p for _, p in keep]


def truncate_filter(tokens: list[str], length: int) -> list[str]:
    return [t[:length] for t in tokens]


def reverse_filter(tokens: list[str], marker: str | None = None) -> list[str]:
    m = marker or ""
    return [m + t[::-1] for t in tokens]


def pattern_replace_filter(
    tokens: list[str], pattern: str, replacement: str, replace_all: bool = True
) -> list[str]:
    rx = re.compile(pattern)
    count = 0 if replace_all else 1
    return [rx.sub(replacement, t, count=count) for t in tokens]


def limit_token_count(
    tokens: list[str], positions: list[int], max_count: int
) -> tuple[list[str], list[int]]:
    return tokens[:max_count], positions[:max_count]


def keyword_repeat_stream(
    tokens: list[str], positions: list[int], stem
) -> list[tuple[str, int]]:
    """KeywordRepeat -> stem -> RemoveDuplicates over a (token, position)
    stream: original first, the stemmed copy follows at the SAME position
    only when it differs."""
    out: list[tuple[str, int]] = []
    for t, p in zip(tokens, positions):
        out.append((t, p))
        s = stem(t)
        if s != t:
            out.append((s, p))
    return out


def misc_chain_udf(
    min_len: int = 3, max_len: int = 8, trunc: int = 5,
    analyzer: str = "standard",
):
    """Gate chain: LengthFilter(min,max) -> TruncateTokenFilter(trunc) ->
    ReverseStringFilter, emitted terms per doc."""

    def batch(texts: pd.Series) -> pd.Series:
        from .analysis import tokenize_with_positions

        rows = []
        for txt in texts:
            toks, poss = tokenize_with_positions(
                txt if isinstance(txt, str) else None, analyzer
            )
            toks, _poss = length_filter(toks, poss, min_len, max_len)
            toks = truncate_filter(toks, trunc)
            rows.append(reverse_filter(toks))
        return pd.Series(rows, index=texts.index)

    return F.pandas_udf(batch, ArrayType(StringType()))


def pattern_replace_udf(
    pattern: str, replacement: str, analyzer: str = "standard"
):
    def batch(texts: pd.Series) -> pd.Series:
        from .analysis import tokenize_with_positions

        rows = []
        for txt in texts:
            toks, _p = tokenize_with_positions(
                txt if isinstance(txt, str) else None, analyzer
            )
            rows.append(pattern_replace_filter(toks, pattern, replacement))
        return pd.Series(rows, index=texts.index)

    return F.pandas_udf(batch, ArrayType(StringType()))


def keyword_repeat_udf():
    """KeywordRepeat + PorterStemFilter + RemoveDuplicates (the classic
    "index both surface and stem" chain): the stream carries the
    UNstemmed surviving token plus its Porter stem when different. Tokens
    come from the standard chain (the stemmer's input)."""

    def batch(texts: pd.Series) -> pd.Series:
        from .analysis import tokenize_with_positions
        from .porter import porter_stem

        memo: dict[str, str] = {}

        def stem(t: str) -> str:
            if t not in memo:
                memo[t] = porter_stem(t)
            return memo[t]

        rows = []
        for txt in texts:
            toks, poss = tokenize_with_positions(
                txt if isinstance(txt, str) else None, "standard"
            )
            rows.append(
                [w for w, _p in keyword_repeat_stream(toks, poss, stem)]
            )
        return pd.Series(rows, index=texts.index)

    return F.pandas_udf(batch, ArrayType(StringType()))
