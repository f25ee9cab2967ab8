"""Miscellaneous token filters, wave 3 (round 5p).

  * StemmerOverrideFilter (Miscellaneous/StemmerOverrideFilter.cs): a
    term matching the override map is replaced by its override AND marked
    keyword, so a downstream stemmer skips it; already-keyworded terms
    are left alone ("don't muck with already-keyworded terms").
  * KeywordMarkerFilter (Miscellaneous/KeywordMarkerFilter.cs +
    SetKeywordMarkerFilter.cs / PatternKeywordMarkerFilter.cs): marks
    matching terms keyword so stemmers skip them.
  * CodepointCountFilter (Miscellaneous/CodepointCountFilter.cs): accept
    when min <= codePointCount <= max (a FilteringTokenFilter — dropped
    tokens leave position gaps). Python strings count code points
    natively, so len() IS CodePointCount.
  * LimitTokenPositionFilter (Miscellaneous/LimitTokenPositionFilter.cs):
    emit while the cumulative position (sum of increments) stays
    <= maxTokenPosition; the first token's increment counts.
"""
from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType


def stemmer_override_stream(
    tokens: list[str],
    overrides: dict[str, str],
    stem_fn,
    keyword_set: frozenset = frozenset(),
    keyword_pattern: str | None = None,
) -> list[str]:
    """KeywordMarker (set and/or pattern) -> StemmerOverride -> stemmer:
    the standard protected-words chain. Marked or overridden terms skip
    the stemmer; everything else stems."""
    pat = re.compile(keyword_pattern) if keyword_pattern else None
    out = []
    for t in tokens:
        keyword = t in keyword_set or (pat is not None and pat.search(t))
        if not keyword and t in overrides:
            t = overrides[t]
            keyword = True
        out.append(t if keyword else stem_fn(t))
    return out


def codepoint_count_filter(
    tokens: list[str], positions: list[int], min_cp: int, max_cp: int
) -> tuple[list[str], list[int]]:
    """CodepointCountFilter.cs Accept() (len == code-point count here)."""
    kept = [
        (t, p) for t, p in zip(tokens, positions) if min_cp <= len(t) <= max_cp
    ]
    return [t for t, _ in kept], [p for _, p in kept]


def limit_token_position(
    tokens: list[str], positions: list[int], max_token_position: int
) -> tuple[list[str], list[int]]:
    """LimitTokenPositionFilter.cs: keep while cumulative position
    (0-based slot + 1, since every slot's increment is 1 at the
    tokenizer) stays <= maxTokenPosition."""
    kept = [
        (t, p) for t, p in zip(tokens, positions) if p + 1 <= max_token_position
    ]
    return [t for t, _ in kept], [p for _, p in kept]


def stemmer_override_udf(
    overrides: dict[str, str],
    keyword_set: frozenset = frozenset(),
    analyzer: str = "standard",
):
    """standard chain -> keyword marker -> override -> Porter."""

    def batch(texts: pd.Series) -> pd.Series:
        from .analysis import tokenize_text
        from .porter import porter_stem

        return pd.Series(
            [
                stemmer_override_stream(
                    tokenize_text(t, analyzer),
                    overrides,
                    porter_stem,
                    keyword_set,
                )
                if isinstance(t, str)
                else []
                for t in texts
            ],
            index=texts.index,
        )

    return F.pandas_udf(batch, ArrayType(StringType()))


def codepoint_limit_udf(
    min_cp: int, max_cp: int, max_token_position: int
):
    """whitespace tokens -> CodepointCountFilter -> LimitTokenPosition.

    The codepoint filter preserves position gaps (FilteringTokenFilter),
    so the position limit cuts by RAW slot index even after drops."""

    def batch(texts: pd.Series) -> pd.Series:
        from .analysis import tokenize_with_positions

        def one(t):
            toks, poss = tokenize_with_positions(t, "whitespace")
            toks, poss = codepoint_count_filter(toks, poss, min_cp, max_cp)
            return limit_token_position(toks, poss, max_token_position)[0]

        return pd.Series(
            [one(t) if isinstance(t, str) else [] for t in texts],
            index=texts.index,
        )

    return F.pandas_udf(batch, ArrayType(StringType()))
