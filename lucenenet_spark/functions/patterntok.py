"""PatternTokenizer (Analysis/Pattern/PatternTokenizer.cs).

group >= 0: emit capture group `group` of each successive match,
skipping zero-length captures. group < 0: String.split semantics —
the text between matches, empty tokens dropped, plus the trailing
remainder.
"""
from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType


def pattern_tokenize(
    text: str, pattern: str | re.Pattern, group: int = -1
) -> list[tuple[str, int, int]]:
    """(token, start_offset, end_offset) rows."""
    pat = re.compile(pattern) if isinstance(pattern, str) else pattern
    out: list[tuple[str, int, int]] = []
    if group >= 0:
        for m in pat.finditer(text):
            s, e = m.start(group), m.end(group)
            if e > s:
                out.append((text[s:e], s, e))
        return out
    idx = 0
    for m in pat.finditer(text):
        if m.start() - idx > 0:
            out.append((text[idx : m.start()], idx, m.start()))
        idx = m.end()
    if len(text) - idx > 0:
        out.append((text[idx:], idx, len(text)))
    return out


def pattern_tokenizer_udf(pattern: str, group: int = -1):
    def batch(texts: pd.Series) -> pd.Series:
        pat = re.compile(pattern)
        return pd.Series(
            [
                [t for t, _s, _e in pattern_tokenize(x, pat, group)]
                if isinstance(x, str)
                else []
                for x in texts
            ],
            index=texts.index,
        )

    return F.pandas_udf(batch, ArrayType(StringType()))
