"""CharFilter stage: text -> text transforms ahead of the tokenizer.

In Spark the CharFilter stage IS a column expression — the engine indexes
any text column, so a user applies these as a transform on the text column
(or composes them with the tokenize UDFs below). Semantics ported from:

  * MappingCharFilter (CharFilter/MappingCharFilter.cs + NormalizeCharMap.cs):
    greedy longest-match scan — at each input position the FST walk keeps
    the LAST final state seen (the longest matching key); on a match the
    key's chars are consumed and the replacement emitted verbatim
    (replacements are never re-scanned); otherwise one char is copied and
    the scan advances. NormalizeCharMap.Builder.Add rejects empty match
    strings and duplicate keys.
  * PatternReplaceCharFilter (Pattern/PatternReplaceCharFilter.cs): the
    WHOLE input is buffered and every pattern match replaced (one
    Regex.Replace per match == a global substitution with group refs).
    Replacement strings here use Python syntax (\\1 / \\g<1>).
"""
from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType


def build_charmap(mappings: dict[str, str]) -> dict[str, str]:
    """NormalizeCharMap.Builder: validate and freeze a mapping table."""
    for k in mappings:
        if k == "":
            raise ValueError("cannot match the empty string")
    return dict(mappings)


def mapping_char_filter(text: str, mappings: dict[str, str]) -> str:
    """MappingCharFilter.cs Read(): greedy longest-match scan."""
    if not mappings:
        return text
    maxlen = max(len(k) for k in mappings)
    out: list[str] = []
    i = 0
    n = len(text)
    while i < n:
        matched = 0
        for ln in range(min(maxlen, n - i), 0, -1):
            if text[i : i + ln] in mappings:
                matched = ln
                break
        if matched:
            out.append(mappings[text[i : i + matched]])
            i += matched
        else:
            out.append(text[i])
            i += 1
    return "".join(out)


def pattern_replace_char_filter(
    text: str, pattern: str | re.Pattern, replacement: str
) -> str:
    """PatternReplaceCharFilter.cs ProcessPattern over the buffered input."""
    pat = re.compile(pattern) if isinstance(pattern, str) else pattern
    return pat.sub(replacement, text)


def mapping_filter_udf(mappings: dict[str, str], analyzer: str = "whitespace"):
    """Char-filter the text, then tokenize with the named analyzer slot."""
    frozen = build_charmap(mappings)

    def batch(texts: pd.Series) -> pd.Series:
        from .analysis import tokenize_text

        return pd.Series(
            [
                tokenize_text(mapping_char_filter(t, frozen), analyzer)
                if isinstance(t, str)
                else []
                for t in texts
            ],
            index=texts.index,
        )

    return F.pandas_udf(batch, ArrayType(StringType()))


def pattern_replace_filter_udf(
    pattern: str, replacement: str, analyzer: str = "whitespace"
):
    def batch(texts: pd.Series) -> pd.Series:
        from .analysis import tokenize_text

        pat = re.compile(pattern)
        return pd.Series(
            [
                tokenize_text(
                    pattern_replace_char_filter(t, pat, replacement), analyzer
                )
                if isinstance(t, str)
                else []
                for t in texts
            ],
            index=texts.index,
        )

    return F.pandas_udf(batch, ArrayType(StringType()))
