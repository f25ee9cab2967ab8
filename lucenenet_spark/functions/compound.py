"""DictionaryCompoundWordTokenFilter (Analysis/Compound/
DictionaryCompoundWordTokenFilter.cs + CompoundWordTokenFilterBase.cs).

The base filter always emits the original token (its position increment
untouched), then every subword at position increment 0. Decompose() scans
each start offset i and emits every dictionary substring of length
minSubwordSize..maxSubwordSize (onlyLongestMatch keeps only the longest
per start). Dictionary lookups are case-insensitive (CharArraySet
ignoreCase, the factory default for the Danish/German tests); the emitted
subword keeps the ORIGINAL token's characters. Tokens shorter than
minWordSize never decompose.

HyphenationCompoundWordTokenFilter is a documented non-goal: its
hyphenator consumes the TeX/OFFO hyphenation pattern XML resources —
resource-file rule engines this engine cannot re-derive from public
rules (same class as BeiderMorse/ThaiAnalyzer).
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

DEFAULT_MIN_WORD_SIZE = 5
DEFAULT_MIN_SUBWORD_SIZE = 2
DEFAULT_MAX_SUBWORD_SIZE = 15


def dictionary_compound(
    token: str,
    dictionary: frozenset,
    min_word_size: int = DEFAULT_MIN_WORD_SIZE,
    min_subword_size: int = DEFAULT_MIN_SUBWORD_SIZE,
    max_subword_size: int = DEFAULT_MAX_SUBWORD_SIZE,
    only_longest_match: bool = False,
) -> list[str]:
    """[original, subword, subword, ...] for one token (subwords at
    position increment 0). `dictionary` must hold LOWERCASE entries."""
    out = [token]
    if len(token) < min_word_size:
        return out
    low = token.lower()
    for i in range(0, len(token) - min_subword_size + 1):
        longest = -1
        for j in range(min_subword_size, max_subword_size + 1):
            if i + j > len(token):
                break
            if low[i : i + j] in dictionary:
                if only_longest_match:
                    if j > longest:
                        longest = j
                else:
                    out.append(token[i : i + j])
        if only_longest_match and longest > 0:
            out.append(token[i : i + longest])
    return out


def compound_stream(
    tokens: list[str], dictionary: frozenset, **kw
) -> list[str]:
    return [s for t in tokens for s in dictionary_compound(t, dictionary, **kw)]


def compound_udf(
    dictionary: frozenset, analyzer: str = "whitespace", **kw
):
    frozen = frozenset(w.lower() for w in dictionary)

    def batch(texts: pd.Series) -> pd.Series:
        from .analysis import tokenize_text

        return pd.Series(
            [
                compound_stream(tokenize_text(t, analyzer), frozen, **kw)
                if isinstance(t, str)
                else []
                for t in texts
            ],
            index=texts.index,
        )

    return F.pandas_udf(batch, ArrayType(StringType()))
