"""NGram / EdgeNGram token filters and the CommonGrams pair, re-derived
from the 4.8 reference:

- NGramTokenFilter.cs (Lucene44 path): per token, grams are emitted
  position-by-position, sizes minGram..maxGram within each position, all
  at the SAME token position; tokens shorter than minGram are removed
  upstream by the wrapping CodepointCountFilter.
- EdgeNGramTokenFilter.cs: front grams of sizes minGram..min(maxGram,
  len); a token shorter than minGram emits nothing (its position
  increment accumulates onto the next token's first gram).
- CommonGrams/CommonGramsFilter.cs: emits every unigram, plus a
  '_'-joined bigram at the PREVIOUS token's position (posIncrement 0)
  whenever either member of an adjacent pair is a common word.
- CommonGrams/CommonGramsQueryFilter.cs: the query-side state machine —
  a pending token is emitted only when the NEXT token is not a gram, and
  the trailing pending token is dropped when the last emission was a
  gram. Verified against every vector in the reference's own
  CommonGramsFilterTest.cs.

CommonGrams runs INSTEAD of stop removal (the common words stay in the
stream), so its entry point tokenizes without the stop filter.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from .analysis import MAX_TOKEN_LENGTH, _findall

SEPARATOR = "_"  # CommonGramsFilter.SEPARATOR


def edge_ngrams(token: str, min_gram: int = 1, max_gram: int = 2) -> list:
    """EdgeNGramTokenFilter.cs FRONT grams, sizes min..min(max, len)."""
    return [
        token[:n]
        for n in range(min_gram, min(max_gram, len(token)) + 1)
    ]


def ngrams(token: str, min_gram: int = 1, max_gram: int = 2) -> list:
    """NGramTokenFilter.cs emission order: positions outer, sizes inner;
    tokens shorter than minGram produce nothing (CodepointCountFilter)."""
    n = len(token)
    if n < min_gram:
        return []
    out = []
    for pos in range(n):
        for g in range(min_gram, max_gram + 1):
            if pos + g > n:
                break
            out.append(token[pos : pos + g])
    return out


def _raw_tokens(text: str) -> list:
    """Lowercased tokenizer stream WITHOUT stop removal (CommonGrams
    replaces stopping; the common words must stay in the stream)."""
    if not isinstance(text, str) or not text:
        return []
    return [
        t.lower() for t in _findall(text) if len(t) <= MAX_TOKEN_LENGTH
    ]


def common_grams(text: str, common: frozenset) -> list:
    """CommonGramsFilter emission as (term, position, is_gram) triples:
    unigrams at 0,1,2,...; each qualifying pair's bigram at the PREVIOUS
    unigram's position (posIncrement 0 in the reference stream)."""
    toks = _raw_tokens(text)
    out = []
    prev = None
    prev_common = False
    pos = -1
    for t in toks:
        is_common = t in common
        if prev is not None and (prev_common or is_common):
            out.append((prev + SEPARATOR + t, pos, True))
        pos += 1
        out.append((t, pos, False))
        prev, prev_common = t, is_common
    return out


def common_grams_query(text: str, common: frozenset) -> list:
    """CommonGramsQueryFilter over the common_grams stream: emit the
    pending token when the CURRENT one is not a gram; at exhaustion the
    pending token is dropped iff the LAST EMITTED token was a gram
    (the reference's previousType-after-RestoreState bookkeeping)."""
    out = []
    previous = None
    last_emitted_gram = False
    for term, _pos, is_gram in common_grams(text, common):
        cur = (term, is_gram)
        if previous is not None and not is_gram:
            out.append(previous[0])
            last_emitted_gram = previous[1]
            previous = cur
            continue
        previous = cur
    if previous is not None and not (out and last_emitted_gram):
        out.append(previous[0])
    return out


def edge_ngram_udf(min_gram: int = 1, max_gram: int = 2):
    """pandas UDF: tokens:array<string> -> edge grams:array<string>."""

    def batch(tok_lists: pd.Series) -> pd.Series:
        return pd.Series(
            [
                [g for t in (toks or []) for g in
                 edge_ngrams(t, min_gram, max_gram)]
                for toks in tok_lists
            ],
            index=tok_lists.index,
        )

    return F.pandas_udf(batch, ArrayType(StringType()))


def ngram_udf(min_gram: int = 1, max_gram: int = 2):
    """pandas UDF: tokens:array<string> -> grams:array<string>."""

    def batch(tok_lists: pd.Series) -> pd.Series:
        return pd.Series(
            [
                [g for t in (toks or []) for g in
                 ngrams(t, min_gram, max_gram)]
                for toks in tok_lists
            ],
            index=tok_lists.index,
        )

    return F.pandas_udf(batch, ArrayType(StringType()))


def common_grams_udf(common: frozenset):
    """pandas UDF: text:string -> the CommonGramsFilter term stream
    (unigrams + '_' bigrams, emission order) as array<string>."""

    def batch(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [[t for t, _p, _g in common_grams(x, common)] for x in texts],
            index=texts.index,
        )

    return F.pandas_udf(batch, ArrayType(StringType()))
