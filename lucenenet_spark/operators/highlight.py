"""Highlighting + suggest/spellcheck satellites.

Highlighter (re-derivation of Lucene.Net.Highlighter's Highlighter +
SimpleFragmenter + QueryScorer capability, Spark-first): top-k hits are
fetched, each hit's text is re-analyzed (exactly like Lucene's
Highlighter.GetBestFragment re-runs the analyzer over the stored field),
and the best window of `frag_tokens` RAW tokens (lowercased, stopwords
kept for readability — they can never match, matching happens post-
analysis) is selected by (most query-term matches, earliest start). The
snippet is the token slice joined by spaces with matched terms wrapped in
pre/post markers. Defined over the token stream rather than raw char
offsets so the DuckDB oracle can reproduce it exactly.

Suggest / spellcheck (Lucene.Net.Suggest + DirectSpellChecker capability):
- suggest_terms: prefix completion from the terms dictionary ordered by
  document frequency (AnalyzingSuggester's weight-ordered completion,
  with df as the weight).
- spell_suggest: candidate corrections within max_edits Damerau-
  Levenshtein (transpositions count one edit, matching DirectSpellChecker's
  4.8 default distance, DirectSpellChecker.cs LuceneLevenshteinDistance),
  ordered (edits asc, df desc, term asc) — the score-then-frequency
  ordering.
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.analysis import (
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LENGTH,
    TOKEN_PATTERN_RE2,
    _TOKEN_RE,
)
from ..plans.query import Query


def _raw_tokens(text: str) -> list[str]:
    """Lowercased length-filtered tokens INCLUDING stopwords — the same
    position space the index uses (every slot kept)."""
    if not text:
        return []
    return [
        t.lower() for t in _TOKEN_RE.findall(text) if len(t) <= MAX_TOKEN_LENGTH
    ]


def best_window(tokens: list[str], terms: set[str], width: int) -> tuple[int, int]:
    """(start, n_matches) of the best width-token window: most matches,
    earliest start. Start ranges over every token index (clamped)."""
    n = len(tokens)
    if n == 0:
        return 0, 0
    is_match = [1 if t in terms else 0 for t in tokens]
    best_s, best_c = 0, -1
    lim = max(1, n - width + 1)
    run = sum(is_match[0:width])
    for s in range(lim):
        if s > 0:
            run += (is_match[s + width - 1] if s + width - 1 < n else 0) - is_match[s - 1]
        if run > best_c:
            best_s, best_c = s, run
    return best_s, best_c


def highlight_hits(
    hits_with_text: DataFrame,
    query_terms: list[str],
    frag_tokens: int = 16,
    pre: str = "<b>",
    post: str = "</b>",
) -> DataFrame:
    """(docid, score, n_matches, snippet) for each hit row carrying `text`.

    Runs per fetched hit (k rows), not per corpus row — the Highlighter
    re-analysis cost is bounded by k like Lucene's."""
    terms = set(query_terms)

    def frag(it):
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                toks = _raw_tokens(r.text)
                s, c = best_window(toks, terms, frag_tokens)
                window = toks[s : s + frag_tokens]
                snippet = " ".join(
                    pre + t + post if t in terms else t for t in window
                )
                rows.append((int(r.docid), float(r.score), int(c), snippet))
            yield pd.DataFrame(
                rows, columns=["docid", "score", "n_matches", "snippet"]
            ) if rows else pd.DataFrame(
                {
                    "docid": pd.Series(dtype="int64"),
                    "score": pd.Series(dtype="float32"),
                    "n_matches": pd.Series(dtype="int64"),
                    "snippet": pd.Series(dtype="object"),
                }
            )

    return hits_with_text.select("docid", "score", "text").mapInPandas(
        frag, "docid long, score float, n_matches long, snippet string"
    )


def highlight(
    searcher, q: Query, query_terms: list[str], source: DataFrame,
    k: int = 10, **kw,
) -> DataFrame:
    """Search + stored-field fetch + highlight in one call.

    `source` is the original transcript table carrying `text` (the index's
    docs view stores only typed metadata; text bodies live in the source —
    SURVEY §1.1's stored-fields-as-join design). The k hits broadcast into
    the source join, so the big table is probed, never shuffled."""
    hits = searcher.search(q, k)
    keyed = searcher.fetch(hits, hits_bound=k).select(
        "docid", "score", "conv_id", "turn_idx"
    )
    withtext = source.select("conv_id", "turn_idx", "text").join(
        F.broadcast(keyed), ["conv_id", "turn_idx"]
    )
    return highlight_hits(withtext, query_terms, **kw)


def highlight_sql(
    term: str, k: int = 10, frag_tokens: int = 16,
    pre: str = "<b>", post: str = "</b>",
) -> str:
    """DuckDB oracle for highlight() over a single-term query: the same
    raw-token window selection and marking, computed relationally from the
    scored top-k (prelude's `scored` CTE supplies the hits)."""
    raw = (
        f"list_filter(list_transform(regexp_extract_all(COALESCE(d.text, ''), "
        f"'{TOKEN_PATTERN_RE2}'), t -> lower(t)), t -> length(t) <= {MAX_TOKEN_LENGTH})"
    )
    return f"""topk AS (
  SELECT docid, s AS score FROM scored WHERE term = '{term}'
  ORDER BY s DESC, docid ASC LIMIT {k}
),
hl_toks AS (
  SELECT t.docid, t.score, {raw} AS raw
  FROM topk t JOIN docs d ON t.docid = d.docid
),
wins AS (
  SELECT docid, score, raw, s,
         len(list_filter(raw[s : s + {frag_tokens} - 1], x -> x = '{term}')) AS c
  FROM hl_toks,
       LATERAL (SELECT unnest(generate_series(1, greatest(1, len(raw) - {frag_tokens} + 1))) AS s)
),
best AS (
  SELECT docid, score, raw, s, c
  FROM (SELECT *, row_number() OVER (PARTITION BY docid ORDER BY c DESC, s ASC) AS rk FROM wins)
  WHERE rk = 1
)
SELECT docid, CAST(score AS REAL) AS score, CAST(c AS BIGINT) AS n_matches,
       array_to_string(
         list_transform(raw[s : s + {frag_tokens} - 1],
                        x -> CASE WHEN x = '{term}' THEN '{pre}' || x || '{post}' ELSE x END),
         ' ') AS snippet
FROM best"""


# ---------------------------------------------------------------------------
# Suggest / spellcheck over the terms dictionary
# ---------------------------------------------------------------------------


def suggest_terms(searcher, prefix: str, k: int = 10) -> DataFrame:
    """Prefix completion: (term, df) ordered df desc, term asc."""
    return (
        searcher.term_stats()
        .filter(F.col("field") == "text")
        .filter(F.col("term").startswith(prefix))
        .select("term", F.col("df").cast("long").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
    )


def suggest_terms_sql(prefix: str, k: int = 10) -> str:
    return f"""SELECT term, CAST(df AS BIGINT) AS df FROM tstats
WHERE term LIKE '{prefix}%'
ORDER BY df DESC, term ASC LIMIT {k}"""


def spell_suggest(searcher, word: str, max_edits: int = 2, k: int = 5) -> DataFrame:
    """Corrections within max_edits Damerau-Levenshtein, ordered
    (edits asc, df desc, term asc) — DirectSpellChecker's score-then-
    frequency ordering with its transposition-aware distance; the length
    band prunes the terms-dict scan exactly like the fuzzy rewrite."""
    from .search import _with_dl_edits

    lo, hi = len(word) - max_edits, len(word) + max_edits
    banded = (
        searcher.term_stats()
        .filter(F.col("field") == "text")
        .filter(F.length("term").between(lo, hi))
    )
    return (
        _with_dl_edits(banded, word)
        .filter((F.col("edits") <= max_edits) & (F.col("edits") > 0))
        .select("term", "edits", F.col("df").cast("long").alias("df"))
        .orderBy(F.asc("edits"), F.desc("df"), F.asc("term"))
        .limit(k)
    )


def spell_suggest_sql(word: str, max_edits: int = 2, k: int = 5) -> str:
    lo, hi = len(word) - max_edits, len(word) + max_edits
    return f"""SELECT term, CAST(edits AS INT) AS edits, CAST(df AS BIGINT) AS df FROM (
  SELECT term, damerau_levenshtein(term, '{word}') AS edits, df
  FROM tstats WHERE length(term) BETWEEN {lo} AND {hi}
) WHERE edits <= {max_edits} AND edits > 0
ORDER BY edits ASC, df DESC, term ASC LIMIT {k}"""
