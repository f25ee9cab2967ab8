"""AnalyzingSuggester: analyzed-form, weight-ordered completion.

Reference: Lucene.Net.Suggest/Suggest/Analyzing/AnalyzingSuggester.cs —
each (surface, weight) input is analyzed; lookups analyze the query text
and return the surface forms whose ANALYZED form starts with the analyzed
query, ordered by weight descending. Duplicate surface forms keep their
max weight; the analyzed form uses a separator between tokens
(preserveSep=true default). FuzzySuggester (FuzzySuggester.cs) layers an
edit-distance expansion over the same automaton; here the analyzed-prefix
channel plus the spell_suggest machinery covers that shape.

Spark-first: the suggester is a tiny parquet channel (akey, surface,
weight) RANGE-SORTED by akey — a lookup is `akey >= p AND akey < p +
U+10FFFF`, a pushed-down range predicate over sorted row groups (the FST
analogue: prefix lookup never scans the whole table), then a
TakeOrdered(weight desc, surface asc). At 10^9 entries the channel
partitions by akey range exactly like the terms dictionary.
"""
from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEP = " "  # analyzed-form token separator (preserveSep=true)
_HI = "\U0010ffff"


def analyzed_key(text: str, analyzer: str = "standard") -> str:
    from ..functions.analysis import tokenize_text

    return SEP.join(tokenize_text(text, analyzer))


def build_analyzing_suggester(
    spark: SparkSession,
    entries: DataFrame,
    out_dir: str,
    analyzer: str = "standard",
    surface_col: str = "surface",
    weight_col: str = "weight",
) -> str:
    """Materialize the suggest channel from (surface, weight) rows.
    Duplicate surfaces keep max weight (AnalyzingSuggester dedups surface
    forms per analyzed form). Sorted by akey so lookups range-prune."""
    from ..functions.analysis import tokenize_udf

    akey = F.array_join(tokenize_udf(analyzer)(F.col(surface_col)), SEP)
    deduped = (
        entries.select(
            F.col(surface_col).alias("surface"),
            F.col(weight_col).cast("long").alias("weight"),
        )
        .groupBy("surface")
        .agg(F.max("weight").alias("weight"))
    )
    (
        deduped.withColumn("akey", akey)
        .filter(F.col("akey") != "")
        .repartitionByRange(
            max(spark.sparkContext.defaultParallelism // 4, 1), "akey"
        )
        .sortWithinPartitions("akey")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "suggest"))
    )
    meta = {"analyzer": analyzer}
    tmp = os.path.join(out_dir, "_suggest_meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(out_dir, "_suggest_meta.json"))
    return out_dir


def prefix_dl(query: str, key: str, max_edits: int) -> int:
    """Prefix Damerau-Levenshtein: min over prefixes p of `key` of
    DL(query, p) — the FuzzySuggester automaton-intersection contract (a
    completion matches when SOME prefix of its analyzed form is within
    the edit budget of the analyzed query). Prefixes longer than
    len(query)+max_edits cannot qualify, so the scan is bounded."""
    from .search import dl_distance

    hi = min(len(key), len(query) + max_edits)
    return min(dl_distance(query, key[:j]) for j in range(hi + 1))


def fuzzy_lookup(
    spark: SparkSession, suggester_dir: str, query: str, k: int = 10,
    max_edits: int = 1, non_fuzzy_prefix: int = 1, min_fuzzy_length: int = 4,
) -> DataFrame:
    """FuzzySuggester (Suggest/Analyzing/FuzzySuggester.cs defaults:
    maxEdits=1, transpositions=true, nonFuzzyPrefix=1, minFuzzyLength=4):
    completions whose analyzed form extends the analyzed query within the
    edit budget. The first non_fuzzy_prefix chars must match exactly (that
    band stays a pushed-down range predicate); queries shorter than
    min_fuzzy_length match exactly. Ordered weight desc, surface asc."""
    import pandas as pd

    with open(os.path.join(suggester_dir, "_suggest_meta.json")) as f:
        analyzer = json.load(f)["analyzer"]
    p = analyzed_key(query, analyzer)
    if len(p) < min_fuzzy_length or max_edits == 0:
        return analyzing_lookup(spark, suggester_dir, query, k)
    df = spark.read.parquet(os.path.join(suggester_dir, "suggest"))
    band = p[:non_fuzzy_prefix]
    if band:
        df = df.filter((F.col("akey") >= band) & (F.col("akey") < band + _HI))
    me = int(max_edits)

    def match(it):
        for pdf in it:
            if not len(pdf):
                continue
            keep = [
                prefix_dl(p, a, me) <= me for a in pdf["akey"]
            ]
            out = pdf[pd.Series(keep, index=pdf.index)]
            if len(out):
                yield out[["surface", "weight"]]

    cand = df.mapInPandas(match, "surface string, weight long")
    return cand.orderBy(F.desc("weight"), F.asc("surface")).limit(k)


def analyzing_lookup(
    spark: SparkSession, suggester_dir: str, query: str, k: int = 10
) -> DataFrame:
    """Top-k completions: surface forms whose analyzed form starts with the
    analyzed query, ordered weight desc then surface asc (the reference's
    weight-ordered FST traversal, deterministic tie-break)."""
    with open(os.path.join(suggester_dir, "_suggest_meta.json")) as f:
        analyzer = json.load(f)["analyzer"]
    p = analyzed_key(query, analyzer)
    df = spark.read.parquet(os.path.join(suggester_dir, "suggest"))
    if p:
        df = df.filter((F.col("akey") >= p) & (F.col("akey") < p + _HI))
    return (
        df.select("surface", "weight")
        .orderBy(F.desc("weight"), F.asc("surface"))
        .limit(k)
    )


ALPHA = 0.4  # FreeTextSuggester.ALPHA (stupid-backoff multiplier)


def freetext_suggest(
    docs_df: DataFrame,
    context: str,
    k: int = 10,
    analyzer: str = "standard",
    text_col: str = "text",
    alpha: float = ALPHA,
) -> DataFrame:
    """FreeTextSuggester (Lucene.Net.Suggest/Suggest/Analyzing/
    FreeTextSuggester.cs, default grams=2): complete the LAST (partial)
    context token from an n-gram LM over the corpus token stream, scored
    by stupid backoff (:57 ALPHA):

      score(t | w1) = c(w1 t) / c(w1)          when the bigram exists
                    = ALPHA * c(t) / totTokens  otherwise (backoff)
      single-token context: score(t) = c(t) / totTokens (no backoff step)

    A candidate found at the higher order never re-enters from backoff
    (the reference's seen set). Bigrams are consecutive-POSITION token
    pairs via the same ShingleFilter the reference wraps its stream in —
    a stop-filtered gap breaks adjacency exactly like its '_' filler
    shingles (a filler gram never matches a real token).

    Deviation (documented): returns the double backoff score (round 6)
    instead of the reference's (long)(long.MaxValue * score) weight
    scaling — identical ordering, exactly comparable.

    Scale shape: the unigram pass is one explode+agg; the bigram pass
    filters to pairs starting with w1 BEFORE counting, so the shuffle is
    O(c(w1)) + O(|prefix vocabulary|), never O(corpus pairs). At
    warehouse scale you would materialize the gram tables once (like the
    analyzing-suggester channel) instead of re-deriving per lookup.
    """
    from ..functions.analysis import shingle_udf, tokenize_text, tokenize_udf

    ctx = tokenize_text(context, analyzer)
    if not ctx:
        raise ValueError("suggest context analyzed to no tokens")
    prefix = ctx[-1]
    w1 = ctx[-2] if len(ctx) >= 2 else None

    uni = (
        docs_df.select(F.explode(tokenize_udf(analyzer)(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c1"))
    )
    tot = uni.agg(F.sum("c1").alias("T"))
    cand = uni.filter(F.col("term").startswith(prefix))
    if w1 is None:
        out = cand.crossJoin(F.broadcast(tot)).select(
            F.col("term").alias("token"),
            F.round(F.col("c1").cast("double") / F.col("T").cast("double"), 6)
            .alias("score"),
        )
        return out.orderBy(F.desc("score"), F.asc("token")).limit(k)

    grams = docs_df.select(
        F.explode(shingle_udf(2, analyzer)(F.col(text_col))).alias("g")
    ).select(F.split(F.col("g"), " ").alias("ab"))
    big = (
        grams.select(
            F.col("ab")[0].alias("a"), F.col("ab")[1].alias("b")
        )
        .filter((F.col("a") == w1) & F.col("b").startswith(prefix))
        .filter(F.col("b") != "_")
        .groupBy(F.col("b").alias("term"))
        .agg(F.count("*").alias("c2"))
    )
    cw = uni.filter(F.col("term") == w1).agg(F.sum("c1").alias("c1w"))
    out = (
        cand.join(big, "term", "left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(cw))
        .select(
            F.col("term").alias("token"),
            F.round(
                F.when(
                    F.col("c2").isNotNull(),
                    F.col("c2").cast("double") / F.col("c1w").cast("double"),
                ).otherwise(
                    F.lit(float(alpha))
                    * F.col("c1").cast("double")
                    / F.col("T").cast("double")
                ),
                6,
            ).alias("score"),
        )
    )
    return out.orderBy(F.desc("score"), F.asc("token")).limit(k)


def _infix_query_parts(key: str, analyzer: str = "standard"):
    """AnalyzingInfixSuggester.DoLookup's query-side analysis: every token
    but the last is an exact term; the last is a PREFIX unless the key
    ends in discarded chars (maxEndOffset == ts.End()'s offset — i.e. the
    last token runs to the end of the key), in which case it is exact
    too. Returns (exact_tokens, prefix_token_or_None)."""
    from ..functions.analysis import tokenize_with_offsets

    toks, _poss, _starts, ends = tokenize_with_offsets(key, analyzer)
    if not toks:
        return [], None
    if ends[-1] == len(key):
        return list(toks[:-1]), toks[-1]
    return list(toks), None


def infix_lookup(
    entries: DataFrame,
    key: str,
    k: int = 10,
    all_terms_required: bool = True,
    analyzer: str = "standard",
    surface_col: str = "surface",
    weight_col: str = "weight",
) -> DataFrame:
    """AnalyzingInfixSuggester (Suggest/Analyzing/
    AnalyzingInfixSuggester.cs DoLookup): suggestions whose analyzed text
    contains every query token (allTermsRequired -> MUST, else SHOULD =
    at least one), the last query token matching as a prefix of ANY
    suggestion token when the key has no trailing discarded chars.
    Matches sort by weight desc — the suggester ignores scores
    (AnalyzingInfixSuggester.cs "Sort by weight, descending"); surface
    asc is this engine's deterministic tie-break. Output
    (surface, weight)."""
    from ..functions.analysis import tokenize_udf

    exact, prefix = _infix_query_parts(key, analyzer)
    df = entries.select(
        F.col(surface_col).alias("surface"),
        F.col(weight_col).cast("long").alias("weight"),
        tokenize_udf(analyzer)(F.col(surface_col)).alias("_toks"),
    )
    conds = [F.array_contains("_toks", t) for t in exact]
    if prefix is not None:
        conds.append(
            F.exists(F.col("_toks"), lambda x: x.startswith(F.lit(prefix)))
        )
    if not conds:
        return df.select("surface", "weight").limit(0)
    cond = conds[0]
    for c in conds[1:]:
        cond = (cond & c) if all_terms_required else (cond | c)
    return (
        df.filter(cond)
        .select("surface", "weight")
        .orderBy(F.desc("weight"), F.asc("surface"))
        .limit(k)
    )


def blended_infix_lookup(
    entries: DataFrame,
    key: str,
    k: int = 10,
    blender: str = "linear",
    num_factor: int = 10,
    analyzer: str = "standard",
    surface_col: str = "surface",
    weight_col: str = "weight",
) -> DataFrame:
    """BlendedInfixSuggester (Suggest/Analyzing/BlendedInfixSuggester.cs):
    take the top num*numFactor infix matches by weight, then re-score by
    the position of the FIRST matching token in the suggestion's analyzed
    stream — coefficient 1 when the raw text startswith the raw key,
    else POSITION_LINEAR 1 - 0.10*position or POSITION_RECIPROCAL
    1/(position+1); score = (long)(weight * coefficient), truncation
    toward zero like the C# cast. Final order mirrors LOOKUP_COMP
    reversed: score desc, then surface DESC (the comparator sorts
    ascending on (value, key) and the result list is reversed). Output
    (surface, score)."""
    if blender not in ("linear", "reciprocal"):
        raise ValueError(f"unknown blender {blender!r}")
    from ..functions.analysis import tokenize_positions_udf

    exact, prefix = _infix_query_parts(key, analyzer)
    base = infix_lookup(
        entries, key, k * num_factor, True, analyzer, surface_col, weight_col
    )
    tp = tokenize_positions_udf()(F.col("surface"))
    matched = F.filter(
        tp,
        lambda x: (
            x["term"].isin(exact) | x["term"].startswith(F.lit(prefix))
            if prefix is not None
            else x["term"].isin(exact) if exact else F.lit(False)
        ),
    )
    pos = F.array_min(F.transform(matched, lambda x: x["pos"]))
    if blender == "linear":
        coef = F.lit(1.0) - F.lit(0.10) * pos.cast("double")
    else:
        coef = F.lit(1.0) / (pos.cast("double") + F.lit(1.0))
    coef = F.when(F.col("surface").startswith(F.lit(key)), F.lit(1.0)).otherwise(coef)
    score = (F.col("weight").cast("double") * coef).cast("long")
    return (
        base.withColumn("score", score)
        .select("surface", "score")
        .orderBy(F.desc("score"), F.desc("surface"))
        .limit(k)
    )
