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
