"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: the exact baseline. Dot products via
  F.aggregate/zip_with (pure Catalyst, whole-stage codegen) against a
  broadcast query vector; global top-k via orderBy/limit (per-partition
  heaps + driver merge — the same TopDocs.Merge shape as BM25 top-k).
- LSH-bucketed variant: the scale path. Deterministic sign-bit bucketing on
  leading dimensions partitions the corpus; a query probes only its bucket
  (plus optional neighbor buckets for recall). At 100 TB the bucket column
  becomes the table's physical partition key so a probe is a partition-pruned
  scan. (Production planes would be random/learned projections; deterministic
  leading-dim signs keep the oracle SQL exact.)

Scores are rounded (6 dp) on both engines: double summation order is the
only cross-engine difference and sits far below 1e-6 for unit-scale vectors.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BUCKET_BITS = 3


def _dot(a, b):
    # cast BEFORE multiplying: float32 products would diverge from the
    # oracle's double math by more than the rounding guard
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
    )


def cosine_scores(df: DataFrame, query_vec: list[float], vec_col: str = "embedding"):
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    e = F.col(vec_col)
    return _dot(e, q) / (_norm(e) * _norm(q))


def cosine_topk(
    df: DataFrame, query_vec: list[float], k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine; ties broken by id ascending."""
    return (
        df.select(
            F.col(id_col),
            F.round(cosine_scores(df, query_vec, vec_col), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def cosine_topk_sql(
    query_vec: list[float], k: int = 10, table: str = "embeddings",
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> str:
    q = "[" + ", ".join(repr(float(x)) for x in query_vec) + "]"
    expr = (
        f"round(list_dot_product(CAST({vec_col} AS DOUBLE[]), {q}) / "
        f"(sqrt(list_dot_product(CAST({vec_col} AS DOUBLE[]), CAST({vec_col} AS DOUBLE[]))) * "
        f"sqrt(list_dot_product({q}, {q}))), 6)"
    )
    return (
        f"SELECT {id_col}, {expr} AS cosine FROM {table} "
        f"ORDER BY cosine DESC, {id_col} ASC LIMIT {k}"
    )


def bucket_col(vec_col: str = "embedding"):
    """Deterministic sign-bit bucket over the leading dims (0..2^bits-1)."""
    e = F.col(vec_col)
    b = F.lit(0)
    for i in range(N_BUCKET_BITS):
        b = b + F.when(F.element_at(e, i + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return b


def bucket_histogram(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return (
        df.select(bucket_col(vec_col).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )


def bucket_histogram_sql(table: str = "embeddings", vec_col: str = "embedding") -> str:
    bits = " + ".join(
        f"(CASE WHEN {vec_col}[{i + 1}] > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(N_BUCKET_BITS)
    )
    return (
        f"SELECT ({bits}) AS bucket, count(*) AS n FROM {table} "
        f"GROUP BY 1 ORDER BY bucket"
    )


def lsh_topk(
    df: DataFrame, query_vec: list[float], k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: scan only the query's sign bucket (partition-pruned
    at scale), then exact cosine within it."""
    qb = sum((1 << i) for i in range(N_BUCKET_BITS) if query_vec[i] > 0)
    cand = df.filter(bucket_col(vec_col) == F.lit(qb))
    return cosine_topk(cand, query_vec, k, vec_col, id_col)


def lsh_topk_sql(
    query_vec: list[float], k: int = 10, table: str = "embeddings",
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> str:
    qb = sum((1 << i) for i in range(N_BUCKET_BITS) if query_vec[i] > 0)
    bits = " + ".join(
        f"(CASE WHEN {vec_col}[{i + 1}] > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(N_BUCKET_BITS)
    )
    inner = cosine_topk_sql(query_vec, k, f"(SELECT * FROM {table} WHERE ({bits}) = {qb})", vec_col, id_col)
    return inner


def embedding_near_dup_pairs(
    df: DataFrame, threshold: float = 0.95,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-dup pairs WITHIN sign buckets (the bucket join
    bounds the quadratic blowup; at scale buckets are physical partitions)."""
    withb = df.select(
        F.col(id_col), F.col(vec_col), bucket_col(vec_col).alias("bucket")
    )
    a = withb.alias("a")
    b = withb.alias("b")
    joined = a.join(b, "bucket").filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    cos = _dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")) / (
        _norm(F.col(f"a.{vec_col}")) * _norm(F.col(f"b.{vec_col}"))
    )
    return (
        joined.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(cos, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_near_dup_pairs_sql(
    threshold: float = 0.95, table: str = "embeddings",
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> str:
    bits = " + ".join(
        f"(CASE WHEN {vec_col}[{i + 1}] > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(N_BUCKET_BITS)
    )
    return f"""WITH w AS (
  SELECT {id_col} AS id, CAST({vec_col} AS DOUBLE[]) AS v, ({bits}) AS bucket FROM {table}
)
SELECT a.id AS id_a, b.id AS id_b,
  round(list_dot_product(a.v, b.v) /
        (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
FROM w a JOIN w b ON a.bucket = b.bucket AND a.id < b.id
WHERE round(list_dot_product(a.v, b.v) /
        (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= {threshold}"""
