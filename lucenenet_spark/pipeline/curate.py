"""Dataset-curation operators for training-data pipelines: PII scrubbing,
deterministic train/val/test splitting, and Gopher-style repetition
metrics.

Like pipeline/textstats.py, everything is pure Catalyst (whole-stage
codegen, no Python in the hot path) with a 1:1 DuckDB oracle SQL builder
per operator — same regexes, same arithmetic, same tie-breaks — so the
gates are value-exact and non-circular.

100 TB design notes:
- pii_scrub and split_assign are single narrow map passes: zero shuffle,
  throughput = scan speed.
- repetition_metrics shuffles once on (doc_id, ngram) — the same key shape
  as the index build's (term, bucket) shuffle, salted by construction
  (doc_id is in the key), so no hot key exists and the reduce is
  map-side-combinable.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import TOKEN_RX, _tokens_sql, raw_tokens

# -- PII scrubbing -------------------------------------------------------------

# Patterns chosen to mean the same thing in Java regex (Spark) and RE2
# (DuckDB): no lookaround, ASCII \d / \b, '-' escaped inside classes.
EMAIL_RX = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RX = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RX = r"\+?\d[\d\- ]{7,}\d"
LONGNUM_RX = r"\d{9,}"

# applied in this order; each count is taken on the text AFTER the previous
# category was replaced (an IP never double-counts as a phone number)
_PII_STAGES = (
    ("emails", EMAIL_RX, "<EMAIL>"),
    ("ips", IPV4_RX, "<IP>"),
    ("phones", PHONE_RX, "<PHONE>"),
    ("longnums", LONGNUM_RX, "<NUM>"),
)


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact emails / IPv4s / phone-shaped numbers / long digit runs with
    typed placeholders. Returns per-doc counts plus md5 of the scrubbed
    text (the gate's value witness — row-identical scrubbing on both
    engines)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    counts = []
    for name, rx, repl in _PII_STAGES:
        counts.append(
            F.size(F.regexp_extract_all(t, F.lit(rx), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
        t = F.regexp_replace(t, rx, repl)
    return df.select(
        F.col(id_col), *counts, F.md5(t).alias("scrubbed_md5")
    )


def pii_scrub_sql(
    table: str = "documents", text: str = "text", id_col: str = "doc_id"
) -> str:
    t = f"coalesce({text}, '')"
    cols = []
    for name, rx, repl in _PII_STAGES:
        cols.append(
            f"CAST(len(regexp_extract_all({t}, '{rx}')) AS BIGINT)"
            f" AS n_{name}"
        )
        t = f"regexp_replace({t}, '{rx}', '{repl}', 'g')"
    return f"""SELECT {id_col},
  {', '.join(cols)},
  md5({t}) AS scrubbed_md5
FROM {table}"""


# -- deterministic train/val/test split ----------------------------------------


def split_assign(
    df: DataFrame,
    salt: str = "v1",
    train: int = 800,
    val: int = 100,
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign each doc to train/val/test by md5(salt:doc_id) mod 1000 —
    stable under re-runs, resharding, and corpus growth (a doc's split
    never changes when other docs arrive), the standard construction for
    held-out splits in dataset pipelines. train/val are per-mille sizes."""
    h = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    bucket = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 1000).alias(
        "bucket"
    )
    return df.select(F.col(id_col), bucket).select(
        F.col(id_col),
        F.col("bucket"),
        F.when(F.col("bucket") < train, F.lit("train"))
        .when(F.col("bucket") < train + val, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def split_assign_sql(
    table: str = "documents",
    salt: str = "v1",
    train: int = 800,
    val: int = 100,
    id_col: str = "doc_id",
) -> str:
    # parse the first 8 md5 hex chars arithmetically (no strtol dependency):
    # fold c -> a*16 + digit(c) over the chars, exactly conv(x, 16, 10)
    h = f"md5('{salt}:' || CAST({id_col} AS VARCHAR))"
    val_expr = (
        f"list_reduce(list_transform(regexp_extract_all(substr({h}, 1, 8),"
        " '.'), c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),"
        " (a, b) -> a * 16 + b)"
    )
    return f"""SELECT {id_col},
  {val_expr} % 1000 AS bucket,
  CASE WHEN {val_expr} % 1000 < {train} THEN 'train'
       WHEN {val_expr} % 1000 < {train + val} THEN 'val'
       ELSE 'test' END AS split
FROM {table}"""


# -- repetition metrics (Gopher rules 2110.14375 §A1.1 shape) --------------------


def repetition_metrics(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 2
) -> DataFrame:
    """Per-doc duplicate-n-gram fraction (fraction of n-gram occurrences
    whose gram appears more than once) and top-n-gram coverage (count of
    the most frequent gram / total grams) — the Gopher repetition-filter
    features. One (doc_id, gram) shuffle; doc_id in the key kills skew."""
    toks = raw_tokens(text_col)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    per_gram = (
        df.select(F.col(id_col), F.explode_outer(grams).alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        per_gram.groupBy(id_col)
        .agg(
            F.sum(F.when(F.col("gram").isNotNull(), F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("n_grams"),
            F.sum(
                F.when(
                    F.col("gram").isNotNull() & (F.col("cnt") > 1), F.col("cnt")
                ).otherwise(0)
            )
            .cast("long")
            .alias("dup_grams"),
            F.max(
                F.when(F.col("gram").isNotNull(), F.col("cnt")).otherwise(0)
            )
            .cast("long")
            .alias("top_cnt"),
        )
        .select(
            F.col(id_col),
            F.col("n_grams"),
            F.round(
                F.when(
                    F.col("n_grams") > 0, F.col("dup_grams") / F.col("n_grams")
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_frac"),
            F.round(
                F.when(
                    F.col("n_grams") > 0, F.col("top_cnt") / F.col("n_grams")
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("top_frac"),
        )
    )


def repetition_metrics_sql(
    table: str = "documents",
    text: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> str:
    toks = _tokens_sql(text)
    gram = " || ' ' || ".join(f"t[i + {j}]" for j in range(n))
    return f"""WITH toks AS (
  SELECT {id_col}, {toks} AS t FROM {table}
),
grams AS (
  SELECT {id_col},
         CASE WHEN len(t) >= {n}
              THEN list_transform(range(1, len(t) - {n} + 2), i -> {gram})
              ELSE CAST([] AS VARCHAR[]) END AS gs
  FROM toks
),
per_gram AS (
  SELECT {id_col}, g.gram, count(*) AS cnt
  FROM grams, unnest(gs) AS g(gram)
  GROUP BY {id_col}, g.gram
),
agg AS (
  SELECT {id_col},
         sum(cnt) AS n_grams,
         sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup_grams,
         max(cnt) AS top_cnt
  FROM per_gram GROUP BY {id_col}
)
SELECT t.{id_col},
  CAST(COALESCE(a.n_grams, 0) AS BIGINT) AS n_grams,
  round(CASE WHEN COALESCE(a.n_grams, 0) > 0
             THEN a.dup_grams / CAST(a.n_grams AS DOUBLE) ELSE 0.0 END, 6)
    AS dup_frac,
  round(CASE WHEN COALESCE(a.n_grams, 0) > 0
             THEN a.top_cnt / CAST(a.n_grams AS DOUBLE) ELSE 0.0 END, 6)
    AS top_frac
FROM toks t LEFT JOIN agg a ON t.{id_col} = a.{id_col}"""
