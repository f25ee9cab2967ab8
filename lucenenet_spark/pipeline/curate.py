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
- strip_boilerplate shuffles twice (line-hash df count, then the per-doc
  regroup) on bounded keys; the line-stats join is a plain shuffle join —
  no broadcast of the (unbounded) hot-line set anywhere.
- unigram_logprob joins postings to term stats on the term key — the same
  skew shape the BM25 scorer already handles (AQE skew-join covers the hot
  terms); the per-doc fold is ordered so both engines accumulate the
  float sum in term order.
- stratified_sample is a single narrow map pass like split_assign.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
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


# -- line-level boilerplate removal (CCNet / RefinedWeb shape) -------------------


def strip_boilerplate(
    df: DataFrame,
    min_df: int = 30,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove lines whose normalized form (lower+trim) appears in >= min_df
    DISTINCT documents — the standard line-level boilerplate filter
    (navigation chrome, footers, license banners). A line repeated within
    one doc counts once toward its df; kept lines rejoin in original order.

    Returns (doc_id, n_lines, n_kept, cleaned_md5) where cleaned_md5 hashes
    the kept lines joined with newlines (the gate's value witness).
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")).alias(
            "pos", "line"
        ),
    ).withColumn("lh", F.md5(F.lower(F.trim(F.col("line")))))
    line_df = lines.groupBy("lh").agg(
        F.countDistinct(id_col).alias("line_docs")
    )
    kept = (
        lines.join(line_df, "lh")
        .filter(F.col("line_docs") < min_df)
        .groupBy(id_col)
        .agg(
            F.sort_array(F.collect_list(F.struct("pos", "line"))).alias("xs")
        )
    )
    n_lines = df.select(
        F.col(id_col),
        F.size(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n"))
        .cast("long")
        .alias("n_lines"),
    )
    return (
        n_lines.join(kept, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_lines"),
            F.coalesce(F.size("xs"), F.lit(0)).cast("long").alias("n_kept"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.coalesce(
                            F.col("xs"),
                            F.array().cast("array<struct<pos:int,line:string>>"),
                        ),
                        lambda x: x["line"],
                    ),
                    "\n",
                )
            ).alias("cleaned_md5"),
        )
    )


def strip_boilerplate_sql(
    table: str = "documents",
    min_df: int = 30,
    text: str = "text",
    id_col: str = "doc_id",
) -> str:
    return f"""WITH lines AS (
  SELECT {id_col},
         generate_subscripts(string_split(coalesce({text}, ''), chr(10)), 1) AS pos,
         unnest(string_split(coalesce({text}, ''), chr(10))) AS line
  FROM {table}
),
hashed AS (SELECT {id_col}, pos, line, md5(lower(trim(line))) AS lh FROM lines),
line_df AS (SELECT lh, count(DISTINCT {id_col}) AS line_docs FROM hashed GROUP BY lh),
kept AS (
  SELECT h.{id_col}, list(h.line ORDER BY h.pos) AS xs
  FROM hashed h JOIN line_df d ON h.lh = d.lh
  WHERE d.line_docs < {min_df}
  GROUP BY h.{id_col}
)
SELECT t.{id_col},
  CAST(len(string_split(coalesce(t.{text}, ''), chr(10))) AS BIGINT) AS n_lines,
  CAST(COALESCE(len(k.xs), 0) AS BIGINT) AS n_kept,
  md5(array_to_string(COALESCE(k.xs, CAST([] AS VARCHAR[])), chr(10))) AS cleaned_md5
FROM {table} t LEFT JOIN kept k ON t.{id_col} = k.{id_col}"""


# -- corpus-unigram LM surprisal (CCNet-style quality signal) --------------------


def unigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc mean surprisal (bits/token) under the corpus's own add-one-
    smoothed unigram model: p(t) = (c(t)+1) / (T+V). Low bits = text made
    of common corpus tokens; high bits = rare-token-heavy text — the same
    signal CCNet reads off a KenLM model, re-derived from the corpus
    itself so the operator is self-contained.

    The per-doc sum folds in sorted-term order (both engines), so the
    double accumulation order is identical; output rounds to 6.
    """
    toks = raw_tokens(text_col)
    posting = (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    tstats = posting.groupBy("term").agg(F.sum("tf").alias("cnt"))
    totals = tstats.agg(
        F.sum("cnt").alias("T"), F.count("*").alias("V")
    )
    scored = posting.join(tstats, "term").crossJoin(F.broadcast(totals)).select(
        F.col(id_col),
        F.col("term"),
        F.col("tf"),
        F.log2(
            (F.col("cnt") + F.lit(1.0))
            / (F.col("T") + F.col("V")).cast("double")
        ).alias("logp"),
    )
    per_doc = scored.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct("term", "tf", "logp"))).alias("xs"),
        F.sum("tf").cast("long").alias("n_tokens"),
    )
    bits_sum = F.aggregate(
        "xs",
        F.lit(0.0),
        lambda acc, x: acc - x["tf"].cast("double") * x["logp"],
    )
    out = per_doc.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.round(bits_sum / F.col("n_tokens"), 6).alias("bits_per_token"),
    )
    empty = df.select(F.col(id_col)).join(out.select(id_col), id_col, "left_anti")
    return out.unionByName(
        empty.select(
            F.col(id_col),
            F.lit(0).cast("long").alias("n_tokens"),
            F.lit(0.0).alias("bits_per_token"),
        )
    )


def unigram_logprob_sql(
    table: str = "documents", text: str = "text", id_col: str = "doc_id"
) -> str:
    toks = _tokens_sql(text)
    return f"""WITH posting AS (
  SELECT {id_col}, tok AS term, count(*) AS tf
  FROM (SELECT {id_col}, unnest({toks}) AS tok FROM {table})
  GROUP BY {id_col}, tok
),
tstats AS (SELECT term, sum(tf) AS cnt FROM posting GROUP BY term),
totals AS (SELECT sum(cnt) AS T, count(*) AS V FROM tstats),
scored AS (
  SELECT p.{id_col}, p.term, p.tf,
         log2((t.cnt + 1.0) / CAST(o.T + o.V AS DOUBLE)) AS logp
  FROM posting p JOIN tstats t ON p.term = t.term CROSS JOIN totals o
),
per_doc AS (
  SELECT {id_col},
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
                        list(-CAST(tf AS DOUBLE) * logp ORDER BY term)),
           (a, b) -> a + b) AS bits_sum,
         sum(tf) AS n_tokens
  FROM scored GROUP BY {id_col}
)
SELECT t.{id_col},
  CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
  COALESCE(round(p.bits_sum / p.n_tokens, 6), 0.0) AS bits_per_token
FROM {table} t LEFT JOIN per_doc p ON t.{id_col} = p.{id_col}"""


# -- deterministic stratified sampling -------------------------------------------


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    strata_col: str = "source",
    salt: str = "v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep each row iff md5(salt:doc_id) mod 10^6 < rate(stratum) * 10^6 —
    per-stratum deterministic downsampling (data mixing / source
    re-weighting). Same hash family as split_assign, so a doc's fate is
    stable under re-runs and corpus growth. Rates are per-million to keep
    the cut integer-exact on both engines."""
    h = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    bucket = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 1000000
    cut = F.lit(int(default_rate * 1000000))
    for stratum, rate in sorted(rates.items()):
        cut = F.when(
            F.col(strata_col) == stratum, F.lit(int(rate * 1000000))
        ).otherwise(cut)
    return (
        df.select(
            F.col(id_col),
            F.col(strata_col),
            bucket.alias("bucket"),
            cut.alias("cut"),
        )
        .filter(F.col("bucket") < F.col("cut"))
        .select(id_col, strata_col, "bucket")
    )


def stratified_sample_sql(
    rates: dict[str, float],
    default_rate: float = 0.0,
    table: str = "documents",
    strata_col: str = "source",
    salt: str = "v1",
    id_col: str = "doc_id",
) -> str:
    h = f"md5('{salt}:' || CAST({id_col} AS VARCHAR))"
    bucket = (
        f"list_reduce(list_transform(regexp_extract_all(substr({h}, 1, 8),"
        " '.'), c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),"
        " (a, b) -> a * 16 + b) % 1000000"
    )
    cut = f"{int(default_rate * 1000000)}"
    for stratum, rate in sorted(rates.items(), reverse=True):
        cut = (
            f"CASE WHEN {strata_col} = '{stratum}' "
            f"THEN {int(rate * 1000000)} ELSE {cut} END"
        )
    return f"""SELECT {id_col}, {strata_col}, {bucket} AS bucket
FROM {table}
WHERE {bucket} < {cut}"""


# -- GPT-style sequence packing (concat-and-chunk context assignment) ------------


def pack_sequences(
    df: DataFrame,
    context_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_size: int = 1 << 20,
) -> DataFrame:
    """Assign every doc its position in the packed token stream: all docs
    are concatenated in id order and cut into fixed-size contexts of
    context_len tokens (the standard LM pretraining packing — concat +
    chunk, documents split across chunk boundaries rather than padded).

    Returns (doc_id, n_tokens, start_tok, first_chunk, last_chunk,
    n_chunks) where start_tok is the doc's offset in the global stream and
    first/last_chunk the context ids its tokens land in (empty docs:
    chunk ids of their stream position, n_chunks 0).

    Scale: the global running offset is computed in TWO passes so no
    single task ever sees the whole stream — (1) docs shard by
    id div shard_size; per-shard token totals (a tiny aggregate) prefix-
    summed driver-side into per-shard base offsets; (2) a window
    PARTITIONED by shard adds the within-shard running sum. Exactly the
    distributed prefix-sum decomposition; bit-identical to one global
    window, and the window never moves more than one shard to a task.
    shard_size is in id units (ids need not be dense).
    """
    toks = raw_tokens(text_col)
    n = F.size(toks).cast("long")
    base = df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.expr(f"{id_col} div {int(shard_size)}").alias("_shard"),
    )
    totals = sorted(
        (r["_shard"], r["t"])
        for r in base.groupBy("_shard").agg(F.sum("n_tokens").alias("t")).collect()
    )
    offs, acc = [], 0
    for sh, t in totals:
        offs.append((int(sh), acc))
        acc += int(t)
    spark = df.sparkSession
    off_df = spark.createDataFrame(offs, "_shard long, _base long")
    w = Window.partitionBy("_shard").orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    out = base.join(F.broadcast(off_df), "_shard").withColumn(
        "start_tok",
        (F.col("_base") + F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .cast("long"),
    )
    cl = int(context_len)
    first = F.expr(f"start_tok div {cl}")
    last = F.when(
        F.col("n_tokens") > 0,
        F.expr(f"(start_tok + n_tokens - 1) div {cl}"),
    ).otherwise(first)
    return out.select(
        id_col,
        "n_tokens",
        "start_tok",
        first.alias("first_chunk"),
        last.alias("last_chunk"),
        F.when(F.col("n_tokens") > 0, last - first + 1)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_chunks"),
    )


def pack_sequences_sql(
    context_len: int,
    table: str = "documents",
    text: str = "text",
    id_col: str = "doc_id",
) -> str:
    toks = _tokens_sql(text)
    return f"""WITH base AS (
  SELECT {id_col}, CAST(len({toks}) AS BIGINT) AS n_tokens FROM {table}
),
run AS (
  SELECT {id_col}, n_tokens,
         CAST(COALESCE(sum(n_tokens) OVER (
           ORDER BY {id_col} ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS start_tok
  FROM base
)
SELECT {id_col}, n_tokens, start_tok,
  CAST(start_tok // {context_len} AS BIGINT) AS first_chunk,
  CAST(CASE WHEN n_tokens > 0
       THEN (start_tok + n_tokens - 1) // {context_len}
       ELSE start_tok // {context_len} END AS BIGINT) AS last_chunk,
  CAST(CASE WHEN n_tokens > 0
       THEN (start_tok + n_tokens - 1) // {context_len}
            - start_tok // {context_len} + 1
       ELSE 0 END AS BIGINT) AS n_chunks
FROM run"""
