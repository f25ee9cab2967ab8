"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

Everything here is pure Catalyst expressions (no Python in the hot path) —
whole-stage codegen end to end, trivially scalable, and mirrored 1:1 by the
DuckDB oracle SQL builders below (same regex, same arithmetic, same
tie-breaks). Works over any table with a text column; the gate runs it on
`documents(doc_id, text, ...)`.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# raw lowercase word tokens (NO stopword removal — language ID needs them)
TOKEN_RX = r"[\p{L}\p{N}]+(?:\.[0-9]+)*"
# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol
BPE_RX = r"[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]"

LANG_MARKERS = {
    "en": ["the", "of", "and", "to", "in", "is", "that", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den"],
}
_LANG_ORDER = ["en", "es", "fr", "de"]  # tie-break priority

STOP_SQL = (
    "'a','an','and','are','as','at','be','but','by','for','if','in','into',"
    "'is','it','no','not','of','on','or','such','that','the','their','then',"
    "'there','these','they','this','to','was','will','with'"
)


STOPWORDS_LIST = [w.strip("'") for w in STOP_SQL.split(",")]


def raw_tokens(text_col: str) -> Column:
    # native higher-order functions (F.transform / F.filter), NOT F.expr
    # strings: SQL string literals would eat the \p{...} regex backslashes
    return F.transform(
        F.regexp_extract_all(
            F.coalesce(F.col(text_col), F.lit("")), F.lit(TOKEN_RX), F.lit(0)
        ),
        lambda t: F.lower(t),
    )


def _tokens_sql(text: str) -> str:
    return (
        f"list_transform(regexp_extract_all(coalesce({text}, ''), "
        f"'{TOKEN_RX}'), t -> lower(t))"
    )


# -- token counting ----------------------------------------------------------


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    t = F.col(text_col)
    ws = F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(t), r"\s+"))
    )
    return df.select(
        F.col(id_col),
        ws.cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_RX), F.lit(0))).cast("long").alias("bpe_tokens"),
        F.size(raw_tokens(text_col)).cast("long").alias("word_tokens"),
        F.length(t).cast("long").alias("n_chars"),
    )


def token_stats_sql(table: str = "documents", text: str = "text", id_col: str = "doc_id") -> str:
    return f"""SELECT {id_col},
  CAST(CASE WHEN length(trim({text})) = 0 THEN 0
       ELSE len(regexp_split_to_array(trim({text}), '\\s+')) END AS BIGINT) AS ws_tokens,
  CAST(len(regexp_extract_all({text}, '{BPE_RX}')) AS BIGINT) AS bpe_tokens,
  CAST(len({_tokens_sql(text)}) AS BIGINT) AS word_tokens,
  CAST(length({text}) AS BIGINT) AS n_chars
FROM {table}"""


# -- quality scoring ---------------------------------------------------------


def quality_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + a composite score, all exact-integer or
    rounded-decimal so the oracle hash matches bit-for-bit."""
    t = F.col(text_col)
    toks = raw_tokens(text_col)
    n_tok = F.size(toks)
    n_alpha = F.size(F.regexp_extract_all(t, F.lit(r"[\p{L}]"), F.lit(0)))
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^\p{L}\p{N}\s]"), F.lit(0)))
    n_stop = F.size(F.filter(toks, lambda x: x.isin(STOPWORDS_LIST)))
    n_chars = F.length(t)
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    score = (
        F.lit(0.4) * alpha_ratio
        + F.lit(0.3) * F.least(stop_ratio * 3.0, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * 4.0, F.lit(1.0)))
    )
    return df.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        n_stop.cast("long").alias("n_stopwords"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(score, 6).alias("quality"),
    )


def quality_scores_sql(table: str = "documents", text: str = "text", id_col: str = "doc_id") -> str:
    toks = _tokens_sql(text)
    return f"""WITH q AS (
  SELECT {id_col},
    len({toks}) AS n_tok,
    len(list_filter({toks}, x -> x IN ({STOP_SQL}))) AS n_stop,
    len(regexp_extract_all({text}, '[\\p{{L}}]')) AS n_alpha,
    len(regexp_extract_all({text}, '[^\\p{{L}}\\p{{N}}\\s]')) AS n_punct,
    length({text}) AS n_chars
  FROM {table}
)
SELECT {id_col},
  CAST(n_tok AS BIGINT) AS n_tokens,
  CAST(n_stop AS BIGINT) AS n_stopwords,
  round(CASE WHEN n_tok > 0 THEN n_stop / CAST(n_tok AS DOUBLE) ELSE 0.0 END, 6) AS stop_ratio,
  round(CASE WHEN n_chars > 0 THEN n_punct / CAST(n_chars AS DOUBLE) ELSE 0.0 END, 6) AS punct_ratio,
  round(0.4 * (CASE WHEN n_chars > 0 THEN n_alpha / CAST(n_chars AS DOUBLE) ELSE 0.0 END)
      + 0.3 * least((CASE WHEN n_tok > 0 THEN n_stop / CAST(n_tok AS DOUBLE) ELSE 0.0 END) * 3.0, 1.0)
      + 0.3 * (1.0 - least((CASE WHEN n_chars > 0 THEN n_punct / CAST(n_chars AS DOUBLE) ELSE 0.0 END) * 4.0, 1.0)), 6) AS quality
FROM q"""


# -- language id -------------------------------------------------------------


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word n-gram heuristic; deterministic tie-break by _LANG_ORDER."""
    toks = raw_tokens(text_col)
    scores = {
        lang: F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in LANG_MARKERS[lang]]))
        )
        for lang in _LANG_ORDER
    }
    # priority chain: the first language (in _LANG_ORDER) with the maximal
    # score wins — same CASE the oracle SQL emits
    mx = F.greatest(*[scores[lang] for lang in _LANG_ORDER])
    pred = F.when(mx <= 0, F.lit("und"))
    for lang in _LANG_ORDER:
        pred = pred.when(scores[lang] == mx, F.lit(lang))
    return df.select(
        F.col(id_col),
        *[scores[lang].cast("long").alias(f"s_{lang}") for lang in _LANG_ORDER],
        pred.alias("lang_pred"),
    )


def lang_id_sql(table: str = "documents", text: str = "text", id_col: str = "doc_id") -> str:
    toks = _tokens_sql(text)
    score_exprs = {
        lang: (
            "len(list_intersect("
            + toks
            + ", ["
            + ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
            + "]))"
        )
        for lang in _LANG_ORDER
    }
    sel = ",\n    ".join(f"{score_exprs[l]} AS s_{l}" for l in _LANG_ORDER)
    mx = f"greatest({', '.join('s_' + l for l in _LANG_ORDER)})"
    case = f"CASE WHEN {mx} <= 0 THEN 'und' "
    for lang in _LANG_ORDER:
        case += f"WHEN s_{lang} = {mx} THEN '{lang}' "
    case += "END"
    return f"""WITH s AS (
  SELECT {id_col},
    {sel}
  FROM {table}
)
SELECT {id_col}, {', '.join(f'CAST(s_{l} AS BIGINT) AS s_{l}' for l in _LANG_ORDER)},
  {case} AS lang_pred
FROM s"""


# -- fingerprinting ----------------------------------------------------------


def fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Normalized-content fingerprint: md5 over the space-joined lowercase
    token stream — whitespace/punctuation-insensitive content identity."""
    toks = raw_tokens(text_col)
    return df.select(
        F.col(id_col),
        F.md5(F.array_join(toks, " ")).alias("fingerprint"),
    )


def fingerprints_sql(table: str = "documents", text: str = "text", id_col: str = "doc_id") -> str:
    return (
        f"SELECT {id_col}, md5(array_to_string({_tokens_sql(text)}, ' ')) AS fingerprint "
        f"FROM {table}"
    )
