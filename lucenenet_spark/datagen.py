"""Deterministic synthetic transcript corpus (FIXTURES.md §1, §3).

Schema per BASELINE.json input_hint:
  conv_id:string, turn_idx:int32, role:string, text:string, tool:string, ts:timestamp

Seeded numpy generation — identical bytes across runs. Includes every
edge-case row from FIXTURES.md §3 (empty, all-stopwords, single token, high
tf, >255-char token, unicode, punctuation, hot 'popcorn' term in ~20% of
turns, 1..500-token length spread).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .functions.analysis import ENGLISH_STOP_WORDS

_ROLES = ["user", "assistant", "tool"]
_TOOLS = ["search", "python", "browser", "calculator", "editor"]

EDGE_TEXTS = [
    "",  # fieldLength=0 -> norm byte 255 saturation
    "the of and to in",  # all stopwords -> post-stop length 0
    "hello",  # single token
    ("spark " * 50).strip(),  # tf=50 saturation
    "x" * 300 + " tail",  # >255-char token dropped
    "Ärger STRASSE café 東京 123 C3PO",  # unicode lowercase + word break
    "foo-bar foo.bar 3.14 a@b.com",  # punctuation splits
]


def _vocab(rng: np.random.Generator) -> tuple[np.ndarray, np.ndarray]:
    """(words, probs): ~200 common (incl. 33 stopwords), ~2000 mid, ~50k rare."""
    common = sorted(ENGLISH_STOP_WORDS) + [f"common{i}" for i in range(167)]
    mid = [f"word{i}" for i in range(2000)]
    rare = [f"rare{i}" for i in range(50000)]
    words = np.array(common + mid + rare)
    w = np.concatenate(
        [
            np.full(len(common), 300.0),
            np.full(len(mid), 10.0),
            np.full(len(rare), 0.2),
        ]
    )
    return words, w / w.sum()


def generate_transcripts(n_turns: int, seed: int = 42) -> pd.DataFrame:
    """Deterministic transcripts table with n_turns rows (pandas)."""
    rng = np.random.default_rng(seed)
    words, probs = _vocab(rng)

    # conversation lengths: zipf-ish 1..40
    conv_lens = []
    total = 0
    while total < n_turns:
        ln = int(min(40, max(1, rng.zipf(1.6))))
        conv_lens.append(ln)
        total += ln
    conv_lens[-1] -= total - n_turns
    if conv_lens[-1] == 0:
        conv_lens.pop()

    conv_ids, turn_idxs = [], []
    for ci, ln in enumerate(conv_lens):
        conv_ids.extend([f"conv-{ci:08d}"] * ln)
        turn_idxs.extend(range(ln))

    n = len(conv_ids)
    # text lengths: spread 1..500 tokens, mostly short
    tlens = np.minimum(500, 1 + rng.geometric(0.04, size=n))
    texts = []
    for i in range(n):
        toks = rng.choice(words, size=tlens[i], p=probs)
        t = " ".join(toks)
        if rng.random() < 0.20:  # hot skewed term (FIXTURES §3)
            t = t + " popcorn"
        texts.append(t)
    # splice edge-case rows deterministically at fixed stride
    for j, et in enumerate(EDGE_TEXTS):
        if j * 7 + 3 < n:
            texts[j * 7 + 3] = et

    roles = [_ROLES[t % 3] for t in turn_idxs]
    tools = [
        _TOOLS[i % len(_TOOLS)] if r == "tool" else None for i, r in enumerate(roles)
    ]
    base = np.datetime64("2026-01-01T00:00:00")
    ts = base + np.cumsum(rng.integers(1, 90, size=n)).astype("timedelta64[s]")

    return pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": np.array(turn_idxs, dtype=np.int32),
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": ts,
        }
    )


def transcripts_spark_dist(
    spark,
    n_conversations: int,
    seed: int = 42,
    partitions: int | None = None,
    mean_tokens: int = 25,
):
    """Fully distributed deterministic corpus: no driver-side materialization.

    Each conversation is generated on executors from a seed derived from its
    conversation number, so the corpus is identical regardless of partitioning
    or cluster size — the property that makes N-vs-4N scaling runs comparable.
    Avg ~26 post-stop tokens/turn, ~5.5 turns/conv (zipf-ish 1..40).
    """
    import pandas as pd
    from pyspark.sql import functions as F

    partitions = partitions or spark.sparkContext.defaultParallelism * 2
    base = spark.range(0, n_conversations, 1, partitions)

    def gen(it):
        words, probs = _vocab(np.random.default_rng(seed))
        cum = np.cumsum(probs)
        for pdf in it:
            out = []
            for conv in pdf["id"].to_numpy():
                rng = np.random.default_rng((seed, int(conv)))
                ln = int(min(40, max(1, rng.zipf(1.6))))
                tlens = np.minimum(
                    20 * mean_tokens, 1 + rng.geometric(1.0 / mean_tokens, size=ln)
                )
                # inverse-CDF sampling (much faster than rng.choice w/ probs)
                toks = words[np.searchsorted(cum, rng.random(int(tlens.sum())))]
                bounds = np.concatenate([[0], np.cumsum(tlens)])
                texts = [
                    " ".join(toks[bounds[i] : bounds[i + 1]]) for i in range(ln)
                ]
                hot = rng.random(ln) < 0.20
                texts = [t + " popcorn" if h else t for t, h in zip(texts, hot)]
                # hour offset wraps at 100k convs: keeps every ts inside the
                # datetime64[ns] range (2.4M straight hours would land in
                # 2299, past the ns max of 2262)
                ts0 = np.datetime64("2026-01-01T00:00:00") + np.timedelta64(
                    (int(conv) % 100_000) * 3600, "s"
                )
                tss = ts0 + np.cumsum(rng.integers(1, 90, size=ln)).astype(
                    "timedelta64[s]"
                )
                for i in range(ln):
                    role = _ROLES[i % 3]
                    out.append(
                        (
                            f"conv-{int(conv):010d}",
                            i,
                            role,
                            texts[i],
                            _TOOLS[i % len(_TOOLS)] if role == "tool" else None,
                            tss[i],
                        )
                    )
            pdf = pd.DataFrame(
                out, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
            )
            # second-unit datetime64 scalars give a timestamp[s] Arrow column,
            # which the pyspark serializer rejects — normalize to ns
            pdf["ts"] = pdf["ts"].astype("datetime64[ns]")
            yield pdf

    return base.mapInPandas(
        gen,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )


def transcripts_spark(spark, n_turns: int, seed: int = 42, partitions: int = 8):
    """Spark DataFrame of the deterministic corpus with the exact input schema."""
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    pdf = generate_transcripts(n_turns, seed)
    schema = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("turn_idx", IntegerType()),
            StructField("role", StringType()),
            StructField("text", StringType()),
            StructField("tool", StringType()),
            StructField("ts", TimestampType()),
        ]
    )
    return spark.createDataFrame(pdf, schema).repartition(partitions)
