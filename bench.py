#!/usr/bin/env python
"""Headline benchmark. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Workload:
 1. gate build  — index the $SPARK_GRAFT_SF_DIR documents table (mapped to
    the transcript shape), end to end with stats/encode/commit.
 2. synthetic build — index a distributed deterministic transcript corpus
    (~BENCH_CONVS conversations, scaled by sf) and report turns/sec: the
    BASELINE.json index-build-throughput metric.
 3. query latencies — BM25 top-k families over the synthetic index
    (hot/mid/rare term, AND, OR, minShouldMatch, dismax, prefix), the
    BASELINE.json query-latency metric.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     BENCH_CONVS (override synthetic conversation count),
     BENCH_SKIP_GATE=1 (scaling runs: synthetic workload only).
"""
import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else 0.1
    n_convs = int(os.environ.get("BENCH_CONVS", str(int(400_000 * sf))))
    mean_tokens = int(os.environ.get("BENCH_TOKENS", "25"))
    skip_gate = os.environ.get("BENCH_SKIP_GATE") == "1"
    # best-of-N noise rejection (shared host: identical runs spread +/-40%).
    # Scaling-ladder runs set 1: there the per-level taskset pinning is the
    # control and doubling a 346 s 1-CPU build is not worth it.
    repeats = int(os.environ.get("BENCH_REPEATS", "2"))

    from lucenenet_spark.session import get_spark
    from lucenenet_spark.datagen import transcripts_spark_dist
    from lucenenet_spark.operators.index_build import IndexBuilder
    from lucenenet_spark.operators.search import IndexSearcher
    from lucenenet_spark.plans.query import (
        BooleanQuery,
        DisMaxQuery,
        PhraseQuery,
        PrefixQuery,
        TermQuery,
    )

    spark = get_spark("bench", cores=cpus)
    timings: dict[str, float] = {}
    extras: dict = {"cpus": cpus, "sf": sf}
    t_all = time.time()

    # -- 1. gate-corpus build ------------------------------------------------
    # This sandbox shares its host: identical builds measure anywhere in a
    # +/-40% band run to run. Every headline number is therefore best-of-2
    # (standard min-of-N noise rejection); both raw runs are reported.
    if not skip_gate:
        from lucenenet_spark import entry_support as es

        gate_runs = []
        for _ in range(repeats):
            gate_out = "/tmp/bench_idx_gate"
            shutil.rmtree(gate_out, ignore_errors=True)
            t0 = time.time()
            IndexBuilder(
                spark, gate_out, n_buckets=8, n_segments=8, salt_target=2000
            ).build(es.transcripts_from_documents(spark, sf_dir), build_id="bench-gate")
            gate_runs.append(round(time.time() - t0, 2))
        timings["build_gate"] = min(gate_runs)
        extras["build_gate_runs"] = gate_runs

    # -- 2. synthetic transcript build (the throughput number) ---------------
    # materialize the corpus once (like the real input: a stored table) so
    # the build's sampling/statistics passes are cheap column-pruned reads,
    # then index from parquet. Datagen time is reported separately.
    synth_out = f"/tmp/bench_idx_synth_{cpus}"
    shutil.rmtree(synth_out, ignore_errors=True)
    # corpus layout is FIXED (64 files) regardless of the level's CPU
    # count: the ingest stage parallelizes over input splits, so a corpus
    # written by a small-N run must not cap a large-N run's task count
    # (the scaling ladder shares this cache across levels)
    corpus_parts = max(cpus * 2, 64)
    corpus_path = f"/tmp/bench_corpus_{n_convs}_{mean_tokens}_p{corpus_parts}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        t0 = time.time()
        transcripts_spark_dist(
            spark, n_convs, partitions=corpus_parts, mean_tokens=mean_tokens
        ).write.mode("overwrite").parquet(corpus_path)
        timings["datagen"] = round(time.time() - t0, 2)
    corpus = spark.read.parquet(corpus_path)
    synth_runs = []
    for _ in range(repeats):
        shutil.rmtree(synth_out, ignore_errors=True)
        t0 = time.time()
        builder = IndexBuilder(
            spark,
            synth_out,
            n_buckets=cpus,
            n_segments=cpus * 2,
            salt_target=200_000,
            # corpus files are written clustered by conv range; in-stream order
            # verification still guards the assumption
            input_clustered=True,
        )
        manifest = builder.build(corpus, build_id=f"bench-{cpus}")
        synth_runs.append(round(time.time() - t0, 2))
    build_s = min(synth_runs)
    timings["build_synthetic"] = build_s
    extras["build_synth_runs"] = synth_runs
    extras["turns"] = manifest["max_doc"]
    extras["sum_tokens"] = manifest["sum_ttf"]
    extras["turns_per_sec"] = round(manifest["max_doc"] / build_s, 1)
    extras["tokens_per_sec"] = round(manifest["sum_ttf"] / build_s, 1)

    # -- 3. query latencies ---------------------------------------------------
    s = IndexSearcher(spark, synth_out)
    T = TermQuery
    queries = {
        "q_term_hot": T(term="popcorn"),
        "q_term_mid": T(term="word7"),
        "q_term_rare": T(term="rare123"),
        "q_and2": BooleanQuery(must=(T(term="popcorn"), T(term="word7"))),
        "q_or5": BooleanQuery(
            should=tuple(T(term=t) for t in ["popcorn", "word7", "word8", "word9", "rare5"])
        ),
        "q_msm2": BooleanQuery(
            should=tuple(T(term=t) for t in ["word7", "word8", "word9", "popcorn"]),
            min_should_match=2,
        ),
        "q_dismax": DisMaxQuery(
            queries=(T(term="popcorn"), T(term="word7")), tie_breaker=0.3
        ),
        "q_prefix": PrefixQuery(prefix="rare12"),
        # conjunction skipping showcase: hot term AND doc-rare term
        "q_and_hot_rare": BooleanQuery(
            must=(T(term="popcorn"), T(term="rare123"))
        ),
        "q_phrase": PhraseQuery(terms=("common1", "common2")),
        "q_phrase_sloppy": PhraseQuery(terms=("common1", "common2"), slop=3),
        # hot x hot: both terms dense -> the bulk range-sliced path (binary
        # sub-array shuffle, O(blocks) rows) instead of per-position rows
        "q_phrase_hot_hot": PhraseQuery(terms=("common3", "common4")),
        "q_field_role": T(term="assistant", field="role"),
    }
    s.search(T(term="word3"), 10).collect()  # warm the scan path once
    for name, q in queries.items():
        s.search(q, 10).collect()  # plan-compile warmup; report steady state
        best = None
        for _ in range(repeats):
            t0 = time.time()
            rows = s.search(q, 10).collect()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        extras.setdefault("hits", {})[name] = len(rows)

    # conjunction-skip evidence: decoded-block count ∝ rare df, not hot df
    # (threshold forced low: at sf0.1 the adaptive guard correctly skips it)
    s_ev = IndexSearcher(spark, synth_out, prune_min_postings=1)
    keys = [("text", "popcorn"), ("text", "rare123")]
    blocks_all = s_ev._blocks_for(keys).count()
    blocks_pruned = s_ev._conjunction_prune(s_ev._blocks_for(keys), keys).count()
    extras["and_skip_blocks"] = {"unpruned": blocks_all, "pruned": blocks_pruned}

    # hot-x-hot phrase shuffle-volume evidence: the bulk path ships one
    # binary row per (block, clause, range) instead of one row per position
    # occurrence — the previous gather path's shuffle volume
    hh = [("text", "common3"), ("text", "common4")]
    km = s.term_meta(hh)
    dfs_hh = [m[0] for m in km.values()]
    # same rule as _phrase_scores: bulk whenever the rare-slot conjunction
    # prune would NOT bound the per-position gather
    prune_bounds = (sum(dfs_hh) - min(dfs_hh)) >= max(
        min(dfs_hh) * 4, s.prune_min_postings
    )
    extras["phrase_hot_hot"] = {
        "bulk_path": not prune_bounds,
        "position_occurrences": int(sum(m[1] for m in km.values())),
        "shuffled_block_rows": int(s_ev._blocks_for(hh).count()),
    }

    # IVF-ANN evidence: probes against the materialized index are
    # partition-pruned reads of ~nprobe/C of the corpus, with NO per-query
    # assignment job (VERDICT r03 #1). Built once from the gate embeddings.
    if not skip_gate:
        emb_path = os.path.join(sf_dir, "embeddings.parquet")
        if os.path.exists(emb_path):
            from pyspark.sql import functions as F

            from lucenenet_spark.pipeline import similarity

            emb = spark.read.parquet(emb_path)
            ivf_dir = f"/tmp/bench_ivf_{os.path.basename(sf_dir)}"
            shutil.rmtree(ivf_dir, ignore_errors=True)
            t0 = time.time()
            similarity.build_ivf_index(emb, ivf_dir)
            ivf_build = round(time.time() - t0, 2)
            qrow = emb.filter(F.col("vec_id") == 7).first()
            qv = [float(x) for x in qrow["embedding"]]
            similarity.ivf_index_topk(spark, ivf_dir, qv, 10).collect()  # warm
            best = None
            for _ in range(repeats):
                t0 = time.time()
                similarity.ivf_index_topk(spark, ivf_dir, qv, 10).collect()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            timings["q_ann_ivf"] = round(best, 3)
            extras["ann_ivf"] = {
                "build_sec": ivf_build,
                **similarity.ivf_probe_stats(spark, ivf_dir, qv),
            }

    total = round(time.time() - t_all, 2)
    print(
        json.dumps(
            {
                "metric": "index_build+topk_query wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                **extras,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
