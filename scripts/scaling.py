"""Scaling-efficiency evidence (BASELINE.json: >=0.8 from N to 4N executors).

No real cluster exists in this sandbox, so the same job runs at two
parallelism levels with the WHOLE process tree (JVM + pyspark workers)
pinned to N CPUs via taskset — an honest emulation of an N-core cluster
(plain local[N] lets the JVM's GC/shuffle/IO threads free-ride on all
machine cores, which flatters the small configuration).

Runs the synthetic index build + query workload at each level and writes
BENCH.md with throughput and N->4N efficiency.

Usage: python scripts/scaling.py [convs] [mean_tokens] [levels...]
Defaults: 120000 convs, 120 mean tokens, levels 2 8 32.
"""
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, convs: int, tokens: int) -> dict:
    shutil.rmtree(f"/tmp/bench_idx_synth_{cpus}", ignore_errors=True)
    env = dict(
        os.environ,
        BENCH_SKIP_GATE="1",
        BENCH_REPEATS="1",
        BENCH_CONVS=str(convs),
        BENCH_TOKENS=str(tokens),
        SPARK_GRAFT_CPUS=str(cpus),
    )
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, os.path.join(REPO, "bench.py")]
    out = subprocess.run(
        cmd, env=env, capture_output=True, text=True, timeout=1800
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main():
    convs = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    tokens = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    levels = [int(x) for x in sys.argv[3:]] or [2, 8, 32]
    results = {}
    for c in levels:
        print(f"=== level local[{c}] (pinned to {c} CPUs) ===", flush=True)
        results[c] = run_level(c, convs, tokens)
        print(json.dumps(results[c]), flush=True)
    write_bench_md(results, convs, tokens)


def write_bench_md(results: dict, convs: int, tokens: int):
    lines = [
        "# BENCH — throughput and scaling evidence",
        "",
        f"Workload: synthetic transcript corpus, {convs} conversations, "
        f"~{results[min(results)]['turns']} turns, "
        f"{results[min(results)]['sum_tokens']} post-stop tokens "
        f"(mean ~{tokens}/turn). Full index build (tokenize, norms, partial "
        "posting lists, salted term shuffle, block encode, stats, commit) + "
        "8 BM25 top-k queries. Each level runs with the entire process tree "
        "pinned to N CPUs (taskset), emulating an N-core cluster; plain "
        "local[N] would let JVM background threads use all machine cores.",
        "",
        "| CPUs | build sec | turns/sec | tokens/sec | top-k query median sec |",
        "|---|---|---|---|---|",
    ]
    import statistics

    for c in sorted(results):
        r = results[c]
        qs = [v for k, v in r["queries"].items() if k.startswith("q_")]
        lines.append(
            f"| {c} | {r['queries']['build_synthetic']} | {r['turns_per_sec']} |"
            f" {r['tokens_per_sec']} | {round(statistics.median(qs), 2)} |"
        )
    lines.append("")
    lines.append("## N -> 4N efficiency (build throughput)")
    lines.append("")
    for a in sorted(results):
        b = a * 4
        if b in results:
            t_a = results[a]["queries"]["build_synthetic"]
            t_b = results[b]["queries"]["build_synthetic"]
            eff = t_a / t_b / 4
            lines.append(
                f"- {a} -> {b} CPUs: speedup {t_a / t_b:.2f}x, "
                f"efficiency {eff:.2f}"
            )
    lines.append("")
    lines.append(
        "Caveat: all levels share ONE JVM (local mode) — shuffle service, "
        "Arrow channels, and the parquet committer are per-executor resources "
        "on a real cluster, so large-N local numbers are a lower bound on "
        "cluster scaling. The compute phases (tokenize + partial-list build + "
        "block encode, i.e. all the Python/numpy work) are embarrassingly "
        "parallel per partition with no cross-task coordination; the only "
        "cross-partition steps are the compact partial-postings shuffle and "
        "the tiny driver prefix-sum."
    )
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote BENCH.md")


if __name__ == "__main__":
    main()
