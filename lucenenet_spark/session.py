"""SparkSession factory tuned for the engine.

Local testing runs on local[N]; the same settings are what we'd submit with
spark-submit --py-files on a real cluster (AQE on, Arrow on, sane shuffle
partitioning). Nothing here is sandbox-specific.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "lucenenet-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    # make the package importable inside Python workers (UDFs are pickled by
    # reference); on a real cluster this is `spark-submit --py-files` instead
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = repo_root + (os.pathsep + existing if existing else "")
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # binary posting-channel rows are orders of magnitude wider than
        # scalar rows — a row-count-only batch cap lets one JVM Arrow batch
        # reach GBs at large corpus sizes; the bytes cap bounds per-task
        # batch memory no matter how fat the rows get
        .config("spark.sql.execution.arrow.maxBytesPerBatch", str(64 * 1024 * 1024))
        # local[32] shares ONE heap across 32 executor threads: size it at
        # ~1 GB/core, the low end of a real executor's per-core memory
        # (spark.executor.memory on a cluster). 8g = 0.25 GB/core starved
        # concurrent scan/shuffle/Arrow buffers on large builds.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "32g"))
        # G1's GCLocker can starve allocating threads into SPURIOUS
        # OutOfMemoryErrors ("Retried waiting for GCLocker too often") when
        # many executor threads do JNI/Arrow work in one JVM — seen at 32
        # threads on large builds with plenty of free heap (JDK-8192647)
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=128",
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
