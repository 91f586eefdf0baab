"""SparkSession factory tuned for this engine.

Local-mode defaults target the sandbox (local[32], single JVM). On a real
cluster the same builder is used via spark-submit --py-files; only
master/memory change. Shuffle-partition count and AQE are set explicitly
because the KG pipeline's big shuffles (token explode → span agg, mention
self-join) are sized by these.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "bioner_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Parallelism is read from $SPARK_GRAFT_CPUS when not given so bench runs
    can sweep parallelism levels (the sandbox proxy for cluster size).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    # Size shuffles to the core count: at 100 TB this would instead be
    # ~2-3x total executor cores, set per job; AQE coalesces the tail.
    shuffle_partitions = shuffle_partitions or max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Bound Arrow batches so giant documents cannot blow up one UDF call;
        # the NER kernel additionally sub-batches by token budget.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # THE input-side byte bound for pandas UDF / mapInPandas batches
        # (Spark >=4.0): a batch closes at 64 MB even if far under the row
        # cap, so a handful of 32 MB video payloads can never arrive as one
        # multi-GB pandas frame. Pinned to the default explicitly because
        # ops/multimodal's memory contract DEPENDS on it — its own
        # sub-batching bounds output accumulation, not input.
        .config("spark.sql.execution.arrow.maxBytesPerBatch", str(64 << 20))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Dio.netty.tryReflectionSetAccessible=true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _warm_icu(spark)
    return spark


# applicationIds whose JVM already ran the ICU warmup — getOrCreate returns
# the same session on repeated get_spark() calls, and re-running the warmup
# job on an already-warm JVM is a pointless Spark job per call.
_ICU_WARMED: set = set()


def _warm_icu(spark: SparkSession) -> None:
    """Force Spark 4's collation-aware string path to class-load ICU now.

    The first non-ASCII lower()/upper() in a JVM triggers
    CollationAwareUTF8String's static initializer, which loads ICU break
    iterators and collation data — measured 10-18 s on this sandbox, during
    which EVERY concurrently running task serializes behind the class-init
    lock (thread dump: 31/32 executor threads parked in
    CollationSupport$Lower.execBinaryICU while one sits in
    com.ibm.icu...<clinit>). Paying it here, once, at session build keeps it
    out of every job; on a real cluster each executor JVM likewise pays it
    once at first use — this warmup just makes the cost deterministic.

    Runs once per SparkContext (keyed by applicationId), not once per
    get_spark() call."""
    try:
        app_id = spark.sparkContext.applicationId
        if app_id in _ICU_WARMED:
            return
        # one tiny task per core slot (×4 waves) so every executor JVM in
        # local-cluster / real-cluster mode class-loads ICU, not just the one
        # that happens to win the first task. Floor of 128: on cluster
        # masters executors register ASYNCHRONOUSLY and defaultParallelism
        # reads low until they do (kg_job reads it after the first job for
        # this reason) — a warmup sized off the early reading would leave
        # late-registering JVMs to pay the 10-18 s stall inside the timed
        # job. 128 trivial tasks queue and drain onto executors as they
        # appear (<1 s total).
        n = max(128, spark.sparkContext.defaultParallelism * 4)
        spark.range(0, n, 1, n).selectExpr(
            "max(length(lower(concat('Äß', id)))) as w",
            "max(length(initcap(concat('ßä ', id)))) as t",
        ).collect()
        # mark warmed only AFTER the job succeeds: marking up-front made a
        # transiently failed warmup unretryable for the whole app, landing
        # the 10-18 s ICU class-init stall inside the first timed job with
        # no indication the warmup was skipped
        _ICU_WARMED.add(app_id)
    except Exception as exc:
        # best-effort; never fail session creation — but say so, because a
        # silently skipped warmup shows up later as an inexplicable stall
        print(f"bioner_spark.session: ICU warmup failed, will retry on next "
              f"get_spark ({type(exc).__name__}: {exc})", file=sys.stderr)


def stable_default_parallelism(spark: SparkSession, timeout_s: float = 10.0) -> int:
    """defaultParallelism AFTER executor registration stabilizes.

    On cluster (and local-cluster) masters executors register
    asynchronously: a read taken right after the first job can see only a
    fraction of the fleet, silently undersizing anything derived from it
    (shard counts, shuffle-partition floors, reported core counts). One
    warmup job forces scheduling, then the value is polled until THREE
    consecutive reads stop growing — JVM spawn can stagger registrations
    more than one poll interval apart, so breaking on the first quiet
    window would undercount (the exact slow-registration case the poll
    exists for).

    Plain local[N] masters have no asynchronous registration —
    defaultParallelism is fixed at session creation — so they return
    immediately instead of paying the warmup job + ≥1.5 s poll on every
    dev/CI run (local-cluster[...] does NOT match the prefix and still
    polls, as its executor JVMs register asynchronously like a real
    cluster's).
    """
    import time as _time

    master = spark.sparkContext.master or ""
    if master == "local" or master.startswith("local["):
        return spark.sparkContext.defaultParallelism

    spark.range(1000).count()
    seen = spark.sparkContext.defaultParallelism
    deadline = _time.time() + timeout_s
    stable = 0
    while _time.time() < deadline:
        _time.sleep(0.5)
        cur = spark.sparkContext.defaultParallelism
        if cur <= seen:
            stable += 1
            if stable >= 3:
                break
        else:
            stable = 0
            seen = cur
    return spark.sparkContext.defaultParallelism
