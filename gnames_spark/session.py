"""SparkSession factory with scale-aware defaults.

Single place that encodes the execution knobs we rely on everywhere:
AQE (runtime re-plan + skew-join splitting — the planner half of the
reference's hand-rolled hot-key truncation,
`/root/reference/internal/io/pgio/match_records_map.go:17-22`), Arrow for
the pandas-UDF kernels, UTC session time zone so DuckDB-oracle
comparisons are stable, and shuffle partitions sized to cores rather
than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "gnames_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    inherit_master: bool = False,
) -> SparkSession:
    """Build the tuned session.

    ``inherit_master=True`` is the spark-submit path: no ``.master()``
    and no driver-memory override, so the cluster manager, executor
    topology, and driver sizing chosen on the ``spark-submit`` command
    line win. The engine's tuning confs (AQE, Arrow, SHJ preference,
    coalesce floor, UTC) also yield to explicit ``--conf``: on a fresh
    driver ``getOrCreate`` would apply ``builder.config`` OVER the
    submit-line properties, so each tuning conf is set only when absent
    from the ambient SparkConf — operators can disable AQE, the SHJ
    preference, the 64k minPartitionSize floor, or the UTC session
    timezone from the command line.
    """
    if inherit_master:
        builder = SparkSession.builder.appName(app_name)
        if shuffle_partitions is not None:
            builder = builder.config(
                "spark.sql.shuffle.partitions", str(shuffle_partitions)
            )
        builder = _tuning(builder, respect_ambient=True)
        for k, v in (extra_conf or {}).items():
            builder = builder.config(k, v)
        spark = builder.getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
        return spark
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] → N concurrent tasks; shuffle width ≈ cores. On a real
        # cluster this is overridden via spark-submit --conf to
        # ~2-3x total executor cores.
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = 32 if n == "*" else max(int(n), 4)

    # shuffle/spill scratch on tmpfs is OPT-IN (SPARK_GRAFT_TMPFS=1 or an
    # explicit SPARK_GRAFT_LOCAL_DIR): tmpfs is RAM-backed and typically
    # capped at 50% of RAM, so spill > RAM — the NORM at production scale
    # — would ENOSPC, and "spilling" under memory pressure would consume
    # more memory. This sandbox's single shared /tmp disk serializes
    # shuffle I/O (measured: identical 8-core pipeline 110s on disk vs
    # 70s on tmpfs), so bench/recall/scaling tools and tests set the flag
    # explicitly; production defaults to Spark's normal local dirs.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if (
        local_dir is None
        and os.environ.get("SPARK_GRAFT_TMPFS") == "1"
        and os.path.isdir("/dev/shm")
    ):
        local_dir = "/dev/shm/spark-scratch"
    if local_dir:
        try:
            os.makedirs(local_dir, exist_ok=True)
        except OSError:
            local_dir = None

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # local-only sizing: on spark-submit (inherit_master) the UI and
        # driver memory belong to the submitter. 32g heap: local[32] runs
        # 32 concurrent tasks whose SHJ build maps share one JVM's
        # execution memory — 8g measured insufficient at 10^6 docs
        # (SparkException: can't acquire memory to build hash relation);
        # the JVM commits heap on use, so the larger -Xmx costs nothing
        # on smaller runs
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
    )
    builder = _tuning(builder)
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


_TUNING_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # AQE coalescing targets BYTES, but the verify stages downstream
    # of candidate joins are tiny-bytes / heavy-Python-CPU (pair ids
    # + short texts feeding rolling-hash / Jaccard kernels). The
    # default 1MB minPartitionSize floor collapses them to 1-2
    # partitions and the pandas kernel runs single-threaded
    # (measured: substring verify 44s -> 4s at sf0.1 with the floor
    # lowered). parallelismFirst still targets default parallelism,
    # so large shuffles are unaffected.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # prefer shuffled-hash over sort-merge: verification joins carry
    # ~2.4KB array payloads per row that SMJ would sort on both
    # sides; SHJ builds a hash map instead (AQE still falls back to
    # SMJ when a build side is too large)
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "2048",
}


def _tuning(builder, respect_ambient: bool = False):
    """Engine tuning shared by local and spark-submit sessions.

    ``respect_ambient=True`` (the spark-submit path): a conf already
    present in the ambient SparkConf — i.e. set via ``--conf`` on the
    submit line, which lands in the driver's system properties before
    any session exists — is left alone, so the operator's explicit
    choice wins over the library default even on a fresh driver where
    ``builder.config`` would otherwise override it."""
    ambient = None
    if respect_ambient:
        from pyspark import SparkConf, SparkContext

        # SparkConf(loadDefaults=True) reads spark.* JVM system
        # properties — where spark-submit puts --conf values — but only
        # once the py4j gateway exists; before any session is built the
        # gateway is not yet up, so ensure it first (in a submitted
        # driver this just attaches to the already-running JVM)
        SparkContext._ensure_initialized()
        ambient = SparkConf(loadDefaults=True)
    for k, v in _TUNING_CONFS.items():
        if ambient is not None and ambient.contains(k):
            continue
        builder = builder.config(k, v)
    return builder
