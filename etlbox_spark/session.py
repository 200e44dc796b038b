"""SparkSession factory with the engine's scale-aware defaults.

Defaults follow the public Spark tuning guidance (AQE on, Arrow on,
shuffle partitions ~ cores for local mode, UTC session timezone so
DuckDB oracle comparisons are stable).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_shuffle_partitions(master: str) -> int:
    """Derive the shuffle width from the RESOLVED master, not the raw
    SPARK_GRAFT_CPUS env var: an exported CPUS=32 must not mis-size an
    explicit ``get_spark(master="local[4]")`` call, and "local[0]" must
    not produce an invalid 0-partition config."""
    import re

    m = re.fullmatch(r"local\[(\d+)\]", master)
    if m:
        return max(1, int(m.group(1)))
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "etlbox_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession tuned for the engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``).
    Shuffle partitions default to the local core count — the right size
    for local mode; on a real cluster callers pass a value sized to
    executors*cores (the engine re-partitions explicitly by key hash
    anyway, see engine/merge.py).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = _default_shuffle_partitions(master)

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalesce target; measured on this box the Spark default
        # (64 MB) wins even for small shuffles — fewer, fuller tasks beat
        # fan-out. Env knob kept for cluster-side tuning experiments.
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_MB", "64") + "m",
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    # diagnostics hook (e.g. -Xlog:gc* to attribute wall-time spikes to
    # GC vs host noise in scaling runs); empty by default
    jopts = os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS")
    if jopts:
        b = b.config("spark.driver.extraJavaOptions", jopts)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
