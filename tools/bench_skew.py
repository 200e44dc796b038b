#!/usr/bin/env python
"""Skew-stress benchmark (BASELINE.json:6 hot-repo skew): replay the same
stream at mild vs extreme zipf repo popularity and report throughput.
The LWW dedupe's map-side partial aggregation should make hot keys
cheaper, not slower — see BENCH.md "Skew stress"."""
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from etlbox_spark.engine.gen import gen_events, write_events  # noqa: E402
from etlbox_spark.engine.lake import LakeTable  # noqa: E402
from etlbox_spark.engine.runner import replay  # noqa: E402
from etlbox_spark.engine.spec import MergeMode, MergeSpec  # noqa: E402
from etlbox_spark.session import get_spark  # noqa: E402

SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else None
SCHEMA = T.StructType(
    [T.StructField(c, T.StringType(), True) for c in ["repo", "path", "commit", "lang", "content"]]
)


def bench_as_of_hot_key(spark, cpus: int, n: int) -> None:
    """VERDICT r03 #4: the as-of fill is a per-key ordered window — a
    zipf-hot key serializes into ONE task (AQE cannot split a window).
    Measure plain vs segmented (two-level scan) on a 90%-hot-key stream
    and report the curve over segment widths."""
    from etlbox_spark.operators.joins import as_of_join

    hot = (
        spark.range(n)
        .select(
            F.when(F.col("id") % 10 < 9, F.lit("repo_hot"))
            .otherwise(F.concat(F.lit("repo_"), (F.col("id") % 256).cast("string")))
            .alias("repo"),
            F.col("id").alias("ts"),
            F.col("id").alias("event_id"),
        )
    )
    dim = (
        spark.range(0, n, 40)
        .select(
            F.when(F.col("id") % 10 < 9, F.lit("repo_hot"))
            .otherwise(F.concat(F.lit("repo_"), (F.col("id") % 256).cast("string")))
            .alias("repo"),
            F.col("id").alias("dts"),
            F.col("id").alias("dseq"),
            (F.col("id") % 997).cast("double").alias("dim_value"),
        )
    )
    hot.write.format("noop").mode("overwrite").save()  # scan warm-up

    def run(tag: str, **kw) -> float:
        t0 = time.perf_counter()
        as_of_join(hot, dim, on=["repo"], left_ts="ts", right_ts="dts",
                   right_seq="dseq", **kw).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        print(f"as-of hot-key {tag}: {dt:.1f}s ({n / dt:,.0f} rows/s)", flush=True)
        return dt

    base = run("plain (per-key window)")
    for w in (n // 8, n // 32, n // 128):
        dt = run(f"segmented W={w} (~{n // max(w, 1)} segs)", segment_width=w)
        print(f"  -> speedup vs plain: {base / dt:.2f}x", flush=True)


def bench_top_k_hot_key(spark, cpus: int, n: int) -> None:
    """Same hot-key shape for top-k: the plain row_number window
    serializes the hot group into one task; the segmented variant is
    result-identical (top-k is associative) and bounded by segments·k
    rows in the final per-group window."""
    from etlbox_spark.operators.dedupe import top_k_per_group, top_k_per_group_segmented

    df = (
        spark.range(n)
        .select(
            F.when(F.col("id") % 10 < 9, F.lit("repo_hot"))
            .otherwise(F.concat(F.lit("repo_"), (F.col("id") % 256).cast("string")))
            .alias("repo"),
            F.col("id").alias("event_seq"),
            (F.col("id") % 997).cast("double").alias("value"),
        )
    )
    df.write.format("noop").mode("overwrite").save()
    order = [F.col("value").desc(), F.col("event_seq").asc()]

    def run(tag: str, fn) -> float:
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        print(f"top-k hot-key {tag}: {dt:.1f}s ({n / dt:,.0f} rows/s)", flush=True)
        return dt

    base = run("plain (per-group window)",
               lambda: top_k_per_group(df, ["repo"], order, k=100))
    for segs in (8, 32, 128):
        dt = run(f"segmented segs={segs}",
                 lambda segs=segs: top_k_per_group_segmented(
                     df, ["repo"], order, k=100, segments=segs))
        print(f"  -> speedup vs plain: {base / dt:.2f}x", flush=True)


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    spark = get_spark("bench_skew", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    bench_as_of_hot_key(spark, cpus, int(os.environ.get("SPARK_GRAFT_ASOF_N", str(n))))
    bench_top_k_hot_key(spark, cpus, int(os.environ.get("SPARK_GRAFT_TOPK_N", str(n))))
    for skew in (1.5, 4.0):
        work = tempfile.mkdtemp(prefix=f"skew{skew}_", dir=SCRATCH)
        try:
            ev_dir = f"{work}/events"
            write_events(
                gen_events(spark, n, n_repos=1600, paths_per_repo=500,
                           epoch_size=n // 4, skew=skew),
                ev_dir,
            )
            ev = spark.read.parquet(ev_dir)
            top = ev.groupBy("repo").count().orderBy(F.desc("count")).limit(1).collect()[0]
            total = ev.count()
            lake = LakeTable.create(f"{work}/lake", SCHEMA, ["repo", "path"], n_buckets=64)
            t0 = time.perf_counter()
            replay(spark, lake, ev_dir, MergeSpec(), MergeMode.DELTA, delta_dir=f"{work}/delta")
            wall = time.perf_counter() - t0
            print(
                f"skew={skew}: hottest repo {top['repo']} = {top['count']:,}/{total:,}"
                f" ({100 * top['count'] / total:.1f}%); replay {total / wall:,.0f} ev/s"
                f" ({wall:.1f}s); final rows {lake.row_count():,}",
                flush=True,
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
