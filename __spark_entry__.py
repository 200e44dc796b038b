"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator from SURVEY.md §2 (or a
training-data-pipeline op) through the etlbox_spark package; the matching
``oracle_sql()`` entry is the ANSI-SQL equivalent DuckDB replays over the
same parquet tables. Column names and rounding are aligned on both sides
(the driver hashes values order-insensitively but name-sensitively).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etlbox_spark.engine.merge import classify
from etlbox_spark.engine.spec import MergeMode, MergeSpec
from etlbox_spark.functions.hashing import bucket_expr
from etlbox_spark.operators import (
    aggregation,
    salted_aggregation,
    salted_count_distinct,
    column_rename,
    conditional_split,
    cross_join,
    dedupe_lww,
    distinct,
    exact_dedup,
    lookup,
    merge_join,
    merge_join_positional,
    multicast,
    row_duplication,
    row_multiplication,
    row_transformation,
    sort,
    top_k_per_group,
)
from etlbox_spark.operators.aggregate import center_on_global_mean
from etlbox_spark.operators.multimodal import extract_features, frame_sample_plan, media_from_documents
from etlbox_spark.operators.similarity import cosine, cosine_near_dup_pairs, cosine_topk
from etlbox_spark.operators.textdedup import minhash_lsh_candidates, ngram_jaccard, simhash_near_dups
from etlbox_spark.operators.textstats import lang_id, quality_features
from etlbox_spark.operators.textdedup import normalize_text


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _scratch(name: str) -> str:
    """Fixed per-query scratch dir, WIPED on each invocation (ADVICE r03:
    mkdtemp leaked one dir — with written data — per queries() call, and
    bench/contract harnesses invoke these repeatedly). Keyed by PID so
    two concurrent harness processes (e.g. a contract sweep starting
    while bench.py is mid-flight) can't rmtree each other's live tables —
    bounded leak of one dir tree per process, not per invocation."""
    import os
    import shutil

    import atexit

    base = os.path.join("/tmp", f"etlbox_contract_scratch_{os.getpid()}")
    if not os.path.isdir(base):
        atexit.register(shutil.rmtree, base, ignore_errors=True)
    d = os.path.join(base, name)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    return d


# ---------------------------------------------------------------- CDC core

_EV_SPEC = MergeSpec(
    key_cols=("user_id", "event_type"),
    seq_col="event_id",
    compare_cols=("value",),
    op_col="op",
)


def _events_split(spark: SparkSession, sf_dir: str):
    """Snapshot = LWW state of the first half of the event stream;
    batch = LWW of the second half with derived upsert/tombstone ops."""
    ev = _t(spark, sf_dir, "events")
    cut = ev.agg((F.max("event_id") / 2).alias("c")).collect()[0][0]
    keys = ["user_id", "event_type"]
    bexp = bucket_expr(32, *keys)
    snap = (
        dedupe_lww(ev.where(F.col("event_id") < cut), keys, ["event_id"])
        .select(*keys, "value")
        .withColumn("bucket", bexp)
    )
    batch = (
        dedupe_lww(ev.where(F.col("event_id") >= cut), keys, ["event_id"])
        .withColumn("op", F.when(F.col("value") < 2.0, "delete").otherwise("update"))
        .select(*keys, "value", "op", "event_id")
        .withColumn("bucket", bexp)
    )
    return snap, batch


def _cdc_merge(mode: MergeMode):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        snap, batch = _events_split(spark, sf_dir)
        j = classify(snap, batch, _EV_SPEC, mode, payload_cols=["value"])
        return (
            j.where(F.col("action").isNotNull())
            .select("user_id", "event_type", "action", F.col("value").alias("val"))
        )

    return q


_CDC_ORACLE_TMPL = """
WITH snap AS (
  SELECT user_id, event_type, value FROM events
  WHERE event_id < (SELECT max(event_id)/2 FROM events)
  QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id DESC) = 1
), batch AS (
  SELECT user_id, event_type, value,
         CASE WHEN value < 2.0 THEN 'delete' ELSE 'update' END AS op
  FROM events
  WHERE event_id >= (SELECT max(event_id)/2 FROM events)
  QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id DESC) = 1
), j AS (
  SELECT coalesce(b.user_id, s.user_id) AS user_id,
         coalesce(b.event_type, s.event_type) AS event_type,
         CASE
           WHEN b.op = 'delete' AND s.user_id IS NOT NULL THEN {tomb_hit}
           WHEN b.op = 'delete' THEN NULL
           WHEN b.user_id IS NOT NULL AND s.user_id IS NULL THEN {ins_act}
           WHEN b.user_id IS NOT NULL AND s.value IS DISTINCT FROM b.value THEN {upd_act}
           WHEN b.user_id IS NOT NULL THEN 'exists'
           ELSE {s_only}
         END AS action,
         s.value AS s_value, b.value AS b_value
  FROM snap s FULL OUTER JOIN batch b
    ON s.user_id = b.user_id AND s.event_type = b.event_type
)
SELECT user_id, event_type, action,
       CASE WHEN action IN ('insert','update') THEN b_value ELSE s_value END AS val
FROM j WHERE action IS NOT NULL
"""


# -------------------------------------------------------------- the tables


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC merge-classification (Full mode) over the sf0.001
    event stream — the DbMerge pipeline re-expressed (SURVEY.md §2.6)."""
    return _cdc_merge(MergeMode.FULL)(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # ---- §2.3 row-level
    def q_row_transformation(spark, sf):
        li = _t(spark, sf, "lineitem")
        out = row_transformation(
            li.where(F.col("l_shipdate") < "1996-01-01"),
            {
                "l_orderkey": F.col("l_orderkey"),
                "l_linenumber": F.col("l_linenumber"),
                "revenue": F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4),
            },
            keep=False,
        )
        return out

    q["row_transformation"] = q_row_transformation

    def q_row_dup_mult(spark, sf):
        """§2.3 RowDuplication + RowMultiplication as one branch-tagged
        contract row. Consolidated (VERDICT r02 #3): the driver's
        correctness artifact caps at 50 queries, so the 1→N row emitters
        share a row to make room for the embeddings/multimodal family —
        both operators still run, each branch against its own table."""
        r = _t(spark, sf, "region")
        dup = row_duplication(r, predicate=F.col("r_regionkey") < 3).select(
            F.lit("dup").alias("op"),
            F.col("r_regionkey").cast("long").alias("key"),
            F.col("r_name").alias("val"),
        )
        p = _t(spark, sf, "part")
        mult = row_multiplication(p, "type_word", F.split(F.col("p_type"), " ")).select(
            F.lit("mult").alias("op"),
            F.col("p_partkey").cast("long").alias("key"),
            F.col("type_word").alias("val"),
        )
        return dup.unionByName(mult)

    q["row_dup_mult"] = q_row_dup_mult

    def q_column_rename(spark, sf):
        n = _t(spark, sf, "nation")
        return column_rename(
            n,
            {"n_nationkey": "nation_key", "n_name": "nation_name", "n_regionkey": "region_key"},
            drop_unmapped=True,
        )

    q["column_rename"] = q_column_rename

    # ---- §2.4 joins / lookup / branch
    def q_lookup(spark, sf):
        c = _t(spark, sf, "customer")
        n = _t(spark, sf, "nation")
        return lookup(
            c.select(F.col("c_custkey"), F.col("c_name"), F.col("c_nationkey").alias("n_nationkey")),
            n,
            match_cols=["n_nationkey"],
            retrieve_cols={"n_name": "nation_name"},
        ).select("c_custkey", "c_name", "nation_name")

    q["lookup"] = q_lookup

    def q_lookup_partial(spark, sf):
        """LookupTransformation partial-cache mode (2.x): dim side too big
        to broadcast → shuffled sort-merge join behind the same API."""
        o = _t(spark, sf, "orders")
        c = _t(spark, sf, "customer")
        return lookup(
            o.select(F.col("o_orderkey"), F.col("o_custkey").alias("c_custkey")),
            c,
            match_cols=["c_custkey"],
            retrieve_cols={"c_name": "cust_name", "c_mktsegment": "segment"},
            cache_mode="partial",
        ).select("o_orderkey", "cust_name", "segment")

    q["lookup_partial"] = q_lookup_partial

    def q_merge_join(spark, sf):
        o = _t(spark, sf, "orders").withColumnRenamed("o_custkey", "c_custkey")
        c = _t(spark, sf, "customer")
        return merge_join(o, c, on=["c_custkey"]).select("o_orderkey", "o_totalprice", "c_name")

    q["merge_join"] = q_merge_join

    def q_merge_join_positional(spark, sf):
        r = _t(spark, sf, "region").select("r_regionkey", "r_name")
        n = _t(spark, sf, "nation").select("n_nationkey", "n_name").where(F.col("n_nationkey") < 5)
        return merge_join_positional(r, n, ["r_regionkey"], ["n_nationkey"]).select(
            "r_name", "n_name"
        )

    q["merge_join_positional"] = q_merge_join_positional

    def q_cross_join(spark, sf):
        r = _t(spark, sf, "region").select("r_name")
        n = _t(spark, sf, "nation").select("n_name")
        return cross_join(n, r)

    q["cross_join"] = q_cross_join

    def q_multicast(spark, sf):
        c = _t(spark, sf, "customer")
        b1, b2 = multicast(
            c,
            [
                lambda d: d.groupBy("c_mktsegment")
                .agg(F.count(F.lit(1)).alias("n"))
                .select(F.lit("segment").alias("branch"), F.col("c_mktsegment").alias("key"), "n"),
                lambda d: d.groupBy("c_nationkey")
                .agg(F.count(F.lit(1)).alias("n"))
                .select(
                    F.lit("nation").alias("branch"),
                    F.col("c_nationkey").cast("string").alias("key"),
                    "n",
                ),
            ],
            persist=False,
        )
        return b1.unionByName(b2)

    q["multicast"] = q_multicast

    def q_as_of_join(spark, sf):
        """As-of join: each event enriched with the user's latest
        dimension version at or before the event time (dim = every 10th
        event, a stand-in for a versioned dimension)."""
        from etlbox_spark.operators.joins import as_of_join

        ev = _t(spark, sf, "events").select("event_id", "user_id", "ts")
        dim = (
            _t(spark, sf, "events")
            .where(F.pmod("event_id", F.lit(10)) == 0)
            .select(
                "user_id",
                F.col("ts").alias("dts"),
                F.col("event_id").alias("dim_event_id"),
                F.col("value").alias("dim_value"),
            )
        )
        out = as_of_join(ev, dim, on=["user_id"], left_ts="ts",
                         right_ts="dts", right_seq="dim_event_id")
        return out.select(
            "event_id", "dim_event_id", F.round("dim_value", 4).alias("dim_value")
        )

    q["as_of_join"] = q_as_of_join

    def q_range_join(spark, sf):
        """Point-in-interval range join via bucketized equi-join (no
        cartesian): every 7th event id matched to the intervals
        [d, d+250] anchored at every 100th event id."""
        from etlbox_spark.operators.joins import range_join_points

        ev = _t(spark, sf, "events")
        pts = ev.where(F.pmod("event_id", F.lit(7)) == 0).select(
            F.col("event_id").alias("p"))
        iv = ev.where(F.pmod("event_id", F.lit(100)) == 0).select(
            F.col("event_id").alias("iv_id"),
            F.col("event_id").alias("lo"),
            (F.col("event_id") + 250).alias("hi"),
        )
        return range_join_points(pts, iv, "p", "lo", "hi", bucket_width=256)

    q["range_join"] = q_range_join

    def q_conditional_split(spark, sf):
        o = _t(spark, sf, "orders")
        hit, miss = conditional_split(o, F.col("o_orderstatus") == "O")
        a = hit.agg(F.count(F.lit(1)).alias("n")).select(F.lit("open").alias("branch"), "n")
        b = miss.agg(F.count(F.lit(1)).alias("n")).select(F.lit("other").alias("branch"), "n")
        return a.unionByName(b)

    q["conditional_split"] = q_conditional_split

    # ---- §2.5 aggregation / blocking / set ops
    def q_aggregation(spark, sf):
        s = _t(spark, sf, "supplier")
        return aggregation(
            s,
            ["s_nationkey"],
            {
                "total_bal": F.round(F.sum("s_acctbal"), 2),
                "min_bal": ("min", "s_acctbal"),
                "max_bal": ("max", "s_acctbal"),
                "n": ("count", "s_suppkey"),
            },
        )

    q["aggregation"] = q_aggregation

    def q_salted_aggregation(spark, sf):
        """Two-phase salted agg for zipf-hot keys (BASELINE.json:6 skew);
        value-identical to the plain GROUP BY the oracle runs."""
        ev = _t(spark, sf, "events")
        totals = salted_aggregation(
            ev,
            ["event_type"],
            partial_aggs=[F.sum("value").alias("s"), F.count(F.lit(1)).alias("c")],
            merge_aggs=[F.round(F.sum("s"), 2).alias("total_value"),
                        F.sum("c").cast("long").alias("n_events")],
            salt_source="event_id",
        )
        uniq = salted_count_distinct(ev, ["event_type"], "user_id", out_col="n_users")
        return totals.join(uniq, "event_type")

    q["salted_aggregation"] = q_salted_aggregation

    def q_custom_agg_pandas(spark, sf):
        """Custom AggregationAction via applyInPandas (SURVEY.md §2.9):
        per-group midrange — Arrow grouped-map, oracle-checkable."""
        import pandas as pd
        from pyspark.sql import types as T

        from etlbox_spark.operators.aggregate import grouped_pandas_agg

        def midrange(pdf: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "s_nationkey": [pdf["s_nationkey"].iloc[0]],
                # no round(): pandas rounds half-even, DuckDB half-away —
                # (min+max)/2 alone is bit-identical IEEE on both sides
                "mid_bal": [(pdf["s_acctbal"].min() + pdf["s_acctbal"].max()) / 2],
                "n": [len(pdf)],
            })

        out = T.StructType([
            T.StructField("s_nationkey", T.LongType()),
            T.StructField("mid_bal", T.DoubleType()),
            T.StructField("n", T.LongType()),
        ])
        return grouped_pandas_agg(_t(spark, sf, "supplier"), ["s_nationkey"], midrange, out)

    q["custom_agg_pandas"] = q_custom_agg_pandas

    def q_pandas_row_transform(spark, sf):
        """RowTransformation escape hatch via mapInPandas (SURVEY.md §2.9),
        value-identical to a SQL expression the oracle runs."""
        import pandas as pd
        from pyspark.sql import types as T

        from etlbox_spark.operators.rows import pandas_transform

        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame()
            out["o_orderkey"] = pdf["o_orderkey"]
            out["price_band"] = (pdf["o_totalprice"] // 50000).astype("int64")
            return out

        out_schema = T.StructType([
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("price_band", T.LongType()),
        ])
        return pandas_transform(
            _t(spark, sf, "orders").select("o_orderkey", "o_totalprice"), fn, out_schema
        )

    q["pandas_row_transform"] = q_pandas_row_transform

    def q_q1_pricing_summary(spark, sf):
        li = _t(spark, sf, "lineitem")
        return (
            li.where(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").alias("sum_qty"),
                F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                    "sum_disc_price"
                ),
                F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                F.count(F.lit(1)).alias("count_order"),
            )
        )

    q["q1_pricing_summary"] = q_q1_pricing_summary

    def q_block_transformation(spark, sf):
        ev = _t(spark, sf, "events")
        return center_on_global_mean(ev, "value", "value_centered").select(
            "event_id", F.round("value_centered", 4).alias("value_centered")
        )

    q["block_transformation"] = q_block_transformation

    def q_set_ops(spark, sf):
        """§2.5 set ops + Distinct, one branch-tagged row (consolidated,
        VERDICT r02 #3 — extended this round to absorb the `distinct`
        row and free a slot under the driver's 50-query cap): INTERSECT
        + multiset EXCEPT ALL over the same two inputs, plus a
        `distinct()` operator branch. Union itself is proven by this
        query's own unionByName (and by multicast / error_routing /
        row_dup_mult)."""
        c = _t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
        s = _t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
        i = c.intersect(s).select(F.lit("intersect").alias("op"), "nationkey")
        x = c.exceptAll(s).select(F.lit("except_all").alias("op"), "nationkey")
        d = distinct(c).select(F.lit("distinct").alias("op"), "nationkey")
        return i.unionByName(x).unionByName(d)

    q["set_ops"] = q_set_ops

    def q_top_k_per_group(spark, sf):
        """Per-group top-k + global Sort (§2.5) as the o_custkey=-1
        branch (consolidated this round to free a slot under the
        50-query cap): `sort().limit(100)` with a rank sequence, so the
        total order is proven even though the driver's hash is
        order-insensitive. The rank window runs AFTER limit(100), so
        its single-partition stage sees ≤100 rows at any scale."""
        o = _t(spark, sf, "orders")
        grouped = top_k_per_group(
            o, ["o_custkey"], [F.col("o_totalprice").desc(), F.col("o_orderkey")], 3
        ).select("o_custkey", "o_orderkey", "o_totalprice", "rk")
        order = [F.col("o_totalprice").desc(), F.col("o_orderkey")]
        top100 = sort(o, order).limit(100).select(
            F.lit(-1).cast("long").alias("o_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(Window.orderBy(*order)).alias("rk"),
        )
        return grouped.unionByName(top100)

    q["top_k_per_group"] = q_top_k_per_group

    def q_cube_rollup(spark, sf):
        """§2.5 grouping sets, one branch-tagged row (consolidated,
        VERDICT r02 #3): CUBE and ROLLUP over the same grouping."""
        o = _t(spark, sf, "orders")
        cu = (
            o.cube("o_orderstatus", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("o_totalprice"), 2).alias("total"))
            .select(F.lit("cube").alias("op"), "o_orderstatus", "o_orderpriority", "n", "total")
        )
        ro = (
            o.rollup("o_orderstatus", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("o_totalprice"), 2).alias("total"))
            .select(F.lit("rollup").alias("op"), "o_orderstatus", "o_orderpriority", "n", "total")
        )
        return cu.unionByName(ro)

    q["cube_rollup"] = q_cube_rollup

    def q_xml_roundtrip(spark, sf):
        """Codec round-trips, one branch-tagged row per format:

        * fmt='xml' — XmlDestination + XmlSource: rows serialize via
          Spark 4 ``to_xml`` and parse back via ``from_xml`` (escaping
          included). Consolidated from the former xml_parse +
          xml_write_roundtrip pair (VERDICT r02 #3).
        * fmt='xlsx' — ExcelSource/Destination (round 3,
          sources/xlsx.py): the SAME rows go through the real file
          path — ``write_excel`` part-files on scratch, read back via
          the binaryFile → mapInPandas decode with an explicit schema.

        Both branches must recover the source values exactly, so the
        oracle is simply the source table twice (CLAUDE.md: round-trip
        oracles state the expected identity directly)."""
        from etlbox_spark.sources import read_excel, to_xml_rows, write_excel, xml_rows
        from pyspark.sql import types as T

        n = _t(spark, sf, "nation").select("n_nationkey", "n_name")
        xs = T.StructType([
            T.StructField("n_nationkey", T.LongType()),
            T.StructField("n_name", T.StringType()),
        ])
        via_xml = xml_rows(to_xml_rows(n), "xml", xs).select(
            F.lit("xml").alias("fmt"), "n_nationkey", "n_name"
        )

        xl_dir = _scratch("xlsx_roundtrip")
        write_excel(n.coalesce(1), xl_dir).collect()  # eager: files must exist for the read plan
        via_xlsx = read_excel(spark, xl_dir, schema=xs).select(
            F.lit("xlsx").alias("fmt"), "n_nationkey", "n_name"
        )
        return via_xml.unionByName(via_xlsx)

    q["xml_roundtrip"] = q_xml_roundtrip

    def q_window_running(spark, sf):
        li = _t(spark, sf, "lineitem")
        # RANGE frame: (l_orderkey, l_linenumber) is NOT unique in the
        # fixture, so ROWS framing would be tie-order-dependent; RANGE
        # sums all peers ≤ current key — deterministic on both engines.
        w = (
            Window.partitionBy("l_orderkey")
            .orderBy("l_linenumber")
            .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return li.select(
            "l_orderkey", "l_linenumber", F.sum("l_quantity").over(w).alias("running_qty")
        )

    q["window_running"] = q_window_running

    def q_pivot(spark, sf):
        li = _t(spark, sf, "lineitem")
        p = (
            li.groupBy("l_returnflag")
            .pivot("l_linestatus", ["O", "F"])
            .agg(F.sum("l_quantity"))
            .withColumnsRenamed({"O": "qty_o", "F": "qty_f"})
        )
        return p

    q["pivot"] = q_pivot

    def q_json_extract(spark, sf):
        """JSON scalar surface (SURVEY.md §2.7): get_json_object (path
        probe) and from_json (schema'd parse) over the events.props
        column, both ways value-identical."""
        ev = _t(spark, sf, "events")
        return ev.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("long").alias("k_path"),
            F.from_json("props", "k long").getField("k").alias("k_typed"),
        )

    q["json_extract"] = q_json_extract

    def q_percentiles(spark, sf):
        """Exact linear-interpolation percentiles per group (Spark
        `percentile` ≡ DuckDB `quantile_cont`)."""
        ev = _t(spark, sf, "events")
        pcts = F.percentile("value", F.array(F.lit(0.5), F.lit(0.95)))
        return ev.groupBy("event_type").agg(
            F.round(F.element_at(pcts, 1), 4).alias("p50"),
            F.round(F.element_at(pcts, 2), 4).alias("p95"),
        )

    q["percentiles"] = q_percentiles

    def q_sessionize(spark, sf):
        ev = _t(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        # interval arithmetic, not unix_timestamp (which truncates to
        # whole seconds): ts is timestamp[us] and the DuckDB oracle's
        # epoch() keeps the microseconds, so a 1800s gap that only
        # straddles the threshold at sub-second precision must classify
        # identically on both sides
        gap = F.col("ts") - F.lag("ts").over(w)
        marked = ev.withColumn(
            "new_s", F.when(gap > F.expr("INTERVAL 1800 SECONDS"), 1).otherwise(0)
        )
        return marked.groupBy("user_id").agg((F.sum("new_s") + 1).alias("n_sessions"))

    q["sessionize"] = q_sessionize

    def q_windowed_counts(spark, sf):
        """Event-time tumbling-window rollup (streaming/windows.py) in
        batch/backfill mode — the same expression tree the watermarked
        stream path runs, so live and backfill results cannot drift.
        value_cents is an integer-quantized sum (multi-row double sums
        are partition-order dependent and not oracle-replicable —
        CLAUDE.md float-determinism rule); window_start is formatted to
        whole seconds, exact because tumbling boundaries are aligned."""
        from etlbox_spark.streaming.windows import windowed_counts

        ev = _t(spark, sf, "events")
        out = windowed_counts(
            ev,
            ts_col="ts",
            keys=("event_type",),
            window_duration="10 minutes",
            watermark=None,
            aggs={
                "n_events": F.count(F.lit(1)),
                "value_cents": F.sum(F.round(F.col("value") * 100).cast("long")),
            },
        )
        return out.select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "value_cents",
        )

    q["windowed_counts"] = q_windowed_counts

    def q_session_windows(spark, sf):
        """Native gap-based session windows (F.session_window — the
        declarative sibling of the lag-based `sessionize` row and of
        streaming/windows.stateful_sessionize). Boundary rule: sessions
        are half-open [first, last+gap), so a new session starts when
        the inter-event gap is >= the 30-min gap — the oracle replicates
        exactly that with a gaps-and-islands window. session_start keeps
        the microseconds (%f / SSSSSS on both engines)."""
        from etlbox_spark.streaming.windows import session_windows

        ev = _t(spark, sf, "events")
        out = session_windows(
            ev, ts_col="ts", keys=("user_id",), gap="30 minutes", watermark=None
        )
        return out.select(
            "user_id",
            F.date_format("session_start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            "n_events",
        )

    q["session_windows"] = q_session_windows

    def q_error_routing(spark, sf):
        """LinkErrorTo parity (operators/errors.py): dirty string column
        typed via try_cast; failing rows route to the error branch with a
        reason; both branches unioned for the oracle."""
        from etlbox_spark.operators.errors import cast_or_route

        d = _t(spark, sf, "documents").select(
            "doc_id",
            F.when(
                F.pmod("doc_id", F.lit(7)) == 0,
                F.concat(F.lit("x"), F.col("doc_id").cast("string")),
            ).otherwise(F.col("doc_id").cast("string")).alias("raw"),
        )
        good, bad = cast_or_route(d, {"raw": "bigint"}, include_row_json=False)
        g = good.select(
            "doc_id", F.lit("good").alias("branch"), F.col("raw").alias("val"),
            F.lit(None).cast("string").alias("error_reason"))
        b = bad.select(
            "doc_id", F.lit("error").alias("branch"), F.lit(None).cast("long").alias("val"),
            "error_reason")
        return g.unionByName(b)

    q["error_routing"] = q_error_routing

    def q_sql_task(spark, sf):
        """§2.10 / §3.1 EP3 end-to-end (VERDICT r02 #8): nation lands in
        a lake table through the commit layer, CreateViewTask registers
        the snapshot as a temp view, SqlTask answers over it with
        spark.sql. The oracle states the same aggregate over the source
        parquet directly — equal iff the lake write→read→view→SQL chain
        preserved every row."""
        from etlbox_spark.engine.lake import LakeTable
        from etlbox_spark.functions.hashing import bucket_expr
        from etlbox_spark.tasks import create_view_task, sql_task

        n = _t(spark, sf, "nation")
        root = _scratch("sqltask") + "/nation"
        t = LakeTable.create(root, schema=n.schema, key_cols=["n_nationkey"], n_buckets=8)
        t.overwrite(n.withColumn("bucket", bucket_expr(8, "n_nationkey")), epoch_id=1)
        create_view_task(spark, root, "nation_lake")
        return sql_task(
            spark,
            """SELECT n_regionkey, count(*) AS n, min(n_nationkey) AS min_key,
                      max(n_nationkey) AS max_key
               FROM nation_lake GROUP BY n_regionkey""",
        )

    q["sql_task"] = q_sql_task

    # ---- §2.6 CDC / merge family
    def q_dedupe_lww(spark, sf):
        ev = _t(spark, sf, "events")
        return dedupe_lww(ev, ["user_id", "event_type"], ["event_id"]).select(
            "user_id", "event_type", "event_id", "value"
        )

    q["dedupe_lww"] = q_dedupe_lww

    q["cdc_merge_full"] = _cdc_merge(MergeMode.FULL)
    q["cdc_merge_delta"] = _cdc_merge(MergeMode.DELTA)
    q["cdc_merge_no_deletions"] = _cdc_merge(MergeMode.NO_DELETIONS)
    q["cdc_merge_only_updates"] = _cdc_merge(MergeMode.ONLY_UPDATES)
    q["cdc_merge_inserts_only"] = _cdc_merge(MergeMode.INSERTS_ONLY)

    # ---- training-data ops: text
    def q_dedup_exact(spark, sf):
        d = _t(spark, sf, "documents").repartition(spark.sparkContext.defaultParallelism)
        return exact_dedup(d, "text", "doc_id", normalize=normalize_text(F.col("text")))

    q["dedup_exact"] = q_dedup_exact

    # (doc_fingerprint folded into dedup_exact — its fingerprint column is
    #  the same sha256-of-normalized-text kernel; VERDICT r02 #3)
    def q_text_quality(spark, sf):
        return quality_features(_t(spark, sf, "documents"), "text", "doc_id").withColumns(
            {"n_chars_m": F.col("n_chars_m").cast("long"), "n_tokens": F.col("n_tokens").cast("long")}
        )

    q["text_quality"] = q_text_quality

    def q_lang_id(spark, sf):
        out = lang_id(_t(spark, sf, "documents"), "text", "doc_id")
        return out.withColumns(
            {c: F.col(c).cast("long") for c in ("score_en", "score_de", "score_fr")}
        )

    q["lang_id"] = q_lang_id

    def q_token_count(spark, sf):
        from etlbox_spark.operators.textstats import bpe_ish_token_count, token_count

        d = _t(spark, sf, "documents")
        return d.select(
            "doc_id",
            token_count(F.col("text")).cast("long").alias("n_ws"),
            bpe_ish_token_count(F.col("text")).cast("long").alias("n_bpe"),
        )

    q["token_count"] = q_token_count

    # LSH signature internals (xxhash64 permutations / blake2b bits) are
    # not SQL-expressible, so these two are oracle-checked as RECALL
    # assertions (VERDICT r01 §next-round 2): the query returns its
    # candidates filtered to exact n-gram jaccard ≥ 0.8, the oracle
    # computes ALL pairs ≥ 0.8 — equal iff the LSH missed nothing above
    # the threshold (deterministic: fixed seed + fixed fixture).
    def q_dedup_minhash_lsh(spark, sf):
        """MinHash-LSH candidates + exact n-gram-Jaccard verify vs the
        exact all-pairs oracle. The oracle demands COMPLETE recall, and
        banded LSH is probabilistic: with r rows/band and b bands a true
        pair at similarity s collides with P = 1-(1-s^r)^b. The original
        r=4/b=4 missed 6 of 256 true pairs at sf0.1 (P(miss|s≈0.88) ≈
        2-3%) while passing at sf0.01 by luck — a scale-fragile contract.
        r=4/b=16 drives P(miss) below 5e-4 even AT the 0.8 threshold
        (this corpus's near-dups sit at s≈0.85-0.95 where it is <1e-6),
        verified green at both sf0.01 and sf0.1. The statistical nature
        is inherent to LSH — recall-vs-parameter tests live in
        tests/test_textops.py; at 100 TB, b and r trade candidate volume
        against recall and stay caller-tunable."""
        # the fixture corpus is ONE parquet file → one input partition;
        # repartition so the O(rows·perms) signature pass uses the box
        # (at corpus scale the input's own partitioning supplies this —
        # see minhash_lsh_candidates' parallelism note)
        d = _t(spark, sf, "documents").repartition(spark.sparkContext.defaultParallelism)
        cand = minhash_lsh_candidates(d, "doc_id", "text", n_perm=64, bands=16)
        return (
            ngram_jaccard(cand, d, "doc_id", "text")
            .where(F.col("jaccard") >= 0.8)
            .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
        )

    q["dedup_minhash_lsh"] = q_dedup_minhash_lsh

    def q_dedup_simhash(spark, sf):
        # NOT repartitioned like its minhash sibling: measured 0.9 s as a
        # single Arrow batch vs 16.8 s at 32 partitions — simhash's
        # pandas_udf pays per-batch Python/Arrow overhead that dwarfs its
        # numpy kernel on this corpus size
        d = _t(spark, sf, "documents")
        cand = simhash_near_dups(d, "doc_id", "text", bands=8)
        return (
            ngram_jaccard(cand.drop("hamming"), d, "doc_id", "text")
            .where(F.col("jaccard") >= 0.8)
            .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
        )

    q["dedup_simhash"] = q_dedup_simhash

    def q_dedup_connected_components(spark, sf):
        """Cluster canonicalization: LSH candidates → exact-jaccard edges
        (≥ 0.8, the oracle-verified recall set) → connected components →
        (doc_id, canonical_id = component minimum)."""
        from etlbox_spark.operators.textdedup import connected_components

        d = _t(spark, sf, "documents").repartition(spark.sparkContext.defaultParallelism)
        cand = minhash_lsh_candidates(d, "doc_id", "text", n_perm=16, bands=4)
        edges = ngram_jaccard(cand, d, "doc_id", "text").where(F.col("jaccard") >= 0.8)
        return connected_components(edges).select(
            F.col("id").alias("doc_id"), F.col("component").alias("canonical_id")
        )

    q["dedup_connected_components"] = q_dedup_connected_components

    # ---- training-data ops: embeddings
    def q_ann_cosine_topk(spark, sf):
        e = _t(spark, sf, "embeddings")
        qv = [float(x) for x in e.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]]
        return cosine_topk(e, "embedding", qv, k=10).select(
            "vec_id", F.round("sim", 6).alias("sim")
        )

    q["ann_cosine_topk"] = q_ann_cosine_topk

    def q_embedding_near_dups(spark, sf):
        """Exact all-pairs baseline + sign-LSH variant, branch-tagged in
        ONE contract row (folded from two r03 rows to stay within the
        driver's 50-query artifact cap — VERDICT r03 #2 freed the slot
        for corpus_dedup_survivors). fmt='exact' is the labeled
        small-scale verification baseline (all-pairs BY DESIGN);
        fmt='lsh' is the scale path whose oracle replicates the
        component-sign banding bit-for-bit — equality of the two branch
        row-sets is itself the complete-recall proof."""
        from etlbox_spark.operators.similarity import component_sign_pairs

        e = _t(spark, sf, "embeddings")
        a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("v_a"))
        b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("v_b"))
        exact = (
            a.join(b, a.id_a < b.id_b)
            .select("id_a", "id_b", cosine(F.col("v_a"), F.col("v_b")).alias("cos"))
            .where(F.col("cos") >= 0.42)
            .select(F.lit("exact").alias("fmt"), "id_a", "id_b",
                    F.round("cos", 6).alias("cos"))
        )
        lsh = component_sign_pairs(
            e, "embedding", threshold=0.42, bands=16, bits_per_band=2
        ).select(F.lit("lsh").alias("fmt"), "id_a", "id_b", F.round("cos", 6).alias("cos"))
        return exact.unionByName(lsh)

    q["embedding_near_dups"] = q_embedding_near_dups

    def q_ann_ivf_topk(spark, sf):
        """IVF with TRAINED centroids, served FROM THE LAKE (VERDICT r03
        #2): 2 deterministic k-means iterations (exact quantized-integer
        means — the oracle unrolls the identical algorithm in SQL and
        reaches bit-identical centroids), then the embeddings are
        committed as a LakeTable whose BUCKET IS THE CLUSTER ID and the
        probe reads only the 2 nearest clusters' buckets via manifest
        file pruning (tests/test_pipelines.py asserts the pruned file
        set; PLANS.md audits the scan). Round-4 addition: the store is
        populated INCREMENTALLY — 3/4 of the vectors at build, the rest
        through ``ivf_lake_append`` (MoR deltas per touched cluster,
        exactly-once epoch) — so this row also proves the nightly-append
        path end-to-end. The oracle is unchanged from the plain-DataFrame
        r03 row — assignment depends only on the (identically trained)
        centroids, so WHEN a vector arrived changes the I/O, never the
        result."""
        from etlbox_spark.operators.similarity import (
            ivf_lake_append,
            ivf_lake_build,
            ivf_lake_topk,
            kmeans_centroids,
        )

        e = _t(spark, sf, "embeddings")
        cents = kmeans_centroids(e, "embedding", 8, iters=2)
        qv = [float(x) for x in e.where(F.col("vec_id") == 7).select("embedding").collect()[0][0]]
        t = ivf_lake_build(
            e.where(F.col("vec_id") % 4 != 0), _scratch("ivf_lake") + "/emb",
            "embedding", cents,
        )
        ivf_lake_append(spark, t, e.where(F.col("vec_id") % 4 == 0), epoch_id=2)
        return ivf_lake_topk(spark, t, "embedding", qv, cents, k=5, n_probe=2).select(
            "vec_id", F.round("sim", 6).alias("sim")
        )

    q["ann_ivf_topk"] = q_ann_ivf_topk

    def q_corpus_dedup_survivors(spark, sf):
        """The composed training-data pipeline (VERDICT r03 #3) PLUS its
        incremental regime: documents split 3:1 into a corpus and a "new
        crawl" batch; the corpus runs the full exact → LSH → Jaccard →
        components → lake-commit chain, an LSH signature index is
        materialized from the surviving snapshot, and the batch is then
        deduped INCREMENTALLY against corpus + peers (broadcast band
        probe, pruned point reads of nominated corpus text — the corpus
        is never re-shingled) with survivors appended through a second
        exactly-once merge epoch. Output = the final lake snapshot:
        (doc_id, content sha, phase base|incr) — so one row proves the
        batch pipeline, the index build, the incremental probe, and both
        commit/read paths."""
        from etlbox_spark.operators.textdedup import (
            corpus_dedup_pipeline,
            dedup_incremental,
            lsh_index_build,
        )

        par = spark.sparkContext.defaultParallelism
        d = _t(spark, sf, "documents").select("doc_id", "text")
        root = _scratch("corpus_dedup")
        corpus = d.where(F.col("doc_id") % 4 != 0)
        batch = d.where(F.col("doc_id") % 4 == 0)
        t, _ = corpus_dedup_pipeline(corpus, root + "/docs", parallelism=par)
        idx = lsh_index_build(t.read(spark, with_bucket=False), root + "/idx", parallelism=par)
        dedup_incremental(spark, t, idx, batch, commit_epoch=2)
        return t.read(spark, with_bucket=False).select(
            "doc_id",
            F.sha2(F.col("text"), 256).alias("content_sha"),
            F.when(F.col("doc_id") % 4 == 0, F.lit("incr"))
            .otherwise(F.lit("base"))
            .alias("phase"),
        )

    q["corpus_dedup_survivors"] = q_corpus_dedup_survivors

    # ---- multimodal plumbing
    # (multimodal_meta folded into multimodal_features, whose output is a
    #  superset: media_id, modality, byte_len + the decoded-feature
    #  invariants; VERDICT r02 #3)
    def q_multimodal_features(spark, sf):
        # oracle-computable projection of the decoded features (VERDICT
        # r01): the stub featurizer emits a normalized 8-bin histogram,
        # so dim and L1 mass (=1.0 for any non-empty payload) are
        # invariants DuckDB can state directly; byte_len checks the
        # payload plumbing end-to-end
        m = media_from_documents(_t(spark, sf, "documents"))
        f = extract_features(m, dim=8)
        return f.select(
            "media_id",
            "modality",
            "byte_len",
            F.size("feat").cast("long").alias("feat_dim"),
            F.round(
                F.aggregate("feat", F.lit(0.0), lambda acc, v: acc + v.cast("double")), 4
            ).alias("feat_l1"),
        )

    q["multimodal_features"] = q_multimodal_features

    def q_frame_sample(spark, sf):
        m = media_from_documents(_t(spark, sf, "documents"))
        return frame_sample_plan(m, every_ms=100)

    q["frame_sample"] = q_frame_sample

    return q


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}

    o["row_transformation"] = """
      SELECT l_orderkey, l_linenumber,
             round(l_extendedprice * (1 - l_discount), 4) AS revenue
      FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-01-01'
    """
    o["row_dup_mult"] = """
      SELECT 'dup' AS op, CAST(r_regionkey AS BIGINT) AS key, r_name AS val FROM region
      UNION ALL
      SELECT 'dup' AS op, CAST(r_regionkey AS BIGINT), r_name
      FROM region WHERE r_regionkey < 3
      UNION ALL
      SELECT 'mult' AS op, CAST(p_partkey AS BIGINT),
             unnest(string_split(p_type, ' '))
      FROM part
    """
    o["column_rename"] = """
      SELECT n_nationkey AS nation_key, n_name AS nation_name, n_regionkey AS region_key
      FROM nation
    """
    o["lookup"] = """
      SELECT c_custkey, c_name, n.n_name AS nation_name
      FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    """
    o["lookup_partial"] = """
      SELECT o_orderkey, c.c_name AS cust_name, c.c_mktsegment AS segment
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """
    o["merge_join"] = """
      SELECT o_orderkey, o_totalprice, c_name
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """
    o["merge_join_positional"] = """
      WITH l AS (SELECT r_name, row_number() OVER (ORDER BY r_regionkey) AS pos FROM region),
           r AS (SELECT n_name, row_number() OVER (ORDER BY n_nationkey) AS pos
                 FROM nation WHERE n_nationkey < 5)
      SELECT l.r_name, r.n_name FROM l JOIN r USING (pos)
    """
    o["cross_join"] = """
      SELECT n_name, r_name FROM nation CROSS JOIN region
    """
    # union-and-fill replica of operators/joins.as_of_join: the right
    # payload rides as one struct so the fill picks whole versions
    o["as_of_join"] = """
      WITH d AS (
        SELECT user_id, ts AS dts, event_id AS dim_event_id, value AS dim_value
        FROM events WHERE event_id % 10 = 0
      ),
      u AS (
        SELECT user_id, ts AS uts, event_id, 1 AS side,
               CAST(NULL AS BIGINT) AS rseq,
               CAST(NULL AS STRUCT(id BIGINT, val DOUBLE)) AS r
        FROM events
        UNION ALL
        SELECT user_id, dts, NULL, 0, dim_event_id,
               {'id': dim_event_id, 'val': dim_value}
        FROM d
      ),
      f AS (
        SELECT event_id, side,
               last_value(r IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY uts, side, rseq
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
        FROM u
      )
      SELECT event_id, s.id AS dim_event_id, round(s.val, 4) AS dim_value
      FROM f WHERE side = 1
    """
    o["range_join"] = """
      WITH pts AS (SELECT event_id AS p FROM events WHERE event_id % 7 = 0),
      iv AS (
        SELECT event_id AS iv_id, event_id AS lo, event_id + 250 AS hi
        FROM events WHERE event_id % 100 = 0
      )
      SELECT p, iv_id, lo, hi FROM pts JOIN iv ON p BETWEEN lo AND hi
    """
    o["multicast"] = """
      SELECT 'segment' AS branch, c_mktsegment AS key, count(*) AS n
      FROM customer GROUP BY c_mktsegment
      UNION ALL
      SELECT 'nation' AS branch, CAST(c_nationkey AS VARCHAR) AS key, count(*) AS n
      FROM customer GROUP BY c_nationkey
    """
    o["conditional_split"] = """
      SELECT 'open' AS branch, count(*) AS n FROM orders WHERE o_orderstatus = 'O'
      UNION ALL
      SELECT 'other' AS branch, count(*) AS n FROM orders
      WHERE NOT coalesce(o_orderstatus = 'O', FALSE)
    """
    o["aggregation"] = """
      SELECT s_nationkey, round(sum(s_acctbal), 2) AS total_bal,
             min(s_acctbal) AS min_bal, max(s_acctbal) AS max_bal,
             count(s_suppkey) AS n
      FROM supplier GROUP BY s_nationkey
    """
    o["cube_rollup"] = """
      SELECT 'cube' AS op, o_orderstatus, o_orderpriority, count(*) AS n,
             round(sum(o_totalprice), 2) AS total
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      UNION ALL
      SELECT 'rollup' AS op, o_orderstatus, o_orderpriority, count(*) AS n,
             round(sum(o_totalprice), 2) AS total
      FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """
    # the engine serializes nation rows with to_xml and parses them back
    # with from_xml; the oracle states the expected round-trip directly
    o["xml_roundtrip"] = """
      SELECT 'xml' AS fmt, n_nationkey, n_name FROM nation
      UNION ALL
      SELECT 'xlsx' AS fmt, n_nationkey, n_name FROM nation
    """
    o["salted_aggregation"] = """
      SELECT event_type, round(sum(value), 2) AS total_value,
             count(*) AS n_events, count(DISTINCT user_id) AS n_users
      FROM events GROUP BY event_type
    """
    o["custom_agg_pandas"] = """
      SELECT s_nationkey, (min(s_acctbal) + max(s_acctbal)) / 2 AS mid_bal,
             count(*) AS n
      FROM supplier GROUP BY s_nationkey
    """
    o["pandas_row_transform"] = """
      SELECT o_orderkey, CAST(floor(o_totalprice / 50000) AS BIGINT) AS price_band
      FROM orders
    """
    o["q1_pricing_summary"] = """
      SELECT l_returnflag, l_linestatus,
             sum(l_quantity) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_base_price,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             round(avg(l_quantity), 4) AS avg_qty,
             count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
    """
    o["block_transformation"] = """
      SELECT event_id, round(value - (SELECT avg(value) FROM events), 4) AS value_centered
      FROM events
    """
    o["set_ops"] = """
      SELECT 'intersect' AS op, nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
      )
      UNION ALL
      SELECT 'except_all' AS op, nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT ALL
        SELECT s_nationkey AS nationkey FROM supplier
      )
      UNION ALL
      SELECT 'distinct' AS op, nationkey FROM (
        SELECT DISTINCT c_nationkey AS nationkey FROM customer
      )
    """
    o["top_k_per_group"] = """
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders
      QUALIFY rk <= 3
      UNION ALL
      SELECT CAST(-1 AS BIGINT) AS o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders
      QUALIFY rk <= 100
    """
    o["window_running"] = """
      SELECT l_orderkey, l_linenumber,
             sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                                   RANGE UNBOUNDED PRECEDING) AS running_qty
      FROM lineitem
    """
    o["pivot"] = """
      SELECT l_returnflag,
             sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS qty_o,
             sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS qty_f
      FROM lineitem GROUP BY l_returnflag
    """
    o["json_extract"] = """
      SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_path,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed
      FROM events
    """
    o["percentiles"] = """
      SELECT event_type,
             round(quantile_cont(value, 0.5), 4) AS p50,
             round(quantile_cont(value, 0.95), 4) AS p95
      FROM events GROUP BY event_type
    """
    o["sessionize"] = """
      WITH g AS (
        SELECT user_id,
               CASE WHEN epoch(ts) - epoch(lag(ts) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                    THEN 1 ELSE 0 END AS new_s
        FROM events
      )
      SELECT user_id, CAST(sum(new_s) + 1 AS BIGINT) AS n_sessions
      FROM g GROUP BY user_id
    """
    o["windowed_counts"] = """
      SELECT strftime(TIMESTAMP '1970-01-01'
                      + CAST(floor(epoch(ts) / 600) * 600 AS BIGINT)
                        * INTERVAL '1 second',
                      '%Y-%m-%d %H:%M:%S') AS window_start,
             event_type,
             count(*) AS n_events,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
      FROM events
      GROUP BY 1, 2
    """
    o["session_windows"] = """
      WITH m AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch(ts) - epoch(lag(ts) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)) >= 1800
                    THEN 1 ELSE 0 END AS new_s
        FROM events
      ), s AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM m
      )
      SELECT user_id,
             strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
             count(*) AS n_events
      FROM s GROUP BY user_id, sid
    """
    o["dedupe_lww"] = """
      SELECT user_id, event_type, event_id, value FROM events
      QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                                 ORDER BY event_id DESC) = 1
    """
    o["sql_task"] = """
      SELECT n_regionkey, count(*) AS n, min(n_nationkey) AS min_key,
             max(n_nationkey) AS max_key
      FROM nation GROUP BY n_regionkey
    """
    o["error_routing"] = """
      WITH d AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0 THEN 'x' || CAST(doc_id AS VARCHAR)
                    ELSE CAST(doc_id AS VARCHAR) END AS raw
        FROM documents
      )
      SELECT doc_id, 'good' AS branch, TRY_CAST(raw AS BIGINT) AS val,
             CAST(NULL AS VARCHAR) AS error_reason
      FROM d WHERE TRY_CAST(raw AS BIGINT) IS NOT NULL
      UNION ALL
      SELECT doc_id, 'error' AS branch, CAST(NULL AS BIGINT) AS val,
             'cast_failed:raw' AS error_reason
      FROM d WHERE TRY_CAST(raw AS BIGINT) IS NULL
    """
    _std = {"ins_act": "'insert'", "upd_act": "'update'"}
    o["cdc_merge_full"] = _CDC_ORACLE_TMPL.format(s_only="'delete'", tomb_hit="'delete'", **_std)
    o["cdc_merge_delta"] = _CDC_ORACLE_TMPL.format(s_only="NULL", tomb_hit="'delete'", **_std)
    # NO_DELETIONS suppresses every would-be delete (tombstone hits incl.)
    # and records it as an existence flag
    o["cdc_merge_no_deletions"] = _CDC_ORACLE_TMPL.format(
        s_only="'exists'", tomb_hit="'exists'", **_std
    )
    # ONLY_UPDATES drops would-be inserts unlogged; INSERTS_ONLY flags
    # would-be updates/deletes as existence (old payload kept)
    o["cdc_merge_only_updates"] = _CDC_ORACLE_TMPL.format(
        s_only="NULL", tomb_hit="'exists'", ins_act="NULL", upd_act="'update'"
    )
    o["cdc_merge_inserts_only"] = _CDC_ORACLE_TMPL.format(
        s_only="NULL", tomb_hit="'exists'", ins_act="'insert'", upd_act="'exists'"
    )

    _NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
    o["dedup_exact"] = f"""
      SELECT min(doc_id) AS doc_id, sha256({_NORM}) AS fingerprint,
             count(*) AS dup_count
      FROM documents GROUP BY 2
    """
    _TOKS = f"string_split({_NORM}, ' ')"
    _PUNCT = "len(regexp_extract_all(text, '[.,;:!?]'))"
    _NTOK = "len(string_split_regex(trim(text), '\\s+'))"
    o["text_quality"] = f"""
      SELECT doc_id,
             length(text) AS n_chars_m,
             {_NTOK} AS n_tokens,
             round({_PUNCT} / greatest(length(text), 1), 6) AS punct_ratio,
             round(len(list_filter({_TOKS},
                   x -> x IN ('the','and','of','to','a')))
                   / greatest(len({_TOKS}), 1), 6) AS stopword_ratio,
             ({_NTOK} >= 5 AND length(text) >= 30
              AND {_PUNCT} / greatest(length(text), 1) <= 0.2) AS quality_ok
      FROM documents
    """
    o["lang_id"] = f"""
      WITH s AS (
        SELECT doc_id,
               len(list_filter({_TOKS}, x -> x IN ('the','and','of','to','a'))) AS score_en,
               len(list_filter({_TOKS}, x -> x IN ('der','die','und','das','ist'))) AS score_de,
               len(list_filter({_TOKS}, x -> x IN ('le','la','et','les','des'))) AS score_fr
        FROM documents
      )
      SELECT doc_id, score_en, score_de, score_fr,
             CASE WHEN score_en >= score_de AND score_en >= score_fr THEN 'en'
                  WHEN score_de >= score_fr THEN 'de'
                  ELSE 'fr' END AS lang_pred
      FROM s
    """
    o["token_count"] = f"""
      SELECT doc_id,
             {_NTOK} AS n_ws,
             len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe
      FROM documents
    """
    _COS = (
        "list_dot_product(a, b) / "
        "(sqrt(list_dot_product(a, a)) * sqrt(list_dot_product(b, b)))"
    )
    o["ann_cosine_topk"] = f"""
      WITH q AS (SELECT embedding::DOUBLE[] AS b FROM embeddings WHERE vec_id = 0)
      SELECT vec_id, round({_COS}, 6) AS sim
      FROM (SELECT vec_id, embedding::DOUBLE[] AS a FROM embeddings), q
      ORDER BY {_COS} DESC, vec_id LIMIT 10
    """
    # recall oracles for the LSH dedup paths: ALL pairs with exact
    # word-3-gram jaccard >= 0.8 (the queries return their LSH candidates
    # filtered by the same threshold — equal iff recall is complete).
    # Shingling mirrors operators/textdedup.word_ngrams: normalized
    # tokens; whole text as the single shingle when < 3 tokens.
    _SHJ = r"""
      WITH t AS (
        SELECT doc_id,
               string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        FROM documents
      ), d AS (
        SELECT doc_id, list_distinct(
          CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
               ELSE list_transform(generate_series(1, len(toks) - 2),
                                   i -> array_to_string(toks[i:i+2], ' '))
          END) AS sh
        FROM t
      )
      SELECT id_a, id_b, round(j, 4) AS jaccard FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               len(list_intersect(a.sh, b.sh))::DOUBLE
                 / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS j
        FROM d a JOIN d b ON a.doc_id < b.doc_id
      ) WHERE j >= 0.8
    """
    o["dedup_minhash_lsh"] = _SHJ
    o["dedup_simhash"] = _SHJ
    # transitive closure over the same jaccard>=0.8 edge set via a
    # recursive CTE; canonical id = min reachable vertex (incl. self)
    o["dedup_connected_components"] = f"""
      WITH RECURSIVE ej AS ({_SHJ}),
      sym AS (
        SELECT id_a AS s, id_b AS d FROM ej
        UNION
        SELECT id_b AS s, id_a AS d FROM ej
      ),
      reach(s, d) AS (
        SELECT s, d FROM sym
        UNION
        SELECT r.s, y.d FROM reach r JOIN sym y ON r.d = y.s
      )
      SELECT n.id AS doc_id, least(n.id, min(r.d)) AS canonical_id
      FROM (SELECT DISTINCT s AS id FROM sym) n
      LEFT JOIN reach r ON r.s = n.id
      GROUP BY n.id
    """
    # one branch-tagged row for both variants (see q_embedding_near_dups):
    # fmt='exact' = all-pairs baseline; fmt='lsh' = exact replica of
    # component_sign_pairs (band key = sign bits of 2 consecutive
    # components, 16 bands, candidates = any-band agreement)
    o["embedding_near_dups"] = """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      bk AS (
        SELECT vec_id, v, band,
               (CASE WHEN v[band * 2 + 1] >= 0 THEN 1 ELSE 0 END
                + CASE WHEN v[band * 2 + 2] >= 0 THEN 2 ELSE 0 END) AS bkey
        FROM e, (SELECT unnest(generate_series(0, 15)) AS band)
      ),
      p AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_dot_product(a.v, b.v) /
               (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos_v
        FROM bk a JOIN bk b
          ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id
      ),
      x AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_dot_product(a.v, b.v) /
               (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos_v
        FROM e a JOIN e b ON a.vec_id < b.vec_id
      )
      SELECT 'exact' AS fmt, id_a, id_b, round(cos_v, 6) AS cos
      FROM x WHERE cos_v >= 0.42
      UNION ALL
      SELECT 'lsh' AS fmt, id_a, id_b, round(max(cos_v), 6) AS cos
      FROM p WHERE cos_v >= 0.42 GROUP BY id_a, id_b
    """
    # exact replica of the TRAINED IVF path (VERDICT r02 #5): init = the
    # 8 lowest-id vectors, then TWO unrolled k-means iterations — assign
    # by max cosine (ties → lowest index), update = element-wise mean via
    # EXACT integer sums of round(v*1e6) divided back in double (the
    # order-independent construction kmeans_centroids uses, so both
    # engines land on bit-identical centroids) — then nearest-centroid
    # assignment, probe the 2 centroids nearest the query (vec_id 7),
    # exact top-5 within them
    def _icos(a, b):
        return (
            f"list_dot_product({a}, {b}) / "
            f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
        )

    def _iassign(name, cents):
        return f"""{name} AS (
        SELECT vec_id, v, cidx FROM (
          SELECT e.vec_id, e.v, c.cidx,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY {_icos('e.v', 'c.cv')} DESC, c.cidx ASC) AS rn
          FROM e CROSS JOIN {cents} c
        ) WHERE rn = 1
      )"""

    def _iupdate(mname, cname, aname, prev):
        return f"""{mname} AS (
        SELECT cidx, i,
               CAST(sum(CAST(round(val * 1000000.0) AS BIGINT)) AS DOUBLE)
                 / (1000000.0 * count(*)) AS mu
        FROM (SELECT cidx, generate_subscripts(v, 1) AS i, unnest(v) AS val FROM {aname})
        GROUP BY cidx, i
      ),
      {cname} AS (
        SELECT {prev}.cidx, coalesce(n.cv, {prev}.cv) AS cv
        FROM {prev} LEFT JOIN
             (SELECT cidx, list(mu ORDER BY i) AS cv FROM {mname} GROUP BY cidx) n
        USING (cidx)
      )"""

    o["ann_ivf_topk"] = f"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      q AS (SELECT v AS qv FROM e WHERE vec_id = 7),
      c0 AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, v AS cv
        FROM (SELECT * FROM e ORDER BY vec_id LIMIT 8)
      ),
      {_iassign('a1', 'c0')},
      {_iupdate('m1', 'c1', 'a1', 'c0')},
      {_iassign('a2', 'c1')},
      {_iupdate('m2', 'c2', 'a2', 'c1')},
      {_iassign('af', 'c2')},
      probe AS (
        SELECT cidx FROM c2, q
        ORDER BY {_icos('cv', 'qv')} DESC, cidx
        LIMIT 2
      )
      SELECT vec_id, round({_icos('v', 'qv')}, 6) AS sim
      FROM (SELECT vec_id, v FROM af WHERE cidx IN (SELECT cidx FROM probe)), q
      ORDER BY {_icos('v', 'qv')} DESC, vec_id
      LIMIT 5
    """
    # composed corpus-dedup pipeline: exact stage (min id per normalized
    # sha256) → word-3-gram Jaccard >= 0.8 edges among exact survivors
    # (all-pairs here — the LSH recall guarantee is the dedup_minhash_lsh
    # row) → transitive closure → min-id canonical survivors. The Spark
    # side reads its answer back from the committed LakeTable snapshot,
    # so equality also certifies the lake write/read path.
    # Incremental phase semantics (the anchored-component rule of
    # dedup_incremental): a batch doc whose verified-edge component
    # touches any base survivor is dropped; a corpus-free component keeps
    # its minimum batch id. Exact-fingerprint equality implies identical
    # normalized text, hence identical shingle sets and Jaccard = 1, so
    # "fp-equal OR jaccard >= t" collapses to the jaccard predicate here.
    o["corpus_dedup_survivors"] = f"""
      WITH RECURSIVE norm AS (
        SELECT doc_id, {_NORM} AS nt, text FROM documents
      ),
      tk AS (SELECT doc_id, string_split(nt, ' ') AS toks FROM norm),
      shl AS (
        SELECT doc_id, list_distinct(
          CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
               ELSE list_transform(generate_series(1, len(toks) - 2),
                                   i -> array_to_string(toks[i:i+2], ' '))
          END) AS sh
        FROM tk
      ),
      corp AS (SELECT doc_id, nt, text FROM norm WHERE doc_id % 4 <> 0),
      ex AS (SELECT min(doc_id) AS doc_id FROM corp GROUP BY sha256(nt)),
      s AS (SELECT c.doc_id, c.text FROM corp c JOIN ex USING (doc_id)),
      ssh AS (SELECT x.doc_id, x.sh FROM shl x JOIN s USING (doc_id)),
      ej AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM ssh a JOIN ssh b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
              / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8
      ),
      sym AS (
        SELECT id_a AS s, id_b AS dd FROM ej
        UNION
        SELECT id_b AS s, id_a AS dd FROM ej
      ),
      reach(s, dd) AS (
        SELECT s, dd FROM sym
        UNION
        SELECT r.s, y.dd FROM reach r JOIN sym y ON r.dd = y.s
      ),
      comp AS (
        SELECT n.id AS doc_id, least(n.id, min(r.dd)) AS canonical
        FROM (SELECT DISTINCT s AS id FROM sym) n
        LEFT JOIN reach r ON r.s = n.id
        GROUP BY n.id
      ),
      base AS (
        SELECT s.doc_id, s.text
        FROM s LEFT JOIN comp c ON s.doc_id = c.doc_id
        WHERE c.doc_id IS NULL OR c.canonical = s.doc_id
      ),
      bat AS (SELECT doc_id FROM norm WHERE doc_id % 4 = 0),
      bsh AS (SELECT x.doc_id, x.sh FROM shl x JOIN bat USING (doc_id)),
      csh AS (SELECT x.doc_id, x.sh FROM shl x JOIN base USING (doc_id)),
      bbe AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bsh a JOIN bsh b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
              / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8
      ),
      bsym AS (
        SELECT id_a AS s, id_b AS dd FROM bbe
        UNION
        SELECT id_b AS s, id_a AS dd FROM bbe
      ),
      breach(s, dd) AS (
        SELECT s, dd FROM bsym
        UNION
        SELECT r.s, y.dd FROM breach r JOIN bsym y ON r.dd = y.s
      ),
      blab AS (
        SELECT b.doc_id, least(b.doc_id, coalesce(min(r.dd), b.doc_id)) AS lab
        FROM bat b LEFT JOIN breach r ON r.s = b.doc_id
        GROUP BY b.doc_id
      ),
      linked AS (
        SELECT DISTINCT a.doc_id
        FROM bsh a CROSS JOIN csh c
        WHERE len(list_intersect(a.sh, c.sh))::DOUBLE
              / (len(a.sh) + len(c.sh) - len(list_intersect(a.sh, c.sh))) >= 0.8
      ),
      tainted AS (SELECT DISTINCT l.lab FROM blab l JOIN linked k USING (doc_id)),
      incr AS (
        SELECT l.doc_id FROM blab l
        WHERE l.lab = l.doc_id AND l.lab NOT IN (SELECT lab FROM tainted)
      )
      SELECT b.doc_id, sha256(b.text) AS content_sha, 'base' AS phase FROM base b
      UNION ALL
      SELECT n.doc_id, sha256(n.text) AS content_sha, 'incr' AS phase
      FROM incr i JOIN norm n USING (doc_id)
    """
    # stub featurizer invariants: normalized 8-bin histogram over the
    # payload bytes sums to 1 (0 for empty payloads); byte_len checks the
    # binary plumbing end-to-end
    o["multimodal_features"] = """
      SELECT doc_id AS media_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
             strlen(text) AS byte_len,
             CAST(8 AS BIGINT) AS feat_dim,
             CAST(CASE WHEN strlen(text) = 0 THEN 0 ELSE 1 END AS DOUBLE) AS feat_l1
      FROM documents
    """
    o["frame_sample"] = """
      WITH v AS (
        SELECT doc_id AS media_id, strlen(text) AS bl FROM documents WHERE doc_id % 3 = 2
      ), f AS (
        SELECT media_id,
               unnest(generate_series(0, greatest(CAST(floor(bl / 100) AS INT), 1) - 1))
                 AS frame_idx
        FROM v
      )
      SELECT media_id, frame_idx, frame_idx * 100 AS frame_ts_ms FROM f
    """
    return o
