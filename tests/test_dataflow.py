"""Dataflow facade (LinkTo / Network.Execute parity): wiring, predicate
routing, multicast fan-out, union-in, multiple sinks in one execute()."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etlbox_spark.operators.dataflow import Pipe

SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("grp", T.StringType()),
     T.StructField("val", T.DoubleType())]
)
ROWS = [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0), (4, "b", 40.0), (5, "a", 50.0)]


def _src(spark):
    return Pipe(spark.createDataFrame(ROWS, SCHEMA))


def test_link_transform_and_sink(spark):
    out = (
        _src(spark)
        .link(lambda df: df.withColumn("val2", F.col("val") * 2))
        .to(lambda df: sorted((r.id, r.val2) for r in df.collect()), name="mem")
        .execute()
    )
    assert out["mem"] == [(1, 20.0), (2, 40.0), (3, 60.0), (4, 80.0), (5, 100.0)]


def test_link_predicate_routes_rows(spark):
    out = (
        _src(spark)
        .link(lambda df: df.select("id"), predicate=F.col("grp") == "a")
        .to(lambda df: sorted(r.id for r in df.collect()), name="a_only")
        .execute()
    )
    assert out["a_only"] == [1, 3, 5]


def test_split_multicast_union_multiple_sinks(spark):
    src = _src(spark)
    hot, cold = src.split(F.col("val") >= 30)
    c1, c2 = cold.multicast(2)
    merged = hot.union(c1)
    merged.to(lambda df: df.count(), name="merged_n")
    c2.link(lambda df: df.groupBy("grp").agg(F.sum("val").alias("s"))) \
      .to(lambda df: {r.grp: r.s for r in df.collect()}, name="cold_sums")
    hot.to(lambda df: sorted(r.id for r in df.collect()), name="hot_ids")
    res = src.network.execute()
    assert res["merged_n"] == 5
    assert res["hot_ids"] == [3, 4, 5]
    assert res["cold_sums"] == {"a": 10.0, "b": 20.0}


def test_network_refuses_duplicate_sink_names(spark):
    import pytest as _pytest

    from etlbox_spark.operators.dataflow import Pipe

    p = Pipe(spark.range(3))
    p.to(lambda df: df.count(), name="sink_1")
    with _pytest.raises(ValueError, match="duplicate sink name"):
        p.to(lambda df: df.count(), name="sink_1")
    # auto-naming skips taken names instead of colliding-then-losing a result
    p.to(lambda df: df.count())  # would have auto-named itself sink_1 before
    res = p.execute()
    assert len(res) == 2 and all(v == 3 for v in res.values())
