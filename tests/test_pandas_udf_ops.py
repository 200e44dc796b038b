"""The sanctioned Arrow slow paths (SURVEY.md §2.9): custom
AggregationAction via applyInPandas and the RowTransformation escape
hatch via mapInPandas — value-checked against plain-Spark equivalents."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etlbox_spark.operators.aggregate import grouped_pandas_agg
from etlbox_spark.operators.rows import pandas_transform

SCHEMA = T.StructType(
    [T.StructField("grp", T.StringType()), T.StructField("v", T.DoubleType())]
)
ROWS = [("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 30.0), ("b", 50.0), ("a", 5.0)]


def test_grouped_pandas_agg_custom_action(spark):
    """A non-expressible aggregate: per-group geometric-ish midrange."""

    def midrange(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"grp": [pdf["grp"].iloc[0]], "mid": [(pdf["v"].min() + pdf["v"].max()) / 2]}
        )

    out_schema = T.StructType(
        [T.StructField("grp", T.StringType()), T.StructField("mid", T.DoubleType())]
    )
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = {r.grp: r.mid for r in grouped_pandas_agg(df, ["grp"], midrange, out_schema).collect()}
    want = {
        r.grp: r.mid
        for r in df.groupBy("grp")
        .agg(((F.min("v") + F.max("v")) / 2).alias("mid"))
        .collect()
    }
    assert got == want == {"a": 3.0, "b": 30.0}


def test_pandas_transform_matches_expression(spark):
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["v"] = pdf["v"].clip(lower=3.0) * 2
        return pdf

    df = spark.createDataFrame(ROWS, SCHEMA)
    got = sorted((r.grp, r.v) for r in pandas_transform(df, fn, SCHEMA).collect())
    want = sorted(
        (r.grp, r.v)
        for r in df.withColumn("v", F.greatest(F.col("v"), F.lit(3.0)) * 2).collect()
    )
    assert got == want
