"""Error-output routing (LinkErrorTo parity) — mirrors ETLBox's
faulty-row tests: dirty rows land in the error output with exception
text + serialized row, clean rows flow through typed.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etlbox_spark.operators.dataflow import Pipe
from etlbox_spark.operators.errors import cast_or_route, route_errors


def _dirty(spark):
    return spark.createDataFrame(
        [("1", "a"), ("2", "b"), ("oops", "c"), ("4", None), (None, "e")],
        T.StructType([
            T.StructField("num", T.StringType(), True),
            T.StructField("tag", T.StringType(), True),
        ]),
    )


def test_cast_or_route_splits_and_types(spark):
    good, bad = cast_or_route(_dirty(spark), {"num": "bigint"})
    g = {r.tag: r.num for r in good.collect()}
    # cast applied on the good branch, null input passes through as null
    assert g == {"a": 1, "b": 2, None: 4, "e": None}
    assert dict(good.dtypes)["num"] == "bigint"
    b = bad.collect()
    assert len(b) == 1 and b[0].tag == "c"
    assert b[0].error_reason == "cast_failed:num"
    # error_row serializes the ORIGINAL (pre-cast) row
    assert json.loads(b[0].error_row) == {"num": "oops", "tag": "c"}


def test_route_errors_first_reason_wins(spark):
    df = _dirty(spark)
    good, bad = route_errors(
        df,
        [
            (F.col("num").isNull(), "num_missing"),
            (F.col("num").try_cast("bigint").isNull() & F.col("num").isNotNull(), "num_not_int"),
            (F.col("tag").isNull(), "tag_missing"),
        ],
    )
    reasons = {r.tag: r.error_reason for r in bad.collect()}
    # ("4", None) fails the tag check; first-failing reason reported
    assert reasons == {"c": "num_not_int", "e": "num_missing", None: "tag_missing"}
    assert {r.tag for r in good.collect()} == {"a", "b"}


def test_pipe_link_error_to(spark):
    p = Pipe(_dirty(spark))
    good, err = p.link_error_to(
        [(F.col("num").try_cast("bigint").isNull() & F.col("num").isNotNull(), "bad_num")]
    )
    good.to(lambda d: d.count(), "good_n")
    err.to(lambda d: d.count(), "err_n")
    out = good.execute()
    assert out == {"good_n": 4, "err_n": 1}


def test_xml_malformed_routes_with_reason(spark):
    """XmlSource + error link: structurally invalid XML rows (from_xml
    nulls) route to the error output — the XmlSchemaValidation idiom."""
    from etlbox_spark.sources import xml_rows

    df = spark.createDataFrame(
        [(1, "<row><k>10</k></row>"), (2, "<row><k>not-a-number</k></row>"), (3, "no xml at all")],
        "id int, xml string",
    )
    xs = T.StructType([T.StructField("k", T.LongType())])
    parsed = xml_rows(df, "xml", xs, out_prefix="x_")
    good, bad = route_errors(parsed, [(F.col("x_k").isNull(), "xml_invalid")], row_cols=["id"])
    assert {r.id for r in good.collect()} == {1}
    assert {r.id: r.error_reason for r in bad.collect()} == {2: "xml_invalid", 3: "xml_invalid"}
