"""Source/sink parity surface (SURVEY.md §2.1-2.2): CsvSource/JsonSource/
MemorySource + destinations re-expressed as reader/writer conveniences.
Round-trips must preserve values under explicit schemas."""

from __future__ import annotations

from pyspark.sql import types as T

from etlbox_spark.engine import LakeTable, MergeMode, MergeSpec, apply_epoch
from etlbox_spark.sources import (
    lake_source,
    memory_destination,
    memory_source,
    read_csv,
    read_json,
    read_parquet,
    void_destination,
    write_csv,
    write_json,
    write_text,
    xml_rows,
)

from .conftest import EVENTS_SCHEMA, REPO_FILES_SCHEMA, ev

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True),
    ]
)
ROWS = [(1, "Test1", 1.5), (2, "Test2", -2.25), (3, "te,st3", 0.0)]


def _sorted(rows):
    return sorted(tuple(r) for r in rows)


def test_csv_round_trip(spark, tmp_path):
    df = memory_source(spark, ROWS, SCHEMA)
    p = str(tmp_path / "csv")
    write_csv(df, p)
    back = read_csv(spark, p, schema=SCHEMA)
    assert _sorted(memory_destination(back)) == _sorted(ROWS)


def test_json_round_trip(spark, tmp_path):
    df = memory_source(spark, ROWS, SCHEMA)
    p = str(tmp_path / "json")
    write_json(df, p)
    back = read_json(spark, p, schema=SCHEMA)
    assert _sorted(memory_destination(back)) == _sorted(ROWS)


def test_text_destination_and_void(spark, tmp_path):
    df = memory_source(spark, ROWS, SCHEMA).selectExpr("concat(name, '|', id) AS line")
    p = str(tmp_path / "txt")
    write_text(df, p)
    lines = {r.value for r in spark.read.text(p).collect()}
    assert lines == {"Test1|1", "Test2|2", "te,st3|3"}
    assert void_destination(df) == 0


def test_lake_source_reads_snapshot(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), REPO_FILES_SCHEMA, ["repo", "path"], 4)
    rows = [ev(1, "insert", "p1", "Test1"), ev(2, "insert", "p2", "Test2")]
    apply_epoch(spark, t, spark.createDataFrame(rows, EVENTS_SCHEMA),
                MergeSpec(compare_cols=("content",)), MergeMode.DELTA, 0)
    got = {(r.repo, r.path): r.content for r in lake_source(spark, str(tmp_path / "t")).collect()}
    assert got == {("r0", "p1"): "Test1", ("r0", "p2"): "Test2"}


def test_xml_rows_parse_and_validate(spark):
    xml_schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    rows_schema = T.StructType(
        [T.StructField("src", T.StringType()), T.StructField("xml", T.StringType())]
    )
    df = memory_source(
        spark,
        [
            ("a", "<row><id>1</id><name>Test1</name></row>"),
            ("b", "<row><id>2</id><name>Test2</name></row>"),
            ("c", "<row><id>oops</id></row>"),  # malformed id -> null
        ],
        rows_schema,
    )
    try:
        out = xml_rows(df, "xml", xml_schema)
    except Exception:  # pragma: no cover - from_xml missing on old Spark
        import pytest

        pytest.skip("from_xml unavailable")
    got = {(r.src, r.id, r.name) for r in out.collect()}
    assert ("a", 1, "Test1") in got and ("b", 2, "Test2") in got
    assert sum(1 for r in got if r[1] is None) == 1  # invalid row flagged, not dropped


def test_read_parquet_with_schema(spark, tmp_path):
    p = str(tmp_path / "pq")
    memory_source(spark, ROWS, SCHEMA).write.parquet(p)
    narrow = T.StructType([T.StructField("id", T.LongType(), False)])
    back = read_parquet(spark, p, schema=narrow)
    assert back.columns == ["id"]
    assert sorted(r.id for r in back.collect()) == [1, 2, 3]


def test_xml_destination_roundtrip(spark, tmp_path):
    """XmlDestination (write_xml): one element per line on disk, and the
    serialized rows parse back to the original values via xml_rows."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from etlbox_spark.sources import write_xml, xml_rows

    df = spark.createDataFrame([(1, "alpha"), (2, "beta & <gamma>")], "k long, name string")
    out = str(tmp_path / "xml_out")
    write_xml(df, out, row_tag="rec")
    lines = spark.read.text(out)
    assert lines.count() == 2
    assert lines.where(F.col("value").startswith("<rec>")).count() == 2
    xs = T.StructType([T.StructField("k", T.LongType()), T.StructField("name", T.StringType())])
    back = {r.k: r.name for r in xml_rows(lines, "value", xs).collect()}
    # special characters survive the escape/unescape round trip
    assert back == {1: "alpha", 2: "beta & <gamma>"}


def test_xsd_schema_and_row_validation(spark, tmp_path):
    """XmlSchemaValidation (§2.5) with a real XSD: the StructType is
    derived FROM the XSD (xsd_to_schema — single source of truth), and
    rows that parse but violate the schema (wrong element name) null out
    via rowValidationXSDPath, ready for error routing."""
    from etlbox_spark.sources import xsd_to_schema

    xsd = """<?xml version="1.0" encoding="UTF-8"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
  <xs:element name="row">
    <xs:complexType>
      <xs:sequence>
        <xs:element name="id" type="xs:long"/>
        <xs:element name="name" type="xs:string"/>
      </xs:sequence>
    </xs:complexType>
  </xs:element>
</xs:schema>"""
    xsd_file = tmp_path / "row.xsd"
    xsd_file.write_text(xsd)

    schema = xsd_to_schema(spark, xsd)
    # XSDToSchema wraps the document element: row struct(id, name)
    row_struct = schema["row"].dataType
    assert [f.name for f in row_struct.fields] == ["id", "name"]
    assert isinstance(row_struct["id"].dataType, T.LongType)

    flat = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    df = memory_source(
        spark,
        [
            ("ok", "<row><id>1</id><name>Test1</name></row>"),
            ("bad", "<row><id>2</id><wrong>X</wrong></row>"),  # violates XSD
        ],
        T.StructType(
            [T.StructField("src", T.StringType()), T.StructField("xml", T.StringType())]
        ),
    )
    out = xml_rows(df, "xml", flat, xsd_path=str(xsd_file))
    got = {r.src: (r.id, r.name) for r in out.collect()}
    assert got["ok"] == (1, "Test1")
    assert got["bad"] == (None, None)  # XSD-invalid row nulled, not dropped


def test_to_xml_preserves_value_newlines(spark):
    # the old blanket \s*\n\s* collapse turned "a\nb" into "ab" -- silent
    # corruption; now only STRUCTURAL newlines collapse and value
    # newlines ride as &#10;/&#13; char refs that from_xml decodes back
    from etlbox_spark.sources import to_xml_rows

    df = spark.createDataFrame([("a\nb", 1), ("c\rd", 2), ("plain", 3)], "s string, n int")
    xml = to_xml_rows(df)
    for r in xml.collect():
        assert "\n" not in r["xml"] and "\r" not in r["xml"]  # one element per line
    schema = T.StructType([T.StructField("s", T.StringType()), T.StructField("n", T.IntegerType())])
    back = {(r["s"], r["n"]) for r in xml_rows(xml, "xml", schema).collect()}
    assert back == {("a\nb", 1), ("c\rd", 2), ("plain", 3)}


def test_xml_rows_rejects_colliding_output_names(spark):
    import pytest as _pytest

    schema = T.StructType([T.StructField("id", T.StringType())])
    df = spark.createDataFrame([("1", "<row><id>9</id></row>")], "id string, xml string")
    with _pytest.raises(ValueError, match="collide"):
        xml_rows(df, "xml", schema)  # parsed 'id' vs kept input 'id'
    out = xml_rows(df, "xml", schema, out_prefix="x_")  # disambiguated
    assert out.columns == ["id", "x_id"]
    # a pre-existing __x column must not be clobbered by the temp struct
    df2 = spark.createDataFrame([("keep", "<row><id>9</id></row>")], "__x string, xml string")
    r = xml_rows(df2, "xml", schema).collect()[0]
    assert r["__x"] == "keep" and r["id"] == "9"


def test_route_errors_refuses_reserved_columns(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from etlbox_spark.operators.errors import route_errors

    df = spark.createDataFrame([(1, "x")], "n int, error_reason string")
    with _pytest.raises(ValueError, match="error_reason"):
        route_errors(df, [(F.col("n") < 0, "neg")])


def test_streaming_package_exports():
    import etlbox_spark.streaming as s

    for name in ("tail_available_now", "tail_processing_time",
                 "stream_changes", "stream_maintenance_changes"):
        assert callable(getattr(s, name))
