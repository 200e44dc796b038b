"""ExcelSource/ExcelDestination (sources/xlsx.py).

Codec tests are pure Python (no Spark session) — they pin the wire
format: round-trip identity, escaping, gaps, shared-vs-inline strings,
determinism. The Spark tests drive the real plan (binaryFile →
mapInPandas decode; partitioned write) and check it against the source
DataFrame.
"""

from __future__ import annotations

import zipfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etlbox_spark.sources.xlsx import (
    XlsxFormatError,
    read_excel,
    rows_to_xlsx_bytes,
    write_excel,
    xlsx_bytes_to_rows,
)

ROWS = [
    ["id", "name", "note"],
    ["1", "alpha", "plain"],
    ["2", "be<ta> & 'q'", 'quotes "and" amps'],
    ["3", None, ""],  # None cell omitted on disk; empty string kept
    ["4", "delta", None],
]


def test_codec_roundtrip_identity():
    data = rows_to_xlsx_bytes(ROWS, sheet_name="t")
    assert xlsx_bytes_to_rows(data) == [
        ["id", "name", "note"],
        ["1", "alpha", "plain"],
        ["2", "be<ta> & 'q'", 'quotes "and" amps'],
        ["3", None, ""],
        ["4", "delta"],  # trailing None -> cell absent -> ragged row
    ]


def test_codec_deterministic_bytes():
    assert rows_to_xlsx_bytes(ROWS) == rows_to_xlsx_bytes([list(r) for r in ROWS])


def test_codec_is_valid_zip_package():
    data = rows_to_xlsx_bytes(ROWS)
    names = set(zipfile.ZipFile(__import__("io").BytesIO(data)).namelist())
    assert {"[Content_Types].xml", "xl/workbook.xml", "xl/worksheets/sheet1.xml"} <= names


def test_codec_shared_strings_and_sheet_select():
    """Read a foreign-shaped workbook: shared strings + named sheet +
    column gaps (cells carry explicit refs; B skipped)."""
    import io as _io

    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>"
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="C1"><v>2.5</v></c>'
        '<c r="D1" t="b"><v>1</v></c></row>'
        "</sheetData></worksheet>"
    )
    sst = (
        '<?xml version="1.0"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<si><t>hello</t></si></sst>"
    )
    wb = (
        '<?xml version="1.0"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="data" sheetId="1" r:id="rId9"/></sheets></workbook>'
    )
    rels = (
        '<?xml version="1.0"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId9" Type="w" Target="worksheets/sheet1.xml"/></Relationships>'
    )
    buf = _io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/sharedStrings.xml", sst)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    got = xlsx_bytes_to_rows(buf.getvalue(), sheet="data")
    assert got == [["hello", None, "2.5", "true"]]
    with pytest.raises(ValueError):
        xlsx_bytes_to_rows(buf.getvalue(), sheet="nope")


def test_codec_absolute_rel_targets():
    """ADVICE r03: foreign-produced workbooks may write ABSOLUTE
    relationship targets ('/xl/worksheets/sheet1.xml' or even
    '/worksheets/sheet1.xml'); both must resolve."""
    import io as _io

    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        '<sheetData><row r="1"><c r="A1" t="inlineStr"><is><t>ok</t></is></c></row>'
        "</sheetData></worksheet>"
    )
    wb = (
        '<?xml version="1.0"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="s" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    for target in ("/xl/worksheets/sheet1.xml", "/worksheets/sheet1.xml", "worksheets/sheet1.xml"):
        rels = (
            '<?xml version="1.0"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            f'<Relationship Id="rId1" Type="w" Target="{target}"/></Relationships>'
        )
        buf = _io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("xl/workbook.xml", wb)
            zf.writestr("xl/_rels/workbook.xml.rels", rels)
            zf.writestr("xl/worksheets/sheet1.xml", sheet)
        assert xlsx_bytes_to_rows(buf.getvalue()) == [["ok"]], target


def test_codec_typed_cells():
    data = rows_to_xlsx_bytes(
        [["k", "n", "d", "b"], ["x", "42", "1.5", "true"], ["y", None, "2.0", "false"]],
        col_kinds=["s", "n", "n", "b"],
        header_rows=1,
    )
    assert xlsx_bytes_to_rows(data, typed=True) == [
        ["k", "n", "d", "b"],
        ["x", 42, 1.5, True],
        ["y", None, 2.0, False],
    ]
    # untyped read still surfaces wire text
    assert xlsx_bytes_to_rows(data)[1] == ["x", "42", "1.5", "true"]


def test_spark_typed_roundtrip_no_casts(spark, tmp_path):
    """VERDICT r03 #8: long/double/boolean round-trip typed with zero
    caller casts — including a long beyond float53 precision."""
    big = 4611686018427387904 + 7  # 2^62 + 7: breaks any float round-trip
    src = spark.createDataFrame(
        [(1, big, 1.5, True, "a"), (2, 3, 2.25, False, None)],
        "id long, big long, score double, flag boolean, tag string",
    )
    out = str(tmp_path / "xl")
    write_excel(src.coalesce(1), out).collect()
    back = read_excel(spark, out, infer_types=True)
    assert back.schema == src.schema
    assert back.orderBy("id").collect() == src.orderBy("id").collect()


def test_spark_roundtrip_partitioned(spark, tmp_path):
    src = spark.range(100).select(
        F.col("id"),
        F.concat(F.lit("name_"), F.col("id")).alias("name"),
        (F.col("id") * 1.5).alias("score"),
    )
    out = str(tmp_path / "xl")
    manifest = write_excel(src.repartition(4), out).collect()
    assert len(manifest) == 4 and sum(r["rows"] for r in manifest) == 100

    back_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    back = read_excel(spark, out, schema=back_schema)
    assert back.orderBy("id").collect() == src.orderBy("id").collect()


def test_spark_header_peek_and_string_surface(spark, tmp_path):
    src = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    out = str(tmp_path / "xl")
    write_excel(src.coalesce(1), out).collect()
    got = read_excel(spark, out)  # no schema: peek header, all-string
    assert got.schema == T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.StringType())]
    )
    assert sorted((r["k"], r["v"]) for r in got.collect()) == [("a", "1"), ("b", "2")]


# ---- hostile-input containment (corruption fuzz) ----------------------


def test_codec_corruption_always_raises_typed_error():
    """ANY byte-level damage to a workbook must surface as
    XlsxFormatError (a ValueError) or decode to rows — never a raw
    stdlib internal (BadZipFile, ParseError, struct.error, KeyError,
    IndexError...) and never a hang. Deterministic sweep: truncations
    at every 37th byte, single-byte flips at every 23rd byte, plus the
    classic structural mutations."""
    import io

    from etlbox_spark.sources.xlsx import XlsxFormatError

    good = rows_to_xlsx_bytes(ROWS)
    assert xlsx_bytes_to_rows(good)  # sanity

    cases = [good[:i] for i in range(0, len(good), 37)]
    for off in range(0, len(good), 23):
        b = bytearray(good)
        b[off] ^= 0xA7
        cases.append(bytes(b))
    cases += [b"", b"PK", b"not a zip at all", b"\x00" * 512]

    decoded = raised = 0
    for data in cases:
        try:
            out = xlsx_bytes_to_rows(data)
            assert isinstance(out, list)
            decoded += 1
        except XlsxFormatError:
            raised += 1
    # both outcomes must occur (flips in dead zones decode fine; the
    # sweep is vacuous if either bucket is empty)
    assert decoded > 0 and raised > 0


def _zip_without(data: bytes, member: str) -> bytes:
    import io

    src = zipfile.ZipFile(io.BytesIO(data))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as out:
        for n in src.namelist():
            if n != member:
                out.writestr(n, src.read(n))
    return buf.getvalue()


def _zip_replace(data: bytes, member: str, content: str) -> bytes:
    import io

    src = zipfile.ZipFile(io.BytesIO(data))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as out:
        for n in src.namelist():
            out.writestr(n, content if n == member else src.read(n))
    return buf.getvalue()


def test_codec_structural_corruptions_are_typed():
    """Missing parts, dangling rel ids, out-of-range shared-string and
    sheet indexes — each a distinct hostile shape, each contained."""
    from etlbox_spark.sources.xlsx import XlsxFormatError

    good = rows_to_xlsx_bytes(ROWS)
    M = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    hostile = [
        _zip_without(good, "xl/workbook.xml"),
        _zip_without(good, "xl/worksheets/sheet1.xml"),
        _zip_replace(good, "xl/workbook.xml", "<not-closed"),
        _zip_replace(good, "xl/_rels/workbook.xml.rels", "<bad"),
        # dangling relationship id
        _zip_replace(
            good,
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0"?><Relationships xmlns='
            '"http://schemas.openxmlformats.org/package/2006/relationships"/>',
        ),
        # shared-string index out of range / non-numeric
        _zip_replace(
            good,
            "xl/worksheets/sheet1.xml",
            f'<worksheet xmlns="{M}"><sheetData>'
            '<row r="1"><c r="A1" t="s"><v>99999</v></c></row>'
            "</sheetData></worksheet>",
        ),
        _zip_replace(
            good,
            "xl/worksheets/sheet1.xml",
            f'<worksheet xmlns="{M}"><sheetData>'
            '<row r="1"><c r="A1" t="s"><v>abc</v></c></row>'
            "</sheetData></worksheet>",
        ),
    ]
    for i, data in enumerate(hostile):
        with pytest.raises(XlsxFormatError):
            xlsx_bytes_to_rows(data)
    # sheet index out of range is format-class too
    with pytest.raises(XlsxFormatError):
        xlsx_bytes_to_rows(good, sheet=7)
    # ...but a missing NAMED sheet stays a plain caller ValueError
    with pytest.raises(ValueError) as ei:
        xlsx_bytes_to_rows(good, sheet="nope")
    assert not isinstance(ei.value, XlsxFormatError)


def test_read_excel_on_malformed_routing(spark, tmp_path):
    """A corrupt workbook inside a directory scan: fail (default)
    aborts naming the file; skip drops the file and keeps the rest."""
    from etlbox_spark.sources.xlsx import XlsxFormatError

    d = tmp_path / "wb"
    d.mkdir()
    (d / "good.xlsx").write_bytes(rows_to_xlsx_bytes(ROWS))
    (d / "bad.xlsx").write_bytes(b"PK\x03\x04 this is not a workbook")

    schema = T.StructType([T.StructField(n, T.StringType()) for n in ROWS[0]])
    with pytest.raises(Exception) as ei:
        read_excel(spark, str(d), schema=schema).collect()
    assert "bad.xlsx" in str(ei.value)

    got = read_excel(spark, str(d), schema=schema, on_malformed="skip").collect()
    assert sorted(r["id"] for r in got) == ["1", "2", "3", "4"]

    with pytest.raises(ValueError):
        read_excel(spark, str(d), schema=schema, on_malformed="quarantine")


def test_codec_caps_hostile_column_ref():
    # a crafted ref like AAAAAAAAAA1 addresses column ~1.4e14; the
    # gap-fill loop must raise the typed error, not append 10^14 Nones
    data = rows_to_xlsx_bytes([["a"]])
    hostile = _zip_replace(
        data,
        "xl/worksheets/sheet1.xml",
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        '<sheetData><row r="1"><c r="AAAAAAAAAA1"><v>x</v></c></row></sheetData>'
        "</worksheet>",
    )
    with pytest.raises(XlsxFormatError, match="past the XLSX maximum"):
        xlsx_bytes_to_rows(hostile)
    # the real XLSX maximum (XFD = column 16384) still decodes
    legal = _zip_replace(
        data,
        "xl/worksheets/sheet1.xml",
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        '<sheetData><row r="1"><c r="XFD1"><v>x</v></c></row></sheetData>'
        "</worksheet>",
    )
    row = xlsx_bytes_to_rows(legal)[0]
    assert len(row) == 16384 and row[-1] == "x"


def test_codec_negative_shared_string_index_is_typed_error():
    # Python negative indexing would silently return the LAST shared
    # string -- wrong data, not even an error
    data = rows_to_xlsx_bytes([["a"]])
    hostile = _zip_replace(
        data,
        "xl/worksheets/sheet1.xml",
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        '<sheetData><row r="1"><c r="A1" t="s"><v>-1</v></c></row></sheetData>'
        "</worksheet>",
    )
    # need a shared-string table for the wrap to have a target
    import io as _io

    src = zipfile.ZipFile(_io.BytesIO(hostile))
    out = _io.BytesIO()
    with zipfile.ZipFile(out, "w") as zf:
        for item in src.infolist():
            zf.writestr(item, src.read(item.filename))
        zf.writestr(
            "xl/sharedStrings.xml",
            '<?xml version="1.0"?>'
            '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            "<si><t>secret-last-string</t></si></sst>",
        )
    with pytest.raises(XlsxFormatError, match="negative shared-string"):
        xlsx_bytes_to_rows(out.getvalue())


def test_read_excel_duplicate_headers_disambiguated(spark, tmp_path):
    # duplicate header cells must not silently replace column 0's data
    # with column 2's (the old dict-comprehension collapse)
    data = rows_to_xlsx_bytes([["id", "val", "id"], ["1", "x", "9"], ["2", "y", "8"]])
    (tmp_path / "dup.xlsx").write_bytes(data)
    df = read_excel(spark, str(tmp_path / "dup.xlsx"))
    assert df.columns == ["id", "val", "id_1"]
    got = sorted((r["id"], r["val"], r["id_1"]) for r in df.collect())
    assert got == [("1", "x", "9"), ("2", "y", "8")]
    # explicitly caller-given duplicates are an error, not a silent collapse
    with pytest.raises(ValueError, match="duplicate column name"):
        read_excel(spark, str(tmp_path / "dup.xlsx"), columns=["id", "val", "id"])


def test_read_excel_ignores_non_xlsx_neighbors(spark, tmp_path):
    (tmp_path / "book.xlsx").write_bytes(rows_to_xlsx_bytes(ROWS))
    (tmp_path / "notes.txt").write_text("not a workbook")
    df = read_excel(spark, str(tmp_path))  # on_malformed="fail": the txt must not reach the decoder
    assert df.count() == len(ROWS) - 1


def test_write_excel_nonfinite_doubles_stay_strings(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 1.5), (2, float("nan")), (3, float("inf"))], "id long, v double"
    )
    out = str(tmp_path / "xl")
    write_excel(df.coalesce(1), out).collect()
    fn = [f for f in __import__("os").listdir(out) if f.endswith(".xlsx")][0]
    rows = xlsx_bytes_to_rows((tmp_path / "xl" / fn).read_bytes(), typed=True)
    vals = {r[0]: r[1] for r in rows[1:]}
    assert vals[1] == 1.5  # finite stays a native numeric cell
    assert vals[2] == "NaN" and vals[3] == "Infinity"  # non-finite -> inline strings
