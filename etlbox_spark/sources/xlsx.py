"""ExcelSource / ExcelDestination (SURVEY.md §2.1/§2.2) — stdlib-only.

Reference parity: ETLBox ExcelSource/ExcelDestination [U
ETLBox/src/Connectors/Excel*]. No Excel library ships in this sandbox
(no openpyxl/xlsxwriter), and none is needed: XLSX is a ZIP of small
XML parts, so the codec below is pure stdlib (``zipfile`` +
``xml.etree``) and the Spark side is the standard opaque-binary plan —
``binaryFile`` scan → Arrow-batched ``mapInPandas`` decode — the same
shape as the multimodal decoders (operators/multimodal.py), except this
codec is REAL, not a stub.

Scale/plan notes:

* One task per .xlsx file (``binaryFile`` never splits a file — a ZIP
  isn't splittable anyway). Excel is inherently a many-small-files
  format; a directory of them parallelizes per file, and the decode is
  Arrow-batched per file, never per row in the Spark sense.
* All cell values surface as STRINGS (the raw ``<v>`` text / string
  content): faithful to the wire format (XLSX stores numbers as decimal
  text and dates as serial-number text), deterministic, and typed
  downstream via explicit Spark-side casts (``schema=``) exactly like
  the CSV/typed-ingest path — never via Python coercion.
* The writer emits one ``part-{pid}.xlsx`` per partition (the Spark
  file-sink convention) using inline strings and a FIXED zip timestamp,
  so output bytes are deterministic (CLAUDE.md determinism invariant).
  ``coalesce(1)`` upstream if a single workbook is required.
"""

from __future__ import annotations

import glob as _glob
import io
import os
import posixpath
import zipfile
from typing import Iterable, Iterator
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NS_MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_NS_REL_DOC = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_NS_REL_PKG = "http://schemas.openxmlformats.org/package/2006/relationships"
_M = f"{{{_NS_MAIN}}}"


class XlsxFormatError(ValueError):
    """Raised when bytes are not a decodable XLSX workbook (corrupt
    zip, missing/unparseable parts, dangling references). One typed
    error for every hostile-input failure shape the stdlib zoo raises
    (BadZipFile, zlib.error, ParseError, KeyError, IndexError,
    struct.error, ...), so callers can route bad FILES the way the
    dataflow layer routes bad rows."""


class _NoSuchSheet(ValueError):
    """Caller asked for a sheet name the (valid) workbook doesn't have —
    a plain ValueError to the caller, exempt from XlsxFormatError
    conversion and from ``on_malformed`` routing."""


# the XLSX format's own column limit (XFD). A crafted ref like
# "AAAAAAAAAA1" would otherwise drive the gap-fill loop to append ~10^14
# Nones — an OOM/hang instead of the typed error the containment promises
_MAX_COLS = 16384


def _col_index(cell_ref: str) -> int:
    """'BC12' -> 0-based column index 54."""
    n = 0
    for ch in cell_ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    if n > _MAX_COLS:
        raise XlsxFormatError(
            f"cell ref {cell_ref!r} addresses column {n}, past the XLSX "
            f"maximum of {_MAX_COLS} (XFD)"
        )
    return n - 1


def _cell_value(c: ET.Element, shared: list[str], typed: bool = False):
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find(f"{_M}is")
        return "".join(x.text or "" for x in is_el.iter(f"{_M}t")) if is_el is not None else None
    v = c.find(f"{_M}v")
    if v is None:
        return None
    raw = v.text or ""
    if t == "s":
        i = int(raw)
        if i < 0:  # Python negative indexing would silently wrap to the
            # LAST shared string — wrong data instead of a typed error
            raise XlsxFormatError(f"negative shared-string index {i}")
        return shared[i]
    if t == "b":
        return (raw == "1") if typed else ("true" if raw == "1" else "false")
    if typed and t == "n":
        try:
            return int(raw)
        except ValueError:
            try:
                return float(raw)
            except ValueError:
                return raw  # malformed numeric: surface the text
    return raw  # n / str / e: the raw decimal / formula-result / error text


def xlsx_bytes_to_rows(
    data: bytes, sheet: int | str = 0, typed: bool = False
) -> list[list]:
    """Decode one workbook's sheet into rows of optional strings.

    ``sheet`` selects by position in workbook order (int) or by sheet
    name (str). Missing cells inside a row come back as None; trailing
    ragged rows are NOT padded here (the Spark layer pads to the header
    width). ``typed=True`` surfaces native cell types (numeric cells as
    int/float, boolean cells as bool) instead of their wire text — used
    by ``read_excel(infer_types=True)``'s schema sniff.

    Hostile/corrupt input raises :class:`XlsxFormatError` (a
    ValueError), never a raw stdlib internal (corruption-fuzzed in
    tests/test_xlsx.py). A missing named sheet stays a plain
    ValueError — that is a caller error, not a format error.
    """
    try:
        return _decode_workbook(data, sheet, typed)
    except (XlsxFormatError, _NoSuchSheet):
        raise  # already typed (_NoSuchSheet is a plain-ValueError caller error)
    except Exception as e:  # noqa: BLE001 — convert the stdlib zoo, don't swallow
        raise XlsxFormatError(
            f"not a decodable XLSX workbook: {type(e).__name__}: {e}"
        ) from e


def _decode_workbook(data: bytes, sheet: int | str, typed: bool) -> list[list]:
    zf = zipfile.ZipFile(io.BytesIO(data))

    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    sheets = wb.findall(f"{_M}sheets/{_M}sheet")
    if isinstance(sheet, str):
        matches = [s for s in sheets if s.get("name") == sheet]
        if not matches:
            raise _NoSuchSheet(
                f"no sheet named {sheet!r}; have {[s.get('name') for s in sheets]}"
            )
        sel = matches[0]
    else:
        try:
            sel = sheets[sheet]
        except IndexError:
            raise XlsxFormatError(
                f"workbook declares {len(sheets)} sheet(s); index {sheet} out of range"
            ) from None
    rid = sel.get(f"{{{_NS_REL_DOC}}}id")

    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    target = next(
        (
            r.get("Target")
            for r in rels.findall(f"{{{_NS_REL_PKG}}}Relationship")
            if r.get("Id") == rid
        ),
        None,
    )
    if target is None:
        raise XlsxFormatError(f"workbook.xml.rels has no relationship {rid!r} for the sheet")
    # OPC relationship targets: absolute ("/xl/worksheets/s1.xml" or even
    # "/worksheets/s1.xml") are package-rooted; relative ones resolve
    # against the source part's directory (xl/). Normalize explicitly —
    # lstrip-based splicing mangled foreign absolute targets (ADVICE r03).
    if target.startswith("/"):
        sheet_path = target[1:]
        if sheet_path not in zf.namelist() and "xl/" + sheet_path in zf.namelist():
            sheet_path = "xl/" + sheet_path  # producer wrote part-relative-absolute
    else:
        sheet_path = posixpath.normpath(posixpath.join("xl", target))

    shared: list[str] = []
    if "xl/sharedStrings.xml" in zf.namelist():
        sst = ET.fromstring(zf.read("xl/sharedStrings.xml"))
        for si in sst.findall(f"{_M}si"):
            shared.append("".join(t.text or "" for t in si.iter(f"{_M}t")))

    rows: list[list[str | None]] = []
    for row_el in ET.fromstring(zf.read(sheet_path)).iter(f"{_M}row"):
        row: list[str | None] = []
        for c in row_el.findall(f"{_M}c"):
            ref = c.get("r")
            if ref is not None:
                idx = _col_index(ref)
                while len(row) < idx:
                    row.append(None)  # gap: absent cells are omitted on disk
            row.append(_cell_value(c, shared, typed))
        rows.append(row)
    return rows


_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)
_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<Relationships xmlns="{_NS_REL_PKG}">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)
_WB_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<Relationships xmlns="{_NS_REL_PKG}">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


def rows_to_xlsx_bytes(
    rows: Iterable[Iterable[str | None]],
    sheet_name: str = "Sheet1",
    col_kinds: "list[str] | None" = None,
    header_rows: int = 0,
) -> bytes:
    """Encode rows of optional strings as a minimal valid workbook.

    Inline strings only by default (no shared-string table — write-once
    ETL output gains nothing from the extra indirection); None cells are
    omitted; the zip timestamp is pinned so identical rows give
    identical bytes.

    ``col_kinds`` (VERDICT r03 #8, typed cells): per-column wire kind —
    ``"n"`` emits the cell text as a NATIVE numeric cell (XLSX stores
    numbers as decimal text, so the canonical Spark string cast IS the
    wire value — no float round-trip ever happens on the write path),
    ``"b"`` a native boolean cell, anything else an inline string. The
    first ``header_rows`` rows are always strings (the header).
    """
    parts = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_NS_MAIN}"><sheetData>'
    ]
    for r_i, row in enumerate(rows, start=1):
        cells = []
        for c_i, val in enumerate(row):
            if val is None:
                continue
            ref = _col_letters(c_i) + str(r_i)
            kind = (
                "s"
                if col_kinds is None or r_i <= header_rows or c_i >= len(col_kinds)
                else col_kinds[c_i]
            )
            if kind == "n" and _is_finite_number(str(val)):
                cells.append(f'<c r="{ref}"><v>{escape(str(val))}</v></c>')
            elif kind == "b":
                bit = "1" if str(val).lower() in ("true", "1") else "0"
                cells.append(f'<c r="{ref}" t="b"><v>{bit}</v></c>')
            else:
                cells.append(
                    f'<c r="{ref}" t="inlineStr"><is><t>{escape(str(val))}</t></is></c>'
                )
        parts.append(f'<row r="{r_i}">' + "".join(cells) + "</row>")
    parts.append("</sheetData></worksheet>")
    sheet_xml = "".join(parts)

    wb_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS_MAIN}" xmlns:r="{_NS_REL_DOC}"><sheets>'
        f'<sheet name="{escape(sheet_name, {chr(34): "&quot;"})}" sheetId="1" r:id="rId1"/>'
        "</sheets></workbook>"
    )

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, content in [
            ("[Content_Types].xml", _CONTENT_TYPES),
            ("_rels/.rels", _ROOT_RELS),
            ("xl/workbook.xml", wb_xml),
            ("xl/_rels/workbook.xml.rels", _WB_RELS),
            ("xl/worksheets/sheet1.xml", sheet_xml),
        ]:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, content)
    return buf.getvalue()


def _is_finite_number(s: str) -> bool:
    """NaN/Infinity in a double column would otherwise be emitted as a
    native numeric cell (<v>NaN</v>) — content Excel itself rejects as
    corrupt. Non-finite values fall through to the inline-string branch."""
    import math

    try:
        return math.isfinite(float(s))
    except ValueError:
        return False


def _col_letters(idx: int) -> str:
    s = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        s = chr(65 + rem) + s
    return s


def _local(path: str) -> str:
    return path[len("file:"):] if path.startswith("file:") else path


def _first_file_bytes(path: str) -> bytes:
    """Driver-side peek of ONE file (bounded, analogous to CSV
    inferSchema's first-file sniff). Local paths only — on an object
    store pass ``columns=``/``schema=`` explicitly."""
    p = _local(path)
    if os.path.isdir(p):
        candidates = sorted(_glob.glob(os.path.join(p, "*.xlsx")))
    else:
        candidates = sorted(_glob.glob(p))
    if not candidates:
        raise FileNotFoundError(f"no .xlsx files under {path}")
    with open(candidates[0], "rb") as f:
        return f.read()


def _peek_names(rows: list[list], header: bool) -> list[str]:
    width = max((len(r) for r in rows), default=0)
    if header and rows:
        names = [
            str(rows[0][i]) if i < len(rows[0]) and rows[0][i] is not None else f"_c{i}"
            for i in range(width)
        ]
        return _uniquify(names)
    return [f"_c{i}" for i in range(width)]


def _uniquify(names: list[str]) -> list[str]:
    """Duplicate header cells are common in real spreadsheets; left as-is
    the decode's column dict would collapse them and silently replace the
    earlier column's DATA with the last duplicate's. Disambiguate the way
    pandas does: 'id', 'id_1', 'id_2', ..."""
    seen: dict[str, int] = {}
    out = []
    for n in names:
        if n in seen:
            seen[n] += 1
            fresh = f"{n}_{seen[n]}"
            while fresh in seen:
                seen[n] += 1
                fresh = f"{n}_{seen[n]}"
            seen[fresh] = 0
            out.append(fresh)
        else:
            seen[n] = 0
            out.append(n)
    return out


def _infer_schema(rows: list[list], names: list[str], header: bool) -> T.StructType:
    """Schema sniff from ONE file's native cell types (the analog of CSV
    inferSchema): all-int numeric column → long, numeric with any float
    → double, all-boolean → boolean, anything else (or empty) → string.
    Like CSV inference this trusts the first file to be representative —
    pass ``schema=`` when it isn't."""
    data = rows[1:] if header and rows else rows
    fields = []
    for i, n in enumerate(names):
        seen = {type(r[i]) for r in data if i < len(r) and r[i] is not None}
        if seen and seen <= {int}:
            t: T.DataType = T.LongType()
        elif seen and seen <= {int, float}:
            t = T.DoubleType()
        elif seen == {bool}:
            t = T.BooleanType()
        else:
            t = T.StringType()
        fields.append(T.StructField(n, t))
    return T.StructType(fields)


def read_excel(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    sheet: int | str = 0,
    header: bool = True,
    columns: list[str] | None = None,
    infer_types: bool = False,
    on_malformed: str = "fail",
) -> DataFrame:
    """ExcelSource analog: dir/glob of .xlsx → DataFrame.

    Plan: ``binaryFile`` scan (one task per workbook) → ``mapInPandas``
    decode to all-string columns → optional Spark-side casts from
    ``schema`` (JVM ``cast``, same typed-ingest discipline as CSV;
    route failures with operators/errors.typed_ingest if needed).
    Column names come from ``schema``/``columns`` or a one-file
    driver-side header peek. ``infer_types=True`` derives the schema
    from the first file's native cell types (numeric/boolean cells →
    long/double/boolean) so typed workbooks round-trip without caller
    casts; default stays the wire-faithful all-string surface.

    ``on_malformed`` routes CORRUPT WORKBOOKS (XlsxFormatError — bad
    zip, unparseable parts): ``"fail"`` (default) aborts naming the
    file; ``"skip"`` drops the file and keeps the scan going — the
    file-level analog of the merge core's dead-letter ``on_malformed``.
    """
    if on_malformed not in ("fail", "skip"):
        raise ValueError(f"on_malformed must be 'fail' or 'skip', got {on_malformed!r}")
    if schema is not None:
        names = [f.name for f in schema.fields]
    elif columns is not None:
        names = list(columns)
        if infer_types:
            typed_rows = xlsx_bytes_to_rows(_first_file_bytes(path), sheet, typed=True)
            schema = _infer_schema(typed_rows, names, header)
    else:
        typed_rows = xlsx_bytes_to_rows(_first_file_bytes(path), sheet, typed=True)
        names = _peek_names(typed_rows, header)
        if infer_types:
            schema = _infer_schema(typed_rows, names, header)
    if len(set(names)) != len(names):
        dup = next(n for n in names if names.count(n) > 1)
        raise ValueError(
            f"duplicate column name {dup!r} in schema=/columns= — the "
            "decode addresses columns by name (header-derived names are "
            "auto-disambiguated, caller-given ones must be unique)"
        )
    out_schema = T.StructType([T.StructField(n, T.StringType()) for n in names])

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                try:
                    rows = xlsx_bytes_to_rows(bytes(content), sheet)
                except XlsxFormatError as e:
                    if on_malformed == "skip":
                        continue
                    raise XlsxFormatError(f"{fpath}: {e}") from e
                if header and rows:
                    rows = rows[1:]
                cols = {
                    n: [r[i] if i < len(r) else None for r in rows]
                    for i, n in enumerate(names)
                }
                yield pd.DataFrame(cols, columns=names, dtype=object)

    # match the driver-side sniff's *.xlsx glob: without the filter a
    # stray notes.txt next to the workbooks would reach the decoder and
    # abort the scan under on_malformed="fail"
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.xlsx")
        .load(path)
        .select("path", "content")
    )
    df = files.mapInPandas(decode, schema=out_schema)
    if schema is not None:
        df = df.select(*[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields])
    return df


def write_excel(df: DataFrame, out_dir: str, sheet_name: str = "Sheet1") -> DataFrame:
    """ExcelDestination analog: one ``part-{pid:05d}.xlsx`` per partition
    (Spark file-sink convention; ``coalesce(1)`` first for one workbook).

    Every column is cast to string Spark-side (JVM cast — canonical,
    deterministic formatting) before the Arrow-batched encode; the
    header row is the column names. Numeric/boolean source columns are
    written as NATIVE numeric/boolean cells (VERDICT r03 #8) — XLSX
    numbers are decimal text on the wire, so the canonical cast string
    is bit-faithful and ``read_excel(infer_types=True)`` round-trips
    long/double/boolean without caller casts. Returns a tiny
    per-partition manifest DataFrame (path, rows) — materializing it
    performs the write, mirroring how the lake layer reports commits.

    Tasks write through their local filesystem API — in cluster mode
    point ``out_dir`` at shared storage (NFS/FUSE mount), as with any
    non-Hadoop sink.
    """
    names = df.columns
    kinds = [
        "n"
        if isinstance(f.dataType, T.NumericType)
        else ("b" if isinstance(f.dataType, T.BooleanType) else "s")
        for f in df.schema.fields
    ]
    str_df = df.select(*[F.col(c).cast("string").alias(c) for c in names])
    man_schema = T.StructType(
        [T.StructField("path", T.StringType()), T.StructField("rows", T.LongType())]
    )

    def encode(batches: Iterator) -> Iterator:
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        all_rows: list[list[str | None]] = [list(names)]
        for pdf in batches:
            for tup in pdf.itertuples(index=False):
                all_rows.append([None if pd.isna(v) else str(v) for v in tup])
        os.makedirs(out_dir, exist_ok=True)
        out_path = os.path.join(out_dir, f"part-{pid:05d}.xlsx")
        with open(out_path, "wb") as f:
            f.write(rows_to_xlsx_bytes(all_rows, sheet_name, col_kinds=kinds, header_rows=1))
        yield pd.DataFrame({"path": [out_path], "rows": [len(all_rows) - 1]})

    return str_df.mapInPandas(encode, schema=man_schema)
