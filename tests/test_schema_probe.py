"""Footer-metadata schema probe (`merge._probe_dir_schemas`) — the
planning path of `read_changes`/`read_maintenance_changes`/
`read_quarantine`.

The legacy probe ran one `spark.read.parquet(dir).schema` inference job
per epoch in the selected range — ~50-100 ms of driver wall each, which
makes a full-history replay of a 10^5-epoch log spend hours planning.
The probe now reads Spark's own schema JSON out of one parquet footer
per dir (`org.apache.spark.sql.parquet.row.metadata` — the same key
Spark's inference consults), so it must return the IDENTICAL schema;
these tests pin that equivalence, the non-Spark-writer fallback, the
distributed fan-out parity, and the new generation-folding in
`read_quarantine` (a range spanning a numeric widen previously died on
the parquet physical-type change).
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etlbox_spark.engine import merge


def _write_epoch(spark, root, epoch, rows, schema):
    d = os.path.join(root, f"epoch={epoch}")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(d)
    return d


def test_footer_probe_matches_spark_read(spark, tmp_path):
    sch = T.StructType(
        [
            T.StructField("repo", T.StringType()),
            T.StructField("n", T.IntegerType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("blob", T.BinaryType()),
        ]
    )
    df = spark.range(3).select(
        F.concat(F.lit("r"), F.col("id")).alias("repo"),
        F.col("id").cast("int").alias("n"),
        F.current_timestamp().alias("ts"),
        F.encode(F.lit("x"), "utf-8").alias("blob"),
    )
    d = os.path.join(str(tmp_path), "epoch=1")
    df.write.parquet(d)
    assert merge._dir_schema_json(d) is not None
    probed = merge._probe_dir_schemas(spark, [d])[0]
    assert probed == spark.read.parquet(d).schema
    assert [f.name for f in probed.fields] == [f.name for f in sch.fields]


def test_probe_falls_back_for_non_spark_writer(spark, tmp_path):
    d = os.path.join(str(tmp_path), "epoch=7")
    os.makedirs(d)
    pq.write_table(
        pa.table({"a": pa.array([1, 2], pa.int64()), "b": pa.array(["x", "y"])}),
        os.path.join(d, "part-0.parquet"),
    )
    # pyarrow does not stamp the Spark metadata key
    assert merge._dir_schema_json(d) is None
    probed = merge._probe_dir_schemas(spark, [d])[0]
    assert probed == spark.read.parquet(d).schema


def test_distributed_probe_parity(spark, tmp_path, monkeypatch):
    dirs = []
    for e in range(6):
        dirs.append(
            _write_epoch(
                spark, str(tmp_path), e, [(f"r{e}", e)], "repo string, n int"
            )
        )
    local = merge._probe_dir_schemas(spark, dirs)
    monkeypatch.setattr(merge, "_PROBE_DISTRIBUTE_THRESHOLD", 2)
    distributed = merge._probe_dir_schemas(spark, dirs)
    assert local == distributed
    assert all(s == local[0] for s in local)


def test_read_changes_distributed_probe_parity(spark, tmp_path, monkeypatch):
    # an actual read_changes drive through the distributed probe: two
    # schema generations (int -> long widen + a column add), result must
    # be identical to the driver-loop plan
    root = str(tmp_path)
    _write_epoch(spark, root, 0, [("a", 1)], "repo string, n int")
    _write_epoch(spark, root, 1, [("b", 2)], "repo string, n int")
    _write_epoch(spark, root, 2, [("c", 3, "new")], "repo string, n long, extra string")
    want = {
        (r["repo"], r["n"], r["extra"], r["epoch"])
        for r in merge.read_changes(spark, root).collect()
    }
    monkeypatch.setattr(merge, "_PROBE_DISTRIBUTE_THRESHOLD", 1)
    got_df = merge.read_changes(spark, root)
    assert dict(got_df.dtypes)["n"] == "bigint"
    got = {(r["repo"], r["n"], r["extra"], r["epoch"]) for r in got_df.collect()}
    assert got == want == {("a", 1, None, 0), ("b", 2, None, 1), ("c", 3, "new", 2)}


def test_read_quarantine_folds_generations_across_widen(spark, tmp_path):
    # quarantined raw events evolve with the table; a range spanning a
    # widen used to fail on the int->long physical-type change because
    # the reader took the first file's schema for the whole range
    qroot = os.path.join(str(tmp_path), "_quarantine")
    _write_epoch(spark, qroot, 1, [("a", None, 10)], "repo string, path string, seq int")
    _write_epoch(
        spark, qroot, 2, [("b", None, 2**40, "go")], "repo string, path string, seq long, lang string"
    )
    df = merge.read_quarantine(spark, str(tmp_path))
    assert dict(df.dtypes)["seq"] == "bigint"
    rows = {(r["repo"], r["seq"], r["lang"], r["epoch"]) for r in df.collect()}
    assert rows == {("a", 10, None, 1), ("b", 2**40, "go", 2)}
    # bounded range keeps working, and the empty range keeps the newest
    # generation's schema (stable-select contract)
    one = merge.read_quarantine(spark, str(tmp_path), from_epoch=2)
    assert one.count() == 1
    empty = merge.read_quarantine(spark, str(tmp_path), from_epoch=99)
    assert empty.count() == 0 and "lang" in empty.columns


def test_probe_empty_dir_falls_back_to_legacy_error(spark, tmp_path):
    d = os.path.join(str(tmp_path), "epoch=3")
    os.makedirs(d)
    open(os.path.join(d, "_SUCCESS"), "w").close()
    assert merge._dir_schema_json(d) is None
    with pytest.raises(Exception):  # same failure shape as the legacy spark.read probe
        merge._probe_dir_schemas(spark, [d])
