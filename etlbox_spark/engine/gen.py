"""Deterministic synthetic binlog generator (M1, FIXTURES.md §2).

Entirely JVM-side: every column is a pure expression over ``spark.range``
ids hashed with ``xxhash64`` — no Python in the row path, no wall clock,
no ``rand()`` (which is not reproducible across partitioning). The same
(seed, n_events, knobs) always produce byte-identical events, at any
parallelism, which is what makes the sha256 replay oracle and the
local[8]-vs-local[32] scaling benchmark comparable.

Shape (FIXTURES.md §2): event_seq, epoch, ts, op∈{insert,update,delete},
repo (zipf-skewed), path, commit, lang, content, schema_ver. Duplicate
delivery (~dup_rate, identical event_seq+payload) exercises idempotency.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["py", "c", "rs", "md", "java"]


def _u(seed: int, tag: str) -> Column:
    """Deterministic uniform [0,1) per row from the range id."""
    h = F.xxhash64(F.col("id"), F.lit(seed), F.lit(tag))
    return F.pmod(h, F.lit(1_000_000_000)).cast("double") / F.lit(1_000_000_000.0)


def gen_events(
    spark: SparkSession,
    n_events: int,
    n_repos: int = 100,
    paths_per_repo: int = 200,
    epoch_size: int = 10_000,
    seed: int = 42,
    skew: float = 1.5,
    dup_rate: float = 0.02,
    p_insert: float = 0.60,
    p_update: float = 0.30,
    content_lines: int = 5,
) -> DataFrame:
    """Build the event stream as a lazy DataFrame of ``n_events`` base
    events (plus ~dup_rate re-deliveries). ``skew > 1`` concentrates
    events on low repo ids (zipf-ish via inverse-CDF power transform),
    so hot-repo shuffle skew is actually exercised.
    """
    df = spark.range(0, n_events, 1)

    repo_idx = F.floor(F.lit(float(n_repos)) * F.pow(_u(seed, "repo"), F.lit(skew))).cast("int")
    path_idx = F.floor(F.lit(float(paths_per_repo)) * _u(seed, "path")).cast("int")
    # modulus = len(LANGS), not a hardcoded 5: editing LANGS would
    # otherwise desynchronize them — silent bias when grown, an ANSI-mode
    # INVALID_ARRAY_INDEX from element_at when shrunk. Value-identical to
    # the original while LANGS has 5 entries (replay determinism intact).
    lang = F.element_at(F.array(*[F.lit(x) for x in LANGS]), (path_idx % len(LANGS)) + 1)
    repo = F.format_string("repo_%04d", repo_idx)
    path = F.format_string("src/pkg%d/mod_%d.%s", path_idx % 7, path_idx, lang)

    u_op = _u(seed, "op")
    op = (
        F.when(u_op < F.lit(p_insert), F.lit("insert"))
        .when(u_op < F.lit(p_insert + p_update), F.lit("update"))
        .otherwise(F.lit("delete"))
    )
    commit = F.substring(F.sha2(F.format_string("%s/%s@%d", repo, path, F.col("id")), 256), 1, 12)
    body = F.concat_ws(
        "\n",
        *[
            F.format_string("line%d: %s", F.lit(i), F.substring(
                F.sha2(F.format_string("%d/%d", F.col("id"), F.lit(i)), 256), 1, 48))
            for i in range(content_lines)
        ],
    )
    content = F.format_string("// %s/%s@%s\n%s", repo, path, commit, body)
    is_del = op == F.lit("delete")

    out = df.select(
        F.col("id").alias("event_seq"),
        (F.col("id") / F.lit(epoch_size)).cast("long").alias("epoch"),
        F.timestamp_seconds(F.lit(1_600_000_000) + F.col("id")).alias("ts"),
        op.alias("op"),
        repo.alias("repo"),
        path.alias("path"),
        F.when(is_del, F.lit(None)).otherwise(commit).alias("commit"),
        F.when(is_del, F.lit(None)).otherwise(lang).alias("lang"),
        F.when(is_del, F.lit(None)).otherwise(content).alias("content"),
        F.lit(1).alias("schema_ver"),
        _u(seed, "dup").alias("__u_dup"),
    )
    # duplicate delivery: re-emit ~dup_rate of events verbatim
    dup_n = F.when(F.col("__u_dup") < F.lit(dup_rate), F.lit(2)).otherwise(F.lit(1))
    return (
        out.withColumn("__c", F.explode(F.sequence(F.lit(1), dup_n)))
        .drop("__u_dup", "__c")
    )


def write_events(events: DataFrame, out_dir: str) -> None:
    """Materialize the binlog as ordered epoch directories (epoch=N/)."""
    events.write.mode("overwrite").partitionBy("epoch").parquet(out_dir)


def list_epochs(out_dir: str) -> list[int]:
    import os

    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(out_dir)
        if d.startswith("epoch=")
    )
