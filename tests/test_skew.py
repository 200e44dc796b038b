"""Skew handling (BASELINE.json:6): salted two-phase aggregation must be
value-identical to the single-shuffle aggregation, deterministic, and
actually spread a hot key over multiple salts."""

from __future__ import annotations

from pyspark.sql import functions as F

from etlbox_spark.operators.skew import (
    SALT_COL,
    salted_aggregation,
    salted_count_distinct,
    with_salt,
)


def _skewed(spark, n=20_000):
    # ~90% of rows land on repo_hot — a zipf-ish worst case
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit("repo_hot"))
        .otherwise(F.concat(F.lit("repo_"), (F.col("id") % 50).cast("string")))
        .alias("repo"),
        F.col("id").alias("event_seq"),
        (F.col("id") % 997).cast("double").alias("value"),
        F.concat(F.lit("p"), (F.col("id") % 300).cast("string")).alias("path"),
    )


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        r.repo: (r.total, r.rows)
        for r in df.groupBy("repo")
        .agg(F.sum("value").alias("total"), F.count(F.lit(1)).alias("rows"))
        .collect()
    }
    salted = {
        r.repo: (r.total, r.rows)
        for r in salted_aggregation(
            df,
            ["repo"],
            partial_aggs=[F.sum("value").alias("s"), F.count(F.lit(1)).alias("c")],
            merge_aggs=[F.sum("s").alias("total"), F.sum("c").alias("rows")],
            salt_source="event_seq",
        ).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert abs(plain[k][0] - salted[k][0]) < 1e-6 and plain[k][1] == salted[k][1]


def test_salted_count_distinct_exact(spark):
    df = _skewed(spark)
    plain = {
        r.repo: r.n
        for r in df.groupBy("repo").agg(F.count_distinct("path").alias("n")).collect()
    }
    salted = {
        r.repo: r.n_distinct
        for r in salted_count_distinct(df, ["repo"], "path", n_salts=8).collect()
    }
    assert plain == salted


def test_segmented_as_of_join_matches_plain(spark):
    """VERDICT r03 #4: the segmented (skew-proof) as-of join must be
    row-identical to the per-key-window path — including left rows before
    any right version, segments with no right rows (boundary carry), and
    same-timestamp ties."""
    from etlbox_spark.operators.joins import as_of_join

    n = 8_000
    left = _skewed(spark, n).select(
        "repo", F.col("event_seq").alias("ts"), F.col("event_seq").alias("event_id")
    )
    # sparse dim: a version every ~37 ticks for the hot repo, every ~211
    # for the rest; ties at ts%1000==0 exercise right_seq ordering; the
    # gap [2000, 4999] has NO right rows at all for any key (carry must
    # bridge >1 empty segment)
    right = (
        _skewed(spark, n)
        .where((F.col("event_seq") % 37 == 0) | (F.col("event_seq") % 211 == 0))
        .where(~F.col("event_seq").between(2000, 4999))
        .select(
            "repo",
            F.col("event_seq").alias("dts"),
            F.col("event_seq").alias("dseq"),
            F.col("value").alias("dim_value"),
        )
    )
    plain = as_of_join(left, right, on=["repo"], left_ts="ts", right_ts="dts",
                       right_seq="dseq")
    seg = as_of_join(left, right, on=["repo"], left_ts="ts", right_ts="dts",
                     right_seq="dseq", segment_width=500)
    a = sorted(map(tuple, plain.collect()), key=lambda t: t[:3])
    b = sorted(map(tuple, seg.collect()), key=lambda t: t[:3])
    assert a == b
    assert plain.count() == n


def test_salt_spreads_hot_key_and_is_deterministic(spark):
    df = _skewed(spark, n=5_000)
    s1 = with_salt(df, "event_seq", 16)
    hot = s1.where(F.col("repo") == "repo_hot").select(SALT_COL).distinct().count()
    assert hot >= 8  # hot key really fans out across salts
    a = sorted(r[0] for r in s1.select(SALT_COL).limit(200).collect())
    b = sorted(r[0] for r in with_salt(df, "event_seq", 16).select(SALT_COL).limit(200).collect())
    assert a == b  # no rand(): same input -> same salts, replay-safe


def test_segmented_top_k_matches_plain(spark):
    """top-k is associative, so the segmented (hot-key-parallel) variant
    must be row-identical to the plain window — including groups smaller
    than k, exact-k groups, and the 90%-hot key."""
    from etlbox_spark.operators.dedupe import top_k_per_group, top_k_per_group_segmented

    df = _skewed(spark, n=20_000)
    order = [F.col("value").desc(), F.col("event_seq").asc()]  # total order
    plain = top_k_per_group(df, ["repo"], order, k=7)
    seg = top_k_per_group_segmented(df, ["repo"], order, k=7, segments=16)
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, seg.collect()))
    assert a == b
    # determinism across runs (the salt is xxhash64, not rand())
    c = sorted(map(tuple, top_k_per_group_segmented(df, ["repo"], order, k=7,
                                                    segments=16).collect()))
    assert b == c
