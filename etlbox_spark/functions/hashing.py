"""Key hashing / bucketing / salting expressions (all JVM-side, codegen'd).

The reference (ETLBox) has no scalar-function library — expressions are
arbitrary C# in RowTransformation (SURVEY.md §2.7). Our engine commits to
Spark's built-in catalog; these helpers are the few derived expressions the
engine itself needs: deterministic key hashing for bucket layout, salting
for skewed keys, and the sha256(content) invariant from BASELINE.json:15.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def key_hash(*key_cols: str) -> Column:
    """Deterministic 64-bit hash of the logical key (repo, path)."""
    return F.xxhash64(*[F.col(c) for c in key_cols])


def bucket_expr(n_buckets: int, *key_cols: str) -> Column:
    """Bucket id in [0, n_buckets) — pmod handles negative hashes."""
    return F.pmod(key_hash(*key_cols), F.lit(n_buckets)).cast("int")


def salt_expr(salt_source: str, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts) from an existing row-level
    column — THE engine-wide salt derivation (replay comparability
    depends on every operator deriving it identically; skew.py and
    salted_key all route through here)."""
    return F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts)).cast("int")


def salted_key(key_col: str, n_salts: int, salt_source: str) -> Column:
    """Salt a hot key for skewed shuffles: ``key#<salt>``.

    ``salt_source`` must be a column that distributes rows of the hot key
    (e.g. the event_seq): salt = pmod(xxhash64(salt_source), n_salts).
    Salting composes with LWW dedupe only when applied to the *shuffle*
    key, never the dedupe identity (SURVEY.md §7 'hard' #3).

    ``concat_ws``, not ``concat``: concat is null-propagating, so a NULL
    hot key — the classic real-world skew cause — would map EVERY salt
    to NULL and still land on one reducer. concat_ws skips the null, so
    NULL keys salt to "<salt>" (which cannot collide with a real key's
    "...#<salt>" form).
    """
    return F.concat_ws("#", F.col(key_col), salt_expr(salt_source, n_salts).cast("string"))


def content_sha256(content_col: str = "content") -> Column:
    """Per-row integrity invariant: sha256 hex of content (BASELINE.json:15)."""
    return F.sha2(F.col(content_col).cast("string"), 256)
