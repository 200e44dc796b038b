"""Property-based incremental ANN store (hypothesis): ANY sequence of
append batches — fresh ids, re-used ids (upserts), and upserts whose new
vector moves to a different cluster — must leave the cluster-bucketed
lake equal to a pure-Python dict replay, and every probe equal to a
pure-Python IVF search over that dict.

Vectors are small-integer-valued so float32 storage is exact and the
Spark/Python cosine values are bit-comparable (CLAUDE.md float-
determinism rule); ties in top-k break by id on both sides.
Derandomized: LSH-style probabilistic misses don't exist here, but
Spark-per-example cost does — few, fat examples.
"""

from __future__ import annotations

import math
import shutil
import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from etlbox_spark.operators.similarity import (
    ivf_lake_append,
    ivf_lake_build,
    ivf_lake_topk,
    probe_clusters,
)

# 4 well-separated centroids in 4-d
_CENTS = [
    [4.0, 0.0, 0.0, 0.0],
    [0.0, 4.0, 0.0, 0.0],
    [0.0, 0.0, 4.0, 0.0],
    [0.0, 0.0, 0.0, 4.0],
]

_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
    ]
)

# integer components, never the zero vector
_vec = st.lists(
    st.integers(min_value=-2, max_value=2), min_size=4, max_size=4
).filter(lambda v: any(v))

# a batch: unique ids (dict keys) -> vectors
_batch = st.dictionaries(
    st.integers(min_value=0, max_value=11), _vec, min_size=1, max_size=4
)


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(y * y for y in b))
    return d / (na * nb) if na and nb else 0.0


def _py_ivf_topk(state: dict[int, list[float]], qv, k, n_probe):
    """Pure-Python replica of assign + probe + exact top-k within the
    probed clusters (same tie rules: assign/probe to lowest index on
    equal cosine, top-k by (-sim, id))."""
    probe = set(probe_clusters(qv, _CENTS, n_probe))

    def cluster(v):
        sims = [_cos(v, c) for c in _CENTS]
        return sims.index(max(sims))

    cand = [(i, _cos(v, qv)) for i, v in state.items() if cluster(v) in probe]
    return sorted(cand, key=lambda t: (-t[1], t[0]))[:k]


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(initial=_batch, appends=st.lists(_batch, min_size=1, max_size=3), q=_vec)
def test_ann_store_matches_python_replay(spark, initial, appends, q):
    root = f"/tmp/prop_ann_{uuid.uuid4().hex[:8]}"
    try:
        df0 = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in sorted(initial.items())], _SCHEMA
        )
        t = ivf_lake_build(df0, root, "embedding", _CENTS)
        state = dict(initial)
        for e, batch in enumerate(appends):
            dfb = spark.createDataFrame(
                [(i, [float(x) for x in v]) for i, v in sorted(batch.items())], _SCHEMA
            )
            ivf_lake_append(spark, t, dfb, epoch_id=2 + e)
            state.update(batch)

        # store state == dict replay (ids and exact vectors)
        got = {
            int(r["vec_id"]): [int(x) for x in r["embedding"]]
            for r in t.read(spark).collect()
        }
        assert got == {i: list(v) for i, v in state.items()}

        # probe == python IVF over the same dict, same tie rules
        qv = [float(x) for x in q]
        lake = [
            (int(r["vec_id"]), float(r["sim"]))
            for r in ivf_lake_topk(
                spark, t, "embedding", qv, _CENTS, k=3, n_probe=2
            ).collect()
        ]
        py = _py_ivf_topk(state, qv, k=3, n_probe=2)
        assert [i for i, _ in lake] == [i for i, _ in py]
        for (_, sl), (_, sp) in zip(lake, py):
            assert abs(sl - sp) < 1e-9
    finally:
        shutil.rmtree(root, ignore_errors=True)
