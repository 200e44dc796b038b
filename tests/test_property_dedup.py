"""Property-based incremental dedup (hypothesis): ANY corpus/batch drawn
from a template pool with controlled mutations (exact-dup casings,
near-dup tail edits, non-dup mid edits) must agree with the pure-Python
anchored-union-find oracle — both the base pipeline's survivor set and
the incremental batch's survivor set, including the lake state after the
incremental commit epoch.

Spark jobs are slow per example, so few, fat examples (each is a full
pipeline + index build + incremental probe + two commits).
"""

from __future__ import annotations

import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etlbox_spark.operators.textdedup import (
    corpus_dedup_pipeline,
    dedup_incremental,
    lsh_index_build,
)

from .test_pipelines import _py_incr_oracle, _py_oracle

_BASES = [
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu",
    "red orange yellow green blue indigo violet crimson amber teal navy plum",
    "spark shuffle partition broadcast catalyst tungsten executor driver stage task lineage codegen",
]

# (base, mutation): exact-dup family (orig/upper/ws), near-dup family
# (tail edit, ~0.82 jaccard vs base and vs sibling tails), non-dup
# (mid edit, ~0.54 jaccard)
_doc = st.tuples(
    st.integers(min_value=0, max_value=len(_BASES) - 1),
    st.sampled_from(["orig", "upper", "ws", "tail", "mid"]),
)


def _render(i: int, base: int, mut: str) -> str:
    toks = _BASES[base].split(" ")
    if mut == "upper":
        return " ".join(toks).upper()
    if mut == "ws":
        return "  ".join(toks) + " "
    if mut == "tail":
        return " ".join(toks[:-1] + [f"tok{i}"])
    if mut == "mid":
        return " ".join(toks[:6] + [f"mid{i}"] + toks[7:])
    return " ".join(toks)


@settings(
    max_examples=6,
    deadline=None,
    # derandomize: the near-dup pairs sit at jaccard ~0.82 where banded
    # LSH has a ~1e-4 per-pair miss probability — with fixed examples a
    # pass is a pass forever (signatures are deterministic in the text),
    # instead of a latent one-in-200-runs surprise
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    corpus=st.lists(_doc, min_size=2, max_size=8),
    batch=st.lists(_doc, min_size=1, max_size=5),
)
def test_incremental_dedup_matches_oracle(spark, tmp_path, corpus, batch):
    corpus_docs = [(i, _render(i, b, m)) for i, (b, m) in enumerate(corpus)]
    batch_docs = [(100 + i, _render(100 + i, b, m)) for i, (b, m) in enumerate(batch)]

    root = tempfile.mkdtemp(dir=tmp_path)
    t, _ = corpus_dedup_pipeline(
        spark.createDataFrame(corpus_docs, "doc_id long, text string"),
        root + "/docs",
        n_perm=64,
        bands=16,
    )
    base_got = {r["doc_id"] for r in t.read(spark).select("doc_id").collect()}
    base_want = _py_oracle(corpus_docs)
    assert base_got == base_want

    idx = lsh_index_build(t.read(spark, with_bucket=False), root + "/idx")
    surv = dedup_incremental(
        spark,
        t,
        idx,
        spark.createDataFrame(batch_docs, "doc_id long, text string"),
        commit_epoch=2,
    )
    got = {r["doc_id"] for r in surv.select("doc_id").collect()}
    want = _py_incr_oracle(corpus_docs, batch_docs)
    assert got == want

    # lake state after the incremental commit = base ∪ batch survivors
    final_ids = {r["doc_id"] for r in t.read(spark).select("doc_id").collect()}
    assert final_ids == base_want | want
