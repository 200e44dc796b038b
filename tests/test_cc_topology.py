"""connected_components under pathological topology (VERDICT r04 #5).

The O(diameter) claim was untested where it breaks: one long chain
component (diameter = N → plain min-propagation needs N rounds) and one
giant star (hot join key). Pointer jumping (r05) bounds rounds at
O(log diameter); these tests pin the bound and correctness against a
pure-Python union-find oracle. The 10^5-scale wall/rounds measurement
lives in tools/bench_cc.py → BENCH.md.
"""

from __future__ import annotations

from etlbox_spark.operators.textdedup import connected_components


def _uf_oracle(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def _run(spark, edges, max_iter=20):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    stats: dict = {}
    got = {
        r["id"]: r["component"]
        for r in connected_components(df, max_iter=max_iter, stats=stats).collect()
    }
    return got, stats


def test_chain_converges_in_log_rounds(spark):
    """A 4096-vertex chain: diameter 4095 — plain propagation would need
    4095 rounds; path halving must land in ≤ log2(4095)+a few."""
    n = 4096
    edges = [(i, i + 1) for i in range(n - 1)]
    got, stats = _run(spark, edges)
    assert got == _uf_oracle(edges)
    assert set(got.values()) == {0}
    assert stats["rounds"] <= 16, f"chain took {stats['rounds']} rounds"


def test_star_hot_key_and_mixed_topology(spark):
    """A 20k-leaf star (hot center key in the neighbor join) plus a chain
    plus scattered pairs in ONE graph — correctness and round bound."""
    star = [(0, i) for i in range(1, 20_001)]
    chain = [(100_000 + i, 100_000 + i + 1) for i in range(500)]
    pairs = [(200_000 + 2 * i, 200_000 + 2 * i + 1) for i in range(1_000)]
    edges = star + chain + pairs
    got, stats = _run(spark, edges)
    assert got == _uf_oracle(edges)
    assert stats["rounds"] <= 13
    comps = set(got.values())
    assert 0 in comps and 100_000 in comps and len(comps) == 2 + 1_000


def test_adversarial_label_order_chain(spark):
    """Ids DESCENDING along the chain (the min label sits at the far
    end): the worst case for min-propagation direction; the bound and
    the oracle must still hold."""
    n = 2048
    edges = [(n - i, n - i - 1) for i in range(n - 1)]
    got, stats = _run(spark, edges)
    assert got == _uf_oracle(edges)
    assert set(got.values()) == {1}
    assert stats["rounds"] <= 15
