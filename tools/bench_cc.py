"""connected_components pathological-topology bench (VERDICT r04 #5).

Measures rounds + wall on the two worst shapes at 10^5 scale:
* chain — diameter 10^5-1: plain min-propagation needs ~10^5 rounds
  (strictly unrunnable); pointer jumping must land in O(log N),
* star — one 10^5-degree hot key in the neighbor join (skew arm),
* mixed — star + chain + 10^4 pairs in one graph (the realistic worst).

Usage: python tools/bench_cc.py [n]   (default 100_000)
Writes BENCH_CC.json (one JSON line) and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etlbox_spark.operators.textdedup import connected_components  # noqa: E402
from etlbox_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark(
        app_name="bench_cc", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    cases = {
        "chain": [(i, i + 1) for i in range(n - 1)],
        "star": [(0, i) for i in range(1, n)],
        "mixed": (
            [(0, i) for i in range(1, n + 1)]
            + [(2 * n + i, 2 * n + i + 1) for i in range(n - 1)]
            + [(5 * n + 2 * i, 5 * n + 2 * i + 1) for i in range(10_000)]
        ),
    }
    out: dict = {"metric": "cc_mixed_wall_s", "unit": "sec", "n": n, "cases": {}}
    for name, edges in cases.items():
        df = spark.createDataFrame(edges, "id_a long, id_b long").repartition(cpus)
        stats: dict = {}
        t0 = time.perf_counter()
        labels = connected_components(df, max_iter=40, stats=stats)
        n_comp = labels.select("component").distinct().count()
        wall = time.perf_counter() - t0
        out["cases"][name] = {
            "edges": len(edges),
            "rounds": stats.get("rounds"),
            "wall_s": round(wall, 2),
            "components": n_comp,
        }
        print(name, out["cases"][name], flush=True)
    out["value"] = out["cases"]["mixed"]["wall_s"]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BENCH_CC.json"), "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
