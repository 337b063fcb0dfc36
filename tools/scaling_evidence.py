"""Canonical scaling-efficiency evidence for BENCH.md.

Methodology (documented in BENCH.md):
  1. Ingest once at full parallelism: synthetic source-repo table at
     --sf -> build_graph -> canonical edge table written to parquet
     (ingest is a one-time cost in production; the gate is about query
     throughput).
  2. For each side (N cores, 4N cores), in a fresh JVM, read the same
     parquet, pin the same shuffle AND operator-internal partitioning
     (n_partitions overrides auto_shuffle_partitions so the data layout is
     identical on both sides), and run fixed-superstep vertex programs +
     triangle count. Repeat --reps times.
  3. Report per-metric minimum over repetitions per side (minimum filters
     external host interference; the sandbox is a shared machine) and the
     efficiency T_N / (4 * T_4N).

Usage: python tools/scaling_evidence.py [--n 1] [--sf 2.0] [--reps 2 3]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

ITERS = 5
METRICS = ["pagerank", "pagerank_csr", "cc", "triangle"]


def prepare(sf: float, out: str, skewed: bool = False) -> int:
    from peregrine_spark.graph.build import build_graph
    from peregrine_spark.session import get_spark
    from peregrine_spark.tables import powerlaw_edges, source_repo_table

    spark = get_spark(app_name="scaling_prepare")
    if skewed:
        # adversarial skew case: ~1e5-degree hub (sf = millions of samples)
        edges = powerlaw_edges(spark, int(sf * 1_000_000), 100_000)
    else:
        edges = build_graph(source_repo_table(spark, sf=sf)).edges
    edges.repartition(16).write.mode("overwrite").parquet(out)
    n = spark.read.parquet(out).count()
    spark.stop()
    return n


def measure(cores: int, shuffle: int, edges_path: str) -> dict:
    """Runs one measurement pass in THIS process (invoked as subprocess)."""
    from pyspark.sql import functions as F

    from peregrine_spark.operators.triangles import triangle_count
    from peregrine_spark.session import get_spark
    from peregrine_spark.supersteps.components import connected_components
    from peregrine_spark.supersteps.pagerank import pagerank, pagerank_csr

    spark = get_spark(
        app_name=f"scaling_{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=shuffle,
    )
    edges = spark.read.parquet(edges_path).persist()
    edges.count()

    def steady(metrics):
        secs = [m["seconds"] for m in metrics]
        return sum(secs[1:-1]) / max(len(secs) - 2, 1) if len(secs) >= 3 else secs[-1]

    out = {}
    res = pagerank(edges, max_iters=ITERS, tol=-1.0, check_every=ITERS,
                   n_partitions=shuffle)
    out["pagerank"] = steady(res.metrics)
    res = pagerank_csr(edges, max_iters=ITERS, tol=-1.0, check_every=ITERS,
                       n_partitions=shuffle)
    out["pagerank_csr"] = steady(res.metrics)
    res = connected_components(edges, max_iters=ITERS, check_every=ITERS,
                               n_partitions=shuffle)
    out["cc"] = steady(res.metrics)
    triangle_count(edges).collect()  # warm
    t0 = time.monotonic()
    tri = triangle_count(edges).collect()[0]["triangles"]
    out["triangle"] = time.monotonic() - t0
    out["triangles"] = tri
    spark.stop()
    return out


def run_side(cores: int, shuffle: int, edges_path: str, reps: int) -> list[dict]:
    results = []
    for _ in range(reps):
        proc = subprocess.run(
            [sys.executable, __file__, "--measure", str(cores),
             "--shuffle", str(shuffle), "--edges", edges_path],
            capture_output=True, text=True, check=True,
        )
        results.append(json.loads(proc.stdout.strip().splitlines()[-1]))
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1)
    ap.add_argument("--sf", type=float, default=2.0)
    ap.add_argument("--reps", type=int, nargs=2, default=[2, 3],
                    metavar=("SMALL_REPS", "BIG_REPS"))
    ap.add_argument("--edges", type=str, default=None)
    ap.add_argument("--measure", type=int, default=None)
    ap.add_argument("--shuffle", type=int, default=None)
    ap.add_argument("--skewed", action="store_true",
                    help="power-law input with a ~1e5-degree hub instead of "
                         "the source-repo graph (sf = millions of samples)")
    args = ap.parse_args()

    if args.measure is not None:
        print(json.dumps(measure(args.measure, args.shuffle, args.edges)))
        return

    shuffle = max(2 * 4 * args.n, 8)
    tag = "skew" if args.skewed else "sf"
    edges_path = args.edges or str(Path(tempfile.gettempdir()) / f"scaling_edges_{tag}{args.sf}")
    n_edges = prepare(args.sf, edges_path, skewed=args.skewed)

    small = run_side(args.n, shuffle, edges_path, args.reps[0])
    big = run_side(4 * args.n, shuffle, edges_path, args.reps[1])

    def best(side, k):
        return min(r[k] for r in side)

    eff = {k: round(best(small, k) / (4 * best(big, k)), 3) for k in METRICS}
    print(json.dumps({
        "metric": "scaling efficiency N->4N cores, min-over-reps steady-state",
        "input": "powerlaw_hub" if args.skewed else "source_repo",
        "sf": args.sf,
        "n_edges": n_edges,
        "n_cores": args.n,
        "shuffle_partitions": shuffle,
        "reps": args.reps,
        "small_best": {k: round(best(small, k), 2) for k in METRICS},
        "big_best": {k: round(best(big, k), 2) for k in METRICS},
        "efficiency": eff,
        "small_all": small,
        "big_all": big,
    }))


if __name__ == "__main__":
    main()
