"""(Re)generate the bundled connected-pattern families
peregrine_spark/patterns/data/graph{N}c.g6.

The files are SELF-GENERATED (orderly enumeration with canonical dedup,
patterns/small_graph.py:_connected) — no data copied from the reference —
and written pre-sorted by (edge count, canonical form) so
``PatternGenerator.all`` can trust file order and skip re-canonicalizing
hundreds of thousands of graphs at load time.

Usage: python tools/gen_patterns.py [sizes...]   (default: 7 8)
Size 9 takes ~30 minutes (261,080 graphs).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from peregrine_spark.patterns.canonical import canonical_form  # noqa: E402
from peregrine_spark.patterns.small_graph import PatternGenerator  # noqa: E402


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [7, 8]
    data = ROOT / "peregrine_spark" / "patterns" / "data"
    data.mkdir(parents=True, exist_ok=True)
    for size in sizes:
        t0 = time.time()
        gs = sorted(
            PatternGenerator._connected(size),
            key=lambda g: (g.num_true_edges, canonical_form(g)),
        )
        out = data / f"graph{size}c.g6"
        tmp = out.with_suffix(".g6.tmp")
        with open(tmp, "w") as f:
            for g in gs:
                f.write(PatternGenerator.to_g6(g) + "\n")
        tmp.rename(out)
        print(f"graph{size}c.g6: {len(gs)} graphs, {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
