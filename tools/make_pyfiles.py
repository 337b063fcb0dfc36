"""Build the spark-submit --py-files artifact: a zip of the
peregrine_spark package (pure Python — no build step needed).

Usage:
    python tools/make_pyfiles.py [out.zip]
    spark-submit --py-files dist/peregrine_spark.zip your_job.py
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main() -> None:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else ROOT / "dist" / "peregrine_spark.zip"
    out.parent.mkdir(parents=True, exist_ok=True)
    pkg = ROOT / "peregrine_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        # .py sources plus package data (bundled nauty-format pattern files
        # patterns/data/*.g6 — PatternGenerator.all(7..9) reads them)
        for p in sorted(pkg.rglob("*")):
            if "__pycache__" in p.parts or not p.is_file():
                continue
            if p.suffix not in (".py", ".g6"):
                continue
            zf.write(p, p.relative_to(ROOT))
    print(f"wrote {out} ({out.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
