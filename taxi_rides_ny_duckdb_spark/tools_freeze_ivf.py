"""Regenerate contract_ivf_centroids.py (run manually, not in tests).

Usage: python -m taxi_rides_ny_duckdb_spark.tools_freeze_ivf [sf_dir]
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from .operators.similarity import train_ivf_centroids
    from .session import get_spark
    from .sources.registry import load

    spark = get_spark()
    cents = train_ivf_centroids(load(spark, sf_dir, "embeddings"), nlist=8)
    out = os.path.join(os.path.dirname(__file__), "contract_ivf_centroids.py")
    header = open(out).read().split('"""')[1]  # keep the docstring
    lines = [f'"""{header}"""', "", f"IVF_NLIST = {len(cents)}", f"IVF_DIM = {len(cents[0])}", ""]
    lines.append("IVF_CENTROIDS: list[list[float]] = [")
    for c in cents:
        lines.append("    [")
        for i in range(0, len(c), 4):
            lines.append("        " + ", ".join(repr(x) for x in c[i : i + 4]) + ",")
        lines.append("    ],")
    lines.append("]")
    open(out, "w").write("\n".join(lines) + "\n")
    print(f"froze {len(cents)} centroids from {sf_dir} -> {out}")


if __name__ == "__main__":
    main()
