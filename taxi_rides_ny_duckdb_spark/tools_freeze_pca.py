"""Regenerate contract_pca_components.py (run manually, not in tests).

Usage: python -m taxi_rides_ny_duckdb_spark.tools_freeze_pca [sf_dir] [k]
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    from .operators.pca import train_pca
    from .session import get_spark
    from .sources.registry import load

    spark = get_spark()
    mean, comps, scales = train_pca(
        load(spark, sf_dir, "embeddings"), "embedding", k=k, dim=64
    )
    out = os.path.join(os.path.dirname(__file__), "contract_pca_components.py")
    doc = (
        "Frozen PCA whitening basis (generated artifact).\n\n"
        "Trained ONCE by operators/pca.train_pca (exact covariance via the\n"
        "Arrow partial-moment seam, driver eigh, sign-normalized so each\n"
        "component's largest-|coefficient| entry is positive) on\n"
        f"{sf_dir} embeddings, then frozen here as double literals — the\n"
        "same replay trick as contract_ivf_centroids: repr() round-trips\n"
        "doubles exactly, so Spark and the DuckDB oracle project against\n"
        "bit-identical basis values. A PCA basis is fit offline and serves\n"
        "the corpus for months; freezing it IS the operator's steady-state\n"
        "shape (training stays covered by tests/test_operators.py).\n"
        "Regenerate with: python -m taxi_rides_ny_duckdb_spark.tools_freeze_pca"
    )
    lines = [f'"""{doc}"""', "", f"PCA_K = {len(comps)}", f"PCA_DIM = {len(comps[0])}", ""]
    lines.append("PCA_MEAN: list[float] = [")
    for i in range(0, len(mean), 4):
        lines.append("    " + ", ".join(repr(x) for x in mean[i : i + 4]) + ",")
    lines.append("]")
    lines.append("")
    lines.append("PCA_SCALES: list[float] = [")
    lines.append("    " + ", ".join(repr(x) for x in scales) + ",")
    lines.append("]")
    lines.append("")
    lines.append("PCA_COMPONENTS: list[list[float]] = [")
    for c in comps:
        lines.append("    [")
        for i in range(0, len(c), 4):
            lines.append("        " + ", ".join(repr(x) for x in c[i : i + 4]) + ",")
        lines.append("    ],")
    lines.append("]")
    open(out, "w").write("\n".join(lines) + "\n")
    print(f"froze k={k} PCA basis from {sf_dir} -> {out}")


if __name__ == "__main__":
    main()
