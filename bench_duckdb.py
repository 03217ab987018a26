#!/usr/bin/env python
"""DuckDB-side baseline runner — times every contract ORACLE at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) with the same
protocol as bench.py (best-of-2, timed through fetchall) and writes
BASELINE_DUCKDB.json. Rows-only contract queries have no oracle and
are skipped — compare totals on the shared (oracled) subset only.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    import duckdb

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")

    from taxi_rides_ny_duckdb_spark import contract

    contract.load_all()
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    # The taxi-DAG oracles read the shared parquet/CSV fixtures by
    # absolute path inside their SQL — no extra registration needed,
    # but the fixtures must exist (contract_taxi creates them lazily).
    from taxi_rides_ny_duckdb_spark.fixtures import ensure_taxi_fixtures

    ensure_taxi_fixtures()

    # Same optional subset knob as bench.py (scaling checkpoints).
    subset_env = os.environ.get("SPARK_GRAFT_QUERIES", "")
    subset = {s.strip() for s in subset_env.split(",") if s.strip()}
    unknown = subset - set(contract.ORACLES)
    if unknown:
        print(f"# unknown SPARK_GRAFT_QUERIES: {sorted(unknown)}", file=sys.stderr)
    names = [n for n in sorted(contract.ORACLES) if not subset or n in subset]

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        sql = contract.ORACLES[name]
        best, n = float("inf"), 0
        try:
            for _ in range(2):
                t0 = time.perf_counter()
                n = len(con.execute(sql).fetchall())
                best = min(best, time.perf_counter() - t0)
        except Exception as exc:  # noqa: BLE001 — isolate, report, continue
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            continue
        timings[name] = round(best, 4)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    payload = {
        "metric": "duckdb_oracle_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "errors": errors,
        "runs_per_query": 2,
        "timing": "best_of_2",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    line = json.dumps(payload, separators=(",", ":"))
    # subset runs default to a _subset file so ad-hoc scaling runs
    # can't silently overwrite the git-tracked artifact (r10, the
    # bench.py convention).
    default_name = (
        "BASELINE_DUCKDB_subset.json" if subset else "BASELINE_DUCKDB.json"
    )
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT", os.path.join(REPO_DIR, default_name)
    )
    with open(out_path, "w") as fh:
        fh.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
