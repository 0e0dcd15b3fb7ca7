"""Time every DuckDB oracle twin at a given sf_dir (default sf0.1) — the
baseline side of BASELINE.md's bench table. 32 threads, median of 3 like
bench.py. Rows-only registry keys have no twin and are skipped.

Usage: python tools/duckdb_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from etl_pipeline_project_spark.queries import ORACLE  # noqa: E402
from etl_pipeline_project_spark.schemas import TESTDATA_TABLES  # noqa: E402

N_RUNS = 3
TIMEOUT_SEC = 120.0  # per-query cap: the all-pairs twins are O(n²) by design


def main() -> None:
    import threading

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    timings: dict[str, float] = {}
    timed_out: list[str] = []
    for key, sql in sorted(ORACLE.items()):
        runs = []
        for _ in range(N_RUNS):
            timer = threading.Timer(TIMEOUT_SEC, con.interrupt)
            timer.start()
            t0 = time.perf_counter()
            try:
                con.execute(sql).fetchall()
                runs.append(time.perf_counter() - t0)
            except duckdb.InterruptException:
                runs = []
                timed_out.append(key)
                timings[key] = TIMEOUT_SEC
                break
            finally:
                timer.cancel()
            if runs[-1] > 10:  # one run is representative for the heavy twins
                break
        if runs:
            timings[key] = round(statistics.median(runs), 4)
        print(f"{key}\t{timings[key]}", file=sys.stderr, flush=True)
    print(
        json.dumps(
            {
                "total_sec": round(sum(timings.values()), 4),
                "timed_out_at_cap": timed_out,
                "queries": timings,
            }
        )
    )


if __name__ == "__main__":
    main()
