"""Benchmark harness — times every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is forced end-to-end with the `noop` sink (full computation, no
driver-side collect, no filesystem write). Per key: one untimed warm-up
execution, then the median of N_RUNS-1 timed runs (cheap keys) or one
timed run (keys whose warm-up exceeded HEAVY_CUTOFF_S — steady-state
variance there is negligible and repeated multi-second runs dominate the
harness wall-clock).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_pipeline_project_spark.queries import REGISTRY  # noqa: E402
from etl_pipeline_project_spark.session import get_spark  # noqa: E402

N_RUNS = 3
HEAVY_CUTOFF_S = 2.0


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.removeprefix("sf"))
    except ValueError:
        return -1.0


def _is_streaming_key(key: str) -> bool:
    return key.startswith("q_stream") or key == "q_state_store_read"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Streaming keys carry fixed micro-batch/state-store setup cost that a
    # long batch session inflates by 15-200% (accumulated broadcast/state
    # cleanup backlog — BASELINE.md r4 notes). Isolate them by default:
    # batch keys run first, then the session restarts and the streaming
    # block times against a fresh JVM state, so the committed per-key JSON
    # matches isolated runs. --no-isolated-streaming restores one session.
    isolate = "--no-isolated-streaming" not in sys.argv and os.environ.get(
        "SPARK_GRAFT_NO_ISOLATE", ""
    ) != "1"
    spark = get_spark("bench")

    # Warm the JVM + parquet footers with the cheapest query once.
    REGISTRY["q_scan_table"](spark, sf_dir).write.mode("overwrite").format("noop").save()

    # Per key: one untimed warm-up execution (plan compile + code gen +
    # shuffle-file page cache), then timed runs — N_RUNS for cheap keys,
    # a single timed run for keys whose warm-up already exceeded
    # HEAVY_CUTOFF_S (steady-state variance on multi-second jobs is far
    # below the cutoff, and the registry is >200 keys: 3× runs on every
    # heavy key would triple a wall-clock dominated by exactly the keys
    # that need it least).
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    ordered = sorted(REGISTRY, key=lambda k: (_is_streaming_key(k), k))
    n_batch = sum(1 for k in ordered if not _is_streaming_key(k))
    for i, key in enumerate(ordered):
        if isolate and i == n_batch:
            # first streaming key: restart the session so streaming
            # timings don't inherit the batch block's session-state noise
            spark.stop()
            spark = get_spark("bench-streaming")
            REGISTRY["q_scan_table"](spark, sf_dir).write.mode(
                "overwrite"
            ).format("noop").save()
        # one broken key must not zero out the whole benchmark: record the
        # failure, keep timing the rest, and surface it in the JSON line
        try:
            t0 = time.perf_counter()
            REGISTRY[key](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            warm = time.perf_counter() - t0
            n_timed = 1 if warm > HEAVY_CUTOFF_S else N_RUNS - 1
            runs = []
            for _ in range(n_timed):
                t0 = time.perf_counter()
                REGISTRY[key](spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                runs.append(time.perf_counter() - t0)
            timings[key] = round(statistics.median(runs), 4)
        except Exception as exc:  # noqa: BLE001
            errors[key] = f"{type(exc).__name__}: {exc}"[:300]
            sys.stderr.write(f"BENCH ERROR {key}: {errors[key]}\n")

    total = round(sum(timings.values()), 4)
    out = {
        "metric": "total_median_sec_all_queries",
        # a partial total (some keys errored) is NOT comparable round-over-
        # round — summing only the survivors would masquerade as a speedup.
        # value goes null on any error; the partial sum moves to its own
        # clearly-named field.
        "value": None if errors else total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(sf_dir),
    }
    if errors:
        out["errors"] = errors
        out["partial"] = True
        out["n_errors"] = len(errors)
        out["partial_total_sec"] = total
    print(json.dumps(out))
    # also persist the per-key timings in-repo: the driver's BENCH file
    # keeps only a truncated tail of stdout, which hides per-key
    # regressions (and hid everything when a round crashed)
    try:
        art = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            f"BENCH_local_sf{_sf_of(sf_dir)}.json",
        )
        with open(art, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
    except OSError:
        pass


if __name__ == "__main__":
    main()
