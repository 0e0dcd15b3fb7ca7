"""Interleaved A/B micro-benchmark harness for optimization decisions.

Host steal on this sandbox varies 0.2-3% between windows and single runs
spike 2-4x, so one-shot comparisons mislead. This runs the candidate
builders interleaved (A B A B ...) inside ONE session after a shared
warm-up and reports per-variant min/median — the min is the least
noise-contaminated estimate of the true cost.

Usage (as a library):
    from tools.ab_bench import ab
    ab({"old": lambda: build_old(), "new": lambda: build_new()}, rounds=5)
"""

from __future__ import annotations

import time


def ab(variants: dict, rounds: int = 5) -> dict:
    """variants: name -> zero-arg callable returning a DataFrame.
    Each round builds AND executes each variant once (bench.py's timed
    region is build+exec, so that is what we compare)."""
    results: dict[str, list[float]] = {name: [] for name in variants}
    # warm-up: one untimed execution of each variant (JIT, page cache)
    for name, build in variants.items():
        build().write.mode("overwrite").format("noop").save()
    for _ in range(rounds):
        for name, build in variants.items():
            t0 = time.perf_counter()
            build().write.mode("overwrite").format("noop").save()
            results[name].append(time.perf_counter() - t0)
    out = {}
    for name, runs in results.items():
        runs_sorted = sorted(runs)
        out[name] = {
            "min": round(runs_sorted[0], 3),
            "med": round(runs_sorted[len(runs_sorted) // 2], 3),
            "runs": [round(r, 3) for r in runs],
        }
        print(f"{name:28s} min={out[name]['min']:7.3f} med={out[name]['med']:7.3f} {out[name]['runs']}")
    return out
