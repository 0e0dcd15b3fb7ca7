"""Capture `.explain("formatted")` for registry keys into text files.

Used by the optimization rounds to commit before/after physical plans
(plans/r<N>/<key>_{before,after}.txt): the judge cannot run Spark and
checks plan claims against these files.

Usage: python tools/plan_capture.py OUT_DIR SUFFIX [sf_dir] key [key ...]
  -> OUT_DIR/<key>_<SUFFIX>.txt

Note: keys whose builders run driver-side actions (iterative label
propagation, KMeans fit, eager fixtures) execute those during capture;
the file still holds the final returned frame's plan.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipeline_project_spark.queries import REGISTRY  # noqa: E402
from etl_pipeline_project_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    if len(args) < 3:
        sys.exit("usage: plan_capture.py OUT_DIR SUFFIX [sf_dir] key [key ...]")
    out_dir, suffix = args[0], args[1]
    rest = args[2:]
    sf_dir = "/root/testdata/sf0.1"
    if rest and os.path.isdir(rest[0]):
        sf_dir = rest.pop(0)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-capture")
    for key in rest:
        try:
            df = REGISTRY[key](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            text = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}\n"
        path = os.path.join(out_dir, f"{key}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)")


if __name__ == "__main__":
    main()
