"""REGISTRY rotation policy regression test (round-5 verdict item 7).

The driver samples the FIRST ~50 keys of REGISTRY each round for its
differential check (CORRECTNESS_r{N}.json). The round-5 verdict found that
250+ keys had never been driver-sampled because new batches kept jumping
the rotation queue. This test encodes the drain policy so it cannot
silently regress:

1. ``q_time_weighted_avg`` (the only repeat driver hash-FAIL) stays in
   position 0 until a CORRECTNESS file records it green.
2. The next 49 keys must all be never-driver-checked as of the rotation's
   input rounds (``_ROTATION_INPUT_ROUNDS``) — the sample budget goes to
   the evidence backlog, not to already-green keys.
3. The rotation may lag the newest committed CORRECTNESS file by at most
   ONE round (the file for the round in flight lands after the rotation
   was authored); a two-round lag means someone skipped the re-rotation
   step and the test goes red.
"""

from __future__ import annotations

import glob
import json
import os
import re

from etl_pipeline_project_spark.queries import (
    ORACLE,
    REGISTRY,
    _CHECK_PRIORITY,
    _ROTATION_INPUT_ROUNDS,
    _STALE_IMPL_PINS,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _correctness_files() -> dict[int, str]:
    out = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            out[int(m.group(1))] = path
    return out


def _checked_through(max_round: int) -> set[str]:
    keys: set[str] = set()
    for rnd, path in _correctness_files().items():
        if rnd <= max_round:
            with open(path) as fh:
                keys |= {k for k in json.load(fh) if not k.startswith("__")}
    return keys


def test_priority_is_a_registry_permutation() -> None:
    assert len(_CHECK_PRIORITY) == len(set(_CHECK_PRIORITY))
    assert set(_CHECK_PRIORITY) == set(REGISTRY)
    # and the reorder actually applied: REGISTRY iterates in priority order
    assert list(REGISTRY)[: len(_CHECK_PRIORITY)] == _CHECK_PRIORITY


def test_red_key_stays_first_until_driver_green() -> None:
    checked = _checked_through(_ROTATION_INPUT_ROUNDS)
    key = "q_time_weighted_avg"
    green = False
    for rnd, path in _correctness_files().items():
        with open(path) as fh:
            rec = json.load(fh).get(key)
        if rec and rec.get("hash_match"):
            green = True
    if not green:
        assert _CHECK_PRIORITY[0] == key, (
            f"{key} has no driver-green record yet; it must stay first in "
            "_CHECK_PRIORITY so the next CORRECTNESS run re-checks the fix"
        )
    assert key in checked  # sanity: it HAS been sampled (and failed)


def test_sample_window_drains_the_backlog() -> None:
    """The driver's sample budget goes to the evidence backlog first: every
    never-driver-checked key (as of the rotation's input rounds) must sit
    inside the 50-key window, ahead of any already-checked key. While the
    backlog exceeded the window this meant keys 1..49 were all
    never-checked; now that it is smaller (8 keys as of r10), the window's
    remaining slots are necessarily re-checks — allowed only AFTER the
    whole backlog, so no backlog key can be displaced by a green one.

    Exception (round-6 verdict item 3, generalized round 12):
    ``_STALE_IMPL_PINS`` — keys whose newest driver sample predates a
    check upgrade OR an implementation rewrite (their CORRECTNESS row
    tested an older twin or older Spark code), so a fresh sample against
    the CURRENT code is evidence, not waste. The set is explicit and
    bounded, and pins may precede the backlog (reds-then-pins head
    policy, tools/rotate.py; `rotate.py --impl-diff <rev>` mechanizes
    the queries.py half of the detection)."""
    checked = _checked_through(_ROTATION_INPUT_ROUNDS)
    never = set(REGISTRY) - checked
    if not never:  # backlog fully drained — policy satisfied vacuously
        return
    assert len(_STALE_IMPL_PINS) <= 20, "pin list must stay bounded (< window/2)"
    window = _CHECK_PRIORITY[:50]
    missing = sorted(never - set(window))
    assert not missing, (
        f"never-checked keys displaced from the sample window: {missing[:10]}"
    )
    positions_never = [i for i, k in enumerate(window) if k in never]
    positions_checked = [
        i
        for i, k in enumerate(window)
        if k in checked and k not in _STALE_IMPL_PINS
    ]
    if positions_checked and positions_never:
        assert max(positions_never) < min(positions_checked), (
            "an already-checked key precedes a never-checked key in the "
            "window — the backlog must drain first"
        )


def test_rotation_not_stale() -> None:
    """The rotation's input-round marker may trail the newest committed
    CORRECTNESS file by at most one round (the in-flight round's file
    lands after the rotation was authored). More than that means the
    re-rotation step was skipped."""
    files = _correctness_files()
    assert files, "no CORRECTNESS_r*.json committed — driver never ran?"
    newest = max(files)
    assert newest - _ROTATION_INPUT_ROUNDS <= 1, (
        f"rotation was built from rounds<={_ROTATION_INPUT_ROUNDS} but "
        f"CORRECTNESS_r{newest:02d}.json exists — regenerate "
        "_CHECK_PRIORITY from the current union and bump "
        "_ROTATION_INPUT_ROUNDS"
    )


def test_never_checked_oracled_keys_precede_rows_only() -> None:
    """Within the never-checked block, oracle-backed keys (full hash
    evidence) drain before rows-only keys (weaker check)."""
    checked = _checked_through(_ROTATION_INPUT_ROUNDS)
    never_positions = [
        (i, k) for i, k in enumerate(_CHECK_PRIORITY) if k not in checked
    ]
    seen_rows_only = False
    for _, k in never_positions:
        if k not in ORACLE:
            seen_rows_only = True
        elif seen_rows_only:
            raise AssertionError(
                f"oracled never-checked key {k} ordered after a rows-only "
                "key — hash evidence should drain first"
            )


def test_stale_impl_pins_sit_in_sample_window() -> None:
    """Every stale-evidence pin must sit inside the driver's ~50-key
    sample window (after any red keys), or pinning it bought nothing —
    the whole point of ``_STALE_IMPL_PINS`` is that the NEXT driver
    round re-samples the key against its current twin/implementation
    (round-12 generalization of the round-6 twin rule)."""
    window = _CHECK_PRIORITY[:50]
    missing = [k for k in _STALE_IMPL_PINS if k not in window]
    assert not missing, (
        f"pinned keys outside the head-50 sample window: {missing} — "
        "re-run tools/rotate.py"
    )


def test_checked_rows_only_keys_sink_to_tail() -> None:
    """A rows-only key that already has a driver sample can only ever
    reproduce `no_oracle` — re-sampling it spends an evidence slot on a
    known result (round-7 verdict item 4). tools/rotate.py sinks such
    keys to the absolute tail; this pins the policy."""
    checked = _checked_through(_ROTATION_INPUT_ROUNDS)
    checked_rows_only = [
        k for k in _CHECK_PRIORITY if k in checked and k not in ORACLE
    ]
    if not checked_rows_only:
        return
    n_tail = len(checked_rows_only)
    assert _CHECK_PRIORITY[-n_tail:] == checked_rows_only, (
        "checked rows-only keys must occupy the rotation's final "
        f"positions, got tail {_CHECK_PRIORITY[-n_tail:]}"
    )
