"""Pinned CPU throughput regression test (full tier, not smoke).

BENCH_r03 -> BENCH_r04 saw the same fixed-config CPU number halve
(433k -> 175k steps/s) with nothing to attribute the swing to: driver-box
contention or a real XLA-path regression.  This test pins the workload
(benchmarks/bench_cpu_regression.py: dbmixer B=512 f32 fast-Newton XLA
loop) and asserts its rate NORMALIZED by a same-moment NumPy matmul
calibration of the box, so box slowness cancels and only a path
regression (or a >2.5x win, worth re-anchoring) trips the envelope.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "benchmarks"))

from bench_cpu_regression import (  # noqa: E402
    ENVELOPE_HI, ENVELOPE_LO, EXPECTED_NORMALIZED, measure)


def test_cpu_throughput_envelope():
    lo = EXPECTED_NORMALIZED * ENVELOPE_LO
    hi = EXPECTED_NORMALIZED * ENVELOPE_HI
    res = measure()
    sys.stderr.write("\n[cpu-regression] " + json.dumps(res) + "\n")
    norm = res["normalized_steps_per_gflop"]
    if not (lo <= norm <= hi):
        # one retry: asymmetric transient contention (another heavy
        # process pinning the box mid-measurement) can skew numerator
        # and denominator differently; a real path regression
        # reproduces on the second run
        res = measure()
        sys.stderr.write("[cpu-regression retry] "
                         + json.dumps(res) + "\n")
        norm = res["normalized_steps_per_gflop"]
    assert lo <= norm <= hi, (
        f"normalized CPU rate {norm:.0f} steps/s/GFLOPs outside the "
        f"committed envelope [{lo:.0f}, {hi:.0f}] "
        f"(raw {res['steps_per_sec']:.0f} steps/s at box "
        f"{res['box_gflops']:.0f} GFLOP/s). If the box calibration is "
        f"sane, this is a real XLA-path regression (or a 2.5x+ win — "
        f"re-anchor EXPECTED_NORMALIZED in "
        f"benchmarks/bench_cpu_regression.py).")
