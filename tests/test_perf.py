"""Perf regression gate (VERDICT r1 next #9).

Runs ONLY when TPUSDR_PERF=1 (the suite's default platform is a virtual
CPU mesh; this test needs the real chip and must be the only TPU process).
It shells out to benchmarks/perf_gate.py in a fresh interpreter — the
conftest forces this process to CPU, so the measurement cannot run
in-process — and asserts each headline metric holds >= MIN_RATIO of the
recorded baseline (PERF_BASELINE.json, updated when a round improves it).

Wire-in: the verify skill runs ``TPUSDR_PERF=1 python -m pytest
tests/test_perf.py -q`` after the functional drive.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.perf

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(REPO, "PERF_BASELINE.json")
# 0.70 of a 3-run-median floor: the short-scan method turned bimodal
# once the FIR went MXU-pass-bound (PERF_BASELINE comment) -- the gate
# still trips on structural regressions (>3x drops) while passing the
# observed codegen mode split.
MIN_RATIO = 0.70


@pytest.mark.skipif(
    os.environ.get("TPUSDR_PERF") != "1",
    reason="real-TPU perf gate: set TPUSDR_PERF=1 and run alone on the chip",
)
def test_headline_no_regression():
    recorded = json.load(open(BASELINE))
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "perf_gate.py")],
        capture_output=True,
        text=True,
        # tunnel compile times are bimodal: the same perf_gate measured
        # 4 min on one run and >9 on the next (r4) — 540 s false-failed
        timeout=1200,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, f"perf_gate failed:\n{proc.stderr[-2000:]}"
    measured = json.loads(proc.stdout.strip().splitlines()[-1])
    failures = []
    for metric, base in recorded.items():
        if metric.startswith("_"):
            continue
        got = measured.get(metric)
        assert got is not None, f"perf_gate did not report {metric}"
        if got < MIN_RATIO * base:
            failures.append(f"{metric}: {got} < {MIN_RATIO} * recorded {base}")
    assert not failures, "; ".join(failures)
