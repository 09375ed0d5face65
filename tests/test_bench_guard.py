"""Perf-regression guard (PERF.md ablation rows).

The steady-state single-chip floors — MPSCL >= 120 src-img/s, MCCL >= 95
src-img/s, MCCL+RAIN+eps >= 72 src-img/s (measured 148 / 121 / 90,
de-rated ~20% for host contention) — are asserted by running the real
``bench.py`` on the TPU. Opt-in because the
CI suite runs on virtual CPU devices (conftest forces JAX_PLATFORMS=cpu
in-process, so the check must run in a subprocess with the axon plugin):

    SLCL_TPU_TESTS=1 python -m pytest tests/test_bench_guard.py -q
"""
import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("SLCL_TPU_TESTS") != "1",
    reason="TPU perf guard is opt-in (SLCL_TPU_TESTS=1); needs the real chip")


def test_bench_floors():
    root = Path(__file__).resolve().parent.parent
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)          # let the axon plugin win
    env["BENCH_ITERS"] = "30"
    out = subprocess.run([sys.executable, str(root / "bench.py")],
                         env=env, capture_output=True, text=True,
                         timeout=1800, cwd=root)
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["value"] >= 120.0, f"MPSCL throughput regressed: {res}"
    assert res["mccl_img_s"] >= 95.0, f"MCCL throughput regressed: {res}"
    assert res["mcclrain_img_s"] >= 72.0, \
        f"MCCL+RAIN+eps throughput regressed: {res}"
    assert res["regression_ok"]
