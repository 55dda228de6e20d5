"""Pins for tools/scaling_curve.py — the offline scaling-probe math.

The probe's value is its two-axis discipline; these tests pin the
arithmetic (latency floor subtraction, clamping) and the flag classes
so a refactor can't silently change what "SUPER" means.
"""

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_TOOL = os.path.join(_REPO, "tools", "scaling_curve.py")
sys.path.insert(0, os.path.join(_REPO, "tools"))

from scaling_curve import corrected  # noqa: E402


def _cap(queries, jobs, job_ms):
    return {
        "queries": queries,
        "extras": {"job_counts": jobs},
        "calibration": {"job_ms_min": job_ms},
    }


def test_corrected_subtracts_each_runs_own_latency_floor():
    cap = _cap({"a": 2.0, "b": 1.0}, {"a": 4, "b": 2}, 250.0)
    c = corrected(cap)
    assert c["a"] == 1.0  # 2.0 - 4*0.25
    assert c["b"] == 0.5  # 1.0 - 2*0.25


def test_corrected_clamps_latency_bound_rows_to_eps():
    # 10 jobs x 300 ms > 1.2 s raw: measured time is pure scheduler
    # latency; the corrected value must clamp, not go negative
    cap = _cap({"a": 1.2}, {"a": 10}, 300.0)
    assert corrected(cap)["a"] == 0.02


def test_corrected_missing_job_count_means_no_subtraction():
    cap = _cap({"a": 1.5}, {}, 300.0)
    assert corrected(cap)["a"] == 1.5


def _run_cli(tmp_path, small, big, *extra):
    ps, pb = tmp_path / "s.json", tmp_path / "b.json"
    ps.write_text(json.dumps(small))
    pb.write_text(json.dumps(big))
    out = subprocess.run(
        [sys.executable, _TOOL, str(ps), str(pb), *extra],
        capture_output=True, text=True, check=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def test_cli_flags_quadratic_growth_and_not_linear(tmp_path):
    # lin: 10x data -> 8x corrected time (sub-linear, ok)
    # quad: 10x data -> 100x corrected time, above the big-SF floor
    small = _cap({"lin": 0.5, "quad": 0.1}, {"lin": 0, "quad": 0}, 0.0)
    big = _cap({"lin": 4.0, "quad": 10.0}, {"lin": 0, "quad": 0}, 0.0)
    summary = _run_cli(tmp_path, small, big)
    assert summary["super"] == ["quad"]
    assert summary["classes"].get("ok", 0) == 1
    assert summary["n_queries"] == 2


def test_cli_ratio_below_big_sf_floor_is_tiny_not_super(tmp_path):
    # 100x ratio but 0.3 s at the big SF: below the measurement floor,
    # must be classed tiny (meaningless ratio), never SUPER
    small = _cap({"q": 0.003}, {"q": 0}, 0.0)
    big = _cap({"q": 0.3}, {"q": 0}, 0.0)
    summary = _run_cli(tmp_path, small, big)
    assert summary["super"] == []
    assert summary["classes"] == {"tiny": 1}
