"""Scale-knob registry enforcement (VERDICT_r08 #4): every plan-shape
constant is enumerated in analytics/scale_knobs.py with its derivation
and pinning test; adding an unregistered knob or silently retuning a
registered one fails here."""

from __future__ import annotations

import importlib
import os
import re

import pytest

from dbsink_spark.analytics import scale_knobs

PKG_ROOT = os.path.join(os.path.dirname(__file__), "..", "dbsink_spark")

# module-level UPPER_CASE assignments whose names claim a scale role
_SCAN = re.compile(
    r"^([A-Z][A-Z0-9_]*(?:_MAX_ROWS|_TARGET_[A-Z0-9_]+|_POOL|_BUDGET|_TILE_ROWS|_NB)|FANOUT|KNN_K)\s*=",
    re.M,
)


def _scan_package() -> set[tuple[str, str]]:
    found = set()
    for dirpath, _dirs, files in os.walk(PKG_ROOT):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, os.path.join(PKG_ROOT, ".."))
            mod = rel[:-3].replace(os.sep, ".")
            if mod.endswith(".__init__"):
                mod = mod[: -len(".__init__")]
            with open(path) as f:
                src = f.read()
            for m in _SCAN.finditer(src):
                found.add((mod, m.group(1)))
    return found


def _registered() -> set[tuple[str, str]]:
    out = set()
    for k in scale_knobs.KNOBS:
        out.add((k.module, k.attr))
        for mod, attr in k.aliases:
            out.add((mod, attr))
    return out


def test_every_scanned_knob_is_registered():
    missing = _scan_package() - _registered()
    assert not missing, (
        "plan-shape-named constants missing from scale_knobs.KNOBS "
        "(register with derivation + pinning test, or mark semantic): "
        f"{sorted(missing)}"
    )


def test_every_registered_knob_exists_and_matches():
    """Drift check: the registry's recorded value equals the live
    constant — retuning a knob without updating its derivation fails."""
    for k in scale_knobs.KNOBS:
        mod = importlib.import_module(k.module)
        live = getattr(mod, k.attr)
        assert live == k.value, (k.module, k.attr, live, k.value)
        for amod_name, attr in k.aliases:
            amod = importlib.import_module(amod_name)
            assert getattr(amod, attr) == k.value, (amod_name, attr)


def test_plan_shape_knobs_carry_derivation_and_pin():
    for k in scale_knobs.KNOBS:
        assert len(k.derivation) > 40, (k.attr, "derivation too thin")
        if k.plan_shape:
            assert k.pinned_by, (k.attr, "plan-shape knob without a pinning test")


def test_pinned_by_names_resolve():
    """Every pinning reference must name a test that actually exists —
    a renamed/deleted test would silently orphan the knob's guarantee."""
    sources = {}
    for k in scale_knobs.KNOBS:
        # extract "tests/<file>.py::test_<name>" pairs (file carries over ::-chains)
        cur_file = None
        for tok in re.split(r",\s*", k.pinned_by):
            m = re.search(r"(tests/[a-z_]+\.py)?::(test_[a-z0-9_]+)", tok)
            if not m:
                continue
            if m.group(1):
                cur_file = m.group(1)
            assert cur_file, (k.attr, tok, "no test file in reference")
            path = os.path.join(PKG_ROOT, "..", cur_file)
            if path not in sources:
                with open(path) as f:
                    sources[path] = f.read()
            assert f"def {m.group(2)}(" in sources[path], (k.attr, cur_file, m.group(2))
