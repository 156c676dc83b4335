"""Guards for the scale-probe corpus generators (tools/scale_probe.py).

VERDICT r13 task 7: the disjoint-embedding recipe (rotation x sign-flip)
supports at most 2*(dim-1) distinct copies; the ADVICE-r12 entry guard
must fire BEFORE any table write, so an over-deep probe request fails in
milliseconds instead of leaving a partial, marker-less multi-minute
corpus build behind.
"""

from __future__ import annotations

import os
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_ROOT, "tools"))

import scale_probe  # noqa: E402


def test_docs_recipe_ceiling_raises_before_any_write(tmp_path, monkeypatch):
    """mult above the 2*(dim-1) recipe bound raises ValueError with no
    filesystem effect: the output directory is never even created, and
    no Spark session is touched (spark=None would explode on first use,
    so passing it proves validation precedes every job)."""
    monkeypatch.setattr(
        scale_probe, "per_user_tmpdir", lambda tag: str(tmp_path)
    )
    # dim = 64 in the driver testdata -> ceiling 2*(64-1) = 126
    with pytest.raises(ValueError, match="mult <= 126"):
        scale_probe.build_scaled_docs(None, 127)
    assert os.listdir(tmp_path) == [], "guard must fire before any write"


def test_docs_recipe_ceiling_admits_the_probe_tiers(tmp_path, monkeypatch):
    """The probe-of-record multipliers (10/30/100) sit under the ceiling:
    the guard must NOT fire for them. Stop the build right after the
    validation line (monkeypatched makedirs raises a sentinel) so the
    test costs no corpus build."""

    class _Stop(Exception):
        pass

    def _boom(*a, **k):
        raise _Stop()

    monkeypatch.setattr(
        scale_probe, "per_user_tmpdir", lambda tag: str(tmp_path)
    )
    monkeypatch.setattr(scale_probe.os, "makedirs", _boom)
    for mult in (10, 30, 100, 126):
        with pytest.raises(_Stop):
            scale_probe.build_scaled_docs(None, mult)
