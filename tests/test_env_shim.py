"""The conftest protobuf shim mutates process-global state (sys.path,
PYTHONPATH, protobuf's version-check escape hatch) so transformWithState
can run where the interpreter ships no google.protobuf. These tests make
its activation guard load-bearing: the shim must be active IFF protobuf
was genuinely absent from site-packages, and must vanish the day a
container ships real protobuf (dated probe: 2026-08-14, pyenv 3.11.7
has no `google` namespace at all)."""
from __future__ import annotations

import os
import sys

from tests.conftest import _VENDORED_PROTOBUF_HOME, _protobuf_missing


def _shim_active() -> bool:
    return _VENDORED_PROTOBUF_HOME in sys.path


def test_shim_only_active_when_protobuf_was_absent():
    """If the vendored path is on sys.path, it must be because no real
    protobuf install exists outside it; if a real install exists, the
    shim must have no-opped (no path injection, no escape hatch)."""
    if _shim_active():
        # with the vendored entry removed, protobuf must be missing —
        # i.e. the shim activated only because there was no real install
        saved = list(sys.path)
        saved_mods = {
            k: sys.modules.pop(k)
            for k in list(sys.modules)
            if k == "google" or k.startswith("google.")
        }
        try:
            sys.path = [p for p in saved if p != _VENDORED_PROTOBUF_HOME]
            # invalidate finder + module caches so find_spec re-scans honestly
            # (the vendored namespace package lingers in sys.modules and its
            # cached __path__ would still resolve google.protobuf)
            import importlib

            importlib.invalidate_caches()
            assert _protobuf_missing(), (
                "conftest shim is active but google.protobuf resolves "
                "without the vendored path — the shim should have no-opped"
            )
        finally:
            sys.path = saved
            sys.modules.update(saved_mods)
    else:
        # shim no-opped: the escape hatch must not have been set by us and
        # PYTHONPATH must not carry the vendored dir
        assert _VENDORED_PROTOBUF_HOME not in os.environ.get("PYTHONPATH", "")


def test_shim_env_consistent():
    """PYTHONPATH (inherited by Python workers) and sys.path (driver) must
    agree about the vendored dir — a driver-only shim would make TWS fail
    in the worker with a confusing import error."""
    in_pythonpath = _VENDORED_PROTOBUF_HOME in os.environ.get(
        "PYTHONPATH", ""
    ).split(os.pathsep)
    assert _shim_active() == in_pythonpath
