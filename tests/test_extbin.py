"""Self-upgrading external gates (SURVEY §4, VERDICT r3 item 7).

No reference `x3` or `flac` binary exists in this sandbox, so the gates
anchor to the oracle + golden vectors — but they must auto-detect the
binaries and activate wherever they exist.  These tests pin both halves:
detection resolution order, clean skip when absent, and activation via a
shim "reference binary" that wraps our own CLI (flag parity with
bin/x3.rs --input/--output, invocation per test/test_wavs.sh:63-88).
"""

from __future__ import annotations

import os
import stat
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent

from x3_tpu.utils.extbin import find_flac, find_reference_x3  # noqa: E402


def test_detection_absent(monkeypatch):
    monkeypatch.delenv("X3_REFERENCE_BIN", raising=False)
    monkeypatch.delenv("FLAC_BIN", raising=False)
    monkeypatch.setenv("PATH", "/nonexistent")
    assert find_reference_x3() is None
    assert find_flac() is None


def test_detection_env_beats_path(tmp_path, monkeypatch):
    fake = tmp_path / "x3"
    fake.write_text("#!/bin/sh\nexit 0\n")
    fake.chmod(fake.stat().st_mode | stat.S_IXUSR)
    monkeypatch.setenv("X3_REFERENCE_BIN", str(fake))
    assert find_reference_x3() == str(fake)
    # Non-executable / missing env values are rejected, not returned.
    monkeypatch.setenv("X3_REFERENCE_BIN", str(tmp_path / "missing"))
    monkeypatch.setenv("PATH", "/nonexistent")
    assert find_reference_x3() is None


def _make_ref_shim(tmp_path: Path) -> Path:
    """A fake reference binary: our own CLI behind the reference's flag
    surface.  Exercises the full subprocess plumbing of the gate."""
    shim = tmp_path / "x3"
    shim.write_text(
        "#!/bin/sh\n"
        f'export PYTHONPATH="{REPO_ROOT}"\n'
        "export JAX_PLATFORMS=cpu\n"
        "export X3_ENGINE=numpy\n"
        f'exec "{sys.executable}" -m x3_tpu "$@"\n'
    )
    shim.chmod(shim.stat().st_mode | stat.S_IXUSR)
    return shim


def test_fuzz_gate_activates_with_shim(tmp_path, monkeypatch, rng):
    sys.path.insert(0, str(REPO_ROOT / "tools"))
    try:
        from fuzz_differential import ref_file_differential
    finally:
        sys.path.pop(0)

    shim = _make_ref_shim(tmp_path)
    wav = np.clip(np.cumsum(rng.integers(-3, 4, 2_500)), -32768, 32767).astype(np.int16)
    failures = ref_file_differential(str(shim), wav, ctx="shim-test")
    assert failures == 0


def test_fuzz_gate_reports_archive_mismatch(tmp_path, rng):
    """A divergent 'reference' must be reported as a failure, not crash."""
    sys.path.insert(0, str(REPO_ROOT / "tools"))
    try:
        from fuzz_differential import ref_file_differential
    finally:
        sys.path.pop(0)

    # Shim that emits garbage archives/wavs of the requested names.
    shim = tmp_path / "x3"
    shim.write_text(
        "#!/bin/sh\n"
        'while [ $# -gt 0 ]; do\n'
        '  if [ "$1" = "--output" ]; then out="$2"; fi\n'
        "  shift\n"
        "done\n"
        'printf "not an archive" > "$out"\n'
    )
    shim.chmod(shim.stat().st_mode | stat.S_IXUSR)
    wav = rng.integers(-100, 100, 500).astype(np.int16)
    failures = ref_file_differential(str(shim), wav, ctx="bad-shim-test")
    assert failures >= 1
