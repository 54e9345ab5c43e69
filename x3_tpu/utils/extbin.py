"""Optional external comparison binaries — self-upgrading gates.

SURVEY.md §4 calls for differential validation against the reference's Rust
`x3` binary (ground truth invocation: /root/reference/test/test_wavs.sh:63-88,
`$X3 --input FILE --output FILE`) and benchmarking against `flac
--compression-level-0` (/root/reference/test/bench.sh:71-76).  Neither binary
exists in this sandbox, so the gates anchor to the Python oracle + golden
vectors here — but they auto-detect the binaries wherever they exist:

* set ``X3_REFERENCE_BIN`` (or put ``x3`` on PATH) and
  ``tools/roundtrip_corpus.py`` / ``tools/fuzz_differential.py`` add
  byte-level ``cmp`` of whole archives against the reference binary plus
  cross-decodes in both directions;
* set ``FLAC_BIN`` (or put ``flac`` on PATH) and ``tools/bench_files.py``
  fills its flac comparison columns.

The gates skip cleanly when the binaries are absent and upgrade themselves
off-sandbox with zero configuration.
"""

from __future__ import annotations

import os
import shutil
import subprocess


def _executable(cand: str | None) -> str | None:
    if cand and os.path.isfile(cand) and os.access(cand, os.X_OK):
        return cand
    return None


def find_reference_x3() -> str | None:
    """Path to the reference `x3` binary (X3_REFERENCE_BIN beats PATH)."""
    return _executable(os.environ.get("X3_REFERENCE_BIN") or shutil.which("x3"))


def find_flac() -> str | None:
    """Path to a `flac` binary (FLAC_BIN beats PATH)."""
    return _executable(os.environ.get("FLAC_BIN") or shutil.which("flac"))


def ref_convert(binary: str, src, dst) -> None:
    """One reference-CLI conversion (flag parity: bin/x3.rs --input/--output;
    direction is inferred from the extensions, like our CLI)."""
    subprocess.run(
        [binary, "--input", str(src), "--output", str(dst)],
        check=True,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        timeout=600,
    )
