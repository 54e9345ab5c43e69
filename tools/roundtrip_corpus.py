"""Corpus roundtrip gate — the analogue of the reference's test/test_wavs.sh.

For every .wav in a corpus directory (or synthetic corpus classes when none
is given): encode -> decode -> compare sample-exactly with the original, for
each requested engine, and cross-check that all engines produced identical
archives.  Exit code 0 only if everything is bit-exact.

    python tools/roundtrip_corpus.py /path/to/corpus --engines jax,native
    python tools/roundtrip_corpus.py --synthetic    # built-in corpus classes
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

# Honor JAX_PLATFORMS even when a sitecustomize pre-imported jax (env vars
# alone are too late then).
if os.environ.get("JAX_PLATFORMS"):
    import jax  # noqa: E402

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])



def synthetic_corpus(tmp: Path) -> list[Path]:
    """The BASELINE.json workload classes as synthetic WAVs."""
    from x3_tpu.utils.wav import write_wav

    rng = np.random.default_rng(1234)
    n = 123_456
    t = np.arange(n)
    cases = {
        "hydrophone_44k": (np.clip(np.round(1500 * np.sin(2 * np.pi * t / 9773) + rng.normal(0, 5, n)), -32768, 32767), 44100),
        "hydrophone_96k": (np.clip(np.round(800 * np.sin(2 * np.pi * t / 3001) + rng.normal(0, 12, n)), -32768, 32767), 96000),
        "silence": (np.zeros(n), 44100),
        "white_noise": (rng.integers(-32768, 32768, n), 44100),
        "clicks": (np.where(rng.random(n) < 0.001, rng.integers(-30000, 30000, n), rng.integers(-3, 4, n)), 192000),
        "drift": (np.clip(np.cumsum(rng.integers(-50, 51, n)), -32768, 32767), 22050),
        "tiny": (rng.integers(-100, 100, 7), 8000),
    }
    paths = []
    for name, (wav, rate) in cases.items():
        p = tmp / f"{name}.wav"
        write_wav(p, np.asarray(wav, dtype=np.int16), rate)
        paths.append(p)
    return paths


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("corpus", nargs="?", help="directory of .wav files")
    ap.add_argument("--synthetic", action="store_true", help="use built-in corpus classes")
    ap.add_argument("--engines", default="jax,native,numpy")
    args = ap.parse_args()

    from x3_tpu.files import wav_to_x3a, x3a_to_wav
    from x3_tpu.utils.extbin import find_reference_x3, ref_convert
    from x3_tpu.utils.wav import read_wav
    from x3_tpu import native

    tmp = Path(tempfile.mkdtemp(prefix="x3corpus_"))
    if args.corpus:
        paths = sorted(Path(args.corpus).glob("*.wav"))
    else:
        paths = synthetic_corpus(tmp)
    if not paths:
        print("no .wav files found")
        return 2

    # Self-upgrading gate (SURVEY §4): with a reference `x3` binary present
    # the roundtrip adds byte-level cmp of whole archives plus cross-decodes
    # in both directions; absent, it anchors to the oracle + golden vectors.
    ref_bin = find_reference_x3()
    print(
        f"reference x3 binary: {ref_bin} (byte-level cmp active)"
        if ref_bin
        else "reference x3 binary: not found — byte-level cmp skipped "
        "(set X3_REFERENCE_BIN or put `x3` on PATH)"
    )

    engines = [e for e in args.engines.split(",") if e != "native" or native.available()]
    failures = 0
    for wav_path in paths:
        orig, rate = read_wav(wav_path)
        archives = {}
        our_x3a = None
        for engine in engines:
            x3a = tmp / f"{wav_path.stem}.{engine}.x3a"
            back = tmp / f"{wav_path.stem}.{engine}.wav"
            wav_to_x3a(wav_path, x3a, engine=engine)
            errors = x3a_to_wav(x3a, back, engine=engine)
            got, grate = read_wav(back)
            ok = errors == 0 and grate == rate and np.array_equal(got, orig)
            archives[engine] = x3a.read_bytes()
            our_x3a = x3a
            status = "OK" if ok else "FAIL"
            ratio = orig.nbytes / len(archives[engine])
            print(f"{wav_path.name:24s} {engine:6s} {status}  ratio={ratio:5.2f}x")
            failures += 0 if ok else 1
        if len(set(archives.values())) != 1:
            print(f"{wav_path.name:24s} CROSS-ENGINE ARCHIVE MISMATCH")
            failures += 1
        if ref_bin and our_x3a is not None:
            ref_x3a = tmp / f"{wav_path.stem}.ref.x3a"
            ref_back = tmp / f"{wav_path.stem}.refback.wav"
            our_back = tmp / f"{wav_path.stem}.oursref.wav"
            try:
                # reference encodes -> archives must be byte-identical
                ref_convert(ref_bin, wav_path, ref_x3a)
                if ref_x3a.read_bytes() != archives[engines[0]]:
                    print(f"{wav_path.name:24s} REFERENCE ARCHIVE CMP MISMATCH")
                    failures += 1
                # reference decodes OUR archive
                ref_convert(ref_bin, our_x3a, ref_back)
                got, grate = read_wav(ref_back)
                if grate != rate or not np.array_equal(got, orig):
                    print(f"{wav_path.name:24s} REFERENCE DECODE OF OUR ARCHIVE DIFFERS")
                    failures += 1
                # we decode the REFERENCE's archive
                errors = x3a_to_wav(ref_x3a, our_back, engine=engines[0])
                got, grate = read_wav(our_back)
                if errors != 0 or grate != rate or not np.array_equal(got, orig):
                    print(f"{wav_path.name:24s} OUR DECODE OF REFERENCE ARCHIVE DIFFERS")
                    failures += 1
                print(f"{wav_path.name:24s} refbin OK (cmp + both cross-decodes)")
            except Exception as e:  # noqa: BLE001 — gate must report, not die
                print(f"{wav_path.name:24s} REFBIN FAIL {type(e).__name__}: {e}")
                failures += 1
    print(f"\n{len(paths)} files x {len(engines)} engines: "
          f"{'ALL BIT-EXACT' if failures == 0 else f'{failures} FAILURES'}")
    return 0 if failures == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
