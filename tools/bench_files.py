"""Per-file benchmark harness — the analogue of the reference's test/bench.sh.

Times encode and decode per WAV file for each engine, reports wall seconds,
throughput, compression ratio, and peak RSS, as CSV (same spirit as
/root/reference/test/bench.sh + timings.csv).  If a `flac` binary is on
PATH it is benchmarked too (the reference's comparison codec); otherwise
the columns are left as #N/A like the reference's CSV.

Usage:
    python tools/bench_files.py file1.wav file2.wav ...
    python tools/bench_files.py --synthetic 3   # generate 3 synthetic files
"""

from __future__ import annotations

import argparse
import os
import resource
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

# Honor JAX_PLATFORMS even when a sitecustomize pre-imported jax (env vars
# alone are too late then).
if os.environ.get("JAX_PLATFORMS"):
    import jax  # noqa: E402

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])



def peak_rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def synth_files(n: int, tmpdir: Path) -> list[Path]:
    from bench import make_corpus
    from x3_tpu.utils.wav import write_wav

    paths = []
    for i in range(n):
        wav = make_corpus(64 * (i + 1), 10_000, seed=i)
        p = tmpdir / f"synth{i}.wav"
        write_wav(p, wav, 96_000)
        paths.append(p)
    return paths


def bench_flac(wav_path: Path, tmpdir: Path):
    from x3_tpu.utils.extbin import find_flac

    flac = find_flac()
    if not flac:
        return "#N/A", "#N/A", "#N/A"
    out = tmpdir / (wav_path.stem + ".flac")
    t0 = time.perf_counter()
    subprocess.run([flac, "--totally-silent", "--compression-level-0", "-f", "-o", str(out), str(wav_path)], check=True)
    enc_s = time.perf_counter() - t0
    back = tmpdir / (wav_path.stem + "_flac.wav")
    t0 = time.perf_counter()
    subprocess.run([flac, "--totally-silent", "-d", "-f", "-o", str(back), str(out)], check=True)
    dec_s = time.perf_counter() - t0
    ratio = wav_path.stat().st_size / out.stat().st_size
    return f"{enc_s:.3f}", f"{dec_s:.3f}", f"{ratio:.2f}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="*", help="WAV files to benchmark")
    ap.add_argument("--synthetic", type=int, default=0, help="generate N synthetic hydrophone files")
    ap.add_argument("--engines", default="jax,native", help="comma-separated engines")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/x3_tpu_jax_cache")
    from x3_tpu.files import wav_to_x3a, x3a_to_wav
    from x3_tpu.utils.wav import read_wav

    tmpdir = Path(tempfile.mkdtemp(prefix="x3bench_"))
    paths = [Path(p) for p in args.files]
    if args.synthetic:
        paths += synth_files(args.synthetic, tmpdir)
    if not paths:
        ap.error("no input files (pass WAVs or --synthetic N)")

    engines = args.engines.split(",")
    print("file,mb,engine,encode_s,encode_mbs,decode_s,decode_mbs,ratio,rss_mb,"
          "roundtrip_ok,flac_enc_s,flac_dec_s,flac_ratio")
    for wav_path in paths:
        mb = wav_path.stat().st_size / 1e6
        flac_cols = bench_flac(wav_path, tmpdir)
        for engine in engines:
            if engine == "native":
                from x3_tpu import native

                if not native.available():
                    continue
            x3a = tmpdir / (wav_path.stem + f".{engine}.x3a")
            back = tmpdir / (wav_path.stem + f".{engine}.back.wav")
            wav_to_x3a(wav_path, x3a, engine=engine)  # warm (jit/caches)
            t0 = time.perf_counter()
            wav_to_x3a(wav_path, x3a, engine=engine)
            enc_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            x3a_to_wav(x3a, back, engine=engine)
            dec_s = time.perf_counter() - t0
            ratio = wav_path.stat().st_size / x3a.stat().st_size
            orig, _ = read_wav(wav_path)
            got, _ = read_wav(back)
            ok = bool(np.array_equal(orig, got))
            print(f"{wav_path.name},{mb:.1f},{engine},{enc_s:.3f},{mb/enc_s:.1f},"
                  f"{dec_s:.3f},{mb/dec_s:.1f},{ratio:.2f},{peak_rss_mb():.0f},"
                  f"{ok},{flac_cols[0]},{flac_cols[1]},{flac_cols[2]}")


if __name__ == "__main__":
    main()
