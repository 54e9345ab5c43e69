"""Differential fuzz campaign: jax / native / numpy engines must agree
byte-for-byte on encode and bit-for-bit on decode across parameter
geometries, signal classes, edge lengths, and random corruption.

    python tools/fuzz_differential.py --trials 100 --seed 7

Every failure reproduces from the printed (seed, trial) pair.  Parameter
geometry varies block_len/blocks_per_frame/thresholds; Rice code selection
stays at the default [0,1,3] because the reference decoder hardwires the
ftype2/3 suffix widths to 2/4 bits (decoder.rs:180) — other code sets are
not roundtrippable in the reference either (quirk replicated, see
tests/test_params_generality.py).
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

if os.environ.get("JAX_PLATFORMS"):
    import jax  # noqa: E402

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# A compact set of geometries (each is one XLA compile on first use).
GEOMETRIES = [
    dict(block_len=20, blocks_per_frame=500),                       # default
    dict(block_len=20, blocks_per_frame=500, thresholds=(2, 5, 15)),
    dict(block_len=4, blocks_per_frame=8),
    dict(block_len=1, blocks_per_frame=16),
    dict(block_len=24, blocks_per_frame=7),
    dict(block_len=25, blocks_per_frame=6),                         # scan path
    dict(block_len=60, blocks_per_frame=5),                         # max block
    dict(block_len=20, blocks_per_frame=700),                       # > default bpf
    dict(block_len=10, blocks_per_frame=1500),                      # >> default bpf
]


def make_signal(rng, n, kind):
    if n == 0:
        return np.zeros(0, np.int16)
    if kind == 0:
        return np.zeros(n, np.int16)
    if kind == 1:
        return np.clip(np.cumsum(rng.integers(-3, 4, n)), -32768, 32767).astype(np.int16)
    if kind == 2:
        return np.clip(np.cumsum(rng.integers(-50, 51, n)), -32768, 32767).astype(np.int16)
    if kind == 3:
        return rng.integers(-32768, 32768, n).astype(np.int16)
    if kind == 4:  # clicks on a quiet floor
        base = rng.integers(-2, 3, n)
        base[rng.random(n) < 0.01] = rng.integers(-32000, 32000)
        return base.astype(np.int16)
    # extremes: rails and alternation
    out = np.tile(np.asarray([-32768, 32767, 0, -1], np.int16), n // 4 + 1)[:n]
    return out


def ref_file_differential(ref_bin: str, wav: np.ndarray, ctx: str) -> int:
    """Roundtrip `wav` through the reference binary and our file layer;
    archives must be byte-identical and cross-decodes bit-exact."""
    import tempfile

    from x3_tpu.files import wav_to_x3a, x3a_to_wav
    from x3_tpu.utils.extbin import ref_convert
    from x3_tpu.utils.wav import read_wav, write_wav

    failures = 0
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        wp = tmp / "t.wav"
        write_wav(wp, wav, 96_000)
        ours, refs = tmp / "ours.x3a", tmp / "ref.x3a"
        wav_to_x3a(wp, ours)
        try:
            ref_convert(ref_bin, wp, refs)
        except Exception as e:  # noqa: BLE001 — gate must report, not die
            print(f"FAIL refbin encode {type(e).__name__}: {e} ({ctx})")
            return 1
        if ours.read_bytes() != refs.read_bytes():
            print(f"FAIL refbin archive cmp mismatch ({ctx})")
            failures += 1
        back = tmp / "back.wav"
        try:
            if x3a_to_wav(refs, back) != 0:
                raise ValueError("frame errors")
            got, _ = read_wav(back)
            if not np.array_equal(got, wav):
                print(f"FAIL our decode of refbin archive differs ({ctx})")
                failures += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL our decode of refbin archive: {type(e).__name__}: {e} ({ctx})")
            failures += 1
        try:
            ref_convert(ref_bin, ours, back)
            got, _ = read_wav(back)
            if not np.array_equal(got, wav):
                print(f"FAIL refbin decode of our archive differs ({ctx})")
                failures += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL refbin decode {type(e).__name__}: {e} ({ctx})")
            failures += 1
    return failures


def run_campaign(trials: int, seed: int, verbose: bool = False) -> int:
    from x3_tpu import native
    from x3_tpu.errors import X3Error
    from x3_tpu.models import oracle
    from x3_tpu.models.decoder import decode_frames_batch
    from x3_tpu.models.encoder import encode
    from x3_tpu.params import Parameters
    from x3_tpu.utils.extbin import find_reference_x3

    # Self-upgrading gate (SURVEY §4): when a reference `x3` binary exists,
    # default-geometry trials additionally roundtrip through it at the file
    # layer (byte cmp of archives + cross-decode); the reference CLI runs
    # fixed default parameters, so only those trials qualify.
    ref_bin = find_reference_x3()
    if ref_bin:
        print(f"reference x3 binary: {ref_bin} (file-layer differential active)")

    have_native = native.available()
    rng = np.random.default_rng(seed)
    failures = 0
    for trial in range(trials):
        geo = GEOMETRIES[trial % len(GEOMETRIES)]
        params = Parameters(**geo)
        spf = params.samples_per_frame
        kind = int(rng.integers(0, 6))
        # lengths: sub-frame, exact, partial-tail multi-frame, off-by-one
        n = int(rng.choice([1, 2, spf - 1, spf, spf + 1, int(rng.integers(1, 3 * spf + 2))]))
        wav = make_signal(rng, n, kind)
        ctx = f"seed={seed} trial={trial} geo={geo} kind={kind} n={n}"
        try:
            ref = oracle.encode(wav, params)
            jx = encode(wav, params, engine="jax").data
            engines = {"jax": jx}
            if have_native:
                engines["native"] = native.encode(wav, params)
            for name, blob in engines.items():
                if blob != ref:
                    print(f"FAIL encode {name} differs: {ctx}")
                    failures += 1

            # decode roundtrip of each frame through the batched kernel
            pos = 0
            payloads, counts = [], []
            off = 0
            while off < len(ref):
                h = ref[off : off + 20]
                plen = int.from_bytes(h[6:8], "big")
                cnt = int.from_bytes(h[4:6], "big")
                payloads.append(ref[off + 20 : off + 20 + plen])
                counts.append(cnt)
                off += 20 + plen
            outs, errs = decode_frames_batch(payloads, counts, params)
            got = np.concatenate(outs) if outs else np.zeros(0, np.int16)
            if np.asarray(errs).any() or not np.array_equal(got, wav):
                print(f"FAIL decode roundtrip: {ctx} errs={np.asarray(errs)}")
                failures += 1

            # XML-reconstruction decode: the archive header serializes
            # block_len/thresholds but NOT blocks_per_frame, so the file
            # layer decodes with the DEFAULT bpf (decodefile.rs:295-300) —
            # frames from a bigger-bpf encoder exceed the default geometry
            # and the kernel must follow the header counts (geometry
            # generality, VERDICT r2 item 1).
            recon = Parameters(
                block_len=params.block_len, thresholds=params.thresholds
            )
            outs_r, errs_r = decode_frames_batch(payloads, counts, recon)
            got_r = np.concatenate(outs_r) if outs_r else np.zeros(0, np.int16)
            if np.asarray(errs_r).any() or not np.array_equal(got_r, wav):
                print(f"FAIL reconstructed-params decode: {ctx} errs={np.asarray(errs_r)}")
                failures += 1

            # corruption agreement on one random frame
            if payloads and len(payloads[0]) > 4:
                p = bytearray(payloads[0])
                i = int(rng.integers(0, len(p)))
                p[i] ^= 1 << int(rng.integers(0, 8))
                p = bytes(p)
                outcomes = {}
                try:
                    outcomes["numpy"] = ("ok", oracle.decode_frame(p, params, counts[0]))
                except X3Error as e:
                    outcomes["numpy"] = (type(e).__name__, None)
                o2, e2 = decode_frames_batch([p], [counts[0]], params)
                outcomes["jax"] = ("ok", o2[0]) if not e2[0] else ("err", None)
                if have_native:
                    try:
                        outcomes["native"] = ("ok", native.decode_frame(p, params, counts[0]))
                    except X3Error as e:
                        outcomes["native"] = (type(e).__name__, None)
                oks = {k for k, (o, _) in outcomes.items() if o == "ok"}
                errs_ = {k for k, (o, _) in outcomes.items() if o != "ok"}
                if oks and errs_:
                    print(f"FAIL corrupt accept/reject divergence: {ctx} ok={oks} err={errs_}")
                    failures += 1
                elif oks:
                    vals = [outcomes[k][1] for k in sorted(oks)]
                    for v in vals[1:]:
                        if not np.array_equal(vals[0], v):
                            print(f"FAIL corrupt sample divergence: {ctx}")
                            failures += 1
                            break
            # reference-binary file-layer differential (default geometry only:
            # the reference CLI has no parameter flags, bin/x3.rs)
            if ref_bin and geo == GEOMETRIES[0] and n > 0:
                failures += ref_file_differential(ref_bin, wav, ctx)
        except Exception as e:  # noqa: BLE001 — campaign must report, not die
            print(f"FAIL exception {type(e).__name__}: {e} ({ctx})")
            failures += 1
        if verbose and trial % 10 == 9:
            print(f"... {trial + 1}/{trials} trials, {failures} failures")
    print(f"{trials} trials: {'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return failures


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=70)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args()
    return 1 if run_campaign(args.trials, args.seed, args.verbose) else 0


if __name__ == "__main__":
    sys.exit(main())
