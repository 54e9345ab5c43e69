"""Multi-channel container convention: N mono archives + a sidecar manifest.

The X3 wire format is strictly mono (the reference rejects >1 channel,
error.rs MoreThanOneChannel / encoder.rs:55-57), so a multi-channel capture
becomes one `.x3a` archive per channel plus a tiny `.x3m` JSON manifest that
names them — a convention this framework adds on top of the format (the
archives remain plain, individually decodable X3 files).

All channels' frames share device batches during encode (multifile), which
is exactly the batched multi-file shape the TPU pipeline likes.
"""

from __future__ import annotations

import json
import wave
from pathlib import Path

import numpy as np

from .errors import X3Error
from .params import Parameters

MANIFEST_VERSION = 1


def encode_multichannel(
    samples_2d,
    sample_rate: int,
    base_path,
    params: Parameters | None = None,
    mesh=None,
):
    """Encode a [C, n] capture to base.ch<k>.x3a files + base.x3m manifest.

    Returns the manifest path."""
    from . import archive
    from .multifile import encode_streams

    samples_2d = np.atleast_2d(np.asarray(samples_2d, dtype=np.int16))
    base = Path(base_path)
    if base.suffix == ".x3m":
        base = base.with_suffix("")
    params = params or Parameters()
    results = encode_streams(list(samples_2d), params, mesh=mesh)
    files = []
    for k, res in enumerate(results):
        p = base.with_suffix(f".ch{k}.x3a")
        with open(p, "wb") as f:
            f.write(archive.build_archive_header(sample_rate, params))
            f.write(res.data)
        files.append(p.name)
    manifest = {
        "format": "x3m",
        "version": MANIFEST_VERSION,
        "channels": len(files),
        "sample_rate": sample_rate,
        "samples": int(samples_2d.shape[1]),
        "files": files,  # relative to the manifest's directory
    }
    mpath = base.with_suffix(".x3m")
    mpath.write_text(json.dumps(manifest, indent=1))
    return mpath


def decode_multichannel(manifest_path, engine: str = "auto"):
    """Decode a .x3m manifest back to ([C, n] int16 samples, sample_rate)."""
    from .multifile import decode_streams

    mpath = Path(manifest_path)
    manifest = json.loads(mpath.read_text())
    if manifest.get("format") != "x3m":
        raise X3Error(f"not an x3m manifest: {manifest_path}")
    if manifest.get("version", 0) > MANIFEST_VERSION:
        raise X3Error(f"unsupported x3m version {manifest['version']}")
    archives = [(mpath.parent / name).read_bytes() for name in manifest["files"]]
    decoded = decode_streams(archives)
    chans = []
    for (samples, rate), _ in zip(decoded, manifest["files"]):
        if rate != manifest["sample_rate"]:
            raise X3Error("manifest/archive sample rate mismatch")
        chans.append(samples)
    n = manifest.get("samples")
    out = np.stack(chans)
    if n is not None and out.shape[1] != n:
        raise X3Error(f"decoded {out.shape[1]} samples, manifest says {n}")
    return out, manifest["sample_rate"]


def read_wav_multichannel(path):
    """Read a WAV of any channel count; returns ([C, n] int16, rate)."""
    with wave.open(str(path), "rb") as w:
        if w.getsampwidth() != 2:
            raise X3Error(f"only 16-bit WAV supported, got {8 * w.getsampwidth()}-bit")
        c = w.getnchannels()
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    flat = np.frombuffer(raw, dtype="<i2").astype(np.int16)
    return flat.reshape(-1, c).T.copy(), rate


def write_wav_multichannel(path, samples_2d, sample_rate: int) -> None:
    """Write [C, n] int16 samples as an interleaved multi-channel WAV."""
    samples_2d = np.atleast_2d(np.asarray(samples_2d, dtype="<i2"))
    with wave.open(str(path), "wb") as w:
        w.setnchannels(samples_2d.shape[0])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.ascontiguousarray(samples_2d.T).tobytes())


def wav_to_x3m(wav_path, base_path, params: Parameters | None = None, mesh=None):
    """Multi-channel WAV -> per-channel archives + manifest."""
    chans, rate = read_wav_multichannel(wav_path)
    return encode_multichannel(chans, rate, base_path, params, mesh)


def x3m_to_wav(manifest_path, wav_path, engine: str = "auto") -> int:
    """Manifest -> multi-channel WAV.  Returns the channel count."""
    chans, rate = decode_multichannel(manifest_path, engine)
    write_wav_multichannel(wav_path, chans, rate)
    return chans.shape[0]


def _load_manifest(manifest_path) -> tuple[dict, Path]:
    mpath = Path(manifest_path)
    manifest = json.loads(mpath.read_text())
    if manifest.get("format") != "x3m":
        raise X3Error(f"not an x3m manifest: {manifest_path}")
    return manifest, mpath


def x3m_info(manifest_path) -> dict:
    """Manifest metadata + per-channel x3a_info (header-index only)."""
    from .files import x3a_info

    manifest, mpath = _load_manifest(manifest_path)
    per_channel = [x3a_info(mpath.parent / name) for name in manifest["files"]]
    total = sum(i["archive_bytes"] for i in per_channel)
    pcm = sum(i["pcm_bytes"] for i in per_channel)
    return {
        "channels": manifest["channels"],
        "sample_rate": manifest["sample_rate"],
        "samples_per_channel": manifest.get("samples"),
        "archive_bytes": total,
        "pcm_bytes": pcm,
        "compression_ratio": round(pcm / total, 3) if total else 0.0,
        "files": list(manifest["files"]),
        "per_channel": per_channel,
    }


def verify_x3m(manifest_path, engine: str = "auto", verbose: bool = False) -> dict:
    """Integrity-check every channel archive of a manifest (verify_x3a per
    channel, plus manifest consistency: channel count and sample counts)."""
    from .files import verify_x3a

    manifest, mpath = _load_manifest(manifest_path)
    reports = []
    ok = len(manifest["files"]) == manifest["channels"]
    want = manifest.get("samples")
    for name in manifest["files"]:
        rep = verify_x3a(mpath.parent / name, engine=engine, verbose=verbose)
        rep["file"] = name
        if want is not None and rep["n_samples_ok"] != want:
            rep["ok"] = False
        ok = ok and rep["ok"]
        reports.append(rep)
    return {
        "ok": ok,
        "channels": len(reports),
        "frame_errors": sum(r["frame_errors"] for r in reports),
        "skipped_bytes": sum(r["skipped_bytes"] for r in reports),
        "per_channel": reports,
    }
