"""Convert a WAV to .x3a and back, checking the roundtrip is bit-exact."""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from x3_tpu import wav_to_x3a, x3a_to_wav
from x3_tpu.utils.wav import read_wav, write_wav


def main(wav_path=None):
    work = Path(tempfile.mkdtemp(prefix="x3_example_"))  # keep cwd clean
    if wav_path is None:
        # No input given: synthesize a hydrophone-like file.
        rng = np.random.default_rng(0)
        t = np.arange(200_000)
        wav = np.clip(
            np.round(1200 * np.sin(2 * np.pi * t / 9773) + rng.normal(0, 5, t.size)),
            -32768, 32767,
        ).astype(np.int16)
        wav_path = str(work / "example.wav")
        write_wav(wav_path, wav, 96_000)

    result = wav_to_x3a(wav_path, str(work / "example.x3a"), verbose=True)
    errors = x3a_to_wav(str(work / "example.x3a"), str(work / "example_back.wav"))
    orig, _ = read_wav(wav_path)
    back, _ = read_wav(str(work / "example_back.wav"))
    assert errors == 0 and np.array_equal(orig, back), "roundtrip mismatch!"
    print(f"bit-exact roundtrip OK; {orig.nbytes} -> {result.nbytes} bytes")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
