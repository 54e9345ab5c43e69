"""Multi-host input pipeline: every host converts its shard of the corpus.

The codec is collective-free (frames are self-contained), so scaling to many
hosts is purely an input-pipeline concern: shard the file list, convert each
shard with the host's local mesh, done — zero DCN traffic.

In a real jax.distributed job this is:

    jax.distributed.initialize()                      # once per host
    from x3_tpu.parallel.multihost import local_mesh, shard_worklist
    mine = shard_worklist(all_wavs)                   # this host's files
    wav_to_x3a_batch(mine, [out(p) for p in mine], mesh=local_mesh())

This demo simulates two hosts in one process with explicit indices.
"""

import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from x3_tpu.multifile import wav_to_x3a_batch, x3a_to_wav_batch
from x3_tpu.utils.wav import read_wav, write_wav


def main():
    tmp = Path(tempfile.mkdtemp(prefix="x3mh_"))
    rng = np.random.default_rng(0)
    wavs, wav_paths, x3a_paths, back_paths = [], [], [], []
    for i in range(6):
        w = np.clip(np.cumsum(rng.integers(-6, 7, 30_000)), -32768, 32767).astype(np.int16)
        p = tmp / f"in{i}.wav"
        write_wav(p, w, 96_000)
        wavs.append(w)
        wav_paths.append(p)
        x3a_paths.append(tmp / f"out{i}.x3a")
        back_paths.append(tmp / f"back{i}.wav")

    # "Host 0" and "host 1" each convert their strided shard.
    for host in range(2):
        wav_to_x3a_batch(wav_paths, x3a_paths, process_index=host, process_count=2)
        x3a_to_wav_batch(x3a_paths, back_paths, process_index=host, process_count=2)

    for w, b in zip(wavs, back_paths):
        got, rate = read_wav(b)
        assert rate == 96_000 and np.array_equal(got, w)
    print(f"2-host sharded pipeline: {len(wavs)} files converted + verified bit-exact")


if __name__ == "__main__":
    main()
