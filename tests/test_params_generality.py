"""Non-default Parameters: the format supports block_len <= 60 and any Rice
code selection; all engines must agree for every valid configuration.

Note a reference quirk (replicated faithfully): the *decoder* hardwires the
unary/2-bit/4-bit suffix structure per ftype (decoder.rs:147-196), so only
the default code selection (0, 1, 3) actually roundtrips — other selections
encode fine but decode to garbage in the reference too.  Roundtrip is
therefore asserted only for (0, 1, 3) configs; encode parity is asserted
for every valid configuration."""

import numpy as np
import pytest

from tests.conftest import make_mixed
from x3_tpu.models import oracle
from x3_tpu.models.decoder import decode_frames_batch
from x3_tpu.models.encoder import encode
from x3_tpu.params import Parameters

CONFIGS = [
    Parameters(block_len=60, blocks_per_frame=100),  # MAX_BLOCK_LENGTH
    Parameters(block_len=10, blocks_per_frame=50),
    Parameters(block_len=25, blocks_per_frame=100),  # scan sample-loop path
    Parameters(block_len=20, blocks_per_frame=500, codes=(0, 2, 3), thresholds=(3, 10, 20)),
    Parameters(block_len=32, blocks_per_frame=64, codes=(1, 2, 3), thresholds=(5, 12, 20)),
]


def _ids(p):
    return f"L{p.block_len}B{p.blocks_per_frame}c{''.join(map(str, p.codes))}"


@pytest.mark.parametrize("params", CONFIGS, ids=_ids)
def test_encode_matches_oracle_nondefault_params(rng, params):
    n = int(2.5 * params.samples_per_frame)
    wav = make_mixed(rng, n)
    want = oracle.encode(wav, params)
    got = encode(wav, params, engine="jax", batch_frames=2)
    assert got.data == want


@pytest.mark.parametrize(
    "params", [p for p in CONFIGS if p.codes == (0, 1, 3)], ids=_ids
)
def test_decode_roundtrip_nondefault_geometry(rng, params):
    n = int(2.5 * params.samples_per_frame)
    wav = make_mixed(rng, n)
    stream = oracle.encode(wav, params)
    frames, pos = [], 0
    while pos < len(stream):
        h = stream[pos : pos + 20]
        ns = int.from_bytes(h[4:6], "big")
        pl = int.from_bytes(h[6:8], "big")
        frames.append((stream[pos + 20 : pos + 20 + pl], ns))
        pos += 20 + pl
    outs, errs = decode_frames_batch([p for p, _ in frames], [s for _, s in frames], params)
    assert not errs.any()
    np.testing.assert_array_equal(np.concatenate(outs), wav)


@pytest.mark.parametrize("params", CONFIGS[:2], ids=_ids)
def test_native_agrees_nondefault_params(rng, params):
    from x3_tpu import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    wav = make_mixed(rng, params.samples_per_frame + 77)
    assert native.encode(wav, params) == oracle.encode(wav, params)
