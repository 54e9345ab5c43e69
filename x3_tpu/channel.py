"""Channel types — API parity with the reference's array-level surface.

The reference exposes `Channel` (materialized samples) and `IterChannel`
(lazy sample iterator) as the inputs to `encoder::encode`
(/root/reference/src/x3.rs:29-69, encoder.rs:51).  Here they are thin
wrappers over the batched pipelines: `Channel.encode()` one-shots the
stream; `IterChannel.encode_to()` pulls from any sample iterable with
bounded memory via the streaming encoder."""

from __future__ import annotations

import dataclasses
from typing import Iterable, Iterator

import numpy as np

from .params import Parameters


@dataclasses.dataclass
class Channel:
    """A materialized mono channel (x3.rs:29-45)."""

    id: int
    wav: np.ndarray  # int16 samples
    sample_rate: int
    params: Parameters = dataclasses.field(default_factory=Parameters)

    def encode(self, engine: str = "jax"):
        from .models.encoder import encode

        return encode(np.asarray(self.wav, dtype=np.int16), self.params, engine=engine, source_id=1)


@dataclasses.dataclass
class IterChannel:
    """A lazy mono channel over any sample iterable (x3.rs:47-69)."""

    id: int
    wav: Iterable
    sample_rate: int
    params: Parameters = dataclasses.field(default_factory=Parameters)

    def encode_to(self, out_file, engine: str = "jax", batch_frames: int = 256,
                  write_archive_header: bool = False):
        """Stream-encode the iterator into out_file with bounded memory.
        Returns the statistics array."""
        from .streaming import StreamEncoder

        it: Iterator = iter(self.wav)
        chunk_len = self.params.samples_per_frame
        with StreamEncoder(
            out_file, self.sample_rate, self.params, engine, batch_frames,
            write_archive_header=write_archive_header,
        ) as enc:
            buf = []
            for s in it:
                buf.append(s)
                if len(buf) >= chunk_len:
                    enc.write(np.asarray(buf, dtype=np.int16))
                    buf.clear()
            if buf:
                enc.write(np.asarray(buf, dtype=np.int16))
            return enc.close().stats


def encode(channels, writer, engine: str = "jax"):
    """Parity shim for encoder::encode(&mut [&mut IterChannel], writer)
    (encoder.rs:51-111): encodes a single channel's frame stream into a
    file-like `writer`.  More than one channel raises, like the reference."""
    from .errors import MoreThanOneChannel

    if len(channels) > 1:
        raise MoreThanOneChannel(f"{len(channels)} channels")
    ch = channels[0]
    if isinstance(ch, Channel):
        res = ch.encode(engine=engine)
        writer.write(res.data)
        return res.stats
    return ch.encode_to(writer, engine=engine)
