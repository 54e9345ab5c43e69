"""Bounded background file writer.

The file converters' output writes are a large share of wall time (the WAV
write is ~40% of native-engine `x3a_to_wav` on the 1-core sandbox), and
`write(2)`, the native codec (ctypes) and the jax device calls all release
the GIL — so a depth-bounded writer thread overlaps file I/O with compute
wherever a spare core exists or the disk genuinely blocks (writeback
throttle past the dirty-page limit).  Honest measurement: on THIS sandbox
(1 CPU core, output landing in page cache at kernel-copy speed, i.e. pure
CPU) the alternating A/B is a wash — the win needs a second core or a
blocking disk, both the common case outside the sandbox.

The reference's file layers write synchronously (decodefile.rs:200-227,
encodefile.rs:49-77); this is a pure-throughput addition with identical
output bytes and error semantics (a failed write raises at the next
write()/drain()/close(), before the converter returns success).
"""

from __future__ import annotations

import os
import queue
import threading
import time


def open_overwrite(path):
    """Open `path` for writing WITHOUT O_TRUNC.

    Truncating an existing multi-MB output at open() releases its blocks
    synchronously — measured 19-60 ms for a 96 MB file on this filesystem,
    ~17% of a whole native-engine `x3a_to_wav` call when the output is being
    overwritten.  Instead the file is opened in place and the caller
    truncates to the final length right before closing (free when the size
    is unchanged, cheap otherwise).  Until that truncate, a shorter rewrite
    leaves stale bytes past the new end — callers must truncate on the
    success path; a conversion that raises leaves partial output either
    way."""
    fd = os.open(str(path), os.O_WRONLY | os.O_CREAT, 0o666)
    return os.fdopen(fd, "wb")


class AsyncWriter:
    """Write blocks to a file object from a background thread, in order.

    Single-producer: the converters call write() from one thread.  Memory
    stays bounded by `depth` pending blocks (the file paths enqueue one
    batch's bytes per call, so the bound is depth x batch bytes).  The
    writer thread's exception is re-raised on the next write()/drain()/
    close(); close() drains but does NOT close the underlying file (the
    owner may still need to patch headers, e.g. WAV sizes)."""

    def __init__(self, f, depth: int = 2):
        self._f = f
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._exc: BaseException | None = None
        self._closed = False
        self._t = threading.Thread(target=self._run, daemon=True)
        self._t.start()

    def _run(self) -> None:
        while True:
            blk = self._q.get()
            try:
                # A write error poisons the writer: later blocks are
                # swallowed (resuming after a dropped block would corrupt
                # the stream) and every later producer call re-raises.
                if blk is not None and self._exc is None:
                    self._f.write(blk)
            except BaseException as e:  # re-raised on the producer thread
                self._exc = e
            finally:
                self._q.task_done()
            if blk is None:
                return

    def _check(self) -> None:
        if self._exc is not None:
            raise self._exc

    def write(self, data) -> None:
        self._check()
        self._q.put(data)

    def drain(self) -> None:
        """Block until every queued block has been written; re-raise errors."""
        self._q.join()
        self._check()

    def close(self) -> None:
        """Drain, stop the thread, and re-raise any pending write error."""
        if not self._closed:
            self._closed = True
            self._q.put(None)
            self._t.join()
        self._check()


def prefetch_iter(src, depth: int = 2):
    """Yield `src`'s items with up to `depth` of them read ahead on a
    background thread — the input-side mirror of AsyncWriter: file reads
    (`read(2)`, wave.readframes) release the GIL, so the NEXT chunk's read
    overlaps the current chunk's encode/decode wherever a spare core exists
    or the disk genuinely blocks.  On this 1-core page-cache sandbox it is a
    measured wash, like the writer (see module docstring).

    Order is preserved; a source exception re-raises at the consuming
    point, after every item read before it.  Abandoning the generator stops
    the thread promptly (reads are file-bound, so the producer notices the
    stop flag at its next item)."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def run() -> None:
        try:
            for item in src:
                while not stop.is_set():
                    try:
                        q.put((False, item), timeout=0.05)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
            q.put((None, None))
        except BaseException as e:  # re-raised on the consumer thread
            if not stop.is_set():
                q.put((True, e))

    t = threading.Thread(target=run, daemon=True)
    t.start()
    try:
        while True:
            kind, val = q.get()
            if kind is None:
                return
            if kind:
                raise val
            yield val
    finally:
        stop.set()
        # Unblock a producer waiting on a full queue; reads are finite and
        # file-bound, so bound the cleanup instead of risking a hang on a
        # pathological source (the thread is a daemon either way).
        deadline = time.monotonic() + 1.0
        while t.is_alive() and time.monotonic() < deadline:
            try:
                q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=0.02)
