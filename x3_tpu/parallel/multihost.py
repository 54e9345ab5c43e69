"""Multi-host input pipeline: shard file worklists across hosts.

The codec itself is collective-free (frames are self-contained — SURVEY.md
§5 "distributed communication backend"), so the multi-host story is purely
an input-pipeline concern: each host takes a deterministic shard of the file
list, converts it with its own per-host mesh over its local devices, and
never talks to other hosts — no DCN traffic at all.  This mirrors how a
jax.distributed job would run the codec as a data-loading stage: call
`jax.distributed.initialize()` once, then `shard_worklist(paths)` on every
host and feed the shard to `multifile.wav_to_x3a_batch(..., mesh=local_mesh)`.
"""

from __future__ import annotations


def shard_worklist(items, process_index: int | None = None, process_count: int | None = None):
    """Deterministic per-host shard of a worklist: host i takes items[i::n].

    Defaults to jax.process_index()/process_count() (1 host outside a
    jax.distributed job, so the default is the identity).  Strided sharding
    balances file sizes better than contiguous chunks when lists are sorted.
    """
    if process_index is None or process_count is None:
        import jax

        process_index = jax.process_index() if process_index is None else process_index
        process_count = jax.process_count() if process_count is None else process_count
    if not 0 <= process_index < process_count:
        raise ValueError(f"process_index {process_index} not in [0, {process_count})")
    return list(items)[process_index::process_count]


def local_mesh(axis_name: str = "frames"):
    """A mesh over this host's local devices only (per-host data
    parallelism; no cross-host axes since the codec needs no collectives)."""
    import jax

    from .mesh import make_mesh

    return make_mesh(jax.local_devices(), axis_name)
