"""Device mesh and sharding helpers.

The reference is single-GPU with no collectives (SURVEY §2.2). Here the mesh
is first-class: training shards the batch axis (data parallelism — gradient
psum inserted by GSPMD), evaluation shards TTA views / datasets, and movie
reduction shards the time axis (ops.summary.movie_summary_sharded).

One 1-D ``data`` axis covers this model family (UNet2DS ≈ 8M params —
replicate params, shard activations). The helpers below keep every caller on
the same idioms: NamedSharding over a cached mesh.
"""

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["get_mesh", "batch_sharding", "replicated", "shard_batch", "P"]


def get_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """A 1-D mesh over the first ``n_devices`` devices (default: all).

    Cached per (device set, n, axis): keying on the LIVE device tuple
    (not first-call state) means a mesh built before
    ``jax.distributed.initialize`` widens automatically on the next call
    after init instead of staying stale forever."""
    return _mesh_for(tuple(jax.devices()), n_devices, axis)


@functools.lru_cache(maxsize=None)
def _mesh_for(devs: tuple, n_devices: int | None, axis: str) -> Mesh:
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard dim 0 over the mesh axis, replicate the rest; rank-0 leaves
    (scalar fields in a batch pytree) replicate — P(axis) on a scalar is a
    rank error."""
    if ndim == 0:
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Device-put a host batch (pytree of arrays) sharded along dim 0."""
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x), axis)), batch
    )


def pad_batch_to(batch_np, multiple: int):
    """Zero-pad dim 0 to a multiple (so B divides the mesh); returns
    (padded, true_size)."""
    b = batch_np.shape[0]
    pad = (-b) % multiple
    if pad == 0:
        return batch_np, b
    widths = [(0, pad)] + [(0, 0)] * (batch_np.ndim - 1)
    return np.pad(batch_np, widths), b
