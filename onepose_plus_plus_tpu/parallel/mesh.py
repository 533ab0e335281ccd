"""Device mesh + sharding helpers — the single parallelism substrate.

The reference uses three distinct mechanisms (SURVEY.md §5): NCCL DDP for
training gradients (``configs/experiment/train.yaml:16-28``), a gloo
side-channel for metric gathers (``src/utils/comm.py:84-215``), and Ray
fractional-GPU workers for stage fan-out (``run.py:64-89`` etc.). On TPU all
three collapse into one mechanism: a ``jax.sharding.Mesh`` over ICI with
batch-sharded ``jit`` programs. Pairs/frames/objects are independent work
items, so the only collectives are the gradient psum XLA inserts for
data-parallel training and metric all-gathers.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None, axis: str = DATA_AXIS
) -> Mesh:
    """1-D data mesh over all local devices (or an explicit device list)."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = DATA_AXIS):
    """Device-put every array in a batch dict sharded on its leading axis.

    Leading dims must be divisible by the mesh size — the framework's fixed
    static shapes (SURVEY.md §5 long-context note) make this a data-loader
    invariant, not a runtime branch.
    """
    sh = batch_sharding(mesh, axis)
    rep = replicated_sharding(mesh)

    def put(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] % mesh.devices.size == 0 and x.shape[0] > 0:
            return jax.device_put(x, sh)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/opt state) across the mesh."""
    rep = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(jnp.asarray(x), rep), tree)


def device_prefetch(iterator, put, depth: int = 2):
    """Double-buffering: keep ``depth`` batches device_put ahead of the
    consumer so H2D transfer overlaps the previous step's compute (JAX
    dispatch is async). ``put`` maps a host batch to device arrays (e.g.
    ``lambda b: shard_batch(b, mesh)``)."""
    import collections

    buf = collections.deque()
    for item in iterator:
        buf.append(put(item))
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def all_gather_metrics(metrics: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Gather per-host metric arrays to every host (gloo-gather replacement).

    Single-process: identity. Multi-process (jax.distributed initialized):
    uses ``multihost_utils.process_allgather`` and concatenates along axis 0,
    matching the semantics of the reference's pickled-object gather
    (``comm.py:100-215`` + ``OnePosePlus_lightning_model.py:129-137``).
    """
    if jax.process_count() == 1:
        return metrics
    from jax.experimental import multihost_utils

    out = {}
    for k, v in metrics.items():
        gathered = multihost_utils.process_allgather(jnp.asarray(v), tiled=False)
        out[k] = np.asarray(gathered).reshape(-1, *np.asarray(v).shape[1:])
    return out
