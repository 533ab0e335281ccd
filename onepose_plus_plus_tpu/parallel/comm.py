"""Cross-host communication for metrics and object gathering.

Replaces the reference's gloo side-channel (``src/utils/comm.py:84-215``:
pickled-tensor gather/all_gather over a dedicated gloo group, used to collect
validation metrics across DDP ranks) with the JAX-native equivalents:
``multihost_utils.process_allgather`` for arrays and a pickled-bytes
all-gather for arbitrary Python objects. Single-process (the common case on
one host) short-circuits without any collective.
"""
from __future__ import annotations

import pickle
from typing import Any, List

import jax
import numpy as np


def world_size() -> int:
    return jax.process_count()


def rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def all_gather_arrays(x) -> np.ndarray:
    """All-gather a (possibly per-host) array across processes: adds a leading
    process dimension. Single process returns x[None]."""
    if jax.process_count() == 1:
        return np.asarray(x)[None]
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x))


def all_gather_objects(obj: Any, max_bytes: int = 1 << 24) -> List[Any]:
    """All-gather arbitrary picklable objects (the reference gloo gather's
    job: per-rank metric dicts). Objects are pickled into a fixed-size uint8
    buffer (collectives need static shapes) and unpickled on every host."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    blob = pickle.dumps(obj)
    if len(blob) + 8 > max_bytes:
        raise ValueError(f"object too large to gather ({len(blob)} bytes)")
    buf = np.zeros(max_bytes, np.uint8)
    buf[:8] = np.frombuffer(
        np.int64(len(blob)).tobytes(), dtype=np.uint8
    )
    buf[8 : 8 + len(blob)] = np.frombuffer(blob, dtype=np.uint8)
    gathered = np.asarray(multihost_utils.process_allgather(buf))
    out = []
    for row in gathered:
        n = int(np.frombuffer(row[:8].tobytes(), dtype=np.int64)[0])
        out.append(pickle.loads(row[8 : 8 + n].tobytes()))
    return out


def gather_metrics(per_host_metrics: dict) -> List[dict]:
    """Collect every host's metric dict (reference validation-epoch gather)."""
    return all_gather_objects(per_host_metrics)
