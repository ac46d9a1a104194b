"""Device mesh construction."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    data: Optional[int] = None, db: Optional[int] = None, devices=None
) -> Mesh:
    """2D ("data", "db") mesh over the available devices.

    Defaults: put everything on "db" (reference sharding is the usual
    memory constraint) unless data is given. data * db must equal the
    device count used.
    """
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if data is None and db is None:
        data, db = 1, n
    elif data is None:
        data = n // db
    elif db is None:
        db = n // data
    if data * db != n:
        raise ValueError(f"mesh {data}x{db} != {n} devices")
    arr = np.array(devs).reshape(data, db)
    return Mesh(arr, axis_names=("data", "db"))


def fetch_global(x) -> np.ndarray:
    """Host copy of a possibly multi-process global array.

    Single-process (including multi-device): a plain device_get. With
    ``jax.distributed`` initialized (process_count > 1) a direct fetch of
    a globally-sharded array raises; gather the full value on every
    process instead (the final LCA/TSV emission happens on process 0, but
    every process must participate in the collective).
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def fetch_global_tree(xs):
    """fetch_global over a pytree in ONE host round trip (per-array
    fetches each pay full link latency on remote devices)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        out = multihost_utils.process_allgather(xs, tiled=True)
        return jax.tree.map(np.asarray, out)
    return jax.device_get(xs)
