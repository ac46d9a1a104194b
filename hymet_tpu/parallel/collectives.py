"""Collective helpers over the ("data", "db") mesh."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map


def sharded_topk(mesh, scores, k: int):
    """Global top-k over db-sharded per-reference scores.

    scores: [R_total] sharded over "db" (row-block). Each shard computes a
    local top-k, all-gathers the (value, index) candidates over ICI, and
    reduces to the global top-k — the merge pattern for sharded-screen
    candidate selection (SURVEY.md §2.6 "per-shard top-k then global
    merge").

    Returns (values [k], indices [k]) replicated.
    """
    n_db = mesh.shape["db"]
    R = scores.shape[0]
    shard = R // n_db

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("db"),),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def step(local):
        local = local.reshape(-1)
        kk = min(k, local.shape[0])
        vals, idx = jax.lax.top_k(local, kk)
        base = jax.lax.axis_index("db") * shard
        idx = idx + base
        all_vals = jax.lax.all_gather(vals, "db").reshape(-1)
        all_idx = jax.lax.all_gather(idx, "db").reshape(-1)
        g_vals, g_pos = jax.lax.top_k(all_vals, min(k, all_vals.shape[0]))
        return g_vals, all_idx[g_pos]

    return step(scores)
