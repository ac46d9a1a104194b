"""Vectorized weighted rank-consensus LCA.

Replaces the reference's per-query Python loop
(``scripts/classification_cami.py:251-308``) with one batched JAX
computation over [Q, H] hit tensors:

For each query and each of the 8 ranks (top-down):
  - accumulate hit weights per taxon *name* at that rank,
  - pick the argmax-weight name (ties: first-seen hit order, reproducing
    Python's dict-insertion-order ``max``),
  - rank confidence = best_weight / total named weight at that rank,
  - stop at the first rank with no named weight ("break" semantics),
  - final confidence = product of rank confidences (clamped to 1.0).

The per-name accumulation is expressed as a batched [Q,H,H] equality matmul
(VPU compare + MXU matvec) rather than hash maps — O(H^2) per query, which
for bucketed H (<=512) is far cheaper on TPU than any scatter approach and
keeps everything statically shaped for XLA.

A bit-exact host oracle (:func:`weighted_lca_host`) implements the exact
reference float semantics (left-fold f64 sums in dict-insertion order) and
is used for golden/parity tests and the optional ``--parity`` output mode.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hymet_tpu import RANKS

NUM_RANKS = len(RANKS)


@functools.partial(jax.jit, static_argnames=("dtype",))
def weighted_lca(
    hit_rows: jax.Array,  # [Q, H] int32: row in rank_table per hit (-1 = pad)
    hit_weights: jax.Array,  # [Q, H] float: coverage * ref_abundance
    rank_table: jax.Array,  # [T, NUM_RANKS] int32 name ids (0 = no name)
    dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched weighted LCA.

    Returns:
      chosen_names: [Q, NUM_RANKS] int32 — name id per chosen rank (0 beyond
        the consensus depth),
      n_chosen: [Q] int32 — number of chosen ranks (0 => Unknown/root),
      confidence: [Q] — product of per-rank confidences, clamped to 1.0
        (0.0 where nothing was chosen).
    """
    w = hit_weights.astype(dtype)
    valid = hit_rows >= 0
    rows = jnp.where(valid, hit_rows, 0)

    def per_rank(carry, r):
        active, conf = carry
        names = jnp.where(valid, rank_table[rows, r], 0)  # [Q, H]
        named = names != 0
        wn = jnp.where(named, w, 0.0)
        denom = jnp.sum(wn, axis=1)  # [Q]
        # wsum[q, i] = sum_j w[q, j] * [names[q, j] == names[q, i] != 0]
        eq = (names[:, :, None] == names[:, None, :]) & named[:, None, :]
        wsum = jnp.einsum(
            "qij,qj->qi", eq.astype(dtype), wn, preferred_element_type=dtype
        )
        wsum = jnp.where(named, wsum, -jnp.inf)
        best = jnp.argmax(wsum, axis=1)  # first max => first-seen tie-break
        q_iota = jnp.arange(names.shape[0])
        best_name = names[q_iota, best]
        best_w = wsum[q_iota, best]
        has = denom > 0
        conf_r = jnp.where(has, best_w / jnp.where(has, denom, 1.0), 1.0)
        chosen = active & has
        out_name = jnp.where(chosen, best_name, 0)
        conf = jnp.where(chosen, conf * conf_r, conf)
        active = active & has
        return (active, conf), (out_name, chosen)

    q = hit_rows.shape[0]
    init = (jnp.ones(q, dtype=bool), jnp.ones(q, dtype=dtype))
    (_, conf), (names_t, chosen_t) = jax.lax.scan(
        per_rank, init, jnp.arange(NUM_RANKS)
    )
    chosen_names = names_t.T  # [Q, NUM_RANKS]
    n_chosen = jnp.sum(chosen_t.astype(jnp.int32), axis=0)
    confidence = jnp.where(n_chosen > 0, jnp.minimum(conf, 1.0), 0.0)
    return chosen_names, n_chosen, confidence


# ----------------------------------------------------------------------
# host oracle: exact reference float semantics


def weighted_lca_host(
    taxid_weights: Dict[str, float],
    hier: Dict[str, Sequence[str]],
) -> Tuple[str, str, float]:
    """Reference-exact weighted LCA for one query.

    Semantics of ``classification_cami.py:251-288``: iterate ranks top-down;
    per rank accumulate weights per name over taxids in dict-insertion
    order; Python ``max`` tie-break (first-seen); confidence product;
    break at the first nameless rank.
    """
    total_w = sum(taxid_weights.values())
    if total_w <= 0:
        return "Unknown", "root", 0.0

    chosen: List[str] = []
    conf_product = 1.0
    for r_idx in range(NUM_RANKS):
        name_w: Dict[str, float] = {}
        denom = 0.0
        for tid, wgt in taxid_weights.items():
            names = hier.get(tid)
            if not names:
                continue
            nm = names[r_idx] if r_idx < len(names) else ""
            if nm:
                name_w[nm] = name_w.get(nm, 0.0) + wgt
                denom += wgt
        if denom <= 0 or not name_w:
            break
        best_name, best_w = max(name_w.items(), key=lambda kv: kv[1])
        conf_product *= best_w / denom
        chosen.append(best_name)

    if not chosen:
        return "Unknown", "root", 0.0
    lineage = "; ".join(f"{RANKS[i]}:{nm}" for i, nm in enumerate(chosen))
    return lineage, RANKS[len(chosen) - 1], min(conf_product, 1.0)


# ----------------------------------------------------------------------
# batching helpers


# Largest hit-list a query may carry into :func:`bucket_pad`. The aligner
# emits at most ``max_secondary + 1`` records per query (aligner.py), so
# pipeline construction asserts that cap against this ceiling — a config
# raising max_secondary past it must fail loudly, not silently drop
# weights (round-4 review, weak #6).
DEFAULT_BUCKETS: Tuple[int, ...] = (8, 32, 128, 512, 2048)
LCA_MAX_BUCKET: int = DEFAULT_BUCKETS[-1]


def bucket_pad(
    entries_per_query: Sequence[Sequence[Tuple[int, float]]],
    buckets: Sequence[int] = DEFAULT_BUCKETS,
) -> List[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Group ragged per-query (row, weight) hit lists into padded buckets.

    Returns a list of (query_indices, hit_rows [q, H], hit_weights [q, H])
    per non-empty bucket. A query whose hit count exceeds the largest
    bucket raises ``ValueError`` — truncation would silently drop LCA
    weights; size the largest bucket above the aligner's per-query hit
    cap instead (``AlignerConfig.max_secondary + 1``).
    """
    out = []
    maxb = buckets[-1]
    assignments: Dict[int, List[int]] = {b: [] for b in buckets}
    for qi, entries in enumerate(entries_per_query):
        n = len(entries)
        if n > maxb:
            raise ValueError(
                f"query {qi} carries {n} LCA entries > largest bucket "
                f"{maxb}; raise the bucket ceiling (weights must never be "
                f"silently dropped)"
            )
        b = next((b for b in buckets if n <= b), maxb)
        assignments[b].append(qi)
    for b, qidx in assignments.items():
        if not qidx:
            continue
        # pad the query dimension to a power of two as well: one compile
        # per (Q-bucket, H-bucket) pair instead of per exact batch size.
        # Large-H buckets cap Q so the [Q, H, H] equality tensor stays
        # within a ~256 MB budget (callers loop over Q slices).
        q_pad = 1 << max(3, int(np.ceil(np.log2(len(qidx)))))
        q_cap = max(8, (1 << 26) // max(b * b, 1))
        q_pad = min(q_pad, 1 << int(np.ceil(np.log2(q_cap))))
        for base in range(0, len(qidx), q_pad):
            part = qidx[base : base + q_pad]
            rows = np.full((q_pad, b), -1, dtype=np.int32)
            weights = np.zeros((q_pad, b), dtype=np.float64)
            for i, qi in enumerate(part):
                entries = entries_per_query[qi][:b]
                for j, (row, wgt) in enumerate(entries):
                    rows[i, j] = row
                    weights[i, j] = wgt
            out.append((np.asarray(part, dtype=np.int64), rows, weights))
    return out
