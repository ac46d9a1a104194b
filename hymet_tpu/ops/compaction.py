"""Slot compaction by destination-map inversion (sort-free, gather-light).

The recurring TPU pattern in this codebase: a stream of N rows each owns
``occ[n] >= 0`` items, and the items must compact densely into a static
``[cap]`` buffer in row-major order — WITHOUT materializing the
``[N, max_occ]`` slot grid and without an O(N*max_occ) sort. The
destination of row ``n``'s item ``j`` is ``basex[n] + j`` where
``basex`` is the exclusive cumsum of ``occ``; inverting that map for an
output slot ``p`` is one branchless binary search for the last row with
``basex[n] <= p``. Empty rows collapse onto their successor's base, so
the "last <=" row is always the occupied row whose half-open interval
``[basex[n], basex[n] + occ[n])`` contains ``p``.

Used by the aligner's anchor-occurrence expansion
(``models/aligner.py::_collect_anchors``) and the screen's bottom-sketch
survivor compaction (``ops/sketch.py::_count_prefilter``). Sorts remain
the fallback primitive on the dev tunnel (see CLAUDE.md), so callers
keep a sort-based twin behind a flag where compile safety matters.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def searchsorted_right(
    arr: jax.Array, q: jax.Array, lo0=None, hi0=None, steps: int = 0
) -> jax.Array:
    """Branchless right-bisect: first index where ``arr[i] > q`` per
    query (== ``np.searchsorted(arr, q, "right")`` for sorted ``arr``).
    One fori_loop of ``ceil(log2(n+1))`` clamped-gather steps — the
    shared primitive behind every destination-map inversion and block
    decode in this codebase (the 64-bit limb searches in ops/sketch.py
    and models/aligner.py keep their own two-array variants). Optional
    per-query ``(lo0, hi0)`` bounds confine the search (callers must
    size ``steps`` to the largest bound width)."""
    n = arr.shape[0]
    if lo0 is None:
        steps = max(1, int(math.ceil(math.log2(n + 1))))
        lo0 = jnp.zeros(q.shape, jnp.int32)
        hi0 = jnp.full(q.shape, n, jnp.int32)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        # the lo < hi guard makes the converged state a fixed point:
        # without it, a surplus step gathers the CLAMPED arr[lo] and can
        # push lo past hi (observed as result n+1 for q >= max(arr) —
        # previously masked by callers' clips, exposed by the blocked
        # two-level variant)
        go_right = (arr[mid] <= q) & (lo < hi)
        return jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid)

    lo, _ = jax.lax.fori_loop(0, steps, body, (lo0, hi0))
    return lo


_BLOCK = 512  # hierarchical-bisect block width (see slot_compact_map)


def searchsorted_right_blocked(arr: jax.Array, q: jax.Array) -> jax.Array:
    """:func:`searchsorted_right` in two levels: bisect a [n/512]-entry
    block-boundary table first (gathers into a KB-scale array), then
    ~9 steps inside the block against the full array — ~2.5x fewer
    big-array gathers than the flat bisect for multi-million-row inputs.
    Identical results (the last-<= row's block is always the first block
    whose boundary value exceeds q, because arr is non-decreasing)."""
    n = arr.shape[0]
    if n <= 4 * _BLOCK:
        return searchsorted_right(arr, q)
    # block boundary b holds arr[min((b+1)*B, n) - 1]
    tail = arr[n - 1 : n] if n % _BLOCK else arr[:0]
    ends = jnp.concatenate([arr[_BLOCK - 1 :: _BLOCK], tail])
    b = searchsorted_right(ends, q)  # first block with end > q
    nb = ends.shape[0]
    lo0 = jnp.minimum(b, nb - 1) * _BLOCK
    hi0 = jnp.minimum(lo0 + _BLOCK, n)
    inner = max(1, int(math.ceil(math.log2(_BLOCK + 1))))
    r = searchsorted_right(arr, q, lo0, hi0, inner)
    # q beyond the last block's end: insertion point is n
    return jnp.where(b >= nb, n, r)


def slot_compact_map(
    occ: jax.Array, cap: int, method: str = "auto"
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Invert ``dst(n, j) = basex[n] + j`` for the first ``cap`` slots.

    Args:
      occ: ``[N]`` int32 kept-item counts per row (0 for dropped rows).
      cap: static output capacity.
      method: "bsearch" (one branchless binary search per output slot —
        ~cap*log2(N) clamped gathers), "scatter" (occupied rows scatter
        their row id at their base slot, then a cummax forward-fill —
        ~N scatter elements + one [cap] scan; the output slots are
        CONSECUTIVE integers, so the inverse map is a histogram
        boundary fill, no search needed), or "auto" (pick by the gather
        count: scatter wins when cap*log2(N) >> N — e.g. the aligner's
        anchor expansion where cap ~ N; bsearch wins when outputs are
        rare — e.g. the screen prefilter's ~0.1% survivors).

    Returns ``(n_i, basex, n_items)``: for each output slot ``p`` in
    ``[cap]``, its source row ``n_i[p]`` (int32, clipped; slot validity
    is positional: ``p < min(n_items, cap)`` — n_i for slots past the
    end is method-dependent and must be masked), the exclusive-cumsum
    base array ``basex [N]`` (``j_i = p - basex[n_i]``), and the total
    item count ``n_items`` (``> cap`` means overflow; callers must
    branch to an exact fallback or retry with a larger cap).
    """
    n = occ.shape[0]
    cbase = jnp.cumsum(occ)  # inclusive cumsum, [N]
    n_items = cbase[-1]
    basex = cbase - occ  # exclusive base: row n owns [basex, basex + occ)
    if method == "auto":
        steps = max(1, int(math.ceil(math.log2(n + 1))))
        method = "scatter" if cap * steps > 2 * n else "bsearch"
    if method == "scatter":
        # occupied rows have strictly increasing bases, so their marks are
        # unique; empty rows (and bases beyond cap) scatter out of bounds
        # and drop. cummax forward-fills each mark across its slot run.
        riota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
        dst = jnp.where(occ > 0, basex, cap)
        marks = jnp.full((cap,), -1, jnp.int32).at[dst].set(riota, mode="drop")
        n_i = jnp.clip(jax.lax.cummax(marks), 0, n - 1)
    else:
        piota = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).squeeze(-1)
        n_i = jnp.clip(searchsorted_right_blocked(basex, piota) - 1, 0, n - 1)
    return n_i, basex, n_items


def slot_fill_mono(mono: jax.Array, basex: jax.Array, occupied: jax.Array,
                   cap: int) -> jax.Array:
    """Boundary-fill a NON-DECREASING per-row uint32 value over the
    slot-compaction output without any [cap]-scale gather: occupied rows
    scatter their value at their base slot (1D scalar scatter — 2D row
    scatters stall XLA:TPU compiles, CLAUDE.md) and ``cummax`` forward-
    fills each value across its slot run. Exact for every slot
    ``p < n_items`` because the first occupied row's base is 0; slots
    past the end repeat the last value (callers mask positionally).

    This is the same scatter+cummax used by :func:`slot_compact_map`'s
    "scatter" method, applied to the VALUE instead of the row id — one
    fewer [cap]-row gather when the caller only needed the value."""
    dst = jnp.where(occupied, basex, cap)
    marks = (
        jnp.zeros((cap,), jnp.uint32).at[dst].set(mono, mode="drop")
    )
    return jax.lax.cummax(marks)


def slot_fill_delta(vals: jax.Array, basex: jax.Array, occupied: jax.Array,
                    cap: int) -> jax.Array:
    """Boundary-fill an ARBITRARY per-row int32 value over the
    slot-compaction output without any [cap]-scale gather: scatter each
    occupied row's wrap-delta vs the previous occupied row's value at
    its base slot, then one exact int32 ``cumsum`` reconstructs the fill
    (two's-complement wraparound makes the delta/sum pair exact mod
    2^32, so any bitcast 32-bit field round-trips). The previous
    occupied value comes from a forward-fill associative scan over the
    [N] rows (sequential access — no [N]-scale random gather)."""

    def comb(a, b):
        am, av = a
        bm, bv = b
        return am | bm, jnp.where(bm, bv, av)

    m, v = jax.lax.associative_scan(comb, (occupied, vals))
    prev = jnp.concatenate([jnp.zeros((1,), vals.dtype), v[:-1]])
    prev_m = jnp.concatenate([jnp.zeros((1,), bool), m[:-1]])
    delta = jnp.where(occupied, vals - jnp.where(prev_m, prev, 0), 0)
    dst = jnp.where(occupied, basex, cap)
    col = jnp.zeros((cap,), jnp.int32).at[dst].set(delta, mode="drop")
    return jnp.cumsum(col)


def slot_compact_indices(
    occ: jax.Array, cap: int, method: str = "auto"
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """:func:`slot_compact_map` + the within-row item ``j_i = p -
    basex[n_i]`` (one extra [cap] gather). Valid-slot results are
    identical across methods; slots past ``n_items`` are masked by the
    caller (positional validity)."""
    n_i, basex, n_items = slot_compact_map(occ, cap, method)
    piota = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).squeeze(-1)
    j_i = piota - basex[n_i]
    return n_i, j_i, n_items
