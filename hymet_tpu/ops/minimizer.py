"""Minimizer extraction (minimap2-style) as device kernels.

Replaces the seeding stage of ``minimap2 -x asm10`` (reference
``scripts/minimap2.sh:23``; asm10 preset => k=19, w=19). Downstream only
consumes per-(query, target) block extents (PAF col 11 -> coverage,
``classification_cami.py:196-206``), so the engine reproduces minimap2's
*seed-chain geometry*, not its exact minimizer set: we use minimap2's
invertible hash64 mixer over 2-bit-packed canonical k-mers (so minimizer
density and spread match), leftmost-min winnowing, and diagonal-band
chaining (see :mod:`hymet_tpu.models.aligner`).

All 2k-bit quantities are (hi, lo) uint32 limb pairs on device (TPU has no
64-bit ints); numpy uint64 twins exist for host-side index builds.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hymet_tpu.ops.hashing import packed_canonical_kmers_jax as _packed_kmers_jax


# ----------------------------------------------------------------------
# minimap2's hash64 mixer (invertible), numpy uint64


def hash64_numpy(key: np.ndarray, bits: int) -> np.ndarray:
    mask = np.uint64((1 << bits) - 1)
    key = key.astype(np.uint64)
    with np.errstate(over="ignore"):
        key = (~key + (key << np.uint64(21))) & mask
        key = key ^ (key >> np.uint64(24))
        key = (key + (key << np.uint64(3)) + (key << np.uint64(8))) & mask
        key = key ^ (key >> np.uint64(14))
        key = (key + (key << np.uint64(2)) + (key << np.uint64(4))) & mask
        key = key ^ (key >> np.uint64(28))
        key = (key + (key << np.uint64(31))) & mask
    return key


# ----------------------------------------------------------------------
# limb helpers under a bit mask (bits <= 64); hi limb masked after each op


def _mask_hi(bits: int) -> np.uint32:
    # np.uint32-typed so jit argument parsing never sees a >int32 Python
    # int (x64-off overflow)
    return np.uint32((1 << max(bits - 32, 0)) - 1 if bits < 64 else 0xFFFFFFFF)


def _mask_lo(bits: int) -> np.uint32:
    # for bits < 32 the LOW limb carries the mask boundary
    return np.uint32((1 << min(bits, 32)) - 1 if bits < 32 else 0xFFFFFFFF)


def _madd(hi, lo, b_hi, b_lo, bits: int):
    s_lo = lo + b_lo
    carry = (s_lo < lo).astype(jnp.uint32)
    s_hi = (hi + b_hi + carry) & _mask_hi(bits)
    return s_hi, s_lo & _mask_lo(bits)


def _mshl(hi, lo, r: int, bits: int):
    if r == 0:
        return hi & _mask_hi(bits), lo & _mask_lo(bits)
    if r < 32:
        n_hi = ((hi << r) | (lo >> (32 - r))) & _mask_hi(bits)
        return n_hi, (lo << r) & _mask_lo(bits)
    n_hi = ((lo << (r - 32)) if r > 32 else lo) & _mask_hi(bits)
    return n_hi, jnp.zeros_like(lo)


def _mshr(hi, lo, r: int):
    if r == 0:
        return hi, lo
    if r < 32:
        return hi >> r, (lo >> r) | (hi << (32 - r))
    if r == 32:
        return jnp.zeros_like(hi), hi
    return jnp.zeros_like(hi), hi >> (r - 32)


def hash64_jax(hi, lo, bits: int):
    """minimap2 hash64 on (hi, lo) uint32 limb pairs under a `bits` mask."""
    mh = _mask_hi(bits)
    # ~key + (key << 21)
    n_hi, n_lo = (~hi) & mh, (~lo) & _mask_lo(bits)
    s_hi, s_lo = _mshl(hi, lo, 21, bits)
    hi, lo = _madd(n_hi, n_lo, s_hi, s_lo, bits)
    # key ^= key >> 24
    s_hi, s_lo = _mshr(hi, lo, 24)
    hi, lo = hi ^ s_hi, lo ^ s_lo
    # key = key + (key<<3) + (key<<8)
    a_hi, a_lo = _mshl(hi, lo, 3, bits)
    b_hi, b_lo = _mshl(hi, lo, 8, bits)
    hi, lo = _madd(hi, lo, a_hi, a_lo, bits)
    hi, lo = _madd(hi, lo, b_hi, b_lo, bits)
    # key ^= key >> 14
    s_hi, s_lo = _mshr(hi, lo, 14)
    hi, lo = hi ^ s_hi, lo ^ s_lo
    # key = key + (key<<2) + (key<<4)
    a_hi, a_lo = _mshl(hi, lo, 2, bits)
    b_hi, b_lo = _mshl(hi, lo, 4, bits)
    hi, lo = _madd(hi, lo, a_hi, a_lo, bits)
    hi, lo = _madd(hi, lo, b_hi, b_lo, bits)
    # key ^= key >> 28
    s_hi, s_lo = _mshr(hi, lo, 28)
    hi, lo = hi ^ s_hi, lo ^ s_lo
    # key = key + (key<<31)
    s_hi, s_lo = _mshl(hi, lo, 31, bits)
    hi, lo = _madd(hi, lo, s_hi, s_lo, bits)
    return hi & mh, lo & _mask_lo(bits)


# ----------------------------------------------------------------------
# packed canonical k-mers + strand (shared by device and host paths)


def _packed_kmers_numpy(codes: np.ndarray, k: int):
    L = codes.shape[0]
    n = L - k + 1
    if n <= 0:
        z = np.zeros(0, dtype=np.uint64)
        return z, np.zeros(0, dtype=bool), np.zeros(0, dtype=np.int8)
    inv = (codes >= 4).astype(np.int32)
    csum = np.concatenate([[0], np.cumsum(inv)])
    valid = (csum[k:] - csum[:-k]) == 0
    fwd = np.zeros(n, dtype=np.uint64)
    rc = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        c = (codes[j : j + n] & 3).astype(np.uint64)
        fwd |= c << np.uint64(2 * (k - 1 - j))
        rc |= (np.uint64(3) - c) << np.uint64(2 * j)
    strand = (fwd > rc).astype(np.int8)
    canon = np.minimum(fwd, rc)
    return canon, valid, strand


# ----------------------------------------------------------------------
# winnowing


_BAD = 0xFFFFFFFF  # sentinel limb value for invalid windows


import functools


@functools.partial(jax.jit, static_argnames=("w",))
def _window_min_pairs_unrolled(h_hi, h_lo, idx, w: int):
    """Reference O(n*w) sliding-window min of ((hi, lo), idx) triples,
    lexicographic on (hi, lo) with leftmost-min tie-break (idx carried).
    Kept as the oracle for the van Herk path."""
    m_hi, m_lo, m_idx = h_hi, h_lo, idx
    for s in range(1, w):
        s_hi = h_hi[:, s:]
        s_lo = h_lo[:, s:]
        s_idx = idx[:, s:]
        c_hi = m_hi[:, : s_hi.shape[1]]
        c_lo = m_lo[:, : s_hi.shape[1]]
        c_idx = m_idx[:, : s_hi.shape[1]]
        less = (s_hi < c_hi) | ((s_hi == c_hi) & (s_lo < c_lo))
        m_hi = jnp.where(less, s_hi, c_hi)
        m_lo = jnp.where(less, s_lo, c_lo)
        m_idx = jnp.where(less, s_idx, c_idx)
    return m_hi, m_lo, m_idx


@functools.partial(jax.jit, static_argnames=("w",))
def _window_min_pairs(h_hi, h_lo, idx, w: int):
    """Sliding-window min of ((hi, lo), idx) triples via the van Herk /
    Gil-Werman block prefix/suffix decomposition: ~2n compare passes
    instead of the naive n*w (9.5x less VPU work at the asm10 w=19).
    Leftmost-min tie-break: window [i, i+w) = combine(suffix-min of the
    left block segment, prefix-min of the right segment), preferring the
    left operand on ties (matches :func:`_window_min_pairs_unrolled`
    bit-for-bit — see test_minimizer_window_vanherk_oracle)."""
    if w == 1:
        return h_hi, h_lo, idx
    B, n = h_hi.shape
    nw = n - w + 1
    bad = jnp.uint32(_BAD)
    pad = (-n) % w
    if pad:
        fill = jnp.full((B, pad), bad, dtype=jnp.uint32)
        h_hi = jnp.concatenate([h_hi, fill], axis=1)
        h_lo = jnp.concatenate([h_lo, fill], axis=1)
        idx = jnp.concatenate(
            [idx, jnp.zeros((B, pad), dtype=idx.dtype)], axis=1
        )
    npad = n + pad
    nb = npad // w
    rh = h_hi.reshape(B, nb, w)
    rl = h_lo.reshape(B, nb, w)
    ri = idx.reshape(B, nb, w)

    def less(a_hi, a_lo, b_hi, b_lo):
        return (a_hi < b_hi) | ((a_hi == b_hi) & (a_lo < b_lo))

    # prefix mins within each block (left-to-right; keep earlier on ties)
    ph, pl, pi = [rh[:, :, 0]], [rl[:, :, 0]], [ri[:, :, 0]]
    for j in range(1, w):
        c_h, c_l, c_i = rh[:, :, j], rl[:, :, j], ri[:, :, j]
        take_cur = less(c_h, c_l, ph[-1], pl[-1])  # strict: ties keep left
        ph.append(jnp.where(take_cur, c_h, ph[-1]))
        pl.append(jnp.where(take_cur, c_l, pl[-1]))
        pi.append(jnp.where(take_cur, c_i, pi[-1]))
    P_h = jnp.stack(ph, axis=2).reshape(B, npad)
    P_l = jnp.stack(pl, axis=2).reshape(B, npad)
    P_i = jnp.stack(pi, axis=2).reshape(B, npad)

    # suffix mins within each block (right-to-left; current element is the
    # leftmost of the segment, so it wins ties)
    sh, sl, si = [rh[:, :, w - 1]], [rl[:, :, w - 1]], [ri[:, :, w - 1]]
    for j in range(w - 2, -1, -1):
        c_h, c_l, c_i = rh[:, :, j], rl[:, :, j], ri[:, :, j]
        keep_acc = less(sh[-1], sl[-1], c_h, c_l)  # strict: ties take cur
        sh.append(jnp.where(keep_acc, sh[-1], c_h))
        sl.append(jnp.where(keep_acc, sl[-1], c_l))
        si.append(jnp.where(keep_acc, si[-1], c_i))
    S_h = jnp.stack(sh[::-1], axis=2).reshape(B, npad)
    S_l = jnp.stack(sl[::-1], axis=2).reshape(B, npad)
    S_i = jnp.stack(si[::-1], axis=2).reshape(B, npad)

    # window i = [i, i+w): suffix part covers the left segment, prefix
    # part the right — prefer the suffix (left) side on ties
    l_h, l_l, l_i = S_h[:, :nw], S_l[:, :nw], S_i[:, :nw]
    r_h, r_l, r_i = P_h[:, w - 1 : w - 1 + nw], P_l[:, w - 1 : w - 1 + nw], P_i[:, w - 1 : w - 1 + nw]
    take_r = less(r_h, r_l, l_h, l_l)
    return (
        jnp.where(take_r, r_h, l_h),
        jnp.where(take_r, r_l, l_l),
        jnp.where(take_r, r_i, l_i),
    )


def extract_minimizers_jax(
    codes, k: int, w: int
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Minimizers of a [B, L] code batch.

    Returns (hash_hi, hash_lo, pos, strand, keep) each [B, L-k-w+2]:
    per window, the minimal hashed k-mer; `keep` marks windows that
    introduce a new minimizer position (dedup of consecutive windows
    sharing their min) and whose k-mer is valid.
    """
    bits = 2 * k
    c_hi, c_lo, valid, strand = _packed_kmers_jax(codes, k)
    h_hi, h_lo = hash64_jax(c_hi, c_lo, bits)
    # invalid k-mers get the max hash so they never win a window
    h_hi = jnp.where(valid, h_hi, jnp.uint32(_BAD))
    h_lo = jnp.where(valid, h_lo, jnp.uint32(_BAD))
    B, n = h_hi.shape
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (B, n))
    m_hi, m_lo, m_idx = _window_min_pairs(h_hi, h_lo, idx, w)
    nw = m_hi.shape[1]
    # dedup: a window keeps its minimizer only if the previous window chose
    # a different position
    prev_idx = jnp.concatenate(
        [jnp.full((B, 1), -1, dtype=jnp.int32), m_idx[:, :-1]], axis=1
    )
    new_pos = m_idx != prev_idx
    bad = jnp.uint32(_BAD)  # typed: a bare python int overflows int32 when x64 is off
    not_bad = ~((m_hi == bad) & (m_lo == bad))
    keep = new_pos & not_bad
    m_strand = jnp.take_along_axis(strand, m_idx, axis=1)
    return m_hi, m_lo, m_idx, m_strand, keep


def _sliding_argmin(h: np.ndarray, w: int) -> np.ndarray:
    """Leftmost argmin over every length-w window of `h`, via the van
    Herk/Gil-Werman block prefix/suffix min decomposition: O(n) with ~4w
    vectorized passes (vs O(n*w) for a strided argmin)."""
    n = h.shape[0]
    nw = n - w + 1
    pad = (-n) % w
    maxv = np.uint64(0xFFFFFFFFFFFFFFFF)
    hp = np.concatenate([h, np.full(pad, maxv, dtype=np.uint64)]) if pad else h
    # transpose to [w, nblocks] so each scan step is a contiguous row op
    m = np.ascontiguousarray(hp.reshape(-1, w).T)
    idx = np.ascontiguousarray(
        np.arange(hp.shape[0], dtype=np.int64).reshape(-1, w).T
    )

    # prefix scan (left->right), strict < keeps the earlier index on ties
    pv = m.copy()
    pi = idx.copy()
    for j in range(1, w):
        upd = m[j] < pv[j - 1]
        pv[j] = np.where(upd, m[j], pv[j - 1])
        pi[j] = np.where(upd, idx[j], pi[j - 1])
    # suffix scan (right->left), <= prefers the left index
    sv = m.copy()
    si = idx.copy()
    for j in range(w - 2, -1, -1):
        upd = m[j] <= sv[j + 1]
        sv[j] = np.where(upd, m[j], sv[j + 1])
        si[j] = np.where(upd, idx[j], si[j + 1])

    sv_f = sv.T.ravel()
    si_f = si.T.ravel()
    pv_f = pv.T.ravel()
    pi_f = pi.T.ravel()
    # window [i, i+w-1] = suffix-of-block(i) ∪ prefix-of-block(i+w-1)
    end = np.arange(nw, dtype=np.int64) + w - 1
    a_val, a_idx = sv_f[:nw], si_f[:nw]
    b_val, b_idx = pv_f[end], pi_f[end]
    take_a = (a_val < b_val) | ((a_val == b_val) & (a_idx <= b_idx))
    return np.where(take_a, a_idx, b_idx).astype(np.int32)


def extract_minimizers_numpy(
    codes: np.ndarray, k: int, w: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host twin of :func:`extract_minimizers_jax` for index builds.
    Returns (hashes uint64, positions int32, strands int8) — deduped."""
    bits = 2 * k
    canon, valid, strand = _packed_kmers_numpy(codes, k)
    n = canon.shape[0]
    if n < w:
        return (
            np.zeros(0, dtype=np.uint64),
            np.zeros(0, dtype=np.int32),
            np.zeros(0, dtype=np.int8),
        )
    h = hash64_numpy(canon, bits)
    h = np.where(valid, h, np.uint64(0xFFFFFFFFFFFFFFFF))
    nw = n - w + 1
    pos = _sliding_argmin(h, w)
    hmin = h[pos]
    keep = np.ones(nw, dtype=bool)
    keep[1:] = pos[1:] != pos[:-1]
    keep &= hmin != np.uint64(0xFFFFFFFFFFFFFFFF)
    pos = pos[keep]
    return h[pos], pos, strand[pos]
