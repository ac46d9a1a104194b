"""Pallas TPU kernels for the hot compute paths.

:func:`kmer_hashes_pallas` fuses the whole per-window pipeline of the
sketch screen's stage-1 hot loop — 2-bit packing, canonical selection,
ASCII plane reconstruction, and the uint32-limb MurmurHash3 — into one
VMEM-resident kernel. The pure-jnp formulation
(:func:`hymet_tpu.ops.hashing.kmer_hashes_jax`) leaves XLA free to
materialize dozens of [B, n] intermediates in HBM; here each grid tile
loads a [1, TILE + k - 1] code slab once and keeps every intermediate in
VMEM/registers.

Blocks overlap by k-1 positions (BlockSpec index maps may overlap), so no
windows are lost at tile boundaries. Scatter-adds stay outside (XLA's
scatter is already fast); the kernel emits (hi, lo, valid).

Falls back transparently: `interpret=True` runs the same kernel on CPU
for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hymet_tpu.ops.hashing import murmur3_planes_jax

TILE = 2048  # windows per grid step (multiple of the 128-lane VPU width)


def _hash_tile_kernel(cur_ref, nxt_ref, hi_ref, lo_ref, valid_ref, *, k: int, n_total: int):
    """One [B, TILE] tile. Overlap across tile boundaries comes from a
    second aligned view of the same array shifted by one tile (block
    index maps can't express overlapping blocks): slab = cur ++ nxt[:k-1].
    All rows of the batch are processed per grid step."""
    t = pl.program_id(0)
    # narrow overlap slab: only the first k-1 lanes of the next tile are
    # ever read, so carry one aligned 128-lane block of it instead of the
    # whole tile — the 21 lane-rolls below move ~1.9x less data. Widths
    # must stay 128-multiples (TILE + 128 is): an unaligned width like
    # TILE + k - 1 miscompiles lane rolls on TPU (CLAUDE.md).
    codes = jnp.concatenate(
        [cur_ref[:, :], nxt_ref[:, :128]], axis=1
    ).astype(jnp.uint32)  # [B, TILE + 128]

    B = codes.shape[0]

    def shifted(arr, j):
        # lane-shift via pltpu.roll (misaligned lane slices miscompile on
        # some Mosaic versions); rolled tail lanes fall outside [:TILE]
        if j == 0:
            return arr[:, :TILE]
        width = arr.shape[1]
        # left-shift by j == roll right by width - j (roll requires
        # non-negative shifts)
        return pltpu.roll(arr, width - j, 1)[:, :TILE]

    # validity: no invalid base inside the window
    invalid = (codes >= 4).astype(jnp.int32)
    inv_sum = jnp.zeros((B, TILE), dtype=jnp.int32)
    for j in range(k):
        inv_sum = inv_sum + shifted(invalid, j)
    valid = inv_sum == 0

    # packed forward/revcomp (2k bits as uint32 limb pair; 2-bit fields
    # never straddle the limb boundary)
    f_hi = jnp.zeros((B, TILE), dtype=jnp.uint32)
    f_lo = jnp.zeros((B, TILE), dtype=jnp.uint32)
    r_hi = jnp.zeros((B, TILE), dtype=jnp.uint32)
    r_lo = jnp.zeros((B, TILE), dtype=jnp.uint32)
    for j in range(k):
        c = shifted(codes, j) & 3
        s_f = 2 * (k - 1 - j)
        s_r = 2 * j
        if s_f >= 32:
            f_hi = f_hi | (c << (s_f - 32))
        else:
            f_lo = f_lo | (c << s_f)
        cr = jnp.uint32(3) - c
        if s_r >= 32:
            r_hi = r_hi | (cr << (s_r - 32))
        else:
            r_lo = r_lo | (cr << s_r)

    use_fwd = (f_hi < r_hi) | ((f_hi == r_hi) & (f_lo <= r_lo))
    c_hi = jnp.where(use_fwd, f_hi, r_hi)
    c_lo = jnp.where(use_fwd, f_lo, r_lo)

    chars = jnp.array(list(b"ACGT"), dtype=jnp.uint32)
    planes = []
    for j in range(k):
        s = 2 * (k - 1 - j)
        bits = (c_hi >> (s - 32)) & 3 if s >= 32 else (c_lo >> s) & 3
        # tiny 4-entry lookup as arithmetic select (avoids a gather)
        byte = (
            jnp.uint32(ord("A"))
            + jnp.where(bits == 1, jnp.uint32(2), 0)  # C = A + 2
            + jnp.where(bits == 2, jnp.uint32(6), 0)  # G = A + 6
            + jnp.where(bits == 3, jnp.uint32(19), 0)  # T = A + 19
        )
        planes.append(byte)
    del chars

    h_hi, h_lo = murmur3_planes_jax(planes)

    # windows beyond the sequence end are invalid
    base = t * TILE
    offs = jax.lax.broadcasted_iota(jnp.int32, (codes.shape[0], TILE), 1)
    valid = valid & ((base + offs) < n_total)

    hi_ref[:, :] = h_hi
    lo_ref[:, :] = h_lo
    valid_ref[:, :] = valid


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def kmer_hashes_pallas(codes: jax.Array, k: int, interpret: bool = False):
    """[B, L] uint8 codes -> (hi, lo, valid) over the L-k+1 windows,
    padded to a TILE multiple (extra windows marked invalid).

    Drop-in for :func:`hymet_tpu.ops.hashing.kmer_hashes_jax` up to the
    tile padding (callers mask by `valid`)."""
    B, L = codes.shape
    n = L - k + 1
    if n <= 0:
        raise ValueError(f"sequence shorter than k: L={L}, k={k}")
    if k > 129:
        raise ValueError(f"k={k} exceeds the 128-lane overlap slab")
    n_tiles = -(-n // TILE)
    # pad to (n_tiles + 1) tiles: the kernel reads tile t and the first
    # k-1 lanes of tile t+1 (two aligned views express the overlap)
    pad_to = (n_tiles + 1) * TILE
    if L < pad_to:
        codes = jnp.pad(codes, ((0, 0), (0, pad_to - L)), constant_values=4)

    kernel = functools.partial(_hash_tile_kernel, k=k, n_total=n)
    out_shape = (B, n_tiles * TILE)
    # the kernel's scoped-vmem footprint scales with the block's ROW
    # count (the 21 lane-roll temporaries are [rows, TILE+128] each): a
    # 256-row single block hits "Scoped allocation 52.83M > 16.00M"
    # (round-4 probe). Tile rows at 64 when B divides evenly — the tile
    # index stays program_id(0), so the kernel's validity math (which
    # only reads the lane/tile axis) is untouched.
    rb = 64 if (B > 64 and B % 64 == 0) else B
    hi, lo, valid = pl.pallas_call(
        kernel,
        grid=(n_tiles, B // rb),
        in_specs=[
            pl.BlockSpec((rb, TILE), lambda t, r: (r, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, TILE), lambda t, r: (r, t + 1), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rb, TILE), lambda t, r: (r, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, TILE), lambda t, r: (r, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, TILE), lambda t, r: (r, t), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(out_shape, jnp.uint32),
            jax.ShapeDtypeStruct(out_shape, jnp.uint32),
            jax.ShapeDtypeStruct(out_shape, jnp.bool_),
        ),
        interpret=interpret,
    )(codes, codes)
    return hi, lo, valid
