"""MurmurHash3_x64_128 k-mer hashing, Mash-compatible.

Mash (the reference's sketch engine, invoked at ``scripts/mash.sh:14``)
hashes each canonical k-mer's ASCII bytes with MurmurHash3_x64_128 (seed
42) and keeps the first 64 bits (for k > 16 on the ACGT alphabet). We
reproduce that exactly so that sketches we build are hash-compatible with
Mash's, in three implementations:

- :func:`murmur3_x64_128_py` — scalar pure-Python, written directly from
  the MurmurHash3 specification; the ground truth for tests.
- :func:`murmur3_kmers_numpy` — vectorized numpy uint64 over all k-mer
  windows of a sequence; used for host-side reference-DB builds.
- :func:`murmur3_kmers_jax` — the device kernel: TPU has no 64-bit
  integers, so every 64-bit quantity is a (hi, lo) pair of uint32 lanes
  and 64x64 multiplies decompose into 16-bit partial products. All ops are
  VPU element-wise over the k-mer batch dimension.

Canonical k-mer rule (Mash's): compare the forward k-mer byte string with
its reverse complement lexicographically; hash the smaller.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import numpy as np

SEED = 42  # Mash's default hash seed

_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F
_F1 = 0xFF51AFD7ED558CCD
_F2 = 0xC4CEB9FE1A85EC53
_M64 = (1 << 64) - 1


# ----------------------------------------------------------------------
# scalar pure-Python ground truth


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * _F1) & _M64
    k ^= k >> 33
    k = (k * _F2) & _M64
    k ^= k >> 33
    return k


def murmur3_x64_128_py(data: bytes, seed: int = SEED) -> Tuple[int, int]:
    """MurmurHash3_x64_128 of `data`; returns (h1, h2) as ints."""
    length = len(data)
    nblocks = length // 16
    h1 = seed
    h2 = seed

    for b in range(nblocks):
        k1 = int.from_bytes(data[b * 16 : b * 16 + 8], "little")
        k2 = int.from_bytes(data[b * 16 + 8 : b * 16 + 16], "little")
        k1 = (k1 * _C1) & _M64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _M64
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & _M64
        h1 = (h1 * 5 + 0x52DCE729) & _M64
        k2 = (k2 * _C2) & _M64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & _M64
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & _M64
        h2 = (h2 * 5 + 0x38495AB5) & _M64

    tail = data[nblocks * 16 :]
    k1 = 0
    k2 = 0
    for i in range(len(tail) - 1, 7, -1):  # bytes 8..15 into k2
        k2 = (k2 << 8) | tail[i]
    for i in range(min(len(tail), 8) - 1, -1, -1):  # bytes 0..7 into k1
        k1 = (k1 << 8) | tail[i]
    if len(tail) > 8:
        k2 = (k2 * _C2) & _M64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & _M64
        h2 ^= k2
    if len(tail) > 0:
        k1 = (k1 * _C1) & _M64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _M64
        h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    return h1, h2


# ----------------------------------------------------------------------
# vectorized numpy (uint64 lanes, host)

_NP_C1 = np.uint64(_C1)
_NP_C2 = np.uint64(_C2)


def _np_rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _np_fmix(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(_F1)
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(_F2)
    k = k ^ (k >> np.uint64(33))
    return k


def murmur3_x64_128_numpy(rows: np.ndarray, seed: int = SEED) -> np.ndarray:
    """Hash each row of a [N, L] uint8 byte matrix; returns [N] uint64 h1
    (the 64-bit hash Mash keeps)."""
    n, length = rows.shape
    nblocks = length // 16
    h1 = np.full(n, seed, dtype=np.uint64)
    h2 = np.full(n, seed, dtype=np.uint64)

    def word(lo_byte: int) -> np.ndarray:
        w = np.zeros(n, dtype=np.uint64)
        for i in range(7, -1, -1):
            w = (w << np.uint64(8)) | rows[:, lo_byte + i].astype(np.uint64)
        return w

    with np.errstate(over="ignore"):
        for b in range(nblocks):
            k1 = word(b * 16)
            k2 = word(b * 16 + 8)
            k1 *= _NP_C1
            k1 = _np_rotl(k1, 31)
            k1 *= _NP_C2
            h1 ^= k1
            h1 = _np_rotl(h1, 27)
            h1 += h2
            h1 = h1 * np.uint64(5) + np.uint64(0x52DCE729)
            k2 *= _NP_C2
            k2 = _np_rotl(k2, 33)
            k2 *= _NP_C1
            h2 ^= k2
            h2 = _np_rotl(h2, 31)
            h2 += h1
            h2 = h2 * np.uint64(5) + np.uint64(0x38495AB5)

        tail_len = length - nblocks * 16
        base = nblocks * 16
        if tail_len > 8:
            k2 = np.zeros(n, dtype=np.uint64)
            for i in range(tail_len - 1, 7, -1):
                k2 = (k2 << np.uint64(8)) | rows[:, base + i].astype(np.uint64)
            k2 *= _NP_C2
            k2 = _np_rotl(k2, 33)
            k2 *= _NP_C1
            h2 ^= k2
        if tail_len > 0:
            k1 = np.zeros(n, dtype=np.uint64)
            for i in range(min(tail_len, 8) - 1, -1, -1):
                k1 = (k1 << np.uint64(8)) | rows[:, base + i].astype(np.uint64)
            k1 *= _NP_C1
            k1 = _np_rotl(k1, 31)
            k1 *= _NP_C2
            h1 ^= k1

        h1 ^= np.uint64(length)
        h2 ^= np.uint64(length)
        h1 += h2
        h2 += h1
        h1 = _np_fmix(h1)
        h2 = _np_fmix(h2)
        h1 += h2
    return h1


_CODE_TO_CHAR = np.frombuffer(b"ACGTN", dtype=np.uint8)
_COMP_CODE = np.array([3, 2, 1, 0, 4], dtype=np.uint8)


def canonical_kmer_bytes(codes: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """All k-mer windows of a uint8 code sequence -> canonical ASCII byte
    rows [n_kmers, k] plus a validity mask (False where the window contains
    a non-ACGT base). Mash semantics: canonical = lexicographic min of
    forward and reverse-complement byte strings.

    Since A<C<G<T holds in both the 2-bit code order and ASCII, the byte
    comparison equals an integer comparison of 2-bit-packed k-mers — so we
    pack forward and revcomp windows into uint64 with k rolling shifts
    (no [n, k] intermediate; requires k <= 32) and only materialize the
    canonical winner's bytes.
    """
    assert k <= 32, "packed canonicalization supports k <= 32"
    n = codes.shape[0] - k + 1
    if n <= 0:
        return np.zeros((0, k), dtype=np.uint8), np.zeros(0, dtype=bool)

    # validity via cumulative count of invalid bases
    inv = (codes >= 4).astype(np.int32)
    csum = np.concatenate([[0], np.cumsum(inv)])
    valid = (csum[k:] - csum[:-k]) == 0

    fwd = np.zeros(n, dtype=np.uint64)
    rc = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        c = (codes[j : j + n] & 3).astype(np.uint64)
        fwd |= c << np.uint64(2 * (k - 1 - j))
        rc |= (np.uint64(3) - c) << np.uint64(2 * j)
    canon = np.minimum(fwd, rc)

    out = np.empty((n, k), dtype=np.uint8)
    for j in range(k):
        out[:, j] = _CODE_TO_CHAR[
            ((canon >> np.uint64(2 * (k - 1 - j))) & np.uint64(3)).astype(np.uint8)
        ]
    return out, valid


def kmer_hashes_numpy(codes: np.ndarray, k: int, seed: int = SEED) -> np.ndarray:
    """uint64 hashes of all valid canonical k-mers of a code sequence."""
    rows, valid = canonical_kmer_bytes(codes, k)
    if rows.shape[0] == 0:
        return np.zeros(0, dtype=np.uint64)
    return murmur3_x64_128_numpy(rows[valid], seed)


def kmer_hashes_host(codes: np.ndarray, k: int) -> np.ndarray:
    """Host k-mer hashing: native C++ path when built (~60x numpy),
    numpy fallback. Mash default seed only (the native kernel pins it)."""
    # the C++ kernel supports 1 <= k <= 32 only; fall through otherwise
    if 1 <= k <= 32:
        try:
            from hymet_tpu.io import native_io

            if native_io.available():
                return native_io.kmer_hashes(codes, k)
        except Exception:  # noqa: BLE001
            pass
    return kmer_hashes_numpy(codes, k)


# ----------------------------------------------------------------------
# JAX device kernel: 64-bit as (hi, lo) uint32 limb pairs


def _jax_imports():
    import jax.numpy as jnp

    return jnp


def _mul32(a, b):
    """32x32 -> 64 unsigned multiply on uint32 lanes via 16-bit partials.
    Returns (hi, lo) uint32."""
    jnp = _jax_imports()
    a0 = a & 0xFFFF
    a1 = a >> 16
    b0 = b & 0xFFFF
    b1 = b >> 16
    p00 = a0 * b0  # <= (2^16-1)^2 < 2^32: exact in uint32
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    # lo = p00 + ((p01 + p10) << 16) with carries into hi
    mid = (p00 >> 16) + (p01 & 0xFFFF) + (p10 & 0xFFFF)
    lo = (p00 & 0xFFFF) | ((mid & 0xFFFF) << 16)
    hi = p11 + (p01 >> 16) + (p10 >> 16) + (mid >> 16)
    return hi, lo


def _mul64(a_hi, a_lo, b_hi, b_lo):
    """64x64 -> low 64 bits, on (hi, lo) uint32 limb pairs."""
    p_hi, p_lo = _mul32(a_lo, b_lo)
    _, x = _mul32(a_lo, b_hi)
    _, y = _mul32(a_hi, b_lo)
    return p_hi + x + y, p_lo


def _mul64x5(hi, lo):
    """(hi, lo) * 5 as x + (x << 2) — 6 limb ops instead of a general
    _mul64's ~10 uint32 multiplies (murmur's h += h*5 + c sites)."""
    s_hi = (hi << 2) | (lo >> 30)
    s_lo = lo << 2
    return _add64(s_hi, s_lo, hi, lo)


def _add64(a_hi, a_lo, b_hi, b_lo):
    jnp = _jax_imports()
    lo = a_lo + b_lo
    carry = (lo < a_lo).astype(jnp.uint32)
    return a_hi + b_hi + carry, lo


def _xor64(a_hi, a_lo, b_hi, b_lo):
    return a_hi ^ b_hi, a_lo ^ b_lo


def _rotl64_limb(hi, lo, r: int):
    r = r % 64
    if r == 0:
        return hi, lo
    if r < 32:
        return ((hi << r) | (lo >> (32 - r)), (lo << r) | (hi >> (32 - r)))
    if r == 32:
        return lo, hi
    r -= 32
    return ((lo << r) | (hi >> (32 - r)), (hi << r) | (lo >> (32 - r)))


def _shr64(hi, lo, r: int):
    if r == 0:
        return hi, lo
    if r < 32:
        return hi >> r, (lo >> r) | (hi << (32 - r))
    if r == 32:
        jnp = _jax_imports()
        return jnp.zeros_like(hi), hi
    jnp = _jax_imports()
    return jnp.zeros_like(hi), hi >> (r - 32)


def _const64(x: int):
    jnp = _jax_imports()
    return jnp.uint32(x >> 32), jnp.uint32(x & 0xFFFFFFFF)


def _fmix64_limb(hi, lo):
    s_hi, s_lo = _shr64(hi, lo, 33)
    hi, lo = hi ^ s_hi, lo ^ s_lo
    c_hi, c_lo = _const64(_F1)
    hi, lo = _mul64(hi, lo, c_hi, c_lo)
    s_hi, s_lo = _shr64(hi, lo, 33)
    hi, lo = hi ^ s_hi, lo ^ s_lo
    c_hi, c_lo = _const64(_F2)
    hi, lo = _mul64(hi, lo, c_hi, c_lo)
    s_hi, s_lo = _shr64(hi, lo, 33)
    return hi ^ s_hi, lo ^ s_lo


def murmur3_rows_jax(rows, length: int, seed: int = SEED):
    """MurmurHash3_x64_128 h1 of [..., length] uint8 byte rows (uint32
    lanes). `length` static. Returns (h1_hi, h1_lo) uint32 arrays of the
    batch shape. Pure jnp — usable inside jit/shard_map/pallas bodies."""
    jnp = _jax_imports()
    rows = rows.astype(jnp.uint32)
    planes = [rows[..., i] for i in range(length)]
    return murmur3_planes_jax(planes, seed)


def murmur3_planes_jax(planes, seed: int = SEED):
    """Same as :func:`murmur3_rows_jax` but takes the message as a list of
    per-byte-position arrays (``planes[i]`` = byte i of every lane). This
    avoids materializing a [batch, length] matrix when the bytes are
    computed on the fly (the k-mer path)."""
    jnp = _jax_imports()
    length = len(planes)
    planes = [p.astype(jnp.uint32) for p in planes]
    zeros = jnp.zeros_like(planes[0])
    h1_hi, h1_lo = zeros + 0, zeros + jnp.uint32(seed)
    h2_hi, h2_lo = zeros + 0, zeros + jnp.uint32(seed)
    c1_hi, c1_lo = _const64(_C1)
    c2_hi, c2_lo = _const64(_C2)

    def word(base: int, nbytes: int = 8):
        lo = zeros
        hi = zeros
        for i in range(min(nbytes, 4) - 1, -1, -1):
            lo = (lo << 8) | planes[base + i]
        for i in range(nbytes - 1, 3, -1):
            hi = (hi << 8) | planes[base + i]
        return hi, lo

    nblocks = length // 16
    for b in range(nblocks):
        k1_hi, k1_lo = word(b * 16)
        k2_hi, k2_lo = word(b * 16 + 8)
        k1_hi, k1_lo = _mul64(k1_hi, k1_lo, c1_hi, c1_lo)
        k1_hi, k1_lo = _rotl64_limb(k1_hi, k1_lo, 31)
        k1_hi, k1_lo = _mul64(k1_hi, k1_lo, c2_hi, c2_lo)
        h1_hi, h1_lo = _xor64(h1_hi, h1_lo, k1_hi, k1_lo)
        h1_hi, h1_lo = _rotl64_limb(h1_hi, h1_lo, 27)
        h1_hi, h1_lo = _add64(h1_hi, h1_lo, h2_hi, h2_lo)
        m_hi, m_lo = _mul64x5(h1_hi, h1_lo)
        h1_hi, h1_lo = _add64(m_hi, m_lo, jnp.uint32(0), jnp.uint32(0x52DCE729))
        k2_hi, k2_lo = _mul64(k2_hi, k2_lo, c2_hi, c2_lo)
        k2_hi, k2_lo = _rotl64_limb(k2_hi, k2_lo, 33)
        k2_hi, k2_lo = _mul64(k2_hi, k2_lo, c1_hi, c1_lo)
        h2_hi, h2_lo = _xor64(h2_hi, h2_lo, k2_hi, k2_lo)
        h2_hi, h2_lo = _rotl64_limb(h2_hi, h2_lo, 31)
        h2_hi, h2_lo = _add64(h2_hi, h2_lo, h1_hi, h1_lo)
        m_hi, m_lo = _mul64x5(h2_hi, h2_lo)
        h2_hi, h2_lo = _add64(m_hi, m_lo, jnp.uint32(0), jnp.uint32(0x38495AB5))

    tail_len = length - nblocks * 16
    base = nblocks * 16
    if tail_len > 8:
        k2_hi, k2_lo = word(base + 8, tail_len - 8)
        k2_hi, k2_lo = _mul64(k2_hi, k2_lo, c2_hi, c2_lo)
        k2_hi, k2_lo = _rotl64_limb(k2_hi, k2_lo, 33)
        k2_hi, k2_lo = _mul64(k2_hi, k2_lo, c1_hi, c1_lo)
        h2_hi, h2_lo = _xor64(h2_hi, h2_lo, k2_hi, k2_lo)
    if tail_len > 0:
        k1_hi, k1_lo = word(base, min(tail_len, 8))
        k1_hi, k1_lo = _mul64(k1_hi, k1_lo, c1_hi, c1_lo)
        k1_hi, k1_lo = _rotl64_limb(k1_hi, k1_lo, 31)
        k1_hi, k1_lo = _mul64(k1_hi, k1_lo, c2_hi, c2_lo)
        h1_hi, h1_lo = _xor64(h1_hi, h1_lo, k1_hi, k1_lo)

    h1_hi, h1_lo = _xor64(h1_hi, h1_lo, jnp.uint32(0), jnp.uint32(length))
    h2_hi, h2_lo = _xor64(h2_hi, h2_lo, jnp.uint32(0), jnp.uint32(length))
    h1_hi, h1_lo = _add64(h1_hi, h1_lo, h2_hi, h2_lo)
    h2_hi, h2_lo = _add64(h2_hi, h2_lo, h1_hi, h1_lo)
    h1_hi, h1_lo = _fmix64_limb(h1_hi, h1_lo)
    h2_hi, h2_lo = _fmix64_limb(h2_hi, h2_lo)
    h1_hi, h1_lo = _add64(h1_hi, h1_lo, h2_hi, h2_lo)
    return h1_hi, h1_lo


def packed_canonical_kmers_jax(codes, k: int):
    """[B, L] codes -> canonical 2-bit-packed k-mers as (hi, lo) uint32
    pairs [B, n], validity mask, and strand (0 = forward <= rc).

    THE single jnp source of the canonical-k-mer rule — shared by the
    sketch hash path and the minimizer path (the Pallas kernel keeps its
    own fused copy for VMEM locality; numpy twins live below)."""
    jnp = _jax_imports()
    B, L = codes.shape
    n = L - k + 1
    codes = codes.astype(jnp.uint32)
    inv = (codes >= 4).astype(jnp.int32)
    csum = jnp.concatenate(
        [jnp.zeros((B, 1), dtype=jnp.int32), jnp.cumsum(inv, axis=1)], axis=1
    )
    valid = (csum[:, k:] - csum[:, :-k]) == 0

    f_hi = jnp.zeros((B, n), dtype=jnp.uint32)
    f_lo = jnp.zeros((B, n), dtype=jnp.uint32)
    r_hi = jnp.zeros((B, n), dtype=jnp.uint32)
    r_lo = jnp.zeros((B, n), dtype=jnp.uint32)
    for j in range(k):
        c = codes[:, j : j + n] & 3
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
    fwd_less = (f_hi < r_hi) | ((f_hi == r_hi) & (f_lo <= r_lo))
    c_hi = jnp.where(fwd_less, f_hi, r_hi)
    c_lo = jnp.where(fwd_less, f_lo, r_lo)
    strand = jnp.where(fwd_less, jnp.int32(0), jnp.int32(1))
    return c_hi, c_lo, valid, strand




@functools.partial(jax.jit, static_argnames=("k", "seed"))
def kmer_hashes_jax(codes, k: int, seed: int = SEED):
    """Device k-mer hashing: [B, L] uint8 code batch -> canonical k-mer
    hashes ((hi, lo) uint32 [B, L-k+1]) + validity mask.

    Jitted: the ~150-op limb pipeline must compile to one fused program —
    eager execution pays per-op dispatch (catastrophic over remote-device
    links: ~3 s/call vs ~6 ms compiled).

    TPU-friendly formulation: pack forward and revcomp windows into
    (hi, lo) uint32 2-bit-packed pairs via k rolling shifts (A<C<G<T in
    both code and ASCII order makes packed integer comparison equal to
    Mash's byte-lexicographic canonical rule; 2-bit fields never straddle
    the 32-bit limb boundary since shifts are even). Only the canonical
    winner's ASCII byte planes are produced, fed straight into the limb
    murmur kernel — no [B, n, k] tensor is ever materialized.
    Requires k <= 32.
    """
    assert k <= 32, "packed canonicalization supports k <= 32"
    jnp = _jax_imports()
    c_hi, c_lo, valid, _strand = packed_canonical_kmers_jax(codes, k)

    chars = jnp.array(list(b"ACGT"), dtype=jnp.uint32)
    planes = []
    for j in range(k):
        s = 2 * (k - 1 - j)
        bits = (c_hi >> (s - 32)) & 3 if s >= 32 else (c_lo >> s) & 3
        planes.append(chars[bits])
    hi, lo = murmur3_planes_jax(planes, seed)
    return hi, lo, valid


def pack64(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """(hi, lo) uint32 -> uint64 on host."""
    return (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)


def unpack_code_batch_jax(packed, mask, L: int):
    """Device-side inverse of :func:`hymet_tpu.io.fasta.pack_code_batch`:
    [B, L/4] 2-bit fields + [B, L/8] validity bits -> [B, L] uint8 codes
    with invalid positions restored to 4. Gather-free (per-byte shift
    stacks + reshape only), so it fuses into whatever jit consumes it.
    """
    jnp = _jax_imports()
    B = packed.shape[0]
    codes4 = jnp.stack(
        [(packed >> jnp.uint8(2 * i)) & jnp.uint8(3) for i in range(4)],
        axis=-1,
    ).reshape(B, -1)
    bits = jnp.stack(
        [(mask >> jnp.uint8(i)) & jnp.uint8(1) for i in range(8)], axis=-1
    ).reshape(B, -1)
    codes = jnp.where(bits[:, : codes4.shape[1]] == 1, codes4, jnp.uint8(4))
    return codes[:, :L]
