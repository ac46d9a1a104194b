"""MinHash sketching + containment screen on device.

Replaces ``mash screen`` (reference ``scripts/mash.sh:14``). The screen is
formulated the way Mash itself works — but as streaming TPU kernels:

1. DB build time: the union of all reference sketch hashes is de-duplicated
   and sorted into a flat array [F] (``SketchDB.flat_index``), with a
   per-reference index matrix [R, s] pointing into it.
2. Stream time: each batch of query k-mer hashes is binary-searched into
   the flat array (vectorized lower-bound over (hi, lo) uint32 pairs —
   TPU has no 64-bit ints, so 64-bit hashes live as limb pairs) and
   scatter-adds occurrence counts.
3. Score time: per reference, gather its hash counts; shared = #hashes with
   count>0; identity = 1 + ln(2c/(1+c))/k (Mash's containment->identity
   estimate); median multiplicity = upper median of shared-hash counts.

Multi-device: references (and their flat hash arrays) shard across the
``db`` mesh axis; query hash batches are replicated; scores concatenate.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hymet_tpu.io.sketchdb import PAD_HASH, SketchDB
from hymet_tpu.ops.hashing import kmer_hashes_jax


def split64(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """uint64 -> (hi, lo) uint32 host-side."""
    return (
        (x >> np.uint64(32)).astype(np.uint32),
        (x & np.uint64(0xFFFFFFFF)).astype(np.uint32),
    )


def _less64(a_hi, a_lo, b_hi, b_lo):
    return (a_hi < b_hi) | ((a_hi == b_hi) & (a_lo < b_lo))


def _cksum(x):
    """Position-weighted checksum (not DCE-able / reorderable) for the
    BENCH_MODE=sketch_stages truncated-prefix ablation (see bench.py;
    same trick as models.aligner._cksum)."""
    xf = x.reshape(-1).astype(jnp.uint32)
    w = jax.lax.broadcasted_iota(jnp.uint32, (xf.shape[0], 1), 0).squeeze(-1)
    return (jnp.sum(xf * (w | jnp.uint32(1))),)


# Max flat-DB size for the matmul-formulated count (segment table must
# stay MXU-friendly: P = F/128 one-hot columns). Larger DBs fall back to
# the binary-search formulation.
EQMM_MAX_F = 1 << 17
_EQMM_SEG = 128  # db entries per segment (lane-width aligned)
# query hashes per eqmm scan step; overridable for tuning without a
# code edit (scan-iteration overhead vs VMEM footprint trade)
_EQMM_CHUNK = int(os.environ.get("HYMET_EQMM_CHUNK", "8192"))


def _count_eqmm(db_hi, db_lo, counts, q_hi, q_lo, q_valid):
    """Gather-free streaming count: hierarchical one-hot-matmul membership.

    XLA lowers per-element gathers to ~100 M elem/s on TPU, which made the
    binary-search count the whole pipeline's bottleneck (2.25 s for an
    8.4 M-hash batch against F=32 K). This formulation touches the MXU/VPU
    only:

      1. rank each query hash into its 128-entry DB segment by a pivot
         compare-sum (VPU, [chunk, P] lexicographic 64-bit compares),
      2. fetch the ranked segment's entries as 8 exact u8 limbs with a
         one-hot [chunk, P] x [P, seg*8] bf16 matmul (f32 accumulation:
         one-hot rows have a single 1, u8 limbs are exact in bf16),
      3. compare 64-bit equality against the recombined limbs (VPU),
      4. accumulate per-slot counts with the transposed one-hot matmul
         [P, chunk] x [chunk, seg] (0/1 inputs, f32 accumulation — exact
         for chunk <= 2^24).

    Same result as the binary-search path up to one 2^-64-probability
    deviation: a query hash equal to the all-ones pad sentinel ranks into
    a pad segment and is dropped (the search path drops it too unless the
    DB itself contains the all-ones hash).
    """
    F = db_hi.shape[0]
    seg = _EQMM_SEG
    P = -(-F // seg)
    Fp = P * seg
    if Fp != F:
        ones = jnp.full((Fp - F,), 0xFFFFFFFF, jnp.uint32)
        db_hi = jnp.concatenate([db_hi, ones])
        db_lo = jnp.concatenate([db_lo, ones])
    seg_hi = db_hi.reshape(P, seg)
    seg_lo = db_lo.reshape(P, seg)
    piv_hi = seg_hi[:, 0]  # [P]
    piv_lo = seg_lo[:, 0]
    # segment value table as bf16 u8 limbs: V[p, j*8 + t] = limb t of
    # entry j (t 0..3 = hi bytes lsb..msb, 4..7 = lo bytes)
    limbs = [(seg_hi >> s) & 0xFF for s in (0, 8, 16, 24)] + [
        (seg_lo >> s) & 0xFF for s in (0, 8, 16, 24)
    ]
    V = (
        jnp.stack(limbs, axis=-1)  # [P, seg, 8]
        .reshape(P, seg * 8)
        .astype(jnp.bfloat16)
    )

    chunk = _EQMM_CHUNK
    n = q_hi.shape[0]
    n_pad = -(-n // chunk) * chunk
    if n_pad != n:
        pad = n_pad - n
        q_hi = jnp.concatenate([q_hi, jnp.zeros(pad, q_hi.dtype)])
        q_lo = jnp.concatenate([q_lo, jnp.zeros(pad, q_lo.dtype)])
        q_valid = jnp.concatenate([q_valid, jnp.zeros(pad, bool)])
    qh = q_hi.reshape(-1, chunk)
    ql = q_lo.reshape(-1, chunk)
    qv = q_valid.reshape(-1, chunk)
    p_iota = jnp.arange(P, dtype=jnp.int32)

    def body(cgrid, qs):
        h, l, v = qs  # [chunk]
        le = (piv_hi[None, :] < h[:, None]) | (
            (piv_hi[None, :] == h[:, None]) & (piv_lo[None, :] <= l[:, None])
        )  # [chunk, P]
        r = jnp.clip(jnp.sum(le, axis=1).astype(jnp.int32) - 1, 0, P - 1)
        oh = (r[:, None] == p_iota[None, :]).astype(jnp.bfloat16)  # [chunk, P]
        cand = jnp.dot(oh, V, preferred_element_type=jnp.float32)
        cand = cand.astype(jnp.uint32).reshape(chunk, seg, 8)
        c_hi = (
            cand[..., 0]
            | (cand[..., 1] << 8)
            | (cand[..., 2] << 16)
            | (cand[..., 3] << 24)
        )
        c_lo = (
            cand[..., 4]
            | (cand[..., 5] << 8)
            | (cand[..., 6] << 16)
            | (cand[..., 7] << 24)
        )
        eq = (c_hi == h[:, None]) & (c_lo == l[:, None]) & v[:, None]
        contrib = jnp.dot(
            oh.T, eq.astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )  # [P, seg]
        return cgrid + contrib.astype(jnp.int32), None

    cgrid0 = jnp.zeros((P, seg), jnp.int32)
    cgrid, _ = jax.lax.scan(body, cgrid0, (qh, ql, qv))
    return counts + cgrid.reshape(Fp)[:F]


def build_flat_search(hi: np.ndarray, lo: np.ndarray, bits: Optional[int] = None):
    """Gather-lean survivor-search tables over the sorted-unique flat DB
    (same design as the aligner's round-3 tables, docs/BENCH_NOTES.md):
    the (hi, lo) limbs INTERLEAVE as one [F, 2] row table so each
    binary-search step gathers one 8-byte row instead of two 4-byte
    scalars, and a [2^bits + 1, 2] bucket pair table confines the
    search to ~log2(max bucket) steps instead of log2(F) — at F=1e8 the
    flat search was 27 steps x 2 gathers into 800 MB, the dominant cost
    of the large-F screen.

    Bottom-sketch DBs concentrate every hash below the sketch threshold
    (~2.5e-4 of the hash space for real Mash-scale sketches), so raw
    top-of-hi bucket keys would land all of F in bucket 0 and the
    confinement would degenerate to log2(F) (ADVICE round 3). Buckets
    therefore key on the ``bits`` bits just below the DB max's leading
    zeros; the shift rides in the table's EXTRA LAST ROW so the device
    side derives the same key without threading a new static argument
    through every screen jit. Returns (hl, bkt2, bits, steps)."""
    import math as _math

    F = int(hi.shape[0])
    if F == 0:
        b = bits or 1
        return (
            np.full((1, 2), 0xFFFFFFFF, np.uint32),
            np.zeros(((1 << b) + 1, 2), np.int32),
            b,
            1,
        )
    hl = np.ascontiguousarray(np.stack([hi, lo], axis=1))
    if bits is None:
        bits = min(20, max(1, int(_math.ceil(_math.log2(max(F, 2)))) - 7))
    shift = max(0, int(hi.max()).bit_length() - bits)
    tops = (hi.astype(np.uint64) >> np.uint64(shift)).astype(np.int64)
    off = np.searchsorted(tops, np.arange((1 << bits) + 1)).astype(np.int32)
    max_bucket = int(np.diff(off).max())
    steps = max(1, int(_math.ceil(_math.log2(max_bucket + 1))))
    bkt2 = np.concatenate(
        [
            np.stack([off[:-1], off[1:]], axis=1),
            np.array([[shift, 0]], np.int32),
        ]
    )
    return hl, bkt2, bits, steps


def _count_binsearch_rows(db_hl, bkt2, bkt_steps, counts, q_hi, q_lo, q_valid):
    """Row-gather + bucket-confined variant of :func:`_count_binsearch`
    (identical counts; see :func:`build_flat_search`)."""
    F = db_hl.shape[0]
    nb = bkt2.shape[0] - 1  # last row carries the bucket-key shift
    shift = bkt2[nb, 0].astype(jnp.uint32)
    # queries span the full hash space while the DB concentrates below
    # its threshold: out-of-range keys clamp into the last (tiny) bucket
    # where the exact-match check rejects them in ~1 step
    top = jnp.minimum(
        jnp.right_shift(q_hi, shift), jnp.uint32(nb - 1)
    ).astype(jnp.int32)
    brow = bkt2[top]
    lo = brow[:, 0]
    hi = brow[:, 1]

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        row = db_hl[mid]  # [N, 2] — ONE row gather per step
        less = (row[:, 0] < q_hi) | ((row[:, 0] == q_hi) & (row[:, 1] < q_lo))
        go = less & (lo < hi)
        return jnp.where(go, mid + 1, lo), jnp.where(go, hi, mid)

    lo, _ = jax.lax.fori_loop(0, bkt_steps, body, (lo, hi))
    pos = jnp.clip(lo, 0, F - 1)
    row = db_hl[pos]
    found = (row[:, 0] == q_hi) & (row[:, 1] == q_lo) & q_valid & (lo < F)
    return counts.at[pos].add(found.astype(jnp.int32))


# Prefilter survivor capacity: expected survivors are ~q_len * t/2^64
# (t/2^64 ~= sketch_size/genome_len, ~0.01-0.3% for real Mash DBs — the
# top of that range comes from small genomes, e.g. s=1000 over a 300 kb
# plasmid, whose bottom-sketch threshold t lifts the whole merged DB's
# survivor rate). cap = max(4096, n/128) = 0.78% of the stream covers
# that worst documented rate with ~2.6x headroom while keeping the
# survivor binary search negligible (65 K searches per 8.4 M-hash
# batch). Overflow triggers the exact in-jit fallback branch
# (lax.cond), so the result is always exact regardless of input skew
# (e.g. low-complexity poly-A runs hashing to one repeated surviving
# value).
_PREF_CAP_FLOOR = 4096
_PREF_CAP_SHIFT = 7  # cap grows as n >> 7 past the floor
# legacy per-row top_k compaction geometry (HYMET_PREF_TOPK=1)
_PREF_COLS = 4096
_PREF_CAP = 16


def _pref_cap(n: int) -> int:
    return min(n, max(_PREF_CAP_FLOOR, n >> _PREF_CAP_SHIFT))


def pref_cap_sized(n: int, survival: float) -> int:
    """Threshold-aware prefilter cap (static, host-computed).

    Expected survivors of the bottom-sketch threshold are ``n *
    survival`` where ``survival = (t + 1) / 2^64`` for the largest real
    DB hash t — query hashes are uniform whether or not they match, so
    a fully-contained genome survives at the same rate as background.
    4x headroom absorbs composition skew (Poisson noise is tiny at
    these counts); the 4096 floor and quantum keep shapes
    compile-cache-stable. The blind ``n >> 7`` heuristic (30x oversized
    at realistic Mash thresholds — and the compact bsearch AND the
    downstream count search both scale linearly in the cap) remains the
    fallback for unknown/saturated thresholds; overflow of a sized cap
    still falls back in-jit to the exact full-stream count."""
    if not (0.0 < survival <= 0.25):
        return _pref_cap(n)
    want = int(4.0 * survival * n) + 1
    return min(n, max(_PREF_CAP_FLOOR, -(-want // 4096) * 4096))


def _count_prefilter(
    db_hi,
    db_lo,
    counts,
    q_hi,
    q_lo,
    q_valid,
    db_hl=None,
    bkt2=None,
    bkt_steps=0,
    stage=0,
    pref_cap=0,
):
    """Bottom-sketch threshold prefilter count (TPU default; exact).

    A Mash sketch DB holds only each reference's s *smallest* k-mer
    hashes (bottom-s MinHash, reference ``scripts/mash.sh:14`` -v/-s
    semantics), so every DB value is <= t, the largest real DB hash —
    and t/2^64 ~= s/genome_len (~0.03-0.3%). Query hashes are uniform,
    so one 64-bit compare against t eliminates ~99.9% of them before any
    search:

      1. survivor mask: (q <= t) & valid (VPU, one pass),
      2. compact survivors densely into [cap] slots by destination-map
         inversion (``ops/compaction.slot_compact_indices``: cumsum +
         one branchless binary search — no sort, no top_k, and the cap
         is global rather than per-row so clustered survivors don't
         overflow early),
      3. binary-search count only the compacted candidates (~128x fewer
         gathers than searching the full stream).

    If more than cap hashes survive — or the DB is so dense that t's hi
    limb saturates (toy DBs sketching every k-mer) — a lax.cond falls
    back to the full-stream formulation in-jit, so the counts match
    _count_binsearch exactly in every case. HYMET_PREF_TOPK=1 selects
    the legacy per-row top_k compaction ([R, 4096] rows, 16/row) for
    on-chip A/B. Pad sentinels (all-ones) in sharded flat arrays are
    excluded from the threshold; like the other formulations, a real DB
    hash of exactly 2^64-1 (a 2^-64 event) would be treated as pad and
    never counted.
    """
    F = db_hi.shape[0]
    U = jnp.uint32(0xFFFFFFFF)
    q_hi0, q_lo0, q_valid0 = q_hi, q_lo, q_valid
    real = ~((db_hi == U) & (db_lo == U))
    n_real = jnp.sum(real.astype(jnp.int32))
    last = jnp.maximum(n_real - 1, 0)
    t_hi = db_hi[last]
    t_lo = db_lo[last]
    surv = (
        q_valid
        & (n_real > 0)
        & ((q_hi < t_hi) | ((q_hi == t_hi) & (q_lo <= t_lo)))
    )
    if stage == 2:  # bench ablation: + threshold mask
        return _cksum(surv)
    n = q_hi.shape[0]
    # read at TRACE time (this body runs under the callers' jit): the
    # compiled program is cached per shape, so toggling mid-process is a
    # silent no-op — set before the first screen call. The bench queue
    # A/Bs this via separate processes, where trace-time reads are exact.
    if os.environ.get("HYMET_PREF_TOPK") == "1":
        C = min(_PREF_COLS, n)
        R = -(-n // C)
        npad = R * C
        if npad != n:
            q_hi = jnp.concatenate([q_hi, jnp.zeros(npad - n, q_hi.dtype)])
            q_lo = jnp.concatenate([q_lo, jnp.zeros(npad - n, q_lo.dtype)])
            surv = jnp.concatenate([surv, jnp.zeros(npad - n, bool)])
        cap = min(_PREF_CAP, C)
        key = jnp.where(surv, ~q_hi, jnp.uint32(0))
        key = jax.lax.bitcast_convert_type(
            key ^ jnp.uint32(0x80000000), jnp.int32
        )
        _, idx = jax.lax.top_k(key.reshape(R, C), cap)  # [R, cap]
        gidx = (idx + (jnp.arange(R, dtype=jnp.int32) * C)[:, None]).reshape(-1)
        s_hi = jnp.take(q_hi, gidx)
        s_lo = jnp.take(q_lo, gidx)
        s_v = jnp.take(surv, gidx)
        row_surv = jnp.sum(surv.reshape(R, C).astype(jnp.int32), axis=1)
        ok = jnp.all(row_surv <= cap) & (t_hi < U)
    else:
        from hymet_tpu.ops.compaction import slot_compact_indices

        cap = pref_cap if pref_cap else _pref_cap(n)
        n_i, _, n_surv = slot_compact_indices(surv.astype(jnp.int32), cap)
        s_hi = q_hi[n_i]
        s_lo = q_lo[n_i]
        piota = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).squeeze(-1)
        s_v = piota < jnp.minimum(n_surv, cap)
        ok = (n_surv <= cap) & (t_hi < U)
        if stage == 3:  # bench ablation: + survivor compaction
            return _cksum(s_hi) + _cksum(s_lo) + _cksum(s_v)

    def fast(c):
        if db_hl is not None:
            return _count_binsearch_rows(db_hl, bkt2, bkt_steps, c, s_hi, s_lo, s_v)
        return _count_binsearch(db_hi, db_lo, c, s_hi, s_lo, s_v)

    def slow(c):
        # full-stream fallback: binary search in both regimes — the eqmm
        # branch would dominate compile time, and overflow inputs are
        # rare enough that the gather-bound path is acceptable there
        return _count_binsearch(db_hi, db_lo, c, q_hi0, q_lo0, q_valid0)

    return jax.lax.cond(ok, fast, slow, counts)


def _count_impl(
    db_hi,
    db_lo,
    counts,
    q_hi,
    q_lo,
    q_valid,
    use_eqmm=None,
    use_prefilter=None,
    db_hl=None,
    bkt2=None,
    bkt_steps=0,
    stage=0,
    pref_cap=0,
):
    """Trace-time count body shared by the standalone and fused updates.

    TPU default: the bottom-sketch prefilter (``_count_prefilter``) at
    EVERY F — measured 0.207 Gbp/s vs 0.064 for the one-hot-matmul
    formulation at the bench F=32K (round-3 A/B, docs/BENCH_NOTES.md),
    and it is the only formulation that scales to F~1e8. The eqmm path
    (round-1's 15x win over binary search) stays for A/B via
    HYMET_COUNT_EQMM=1 at F <= EQMM_MAX_F. CPU default: binary search
    (XLA-CPU gathers are fast). ``use_eqmm`` / ``use_prefilter`` pin a
    formulation for tests."""
    import os

    if use_prefilter is None:
        on_tpu = jax.default_backend() == "tpu"
        force = os.environ.get("HYMET_COUNT_PREFILTER") == "1"
        force_eqmm = os.environ.get("HYMET_COUNT_EQMM") == "1"
        # the force flag works on ANY backend (CPU-mesh tests exercise the
        # prefilter through it); on TPU it is simply the default
        use_prefilter = use_eqmm is None and (
            force or (on_tpu and not force_eqmm)
        )
    if use_prefilter and db_hi.shape[0] > 0:
        return _count_prefilter(
            db_hi, db_lo, counts, q_hi, q_lo, q_valid, db_hl, bkt2,
            bkt_steps, stage, pref_cap,
        )
    if use_eqmm is None:
        use_eqmm = jax.default_backend() == "tpu"
    if use_eqmm and 0 < db_hi.shape[0] <= EQMM_MAX_F:
        return _count_eqmm(db_hi, db_lo, counts, q_hi, q_lo, q_valid)
    return _count_binsearch(db_hi, db_lo, counts, q_hi, q_lo, q_valid)


def _count_binsearch(db_hi, db_lo, counts, q_hi, q_lo, q_valid):
    """Vectorized lower-bound binary search + scatter-add count."""
    F = db_hi.shape[0]
    steps = max(1, int(math.ceil(math.log2(F + 1))))  # F+1 insertion points

    lo = jnp.zeros_like(q_hi, dtype=jnp.int32)
    hi = jnp.full_like(lo, F)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        m_hi = db_hi[mid]
        m_lo = db_lo[mid]
        less = _less64(m_hi, m_lo, q_hi, q_lo)
        return jnp.where(less, mid + 1, lo), jnp.where(less, hi, mid)

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    pos = jnp.clip(lo, 0, F - 1)
    found = (db_hi[pos] == q_hi) & (db_lo[pos] == q_lo) & q_valid & (lo < F)
    return counts.at[pos].add(found.astype(jnp.int32))


def _screen_count_batch_impl(
    db_hi: jax.Array,  # [F] uint32 — sorted-unique flat DB hashes (hi limb)
    db_lo: jax.Array,  # [F] uint32
    counts: jax.Array,  # [F] int32 — running occurrence counts (donated)
    q_hi: jax.Array,  # [N] uint32 — query k-mer hashes
    q_lo: jax.Array,  # [N] uint32
    q_valid: jax.Array,  # [N] bool
    db_hl=None,
    bkt2=None,
    bkt_steps: int = 0,
    pref_cap: int = 0,
) -> jax.Array:
    """One streaming update: binary-search every query hash in the flat DB
    array and add its occurrence to `counts`."""
    return _count_impl(
        db_hi, db_lo, counts, q_hi, q_lo, q_valid,
        db_hl=db_hl, bkt2=bkt2, bkt_steps=bkt_steps, pref_cap=pref_cap,
    )


# Donating + non-donating variants, like the fused updates below: small
# donated-buffer update streams followed by a new compile wedge the dev
# tunnel's compile service (CLAUDE.md), so engines donate only when the
# counts buffer is big enough for the copy saving to matter.
screen_count_batch = functools.partial(
    jax.jit, donate_argnums=(2,), static_argnames=("bkt_steps", "pref_cap")
)(_screen_count_batch_impl)
screen_count_batch_nodonate = functools.partial(
    jax.jit, static_argnames=("bkt_steps", "pref_cap")
)(_screen_count_batch_impl)


def _screen_update_fused_impl(
    db_hi: jax.Array,
    db_lo: jax.Array,
    counts: jax.Array,  # donated
    codes: jax.Array,  # [B, L] uint8
    k: int,
    use_pallas: bool,
    db_hl=None,
    bkt2=None,
    bkt_steps: int = 0,
    pref_cap: int = 0,
) -> jax.Array:
    """Hash + count as ONE compiled program. Composing two separate jits
    bounces the ~75 MB of intermediate hash arrays through the host
    runtime between calls — measured 2.25 s/update over a remote-device
    link vs ~1 ms fused."""
    if use_pallas:
        from hymet_tpu.ops.pallas_kernels import kmer_hashes_pallas

        hi, lo, valid = kmer_hashes_pallas(
            codes, k, interpret=jax.default_backend() != "tpu"
        )
    else:
        hi, lo, valid = kmer_hashes_jax(codes, k)
    valid = valid.reshape(-1)
    new_counts = _count_impl(
        db_hi, db_lo, counts, hi.reshape(-1), lo.reshape(-1), valid,
        db_hl=db_hl, bkt2=bkt2, bkt_steps=bkt_steps, pref_cap=pref_cap,
    )
    # scalar valid-window count rides along (p-values need it; pulling it
    # as 4 bytes beats re-downloading the whole code batch)
    return new_counts, jnp.sum(valid.astype(jnp.int32))


def _screen_update_fused_packed_impl(
    db_hi: jax.Array,
    db_lo: jax.Array,
    counts: jax.Array,  # donated
    packed: jax.Array,  # [B, ceil(L/4)] uint8 2-bit codes
    mask: jax.Array,  # [B, ceil(L/8)] uint8 validity bits
    L: int,
    k: int,
    use_pallas: bool,
    db_hl=None,
    bkt2=None,
    bkt_steps: int = 0,
    stage: int = 0,
    pref_cap: int = 0,
) -> jax.Array:
    """screen_update_fused over 2-bit-packed input (0.375 bytes/base on
    the wire vs 1 — host->device transfer is the real-run bottleneck over
    tunneled/remote devices). The gather-free unpack fuses into the same
    program."""
    from hymet_tpu.ops.hashing import unpack_code_batch_jax

    codes = unpack_code_batch_jax(packed, mask, L)
    if use_pallas:
        from hymet_tpu.ops.pallas_kernels import kmer_hashes_pallas

        hi, lo, valid = kmer_hashes_pallas(
            codes, k, interpret=jax.default_backend() != "tpu"
        )
    else:
        hi, lo, valid = kmer_hashes_jax(codes, k)
    valid = valid.reshape(-1)
    if stage == 1:  # bench ablation: hashing only
        return _cksum(hi) + _cksum(lo) + _cksum(valid)
    new_counts = _count_impl(
        db_hi, db_lo, counts, hi.reshape(-1), lo.reshape(-1), valid,
        db_hl=db_hl, bkt2=bkt2, bkt_steps=bkt_steps, stage=stage,
        pref_cap=pref_cap,
    )
    if stage in (2, 3):
        return new_counts  # checksum tuple from the truncated prefilter
    return new_counts, jnp.sum(valid.astype(jnp.int32))


# Donation aliases `counts` in place of a copy — essential at F~1e8
# (400 MB) but worthless at small F, and streams of donated-buffer
# updates have wedged the dev tunnel's compile service when a NEW
# program compiles afterwards (CLAUDE.md; observed again round 3 as 2 h
# e2e align-compile stalls right after the screen stage). Engines pick
# the donating variant only when the buffer is big enough to matter.
screen_update_fused = functools.partial(
    jax.jit, static_argnames=("k", "use_pallas", "bkt_steps", "pref_cap"), donate_argnums=(2,)
)(_screen_update_fused_impl)
screen_update_fused_nodonate = functools.partial(
    jax.jit, static_argnames=("k", "use_pallas", "bkt_steps", "pref_cap")
)(_screen_update_fused_impl)
screen_update_fused_packed = functools.partial(
    jax.jit, static_argnames=("k", "L", "use_pallas", "bkt_steps", "stage", "pref_cap"), donate_argnums=(2,)
)(_screen_update_fused_packed_impl)
screen_update_fused_packed_nodonate = functools.partial(
    jax.jit, static_argnames=("k", "L", "use_pallas", "bkt_steps", "stage", "pref_cap")
)(_screen_update_fused_packed_impl)

# donate only past this buffer size (bytes): the copy donation saves
_DONATE_MIN_BYTES = 64 << 20


@functools.partial(jax.jit, static_argnames=("k",))
def screen_scores(
    counts: jax.Array,  # [F] int32
    ref_idx: jax.Array,  # [R, s] int32 into counts (-1 pad)
    n_hashes: jax.Array,  # [R] int32
    k: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-reference (identity, shared, median_multiplicity)."""
    valid = ref_idx >= 0
    cnt = jnp.where(valid, counts[jnp.where(valid, ref_idx, 0)], 0)  # [R, s]
    hit = cnt > 0
    shared = jnp.sum(hit, axis=1).astype(jnp.int32)  # [R]

    denom = jnp.maximum(n_hashes, 1).astype(jnp.float32)
    c = shared.astype(jnp.float32) / denom
    identity = jnp.where(
        c > 0, 1.0 + jnp.log(2.0 * c / (1.0 + c)) / float(k), 0.0
    )
    identity = jnp.maximum(identity, 0.0)

    # upper median of the shared hashes' multiplicities: sort counts with
    # non-shared pushed to +inf, take element at index shared//2
    big = jnp.int32(2**30)
    sortable = jnp.where(hit, cnt, big)
    ordered = jnp.sort(sortable, axis=1)
    mid = jnp.clip(shared // 2, 0, ref_idx.shape[1] - 1)
    median = jnp.take_along_axis(ordered, mid[:, None], axis=1)[:, 0]
    median = jnp.where(shared > 0, median, 0)
    return identity, shared, median


def binom_sf(x: int, n: int, p: float) -> float:
    """P(X >= x) for X ~ Binomial(n, p); exact log-space sum (n <= a few
    thousand — the sketch size)."""
    if x <= 0:
        return 1.0
    if p <= 0.0:
        return 0.0
    if p >= 1.0:
        return 1.0
    lp = math.log(p)
    lq = math.log1p(-p)
    total = -math.inf
    lgn = math.lgamma(n + 1)
    for i in range(x, n + 1):
        lt = lgn - math.lgamma(i + 1) - math.lgamma(n - i + 1) + i * lp + (n - i) * lq
        total = lt if total == -math.inf else max(total, lt) + math.log1p(
            math.exp(min(total, lt) - max(total, lt))
        )
    return min(1.0, math.exp(total))


class ScreenEngine:
    """Streaming mash-screen over one SketchDB (single device or one
    db-shard). Feed query k-mer hash batches; finalize to per-ref rows."""

    def __init__(self, db: SketchDB, track_kmers: bool = True):
        self.db = db
        flat, ref_idx = db.flat_index()
        # bottom-sketch survival rate for threshold-aware prefilter caps
        # (pref_cap_sized): the largest REAL flat hash over 2^64
        real = flat[flat != np.uint64(PAD_HASH)]
        self._survival = (
            (float(real.max()) + 1.0) / 2.0**64 if real.size else 0.0
        )
        hi, lo = split64(flat)
        self.db_hi = jnp.asarray(hi)
        self.db_lo = jnp.asarray(lo)
        hl, bkt2, _, steps = build_flat_search(hi, lo)
        self.db_hl = jnp.asarray(hl)
        self.bkt2 = jnp.asarray(bkt2)
        self.bkt_steps = steps
        self.counts = jnp.zeros(flat.shape[0], dtype=jnp.int32)
        self.ref_idx = jnp.asarray(ref_idx)
        self.n_hashes = jnp.asarray(db.n_hashes)
        self.total_query_kmers = 0
        # per-batch valid-window counts stay on device until finalize():
        # an int() per update would block the host on that batch's result
        # and serialize the upload/compute stream
        self._kmer_parts: list = []
        # p-values need the query k-mer count; benches disable the
        # device->host sync it costs
        self.track_kmers = track_kmers
        flag = os.environ.get("HYMET_PALLAS_HASH")
        on_tpu = jax.default_backend() == "tpu"
        self._use_pallas = flag == "1" or (flag != "0" and on_tpu)

    def update(self, q_hi, q_lo, q_valid) -> None:
        if self.db_hi.shape[0] == 0:  # empty DB: nothing to count
            if self.track_kmers:
                self.total_query_kmers += int(np.sum(np.asarray(q_valid)))
            return
        fn = (
            screen_count_batch
            if self.counts.nbytes >= _DONATE_MIN_BYTES
            else screen_count_batch_nodonate
        )
        self.counts = fn(
            self.db_hi, self.db_lo, self.counts,
            q_hi.ravel(), q_lo.ravel(), q_valid.ravel(),
            self.db_hl, self.bkt2, bkt_steps=self.bkt_steps,
            pref_cap=pref_cap_sized(int(q_hi.size), self._survival),
        )
        if self.track_kmers:
            self.total_query_kmers += int(np.sum(np.asarray(q_valid)))

    def update_codes(self, codes: jax.Array) -> None:
        """Hash a [B, L] uint8 code batch on device and stream it in.

        On TPU the fused Pallas kernel is the default (measured 26-265x
        the plain-jnp formulation on v5e); HYMET_PALLAS_HASH=0 forces the
        jnp path, =1 forces Pallas even off-TPU (interpret)."""
        if self.db_hi.shape[0] == 0:
            if self.track_kmers:
                self._count_kmers_host(codes)
            return
        fn = (
            screen_update_fused
            if self.counts.nbytes >= _DONATE_MIN_BYTES
            else screen_update_fused_nodonate
        )
        B, L = codes.shape
        self.counts, n_valid = fn(
            self.db_hi, self.db_lo, self.counts, codes, self.db.k,
            self._use_pallas, self.db_hl, self.bkt2, bkt_steps=self.bkt_steps,
            pref_cap=pref_cap_sized(B * L, self._survival),
        )
        if self.track_kmers:
            self._kmer_parts.append(n_valid)

    def update_codes_packed(self, codes: np.ndarray) -> None:
        """update_codes from a host [B, L] uint8 batch, shipping 2-bit
        packed codes + validity bits over the wire (2.7x less transfer;
        see pack_code_batch). Unpack fuses into the device program."""
        from hymet_tpu.io.fasta import pack_code_batch

        if self.db_hi.shape[0] == 0:
            if self.track_kmers:
                self._count_kmers_host(codes)
            return
        packed, mask, L = pack_code_batch(np.asarray(codes))
        self.update_staged(jnp.asarray(packed), jnp.asarray(mask), L)

    def update_staged(self, packed, mask, L: int) -> None:
        """update_codes_packed for batches already packed (and typically
        device-resident: upload-once contig sharing, pipeline/staged.py)
        — the same fused unpack+hash+count program, no host pack."""
        if self.db_hi.shape[0] == 0:
            raise ValueError("staged screen updates need a non-empty DB")
        fn = (
            screen_update_fused_packed
            if self.counts.nbytes >= _DONATE_MIN_BYTES
            else screen_update_fused_packed_nodonate
        )
        self.counts, n_valid = fn(
            self.db_hi, self.db_lo, self.counts,
            packed, mask, L, self.db.k,
            self._use_pallas, self.db_hl, self.bkt2, bkt_steps=self.bkt_steps,
            pref_cap=pref_cap_sized(packed.shape[0] * L, self._survival),
        )
        if self.track_kmers:
            self._kmer_parts.append(n_valid)

    def _count_kmers_host(self, codes) -> None:
        """Exact valid-window count (empty-DB path only — the fused kernel
        returns the count as a scalar otherwise)."""
        k = self.db.k
        arr = np.asarray(codes)
        inv = (arr >= 4).astype(np.int32)
        csum = np.concatenate(
            [np.zeros((arr.shape[0], 1), np.int32), np.cumsum(inv, axis=1)],
            axis=1,
        )
        self.total_query_kmers += int(((csum[:, k:] - csum[:, :-k]) == 0).sum())

    def finalize(self) -> "ScreenResult":
        identity, shared, median = screen_scores(
            self.counts, self.ref_idx, self.n_hashes, self.db.k
        )
        if self._kmer_parts:
            # single deferred sync for all batches (each part < 2^31:
            # one batch is at most a few Mbp of windows)
            self.total_query_kmers += sum(int(x) for x in self._kmer_parts)
            self._kmer_parts = []
        return ScreenResult(
            db=self.db,
            identity=np.asarray(identity),
            shared=np.asarray(shared),
            median=np.asarray(median),
            total_query_kmers=self.total_query_kmers,
        )


class ScreenResult:
    def __init__(self, db, identity, shared, median, total_query_kmers):
        self.db = db
        self.identity = identity
        self.shared = shared
        self.median = median
        self.total_query_kmers = total_query_kmers
        self._pvalues = None

    def slice(self, offset: int, db: "SketchDB") -> "ScreenResult":
        """Per-DB view of a merged-DB screen (see ``SketchDB.concat``):
        rows [offset, offset+db.n_refs) re-homed onto the original DB.
        Scores are per-reference and the p-value null model depends only
        on the query k-mer count and that reference's sketch size, so the
        slice is byte-identical to screening `db` alone."""
        n = db.n_refs
        return ScreenResult(
            db=db,
            identity=self.identity[offset : offset + n],
            shared=self.shared[offset : offset + n],
            median=self.median[offset : offset + n],
            total_query_kmers=self.total_query_kmers,
        )

    def pvalues(self) -> np.ndarray:
        """Null-model p-values per reference, Mash-style: probability of
        observing >= shared sketch hashes in a random query k-mer set of
        this size (binomial over the sketch).

        Approximation note: we use the total valid query k-mer count where
        Mash estimates distinct k-mers — an upper bound that makes p-values
        slightly conservative; downstream only filters at p <= 0.9
        (``mash screen -v 0.9``), which this never disturbs in practice.
        """
        if self._pvalues is not None:
            return self._pvalues
        kmer_space = float(4 ** self.db.k)
        r_null = 1.0 / (1.0 + kmer_space / max(self.total_query_kmers, 1))
        out = np.ones(self.db.n_refs)
        for i in range(self.db.n_refs):
            out[i] = binom_sf(
                int(self.shared[i]), int(self.db.n_hashes[i]), r_null
            )
        self._pvalues = out
        return out

    def rows(self) -> list:
        """mash-screen-format rows: (identity, shared/total, median, pvalue,
        ref_id, comment) — the 6 columns of screen.tab
        (consumed at ``scripts/mash.sh:15-16`` and
        ``scripts/limit_candidates.py:97-122``)."""
        pv = self.pvalues()
        out = []
        for i in range(self.db.n_refs):
            out.append(
                (
                    float(self.identity[i]),
                    f"{int(self.shared[i])}/{int(self.db.n_hashes[i])}",
                    int(self.median[i]),
                    pv[i],
                    self.db.names[i],
                    self.db.comments[i] if self.db.comments else "",
                )
            )
        return out


# ----------------------------------------------------------------------
# device-side bottom-s sketching (for DB builds / query sketch mode)


@functools.partial(jax.jit, static_argnames=("k", "cand"))
def sketch_batch_topk(codes: jax.Array, k: int, cand: int):
    """Fast device sketch candidates: bottom-`cand` k-mer hashes per row,
    selected by the hi limb via top_k of its complement (top_k compiles
    and runs far faster than multi-operand sorts on TPU).

    Returns (cand_hi, cand_lo) [B, cand]; the exact bottom-s *distinct*
    64-bit selection (Mash semantics) is finished on host by
    :func:`finish_bottom_sketch`. `cand` should be >= 2*s + slack so the
    true bottom-s distinct values are covered despite hi-limb ties and
    duplicate k-mers.
    """
    hi, lo, valid = kmer_hashes_jax(codes, k)
    neg = jnp.where(valid, ~hi, jnp.uint32(0))
    n = neg.shape[1]
    kk = min(cand, n)
    vals, idx = jax.lax.top_k(neg, kk)
    cand_hi = ~vals
    cand_lo = jnp.take_along_axis(jnp.where(valid, lo, jnp.uint32(0xFFFFFFFF)), idx, axis=1)
    return cand_hi, cand_lo


def finish_bottom_sketch(
    cand_hi: np.ndarray, cand_lo: np.ndarray, s: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Host finish for :func:`sketch_batch_topk`: per row, pack to uint64,
    de-duplicate, keep the s smallest. Returns ([B, s] uint64 PAD-padded,
    [B] counts)."""
    from hymet_tpu.ops.hashing import pack64

    B = cand_hi.shape[0]
    out = np.full((B, s), PAD_HASH, dtype=np.uint64)
    n_out = np.zeros(B, dtype=np.int32)
    saturated = np.zeros(B, dtype=bool)
    h64 = pack64(np.asarray(cand_hi), np.asarray(cand_lo))
    for i in range(B):
        uniq = np.unique(h64[i])
        uniq = uniq[uniq != PAD_HASH]
        n = min(len(uniq), s)
        out[i, :n] = uniq[:n]
        n_out[i] = n
        # candidate pool full of duplicates AND fewer distinct hashes than
        # requested: the true bottom-s may be incomplete (e.g. a highly
        # repetitive low-hash k-mer crowding the top_k slots). Also flag a
        # hi-limb tie at the s-th value against the pool's cutoff: top_k
        # selects by hi only, so an excluded (same-hi, smaller-lo) hash
        # could displace it.
        pool_full = bool((h64[i] != PAD_HASH).all())
        cutoff_tie = (
            n >= s
            and pool_full
            and (out[i, n - 1] >> np.uint64(32)) == (h64[i].max() >> np.uint64(32))
        )
        saturated[i] = (n < s and pool_full) or cutoff_tie
    if saturated.any():
        import warnings

        warnings.warn(
            f"sketch_batch_topk candidate pool saturated for rows "
            f"{np.flatnonzero(saturated).tolist()}; rerun those rows with "
            "the exact sort path or a larger cand",
            RuntimeWarning,
            stacklevel=2,
        )
    return out, n_out


@functools.partial(jax.jit, static_argnames=("k", "s"))
def sketch_batch(
    codes: jax.Array, k: int, s: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Bottom-s distinct-hash sketch per row of a [B, L] uint8 code batch.

    Returns (hi [B, s], lo [B, s], n [B]). Pure device path: hash all
    windows, lexicographic 2-key sort, mark duplicates, 3-key re-sort to
    push duplicates/invalid to the end, slice the first s.
    """
    hi, lo, valid = kmer_hashes_jax(codes, k)
    pad = jnp.uint32(0xFFFFFFFF)
    hi = jnp.where(valid, hi, pad)
    lo = jnp.where(valid, lo, pad)
    if hi.shape[1] < s:  # fewer windows than sketch size: pad columns
        extra = s - hi.shape[1]
        fill = jnp.full((hi.shape[0], extra), pad, dtype=jnp.uint32)
        hi = jnp.concatenate([hi, fill], axis=1)
        lo = jnp.concatenate([lo, fill], axis=1)
    hi_s, lo_s = jax.lax.sort((hi, lo), dimension=1, num_keys=2)
    dup = jnp.concatenate(
        [
            jnp.zeros((hi_s.shape[0], 1), dtype=jnp.uint32),
            ((hi_s[:, 1:] == hi_s[:, :-1]) & (lo_s[:, 1:] == lo_s[:, :-1])).astype(
                jnp.uint32
            ),
        ],
        axis=1,
    )
    # invalid (PAD) entries also get dup=1 so they sort last
    dup = jnp.where((hi_s == pad) & (lo_s == pad), jnp.uint32(1), dup)
    dup_s, hi_u, lo_u = jax.lax.sort((dup, hi_s, lo_s), dimension=1, num_keys=3)
    n = jnp.sum(dup_s == 0, axis=1).astype(jnp.int32)
    n = jnp.minimum(n, s)
    return hi_u[:, :s], lo_u[:, :s], n
