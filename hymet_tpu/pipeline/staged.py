"""Upload-once contig staging shared by the screen and align stages.

The pipeline's two device stages each consumed the same contigs from the
host: the screen packed ~1 Mbp chunk rows and the aligner packed
per-contig pad-bucket rows, so every base crossed the host->device link
twice (~36 MB packed per ~100 Mbp sample — ~10 s per crossing on the
dev tunnel's link). :class:`StagedContigs` packs the contigs ONCE, in
the aligner's exact (64-row, geometric pad bucket) layout
(:func:`hymet_tpu.models.aligner.plan_query_groups`), uploads each batch
eagerly (transfers are async, so uploads overlap the host packing of
the next batch), and both stages consume the resident buffers:

- the screen engine streams them through the same fused
  unpack+hash+count program it uses for host batches
  (``ScreenEngine.update_staged``) — the k-mer multiset of whole-contig
  rows equals the chunked layout's (chunks overlapped by k-1), so
  counts, identities, and the threshold walk are byte-identical;
- the aligner re-uses them directly (``map_batch(..., staged=...)``).

Round 5 adds **tight upload + device repack** (default; disable with
``HYMET_TIGHT_UPLOAD=0``): the padded layout is ~1.7x the real bases
(geometric pad buckets), so shipping padded bytes wastes ~40% of the
link. Instead the per-contig 2-bit segments cross the link tightly
concatenated with per-row offsets, and a small device program scatters
them into the padded [rows, Lpad/4] layout (64 contiguous
dynamic-slices — DMA copies, not random gathers). The validity bitmask
is DERIVED on device from contig lengths (zero upload bytes) whenever a
group has no ambiguous bases; groups containing N codes fall back to
uploading their mask segments tightly. Output buffers are byte-identical
to the classic path (pinned by test_pipeline staged-parity tests).

The reference streams the FASTA from disk once per stage instead
(``scripts/mash.sh:14``, ``scripts/minimap2.sh:23``); staging beats
that rather than tying it. Enabled by default on the single-device
device-chain path (``HYMET_SHARED_UPLOAD=0`` disables); the sharded
(mesh) path keeps its per-shard layouts.
"""

from __future__ import annotations

import functools
import os
from typing import List, Sequence, Tuple

import numpy as np

from hymet_tpu.io.fasta import encode_seq, pack_code_batch
from hymet_tpu.models.aligner import (
    build_group_batch,
    group_rows,
    pad_query_len,
    plan_query_groups,
)

_ALIGN = 128  # per-row segment alignment in the tight buffer


def _quantize(n: int, quantum: int) -> int:
    return -(-max(n, 1) // quantum) * quantum


def _cap_quantum(need: int) -> int:
    """Capacity quantum for tight buffers: 1/8 of the floor power of two
    (<= 12.5% relative pad, <= 8 distinct shapes per octave — compile
    cache stability without re-shipping the padding we just removed)."""
    return max(1 << 14, (1 << (max(need, 1).bit_length() - 1)) >> 3)


@functools.lru_cache(maxsize=1)
def _repack_fns():
    """Jitted device-repack programs (built lazily so importing this
    module never initializes jax backends)."""
    import jax
    import jax.numpy as jnp

    def _expand(tight, off, rlen, width):
        """[rows, width] padded rows from per-row tight segments via a
        CHUNK-ROW gather: the tight buffer reshapes to [T/ALIGN, ALIGN]
        and each padded row gathers width/ALIGN consecutive chunk rows —
        the v5e's fast gather shape (~85M rows/s for contiguous rows, vs
        ~16M scalar elem/s; a lax.scan of per-row dynamic-slices cost
        ~1.2 s/run in the first cut of this path). Bytes past the row's
        own segment zero out elementwise."""
        rows = off.shape[0]
        chunks = tight.reshape(-1, _ALIGN)
        idx = off[:, None] // _ALIGN + jnp.arange(width // _ALIGN)[None, :]
        out = chunks[idx].reshape(rows, width)
        j = jnp.arange(width, dtype=jnp.int32)
        return jnp.where(j[None, :] < rlen[:, None], out, jnp.uint8(0))

    @functools.partial(jax.jit, static_argnames=("W", "M"))
    def repack(tight_p, offp, plen, tight_m, offm, mlen, nlen, W: int, M: int):
        packed = _expand(tight_p, offp, plen, W)
        # mask: rows WITHOUT ambiguous bases derive their prefix bitmask
        # from the contig length on device (zero upload bytes) —
        # little-endian prefix bits, byte b = (1 << clip(n-8b, 0, 8)) - 1
        # (== np.packbits of a prefix-valid row, bitorder="little");
        # rows WITH N codes (mlen > 0) gather their uploaded segments
        b = jnp.arange(M, dtype=jnp.int32)
        rem = jnp.clip(nlen[:, None] - 8 * b[None, :], 0, 8).astype(jnp.uint16)
        dmask = ((jnp.uint16(1) << rem) - jnp.uint16(1)).astype(jnp.uint8)
        gmask = _expand(tight_m, offm, mlen, M)
        mask = jnp.where((mlen > 0)[:, None], gmask, dmask)
        return packed, mask

    return repack


class StagedContigs:
    """Per-contig padded code batches, packed 2-bit, device-resident.

    ``device[gi]`` is the ``(packed, mask, rows, L)`` tuple the aligner's
    dispatch path consumes; ``groups[gi]`` lists the query indices in
    that batch (row order). ``matches()`` guards against a consumer
    whose grouping parameters differ (it then rebuilds its own batches).
    """

    def __init__(
        self,
        names: Sequence[str],
        seqs: Sequence[bytes],
        batch_pad: int,
        min_len: int,
    ) -> None:
        import jax.numpy as jnp

        self.n_seqs = len(seqs)
        self.batch_pad = batch_pad
        self.min_len = min_len
        self.groups, self.fixed_rows = plan_query_groups(
            [len(s) for s in seqs], batch_pad, min_len
        )
        tight = os.environ.get("HYMET_TIGHT_UPLOAD", "1") == "1"
        self.device: List[Tuple] = []
        total = 0
        repack_fn = _repack_fns() if tight else None
        for group in self.groups:
            if not tight:
                batch = build_group_batch(
                    seqs, group, batch_pad, min_len, self.fixed_rows
                )
                packed, mask, L = pack_code_batch(batch)
                total += packed.nbytes + mask.nbytes
                # jnp.asarray enqueues an async upload to the default device
                self.device.append(
                    (jnp.asarray(packed), jnp.asarray(mask), batch.shape[0], L)
                )
                continue
            dev, nbytes = self._stage_tight(jnp, repack_fn, seqs, group)
            total += nbytes
            self.device.append(dev)
        self.packed_bytes = total

    def _stage_tight(self, jnp, repack_fn, seqs, group):
        """One group via tight upload + device repack. Byte-identical to
        the classic (build_group_batch + pack_code_batch) path."""
        Lpad = pad_query_len(
            max(max(len(seqs[i]) for i in group), self.min_len),
            self.batch_pad,
        )
        rows = group_rows(len(group), self.fixed_rows)
        W, M = Lpad // 4, Lpad // 8
        if W % _ALIGN or M % _ALIGN:
            # chunk-row gather needs row widths on the alignment grid
            # (true for every real batch_pad >= 1024); classic path else
            import jax.numpy as jnp

            batch = build_group_batch(
                seqs, group, self.batch_pad, self.min_len, self.fixed_rows
            )
            packed, mask, L = pack_code_batch(batch)
            return (
                (jnp.asarray(packed), jnp.asarray(mask), batch.shape[0], L),
                packed.nbytes + mask.nbytes,
            )
        offp = np.zeros(rows, dtype=np.int32)
        plen = np.zeros(rows, dtype=np.int32)
        offm = np.zeros(rows, dtype=np.int32)
        mlen = np.zeros(rows, dtype=np.int32)
        nlen = np.zeros(rows, dtype=np.int32)
        psegs: List[np.ndarray] = []
        msegs: List[Tuple[int, np.ndarray]] = []
        po = mo = 0
        for row, i in enumerate(group):
            codes = encode_seq(seqs[i])
            p_i, m_i, _ = pack_code_batch(codes[None, :])
            p_i, m_i = p_i[0], m_i[0]
            offp[row], plen[row] = po, p_i.nbytes
            nlen[row] = codes.size
            psegs.append(p_i)
            po += _quantize(p_i.nbytes, _ALIGN)
            # mask segments ship ONLY for rows with ambiguous bases —
            # every other row's prefix mask derives from nlen on device
            if codes.size and int(codes.max()) >= 4:
                offm[row], mlen[row] = mo, m_i.nbytes
                msegs.append((mo, m_i))
                mo += _quantize(m_i.nbytes, _ALIGN)
        # capacity: quantized for compile stability, + one row width so
        # the last row's chunk gather never reads past the buffer
        TP = _quantize(po + W, _cap_quantum(po + W))
        tight_p = np.zeros(TP, dtype=np.uint8)
        for o, seg in zip(offp[: len(group)], psegs):
            tight_p[o : o + seg.nbytes] = seg
        TM = _quantize(mo + M, _cap_quantum(max(mo, 1)))
        tight_m = np.zeros(TM, dtype=np.uint8)
        for o, seg in msegs:
            tight_m[o : o + seg.nbytes] = seg
        packed, mask = repack_fn(
            jnp.asarray(tight_p), jnp.asarray(offp), jnp.asarray(plen),
            jnp.asarray(tight_m), jnp.asarray(offm), jnp.asarray(mlen),
            jnp.asarray(nlen), W=W, M=M,
        )
        return (packed, mask, rows, Lpad), TP + TM

    def matches(self, n_seqs: int, batch_pad: int, min_len: int) -> bool:
        return (
            n_seqs == self.n_seqs
            and batch_pad == self.batch_pad
            and min_len == self.min_len
        )
