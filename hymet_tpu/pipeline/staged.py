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

The reference streams the FASTA from disk once per stage instead
(``scripts/mash.sh:14``, ``scripts/minimap2.sh:23``); staging beats
that rather than tying it. Enabled by default on the single-device
device-chain path (``HYMET_SHARED_UPLOAD=0`` disables); the sharded
(mesh) path keeps its per-shard layouts.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from hymet_tpu.io.fasta import pack_code_batch
from hymet_tpu.models.aligner import build_group_batch, plan_query_groups


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
        self.device: List[Tuple] = []
        total = 0
        for group in self.groups:
            batch = build_group_batch(
                seqs, group, batch_pad, min_len, self.fixed_rows
            )
            packed, mask, L = pack_code_batch(batch)
            total += packed.nbytes + mask.nbytes
            # jnp.asarray enqueues an async upload to the default device
            self.device.append(
                (jnp.asarray(packed), jnp.asarray(mask), batch.shape[0], L)
            )
        self.packed_bytes = total

    def matches(self, n_seqs: int, batch_pad: int, min_len: int) -> bool:
        return (
            n_seqs == self.n_seqs
            and batch_pad == self.batch_pad
            and min_len == self.min_len
        )
