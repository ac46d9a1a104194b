"""Sharded minimizer alignment over the ("data", "db") mesh.

The minimap2 ``-I2g`` batching (reference ``scripts/minimap2.sh:12``,
``run_hymet_cami.sh:76-80``) bounded index RAM by processing reference
chunks *sequentially*; here index shards live on separate devices and are
searched *in parallel*: every db shard holds a slice of the sorted
minimizer index, receives the full (replicated) query batch, runs the
fused extract->search->slot-compact->sort->chain program locally, and
the host merges per-shard chains (reference sequences are disjoint
across shards, so the merge is pure concatenation before
primary/secondary selection).
"""

from __future__ import annotations

import functools
import logging
from typing import List, Optional, Sequence

import jax
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from hymet_tpu.io.fasta import encode_seq
from hymet_tpu.io.minimizer_index import MinimizerIndex
from hymet_tpu.io.paf import PafRecord
from hymet_tpu.models.aligner import (
    AlignerConfig,
    _chains_from_rows,
    _extract_chains_impl,
    _round_4k,
    build_search_tables,
    pad_query_len,
    emit_paf,
    expected_anchor_occ,
)
from hymet_tpu.parallel.mesh import fetch_global, fetch_global_tree


logger = logging.getLogger("hymet_tpu.aligner")


class ShardedMinimizerAligner:
    """Multi-device MinimizerAligner with the same map_batch contract."""

    def __init__(
        self,
        mesh,
        index: MinimizerIndex,
        config: Optional[AlignerConfig] = None,
    ):
        self.mesh = mesh
        self.index = index
        self.cfg = config or AlignerConfig()
        n_db = mesh.shape["db"]
        self.shards = index.shard(n_db)
        if any(len(s.names) >= (1 << 26) for s in self.shards):
            raise ValueError(
                "an index shard exceeds 2^26 sequences (packed sort-key "
                "layout); use more db shards"
            )
        # global seq-id offset per shard (shard() renumbers locally)
        bounds = np.linspace(0, len(index.names), n_db + 1).astype(int)
        self.seq_offsets = bounds[:-1]

        # per-shard gather-lean search tables (models.aligner
        # build_search_tables) padded to uniform shapes so the shard_map
        # program is identical on every db shard: one unique-hash cap,
        # one payload length, one bucket width, worst-shard step count
        import math as _math

        M = max(max((s.n_minimizers for s in self.shards), default=1), 1)
        per = [
            build_search_tables(sh.hashes, sh.seq_id, sh.pos, sh.strand)
            for sh in self.shards
        ]
        u_cap = max(max((t[6] for t in per), default=1), 1)
        bits = min(20, max(1, int(_math.ceil(_math.log2(max(u_cap, 2)))) - 7))
        per = [
            build_search_tables(
                sh.hashes, sh.seq_id, sh.pos, sh.strand, u_cap=u_cap, bits=bits
            )
            for sh in self.shards
        ]
        idx_hl = np.full((n_db, u_cap, 2), 0xFFFFFFFF, dtype=np.uint32)
        idx_roff2 = np.zeros((n_db, u_cap, 2), dtype=np.int32)
        idx_ps = np.zeros((n_db, M, 2), dtype=np.int32)
        bkt2 = np.zeros((n_db, 1 << bits, 2), dtype=np.int32)
        steps = 1
        for i, (hl, roff2, ps, b2, _, st, _) in enumerate(per):
            idx_hl[i] = hl
            idx_roff2[i] = roff2
            idx_ps[i, : ps.shape[0]] = ps
            bkt2[i] = b2
            steps = max(steps, st)
        self._bkt_bits = bits
        self._bkt_steps = steps

        db_shard = NamedSharding(mesh, P("db", None, None))
        self._bkt2 = jax.device_put(bkt2, db_shard)
        self._idx_hl = jax.device_put(idx_hl, db_shard)
        self._idx_roff2 = jax.device_put(idx_roff2, db_shard)
        self._idx_ps = jax.device_put(idx_ps, db_shard)
        self._collect_cache = {}
        # sticky overflow-retry multipliers (see _finish_batch)
        self._cap_boost = 1
        self._acap_boost = 1
        self._ccap_boost = 1
        # worst shard's occurrence expectation (uniform program: every
        # shard runs with the same anchor cap)
        self._exp_occ = max(
            (
                expected_anchor_occ(s.hashes, self.cfg.max_occ)
                for s in self.shards
                if s.n_minimizers > 0
            ),
            default=1.0,
        )

    def _get_collect(self, cap: int, acap: int, ccap: int):
        key = (cap, acap, ccap)
        if key in self._collect_cache:
            return self._collect_cache[key]
        mesh = self.mesh
        cfg = self.cfg
        k, w = self.index.k, self.index.w

        @jax.jit
        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(
                P("db", None, None),
                P("db", None, None),
                P("db", None, None),
                P("db", None, None),
                P(),
            ),
            out_specs=(
                P("db", None, None),
                P("db"),
                P("db"),
                P("db"),
            ),
            check_vma=False,
        )
        def collect(i_hl, i_roff2, i_ps, b2, batch):
            # the fully-fused single-device path runs per shard against the
            # local index slice (extraction is recomputed per shard — cheap
            # relative to any host round trip); chains segment on device,
            # so only [ccap, 8] chain rows per shard reach the host
            chains, n_chains, n_kept, n_anchors = _extract_chains_impl(
                i_hl[0],
                i_roff2[0],
                i_ps[0],
                batch,
                k,
                w,
                cfg.max_occ,
                cfg.band_bits,
                cap,
                acap,
                ccap,
                cfg.min_cnt,
                cfg.min_mlen,
                b2[0],
                self._bkt_bits,
                self._bkt_steps,
            )
            return (
                chains[None, :, :],
                n_chains[None],
                n_kept[None],
                n_anchors[None],
            )

        self._collect_cache[key] = collect
        return collect

    # ------------------------------------------------------------------

    def map_batch(
        self, names: Sequence[str], seqs: Sequence[bytes]
    ) -> List[PafRecord]:
        k, w = self.index.k, self.index.w
        cfg = self.cfg
        records: List[PafRecord] = []
        if self.index.n_minimizers == 0:
            return records

        per_query: dict = {i: [] for i in range(len(seqs))}
        # one padded batch (simpler than the single-device bucketing; the
        # sharded path targets large uniform workloads)
        pad = pad_query_len(max(max((len(s) for s in seqs), default=1), k + w), cfg.batch_pad)
        groups = [
            list(range(base, min(base + 64, len(seqs))))
            for base in range(0, len(seqs), 64)
        ]

        def _build(group) -> np.ndarray:
            rows = 64 if len(seqs) >= 64 else len(group)
            batch = np.full((rows, pad), 4, dtype=np.uint8)
            for row, i in enumerate(group):
                codes = encode_seq(seqs[i])
                batch[row, : codes.shape[0]] = codes
            return batch

        # dispatch-ahead pipeline (same shape as MinimizerAligner.map_batch):
        # the next groups' shard_map programs are enqueued before this
        # group's results are fetched, overlapping host batch building and
        # chain merging with device compute
        pending: dict = {}
        lookahead = 4
        for gi, group in enumerate(groups):
            for gj in range(gi, min(gi + lookahead, len(groups))):
                if gj not in pending:
                    pending[gj] = self._dispatch_batch(_build(groups[gj]))
            for ch in self._finish_batch(pending.pop(gi)):
                per_query[group[ch.qid]].append(ch)

        for i, name in enumerate(names):
            records.extend(
                emit_paf(
                    name,
                    len(seqs[i]),
                    per_query[i],
                    self.index.names,
                    self.index.lengths,
                    k,
                    cfg,
                )
            )
        return records

    def _chains_for_batch(self, batch: np.ndarray):
        return self._finish_batch(self._dispatch_batch(batch))

    def _dispatch_batch(self, batch: np.ndarray):
        """Enqueue the sharded program for one batch without blocking."""
        k = self.index.k
        repl = NamedSharding(self.mesh, P())
        B, L = batch.shape
        NW = L - k - self.index.w + 2
        density = 2.0 / (self.index.w + 1)
        cap = min(_round_4k(B * NW * density * 1.35) * self._cap_boost, B * NW)
        # occurrence-informed anchor cap (see MinimizerAligner._dispatch_batch)
        exp_anchors = B * NW * density * self._exp_occ
        acap = min(_round_4k(1.5 * exp_anchors), 4 * cap)
        acap *= self._acap_boost
        ccap = max(1024, min(4 * cap, 1 << 15)) * self._ccap_boost
        batch_j = jax.device_put(batch, repl)
        outs = self._get_collect(cap, acap, ccap)(
            self._idx_hl,
            self._idx_roff2,
            self._idx_ps,
            self._bkt2,
            batch_j,
        )
        return (cap, acap, ccap, batch_j, outs)

    def _finish_batch(self, pending):
        """Block on a pending handle, retrying with doubled (sticky) caps
        on overflow."""
        k = self.index.k
        cap, acap, ccap, batch_j, outs = pending
        while True:
            c_rows, n_chains, n_kept, n_anchors = outs
            n_kept, n_anchors, n_chains_h = fetch_global_tree(
                (n_kept, n_anchors, n_chains)
            )
            if int(np.asarray(n_kept).max()) > cap:
                logger.info(
                    "minimizer overflow (%d > %d): doubling cap (recompile)",
                    int(np.asarray(n_kept).max()), cap,
                )
                cap *= 2
                self._cap_boost *= 2
            elif int(np.asarray(n_anchors).max()) > acap:
                logger.info(
                    "anchor overflow (%d > %d): doubling acap (recompile)",
                    int(np.asarray(n_anchors).max()), acap,
                )
                acap *= 2
                self._acap_boost *= 2
            elif int(np.asarray(n_chains_h).max()) > ccap:
                logger.info(
                    "chain overflow (%d > %d): doubling ccap (recompile)",
                    int(np.asarray(n_chains_h).max()), ccap,
                )
                ccap *= 2
                self._ccap_boost *= 2
            else:
                break
            outs = self._get_collect(cap, acap, ccap)(
                self._idx_hl,
                self._idx_roff2,
                self._idx_ps,
                self._bkt2,
                batch_j,
            )
        c_rows = fetch_global(c_rows)
        n_chains = np.asarray(n_chains_h)

        chains = []
        for shard_i in range(c_rows.shape[0]):
            n = int(n_chains[shard_i])
            if n == 0:
                continue
            chains.extend(
                _chains_from_rows(
                    c_rows[shard_i, :n],
                    k,
                    seq_offset=int(self.seq_offsets[shard_i]),
                )
            )
        return chains
