"""Sharded sketch screen over a ("data", "db") mesh.

The reference's three sequential sketch DBs and `mash screen -p 8`
(``run_hymet_cami.sh:83-99``, ``scripts/mash.sh:14``) become one
screen over row-sharded sketch matrices:

- reference sketches shard row-contiguously over "db" (each device holds
  its own sorted flat hash array + counts),
- query contig batches shard over "data"; each data group hashes its own
  block, then `all_gather` over "data" shares the hash stream so every db
  shard counts the full query set against its local references,
- per-shard identity/shared/median score locally; candidate rows
  concatenate on host (a pure reshard — no reduction needed because
  references are disjoint across shards).
"""

from __future__ import annotations

import functools
import math


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from hymet_tpu.io.sketchdb import SketchDB
from hymet_tpu.ops.hashing import kmer_hashes_jax
from hymet_tpu.ops.sketch import (
    ScreenResult,
    _count_impl,
    build_flat_search,
    pref_cap_sized,
    split64,
)
from hymet_tpu.parallel.mesh import fetch_global


def _pair_search_count(
    db_hi, db_lo, counts, q_hi, q_lo, q_valid, db_hl, bkt2, bkt_steps,
    pref_cap=0,
):
    """Alias of the single-device counting body (one source of truth)."""
    return _count_impl(
        db_hi, db_lo, counts, q_hi, q_lo, q_valid,
        db_hl=db_hl, bkt2=bkt2, bkt_steps=bkt_steps, pref_cap=pref_cap,
    )


class ShardedScreenEngine:
    """Multi-device ScreenEngine: same .update_codes/.finalize contract."""

    def __init__(self, mesh, db: SketchDB):
        self.mesh = mesh
        self.db = db
        n_db = mesh.shape["db"]
        self.shards = db.shard(n_db)

        flats = [s.flat_index() for s in self.shards]
        # threshold-aware prefilter cap must cover the WORST shard's
        # bottom-sketch survival (caps are static across the db axis)
        maxes = [
            float(f[0][f[0] != np.uint64(0xFFFFFFFFFFFFFFFF)].max())
            for f in flats
            if (f[0] != np.uint64(0xFFFFFFFFFFFFFFFF)).any()
        ]
        self._survival = (max(maxes) + 1.0) / 2.0**64 if maxes else 0.0
        F = max((f[0].shape[0] for f in flats), default=1)
        F = max(F, 1)
        R = max((s.n_refs for s in self.shards), default=1)
        R = max(R, 1)
        s_len = db.sketch_size

        db_hi = np.full((n_db, F), 0xFFFFFFFF, dtype=np.uint32)
        db_lo = np.full((n_db, F), 0xFFFFFFFF, dtype=np.uint32)
        ref_idx = np.full((n_db, R, s_len), -1, dtype=np.int32)
        n_hashes = np.zeros((n_db, R), dtype=np.int32)
        for i, (sh, (flat, ridx)) in enumerate(zip(self.shards, flats)):
            hi, lo = split64(flat)
            db_hi[i, : hi.shape[0]] = hi
            db_lo[i, : lo.shape[0]] = lo
            ref_idx[i, : ridx.shape[0], :] = ridx
            n_hashes[i, : sh.n_refs] = sh.n_hashes
        # gather-lean survivor-search tables, one bucket width across
        # shards so the shard_map program is uniform (pads sort last and
        # stay unreachable via the threshold/bounds)
        bits = min(20, max(1, int(math.ceil(math.log2(max(F, 2)))) - 7))
        db_hl = np.empty((n_db, F, 2), dtype=np.uint32)
        bkt2 = np.zeros((n_db, (1 << bits) + 1, 2), dtype=np.int32)
        steps = 1
        for i in range(n_db):
            hl_i, b2_i, _, st_i = build_flat_search(db_hi[i], db_lo[i], bits=bits)
            db_hl[i] = hl_i
            bkt2[i] = b2_i
            steps = max(steps, st_i)
        self.bkt_steps = steps

        db_shard = NamedSharding(mesh, P("db", None))
        db_shard3 = NamedSharding(mesh, P("db", None, None))
        self.db_hl = jax.device_put(db_hl, db_shard3)
        self.bkt2 = jax.device_put(bkt2, db_shard3)
        self.db_hi = jax.device_put(db_hi, db_shard)
        self.db_lo = jax.device_put(db_lo, db_shard)
        self.ref_idx = jax.device_put(ref_idx, db_shard3)
        self.n_hashes = jax.device_put(n_hashes, db_shard)
        self.counts = jax.device_put(
            np.zeros((n_db, F), dtype=np.int32), db_shard
        )
        self.total_query_kmers = 0
        self._kmer_parts: list = []
        self._update = self._make_update()
        self._update_packed = {}  # L -> compiled packed step
        self._score = self._make_score()

    # ------------------------------------------------------------------

    def _make_update(self):
        mesh = self.mesh
        k = self.db.k

        @jax.jit
        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(
                P("db", None),
                P("db", None),
                P("db", None, None),
                P("db", None, None),
                P("db", None),
                P("data", None),
            ),
            out_specs=(P("db", None), P("db")),
            check_vma=False,
        )
        def step(db_hi, db_lo, db_hl, bkt2, counts, codes):
            # hash the local data block, then share across the data axis
            hi, lo, valid = kmer_hashes_jax(codes, k)
            hi = jax.lax.all_gather(hi, "data").reshape(-1)
            lo = jax.lax.all_gather(lo, "data").reshape(-1)
            valid = jax.lax.all_gather(valid, "data").reshape(-1)
            new_counts = _pair_search_count(
                db_hi[0], db_lo[0], counts[0], hi, lo, valid,
                db_hl[0], bkt2[0], self.bkt_steps,
                pref_cap=pref_cap_sized(int(hi.size), self._survival),
            )[None, :]
            # valid-window count on device (identical on every db shard;
            # the host reads shard 0 at finalize) — replaces a per-call
            # 8.4M-element host cumsum mirror that dominated the sharded
            # path's single-chip overhead (round-5 probe)
            n_valid = jnp.sum(valid, dtype=jnp.int32)[None]
            return new_counts, n_valid

        return step

    def _make_update_packed(self, L: int):
        """Packed-input variant of the update step: 2-bit codes +
        validity bits shipped per data shard, unpacked on device inside
        the same program (2.7x less host->device transfer)."""
        mesh = self.mesh
        k = self.db.k

        @jax.jit
        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(
                P("db", None),
                P("db", None),
                P("db", None, None),
                P("db", None, None),
                P("db", None),
                P("data", None),
                P("data", None),
            ),
            out_specs=(P("db", None), P("db")),
            check_vma=False,
        )
        def step(db_hi, db_lo, db_hl, bkt2, counts, packed, mask):
            from hymet_tpu.ops.hashing import unpack_code_batch_jax

            codes = unpack_code_batch_jax(packed, mask, L)
            hi, lo, valid = kmer_hashes_jax(codes, k)
            hi = jax.lax.all_gather(hi, "data").reshape(-1)
            lo = jax.lax.all_gather(lo, "data").reshape(-1)
            valid = jax.lax.all_gather(valid, "data").reshape(-1)
            new_counts = _pair_search_count(
                db_hi[0], db_lo[0], counts[0], hi, lo, valid,
                db_hl[0], bkt2[0], self.bkt_steps,
                pref_cap=pref_cap_sized(int(hi.size), self._survival),
            )[None, :]
            n_valid = jnp.sum(valid, dtype=jnp.int32)[None]
            return new_counts, n_valid

        return step

    def _make_score(self):
        mesh = self.mesh
        k = self.db.k

        @jax.jit
        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P("db", None), P("db", None, None), P("db", None)),
            out_specs=(P("db", None), P("db", None), P("db", None)),
            check_vma=False,
        )
        def score(counts, ref_idx, n_hashes):
            from hymet_tpu.ops.sketch import screen_scores

            ident, shared, median = screen_scores(
                counts[0], ref_idx[0], n_hashes[0], k
            )
            return ident[None, :], shared[None, :], median[None, :]

        return score

    # ------------------------------------------------------------------

    def update_codes(self, codes: np.ndarray) -> None:
        """codes: [B, L] with B divisible by the data axis size."""
        n_data = self.mesh.shape["data"]
        B = codes.shape[0]
        if B % n_data != 0:
            pad = n_data - (B % n_data)
            codes = np.concatenate(
                [codes, np.full((pad, codes.shape[1]), 4, dtype=np.uint8)]
            )
        codes_j = jax.device_put(
            codes, NamedSharding(self.mesh, P("data", None))
        )
        self.counts, n_valid = self._update(
            self.db_hi, self.db_lo, self.db_hl, self.bkt2, self.counts, codes_j
        )
        # valid-window count stays on device until finalize (identical
        # on every db shard; read shard 0 then) — an int() here would
        # block the host on this batch
        self._kmer_parts.append(n_valid)

    def update_codes_packed(self, codes: np.ndarray) -> None:
        """update_codes shipping 2-bit packed codes + validity bits per
        data shard (see pack_code_batch; 2.7x less transfer)."""
        from hymet_tpu.io.fasta import pack_code_batch

        n_data = self.mesh.shape["data"]
        B = codes.shape[0]
        if B % n_data != 0:
            pad = n_data - (B % n_data)
            codes = np.concatenate(
                [codes, np.full((pad, codes.shape[1]), 4, dtype=np.uint8)]
            )
        packed, mask, L = pack_code_batch(codes)
        step = self._update_packed.get(L)
        if step is None:
            step = self._update_packed[L] = self._make_update_packed(L)
        sh = NamedSharding(self.mesh, P("data", None))
        self.counts, n_valid = step(
            self.db_hi,
            self.db_lo,
            self.db_hl,
            self.bkt2,
            self.counts,
            jax.device_put(packed, sh),
            jax.device_put(mask, sh),
        )
        self._kmer_parts.append(n_valid)

    def finalize(self) -> ScreenResult:
        if self._kmer_parts:
            # each part is a per-db-shard [n_db] vector with identical
            # entries; shard 0's value is the global batch count
            parts = [np.asarray(fetch_global(p)) for p in self._kmer_parts]
            self.total_query_kmers += sum(int(p[0]) for p in parts)
            self._kmer_parts = []
        ident, shared, median = self._score(
            self.counts, self.ref_idx, self.n_hashes
        )
        ident = fetch_global(ident)
        shared = fetch_global(shared)
        median = fetch_global(median)
        # reassemble per-shard rows into the global reference order
        identity = np.zeros(self.db.n_refs)
        g_shared = np.zeros(self.db.n_refs, dtype=np.int64)
        g_median = np.zeros(self.db.n_refs, dtype=np.int64)
        off = 0
        for i, sh in enumerate(self.shards):
            r = sh.n_refs
            identity[off : off + r] = ident[i, :r]
            g_shared[off : off + r] = shared[i, :r]
            g_median[off : off + r] = median[i, :r]
            off += r
        return ScreenResult(
            db=self.db,
            identity=identity,
            shared=g_shared,
            median=g_median,
            total_query_kmers=self.total_query_kmers,
        )
