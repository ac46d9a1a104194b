"""Minimizer index over reference sequences.

Replaces the minimap2 ``.mmi`` index (built at ``scripts/minimap2.sh:12``
with ``-I2g`` RAM batching, cached content-addressed by the driver at
``run_hymet_cami.sh:167-171``). Layout is query-kernel-native:

- ``hashes``  [M] uint64, sorted (duplicates allowed — one entry per
  minimizer occurrence),
- ``seq_id``  [M] int32, ``pos`` [M] int32, ``strand`` [M] int8 co-sorted,
- per-sequence names/lengths (PAF tname/tlen come from here).

Sharding replaces ``-I`` batching: shards split the *sequence* dimension
(each shard indexes a subset of reference sequences) so per-shard anchor
collection and chaining stay local; per-query results concatenate.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterable, List, Optional, Sequence, Tuple

import numpy as np

from hymet_tpu.io.fasta import encode_seq, iter_fasta
from hymet_tpu.ops.minimizer import extract_minimizers_numpy


def _extract_minimizers_host(codes, k, w):
    """Native C++ extraction when built (~60x numpy), numpy fallback.
    The C++ kernel supports k <= 31 (one fewer than numpy's 32)."""
    if 1 <= k <= 31:
        try:
            from hymet_tpu.io import native_io

            if native_io.available():
                return native_io.minimizers(codes, k, w)
        except Exception:  # noqa: BLE001
            pass
    return extract_minimizers_numpy(codes, k, w)

ASM_K = 19  # minimap2 asm10 preset (-k19)
ASM_W = 19  # minimap2 asm10 preset (-w19)


@dataclass
class MinimizerIndex:
    k: int
    w: int
    hashes: np.ndarray  # [M] uint64 sorted
    seq_id: np.ndarray  # [M] int32
    pos: np.ndarray  # [M] int32
    strand: np.ndarray  # [M] int8
    names: List[str]
    lengths: np.ndarray  # [S] int64

    @property
    def n_minimizers(self) -> int:
        return int(self.hashes.shape[0])

    # ------------------------------------------------------------------

    @classmethod
    def build(
        cls,
        named_seqs: Iterable[Tuple[str, bytes]],
        k: int = ASM_K,
        w: int = ASM_W,
    ) -> "MinimizerIndex":
        names: List[str] = []
        lengths: List[int] = []
        h_parts: List[np.ndarray] = []
        s_parts: List[np.ndarray] = []
        p_parts: List[np.ndarray] = []
        st_parts: List[np.ndarray] = []
        for sid, (name, seq) in enumerate(named_seqs):
            names.append(name)
            lengths.append(len(seq))
            codes = encode_seq(seq)
            h, p, st = _extract_minimizers_host(codes, k, w)
            if h.size:
                h_parts.append(h)
                p_parts.append(p)
                st_parts.append(st)
                s_parts.append(np.full(h.shape[0], sid, dtype=np.int32))
        if h_parts:
            hashes = np.concatenate(h_parts)
            seq_id = np.concatenate(s_parts)
            pos = np.concatenate(p_parts)
            strand = np.concatenate(st_parts)
            order = np.argsort(hashes, kind="stable")
            hashes, seq_id, pos, strand = (
                hashes[order],
                seq_id[order],
                pos[order],
                strand[order],
            )
        else:
            hashes = np.zeros(0, dtype=np.uint64)
            seq_id = np.zeros(0, dtype=np.int32)
            pos = np.zeros(0, dtype=np.int32)
            strand = np.zeros(0, dtype=np.int8)
        return cls(
            k=k,
            w=w,
            hashes=hashes,
            seq_id=seq_id,
            pos=pos,
            strand=strand,
            names=names,
            lengths=np.asarray(lengths, dtype=np.int64),
        )

    @classmethod
    def build_from_fasta(
        cls, path: str, k: int = ASM_K, w: int = ASM_W
    ) -> "MinimizerIndex":
        return cls.build(iter_fasta(path), k=k, w=w)

    # ------------------------------------------------------------------

    def save(self, path: str) -> None:
        # atomic: parallel pipeline jobs share content-addressed caches,
        # and a reader must never see a half-written archive
        tmp = f"{path}.tmp.{os.getpid()}"
        np.savez_compressed(
            tmp,
            k=np.int32(self.k),
            w=np.int32(self.w),
            hashes=self.hashes,
            seq_id=self.seq_id,
            pos=self.pos,
            strand=self.strand,
            names=np.array(self.names, dtype=object),
            lengths=self.lengths,
        )
        # np.savez appends .npz when missing
        os.replace(tmp if tmp.endswith(".npz") else f"{tmp}.npz", path)

    @classmethod
    def load(cls, path: str) -> "MinimizerIndex":
        with np.load(path, allow_pickle=True) as z:
            return cls(
                k=int(z["k"]),
                w=int(z["w"]),
                hashes=z["hashes"],
                seq_id=z["seq_id"],
                pos=z["pos"],
                strand=z["strand"],
                names=[str(x) for x in z["names"]],
                lengths=z["lengths"],
            )

    # ------------------------------------------------------------------

    def shard(self, n_shards: int) -> List["MinimizerIndex"]:
        """Split by reference sequence (the ``db`` mesh axis analog of
        minimap2's -I batching — but shards are screened in parallel,
        not sequentially)."""
        S = len(self.names)
        bounds = np.linspace(0, S, n_shards + 1).astype(int)
        out = []
        for i in range(n_shards):
            lo, hi = bounds[i], bounds[i + 1]
            mask = (self.seq_id >= lo) & (self.seq_id < hi)
            out.append(
                MinimizerIndex(
                    k=self.k,
                    w=self.w,
                    hashes=self.hashes[mask],
                    seq_id=self.seq_id[mask] - lo,
                    pos=self.pos[mask],
                    strand=self.strand[mask],
                    names=self.names[lo:hi],
                    lengths=self.lengths[lo:hi],
                )
            )
        return out
