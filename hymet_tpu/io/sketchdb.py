"""Sketch database: our Mash-equivalent reference sketch format.

Replaces the reference's ``data/sketch1-3.msh`` Cap'n Proto files
(``main.pl:44-46``; external downloads) with a columnar npz layout designed
for device streaming:

- per-reference bottom-s MinHash sketches, hash-compatible with Mash
  (MurmurHash3_x64_128 seed 42, canonical k-mers, k>16 => 64-bit),
- a flattened, de-duplicated, sorted hash array + per-reference index
  matrix, the exact structures the TPU screen kernel binary-searches and
  scatter-adds into (cf. :mod:`hymet_tpu.ops.sketch`).

The flat layout is also what gets sharded row-contiguously across the
``db`` mesh axis for multi-device screening.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from hymet_tpu.io.fasta import encode_seq, iter_fasta
from hymet_tpu.ops.hashing import kmer_hashes_host

PAD_HASH = np.uint64(0xFFFFFFFFFFFFFFFF)


@dataclass
class SketchDB:
    k: int
    sketch_size: int
    hashes: np.ndarray  # [R, s] uint64, sorted ascending per row, PAD_HASH padded
    n_hashes: np.ndarray  # [R] int32 — actual sketch sizes
    names: List[str]  # reference ids (col 5 of screen output)
    lengths: np.ndarray  # [R] int64 — total genome bp (for p-values)
    comments: List[str] = field(default_factory=list)

    # lazily built flat structures for the screen kernel
    _flat: Optional[Tuple[np.ndarray, np.ndarray]] = None

    @property
    def n_refs(self) -> int:
        return len(self.names)

    # ------------------------------------------------------------------

    def flat_index(self) -> Tuple[np.ndarray, np.ndarray]:
        """(flat_hashes [F] uint64 sorted unique, ref_idx [R, s] int32 into
        flat_hashes, -1 padded). The screen kernel counts query k-mer
        occurrences per flat hash, then gathers counts per reference row."""
        if self._flat is None:
            valid_mask = self.hashes != PAD_HASH
            all_h = self.hashes[valid_mask]
            flat = np.unique(all_h)  # sorted unique
            ref_idx = np.full(self.hashes.shape, -1, dtype=np.int32)
            pos = np.searchsorted(flat, self.hashes[valid_mask])
            ref_idx[valid_mask] = pos.astype(np.int32)
            self._flat = (flat, ref_idx)
        return self._flat

    # ------------------------------------------------------------------

    def save(self, path: str) -> None:
        # atomic (tmp + rename): cache directories are shared by parallel
        # jobs and readers must never see a half-written archive
        tmp = f"{path}.tmp.{os.getpid()}"
        np.savez_compressed(
            tmp,
            k=np.int32(self.k),
            sketch_size=np.int32(self.sketch_size),
            hashes=self.hashes,
            n_hashes=self.n_hashes,
            names=np.array(self.names, dtype=object),
            lengths=self.lengths,
            comments=np.array(self.comments or [""] * self.n_refs, dtype=object),
        )
        os.replace(tmp if tmp.endswith(".npz") else f"{tmp}.npz", path)

    @classmethod
    def load(cls, path: str) -> "SketchDB":
        with np.load(path, allow_pickle=True) as z:
            return cls(
                k=int(z["k"]),
                sketch_size=int(z["sketch_size"]),
                hashes=z["hashes"],
                n_hashes=z["n_hashes"],
                names=[str(x) for x in z["names"]],
                lengths=z["lengths"],
                comments=[str(x) for x in z["comments"]],
            )

    # ------------------------------------------------------------------

    @classmethod
    def from_msh(cls, path: str) -> "SketchDB":
        """Load a real Mash ``.msh`` (Cap'n Proto) sketch database — the
        format of the reference's shipped ``data/sketch1-3.msh``
        (``main.pl:44-46``, ``README.md:164-193``). See
        :mod:`hymet_tpu.io.msh`."""
        from hymet_tpu.io.msh import sketchdb_from_msh

        return sketchdb_from_msh(path)

    def to_msh(self, path: str) -> None:
        """Export as a Mash-compatible ``.msh`` file."""
        from hymet_tpu.io.msh import msh_from_sketchdb

        msh_from_sketchdb(self, path)

    @classmethod
    def concat(cls, dbs: Sequence["SketchDB"]) -> "SketchDB":
        """Row-concatenate DBs with the same k into one screening DB.

        The reference screens sketch1..3 sequentially, re-streaming the
        full query set per DB (``run_hymet_cami.sh:83-99``); a merged DB
        lets one device pass score all references, with per-DB rows
        recovered by :meth:`hymet_tpu.ops.sketch.ScreenResult.slice`
        (per-reference scores depend only on that reference's hashes, so
        merged results are identical to sequential ones)."""
        ks = {db.k for db in dbs}
        if len(ks) != 1:
            raise ValueError(f"cannot concat sketch DBs with mixed k: {ks}")
        s = max(db.hashes.shape[1] for db in dbs)
        rows = []
        for db in dbs:
            h = db.hashes
            if h.shape[1] < s:
                pad = np.full(
                    (h.shape[0], s - h.shape[1]), PAD_HASH, dtype=np.uint64
                )
                h = np.concatenate([h, pad], axis=1)
            rows.append(h)
        return cls(
            k=dbs[0].k,
            sketch_size=max(db.sketch_size for db in dbs),
            hashes=np.concatenate(rows, axis=0),
            n_hashes=np.concatenate([db.n_hashes for db in dbs]),
            names=[n for db in dbs for n in db.names],
            lengths=np.concatenate([db.lengths for db in dbs]),
            comments=[
                c
                for db in dbs
                for c in (db.comments or [""] * db.n_refs)
            ],
        )

    def shard(self, n_shards: int) -> List["SketchDB"]:
        """Row-contiguous reference shards for the ``db`` mesh axis."""
        out = []
        bounds = np.linspace(0, self.n_refs, n_shards + 1).astype(int)
        for i in range(n_shards):
            lo, hi = bounds[i], bounds[i + 1]
            out.append(
                SketchDB(
                    k=self.k,
                    sketch_size=self.sketch_size,
                    hashes=self.hashes[lo:hi],
                    n_hashes=self.n_hashes[lo:hi],
                    names=self.names[lo:hi],
                    lengths=self.lengths[lo:hi],
                    comments=self.comments[lo:hi] if self.comments else [],
                )
            )
        return out


def load_sketch_db(path: str) -> "SketchDB":
    """Load a sketch DB by extension: ``.msh`` (real Mash Cap'n Proto
    files — the reference's shipped DB format) or our ``.npz`` layout."""
    if path.endswith(".msh"):
        return SketchDB.from_msh(path)
    return SketchDB.load(path)


def bottom_sketch_from_hashes(
    hashes: np.ndarray, s: int
) -> Tuple[np.ndarray, int]:
    """Bottom-s of the *distinct* hash set (Mash semantics). Returns a
    length-s array (PAD_HASH padded) and the true count."""
    uniq = np.unique(hashes)  # sorted
    n = min(len(uniq), s)
    out = np.full(s, PAD_HASH, dtype=np.uint64)
    out[:n] = uniq[:n]
    return out, n


def sketch_genome_file(
    path: str, k: int, s: int
) -> Tuple[np.ndarray, int, int]:
    """Sketch one genome FASTA (all sequences pooled, Mash's per-file
    default). Returns (sketch [s], n_hashes, total_bp)."""
    parts: List[np.ndarray] = []
    total_bp = 0
    for _, seq in iter_fasta(path):
        total_bp += len(seq)
        codes = encode_seq(seq)
        h = kmer_hashes_host(codes, k)
        if h.size:
            parts.append(h)
    if parts:
        sketch, n = bottom_sketch_from_hashes(np.concatenate(parts), s)
    else:
        sketch, n = np.full(s, PAD_HASH, dtype=np.uint64), 0
    return sketch, n, total_bp


def build_sketch_db(
    genome_files: Sequence[str],
    k: int = 21,
    sketch_size: int = 1000,
    names: Optional[Sequence[str]] = None,
) -> SketchDB:
    """Build a reference sketch DB from genome FASTA files (host path;
    the device sketching path lives in ops/sketch.py)."""
    R = len(genome_files)
    hashes = np.full((R, sketch_size), PAD_HASH, dtype=np.uint64)
    n_hashes = np.zeros(R, dtype=np.int32)
    lengths = np.zeros(R, dtype=np.int64)
    use_names = list(names) if names is not None else [
        os.path.basename(p) for p in genome_files
    ]
    for i, path in enumerate(genome_files):
        hashes[i], n_hashes[i], lengths[i] = sketch_genome_file(path, k, sketch_size)
    return SketchDB(
        k=k,
        sketch_size=sketch_size,
        hashes=hashes,
        n_hashes=n_hashes,
        names=use_names,
        lengths=lengths,
        comments=[""] * R,
    )


def build_sketch_db_from_sequences(
    named_seqs: Iterable[Tuple[str, bytes]], k: int = 21, sketch_size: int = 1000
) -> SketchDB:
    """Sketch individual sequences (one sketch per sequence — Mash's
    ``-i`` mode; used for custom DBs built from a combined FASTA)."""
    names: List[str] = []
    rows: List[np.ndarray] = []
    counts: List[int] = []
    lens: List[int] = []
    for name, seq in named_seqs:
        codes = encode_seq(seq)
        h = kmer_hashes_host(codes, k)
        sk, n = bottom_sketch_from_hashes(h, sketch_size)
        names.append(name)
        rows.append(sk)
        counts.append(n)
        lens.append(len(seq))
    return SketchDB(
        k=k,
        sketch_size=sketch_size,
        hashes=np.stack(rows) if rows else np.zeros((0, sketch_size), dtype=np.uint64),
        n_hashes=np.asarray(counts, dtype=np.int32),
        names=names,
        lengths=np.asarray(lens, dtype=np.int64),
        comments=[""] * len(names),
    )
