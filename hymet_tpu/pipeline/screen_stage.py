"""Sketch-screen stage: mash.sh semantics over our TPU screen engine.

Reproduces reference ``scripts/mash.sh`` exactly:

- screen the pooled query k-mer stream against a sketch DB
  (``mash screen -p 8 -v 0.9``, line 14) — here the streaming TPU kernel;
- unique rows by reference id, sort by identity descending (lines 15-16);
- adaptive threshold walk: min_candidates = max(5, round(3.25 * number of
  input files)); start at the initial threshold (default 0.9), step down
  by 0.02 until >= min_candidates rows have identity STRICTLY GREATER
  than the threshold, floor 0.70; if never reached, use 0.71
  (lines 19-51 — note the reference echoes "Using 0.70" but actually
  filters with 0.71; we replicate the behavior, not the message);
- emit top_hits.tab and selected_genomes.txt (column 5 = reference id)
  (lines 54-55).

The threshold walk uses exact decimal arithmetic (the reference uses bc)
and float comparison of the printed threshold (the reference pipes the
value into awk, which parses it as a double).
"""

from __future__ import annotations

import os
from decimal import Decimal
from typing import List, Optional, Sequence, Tuple

import numpy as np

from hymet_tpu.io.fasta import encode_seq, iter_fasta
from hymet_tpu.io.sketchdb import SketchDB
from hymet_tpu.ops.sketch import ScreenEngine, ScreenResult

DEFAULT_PVALUE_MAX = 0.9  # mash screen -v 0.9 (mash.sh:14)
THRESHOLD_FLOOR = Decimal("0.70")
THRESHOLD_STEP = Decimal("0.02")
FALLBACK_THRESHOLD = 0.71  # mash.sh:48


ScreenRow = Tuple[float, str, int, float, str, str]


def screen_queries(
    db: SketchDB,
    query_files: Sequence[str],
    chunk_bp: int = 1 << 20,
    pvalue_max: float = DEFAULT_PVALUE_MAX,
    mesh=None,
) -> List[ScreenRow]:
    """Stream all query sequences through the screen engine and filter
    (see :func:`stream_screen`)."""
    res = stream_screen(db, query_files, chunk_bp=chunk_bp, mesh=mesh)
    return screen_rows_filtered(res, pvalue_max)


def stream_screen(
    db: SketchDB,
    query_files: Sequence[str],
    chunk_bp: int = 1 << 20,
    mesh=None,
    staged=None,
) -> ScreenResult:
    """Stream all sequences of all query files through the screen engine.

    Sequences are chunked to `chunk_bp` with k-1 overlap so no window is
    lost; chunks are batched as single rows (ragged batching happens in
    the engine's jit cache by chunk size). With a mesh, the db-sharded
    multi-device engine is used instead.

    ``staged`` (:class:`hymet_tpu.pipeline.staged.StagedContigs`, single
    device only): consume the upload-once device-resident batches instead
    of re-reading + re-uploading the files — whole-contig rows carry the
    same k-mer multiset as the k-1-overlapped chunk rows, so the counts
    are byte-identical.
    """
    if staged is not None and mesh is None:
        eng = ScreenEngine(db)
        for packed, mask, _rows, L in staged.device:
            eng.update_staged(packed, mask, L)
        return eng.finalize()
    if mesh is not None:
        from hymet_tpu.parallel.screen import ShardedScreenEngine

        eng = ShardedScreenEngine(mesh, db)
    else:
        eng = ScreenEngine(db)
    k = db.k

    # pack chunks into [ROWS, chunk_bp] batches: one device dispatch per
    # ROWS chunks instead of per chunk (8x fewer dispatches, and short
    # contigs share a batch instead of each paying full padding)
    ROWS = 8
    buf = np.full((ROWS, chunk_bp), 4, dtype=np.uint8)
    buf_row = 0

    def flush():
        nonlocal buf_row, buf
        if buf_row == 0:
            return
        batch = buf if buf_row == ROWS else buf[:buf_row].copy()
        # 2-bit packed upload: 2.7x less host->device transfer (the
        # sharded engine ships packed rows per data shard the same way)
        eng.update_codes_packed(batch)
        buf = np.full((ROWS, chunk_bp), 4, dtype=np.uint8)
        buf_row = 0

    for qf in query_files:
        for _, seq in iter_fasta(qf):
            codes = encode_seq(seq)
            L = codes.shape[0]
            if L < k:
                continue
            start = 0
            while start < L:
                end = min(L, start + chunk_bp)
                chunk = codes[start:end]
                if chunk.shape[0] >= k:
                    buf[buf_row, : chunk.shape[0]] = chunk
                    buf[buf_row, chunk.shape[0] :] = 4
                    buf_row += 1
                    if buf_row == ROWS:
                        flush()
                if end == L:
                    break
                start = end - (k - 1)
    flush()
    return eng.finalize()


def _pad_chunk(chunk: np.ndarray, size: int) -> np.ndarray:
    """Pad a chunk with invalid bases to a fixed size (keeps the jit cache
    to one shape per chunk size)."""
    if chunk.shape[0] == size:
        return chunk
    out = np.full(size, 4, dtype=np.uint8)
    out[: chunk.shape[0]] = chunk
    return out


def screen_rows_filtered(res: ScreenResult, pvalue_max: float) -> List[ScreenRow]:
    """mash screen emits only references with shared hashes > 0 and
    p-value <= -v threshold."""
    rows = []
    pv = res.pvalues()
    for i, row in enumerate(res.rows()):
        if res.shared[i] > 0 and pv[i] <= pvalue_max:
            rows.append(row)
    return rows


def write_screen_tab(path: str, rows: Sequence[ScreenRow]) -> None:
    """screen.tab: identity, shared/total, median-mult, p-value, ref-id,
    comment. Identity printed at 6 decimals (mash prints 6 significant
    digits; we use fixed 6 decimals — strictly more precise, and all
    downstream consumers parse it as a float)."""
    with open(path, "w", encoding="utf-8") as f:
        for ident, shared, median, pv, name, comment in rows:
            f.write(
                f"{ident:.6f}\t{shared}\t{median}\t{pv:.6g}\t{name}\t{comment}\n"
            )


def unique_sorted_rows(rows: Sequence[ScreenRow]) -> List[ScreenRow]:
    """``sort -u -k5,5`` then ``sort -gr``: one row per reference id (best
    identity wins), ordered by identity descending (mash.sh:15-16)."""
    best = {}
    for row in rows:
        name = row[4]
        if name not in best or row[0] > best[name][0]:
            best[name] = row
    return sorted(best.values(), key=lambda r: r[0], reverse=True)


def adaptive_threshold_select(
    sorted_rows: Sequence[ScreenRow],
    num_input_files: int,
    initial_threshold: float = 0.9,
) -> Tuple[List[ScreenRow], float, int]:
    """The mash.sh:19-55 walk. Returns (top_hits, threshold_used,
    min_candidates)."""
    min_candidates = max(5, int(Decimal(num_input_files) * Decimal("3.25") + Decimal("0.5")))

    identities = np.array([r[0] for r in sorted_rows])

    current = Decimal(str(initial_threshold))
    best: Optional[float] = None
    while current >= THRESHOLD_FLOOR:
        t = float(current)
        count = int((identities > t).sum())
        if count >= min_candidates:
            best = t
            break
        current -= THRESHOLD_STEP
    if best is None:
        best = FALLBACK_THRESHOLD
    top = [r for r in sorted_rows if r[0] > best]
    return top, best, min_candidates


def run_screen_stage(
    dbs: Sequence[SketchDB],
    query_files: Sequence[str],
    outdir: str,
    initial_threshold: float = 0.9,
    db_labels: Optional[Sequence[str]] = None,
    chunk_bp: int = 1 << 20,
    mesh=None,
    staged=None,
) -> List[str]:
    """Full stage over multiple sketch DBs (the reference screens sketch1,
    sketch2, sketch3 and unions the selections, ``run_hymet_cami.sh:83-98``).

    Writes per-DB screen/sorted/top_hits/selected files plus the unioned,
    de-duplicated ``selected_genomes.txt``; returns the selected ids.
    """
    os.makedirs(outdir, exist_ok=True)
    labels = list(db_labels) if db_labels else [f"db{i+1}" for i in range(len(dbs))]

    # single-pass screening: when every DB shares k (the reference's
    # sketch1-3 all do), merge their rows and stream the query set ONCE —
    # the reference re-streams per DB (run_hymet_cami.sh:83-99), which on
    # TPU would triple the upload + hash cost. Per-DB rows are recovered
    # by slicing (byte-identical to sequential screens).
    results: List[ScreenResult]
    if len(dbs) > 1 and len({db.k for db in dbs}) == 1:
        merged = SketchDB.concat(dbs)
        res = stream_screen(
            merged, query_files, chunk_bp=chunk_bp, mesh=mesh, staged=staged
        )
        results = []
        off = 0
        for db in dbs:
            results.append(res.slice(off, db))
            off += db.n_refs
    else:
        results = [
            stream_screen(
                db, query_files, chunk_bp=chunk_bp, mesh=mesh, staged=staged
            )
            for db in dbs
        ]

    union: List[str] = []
    for db, label, res in zip(dbs, labels, results):
        rows = screen_rows_filtered(res, DEFAULT_PVALUE_MAX)
        write_screen_tab(os.path.join(outdir, f"{label}_screen.tab"), rows)
        srt = unique_sorted_rows(rows)
        write_screen_tab(os.path.join(outdir, f"{label}_sorted.tab"), srt)
        top, used, _ = adaptive_threshold_select(
            srt, len(query_files), initial_threshold
        )
        write_screen_tab(os.path.join(outdir, f"{label}_top_hits.tab"), top)
        with open(
            os.path.join(outdir, f"{label}_selected_genomes.txt"), "w"
        ) as f:
            for r in top:
                f.write(r[4] + "\n")
        union.extend(r[4] for r in top)

    selected = sorted(set(union))  # sort -u (run_hymet_cami.sh:98)
    with open(os.path.join(outdir, "selected_genomes.txt"), "w") as f:
        for name in selected:
            f.write(name + "\n")
    return selected
