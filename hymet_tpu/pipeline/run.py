"""End-to-end classification run: the ``run_hymet_cami.sh`` replacement.

Stage layout and intermediate files mirror the reference batch driver:

  1. sketch screen over 1..N sketch DBs -> selected_genomes.txt
     (``run_hymet_cami.sh:82-99``)
  2. candidate limiting (``:101-126``)
  3. reference set build, cached content-addressed by
     sha1(selected_genomes.txt) (``:129-165``)
  4. minimizer index + mapping -> resultados.paf (``:167-171``;
     the .mmi cache becomes a .npz minimizer-index cache)
  5. weighted-LCA classification -> classified_sequences.tsv (``:174-180``)
     with the first-hit fallback when <2 rows (``:182-206``)
  6. CAMI export -> <sample>.cami.tsv (``:214-218``)

Every stage is idempotent: outputs found on disk are reused (the
reference's stage-skip semantics).
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import time
from typing import List, Optional

from hymet_tpu.io.fasta import read_fasta
from hymet_tpu.io.minimizer_index import MinimizerIndex
from hymet_tpu.io.paf import write_paf
from hymet_tpu.io.sketchdb import SketchDB, load_sketch_db
from hymet_tpu.models.aligner import AlignerConfig, MinimizerAligner
from hymet_tpu.models.first_hit import (
    build_id_map,
    classify_first_hit,
    write_fallback_classified,
)
from hymet_tpu.models.weighted_lca import classify_paf
from hymet_tpu.pipeline.candidates import limit_candidates_files
from hymet_tpu.pipeline.reference_stage import (
    AssemblySummarySource,
    LocalGenomeCatalog,
    build_reference_set,
)
from hymet_tpu.pipeline.screen_stage import run_screen_stage
from hymet_tpu.taxonomy.db import TaxonomyDB
from hymet_tpu.utils.config import RunConfig

logger = logging.getLogger("hymet_tpu.run")

# HBM-resident aligner cache (see _stage_align): (idx_path, mtime, size,
# cfg fingerprint) -> MinimizerAligner whose search tables already live
# on device. Small LRU — candidate indices are a few hundred MB of HBM
# each; two slots cover alternating samples without churn. Disable with
# HYMET_RESIDENT_INDEX=0.
_RESIDENT_ALIGNERS: dict = {}
_RESIDENT_MAX = 2


def _resident_key(idx_path: str, aln_cfg: AlignerConfig, run_cfg=None):
    try:
        st = os.stat(idx_path)
    except OSError:
        return None
    kw = (run_cfg.align_k, run_cfg.align_w) if run_cfg is not None else ()
    return (os.path.abspath(idx_path), st.st_mtime_ns, st.st_size,
            repr(aln_cfg), kw)


def _resident_aligner_get(idx_path, aln_cfg, run_cfg):
    if os.environ.get("HYMET_RESIDENT_INDEX", "1") != "1":
        return None
    if run_cfg.force_download:
        return None
    key = _resident_key(idx_path, aln_cfg, run_cfg)
    if key is None:
        return None
    aligner = _RESIDENT_ALIGNERS.get(key)
    if aligner is not None:  # LRU refresh
        _RESIDENT_ALIGNERS.pop(key)
        _RESIDENT_ALIGNERS[key] = aligner
    return aligner


def _resident_aligner_put(idx_path, aln_cfg, aligner) -> None:
    if os.environ.get("HYMET_RESIDENT_INDEX", "1") != "1":
        return
    key = _resident_key(idx_path, aln_cfg)
    if key is None:
        return
    # the stored key must match what a later get() computes: thread the
    # index's own k/w (they equal run_cfg's by construction here)
    key = key[:4] + ((aligner.index.k, aligner.index.w),)
    _RESIDENT_ALIGNERS[key] = aligner
    while len(_RESIDENT_ALIGNERS) > _RESIDENT_MAX:
        _RESIDENT_ALIGNERS.pop(next(iter(_RESIDENT_ALIGNERS)))


class ClassificationRun:
    def __init__(self, config: RunConfig):
        self.cfg = config
        self.workdir = os.path.join(config.outdir, "work")
        self.timings = {}
        self._staged = None  # upload-once contig batches (_stage_contigs)
        self._contigs = None  # (names, seqs) read once for both stages

    # ------------------------------------------------------------------

    def execute(self) -> str:
        """Run all stages; returns the path to classified_sequences.tsv.

        Multihost (``jax.distributed`` initialized, process_count > 1):
        every process executes every stage — device stages participate in
        the global-mesh collectives, host stages recompute identically —
        but non-primary processes write to private scratch dirs so the
        primary's ``outdir``/``cache_root`` stay race-free on shared
        filesystems. Process 0's outputs are canonical (the reference's
        single-writer emission, SURVEY §2.6 / §5 distributed rows)."""
        cfg = self.cfg
        self._setup_multihost()
        cfg = self.cfg
        if not cfg.input_fasta or not os.path.exists(cfg.input_fasta):
            raise FileNotFoundError(f"missing FASTA {cfg.input_fasta}")
        os.makedirs(self.workdir, exist_ok=True)
        os.makedirs(os.path.join(cfg.outdir, "logs"), exist_ok=True)

        self._stage_contigs()
        if cfg.reference_fasta:
            # preset combined reference (bench subset / ablation mode):
            # candidate selection is moot
            combined, taxonomy_tsv = self._stage_reference_preset()
        else:
            selected_path = self._stage_screen()
            self._stage_limit(selected_path)
            combined, taxonomy_tsv = self._stage_reference(selected_path)
        paf_path = self._stage_align(combined)
        classified = self._stage_classify(paf_path, taxonomy_tsv)
        self._stage_export(classified)
        self._write_metadata()
        self._sync("run-end")
        return classified

    def _setup_multihost(self) -> None:
        """Detect jax.distributed and redirect non-primary writes."""
        self._multihost = False
        try:
            import jax

            self._multihost = jax.process_count() > 1
        except Exception:  # noqa: BLE001 — jax may be uninitialized
            return
        if not self._multihost or jax.process_index() == 0:
            return
        import dataclasses

        pid = jax.process_index()
        cfg = self.cfg
        self.cfg = dataclasses.replace(
            cfg,
            outdir=f"{cfg.outdir}.proc{pid}",
            cache_root=f"{cfg.cache_root}.proc{pid}",
        )
        self.workdir = os.path.join(self.cfg.outdir, "work")
        logger.info("multihost: process %d writes to %s", pid, self.cfg.outdir)

    def _sync(self, tag: str) -> None:
        if getattr(self, "_multihost", False):
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"hymet_{tag}")

    # ------------------------------------------------------------------

    def _timed(self, name: str, fn):
        t0 = time.time()
        profile_root = self._profile_root()
        if profile_root:
            import jax

            trace_dir = os.path.join(profile_root, name)
            os.makedirs(trace_dir, exist_ok=True)
            logger.info("[stage %s] profiling to %s", name, trace_dir)
            with jax.profiler.trace(trace_dir):
                out = fn()
        else:
            out = fn()
        self.timings[name] = time.time() - t0
        logger.info("[stage %s] %.2fs", name, self.timings[name])
        return out

    def _profile_root(self) -> Optional[str]:
        """Per-stage ``jax.profiler`` trace directory root, or None.

        The reference wraps every stage in ``/usr/bin/time -v``
        (bench/lib/measure.sh:46); the TPU-native analog (SURVEY §5
        tracing) adds XLA-level traces: ``HYMET_PROFILE=1`` writes
        ``<outdir>/logs/profile/<stage>/``, any other value is used as the
        root directory itself. Traces load in TensorBoard / xprof.
        """
        flag = os.environ.get("HYMET_PROFILE", "")
        if not flag:
            return None
        if flag == "1":
            return os.path.join(self.cfg.outdir, "logs", "profile")
        return flag

    def _stage_contigs(self) -> None:
        """Upload-once contig staging (pipeline/staged.py): read + pack +
        upload the sample a single time for both device stages. Single
        device, device-chain path only — the sharded engines ship their
        own per-shard layouts, and the host-chain aligner consumes
        unpacked rows. HYMET_SHARED_UPLOAD=0 disables."""
        cfg = self.cfg
        self._staged = None
        self._contigs = None
        if (
            os.environ.get("HYMET_SHARED_UPLOAD", "1") != "1"
            or os.environ.get("HYMET_HOST_CHAINS", "0") == "1"
            or self._mesh() is not None
        ):
            return

        def run():
            from hymet_tpu.pipeline.staged import StagedContigs

            qnames, qseqs = read_fasta(cfg.input_fasta)
            self._contigs = (qnames, qseqs)
            self._staged = StagedContigs(
                qnames, qseqs, cfg.align_batch_pad, cfg.align_k + cfg.align_w
            )
            logger.info(
                "staged %d contigs: %d device batches, %.1f MB packed "
                "(uploaded once for screen + align)",
                len(qseqs),
                len(self._staged.device),
                self._staged.packed_bytes / 1e6,
            )

        self._timed("upload", run)

    def _stage_screen(self) -> str:
        cfg = self.cfg
        selected = os.path.join(self.workdir, "selected_genomes.txt")
        if os.path.exists(selected) and os.path.getsize(selected) > 0:
            logger.info("screen outputs exist; skipping")
            return selected

        def run():
            dbs = [load_sketch_db(p) for p in cfg.sketch_dbs]
            if not dbs:
                raise RuntimeError("no sketch DBs configured (cfg.sketch_dbs)")
            labels = [
                os.path.splitext(os.path.basename(p))[0] for p in cfg.sketch_dbs
            ]
            mesh = self._mesh()
            return run_screen_stage(
                dbs,
                [cfg.input_fasta],
                self.workdir,
                initial_threshold=cfg.mash_thresh,
                db_labels=labels,
                chunk_bp=cfg.screen_chunk_bp,
                mesh=mesh,
                staged=self._staged,
            )

        self._timed("screen", run)
        return selected

    def _mesh(self):
        """("data","db") mesh when multi-device sharding is configured
        (db_shards > 1) and enough devices exist; None = single device."""
        cfg = self.cfg
        if cfg.db_shards <= 1:
            return None
        import jax

        if len(jax.devices()) < cfg.db_shards:
            logger.warning(
                "db_shards=%d but only %d devices; running single-device",
                cfg.db_shards,
                len(jax.devices()),
            )
            return None
        from hymet_tpu.parallel.mesh import make_mesh

        n = len(jax.devices())
        data = max(1, n // cfg.db_shards)
        return make_mesh(data=data, db=cfg.db_shards, devices=jax.devices()[: data * cfg.db_shards])

    def _stage_limit(self, selected_path: str) -> None:
        cfg = self.cfg
        score_files = [
            os.path.join(self.workdir, f)
            for f in os.listdir(self.workdir)
            if f.endswith("_sorted.tab")
        ]
        limited = selected_path + ".limited"
        self._timed(
            "limit",
            lambda: limit_candidates_files(
                selected_path,
                limited,
                sorted(score_files),
                max_candidates=cfg.cand_max,
                dedupe=cfg.species_dedup,
                assembly_dir=cfg.assembly_summary_dir,
                log_path=cfg.cand_limit_log,
            ),
        )
        os.replace(limited, selected_path)
        n = sum(1 for _ in open(selected_path))
        if n == 0:
            raise RuntimeError("candidate list empty after applying limit")

    def _stage_reference_preset(self):
        cfg = self.cfg
        src = cfg.reference_fasta
        st = os.stat(src)
        key = hashlib.sha1(
            f"{os.path.abspath(src)}:{st.st_size}:{int(st.st_mtime)}".encode()
        ).hexdigest()
        cache_dir = os.path.join(cfg.cache_root, key)
        combined = os.path.join(cache_dir, "combined_genomes.fasta")
        taxonomy = os.path.join(cache_dir, "detailed_taxonomy.tsv")
        if os.path.exists(combined) and os.path.getsize(combined) > 0:
            logger.info("preset reference cache hit for %s", key)
            return combined, taxonomy

        from hymet_tpu.pipeline.reference_stage import build_reference_from_combined

        self._timed(
            "reference",
            lambda: build_reference_from_combined(src, cache_dir, cfg.seqid2taxid),
        )
        return combined, taxonomy

    def _cache_key(self, selected_path: str) -> str:
        with open(selected_path, "rb") as f:
            return hashlib.sha1(f.read()).hexdigest()

    def _stage_reference(self, selected_path: str):
        cfg = self.cfg
        key = self._cache_key(selected_path)
        cache_dir = os.path.join(cfg.cache_root, key)
        combined = os.path.join(cache_dir, "combined_genomes.fasta")
        taxonomy = os.path.join(cache_dir, "detailed_taxonomy.tsv")
        logger.info("cache key %s -> %s", key, cache_dir)
        if cfg.force_download:
            for p in (combined, taxonomy):
                if os.path.exists(p):
                    os.remove(p)
        if os.path.exists(combined) and os.path.getsize(combined) > 0:
            logger.info("cache hit for %s", key)
            return combined, taxonomy

        with open(selected_path) as f:
            names = [line.strip() for line in f if line.strip()]

        catalog = None
        if cfg.genome_catalog:
            if os.path.isdir(cfg.genome_catalog):
                catalog = LocalGenomeCatalog.from_directory(
                    cfg.genome_catalog, cfg.seqid2taxid
                )
            else:
                catalog = LocalGenomeCatalog.from_refs_tsv(cfg.genome_catalog)
        source = None
        if cfg.allow_download and cfg.assembly_summary_dir:
            source = AssemblySummarySource(cfg.assembly_summary_dir)

        self._timed(
            "reference",
            lambda: build_reference_set(names, cache_dir, catalog, source),
        )
        return combined, taxonomy

    def _stage_align(self, combined: str) -> str:
        cfg = self.cfg
        paf_path = os.path.join(self.workdir, "resultados.paf")
        if os.path.exists(paf_path) and os.path.getsize(paf_path) > 0:
            logger.info("PAF exists; skipping alignment")
            return paf_path

        # cache name carries the parameters so changed k/w rebuild
        idx_path = os.path.join(
            os.path.dirname(combined),
            f"reference_minidx_k{cfg.align_k}w{cfg.align_w}.npz",
        )

        def run():
            t0 = time.time()
            aln_cfg = AlignerConfig(batch_pad=cfg.align_batch_pad)
            # cross-module contract (round-4 review, weak #6): the LCA
            # bucketer drops nothing only while the aligner's per-query
            # record cap fits its largest bucket — fail loudly at
            # construction, not via silently wrong abundances later
            from hymet_tpu.ops.lca import LCA_MAX_BUCKET

            if aln_cfg.max_secondary + 1 > LCA_MAX_BUCKET:
                raise ValueError(
                    f"AlignerConfig.max_secondary={aln_cfg.max_secondary} "
                    f"can emit {aln_cfg.max_secondary + 1} records/query > "
                    f"the LCA bucket ceiling {LCA_MAX_BUCKET} "
                    f"(ops/lca.py DEFAULT_BUCKETS)"
                )
            mesh = self._mesh()
            aligner = None
            t_load = t_stage = 0.0
            if mesh is None:
                # HBM-resident index cache: a serving process maps many
                # samples against the same candidate index; reloading the
                # .npz and re-uploading ~hundreds of MB of search tables
                # per run costs multiple seconds on a tunnel link (round-5
                # bench: 0.8-3.7 s load + 2.6-8.7 s stage of a 24 s run).
                # The reference reloads minimap2's index per invocation
                # (scripts/minimap2.sh:23) because mm2 is a one-shot
                # binary; a resident device DB is the TPU-native shape.
                aligner = _resident_aligner_get(idx_path, aln_cfg, cfg)
            if aligner is None:
                index = None
                if os.path.exists(idx_path) and not cfg.force_download:
                    try:
                        index = MinimizerIndex.load(idx_path)
                    except Exception as e:  # noqa: BLE001 — corrupt cache
                        logger.warning(
                            "cached index unreadable (%s); rebuilding", e
                        )
                        index = None
                    if index is not None and (
                        index.k != cfg.align_k or index.w != cfg.align_w
                    ):
                        logger.warning("cached index k/w mismatch; rebuilding")
                        index = None
                    elif index is not None:
                        logger.info("cached minimizer index: %s", idx_path)
                if index is None:
                    index = MinimizerIndex.build_from_fasta(
                        combined, k=cfg.align_k, w=cfg.align_w
                    )
                    index.save(idx_path)
                t_load = time.time() - t0
                t0 = time.time()
                if mesh is not None:
                    from hymet_tpu.parallel.align import ShardedMinimizerAligner

                    aligner = ShardedMinimizerAligner(mesh, index, aln_cfg)
                else:
                    aligner = MinimizerAligner(index, aln_cfg)
                    _resident_aligner_put(idx_path, aln_cfg, aligner)
                t_stage = time.time() - t0
            else:
                logger.info("resident device index: %s", idx_path)
                t_load = time.time() - t0
            t0 = time.time()
            if self._contigs is not None:
                qnames, qseqs = self._contigs
            else:
                qnames, qseqs = read_fasta(cfg.input_fasta)
            if mesh is None and self._staged is not None:
                records = aligner.map_batch(qnames, qseqs, staged=self._staged)
            else:
                records = aligner.map_batch(qnames, qseqs)
            t_map = time.time() - t0
            logger.info(
                "[align sub] index_load=%.2fs device_stage=%.2fs "
                "(%.0f MB index) map=%.2fs",
                t_load,
                t_stage,
                aligner.index.n_minimizers * 20 / 1e6,
                t_map,
            )
            write_paf(paf_path, records)
            return len(records)

        n = self._timed("align", run)
        logger.info("alignment rows: %s", n)
        return paf_path

    def _stage_classify(self, paf_path: str, taxonomy_tsv: str) -> str:
        cfg = self.cfg
        out = os.path.join(self.workdir, "classified_sequences.tsv")
        hierarchy = self._hierarchy_path()

        def run():
            try:
                if cfg.classifier_backend == "legacy":
                    from hymet_tpu.models.legacy_lca import classify_paf_legacy

                    classified, total = classify_paf_legacy(
                        paf_path, taxonomy_tsv, hierarchy, out
                    )
                else:
                    classified, total = classify_paf(
                        paf_path, taxonomy_tsv, hierarchy, out, backend=cfg.classifier_backend
                    )
            except Exception as e:  # noqa: BLE001 — reference tolerates (|| true)
                logger.error("primary classification failed: %s", e)
                classified, total = 0, 0
            rows = (
                sum(1 for _ in open(out)) if os.path.exists(out) else 0
            )
            if rows < 2:
                logger.warning(
                    "primary classification empty -> first-hit fallback"
                )
                id2tax = build_id_map(taxonomy_tsv)
                frows, _ = classify_first_hit(paf_path, id2tax)
                write_fallback_classified(out, frows)
                if sum(1 for _ in open(out)) < 2:
                    raise RuntimeError("classification still empty after fallback")
            return out

        self._timed("classify", run)
        final = os.path.join(cfg.outdir, "classified_sequences.tsv")
        if os.path.abspath(final) != os.path.abspath(out):
            import shutil

            shutil.copyfile(out, final)
        return final

    def _hierarchy_path(self) -> str:
        cfg = self.cfg
        if not cfg.taxonomy_dir:
            raise RuntimeError("taxonomy_dir not configured")
        # accept a prebuilt hierarchy TSV, or a taxdump dir to build from
        tsv = (
            cfg.taxonomy_dir
            if cfg.taxonomy_dir.endswith(".tsv")
            else os.path.join(cfg.taxonomy_dir, "taxonomy_hierarchy.tsv")
        )
        if os.path.exists(tsv):
            return tsv
        names_dmp = os.path.join(cfg.taxonomy_dir, "names.dmp")
        if os.path.exists(names_dmp):
            logger.info("building taxonomy hierarchy from taxdump")
            db = TaxonomyDB.from_taxdump(cfg.taxonomy_dir)
            db.write_hierarchy_tsv(tsv)
            return tsv
        raise RuntimeError(f"no taxonomy found under {cfg.taxonomy_dir}")

    def _taxdb(self) -> TaxonomyDB:
        cfg = self.cfg
        names_dmp = os.path.join(cfg.taxonomy_dir, "names.dmp") if cfg.taxonomy_dir else ""
        if names_dmp and os.path.exists(names_dmp):
            return TaxonomyDB.from_taxdump(cfg.taxonomy_dir)
        return TaxonomyDB.from_hierarchy_tsv(self._hierarchy_path())

    def _stage_export(self, classified: str) -> str:
        cfg = self.cfg
        sample = os.path.splitext(os.path.basename(cfg.input_fasta))[0]
        out = os.path.join(cfg.outdir, f"hymet.{sample}.cami.tsv")

        def run():
            from hymet_tpu.evalx.cami import classified_to_cami

            # HYMET_PROFILE_WEIGHT=length emits an abundance-weighted
            # profile (CAMI convention); the default "count" keeps byte
            # parity with the reference converter (tools/hymet2cami.py).
            lengths = None
            if os.environ.get("HYMET_PROFILE_WEIGHT", "count") == "length":
                from hymet_tpu.io.fasta import iter_fasta

                lengths = {
                    name: len(seq) for name, seq in iter_fasta(cfg.input_fasta)
                }
            return classified_to_cami(
                classified, self._taxdb(), out, sample, lengths=lengths
            )

        self._timed("export", run)
        return out

    def _write_metadata(self) -> None:
        meta = {
            "tool": "hymet_tpu",
            "config": {
                k: v
                for k, v in self.cfg.__dict__.items()
                if isinstance(v, (str, int, float, bool, list, type(None)))
            },
            "timings_sec": {k: round(v, 3) for k, v in self.timings.items()},
        }
        with open(os.path.join(self.cfg.outdir, "metadata.json"), "w") as f:
            json.dump(meta, f, indent=2)
