#!/usr/bin/env python3
"""Synthetic CAMI-replica benchmark suite (VERDICT r5 #8).

Builds three samples patterned on the CAMI II challenge compositions the
reference benchmarks against (``/root/reference/bench/run_all_cami.sh:91-162``,
``bench/results_summary.md:79-100``) — from the real Zymo genomes, so the
suite runs in this zero-egress sandbox — then runs the full
``hymet-tpu bench`` harness loop (manifest x tool, measured run + eval,
aggregation + figures) over them:

- ``camisyn_gut``   (mouse-gut-like): 110 congeneric species x 2 strains,
  heavily skewed log-normal abundances (sigma=2), contigs 2-40 kb.
- ``camisyn_marine`` (marine-like): same world, flatter abundances
  (sigma=1.0), shorter contigs (1-20 kb), and ~15% of contigs drawn from
  plasmid-like mobile elements shared across genera (horizontal-transfer
  confounders; each plasmid copy is mutated per host and truth follows
  the host strain whose genome carried the sampled copy).
- ``camisyn_strainmadness``: contigs only from the 20 "madness" species
  (2 genera) that carry 6 strains each at 0.2% divergence, abundances
  skewed across STRAINS — the strain-resolution stress the CAMI II
  strain-madness dataset is built around.

Every 10th species is sampled but held OUT of the reference DB (novel
lineages), so profile metrics carry the same information floor the
cami_hard world demonstrates (validation/analyze_l1_ceiling.py).

Usage: python validation/run_cami_suite.py [--platform cpu|tpu|default]
       [--n-contigs N] [--fresh] [--samples gut,marine,strainmadness]
"""

from __future__ import annotations

import argparse
import csv
import glob
import gzip
import json
import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

GENOME_GLOB = "/root/reference/case/truth/zymo_refs/genomes/*/*.fna.gz"
REFS_TSV = "/root/reference/case/truth/zymo_refs/refs.tsv"

WINDOW_BP = 700_000
SPECIES_PER_GENUS = 10
NOVEL_EVERY = 10          # every 10th species sampled but held out of the DB
MADNESS_GENERA = 2        # first N genera get the strain-madness treatment
MADNESS_STRAINS = 6
BASE_STRAINS = 2
SPECIES_DIV = 0.035
STRAIN_DIV = 0.004
MADNESS_STRAIN_DIV = 0.002
N_PLASMIDS = 12
PLASMID_LEN = (30_000, 80_000)
PLASMID_DIV = 0.05        # plasmid pool divergence from its source window
PLASMID_HOST_DIV = 0.01   # per-host copy divergence (HGT drift)
CONTIG_ERR = 0.01
INDEL_RATE = 0.0005
SYN_TAX_BASE = 9_500_000


def _mutate(seq, rate, rng, np):
    """SNP-mutate an ACGT uint8 array at `rate` (reuses the cami_hard
    substitution scheme: each hit site rotates to a different base)."""
    out = seq.copy()
    hits = rng.random(out.size) < rate
    idx = hits.nonzero()[0]
    if idx.size:
        rot = rng.integers(1, 4, size=idx.size).astype(np.uint8)
        lut = {65: 0, 67: 1, 71: 2, 84: 3}
        inv = bytes([65, 67, 71, 84])
        base = out[idx]
        code = base.copy()
        for b, c in lut.items():
            code[base == b] = c
        out[idx] = [inv[(c + r) % 4] for c, r in zip(code, rot)]
    return out


def build_world(work, rng, np):
    """Shared world: genomes, taxonomy, plasmids, sketch DBs. Returns the
    handles the samplers and harness need."""
    from hymet_tpu.data.zymo_taxonomy import zymo_taxdb
    from hymet_tpu.io.fasta import iter_fasta
    from hymet_tpu.io.sketchdb import build_sketch_db
    from hymet_tpu.taxonomy.db import TaxonomyDB

    acc2tax = {}
    with open(REFS_TSV) as f:
        for row in csv.DictReader(f, delimiter="\t"):
            acc2tax[row["assembly_accession"]] = row["taxid"]
    base_db = zymo_taxdb()

    genus_windows = {}
    for g in sorted(glob.glob(GENOME_GLOB)):
        acc = "_".join(os.path.basename(g).split("_")[:2])
        genus = base_db.ancestor_at_rank(acc2tax.get(acc, ""), "genus")
        if not genus:
            continue
        seq = max((s for _, s in iter_fasta(g)), key=len)
        win = np.frombuffer(seq[:WINDOW_BP], dtype=np.uint8).copy()
        prev = genus_windows.get(genus)
        if prev is None or win.size > prev.size:
            genus_windows[genus] = win
    genera = sorted(genus_windows)
    print(f"[cami-suite] {len(genera)} source genera")

    # plasmid pool: mobile elements cut from random windows, mutated away
    plasmids = []
    for pi in range(N_PLASMIDS):
        src = genus_windows[genera[int(rng.integers(0, len(genera)))]]
        plen = int(rng.integers(*PLASMID_LEN))
        start = int(rng.integers(0, max(src.size - plen, 1)))
        plasmids.append(_mutate(src[start : start + plen], PLASMID_DIV, rng, np))

    records, strains, species_meta = [], [], []
    sp_index = 0
    for gi, genus in enumerate(genera):
        win = genus_windows[genus]
        gname = base_db.name.get(genus, f"genus{gi}")
        madness = gi < MADNESS_GENERA
        n_strains = MADNESS_STRAINS if madness else BASE_STRAINS
        st_div = MADNESS_STRAIN_DIV if madness else STRAIN_DIV
        for si in range(SPECIES_PER_GENUS):
            sp_tid = str(SYN_TAX_BASE + gi * 1000 + si * 10)
            sp_name = f"{gname} camisuite{gi}s{si}"
            records.append((sp_tid, sp_name, "species", genus))
            in_db = (sp_index % NOVEL_EVERY) != NOVEL_EVERY - 1
            species_meta.append((sp_tid, in_db, madness))
            sp_root = _mutate(win, SPECIES_DIV, rng, np)
            for ti in range(n_strains):
                st_tid = str(SYN_TAX_BASE + gi * 1000 + si * 10 + ti + 1)
                records.append((st_tid, f"{sp_name} strain t{ti}", "strain", sp_tid))
                acc = f"CSU_{gi:02d}{si}{ti}.1"
                genome = _mutate(sp_root, st_div, rng, np)
                # horizontal transfer: ~30% of strains carry a plasmid copy
                plasmid = None
                if rng.random() < 0.3:
                    plasmid = _mutate(
                        plasmids[int(rng.integers(0, N_PLASMIDS))],
                        PLASMID_HOST_DIV, rng, np,
                    )
                strains.append((acc, st_tid, sp_tid, genome, plasmid, in_db))
            sp_index += 1
    taxdb = TaxonomyDB.from_records(
        [(t, n, r, p) for t, n, r, p in zip_records(base_db)] + records
    )
    n_novel = sum(1 for _, in_db, _ in species_meta if not in_db)
    print(
        f"[cami-suite] {len(species_meta)} species ({n_novel} novel), "
        f"{len(strains)} strain genomes, {N_PLASMIDS} plasmids"
    )

    genomes_dir = os.path.join(work, "genomes")
    tax_dir = os.path.join(work, "taxonomy")
    s2t_path = os.path.join(work, "acc2taxid.tsv")
    db_paths = [os.path.join(work, f"sketch{i + 1}.npz") for i in range(3)]
    t0 = time.time()
    for acc, st_tid, _, genome, plasmid, _ in strains:
        d = os.path.join(genomes_dir, acc)
        os.makedirs(d, exist_ok=True)
        with gzip.open(os.path.join(d, f"{acc}_genomic.fna.gz"), "wt") as f:
            f.write(f">{acc}_chr1\n{genome.tobytes().decode()}\n")
            if plasmid is not None:
                f.write(f">{acc}_plas1\n{plasmid.tobytes().decode()}\n")
    with open(s2t_path, "w") as f:
        for acc, st_tid, *_ in strains:
            f.write(f"{acc}\t{st_tid}\n")
    os.makedirs(tax_dir, exist_ok=True)
    taxdb.write_hierarchy_tsv(os.path.join(tax_dir, "taxonomy_hierarchy.tsv"))
    db_files = [
        os.path.join(genomes_dir, acc, f"{acc}_genomic.fna.gz")
        for acc, _, _, _, _, in_db in strains
        if in_db
    ]
    for i, path in enumerate(db_paths):
        build_sketch_db(db_files[i::3], k=21, sketch_size=1000).save(path)
    print(f"[cami-suite] genomes + 3 sketch DBs in {time.time() - t0:.1f}s")
    return taxdb, strains, species_meta, genomes_dir, tax_dir, s2t_path, db_paths


def sample_contigs(
    name, work, taxdb, strains, species_meta, n_contigs, rng, np,
    sigma, len_range, plasmid_frac=0.0, madness_only=False,
):
    """One sample: contigs FASTA + truth contigs TSV + CAMI truth profile
    (length-weighted — the CAMI abundance convention)."""
    from hymet_tpu.evalx.cami import emit_cami

    sdir = os.path.join(work, "data", name)
    os.makedirs(sdir, exist_ok=True)
    fasta = os.path.join(sdir, "contigs.fna")
    truth_tsv = os.path.join(sdir, "truth_contigs.tsv")
    truth_prof = os.path.join(sdir, "truth_profile.tsv")

    pool = [
        (acc, st, sp, genome, plasmid)
        for acc, st, sp, genome, plasmid, _ in strains
        if not madness_only or species_meta_lookup(species_meta, sp)[1]
    ]
    by_species = {}
    for acc, st, sp, genome, plasmid in pool:
        by_species.setdefault(sp, []).append((st, genome, plasmid))
    sp_ids = sorted(by_species)
    weights = np.exp(rng.normal(0.0, sigma, size=len(sp_ids)))
    weights /= weights.sum()

    comp = np.full(256, 78, dtype=np.uint8)
    comp[65], comp[67], comp[71], comp[84] = 84, 71, 67, 65
    lo, hi = len_range
    truth_rows = {}
    with open(fasta, "w") as sf, open(truth_tsv, "w") as tf:
        tf.write("contig_id\ttaxid\n")
        for i in range(n_contigs):
            sp = sp_ids[int(rng.choice(len(sp_ids), p=weights))]
            st, genome, plasmid = by_species[sp][int(rng.integers(0, len(by_species[sp])))]
            src = genome
            if plasmid is not None and rng.random() < plasmid_frac:
                src = plasmid
            length = int(10 ** rng.uniform(np.log10(lo), np.log10(hi)))
            start = int(rng.integers(0, max(src.size - length, 1)))
            frag = _mutate(src[start : start + length], CONTIG_ERR, rng, np)
            frag = frag[rng.random(frag.size) >= INDEL_RATE]
            if rng.random() < 0.5:
                frag = comp[frag[::-1]]
            cid = f"{name}_c{i}"
            sf.write(f">{cid}\n{frag.tobytes().decode()}\n")
            tf.write(f"{cid}\t{st}\n")
            truth_rows[cid] = (st, frag.size)

    # length-weighted CAMI truth profile over the 7 ranks
    from hymet_tpu import CAMI_RANKS

    counts = {rank: {} for rank in CAMI_RANKS}
    for st, length in truth_rows.values():
        ids, _names = taxdb.taxpath(st)
        chain = ids.split("|")
        for pos, rank in enumerate(CAMI_RANKS):
            if pos < len(chain) and chain[pos] not in ("", "NA"):
                counts[rank][chain[pos]] = counts[rank].get(chain[pos], 0) + length
    totals = {rank: sum(v.values()) for rank, v in counts.items()}
    needed = {t for per in counts.values() for t in per}
    taxid2path = {}
    for tid in needed:
        ids, names = taxdb.taxpath(tid)
        taxid2path[tid] = (names, ids)
    with open(truth_prof, "w") as f:
        emit_cami(f, counts, totals, taxid2path, sample_id=name)
    print(f"[cami-suite] sample {name}: {n_contigs} contigs")
    return fasta, truth_tsv, truth_prof


def species_meta_lookup(species_meta, sp_tid):
    for tid, in_db, madness in species_meta:
        if tid == sp_tid:
            return in_db, madness
    return True, False


def zip_records(db):
    for tid in db.name:
        yield tid, db.name[tid], db.rank.get(tid, ""), db.parent.get(tid, "")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu", "default"])
    ap.add_argument("--workdir", default=os.path.join(ROOT, "validation", "work_cami_suite"))
    ap.add_argument("--n-contigs", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=47)
    ap.add_argument("--fresh", action="store_true")
    ap.add_argument("--samples", default="gut,marine,strainmadness")
    ap.add_argument("--skip-bench", action="store_true", help="build the world only")
    ap.add_argument(
        "--results-name", default="cami_suite",
        help="subdir of validation/results to publish into "
        "(e.g. cami_suite_tpu for the on-chip run)",
    )
    args = ap.parse_args()

    import jax

    if args.platform != "default":
        jax.config.update("jax_platforms", args.platform)
    from hymet_tpu.utils.jaxtools import enable_compile_cache

    enable_compile_cache()
    import numpy as np

    work = args.workdir
    if args.fresh and os.path.exists(work):
        shutil.rmtree(work)
    os.makedirs(work, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    stamp = os.path.join(work, f"world_s{args.seed}_n{args.n_contigs}.json")
    manifest = os.path.join(work, "cami_manifest.tsv")
    tax_dir = os.path.join(work, "taxonomy")
    s2t_path = os.path.join(work, "acc2taxid.tsv")
    genomes_dir = os.path.join(work, "genomes")
    db_paths = [os.path.join(work, f"sketch{i + 1}.npz") for i in range(3)]

    if not os.path.exists(stamp):
        taxdb, strains, species_meta, genomes_dir, tax_dir, s2t_path, db_paths = (
            build_world(work, rng, np)
        )
        specs = {
            "gut": dict(sigma=2.0, len_range=(2_000, 40_000)),
            "marine": dict(sigma=1.0, len_range=(1_000, 20_000), plasmid_frac=0.6),
            "strainmadness": dict(sigma=1.5, len_range=(2_000, 40_000), madness_only=True),
        }
        rows = []
        for key in args.samples.split(","):
            name = f"camisyn_{key}"
            fasta, tc, tp = sample_contigs(
                name, work, taxdb, strains, species_meta,
                args.n_contigs, rng, np, **specs[key],
            )
            rows.append((name, fasta, tc, tp))
        with open(manifest, "w") as f:
            f.write("sample_id\tcontigs_fa\ttruth_contigs_tsv\ttruth_profile_tsv\n")
            for r in rows:
                f.write("\t".join(r) + "\n")
        with open(stamp, "w") as f:
            json.dump({"samples": [r[0] for r in rows]}, f)

    if args.skip_bench:
        return

    # ---- harness loop (run_all_cami.sh analog) -------------------------
    os.environ.update(
        TAXONOMY_DIR=tax_dir,
        SKETCH_DBS=os.pathsep.join(db_paths),
        GENOME_CATALOG=genomes_dir,
        SEQID2TAXID=s2t_path,
        SPECIES_DEDUP="0",
        HYMET_PROFILE_WEIGHT="length",
        CACHE_ROOT=os.path.join(work, "cache"),
    )
    from hymet_tpu.harness.bench import run_bench

    out_root = os.path.join(work, "out")
    t0 = time.time()
    run_bench(manifest, ["hymet_tpu"], out_root=out_root, resume=True)
    wall = time.time() - t0
    print(f"[cami-suite] bench loop {wall:.1f}s")

    # ---- summarize vs the reference's committed numbers ----------------
    results_dir = os.path.join(ROOT, "validation", "results", args.results_name)
    os.makedirs(results_dir, exist_ok=True)
    summary_rows = []
    for entry in sorted(os.listdir(out_root)):
        prof = os.path.join(out_root, entry, "hymet_tpu", "eval", "profile_summary.tsv")
        if not os.path.isfile(prof):
            continue
        for row in csv.DictReader(open(prof), delimiter="\t"):
            summary_rows.append(
                [entry, row["rank"], row["F1_%"], row["L1_total_variation_pctpts"],
                 row["Precision_%"], row["Recall_%"]]
            )
    with open(os.path.join(results_dir, "suite_profile_summary.tsv"), "w") as f:
        w = csv.writer(f, delimiter="\t")
        w.writerow(["sample", "rank", "F1_%", "L1_pctpts", "Precision_%", "Recall_%"])
        w.writerows(summary_rows)
    for fn in ("runtime_memory.tsv", "summary_per_tool_per_sample.tsv",
               "leaderboard_by_rank.tsv"):
        src = os.path.join(out_root, fn)
        if os.path.isfile(src):
            shutil.copyfile(src, os.path.join(results_dir, fn))
    fig_dir = os.path.join(out_root, "figures")
    if os.path.isdir(fig_dir):
        for f_ in os.listdir(fig_dir):
            if f_.endswith(".png"):
                shutil.copyfile(
                    os.path.join(fig_dir, f_), os.path.join(results_dir, f_)
                )
    sp = {r[0]: r[2] for r in summary_rows if r[1] == "species"}
    print(json.dumps({"wall_s": round(wall, 1), "species_F1": sp}, indent=2))
    # Reference's committed species F1 for context: cami_i_hc 71.43,
    # cami_i_lc 63.16, cami_sample_0 23.68 (bench/results_summary.md:83-85).


if __name__ == "__main__":
    main()
