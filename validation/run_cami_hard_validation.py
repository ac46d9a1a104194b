#!/usr/bin/env python3
"""CAMI-hard synthetic validation: many near-neighbor taxa, log-uniform
abundances, novel (out-of-reference) species.

The CAMI benchmark regime (reference ``bench/results_summary.md:83-100``:
species F1 23-71%, mean rank-F1 ~52% at species, contig accuracy >80%
through family) is much harder than the Zymo panel because (a) hundreds
of taxa appear with heavily skewed abundances, (b) congeneric species
are close enough to cross-map, and (c) sample genomes are missing from
the reference set. The real CAMI data is an external download
(``bench/fetch_cami.sh``) and this sandbox has zero egress (DNS fails —
see docs/PARITY.md), so this script synthesizes those hardness axes from
the 24 real Zymo genomes in the reference checkout:

- per source genus, 3 synthetic species at ~3.5% SNP divergence from a
  real genome window (pairwise ~7% — the asm10 near-neighbor regime),
  each with 2 strains at ~0.4% divergence => 144 strain genomes over 72
  congeneric species with real upper lineages;
- a held-out eighth of the species (both strains) is EXCLUDED from the
  reference DB but still sampled => forced novel-genome errors;
- contig abundances are log-uniform across species (~2.5 decades),
  contig lengths 2-40 kb (shorter than the Zymo sim), 1% assembly
  error + sparse indels, half reverse-complemented.

Full pipeline (3 sketch DBs -> screen -> candidates -> reference build
-> align -> weighted LCA -> CAMI export), then the evaluator produces
profile F1/L1/BC per rank plus per-contig accuracy — the same tables the
reference's CAMI runs report. Results land in
validation/results/cami_hard_validation.tsv (+ the profile summary).

Usage: python validation/run_cami_hard_validation.py [--platform cpu|tpu]
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

SPECIES_PER_GENUS = 8
STRAINS_PER_SPECIES = 2
WINDOW_BP = 1_200_000
SPECIES_DIV = 0.035  # SNP divergence of each species from the source window
STRAIN_DIV = 0.004  # strain divergence from its species root
NOVEL_EVERY = 8  # every 8th species is sampled but held out of the DB
CONTIG_ERR = 0.01
INDEL_RATE = 0.0005
N_CONTIGS = 500
SYN_TAX_BASE = 9_000_000


def _mutate(seq, rate, rng, np):
    out = seq.copy()
    mut = rng.random(out.size) < rate
    # replacement bases draw uniformly; a draw equal to the original base
    # is a silent site, so the realized divergence is rate * 3/4
    out[mut] = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=int(mut.sum()))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu", "default"])
    ap.add_argument("--workdir", default=os.path.join(ROOT, "validation", "work_cami_hard"))
    ap.add_argument("--n-contigs", type=int, default=N_CONTIGS)
    ap.add_argument("--seed", type=int, default=31)
    ap.add_argument("--fresh", action="store_true", help="rebuild the synthetic world")
    args = ap.parse_args()

    import jax

    if args.platform != "default":
        jax.config.update("jax_platforms", args.platform)
    from hymet_tpu.utils.jaxtools import enable_compile_cache

    enable_compile_cache()

    import numpy as np

    from hymet_tpu.data.zymo_taxonomy import zymo_taxdb
    from hymet_tpu.evalx.eval_cami import evaluate
    from hymet_tpu.io.fasta import iter_fasta
    from hymet_tpu.io.sketchdb import build_sketch_db
    from hymet_tpu.pipeline.run import ClassificationRun
    from hymet_tpu.taxonomy.db import TaxonomyDB
    from hymet_tpu.utils.config import RunConfig

    work = args.workdir
    if args.fresh and os.path.exists(work):
        shutil.rmtree(work)
    os.makedirs(work, exist_ok=True)
    results_dir = os.path.join(ROOT, "validation", "results")
    os.makedirs(results_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    # ---- source windows + real lineages --------------------------------
    sources = sorted(glob.glob(GENOME_GLOB))
    if not sources:
        raise SystemExit("reference Zymo genomes not found")
    acc2tax = {}
    with open(REFS_TSV) as f:
        for row in csv.DictReader(f, delimiter="\t"):
            acc2tax[row["assembly_accession"]] = row["taxid"]
    base_db = zymo_taxdb()

    # one window per distinct source GENUS (24 genomes -> ~11 genera; a
    # genus appearing with several assemblies keeps its largest window)
    genus_windows = {}
    for g in sources:
        acc = "_".join(os.path.basename(g).split("_")[:2])
        tid = acc2tax[acc]
        genus = base_db.ancestor_at_rank(tid, "genus")
        if not genus:
            continue
        seq = max((s for _, s in iter_fasta(g)), key=len)
        win = np.frombuffer(seq[:WINDOW_BP], dtype=np.uint8).copy()
        prev = genus_windows.get(genus)
        if prev is None or win.size > prev.size:
            genus_windows[genus] = win
    genera = sorted(genus_windows)
    print(f"[cami-hard] {len(genera)} source genera")

    # ---- synthesize species/strain genomes + taxonomy ------------------
    records = []  # extra taxonomy records
    strains = []  # (acc, strain_taxid, species_taxid, genome bytes, in_db)
    species_meta = []  # (species_taxid, in_db)
    genomes_dir = os.path.join(work, "genomes")
    sp_index = 0
    for gi, genus in enumerate(genera):
        win = genus_windows[genus]
        gname = base_db.name.get(genus, f"genus{gi}")
        for si in range(SPECIES_PER_GENUS):
            sp_tid = str(SYN_TAX_BASE + gi * 100 + si * 10)
            sp_name = f"{gname} camisyn{gi}s{si}"
            records.append((sp_tid, sp_name, "species", genus))
            in_db = (sp_index % NOVEL_EVERY) != NOVEL_EVERY - 1
            species_meta.append((sp_tid, in_db))
            sp_root = _mutate(win, SPECIES_DIV, rng, np)
            for ti in range(STRAINS_PER_SPECIES):
                st_tid = str(SYN_TAX_BASE + gi * 100 + si * 10 + ti + 1)
                records.append((st_tid, f"{sp_name} strain t{ti}", "strain", sp_tid))
                acc = f"SYN_{gi:03d}{si}{ti}.1"
                strains.append((acc, st_tid, sp_tid, _mutate(sp_root, STRAIN_DIV, rng, np), in_db))
            sp_index += 1
    taxdb = TaxonomyDB.from_records(
        [(t, n, r, p) for t, n, r, p in zip_records(base_db)] + records
    )
    n_novel = sum(1 for _, in_db in species_meta if not in_db)
    print(
        f"[cami-hard] {len(species_meta)} species ({n_novel} novel/held-out), "
        f"{len(strains)} strain genomes"
    )

    # ---- write world (idempotent via a stamp) --------------------------
    stamp = os.path.join(work, f"world_s{args.seed}_n{args.n_contigs}.json")
    db_paths = [os.path.join(work, f"sketch{i + 1}.npz") for i in range(3)]
    sample_path = os.path.join(work, "sample.fna")
    truth_path = os.path.join(work, "truth_contigs.tsv")
    s2t_path = os.path.join(work, "acc2taxid.tsv")
    tax_dir = os.path.join(work, "taxonomy")

    if not os.path.exists(stamp):
        t0 = time.time()
        for acc, st_tid, _, genome, _ in strains:
            d = os.path.join(genomes_dir, acc)
            os.makedirs(d, exist_ok=True)
            with gzip.open(os.path.join(d, f"{acc}_genomic.fna.gz"), "wt") as f:
                f.write(f">{acc}_chr1\n")
                f.write(genome.tobytes().decode())
                f.write("\n")
        with open(s2t_path, "w") as f:
            for acc, st_tid, *_ in strains:
                f.write(f"{acc}\t{st_tid}\n")
        os.makedirs(tax_dir, exist_ok=True)
        taxdb.write_hierarchy_tsv(os.path.join(tax_dir, "taxonomy_hierarchy.tsv"))

        db_files = [
            os.path.join(genomes_dir, acc, f"{acc}_genomic.fna.gz")
            for acc, _, _, _, in_db in strains
            if in_db
        ]
        for i, path in enumerate(db_paths):
            build_sketch_db(db_files[i::3], k=21, sketch_size=1000).save(path)
        print(f"[cami-hard] world + 3 sketch DBs in {time.time() - t0:.1f}s")

        # ---- sample: log-uniform species abundances --------------------
        t0 = time.time()
        weights = 10.0 ** rng.uniform(0.0, 2.5, size=len(species_meta))
        weights /= weights.sum()
        by_species = {}
        for acc, st_tid, sp_tid, genome, _ in strains:
            by_species.setdefault(sp_tid, []).append((st_tid, genome))
        comp = np.full(256, 78, dtype=np.uint8)
        comp[65], comp[67], comp[71], comp[84] = 84, 71, 67, 65
        with open(sample_path, "w") as sf, open(truth_path, "w") as tf:
            tf.write("contig_id\ttaxid\n")
            for i in range(args.n_contigs):
                sp_i = int(rng.choice(len(species_meta), p=weights))
                sp_tid, _ = species_meta[sp_i]
                st_tid, genome = by_species[sp_tid][int(rng.integers(0, STRAINS_PER_SPECIES))]
                length = int(10 ** rng.uniform(np.log10(2_000), np.log10(40_000)))
                start = int(rng.integers(0, max(genome.size - length, 1)))
                frag = _mutate(genome[start : start + length], CONTIG_ERR, rng, np)
                frag = frag[rng.random(frag.size) >= INDEL_RATE]
                if rng.random() < 0.5:
                    frag = comp[frag[::-1]]
                sf.write(f">chc{i}\n{frag.tobytes().decode()}\n")
                tf.write(f"chc{i}\t{st_tid}\n")
        with open(stamp, "w") as f:
            json.dump({"n_species": len(species_meta), "n_novel": n_novel}, f)
        print(f"[cami-hard] sampled {args.n_contigs} contigs in {time.time() - t0:.1f}s")

    # ---- full pipeline -------------------------------------------------
    outdir = os.path.join(work, "out")
    if os.path.exists(outdir):
        shutil.rmtree(outdir)
    cfg = RunConfig(
        input_fasta=sample_path,
        outdir=outdir,
        cand_max=1500,
        species_dedup=False,  # strains ARE the discrimination test here
        cache_root=os.path.join(work, "cache"),
        taxonomy_dir=tax_dir,
        sketch_dbs=db_paths,
        genome_catalog=genomes_dir,
        seqid2taxid=s2t_path,
    )
    # Abundance-weighted profile (CAMI convention): the truth profile is
    # rebuilt length-weighted, so the prediction must be too — the
    # reference's count-weighted converter vs a length-weighted truth
    # inflates species L1 by ~5.7 pct-pts here (see
    # validation/analyze_l1_ceiling.py and results/cami_hard_l1_ceiling.tsv).
    os.environ["HYMET_PROFILE_WEIGHT"] = "length"
    t0 = time.time()
    classified = ClassificationRun(cfg).execute()
    run_s = time.time() - t0
    print(f"[cami-hard] pipeline run {run_s:.1f}s")

    # ---- evaluate (truth profile rebuilt length-weighted from truth) ---
    profile = None
    for fn in os.listdir(outdir):
        if fn.endswith(".cami.tsv"):
            profile = os.path.join(outdir, fn)
    eval_dir = os.path.join(work, "eval")
    evaluate(
        pred_profile=profile,
        truth_profile=None,
        pred_contigs=classified,
        truth_contigs=truth_path,
        pred_fasta=sample_path,
        taxonomy_dir=tax_dir,
        paf=os.path.join(outdir, "work", "resultados.paf"),
        outdir=eval_dir,
    )

    # ---- report --------------------------------------------------------
    prof_rows = list(
        csv.DictReader(open(os.path.join(eval_dir, "profile_summary.tsv")), delimiter="\t")
    )
    rank_rows = list(
        csv.DictReader(open(os.path.join(eval_dir, "contigs_per_rank.tsv")), delimiter="\t")
    )
    exact = dict(
        r.split("\t")
        for r in open(os.path.join(eval_dir, "contigs_exact.tsv")).read().splitlines()[1:]
    )
    summary = {
        "n_species": len(species_meta),
        "n_novel_species": n_novel,
        "n_strain_genomes": len(strains),
        "n_contigs": args.n_contigs,
        "pipeline_seconds": round(run_s, 1),
        "usable_pairs": int(float(exact["usable_pairs"])),
        "exact_taxid_accuracy_percent": round(float(exact["exact_taxid_accuracy_percent"]), 2),
        "profile_f1_by_rank": {r["rank"]: float(r["F1_%"]) for r in prof_rows},
        "profile_l1_by_rank": {
            r["rank"]: float(r["L1_total_variation_pctpts"]) for r in prof_rows
        },
        "contig_accuracy_by_rank": {r["rank"]: float(r["accuracy_percent"]) for r in rank_rows},
    }
    print(json.dumps(summary, indent=2))

    out_tsv = os.path.join(results_dir, "cami_hard_validation.tsv")
    with open(out_tsv, "w", newline="") as f:
        w = csv.writer(f, delimiter="\t")
        w.writerow(["metric", "value"])
        for key in (
            "n_species",
            "n_novel_species",
            "n_strain_genomes",
            "n_contigs",
            "usable_pairs",
            "exact_taxid_accuracy_percent",
            "pipeline_seconds",
        ):
            w.writerow([key, summary[key]])
        for rank, v in summary["profile_f1_by_rank"].items():
            w.writerow([f"profile_f1_{rank}", v])
        for rank, v in summary["profile_l1_by_rank"].items():
            w.writerow([f"profile_l1_{rank}", v])
        for rank, v in summary["contig_accuracy_by_rank"].items():
            w.writerow([f"contig_accuracy_{rank}", v])
    shutil.copy(
        os.path.join(eval_dir, "profile_summary.tsv"),
        os.path.join(results_dir, "cami_hard_profile_summary.tsv"),
    )
    print(f"[cami-hard] wrote {out_tsv}")


def zip_records(db):
    """(taxid, name, rank, parent) tuples of an existing TaxonomyDB."""
    for tid in db.name:
        yield tid, db.name.get(tid, ""), db.rank.get(tid, ""), db.parent.get(tid, "")


if __name__ == "__main__":
    main()
