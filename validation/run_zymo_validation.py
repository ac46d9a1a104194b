#!/usr/bin/env python3
"""Zymo-panel accuracy validation: the round-gate experiment.

Simulates a metagenomic assembly from the reference checkout's real Zymo
genomes (24 bacterial assemblies, 9 species x ~3 strains), runs the FULL
pipeline (3 sketch DBs -> adaptive threshold -> species-dedup candidate
limiting -> reference build -> minimizer alignment -> weighted LCA ->
CAMI export), evaluates against the simulated truth, and writes
results TSVs under validation/results/.

Comparable baseline: the reference's curated-panel numbers
(case/ablation_eval_summary.tsv: species F1 100%, contig accuracy 99.33%;
BASELINE.md "curated 26-genome Zymo panel").

Usage: python validation/run_zymo_validation.py [--platform cpu|tpu]
"""

from __future__ import annotations

import argparse
import csv
import glob
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

GENOME_GLOB = "/root/reference/case/truth/zymo_refs/genomes/*/*.fna.gz"
REFS_TSV = "/root/reference/case/truth/zymo_refs/refs.tsv"

N_CONTIGS = 300
MUT_RATE = 0.02
INDEL_RATE = 0.0005


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu", "default"])
    ap.add_argument("--workdir", default=os.path.join(ROOT, "validation", "work"))
    ap.add_argument("--n-contigs", type=int, default=N_CONTIGS)
    ap.add_argument("--seed", type=int, default=2024)
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
    from hymet_tpu.utils.config import RunConfig

    work = args.workdir
    os.makedirs(work, exist_ok=True)
    results_dir = os.path.join(ROOT, "validation", "results")
    os.makedirs(results_dir, exist_ok=True)

    genomes = sorted(glob.glob(GENOME_GLOB))
    if not genomes:
        raise SystemExit("reference Zymo genomes not found")
    print(f"[validate] {len(genomes)} reference genomes")

    # accession -> taxid from the panel table
    acc2tax = {}
    with open(REFS_TSV) as f:
        for row in csv.DictReader(f, delimiter="\t"):
            acc2tax[row["assembly_accession"]] = row["taxid"]
    s2t_path = os.path.join(work, "acc2taxid.tsv")
    with open(s2t_path, "w") as f:
        for acc, tax in sorted(acc2tax.items()):
            f.write(f"{acc}\t{tax}\n")

    taxdb = zymo_taxdb()
    tax_dir = os.path.join(work, "taxonomy")
    os.makedirs(tax_dir, exist_ok=True)
    taxdb.write_hierarchy_tsv(os.path.join(tax_dir, "taxonomy_hierarchy.tsv"))

    # ---- 3 sketch DBs (the reference's sketch1/2/3 layout) ----
    t0 = time.time()
    db_paths = []
    for i in range(3):
        subset = genomes[i::3]
        db = build_sketch_db(subset, k=21, sketch_size=1000)
        path = os.path.join(work, f"sketch{i + 1}.npz")
        db.save(path)
        db_paths.append(path)
    print(f"[validate] built 3 sketch DBs in {time.time() - t0:.1f}s")

    # ---- simulate the assembly ----
    rng = np.random.default_rng(args.seed)
    acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
    sample_path = os.path.join(work, "zymo_sim.fna")
    truth_path = os.path.join(work, "truth_contigs.tsv")
    t0 = time.time()
    per_genome = {}
    for g in genomes:
        acc = "_".join(os.path.basename(g).split("_")[:2])
        seqs = [s for _, s in iter_fasta(g)]
        per_genome[acc] = max(seqs, key=len)
    accs = sorted(per_genome)
    with open(sample_path, "w") as sf, open(truth_path, "w") as tf:
        tf.write("contig_id\ttaxid\n")
        for i in range(args.n_contigs):
            acc = accs[int(rng.integers(0, len(accs)))]
            src = per_genome[acc]
            length = int(rng.integers(5_000, 100_000))
            if length >= len(src):
                length = len(src) // 2
            start = int(rng.integers(0, len(src) - length))
            frag = np.frombuffer(src[start : start + length], dtype=np.uint8).copy()
            # substitutions
            mut = rng.random(len(frag)) < MUT_RATE
            frag[mut] = rng.choice(acgt, size=int(mut.sum()))
            # sparse indels (asm10 regime)
            keep = rng.random(len(frag)) >= INDEL_RATE
            frag = frag[keep]
            # reverse-complement half the contigs
            if rng.random() < 0.5:
                comp = {65: 84, 67: 71, 71: 67, 84: 65}
                frag = np.array(
                    [comp.get(int(b), 78) for b in frag[::-1]], dtype=np.uint8
                )
            sf.write(f">sim_ctg{i}\n{frag.tobytes().decode()}\n")
            tf.write(f"sim_ctg{i}\t{acc2tax[acc]}\n")
    print(
        f"[validate] simulated {args.n_contigs} contigs in {time.time() - t0:.1f}s"
    )

    # ---- full pipeline ----
    outdir = os.path.join(work, "out")
    cfg = RunConfig(
        input_fasta=sample_path,
        outdir=outdir,
        cand_max=1500,
        species_dedup=True,
        cache_root=os.path.join(work, "cache"),
        taxonomy_dir=tax_dir,
        sketch_dbs=db_paths,
        genome_catalog=os.path.dirname(os.path.dirname(genomes[0])),
        seqid2taxid=s2t_path,
    )
    t0 = time.time()
    classified = ClassificationRun(cfg).execute()
    run_s = time.time() - t0
    print(f"[validate] pipeline run {run_s:.1f}s")

    # ---- evaluate ----
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

    # ---- report ----
    rows = list(
        csv.DictReader(
            open(os.path.join(eval_dir, "contigs_per_rank.tsv")), delimiter="\t"
        )
    )
    exact = dict(
        r.split("\t")
        for r in open(os.path.join(eval_dir, "contigs_exact.tsv"))
        .read()
        .splitlines()[1:]
    )
    summary = {
        "n_genomes": len(genomes),
        "n_contigs": args.n_contigs,
        "mutation_rate": MUT_RATE,
        "indel_rate": INDEL_RATE,
        "pipeline_seconds": round(run_s, 1),
        "usable_pairs": int(float(exact["usable_pairs"])),
        "exact_taxid_accuracy_percent": round(
            float(exact["exact_taxid_accuracy_percent"]), 2
        ),
        "per_rank_accuracy": {
            r["rank"]: float(r["accuracy_percent"]) for r in rows
        },
    }
    print(json.dumps(summary, indent=2))

    out_tsv = os.path.join(results_dir, "zymo_validation.tsv")
    with open(out_tsv, "w", newline="") as f:
        w = csv.writer(f, delimiter="\t")
        w.writerow(["metric", "value"])
        w.writerow(["n_genomes", summary["n_genomes"]])
        w.writerow(["n_contigs", summary["n_contigs"]])
        w.writerow(["usable_pairs", summary["usable_pairs"]])
        w.writerow(
            ["exact_taxid_accuracy_percent", summary["exact_taxid_accuracy_percent"]]
        )
        for rank, acc in summary["per_rank_accuracy"].items():
            w.writerow([f"accuracy_{rank}", acc])
        w.writerow(["pipeline_seconds", summary["pipeline_seconds"]])
    print(f"[validate] wrote {out_tsv}")


if __name__ == "__main__":
    main()
