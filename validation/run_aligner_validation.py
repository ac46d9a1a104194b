#!/usr/bin/env python3
"""Aligner hit-set validation on REAL genomes (Zymo 24-genome panel).

The reference validates its alignment stage implicitly through
``minimap2 -x asm10`` mapping of the Zymo assembly against a 26-genome
multi-strain panel (``case/truth/build_zymo_truth.py``, committed PAF
``case/truth/zymo_mc/zymo_mc_vs_refs.paf``). That assembly FASTA is an
external download absent from this checkout, so a query-for-query PAF
diff is impossible offline; this experiment is the closest achievable
real-data check of the seed-chain aligner, exercising exactly the
structures synthetic tests miss — real repeats, rRNA operons,
low-complexity runs, plasmids, and near-identical sister strains:

1. build the asm10 minimizer index over ALL panel sequences
   (24 genomes, 9 species x up to 3 strains, chromosomes + plasmids);
2. sample real contig-sized fragments (5-100 kb) from every genome:
   clean, 2% SNP + 0.05% indel ("asm10 regime"), and reverse-complement
   mutated variants;
3. map each fragment; score the primary chain's target:
   - species-level agreement (target seqid -> taxid -> species vs the
     fragment's source species) — the property the downstream LCA
     consumes; gate >= 99%;
   - strain-exact agreement (diagnostic only: sister strains share
     near-identical sequence, so strain confusion is expected and is
     resolved downstream by the weighted consensus);
   - coverage (sum of primary+secondary block lengths / qlen) —
     reported per variant, gate: median clean coverage >= 0.95.

Writes validation/results/aligner_real_genomes.tsv + a summary row, and
exits non-zero if a gate fails.

Usage: python validation/run_aligner_validation.py [--platform cpu|tpu]
"""

from __future__ import annotations

import argparse
import csv
import glob
import os
import sys
import time
from collections import defaultdict

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

GENOME_GLOB = "/root/reference/case/truth/zymo_refs/genomes/*/*.fna.gz"
SEQID2TAXID = "/root/reference/case/truth/zymo_refs/seqid2taxid.tsv"

FRAG_MIN, FRAG_MAX = 5_000, 100_000
MUT_RATE = 0.02
INDEL_RATE = 0.0005


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu", "default"])
    ap.add_argument("--frags-per-genome", type=int, default=12)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument(
        "--out", default=os.path.join(ROOT, "validation", "results")
    )
    args = ap.parse_args()

    import jax

    if args.platform != "default":
        jax.config.update("jax_platforms", args.platform)
    from hymet_tpu.utils.jaxtools import enable_compile_cache

    enable_compile_cache()

    import numpy as np

    from hymet_tpu.data.zymo_taxonomy import zymo_taxdb
    from hymet_tpu.io.fasta import iter_fasta
    from hymet_tpu.io.minimizer_index import MinimizerIndex
    from hymet_tpu.models.aligner import MinimizerAligner

    taxdb = zymo_taxdb()
    seq2tax = {}
    with open(SEQID2TAXID) as f:
        for line in f:
            sid, tid = line.split()
            seq2tax[sid] = tid

    def species_of(taxid: str) -> str:
        return taxdb.ancestor_at_rank(taxid, "species") or taxid

    genomes = sorted(glob.glob(GENOME_GLOB))
    if not genomes:
        raise SystemExit("reference Zymo genomes not found")

    named_seqs = []  # (seqid, bytes)
    seq_src = {}  # seqid -> genome accession
    for g in genomes:
        acc = "_".join(os.path.basename(g).split("_")[:2])
        for name, seq in iter_fasta(g):
            sid = name.split()[0]
            named_seqs.append((sid, seq))
            seq_src[sid] = acc

    t0 = time.time()
    index = MinimizerIndex.build(named_seqs)
    total_bp = sum(len(s) for _, s in named_seqs)
    print(
        f"[aligner-val] index: {len(named_seqs)} seqs, {total_bp/1e6:.1f} Mbp, "
        f"{index.n_minimizers:,} minimizers in {time.time()-t0:.1f}s",
        file=sys.stderr,
    )
    aligner = MinimizerAligner(index)

    rng = np.random.default_rng(args.seed)
    acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
    comp = np.full(256, 78, dtype=np.uint8)
    comp[65], comp[67], comp[71], comp[84] = 84, 71, 67, 65

    names, seqs, meta = [], [], []
    for g in genomes:
        acc = "_".join(os.path.basename(g).split("_")[:2])
        chrom = max((s for _, s in iter_fasta(g)), key=len)
        src = np.frombuffer(chrom, dtype=np.uint8)
        sid0 = next(s for s, a in seq_src.items() if a == acc)
        sp = species_of(seq2tax.get(sid0, "0"))
        for j in range(args.frags_per_genome):
            L = int(rng.integers(FRAG_MIN, FRAG_MAX))
            start = int(rng.integers(0, max(len(src) - L, 1)))
            frag = src[start : start + L].copy()
            variant = ("clean", "mut", "rc_mut")[j % 3]
            if variant != "clean":
                mut = rng.random(len(frag)) < MUT_RATE
                frag[mut] = rng.choice(acgt, size=int(mut.sum()))
                frag = frag[rng.random(len(frag)) >= INDEL_RATE]
            if variant == "rc_mut":
                frag = comp[frag[::-1]]
            names.append(f"{acc}_f{j}")
            seqs.append(frag.tobytes())
            meta.append((acc, sp, variant))

    t0 = time.time()
    records = aligner.map_batch(names, seqs)
    print(
        f"[aligner-val] mapped {len(names)} fragments in {time.time()-t0:.1f}s "
        f"({len(records)} records)",
        file=sys.stderr,
    )

    by_query = defaultdict(list)
    for r in records:
        by_query[r.qname].append(r)

    os.makedirs(args.out, exist_ok=True)
    tsv = os.path.join(args.out, "aligner_real_genomes.tsv")
    n_sp_ok = n_strain_ok = n_mapped = 0
    cov_by_variant = defaultdict(list)
    with open(tsv, "w") as f:
        f.write(
            "fragment\tsource_acc\tvariant\tqlen\tmapped\tprimary_target\t"
            "target_species_ok\tstrain_ok\tcoverage\n"
        )
        for (acc, sp, variant), name, seq in zip(meta, names, seqs):
            recs = by_query.get(name, [])
            primary = next(
                (r for r in recs if r.tags.get("tp") == "A:P"), None
            )
            if primary is None:
                f.write(
                    f"{name}\t{acc}\t{variant}\t{len(seq)}\t0\t-\t0\t0\t0\n"
                )
                cov_by_variant[variant].append(0.0)
                continue
            n_mapped += 1
            t_tax = seq2tax.get(primary.tname, "0")
            sp_ok = species_of(t_tax) == sp
            strain_ok = seq_src.get(primary.tname) == acc
            n_sp_ok += sp_ok
            n_strain_ok += strain_ok
            cov = min(
                1.0, sum(r.blocklen for r in recs if r.tags.get("tp") == "A:P") / len(seq)
            )
            cov_by_variant[variant].append(cov)
            f.write(
                f"{name}\t{acc}\t{variant}\t{len(seq)}\t1\t{primary.tname}\t"
                f"{int(sp_ok)}\t{int(strain_ok)}\t{cov:.4f}\n"
            )

    n = len(names)
    sp_rate = n_sp_ok / max(n, 1)
    strain_rate = n_strain_ok / max(n, 1)
    med_clean = float(np.median(cov_by_variant["clean"] or [0.0]))
    med_mut = float(np.median(cov_by_variant["mut"] or [0.0]))
    summary = os.path.join(args.out, "aligner_real_genomes_summary.tsv")
    with open(summary, "w") as f:
        f.write(
            "n_fragments\tmapped\tspecies_agreement\tstrain_agreement\t"
            "median_cov_clean\tmedian_cov_mut\n"
        )
        f.write(
            f"{n}\t{n_mapped}\t{sp_rate:.4f}\t{strain_rate:.4f}\t"
            f"{med_clean:.4f}\t{med_mut:.4f}\n"
        )
    print(
        f"[aligner-val] species agreement {sp_rate*100:.2f}% "
        f"(strain-exact {strain_rate*100:.2f}%), median coverage "
        f"clean={med_clean:.3f} mut={med_mut:.3f} -> {tsv}",
        file=sys.stderr,
    )
    ok = sp_rate >= 0.99 and med_clean >= 0.95
    if not ok:
        print("[aligner-val] GATE FAILED", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
