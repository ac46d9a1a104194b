#!/usr/bin/env python3
"""Per-contig failure diagnosis for the cami_hard world (VERDICT r4 #6).

Buckets every non-exact contig of the last ``run_cami_hard_validation``
run into the stage that lost it:

- ``novel_species``      truth species held out of the reference DB —
                         exact match impossible by construction;
- ``screen_miss``        no strain of the truth species survived the
                         screen's adaptive threshold walk;
- ``align_miss``         strains selected, but the contig has no PAF row
                         onto any strain of its species;
- ``wrong_species``      predicted taxid resolves to a different species;
- ``sibling_strain``     right species, wrong strain (the 0.4%-divergence
                         discrimination failed — classifier weights);
- ``rank_stop``          prediction stopped at species or above while the
                         truth is a strain taxid.

Writes validation/results/cami_hard_diagnosis.tsv and prints the table.
"""

import csv
import os
import sys
from collections import Counter, defaultdict

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("HYMET_PLATFORM", "cpu")

WORK = os.path.join(ROOT, "validation", "work_cami_hard")


def main() -> None:
    from hymet_tpu.evalx.eval_cami import IdentifierMap, resolve_contig_taxids
    from hymet_tpu.io.paf import read_paf
    from hymet_tpu.io.sketchdb import SketchDB
    from hymet_tpu.taxonomy.db import TaxonomyDB

    outdir = os.path.join(WORK, "out")
    classified = os.path.join(outdir, "work", "classified_sequences.tsv")
    paf_path = os.path.join(outdir, "work", "resultados.paf")
    selected_path = os.path.join(outdir, "work", "selected_genomes.txt")
    taxdb = TaxonomyDB.from_hierarchy_tsv(
        os.path.join(WORK, "taxonomy", "taxonomy_hierarchy.tsv")
    )

    truth = {}
    with open(os.path.join(WORK, "truth_contigs.tsv")) as f:
        next(f)
        for line in f:
            c, t = line.strip().split("\t")
            truth[c] = t

    # strain acc <-> taxid, and which strains the sketch DBs contain
    acc2tid = {}
    with open(os.path.join(WORK, "acc2taxid.tsv")) as f:
        for line in f:
            acc, tid = line.strip().split("\t")
            acc2tid[acc] = tid
    indb_accs = set()
    for i in (1, 2, 3):
        db = SketchDB.load(os.path.join(WORK, f"sketch{i}.npz"))
        for name in db.names:
            indb_accs.add("_".join(os.path.basename(name).split("_")[:2]))
    species_strains = defaultdict(set)  # species tid -> strain tids
    strain_species = {}
    for acc, tid in acc2tid.items():
        sp = taxdb.parent.get(tid)
        species_strains[sp].add(tid)
        strain_species[tid] = sp
    indb_species = {
        strain_species[acc2tid[a]] for a in indb_accs if a in acc2tid
    }

    selected = set()
    with open(selected_path) as f:
        for line in f:
            selected.add("_".join(os.path.basename(line.strip()).split("_")[:2]))
    selected_species = {
        strain_species[acc2tid[a]] for a in selected if a in acc2tid
    }

    # predicted taxid per contig (the evaluator's own resolution path)
    taxmap = None
    for root, _, files in os.walk(os.path.join(WORK, "cache")):
        if "detailed_taxonomy.tsv" in files:
            taxmap = os.path.join(root, "detailed_taxonomy.tsv")
    idmap = IdentifierMap.from_detailed_taxonomy(taxmap) if taxmap else None
    preds = resolve_contig_taxids(classified, taxdb, idmap, paf_path)

    # PAF rows per contig -> hit species/strains
    paf_hits = defaultdict(set)  # contig -> strain taxids hit
    for rec in read_paf(paf_path):
        acc = "_".join(rec.tname.split("_")[:2])
        tid = acc2tid.get(acc)
        if tid:
            paf_hits[rec.qname].add(tid)

    buckets = Counter()
    rows = []
    for c, t_strain in truth.items():
        sp = strain_species[t_strain]
        pred = preds.get(c, "")
        if pred == t_strain:
            bucket = "exact"
        elif sp not in indb_species:
            bucket = "novel_species"
        elif sp not in selected_species:
            bucket = "screen_miss"
        elif not (paf_hits.get(c, set()) & species_strains[sp]):
            bucket = "align_miss"
        else:
            pred_sp = (
                pred
                if taxdb.rank.get(pred) == "species"
                else taxdb.ancestor_at_rank(pred, "species")
            )
            if pred in species_strains[sp]:
                bucket = "sibling_strain"
            elif pred_sp == sp:
                bucket = "rank_stop"
            elif pred_sp:
                bucket = "wrong_species"
            else:
                bucket = "rank_stop"
        buckets[bucket] += 1
        rows.append((c, t_strain, sp, pred, bucket))

    out = os.path.join(ROOT, "validation", "results", "cami_hard_diagnosis.tsv")
    with open(out, "w", newline="") as f:
        w = csv.writer(f, delimiter="\t")
        w.writerow(["contig", "truth_strain", "truth_species", "pred", "bucket"])
        w.writerows(rows)
    total = len(truth)
    print(f"{'bucket':16s} {'n':>5s} {'pct':>6s}")
    for b, n in buckets.most_common():
        print(f"{b:16s} {n:5d} {100.0 * n / total:6.1f}")
    print(f"wrote {out}")

    # --- species-L1 information floor (VERDICT r5 #5) ---------------------
    # Held-out ("novel") species are absent from every reference DB, so a
    # classifier can NEVER predict them: their entire truth abundance is
    # an unavoidable under-prediction, and wherever their contigs land
    # (their nearest in-reference species, by construction) is the
    # mirror-image over-prediction. The species L1 floor is therefore
    # ~2x the novel truth share; comparing it to the measured L1 shows
    # how much of the residual is recoverable at all.
    truth_bp = defaultdict(float)
    contig_bp = {}
    from hymet_tpu.io.fasta import iter_fasta

    for name, seq in iter_fasta(os.path.join(WORK, "sample.fna")):
        contig_bp[name.split()[0]] = float(len(seq))
    tot_bp = sum(contig_bp.get(c, 0.0) for c in truth)
    for c, t_strain in truth.items():
        truth_bp[strain_species[t_strain]] += contig_bp.get(c, 0.0)
    novel_share = 100.0 * sum(
        bp for sp, bp in truth_bp.items() if sp not in indb_species
    ) / max(tot_bp, 1.0)
    eval_tsv = os.path.join(
        ROOT, "validation", "results", "cami_hard_validation.tsv"
    )
    measured_l1 = None
    try:
        with open(eval_tsv) as f:
            for line in f:
                k, v = line.rstrip("\n").split("\t")
                if k == "profile_l1_species":
                    measured_l1 = float(v)
    except OSError:
        pass
    floor = 2.0 * novel_share
    print(
        f"species-L1 floor: novel truth share {novel_share:.2f} pct-pts "
        f"-> floor ~{floor:.2f}; measured "
        f"{measured_l1 if measured_l1 is not None else 'n/a'} "
        f"({'AT floor' if measured_l1 is not None and measured_l1 <= floor * 1.15 else 'above floor'})"
    )


if __name__ == "__main__":
    main()
