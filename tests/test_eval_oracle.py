"""Profile-metric byte parity vs the actual reference evaluator.

tools/eval_cami.py's profile-only path (CAMI-format pred+truth profiles,
no contig truth) never shells out to taxonkit, so it runs as a standalone
oracle: both evaluators must produce byte-identical profile_summary.tsv.
"""

import subprocess
import sys
from pathlib import Path

import pytest

REF_EVAL = Path("/root/reference/tools/eval_cami.py")

pytestmark = pytest.mark.skipif(not REF_EVAL.exists(), reason="reference absent")


def _write_profiles(tmp_path):
    pred = tmp_path / "pred.cami.tsv"
    pred.write_text(
        "#CAMI Submission for Taxonomic Profiling\n"
        "@Version:0.9.1 @Ranks:superkingdom|phylum|class|order|family|genus|species @SampleID:s\n"
        "@@TAXID RANK TAXPATH TAXPATHSN PERCENTAGE\n"
        "2\tsuperkingdom\t2||||||\tBacteria||||||\t100.000000\n"
        "1239\tphylum\t2|1239|||||\tBacteria|Bacillota|||||\t61.500000\n"
        "1224\tphylum\t2|1224|||||\tBacteria|Pseudomonadota|||||\t38.500000\n"
        "562\tspecies\t...\t...\t55.000000\n"
        "1423\tspecies\t...\t...\t30.000000\n"
        "287\tspecies\t...\t...\t15.000000\n"
        "99999\tspecies\t...\t...\t0.050000\n"  # below presence threshold
    )
    truth = tmp_path / "truth.cami.tsv"
    truth.write_text(
        "@@TAXID RANK TAXPATH TAXPATHSN PERCENTAGE\n"
        "2\tsuperkingdom\t2||||||\tBacteria||||||\t100.000000\n"
        "1239\tphylum\t2|1239|||||\tx\t70.000000\n"
        "1224\tphylum\t2|1224|||||\tx\t30.000000\n"
        "562\tspecies\t...\t...\t50.000000\n"
        "1423\tspecies\t...\t...\t25.000000\n"
        "28901\tspecies\t...\t...\t25.000000\n"
    )
    return pred, truth


def test_profile_summary_byte_parity(tmp_path):
    pred, truth = _write_profiles(tmp_path)

    ref_out = tmp_path / "ref_eval"
    ref_out.mkdir()
    subprocess.run(
        [
            sys.executable,
            str(REF_EVAL),
            "--pred-profile",
            str(pred),
            "--truth-profile",
            str(truth),
            "--pred-contigs",
            str(tmp_path / "missing_classified.tsv"),
            "--truth-contigs",
            str(tmp_path / "missing_truth_contigs.tsv"),
            "--pred-fasta",
            str(tmp_path / "missing.fna"),
            "--truth-fasta",
            str(tmp_path / "missing2.fna"),
            "--taxdb",
            str(tmp_path),
            "--taxmap",
            str(tmp_path / "missing_taxmap.tsv"),
            "--paf",
            str(tmp_path / "missing.paf"),
            "--outdir",
            str(ref_out),
        ],
        check=True,
        capture_output=True,
    )

    from hymet_tpu.evalx.eval_cami import evaluate

    our_out = tmp_path / "our_eval"
    evaluate(
        pred_profile=str(pred),
        truth_profile=str(truth),
        pred_contigs=None,
        truth_contigs=None,
        outdir=str(our_out),
    )

    ref_summary = (ref_out / "profile_summary.tsv").read_bytes()
    our_summary = (our_out / "profile_summary.tsv").read_bytes()
    assert our_summary == ref_summary

    # sanity: the numbers mean what we think
    rows = {
        line.split("\t")[0]: line.split("\t")
        for line in our_summary.decode().splitlines()[1:]
    }
    # species: TP {562,1423}, FP {287}, FN {28901} (99999 below 0.1%)
    assert rows["species"][6:9] == ["2", "1", "1"]
    # L1 species = 0.5*(5+5+15+25+0.05)
    assert float(rows["species"][1]) == pytest.approx(0.5 * (5 + 5 + 15 + 25 + 0.05))


_TAXONKIT_SHIM = """#!/usr/bin/env python3
import os, sys
sys.path.insert(0, os.environ["SHIM_REPO"])
from hymet_tpu.taxonomy.db import TaxonomyDB
db = TaxonomyDB.from_hierarchy_tsv(os.environ["SHIM_HIERARCHY"])
cmd = sys.argv[1]
items = [l.strip() for l in sys.stdin if l.strip()]
if cmd == "name2taxid":
    for n in items:
        tid = db.name2taxid(n)
        if tid:
            sys.stdout.write(f"{n}\\t{tid}\\t{db.rank.get(tid, '')}\\n")
        else:
            sys.stdout.write(f"{n}\\n")
elif cmd == "reformat":
    for t in items:
        ids, names = db.taxpath(t)
        sys.stdout.write(f"{t}\\t{names}\\t{ids}\\n")
else:
    sys.exit(2)
"""


def test_profile_rebuild_byte_parity(tmp_path, mini_taxdb):
    """Oracle for the length-weighted profile-rebuild leg (reference
    eval_cami.py:306-329, triggered at :599-609 when no profiles parse):
    both evaluators rebuild pred+truth profiles from per-contig labels and
    must emit byte-identical profile_summary.tsv and contigs_per_rank.tsv.

    The reference's taxonkit subprocess is satisfied by a shim executable
    backed by the same hierarchy TSV, so only the rebuild arithmetic
    (length weighting, normalization, rank accumulation) is under test.
    """
    taxdb = mini_taxdb
    hier = tmp_path / "taxonomy_hierarchy.tsv"
    taxdb.write_hierarchy_tsv(str(hier))

    species = sorted(t for t, r in taxdb.rank.items() if r == "species")[:3]
    assert len(species) == 3
    genus = taxdb.ancestor_at_rank(species[2], "genus")

    # pred: lineage-form classified TSV (exercises the name->taxid cascade);
    # ctg3 has no FASTA entry (default weight 1), ctg1's lineage stops at genus
    pred = tmp_path / "classified_sequences.tsv"
    with pred.open("w") as f:
        f.write("Query\tLineage\tTaxonomic Level\tConfidence\n")
        f.write(f"ctg0\t{_lineage(taxdb, species[0])}\tspecies\t0.9000\n")
        f.write(f"ctg1\t{_lineage(taxdb, genus)}\tgenus\t0.8000\n")
        f.write(f"ctg2\t{_lineage(taxdb, species[1])}\tspecies\t0.7000\n")
        f.write(f"ctg3\t{_lineage(taxdb, species[2])}\tspecies\t0.6000\n")

    truth = tmp_path / "truth_contigs.tsv"
    with truth.open("w") as f:
        f.write("contig_id\ttaxid\trank\n")
        f.write(f"ctg0\t{species[0]}\tspecies\n")
        f.write(f"ctg1\t{species[1]}\tspecies\n")
        f.write(f"ctg2\t{species[1]}\tspecies\n")
        f.write(f"ctg4\t{genus}\tgenus\n")

    pred_fa = tmp_path / "pred.fna"
    pred_fa.write_text(">ctg0\n" + "A" * 1200 + "\n>ctg1\n" + "C" * 800 + "\n>ctg2\n" + "G" * 3000 + "\n")
    truth_fa = tmp_path / "truth.fna"
    truth_fa.write_text(">ctg4\n" + "T" * 500 + "\n")

    shim_dir = tmp_path / "bin"
    shim_dir.mkdir()
    shim = shim_dir / "taxonkit"
    shim.write_text(_TAXONKIT_SHIM)
    shim.chmod(0o755)

    import os

    env = dict(
        os.environ,
        PATH=f"{shim_dir}:{os.environ['PATH']}",
        SHIM_REPO=str(Path(__file__).resolve().parents[1]),
        SHIM_HIERARCHY=str(hier),
    )
    ref_out = tmp_path / "ref_eval"
    ref_out.mkdir()
    subprocess.run(
        [
            sys.executable,
            str(REF_EVAL),
            "--pred-profile", str(tmp_path / "missing_pred_profile.tsv"),
            "--truth-profile", str(tmp_path / "missing_truth_profile.tsv"),
            "--pred-contigs", str(pred),
            "--truth-contigs", str(truth),
            "--pred-fasta", str(pred_fa),
            "--truth-fasta", str(truth_fa),
            "--taxdb", str(tmp_path),
            "--taxmap", str(tmp_path / "missing_taxmap.tsv"),
            "--paf", str(tmp_path / "missing.paf"),
            "--outdir", str(ref_out),
        ],
        check=True,
        capture_output=True,
        env=env,
    )

    from hymet_tpu.evalx.eval_cami import evaluate

    our_out = tmp_path / "our_eval"
    evaluate(
        pred_profile=str(tmp_path / "missing_pred_profile.tsv"),
        truth_profile=str(tmp_path / "missing_truth_profile.tsv"),
        pred_contigs=str(pred),
        truth_contigs=str(truth),
        pred_fasta=str(pred_fa),
        truth_fasta=str(truth_fa),
        taxonomy_dir=str(hier),
        outdir=str(our_out),
    )

    for name in ("profile_summary.tsv", "contigs_per_rank.tsv"):
        assert (our_out / name).read_bytes() == (ref_out / name).read_bytes(), name

    # sanity: the rebuilt profiles actually carried length weights
    summary = (our_out / "profile_summary.tsv").read_text().splitlines()
    sp = next(l for l in summary if l.startswith("species")).split("\t")
    assert float(sp[1]) > 0.0  # pred != truth at species rank


def _lineage(taxdb, taxid):
    return "; ".join(
        f"{r}:{n}" for _, r, n in taxdb.lineage_pairs(taxid) if r and n
    )
