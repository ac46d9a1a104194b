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
