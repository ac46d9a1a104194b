"""Harness tests: measurement, manifests, aggregation, superkingdom fix
(with subprocess oracle parity), Zymo truth builder vs the committed
in-repo truth table, case-study metrics."""

import csv
import os
import subprocess
import sys
from pathlib import Path

import pytest

REF = Path("/root/reference")


def test_measured_writes_schema(tmp_path):
    from hymet_tpu.harness.measure import HEADER, measured

    log = str(tmp_path / "runtime_memory.tsv")
    with measured(log, "s1", "hymet_tpu", "run"):
        sum(range(100000))
    rows = list(csv.DictReader(open(log), delimiter="\t"))
    assert list(rows[0].keys()) == HEADER
    assert rows[0]["sample"] == "s1" and rows[0]["stage"] == "run"
    assert float(rows[0]["wall_seconds"]) >= 0
    # append keeps single header
    with measured(log, "s1", "hymet_tpu", "eval"):
        pass
    lines = open(log).read().splitlines()
    assert len(lines) == 3


def test_manifest_parsing(tmp_path):
    from hymet_tpu.harness.manifest import load_manifest

    m = tmp_path / "manifest.tsv"
    m.write_text(
        "sample_id\tcontigs_fa\ttruth_contigs_tsv\ttruth_profile_tsv\n"
        "# comment line\n"
        "s1\tdata/s1.fna\t\t/abs/truth.tsv\n"
        "s2\t/abs/s2.fna\trel/tc.tsv\t\n"
    )
    rows = load_manifest(str(m))
    assert len(rows) == 2
    assert rows[0].contigs == str(tmp_path / "data" / "s1.fna")
    assert rows[0].truth_profile == "/abs/truth.tsv"
    assert rows[0].truth_contigs is None
    assert rows[1].contigs == "/abs/s2.fna"


@pytest.mark.skipif(
    not (REF / "bench/cami_manifest.tsv").exists(), reason="reference absent"
)
def test_reference_manifest_parses():
    from hymet_tpu.harness.manifest import load_manifest

    rows = load_manifest(str(REF / "bench/cami_manifest.tsv"))
    assert len(rows) == 7  # 7 samples + header
    assert rows[0].sample_id == "cami_sample_0"


def test_aggregate(tmp_path):
    from hymet_tpu.harness.aggregate import aggregate

    for sample, tool, f1 in (("s1", "hymet_tpu", "80.0"), ("s2", "hymet_tpu", "60.0")):
        ed = tmp_path / sample / tool / "eval"
        ed.mkdir(parents=True)
        (ed / "profile_summary.tsv").write_text(
            "rank\tL1_total_variation_pctpts\tBrayCurtis_pct\tPrecision_%\tRecall_%\tF1_%\tTP\tFP\tFN\n"
            f"species\t10.0\t20.0\t75.00\t85.00\t{f1}\t3\t1\t1\n"
        )
        (ed / "contigs_per_rank.tsv").write_text(
            "rank\tn\tcorrect\taccuracy_percent\nspecies\t10\t9\t90.0000\ngenus\t0\t0\t0.0000\n"
        )
    aggregate(str(tmp_path))
    lb = list(
        csv.DictReader(open(tmp_path / "leaderboard_by_rank.tsv"), delimiter="\t")
    )
    assert lb[0]["mean_F1_%"] == "70.00"
    assert lb[0]["samples"] == "2"
    ca = list(
        csv.DictReader(open(tmp_path / "contig_accuracy_per_tool.tsv"), delimiter="\t")
    )
    # n=0 rows dropped
    assert all(r["rank"] == "species" for r in ca)


@pytest.mark.skipif(
    not (REF / "bench/tools/fix_superkingdom_taxids.py").exists(),
    reason="reference absent",
)
def test_superkingdom_fix_oracle_parity(tmp_path, mini_taxdb):
    """Run the actual reference fixer as oracle; outputs must match."""
    hier = tmp_path / "taxonomy_hierarchy.tsv"
    mini_taxdb.write_hierarchy_tsv(str(hier))

    def write_profile(path):
        path.write_text(
            "#CAMI Submission for Taxonomic Profiling\n"
            "@@TAXID RANK TAXPATH TAXPATHSN PERCENTAGE\n"
            "3379134\tsuperkingdom\t3379134||||||\tPseudomonadati||||||\t100.000000\n"
            "1239\tphylum\t2|1239|||||\tBacteria|Bacillota|||||\t60.000000\n"
            "1224\tphylum\t2|1224|||||\tBacteria|Pseudomonadota|||||\t40.000000\n"
            "562\tspecies\t2|1224|1236|91347|543|561|562\tx\t100.000000\n"
        )

    truth = tmp_path / "truth.tsv"
    truth.write_text(
        "@@TAXID RANK TAXPATH TAXPATHSN PERCENTAGE\n"
        "2\tsuperkingdom\t2||||||\tBacteria||||||\t100.000000\n"
    )

    ref_prof = tmp_path / "ref_profile.tsv"
    our_prof = tmp_path / "our_profile.tsv"
    write_profile(ref_prof)
    write_profile(our_prof)

    subprocess.run(
        [
            sys.executable,
            str(REF / "bench/tools/fix_superkingdom_taxids.py"),
            "--profile",
            str(ref_prof),
            "--truth-profile",
            str(truth),
            "--taxonomy",
            str(hier),
        ],
        check=True,
        capture_output=True,
    )

    from hymet_tpu.evalx.superkingdom_fix import fix_superkingdom

    fix_superkingdom(str(our_prof), str(truth), str(hier))
    assert our_prof.read_text() == ref_prof.read_text()
    # the GTDB superkingdom got rebuilt onto taxid 2 from the phylum rows
    assert "\n2\tsuperkingdom" in our_prof.read_text()


ZYMO_PAF = REF / "case/truth/zymo_mc/zymo_mc_vs_refs.paf"
ZYMO_TRUTH = REF / "case/truth/zymo_mc/truth_contigs.tsv"


@pytest.mark.skipif(not ZYMO_PAF.exists(), reason="reference absent")
def test_zymo_truth_builder_matches_committed_truth(tmp_path, mini_taxdb):
    """Rebuild the Zymo truth from the in-repo PAF and compare contig
    assignments with the reference's committed truth_contigs.tsv."""
    hier_dir = tmp_path
    mini_taxdb.write_hierarchy_tsv(str(tmp_path / "taxonomy_hierarchy.tsv"))

    # contigs FASTA is not in-repo; lengths fall back to 1 (affects only
    # profile weights, not assignments)
    fake_contigs = tmp_path / "contigs.fna"
    fake_contigs.write_text(">none\nACGT\n")

    from hymet_tpu.harness.zymo_truth import build_zymo_truth

    assignments = build_zymo_truth(
        contigs=str(fake_contigs),
        paf=str(ZYMO_PAF),
        seqmap=str(REF / "case/truth/zymo_refs/seqid2taxid.tsv"),
        out_contigs=str(tmp_path / "truth_contigs.tsv"),
        out_profile=str(tmp_path / "truth_profile.cami.tsv"),
        taxonomy_dir=str(hier_dir),
    )

    committed = {}
    with ZYMO_TRUTH.open() as f:
        for row in csv.DictReader(f, delimiter="\t"):
            committed[row["contig_id"]] = (row["taxid"], row["rank"])

    ours = {c: (str(v[0]), v[1]) for c, v in assignments.items()}
    assert len(ours) == len(committed)
    agree = sum(1 for c in committed if ours.get(c) == committed[c])
    # full agreement expected: assignment needs only seqid2taxid + genus
    # climbing, both covered by the mini taxonomy
    assert agree == len(committed), f"only {agree}/{len(committed)} agree"

    # profile got the ALT superkingdom remap
    prof = (tmp_path / "truth_profile.cami.tsv").read_text()
    assert "3379134\tsuperkingdom" in prof


def test_case_metrics():
    from hymet_tpu.harness.case import spearman, symmetric_kl

    a = {"1": 50.0, "2": 30.0, "3": 20.0}
    assert symmetric_kl(a, a) == pytest.approx(0.0, abs=1e-9)
    assert spearman(a, a) == pytest.approx(1.0)
    b = {"1": 20.0, "2": 30.0, "3": 50.0}  # reversed order
    assert spearman(a, b) == pytest.approx(-1.0)
    assert symmetric_kl(a, b) > 0


def test_rank_fallback_stats(tmp_path):
    from hymet_tpu.harness.ablation import rank_fallback_stats

    p = tmp_path / "classified.tsv"
    p.write_text(
        "Query\tLineage\tTaxonomic Level\tConfidence\n"
        "c1\tx\tspecies\t1.0\n"
        "c2\tx\tgenus\t0.9\n"
        "c3\tx\tphylum\t0.8\n"
        "c4\tUnknown\troot\t0.0\n"
    )
    stats = rank_fallback_stats(str(p))
    assert stats["total"] == 4
    assert stats["species"] == 25.0
    assert stats["genus"] == 25.0
    assert stats["higher"] == 25.0
    assert stats["unknown"] == 25.0


def test_ablate_db_determinism(tmp_path):
    from hymet_tpu.harness.ablation import ablate_db

    fasta = tmp_path / "ref.fasta"
    with fasta.open("w") as f:
        for i in range(10):
            f.write(f">seq{i}\nACGTACGTACGT\n")
    seqmap = tmp_path / "seqmap.tsv"
    seqmap.write_text("".join(f"seq{i}\t{100 + i % 2}\n" for i in range(10)))

    out1 = ablate_db(str(fasta), str(seqmap), ["100", "101"], [0.0, 0.5, 1.0], str(tmp_path / "o1"))
    out2 = ablate_db(str(fasta), str(seqmap), ["100", "101"], [0.0, 0.5, 1.0], str(tmp_path / "o2"))
    for (l1, p1), (l2, p2) in zip(out1, out2):
        assert l1 == l2
        assert Path(p1).read_text() == Path(p2).read_text()  # seeded RNG
    # level 0: nothing removed; level 1: everything removed
    assert ">seq0" in Path(out1[0][1]).read_text()
    assert Path(out1[2][1]).read_text() == ""
    # level 0.5 removed half per taxid
    # round(2.5) banker-rounds to 2 per taxid (reference ablate_db.py:58)
    mid = Path(out1[1][1]).read_text().count(">")
    assert mid == 6
