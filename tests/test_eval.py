"""Evaluator tests: metric math, profile parsing on the real in-repo Zymo
truth profile, self-evaluation sanity, and contig accuracy cascades."""

import collections
import os
from pathlib import Path

import pytest

from hymet_tpu.evalx.eval_cami import (
    RANKS,
    evaluate,
    presence_prf,
    profile_distance,
    read_profile,
    read_truth_assignments,
    rebuild_profile,
    score_contigs,
    taxid_digits,
)

REF = Path("/root/reference")
ZYMO_TRUTH_PROFILE = REF / "case/truth/zymo_mc/truth_profile.cami.tsv"
ZYMO_TRUTH_CONTIGS = REF / "case/truth/zymo_mc/truth_contigs.tsv"


def test_l1_and_bc():
    a = {"1": 60.0, "2": 40.0}
    b = {"1": 50.0, "3": 50.0}
    l1, bc = profile_distance(a, b)
    assert l1 == pytest.approx(0.5 * (10 + 40 + 50))
    shared = 50.0
    assert bc == pytest.approx((1 - 2 * shared / 200.0) * 100)
    # empty ranks score BC=100 (reference profile_summary semantics)
    assert profile_distance({}, {}) == (0.0, 100.0)


def test_presence_prf():
    a = {"1": 50.0, "2": 50.0, "3": 0.05}  # 3 below threshold
    b = {"1": 80.0, "4": 20.0}
    p, r, f1, tp, fp, fn = presence_prf(a, b)
    assert (tp, fp, fn) == (1, 1, 1)
    assert p == pytest.approx(50.0) and r == pytest.approx(50.0)


def test_taxid_digits():
    assert taxid_digits("taxid:12345") == "12345"
    assert taxid_digits("562") == "562"
    assert taxid_digits("abc") == ""
    assert taxid_digits("") == ""


@pytest.mark.skipif(not ZYMO_TRUTH_PROFILE.exists(), reason="reference absent")
def test_parse_real_zymo_truth_profile():
    prof = read_profile(str(ZYMO_TRUTH_PROFILE), None)
    # 2 superkingdoms, species sum to 100
    assert len(prof["superkingdom"]) == 2
    assert sum(prof["species"].values()) == pytest.approx(100.0, abs=0.01)
    assert "1613" in prof["species"]  # L. fermentum


@pytest.mark.skipif(not ZYMO_TRUTH_PROFILE.exists(), reason="reference absent")
def test_self_evaluation_perfect(tmp_path):
    evaluate(
        pred_profile=str(ZYMO_TRUTH_PROFILE),
        truth_profile=str(ZYMO_TRUTH_PROFILE),
        outdir=str(tmp_path),
    )
    rows = (tmp_path / "profile_summary.tsv").read_text().splitlines()[1:]
    for row in rows:
        cols = row.split("\t")
        rank, l1, bc, p, r, f1 = cols[0], *map(float, cols[1:6])
        assert l1 == pytest.approx(0.0)
        assert bc == pytest.approx(0.0)
        if int(cols[6]) > 0:  # TP present at this rank
            assert f1 == pytest.approx(100.0)


@pytest.mark.skipif(not ZYMO_TRUTH_CONTIGS.exists(), reason="reference absent")
def test_load_real_zymo_truth_contigs():
    m = read_truth_assignments(str(ZYMO_TRUTH_CONTIGS))
    assert len(m) == 893  # the Zymo case-study contig count
    assert m["ctg1"] == "1613"


def test_contig_eval_cascade(tmp_path, mini_taxdb):
    # classified TSV with lineages; truth with taxids
    pred = tmp_path / "classified.tsv"
    pred.write_text(
        "Query\tLineage\tTaxonomic Level\tConfidence\n"
        "c1\tsuperkingdom:Bacteria; genus:Escherichia; species:Escherichia coli\tspecies\t1.0000\n"
        "c2\tsuperkingdom:Bacteria; genus:Salmonella; species:Salmonella enterica\tspecies\t0.9\n"
        "c3\tUnknown\troot\t0.0000\n"
    )
    truth = tmp_path / "truth.tsv"
    truth.write_text(
        "contig_id\ttaxid\nc1\t562\nc2\t28901\nc3\t1423\n"
    )
    res = score_contigs(str(pred), [str(truth)], mini_taxdb, str(tmp_path))
    assert res["usable_pairs"] == 2  # c3 unresolvable
    assert res["exact"] == 2
    assert res["per_rank"]["species"]["acc"] == 100.0
    assert (tmp_path / "contigs_exact.tsv").exists()


def test_contig_eval_strain_collapses_to_species(tmp_path, mini_taxdb):
    pred = tmp_path / "classified.tsv"
    # strain-level lineage: eval collapses strain->species (eval alias)
    pred.write_text(
        "Query\tLineage\tTaxonomic Level\tConfidence\n"
        "c1\tspecies:Escherichia coli; strain:Escherichia coli str. K-12 substr. MG1655\tstrain\t1.0\n"
    )
    truth = tmp_path / "truth.tsv"
    truth.write_text("contig_id\ttaxid\nc1\t562\n")
    res = score_contigs(str(pred), [str(truth)], mini_taxdb, str(tmp_path))
    # deepest resolvable: the strain name maps to taxid 511145 != 562 at
    # exact level, but species-rank accuracy holds
    assert res["usable_pairs"] == 1
    assert res["per_rank"]["species"]["acc"] == 100.0


def test_rebuild_profile_length_weighted(mini_taxdb):
    contig2tid = {"c1": "562", "c2": "28901"}
    lengths = {"c1": 3000, "c2": 1000}
    prof = rebuild_profile(contig2tid, lengths, mini_taxdb)
    assert prof["species"]["562"] == pytest.approx(75.0)
    assert prof["species"]["28901"] == pytest.approx(25.0)
    # family rank: both Enterobacteriaceae -> 100%
    assert prof["family"]["543"] == pytest.approx(100.0)


def test_profile_parse_header_taxid_format(tmp_path):
    p = tmp_path / "prof.tsv"
    p.write_text(
        "taxid\trank\tpercentage\n562\tspecies\t60.0\n28901\tspecies\t40.0\n"
    )
    prof = read_profile(str(p), None)
    assert prof["species"]["562"] == pytest.approx(60.0)


def test_profile_parse_taxpath_format(tmp_path):
    p = tmp_path / "prof.tsv"
    p.write_text(
        "rank\ttaxpath\tpercentage\n"
        "species\t2|1224|1236|91347|543|561|562\t100.0\n"
    )
    prof = read_profile(str(p), None)
    assert prof["species"]["562"] == pytest.approx(100.0)


def test_classified_to_cami_length_weighting(tmp_path, mini_taxdb):
    """The converter's opt-in abundance weighting (CAMI convention);
    default stays count-weighted for reference byte parity
    (tools/hymet2cami.py:117-131)."""
    from hymet_tpu.evalx.cami import classified_to_cami, parse_cami_profile

    tsv = tmp_path / "classified_sequences.tsv"
    tsv.write_text(
        "Query\tLineage\tTaxonomic Level\tConfidence\n"
        "c1\tsuperkingdom:Bacteria; family:Enterobacteriaceae; "
        "species:Escherichia coli\tspecies\t1.0000\n"
        "c2\tsuperkingdom:Bacteria; family:Enterobacteriaceae; "
        "species:Salmonella enterica\tspecies\t1.0000\n"
    )

    def species_pcts(path):
        return {
            r["taxid"]: r["percentage"]
            for r in parse_cami_profile(str(path))
            if r["rank"] == "species"
        }

    out_count = tmp_path / "count.cami.tsv"
    classified_to_cami(str(tsv), mini_taxdb, str(out_count))
    assert species_pcts(out_count) == {"562": 50.0, "28901": 50.0}

    out_len = tmp_path / "len.cami.tsv"
    classified_to_cami(
        str(tsv), mini_taxdb, str(out_len), lengths={"c1": 3000, "c2": 1000}
    )
    assert species_pcts(out_len) == {"562": 75.0, "28901": 25.0}
    # a contig missing from the length map weighs 1, not 0
    out_partial = tmp_path / "partial.cami.tsv"
    classified_to_cami(
        str(tsv), mini_taxdb, str(out_partial), lengths={"c1": 3}
    )
    assert species_pcts(out_partial) == {"562": 75.0, "28901": 25.0}
