"""Derived CAMI subset generation tests."""

import csv
import os

import pytest

from hymet_tpu.data.cami_subsets import generate_cami_subsets


@pytest.fixture()
def cami_world(tmp_path, mini_taxdb):
    # gsa_mapping-style truth: contig, genome, taxid, ..., start, end
    mapping = tmp_path / "gsa_mapping.tsv"
    rows = [
        # taxid 562 (E.coli): 3 contigs, total 9000 (largest)
        ("c1", "g1", "562", "x", "y", "1", "3000"),
        ("c2", "g1", "562", "x", "y", "1", "3000"),
        ("c3", "g1", "562", "x", "y", "1", "3000"),
        # taxid 1423: 4000
        ("c4", "g2", "1423", "x", "y", "1", "4000"),
        # taxid 287: 2000
        ("c5", "g3", "287", "x", "y", "1", "2000"),
        # taxid 1280: 1000
        ("c6", "g4", "1280", "x", "y", "1", "1000"),
    ]
    with mapping.open("w") as f:
        f.write("#anonymous_contig_id\tgenome_id\ttax_id\ta\tb\tstart\tend\n")
        for r in rows:
            f.write("\t".join(r) + "\n")

    fasta = tmp_path / "contigs.fna"
    with fasta.open("w") as f:
        for r in rows:
            length = int(r[6])
            f.write(f">{r[0]}\n" + "A" * length + "\n")
    return {"mapping": str(mapping), "fasta": str(fasta), "db": mini_taxdb}


def test_partition_by_length(cami_world, tmp_path):
    out = generate_cami_subsets(
        cami_world["fasta"],
        cami_world["mapping"],
        cami_world["db"],
        str(tmp_path / "subsets"),
        partitions=[("big", 2), ("small", 2)],
    )
    # sorted by assembled length desc: 562 (9000), 1423 (4000) -> big
    assert out["big"] == ["562", "1423"]
    assert out["small"] == ["287", "1280"]

    # per-sample outputs
    big_dir = tmp_path / "subsets" / "big"
    contigs = (big_dir / "contigs.fna").read_text()
    assert ">c1" in contigs and ">c4" in contigs and ">c5" not in contigs
    truth = (big_dir / "truth_contigs.tsv").read_text()
    assert "c1\t" in truth and "c6\t" not in truth

    prof = (big_dir / "truth_profile.tsv").read_text()
    # species rows length-weighted: 9000/13000 and 4000/13000
    assert "562\tspecies" in prof
    assert f"{9000/13000*100:.4f}" in prof
    assert "@@TAXID" in prof


def test_partition_insufficient_taxa(cami_world, tmp_path):
    with pytest.raises(RuntimeError, match="Not enough taxa"):
        generate_cami_subsets(
            cami_world["fasta"],
            cami_world["mapping"],
            cami_world["db"],
            str(tmp_path / "s2"),
            partitions=[("a", 10)],
        )
