"""Converter tests: metaphlan lineages, sourmash gather, kreport trees."""

import pytest

from hymet_tpu.evalx.converters import (
    metaphlan_lineage_names,
    metaphlan_to_cami,
    sourmash_gather_to_cami,
    sourmash_lookup_taxid,
)
from hymet_tpu.harness.baselines import parse_kreport


def test_metaphlan_lineage_names():
    out = metaphlan_lineage_names(
        "k__Bacteria|p__Firmicutes|g__Bacillus|s__Bacillus_subtilis"
    )
    assert out["superkingdom"] == "Bacteria"
    assert out["species"] == "Bacillus subtilis"  # underscores -> spaces


def test_metaphlan_legacy_integer_abundance_with_extra_columns(tmp_path):
    """A legacy-dialect file whose abundance is a bare integer (which
    also looks like a taxid) and which carries >= 3 columns must NOT be
    misread as the v4 layout (ADVICE round 3): column 2 stays the
    abundance unless a multi-rank |-chain appears somewhere."""
    from hymet_tpu.evalx.converters import read_metaphlan

    src = tmp_path / "legacy.tsv"
    src.write_text(
        "#mpa_v2\n"
        "k__Bacteria\t12\t0.5\n"
        "k__Bacteria|p__Bacillota\t88.5\t0.9\n"
    )
    rows = read_metaphlan(str(src))
    assert rows == [("k__Bacteria", 12.0), ("k__Bacteria|p__Bacillota", 88.5)]


def test_metaphlan_v4_detection_needs_chain(tmp_path):
    """v4 layout: every row chain-shaped in col 2, some chain multi-rank
    -> abundances come from column 3."""
    from hymet_tpu.evalx.converters import read_metaphlan

    src = tmp_path / "v4.tsv"
    src.write_text(
        "#clade_name\tNCBI_tax_id\trelative_abundance\tadditional_species\n"
        "k__Bacteria\t2\t70.25\t\n"
        "k__Bacteria|p__Bacillota\t2|1239\t70.25\t\n"
    )
    rows = read_metaphlan(str(src))
    assert rows == [("k__Bacteria", 70.25), ("k__Bacteria|p__Bacillota", 70.25)]


def test_metaphlan_to_cami(tmp_path, mini_taxdb):
    src = tmp_path / "mp.tsv"
    src.write_text(
        "#mpa_v4\n"
        "k__Bacteria\t60.0\n"
        "k__Bacteria|p__Bacillota|c__Bacilli|o__Bacillales|f__Bacillaceae|g__Bacillus|s__Bacillus_subtilis\t40.0\n"
    )
    out = tmp_path / "cami.tsv"
    n = metaphlan_to_cami(str(src), str(out), "s1", mini_taxdb)
    assert n == 2
    text = out.read_text()
    assert "1423\tspecies" in text
    assert "2\tsuperkingdom" in text


def test_sourmash_lookup_taxid():
    seqmap = {"NC_000913": "562", "NZ_CP1.1": "1423"}
    assert sourmash_lookup_taxid("NC_000913.3 Escherichia coli", seqmap) == "562"
    assert sourmash_lookup_taxid("NZ_CP1.1", seqmap) == "1423"
    assert sourmash_lookup_taxid("unknown thing", seqmap) is None
    assert sourmash_lookup_taxid("", seqmap) is None


def test_sourmash_gather_to_cami(tmp_path, mini_taxdb):
    csv_path = tmp_path / "gather.csv"
    csv_path.write_text(
        "name,f_unique_to_query\n"
        '"NC_1.1 Escherichia coli chromosome",0.4\n'
        '"NC_2.1 Bacillus subtilis",0.1\n'
        '"unmappable",0.5\n'
    )
    out = tmp_path / "cami.tsv"
    n = sourmash_gather_to_cami(
        str(csv_path),
        {"NC_1": "562", "NC_2": "1423"},
        str(out),
        "s1",
        mini_taxdb,
    )
    assert n == 2
    text = out.read_text()
    assert "562\tspecies" in text and "1423\tspecies" in text
    # normalized to 100 within the species rank: 40/(40+10) = 80%
    assert "80.000000" in text


def test_parse_kreport(tmp_path):
    rep = tmp_path / "k.report"
    rep.write_text(
        " 90.00\t900\t0\tD\t2\tBacteria\n"
        " 60.00\t600\t0\tP\t1239\t  Bacillota\n"
        " 50.00\t500\t10\tS\t1423\t    Bacillus subtilis\n"
        " 30.00\t300\t0\tP\t1224\t  Pseudomonadota\n"
    )
    rows = parse_kreport(str(rep))
    by_tid = {r["taxid"]: r for r in rows}
    assert by_tid["2"]["rank"] == "superkingdom"
    sp = by_tid["1423"]
    assert sp["rank"] == "species"
    # taxpath rebuilt from the indent stack
    assert sp["taxpath"].split("|")[0] == "2"
    assert sp["taxpath"].split("|")[1] == "1239"
    # sibling phylum doesn't inherit the other branch
    assert by_tid["1224"]["taxpath"].split("|")[1] == "1224"
