"""Targeted unit tests: identifier lookup cascade, PAF round-trip,
config env layer, fetch idempotence."""

import os

import pytest

from hymet_tpu.io.paf import PafRecord, read_paf, write_paf
from hymet_tpu.taxonomy.idmap import (
    IdentifierMap,
    generate_lookup_candidates,
    split_identifiers,
)
from hymet_tpu.utils.config import RunConfig


def test_generate_lookup_candidates_order():
    # reference cascade: original, versionless, head token, embedded accs
    cands = generate_lookup_candidates("GCF_000005845.2_ASM584v2|extra stuff")
    assert cands[0] == "GCF_000005845.2_ASM584v2|extra stuff"
    assert "GCF_000005845.2_ASM584v2|extra stuff".split(".", 1)[0] in cands
    assert "GCF_000005845.2_ASM584v2" in cands  # head token
    assert "GCF_000005845.2" in cands  # embedded GCF
    assert "GCF_000005845" in cands  # versionless


def test_generate_lookup_candidates_contig_acc():
    cands = generate_lookup_candidates("NZ_CP157198.1")
    assert cands[0] == "NZ_CP157198.1"
    assert "NZ_CP157198" in cands


def test_split_identifiers():
    assert split_identifiers("a;b|c,d e") == ["a", "b", "c", "d", "e"]
    assert split_identifiers("") == []
    assert split_identifiers(None) == []


def test_idmap_first_mapping_wins():
    m = IdentifierMap()
    m.add_token("NC_1.1", "100")
    m.add_token("NC_1.2", "200")  # versionless NC_1 already taken by 100
    assert m.get("NC_1") == "100"
    assert m.get("NC_1.2") == "200"


def test_paf_roundtrip(tmp_path):
    recs = [
        PafRecord("q1", 1000, 0, 990, "+", "t1", 5000, 100, 1090, 950, 990, 60,
                  {"tp": "A:P", "cm": "i:55"}),
        PafRecord("q2", 500, 10, 490, "-", "t2", 9000, 2000, 2480, 400, 480, 0,
                  {"tp": "A:S"}),
    ]
    p = str(tmp_path / "x.paf")
    write_paf(p, recs)
    back = read_paf(p)
    assert len(back) == 2
    assert back[0].qname == "q1" and back[0].tags["tp"] == "A:P"
    assert back[1].strand == "-" and back[1].coverage == pytest.approx(480 / 500)


def test_run_config_env(monkeypatch):
    monkeypatch.setenv("INPUT_FASTA", "/x.fna")
    monkeypatch.setenv("CAND_MAX", "1500")
    monkeypatch.setenv("SPECIES_DEDUP", "1")
    monkeypatch.setenv("MASH_THRESH", "0.85")
    monkeypatch.setenv("SKETCH_DBS", "/a.npz" + os.pathsep + "/b.npz")
    cfg = RunConfig.from_env()
    assert cfg.input_fasta == "/x.fna"
    assert cfg.cand_max == 1500
    assert cfg.species_dedup is True
    assert cfg.mash_thresh == 0.85
    assert cfg.sketch_dbs == ["/a.npz", "/b.npz"]
    # override beats env
    cfg = RunConfig.from_env(cand_max=99)
    assert cfg.cand_max == 99


def test_fetch_skips_existing(tmp_path):
    from hymet_tpu.harness.fetch import fetch_url

    target = tmp_path / "x.bin"
    target.write_bytes(b"data")
    # existing non-empty file: no network touched, returns True
    assert fetch_url("http://127.0.0.1:1/never", str(target)) is True
    # missing file + dead URL: clean False
    assert fetch_url("http://127.0.0.1:1/never", str(tmp_path / "y.bin")) is False
