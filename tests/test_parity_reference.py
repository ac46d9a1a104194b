"""Byte-parity integration tests: run the ACTUAL reference classifier
scripts (as subprocess oracles) on generated fixture inputs and diff their
output against ours, byte for byte.

The fixtures are built from in-repo reference data only (Zymo PAF +
seqid2taxid) — no network. Skipped when /root/reference is absent.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REF = Path("/root/reference")
ZYMO_PAF = REF / "case/truth/zymo_mc/zymo_mc_vs_refs.paf"
SEQID2TAXID = REF / "case/truth/zymo_refs/seqid2taxid.tsv"

pytestmark = pytest.mark.skipif(
    not ZYMO_PAF.exists(), reason="reference checkout absent"
)


@pytest.fixture(scope="module")
def fixture_inputs(tmp_path_factory, request):
    """detailed_taxonomy.tsv + taxonomy_hierarchy.tsv built from the Zymo
    seqid2taxid table and the mini taxonomy."""
    mini_taxdb = request.getfixturevalue("mini_taxdb")
    tmp = tmp_path_factory.mktemp("parity")

    # group seqids by taxid -> one detailed_taxonomy row per taxid
    by_taxid = {}
    for line in SEQID2TAXID.read_text().splitlines():
        parts = line.split("\t")
        if len(parts) >= 2:
            by_taxid.setdefault(parts[1].strip(), []).append(parts[0].strip())

    dt = tmp / "detailed_taxonomy.tsv"
    with dt.open("w") as f:
        f.write("GCF\tTaxID\tIdentifiers\n")
        for i, (taxid, seqids) in enumerate(sorted(by_taxid.items())):
            f.write(f"GCF_{900000 + i:09d}.1\t{taxid}\t{';'.join(seqids)}\n")

    # hierarchy TSV with "domain" rank labels (post-2024 NCBI style) so the
    # reference's alias table — which lacks the identity "superkingdom"
    # key — parses rank 0 (see hymet_tpu/__init__.py RANK_ALIAS note).
    hier = tmp / "taxonomy_hierarchy.tsv"
    with hier.open("w") as f:
        f.write("TaxID\tName\tRank\tParentTaxID\tLineage\n")
        for taxid in mini_taxdb.rank:
            name = mini_taxdb.name.get(taxid, "Unknown")
            rank = mini_taxdb.rank[taxid]
            parent = mini_taxdb.parent.get(taxid, "1")
            lineage = mini_taxdb.lineage_string(taxid).replace(
                "superkingdom:", "domain:"
            )
            rank_out = "domain" if rank == "superkingdom" else rank
            f.write(f"{taxid}\t{name}\t{rank_out}\t{parent}\t{lineage}\n")
    return {"taxonomy": dt, "hierarchy": hier, "tmp": tmp}


def test_production_classifier_byte_parity(fixture_inputs):
    tmp = fixture_inputs["tmp"]
    ref_out = tmp / "ref_classified.tsv"
    ours_out = tmp / "ours_classified.tsv"

    subprocess.run(
        [
            sys.executable,
            str(REF / "scripts/classification_cami.py"),
            "--paf",
            str(ZYMO_PAF),
            "--taxonomy",
            str(fixture_inputs["taxonomy"]),
            "--hierarchy",
            str(fixture_inputs["hierarchy"]),
            "--output",
            str(ref_out),
            "--processes",
            "2",
        ],
        check=True,
        capture_output=True,
    )

    from hymet_tpu.models.weighted_lca import classify_paf

    classified, total = classify_paf(
        str(ZYMO_PAF),
        str(fixture_inputs["taxonomy"]),
        str(fixture_inputs["hierarchy"]),
        str(ours_out),
        backend="jax",
    )
    assert total > 1000
    assert classified > 500

    ref_bytes = ref_out.read_bytes()
    our_bytes = ours_out.read_bytes()
    if ref_bytes != our_bytes:
        # show first differing line for debuggability
        for i, (a, b) in enumerate(
            zip(ref_bytes.split(b"\r\n"), our_bytes.split(b"\r\n"))
        ):
            assert a == b, f"first diff at row {i}: {a!r} vs {b!r}"
        assert len(ref_bytes) == len(our_bytes)


def test_legacy_classifier_byte_parity(fixture_inputs):
    tmp = fixture_inputs["tmp"]
    ref_out = tmp / "ref_legacy.tsv"
    ours_out = tmp / "ours_legacy.tsv"

    subprocess.run(
        [
            sys.executable,
            str(REF / "scripts/classification.py"),
            "--paf",
            str(ZYMO_PAF),
            "--taxonomy",
            str(fixture_inputs["taxonomy"]),
            "--hierarchy",
            str(fixture_inputs["hierarchy"]),
            "--output",
            str(ref_out),
            "--processes",
            "2",
        ],
        check=True,
        capture_output=True,
    )

    from hymet_tpu.models.legacy_lca import classify_paf_legacy

    classify_paf_legacy(
        str(ZYMO_PAF),
        str(fixture_inputs["taxonomy"]),
        str(fixture_inputs["hierarchy"]),
        str(ours_out),
    )
    assert ref_out.read_bytes() == ours_out.read_bytes()


def test_first_hit_fallback_parity(fixture_inputs, tmp_path):
    """Oracle: tools/build_id_map.py + tools/mini_classify.py."""
    id_map_ref = tmp_path / "idmap_ref.tsv"
    out_ref = tmp_path / "fallback_ref.tsv"
    subprocess.run(
        [
            sys.executable,
            str(REF / "tools/build_id_map.py"),
            str(fixture_inputs["taxonomy"]),
            str(id_map_ref),
        ],
        check=True,
        capture_output=True,
    )
    subprocess.run(
        [
            sys.executable,
            str(REF / "tools/mini_classify.py"),
            str(ZYMO_PAF),
            str(id_map_ref),
            str(out_ref),
        ],
        check=True,
        capture_output=True,
    )

    from hymet_tpu.models.first_hit import build_id_map, classify_first_hit

    id2tax = build_id_map(str(fixture_inputs["taxonomy"]))
    # our id map must match the oracle's (key -> taxid)
    ref_map = {}
    for line in id_map_ref.read_text().splitlines():
        k, v = line.split("\r")[0].split("\t")[:2]
        ref_map[k] = v
    assert id2tax == ref_map

    rows, tot = classify_first_hit(str(ZYMO_PAF), id2tax)
    ref_rows = [
        tuple(line.split("\t"))
        for line in out_ref.read_text().replace("\r", "").splitlines()[1:]
        if line
    ]
    assert [tuple(r) for r in rows] == ref_rows
    assert tot > 1000
