"""Baseline-runner leg tests with fake tool executables on PATH.

The real kraken2/bracken/ganon binaries are not installed here (they are
external baselines, SURVEY.md §2.1); shim scripts reproduce their output
contracts so the runner logic — bracken refinement + fallback
(``bench/run_kraken2.sh:79-108``), --use-names taxid extraction, and the
ganon bioboxes report leg (``bench/run_ganon2.sh:80-95``) — is testable.
"""

import os
import stat

import pytest

from hymet_tpu.harness.baselines import (
    _kraken_taxid,
    run_baseline_tool,
)
from hymet_tpu.harness.manifest import ManifestRow


KREPORT = (
    "100.00\t10\t0\tR\t1\troot\n"
    " 90.00\t9\t0\tD\t2\t  Bacteria\n"
    " 80.00\t8\t0\tS\t562\t    Escherichia coli\n"
)
BRACKEN_KREPORT = (
    "100.00\t10\t0\tR\t1\troot\n"
    " 90.00\t9\t0\tD\t2\t  Bacteria\n"
    " 85.00\t8\t0\tS\t562\t    Escherichia coli\n"
)


def _shim(bindir, name, script):
    p = bindir / name
    p.write_text("#!/bin/sh\n" + script)
    p.chmod(p.stat().st_mode | stat.S_IEXEC)


@pytest.fixture()
def world(tmp_path, monkeypatch):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    contigs = tmp_path / "contigs.fna"
    contigs.write_text(">c1\nACGT\n")
    row = ManifestRow(sample_id="s1", contigs=str(contigs))
    return {"bindir": bindir, "row": row, "tmp": tmp_path}


def _kraken2_shim(bindir):
    # writes a kreport and a --use-names per-read output
    _shim(
        bindir,
        "kraken2",
        """
report=""; output=""
while [ $# -gt 0 ]; do
  case "$1" in
    --report) report="$2"; shift 2;;
    --output) output="$2"; shift 2;;
    *) shift;;
  esac
done
printf '%s' "$KREPORT_BODY" > "$report"
printf 'C\\tc1\\tEscherichia coli (taxid 562)\\t4\\t562:1\\n' > "$output"
""",
    )


def test_kraken2_bracken_refinement(world, monkeypatch, tmp_path):
    _kraken2_shim(world["bindir"])
    monkeypatch.setenv("KREPORT_BODY", KREPORT)
    monkeypatch.setenv("KRAKEN2_DB", str(tmp_path))
    monkeypatch.setenv("BRACKEN_BODY", BRACKEN_KREPORT)
    _shim(
        world["bindir"],
        "bracken",
        """
w=""
while [ $# -gt 0 ]; do
  case "$1" in
    -w) w="$2"; shift 2;;
    -o) o="$2"; shift 2;;
    *) shift;;
  esac
done
printf '%s' "$BRACKEN_BODY" > "$w"
: > "$o"
""",
    )
    out = tmp_path / "k2"
    out.mkdir()
    assert run_baseline_tool("kraken2", world["row"], str(out), 1)
    prof = (out / "profile.cami.tsv").read_text()
    # species percentage must come from the bracken-refined report (85),
    # normalized to 100 as the only species row
    assert "562\tspecies" in prof
    assert (out / "bracken_species.kreport").exists()
    # per-contig taxid extracted from the --use-names column
    rows = (out / "classified_sequences.tsv").read_text().splitlines()
    assert rows[1] == "c1\t562"


def test_kraken2_bracken_fallback(world, monkeypatch, tmp_path):
    _kraken2_shim(world["bindir"])
    monkeypatch.setenv("KREPORT_BODY", KREPORT)
    monkeypatch.setenv("KRAKEN2_DB", str(tmp_path))
    _shim(world["bindir"], "bracken", "exit 1\n")  # bracken fails
    out = tmp_path / "k2f"
    out.mkdir()
    assert run_baseline_tool("kraken2", world["row"], str(out), 1)
    # raw kraken2 report used instead
    prof = (out / "profile.cami.tsv").read_text()
    assert "562\tspecies" in prof


def test_ganon_bioboxes_report(world, monkeypatch, tmp_path):
    monkeypatch.setenv("GANON_DB", str(tmp_path / "gdb"))
    _shim(
        world["bindir"],
        "ganon",
        """
cmd="$1"; shift
prefix=""
while [ $# -gt 0 ]; do
  case "$1" in
    --output-prefix) prefix="$2"; shift 2;;
    *) shift;;
  esac
done
if [ "$cmd" = "classify" ]; then
  printf 'c1\\t562\\t1\\n' > "$prefix.one"
  : > "$prefix.rep"
else
  printf '@SampleID:s1\\n562\\tspecies\\t2|562\\tBacteria|Escherichia coli\\t100.0\\n' > "$prefix.tre"
fi
""",
    )
    out = tmp_path / "ganon"
    out.mkdir()
    assert run_baseline_tool("ganon2", world["row"], str(out), 1)
    # the bioboxes .tre is the CAMI profile verbatim
    prof = (out / "profile.cami.tsv").read_text()
    assert prof.startswith("@SampleID:s1")
    rows = (out / "classified_sequences.tsv").read_text().splitlines()
    assert rows[1] == "c1\t562"


def test_kraken_taxid_forms():
    assert _kraken_taxid("Escherichia coli (taxid 562)") == "562"
    assert _kraken_taxid("562") == "562"
    assert _kraken_taxid("unclassified") == "0"


def test_centrifuge_kreport_leg(world, monkeypatch, tmp_path, mini_taxdb):
    """Centrifuge runner: classify -> centrifuge-kreport (stdout capture)
    -> CAMI profile (``bench/run_centrifuge.sh`` contract)."""
    monkeypatch.setenv("CENTRIFUGE_DB", str(tmp_path / "cfdb"))
    _shim(
        world["bindir"],
        "centrifuge",
        """
out=""
while [ $# -gt 0 ]; do
  case "$1" in
    -S) out="$2"; shift 2;;
    *) shift;;
  esac
done
printf 'readID\\tseqID\\ttaxID\\tscore\\n' > "$out"
printf 'c1\\tNC_000913.3\\t562\\t100\\n' >> "$out"
""",
    )
    # the runner captures this tool's STDOUT into the kreport file
    _shim(
        world["bindir"],
        "centrifuge-kreport",
        """
printf '100.00\\t10\\t0\\tR\\t1\\troot\\n'
printf ' 90.00\\t9\\t0\\tD\\t2\\t  Bacteria\\n'
printf ' 80.00\\t8\\t0\\tS\\t562\\t    Escherichia coli\\n'
""",
    )
    out = tmp_path / "cf"
    out.mkdir()
    assert run_baseline_tool("centrifuge", world["row"], str(out), 1)
    prof = (out / "profile.cami.tsv").read_text()
    assert "562\tspecies" in prof
    assert (out / "centrifuge.out").read_text().splitlines()[1].startswith("c1\t")
    assert (out / "metadata.json").exists()


def test_sourmash_gather_leg(world, monkeypatch, tmp_path, mini_taxdb):
    """Sourmash runner: sketch -> gather CSV -> seqmap-resolved CAMI
    profile (``bench/run_sourmash.sh`` contract). The gather CSV's match
    name resolves through the versionless-accession fallback."""
    monkeypatch.setenv("SOURMASH_DB", str(tmp_path / "smdb.zip"))
    seqmap = tmp_path / "seqid2taxid.tsv"
    # versionless key: the gather name carries NC_000913.3
    seqmap.write_text("NC_000913\t562\n")
    monkeypatch.setenv("SOURMASH_SEQMAP", str(seqmap))
    hier_dir = tmp_path / "tax"
    hier_dir.mkdir()
    mini_taxdb.write_hierarchy_tsv(str(hier_dir / "taxonomy_hierarchy.tsv"))
    monkeypatch.setenv("TAXONKIT_DB", str(hier_dir))
    _shim(
        world["bindir"],
        "sourmash",
        """
cmd="$1"; shift
out=""
while [ $# -gt 0 ]; do
  case "$1" in
    -o) out="$2"; shift 2;;
    *) shift;;
  esac
done
if [ "$cmd" = "sketch" ]; then
  printf 'sig' > "$out"
else
  printf 'name,f_unique_to_query\\n' > "$out"
  printf '"NC_000913.3 Escherichia coli str. K-12",0.8\\n' >> "$out"
fi
""",
    )
    out = tmp_path / "sm"
    out.mkdir()
    assert run_baseline_tool("sourmash", world["row"], str(out), 1)
    prof = (out / "profile.cami.tsv").read_text()
    assert "562\tspecies\t2|" in prof
    assert "Escherichia coli" in prof


def test_metaphlan_split_reads_retry(world, monkeypatch, tmp_path, mini_taxdb):
    """MetaPhlAn runner: a first failure retries with <=4 threads +
    --split_reads (``bench/run_metaphlan4.sh:101-125``); the v4 4-column
    dialect (taxid chain in col 2) converts by lineage NAME, not by the
    chain column."""
    hier_dir = tmp_path / "tax"
    hier_dir.mkdir()
    mini_taxdb.write_hierarchy_tsv(str(hier_dir / "taxonomy_hierarchy.tsv"))
    monkeypatch.setenv("TAXONKIT_DB", str(hier_dir))
    _shim(
        world["bindir"],
        "metaphlan",
        """
out=""
split=0
while [ $# -gt 0 ]; do
  case "$1" in
    -o) out="$2"; shift 2;;
    --split_reads) split=1; shift;;
    *) shift;;
  esac
done
[ "$split" = "1" ] || exit 1
printf '#mpa_vJun23\\n' > "$out"
printf '#clade_name\\tNCBI_tax_id\\trelative_abundance\\tadditional_species\\n' >> "$out"
printf 'k__Bacteria\\t2\\t100.0\\t\\n' >> "$out"
printf 'k__Bacteria|p__Pseudomonadota|c__Gammaproteobacteria|o__Enterobacterales|f__Enterobacteriaceae|g__Escherichia|s__Escherichia_coli\\t2|1224|1236|91347|543|561|562\\t100.0\\t\\n' >> "$out"
""",
    )
    out = tmp_path / "mp4"
    out.mkdir()
    assert run_baseline_tool("metaphlan4", world["row"], str(out), 4)
    prof = (out / "profile.cami.tsv").read_text()
    # species row resolved via name2taxid on the s__ component
    assert "562\tspecies" in prof
    assert "Escherichia coli" in prof
