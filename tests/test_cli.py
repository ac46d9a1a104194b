"""CLI smoke tests — dry-run argument plumbing, mirroring the reference's
CI strategy (reference tests/test_cli.py: six --dry-run invocations)."""

import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
CLI = ROOT / "bin" / "hymet-tpu"


def run_cli(*args):
    return subprocess.run(
        [sys.executable, str(CLI), *args],
        check=True,
        cwd=ROOT,
        capture_output=True,
        text=True,
    )


def test_run_dry_run():
    out = run_cli(
        "run",
        "--contigs",
        "contigs.fna",
        "--out",
        "out/ci",
        "--threads",
        "1",
        "--dry-run",
    )
    assert "screen -> limit -> reference -> align -> classify -> export" in out.stdout
    assert "cand_max=5000" in out.stdout  # default


def test_run_flags_reach_config():
    out = run_cli(
        "run",
        "--contigs",
        "c.fna",
        "--out",
        "o",
        "--cand-max",
        "1500",
        "--species-dedup",
        "--backend",
        "host",
        "--dry-run",
    )
    assert "cand_max=1500" in out.stdout
    assert "species_dedup=True" in out.stdout
    assert "classifier_backend='host'" in out.stdout


def test_bench_dry_run():
    out = run_cli(
        "bench", "--manifest", "m.tsv", "--tools", "hymet_tpu", "--max-samples", "1", "--dry-run"
    )
    assert "bench:" in out.stdout


def test_case_dry_run():
    out = run_cli("case", "--manifest", "m.tsv", "--dry-run")
    assert "case:" in out.stdout


def test_ablation_dry_run():
    out = run_cli(
        "ablation",
        "--sample",
        "zymo_mc",
        "--taxa",
        "1613,1280",
        "--levels",
        "0,0.5,1.0",
        "--dry-run",
    )
    assert "ablation:" in out.stdout


def test_truth_build_zymo_dry_run():
    out = run_cli(
        "truth",
        "build-zymo",
        "--contigs",
        "c.fna",
        "--paf",
        "x.paf",
        "--out-contigs",
        "t.tsv",
        "--out-profile",
        "p.tsv",
        "--dry-run",
    )
    assert "truth build-zymo:" in out.stdout


def test_legacy_dry_run():
    out = run_cli(
        "legacy", "--contigs", "c.fna", "--out", "o", "--dry-run"
    )
    assert "classifier_backend='legacy'" in out.stdout


def test_sketch_index_taxonomy_dry_run():
    out = run_cli("sketch", "g1.fna", "g2.fna", "--out", "db.npz", "--dry-run")
    assert "sketch: 2 genome files" in out.stdout
    out = run_cli("index", "ref.fasta", "--out", "idx.npz", "--dry-run")
    assert "index: ref.fasta" in out.stdout
    out = run_cli("taxonomy", "taxdump/", "--dry-run")
    assert "taxonomy: taxdump/" in out.stdout


def test_missing_subcommand_errors():
    proc = subprocess.run(
        [sys.executable, str(CLI)], cwd=ROOT, capture_output=True, text=True
    )
    assert proc.returncode != 0


def test_unknown_flag_errors():
    proc = subprocess.run(
        [sys.executable, str(CLI), "run", "--nope"],
        cwd=ROOT,
        capture_output=True,
        text=True,
    )
    assert proc.returncode != 0
