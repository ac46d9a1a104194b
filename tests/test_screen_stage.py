"""Screen-stage + candidate-limiting tests, incl. oracle parity with the
reference limit_candidates.py script run as a subprocess (offline mode)."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from hymet_tpu.io.sketchdb import build_sketch_db_from_sequences
from hymet_tpu.pipeline.candidates import (
    limit_candidates,
    limit_candidates_files,
    load_scores,
)
from hymet_tpu.pipeline.screen_stage import (
    adaptive_threshold_select,
    run_screen_stage,
    unique_sorted_rows,
)

REF_LIMIT = Path("/root/reference/scripts/limit_candidates.py")

_ACGT = np.frombuffer(b"ACGT", dtype=np.uint8)


def _rand_seq(rng, n):
    return rng.choice(_ACGT, size=n).astype(np.uint8).tobytes()


def _row(ident, name):
    return (ident, "10/100", 1, 0.0, name, "")


def test_unique_sorted_rows():
    rows = [_row(0.8, "a"), _row(0.95, "b"), _row(0.9, "a")]
    out = unique_sorted_rows(rows)
    assert [r[4] for r in out] == ["b", "a"]
    assert out[1][0] == 0.9  # best score kept for duplicate ref


def test_adaptive_threshold_basic():
    # 6 rows above 0.9: threshold stays at initial
    rows = [_row(0.95 - 0.001 * i, f"g{i}") for i in range(6)]
    top, used, minc = adaptive_threshold_select(rows, num_input_files=1)
    assert used == 0.9 and minc == 5
    assert len(top) == 6


def test_adaptive_threshold_walks_down():
    # only rows at 0.85: walk 0.9 -> 0.84 (first t with identity > t)
    rows = [_row(0.85, f"g{i}") for i in range(10)]
    top, used, _ = adaptive_threshold_select(rows, num_input_files=1)
    assert used == pytest.approx(0.84)
    assert len(top) == 10


def test_adaptive_threshold_fallback_071():
    # nothing above 0.70 in sufficient numbers: reference uses 0.71 (not
    # the echoed 0.70 — mash.sh:47-51)
    rows = [_row(0.72, "g0"), _row(0.60, "g1")]
    top, used, _ = adaptive_threshold_select(rows, num_input_files=1)
    assert used == 0.71
    assert [r[4] for r in top] == ["g0"]


def test_adaptive_threshold_min_candidates_scales_with_files():
    rows = [_row(0.95, f"g{i}") for i in range(40)]
    _, _, minc = adaptive_threshold_select(rows, num_input_files=10)
    assert minc == 33  # round(10 * 3.25 + 0.5) = 33 (bc + awk rounding)


def test_strictly_greater_than_threshold():
    # identity exactly at threshold is NOT selected (awk '$1 > t')
    rows = [_row(0.9, f"g{i}") for i in range(10)]
    top, used, _ = adaptive_threshold_select(rows, num_input_files=1)
    # 0.9 > 0.9 false -> walk down to 0.88
    assert used == pytest.approx(0.88)
    assert len(top) == 10


def test_run_screen_stage_end_to_end(tmp_path):
    rng = np.random.default_rng(23)
    genomes = {f"g{i}": _rand_seq(rng, 8000) for i in range(6)}
    db = build_sketch_db_from_sequences(list(genomes.items()), k=21, sketch_size=100)

    qf = tmp_path / "query.fna"
    with qf.open("w") as f:
        f.write(">c1\n" + genomes["g2"].decode() + "\n")
        f.write(">c2\n" + genomes["g4"][:4000].decode() + "\n")

    selected = run_screen_stage([db], [str(qf)], str(tmp_path / "out"))
    assert "g2" in selected
    assert (tmp_path / "out" / "selected_genomes.txt").exists()
    assert (tmp_path / "out" / "db1_screen.tab").exists()


def test_run_screen_stage_merged_matches_sequential(tmp_path):
    """The multi-DB stage screens once over a merged DB; its per-DB
    outputs must be byte-identical to sequential per-DB screens."""
    rng = np.random.default_rng(71)
    genomes = {f"g{i}": _rand_seq(rng, 6000) for i in range(9)}
    items = list(genomes.items())
    dbs = [
        build_sketch_db_from_sequences(items[0:3], k=21, sketch_size=80),
        build_sketch_db_from_sequences(items[3:6], k=21, sketch_size=120),
        build_sketch_db_from_sequences(items[6:9], k=21, sketch_size=80),
    ]
    qf = tmp_path / "query.fna"
    with qf.open("w") as f:
        f.write(">c1\n" + genomes["g1"].decode() + "\n")
        f.write(">c2\n" + genomes["g4"][:3000].decode() + "\n")
        f.write(">c3\n" + genomes["g8"].decode() + "\n")

    merged_out = tmp_path / "merged"
    sel_merged = run_screen_stage(dbs, [str(qf)], str(merged_out))

    # sequential oracle: per-DB single-DB stages (each its own stream)
    seq_out = tmp_path / "seq"
    union = []
    for i, db in enumerate(dbs):
        sub = run_screen_stage(
            [db], [str(qf)], str(seq_out / f"d{i}"), db_labels=[f"db{i+1}"]
        )
        union.extend(sub)
    assert sel_merged == sorted(set(union))
    for i in range(3):
        label = f"db{i+1}"
        for suffix in ("screen", "sorted", "top_hits"):
            a = (merged_out / f"{label}_{suffix}.tab").read_text()
            b = (seq_out / f"d{i}" / f"{label}_{suffix}.tab").read_text()
            assert a == b, f"{label}_{suffix}.tab differs"


# ---------------------------------------------------------------------
# limit_candidates oracle parity


@pytest.mark.skipif(not REF_LIMIT.exists(), reason="reference checkout absent")
def test_limit_candidates_oracle_parity(tmp_path):
    rng = np.random.default_rng(9)
    names = [f"GCF_{i:09d}.1_ASM{i}v1_genomic.fna.gz" for i in range(50)]
    rng.shuffle(names)

    selected = tmp_path / "selected.txt"
    selected.write_text("".join(n + "\n" for n in names))

    # score file: screen-tab style, col1 score col5 name (some names missing)
    score_file = tmp_path / "sorted_screen.tab"
    with score_file.open("w") as f:
        for i, n in enumerate(names[:40]):
            f.write(f"{0.7 + 0.005 * (i % 40):.6f}\tx\t1\t0\t{n}\t\n")

    ref_out = tmp_path / "ref.txt"
    subprocess.run(
        [
            sys.executable,
            str(REF_LIMIT),
            "--selected",
            str(selected),
            "--output",
            str(ref_out),
            "--score-file",
            str(score_file),
            "--max",
            "20",
            "--no-download",
            "--assembly-dir",
            str(tmp_path / "nonexistent"),
        ],
        check=True,
        capture_output=True,
    )

    our_out = tmp_path / "ours.txt"
    limit_candidates_files(
        str(selected),
        str(our_out),
        [str(score_file)],
        max_candidates=20,
        dedupe=False,
        assembly_dir=str(tmp_path / "nonexistent"),
    )
    assert our_out.read_text() == ref_out.read_text()


@pytest.mark.skipif(not REF_LIMIT.exists(), reason="reference checkout absent")
def test_limit_candidates_dedupe_oracle_parity(tmp_path):
    # species dedupe with an on-disk assembly summary (no download)
    asm_dir = tmp_path / "summaries"
    asm_dir.mkdir()
    rows = []
    names = []
    for i in range(12):
        acc = f"GCF_{i:09d}.1"
        names.append(f"{acc}_ASM{i}v1_genomic.fna.gz")
        species = 100 + (i % 4)  # 4 species, 3 assemblies each
        rows.append(
            f"{acc}\tPRJ\tSAMN\t\tlatest\t{species + 1000}\t{species}\tOrganism {species}\n"
        )
    (asm_dir / "assembly_summary_refseq.txt").write_text(
        "#comment\n" + "".join(rows)
    )

    selected = tmp_path / "selected.txt"
    selected.write_text("".join(n + "\n" for n in names))
    score_file = tmp_path / "scores.tab"
    with score_file.open("w") as f:
        for i, n in enumerate(names):
            f.write(f"{0.8 + 0.01 * i:.6f}\tx\t1\t0\t{n}\t\n")

    ref_out = tmp_path / "ref.txt"
    subprocess.run(
        [
            sys.executable,
            str(REF_LIMIT),
            "--selected",
            str(selected),
            "--output",
            str(ref_out),
            "--score-file",
            str(score_file),
            "--max",
            "10",
            "--dedupe",
            "--no-download",
            "--assembly-dir",
            str(asm_dir),
        ],
        check=True,
        capture_output=True,
    )

    our_out = tmp_path / "ours.txt"
    limit_candidates_files(
        str(selected),
        str(our_out),
        [str(score_file)],
        max_candidates=10,
        dedupe=True,
        assembly_dir=str(asm_dir),
    )
    assert our_out.read_text() == ref_out.read_text()
    # 4 species -> 4 kept
    assert len(our_out.read_text().splitlines()) == 4


def test_load_scores_best_wins(tmp_path):
    f1 = tmp_path / "a.tab"
    f1.write_text("0.8\tx\t1\t0\tg1\t\n0.9\tx\t1\t0\tg1\t\n")
    scores = load_scores([str(f1), str(tmp_path / "missing.tab")])
    assert scores == {"g1": 0.9}


def test_limit_candidates_no_scores_preserves_order():
    kept, _ = limit_candidates(["c", "a", "b"], {}, max_candidates=2)
    assert kept == ["c", "a"]
