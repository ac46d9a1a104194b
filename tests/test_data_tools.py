"""Data-tooling tests: subset_fasta, seqid maps, testdataset toolkit,
cache pruning."""

import os
import time

import numpy as np

from hymet_tpu.data.subsets import make_seqid_map, subset_fasta
from hymet_tpu.data.testdataset import (
    build_test_dataset,
    mutate_sequence,
    sample_genomes,
    trim_first_fraction,
)
from hymet_tpu.pipeline.prune_cache import prune_cache, scan_cache


def _write_fasta(path, seqs):
    with open(path, "w") as f:
        for name, seq in seqs:
            f.write(f">{name}\n{seq}\n")


def test_subset_fasta(tmp_path):
    src = tmp_path / "in.fna"
    _write_fasta(src, [("a", "A" * 100), ("b", "C" * 100), ("c", "G" * 100)])
    out = tmp_path / "out.fna"
    n, bases = subset_fasta(str(src), str(out), max_seqs=2, max_bases=1000)
    assert (n, bases) == (2, 200)
    # base cap truncates and stops
    n, bases = subset_fasta(str(src), str(out), max_seqs=10, max_bases=150)
    assert (n, bases) == (2, 150)
    text = out.read_text()
    assert text.count(">") == 2


def test_make_seqid_map(tmp_path):
    src = tmp_path / "ref.fna"
    _write_fasta(
        src,
        [("NC_1.1 some desc", "ACGT"), ("weird|NC_2.2|x", "ACGT"), ("unknown", "ACGT")],
    )
    out = tmp_path / "map.tsv"
    mapped, total = make_seqid_map(
        str(src), {"NC_1": "100", "NC_2.2": "200"}, str(out)
    )
    assert (mapped, total) == (2, 3)
    assert "NC_1.1\t100" in out.read_text()
    assert "weird|NC_2.2|x\t200" in out.read_text()


def test_trim_first_fraction_single_and_multi():
    out = trim_first_fraction([("s1", b"A" * 1000)], 0.1)
    assert len(out[0][1]) == 100
    out = trim_first_fraction([("s1", b"A" * 500), ("s2", b"C" * 500)], 0.1)
    # target 100: 50 + 50 (remainder 0)
    assert [len(o[1]) for o in out] == [50, 50]
    out = trim_first_fraction([("s1", b"A" * 30), ("s2", b"C" * 500)], 0.1)
    # per=26, short seq kept whole
    assert len(out[0][1]) == 26 or len(out[0][1]) == 30


def test_mutate_sequence_rate():
    import random

    rng = random.Random(0)
    seq = b"A" * 10000 + b"N" * 100
    mut = mutate_sequence(seq, 0.1, rng)
    diff = sum(1 for a, b in zip(seq, mut) if a != b)
    assert 800 < diff < 1200  # ~10%
    assert mut[10000:] == b"N" * 100  # non-ACGT untouched
    # mutated bases are never the original base
    assert all(b in b"CGT" for a, b in zip(seq[:10000], mut[:10000]) if a != b)


def test_sample_genomes_seeded():
    files = [f"g{i}.fna" for i in range(100)]
    a = sample_genomes(files, 0.1, seed=1)
    b = sample_genomes(files, 0.1, seed=1)
    assert a == b and len(a) == 10


def test_build_test_dataset(tmp_path):
    gdir = tmp_path / "genomes"
    gdir.mkdir()
    rng = np.random.default_rng(0)
    acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
    for i in range(3):
        seq = rng.choice(acgt, size=2000).astype(np.uint8).tobytes().decode()
        _write_fasta(gdir / f"GCF_00000000{i}.1_X_genomic.fna", [(f"chr{i}", seq)])
    out = tmp_path / "testdataset"
    gcf_map = build_test_dataset(
        str(gdir), str(out), fraction_genomes=1.0, trim_fraction=0.1, mutation_rate=0.05
    )
    assert len(gcf_map) == 3
    for gcf, ids in gcf_map.items():
        p = out / f"{gcf}_test.fna"
        assert p.exists()
        body = "".join(
            l for l in p.read_text().splitlines() if not l.startswith(">")
        )
        assert len(body) == 200  # 10% of 2000
    assert (out / "gcf2seqid.tsv").exists()


def test_prune_cache(tmp_path):
    for i, age_days in enumerate([0.0, 10.0, 40.0]):
        d = tmp_path / f"key{i}"
        d.mkdir()
        (d / "blob").write_bytes(b"x" * 1000)
        t = time.time() - age_days * 86400
        os.utime(d, (t, t))

    entries = scan_cache(str(tmp_path))
    assert len(entries) == 3

    removed = prune_cache(str(tmp_path), max_age_days=30, dry_run=True)
    assert len(removed) == 1 and removed[0].endswith("key2")
    assert (tmp_path / "key2").exists()  # dry run

    removed = prune_cache(str(tmp_path), max_age_days=30)
    assert not (tmp_path / "key2").exists()

    # size pruning removes oldest first
    removed = prune_cache(str(tmp_path), max_size_gb=1100 / 1024**3)
    assert len(removed) == 1 and removed[0].endswith("key1")
    assert (tmp_path / "key0").exists()
