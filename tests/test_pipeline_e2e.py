"""End-to-end pipeline test: synthetic genomes -> sketch DB -> run driver
(screen -> limit -> reference -> align -> classify -> CAMI export),
checking species recovery, output formats, caching, and fallback."""

import gzip
import os
from pathlib import Path

import numpy as np
import pytest

from hymet_tpu.io.sketchdb import build_sketch_db
from hymet_tpu.pipeline.run import ClassificationRun
from hymet_tpu.utils.config import RunConfig

_ACGT = np.frombuffer(b"ACGT", dtype=np.uint8)

SPECIES = {
    # accession -> (species taxid, seq names)
    "GCF_000000001.1": ("1423", "bsub_chr"),
    "GCF_000000002.1": ("562", "ecoli_chr"),
    "GCF_000000003.1": ("287", "paer_chr"),
}


def _rand_seq(rng, n):
    return rng.choice(_ACGT, size=n).astype(np.uint8).tobytes()


def _mutate(rng, seq, rate):
    arr = np.frombuffer(seq, dtype=np.uint8).copy()
    idx = rng.random(len(arr)) < rate
    arr[idx] = rng.choice(_ACGT, size=int(idx.sum())).astype(np.uint8)
    return arr.tobytes()


@pytest.fixture(scope="module")
def world(tmp_path_factory, request):
    """Builds the on-disk world: genomes dir, sketch DB, hierarchy TSV,
    query FASTA with truth labels."""
    mini_taxdb = request.getfixturevalue("mini_taxdb")
    tmp = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(77)

    genomes_dir = tmp / "genomes"
    genomes_dir.mkdir()
    genome_files = []
    genome_names = []
    seqs = {}
    for acc, (taxid, seqname) in SPECIES.items():
        seq = _rand_seq(rng, 50000)
        seqs[acc] = seq
        fn = genomes_dir / f"{acc}_ASMX_genomic.fna.gz"
        with gzip.open(fn, "wt") as f:
            f.write(f">{seqname} synthetic\n")
            for i in range(0, len(seq), 80):
                f.write(seq[i : i + 80].decode() + "\n")
        genome_files.append(str(fn))
        genome_names.append(fn.name)

    db = build_sketch_db(genome_files, k=21, sketch_size=300, names=genome_names)
    db_path = tmp / "sketch1.npz"
    db.save(str(db_path))

    tax_dir = tmp / "taxonomy"
    tax_dir.mkdir()
    mini_taxdb.write_hierarchy_tsv(str(tax_dir / "taxonomy_hierarchy.tsv"))

    # seqid/accession -> taxid table for the local catalog
    s2t = tmp / "seqid2taxid.tsv"
    with s2t.open("w") as f:
        for acc, (taxid, _) in SPECIES.items():
            f.write(f"{acc}\t{taxid}\n")

    # queries: mutated slices + one unknown contig
    qf = tmp / "sample.fna"
    truth = {}
    with qf.open("w") as f:
        i = 0
        for acc, (taxid, _) in SPECIES.items():
            for lo in (1000, 20000):
                q = _mutate(rng, seqs[acc][lo : lo + 8000], 0.02)
                name = f"ctg{i}"
                truth[name] = taxid
                f.write(f">{name}\n{q.decode()}\n")
                i += 1
        f.write(f">ctg{i}\n{_rand_seq(rng, 5000).decode()}\n")
        truth[f"ctg{i}"] = None

    return {
        "tmp": tmp,
        "db_path": str(db_path),
        "genomes_dir": str(genomes_dir),
        "tax_dir": str(tax_dir),
        "seqid2taxid": str(s2t),
        "query": str(qf),
        "truth": truth,
        "taxdb": mini_taxdb,
    }


def _config(world, outdir):
    return RunConfig(
        input_fasta=world["query"],
        outdir=str(outdir),
        cand_max=100,
        cache_root=str(world["tmp"] / "cache"),
        taxonomy_dir=world["tax_dir"],
        sketch_dbs=[world["db_path"]],
        genome_catalog=world["genomes_dir"],
        seqid2taxid=world["seqid2taxid"],
        # small static shapes keep CPU XLA compiles fast in CI
        screen_chunk_bp=1 << 15,
        align_batch_pad=1 << 13,
    )


def test_full_run_species_recovery(world, tmp_path):
    run = ClassificationRun(_config(world, tmp_path / "out"))
    classified = run.execute()
    assert os.path.exists(classified)

    rows = {}
    with open(classified, newline="") as f:
        header = f.readline().rstrip("\r\n").split("\t")
        assert header == ["Query", "Lineage", "Taxonomic Level", "Confidence"]
        for line in f:
            parts = line.rstrip("\r\n").split("\t")
            rows[parts[0]] = parts

    taxdb = world["taxdb"]
    hits = 0
    for ctg, taxid in world["truth"].items():
        if taxid is None:
            # unmapped contigs never reach the PAF, so (like the reference)
            # they are absent from the output — or Unknown if spurious
            # anchors mapped them
            assert ctg not in rows or rows[ctg][1] == "Unknown"
            continue
        assert ctg in rows, f"{ctg} missing from output"
        lineage = rows[ctg][1]
        species = taxdb.name[taxid]
        assert f"species:{species}" in lineage, (ctg, lineage)
        assert rows[ctg][2] == "species"
        assert float(rows[ctg][3]) > 0.9
        hits += 1
    assert hits == 6

    # CAMI profile exists and has species rows summing to ~100
    cami = [
        p for p in os.listdir(tmp_path / "out") if p.endswith(".cami.tsv")
    ]
    assert cami
    from hymet_tpu.evalx.cami import parse_cami_profile

    profile = parse_cami_profile(str(tmp_path / "out" / cami[0]))
    sp = [r for r in profile if r["rank"] == "species"]
    assert len(sp) == 3
    assert sum(r["percentage"] for r in sp) == pytest.approx(100.0, abs=1e-3)
    # taxpaths filled
    assert all("|" in r["taxpath"] for r in sp)

    # metadata with timings
    import json

    meta = json.load(open(tmp_path / "out" / "metadata.json"))
    assert set(meta["timings_sec"]) >= {"screen", "limit", "reference", "align", "classify", "export"}


def test_cache_reuse_and_idempotence(world, tmp_path):
    cfg1 = _config(world, tmp_path / "out1")
    ClassificationRun(cfg1).execute()
    # second run with a fresh outdir: reference cache hit (same candidates)
    cfg2 = _config(world, tmp_path / "out2")
    run2 = ClassificationRun(cfg2)
    run2.execute()
    # cache hit skips the stage entirely (no timing recorded) or is instant
    assert run2.timings.get("reference", 0.0) < 0.5

    # re-execute same run dir: stages all skipped
    run3 = ClassificationRun(cfg2)
    run3.execute()
    assert "screen" not in run3.timings or run3.timings.get("align", 0) < 0.5


def test_full_run_sharded_screen_matches(world, tmp_path):
    """db_shards=4 over the virtual 8-device mesh must classify
    identically to the single-device run."""
    cfg1 = _config(world, tmp_path / "single")
    out1 = ClassificationRun(cfg1).execute()

    cfg2 = _config(world, tmp_path / "sharded")
    cfg2.db_shards = 4
    cfg2.cache_root = str(tmp_path / "cache2")
    out2 = ClassificationRun(cfg2).execute()

    assert open(out1, "rb").read() == open(out2, "rb").read()


def test_full_run_shared_upload_matches(world, tmp_path, monkeypatch):
    """Upload-once contig staging (screen + align share device-resident
    packed batches, pipeline/staged.py) must classify byte-identically
    to the per-stage upload path — across MULTIPLE pad-bucket groups
    (a one-group sample let a staged-batch shadowing bug through)."""
    import gzip

    # mixed-length queries spanning two pad buckets (8192 and 16384)
    rng = np.random.default_rng(55)
    qf = tmp_path / "mixed.fna"
    with qf.open("w") as f:
        i = 0
        for fn in sorted(os.listdir(world["genomes_dir"])):
            with gzip.open(os.path.join(world["genomes_dir"], fn), "rt") as g:
                seq = "".join(ln.strip() for ln in g if not ln.startswith(">"))
            for lo, ln in ((500, 3000), (11000, 9000)):
                frag = _mutate(rng, seq[lo : lo + ln].encode(), 0.02)
                f.write(f">mx{i}\n{frag.decode()}\n")
                i += 1

    monkeypatch.setenv("HYMET_SHARED_UPLOAD", "0")
    cfg1 = _config(world, tmp_path / "twice")
    cfg1.input_fasta = str(qf)
    out1 = ClassificationRun(cfg1).execute()

    monkeypatch.setenv("HYMET_SHARED_UPLOAD", "1")
    cfg2 = _config(world, tmp_path / "once")
    cfg2.input_fasta = str(qf)
    cfg2.cache_root = str(tmp_path / "cache_once")
    run2 = ClassificationRun(cfg2)
    out2 = run2.execute()

    assert open(out1, "rb").read() == open(out2, "rb").read()
    assert run2._staged is not None, "staging did not engage"
    assert len(run2._staged.device) >= 2, "need >= 2 pad-bucket groups"
    assert "upload" in run2.timings


def test_fallback_on_missing_hierarchy(world, tmp_path):
    """With an empty hierarchy (no taxids resolvable to lineages), the
    primary classifier still writes rows; with an empty taxonomy TSV the
    fallback path kicks in."""
    import csv

    # taxonomy tsv without useful identifiers -> primary yields Unknowns
    bad_tax_dir = tmp_path / "tax"
    bad_tax_dir.mkdir()
    with (bad_tax_dir / "taxonomy_hierarchy.tsv").open("w") as f:
        f.write("TaxID\tName\tRank\tParentTaxID\tLineage\n")

    cfg = _config(world, tmp_path / "out")
    cfg.taxonomy_dir = str(bad_tax_dir)
    run = ClassificationRun(cfg)
    classified = run.execute()
    with open(classified) as f:
        rows = f.read().splitlines()
    assert len(rows) >= 2  # fallback or Unknown rows, never empty


def test_testdataset_self_check(world, tmp_path):
    """Reference paper's synthetic self-validation (testdataset/README.md
    workflow, BASELINE.json config 1): sample genomes -> trim the first
    10% of bases -> point-mutate at 2% -> classify with the full pipeline
    -> every test contig must recover its source species."""
    from hymet_tpu.data.testdataset import build_test_dataset

    td_dir = tmp_path / "testdataset"
    gcf_map = build_test_dataset(
        world["genomes_dir"],
        str(td_dir),
        fraction_genomes=1.0,
        trim_fraction=0.1,
        mutation_rate=0.02,
        seed=3,
    )
    assert set(gcf_map) == set(SPECIES)
    assert (td_dir / "gcf2seqid.tsv").exists()

    # combine the per-genome test FASTAs into one query sample
    qf = tmp_path / "td_sample.fna"
    with qf.open("w") as out:
        for gcf in sorted(gcf_map):
            out.write((td_dir / f"{gcf}_test.fna").read_text())

    cfg = _config(world, tmp_path / "out")
    cfg.input_fasta = str(qf)
    classified = ClassificationRun(cfg).execute()

    rows = {}
    with open(classified, newline="") as f:
        f.readline()
        for line in f:
            parts = line.rstrip("\r\n").split("\t")
            rows[parts[0]] = parts

    taxdb = world["taxdb"]
    for gcf, seqids in gcf_map.items():
        taxid, _ = SPECIES[gcf]
        species = taxdb.name[taxid]
        for sid in seqids:
            assert sid in rows, f"{sid} missing from output"
            assert f"species:{species}" in rows[sid][1], (sid, rows[sid])
            assert rows[sid][2] == "species"


def test_profile_traces_per_stage(world, tmp_path, monkeypatch):
    """HYMET_PROFILE=1 writes a loadable jax.profiler trace dir per stage
    next to the run outputs (SURVEY §5 tracing: the /usr/bin/time -v
    analog of bench/lib/measure.sh:46 plus XLA-level traces)."""
    monkeypatch.setenv("HYMET_PROFILE", "1")
    outdir = tmp_path / "out"
    cfg = _config(world, outdir)
    cfg.cache_root = str(tmp_path / "cache")
    ClassificationRun(cfg).execute()

    prof_root = outdir / "logs" / "profile"
    stages = {p.name for p in prof_root.iterdir()}
    assert stages >= {"screen", "limit", "reference", "align", "classify", "export"}
    # each compute stage produced an xplane/trace artifact
    for stage in ("screen", "align", "classify"):
        files = [f for f in (prof_root / stage).rglob("*") if f.is_file()]
        assert files, f"no trace files for stage {stage}"


def test_resident_aligner_cache(tmp_path, monkeypatch):
    """The HBM-resident aligner cache returns the SAME aligner for an
    unchanged index file + config, and invalidates on file change or
    config change (run 2 of a serving process must not re-upload the
    search tables)."""
    import numpy as np

    from hymet_tpu.io.minimizer_index import MinimizerIndex
    from hymet_tpu.models.aligner import AlignerConfig, MinimizerAligner
    from hymet_tpu.pipeline import run as runmod

    monkeypatch.setattr(runmod, "_RESIDENT_ALIGNERS", {})
    rng = np.random.default_rng(3)
    acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
    genomes = [("g0", rng.choice(acgt, size=4000).astype(np.uint8).tobytes())]
    idx = MinimizerIndex.build(genomes, k=19, w=19)
    p = str(tmp_path / "idx.npz")
    idx.save(p)

    class _RC:
        align_k, align_w, force_download = 19, 19, False

    cfg = AlignerConfig(batch_pad=1 << 10)
    aln = MinimizerAligner(idx, cfg)
    runmod._resident_aligner_put(p, cfg, aln)
    assert runmod._resident_aligner_get(p, cfg, _RC) is aln
    # config change misses
    assert runmod._resident_aligner_get(p, AlignerConfig(), _RC) is None
    # file rewrite invalidates (mtime_ns/size key)
    os.utime(p, ns=(1, 1))
    assert runmod._resident_aligner_get(p, cfg, _RC) is None
    # HYMET_RESIDENT_INDEX=0 disables
    monkeypatch.setenv("HYMET_RESIDENT_INDEX", "0")
    assert runmod._resident_aligner_get(p, cfg, _RC) is None


def test_tight_staging_matches_classic(monkeypatch):
    """Tight upload + device repack (round 5) must produce byte-identical
    padded (packed, mask) buffers to the classic build_group_batch +
    pack_code_batch path — including N-containing contigs (mask-upload
    fallback) and empty pad rows."""
    from hymet_tpu.pipeline.staged import StagedContigs

    rng = np.random.default_rng(7)
    seqs = []
    for n in (137, 900, 3000, 8200, 8191, 12000, 70):
        s = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=n)
        seqs.append(s.tobytes())
    # one contig with interior Ns -> that group takes the masked path
    nseq = bytearray(seqs[2])
    nseq[100:120] = b"N" * 20
    seqs[2] = bytes(nseq)
    names = [f"q{i}" for i in range(len(seqs))]

    monkeypatch.setenv("HYMET_TIGHT_UPLOAD", "0")
    classic = StagedContigs(names, seqs, batch_pad=4096, min_len=64)
    monkeypatch.setenv("HYMET_TIGHT_UPLOAD", "1")
    tight = StagedContigs(names, seqs, batch_pad=4096, min_len=64)

    assert classic.groups == tight.groups
    assert len(classic.device) == len(tight.device)
    for (p1, m1, r1, l1), (p2, m2, r2, l2) in zip(classic.device, tight.device):
        assert (r1, l1) == (r2, l2)
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))

    # at scale (64-row fixed groups, padded rows), tight must ship fewer
    # bytes than the padded layout (the whole point of the repack)
    big = [
        rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=int(n)).tobytes()
        for n in rng.integers(2_000, 12_000, size=96)
    ]
    bnames = [f"b{i}" for i in range(len(big))]
    monkeypatch.setenv("HYMET_TIGHT_UPLOAD", "0")
    classic_big = StagedContigs(bnames, big, batch_pad=16384, min_len=64)
    monkeypatch.setenv("HYMET_TIGHT_UPLOAD", "1")
    tight_big = StagedContigs(bnames, big, batch_pad=16384, min_len=64)
    for (p1, m1, *_), (p2, m2, *_) in zip(classic_big.device, tight_big.device):
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    assert tight_big.packed_bytes < classic_big.packed_bytes
