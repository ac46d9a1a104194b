"""End-to-end harness tests: run_bench and run_ablation over the synthetic
world (shares the fixture from test_pipeline_e2e)."""

import csv
import json
import os

import pytest

from tests.test_pipeline_e2e import world  # noqa: F401  (fixture reuse)


@pytest.fixture()
def bench_env(world, monkeypatch, tmp_path):  # noqa: F811
    monkeypatch.setenv("SKETCH_DBS", world["db_path"])
    monkeypatch.setenv("GENOME_CATALOG", world["genomes_dir"])
    monkeypatch.setenv("SEQID2TAXID", world["seqid2taxid"])
    monkeypatch.setenv("TAXONOMY_DIR", world["tax_dir"])
    monkeypatch.setenv("CACHE_ROOT", str(tmp_path / "cache"))
    monkeypatch.setenv("SCREEN_CHUNK_BP", str(1 << 15))
    monkeypatch.setenv("ALIGN_BATCH_PAD", str(1 << 13))
    monkeypatch.setenv("CAND_MAX", "100")
    return world


def _truth_files(world, tmp_path):  # noqa: F811
    """Derive a truth contig TSV + profile from the fixture's truth map."""
    truth_contigs = tmp_path / "truth_contigs.tsv"
    with truth_contigs.open("w") as f:
        f.write("contig_id\ttaxid\n")
        for ctg, taxid in world["truth"].items():
            if taxid:
                f.write(f"{ctg}\t{taxid}\n")

    taxdb = world["taxdb"]
    counts = {}
    for taxid in world["truth"].values():
        if taxid:
            counts[taxid] = counts.get(taxid, 0) + 1
    total = sum(counts.values())
    truth_profile = tmp_path / "truth_profile.cami.tsv"
    with truth_profile.open("w") as f:
        f.write("@@TAXID RANK TAXPATH TAXPATHSN PERCENTAGE\n")
        for taxid, n in counts.items():
            ids, names = taxdb.taxpath(taxid)
            f.write(
                f"{taxid}\tspecies\t{ids}\t{names}\t{100.0 * n / total:.6f}\n"
            )
    return str(truth_contigs), str(truth_profile)


def test_run_bench_end_to_end(bench_env, tmp_path):
    world = bench_env
    truth_contigs, truth_profile = _truth_files(world, tmp_path)

    manifest = tmp_path / "manifest.tsv"
    manifest.write_text(
        "sample_id\tcontigs_fa\ttruth_contigs_tsv\ttruth_profile_tsv\n"
        f"synthetic\t{world['query']}\t{truth_contigs}\t{truth_profile}\n"
    )

    from hymet_tpu.harness.bench import run_bench

    out_root = str(tmp_path / "bench_out")
    assert run_bench(str(manifest), ["hymet_tpu"], out_root=out_root) == 0

    tool_dir = os.path.join(out_root, "synthetic", "hymet_tpu")
    assert os.path.exists(os.path.join(tool_dir, "classified_sequences.tsv"))
    assert os.path.exists(os.path.join(tool_dir, "profile.cami.tsv"))
    assert os.path.exists(os.path.join(tool_dir, "metadata.json"))

    prof_summary = os.path.join(tool_dir, "eval", "profile_summary.tsv")
    rows = {
        r["rank"]: r
        for r in csv.DictReader(open(prof_summary), delimiter="\t")
    }
    # perfect species recovery on the synthetic world
    assert float(rows["species"]["F1_%"]) == 100.0
    assert float(rows["species"]["L1_total_variation_pctpts"]) < 1.0

    # contig accuracy
    cpr = os.path.join(tool_dir, "eval", "contigs_per_rank.tsv")
    crows = {r["rank"]: r for r in csv.DictReader(open(cpr), delimiter="\t")}
    assert float(crows["species"]["accuracy_percent"]) == 100.0

    # aggregates + runtime log + figures
    assert os.path.exists(os.path.join(out_root, "summary_per_tool_per_sample.tsv"))
    assert os.path.exists(os.path.join(out_root, "leaderboard_by_rank.tsv"))
    rt = list(
        csv.DictReader(
            open(os.path.join(out_root, "runtime_memory.tsv")), delimiter="\t"
        )
    )
    assert {r["stage"] for r in rt} == {"run", "eval"}
    figs = os.path.join(out_root, "figures")
    assert os.path.isdir(figs) and len(os.listdir(figs)) >= 3


def test_run_ablation_end_to_end(bench_env, tmp_path, monkeypatch):
    world = bench_env
    # combined reference fasta + seq-level seqmap for ablation
    import gzip
    import glob

    combined = tmp_path / "combined.fasta"
    seqmap = tmp_path / "seqmap.tsv"
    from hymet_tpu.io.fasta import iter_fasta

    acc2tax = dict(
        line.split("\t")
        for line in open(world["seqid2taxid"]).read().splitlines()
    )
    with combined.open("w") as cf, seqmap.open("w") as sf:
        for path in sorted(glob.glob(os.path.join(world["genomes_dir"], "*.fna.gz"))):
            acc = "_".join(os.path.basename(path).split("_")[:2])
            for name, seq in iter_fasta(path):
                cf.write(f">{name}\n{seq.decode()}\n")
                sf.write(f"{name}\t{acc2tax[acc]}\n")
                sf.write(f"{acc}\t{acc2tax[acc]}\n")

    monkeypatch.setenv("INPUT_FASTA", world["query"])
    from hymet_tpu.harness.ablation import run_ablation

    out_root = str(tmp_path / "ablation_out")
    assert (
        run_ablation(
            sample="synthetic",
            taxa=["1423", "562", "287"],
            levels=[0.0, 1.0],
            seqmap=str(seqmap),
            fasta=str(combined),
            out_root=out_root,
            threads=2,
        )
        == 0
    )

    fallback = list(
        csv.DictReader(open(os.path.join(out_root, "rank_fallback.tsv")), delimiter="\t")
    )
    assert len(fallback) == 2
    lvl0 = next(r for r in fallback if float(r["level"]) == 0.0)
    lvl1 = next(r for r in fallback if float(r["level"]) == 1.0)
    # full reference: all classified at species; fully ablated: nothing
    assert float(lvl0["species_pct"]) > 90.0
    assert float(lvl1["total"]) == 0 or float(lvl1["species_pct"]) == 0.0
    assert os.path.exists(os.path.join(out_root, "refsets", "ablation_summary.tsv"))


def test_run_bench_parallel_jobs(bench_env, tmp_path, monkeypatch):
    """jobs=2 (spawned worker processes) must produce the same outputs
    and a complete merged runtime log (SURVEY §2.6 cross-sample
    parallelism — the reference's manifest loop is sequential)."""
    world = bench_env
    truth_contigs, truth_profile = _truth_files(world, tmp_path)
    monkeypatch.setenv("HYMET_PLATFORM", "cpu")  # workers must avoid TPU

    # two samples (same contigs) x one tool -> two parallel cells
    manifest = tmp_path / "manifest2.tsv"
    manifest.write_text(
        "sample_id\tcontigs_fa\ttruth_contigs_tsv\ttruth_profile_tsv\n"
        f"s_one\t{world['query']}\t{truth_contigs}\t{truth_profile}\n"
        f"s_two\t{world['query']}\t{truth_contigs}\t{truth_profile}\n"
    )

    from hymet_tpu.harness.bench import run_bench

    out_root = str(tmp_path / "bench_par")
    assert run_bench(str(manifest), ["hymet_tpu"], out_root=out_root, jobs=2) == 0

    outs = {}
    for sample in ("s_one", "s_two"):
        tool_dir = os.path.join(out_root, sample, tool := "hymet_tpu")
        assert os.path.exists(os.path.join(tool_dir, "profile.cami.tsv"))
        outs[sample] = open(
            os.path.join(tool_dir, "classified_sequences.tsv")
        ).read()
    assert outs["s_one"] == outs["s_two"]  # same input -> same output

    rt = list(
        csv.DictReader(
            open(os.path.join(out_root, "runtime_memory.tsv")), delimiter="\t"
        )
    )
    # 2 cells x 2 stages, merged in deterministic cell order
    assert [(r["sample"], r["stage"]) for r in rt] == [
        ("s_one", "run"),
        ("s_one", "eval"),
        ("s_two", "run"),
        ("s_two", "eval"),
    ]
    # no stray per-cell logs left behind
    assert not [
        f
        for f in os.listdir(out_root)
        if f.startswith("runtime_memory.tsv.")
    ]
