#!/usr/bin/env python3
"""Headline benchmark: END-TO-END pipeline throughput (contigs/s) on one chip.

Runs the FULL classification pipeline — sketch screen over 3 DBs,
adaptive-threshold candidate selection, species-dedup limiting, reference
build, minimizer alignment, weighted LCA, CAMI export — on a simulated
metagenomic assembly drawn from the 24 real Zymo panel genomes in the
reference checkout, and prints ONE JSON line:

  {"metric": "pipeline_contigs_per_s", "value": ..., "unit": "contigs/s",
   "vs_baseline": ...}

Baseline: the reference pipeline (mash + minimap2 + classification_cami.py)
measures ~3-8 CPU-minutes per ~1000-contig CAMI sample on a 16-thread
workstation (reference bench/results_summary.md:99). We take the FASTEST
end — 1000 contigs / 180 s = 5.56 contigs/s — as the CPU baseline so
vs_baseline understates rather than flatters the speedup.

Protocol (disclosed): sketch DBs are prebuilt (the reference's .msh DBs
are prebuilt too) and the timed run is steady-state — a warmup run in the
same process triggers XLA compilation and populates the content-addressed
reference cache, exactly like the reference's shared cache_bench gives
later samples combined-FASTA + .mmi cache hits (run_hymet_cami.sh:129-171).
The timed run still executes screen, alignment, LCA, and export cold.
Per-stage seconds and a species-accuracy gate go to stderr.

Secondary mode: BENCH_MODE=sketch reports the round-1 stage-1 metric
(sketch-screen query Gbp/s) with the same one-line contract.
"""

import csv
import glob
import json
import os
import shutil
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

CACHE = os.path.join(ROOT, ".bench_cache")

# ---- pipeline mode config ----
PIPE_BASELINE_CONTIGS_PER_S = 1000.0 / 180.0  # reference's fastest (3 min)
N_CONTIGS = int(os.environ.get("BENCH_CONTIGS", "1000"))
N_GENOMES = int(os.environ.get("BENCH_GENOMES", "0"))  # 0 = all 24
SEED = int(os.environ.get("BENCH_SEED", "2024"))
MUT_RATE = 0.02
INDEL_RATE = 0.0005
GENOME_GLOB = "/root/reference/case/truth/zymo_refs/genomes/*/*.fna.gz"
REFS_TSV = "/root/reference/case/truth/zymo_refs/refs.tsv"

# ---- sketch mode config (round-1 metric) ----
SKETCH_BASELINE_GBP_S = 0.04
N_REFS = int(os.environ.get("BENCH_REFS", "32"))
REF_LEN = int(os.environ.get("BENCH_REF_LEN", str(2_000_000)))
BATCH_ROWS = int(os.environ.get("BENCH_BATCH_ROWS", "8"))
BATCH_LEN = int(os.environ.get("BENCH_BATCH_LEN", str(1 << 20)))


def log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _init_jax():
    import logging

    # stage-level INFO logs to stderr: long tunnel compiles are otherwise
    # indistinguishable from hangs
    logging.basicConfig(
        level=logging.INFO,
        stream=sys.stderr,
        format="%(asctime)s %(name)s %(message)s",
        datefmt="%H:%M:%S",
    )
    import jax

    from hymet_tpu.utils.jaxtools import apply_platform_override, enable_compile_cache

    apply_platform_override()
    enable_compile_cache()
    try:
        # a dead tunnel still fails a jax dial, but only after ~25 min;
        # its terminal leg (:8083) refuses a TCP connect in milliseconds.
        # After one dial failure that NAMED the tunnel backend (axon /
        # :8083 in the error), gate every retry's dial on that probe.
        # Non-tunnel TPU hosts never set the marker, so their transient
        # dial failures keep retrying real dials.
        if (
            os.environ.get("_BENCH_DIAL_TUNNEL") == "1"
            and os.environ.get("HYMET_PLATFORM", "") != "cpu"
        ):
            import socket

            s = socket.socket()
            s.settimeout(3)
            try:
                s.connect(("127.0.0.1", 8083))
            except OSError as pe:
                raise RuntimeError(
                    f"tunnel terminal port 8083 unreachable ({pe}); "
                    "skipping the 25-min dial"
                ) from pe
            finally:
                s.close()
        dev = jax.devices()[0]
    except RuntimeError as e:
        # The axon tunnel self-terminates a dial after ~25 min with
        # "Unable to initialize backend" when its compile service is down
        # (outages last hours). jax caches the failure in-process, so the
        # retry must be a clean re-exec of this script.
        attempt = int(os.environ.get("_BENCH_DIAL_ATTEMPT", "0"))
        retries = int(os.environ.get("BENCH_DIAL_RETRIES", "4"))
        log(f"backend init failed (attempt {attempt + 1}/{retries + 1}): {e}")
        if "axon" in str(e) or "8083" in str(e):
            os.environ["_BENCH_DIAL_TUNNEL"] = "1"
        # deadline pressure: r03 died mid-ladder having printed nothing.
        # Stop dialing while there is still time for a disclosed CPU
        # fallback to produce a real number before the watchdog fires.
        from hymet_tpu.harness.deadline import remaining_s

        reserve = float(os.environ.get("BENCH_CPU_RESERVE_S", "1500"))
        out_of_time = remaining_s() - reserve < 180.0
        if out_of_time and attempt < retries:
            log(
                f"deadline pressure ({remaining_s():.0f}s left, reserve "
                f"{reserve:.0f}s): abandoning remaining dial retries"
            )
        if attempt >= retries or out_of_time:
            # Last resort: a disclosed CPU-backend measurement beats an
            # empty record when the tunnel outage outlives the retries
            # (observed 6+ h outages). The emitted metric name gets a
            # "_cpu_fallback" suffix so the number can never be read as
            # a TPU result. BENCH_CPU_FALLBACK=0 disables.
            if (
                os.environ.get("BENCH_CPU_FALLBACK", "1") == "1"
                and os.environ.get("_BENCH_CPU_FALLBACK") != "1"
            ):
                log("dial retries exhausted; falling back to CPU backend")
                os.environ["_BENCH_CPU_FALLBACK"] = "1"
                os.environ["HYMET_PLATFORM"] = "cpu"
                os.environ.pop("_BENCH_DIAL_ATTEMPT", None)
                os.execv(sys.executable, [sys.executable] + sys.argv)
            raise
        time.sleep(min(180.0, max(5.0, remaining_s() - reserve)))
        os.environ["_BENCH_DIAL_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)
    log(f"device: {dev.platform} {dev.device_kind}")
    return jax


# ----------------------------------------------------------------------
# pipeline mode


def _build_world():
    """Zymo world (cached): 3 sketch DBs over the 24 real panel genomes,
    a simulated ~N_CONTIGS-contig assembly (5-100 kb fragments, 2% SNPs,
    sparse indels, half reverse-complemented), truth table, taxonomy."""
    from hymet_tpu.data.zymo_taxonomy import zymo_taxdb
    from hymet_tpu.io.fasta import iter_fasta
    from hymet_tpu.io.sketchdb import build_sketch_db

    world = os.path.join(CACHE, f"zymo_world_n{N_CONTIGS}_g{N_GENOMES}_s{SEED}")
    os.makedirs(world, exist_ok=True)
    genomes = sorted(glob.glob(GENOME_GLOB))
    if not genomes:
        raise SystemExit("reference Zymo genomes not found")

    acc2tax = {}
    with open(REFS_TSV) as f:
        for row in csv.DictReader(f, delimiter="\t"):
            acc2tax[row["assembly_accession"]] = row["taxid"]
    s2t = os.path.join(world, "acc2taxid.tsv")
    if not os.path.exists(s2t):
        with open(s2t + ".tmp", "w") as f:
            for acc, tax in sorted(acc2tax.items()):
                f.write(f"{acc}\t{tax}\n")
        os.replace(s2t + ".tmp", s2t)

    tax_dir = os.path.join(world, "taxonomy")
    hier = os.path.join(tax_dir, "taxonomy_hierarchy.tsv")
    if not os.path.exists(hier):
        os.makedirs(tax_dir, exist_ok=True)
        zymo_taxdb().write_hierarchy_tsv(hier)

    db_paths = [os.path.join(world, f"sketch{i + 1}.npz") for i in range(3)]
    if not all(os.path.exists(p) for p in db_paths):
        t0 = time.time()
        for i, path in enumerate(db_paths):
            db = build_sketch_db(genomes[i::3], k=21, sketch_size=1000)
            db.save(path)
        log(f"built 3 sketch DBs in {time.time() - t0:.1f}s")

    sample = os.path.join(world, "sample.fna")
    truth = os.path.join(world, "truth_contigs.tsv")
    if not (os.path.exists(sample) and os.path.exists(truth)):
        # A realistic assembly TILES each genome (near-full coverage), so
        # whole-sample containment identity stays above the 0.9 screen
        # threshold — sparse random fragments would under-cover large
        # genomes and get screened out, which no real assembly does.
        t0 = time.time()
        rng = np.random.default_rng(SEED)
        acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
        per_genome = {}
        for g in genomes[: N_GENOMES or None]:
            acc = "_".join(os.path.basename(g).split("_")[:2])
            seqs = [s for _, s in iter_fasta(g)]
            per_genome[acc] = max(seqs, key=len)
        accs = sorted(per_genome)
        total_ref_bp = sum(len(s) for s in per_genome.values())
        avg_len = max(5_000, total_ref_bp // max(N_CONTIGS, 1))
        comp = np.full(256, 78, dtype=np.uint8)
        comp[65], comp[67], comp[71], comp[84] = 84, 71, 67, 65
        i = 0
        with open(sample + ".tmp", "w") as sf, open(truth + ".tmp", "w") as tf:
            tf.write("contig_id\ttaxid\n")
            for acc in accs:
                src = np.frombuffer(per_genome[acc], dtype=np.uint8)
                pos = 0
                while pos < len(src):
                    length = int(rng.integers(avg_len // 2, avg_len * 3 // 2))
                    frag = src[pos : pos + length].copy()
                    pos += length
                    if len(frag) < 1_000:
                        continue
                    mut = rng.random(len(frag)) < MUT_RATE
                    frag[mut] = rng.choice(acgt, size=int(mut.sum()))
                    frag = frag[rng.random(len(frag)) >= INDEL_RATE]
                    if rng.random() < 0.5:
                        frag = comp[frag[::-1]]
                    sf.write(f">sim_ctg{i}\n{frag.tobytes().decode()}\n")
                    tf.write(f"sim_ctg{i}\t{acc2tax[acc]}\n")
                    i += 1
        os.replace(sample + ".tmp", sample)
        os.replace(truth + ".tmp", truth)
        log(f"simulated {i} tiled contigs in {time.time() - t0:.1f}s")

    total_bp = sum(len(s) for _, s in iter_fasta(sample))
    n_contigs = sum(1 for _ in open(truth)) - 1
    return {
        "world": world,
        "sample": sample,
        "truth": truth,
        "tax_dir": tax_dir,
        "sketch_dbs": db_paths,
        "genome_dir": os.path.dirname(os.path.dirname(genomes[0])),
        "seqid2taxid": s2t,
        "total_bp": total_bp,
        "n_contigs": n_contigs,
    }


def _run_once(w, outdir, cache_root):
    from hymet_tpu.pipeline.run import ClassificationRun
    from hymet_tpu.utils.config import RunConfig

    if os.path.exists(outdir):
        shutil.rmtree(outdir)
    cfg = RunConfig(
        input_fasta=w["sample"],
        outdir=outdir,
        cand_max=1500,
        species_dedup=True,
        cache_root=cache_root,
        taxonomy_dir=w["tax_dir"],
        sketch_dbs=w["sketch_dbs"],
        genome_catalog=w["genome_dir"],
        seqid2taxid=w["seqid2taxid"],
    )
    run = ClassificationRun(cfg)
    t0 = time.time()
    classified = run.execute()
    return time.time() - t0, run.timings, classified


def _species_accuracy(w, classified) -> float:
    """Fraction of truth contigs whose species name appears in the
    classified lineage (cheap gate that the timed pipeline is correct)."""
    from hymet_tpu.data.zymo_taxonomy import zymo_taxdb

    taxdb = zymo_taxdb()
    truth = {}
    with open(w["truth"]) as f:
        next(f)
        for line in f:
            c, t = line.split("\t")
            truth[c] = t.strip()
    rows = {}
    with open(classified) as f:
        next(f)
        for line in f:
            parts = line.rstrip("\n").split("\t")
            rows[parts[0]] = parts[1]
    ok = 0
    for c, tid in truth.items():
        sp = taxdb.ancestor_at_rank(tid, "species")
        name = taxdb.name.get(sp or tid, "")
        if name and f"species:{name}" in rows.get(c, ""):
            ok += 1
    return ok / max(len(truth), 1)


def _subprocess_warmup() -> None:
    """Run the pipeline warmup (compiles + world/reference caches) in a
    KILLABLE child before this process touches the TPU.

    The fused device-chain align program can stall in a bad tunnel
    compile window for hours (queue r3f: two rc=124 two-hour e2e
    attempts), and a hung in-process jit compile cannot be aborted. The
    child either completes — every program lands in the persistent XLA
    cache, so the parent's own warmup is cheap — or is killed at the
    timeout, in which case the parent falls back to the host-chain
    align path for this bench only (``harness.timing.warmup_reaction``).
    Never two live TPU clients: the parent only initializes jax after
    the child exits."""
    import subprocess

    if (
        os.environ.get("_BENCH_WARM_CHILD") == "1"
        or os.environ.get("BENCH_WARM_WATCHDOG", "1") != "1"
        or os.environ.get("HYMET_PLATFORM", "") == "cpu"
        or os.environ.get("_BENCH_CPU_FALLBACK") == "1"
    ):
        return
    from hymet_tpu.harness import deadline
    from hymet_tpu.harness.timing import warmup_reaction

    timeout_s = float(os.environ.get("BENCH_WARM_TIMEOUT_S", "3600"))
    wedge_s = float(os.environ.get("BENCH_WARM_WEDGE_WAIT_S", "600"))
    # leave the parent enough deadline for its own warm + timed runs
    warm_reserve = float(os.environ.get("BENCH_WARM_RESERVE_S", "1500"))
    timeout_s = min(timeout_s, deadline.remaining_s() - warm_reserve)
    if timeout_s < 120.0:
        log(
            "warmup watchdog: deadline pressure "
            f"({deadline.remaining_s():.0f}s left) — skipping the warm child"
        )
        return
    env = dict(os.environ)
    env["_BENCH_WARM_CHILD"] = "1"
    env["BENCH_MODE"] = "warm_pipeline"
    # a CPU-fallback warm child would burn the whole budget compiling
    # programs the TPU parent can never reuse — fail fast instead and
    # let the parent's own dial ladder decide
    env["BENCH_CPU_FALLBACK"] = "0"
    # the child must not touch the parent's deadline machinery: a child
    # finish() would silence the parent's watchdog
    for k in (deadline.ENV_STATUS, deadline.ENV_WATCHDOG, deadline.ENV_EPOCH):
        env.pop(k, None)
    log(f"warmup watchdog: child (timeout {timeout_s:.0f}s)")
    t0 = time.time()
    timed_out = False
    rc = 0
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)],
        env=env,
        stdout=sys.stderr,
        stderr=sys.stderr,
    )
    deadline.register_child(proc.pid)
    try:
        rc = proc.wait(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait()
        timed_out = True
    finally:
        deadline.unregister_child(proc.pid)
    plan = warmup_reaction(timed_out, rc, wedge_s)
    log(f"warmup watchdog: {plan['note']} ({time.time() - t0:.0f}s)")
    os.environ.update(plan["env"])
    if plan["wait_s"] > 0:
        wait = min(plan["wait_s"], max(0.0, deadline.remaining_s() - warm_reserve))
        log(f"warmup watchdog: waiting {wait:.0f}s for the chip to settle")
        time.sleep(wait)


def _prewarm_align(w, cache_root) -> None:
    """Compile the align-stage programs BEFORE any screen dispatch.

    The observed e2e stall mode is the fused device-chain align program
    compiling (or wedging) right after the screen stage's hundreds of
    dispatches; BENCH_MODE=align — where the align program compiles
    first in a fresh process — never stalls. When the candidate
    reference cache from a previous run exists, running the align leg
    first makes every align compile happen in that safe window (and the
    in-process jit cache then serves the pipeline's own align stage).
    On a fresh container there is no cached index yet — skip, and the
    watchdog timeout covers the risk."""
    import glob

    idxs = glob.glob(
        os.path.join(cache_root, "*", "reference_minidx_k19w19.npz")
    )
    if not idxs:
        log("prewarm: no cached index yet; skipping align prewarm")
        return
    from hymet_tpu.io.fasta import read_fasta
    from hymet_tpu.io.minimizer_index import MinimizerIndex
    from hymet_tpu.models.aligner import AlignerConfig, MinimizerAligner

    t0 = time.time()
    index = MinimizerIndex.load(idxs[0])
    aligner = MinimizerAligner(index, AlignerConfig(batch_pad=1 << 16))
    qnames, qseqs = read_fasta(w["sample"])
    records = aligner.map_batch(qnames, qseqs)
    log(
        f"prewarm: align leg first ({len(records)} records, "
        f"{time.time() - t0:.1f}s incl. compiles)"
    )


def bench_warm_pipeline() -> dict:
    """Child body for the warmup watchdog: probe compile-service health,
    then compile every pipeline program and populate the world/reference
    caches, then exit."""
    if (
        os.environ.get("BENCH_HEALTH_PROBE", "1") == "1"
        and os.environ.get("HYMET_PLATFORM", "") != "cpu"
        and os.environ.get("_BENCH_CPU_FALLBACK") != "1"
    ):
        # before jax init: the probe child must be the only TPU client.
        # A `healthy` verdict auto-heals dev_broken markers recorded
        # before it (aligner._load_dev_broken), so a bench landing in a
        # recovered window retries device chains instead of waiting out
        # the 4 h TTL.
        from hymet_tpu.harness.healthprobe import run_probe

        rec = run_probe()
        log(
            f"compile-health probe: {rec['verdict']} "
            f"({rec['compile_s']:.0f}s)"
        )
    _init_jax()
    w = _build_world()
    cache_root = os.path.join(w["world"], "cache")
    _prewarm_align(w, cache_root)
    t0 = time.time()
    _, timings, classified = _run_once(
        w, os.path.join(w["world"], "out_warmup"), cache_root
    )
    acc = _species_accuracy(w, classified)
    log(f"warm child: {time.time() - t0:.1f}s, accuracy {acc * 100:.2f}%")
    return {
        "metric": "pipeline_warmup_s",
        "value": round(time.time() - t0, 1),
        "unit": "s",
        "vs_baseline": 0.0,
    }


def _report_pipeline_partial(w, total_s: float, reason: str) -> None:
    """Checkpoint a best-so-far contigs/s so a deadline or crash still
    yields a real measurement (tagged via the ``degraded`` field)."""
    from hymet_tpu.harness import deadline
    from hymet_tpu.harness.timing import tag_fallback

    cps = w["n_contigs"] / total_s
    deadline.report_partial(
        tag_fallback(
            {
                "metric": "pipeline_contigs_per_s",
                "value": round(cps, 2),
                "unit": "contigs/s",
                "vs_baseline": round(cps / PIPE_BASELINE_CONTIGS_PER_S, 2),
            },
            os.environ.get("_BENCH_CPU_FALLBACK") == "1",
        ),
        reason,
    )


def bench_pipeline() -> dict:
    _subprocess_warmup()
    _init_jax()
    w = _build_world()
    log(f"sample: {w['n_contigs']} contigs, {w['total_bp'] / 1e6:.1f} Mbp")

    from hymet_tpu.harness import deadline

    cache_root = os.path.join(w["world"], "cache")
    t0 = time.time()
    warm_s, warm_t, classified = _run_once(
        w, os.path.join(w["world"], "out_warmup"), cache_root
    )
    log(
        f"warmup (compile + reference-cache build) {warm_s:.1f}s; stages "
        + " ".join(f"{k}={v:.1f}s" for k, v in warm_t.items())
    )
    # the warm run is a complete, correct pipeline execution — record it
    # so the watchdog never has to print a zero
    _report_pipeline_partial(w, warm_s, "warmup_run_only")

    acc = _species_accuracy(w, classified)
    log(f"species accuracy gate: {acc * 100:.2f}%")
    if acc < 0.9:
        log("WARNING: accuracy below 90% — the speed number is suspect")

    from hymet_tpu.harness.timing import best_run, spread_note, timed_groups

    best_sofar = [float("inf")]

    def _timed():
        total_s, timings, _ = _run_once(
            w, os.path.join(w["world"], "out_timed"), cache_root
        )
        log(
            f"timed run: {total_s:.2f}s ("
            + " ".join(f"{k}={v:.2f}s" for k, v in timings.items())
            + ")"
        )
        if total_s < best_sofar[0]:
            best_sofar[0] = total_s
            _report_pipeline_partial(w, total_s, "partial_timed_runs")
        return total_s, timings

    budget_s = min(600.0, max(60.0, deadline.remaining_s(690.0) - 90.0))
    # 8 draws: post-warm runs cost ~20 s and the spread is dominated by
    # the tunnel's contig-upload variance (2.4-5.5 s on 59.8 MB), so
    # more draws tighten the best-of estimate at trivial wall cost
    runs = timed_groups(_timed, min_runs=2, max_runs=8, budget_s=budget_s)
    # the pipeline times itself inside _run_once (excludes outdir cleanup)
    best, best_timings = best_run([r for _, r in runs])
    cps = w["n_contigs"] / best
    mbps = w["total_bp"] / best / 1e6
    log(f"runs: {spread_note([(r[0], None) for _, r in runs])}")
    log(
        f"best {best:.2f}s -> {cps:.1f} contigs/s ({mbps:.1f} Mbp/s); "
        f"stages: " + " ".join(f"{k}={v:.2f}s" for k, v in best_timings.items())
    )
    # link-excluded rate: the contig upload is a dev-tunnel artifact
    # (<0.1 s on production-attached TPU); report the compute rate
    # alongside the headline so both provenances are recorded
    upload_s = best_timings.get("upload", 0.0)
    cps_nolink = w["n_contigs"] / max(best - upload_s, 1e-9)
    log(f"link-excluded: {cps_nolink:.1f} contigs/s (upload {upload_s:.2f}s)")
    return {
        "metric": "pipeline_contigs_per_s",
        "value": round(cps, 2),
        "unit": "contigs/s",
        "vs_baseline": round(cps / PIPE_BASELINE_CONTIGS_PER_S, 2),
        "link_excluded_contigs_per_s": round(cps_nolink, 2),
        "link_excluded_vs_baseline": round(
            cps_nolink / PIPE_BASELINE_CONTIGS_PER_S, 2
        ),
    }


# ----------------------------------------------------------------------
# sketch mode (round-1 headline, kept as a secondary metric)


def bench_sketch() -> dict:
    jax = _init_jax()
    import jax.numpy as jnp

    from hymet_tpu.io.sketchdb import PAD_HASH, SketchDB
    from hymet_tpu.ops.sketch import (
        ScreenEngine,
        finish_bottom_sketch,
        sketch_batch_topk,
    )

    rng = np.random.default_rng(0)
    t0 = time.time()
    refs = rng.integers(0, 4, size=(N_REFS, REF_LEN), dtype=np.uint8)
    log(f"generated {N_REFS}x{REF_LEN / 1e6:.1f} Mbp refs in {time.time() - t0:.1f}s")

    s = 1000
    cache = os.path.join(CACHE, f"db_{N_REFS}x{REF_LEN}_s{s}.npz")
    if os.path.exists(cache):
        db = SketchDB.load(cache)
        log(f"loaded cached sketch DB (F={db.flat_index()[0].shape[0]:,})")
    else:
        t0 = time.time()
        hashes = np.full((N_REFS, s), PAD_HASH, dtype=np.uint64)
        n_hashes = np.zeros(N_REFS, dtype=np.int32)
        rows_per_call = max(1, min(8, N_REFS))
        for base in range(0, N_REFS, rows_per_call):
            chunk = refs[base : base + rows_per_call]
            c_hi, c_lo = sketch_batch_topk(jnp.asarray(chunk), 21, 2 * s + 256)
            sk, nn = finish_bottom_sketch(np.asarray(c_hi), np.asarray(c_lo), s)
            hashes[base : base + chunk.shape[0]] = sk
            n_hashes[base : base + chunk.shape[0]] = nn
        db = SketchDB(
            k=21,
            sketch_size=s,
            hashes=hashes,
            n_hashes=n_hashes,
            names=[f"ref{i}" for i in range(N_REFS)],
            lengths=np.full(N_REFS, REF_LEN, dtype=np.int64),
            comments=[""] * N_REFS,
        )
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        db.save(cache)
        log(f"device-sketched DB in {time.time() - t0:.1f}s (F={db.flat_index()[0].shape[0]:,})")

    def make_batch(seed: int) -> np.ndarray:
        r = np.random.default_rng(seed)
        out = np.empty((BATCH_ROWS, BATCH_LEN), dtype=np.uint8)
        for i in range(BATCH_ROWS):
            src = refs[r.integers(0, N_REFS)]
            start = int(r.integers(0, REF_LEN - BATCH_LEN))
            sl = src[start : start + BATCH_LEN].copy()
            mut = r.random(BATCH_LEN) < 0.03
            sl[mut] = r.integers(0, 4, size=int(mut.sum()), dtype=np.uint8)
            out[i] = sl
        return out

    eng = ScreenEngine(db, track_kmers=False)
    batch0 = jnp.asarray(make_batch(1))
    t0 = time.time()
    eng.update_codes(batch0)
    np.asarray(eng.counts[:1])
    # compile the scoring path up front too: compiling new programs after
    # streams of donated-buffer updates can deadlock the dev tunnel
    eng.finalize()
    log(f"warmup (compile) {time.time() - t0:.1f}s")

    # steady-state timing; batches pre-staged on device (the dev tunnel's
    # host->device path is ~3.5 MB/s, which real deployments don't have)
    from hymet_tpu.harness.timing import best_run, force_readback, spread_note, timed_groups

    _stage = jax.jit(lambda x: x + jnp.uint8(0))
    batches = [_stage(jnp.asarray(make_batch(2 + i))) for i in range(4)]
    jax.block_until_ready(batches)

    def _group():
        for b in batches:
            eng.update_codes(b)
        # forced readback: block_until_ready on a donation-aliased buffer
        # can return before the work runs (harness/timing.py)
        force_readback(eng.counts)

    runs = timed_groups(_group, min_runs=6, max_runs=12, budget_s=180.0)
    best, _ = best_run(runs)
    bp_group = len(batches) * BATCH_ROWS * BATCH_LEN
    gbps = bp_group / best / 1e9
    log(f"groups: {spread_note(runs)} of {bp_group / 1e9:.3f} Gbp each")

    t0 = time.time()
    res = eng.finalize()
    log(f"finalize {time.time() - t0:.2f}s; top identity {res.identity.max():.4f}")
    return {
        "metric": "sketch_query_Gbp_per_s",
        "value": round(gbps, 4),
        "unit": "Gbp/s",
        "vs_baseline": round(gbps / SKETCH_BASELINE_GBP_S, 2),
    }


# ----------------------------------------------------------------------
# sketch_stages mode: marginal per-stage cost of the prefilter screen
# update (truncated prefixes of the SAME fused program, like
# align_stages): 1 hashing, 2 +threshold, 3 +survivor compaction,
# 0 full (search + scatter-add).


def bench_sketch_stages() -> dict:
    jax = _init_jax()
    import jax.numpy as jnp

    from hymet_tpu.harness.timing import best_run, force_readback, timed_groups
    from hymet_tpu.io.fasta import pack_code_batch
    from hymet_tpu.io.sketchdb import PAD_HASH, SketchDB
    from hymet_tpu.ops.sketch import (
        ScreenEngine,
        pref_cap_sized,
        screen_update_fused_packed_nodonate,
    )

    rng = np.random.default_rng(0)
    R, s = N_REFS, 1000
    # realistic bottom-sketch distribution (see bench_sketch_large)
    thresh = (1 << 64) * s // 4_000_000
    hashes = np.sort(rng.integers(0, thresh, size=(R, s), dtype=np.uint64), axis=1)
    db = SketchDB(
        k=21,
        sketch_size=s,
        hashes=hashes,
        n_hashes=np.full(R, s, dtype=np.int32),
        names=[f"r{i}" for i in range(R)],
        lengths=np.full(R, 4_000_000, dtype=np.int64),
        comments=[""] * R,
    )
    eng = ScreenEngine(db, track_kmers=False)
    codes = rng.integers(0, 4, size=(BATCH_ROWS, BATCH_LEN), dtype=np.uint8)
    packed, mask, L = pack_code_batch(codes)
    packed_d, mask_d = jnp.asarray(packed), jnp.asarray(mask)
    jax.block_until_ready((packed_d, mask_d))
    counts0 = jnp.zeros_like(eng.counts)

    best: dict = {}
    for stage, name in ((1, "hash"), (2, "threshold"), (3, "compact"), (0, "full")):
        def _run():
            out = screen_update_fused_packed_nodonate(
                eng.db_hi, eng.db_lo, counts0, packed_d, mask_d, L, db.k,
                eng._use_pallas, eng.db_hl, eng.bkt2,
                bkt_steps=eng.bkt_steps, stage=stage,
                # shipping config: threshold-sized survivor cap
                pref_cap=pref_cap_sized(BATCH_ROWS * BATCH_LEN, eng._survival),
            )
            force_readback(out)

        t0 = time.time()
        _run()
        log(f"stage {name}: warmup (compile) {time.time() - t0:.1f}s")
        runs = timed_groups(_run, min_runs=6, max_runs=6, budget_s=120.0)
        best[name], _ = best_run(runs)
        log(f"stage {name}: best {best[name]:.4f}s over {len(runs)}")
    prev = 0.0
    for name in ("hash", "threshold", "compact", "full"):
        log(f"marginal {name}: {best[name] - prev:+.4f}s (cumulative {best[name]:.4f}s)")
        prev = best[name]
    bp = BATCH_ROWS * BATCH_LEN
    gbps = bp / best["full"] / 1e9
    return {
        "metric": "sketch_stages_full_s_per_batch",
        "value": round(best["full"], 4),
        "unit": f"s per {bp / 1e6:.1f} Mbp batch",
        "vs_baseline": round(gbps / SKETCH_BASELINE_GBP_S, 2),
    }


# ----------------------------------------------------------------------
# align mode: aligner-only throughput on real genome sequence (ROADMAP
# item 4 "Done" criterion: aligner Gbp/s on TPU, host leg share)


def _align_world():
    """Shared align-bench workload: the real 24-genome Zymo panel index
    plus a mutated-fragment batch generator (2% SNPs over slices of the
    largest genome). bench_align and bench_align_stages must measure the
    SAME input distribution, so both build it here."""
    from hymet_tpu.io.fasta import encode_seq, iter_fasta
    from hymet_tpu.io.minimizer_index import MinimizerIndex
    from hymet_tpu.models.aligner import MinimizerAligner

    genomes = sorted(glob.glob(GENOME_GLOB))
    if not genomes:
        raise SystemExit("reference Zymo genomes not found")
    named = []
    for g in genomes:
        for n, s in iter_fasta(g):
            named.append((n.split()[0], s))
    t0 = time.time()
    index = MinimizerIndex.build(named)
    total_bp = sum(len(s) for _, s in named)
    log(
        f"index {total_bp / 1e6:.1f} Mbp, {index.n_minimizers:,} minimizers "
        f"in {time.time() - t0:.1f}s"
    )
    aligner = MinimizerAligner(index)
    src = np.frombuffer(max((s for _, s in named), key=len), np.uint8)

    def make_batch(seed: int, rows: int, pad: int) -> np.ndarray:
        r = np.random.default_rng(seed)
        b = np.full((rows, pad), 4, np.uint8)
        for i in range(rows):
            st = int(r.integers(0, len(src) - pad))
            frag = np.frombuffer(
                encode_seq(src[st : st + pad].tobytes()), np.uint8
            ).copy()
            mut = r.random(frag.size) < 0.02
            frag[mut] = r.integers(0, 4, int(mut.sum()), dtype=np.uint8)
            b[i] = frag
        return b

    return index, aligner, make_batch


def bench_align() -> dict:
    _init_jax()

    index, aligner, make_batch = _align_world()
    rows, pad = 64, 1 << 16

    def batch(seed):
        return make_batch(seed, rows, pad)

    t0 = time.time()
    chains = aligner._chains_for_batch(batch(0))
    log(f"warmup (compile) {time.time() - t0:.1f}s; {len(chains)} chains")

    from hymet_tpu.harness.timing import best_run, spread_note, timed_groups

    batches = [batch(1 + i) for i in range(3)]

    def _group():
        # dispatch-ahead like map_batch: all group programs enqueue before
        # the first fetch, so host _Chain builds overlap device compute;
        # _finish_batch fetches real chain rows, which forces execution
        pend = [aligner._dispatch_batch(b) for b in batches]
        return sum(len(aligner._finish_batch(p)) for p in pend)

    runs = timed_groups(_group, min_runs=3, max_runs=8, budget_s=180.0)
    best, n_ch = best_run(runs)
    bp_group = len(batches) * rows * pad
    gbps = bp_group / best / 1e9
    log(
        f"groups: {spread_note(runs)} of {bp_group / 1e9:.4f} Gbp each; "
        f"last group chains={runs[-1][1]}"
    )
    # host-leg share: time the _Chain build alone on the last device rows
    return {
        "metric": "align_query_Gbp_per_s",
        "value": round(gbps, 4),
        "unit": "Gbp/s",
        # baseline: minimap2 -x asm10 ~1 Gbp / 3 CPU-min ~ 0.0056 Gbp/s
        # (the whole reference align stage is minutes per ~100 Mbp sample)
        "vs_baseline": round(gbps / 0.0056, 2),
    }


# ----------------------------------------------------------------------
# align_stages mode: marginal per-stage cost of the fused align program.
# Compiles truncated prefixes of the SAME program (stage static arg:
# 1 extract, 2 minimizer compaction, 3 index search, 4 anchor collect,
# 5 anchor sort, 0 full) and times each; consecutive deltas attribute
# wall time to each stage — the profiling we can do without xprof
# tooling on the tunnel. Each prefix is a fresh (cached) compile.


def bench_align_stages() -> dict:
    jax = _init_jax()
    import jax.numpy as jnp

    from hymet_tpu.models.aligner import _extract_chains_fused

    index, aligner, make_batch = _align_world()
    rows = int(os.environ.get("BENCH_ALIGN_ROWS", "64"))
    pad = int(os.environ.get("BENCH_ALIGN_PAD", str(1 << 16)))
    batch_dev = jnp.asarray(make_batch(1, rows, pad))
    jax.block_until_ready(batch_dev)

    NW, cap = aligner._minimizer_cap(rows, pad)
    acap, ccap = aligner._device_caps(rows, NW, cap)
    cfg = aligner.cfg
    args = (
        aligner._idx_hl,
        aligner._idx_roff2,
        aligner._idx_ps,
        batch_dev,
        index.k,
        index.w,
        cfg.max_occ,
        cfg.band_bits,
        cap,
        acap,
        ccap,
        cfg.min_cnt,
        cfg.min_mlen,
    )
    kw = dict(
        bkt2=aligner._bkt2,
        bkt_bits=aligner._bkt_bits,
        bkt_steps=aligner._bkt_steps,
        bsearch=os.environ.get("HYMET_SLOT_BSEARCH", "1") == "1",
        min_bsearch=os.environ.get("HYMET_MIN_BSEARCH", "0") == "1",
        slot_fill=os.environ.get("HYMET_SLOT_FILL", "1") == "1",
    )
    if os.environ.get("HYMET_FLAT_BAND", "0") == "1":
        kw["fb_base2"] = aligner._fb_tables(pad)
    stages = [
        (1, "extract"),
        (2, "min_compact"),
        (3, "search"),
        (4, "anchor_collect"),
        (5, "anchor_sort"),
        (0, "full"),
    ]
    from hymet_tpu.harness.timing import best_run, force_readback, timed_groups

    # force_readback fetches O(1) bytes of the first leaf: a full-array
    # fetch would bill tunnel transfer time to whichever stage returns
    # the biggest output
    best: dict = {}
    for stage, name in stages:
        t0 = time.time()
        force_readback(_extract_chains_fused(*args, stage=stage, **kw))
        log(f"stage {name}: warmup (compile) {time.time() - t0:.1f}s")
        runs = timed_groups(
            lambda: force_readback(_extract_chains_fused(*args, stage=stage, **kw)),
            min_runs=6,
            max_runs=6,
            budget_s=120.0,
        )
        best[name], _ = best_run(runs)
        log(f"stage {name}: best {best[name]:.4f}s over {len(runs)}")
    prev = 0.0
    for _, name in stages:
        log(
            f"marginal {name}: {best[name] - prev:+.4f}s "
            f"(cumulative {best[name]:.4f}s)"
        )
        prev = best[name]
    bp = rows * pad
    return {
        "metric": "align_stages_full_s_per_batch",
        "value": round(best["full"], 4),
        "unit": f"s per {bp / 1e6:.1f} Mbp batch",
        "vs_baseline": round((bp / best["full"] / 1e9) / 0.0056, 2),
    }


# ----------------------------------------------------------------------
# sketch_large mode: F ~ 1e8 flat hashes (the ~45 GB RefSeq sketch-DB
# scale, reference bench/README.md:45) — validates HBM sizing and the
# prefilter count's throughput at real DB size (VERDICT r1 missing #3)

LARGE_F_REFS = int(os.environ.get("BENCH_LARGE_REFS", "100000"))
LARGE_F_SKETCH = int(os.environ.get("BENCH_LARGE_SKETCH", "1000"))


def bench_sketch_large() -> dict:
    jax = _init_jax()
    import jax.numpy as jnp

    from hymet_tpu.io.sketchdb import SketchDB
    from hymet_tpu.ops.sketch import ScreenEngine

    R, s = LARGE_F_REFS, LARGE_F_SKETCH
    rng = np.random.default_rng(0)
    t0 = time.time()
    # realistic bottom-sketch distribution: the s smallest of ~genome_len
    # uniform 64-bit hashes are ~uniform on [0, t) with t ~= s/genome_len
    # of the hash space (a 4 Mbp genome here). The first sketch_large run
    # drew hashes uniform over 2^63 instead, which put the bottom-sketch
    # THRESHOLD at half the hash space — ~50% of query hashes "survived"
    # the prefilter, overflowing its cap and forcing the exact full-stream
    # fallback every batch (0.0008 Gbp/s, queue r3) — a bench-data bug,
    # not a kernel property: real Mash thresholds are ~2.5e-4 of the
    # space (docs/BENCH_NOTES.md round-3 log).
    genome_len = 4_000_000
    thresh = (1 << 64) * s // genome_len  # ~2.5e-4 of the hash space
    hashes = np.sort(
        rng.integers(0, thresh, size=(R, s), dtype=np.uint64), axis=1
    )
    db = SketchDB(
        k=21,
        sketch_size=s,
        hashes=hashes,
        n_hashes=np.full(R, s, dtype=np.int32),
        names=[f"r{i}" for i in range(R)],
        lengths=np.full(R, 4_000_000, dtype=np.int64),
        comments=[""] * R,
    )
    F = db.flat_index()[0].shape[0]
    log(f"flat DB F={F:,} ({F * 8 / 1e9:.2f} GB of 64-bit hashes) in {time.time() - t0:.1f}s")

    eng = ScreenEngine(db, track_kmers=False)
    batch0 = jnp.asarray(
        rng.integers(0, 4, size=(BATCH_ROWS, BATCH_LEN), dtype=np.uint8)
    )
    t0 = time.time()
    eng.update_codes(batch0)
    np.asarray(eng.counts[:1])
    log(f"warmup (compile) {time.time() - t0:.1f}s")

    _stage = jax.jit(lambda x: x + jnp.uint8(0))
    batches = [
        _stage(
            jnp.asarray(
                rng.integers(0, 4, size=(BATCH_ROWS, BATCH_LEN), dtype=np.uint8)
            )
        )
        for i in range(4)
    ]
    jax.block_until_ready(batches)
    from hymet_tpu.harness.timing import best_run, force_readback, spread_note, timed_groups

    def _group():
        for b in batches:
            eng.update_codes(b)
        # forced readback: this exact site produced the round-2 "0.000 s
        # groups" deferred-execution bug (docs/BENCH_NOTES.md)
        force_readback(eng.counts)

    runs = timed_groups(_group, min_runs=4, max_runs=10, budget_s=180.0)
    best, _ = best_run(runs)
    bp_group = len(batches) * BATCH_ROWS * BATCH_LEN
    gbps = bp_group / best / 1e9
    log(f"groups: {spread_note(runs)} of {bp_group / 1e9:.3f} Gbp each (F={F:,})")
    t0 = time.time()
    res = eng.finalize()
    log(f"finalize {time.time() - t0:.2f}s; max shared {int(res.shared.max())}")
    return {
        "metric": "sketch_largeF_Gbp_per_s",
        "value": round(gbps, 4),
        "unit": "Gbp/s",
        "vs_baseline": round(gbps / SKETCH_BASELINE_GBP_S, 2),
    }


def main() -> None:
    os.makedirs(CACHE, exist_ok=True)
    mode = os.environ.get("BENCH_MODE", "pipeline")
    from hymet_tpu.harness import deadline

    # hard-deadline watchdog (separate jax-free process): prints the
    # best partial result and kills this tree if the wall clock runs out
    # — BENCH_r03 recorded nothing and that must never happen again.
    # The warm child is covered by the parent's watchdog, not its own.
    if os.environ.get("_BENCH_WARM_CHILD") != "1":
        deadline.arm(mode, CACHE)
    # the one-JSON-line stdout contract is absolute: route any stray
    # library prints to stderr while the benchmark body runs
    real_stdout = sys.stdout
    sys.stdout = sys.stderr
    try:
        if mode == "sketch":
            result = bench_sketch()
        elif mode == "sketch_stages":
            result = bench_sketch_stages()
        elif mode == "sketch_large":
            result = bench_sketch_large()
        elif mode == "align":
            result = bench_align()
        elif mode == "align_stages":
            result = bench_align_stages()
        elif mode == "warm_pipeline":
            result = bench_warm_pipeline()
        else:
            result = bench_pipeline()
    except Exception as e:
        sys.stdout = real_stdout
        if os.environ.get("_BENCH_WARM_CHILD") == "1":
            raise  # the parent interprets the warm child's rc
        # crash path: still print one parseable line (the best partial if
        # any stage completed), then exit nonzero with the traceback on
        # stderr for the record's tail
        import traceback

        traceback.print_exc(file=sys.stderr)
        status = deadline._read_status(os.environ.get(deadline.ENV_STATUS, ""))
        line = deadline.degraded_line(status, mode)
        if not status.get("result"):
            line["degraded"] = f"error:{type(e).__name__}"
        deadline.finish()
        print(json.dumps(line), flush=True)
        sys.exit(1)
    finally:
        sys.stdout = real_stdout
    from hymet_tpu.harness.timing import tag_fallback

    result = tag_fallback(result, os.environ.get("_BENCH_CPU_FALLBACK") == "1")
    deadline.finish()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
