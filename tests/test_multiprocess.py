"""Real multi-process distributed test: two OS processes, each with two
virtual CPU devices, form one global ("data", "db") mesh via
``jax.distributed`` (reference is strictly single-node — SURVEY.md §2.6;
this validates the scale-out layer beyond the in-process virtual mesh).

Exercises init_distributed, ShardedScreenEngine over a cross-process
mesh, and the multihost-safe fetch_global path, asserting exact score
parity against the single-device engine.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
sys.path.insert(0, sys.argv[3])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
from hymet_tpu.parallel.distributed import init_distributed, is_primary

pid = int(sys.argv[1])
port = sys.argv[2]
assert init_distributed(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 4
assert is_primary() == (pid == 0)

import numpy as np, jax.numpy as jnp
from hymet_tpu.io.sketchdb import build_sketch_db_from_sequences
from hymet_tpu.io.fasta import encode_seq
from hymet_tpu.ops.sketch import ScreenEngine
from hymet_tpu.parallel.mesh import make_mesh
from hymet_tpu.parallel.screen import ShardedScreenEngine

rng = np.random.default_rng(5)
ACGT = np.frombuffer(b"ACGT", dtype=np.uint8)
genomes = [(f"g{i}", rng.choice(ACGT, 40000).tobytes()) for i in range(8)]
db = build_sketch_db_from_sequences(genomes, k=21, sketch_size=200)
q = np.frombuffer(genomes[3][1], dtype=np.uint8).copy()
idx = rng.random(q.size) < 0.02
q[idx] = rng.choice(ACGT, int(idx.sum()))
codes = np.asarray(encode_seq(q.tobytes()))[None, :]

mesh = make_mesh()  # spans all 4 global devices: data=1 x db=4
eng = ShardedScreenEngine(mesh, db)
eng.update_codes(codes)
res = eng.finalize()
ident = np.asarray(res.identity)
assert db.names[int(np.argmax(ident))] == "g3"

single = ScreenEngine(db)
single.update_codes(jnp.asarray(codes))
sres = single.finalize()
np.testing.assert_allclose(ident, np.asarray(sres.identity), rtol=1e-9)

# --- sharded aligner across the 2-process mesh ---
from hymet_tpu.io.minimizer_index import MinimizerIndex
from hymet_tpu.models.aligner import MinimizerAligner
from hymet_tpu.parallel.align import ShardedMinimizerAligner

refs = [(f"chr{i}", genomes[i][1]) for i in range(8)]
midx = MinimizerIndex.build(refs)
qnames = ["qa", "qb"]
qseqs = [genomes[2][1][1000:9000], genomes[6][1][5000:30000]]
sh_aln = ShardedMinimizerAligner(mesh, midx)
sh_recs = sh_aln.map_batch(qnames, qseqs)
solo_recs = MinimizerAligner(midx).map_batch(qnames, qseqs)
assert {(r.qname, r.tname, r.nmatch) for r in sh_recs} == {
    (r.qname, r.tname, r.nmatch) for r in solo_recs
}, "sharded aligner drifted from single-device records"
assert any(r.tname == "chr2" for r in sh_recs)

print(f"WORKER{pid}_OK", flush=True)
"""

FULLRUN_WORKER = r"""
import os, sys
sys.path.insert(0, sys.argv[3])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
from hymet_tpu.parallel.distributed import init_distributed

pid = int(sys.argv[1])
port = sys.argv[2]
shared = sys.argv[4]
assert init_distributed(f"localhost:{port}", num_processes=2, process_id=pid)

import numpy as np
from hymet_tpu.io.sketchdb import build_sketch_db
from hymet_tpu.pipeline.run import ClassificationRun
from hymet_tpu.utils.config import RunConfig

# world prepared by the test on shared disk
sketch_dbs = [os.path.join(shared, f"sketch{i+1}.npz") for i in range(2)]
cfg_kwargs = dict(
    input_fasta=os.path.join(shared, "sample.fna"),
    cand_max=50,
    species_dedup=False,
    taxonomy_dir=os.path.join(shared, "taxonomy_hierarchy.tsv"),
    sketch_dbs=sketch_dbs,
    genome_catalog=os.path.join(shared, "genomes"),
    seqid2taxid=os.path.join(shared, "seqid2taxid.tsv"),
    db_shards=4,  # spans both processes (2 devices each)
)

run = ClassificationRun(
    RunConfig(
        outdir=os.path.join(shared, "out_multi"),
        cache_root=os.path.join(shared, "cache_multi"),
        **cfg_kwargs,
    )
)
classified = run.execute()
if pid == 0:
    assert classified.startswith(os.path.join(shared, "out_multi"))
else:
    # non-primary wrote to its private scratch dir
    assert ".proc1" in classified
print(f"FULLRUN{pid}_OK", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_sharded_screen(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), port, REPO],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"worker {i} timed out")
        outs.append((p.returncode, out, err))
    for i, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"worker {i} failed:\n{err[-3000:]}"
        assert f"WORKER{i}_OK" in out


def test_two_process_full_pipeline(tmp_path):
    """Full ClassificationRun under jax.distributed: 2 processes x 2
    devices, db_shards=4 mesh spanning both; process-0 output must be
    byte-identical to a single-process run (SURVEY §2.6 distributed)."""
    import numpy as np

    from hymet_tpu.data.zymo_taxonomy import zymo_taxdb  # noqa: F401 — sanity
    from hymet_tpu.io.sketchdb import build_sketch_db
    from hymet_tpu.taxonomy.db import TaxonomyDB

    shared = tmp_path / "world"
    gdir = shared / "genomes"
    gdir.mkdir(parents=True)
    rng = np.random.default_rng(11)
    acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
    taxids = {}
    genome_files = []
    for i in range(6):
        seq = rng.choice(acgt, 20000).tobytes().decode()
        name = f"GEN{i}.1"
        p = gdir / f"g{i}.fna"
        p.write_text(f">{name}\n{seq}\n")
        genome_files.append(str(p))
        taxids[name] = 9000 + i
    with open(shared / "seqid2taxid.tsv", "w") as f:
        for name, t in taxids.items():
            f.write(f"{name}\t{t}\n")
    # two sketch DBs over disjoint genome halves (reference's multi-DB)
    for d in range(2):
        db = build_sketch_db(genome_files[d::2], k=21, sketch_size=150)
        db.save(str(shared / f"sketch{d+1}.npz"))
    # minimal taxonomy: root + species nodes
    recs = [("1", "root", "no rank", "1")] + [
        (str(t), f"Species {t}", "species", "1") for t in taxids.values()
    ]
    tax = TaxonomyDB.from_records(recs)
    tax.write_hierarchy_tsv(str(shared / "taxonomy_hierarchy.tsv"))
    # query sample: mutated slices of two genomes
    with open(shared / "sample.fna", "w") as f:
        for i, gi in enumerate((1, 4)):
            src = np.frombuffer(
                open(genome_files[gi]).read().splitlines()[1].encode(), np.uint8
            ).copy()
            mut = rng.random(src.size) < 0.01
            src[mut] = rng.choice(acgt, int(mut.sum()))
            f.write(f">ctg{i}\n{src.tobytes().decode()}\n")

    worker = tmp_path / "fullrun_worker.py"
    worker.write_text(FULLRUN_WORKER)
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), port, REPO, str(shared)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"fullrun worker {i} timed out")
        outs.append((p.returncode, out, err))
    for i, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"fullrun worker {i} failed:\n{err[-3000:]}"
        assert f"FULLRUN{i}_OK" in out

    # single-process oracle (no jax.distributed) must match byte-wise
    from hymet_tpu.pipeline.run import ClassificationRun
    from hymet_tpu.utils.config import RunConfig

    solo = ClassificationRun(
        RunConfig(
            input_fasta=str(shared / "sample.fna"),
            outdir=str(shared / "out_solo"),
            cache_root=str(shared / "cache_solo"),
            cand_max=50,
            species_dedup=False,
            taxonomy_dir=str(shared / "taxonomy_hierarchy.tsv"),
            sketch_dbs=[str(shared / f"sketch{i+1}.npz") for i in range(2)],
            genome_catalog=str(gdir),
            seqid2taxid=str(shared / "seqid2taxid.tsv"),
            db_shards=1,
        )
    )
    solo_classified = solo.execute()
    multi = (shared / "out_multi" / "classified_sequences.tsv").read_text()
    assert multi == open(solo_classified).read(), (
        "multihost pipeline output != single-process output"
    )
    sample = "sample"
    cami_multi = (shared / "out_multi" / f"hymet.{sample}.cami.tsv").read_text()
    cami_solo = (shared / "out_solo" / f"hymet.{sample}.cami.tsv").read_text()
    assert cami_multi == cami_solo
