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
print(f"WORKER{pid}_OK", flush=True)
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
