"""Sharded aligner vs single-device aligner equivalence on the virtual
8-device mesh."""

import numpy as np
import pytest

from hymet_tpu.io.minimizer_index import MinimizerIndex
from hymet_tpu.models.aligner import MinimizerAligner
from hymet_tpu.parallel.align import ShardedMinimizerAligner
from hymet_tpu.parallel.mesh import make_mesh

_ACGT = np.frombuffer(b"ACGT", dtype=np.uint8)


def _rand_seq(rng, n):
    return rng.choice(_ACGT, size=n).astype(np.uint8).tobytes()


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(99)
    genomes = [(f"chr{i}", _rand_seq(rng, 20000)) for i in range(10)]
    idx = MinimizerIndex.build(genomes)
    return idx, dict(genomes)


def _key(rec):
    return (rec.qname, rec.tname, rec.strand, rec.qstart, rec.qend, rec.tstart, rec.tend, rec.nmatch, rec.blocklen)


def test_sharded_matches_single(world):
    idx, genomes = world
    queries = [
        ("q0", genomes["chr0"][2000:9000]),
        ("q1", genomes["chr7"][500:6000]),
        ("q2", genomes["chr4"][1000:4000]),
    ]
    names = [q[0] for q in queries]
    seqs = [q[1] for q in queries]

    single = MinimizerAligner(idx)
    recs1 = single.map_batch(names, seqs)

    mesh = make_mesh(data=2, db=4)
    sharded = ShardedMinimizerAligner(mesh, idx)
    recs2 = sharded.map_batch(names, seqs)

    # same chains (order may differ within a query; compare as sets)
    assert {_key(r) for r in recs1} == {_key(r) for r in recs2}
    # primary target per query agrees
    pri1 = {r.qname: r.tname for r in recs1 if r.tags["tp"] == "A:P"}
    pri2 = {r.qname: r.tname for r in recs2 if r.tags["tp"] == "A:P"}
    assert pri1 == pri2 == {"q0": "chr0", "q1": "chr7", "q2": "chr4"}


def test_sharded_no_hits(world):
    idx, _ = world
    rng = np.random.default_rng(123)
    mesh = make_mesh(data=1, db=8)
    sharded = ShardedMinimizerAligner(mesh, idx)
    assert sharded.map_batch(["x"], [_rand_seq(rng, 5000)]) == []
