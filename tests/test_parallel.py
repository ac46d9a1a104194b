"""Multi-device tests on the 8-device virtual CPU mesh: sharded screen
equivalence vs single-device engine, top-k merge collective, mesh
construction."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hymet_tpu.io.fasta import encode_seq
from hymet_tpu.io.sketchdb import build_sketch_db_from_sequences
from hymet_tpu.ops.sketch import ScreenEngine
from hymet_tpu.parallel import ShardedScreenEngine, make_mesh, sharded_topk

_ACGT = np.frombuffer(b"ACGT", dtype=np.uint8)


def _rand_seq(rng, n):
    return rng.choice(_ACGT, size=n).astype(np.uint8).tobytes()


def test_mesh_shapes():
    m = make_mesh()
    assert m.shape["data"] * m.shape["db"] == len(jax.devices())
    m = make_mesh(data=2, db=4)
    assert m.shape == {"data": 2, "db": 4}
    with pytest.raises(ValueError):
        make_mesh(data=3, db=3)


def test_sharded_topk():
    mesh = make_mesh(data=1, db=8)
    scores = jnp.asarray(np.arange(64, dtype=np.float32))
    vals, idx = sharded_topk(mesh, scores, 5)
    np.testing.assert_array_equal(np.asarray(vals), [63, 62, 61, 60, 59])
    np.testing.assert_array_equal(np.asarray(idx), [63, 62, 61, 60, 59])


def test_sharded_screen_matches_single_device():
    rng = np.random.default_rng(31)
    genomes = [(f"g{i}", _rand_seq(rng, 6000)) for i in range(13)]
    db = build_sketch_db_from_sequences(genomes, k=21, sketch_size=64)

    queries = [genomes[2][1], genomes[7][1][:3000], _rand_seq(rng, 4000)]
    L = max(len(q) for q in queries)
    codes = np.full((4, L), 4, dtype=np.uint8)
    for i, q in enumerate(queries):
        codes[i, : len(q)] = encode_seq(q)

    # single-device reference
    eng = ScreenEngine(db)
    eng.update_codes(jnp.asarray(codes))
    ref = eng.finalize()

    # 2x4 mesh
    mesh = make_mesh(data=2, db=4)
    seng = ShardedScreenEngine(mesh, db)
    seng.update_codes(codes)
    got = seng.finalize()

    np.testing.assert_array_equal(got.shared, np.asarray(ref.shared))
    np.testing.assert_allclose(got.identity, np.asarray(ref.identity), atol=1e-6)
    np.testing.assert_array_equal(got.median, np.asarray(ref.median))
    assert got.total_query_kmers == ref.total_query_kmers


def test_sharded_screen_streaming_updates():
    rng = np.random.default_rng(5)
    genomes = [(f"g{i}", _rand_seq(rng, 5000)) for i in range(8)]
    db = build_sketch_db_from_sequences(genomes, k=21, sketch_size=64)
    mesh = make_mesh(data=1, db=8)
    seng = ShardedScreenEngine(mesh, db)
    # stream the same genome twice -> median multiplicity 2
    codes = encode_seq(genomes[0][1])[None, :]
    seng.update_codes(codes)
    seng.update_codes(codes)
    res = seng.finalize()
    assert res.shared[0] == db.n_hashes[0]
    assert res.median[0] == 2


def test_sharded_packed_update_matches():
    """ShardedScreenEngine.update_codes_packed must produce identical
    counts to the plain update path."""
    rng = np.random.default_rng(9)
    genomes = [(f"g{i}", _rand_seq(rng, 6000)) for i in range(8)]
    db = build_sketch_db_from_sequences(genomes, k=21, sketch_size=64)
    queries = [genomes[3][1], genomes[5][1][:2500] + b"NN" + genomes[5][1][2500:]]
    L = max(len(q) for q in queries)
    codes = np.full((2, L), 4, dtype=np.uint8)
    for i, q in enumerate(queries):
        codes[i, : len(q)] = encode_seq(q)
    mesh = make_mesh(data=2, db=4)
    a = ShardedScreenEngine(mesh, db)
    a.update_codes(codes)
    b = ShardedScreenEngine(mesh, db)
    b.update_codes_packed(codes)
    ra, rb = a.finalize(), b.finalize()
    np.testing.assert_array_equal(ra.identity, rb.identity)
    np.testing.assert_array_equal(ra.shared, rb.shared)
    assert a.total_query_kmers == b.total_query_kmers
