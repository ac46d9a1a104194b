"""Sketch engine tests: device screen vs a brute-force host oracle of Mash
screen semantics; device bottom-s sketching vs host sketching; containment
identity behavior on contained/mutated sequences."""

import numpy as np
import pytest

import jax.numpy as jnp

from hymet_tpu.io.fasta import encode_seq
from hymet_tpu.io.sketchdb import (
    PAD_HASH,
    SketchDB,
    bottom_sketch_from_hashes,
    build_sketch_db_from_sequences,
)
from hymet_tpu.ops.hashing import kmer_hashes_numpy, pack64
from hymet_tpu.ops.sketch import ScreenEngine, sketch_batch, split64

K = 21
S = 200


_ACGT = np.frombuffer(b"ACGT", dtype=np.uint8)


def _rand_seq(rng, n):
    return rng.choice(_ACGT, size=n).astype(np.uint8).tobytes()


def _mutate(rng, seq, rate):
    arr = np.frombuffer(seq, dtype=np.uint8).copy()
    idx = rng.random(len(arr)) < rate
    arr[idx] = rng.choice(_ACGT, size=int(idx.sum())).astype(np.uint8)
    return arr.tobytes()


@pytest.fixture(scope="module")
def genomes():
    rng = np.random.default_rng(11)
    return {
        "gA": _rand_seq(rng, 20000),
        "gB": _rand_seq(rng, 15000),
        "gC": _rand_seq(rng, 12000),
    }


@pytest.fixture(scope="module")
def db(genomes):
    return build_sketch_db_from_sequences(
        [(n, s) for n, s in genomes.items()], k=K, sketch_size=S
    )


def _host_screen(db: SketchDB, query_seqs):
    """Brute-force oracle of mash screen: pooled query k-mer multiset vs
    each reference sketch."""
    from collections import Counter

    counter = Counter()
    for seq in query_seqs:
        for h in kmer_hashes_numpy(encode_seq(seq), db.k):
            counter[int(h)] += 1
    out = []
    for r in range(db.n_refs):
        sk = db.hashes[r][: db.n_hashes[r]]
        mults = [counter[int(h)] for h in sk if int(h) in counter]
        shared = len(mults)
        c = shared / max(int(db.n_hashes[r]), 1)
        ident = max(0.0, 1.0 + np.log(2 * c / (1 + c)) / db.k) if c > 0 else 0.0
        med = sorted(mults)[shared // 2] if shared else 0
        out.append((ident, shared, med))
    return out


def _stream(db, query_seqs):
    eng = ScreenEngine(db)
    for seq in query_seqs:
        codes = encode_seq(seq)
        eng.update_codes(jnp.asarray(codes[None, :]))
    return eng.finalize()


def test_screen_exact_containment(db, genomes):
    res = _stream(db, [genomes["gA"]])
    i_a = db.names.index("gA")
    # full containment: identity 1.0, all sketch hashes shared once
    assert res.identity[i_a] == pytest.approx(1.0, abs=1e-6)
    assert res.shared[i_a] == db.n_hashes[i_a]
    assert res.median[i_a] == 1
    # unrelated genomes: near-zero containment
    for other in ("gB", "gC"):
        i = db.names.index(other)
        assert res.shared[i] <= 2


def test_screen_matches_host_oracle(db, genomes):
    rng = np.random.default_rng(5)
    queries = [
        genomes["gA"][:8000],
        _mutate(rng, genomes["gB"], 0.03),
        _rand_seq(rng, 5000),
        genomes["gA"][:8000],  # repeat: multiplicity 2 for its kmers
    ]
    res = _stream(db, queries)
    oracle = _host_screen(db, queries)
    for r in range(db.n_refs):
        ident, shared, med = oracle[r]
        assert res.shared[r] == shared, db.names[r]
        assert res.identity[r] == pytest.approx(ident, abs=1e-5)
        assert res.median[r] == med

    pv = res.pvalues()
    # strong hits are overwhelmingly significant; all p-values valid
    assert pv[db.names.index("gA")] < 1e-9
    assert ((pv >= 0) & (pv <= 1)).all()


def test_mutated_identity_tracks_formula(db, genomes):
    """3% point mutations => expected k-mer survival (1-p)^k => containment
    ~0.52; identity estimate should land near 1-p."""
    rng = np.random.default_rng(17)
    res = _stream(db, [_mutate(rng, genomes["gB"], 0.03)])
    i_b = db.names.index("gB")
    ident = res.identity[i_b]
    assert 0.95 < ident < 0.985  # ~0.97 expected


def test_device_sketch_matches_host(genomes):
    seqs = [genomes["gA"][:5000], genomes["gB"][:5000]]
    codes = np.stack([encode_seq(s) for s in seqs])
    hi, lo, n = sketch_batch(jnp.asarray(codes), K, S)
    got = pack64(np.asarray(hi), np.asarray(lo))
    for i, seq in enumerate(seqs):
        want, wn = bottom_sketch_from_hashes(
            kmer_hashes_numpy(encode_seq(seq), K), S
        )
        assert int(n[i]) == wn
        np.testing.assert_array_equal(got[i][: int(n[i])], want[:wn])


def test_device_sketch_short_sequence():
    codes = np.tile(np.array([[0, 1, 2, 3] * 8], dtype=np.uint8), (1, 1))  # 32bp
    hi, lo, n = sketch_batch(jnp.asarray(codes), K, S)
    assert int(n[0]) <= 32 - K + 1
    assert hi.shape == (1, S)


def test_sketchdb_save_load(tmp_path, db):
    p = str(tmp_path / "db.npz")
    db.save(p)
    db2 = SketchDB.load(p)
    assert db2.k == db.k and db2.names == db.names
    np.testing.assert_array_equal(db2.hashes, db.hashes)


def test_sketchdb_shard(db):
    shards = db.shard(2)
    assert sum(s.n_refs for s in shards) == db.n_refs
    assert [n for s in shards for n in s.names] == db.names


@pytest.mark.parametrize("F", [1, 100, 128, 4096, 33000])
def test_count_eqmm_matches_binsearch(F):
    """The MXU one-hot-matmul count (TPU default; see _count_eqmm) must
    produce identical per-slot counts to the binary-search formulation."""
    from hymet_tpu.ops.sketch import _count_impl

    rng = np.random.default_rng(7)
    dbh = np.unique(rng.integers(0, 1 << 64, F * 2, dtype=np.uint64))[:F]
    assert dbh.shape[0] == F
    n = 20000
    q = np.concatenate(
        [rng.integers(0, 1 << 64, n // 2, dtype=np.uint64), rng.choice(dbh, n // 2)]
    )
    valid = rng.random(n) > 0.1
    sp = lambda x: ((x >> np.uint64(32)).astype(np.uint32), (x & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    dh, dl = map(jnp.asarray, sp(dbh))
    qh, ql = map(jnp.asarray, sp(q))
    zeros = jnp.zeros(F, jnp.int32)
    a = _count_impl(dh, dl, zeros, qh, ql, jnp.asarray(valid), use_eqmm=False)
    b = _count_impl(dh, dl, zeros, qh, ql, jnp.asarray(valid), use_eqmm=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(a.sum()) >= n // 2 - int((~valid).sum())


def test_binom_sf_vs_scipy():
    """Property check of the exact log-space binomial survival function
    against scipy (mash screen's p-value; reference uses kgml's binomial
    via mash CLI internals). Sweep x, n, p over the realistic sketch
    range plus boundary cases."""
    scipy_stats = pytest.importorskip("scipy.stats")
    from hymet_tpu.ops.sketch import binom_sf

    rng = np.random.default_rng(13)
    cases = [(0, 10, 0.5), (10, 10, 0.5), (1, 1, 1e-12), (5, 1000, 0.0), (5, 1000, 1.0)]
    for _ in range(60):
        n = int(rng.integers(1, 3000))
        x = int(rng.integers(0, n + 1))
        p = float(rng.random()) ** 3  # bias toward small p (screen regime)
        cases.append((x, n, p))
    for x, n, p in cases:
        ours = binom_sf(x, n, p)
        ref = float(scipy_stats.binom.sf(x - 1, n, p))  # P(X >= x)
        assert ours == pytest.approx(ref, rel=1e-9, abs=1e-300), (x, n, p)


@pytest.mark.parametrize("compaction", ["slot", "topk"])
@pytest.mark.parametrize(
    "case",
    [
        "bottom_fast",
        "clustered_fast",
        "uniform_fallback",
        "repeat_overflow",
        "padded_shard",
        "all_pad",
    ],
)
def test_count_prefilter_matches_binsearch(case, compaction, monkeypatch):
    """The bottom-sketch prefilter count (TPU default; see
    _count_prefilter) must equal the binary-search formulation exactly in
    both its fast path and every fallback regime, under both survivor
    compactions (slot = destination-map inversion default, topk = the
    legacy per-row top_k kept for on-chip A/B)."""
    from hymet_tpu.ops.sketch import _count_impl

    if compaction == "topk":
        monkeypatch.setenv("HYMET_PREF_TOPK", "1")
    else:
        monkeypatch.delenv("HYMET_PREF_TOPK", raising=False)

    rng = np.random.default_rng(23)
    F, n = 32768, 300000
    small = np.unique(rng.integers(0, 1 << 44, F * 2, dtype=np.uint64))[:F]
    if case == "bottom_fast":
        db = small
        q = rng.integers(0, 1 << 64, n, dtype=np.uint64)
        q[:3000] = rng.choice(db, 3000)
    elif case == "clustered_fast":
        # ~3500 survivors packed into one contiguous run: stays inside
        # the slot compaction's global cap (fast path) while overflowing
        # the legacy per-row top_k cap (fallback path) — both exact
        db = small
        q = rng.integers(0, 1 << 64, n, dtype=np.uint64)
        q[100000:103500] = rng.choice(db, 3500)
    elif case == "uniform_fallback":
        # threshold ~ 2^64: nearly everything survives -> overflow branch
        db = np.unique(rng.integers(0, 1 << 64, F * 2, dtype=np.uint64))[:F]
        q = rng.integers(0, 1 << 64, n, dtype=np.uint64)
        q[:5000] = rng.choice(db, 5000)
    elif case == "repeat_overflow":
        # low-complexity analogue: one surviving hash repeated past the
        # per-row cap
        db = small
        q = rng.integers(0, 1 << 64, n, dtype=np.uint64)
        q[:6000] = db[5]
    elif case == "padded_shard":
        db = np.concatenate(
            [small[:1000], np.full(24, 0xFFFFFFFFFFFFFFFF, np.uint64)]
        )
        q = rng.integers(0, 1 << 64, 50000, dtype=np.uint64)
        q[:500] = rng.choice(small[:1000], 500)
        n = q.shape[0]
    else:  # all_pad
        db = np.full(64, 0xFFFFFFFFFFFFFFFF, np.uint64)
        q = rng.integers(0, 1 << 64, 8192, dtype=np.uint64)
        n = q.shape[0]
    valid = rng.random(n) > 0.1
    sp = lambda x: (
        jnp.asarray((x >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray((x & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
    )
    dh, dl = sp(db)
    qh, ql = sp(q)
    z = jnp.zeros(db.shape[0], jnp.int32)
    v = jnp.asarray(valid)
    a = _count_impl(dh, dl, z, qh, ql, v, use_eqmm=False, use_prefilter=False)
    b = _count_impl(dh, dl, z, qh, ql, v, use_prefilter=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pref_cap_sized():
    """Threshold-aware prefilter cap sizing (pref_cap_sized): 4x-headroom
    4096-quantum caps at realistic Mash survival rates, heuristic
    fallback for empty/saturated thresholds, never above n."""
    from hymet_tpu.ops.sketch import _pref_cap, pref_cap_sized

    n = 64 * 131072
    # realistic Mash threshold (~2.5e-4): tight cap, far below n >> 7
    cap = pref_cap_sized(n, 2.5e-4)
    assert cap % 4096 == 0
    assert 4.0 * 2.5e-4 * n <= cap <= 4.0 * 2.5e-4 * n + 4096
    assert cap < _pref_cap(n)
    # floor
    assert pref_cap_sized(1 << 20, 1e-7) == 4096
    # saturated / unknown thresholds fall back to the blind heuristic
    assert pref_cap_sized(n, 0.0) == _pref_cap(n)
    assert pref_cap_sized(n, 0.5) == _pref_cap(n)
    # never above n
    assert pref_cap_sized(5000, 0.25) == 5000


def test_count_prefilter_sized_cap_exact():
    """A threshold-sized pref_cap must stay exact in both regimes: the
    fast path when survivors fit, and the in-jit full-stream fallback
    when a (deliberately undersized) cap overflows."""
    from hymet_tpu.ops.sketch import _count_impl, pref_cap_sized

    rng = np.random.default_rng(31)
    F, n = 32768, 300000
    db = np.unique(rng.integers(0, 1 << 44, F * 2, dtype=np.uint64))[:F]
    q = rng.integers(0, 1 << 64, n, dtype=np.uint64)
    q[:3000] = rng.choice(db, 3000)
    valid = rng.random(n) > 0.1
    sp = lambda x: (
        jnp.asarray((x >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray((x & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
    )
    dh, dl = sp(db)
    qh, ql = sp(q)
    z = jnp.zeros(db.shape[0], jnp.int32)
    v = jnp.asarray(valid)
    ref = _count_impl(dh, dl, z, qh, ql, v, use_eqmm=False, use_prefilter=False)
    survival = (float(db.max()) + 1.0) / 2.0**64
    sized = pref_cap_sized(n, survival)
    got = _count_impl(dh, dl, z, qh, ql, v, use_prefilter=True, pref_cap=sized)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    # undersized cap (< ~3000+ survivors per the planted matches):
    # overflow branch -> exact full-stream fallback
    got2 = _count_impl(dh, dl, z, qh, ql, v, use_prefilter=True, pref_cap=2048)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got2))


def test_update_codes_packed_matches_unpacked(db, genomes):
    """The 2-bit packed upload path (update_codes_packed) must yield
    byte-identical screen state to the plain uint8 path."""
    from hymet_tpu.io.fasta import encode_seq

    seq = genomes["gA"] + b"NNNN" + genomes["gB"][:5000]
    codes = encode_seq(seq)[None, :]
    a = ScreenEngine(db)
    a.update_codes(jnp.asarray(codes))
    b = ScreenEngine(db)
    b.update_codes_packed(codes)
    np.testing.assert_array_equal(np.asarray(a.counts), np.asarray(b.counts))
    assert a.total_query_kmers == b.total_query_kmers
    ra, rb = a.finalize(), b.finalize()
    np.testing.assert_array_equal(ra.identity, rb.identity)


def test_pvalue_total_vs_distinct_decision_boundary():
    """Pin the envelope of the total-vs-distinct k-mer approximation in
    ScreenResult.pvalues (ops/sketch.py): Mash estimates r_null from the
    number of DISTINCT query k-mers, we use the total valid-window count.
    Total >= distinct makes our p-values monotonically conservative
    (larger), so the only possible effect on the ``mash screen -v 0.9``
    filter (scripts/mash.sh:14) is dropping a borderline row, never
    keeping a spurious one — and at k=21 a flip requires >1e10 total query
    k-mers (a >10 Gbp sample), far above any single screen's stream.
    """
    from hymet_tpu.ops.sketch import binom_sf

    k, s = 21, 1000
    kspace = 4.0**k

    def pval(shared, n_kmers):
        r = 1.0 / (1.0 + kspace / max(n_kmers, 1))
        return binom_sf(shared, s, r)

    # conservative direction: p is monotone nondecreasing in the k-mer count
    for shared in (1, 2, 5, 10, 100):
        assert pval(shared, 10**9) >= pval(shared, 10**8) >= pval(shared, 10**6)

    # worst realistic case: a full 4 Gbp sample where nearly all k-mers are
    # repeats (total=4e9, distinct=1e3) — the -v 0.9 decision agrees for
    # every possible shared count (shared=1 is the extreme; p decreases
    # with shared)
    total, distinct = 4_000_000_000, 1_000
    assert pval(1, total) <= 0.9 and pval(1, distinct) <= 0.9
    for shared in (1, 2, 5, 50, s):
        assert (pval(shared, total) <= 0.9) == (pval(shared, distinct) <= 0.9)

    # the flip region exists only beyond ~1e10 total k-mers at k=21:
    # document the boundary so any future k/s change re-derives it
    assert pval(1, 11_000_000_000) > 0.9
    assert pval(1, 5_000_000_000) <= 0.9
