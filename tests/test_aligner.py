"""Minimizer aligner tests: extraction host/device equivalence and
seed-chain mapping behavior (exact / mutated / revcomp / indel / absent)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hymet_tpu.io.fasta import encode_seq
from hymet_tpu.io.minimizer_index import MinimizerIndex
from hymet_tpu.models.aligner import AlignerConfig, MinimizerAligner
from hymet_tpu.ops.minimizer import (
    extract_minimizers_jax,
    extract_minimizers_numpy,
    hash64_numpy,
)

_ACGT = np.frombuffer(b"ACGT", dtype=np.uint8)


def _rand_seq(rng, n):
    return rng.choice(_ACGT, size=n).astype(np.uint8).tobytes()


def _mutate(rng, seq, rate):
    arr = np.frombuffer(seq, dtype=np.uint8).copy()
    idx = rng.random(len(arr)) < rate
    arr[idx] = rng.choice(_ACGT, size=int(idx.sum())).astype(np.uint8)
    return arr.tobytes()


_RC = dict(zip(b"ACGT", b"TGCA"))


def _revcomp(seq):
    return bytes(_RC[c] for c in reversed(seq))


def test_hash64_invertible_range():
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 1 << 38, size=1000).astype(np.uint64)
    h = hash64_numpy(keys, 38)
    assert (h < (1 << 38)).all()
    # mixer should be injective on a sample
    assert len(np.unique(h)) == len(np.unique(keys))


def test_extraction_jax_matches_numpy():
    rng = np.random.default_rng(1)
    seq = _rand_seq(rng, 3000)
    codes = encode_seq(seq)
    h_np, p_np, s_np = extract_minimizers_numpy(codes, 19, 19)

    m_hi, m_lo, m_pos, m_strand, m_keep = extract_minimizers_jax(
        jnp.asarray(codes[None, :]), 19, 19
    )
    keep = np.asarray(m_keep[0])
    pos = np.asarray(m_pos[0])[keep]
    hi = np.asarray(m_hi[0])[keep].astype(np.uint64)
    lo = np.asarray(m_lo[0])[keep].astype(np.uint64)
    h_jax = (hi << np.uint64(32)) | lo
    np.testing.assert_array_equal(pos, p_np)
    np.testing.assert_array_equal(h_jax, h_np)
    np.testing.assert_array_equal(np.asarray(m_strand[0])[keep], s_np.astype(np.int32))


def test_extraction_density():
    # expected minimizer density ~ 2/(w+1)
    rng = np.random.default_rng(2)
    codes = encode_seq(_rand_seq(rng, 100000))
    h, p, s = extract_minimizers_numpy(codes, 19, 19)
    density = len(p) / len(codes)
    assert 0.07 < density < 0.13  # 2/20 = 0.1


@pytest.fixture(scope="module")
def ref_index():
    rng = np.random.default_rng(42)
    genomes = [
        ("chrA", _rand_seq(rng, 60000)),
        ("chrB", _rand_seq(rng, 40000)),
        ("chrC", _rand_seq(rng, 30000)),
    ]
    idx = MinimizerIndex.build(genomes)
    return idx, dict(genomes)


def test_map_exact_slice(ref_index):
    idx, genomes = ref_index
    aln = MinimizerAligner(idx)
    q = genomes["chrB"][5000:15000]
    recs = aln.map_batch(["q1"], [q])
    assert recs, "no mapping found"
    r = recs[0]
    assert r.tname == "chrB"
    assert r.strand == "+"
    assert r.tags["tp"] == "A:P"
    # extents should cover nearly the whole slice
    assert r.blocklen > 9500
    assert abs(r.tstart - 5000) < 100 and abs(r.tend - 15000) < 100
    assert r.coverage > 0.95
    assert r.mapq == 60


def test_map_revcomp(ref_index):
    idx, genomes = ref_index
    aln = MinimizerAligner(idx)
    q = _revcomp(genomes["chrA"][20000:30000])
    recs = aln.map_batch(["q1"], [q])
    assert recs
    r = recs[0]
    assert r.tname == "chrA" and r.strand == "-"
    assert abs(r.tstart - 20000) < 100 and abs(r.tend - 30000) < 100
    assert r.blocklen > 9500


def test_map_mutated(ref_index):
    idx, genomes = ref_index
    rng = np.random.default_rng(7)
    aln = MinimizerAligner(idx)
    q = _mutate(rng, genomes["chrC"][2000:12000], 0.05)  # asm10 regime
    recs = aln.map_batch(["q1"], [q])
    assert recs
    r = recs[0]
    assert r.tname == "chrC"
    assert r.blocklen > 8000


def test_map_with_deletion(ref_index):
    idx, genomes = ref_index
    aln = MinimizerAligner(idx)
    src = genomes["chrB"][5000:20000]
    q = src[:7000] + src[7800:]  # 800 bp deletion: crosses one band step
    recs = aln.map_batch(["q1"], [q])
    assert recs
    r = recs[0]
    assert r.tname == "chrB"
    # single merged chain spanning the deletion
    assert r.blocklen > 14000


def test_map_absent_genome(ref_index):
    idx, _ = ref_index
    rng = np.random.default_rng(9)
    aln = MinimizerAligner(idx)
    recs = aln.map_batch(["q1"], [_rand_seq(rng, 8000)])
    assert recs == []


def test_map_multiple_queries_order(ref_index):
    idx, genomes = ref_index
    aln = MinimizerAligner(idx)
    recs = aln.map_batch(
        ["a", "b", "c"],
        [genomes["chrA"][:5000], genomes["chrC"][1000:7000], genomes["chrB"][:4000]],
    )
    # grouped per query in input order
    qnames = [r.qname for r in recs]
    assert qnames == sorted(qnames, key=["a", "b", "c"].index)
    by_q = {r.qname: r.tname for r in recs if r.tags["tp"] == "A:P"}
    assert by_q == {"a": "chrA", "b": "chrC", "c": "chrB"}


def test_index_save_load_shard(tmp_path, ref_index):
    idx, _ = ref_index
    p = str(tmp_path / "idx.npz")
    idx.save(p)
    idx2 = MinimizerIndex.load(p)
    assert idx2.names == idx.names
    np.testing.assert_array_equal(idx2.hashes, idx.hashes)

    shards = idx.shard(2)
    assert sum(s.n_minimizers for s in shards) == idx.n_minimizers
    # shard-local mapping still finds the right target
    aln = MinimizerAligner(shards[0])
    assert shards[0].names[0] == "chrA"


def test_short_query_no_crash(ref_index):
    idx, genomes = ref_index
    aln = MinimizerAligner(idx)
    assert aln.map_batch(["tiny"], [b"ACGTACGT"]) == []


def _indel_sweep(rng, seq, n_indels, max_len):
    """Scatter insertions/deletions of 1..max_len bases through seq."""
    arr = bytearray(seq)
    positions = sorted(rng.integers(100, len(arr) - 100, n_indels), reverse=True)
    for pos in positions:
        ln = int(rng.integers(1, max_len + 1))
        if rng.random() < 0.5:
            del arr[pos : pos + ln]
        else:
            ins = rng.choice(_ACGT, size=ln).astype(np.uint8).tobytes()
            arr[pos:pos] = ins
    return bytes(arr)


@pytest.mark.parametrize("n_indels,max_len", [(20, 5), (8, 50)])
def test_map_indel_sweep(ref_index, n_indels, max_len):
    """Scattered small/medium indels (realistic assembly divergence) must
    not break chaining: the query still maps to its source with most of
    its length covered."""
    idx, genomes = ref_index
    rng = np.random.default_rng(100 + n_indels)
    aln = MinimizerAligner(idx)
    src = genomes["chrA"][10000:25000]
    q = _indel_sweep(rng, _mutate(rng, src, 0.02), n_indels, max_len)
    recs = aln.map_batch(["q1"], [q])
    assert recs
    best = max(recs, key=lambda r: r.blocklen)
    assert best.tname == "chrA"
    assert best.blocklen > len(q) * 0.6, best.blocklen


def test_map_chimeric_contig(ref_index):
    """A chimera of two genomes must produce primary mappings to BOTH
    sources (minimap2 reports split primaries for disjoint query spans)."""
    idx, genomes = ref_index
    aln = MinimizerAligner(idx)
    q = genomes["chrB"][1000:9000] + genomes["chrC"][5000:13000]
    recs = aln.map_batch(["q1"], [q])
    prim = {r.tname: r for r in recs if r.tags["tp"] == "A:P"}
    assert set(prim) == {"chrB", "chrC"}, sorted(
        (r.tname, r.tags["tp"], r.blocklen) for r in recs
    )
    # each half maps within its own query span
    b, c = prim["chrB"], prim["chrC"]
    assert b.qend <= 9000 + 200 and c.qstart >= 8000 - 200
    assert b.blocklen > 7000 and c.blocklen > 7000


# ---------------------------------------------------------------------
# device chain segmentation vs host reduceat/band-merge equivalence


def _build_panel_index(rng, n_refs=6, glen=9000, k=19, w=19):
    from hymet_tpu.io.minimizer_index import MinimizerIndex

    genomes = [(f"r{i}", _rand_seq(rng, glen)) for i in range(n_refs)]
    return genomes, MinimizerIndex.build(genomes, k=k, w=w)


def test_device_chains_match_host_chains(monkeypatch):
    """The fused device segmentation (scatter-compacted anchors +
    associative-scan chains) must emit the same PAF records as the legacy
    host reduceat/band-merge path across mutation/revcomp/chimera/indel
    query shapes."""
    rng = np.random.default_rng(404)
    genomes, index = _build_panel_index(rng)
    gmap = dict(genomes)

    queries = [
        ("exact", gmap["r0"]),
        ("mut5", _mutate(rng, gmap["r1"], 0.05)),
        ("rc", _revcomp(gmap["r2"][:5000])),
        ("chimera", gmap["r3"][:4000] + gmap["r4"][2000:6000]),
        (
            "indel",
            gmap["r5"][:3000] + gmap["r5"][3300:7000],
        ),
        ("absent", _rand_seq(rng, 6000)),
        ("short", gmap["r0"][100:700]),
    ]
    names = [q[0] for q in queries]
    seqs = [q[1] for q in queries]

    aln = MinimizerAligner(index, AlignerConfig(batch_pad=1 << 13))
    monkeypatch.setenv("HYMET_HOST_CHAINS", "1")
    host_recs = aln.map_batch(names, seqs)
    monkeypatch.setenv("HYMET_HOST_CHAINS", "0")
    dev_recs = aln.map_batch(names, seqs)
    assert host_recs, "panel produced no records — test setup broken"
    assert dev_recs == host_recs
    # the two slot-compaction formulations (destination-map binary search
    # vs grid argsort) emit valid slots in the same row-major order, so
    # their records must be byte-identical too
    monkeypatch.setenv("HYMET_SLOT_BSEARCH", "0")
    sort_recs = aln.map_batch(names, seqs)
    assert sort_recs == dev_recs
    # ... and so does the sort-free minimizer compaction (pad slots
    # differ between the two paths but are masked everywhere downstream)
    monkeypatch.setenv("HYMET_SLOT_BSEARCH", "1")
    monkeypatch.setenv("HYMET_MIN_BSEARCH", "1")
    minb_recs = aln.map_batch(names, seqs)
    assert minb_recs == dev_recs
    # ... and the flat-band single-key anchor sort (same global band
    # boundaries rebased per (seq, strand) block, stable either way)
    monkeypatch.delenv("HYMET_MIN_BSEARCH", raising=False)
    monkeypatch.setenv("HYMET_FLAT_BAND", "1")
    # every padded length this batch actually uses must fit the flat
    # space, or map_batch silently falls back to the 2-key sort and the
    # parity assert below passes vacuously
    pads = {-(-len(s) // (1 << 13)) * (1 << 13) for s in seqs}
    assert all(aln._fb_tables(p) is not None for p in pads), pads
    flat_recs = aln.map_batch(names, seqs)
    assert flat_recs == dev_recs
    # ... and the scatter+cumsum value fill (no [acap]-row qmeta gather;
    # monotonic qmeta repack + wrap-delta cumsum reconstruct every slot,
    # valid or pad, byte-identically)
    monkeypatch.delenv("HYMET_FLAT_BAND", raising=False)
    monkeypatch.setenv("HYMET_SLOT_FILL", "1")
    fill_recs = aln.map_batch(names, seqs)
    assert fill_recs == dev_recs
    # ... and the lax.scan-chunked chain reduce (block small enough to
    # split this panel's acap into many blocks; `block` is a static jit
    # arg, so this genuinely retraces the scanned program)
    monkeypatch.setenv("HYMET_CHAIN_BLOCK", "1024")
    blk_recs = aln.map_batch(names, seqs)
    assert blk_recs == dev_recs


def test_occ_budget_keep_threshold_semantics():
    """The adaptive occurrence threshold keeps the LARGEST t whose total
    anchor count fits the budget, floored at t=1 (numpy reference)."""
    from hymet_tpu.models.aligner import _occ_budget_keep

    rng = np.random.default_rng(55)
    occ = rng.integers(0, 20, 4000).astype(np.int32)
    max_occ = 16
    keep = (occ > 0) & (occ <= max_occ)
    for budget in (50, 500, 2000, 10_000, 10_000_000):
        got = np.asarray(
            _occ_budget_keep(jnp.asarray(keep), jnp.asarray(occ), max_occ, budget)
        )
        # numpy reference: anchors at threshold t = sum of kept occ <= t
        best_t = 1
        for t in range(1, max_occ + 1):
            if int(occ[keep & (occ <= t)].sum()) <= budget:
                best_t = t
        want = keep & (occ <= best_t)
        np.testing.assert_array_equal(got, want), budget
        assert got.sum() <= keep.sum()


def test_occ_budget_paths_agree(monkeypatch):
    """With the occurrence budget active, the device-chain and host-chain
    paths must stay byte-identical (same threshold from the same kept
    minimizer stream), a generous budget must reproduce the unbudgeted
    records exactly, and a tight budget must still map the panel's
    queries to their true sources."""
    rng = np.random.default_rng(405)
    genomes, index = _build_panel_index(rng)
    gmap = dict(genomes)
    names = ["exact", "mut", "rc"]
    seqs = [
        gmap["r0"],
        _mutate(rng, gmap["r1"], 0.05),
        _revcomp(gmap["r2"][:5000]),
    ]
    aln = MinimizerAligner(index, AlignerConfig(batch_pad=1 << 13))
    monkeypatch.delenv("HYMET_OCC_BUDGET", raising=False)
    base_recs = aln.map_batch(names, seqs)
    assert base_recs

    # a generous budget never trips the threshold below max_occ
    monkeypatch.setenv("HYMET_OCC_BUDGET", "64.0")
    assert aln.map_batch(names, seqs) == base_recs

    # a tight budget: host- and device-chain paths agree byte-for-byte,
    # and the primaries still land on the true sources
    monkeypatch.setenv("HYMET_OCC_BUDGET", "1.5")
    dev_recs = aln.map_batch(names, seqs)
    monkeypatch.setenv("HYMET_HOST_CHAINS", "1")
    host_recs = aln.map_batch(names, seqs)
    monkeypatch.delenv("HYMET_HOST_CHAINS", raising=False)
    assert dev_recs == host_recs
    prim = {r.qname: r.tname for r in dev_recs if r.tags["tp"] == "A:P"}
    assert prim == {"exact": "r0", "mut": "r1", "rc": "r2"}, prim


def test_chain_core_blocked_matches_unblocked():
    """The lax.scan-chunked segmented scans (HYMET_CHAIN_BLOCK) must
    reproduce the full-width associative_scan/cummax chain rows
    bit-for-bit — including when the anchor count is NOT a multiple of
    the block (internal sentinel padding) and across the carried
    open-segment state at every block boundary."""
    from hymet_tpu.models.aligner import (
        _KEY_BIG,
        _chain_reduce_sorted,
        _chain_reduce_sorted_flat,
    )

    rng = np.random.default_rng(77)
    for A, n_valid, block in ((4096, 3900, 512), (3000, 2641, 512), (2048, 2048, 1024)):
        # sorted (k1, k2) anchor keys with long runs so chains span blocks
        k1 = np.sort(rng.integers(0, 40, n_valid)).astype(np.uint32) << 26
        k2 = rng.integers(0, 3, n_valid).astype(np.uint32) << 24
        k2 |= np.minimum(
            np.sort(rng.integers(0, 6, n_valid)).astype(np.uint32), 0xFFFFFF
        )
        order = np.lexsort((k2, k1))
        k1, k2 = k1[order], k2[order]
        pad = A - n_valid
        k1 = np.concatenate([k1, np.full(pad, _KEY_BIG, np.uint32)])
        k2 = np.concatenate([k2, np.full(pad, _KEY_BIG, np.uint32)])
        s_p = rng.integers(0, 1 << 20, A).astype(np.uint32)
        s_r = rng.integers(0, 1 << 20, A).astype(np.uint32)

        ref_rows, ref_n = _chain_reduce_sorted(
            jnp.asarray(k1), jnp.asarray(k2), jnp.asarray(s_p),
            jnp.asarray(s_r), 19, 2, 30, 256, block=0,
        )
        blk_rows, blk_n = _chain_reduce_sorted(
            jnp.asarray(k1), jnp.asarray(k2), jnp.asarray(s_p),
            jnp.asarray(s_r), 19, 2, 30, 256, block=block,
        )
        n = int(ref_n)
        assert int(blk_n) == n and n > 0, (A, block, n)
        np.testing.assert_array_equal(
            np.asarray(blk_rows[:n]), np.asarray(ref_rows[:n])
        )

        # flat-band single-key layout rides the same core
        key = np.where(
            k1 == _KEY_BIG, _KEY_BIG, k1 | (k2 & np.uint32(0x3FFFFFF))
        ).astype(np.uint32)
        key = np.sort(key)
        fb_dec = jnp.asarray(np.array([0], np.int32))
        ref_rows, ref_n = _chain_reduce_sorted_flat(
            jnp.asarray(key), jnp.asarray(s_p), jnp.asarray(s_r), fb_dec,
            19, 2, 30, 256, block=0,
        )
        blk_rows, blk_n = _chain_reduce_sorted_flat(
            jnp.asarray(key), jnp.asarray(s_p), jnp.asarray(s_r), fb_dec,
            19, 2, 30, 256, block=block,
        )
        n = int(ref_n)
        assert int(blk_n) == n and n > 0, (A, block, n)
        np.testing.assert_array_equal(
            np.asarray(blk_rows[:n]), np.asarray(ref_rows[:n])
        )


def test_pipelined_dispatch_many_groups(monkeypatch):
    """map_batch dispatches device programs several groups ahead of the
    fetch (the pending-dict pipeline). With more groups than the
    lookahead, per-query records must still land on the right queries in
    input order on both chain paths."""
    rng = np.random.default_rng(406)
    genomes, index = _build_panel_index(rng)
    gmap = dict(genomes)
    # many distinct lengths -> many pad groups (batch_pad quantum 2^10)
    names, seqs = [], []
    for j in range(12):
        src = gmap[f"r{j % 6}"]
        ln = 1500 + 600 * j
        names.append(f"q{j}")
        seqs.append(src[: min(ln, len(src))])
    aln = MinimizerAligner(index, AlignerConfig(batch_pad=1 << 10))
    for flag in ("1", "0"):
        monkeypatch.setenv("HYMET_HOST_CHAINS", flag)
        recs = aln.map_batch(names, seqs)
        primaries = {
            r.qname: r.tname for r in recs if r.tags.get("tp") == "A:P"
        }
        for j in range(12):
            assert primaries.get(f"q{j}") == f"r{j % 6}", (flag, j, primaries.get(f"q{j}"))


def test_minimizer_window_vanherk_oracle():
    """van Herk window-min must match the unrolled O(n*w) reference
    bit-for-bit, including leftmost tie-breaks (forced by low-entropy
    values) and _BAD-padded tails."""
    import jax.numpy as jnp

    from hymet_tpu.ops.minimizer import (
        _window_min_pairs,
        _window_min_pairs_unrolled,
    )

    rng = np.random.default_rng(12)
    for w in (2, 5, 19, 23):
        for n in (w, w + 1, 4 * w - 3, 257):
            B = 3
            # low-entropy: many exact ties across windows
            hi = rng.integers(0, 4, size=(B, n)).astype(np.uint32)
            lo = rng.integers(0, 3, size=(B, n)).astype(np.uint32)
            # sprinkle BAD sentinels like invalid k-mers do
            bad = rng.random((B, n)) < 0.1
            hi[bad] = 0xFFFFFFFF
            lo[bad] = 0xFFFFFFFF
            idx = np.broadcast_to(np.arange(n, dtype=np.int32), (B, n)).copy()
            got = _window_min_pairs(
                jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(idx), w
            )
            want = _window_min_pairs_unrolled(
                jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(idx), w
            )
            for g, x in zip(got, want):
                np.testing.assert_array_equal(
                    np.asarray(g), np.asarray(x), err_msg=f"w={w} n={n}"
                )


def test_packed_upload_matches_unpacked_device_path(monkeypatch):
    """The device-chain path ships batches 2-bit packed (pack_code_batch
    -> in-program unpack). Feeding _chains_for_batch the staged packed
    tuple, the raw numpy batch (packs internally), and a device uint8
    array (no packing) must all yield identical chains — pinning the
    pack/unpack roundtrip inside the real aligner program, including the
    code-4 padded tail."""
    import jax.numpy as jnp

    from hymet_tpu.io.fasta import pack_code_batch
    from hymet_tpu.models.aligner import AlignerConfig, MinimizerAligner

    rng = np.random.default_rng(405)
    genomes, index = _build_panel_index(rng)
    gmap = dict(genomes)
    monkeypatch.setenv("HYMET_HOST_CHAINS", "0")
    aln = MinimizerAligner(index, AlignerConfig(batch_pad=1 << 13))
    pad = 1 << 13
    batch = np.full((4, pad), 4, dtype=np.uint8)
    for row, q in enumerate(
        [
            gmap["r0"][:7000],
            _mutate(rng, gmap["r1"], 0.05)[:8000],
            _revcomp(gmap["r2"][:5000]),
            gmap["r3"][:4000] + gmap["r4"][2000:6000],
        ]
    ):
        codes = encode_seq(q)
        batch[row, : codes.shape[0]] = codes

    packed, mask, L = pack_code_batch(batch)
    via_tuple = aln._chains_for_batch(
        (jnp.asarray(packed), jnp.asarray(mask), batch.shape[0], L)
    )
    via_numpy = aln._chains_for_batch(batch)
    via_device = aln._chains_for_batch(jnp.asarray(batch))
    assert via_tuple, "no chains produced — test setup broken"
    assert via_numpy == via_tuple
    assert via_device == via_tuple


def test_anchor_overflow_retries_with_sticky_boost(monkeypatch):
    """A highly repetitive index (every minimizer occurring ~16 times)
    overflows the default anchor cap; the device-chain path must retry
    with a doubled cap, keep the boost sticky for later batches, and
    still emit records identical to the host path."""
    rng = np.random.default_rng(407)
    unit = _rand_seq(rng, 50_000)
    genomes = [(f"copy{i}", unit) for i in range(16)]
    from hymet_tpu.io.minimizer_index import MinimizerIndex

    index = MinimizerIndex.build(genomes, k=19, w=19)
    query = [("q0", unit[1000:45_000])]
    names = [q[0] for q in query]
    seqs = [q[1] for q in query]

    monkeypatch.setenv("HYMET_HOST_CHAINS", "0")
    aln = MinimizerAligner(index)
    dev_recs = aln.map_batch(names, seqs)
    assert aln._acap_boost > 1, "expected the anchor cap to overflow"
    # a second batch must not re-overflow (sticky boost)
    boost = aln._acap_boost
    dev_recs2 = aln.map_batch(names, seqs)
    assert aln._acap_boost == boost
    assert dev_recs2 == dev_recs

    monkeypatch.setenv("HYMET_HOST_CHAINS", "1")
    host_recs = aln.map_batch(names, seqs)
    assert host_recs == dev_recs
    # every copy is hit full-length
    assert len({r.tname for r in dev_recs}) == 16


def test_pad_query_len_buckets():
    """Linear 64k buckets up to 128k, then pow2 — bounded program count."""
    from hymet_tpu.models.aligner import pad_query_len

    q = 1 << 16
    assert pad_query_len(1, q) == q
    assert pad_query_len(q, q) == q
    assert pad_query_len(q + 1, q) == 2 * q
    assert pad_query_len(2 * q + 1, q) == 4 * q  # geometric past 2 quanta
    assert pad_query_len(700_000, q) == 1 << 20
    assert pad_query_len(1 << 20, q) == 1 << 20


def test_split_matches_monolith_reduce():
    """The two-program align split (per-bucket collect + chain reduce
    compiled once at pow2-padded (acap, ccap), commit 313c2c1) must emit
    chain rows byte-identical to the monolithic composition at EXACT
    caps: the pow2 padding appends _KEY_BIG sentinel anchors, which the
    segmentation already treats as the sorted tail. Caps are chosen
    non-pow2 so the padding actually engages."""
    from hymet_tpu.models.aligner import (
        _extract_chains_fused,
        _extract_chains_impl,
        build_search_tables,
    )

    rng = np.random.default_rng(407)
    genomes, index = _build_panel_index(rng)
    gmap = dict(genomes)
    pad = 1 << 13
    queries = [
        gmap["r0"],
        _mutate(rng, gmap["r1"], 0.04),
        gmap["r2"][:4000] + gmap["r3"][2000:6000],
    ]
    aln = MinimizerAligner(index, AlignerConfig(batch_pad=pad))
    from hymet_tpu.models.aligner import build_group_batch, plan_query_groups

    groups, fixed_rows = plan_query_groups(
        [len(s) for s in queries], pad, index.k + index.w
    )
    batch = build_group_batch(queries, groups[0], pad, index.k + index.w, fixed_rows)
    B, L = batch.shape
    NW, cap = aln._minimizer_cap(B, L)
    acap, ccap = aln._device_caps(B, NW, cap)
    # force non-pow2 caps (the 4096 quantum makes these non-pow2 already
    # for most worlds; assert so the pad path is actually exercised)
    if acap == 1 << (acap.bit_length() - 1):
        acap = acap * 3 // 2
    assert acap != 1 << (acap.bit_length() - 1)
    common = dict(
        bkt2=aln._bkt2,
        bkt_bits=aln._bkt_bits,
        bkt_steps=aln._bkt_steps,
    )
    args = (
        aln._idx_hl, aln._idx_roff2, aln._idx_ps, jnp.asarray(batch),
        index.k, index.w, aln.cfg.max_occ, aln.cfg.band_bits,
        cap, acap, ccap, aln.cfg.min_cnt, aln.cfg.min_mlen,
    )
    chains_s, n_s, kept_s, anch_s = _extract_chains_fused(*args, **common)
    chains_m, n_m, kept_m, anch_m = _extract_chains_impl(*args, **common)
    n_s, n_m = int(n_s), int(n_m)
    assert (n_s, int(kept_s), int(anch_s)) == (n_m, int(kept_m), int(anch_m))
    assert n_s > 0, "world produced no chains — setup broken"
    np.testing.assert_array_equal(
        np.asarray(chains_s[:n_s]), np.asarray(chains_m[:n_m])
    )


def test_compile_service_failure_falls_back_to_host_chains(monkeypatch):
    """A remote-compile-service failure (round 4: the tunnel's compile
    helper OOM-SIGKILLs the largest pad bucket's chain-reduce) must not
    crash map_batch: the affected bucket falls back to the byte-identical
    host-chain path, sticky per shape, and keeps producing the same
    records."""
    from hymet_tpu.models import aligner as A

    rng = np.random.default_rng(408)
    genomes, index = _build_panel_index(rng)
    gmap = dict(genomes)
    names = ["a", "b"]
    seqs = [gmap["r0"], _mutate(rng, gmap["r1"], 0.03)]

    ref = MinimizerAligner(index, AlignerConfig(batch_pad=1 << 13))
    want = ref.map_batch(names, seqs)
    assert want

    import tempfile, os as _os

    marker = _os.path.join(tempfile.mkdtemp(), "dev_broken.json")
    monkeypatch.setattr(A, "_DEV_BROKEN_PATH", marker)
    aln = MinimizerAligner(index, AlignerConfig(batch_pad=1 << 13))
    real = A.MinimizerAligner._dispatch_fused
    calls = {"n": 0}

    def boom(self, *a, **kw):
        calls["n"] += 1
        raise RuntimeError(
            "INTERNAL: http://127.0.0.1:8093/remote_compile: HTTP 500: "
            "tpu_compile_helper subprocess exit signal SIGKILL (9)"
        )

    monkeypatch.setattr(A.MinimizerAligner, "_dispatch_fused", boom)
    got = aln.map_batch(names, seqs)
    assert got == want
    assert aln._dev_broken, "failure was not recorded"
    # sticky: the second map over the same shapes never re-tries the
    # broken device program
    n_after_first = calls["n"]
    assert aln.map_batch(names, seqs) == want
    assert calls["n"] == n_after_first
    # a NON-service error (our bug) must re-raise, not silently fall back
    def trace_bug(self, *a, **kw):
        raise TypeError("bad static arg")

    # the reset escape hatch ignores the marker file, so this fresh
    # aligner actually dispatches — and a non-service error re-raises
    monkeypatch.setenv("HYMET_RESET_DEV_BROKEN", "1")
    aln2 = MinimizerAligner(index, AlignerConfig(batch_pad=1 << 13))
    assert aln2._dev_broken == set()
    monkeypatch.setattr(A.MinimizerAligner, "_dispatch_fused", trace_bug)
    with pytest.raises(TypeError):
        aln2.map_batch(names, seqs)
    monkeypatch.setattr(A.MinimizerAligner, "_dispatch_fused", real)
    monkeypatch.delenv("HYMET_RESET_DEV_BROKEN")
    # the broken buckets persisted: a FRESH aligner (fresh process stand-
    # in) seeds from the marker file and goes straight to host chains
    assert _os.path.exists(marker)
    aln3 = MinimizerAligner(index, AlignerConfig(batch_pad=1 << 13))
    assert aln3._dev_broken == aln._dev_broken
    assert aln3.map_batch(names, seqs) == want


def test_pad_mid_buckets_same_records(monkeypatch):
    """HYMET_PAD_MID=1 (3*2^k midpoint pad buckets) must not change any
    mapping output — padding is shape-only. Query lengths straddle the
    pow2-vs-midpoint boundary (pad 16384 vs 12288 at quantum 4096)."""
    rng = np.random.default_rng(11)
    genomes = [("ref%d" % i, _rand_seq(rng, 30000)) for i in range(3)]
    idx = MinimizerIndex.build(genomes)
    queries = []
    for i, ln in enumerate((2900, 5200, 9000, 11000, 13000)):
        src = genomes[i % 3][1]
        queries.append(("q%d" % i, _mutate(rng, src[200 : 200 + ln], 0.02)))
    names = [n for n, _ in queries]
    seqs = [s for _, s in queries]

    cfg = AlignerConfig(batch_pad=4096)
    monkeypatch.setenv("HYMET_PAD_MID", "0")
    rec0 = MinimizerAligner(idx, cfg).map_batch(names, seqs)
    monkeypatch.setenv("HYMET_PAD_MID", "1")
    rec1 = MinimizerAligner(idx, cfg).map_batch(names, seqs)

    from hymet_tpu.models.aligner import pad_query_len
    assert pad_query_len(9000, 4096) == 12288  # midpoint engaged (default)
    assert pad_query_len(13000, 4096) == 16384  # midpoint too small, pow2
    monkeypatch.setenv("HYMET_PAD_MID", "0")
    assert pad_query_len(9000, 4096) == 16384

    as_tuples = lambda rs: [  # noqa: E731
        (r.qname, r.tname, r.qstart, r.qend, r.tstart, r.tend, r.nmatch,
         r.blocklen, r.strand) for r in rs
    ]
    assert as_tuples(rec0) == as_tuples(rec1)


def test_row_pow2_partial_groups_same_records(monkeypatch):
    """HYMET_ROW_POW2=1 (pow2 row counts for partial trailing groups)
    must not change mapping output — row padding is shape-only. 70
    same-pad queries => one full 64-row group + a 6-query partial that
    pads to 16 rows instead of 64."""
    rng = np.random.default_rng(23)
    genomes = [("r%d" % i, _rand_seq(rng, 24000)) for i in range(3)]
    idx = MinimizerIndex.build(genomes)
    names, seqs = [], []
    for i in range(70):
        src = genomes[i % 3][1]
        names.append("q%d" % i)
        seqs.append(_mutate(rng, src[100 : 100 + 3500], 0.02))

    from hymet_tpu.models.aligner import group_rows
    cfg = AlignerConfig(batch_pad=4096)
    monkeypatch.setenv("HYMET_ROW_POW2", "0")
    assert group_rows(6, True) == 64
    rec0 = MinimizerAligner(idx, cfg).map_batch(names, seqs)
    monkeypatch.setenv("HYMET_ROW_POW2", "1")
    assert group_rows(6, True) == 16  # the default
    assert group_rows(64, True) == 64
    assert group_rows(33, True) == 64
    rec1 = MinimizerAligner(idx, cfg).map_batch(names, seqs)

    as_tuples = lambda rs: [  # noqa: E731
        (r.qname, r.tname, r.qstart, r.qend, r.tstart, r.tend, r.nmatch,
         r.blocklen, r.strand) for r in rs
    ]
    assert as_tuples(rec0) == as_tuples(rec1)
