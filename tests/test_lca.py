"""Weighted-LCA tests: JAX kernel vs reference-exact host oracle, on
synthetic cases and on the real in-repo Zymo PAF
(reference case/truth/zymo_mc/zymo_mc_vs_refs.paf)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hymet_tpu import RANKS
from hymet_tpu.io.paf import parse_paf_for_classification
from hymet_tpu.models.weighted_lca import (
    classify_query_map,
    load_hierarchy_vectors,
)
from hymet_tpu.ops.lca import weighted_lca, weighted_lca_host
from hymet_tpu.taxonomy.idmap import IdentifierMap

REF = "/root/reference"
ZYMO_PAF = os.path.join(REF, "case/truth/zymo_mc/zymo_mc_vs_refs.paf")
SEQID2TAXID = os.path.join(REF, "case/truth/zymo_refs/seqid2taxid.tsv")


def _hier_from_db(db, taxids):
    return {tid: db.rank_names_vector(tid) for tid in taxids}


def test_single_query_consensus(mini_taxdb):
    # two species in same genus: genus-level consensus, species split
    hier = _hier_from_db(mini_taxdb, ["562", "28901"])
    tw = {"562": 3.0, "28901": 1.0}
    lineage, level, conf = weighted_lca_host(tw, hier)
    assert level == "species"
    assert "species:Escherichia coli" in lineage
    # family rank and above unanimous; genus rank: both Enterobacteriaceae
    # genus differs (Escherichia vs Salmonella): conf *= 3/4 at genus and species
    assert conf == pytest.approx((3 / 4) * (3 / 4))


def test_break_at_first_empty_rank(mini_taxdb):
    # genus-level taxid has no species name; deeper ranks ignored
    hier = _hier_from_db(mini_taxdb, ["561"])
    lineage, level, conf = weighted_lca_host({"561": 1.0}, hier)
    assert level == "genus"
    assert conf == 1.0


def test_unknown_when_no_weights(mini_taxdb):
    assert weighted_lca_host({}, {}) == ("Unknown", "root", 0.0)
    assert weighted_lca_host({"562": 0.0}, _hier_from_db(mini_taxdb, ["562"])) == (
        "Unknown",
        "root",
        0.0,
    )


def test_tie_break_first_seen(mini_taxdb):
    # equal weights: first-inserted taxid's names win
    hier = _hier_from_db(mini_taxdb, ["28901", "562"])
    lineage, level, conf = weighted_lca_host({"28901": 1.0, "562": 1.0}, hier)
    assert "species:Salmonella enterica" in lineage

    lineage2, _, _ = weighted_lca_host({"562": 1.0, "28901": 1.0}, hier)
    assert "species:Escherichia coli" in lineage2


def _run_kernel(entries, hier_vectors):
    """entries: list per query of (taxid, weight); hier_vectors: taxid->vec."""
    taxids = []
    rowmap = {}
    names = [""]
    intern = {"": 0}
    table = []
    for tw in entries:
        for tid, _ in tw:
            if tid in rowmap:
                continue
            rowmap[tid] = len(taxids)
            taxids.append(tid)
            vec = hier_vectors.get(tid, [""] * len(RANKS))
            row = []
            for nm in vec:
                if nm and nm not in intern:
                    intern[nm] = len(names)
                    names.append(nm)
                row.append(intern.get(nm, 0))
            table.append(row)
    H = max((len(e) for e in entries), default=1) or 1
    rows = np.full((len(entries), H), -1, dtype=np.int32)
    ws = np.zeros((len(entries), H), dtype=np.float64)
    for i, tw in enumerate(entries):
        for j, (tid, w) in enumerate(tw):
            rows[i, j] = rowmap[tid]
            ws[i, j] = w
    chosen, n_chosen, conf = weighted_lca(
        jnp.asarray(rows),
        jnp.asarray(ws, dtype=jnp.float64),
        jnp.asarray(np.asarray(table, dtype=np.int32)),
        dtype=jnp.float64,
    )
    return np.asarray(chosen), np.asarray(n_chosen), np.asarray(conf), names


# x64-ON (default lane): the kernel runs f64 and matches the host oracle
# bit-exactly. x64-OFF (production TPU regime, HYMET_TEST_X64=0): the
# requested f64 truncates to f32, so confidence agrees only to f32 eps —
# lineage/level assertions stay exact in both regimes.
_CONF_TOL = (
    dict(rel=0, abs=0) if jax.config.jax_enable_x64 else dict(rel=2e-6, abs=2e-6)
)


def test_kernel_matches_oracle_synthetic(mini_taxdb):
    hier = _hier_from_db(
        mini_taxdb, ["562", "28901", "1423", "1280", "561", "511145", "4932"]
    )
    cases = [
        [("562", 3.0), ("28901", 1.0)],
        [("28901", 1.0), ("562", 1.0)],  # tie → first seen
        [("561", 2.0)],  # stops at genus
        [("511145", 1.0)],  # full 8-rank path
        [("562", 1.0), ("4932", 1.0)],  # cross-superkingdom tie
        [("1423", 0.5), ("1280", 0.5), ("562", 0.25)],
        [("999999", 1.0)],  # unresolvable taxid → Unknown
    ]
    chosen, n_chosen, conf, names = _run_kernel(cases, hier)
    for i, tw_list in enumerate(cases):
        tw = {}
        for tid, w in tw_list:
            tw[tid] = tw.get(tid, 0.0) + w
        lineage, level, c = weighted_lca_host(tw, hier)
        n = int(n_chosen[i])
        if lineage == "Unknown":
            assert n == 0
            assert conf[i] == 0.0
            continue
        got = "; ".join(f"{RANKS[r]}:{names[int(chosen[i, r])]}" for r in range(n))
        assert got == lineage, f"case {i}"
        assert RANKS[n - 1] == level
        assert conf[i] == pytest.approx(c, **_CONF_TOL)


def test_kernel_random_fuzz_vs_oracle(mini_taxdb):
    rng = np.random.default_rng(7)
    all_tids = ["562", "28901", "1423", "1280", "561", "511145", "4932", "287", "1613"]
    hier = _hier_from_db(mini_taxdb, all_tids)
    cases = []
    for _ in range(200):
        k = rng.integers(1, 6)
        tids = rng.choice(len(all_tids), size=k, replace=False)
        cases.append(
            [(all_tids[t], float(rng.integers(1, 100)) / 8.0) for t in tids]
        )
    chosen, n_chosen, conf, names = _run_kernel(cases, hier)
    for i, tw_list in enumerate(cases):
        tw = {}
        for tid, w in tw_list:
            tw[tid] = tw.get(tid, 0.0) + w
        lineage, level, c = weighted_lca_host(tw, hier)
        n = int(n_chosen[i])
        got = (
            "; ".join(f"{RANKS[r]}:{names[int(chosen[i, r])]}" for r in range(n))
            if n
            else "Unknown"
        )
        assert got == lineage, f"case {i}"
        assert conf[i] == pytest.approx(c, **_CONF_TOL)


@pytest.mark.skipif(not os.path.exists(ZYMO_PAF), reason="reference data absent")
def test_zymo_paf_jax_vs_host(mini_taxdb):
    """End-to-end on the real Zymo PAF (2.9k alignments, 1044 contigs):
    JAX backend must agree with the reference-exact host oracle on every
    row, including 4dp confidence."""
    idmap = IdentifierMap.from_seqid2taxid(SEQID2TAXID)
    query_map, ref_counts = parse_paf_for_classification(ZYMO_PAF)
    used = {
        tid
        for hits in query_map.values()
        for tname, _ in hits
        if (tid := idmap.lookup(tname))
    }
    hier = _hier_from_db(mini_taxdb, sorted(used))

    res_host = classify_query_map(query_map, ref_counts, idmap, hier, backend="host")
    res_jax = classify_query_map(query_map, ref_counts, idmap, hier, backend="jax")
    assert len(res_host) == len(res_jax) > 500
    n_classified = 0
    for (q1, l1, lv1, c1), (q2, l2, lv2, c2) in zip(res_host, res_jax):
        assert q1 == q2
        assert l1 == l2, q1
        assert lv1 == lv2
        assert f"{c1:.4f}" == f"{c2:.4f}", (q1, c1, c2)
        if l1 != "Unknown":
            n_classified += 1
    assert n_classified > 500


def test_bucket_pad_overflow_fails_loudly():
    """A query with more LCA entries than the largest bucket must raise,
    not silently truncate its weights (round-4 review, weak #6); the
    pipeline asserts max_secondary+1 against the same ceiling."""
    import pytest

    from hymet_tpu.models.aligner import AlignerConfig
    from hymet_tpu.ops.lca import LCA_MAX_BUCKET, bucket_pad

    ok = [[(0, 1.0)] * LCA_MAX_BUCKET]
    assert bucket_pad(ok)  # at the ceiling: fine
    too_many = [[(0, 1.0)] * (LCA_MAX_BUCKET + 1)]
    with pytest.raises(ValueError, match="largest bucket"):
        bucket_pad(too_many)
    # the shipped aligner cap stays under the ceiling
    assert AlignerConfig().max_secondary + 1 <= LCA_MAX_BUCKET
