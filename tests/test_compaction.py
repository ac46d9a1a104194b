"""Unit tests for ops/compaction.py — the sort-free slot compaction
shared by the aligner's anchor expansion and the screen prefilter."""

import jax.numpy as jnp
import numpy as np
import pytest

from hymet_tpu.ops.compaction import slot_compact_indices


def _oracle(occ: np.ndarray, cap: int):
    """Row-major dense enumeration of (row, item) pairs."""
    pairs = [(n, j) for n, c in enumerate(occ) for j in range(int(c))]
    return pairs[:cap], len(pairs)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("max_occ", [1, 4, 17])
def test_slot_compact_matches_enumeration(seed, max_occ):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(3, 4000))
    occ = rng.integers(0, max_occ + 1, n).astype(np.int32)
    # sprinkle long zero runs (dropped rows collapse onto one base)
    occ[rng.random(n) < 0.6] = 0
    cap = int(rng.integers(1, max(2, int(occ.sum()) * 2)))
    n_i, j_i, total = slot_compact_indices(jnp.asarray(occ), cap)
    pairs, n_items = _oracle(occ, cap)
    assert int(total) == n_items
    got = list(zip(np.asarray(n_i).tolist(), np.asarray(j_i).tolist()))
    assert got[: len(pairs)] == pairs


@pytest.mark.parametrize(
    "occ,cap",
    [
        ([0, 0, 0], 4),  # nothing kept
        ([3], 2),  # overflow: total > cap
        ([0, 2, 0, 0, 1], 8),  # trailing/leading zero runs
        ([1] * 5, 5),  # exact fit
    ],
)
def test_slot_compact_edges(occ, cap):
    occ = np.asarray(occ, np.int32)
    n_i, j_i, total = slot_compact_indices(jnp.asarray(occ), cap)
    pairs, n_items = _oracle(occ, cap)
    assert int(total) == n_items
    got = list(zip(np.asarray(n_i).tolist(), np.asarray(j_i).tolist()))
    assert got[: len(pairs)] == pairs


def test_slot_compact_methods_agree():
    """scatter+cummax inversion vs per-slot binary search: identical
    (n_i, j_i) on every VALID slot for adversarial occ patterns (empty
    head/tail runs, max-occ bursts, overflow)."""
    import numpy as np

    from hymet_tpu.ops.compaction import slot_compact_indices

    rng = np.random.default_rng(5)
    cases = [
        np.array([0, 0, 3, 0, 1, 0, 0, 5, 2, 0], np.int32),
        np.zeros(16, np.int32),
        np.full(7, 4, np.int32),
        rng.integers(0, 6, size=500).astype(np.int32) * (rng.random(500) < 0.3),
    ]
    for occ in cases:
        total = int(occ.sum())
        for cap in (1, 4, max(total, 1), total + 7):
            a = slot_compact_indices(jnp.asarray(occ), cap, method="bsearch")
            b = slot_compact_indices(jnp.asarray(occ), cap, method="scatter")
            n_valid = min(total, cap)
            assert int(a[2]) == int(b[2]) == total
            np.testing.assert_array_equal(
                np.asarray(a[0][:n_valid]), np.asarray(b[0][:n_valid])
            )
            np.testing.assert_array_equal(
                np.asarray(a[1][:n_valid]), np.asarray(b[1][:n_valid])
            )


def test_searchsorted_right_blocked_matches_flat():
    import numpy as np

    from hymet_tpu.ops.compaction import searchsorted_right, searchsorted_right_blocked

    rng = np.random.default_rng(11)
    for n in (3, 512, 513, 5000, 4096 * 3 + 17):
        arr = np.sort(rng.integers(0, 1000, size=n)).astype(np.int32)
        q = rng.integers(-5, 1005, size=700).astype(np.int32)
        a = np.asarray(searchsorted_right(jnp.asarray(arr), jnp.asarray(q)))
        b = np.asarray(searchsorted_right_blocked(jnp.asarray(arr), jnp.asarray(q)))
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, np.searchsorted(arr, q, "right"))
