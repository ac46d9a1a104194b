"""Pallas kernel tests (interpret mode on CPU; compiled path is exercised
on real TPU by bench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hymet_tpu.ops.hashing import kmer_hashes_jax, pack64
from hymet_tpu.ops.pallas_kernels import TILE, kmer_hashes_pallas


@pytest.mark.parametrize("L", [1000, TILE + 20, 3 * TILE + 7])
def test_pallas_hash_parity_interpret(L):
    rng = np.random.default_rng(L)
    codes = rng.integers(0, 4, size=(2, L), dtype=np.uint8)
    codes[0, L // 3] = 4  # invalid base
    hi, lo, valid = kmer_hashes_pallas(jnp.asarray(codes), 21, interpret=True)
    hi2, lo2, valid2 = kmer_hashes_jax(jnp.asarray(codes), 21)
    n = L - 20
    v1 = np.asarray(valid)[:, :n]
    np.testing.assert_array_equal(v1, np.asarray(valid2))
    h1 = pack64(np.asarray(hi)[:, :n], np.asarray(lo)[:, :n])
    h2 = pack64(np.asarray(hi2), np.asarray(lo2))
    np.testing.assert_array_equal(h1[v1], h2[np.asarray(valid2)])
    # padding tail is invalid
    assert not np.asarray(valid)[:, n:].any()


def test_pallas_short_sequence_raises():
    with pytest.raises(ValueError):
        kmer_hashes_pallas(jnp.zeros((1, 10), dtype=jnp.uint8), 21, interpret=True)
