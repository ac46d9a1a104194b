"""MurmurHash3_x64_128 validation.

- SMHasher verification procedure: hash keys {0..len-1 bytes} of lengths
  0..255 with seed (256-len), concatenate digests, hash with seed 0; the
  first 32 bits must equal 0x6384BA69 (the published SMHasher verification
  constant for MurmurHash3_x64_128). Passing this pins the implementation
  to the canonical algorithm — which is what Mash links against.
- Cross-implementation agreement: pure-Python vs numpy-uint64 vs JAX
  uint32-limb kernel on random inputs and on real k-mer windows.
"""

import numpy as np
import pytest

from hymet_tpu.ops.hashing import (
    canonical_kmer_bytes,
    kmer_hashes_jax,
    kmer_hashes_numpy,
    murmur3_rows_jax,
    murmur3_x64_128_numpy,
    murmur3_x64_128_py,
    pack64,
)


def test_smhasher_verification():
    digests = bytearray()
    for length in range(256):
        key = bytes(range(length))
        h1, h2 = murmur3_x64_128_py(key, seed=256 - length)
        digests += h1.to_bytes(8, "little") + h2.to_bytes(8, "little")
    final1, _ = murmur3_x64_128_py(bytes(digests), seed=0)
    verification = final1 & 0xFFFFFFFF
    assert verification == 0x6384BA69


@pytest.mark.parametrize("length", [5, 8, 15, 16, 17, 21, 24, 31, 32, 48])
def test_numpy_matches_python(length):
    rng = np.random.default_rng(length)
    rows = rng.integers(0, 256, size=(64, length), dtype=np.uint8)
    got = murmur3_x64_128_numpy(rows)
    for i in range(rows.shape[0]):
        h1, _ = murmur3_x64_128_py(rows[i].tobytes())
        assert int(got[i]) == h1


@pytest.mark.parametrize("length", [5, 15, 16, 17, 21, 31, 32])
def test_jax_limb_matches_numpy(length):
    import jax.numpy as jnp

    rng = np.random.default_rng(100 + length)
    rows = rng.integers(0, 256, size=(128, length), dtype=np.uint8)
    want = murmur3_x64_128_numpy(rows)
    hi, lo = murmur3_rows_jax(jnp.asarray(rows), length)
    got = pack64(np.asarray(hi), np.asarray(lo))
    np.testing.assert_array_equal(got, want)


def test_canonical_kmer_rule():
    # ACGTT: revcomp = AACGT < ACGTT -> canonical is AACGT
    codes = np.array([0, 1, 2, 3, 3], dtype=np.uint8)
    rows, valid = canonical_kmer_bytes(codes, 5)
    assert valid.all()
    assert rows[0].tobytes() == b"AACGT"
    # palindrome-ish: ACGT revcomp == ACGT
    codes = np.array([0, 1, 2, 3], dtype=np.uint8)
    rows, _ = canonical_kmer_bytes(codes, 4)
    assert rows[0].tobytes() == b"ACGT"


def test_invalid_base_masking():
    codes = np.array([0, 1, 4, 3, 0, 1, 2, 3], dtype=np.uint8)  # N at pos 2
    rows, valid = canonical_kmer_bytes(codes, 4)
    assert valid.tolist() == [False, False, False, True, True]
    hashes = kmer_hashes_numpy(codes, 4)
    assert hashes.shape[0] == 2  # only the 2 valid windows


def test_jax_kmer_pipeline_matches_numpy():
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    k = 21
    seqs = rng.integers(0, 4, size=(4, 100), dtype=np.uint8)
    seqs[0, 10] = 4  # inject an invalid base
    hi, lo, valid = kmer_hashes_jax(jnp.asarray(seqs), k)
    got = pack64(np.asarray(hi), np.asarray(lo))
    valid = np.asarray(valid)
    for b in range(seqs.shape[0]):
        want = kmer_hashes_numpy(seqs[b], k)
        np.testing.assert_array_equal(got[b][valid[b]], want)
