"""Native C++ kernel parity tests (skipped when the lib can't build)."""

import numpy as np
import pytest

from hymet_tpu.io import native_io

pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="native library not built"
)


def test_encode_parity():
    from hymet_tpu.io.fasta import encode_seq

    seq = b"ACGTNacgtnXYZ#" * 500
    np.testing.assert_array_equal(native_io.encode_seq(seq), encode_seq(seq))


@pytest.mark.parametrize("k", [15, 21, 31])
def test_kmer_hash_parity(k):
    from hymet_tpu.ops.hashing import kmer_hashes_numpy

    rng = np.random.default_rng(k)
    codes = rng.integers(0, 4, size=50000).astype(np.uint8)
    codes[rng.integers(0, 50000, 50)] = 4
    np.testing.assert_array_equal(
        native_io.kmer_hashes(codes, k), kmer_hashes_numpy(codes, k)
    )


@pytest.mark.parametrize("k,w", [(19, 19), (15, 10), (21, 11)])
def test_minimizer_parity(k, w):
    from hymet_tpu.ops.minimizer import extract_minimizers_numpy

    rng = np.random.default_rng(k * w)
    codes = rng.integers(0, 4, size=30000).astype(np.uint8)
    codes[rng.integers(0, 30000, 30)] = 4
    h1, p1, s1 = extract_minimizers_numpy(codes, k, w)
    h2, p2, s2 = native_io.minimizers(codes, k, w)
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(h1, h2)
    np.testing.assert_array_equal(s1, s2)


def test_edge_cases():
    assert native_io.kmer_hashes(np.zeros(5, dtype=np.uint8), 21).size == 0
    h, p, s = native_io.minimizers(np.zeros(10, dtype=np.uint8), 19, 19)
    assert h.size == 0
    # all-invalid sequence
    codes = np.full(1000, 4, dtype=np.uint8)
    assert native_io.kmer_hashes(codes, 21).size == 0
    h, p, s = native_io.minimizers(codes, 19, 19)
    assert h.size == 0
