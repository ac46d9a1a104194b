"""Mash .msh Cap'n Proto codec tests.

No mash binary or capnp tooling exists in this environment, so validation
is three-legged:

1. a byte-level golden fixture built BY HAND in this file (independent of
   the writer) asserting the exact wire layout the reader expects —
   stream framing, struct/list/far pointers, field placements;
2. writer->reader round-trips (including through SketchDB);
3. screen-equivalence: a DB imported from .msh screens identically to the
   natively-built DB it mirrors.
"""

import struct

import numpy as np
import pytest

from hymet_tpu.io.msh import (
    MshFormatError,
    read_msh,
    sketchdb_from_msh,
    write_msh,
)
from hymet_tpu.io.sketchdb import SketchDB, build_sketch_db_from_sequences

_ACGT = np.frombuffer(b"ACGT", dtype=np.uint8)


def _rand_seq(rng, n):
    return rng.choice(_ACGT, size=n).astype(np.uint8).tobytes()


# ---------------------------------------------------------------------
# 1. hand-built golden fixture (independent of the writer)


def _hand_built_msh() -> bytes:
    """One reference ('refA', comment 'cA', length 1234, hashes64
    [5, 7, 11]), k=21, sketch size 3, seed 42, alphabet ACGT — laid out
    word by word per the Cap'n Proto spec."""
    words = []

    def w(v):
        words.append(v & 0xFFFFFFFFFFFFFFFF)

    def struct_ptr(rel, dw, pw):
        return ((rel & ((1 << 30) - 1)) << 2) | (dw << 32) | (pw << 48)

    def list_ptr(rel, esz, cnt):
        return 1 | ((rel & ((1 << 30) - 1)) << 2) | (esz << 32) | (cnt << 35)

    # word 0: root pointer -> struct at word 1 (3 data, 4 ptrs)
    w(struct_ptr(0, 3, 4))
    # words 1-3: MinHash data
    w(21)  # kmerSize=21, windowSize=0
    w(3 | (1 << 33))  # minHashesPerWindow=3, noncanonical=True
    err = struct.unpack("<I", struct.pack("<f", 0.05))[0]
    w(err | (42 << 32))  # error=0.05, hashSeed=42
    # words 4-7: MinHash pointers [alphabet, refListOld, refList, locusList]
    w(list_ptr(3, 2, 5))  # alphabet at word 8: "ACGT\0" (5 bytes)
    w(0)
    w(struct_ptr(2, 0, 1))  # referenceList struct at word 9 (rel 9-(6+1)=2)
    w(0)
    # word 8: "ACGT\0"
    w(struct.unpack("<Q", b"ACGT\x00\x00\x00\x00")[0])
    # word 9: ReferenceList.references pointer -> composite list at word 10
    # one Reference: 2 data words + 7 ptr words = 9; content = tag + 9
    w(list_ptr(0, 7, 10))
    # word 10: composite tag: count=1, dw=2, pw=7
    w(struct_ptr(1, 2, 7))
    # words 11-12: Reference data: length=1234 | counts32Sorted bit32; length64
    w(1234 | (1 << 32))
    w(1234)
    # words 13-19: Reference ptrs [sequence, quality, name, comment,
    #                              hashes64, hashes32, counts32]
    w(0)
    w(0)
    w(list_ptr(4, 2, 5))  # name at word 20 ("refA\0")
    w(list_ptr(4, 2, 3))  # comment at word 21 ("cA\0")
    w(list_ptr(4, 5, 3))  # hashes64 at words 22-24
    w(0)
    w(0)
    # word 20: "refA\0"
    w(struct.unpack("<Q", b"refA\x00\x00\x00\x00")[0])
    # word 21: "cA\0"
    w(struct.unpack("<Q", b"cA\x00\x00\x00\x00\x00\x00")[0])
    # words 22-24: hashes 5, 7, 11
    w(5)
    w(7)
    w(11)

    body = b"".join(struct.pack("<Q", x) for x in words)
    return struct.pack("<II", 0, len(words)) + body


def test_read_hand_built_fixture(tmp_path):
    p = tmp_path / "golden.msh"
    p.write_bytes(_hand_built_msh())
    m = read_msh(str(p))
    assert m.kmer_size == 21
    assert m.min_hashes_per_window == 3
    assert m.hash_seed == 42
    assert m.noncanonical is True
    assert m.error == pytest.approx(0.05)
    assert m.alphabet == "ACGT"
    assert m.names == ["refA"]
    assert m.comments == ["cA"]
    assert m.lengths == [1234]
    assert m.hashes[0].tolist() == [5, 7, 11]


def test_multisegment_far_pointer(tmp_path):
    """Real mash files span segments; the root may sit behind a far
    pointer. Build a 2-segment message: segment 0 holds only a far
    pointer to the content in segment 1."""
    base = _hand_built_msh()
    n_words = struct.unpack_from("<I", base, 4)[0]
    seg1 = base[8:]
    # segment 0: one far pointer (tag 2, pad=one word, offset 0, seg 1)
    far = 2 | (0 << 2) | (0 << 3) | (1 << 32)
    header = struct.pack("<III", 1, 1, n_words) + b"\x00" * 4  # pad to 8B
    data = header + struct.pack("<Q", far) + seg1
    p = tmp_path / "far.msh"
    p.write_bytes(data)
    m = read_msh(str(p))
    assert m.kmer_size == 21 and m.names == ["refA"]


def test_reject_garbage(tmp_path):
    p = tmp_path / "bad.msh"
    p.write_bytes(b"\xff" * 64)
    with pytest.raises(MshFormatError):
        read_msh(str(p))


# ---------------------------------------------------------------------
# 2. writer -> reader round trip


def test_write_read_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    names = ["g1.fna", "g2.fna", "empty"]
    hashes = [
        np.sort(rng.integers(0, 1 << 63, size=100).astype(np.uint64)),
        np.sort(rng.integers(0, 1 << 63, size=57).astype(np.uint64)),
        np.zeros(0, dtype=np.uint64),
    ]
    p = tmp_path / "rt.msh"
    write_msh(
        str(p),
        kmer_size=21,
        min_hashes_per_window=100,
        names=names,
        hashes=hashes,
        comments=["a", "b", ""],
        lengths=[10, 20, 0],
    )
    m = read_msh(str(p))
    assert m.kmer_size == 21
    assert m.min_hashes_per_window == 100
    assert m.names == names
    assert m.comments == ["a", "b", ""]
    assert m.lengths == [10, 20, 0]
    for got, want in zip(m.hashes, hashes):
        np.testing.assert_array_equal(got, want)


def test_roundtrip_32bit_hashes(tmp_path):
    """k <= 16 sketches store hashes32."""
    p = tmp_path / "h32.msh"
    write_msh(
        str(p),
        kmer_size=15,
        min_hashes_per_window=4,
        names=["r"],
        hashes=[np.array([3, 9, 2**31], dtype=np.uint64)],
    )
    m = read_msh(str(p))
    assert m.kmer_size == 15
    assert m.hashes[0].tolist() == [3, 9, 2**31]


# ---------------------------------------------------------------------
# 3. SketchDB bridge + screen equivalence


def test_sketchdb_msh_roundtrip_screens_identically(tmp_path):
    from hymet_tpu.pipeline.screen_stage import screen_queries

    rng = np.random.default_rng(17)
    genomes = {f"g{i}": _rand_seq(rng, 7000) for i in range(5)}
    db = build_sketch_db_from_sequences(
        list(genomes.items()), k=21, sketch_size=150
    )
    p = tmp_path / "db.msh"
    db.to_msh(str(p))
    db2 = SketchDB.from_msh(str(p))
    assert db2.k == db.k and db2.names == db.names
    np.testing.assert_array_equal(db2.n_hashes, db.n_hashes)

    qf = tmp_path / "q.fna"
    qf.write_text(">c\n" + genomes["g2"].decode() + "\n")
    rows1 = screen_queries(db, [str(qf)])
    rows2 = screen_queries(db2, [str(qf)])
    assert rows1 == rows2
