"""Probe: bound the sharded engines' single-chip overhead (VERDICT r5 #6).

The sharded screen/align paths are correctness-proven on the 8-device CPU
mesh, but nothing measured what the shard_map formulation COSTS on the
real chip. With ONE real device the only valid mesh is 1x1 — exactly the
overhead question: same math, same shapes, shard_map + collectives wrapped
around it. This runs the bench world's screen and align legs through the
single-device engines and the 1x1-mesh sharded engines and prints a
side-by-side table (compile excluded; best-of groups).

Run under the r5a queue: timeout 5400 python validation/probe_sharded_overhead.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench  # noqa: E402


def _best(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    jax = bench._init_jax()
    w = bench._build_world()

    from hymet_tpu.io.fasta import encode_seq, read_fasta
    from hymet_tpu.io.minimizer_index import MinimizerIndex
    from hymet_tpu.io.sketchdb import load_sketch_db
    from hymet_tpu.models.aligner import MinimizerAligner
    from hymet_tpu.ops.sketch import ScreenEngine
    from hymet_tpu.parallel import ShardedScreenEngine, make_mesh
    from hymet_tpu.parallel.align import ShardedMinimizerAligner

    qnames, qseqs = read_fasta(w["sample"])
    results = {}

    # ---- screen: single vs 1x1 sharded --------------------------------
    db = load_sketch_db(w["sketch_dbs"][0])
    L = max(len(s) for s in qseqs)
    codes = np.full((64, L), 4, dtype=np.uint8)
    for i in range(64):
        c = encode_seq(qseqs[i % len(qseqs)])
        codes[i, : c.shape[0]] = c

    import jax.numpy as jnp

    codes_j = jnp.asarray(codes)
    jax.block_until_ready(codes_j)

    # engines constructed ONCE, outside the timed region: the serving
    # pattern stages DB tables once and streams samples through — timing
    # construction would charge the sharded engine its one-time staging
    # on every call (the first cut of this probe did exactly that and
    # reported a bogus +420% screen overhead)
    single_eng = ScreenEngine(db)

    def single_screen():
        single_eng.update_codes(codes_j)
        r = single_eng.finalize()
        jax.block_until_ready((r.shared,) if hasattr(r.shared, "device") else ())
        return r

    t0 = time.time()
    ref = single_screen()
    print(f"[probe] screen single compile+run {time.time() - t0:.1f}s", flush=True)
    results["screen_single_s"] = _best(single_screen)

    mesh = make_mesh(data=1, db=1)
    sharded_eng = ShardedScreenEngine(mesh, db)

    def sharded_screen():
        sharded_eng.update_codes(codes)
        return sharded_eng.finalize()

    t0 = time.time()
    got = sharded_screen()
    print(f"[probe] screen sharded(1x1) compile+run {time.time() - t0:.1f}s", flush=True)
    np.testing.assert_array_equal(np.asarray(got.shared), np.asarray(ref.shared))
    results["screen_sharded_s"] = _best(sharded_screen)

    # ---- align: single vs 1x1 sharded ---------------------------------
    cache_root = os.path.join(w["world"], "cache")
    idxs = []
    for root, _, files in os.walk(cache_root):
        idxs += [os.path.join(root, f) for f in files if f.startswith("reference_minidx")]
    assert idxs, f"no cached index under {cache_root} — run the e2e stage first"
    index = MinimizerIndex.load(idxs[0])
    # modest query subset: overhead ratio needs stable, not huge, legs
    sub = sorted(range(len(qseqs)), key=lambda i: len(qseqs[i]))[:256]
    sn = [qnames[i] for i in sub]
    ss = [qseqs[i] for i in sub]

    single_aln = MinimizerAligner(index)
    t0 = time.time()
    recs1 = single_aln.map_batch(sn, ss)
    print(f"[probe] align single compile+run {time.time() - t0:.1f}s "
          f"({len(recs1)} records)", flush=True)
    results["align_single_s"] = _best(lambda: single_aln.map_batch(sn, ss))

    sharded_aln = ShardedMinimizerAligner(mesh, index)
    t0 = time.time()
    recs2 = sharded_aln.map_batch(sn, ss)
    print(f"[probe] align sharded(1x1) compile+run {time.time() - t0:.1f}s "
          f"({len(recs2)} records)", flush=True)
    key = lambda r: (r.qname, r.tname, r.qstart, r.qend, r.nmatch)  # noqa: E731
    assert {key(r) for r in recs1} == {key(r) for r in recs2}, "record mismatch"
    results["align_sharded_s"] = _best(lambda: sharded_aln.map_batch(sn, ss))

    print("\n[probe] single-chip sharded overhead (best-of-3, compile excluded):")
    for leg in ("screen", "align"):
        s, sh = results[f"{leg}_single_s"], results[f"{leg}_sharded_s"]
        print(
            f"  {leg:7s} single {s:7.3f}s  sharded(1x1) {sh:7.3f}s  "
            f"overhead {100.0 * (sh - s) / s:+.1f}%",
            flush=True,
        )


if __name__ == "__main__":
    main()
