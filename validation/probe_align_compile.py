"""Probe: compile the fused device-chain align program FIRST in a fresh
process, on the EXACT shapes the e2e pipeline uses (cached 25-candidate
index + the real 1010-contig sample), and time it.

Three e2e attempts (queues r3d/r3f + an interactive run) all hung at
this compile when it followed the screen stage's dispatch storm, while
BENCH_MODE=align (which compiles the align program first, against the
24-genome panel index) sails through. This distinguishes:

- compiles fine here -> the stall is order-dependent (compile service
  wedged by prior dispatch traffic); the fix is prewarming align before
  screen (bench warm child), and this probe itself seeds the persistent
  XLA cache with the real e2e shapes;
- hangs here too -> the e2e candidate-index shapes trigger a
  pathological XLA:TPU compile independent of order.

Run under timeout:
  timeout 2700 python validation/probe_align_compile.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    t_all = time.time()
    bench._init_jax()
    w = bench._build_world()
    cache_root = os.path.join(w["world"], "cache")
    # the e2e cache key for this world (stable: sha1 of selected genomes)
    key_dirs = [
        d
        for d in os.listdir(cache_root)
        if os.path.isdir(os.path.join(cache_root, d))
    ]
    assert key_dirs, f"no cached reference under {cache_root} — run e2e once first"
    idx_path = os.path.join(cache_root, key_dirs[0], "reference_minidx_k19w19.npz")
    assert os.path.exists(idx_path), idx_path

    from hymet_tpu.io.fasta import read_fasta
    from hymet_tpu.io.minimizer_index import MinimizerIndex
    from hymet_tpu.models.aligner import AlignerConfig, MinimizerAligner

    t0 = time.time()
    index = MinimizerIndex.load(idx_path)
    print(f"[probe] index load {time.time() - t0:.1f}s "
          f"({index.n_minimizers:,} minimizers)", flush=True)

    t0 = time.time()
    aligner = MinimizerAligner(index, AlignerConfig(batch_pad=1 << 16))
    print(f"[probe] device stage {time.time() - t0:.1f}s", flush=True)

    qnames, qseqs = read_fasta(w["sample"])
    limit = int(os.environ.get("PROBE_QUERIES", "0"))
    if limit:
        order = sorted(range(len(qseqs)), key=lambda i: len(qseqs[i]))[:limit]
        qnames = [qnames[i] for i in order]
        qseqs = [qseqs[i] for i in order]
    print(f"[probe] {len(qnames)} queries; mapping (compile happens on "
          f"first batch)...", flush=True)
    t0 = time.time()
    records = aligner.map_batch(qnames, qseqs)
    print(f"[probe] map_batch {time.time() - t0:.1f}s, {len(records)} records; "
          f"total {time.time() - t_all:.1f}s", flush=True)


if __name__ == "__main__":
    main()
