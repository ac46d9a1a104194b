"""Probe: isolate the sketch screen's stage-1 cost on the real chip.

sketch_stages (queue r3f) attributes 0.033 s of the 0.048 s per-8.4 Mbp
prefilter batch to the "hash" stage (unpack + Pallas k-mer hash +
checksum), ~6x slower than the ~1.5 Gbp/s the kernel was once measured
at. This probe times each leg separately with multi-dispatch groups
(amortizing tunnel RTT), on both the default [64, 128 Ki] batch and a
4x-rows variant, plus the pure-jnp hash for reference.

Run: timeout 1800 python validation/probe_sketch_hash.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench  # noqa: E402  (reuses _init_jax / device handling)


def main() -> None:
    jax = bench._init_jax()
    import jax.numpy as jnp

    from hymet_tpu.harness.timing import best_run, timed_groups
    from hymet_tpu.io.fasta import pack_code_batch
    from hymet_tpu.ops.hashing import kmer_hashes_jax, unpack_code_batch_jax
    from hymet_tpu.ops.pallas_kernels import kmer_hashes_pallas

    k = 21
    smoke = os.environ.get("PROBE_SMOKE") == "1"  # CPU/interpret dry run
    L = 8192 if smoke else 131072
    # 256 rows exercises the kernel's row-tiling (the single-block form
    # OOM'd scoped vmem at 52.83M > 16M, r4c; kmer_hashes_pallas now
    # grids rows at 64) — restored for the VPU op-rate attribution cell
    row_list = (8,) if smoke else (64, 256)
    rng = np.random.default_rng(0)
    on_tpu = jax.default_backend() == "tpu"

    def cksum3(hi, lo, valid):
        return (
            jnp.sum(hi, dtype=jnp.uint32)
            + jnp.sum(lo, dtype=jnp.uint32)
            + jnp.sum(valid.astype(jnp.uint32), dtype=jnp.uint32)
        )

    @jax.jit
    def hash_only(codes):
        return cksum3(*kmer_hashes_pallas(codes, k, interpret=not on_tpu))

    @jax.jit
    def hash_jnp(codes):
        return cksum3(*kmer_hashes_jax(codes, k))

    @jax.jit
    def unpack_only(packed, mask):
        codes = unpack_code_batch_jax(packed, mask, L)
        return jnp.sum(codes, dtype=jnp.uint32)

    @jax.jit
    def unpack_hash(packed, mask):
        codes = unpack_code_batch_jax(packed, mask, L)
        return cksum3(*kmer_hashes_pallas(codes, k, interpret=not on_tpu))

    def measure(name, fn, args, bp, n_disp=8):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        compile_s = time.time() - t0

        def group():
            out = None
            for _ in range(n_disp):
                out = fn(*args)
            jax.block_until_ready(out)

        runs = timed_groups(group, min_runs=4, max_runs=8, budget_s=60.0)
        best, _ = best_run(runs)
        per = best / n_disp
        print(
            f"[probe] {name:24s} compile {compile_s:6.1f}s  "
            f"{per * 1e3:8.2f} ms/call  {bp / per / 1e9:7.3f} Gbp/s",
            flush=True,
        )
        return per

    for rows in row_list:
        bp = rows * L
        codes_np = rng.integers(0, 4, size=(rows, L), dtype=np.uint8)
        packed_np, mask_np, _ = pack_code_batch(codes_np)
        codes = jnp.asarray(codes_np)
        packed, mask = jnp.asarray(packed_np), jnp.asarray(mask_np)
        jax.block_until_ready((codes, packed, mask))
        print(f"== rows={rows} L={L} ({bp / 1e6:.1f} Mbp/call) ==", flush=True)
        measure("pallas hash", hash_only, (codes,), bp)
        measure("unpack", unpack_only, (packed, mask), bp)
        measure("unpack+pallas hash", unpack_hash, (packed, mask), bp)
        if rows == row_list[0] and not smoke:
            measure("jnp hash (no pallas)", hash_jnp, (codes,), bp)
            # compiled-vs-XLA diff on the REAL backend (valid-masked sums
            # must agree exactly; guards Mosaic lane-roll miscompiles)
            ph, plo, pv = kmer_hashes_pallas(codes, k, interpret=not on_tpu)
            jh, jlo, jv = kmer_hashes_jax(codes, k)
            nw = jh.shape[1]
            a = int(jnp.sum(jnp.where(pv[:, :nw], ph[:, :nw], 0), dtype=jnp.uint32))
            b = int(jnp.sum(jnp.where(jv, jh, 0), dtype=jnp.uint32))
            c = int(jnp.sum(jnp.where(pv[:, :nw], plo[:, :nw], 0), dtype=jnp.uint32))
            d = int(jnp.sum(jnp.where(jv, jlo, 0), dtype=jnp.uint32))
            ok = a == b and c == d and bool(jnp.array_equal(pv[:, :nw], jv))
            print(f"[probe] pallas-vs-jnp exactness: {'MATCH' if ok else 'MISMATCH'}",
                  flush=True)
            if not ok:
                raise SystemExit("pallas kernel diverges from jnp on this backend")

    # round-1-style shape (8 x 1 Mbp — the config behind the historical
    # "pallas hash alone sustains ~1.5 Gbp/s" note): shape-dependence check
    if not smoke:
        rows1, L1 = 8, 1 << 20
        codes1 = jnp.asarray(rng.integers(0, 4, size=(rows1, L1), dtype=np.uint8))
        jax.block_until_ready(codes1)
        print(f"== rows={rows1} L={L1} ({rows1 * L1 / 1e6:.1f} Mbp/call) ==",
              flush=True)
        measure("pallas hash", hash_only, (codes1,), rows1 * L1)

    # compaction-leg costs (the +13-16 ms sketch_stages marginal):
    # cumsum over the full stream, then slot_compact_indices at the
    # current cap (n>>9 = 16384) vs a survivor-sized cap (4096)
    from hymet_tpu.ops.compaction import slot_compact_indices

    n = row_list[0] * L
    surv_np = (rng.random(n) < 2.5e-4).astype(np.int32)
    surv = jnp.asarray(surv_np)
    jax.block_until_ready(surv)
    print(f"== compaction (n={n / 1e6:.1f}M, {surv_np.sum()} survivors) ==",
          flush=True)
    measure("cumsum", jax.jit(lambda s: jnp.cumsum(s)[-1]), (surv,), n)
    for cap in ((256,) if smoke else (16384, 4096)):
        fn = jax.jit(
            lambda s, cap=cap: sum(
                x.sum(dtype=jnp.int32) if x.ndim else x
                for x in slot_compact_indices(s, cap)
            )
        )
        measure(f"slot_compact cap={cap}", fn, (surv,), n)

    # VPU op-rate microbench: is uint32 multiply the murmur bottleneck?
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ITERS = 16 if smoke else 256
    RB, LB, TB = 8, (8192 if smoke else 131072), 2048

    def _op_kernel(x_ref, o_ref, *, op):
        y = x_ref[:, :]
        for _ in range(ITERS):
            if op == "mul":
                y = y * y + jnp.uint32(1)
            elif op == "mul16":  # 16-bit-safe multiply (exact partials)
                y = (y & jnp.uint32(0xFFFF)) * (y >> 16) + jnp.uint32(1)
            else:
                y = ((y << 1) ^ y) + jnp.uint32(1)
        o_ref[:, :] = y

    x = jnp.asarray(rng.integers(0, 1 << 32, size=(RB, LB), dtype=np.uint64).astype(np.uint32))
    jax.block_until_ready(x)
    for op in ("mul", "mul16", "addxor"):
        fn = jax.jit(
            lambda v, op=op: pl.pallas_call(
                functools.partial(_op_kernel, op=op),
                grid=(LB // TB,),
                in_specs=[pl.BlockSpec((RB, TB), lambda t: (0, t), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((RB, TB), lambda t: (0, t), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((RB, LB), jnp.uint32),
                interpret=not on_tpu,
            )(v).sum(dtype=jnp.uint32)
        )
        lanes = RB * LB * ITERS
        per = measure(f"vpu {op} x{ITERS}", fn, (x,), 0, n_disp=8)
        print(f"        -> {lanes / per / 1e12:.2f} T lane-ops/s", flush=True)


if __name__ == "__main__":
    main()
