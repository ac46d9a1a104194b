"""Device-side compute ops (JAX/XLA/Pallas).

Each op replaces an inner loop of the reference pipeline:

- :mod:`hymet_tpu.ops.lca` — vectorized coverage*abundance-weighted
  rank-consensus LCA (replaces the per-query Python loop of
  ``scripts/classification_cami.py:251-308``).
- :mod:`hymet_tpu.ops.hashing` — MurmurHash3-compatible k-mer hashing as
  32-bit-limb integer kernels (replaces Mash's k-mer hashing).
- :mod:`hymet_tpu.ops.sketch` — bottom-s MinHash sketches + containment
  screen (replaces ``mash screen``).
- :mod:`hymet_tpu.ops.minimizer` — minimizer extraction, index lookup and
  chain scoring (replaces ``minimap2 -x asm10``'s seed-chain stage).
"""
