"""hymet_tpu — TPU-native hybrid metagenomic classifier.

A from-scratch, TPU-first framework with the capabilities of HYMET
(jorgeMFS/HYMET): taxonomic classification of assembled metagenomic contigs
via

1. MinHash sketch screening of query contigs against reference sketch
   databases (replacing ``mash screen``, cf. reference ``scripts/mash.sh``)
   as batched JAX/Pallas kernels,
2. candidate limiting (cf. reference ``scripts/limit_candidates.py``),
3. minimizer seed--chain alignment against selected reference genomes
   (replacing ``minimap2 -x asm10``, cf. reference ``scripts/minimap2.sh``)
   as sharded JAX kernels,
4. coverage*abundance-weighted rank-by-rank consensus LCA lineage assignment
   (cf. reference ``scripts/classification_cami.py``) vectorized in JAX,
5. CAMI-format profile export with an in-process taxonomy component
   (replacing ``taxonkit``; cf. reference ``tools/hymet2cami.py``).

Reference sketch matrices and minimizer indexes shard across a
``jax.sharding.Mesh`` (axes ``("data", "db")``); contig batches stream
data-parallel; per-shard top-k candidate scores and chain scores merge with
XLA collectives.
"""

__version__ = "0.1.0"

# Honor HYMET_PLATFORM at the package boundary: some PJRT plugins (axon)
# ignore the JAX_PLATFORMS env var, and merely initializing their backend
# dials the device tunnel — which can hang for minutes when the tunnel is
# unhealthy. Applying the override here (jax.config is import-light; no
# backend is initialized) makes HYMET_PLATFORM=cpu safe for every entry
# point, not just the harness.
from hymet_tpu.utils.jaxtools import apply_platform_override as _apply_platform

_apply_platform()
del _apply_platform

# Canonical rank order used across the whole framework.
# Mirrors reference scripts/classification_cami.py:16.
RANKS = [
    "superkingdom",
    "phylum",
    "class",
    "order",
    "family",
    "genus",
    "species",
    "strain",
]

# CAMI profiles use the 7-rank form (no strain).
# Mirrors reference tools/hymet2cami.py:14.
CAMI_RANKS = RANKS[:-1]

# NOTE: the reference table (classification_cami.py:17-26) lacks the identity
# "superkingdom" key, so `superkingdom:X` entries are silently dropped by its
# parser (it only works with post-2024 NCBI dumps that use rank "domain").
# We add the identity mapping — a deliberate, documented deviation.
RANK_ALIAS = {
    "superkingdom": "superkingdom",
    "domain": "superkingdom",
    "kingdom": "superkingdom",
    "sk": "superkingdom",
    "k": "superkingdom",
    "phylum": "phylum",
    "p": "phylum",
    "class": "class",
    "c": "class",
    "order": "order",
    "o": "order",
    "family": "family",
    "f": "family",
    "genus": "genus",
    "g": "genus",
    "species": "species",
    "s": "species",
    "subspecies": "strain",
    "ss": "strain",
    "strain": "strain",
}
