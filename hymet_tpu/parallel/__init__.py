"""Multi-device sharding: the TPU-native replacement for everything the
reference does with process/thread pools and minimap2 -I batching
(SURVEY.md §2.6).

Axes of the device mesh:
  - ``data``: query contig batches stream data-parallel (replaces
    ``mash screen -p 8`` threading and the classifier's process pool);
  - ``db``: reference sketch rows / minimizer-index sequence shards
    (replaces sequential 3-DB screening and minimap2's -I2g RAM batching).

Per-shard candidate scores merge via all_gather over ICI; the final LCA
reduction is data-parallel with no cross-device traffic.
"""

from hymet_tpu.parallel.mesh import make_mesh
from hymet_tpu.parallel.screen import ShardedScreenEngine
from hymet_tpu.parallel.collectives import sharded_topk

__all__ = ["make_mesh", "ShardedScreenEngine", "sharded_topk"]
