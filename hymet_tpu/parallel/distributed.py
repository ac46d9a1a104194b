"""Multi-host initialization.

The reference is strictly single-node (SURVEY.md §2.6); scaling past one
host here means `jax.distributed` + the same ("data", "db") mesh spanning
all processes. Reference-DB shards ride ICI within a slice; the host-side
final LCA + TSV/CAMI emission happens on process 0.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger("hymet_tpu.distributed")


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID; cloud
    TPU pods auto-detect with no args). Returns True when running
    multi-process."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address or num_processes:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        logger.info(
            "distributed: process %d/%d, %d global devices",
            jax.process_index(),
            jax.process_count(),
            len(jax.devices()),
        )
    return jax.process_count() > 1


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0
