"""Multi-host runtime wrapper.

``jax.distributed.initialize`` multi-controller SPMD is the TPU-native
equivalent of the NCCL/MPI backends the reference never had (SURVEY §2.3
item 4).  Each host feeds its local shard of the FASTQ stream; global arrays
are assembled with ``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize the multi-controller runtime when requested via args/env.

    Returns True when running multi-process; single-process (the common
    single-host case and all tests) is a no-op.
    """
    coordinator = coordinator or os.environ.get("AFT_COORDINATOR")
    if coordinator is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes or int(os.environ.get("AFT_NUM_PROCS", "1")),
        process_id=process_id or int(os.environ.get("AFT_PROC_ID", "0")),
    )
    return jax.process_count() > 1


def host_shard(n_items: int) -> slice:
    """This host's slice of a global work list (per-host FASTQ sharding)."""
    p = jax.process_index()
    n = jax.process_count()
    per = -(-n_items // n)
    return slice(p * per, min((p + 1) * per, n_items))
