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


def allgather_alignment(res, n_pairs: int):
    """Assemble a global AlignmentResult from per-host pair-slice results.

    Each host aligns the reads of its ``host_shard(n_pairs)`` pair slice (two
    rows per pair, order preserved); this gathers the per-read record fields
    across processes so every host holds the identical full-batch result and
    the downstream (host-side) calling stages run deterministically and
    redundantly on all hosts.  The transport is ONE int64 (rows, fields)
    array per host — int64 because ``ref_start``/``ref_end`` are genome-global
    coordinates that exceed int32 at hg38 scale.

    The reference has no multi-host story at all (SURVEY §2.3); this is the
    TPU-native replacement for its single-process ``bwa mem`` over the full
    FASTQ (Anchored_Fusion.py:182) — the dominant stage, sharded by host.
    """
    import dataclasses

    import numpy as np
    from jax.experimental import multihost_utils

    nprocs = jax.process_count()
    per = -(-n_pairs // nprocs)
    fields = dataclasses.fields(type(res))
    loc = np.stack([np.asarray(getattr(res, f.name)).astype(np.int64)
                    for f in fields], axis=1)
    pad = 2 * per - loc.shape[0]
    if pad:
        loc = np.concatenate(
            [loc, np.zeros((pad, loc.shape[1]), np.int64)], axis=0)
    glob = multihost_utils.process_allgather(loc, tiled=True)
    # strip per-shard padding (the LAST shard may be short; host_shard slices
    # are contiguous and ordered, so concatenation restores read order)
    parts = []
    for i in range(nprocs):
        lo, hi = i * per, min((i + 1) * per, n_pairs)
        parts.append(glob[i * 2 * per:i * 2 * per + 2 * (hi - lo)])
    g = np.concatenate(parts, axis=0)
    kwargs = {
        f.name: g[:, j].astype(np.asarray(getattr(res, f.name)).dtype)
        for j, f in enumerate(fields)
    }
    return type(res)(**kwargs)


def barrier(name: str = "aft_barrier"):
    """Cross-process sync point (e.g. before single-writer aggregation)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)
