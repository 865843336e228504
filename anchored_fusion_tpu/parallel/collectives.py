"""Sharded pipeline steps and collective evidence merging.

The evidence units of the calling pipeline are already fixed-shape integer
tensors (PWM vote matrices 400x4 / 200x4 / 100x4, breakpoint count vectors),
so cross-device merging is a ``psum`` and candidate exchange is an
``all_gather`` — XLA inserts them from sharding annotations; nothing here
hand-schedules communication (scaling-book recipe: pick a mesh, annotate,
let XLA place collectives on ICI).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from anchored_fusion_tpu.align.aligner import _align_core
from anchored_fusion_tpu.ops.diagonal import build_seed_matrix


def sharded_anchor_align(mesh: Mesh, reads, ref, seed_matrix, win_matrix,
                         top_k: int = 4, match: int = 1, mismatch: int = 4):
    """Anchor alignment with the read batch sharded over dp.

    The per-read outputs keep the batch sharding; the anchored reference and
    its patch/window matrices are replicated (it is a ~7kb transcript —
    SURVEY §2.3 item 2: anchored index replicated, genome index sharded).
    """
    dp = mesh.axis_names[0]
    rep = NamedSharding(mesh, P())
    fn = jax.jit(
        functools.partial(_align_core, k=top_k, match=match, mismatch=mismatch),
        in_shardings=(NamedSharding(mesh, P(dp)), rep, rep, rep),
    )
    return fn(reads, ref, seed_matrix, win_matrix)


def psum_pwm_votes(mesh: Mesh, votes):
    """All-reduce per-shard PWM vote tensors: (..., W, 4) -> summed.

    Used when each dp shard accumulated breakpoint votes over its read slice;
    the merged PWM is what consensus calling consumes (the device-native
    version of Co_Split_reads merging across hosts).
    """
    dp = mesh.axis_names[0]

    def body(v):
        # v is this shard's (1, W, 4) slice of the stacked per-shard votes
        return jax.lax.psum(v[0], dp)

    fn = jax.shard_map(body, mesh=mesh,
                       in_specs=P(dp, None, None), out_specs=P(None, None))
    return fn(votes)


def all_gather_candidates(mesh: Mesh, arr):
    """Gather per-shard candidate records onto every device (tiny arrays)."""
    dp = mesh.axis_names[0]

    def body(a):
        return jax.lax.all_gather(a, dp, tiled=True)

    fn = jax.shard_map(body, mesh=mesh, in_specs=P(dp), out_specs=P(None))
    return fn(arr)
