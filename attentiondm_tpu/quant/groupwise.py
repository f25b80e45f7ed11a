"""Group-wise range construction.

Functional, vectorized rebuild of the reference `GroupWise_Quantizaion`
(utils/quant_util.py:403-437): bucket a per-channel range vector x[C] into
`group_n` uniform-width buckets over [x.min(), x.max()], take the per-bucket
max (for upper ranges) or min (for lower ranges) as the group threshold, and
snap every channel to its group threshold.  Empty buckets fall back to the
bucket's upper edge, matching the reference.

Returns (snapped[C], group_values[G]).  Fully traceable — the G loop is a
tiny unrolled Python loop (G <= 8), everything else is vector ops.
"""
from __future__ import annotations

import jax.numpy as jnp


def groupwise_ranges(x, group_n: int = 8, maxmin: str = "max"):
    C = x.shape[-1]
    range_min = x.min()
    range_max = x.max()
    div = range_max - range_min
    # bucket edges: edge[m] = min + div*(m+1)/G  (upper edge of bucket m)
    uppers = range_min + div * (jnp.arange(1, group_n + 1) / group_n)
    lowers = jnp.concatenate([jnp.array([range_min]), uppers[:-1]])

    # membership: the reference iterates buckets ascending with inclusive
    # bounds on both sides, so at a shared boundary the LATER bucket wins.
    snapped = jnp.zeros_like(x)
    group_vals = []
    # mark[c] = highest m with lowers[m] <= x[c] <= uppers[m]
    in_bucket = (x[None, :] >= lowers[:, None]) & (x[None, :] <= uppers[:, None])  # [G, C]
    idx = jnp.arange(1, group_n + 1)[:, None]  # 1-based like the reference
    mark = jnp.max(jnp.where(in_bucket, idx, 0), axis=0)  # [C]

    big = jnp.finfo(x.dtype).max
    for m in range(group_n):
        members = mark == (m + 1)
        any_m = members.any()
        if maxmin == "max":
            val = jnp.where(members, x, -big).max()
        else:
            val = jnp.where(members, x, big).min()
        val = jnp.where(any_m, val, uppers[m])  # empty bucket -> upper edge
        group_vals.append(val)
        snapped = jnp.where(members, val, snapped)
    return snapped, jnp.stack(group_vals)
