"""Group-wise range construction.

Functional, vectorized rebuild of the reference `GroupWise_Quantizaion`
(utils/quant_util.py:403-437): bucket a per-channel range vector x[C] into
`group_n` uniform-width buckets over [x.min(), x.max()], take the per-bucket
max (for upper ranges) or min (for lower ranges) as the group threshold, and
snap every channel to its group threshold.  Empty buckets fall back to the
bucket's upper edge, matching the reference.

Returns (snapped[C], group_values[G]).  Fully vectorized (no Python loop
over groups — keeps traced graphs small; this runs once per conv per
timestep inside the jitted calibration step).
"""
from __future__ import annotations

import jax.numpy as jnp


def groupwise_ranges(x, group_n: int = 8, maxmin: str = "max"):
    range_min = x.min()
    range_max = x.max()
    div = range_max - range_min
    # bucket edges: upper edge of bucket m is min + div*(m+1)/G
    uppers = range_min + div * (jnp.arange(1, group_n + 1) / group_n)
    lowers = jnp.concatenate([jnp.array([range_min]), uppers[:-1]])

    # membership: the reference iterates buckets ascending with inclusive
    # bounds on both sides, so at a shared boundary the LATER bucket wins.
    in_bucket = (x[None, :] >= lowers[:, None]) & (x[None, :] <= uppers[:, None])  # [G, C]
    idx = jnp.arange(1, group_n + 1)[:, None]
    mark = jnp.max(jnp.where(in_bucket, idx, 0), axis=0)  # [C], 1-based
    members = idx == mark[None, :]  # [G, C] — winner-bucket membership

    big = jnp.finfo(x.dtype).max
    if maxmin == "max":
        vals = jnp.where(members, x[None, :], -big).max(axis=1)  # [G]
    else:
        vals = jnp.where(members, x[None, :], big).min(axis=1)
    any_m = members.any(axis=1)
    group_vals = jnp.where(any_m, vals, uppers)  # empty bucket -> upper edge
    snapped = group_vals[mark - 1]
    return snapped, group_vals
