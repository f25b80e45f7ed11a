"""GPTQ-style error-compensated weight rounding for low-bit folds.

Second rounding optimizer next to AdaRound (quant/adaround.py), same
consumption path: it emits per-layer rounding offsets relative to
floor(ws*g - wzp), which ops/quant_conv.fold_weights_int8 adds back inside
the per-step serving fold — so the serving kernels are untouched and the
cost is calibration-time only.

Algorithm (Frantar et al. 2022, arXiv:2210.17323): process the reduction
dimension sequentially; after quantizing column j, distribute its rounding
error onto the not-yet-quantized columns through the inverse-Hessian
Cholesky factor, so correlated inputs compensate each other's rounding:

    q_j   = round_to_grid(w_j)
    err_j = (w_j - q_j) / U_jj
    W_{:, j+1:} -= err_j * U_{j, j+1:}        (U^T U = H^{-1}, U upper)

with H = E[x_patch x_patch^T] (the same Gram collect_conv_stats already
accumulates for AdaRound) and `act_order` processing columns by decreasing
diag(H).  Unlike AdaRound's {0,1} offsets, compensation can move a weight
several grid levels, so offsets here are small integers.

Reference counterpart: the intended real weight quantization at
/root/reference/utils/quant_util.py:284-303 — the reference has no rounding
optimization at all; this module is part of closing its low-bitwidth quality
claim (README.md:40-46) with calibration-time-only machinery.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.quant_conv import weight_grid
from .adaround import ConvStats


@functools.partial(
    jax.jit, static_argnames=("w_bit", "symmetric", "act_order", "block")
)
def _gptq_opt(g, gram, shrink, *, w_bit: int, symmetric: bool,
              act_order: bool = True, damp: float = 0.01, block: int = 128):
    """Quantize one scale-folded weight matrix with error compensation.

    g      [K, co] scale-folded weights (kernel / act_scale, flattened HWIO)
    gram   [K, K]  normalized input Gram E[x x^T]
    shrink [co]    per-channel range shrink (pinned, same grid as the fold)
    Returns gq [K, co] integer grid values (float32, within [-n, n-1]).

    Compensation is applied lazily in `block`-column batches (the paper's
    "lazy batch updates", arXiv:2210.17323 §3 step 2): within a block each
    column's error updates only the block's remaining columns (rank-1, cheap);
    the accumulated block errors hit the tail in ONE [co,block]@[block,K]
    matmul.  err_j depends only on column j's value after all i<j updates —
    every such update lands before j is quantized either way — so blocked and
    unblocked orders produce bit-identical decisions up to f32 summation
    order; without blocking, K=18432 (imagenet64's widest up-block) costs
    K rank-1 passes over the full [co, K] matrix on the VPU.
    """
    K, co = g.shape
    n = 2 ** (w_bit - 1)
    # the one true grid (ops/quant_conv.weight_grid): offsets emitted here
    # are only meaningful on the exact grid the per-step fold recomputes
    ws, wzp = weight_grid(g, w_bit, symmetric, shrink)

    H = gram
    if act_order:
        perm = jnp.argsort(-jnp.diag(H))
        inv_perm = jnp.argsort(perm)
        g = g[perm]
        H = H[perm][:, perm]
    # dead inputs (zero variance) must not be compensated through
    diag = jnp.diag(H)
    H = jnp.where(jnp.eye(K, dtype=bool), jnp.where(diag > 0, diag, 1.0), H)
    H = H + damp * jnp.mean(diag) * jnp.eye(K)
    Hinv = jax.scipy.linalg.cho_solve((jnp.linalg.cholesky(H), True), jnp.eye(K))
    U = jnp.linalg.cholesky(Hinv).T  # upper: U^T U = H^{-1}

    block = min(block, K)
    nb = -(-K // block)
    Kp = nb * block
    if Kp != K:
        # padded columns: w=0 and U rows/cols extend as identity, so their
        # "quantization" produces err*0 rows — inert, sliced off at the end
        U = jnp.pad(U, ((0, Kp - K), (0, Kp - K)))
        U = U.at[jnp.arange(K, Kp), jnp.arange(K, Kp)].set(1.0)
        g = jnp.pad(g, ((0, Kp - K), (0, 0)))
    Wt = g.T.astype(jnp.float32)  # [co, Kp]
    jb = jnp.arange(block)

    def blk(W, inp):
        Ub, s = inp  # [block, Kp] rows s..s+block of U, block start offset
        Wb = jax.lax.dynamic_slice(W, (0, s), (co, block))
        Ubb = jax.lax.dynamic_slice(Ub, (0, s), (block, block))  # diag block

        def inner(carry, j):
            Wb, Err = carry
            w_j = Wb[:, j]
            q = jnp.clip(jnp.round(ws * w_j - wzp), -n, n - 1)
            dq = (q + wzp) / ws
            err = (w_j - dq) / Ubb[j, j]
            row = jnp.where(jb > j, Ubb[j], 0.0)
            Wb = Wb - err[:, None] * row[None, :]
            Wb = Wb.at[:, j].set(dq)
            return (Wb, Err.at[:, j].set(err)), q

        (Wb, Err), qs_b = jax.lax.scan(
            inner, (Wb, jnp.zeros((co, block), jnp.float32)), jb
        )
        # one matmul propagates the whole block's errors to the tail
        tail = jnp.arange(Kp) >= s + block
        W = W - Err @ (Ub * tail[None, :])
        W = jax.lax.dynamic_update_slice(W, Wb, (0, s))
        return W, qs_b  # qs_b [block, co]

    offs = jnp.arange(nb) * block
    _, qs = jax.lax.scan(blk, Wt, (U.reshape(nb, block, Kp), offs))
    qs = qs.reshape(Kp, co)[:K]
    if act_order:
        qs = qs[inv_perm]
    return qs


def gptq_offsets(
    kernel: jax.Array,  # HWIO
    act_scale: jax.Array,  # [ci] mean-over-steps activation quant scale
    stats: ConvStats,
    w_bit: int,
    *,
    symmetric: bool = True,
    shrink=None,
    act_order: bool = True,
):
    """Per-layer GPTQ: returns integer rounding offsets [kh, kw, ci, co]
    (gq - floor(base), so the fold's floor(base_s) + offset reproduces the
    GPTQ decision on each step's grid), or None when the layer has no Gram.
    """
    kh, kw, ci, co = kernel.shape
    K = kh * kw * ci
    if stats.gram.shape[0] != K or float(stats.count) <= 0:
        return None
    g = (kernel / act_scale.reshape(1, 1, ci, 1)).reshape(K, co)
    if shrink is None:
        from ..ops.quant_conv import fold_shrink_search

        shrink = fold_shrink_search(kernel, act_scale, w_bit, symmetric)
    shrink = jnp.broadcast_to(jnp.asarray(shrink, jnp.float32), (co,))
    gq = _gptq_opt(
        g.astype(jnp.float32),
        stats.gram / jnp.maximum(stats.count, 1.0),
        shrink,
        w_bit=w_bit,
        symmetric=symmetric,
        act_order=act_order,
    )
    # express as offsets on the same grid the fold recomputes per step
    ws, wzp = weight_grid(g, w_bit, symmetric, shrink)
    offs = gq - jnp.floor(ws[None, :] * g - wzp[None, :])
    return offs.reshape(kh, kw, ci, co)
