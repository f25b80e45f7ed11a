"""Blockwise (flash-style) spatial attention Pallas kernel.

The reference materializes the full HW x HW attention matrix with torch.bmm
(self_attention.py:141-144) — O(L^2) HBM.  At the reference's native
resolutions the deepest attention runs at 16x16 (L=256) and a fused XLA
softmax is optimal, so `spatial_attention` dispatches to plain einsum there;
for larger maps (L >= `flash_threshold`, e.g. 64x64 -> L=4096) it switches to
this streaming kernel: K/V are processed in blocks with a running max /
normalizer (online softmax), so only [block_q, block_k] tiles ever
materialize in VMEM.

Layout: q, k, v are [B, L, D] with D the (padded) head dim; batch x heads are
flattened into B.  D and the L blocks must be multiples of 128.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, scale: float):
    """One (batch, q-block) program: stream all k/v blocks."""
    q = q_ref[0].astype(jnp.float32) * scale  # [bq, D]
    L = k_ref.shape[1]
    bq = q.shape[0]
    D = v_ref.shape[2]

    def body(i, carry):
        acc, m, denom = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)  # [bk, D]
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)  # [bk, D]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # [bq, bk]
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        denom = denom * alpha + p.sum(axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return acc, m_new, denom

    acc0 = jnp.zeros((bq, D), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    d0 = jnp.zeros((bq, 1), jnp.float32)
    acc, _m, denom = jax.lax.fori_loop(0, L // block_k, body, (acc0, m0, d0))
    o_ref[0] = (acc / denom).astype(o_ref.dtype)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: float | None = None,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool | None = None,
):
    """softmax(q k^T * scale) v with online softmax.  q,k,v: [B, L, D]."""
    from .quant_conv import _auto_interpret

    interpret = _auto_interpret(interpret)
    B, L, D = q.shape
    assert k.shape == (B, L, D) and v.shape[:2] == (B, L)
    Dv = v.shape[2]
    if scale is None:
        scale = D ** -0.5
    block_q = min(block_q, L)
    block_k = min(block_k, L)
    assert L % block_q == 0 and L % block_k == 0, (L, block_q, block_k)

    kern = functools.partial(_flash_kernel, block_k=block_k, scale=scale)
    return pl.pallas_call(
        kern,
        grid=(B, L // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, Dv), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, Dv), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, Dv), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * L * L * D,
            bytes_accessed=2 * B * L * D + 2 * B * L * Dv,
            transcendentals=B * L * L,
        ),
        interpret=interpret,
    )(q, k, v)


def spatial_attention(q, k, v, *, scale=None, flash_threshold: int = 1024, interpret=None):
    """Dispatch: plain fused softmax for short sequences, the blockwise
    kernel for long ones.  q,k,v: [B, L, D] (D should be 128-aligned for the
    flash path; unaligned inputs fall back to the dense path)."""
    B, L, D = q.shape
    if scale is None:
        scale = D ** -0.5
    if L >= flash_threshold and L % 256 == 0 and D % 128 == 0:
        return flash_attention(q, k, v, scale=scale, interpret=interpret)
    w = jnp.einsum("blc,bmc->blm", q, k, preferred_element_type=jnp.float32) * scale
    w = jax.nn.softmax(w, axis=-1)
    return jnp.einsum("blm,bmc->blc", w, v, preferred_element_type=jnp.float32).astype(q.dtype)
