"""Whole-resblock fused Pallas kernel: ONE HBM read, ONE HBM write.

The r4 serving-step breakdown (PERFORMANCE.md) charges ~2.5 ms/step to the
resblock GN entries and the r5 roofline audit shows the conv core's XLA
lowering at ~50% MFU with the inter-conv HBM glue (entry write, int8 conv
input, bf16 conv output, epilogue read) roughly matching the conv compute
itself.  This kernel runs the ENTIRE inference resblock

    r -> GN1 -> swish -> quant -> conv1(3x3 int8) -> dequant -> +temb
      -> GN2 -> swish -> quant -> conv2(3x3 int8) -> dequant -> + r

in one Pallas program per batch block: the residual is read once, every
intermediate (int8 conv inputs with their quantized-zero halos, int32
accumulators, f32 normalized tensors) lives in VMEM, the 9-tap convs run as
MXU matmuls (implicit im2col, ops/pallas_conv.py), and the output residual
is written once at the stream dtype.  Same playbook as
ops/int8_attention.fused_attention_block (+16% end-to-end in round 2).

Eligible when cin == co1 == co2 (no shortcut — the identity-residual
resblocks that dominate the UNet), C % 128 == 0, and the VMEM plan fits.
GroupNorm math and the asymmetric quantize are shared with ops/fused_gn
(identical semantics to the serving path's unfused chain).

Reference counterpart: models/diffusion.py:82-136 (ResidualBlock) executed
as a chain of fake-quant cuDNN calls.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_gn import _gn_normalize, _group_onehots, _quant
from .quant_conv import _auto_interpret

VMEM_BUDGET = 10 << 20


def resblock_pallas_fits(B: int, H: int, W: int, C: int) -> bool:
    """Eligibility: lane-aligned channels and the whole plan in VMEM."""
    if C % 128 or B < 1:
        return False
    bt = _block_bt(B, H, W, C)
    per = (
        H * W * C * (2 + 4 + 1)            # residual (bf16) + f32 temp + int8
        + 2 * (H + 2) * (W + 2) * C        # two halo'd int8 conv inputs
        + H * W * C * 4                    # int32 accumulator
    )
    return bt >= 1 and 2 * 9 * C * C + bt * per <= VMEM_BUDGET


def _block_bt(B: int, H: int, W: int, C: int) -> int:
    g_b = 2 * 9 * C * C
    per = H * W * C * 7 + 2 * (H + 2) * (W + 2) * C + H * W * C * 4
    bt = max(1, int((VMEM_BUDGET - g_b) // max(per, 1)))
    bt = min(bt, B)
    while bt > 1 and B % bt:
        bt -= 1
    return bt if B % bt == 0 else 1


def _taps(pad_ref, g_ref, m, H, W, C):
    acc = jnp.zeros((m, C), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            v = pad_ref[:, dy : dy + H, dx : dx + W, :].reshape(m, C)
            g = g_ref[(dy * 3 + dx) * C : (dy * 3 + dx + 1) * C, :]
            acc = acc + jax.lax.dot_general(
                v, g, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
    return acc


def _fill_halo(pad_ref, hq, q_ref, n, Bt, H, W, C):
    """Quantized-zero halo + interior write, all in VMEM."""
    qz = jnp.clip(jnp.round(-q_ref[1:2, :]), -n, n - 1).astype(jnp.int8)  # [1, C]
    pad_ref[:] = jnp.broadcast_to(qz[None, None, :, :], (Bt, H + 2, W + 2, C))
    pad_ref[:, 1 : H + 1, 1 : W + 1, :] = hq.reshape(Bt, H, W, C)


def _kernel(r_ref, tp_ref, oh_ref, gn1_ref, q1_ref, g1_ref, sb1_ref,
            gn2_ref, q2_ref, g2_ref, sb2_ref, o_ref, pad1, pad2,
            *, H, W, C, Bt, n1, n2, inv_count, out_dtype):
    m = Bt * H * W
    r = r_ref[:].astype(jnp.float32).reshape(Bt, H * W, C)
    oh = oh_ref[:]

    h = _gn_normalize(r, oh, inv_count, gn1_ref[0:1, :], gn1_ref[1:2, :])
    h = h * jax.nn.sigmoid(h)
    hq = _quant(h, q1_ref[0:1, :], q1_ref[1:2, :], n1)
    _fill_halo(pad1, hq, q1_ref, n1, Bt, H, W, C)

    acc = _taps(pad1, g1_ref, m, H, W, C)
    h = acc.astype(jnp.float32) * sb1_ref[0:1, :] + sb1_ref[1:2, :]
    h = h.reshape(Bt, H * W, C) + tp_ref[:]  # tp block [Bt, 1, C] broadcasts

    h = _gn_normalize(h, oh, inv_count, gn2_ref[0:1, :], gn2_ref[1:2, :])
    h = h * jax.nn.sigmoid(h)
    hq2 = _quant(h, q2_ref[0:1, :], q2_ref[1:2, :], n2)
    _fill_halo(pad2, hq2, q2_ref, n2, Bt, H, W, C)

    acc = _taps(pad2, g2_ref, m, H, W, C)
    out = acc.astype(jnp.float32) * sb2_ref[0:1, :] + sb2_ref[1:2, :]
    out = r + out.reshape(Bt, H * W, C)
    o_ref[:] = out.astype(out_dtype).reshape(Bt, H, W, C)


@functools.partial(jax.jit, static_argnames=("a_bit1", "a_bit2", "groups",
                                             "out_dtype", "interpret"))
def resblock_pallas(
    r: jax.Array,           # [B, H, W, C] residual stream (f32 or bf16)
    tproj: jax.Array,       # [B, C] f32 temb projection (dense(swish(temb)))
    gn1_scale, gn1_bias,    # [C]
    q1,                     # (act_scale [C], act_zp [C]) for conv1 input
    g1_flat,                # [9C, C] int8 folded conv1 weights
    sb1,                    # (inv_ws [C], zcbias [C]) conv1 epilogue
    gn2_scale, gn2_bias,
    q2, g2_flat, sb2,
    *,
    a_bit1: int = 8,
    a_bit2: int = 8,
    groups: int = 32,
    out_dtype=jnp.bfloat16,
    interpret: bool | None = None,
):
    interpret = _auto_interpret(interpret)
    B, H, W, C = r.shape
    Bt = _block_bt(B, H, W, C)
    onehot, g, cg = _group_onehots(C, groups)
    inv_count = 1.0 / (H * W * cg)

    def _pc(a, b):  # per-channel pair -> [2, C] f32
        return jnp.stack([jnp.asarray(a, jnp.float32).reshape(C),
                          jnp.asarray(b, jnp.float32).reshape(C)])

    kern = functools.partial(
        _kernel, H=H, W=W, C=C, Bt=Bt,
        n1=2 ** (a_bit1 - 1), n2=2 ** (a_bit2 - 1),
        inv_count=inv_count, out_dtype=out_dtype,
    )
    vec = lambda: pl.BlockSpec((2, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    flops = 2 * 2 * B * H * W * 9 * C * C
    return pl.pallas_call(
        kern,
        grid=(B // Bt,),
        in_specs=[
            pl.BlockSpec((Bt, H, W, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # [B, 1, C] so the block's LAST TWO dims are (1, C) — Mosaic
            # requires them divisible by (8, 128) or equal to the array dims,
            # and Bt can drop below 8 at the small-spatial levels
            pl.BlockSpec((Bt, 1, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, g), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec(), vec(),
            pl.BlockSpec((9 * C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec(), vec(), vec(),
            pl.BlockSpec((9 * C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec(),
        ],
        out_specs=pl.BlockSpec((Bt, H, W, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((Bt, H + 2, W + 2, C), jnp.int8),
            pltpu.VMEM((Bt, H + 2, W + 2, C), jnp.int8),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(flops),
            bytes_accessed=int(2 * r.size * r.dtype.itemsize + 2 * 9 * C * C),
            transcendentals=int(2 * B * H * W * C),
        ),
        interpret=interpret,
    )(
        r, tproj.astype(jnp.float32)[:, None, :], onehot,
        _pc(gn1_scale, gn1_bias), _pc(*q1), g1_flat, _pc(*sb1),
        _pc(gn2_scale, gn2_bias), _pc(*q2), g2_flat, _pc(*sb2),
    )
