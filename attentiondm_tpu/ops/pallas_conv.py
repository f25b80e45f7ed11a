"""Pallas implicit-im2col int8 3x3 convolution (stride 1, NHWC).

Motivation (r5 conv roofline audit, benchmarks/conv_roofline_r5.log): XLA's
int8 conv lowering runs every 3x3 serving shape at 185-200 TOPS — almost
exactly the 197 TFLOPS bf16 MXU rate — while raw int8 matmuls can reach the
double-pumped ~394 TOPS on the same chip.  This kernel recovers the matmul
rate for the conv by doing the im2col implicitly in VMEM: the input tile is
read from HBM ONCE per batch block, the 9 taps are VMEM slices fed to 9 MXU
dots accumulating int32 in VMEM, and the per-output-channel dequant + bias
epilogue is fused so the int32 accumulator never touches HBM (the output is
written once at the residual dtype, bf16 by default — the serving path's
`dot_bf16` layout).

Interface mirrors quant/int8_serving.int8_conv3_qzero: the caller supplies
the qzero-halo-padded int8 input [B, H+2, W+2, Cp] and the FOLD-LAYOUT flat
weights gq [9*Cp, Np] (rows in (dy, dx, c) order — ops/quant_conv
fold_weights_int8).  Reference counterpart being replaced: the fake-quant
float conv at /root/reference/utils/quant_util.py:383-385.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant_conv import _auto_interpret

# VMEM plan per program (batch block Bt):
#   x block   Bt*(H+2)*(W+2)*Cp   int8
#   weights   9*Cp*Np             int8   (every program reads all taps)
#   acc       Bt*H*W*Np           int32  (+ the out block at out_dtype)
# Budget keeps us well under the ~16 MB/core VMEM with double buffering.
VMEM_BUDGET = 8 << 20


def _block_bt(B: int, H: int, W: int, Cp: int, Np: int, out_bytes: int) -> int:
    """Largest batch block that fits the VMEM plan (>=1, divides B)."""
    g_b = 9 * Cp * Np
    per_bt = (H + 2) * (W + 2) * Cp + H * W * Np * (4 + out_bytes)
    bt = max(1, int((VMEM_BUDGET - g_b) // per_bt))
    bt = min(bt, B)
    while B % bt:
        bt -= 1
    return bt


def conv3_pallas_fits(B: int, H: int, W: int, Cp: int, Np: int) -> bool:
    """Eligibility: lane-aligned channels and a plan that fits VMEM."""
    return (
        Cp % 128 == 0
        and Np % 128 == 0
        and 9 * Cp * Np + (H + 2) * (W + 2) * Cp + H * W * Np * 6 <= VMEM_BUDGET
    )


def conv3_pallas_wins(B: int, H: int, W: int, Cp: int, Np: int) -> bool:
    """MEASURED per-shape routing policy (real chip, B128 serving census —
    tools/conv_attack_probe.py --parts census, benchmarks/conv_census_r5.log).

    Paired same-process A/B over all 12 conv3 shapes of the headline step:
    the kernel beats XLA's int8 conv lowering 1.15-1.7x on every shape with
    enough MXU work per tap — it loses only on (Cp=128, Np=128), where the
    9 narrow 128x128 dots underfill the MXU (239 vs 165 us at 32^2), and at
    4^2 with Cp<512, where M=B*16 is too small to amortize the dispatch
    (16.2 vs 13.0 us).  Routed total over the census: 7.04 -> 5.39 ms
    (23.5% of the conv core).  Callers route `fits and wins`."""
    if H < 8 or W < 8:
        return Cp >= 512 and Np >= 256
    return not (Cp == 128 and Np == 128)


def _kernel(x_ref, g_ref, sb_ref, o_ref, *, H, W, Cp, Np, Bt, out_dtype):
    m = Bt * H * W
    acc = jnp.zeros((m, Np), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            v = x_ref[:, dy : dy + H, dx : dx + W, :].reshape(m, Cp)
            g = g_ref[(dy * 3 + dx) * Cp : (dy * 3 + dx + 1) * Cp, :]
            acc = acc + jax.lax.dot_general(
                v, g, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
    if out_dtype == jnp.int32:
        o_ref[:] = acc.reshape(Bt, H, W, Np)
    else:
        # sb row 0 = inv_ws, row 1 = zcbias (the (2, C) per-channel-vector
        # layout the other Pallas kernels in ops/ use)
        out = acc.astype(jnp.float32) * sb_ref[0:1, :] + sb_ref[1:2, :]
        o_ref[:] = out.astype(out_dtype).reshape(Bt, H, W, Np)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def int8_conv3_pallas(
    xp: jax.Array,       # [B, H+2, W+2, Cp] int8, halo already applied
    gq_flat: jax.Array,  # [9*Cp, Np] int8, (dy, dx, c) row order
    inv_ws: jax.Array,   # [Np] f32 per-channel dequant (ignored for int32 out)
    zcbias: jax.Array,   # [Np] f32 zero-correction + bias (ignored for int32)
    *,
    out_dtype=jnp.int32,
    interpret: bool | None = None,
):
    interpret = _auto_interpret(interpret)
    B, Hp, Wp, Cp = xp.shape
    H, W = Hp - 2, Wp - 2
    Np = gq_flat.shape[-1]
    out_bytes = np.dtype(out_dtype).itemsize
    Bt = _block_bt(B, H, W, Cp, Np, out_bytes)
    grid = (B // Bt,)
    kern = functools.partial(
        _kernel, H=H, W=W, Cp=Cp, Np=Np, Bt=Bt, out_dtype=out_dtype
    )
    flops = 2 * B * H * W * 9 * Cp * Np
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Bt, Hp, Wp, Cp), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * Cp, Np), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, Np), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bt, H, W, Np), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Np), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(xp.size + gq_flat.size + B * H * W * Np * out_bytes),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, gq_flat,
      jnp.stack([inv_ws.astype(jnp.float32), zcbias.astype(jnp.float32)]))
