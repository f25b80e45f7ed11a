"""Fused int8 serving forward: the round-2 path that makes true-int8 win.

The round-1 int8 runtime (quant/int8_runtime.py) intercepted convs one at a
time through the generic `conv_apply` chokepoint: every conv quantized its
f32 input, ran int8 MACs, and dequantized back to f32 — so the model still
moved f32 activations through HBM between convs and the conv-level 4.8x
speedup was eaten by elementwise passes (PERFORMANCE.md round 1: 47.3 img/s
int8 vs 55.6 fake-quant).

This module is a dedicated forward pass over the same UNet graph
(models/unet.py::unet_apply — kept in lockstep, tested) where activations are
*int8-resident*: the only full-size HBM tensors per resblock are

    residual (f32 or bf16) -> int8 conv input -> int32 accumulator -> int8
    conv input -> int32 accumulator -> residual'

The inter-conv chains collapse into:
  - entry:   GroupNorm+swish+quantize as two XLA passes (stats reduce +
             fused normalize/swish/quantize — XLA's elementwise codegen is
             VPU-bound here and measured faster than a hand Pallas kernel);
  - middle:  ops/fused_gn.epilogue_gn_swish_quant — ONE Pallas pass from the
             int32 conv accumulator to the next conv's int8 input (the f32
             intermediate never exists in HBM; measured win over the XLA
             two-pass: 1.94 vs 2.17 ms/resblock at CIFAR L0);
  - exit:    epilogue + residual add, pure XLA fusion.

Measured at CIFAR level-0 (256x32x32x128, v5e): 1.53 ms/resblock with bf16
residual stream (2.98 ms for the round-1 interception path, 2.50 ms for the
FP32 model).

Reference behavior: the fake-quant QConv2d forward (utils/quant_util.py:
226-282, 383-385) with the quantized values actually *executed* in int8
instead of being dequantized back to float for cuDNN.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models.unet import (
    UNetConfig,
    conv2d,
    dense,
    get_timestep_embedding,
    group_norm,
    iter_conv_layers,
    swish,
)
from ..ops.attention import spatial_attention
from ..ops.fused_gn import epilogue_gn_swish_quant
from .int8_runtime import Int8Layer, _eligible, _fold_all_steps
from .qunet import QuantizedUNet
from .state import ActQuantState, quantize_activation


# ---------------------------------------------------------------------------
# runtime preparation
# ---------------------------------------------------------------------------


def _lookup(params, name):
    node = params
    for p in name.split("."):
        node = node[int(p)] if isinstance(node, list) else node[p]
    return node


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ServingLayer:
    """Per-step folded weights + epilogue constants for one conv.

    gq        [S, kh*kw*Cp, Np] int8   scale-folded quantized weights
    inv_ws    [S, Np]                  1 / per-out-channel weight scale
    zcbias    [S, Np]                  zero-point correction + conv bias
    act_scale [S, C]                   input activation quant scale
    act_zp    [S, C]                   input activation zero point
    """

    gq: jax.Array
    inv_ws: jax.Array
    zcbias: jax.Array
    act_scale: jax.Array
    act_zp: jax.Array


def prepare_serving_runtime(
    qunet: QuantizedUNet,
    params,
    qstates: Dict[str, ActQuantState],
    symmetric: bool = True,
    steps: slice | None = None,
    weight_extras=None,
    pack_int4: bool = False,
    rank1: bool = False,
) -> Dict[str, ServingLayer]:
    """Fold weights for every eligible conv into serving form.

    `steps` optionally restricts folding to a slice of the sampler schedule —
    the chunked low-HBM mode for big models (see `make_chunked_runtime_fn`).

    `weight_extras` {name: quant.adaround.WeightExtras} supplies AdaRound
    rounding offsets and bias-correction means — the W4 quality levers
    (they change the fold only; the serving kernels are untouched).

    `pack_int4` stores each w_bit<=4 layer's folded weights as two nibbles
    per byte (uint8) — HALF the per-step fold HBM, bit-exact (the scan body
    unpacks one step's slice before the convs; ~params/2 extra bytes of
    traffic per step, noise next to the conv reads).  Extends fold-once
    (PERFORMANCE.md big-model section) to 2x longer schedules.

    `rank1` constrains the activation scales to the step-factorized rank-1
    form (quant/rank1.py) so the int8 weights are STEP-SHARED: gq is stored
    once ([1, K, Np]) and fold HBM drops from S x params to params — no
    `step_chunk` needed at any schedule length.  Mutually exclusive with
    `steps` (the factorization must see the whole schedule to be consistent).

    Only symmetric (zero-point-free) weight folding is supported: ServingLayer
    carries no wzp and `_epilogue` has no rowsum term, so an asymmetric fold
    would silently produce garbage.  Asymmetric weight quantization lives on
    the interception path (quant/int8_runtime.py).
    """
    if not symmetric:
        raise NotImplementedError(
            "the fused serving path supports symmetric weight folding only; "
            "use quant/int8_runtime.py for asymmetric weight quantization"
        )
    if rank1 and steps is not None:
        raise ValueError(
            "rank1 shared folds are whole-schedule by construction; drop "
            "step_chunk (the shared fold is params-sized — chunking buys nothing)"
        )
    runtime: Dict[str, ServingLayer] = {}
    for name, _cin, _k in iter_conv_layers(qunet.cfg):
        node = _lookup(params, name)
        kernel = node["kernel"]
        if not _eligible(kernel.shape):
            continue
        st = qstates[name]
        pol = qunet.policy[name]
        gr = st.group_ranges if steps is None else st.group_ranges[steps]
        al = st.alpha_logits if steps is None else st.alpha_logits[steps]
        ex = weight_extras.get(name) if weight_extras else None

        def _per_step(v):
            # per-step ([S, co]) refinement fields follow the step window like
            # group_ranges/alpha_logits; shared ([co]) fields pass through
            return v if v is None or v.ndim == 1 or steps is None else v[steps]

        gq, ws, wzp, zc, scale, zp = _fold_all_steps(
            kernel, gr, al, pol.a_bit, pol.w_bit, symmetric,
            round_offset=None if ex is None else ex.round_offset,
            input_mu=None if ex is None else ex.mu,
            shrink=None if ex is None else ex.shrink,
            out_mult=None if ex is None else _per_step(ex.out_mult),
            bias_delta=None if ex is None else _per_step(ex.bias_delta),
            rank1=rank1,
        )
        co = kernel.shape[3]
        Np = gq.shape[-1]
        if pack_int4 and pol.w_bit <= 4:
            gq = pack_int4_fn(gq)
        bias = jnp.pad(node["bias"].astype(jnp.float32), (0, Np - co))
        runtime[name] = ServingLayer(
            gq=gq,
            inv_ws=1.0 / ws,
            zcbias=zc + bias[None, :],
            act_scale=scale,
            act_zp=zp,
        )
    return runtime


def gather_step(runtime: Dict[str, ServingLayer], step_idx) -> Dict[str, ServingLayer]:
    """Slice out one sampler step's runtime (dynamic index, jit-safe).

    Leaves with a singleton step axis are step-SHARED (the rank-1 fold stores
    `gq [1, K, Np]` once instead of per step) and gather index 0 statically.
    """
    return jax.tree_util.tree_map(
        lambda a: a[0] if a.shape[0] == 1 else a[step_idx], runtime
    )


# ---------------------------------------------------------------------------
# int4 nibble packing (per-step fold capacity: 2x less HBM, bit-exact)
# ---------------------------------------------------------------------------


def pack_int4(gq: jax.Array) -> jax.Array:
    """Pack an int8 array of int4-valued weights ([-8, 7]) along axis -2.

    gq [..., K, Np] int8 -> [..., K//2, Np] uint8 with rows (2j, 2j+1) in the
    (low, high) nibbles.  K is always even (the fold pads channels to 128).
    Exact round-trip with `unpack_int4` — packing changes no weight value, so
    a packed serving run is bit-identical to the unpacked one (tested).
    """
    K = gq.shape[-2]
    assert K % 2 == 0, K
    r = gq.reshape(gq.shape[:-2] + (K // 2, 2, gq.shape[-1]))
    lo = jnp.bitwise_and(r[..., 0, :].astype(jnp.uint8), jnp.uint8(0x0F))
    hi = jnp.left_shift(r[..., 1, :].astype(jnp.uint8), 4)
    return jnp.bitwise_or(lo, hi)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Inverse of `pack_int4`: uint8 [..., Kh, Np] -> int8 [..., 2*Kh, Np].

    Sign extension via (x << 4) >> 4 arithmetic shifts on int8."""
    pi = packed.astype(jnp.int8)
    lo = jnp.right_shift(jnp.left_shift(pi, 4), 4)
    hi = jnp.right_shift(pi, 4)
    out = jnp.stack([lo, hi], axis=-2)  # [..., Kh, 2, Np]
    return out.reshape(packed.shape[:-2] + (2 * packed.shape[-2], packed.shape[-1]))


# alias: `prepare_serving_runtime` has a keyword named pack_int4
pack_int4_fn = pack_int4


def _unpack_layer(lay: ServingLayer) -> ServingLayer:
    if lay.gq.dtype == jnp.uint8:
        return dataclasses.replace(lay, gq=unpack_int4(lay.gq))
    return lay


# ---------------------------------------------------------------------------
# fused building blocks (XLA side)
# ---------------------------------------------------------------------------


def _quant_i8(x, scale, zp, a_bit):
    n = 2 ** (a_bit - 1)
    return jnp.clip(jnp.round(scale * x - zp), -n, n - 1).astype(jnp.int8)


def _gn_stats(x, num_groups=32, eps=1e-6):
    """Per-(image, group) mean / rstd in f32.  x: [B, ..., C]."""
    B, C = x.shape[0], x.shape[-1]
    g = min(num_groups, C)
    xg = x.reshape(B, -1, g, C // g)
    mean = xg.mean(axis=(1, 3))
    var = xg.var(axis=(1, 3))
    return mean, jax.lax.rsqrt(var + eps)  # [B, g]


def _gn_apply(x, mean, rstd, gn_scale, gn_bias, num_groups=32):
    B, C = x.shape[0], x.shape[-1]
    g = min(num_groups, C)
    shape = (B,) + (1,) * (x.ndim - 2) + (C,)
    mean_c = jnp.repeat(mean, C // g, axis=1).reshape(shape)
    rstd_c = jnp.repeat(rstd, C // g, axis=1).reshape(shape)
    return (x - mean_c) * rstd_c * gn_scale + gn_bias


def gn_act_quant_xla(x, gn_p, quant_params, *, act="swish", num_groups=32, sums=None):
    """GroupNorm -> act -> quantize, XLA two-pass (stats reduce + fused
    normalize/swish/quantize).  Multi-output: one int8 per (scale, zp, bit).

    Measured VPU-bound; XLA's codegen beats a hand Pallas kernel here, so no
    pallas_call (the Pallas variant lives in ops/fused_gn.gn_act_quant for
    comparison).

    `sums` [B, 2, G] (from ops/fused_gn.epilogue_residual_gn_stats — the
    previous resblock's fused exit) skips the stats reduce entirely: the
    entry becomes ONE pass over x.
    """
    xf = x.astype(jnp.float32)
    if sums is None:
        mean, rstd = _gn_stats(xf, num_groups)
    else:
        from ..ops.fused_gn import gn_finalize_sums

        C = x.shape[-1]
        g = min(num_groups, C)
        HW = int(np.prod(x.shape[1:-1]))
        mean, rstd = gn_finalize_sums(sums, HW, C // g)
    h = _gn_apply(xf, mean, rstd, gn_p["scale"].astype(jnp.float32),
                  gn_p["bias"].astype(jnp.float32), num_groups)
    if act == "swish":
        h = h * jax.nn.sigmoid(h)
    return tuple(_quant_i8(h, s, z, b) for (s, z, b) in quant_params)


def int8_conv(xq, gq_flat, ksize: int, *, stride: int = 1):
    """1x1 int8 NHWC conv on the MXU.  xq [B,H,W,C] int8 (unpadded), gq_flat
    [Cp, Np] int8.  Returns int32 [B,H,W,Np].

    1x1 ONLY: spatial padding in the quantized domain is not literal-zero
    (q=0 decodes to zp/s, not 0.0) — 3x3 convs must use the qzero-halo
    variants below (int8_conv3_qzero / int8_conv3_qzero_down)."""
    assert ksize == 1, "use int8_conv3_qzero for 3x3 (quantized-zero halo)"
    B, H, W, C = xq.shape
    Np = gq_flat.shape[-1]
    Cp = gq_flat.shape[0]
    if Cp != C:
        xq = jnp.pad(xq, ((0, 0), (0, 0), (0, 0), (0, Cp - C)))
    return jax.lax.conv_general_dilated(
        xq,
        gq_flat.reshape(1, 1, Cp, Np),
        (stride, stride),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def _epilogue(dot, lay_i: ServingLayer, co: int):
    """int32 accumulator -> f32 output (per-out-channel dequant + bias)."""
    out = dot.astype(jnp.float32) * lay_i.inv_ws + lay_i.zcbias
    return out[..., :co]


# NOTE on padding correctness: int8_conv zero-pads the QUANTIZED tensor, i.e.
# pad value q=0, which decodes to x_hat = zp/s, NOT 0.  The interception path
# (ops/quant_conv.quantized_conv2d_int8_prefolded) instead pads x with 0.0
# BEFORE quantizing, giving q = round(-zp).  To keep the two paths equivalent
# we quantize the spatially-padded tensor where it matters; for the fused
# path the quantize step runs before padding, so we pad with the per-channel
# quantized-zero explicitly:


def _pad_qzero(xq, zp, a_bit):
    """Spatial +1 halo filled with each channel's quantized zero."""
    n = 2 ** (a_bit - 1)
    qz = jnp.clip(jnp.round(-zp), -n, n - 1).astype(jnp.int8)  # [C]
    B, H, W, C = xq.shape
    out = jnp.broadcast_to(qz, (B, H + 2, W + 2, C))
    return jax.lax.dynamic_update_slice(out, xq, (0, 1, 1, 0))


def int8_conv3_qzero_down(xq, zp, a_bit, gq_flat):
    """3x3 stride-2 int8 downsample conv with the reference's asymmetric
    (0,1),(0,1) zero pad (models/diffusion.py Downsample: F.pad(x,(0,1,0,1))
    then stride-2 VALID), padding in the int8 domain with each channel's
    quantized zero so it decodes to 0.0 like the interception path."""
    B, H, W, C = xq.shape
    Cp = gq_flat.shape[0] // 9
    n = 2 ** (a_bit - 1)
    qz = jnp.clip(jnp.round(-zp), -n, n - 1).astype(jnp.int8)  # [C]
    xp = jnp.broadcast_to(qz, (B, H + 1, W + 1, C))
    xp = jax.lax.dynamic_update_slice(xp, xq, (0, 0, 0, 0))
    if Cp != C:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, Cp - C)))
    return jax.lax.conv_general_dilated(
        xp,
        gq_flat.reshape(3, 3, Cp, gq_flat.shape[-1]),
        (2, 2),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def int8_conv3_qzero(xq, zp, a_bit, gq_flat):
    """3x3 int8 conv with correct per-channel quantized-zero halo."""
    B, H, W, C = xq.shape
    Np = gq_flat.shape[-1]
    Cp = gq_flat.shape[0] // 9
    xp = _pad_qzero(xq, zp, a_bit)
    if Cp != C:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, Cp - C)))
    return jax.lax.conv_general_dilated(
        xp,
        gq_flat.reshape(3, 3, Cp, Np),
        (1, 1),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


# ---------------------------------------------------------------------------
# fused forward
# ---------------------------------------------------------------------------


def _conv_any(name, x, p, rt_i, qunet, qstates, step_idx, *, stride=1, padding="SAME"):
    """Single-conv dispatch for sites outside the fused resblock chain:
    int8 when covered, fake-quant fallback otherwise (same policy as
    int8_runtime.make_int8_conv_apply)."""
    lay = rt_i.get(name)
    if lay is not None and stride == 1:
        kh = p["kernel"].shape[0]
        co = p["kernel"].shape[3]
        xq = _quant_i8(x.astype(jnp.float32), lay.act_scale, lay.act_zp, qunet.policy[name].a_bit)
        if kh == 3:
            dot = int8_conv3_qzero(xq, lay.act_zp, qunet.policy[name].a_bit, lay.gq)
        else:
            dot = int8_conv(xq, lay.gq, 1)
        return _epilogue(dot, lay, co)
    pol = qunet.policy.get(name)
    if pol is not None and name in qstates:
        xq = quantize_activation(x.astype(jnp.float32), qstates[name], step_idx, pol.a_bit)
        return conv2d(xq.astype(p["kernel"].dtype), p, stride=stride, padding=padding)
    return conv2d(x, p, stride=stride, padding=padding)


def _predequant_bf16(dot, lay_i: ServingLayer):
    """Fold the per-channel dequant + bias into the conv's own XLA output
    fusion and hand the Pallas epilogue a bf16 tensor instead of the int32
    accumulator — the conv->epilogue HBM round trip halves (4B -> 2B per
    element each way).  bf16 rounds the ALREADY-BIAS-CORRECTED value (rel err
    <= 2^-9 of the signal, below one 8-bit activation LSB), not the raw
    accumulator whose zero-point term can dwarf the signal."""
    h = dot.astype(jnp.float32) * lay_i.inv_ws + lay_i.zcbias
    return h.astype(jnp.bfloat16)


def _identity_epi(lay_i: ServingLayer):
    """(inv_ws, zcbias) that make the epilogue kernels a no-op dequant, for
    inputs already pre-dequantized by `_predequant_bf16`."""
    return jnp.ones_like(lay_i.inv_ws), jnp.zeros_like(lay_i.zcbias)


def _conv3_bf16(xq, zp, a_bit, lay_i: ServingLayer, *, conv_pallas):
    """3x3 int8 conv -> pre-dequantized bf16 (the dot_bf16 layout).

    `conv_pallas` routes through the implicit-im2col Pallas kernel
    (ops/pallas_conv.py) when the shape fits AND the measured per-shape
    policy says the kernel beats XLA there (conv3_pallas_wins — 1.5-1.6x on
    Np>=256 res>=8 shapes; XLA keeps the Np=128 and 4^2 shapes it wins):
    the 9 taps run as MXU matmuls from one VMEM-resident input tile and the
    dequant+bias epilogue is fused so the int32 accumulator never exists in
    HBM.  Falls back to the XLA conv (whose own output fusion absorbs
    `_predequant_bf16`) otherwise.

    `conv_pallas` is False (off), True (measured per-shape routing), "all"
    (route every VMEM-eligible shape — tests / re-measurement), or an
    explicit collection of (H, Cp, Np) triples (surgical in-graph A/B of a
    single shape)."""
    if conv_pallas:
        from ..ops.pallas_conv import (
            conv3_pallas_fits, conv3_pallas_wins, int8_conv3_pallas)

        B, H, W, C = xq.shape
        Cp = lay_i.gq.shape[0] // 9
        Np = lay_i.gq.shape[-1]
        if isinstance(conv_pallas, (tuple, list, set, frozenset)):
            route = (H, Cp, Np) in set(map(tuple, conv_pallas))
        else:
            route = conv_pallas == "all" or conv3_pallas_wins(B, H, W, Cp, Np)
        if conv3_pallas_fits(B, H, W, Cp, Np) and route:
            xp = _pad_qzero(xq, zp, a_bit)
            if Cp != C:
                xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, Cp - C)))
            return int8_conv3_pallas(
                xp, lay_i.gq, lay_i.inv_ws, lay_i.zcbias, out_dtype=jnp.bfloat16
            )
    return _predequant_bf16(int8_conv3_qzero(xq, zp, a_bit, lay_i.gq), lay_i)


def _entry_gn_quant(h_res, gn_p, quant_params, *, sums=None, entry_pallas=False):
    """Resblock/conv entry: GN -> swish -> quantize.

    Default: XLA two-pass (stats reduce + fused normalize/swish/quantize).
    `entry_pallas` routes through the one-pass Pallas kernel
    (ops/fused_gn.gn_act_quant) — one HBM read of the residual instead of
    two, worthwhile when the residual stream is bf16 and the shape fits
    whole-image VMEM blocks.  With precomputed `sums` (boundary fusion) the
    XLA path is already one-pass, so Pallas buys nothing — use XLA."""
    if entry_pallas and sums is None:
        from ..ops.fused_gn import gn_act_quant, gn_act_quant_fits

        C = h_res.shape[-1]
        HW = int(np.prod(h_res.shape[1:-1]))
        if gn_act_quant_fits(HW, C):
            return gn_act_quant(h_res, gn_p["scale"], gn_p["bias"], quant_params)
    return gn_act_quant_xla(h_res, gn_p, quant_params, sums=sums)


def _resblock_fused(name, p, h_res, temb_act, rt_i, qunet, qstates, step_idx, res_dtype,
                    entry_sums=None, want_exit_stats=False, dot_bf16=False,
                    entry_pallas=False, conv_pallas=False, resblock_pallas=False):
    """norm1->swish->conv1->(+temb)->norm2->swish->conv2 (+shortcut), fused.

    Graph identical to models/unet.py::_resblock_apply (inference, no
    dropout); reference models/diffusion.py:82-136 intent without defect D7.

    Boundary fusion (round 3): `entry_sums` are the previous fused exit's GN
    sums over this block's input (skips the norm1 stats read);
    `want_exit_stats=True` asks the exit to produce residual' AND the next
    norm1's sums in one Pallas pass.  Returns (residual', exit_sums|None).
    """
    c1, c2 = rt_i.get(f"{name}.conv1"), rt_i.get(f"{name}.conv2")
    a1 = qunet.policy.get(f"{name}.conv1")
    a2 = qunet.policy.get(f"{name}.conv2")
    co1 = p["conv1"]["kernel"].shape[3]
    co2 = p["conv2"]["kernel"].shape[3]
    tproj = dense(swish(temb_act), p["temb_proj"]).astype(jnp.float32)  # [B, co1]

    hf = h_res.astype(jnp.float32)
    fused = c1 is not None and c2 is not None and c1.zcbias.shape[-1] == co1

    # whole-resblock mega-kernel (ops/pallas_resblock.py): identity-residual
    # blocks run GN1->conv1->+temb->GN2->conv2->+r in ONE Pallas program —
    # one HBM read, one write.  Shortcut blocks / boundary-fusion callers
    # keep the unfused chain.  Own lever (`resblock_pallas`, independent of
    # the per-conv routing) so the A/B grid can separate the glue saving
    # from the conv-rate change.
    if (
        fused and dot_bf16 and resblock_pallas
        and entry_sums is None and not want_exit_stats
        and "conv_shortcut" not in p and "nin_shortcut" not in p
        and h_res.shape[-1] == co1 == co2
        and c1.gq.shape[-1] == co1 and c2.gq.shape[-1] == co2
    ):
        from ..ops.pallas_conv import conv3_pallas_wins
        from ..ops.pallas_resblock import resblock_pallas_fits
        from ..ops.pallas_resblock import resblock_pallas as _rb_kernel

        B_, H_, W_, C_ = h_res.shape
        # per-shape gate: the mega-kernel's convs use the Pallas taps, so
        # fuse only where those taps win (conv3_pallas_wins) — the glue
        # saving cannot be assumed to cover a conv-rate LOSS (32^2 C128:
        # -148 us/block of conv).  "all" overrides for re-measurement.
        if resblock_pallas_fits(B_, H_, W_, C_) and (
            resblock_pallas == "all" or conv3_pallas_wins(B_, H_, W_, C_, C_)
        ):
            out = _rb_kernel(
                h_res, tproj,
                p["norm1"]["scale"], p["norm1"]["bias"],
                (c1.act_scale, c1.act_zp), c1.gq, (c1.inv_ws, c1.zcbias),
                p["norm2"]["scale"], p["norm2"]["bias"],
                (c2.act_scale, c2.act_zp), c2.gq, (c2.inv_ws, c2.zcbias),
                a_bit1=a1.a_bit, a_bit2=a2.a_bit, out_dtype=res_dtype,
            )
            return out, None

    dot2 = None
    if fused:
        (hq,) = _entry_gn_quant(h_res, p["norm1"], [(c1.act_scale, c1.act_zp, a1.a_bit)],
                                sums=entry_sums, entry_pallas=entry_pallas)
        # fused Pallas epilogue: int32 -> (+temb) -> GN2 -> swish -> int8
        if dot_bf16:
            ones1, zeros1 = _identity_epi(c1)
            hq2 = epilogue_gn_swish_quant(
                _conv3_bf16(hq, c1.act_zp, a1.a_bit, c1, conv_pallas=conv_pallas),
                ones1, zeros1, tproj,
                p["norm2"]["scale"], p["norm2"]["bias"],
                c2.act_scale, c2.act_zp, a2.a_bit,
            )
            dot2 = _conv3_bf16(hq2, c2.act_zp, a2.a_bit, c2, conv_pallas=conv_pallas)
        else:
            dot1 = int8_conv3_qzero(hq, c1.act_zp, a1.a_bit, c1.gq)
            hq2 = epilogue_gn_swish_quant(
                dot1, c1.inv_ws, c1.zcbias, tproj,
                p["norm2"]["scale"], p["norm2"]["bias"],
                c2.act_scale, c2.act_zp, a2.a_bit,
            )
            dot2 = int8_conv3_qzero(hq2, c2.act_zp, a2.a_bit, c2.gq)
        h = None  # exit handled below (possibly fused with the residual add)
    else:
        # uncovered conv (shape-ineligible, e.g. C not a multiple of 128) —
        # unfused chain, each conv dispatched individually
        h = swish(group_norm(hf, p["norm1"]))
        h = _conv_any(f"{name}.conv1", h, p["conv1"], rt_i, qunet, qstates, step_idx)
        h = h + tproj[:, None, None, :]
        h = swish(group_norm(h, p["norm2"]))
        h = _conv_any(f"{name}.conv2", h, p["conv2"], rt_i, qunet, qstates, step_idx)

    if "conv_shortcut" in p or "nin_shortcut" in p:
        skey = "conv_shortcut" if "conv_shortcut" in p else "nin_shortcut"
        sname = f"{name}.{skey}"
        lay = rt_i.get(sname)
        if lay is not None:
            pol = qunet.policy[sname]
            xq = _quant_i8(hf, lay.act_scale, lay.act_zp, pol.a_bit)
            kh = p[skey]["kernel"].shape[0]
            if kh == 3:
                dots = int8_conv3_qzero(xq, lay.act_zp, pol.a_bit, lay.gq)
            else:
                dots = int8_conv(xq, lay.gq, 1)
            x_sc = _epilogue(dots, lay, p[skey]["kernel"].shape[3])
        elif sname in qstates:
            pol = qunet.policy[sname]
            xq = quantize_activation(hf, qstates[sname], step_idx, pol.a_bit)
            x_sc = conv2d(xq.astype(p[skey]["kernel"].dtype), p[skey])
        else:
            # shortcut absent from the quant policy (e.g. conv_shortcut in a
            # converted checkpoint) — plain FP conv, like the interception path
            x_sc = conv2d(hf, p[skey])
    else:
        x_sc = hf

    if fused:
        from ..ops.fused_gn import (
            epilogue_residual_gn_stats,
            epilogue_residual_gn_stats_fits,
        )

        B = dot2.shape[0]
        HW = int(np.prod(dot2.shape[1:-1]))
        Np = dot2.shape[-1]
        if (
            want_exit_stats
            and Np == co2  # unpadded fold: the kernel needs no column slice
            and epilogue_residual_gn_stats_fits(HW, Np)
        ):
            if dot_bf16:
                ones2, zeros2 = _identity_epi(c2)
                res_out, sums = epilogue_residual_gn_stats(
                    dot2, ones2, zeros2,  # dot2 is already pre-dequantized bf16
                    x_sc.astype(jnp.float32), out_dtype=res_dtype,
                )
            else:
                res_out, sums = epilogue_residual_gn_stats(
                    dot2, c2.inv_ws, c2.zcbias, x_sc.astype(jnp.float32),
                    out_dtype=res_dtype,
                )
            return res_out, sums
        if dot_bf16:  # identity dequant: dot2 already carries inv_ws + zcbias
            h = dot2.astype(jnp.float32)[..., :co2]
        else:
            h = _epilogue(dot2, c2, co2)
    return (x_sc + h).astype(res_dtype), None


def _attn_fused(name, p, h_res, rt_i, qunet, qstates, step_idx, res_dtype, attn_int8, ar_i=None):
    """DDIM single-head attention with int8 q/k/v/proj projections.

    One GN pass quantizes the normalized tensor at three per-layer scales
    (multi-output) and the 1x1 projections run as int8 convs.  With
    `attn_int8` the whole attention core is the fused Pallas kernel
    (ops/int8_attention.py): int32 accumulators in, int8 proj_out input out —
    logits run as int8 MXU MACs and softmax never touches HBM.  Otherwise
    the core stays f32 einsums.
    """
    B, H, W, C = h_res.shape
    names = [f"{name}.{k}" for k in ("q", "k", "v", "proj_out")]
    lays = [rt_i.get(n) for n in names]
    pols = [qunet.policy.get(n) for n in names]
    hf = h_res.astype(jnp.float32)
    if all(l is not None for l in lays):
        lq, lk, lv, lo = lays
        L = H * W
        # whole-block fused kernel: GN -> int8 q/k/v -> core -> int8 out in
        # ONE HBM pass (ops/int8_attention.fused_attention_block).  Component
        # ablation measured the composed chain at ~8.5 ms/step on the CIFAR
        # serving sampler with the softmax core itself free.
        from ..ops.int8_attention import fused_attention_block, fused_attention_block_fits

        fits = (
            fused_attention_block_fits(L, C)
            and all(l.gq.shape == (C, C) for l in lays)
        )
        if fits:
            # the residual enters the kernel at its own dtype (bf16 stream:
            # no materialized f32 copy before the opaque pallas_call) and the
            # kernel writes res_dtype directly — bit-identical to casting
            # outside, ~4 full-tensor HBM passes fewer per attention site.
            # --attn_int8 composes: the kernel's QK^T core switches to
            # dynamic-scale int8 MXU MACs in-VMEM (no extra HBM traffic),
            # instead of being mutually exclusive with the whole-block pass.
            out_res = fused_attention_block(
                h_res.astype(res_dtype).reshape(B, L, C),
                p["norm"]["scale"], p["norm"]["bias"],
                [(l.act_scale, l.act_zp, pol.a_bit) for l, pol in zip(lays[:3], pols[:3])],
                [(l.gq, l.inv_ws, l.zcbias) for l in lays[:3]],
                (lo.act_scale, lo.act_zp, pols[3].a_bit),
                (lo.gq, lo.inv_ws, lo.zcbias),
                scale=C ** -0.5,
                int8_core=attn_int8,
            )
            return out_res.reshape(B, H, W, C)
        qp = [(l.act_scale, l.act_zp, pol.a_bit) for l, pol in zip(lays[:3], pols[:3])]
        hq, hk, hv = gn_act_quant_xla(hf, p["norm"], qp, act="none")
        if attn_int8 and lq.zcbias.shape[-1] == C:
            L = H * W
            dots = [
                int8_conv(a, l.gq, 1).reshape(B, L, C)
                for a, l in ((hq, lq), (hk, lk), (hv, lv))
            ]
            scales = None
            if ar_i is not None and all(f"{name}.{k}" in ar_i for k in ("q", "k", "v")):
                scales = [jnp.maximum(ar_i[f"{name}.{k}"], 1e-12) / 127.0 for k in ("q", "k", "v")]
            if scales is not None:
                # static calibrated per-step scales: quantize fuses into the
                # projection epilogues (XLA), the kernel reads int8
                from ..ops.int8_attention import fused_int8_attention_static

                q8, k8, v8 = (
                    jnp.clip(
                        jnp.round((d.astype(jnp.float32) * l.inv_ws + l.zcbias) / sc),
                        -127, 127,
                    ).astype(jnp.int8)
                    for d, l, sc in zip(dots, (lq, lk, lv), scales)
                )
                oq = fused_int8_attention_static(
                    q8, k8, v8, scales[0], scales[1], scales[2],
                    lo.act_scale, lo.act_zp, pols[3].a_bit, scale=C**-0.5,
                ).reshape(B, H, W, C)
            else:
                from ..ops.int8_attention import fused_int8_attention

                oq = fused_int8_attention(
                    dots[0], dots[1], dots[2],
                    (lq.inv_ws, lq.zcbias), (lk.inv_ws, lk.zcbias), (lv.inv_ws, lv.zcbias),
                    lo.act_scale, lo.act_zp, pols[3].a_bit, scale=C**-0.5,
                ).reshape(B, H, W, C)
        else:
            q = _epilogue(int8_conv(hq, lq.gq, 1), lq, C)
            k = _epilogue(int8_conv(hk, lk.gq, 1), lk, C)
            v = _epilogue(int8_conv(hv, lv.gq, 1), lv, C)
            q, k, v = (a.reshape(B, H * W, C) for a in (q, k, v))
            h = spatial_attention(q, k, v, scale=C**-0.5).reshape(B, H, W, C)
            oq = _quant_i8(h, lo.act_scale, lo.act_zp, pols[3].a_bit)
        out = _epilogue(int8_conv(oq, lo.gq, 1), lo, C)
    else:
        h = group_norm(hf, p["norm"])
        proj = {}
        for n, key in zip(names, ("q", "k", "v", "proj_out")):
            if key == "proj_out":
                continue
            pol = qunet.policy.get(n)
            xq = quantize_activation(h, qstates[n], step_idx, pol.a_bit)
            proj[key] = conv2d(xq.astype(p[key]["kernel"].dtype), p[key])
        q, k, v = (proj[key].reshape(B, H * W, C) for key in ("q", "k", "v"))
        h = spatial_attention(q, k, v, scale=C**-0.5).reshape(B, H, W, C)
        pol = qunet.policy.get(names[3])
        xq = quantize_activation(h, qstates[names[3]], step_idx, pol.a_bit)
        out = conv2d(xq.astype(p["proj_out"]["kernel"].dtype), p["proj_out"])
    return (hf + out).astype(res_dtype)


def _attn_fused_enhanced(name, p, h_res, rt_i, qunet, qstates, step_idx, res_dtype,
                         mp_ctx=None):
    """EnhancedQSelfAttention on the serving path (reference
    self_attention.py:118-153; models/unet.py::_attn_apply_enhanced).

    No GroupNorm entry — projections quantize the residual stream directly;
    each 1x1 projection dispatches through `_conv_any` (int8 when covered,
    per-projection bit policy: key at max(4, b-2) etc.), the attention core
    stays an f32 einsum at the reference's short sequence lengths, and the
    learnable gamma scales the residual.  `mp_ctx` (stage-3
    mixed-precision attention, quant/attention_mp.py) swaps the core for
    the multi-head logits/probs-quantized one — elementwise work around the
    same einsums, so the flagship combined config (enhanced variant + MP
    core, reference attention_quant_utils.py:51-107) rides the serving
    engine instead of falling back to interception.
    """
    B, H, W, C = h_res.shape
    hf = h_res.astype(jnp.float32)
    q = _conv_any(f"{name}.query_conv", hf, p["query_conv"], rt_i, qunet, qstates, step_idx)
    k = _conv_any(f"{name}.key_conv", hf, p["key_conv"], rt_i, qunet, qstates, step_idx)
    v = _conv_any(f"{name}.value_conv", hf, p["value_conv"], rt_i, qunet, qstates, step_idx)
    Ck = q.shape[-1]
    q = q.reshape(B, H * W, Ck)
    k = k.reshape(B, H * W, Ck)
    v = v.reshape(B, H * W, C)
    mp_state = (mp_ctx or {}).get("mp_states", {}).get(name) if mp_ctx else None
    if mp_state is not None:
        from .attention_mp import mp_attention

        out = mp_attention(
            q, k.transpose(0, 2, 1), v, mp_state,
            num_heads=qunet.cfg.attn_heads,
            base_bits=mp_ctx.get("base_bits", 8),
            timestep=mp_ctx.get("timestep"),
            head_split=mp_ctx.get("head_split", "aligned"),
        )
    else:
        w = jnp.einsum("blc,bmc->blm", q, k, preferred_element_type=jnp.float32)
        w = jax.nn.softmax(w * (Ck ** -0.5), axis=-1)
        out = jnp.einsum("blm,bmc->blc", w, v, preferred_element_type=jnp.float32)
    out = out.reshape(B, H, W, C)
    out = _conv_any(f"{name}.output_conv", out, p["output_conv"], rt_i, qunet, qstates, step_idx)
    return (p["gamma"].astype(jnp.float32) * out + hf).astype(res_dtype)


def serving_unet_apply(
    params,
    cfg: UNetConfig,
    qunet: QuantizedUNet,
    runtime: Dict[str, ServingLayer],
    qstates: Dict[str, ActQuantState],
    x: jax.Array,
    t: jax.Array,
    step_idx,
    *,
    residual_dtype=jnp.float32,
    attn_int8: bool = True,
    attn_ranges=None,
    boundary_fusion: bool = False,
    dot_bf16: bool = True,
    entry_pallas: bool = False,
    conv_pallas: bool | str = False,
    resblock_pallas: bool | str = False,
    mp_states=None,
    mp_base_bits: int = 8,
) -> jax.Array:
    """Fused int8-resident forward.  Mirrors models/unet.py::unet_apply
    (inference path) — there is a test asserting the two stay in lockstep.

    The "ddim" and "enhanced" attention variants are supported; `mp_states`
    ({layer_name: MPAttentionState}) additionally enables the stage-3
    mixed-precision attention core on the enhanced variant (timestep taken
    from `t`, like the interception path does).
    """
    if cfg.attn_variant not in ("ddim", "enhanced"):
        raise NotImplementedError(f"serving path: unknown attn variant {cfg.attn_variant}")
    rt_i = {k: _unpack_layer(v) for k, v in gather_step(runtime, step_idx).items()}
    ar_i = None if attn_ranges is None else jax.tree_util.tree_map(lambda a: a[step_idx], attn_ranges)
    num_levels = len(cfg.ch_mult)

    if cfg.attn_variant == "enhanced":
        mp_ctx = None
        if mp_states:
            mp_ctx = {
                "mp_states": mp_states,
                "base_bits": mp_base_bits,
                "timestep": t.reshape(-1)[0].astype(jnp.int32),
            }

        def attn_site(nm, pp, hh):
            return _attn_fused_enhanced(nm, pp, hh, rt_i, qunet, qstates, step_idx,
                                        residual_dtype, mp_ctx=mp_ctx)
    else:
        def attn_site(nm, pp, hh):
            return _attn_fused(nm, pp, hh, rt_i, qunet, qstates, step_idx,
                               residual_dtype, attn_int8, ar_i)

    temb = get_timestep_embedding(t, cfg.ch)
    temb = dense(temb, params["temb"]["dense0"])
    temb = swish(temb)
    temb = dense(temb, params["temb"]["dense1"])

    def conv_site(name, h, *, stride=1, padding="SAME"):
        return _conv_any(name, h, _lookup(params, name), rt_i, qunet, qstates, step_idx,
                         stride=stride, padding=padding)

    hs = [conv_site("conv_in", x.astype(jnp.float32)).astype(residual_dtype)]
    # boundary fusion: `sums` carries the previous fused exit's GN statistics
    # when (and only when) the next consumer is a resblock norm1 over exactly
    # that tensor — attention, downsampling, and up-path concats reset it.
    # OPT-IN (default off): measured end-to-end NEUTRAL at CIFAR scale
    # (74.4 vs 74.9 img/s interleaved A/B, -0.6%) — the eligible boundaries
    # save ~0.2 ms of HBM reads per step while the extra Pallas dispatch
    # costs about the same; XLA already overlaps the stats read it removes.
    sums = None
    for i_level in range(num_levels):
        lp = params["down"][i_level]
        has_attn = bool(lp["attn"])
        for i_block in range(cfg.num_res_blocks):
            last_blk = i_block == cfg.num_res_blocks - 1
            want = (boundary_fusion and not has_attn
                    and (not last_blk or i_level == num_levels - 1))
            h, sums = _resblock_fused(
                f"down.{i_level}.block.{i_block}", lp["block"][i_block], hs[-1],
                temb, rt_i, qunet, qstates, step_idx, residual_dtype,
                entry_sums=sums, want_exit_stats=want, dot_bf16=dot_bf16,
                entry_pallas=entry_pallas, conv_pallas=conv_pallas,
                resblock_pallas=resblock_pallas,
            )
            if lp["attn"]:
                h = attn_site(f"down.{i_level}.attn.{i_block}", lp["attn"][i_block], h)
                sums = None
            hs.append(h)
        if i_level != num_levels - 1:
            sums = None
            nm = f"down.{i_level}.downsample"
            if cfg.resamp_with_conv:
                lay = rt_i.get(f"{nm}.conv")
                if lay is not None:
                    # int8 stride-2 downsample (asymmetric qzero pad)
                    pol = qunet.policy[f"{nm}.conv"]
                    co = _lookup(params, f"{nm}.conv")["kernel"].shape[3]
                    xq = _quant_i8(hs[-1].astype(jnp.float32), lay.act_scale, lay.act_zp, pol.a_bit)
                    dot = int8_conv3_qzero_down(xq, lay.act_zp, pol.a_bit, lay.gq)
                    hd = _epilogue(dot, lay, co)
                else:
                    hpad = jnp.pad(hs[-1], ((0, 0), (0, 1), (0, 1), (0, 0)))
                    hd = conv_site(f"{nm}.conv", hpad, stride=2, padding="VALID")
            else:
                hd = jax.lax.reduce_window(
                    hs[-1].astype(jnp.float32), 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                ) / 4.0
            hs.append(hd.astype(residual_dtype))

    h = hs[-1]
    h, _ = _resblock_fused("mid.block_1", params["mid"]["block_1"], h, temb, rt_i,
                           qunet, qstates, step_idx, residual_dtype, entry_sums=sums,
                           dot_bf16=dot_bf16, entry_pallas=entry_pallas,
                           conv_pallas=conv_pallas,
                           resblock_pallas=resblock_pallas)
    h = attn_site("mid.attn_1", params["mid"]["attn_1"], h)
    h, _ = _resblock_fused("mid.block_2", params["mid"]["block_2"], h, temb, rt_i,
                           qunet, qstates, step_idx, residual_dtype, dot_bf16=dot_bf16,
                           entry_pallas=entry_pallas, conv_pallas=conv_pallas,
                           resblock_pallas=resblock_pallas)

    for i_level in reversed(range(num_levels)):
        lp = params["up"][i_level]
        for i_block in range(cfg.num_res_blocks + 1):
            h, _ = _resblock_fused(
                f"up.{i_level}.block.{i_block}", lp["block"][i_block],
                jnp.concatenate([h, hs.pop()], axis=-1),
                temb, rt_i, qunet, qstates, step_idx, residual_dtype,
                dot_bf16=dot_bf16, entry_pallas=entry_pallas,
                conv_pallas=conv_pallas, resblock_pallas=resblock_pallas,
            )
            if lp["attn"]:
                h = attn_site(f"up.{i_level}.attn.{i_block}", lp["attn"][i_block], h)
        if i_level != 0:
            B_, H_, W_, C_ = h.shape
            nm = f"up.{i_level}.upsample.conv"
            lay = rt_i.get(nm) if cfg.resamp_with_conv else None
            if lay is not None:
                # int8-domain nearest upsample: quantize at LOW res, then
                # duplicate int8 entries.  Nearest-neighbor resize commutes
                # exactly with per-channel quantization (q(resize(h)) ==
                # resize(q(h)) element-for-element), so this is bit-identical
                # to resize-then-quantize while the full-size f32 tensor and
                # its quantize pass never touch HBM.
                pol = qunet.policy[nm]
                co = _lookup(params, nm)["kernel"].shape[3]
                xq = _quant_i8(h.astype(jnp.float32), lay.act_scale, lay.act_zp, pol.a_bit)
                xq = jnp.repeat(jnp.repeat(xq, 2, axis=1), 2, axis=2)
                dot = int8_conv3_qzero(xq, lay.act_zp, pol.a_bit, lay.gq)
                h = _epilogue(dot, lay, co).astype(residual_dtype)
            else:
                h = jax.image.resize(h, (B_, 2 * H_, 2 * W_, C_), method="nearest")
                if cfg.resamp_with_conv:
                    h = conv_site(nm, h).astype(residual_dtype)
    assert not hs

    # norm_out -> swish -> conv_out (conv_out is eligible at ci>=64)
    lay = rt_i.get("conv_out")
    if lay is not None:
        pol = qunet.policy["conv_out"]
        (hq,) = _entry_gn_quant(h, params["norm_out"],
                                [(lay.act_scale, lay.act_zp, pol.a_bit)],
                                entry_pallas=entry_pallas)
        dot = int8_conv3_qzero(hq, lay.act_zp, pol.a_bit, lay.gq)
        h = _epilogue(dot, lay, cfg.out_ch)
    else:
        h = swish(group_norm(h.astype(jnp.float32), params["norm_out"]))
        h = conv_site("conv_out", h)
    return h.astype(jnp.float32)


# ---------------------------------------------------------------------------
# sampler integration (+ chunked low-HBM mode)
# ---------------------------------------------------------------------------


def _slice_states(qstates: Dict[str, ActQuantState], sl: slice) -> Dict[str, ActQuantState]:
    return jax.tree_util.tree_map(lambda a: a[sl], qstates)


def serving_ddim_sampler(
    qunet: QuantizedUNet,
    params,
    qstates: Dict[str, ActQuantState],
    seq,
    betas,
    *,
    eta: float = 0.0,
    step_chunk: int | None = None,
    micro_batch: int | None = None,
    residual_dtype=jnp.float32,
    symmetric: bool = True,
    attn_int8: bool = True,
    attn_ranges=None,
    weight_extras=None,
    boundary_fusion: bool = False,
    dot_bf16: bool = True,
    entry_pallas: bool = False,
    conv_pallas: bool | str = False,
    resblock_pallas: bool | str = False,
    pack_int4: bool = False,
    rank1: bool = False,
    update: str = "ddim",
    mp_states=None,
    mp_base_bits: int = 8,
    runtime: Dict[str, ServingLayer] | None = None,
):
    """Build a jitted sampler over the fused int8 serving path.

    `runtime` (unchunked mode only): a prebuilt `prepare_serving_runtime`
    tree to reuse.  The folded weights are ~S x params int8 — callers
    building several samplers over the SAME fold (e.g. the A/B lever grid,
    which only varies compute-path flags) must share one runtime or the
    copies alone exhaust HBM (7 x 3.5 GB > a v5e's 16 GB).

    `dot_bf16=True` (default since the round-4 lever grid,
    benchmarks/ab_levers_r4.log): the conv's per-channel dequant+bias folds
    into its XLA epilogue and the Pallas resblock epilogues read bf16
    instead of the int32 accumulator — +3.0% interleaved A/B at the
    headline config, deviation <=1 int8 LSB.  `entry_pallas` measured -7.9%
    at the same operating point (XLA overlaps the two-pass GN entry better
    than the one-pass kernel's extra dispatch) and stays opt-in;
    `boundary_fusion` re-measured neutral (+0.2%).

    `update` selects the per-step rule: "ddim" (generalized, `eta`-noised,
    reference functions/denoising.py:15-59) or "ddpm" (ancestral,
    always-noised, reference functions/denoising.py:119-151; `eta` is
    ignored).  The eps model, per-step folds, chunking, and rank-1 shared
    folds are identical between the two — only the scan body's update
    algebra differs.

    `step_chunk=k` folds per-step weights lazily, k steps at a time, bounding
    the folded-weight HBM residency to k x params int8 instead of S x params
    (CIFAR DDIM-100 full-fold is ~3.5 GB; LSUN-113M/ImageNet-301M at 100
    steps would be 11-30 GB and NEED chunking).  The fold work is identical
    either way — chunking trades nothing but a second scan compile for the
    memory bound.  Chunked and unchunked outputs are identical (tested).

    `micro_batch=m` (chunked mode only) advances the batch through each
    chunk m images at a time: pass a large x (a "superbatch") and the fold
    work per chunk is paid once per superbatch instead of once per
    activation-sized batch — a 50k `--fid` run's fold overhead drops by the
    superbatch/micro ratio.  Activation HBM stays bounded by m.  When the
    sampler draws noise (eta > 0, or update="ddpm") each micro-batch uses an
    independent stream (jax.random.fold_in(key, i)), so outputs match the
    un-micro-batched sampler only in the deterministic eta == 0 DDIM config.

    `weight_extras` {name: quant.adaround.WeightExtras}: AdaRound offsets +
    bias-correction means threaded into every fold.

    Returns ``sample(x, key=None) -> x_final``.
    """
    from ..diffusion.sampling import _seq_alphas

    if update not in ("ddim", "ddpm"):
        raise ValueError(f"update must be 'ddim' or 'ddpm', got {update!r}")
    if runtime is not None and step_chunk is not None:
        raise ValueError("a prebuilt runtime holds ALL steps' folds — "
                         "incompatible with step_chunk's lazy per-chunk folds")
    if rank1 and step_chunk is not None:
        raise ValueError(
            "rank1 shared folds make step_chunk unnecessary (fold HBM is "
            "params-sized at any schedule length) — drop one of the two"
        )
    t_rev, _, at, at_next = _seq_alphas(betas, seq)
    S = t_rev.shape[0]

    def _scan_segment(p_, qs_, rt_, ar_, mp_, x, key, t_seg, at_seg, atn_seg):
        n = x.shape[0]

        def body(carry, inp):
            xt, k = carry
            t_i, at_i, atn_i, idx = inp
            et = serving_unet_apply(
                p_, qunet.cfg, qunet, rt_, qs_, xt, jnp.full((n,), t_i, jnp.float32),
                idx, residual_dtype=residual_dtype, attn_int8=attn_int8, attn_ranges=ar_,
                boundary_fusion=boundary_fusion, dot_bf16=dot_bf16,
                entry_pallas=entry_pallas, conv_pallas=conv_pallas,
                resblock_pallas=resblock_pallas,
                mp_states=mp_, mp_base_bits=mp_base_bits,
            )
            from ..diffusion.sampling import ddim_step, ddpm_step

            k, sub = jax.random.split(k)
            if update == "ddpm":
                noise = jax.random.normal(sub, xt.shape, xt.dtype)
                xt_next, _ = ddpm_step(xt, et, at_i, atn_i, t_i, noise)
            else:
                noise = jax.random.normal(sub, xt.shape, xt.dtype) if eta > 0 else jnp.zeros_like(xt)
                xt_next, _ = ddim_step(xt, et, at_i, atn_i, eta, noise)
            return (xt_next, k), None

        idxs = jnp.arange(t_seg.shape[0], dtype=jnp.int32)
        (xf, key), _ = jax.lax.scan(body, (x, key), (t_seg, at_seg, atn_seg, idxs))
        return xf, key

    seg_jit = jax.jit(_scan_segment)

    if step_chunk is None:
        if runtime is None:
            runtime = prepare_serving_runtime(
                qunet, params, qstates, symmetric=symmetric, weight_extras=weight_extras,
                pack_int4=pack_int4, rank1=rank1,
            )

        def sample(x, key=None):
            key = jax.random.PRNGKey(0) if key is None else key
            xf, _ = seg_jit(params, qstates, runtime, attn_ranges, mp_states, x, key,
                            t_rev.astype(jnp.float32), at, at_next)
            return xf

        return sample

    bounds = [(c, min(c + step_chunk, S)) for c in range(0, S, step_chunk)]

    def sample(x, key=None):
        key = jax.random.PRNGKey(0) if key is None else key
        mb = micro_batch or x.shape[0]
        n_mb = -(-x.shape[0] // mb)
        xs = [x[i * mb : (i + 1) * mb] for i in range(n_mb)]
        keys = [key if n_mb == 1 else jax.random.fold_in(key, i) for i in range(n_mb)]
        for c0, c1 in bounds:
            sl = slice(c0, c1)
            rt = prepare_serving_runtime(
                qunet, params, qstates, symmetric=symmetric, steps=sl,
                weight_extras=weight_extras, pack_int4=pack_int4,
            )
            qs = _slice_states(qstates, sl)
            ar = None if attn_ranges is None else jax.tree_util.tree_map(lambda a: a[sl], attn_ranges)
            for i in range(n_mb):
                xs[i], keys[i] = seg_jit(params, qs, rt, ar, mp_states, xs[i], keys[i],
                                         t_rev[sl].astype(jnp.float32), at[sl], at_next[sl])
        return xs[0] if n_mb == 1 else jnp.concatenate(xs, axis=0)

    return sample


def serving_model_fn(
    qunet: QuantizedUNet,
    runtime: Dict[str, ServingLayer],
    params,
    qstates: Dict[str, ActQuantState],
    *,
    residual_dtype=jnp.float32,
    attn_int8: bool = True,
    attn_ranges=None,
    boundary_fusion: bool = False,
    dot_bf16: bool = True,
    entry_pallas: bool = False,
    conv_pallas: bool | str = False,
    resblock_pallas: bool | str = False,
    mp_states=None,
    mp_base_bits: int = 8,
):
    """Sampler-compatible `(x, t, step_idx) -> eps` closure (RAW params)."""

    def fn(x, t, step_idx):
        return serving_unet_apply(
            params, qunet.cfg, qunet, runtime, qstates, x, t, step_idx,
            residual_dtype=residual_dtype, attn_int8=attn_int8, attn_ranges=attn_ranges,
            boundary_fusion=boundary_fusion, dot_bf16=dot_bf16,
            entry_pallas=entry_pallas, conv_pallas=conv_pallas,
            resblock_pallas=resblock_pallas,
            mp_states=mp_states, mp_base_bits=mp_base_bits,
        )

    return fn
