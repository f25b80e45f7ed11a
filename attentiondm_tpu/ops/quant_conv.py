"""True int8 quantized conv/matmul Pallas TPU kernels.

The reference only *fake*-quantizes and then runs float cuDNN convs
(utils/quant_util.py:383-385) — the quantization buys no speed.  Here the
hot path executes real int8 MACs on the MXU (2x bf16 throughput on v5e) and
moves activations through HBM as int8 (4x less traffic than f32).

Math (asymmetric, q = round(s*x - zp) => x_hat = (q + zp)/s, matching
quant/primitives.py):

    O[m,n] = sum_k x_hat[m,k] * w[k,n]
           = (1/ws_n) * ( DOT_int32[m,n] + wzp_n * ROWSUM[m] ) + ZCORR[n]

where g[k,n] = w[k,n]/s_c(k) has the per-channel activation scales folded in,
(gq, ws, wzp) is g's per-output-channel w_bit quantization, ROWSUM[m] =
sum_k xq[m,k], and ZCORR[n] = sum_k zp_c(k) * g_hat[k,n].  Folding activation
scales into the weight operand is what makes per-channel activation
quantization compatible with an integer GEMM; the fold + requantization is
O(params) per timestep — noise next to the conv FLOPs.

Layout notes: int8 tiles are (32, 128); K and N are padded to 128 (once,
host-side, at weight-fold time).  The conv kernel performs implicit im2col:
each padded input block is read from HBM once, the 3x3 shifts happen in
VMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# int8 matmul kernel
# ---------------------------------------------------------------------------


def _mm_kernel(x_ref, w_ref, o_ref):
    o_ref[:] = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.int32)


def _auto_interpret(interpret):
    """Pallas only compiles on TPU; everywhere else run the interpreter
    (tests on the virtual CPU mesh exercise the same code path)."""
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def int8_matmul(xq: jax.Array, wq: jax.Array, *, block_m: int = 1024, interpret: bool | None = None):
    """[M, K] int8 @ [K, N] int8 -> [M, N] int32 on the MXU.

    K and N must be multiples of 128 (pad at fold time); M is padded here.
    """
    interpret = _auto_interpret(interpret)
    M, K = xq.shape
    K2, N = wq.shape
    assert K == K2 and K % 128 == 0 and N % 128 == 0, (xq.shape, wq.shape)
    Mp = _round_up(M, block_m)
    if Mp != M:
        xq = jnp.pad(xq, ((0, Mp - M), (0, 0)))
    out = pl.pallas_call(
        _mm_kernel,
        grid=(Mp // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N, bytes_accessed=Mp * K + K * N + 4 * Mp * N, transcendentals=0
        ),
        interpret=interpret,
    )(xq, wq)
    return out[:M]


# ---------------------------------------------------------------------------
# implicit-im2col 3x3 conv kernel
# ---------------------------------------------------------------------------


def _conv3x3_kernel(x_ref, w_ref, o_ref, *, H, W, C, N):
    """One batch-block: x [BB, H+2, W+2, C] int8, w [9*C, N] int8 ->
    o [BB*H*W, N] int32.  The nine 3x3 shifts are sliced in VMEM."""
    bb = x_ref.shape[0]
    acc = jnp.zeros((bb * H * W, N), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            xs = x_ref[:, dy : dy + H, dx : dx + W, :].reshape(bb * H * W, C)
            wk = w_ref[(dy * 3 + dx) * C : (dy * 3 + dx + 1) * C, :]
            acc = acc + jnp.dot(xs, wk, preferred_element_type=jnp.int32)
    o_ref[:] = acc


def _pick_block_b(H, W, C, N, budget_bytes=6 * 1024 * 1024):
    """Largest power-of-two batch block that keeps the kernel's VMEM working
    set (acc + out int32 blocks + input halo block + shift slices) under
    budget."""
    per_b = 8 * H * W * N + (H + 2) * (W + 2) * C + 2 * H * W * C
    bb = max(1, budget_bytes // per_b)
    p = 1
    while p * 2 <= bb:
        p *= 2
    return min(p, 8)


def _conv3x3_int8_dot(xq_padded, wq, H, W, C, N, block_b=None, interpret=None):
    interpret = _auto_interpret(interpret)
    if block_b is None:
        block_b = _pick_block_b(H, W, C, N)
    B = xq_padded.shape[0]
    Bp = _round_up(B, block_b)
    if Bp != B:
        xq_padded = jnp.pad(xq_padded, ((0, Bp - B), (0, 0), (0, 0), (0, 0)))
    kern = functools.partial(_conv3x3_kernel, H=H, W=W, C=C, N=N)
    out = pl.pallas_call(
        kern,
        grid=(Bp // block_b,),
        in_specs=[
            pl.BlockSpec(
                (block_b, H + 2, W + 2, C), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((9 * C, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b * H * W, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp * H * W, N), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * H * W * 9 * C * N,
            bytes_accessed=Bp * (H + 2) * (W + 2) * C + 9 * C * N + 4 * Bp * H * W * N,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq_padded, wq)
    return out[: B * H * W]


# ---------------------------------------------------------------------------
# host-side fold + epilogue
# ---------------------------------------------------------------------------


def fold_shrink_search(kernel: jax.Array, act_scale: jax.Array, w_bit: int, symmetric: bool):
    """Per-output-channel MSE-optimal range shrink for the folded kernel
    g = kernel / act_scale (same grid as quant/state.make_weight_quant_state).
    Searched once per layer — callers folding per-step pass the result as
    `shrink` so the per-step fold graph stays candidate-free."""
    # deferred: quant.state pulls in the quant package __init__, whose
    # calibrate import comes back to this module (cycle)
    from ..quant.state import WEIGHT_MSE_SHRINKS

    kh, kw, ci, co = kernel.shape
    g = kernel / act_scale.reshape(1, 1, ci, 1)
    axes = (0, 1, 2)
    n = 2 ** (w_bit - 1)
    ks = jnp.asarray(WEIGHT_MSE_SHRINKS, g.dtype)  # [K]

    def mse_of(k):
        ws_k, wzp_k = weight_grid(g, w_bit, symmetric, k)
        q = jnp.clip(jnp.round(ws_k * g - wzp_k), -n, n - 1)
        return jnp.square((q + wzp_k) / ws_k - g).sum(axis=axes)  # [co]

    errs = jax.vmap(mse_of)(ks)  # [K, co]
    return ks[jnp.argmin(errs, axis=0)]  # [co]


def weight_grid(g, w_bit: int, symmetric: bool, shrink=1.0):
    """Per-output-channel weight quantization grid (ws, wzp) for scale-folded
    weights `g` (last axis = out channels; all other axes reduce).

    THE single source of truth for the grid: the fold
    (`fold_weights_int8`), the rounding optimizers (quant/adaround.py,
    quant/gptq.py — whose offsets only mean anything on the exact grid the
    fold recomputes per step), and the differentiable surrogate
    (quant/calibrate.serving_surrogate_apply) all call this, so grid drift
    between optimizer and deployment is structurally impossible.
    """
    axes = tuple(range(g.ndim - 1))
    n = 2 ** (w_bit - 1)
    if symmetric:
        am = jnp.maximum(jnp.abs(g).max(axis=axes), 1e-8) * shrink
        ws = (n - 1) / am
        wzp = jnp.zeros_like(ws)
    else:
        g_min = jnp.minimum(g.min(axis=axes), 0.0) * shrink
        g_max = jnp.maximum(g.max(axis=axes), 1e-8) * shrink
        ws = (2**w_bit - 1) / (g_max - g_min)
        wzp = jnp.round(ws * g_min) + n
    return ws, wzp


def fold_weights_int8(
    kernel: jax.Array,
    act_scale: jax.Array,
    w_bit: int,
    symmetric: bool = False,
    mse_search: bool = False,
    shrink=None,
    round_offset=None,
):
    """Fold per-input-channel activation scales into the HWIO kernel and
    quantize per output channel at w_bit.

    `symmetric=True` uses zero-point-free (signed symmetric) weight
    quantization: wzp == 0 removes the rowsum term from the int8 epilogue
    entirely (one fewer reduction + elementwise pass per conv per step) at a
    sub-half-bit range cost on near-symmetric conv weights.

    `mse_search` shrinks each output channel's range by the grid factor
    minimizing its weight reconstruction MSE (fold_shrink_search) — the
    dominant quality lever at 4 bits.  Default OFF here (the inline int8
    mode would re-run the 20-candidate search per conv per sampler step,
    ~20x fold-graph blowup); the production per-step folds
    (quant/int8_runtime._fold_all_steps) search once per layer and pass the
    result as `shrink` [co].

    `round_offset` [kh, kw, ci, co] in {0, 1} replaces round-to-nearest with
    AdaRound decisions: q = clip(floor(ws*g - wzp) + offset).  The offsets
    are learned against the layer-output objective on the mean-scale fold
    (quant/adaround.py) and shared across steps, like `shrink`.

    Returns (gq int8 [kh*kw*Cp, Np], ws [Np], wzp [Np], zcorr-ready g_hat
    [kh*kw*Cp, Np] f32) with K and N zero-padded to multiples of 128.
    """
    kh, kw, ci, co = kernel.shape
    g = kernel / act_scale.reshape(1, 1, ci, 1)
    n = 2 ** (w_bit - 1)

    if shrink is None:
        shrink = (
            fold_shrink_search(kernel, act_scale, w_bit, symmetric)
            if mse_search
            else 1.0
        )

    ws, wzp = weight_grid(g, w_bit, symmetric, shrink)  # [co]
    if round_offset is None:
        gq = jnp.clip(jnp.round(ws * g - wzp), -n, n - 1)
    else:
        gq = jnp.clip(jnp.floor(ws * g - wzp) + round_offset, -n, n - 1)
    g_hat = (gq + wzp) / ws

    # pad the CHANNEL axis so each of the kh*kw sub-blocks stays 128-aligned
    Cp = _round_up(ci, 128)
    Np = _round_up(co, 128)
    gq = jnp.pad(gq, ((0, 0), (0, 0), (0, Cp - ci), (0, Np - co)))
    g_hat = jnp.pad(g_hat, ((0, 0), (0, 0), (0, Cp - ci), (0, Np - co)))
    ws = jnp.pad(ws, (0, Np - co), constant_values=1.0)
    wzp = jnp.pad(wzp, (0, Np - co))
    return (
        gq.reshape(kh * kw * Cp, Np).astype(jnp.int8),
        ws,
        wzp,
        g_hat.reshape(kh * kw * Cp, Np),
    )


def quantized_conv2d_int8_prefolded(
    x: jax.Array,
    gq: jax.Array,  # [kh*kw*Cp, Np] int8 (from fold_weights_int8)
    ws: jax.Array,  # [Np]
    wzp: jax.Array,  # [Np]
    zcorr: jax.Array,  # [Np]
    bias: jax.Array,  # [co]
    act_scale: jax.Array,  # [C]
    act_zp: jax.Array,  # [C]
    a_bit: int,
    ksize: int,
    co: int,
    *,
    symmetric: bool = False,
    interpret: bool | None = None,
):
    """int8 conv with weights already folded+quantized (the sampler-scan path:
    all per-step weight tensors are precomputed outside the scan and gathered
    by step index — the fold must NOT run per step, it costs more than the
    conv itself).  With `symmetric=True` (wzp == 0) the rowsum reduction and
    its epilogue term are skipped."""
    B, H, W, C = x.shape
    n = 2 ** (a_bit - 1)
    Np = gq.shape[1]
    Cp = gq.shape[0] // (ksize * ksize)

    if ksize == 3:
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    else:
        xp = x
    xq = jnp.clip(jnp.round(act_scale * xp - act_zp), -n, n - 1)
    xq = jnp.pad(xq, ((0, 0), (0, 0), (0, 0), (0, Cp - C))).astype(jnp.int8)

    rows = B * H * W
    if ksize == 3:
        # XLA-native int8 convolution — measured at int8-peak TOPS on v5e
        # (our Pallas implicit-im2col kernel pays Mosaic relayout costs on the
        # shifted slices; it remains in this module as a tested reference).
        gq_hwio = gq.reshape(3, 3, Cp, Np)
        dot = jax.lax.conv_general_dilated(
            xq,
            gq_hwio,
            (1, 1),
            "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        ).reshape(rows, Np)
    else:
        xq2 = xq.reshape(rows, Cp)
        dot = jax.lax.dot_general(
            xq2, gq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    if symmetric:
        out = dot.astype(jnp.float32) / ws[None, :] + zcorr[None, :]
    else:
        if ksize == 3:
            chan_sum = xq.astype(jnp.int32).sum(axis=-1)
            box = jax.lax.reduce_window(chan_sum, 0, jax.lax.add, (1, 3, 3), (1, 1, 1), "VALID")
            rowsum = box.reshape(rows)
        else:
            rowsum = xq.reshape(rows, Cp).astype(jnp.int32).sum(axis=-1)
        out = (
            dot.astype(jnp.float32) + wzp[None, :] * rowsum[:, None].astype(jnp.float32)
        ) / ws[None, :] + zcorr[None, :]
    return out.reshape(B, H, W, Np)[..., :co] + bias


def zcorr_from_fold(g_hat: jax.Array, act_zp: jax.Array, ksize: int, C: int):
    """ZCORR[n] = sum_k zp_c(k) * g_hat[k, n] for a folded weight matrix."""
    Cp = g_hat.shape[0] // (ksize * ksize)
    zp_pad = jnp.pad(act_zp, (0, Cp - C))
    return jnp.tile(zp_pad, ksize * ksize) @ g_hat


def quantized_conv2d_int8(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    act_min: jax.Array,
    act_max: jax.Array,
    a_bit: int,
    w_bit: int,
    *,
    stride: int = 1,
    interpret: bool | None = None,
):
    """Full quantized conv: per-channel asym act quant at a_bit + folded
    per-out-channel weight quant at w_bit, executed as int8 MACs.

    x: [B, H, W, C] float (NHWC, SAME padding semantics for 3x3 / 1x1).
    act_min/max: [C] effective per-channel ranges (e.g. from
    `quant.state.mixed_ranges`).  Returns float32 [B, HO, WO, co].

    Semantically the activation side matches `fake_quant` exactly (same
    integer grid); the weight side quantizes the scale-folded matrix, which
    is where a real int8 engine must put the per-channel factors.
    """
    B, H, W, C = x.shape
    kh, kw, ci, co = kernel.shape
    assert ci == C
    n_lv = 2**a_bit - 1
    s = n_lv / (act_max - act_min)  # [C]
    zp = jnp.round(s * act_min) + 2 ** (a_bit - 1)
    n = 2 ** (a_bit - 1)

    gq, ws, wzp, g_hat = fold_weights_int8(kernel, s, w_bit)
    Cp = g_hat.shape[0] // (kh * kw)
    Np = gq.shape[1]
    # zero-point correction: sum_k zp_k * g_hat[k, n]
    zp_pad = jnp.pad(zp, (0, Cp - C))
    zcorr = (jnp.tile(zp_pad, kh * kw) @ g_hat)  # [Np]

    if kh == 3 and stride == 1:
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    elif kh == 1:
        xp = x
    else:
        raise NotImplementedError((kh, stride))
    # quantize the PADDED tensor so padding lands on the true zero-point
    xq = jnp.clip(jnp.round(s * xp - zp), -n, n - 1)
    xq = jnp.pad(xq, ((0, 0), (0, 0), (0, 0), (0, Cp - C))).astype(jnp.int8)

    if kh == 3:
        dot = _conv3x3_int8_dot(xq, gq, H, W, Cp, Np, interpret=interpret)
        rows = B * H * W
        # ROWSUM over the nine shifts == 3x3 box sum of per-pixel channel sums
        chan_sum = xq.astype(jnp.int32).sum(axis=-1)  # [B, H+2, W+2]
        box = jax.lax.reduce_window(
            chan_sum, 0, jax.lax.add, (1, 3, 3), (1, 1, 1), "VALID"
        )  # [B, H, W]
        rowsum = box.reshape(rows)
        HO, WO = H, W
    else:
        rows = B * H * W
        xq2 = xq.reshape(rows, Cp)
        dot = int8_matmul(xq2, gq, interpret=interpret)
        rowsum = xq2.astype(jnp.int32).sum(axis=-1)
        HO, WO = H, W

    out = (dot.astype(jnp.float32) + wzp[None, :] * rowsum[:, None].astype(jnp.float32)) / ws[
        None, :
    ] + zcorr[None, :]
    out = out.reshape(B, HO, WO, Np)[..., :co]
    return out + bias
