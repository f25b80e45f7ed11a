"""Int8-path cost decomposition probe (run on the real TPU chip).

Times the pieces of the true-int8 execution path at the CIFAR-10 level-0
shape (batch 256, 32x32, C=128) using chained `lax.scan`s so per-call RPC
overhead (~25 ms under the axon relay) amortizes away.  Every timing pulls a
scalar to host — `block_until_ready` alone can return early under the relay
(see PERFORMANCE.md "Measurement methodology").

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python -m attentiondm_tpu.tools.perf_probe_int8
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from ..models.unet import group_norm, swish
from ..ops.quant_conv import fold_weights_int8, quantized_conv2d_int8_prefolded, zcorr_from_fold

B, H, W, C = 256, 32, 32, 128
K_CHAIN = 20


def _chain(step_fn):
    """Scan `step_fn` K_CHAIN times over a shape-preserving carry."""

    def run(x, consts):
        def body(h, _):
            return step_fn(h, consts), None

        out, _ = jax.lax.scan(body, x, None, length=K_CHAIN)
        return out.sum()

    return jax.jit(run)


def time_chain(step_fn, x, consts, label, results, reps=3):
    f = _chain(step_fn)
    float(f(x, consts))  # compile
    best = min(
        (lambda t0: (float(f(x, consts)), time.perf_counter() - t0))(time.perf_counter())[1]
        for _ in range(reps)
    )
    per_iter_ms = best / K_CHAIN * 1e3
    results[label] = per_iter_ms
    print(f"{label:55s} {per_iter_ms:8.3f} ms/iter")
    return per_iter_ms


def main():
    print(jax.devices())
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (B, H, W, C), jnp.float32)
    kernel = jax.random.normal(ks[1], (3, 3, C, C), jnp.float32) * 0.05
    bias = jax.random.normal(ks[2], (C,), jnp.float32) * 0.01
    gn = {"scale": jnp.ones((C,)), "bias": jnp.zeros((C,))}
    temb = jax.random.normal(ks[3], (B, C), jnp.float32) * 0.1

    a_bit = 8
    n_lv = 2**a_bit - 1
    rmin = jnp.full((C,), -4.0)
    rmax = jnp.full((C,), 4.0)
    scale = n_lv / (rmax - rmin)
    zp = jnp.round(scale * rmin) + 2 ** (a_bit - 1)
    gq, ws, wzp, g_hat = fold_weights_int8(kernel, scale, 4, symmetric=True)
    zc = zcorr_from_fold(g_hat, zp, 3, C)

    consts = dict(
        kernel=kernel, bias=bias, gn=gn, temb=temb,
        gq=gq, ws=ws, wzp=wzp, zc=zc, scale=scale, zp=zp,
    )
    results = {}

    # -- baseline elementwise / conv pieces ---------------------------------
    time_chain(lambda h, c: group_norm(h, c["gn"]), x, consts, "group_norm (f32)", results)
    time_chain(lambda h, c: swish(group_norm(h, c["gn"])), x, consts, "group_norm+swish (f32)", results)

    def quant_only(h, c):
        n = 2 ** (a_bit - 1)
        hq = jnp.clip(jnp.round(c["scale"] * h - c["zp"]), -n, n - 1).astype(jnp.int8)
        # keep carry f32/shape-preserving: decode back (cheap, fused)
        return (hq.astype(jnp.float32) + c["zp"]) / c["scale"]

    time_chain(quant_only, x, consts, "quantize->int8->dequant roundtrip", results)

    def conv_f32(h, c):
        out = jax.lax.conv_general_dilated(
            h, c["kernel"], (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return out + c["bias"]

    time_chain(conv_f32, x, consts, "f32 conv 3x3 (XLA)", results)

    def conv_int8_prefolded(h, c):
        return quantized_conv2d_int8_prefolded(
            h, c["gq"], c["ws"], c["wzp"], c["zc"], c["bias"], c["scale"], c["zp"],
            a_bit, 3, C, symmetric=True,
        )

    time_chain(conv_int8_prefolded, x, consts, "int8 conv (quant+conv+epilogue, current)", results)

    # int8 conv with epilogue folded differently: dot only (int32 out, decode minimal)
    def conv_int8_dot_only(h, c):
        n = 2 ** (a_bit - 1)
        xp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
        xq = jnp.clip(jnp.round(c["scale"] * xp - c["zp"]), -n, n - 1).astype(jnp.int8)
        dot = jax.lax.conv_general_dilated(
            xq, c["gq"].reshape(3, 3, C, C), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        return dot.astype(jnp.float32) * (1.0 / 127.0)  # minimal decode to keep carry f32

    time_chain(conv_int8_dot_only, x, consts, "int8 quant+conv+trivial-decode", results)

    # pure int8-resident conv: carry is int8, no quantize inside the loop
    def run_int8_resident(xq0, c):
        def body(hq, _):
            xp = jnp.pad(hq, ((0, 0), (1, 1), (1, 1), (0, 0)))
            dot = jax.lax.conv_general_dilated(
                xp, c["gq"].reshape(3, 3, C, C), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            # requant: int32 -> int8 with a scalar scale (stand-in for fused epilogue)
            return jnp.clip(dot // 1024, -128, 127).astype(jnp.int8), None

        out, _ = jax.lax.scan(body, xq0, None, length=K_CHAIN)
        return out.astype(jnp.float32).sum()

    xq0 = jnp.clip(jnp.round(scale * x - zp), -128, 127).astype(jnp.int8)
    f = jax.jit(run_int8_resident)
    float(f(xq0, consts))
    best = min(
        (lambda t0: (float(f(xq0, consts)), time.perf_counter() - t0))(time.perf_counter())[1]
        for _ in range(3)
    )
    results["int8-resident conv (int8 carry)"] = best / K_CHAIN * 1e3
    print(f"{'int8-resident conv (int8 carry)':55s} {best / K_CHAIN * 1e3:8.3f} ms/iter")

    # -- full resblock variants ---------------------------------------------
    def resblock_current_int8(h, c):
        r = h
        h = swish(group_norm(h, c["gn"]))
        h = conv_int8_prefolded(h, c)
        h = h + c["temb"][:, None, None, :]
        h = swish(group_norm(h, c["gn"]))
        h = conv_int8_prefolded(h, c)
        return r + h

    time_chain(resblock_current_int8, x, consts, "resblock int8 (current structure)", results)

    def resblock_f32(h, c):
        r = h
        h = swish(group_norm(h, c["gn"]))
        h = conv_f32(h, c)
        h = h + c["temb"][:, None, None, :]
        h = swish(group_norm(h, c["gn"]))
        h = conv_f32(h, c)
        return r + h

    time_chain(resblock_f32, x, consts, "resblock f32", results)

    # restructured: GN stats via jnp reduction, normalize+swish+quant in one
    # elementwise chain feeding the conv; epilogue+temb+residual one chain.
    def gn_stats(h, g=32):
        hg = h.reshape(B, -1, g, C // g)
        mean = hg.mean(axis=(1, 3))
        var = hg.var(axis=(1, 3))
        return mean, jax.lax.rsqrt(var + 1e-6)  # [B, g]

    def norm_swish_quant(h, mean, rstd, gnp, s, z, g=32):
        mean_c = jnp.repeat(mean, C // g, axis=1)[:, None, None, :]
        rstd_c = jnp.repeat(rstd, C // g, axis=1)[:, None, None, :]
        hn = (h - mean_c) * rstd_c * gnp["scale"] + gnp["bias"]
        hs = hn * jax.nn.sigmoid(hn)
        n = 2 ** (a_bit - 1)
        return jnp.clip(jnp.round(s * hs - z), -n, n - 1).astype(jnp.int8)

    def int8_conv_raw(xq, gq):
        xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=0)
        return jax.lax.conv_general_dilated(
            xp, gq.reshape(3, 3, C, C), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )

    def resblock_restructured(h, c):
        r = h
        mean, rstd = gn_stats(h)
        hq = norm_swish_quant(h, mean, rstd, c["gn"], c["scale"], c["zp"])
        dot = int8_conv_raw(hq, c["gq"])
        h = dot.astype(jnp.float32) / c["ws"] + c["zc"] + c["bias"] + c["temb"][:, None, None, :]
        mean, rstd = gn_stats(h)
        hq = norm_swish_quant(h, mean, rstd, c["gn"], c["scale"], c["zp"])
        dot = int8_conv_raw(hq, c["gq"])
        return r + dot.astype(jnp.float32) / c["ws"] + c["zc"] + c["bias"]

    time_chain(resblock_restructured, x, consts, "resblock int8 (restructured, XLA-fused)", results)

    # summary
    print("\nJSON:", {k: round(v, 3) for k, v in results.items()})


if __name__ == "__main__":
    main()
