"""Per-shape int8 conv roofline audit at the headline operating point.

The round-4 step breakdown (tools/step_breakdown.py) attributes ~9.9 of the
13.86 ms serving step to the int8 conv core — ~40% of the rate the repo's own
single-shape microbench proves the chip can do (391 TOPS at B256 32x32
C128->128, PERFORMANCE.md).  This tool answers WHERE that 2.4x hides:

  1. enumerates every int8 conv the CIFAR-10 headline serving step actually
     runs (batch 128, W4A8, DDIM-100), with its true folded/padded shape,
     lowering variant (qzero-halo 3x3 / stride-2 down / dup-upsample / 1x1)
     and per-step multiplicity;
  2. times each unique shape in isolation on the real chip (chained scan
     with an int8-resident carry and a per-iteration XOR dependency so XLA
     can neither CSE nor DCE the convs);
  3. reports achieved TOPS against the per-shape roofline
     min(int8 compute peak, HBM bandwidth) and the aggregate step total;
  4. A/Bs alternative lowerings per shape — im2col + int8 matmul, and
     shift-and-accumulate (9 x 1x1 dots) — to find shapes where XLA's
     int8 conv lowering is the bottleneck.

v5e roofline constants: 394 int8 TOPS, 819 GB/s HBM (public chip specs).

Every timing pulls a scalar to host (relay discipline, PERFORMANCE.md).

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site \
      python -m attentiondm_tpu.tools.conv_roofline [--batch 128]

Reference hot loop this audits the replacement of: the reference runs these
same convs as fake-quant float cuDNN calls (utils/quant_util.py:383-385).
"""
from __future__ import annotations

import argparse
import collections
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

INT8_PEAK_TOPS = 394e12
HBM_BW = 819e9


def _pad128(c: int) -> int:
    return (c + 127) // 128 * 128


def conv_shape_table(cfg=None, batch: int = 128):
    """Every int8-eligible conv site in one serving UNet step, in call order.

    Returns a list of dicts with the FOLDED shapes the serving runtime runs
    (Cp/Np padded to 128) plus the lowering variant and spatial geometry.
    Mirrors models/unet.py::iter_conv_layers + the serving dispatch in
    quant/int8_serving.py (attention q/k/v/proj are excluded when the
    whole-block fused kernel covers them, as it does at CIFAR shapes).
    """
    from ..models.unet import UNetConfig, iter_conv_layers

    cfg = cfg or UNetConfig()
    R = cfg.resolution
    num_levels = len(cfg.ch_mult)
    sites = []
    for name, cin, k in iter_conv_layers(cfg):
        if cin < 64:  # _eligible: conv_in stays on the fake-quant fallback
            continue
        parts = name.split(".")
        if "attn" in parts or parts[-1] in ("q", "k", "v", "proj_out"):
            continue  # fused_attention_block covers the projections
        if parts[0] == "down" and parts[-2] == "downsample":
            res = R // 2 ** int(parts[1])
            variant = "down2"
        elif parts[0] == "up" and parts[-2] == "upsample":
            res = 2 * (R // 2 ** int(parts[1]))
            variant = "conv3" if k == 3 else "conv1"
        elif parts[0] in ("down", "up"):
            res = R // 2 ** int(parts[1])
            variant = "conv3" if k == 3 else "conv1"
        elif parts[0] == "mid":
            res = R // 2 ** (num_levels - 1)
            variant = "conv3" if k == 3 else "conv1"
        else:  # conv_out
            res = R
            variant = "conv3" if k == 3 else "conv1"
        # output channels from the layer that follows in the param tree: the
        # iterator gives cin; cout is the next layer's cin only for chains, so
        # derive it from the name instead (same rules unet_init uses).
        cout = _cout_for(cfg, name)
        sites.append(dict(
            name=name, variant=variant, res=res, cin=cin, cout=cout, k=k,
            Cp=_pad128(cin), Np=_pad128(cout), batch=batch,
        ))
    return sites


def _cout_for(cfg, name: str) -> int:
    parts = name.split(".")
    if name == "conv_out":
        return cfg.out_ch
    if parts[-2] == "downsample" or parts[-2] == "upsample":
        lvl = int(parts[1])
        mult = cfg.ch_mult[lvl]
        return cfg.ch * mult
    lvl = int(parts[1]) if parts[0] in ("down", "up") else len(cfg.ch_mult) - 1
    if parts[0] == "mid":
        return cfg.ch * cfg.ch_mult[-1]
    return cfg.ch * cfg.ch_mult[lvl]


# ---------------------------------------------------------------------------
# lowering variants under test
# ---------------------------------------------------------------------------


def _xla_conv(xq, gq, variant: str, zp):
    """The serving path's current lowering (quant/int8_serving.py)."""
    from ..quant import int8_serving as srv

    if variant == "conv1":
        return srv.int8_conv(xq, gq, 1)
    if variant == "down2":
        return srv.int8_conv3_qzero_down(xq, zp, 8, gq)
    return srv.int8_conv3_qzero(xq, zp, 8, gq)


def _im2col_conv(xq, gq, variant: str, zp):
    """3x3 as ONE int8 matmul: 9 shifted views concat'd along C, then
    [B*H*W, 9*Cp] @ [9*Cp, Np] with int32 accumulation."""
    from ..quant import int8_serving as srv

    if variant == "conv1":
        B, H, W, C = xq.shape
        Np = gq.shape[-1]
        dot = jax.lax.dot_general(
            xq.reshape(B * H * W, C), gq,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return dot.reshape(B, H, W, Np)
    if variant == "down2":
        return srv.int8_conv3_qzero_down(xq, zp, 8, gq)  # not reimplemented
    B, H, W, C = xq.shape
    Np = gq.shape[-1]
    xp = srv._pad_qzero(xq, zp, 8)
    cols = [xp[:, dy : dy + H, dx : dx + W, :] for dy in range(3) for dx in range(3)]
    patches = jnp.concatenate(cols, axis=-1).reshape(B * H * W, 9 * C)
    dot = jax.lax.dot_general(
        patches, gq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return dot.reshape(B, H, W, Np)


def _shifted_conv(xq, gq, variant: str, zp):
    """3x3 as 9 accumulated 1x1 dots over shifted views (no patch tensor)."""
    from ..quant import int8_serving as srv

    if variant in ("conv1", "down2"):
        return _im2col_conv(xq, gq, variant, zp)
    B, H, W, C = xq.shape
    Np = gq.shape[-1]
    xp = srv._pad_qzero(xq, zp, 8)
    g = gq.reshape(3, 3, C, Np)
    acc = None
    for dy in range(3):
        for dx in range(3):
            v = xp[:, dy : dy + H, dx : dx + W, :].reshape(B * H * W, C)
            d = jax.lax.dot_general(
                v, g[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc = d if acc is None else acc + d
    return acc.reshape(B, H, W, Np)


VARIANTS = {"xla": _xla_conv, "im2col": _im2col_conv, "shifted": _shifted_conv}


# ---------------------------------------------------------------------------
# timing
# ---------------------------------------------------------------------------


def _roofline(site) -> dict:
    B, res, k = site["batch"], site["res"], site["k"]
    Cp, Np = site["Cp"], site["Np"]
    if site["variant"] == "down2":
        Ho = Wo = res // 2
    else:
        Ho = Wo = res
    flops = 2.0 * B * Ho * Wo * k * k * Cp * Np
    in_b = B * res * res * Cp
    w_b = k * k * Cp * Np
    out_b = B * Ho * Wo * Np * 4
    t_c = flops / INT8_PEAK_TOPS
    t_m = (in_b + w_b + out_b) / HBM_BW
    # microbench roof: the chained scan fuses a sum over the conv output, so
    # the int32 output is never written to HBM — the in-situ bound drops out_b
    t_m_nw = (in_b + w_b) / HBM_BW
    return dict(flops=flops, bytes=in_b + w_b + out_b,
                t_roof=max(t_c, t_m), bound="mxu" if t_c >= t_m else "hbm",
                t_roof_nw=max(t_c, t_m_nw))


def time_site(site, variant_fn, reps: int = 5, max_n: int = 65536):
    """Paired-length chained-loop timing of one conv shape; seconds/conv.

    Methodology (two earlier cuts of this tool produced garbage logs):
      - the loop carry is a FULL reduction of the conv output (`dot.sum()`),
        so no output element is dead — consuming only a slice lets XLA
        slice through the conv and compute a single output pixel;
      - the conv input is XOR'd with a carry-dependent byte, so the loop
        body can't be hoisted (LICM) and iterations can't be CSE'd;
      - the iteration count is a TRACED `fori_loop` bound: one compile,
        callable at any length — T(0) calibrates the pure relay RPC
        (~25 ms/call, which must never be attributed to the conv), a pilot
        T(N0) sizes N so the measured segment is >= 80 ms of ACTUAL compute
        (not roofline compute — a shape 10x off its roof still gets a long
        segment), and the reported time is median over `reps` of adjacent
        (T(2N) - T(N))/N pairs, which cancels the RPC and its drift.
    """
    B, res = site["batch"], site["res"]
    Cp, Np, k = site["Cp"], site["Np"], site["k"]
    key = jax.random.PRNGKey(0)
    xq0 = jax.random.randint(key, (B, res, res, Cp), -128, 128, jnp.int8)
    gq = jax.random.randint(jax.random.PRNGKey(1), (k * k * Cp, Np), -8, 8, jnp.int8)
    zp = jnp.zeros((Cp,), jnp.float32)

    def run(xq0, gq, n):
        def body(_i, s):
            xq = jnp.bitwise_xor(xq0, (s & 7).astype(jnp.int8))
            dot = variant_fn(xq, gq, site["variant"], zp)
            return dot.sum(dtype=jnp.int32)

        return jax.lax.fori_loop(0, n, body, jnp.int32(1))

    f = jax.jit(run)

    def T(n):
        t0 = time.perf_counter()
        int(f(xq0, gq, jnp.int32(n)))
        return time.perf_counter() - t0

    T(8)  # compile
    rpc = min(T(0) for _ in range(3))
    n0 = 32
    t_est = max((min(T(n0) for _ in range(2)) - rpc) / n0, 1e-7)
    N = int(np.clip(0.08 / t_est, 32, max_n))
    diffs = sorted(max(T(2 * N) - T(N), 1e-9) for _ in range(reps))
    return diffs[len(diffs) // 2] / N, N


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--variants", default="xla,im2col,shifted")
    ap.add_argument("--max_n", type=int, default=65536,
                    help="cap on the short loop length (CPU smoke: use 8)")
    ap.add_argument("--json_out", default="")
    args = ap.parse_args()
    print(jax.devices())

    sites = conv_shape_table(batch=args.batch)
    # group identical (variant, res, Cp, Np, k) shapes
    groups = collections.OrderedDict()
    for s in sites:
        kk = (s["variant"], s["res"], s["Cp"], s["Np"], s["k"])
        groups.setdefault(kk, dict(site=s, count=0, names=[]))
        groups[kk]["count"] += 1
        groups[kk]["names"].append(s["name"])

    variants = args.variants.split(",")
    rows = []
    for kk, g in groups.items():
        s, roof = g["site"], _roofline(g["site"])
        row = dict(shape=kk, count=g["count"], roof_us=roof["t_roof"] * 1e6,
                   roof_nw_us=roof["t_roof_nw"] * 1e6,
                   bound=roof["bound"], flops=roof["flops"], example=g["names"][0])
        for v in variants:
            t, iters = time_site(s, VARIANTS[v], max_n=args.max_n)
            row[v + "_us"] = t * 1e6
            row[v + "_tops"] = roof["flops"] / t / 1e12
            print(f"{str(kk):36s} x{g['count']:<2d} {v:8s} {t*1e6:9.1f} us "
                  f"({roof['flops']/t/1e12:6.1f} TOPS, roof {roof['t_roof']*1e6:7.1f}"
                  f"/{roof['t_roof_nw']*1e6:.1f} us [{roof['bound']}], N={iters})",
                  flush=True)
        rows.append(row)

    print("\n| shape (variant,res,Cp,Np,k) | x | roof us | " +
          " | ".join(f"{v} us (TOPS, MFU%)" for v in variants) + " |")
    print("|---|---|---|" + "---|" * len(variants))
    tot = {v: 0.0 for v in variants}
    tot_roof = 0.0
    for r in rows:
        cells = []
        for v in variants:
            mfu = r[v + "_tops"] / (INT8_PEAK_TOPS / 1e12) * 100
            cells.append(f"{r[v+'_us']:.1f} ({r[v+'_tops']:.0f}, {mfu:.0f}%)")
            tot[v] += r[v + "_us"] * r["count"]
        tot_roof += r["roof_us"] * r["count"]
        print(f"| {r['shape']} | {r['count']} | {r['roof_us']:.1f} | " +
              " | ".join(cells) + " |")
    print(f"\nstep totals (conv core only): roofline {tot_roof/1e3:.2f} ms, " +
          ", ".join(f"{v} {tot[v]/1e3:.2f} ms" for v in variants))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(dict(rows=rows, totals=tot, roof_total_us=tot_roof), f, indent=1)


if __name__ == "__main__":
    main()
