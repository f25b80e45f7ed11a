"""Follow-up probes for the r5 conv roofline audit (conv_roofline.py).

The audit found XLA's int8 3x3 conv pinned at ~185-200 TOPS (~50% of the
394 int8 peak — almost exactly the 197 TFLOPS bf16 MXU rate) on every
CIFAR-10 serving shape at batch 128, while the r2 microbench proved the
SAME chip does 386 TOPS on an int8 conv at batch 256 / C128.  Two
competing explanations, each probed here with the paired-length timing
methodology (see conv_roofline.time_site):

  A. the int8 conv only reaches the double-pumped MXU rate at specific
     M = B*H*W tilings -> probe the audit's worst shapes at batch 256;
  B. XLA's CONV lowering never double-pumps but its DOT does -> probe raw
     int8 dot_general at the exact [M, 9C] x [9C, N] im2col geometries
     (no patch materialization — just the MXU ceiling for that matmul).

Whichever ceiling is real aims the attack: batch choice vs a Pallas
implicit-im2col conv kernel.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site \
      python -m attentiondm_tpu.tools.conv_attack_probe
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

INT8_PEAK_TOPS = 394e12


_NULL_RPC = [None]


def _null_rpc():
    """Median wall time of a cached trivial call — the per-call relay floor."""
    if _NULL_RPC[0] is None:
        f = jax.jit(lambda x: x + 1)
        one = jnp.int32(1)
        int(f(one))
        ts = sorted(
            (lambda t0: (int(f(one)), time.perf_counter() - t0)[1])(time.perf_counter())
            for _ in range(7)
        )
        _NULL_RPC[0] = ts[len(ts) // 2]
        print(f"null RPC floor: {_NULL_RPC[0]*1e3:.1f} ms", flush=True)
    return _NULL_RPC[0]


def time_loop(step_fn, args, label, flops, reps=5, sum_dtype=jnp.int32):
    """Static-length chained-scan timing with null-RPC subtraction.

    The dynamic-bound fori_loop of the roofline tool stopped compiling
    through the relay mid-round (remote-compile hangs on while-loops while
    static scans compile in ~1 min), so probes use STATIC scan lengths:
    a pilot at N=64 sizes a second length so the measured segment is
    >= 0.5 s of actual compute (the ~25 ms relay floor becomes <5% and is
    subtracted explicitly).  Costs <= 2 compiles per shape."""

    def make(length):
        def run(*ops):
            def body(s, _):
                si = s if jnp.issubdtype(s.dtype, jnp.integer) else s.astype(jnp.int32)
                if jnp.issubdtype(ops[0].dtype, jnp.integer):
                    x = jnp.bitwise_xor(ops[0], (si & 7).astype(ops[0].dtype))
                else:
                    x = ops[0] + (si % 3).astype(ops[0].dtype)
                return step_fn(x, *ops[1:]).sum(dtype=sum_dtype), None

            out, _ = jax.lax.scan(body, sum_dtype(1), None, length=length)
            return out

        return jax.jit(run)

    rpc = _null_rpc()

    def T(f):
        t0 = time.perf_counter()
        float(f(*args))
        return time.perf_counter() - t0

    f0 = make(64)
    T(f0)  # compile
    t0 = max(min(T(f0) for _ in range(2)) - rpc, 1e-6) / 64
    N = int(np.clip(0.5 / t0, 64, 65536))
    f1 = f0 if N <= 96 else make(N)
    if f1 is not f0:
        T(f1)  # compile
    ts = sorted(max(T(f1) - rpc, 1e-9) for _ in range(reps))
    t = ts[len(ts) // 2] / N
    print(f"{label:52s} {t*1e6:9.1f} us  ({flops/t/1e12:6.1f} TOPS, "
          f"{flops/t/INT8_PEAK_TOPS*100:4.1f}% MFU, N={N})", flush=True)
    return t


# full conv3 census of the B128 headline step (benchmarks/conv_roofline_r5.log),
# (res, Cp, Np, count): the per-shape Pallas-vs-XLA decision table is measured
# over exactly these.  4^2 shapes included to confirm the loss there.
CENSUS = [
    (32, 128, 128, 8),
    (32, 256, 128, 2),
    (32, 384, 128, 1),
    (32, 256, 256, 1),
    (16, 128, 256, 1),
    (16, 256, 256, 7),
    (16, 384, 256, 1),
    (16, 512, 256, 2),
    (8, 256, 256, 8),
    (8, 512, 256, 3),
    (4, 256, 256, 11),
    (4, 512, 256, 3),
]


def probe_conv(B, res, C, N_out, k=3):
    key = jax.random.PRNGKey(0)
    xq = jax.random.randint(key, (B, res, res, C), -128, 128, jnp.int8)
    gq = jax.random.randint(jax.random.PRNGKey(1), (k, k, C, N_out), -8, 8, jnp.int8)
    flops = 2.0 * B * res * res * k * k * C * N_out

    def step(x, g):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return jax.lax.conv_general_dilated(
            xp, g, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )

    return time_loop(step, (xq, gq), f"conv3 B{B} {res}x{res} {C}->{N_out}", flops)


def probe_dot(M, K, N):
    key = jax.random.PRNGKey(0)
    a = jax.random.randint(key, (M, K), -128, 128, jnp.int8)
    b = jax.random.randint(jax.random.PRNGKey(1), (K, N), -8, 8, jnp.int8)
    flops = 2.0 * M * K * N

    def step(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    time_loop(step, (a, b), f"dot  [{M},{K}]x[{K},{N}] int8", flops)


def probe_dot_bf16(M, K, N):
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (M, K), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.bfloat16)
    flops = 2.0 * M * K * N

    def step(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    time_loop(step, (a, b), f"dot  [{M},{K}]x[{K},{N}] bf16", flops,
              sum_dtype=jnp.float32)


def probe_pallas(B, res, C, N_out):
    from ..ops.pallas_conv import int8_conv3_pallas

    key = jax.random.PRNGKey(0)
    xp = jax.random.randint(key, (B, res + 2, res + 2, C), -128, 128, jnp.int8)
    gq = jax.random.randint(jax.random.PRNGKey(1), (9 * C, N_out), -8, 8, jnp.int8)
    inv_ws = jnp.full((N_out,), 1e-2)
    zcb = jnp.zeros((N_out,))
    flops = 2.0 * B * res * res * 9 * C * N_out

    def step(x, g, s, b):
        return int8_conv3_pallas(x, g, s, b, out_dtype=jnp.bfloat16)

    return time_loop(step, (xp, gq, inv_ws, zcb),
                     f"pallas-conv3 B{B} {res}x{res} {C}->{N_out} (bf16 out)", flops,
                     sum_dtype=jnp.float32)


def probe_census(B=128):
    """Paired XLA-vs-Pallas decision table over the full conv3 census, one
    process so chip-state drift hits both arms.  Emits the win table that
    ops/pallas_conv.conv3_pallas_wins must encode."""
    from ..ops.pallas_conv import conv3_pallas_fits

    rows = []
    for res, Cp, Np, cnt in CENSUS:
        if not conv3_pallas_fits(B, res, res, Cp, Np):
            print(f"census {res}x{res} {Cp}->{Np}: pallas ineligible (VMEM)",
                  flush=True)
            continue
        t_x = probe_conv(B, res, Cp, Np)
        t_p = probe_pallas(B, res, Cp, Np)
        rows.append((res, Cp, Np, cnt, t_x, t_p))
    print("\n== decision table (B%d) ==" % B, flush=True)
    tot_x = tot_p = 0.0
    for res, Cp, Np, cnt, t_x, t_p in rows:
        win = "PALLAS" if t_p < t_x else "xla"
        tot_x += cnt * t_x
        tot_p += cnt * min(t_x, t_p)
        print(f"{res:3d}^2 {Cp:4d}->{Np:4d} x{cnt:2d}  xla {t_x*1e6:7.1f} us  "
              f"pallas {t_p*1e6:7.1f} us  ratio {t_x/t_p:5.2f}  -> {win}",
              flush=True)
    print(f"census conv total: xla {tot_x*1e3:.2f} ms -> routed {tot_p*1e3:.2f} ms "
          f"({(1 - tot_p / tot_x) * 100:.1f}% saved)", flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", default="dot,batch,pallas,bf16")
    args = ap.parse_args()
    parts = args.parts.split(",")
    print(jax.devices())
    if "dot" in parts:
        print("\n-- raw int8 dot at the im2col geometries --", flush=True)
        probe_dot(128 * 16 * 16, 9 * 256, 256)   # conv3 16^2 256->256 @ B128
        probe_dot(128 * 32 * 32, 9 * 128, 128)   # conv3 32^2 128->128 @ B128
        probe_dot(256 * 32 * 32, 9 * 128, 128)   # the r2 microbench geometry
        probe_dot(128 * 16 * 16, 2304, 2304)     # square-ish control
    if "batch" in parts:
        print("\n-- batch scaling of the worst audit shapes (XLA conv) --", flush=True)
        for B in (128, 256):
            probe_conv(B, 16, 256, 256)
            probe_conv(B, 32, 128, 128)
    if "pallas" in parts:
        print("\n-- Pallas implicit-im2col conv (ops/pallas_conv.py) --", flush=True)
        probe_pallas(128, 16, 256, 256)
        probe_pallas(128, 32, 128, 128)
        probe_pallas(128, 8, 256, 256)
        probe_pallas(128, 4, 256, 256)
    if "bf16" in parts:
        print("\n-- control: bf16 dot ceiling --", flush=True)
        probe_dot_bf16(128 * 16 * 16, 2304, 256)
    if "census" in parts:
        print("\n-- paired XLA/Pallas decision table over the serving census --",
              flush=True)
        probe_census()


if __name__ == "__main__":
    main()
