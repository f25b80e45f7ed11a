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


def time_loop(step_fn, args, label, flops, reps=5, max_n=65536):
    """Paired-length fori_loop timing (methodology of conv_roofline.time_site):
    full-output reduction carry, carry-dependent input XOR, traced bound,
    median of adjacent T(2N)-T(N) pairs."""

    def run(n, *ops):
        def body(_i, s):
            x = jnp.bitwise_xor(ops[0], (s & 7).astype(ops[0].dtype))
            return step_fn(x, *ops[1:]).sum(dtype=jnp.int32)

        return jax.lax.fori_loop(0, n, body, jnp.int32(1))

    f = jax.jit(run)

    def T(n):
        t0 = time.perf_counter()
        int(f(jnp.int32(n), *args))
        return time.perf_counter() - t0

    T(8)
    rpc = min(T(0) for _ in range(3))
    t_est = max((min(T(32) for _ in range(2)) - rpc) / 32, 1e-7)
    N = int(np.clip(0.08 / t_est, 32, max_n))
    diffs = sorted(max(T(2 * N) - T(N), 1e-9) for _ in range(reps))
    t = diffs[len(diffs) // 2] / N
    print(f"{label:52s} {t*1e6:9.1f} us  ({flops/t/1e12:6.1f} TOPS, "
          f"{flops/t/INT8_PEAK_TOPS*100:4.1f}% MFU, N={N})", flush=True)
    return t


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

    time_loop(step, (xq, gq), f"conv3 B{B} {res}x{res} {C}->{N_out}", flops)


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

    def run(n, a, b):
        def body(_i, s):
            x = a + (s & 1).astype(jnp.bfloat16)
            return step(x, b).sum(dtype=jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(1))

    f = jax.jit(run)

    def T(n):
        t0 = time.perf_counter()
        float(f(jnp.int32(n), a, b))
        return time.perf_counter() - t0

    T(8)
    rpc = min(T(0) for _ in range(3))
    t_est = max((min(T(32) for _ in range(2)) - rpc) / 32, 1e-7)
    N_ = int(np.clip(0.08 / t_est, 32, 65536))
    diffs = sorted(max(T(2 * N_) - T(N_), 1e-9) for _ in range(5))
    t = diffs[len(diffs) // 2] / N_
    print(f"{'dot  [%d,%d]x[%d,%d] bf16' % (M, K, K, N):52s} {t*1e6:9.1f} us  "
          f"({flops/t/1e12:6.1f} TFLOPS, N={N_})", flush=True)


def main():
    print(jax.devices())
    print("\n-- A: batch scaling of the worst audit shapes (XLA int8 conv) --")
    for B in (128, 256, 512):
        probe_conv(B, 16, 256, 256)
    for B in (128, 256):
        probe_conv(B, 8, 256, 256)
        probe_conv(B, 32, 128, 128)
    print("\n-- B: raw int8 dot at the im2col geometries --")
    probe_dot(128 * 16 * 16, 9 * 256, 256)   # conv3 16^2 256->256 @ B128
    probe_dot(256 * 16 * 16, 9 * 256, 256)   # ... @ B256
    probe_dot(128 * 32 * 32, 9 * 128, 128)   # conv3 32^2 128->128 @ B128
    probe_dot(256 * 32 * 32, 9 * 128, 128)   # the r2 microbench geometry
    probe_dot(128 * 16 * 16, 2304, 2304)     # square-ish control
    print("\n-- control: bf16 dot ceiling at one geometry --")
    probe_dot_bf16(128 * 16 * 16, 2304, 256)


if __name__ == "__main__":
    main()
