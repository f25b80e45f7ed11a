"""Multi-process (multi-"host") CPU smoke worker.

Spawned by tests/test_distributed.py as N separate Python processes, each
with 2 virtual CPU devices: boots `initialize_distributed` (the working
replacement for the reference's dead `init_distributed_mode`,
util.py:216-238), then drives one DP-sharded training step and one sharded
W4A8 serving batch over the GLOBAL (cross-process) mesh.  Prints sentinel
lines the parent test parses; any assertion failure exits non-zero.

Not a pytest file — no `test_` prefix; run as
`python tests/mp_smoke_worker.py <pid> <nproc> <coordinator>`.
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


def main(pid: int, nproc: int, coordinator: str) -> None:
    from attentiondm_tpu.parallel.distributed import initialize_distributed

    ok = initialize_distributed(coordinator, num_processes=nproc, process_id=pid)
    assert ok, "initialize_distributed returned False with explicit coordinator"
    assert jax.process_count() == nproc, jax.process_count()
    n_global = jax.device_count()
    n_local = jax.local_device_count()
    assert n_global == nproc * n_local, (n_global, nproc, n_local)
    print(f"MPOK boot pid={pid} process_count={jax.process_count()} "
          f"local={n_local} global={n_global}", flush=True)

    import numpy as np
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from attentiondm_tpu.diffusion import DiffusionSchedule, ddim_sample, make_timestep_seq
    from attentiondm_tpu.models import UNetConfig, unet_apply, unet_init
    from attentiondm_tpu.parallel import make_mesh, replicate
    from attentiondm_tpu.training import init_train_state, make_sharded_train_step

    mesh = make_mesh(n_global)
    sharding = NamedSharding(mesh, P("data"))
    sched = DiffusionSchedule.create("linear", 1e-4, 0.02, 100)

    def shard_global(x: np.ndarray):
        """Global array -> jax.Array sharded over all processes' devices.

        Device order in a 1-D mesh is jax.devices() order (process-major), so
        this process owns the contiguous slab [pid*local : (pid+1)*local)."""
        per_proc = x.shape[0] // nproc
        local = x[pid * per_proc:(pid + 1) * per_proc]
        return jax.make_array_from_process_local_data(sharding, local)

    # --- one DP-sharded train step over the cross-process mesh -------------
    cfg = UNetConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(8,), resolution=16, dropout=0.0)
    tx = optax.adamw(2e-4)
    params = unet_init(jax.random.PRNGKey(0), cfg)
    state = replicate(mesh, init_train_state(params, tx))
    x0 = shard_global(
        np.asarray(jax.random.normal(jax.random.PRNGKey(1), (n_global * 2, 16, 16, 3)))
    )
    step = make_sharded_train_step(mesh, cfg, sched.betas, tx)
    state, loss = step(state, x0, replicate(mesh, jax.random.PRNGKey(2)))
    loss = float(jax.block_until_ready(loss))
    assert np.isfinite(loss), loss
    print(f"MPOK train pid={pid} loss={loss:.6f}", flush=True)

    # --- one sharded W4A8 serving batch -------------------------------------
    from attentiondm_tpu.quant import QuantizedUNet, calibrate_ranges
    from attentiondm_tpu.quant.int8_serving import serving_ddim_sampler

    cfg_q = UNetConfig(ch=128, ch_mult=(1,), num_res_blocks=1,
                       attn_resolutions=(8,), resolution=8, dropout=0.0)
    params_q = unet_init(jax.random.PRNGKey(3), cfg_q)
    steps = 3
    seq = make_timestep_seq(100, steps, "uniform")
    x_cal = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 3))

    @jax.jit
    def teacher(p, x):
        fp_fn = lambda xt, t, i: unet_apply(p, cfg_q, xt, t)
        return ddim_sample(fp_fn, x, seq, sched.betas, keep_trajectory=True)

    _, traj, _ = teacher(params_q, x_cal)
    xs_in = jnp.concatenate([x_cal[None], traj[:-1]], axis=0)
    qunet = QuantizedUNet.create(cfg_q, bitwidth=4, a_bitwidth=8)
    qstates = calibrate_ranges(qunet, params_q, qunet.init_state(steps), xs_in, seq)
    sample = serving_ddim_sampler(qunet, params_q, qstates, seq, sched.betas)

    x = shard_global(
        np.asarray(jax.random.normal(jax.random.PRNGKey(5), (n_global * 2, 8, 8, 3)))
    )
    out = jax.block_until_ready(sample(x))
    assert len(out.sharding.device_set) == n_global, out.sharding
    # Replicated scalar reduction: identical on every process iff the sharded
    # forward agreed across processes.
    checksum = float(jax.jit(lambda o: jnp.abs(o).sum(),
                             out_shardings=NamedSharding(mesh, P()))(out))
    assert np.isfinite(checksum)
    print(f"MPOK serving pid={pid} checksum={checksum:.6f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
