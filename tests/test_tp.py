"""Tensor-parallel + spatial-parallel shardings (parallel/tp.py) on the
8-virtual-device CPU mesh: numerics vs the replicated run, layout placement,
and the dp x tp train step."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from attentiondm_tpu.diffusion import DiffusionSchedule
from attentiondm_tpu.models import UNetConfig, unet_init, unet_apply
from attentiondm_tpu.parallel import (
    make_mesh,
    replicate,
    shard_batch,
    shard_batch_spatial,
    shard_unet_params,
    sharded_fraction,
    unet_param_specs,
)
from attentiondm_tpu.training import init_train_state, make_sharded_train_step

# multi-minute integration file (r5 fast lane: pytest -m 'not slow')
pytestmark = pytest.mark.slow


def _cfg(attn_variant="ddim"):
    # ch=128 like the flagship so column/row splits are 32-channel shards at
    # tp=4 (GroupNorm groups of 4 channels stay whole within a shard)
    return UNetConfig(
        ch=128, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
        resolution=16, dropout=0.0, attn_variant=attn_variant,
    )


def _setup(attn_variant="ddim"):
    cfg = _cfg(attn_variant)
    params = unet_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 3))
    t = jnp.full((8,), 123.0)
    return cfg, params, x, t


def test_param_specs_structure_and_coverage():
    cfg, params, _, _ = _setup()
    specs = unet_param_specs(params)
    # spec tree mirrors the param tree leaf-for-leaf
    assert jax.tree_util.tree_structure(
        jax.tree_util.tree_map(lambda _: 0, params)
    ) == jax.tree_util.tree_structure(
        jax.tree_util.tree_map(lambda _: 0, specs, is_leaf=lambda s: isinstance(s, P))
    )
    # the bulk of the bytes (resblock convs + attention projections) shard
    assert sharded_fraction(params, specs) > 0.55
    # spot checks: Megatron pairing
    blk = specs["down"][0]["block"][0]
    assert blk["conv1"]["kernel"] == P(None, None, None, "model")
    assert blk["conv1"]["bias"] == P("model")
    assert blk["conv2"]["kernel"] == P(None, None, "model", None)
    assert blk["conv2"]["bias"] == P()
    assert blk["temb_proj"]["kernel"] == P(None, "model")
    assert blk["norm2"]["scale"] == P("model")
    assert blk["norm1"]["scale"] == P()
    attn = specs["mid"]["attn_1"]
    assert attn["q"]["kernel"] == P(None, None, None, "model")
    assert attn["proj_out"]["kernel"] == P(None, None, "model", None)


@pytest.mark.parametrize("variant", ["ddim", "enhanced"])
def test_tp_forward_matches_replicated(variant):
    cfg, params, x, t = _setup(variant)
    want = jax.jit(lambda p, x, t: unet_apply(p, cfg, x, t))(params, x, t)

    mesh = make_mesh(8, axes=("data", "model"), shape=(2, 4))
    p_tp = shard_unet_params(mesh, params)
    # params really live distributed: a column-parallel kernel's per-device
    # shard carries 1/4 of the output channels
    k = p_tp["down"][0]["block"][0]["conv1"]["kernel"]
    assert len(k.sharding.device_set) == 8
    assert k.addressable_shards[0].data.shape == (3, 3, 128, 32)

    x_s = shard_batch(mesh, x)
    got = jax.jit(lambda p, x, t: unet_apply(p, cfg, x, t))(p_tp, x_s, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_tp_degree_must_divide_groups():
    cfg, params, _, _ = _setup()
    mesh = make_mesh(6, axes=("data", "model"), shape=(2, 3))
    with pytest.raises(ValueError, match="GroupNorm"):
        shard_unet_params(mesh, params)


def test_sp_forward_matches_replicated():
    """Spatial parallelism: activations sharded over H, params replicated —
    GSPMD halo-exchanges the 3x3 convs and psums the GN statistics."""
    cfg, params, x, t = _setup()
    want = jax.jit(lambda p, x, t: unet_apply(p, cfg, x, t))(params, x, t)

    mesh = make_mesh(8, axes=("data", "model"), shape=(2, 4))
    p_r = replicate(mesh, params)
    x_s = shard_batch_spatial(mesh, x)
    assert len(x_s.sharding.device_set) == 8
    got = jax.jit(
        lambda p, x, t: unet_apply(p, cfg, x, t),
        out_shardings=NamedSharding(mesh, P("data", "model")),
    )(p_r, x_s, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_tp_train_step_matches_dp():
    cfg, params, x, _ = _setup()
    sched = DiffusionSchedule.create("linear", 1e-4, 0.02, 100)
    tx = optax.adamw(1e-3)
    key = jax.random.PRNGKey(7)

    # DP baseline on the plain data mesh
    mesh_dp = make_mesh(8)
    st_dp = replicate(mesh_dp, init_train_state(params, tx))
    step_dp = make_sharded_train_step(mesh_dp, cfg, sched.betas, tx)
    x_dp = shard_batch(mesh_dp, x)
    k_dp = replicate(mesh_dp, key)

    # dp=2 x tp=4
    mesh = make_mesh(8, axes=("data", "model"), shape=(2, 4))
    specs = unet_param_specs(params)
    p_tp = shard_unet_params(mesh, params)
    st_tp = jax.jit(lambda p: init_train_state(p, tx))(p_tp)
    step_tp = make_sharded_train_step(mesh, cfg, sched.betas, tx, param_specs=specs)
    x_tp = shard_batch(mesh, x)
    k_tp = replicate(mesh, key)

    for _ in range(2):
        st_dp, loss_dp = step_dp(st_dp, x_dp, k_dp)
        st_tp, loss_tp = step_tp(st_tp, x_tp, k_tp)
    np.testing.assert_allclose(float(loss_tp), float(loss_dp), rtol=1e-5)

    # params & EMA stayed pinned to the tp layout through the optimizer update
    k_new = st_tp.params["down"][0]["block"][0]["conv1"]["kernel"]
    assert k_new.addressable_shards[0].data.shape == (3, 3, 128, 32)
    e_new = st_tp.ema["down"][0]["block"][0]["conv1"]["kernel"]
    assert e_new.addressable_shards[0].data.shape == (3, 3, 128, 32)
    # Adam moments shard with their params (memory scales with 1/tp)
    mu = st_tp.opt_state[0].mu["down"][0]["block"][0]["conv1"]["kernel"]
    assert mu.addressable_shards[0].data.shape == (3, 3, 128, 32)

    # and the updated params agree with the DP run (tp psum reduction order
    # perturbs grads at float eps; two Adam rsqrt updates amplify to ~2e-5)
    w_dp = np.asarray(st_dp.params["down"][0]["block"][0]["conv1"]["kernel"])
    w_tp = np.asarray(st_tp.params["down"][0]["block"][0]["conv1"]["kernel"])
    np.testing.assert_allclose(w_tp, w_dp, atol=5e-5)


def test_mesh_explicit_shape_validation():
    with pytest.raises(ValueError, match="does not cover"):
        make_mesh(8, axes=("data", "model"), shape=(2, 2))


def test_runner_train_with_tp(tmp_path):
    """CLI surface: Diffusion.train() with --tp 4 on the 8-device mesh —
    sharded state trains, snapshots, and resumes."""
    import os

    from attentiondm_tpu.runners import Diffusion

    from test_runner import make_args, tiny_config

    config = tiny_config(tmp_path)
    args = make_args(tmp_path, tp=4)
    Diffusion(args, config).train()
    assert os.path.exists(os.path.join(args.log_path, "ckpt.npz"))

    # resume re-distributes the host checkpoint onto the tp layout
    args2 = make_args(tmp_path, tp=4, resume_training=True)
    config.training.n_iters = 5
    Diffusion(args2, config).train()


def test_runner_train_tp_indivisible_falls_back(tmp_path, caplog):
    import logging

    from attentiondm_tpu.runners import Diffusion

    from test_runner import make_args, tiny_config

    config = tiny_config(tmp_path)
    args = make_args(tmp_path, tp=3)  # 3 divides neither 8 devices nor 32 groups
    with caplog.at_level(logging.WARNING):
        Diffusion(args, config).train()
    assert any("falling back to pure DP" in r.message for r in caplog.records)


def test_sp_train_step_matches_dp():
    """dp x sp training: image height sharded over 'model', params
    replicated — loss matches the pure-DP step."""
    cfg, params, x, _ = _setup()
    sched = DiffusionSchedule.create("linear", 1e-4, 0.02, 100)
    tx = optax.adamw(1e-3)
    key = jax.random.PRNGKey(7)

    # each leg gets its OWN param copy: the train steps donate their state
    # argument, and replicate() aliases same-sharding buffers across legs
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    mesh_dp = make_mesh(8)
    st_dp = replicate(mesh_dp, init_train_state(copy(params), tx))
    step_dp = make_sharded_train_step(mesh_dp, cfg, sched.betas, tx)
    mesh = make_mesh(8, axes=("data", "model"), shape=(2, 4))
    st_sp = replicate(mesh, init_train_state(copy(params), tx))
    step_sp = make_sharded_train_step(mesh, cfg, sched.betas, tx, spatial=True)

    _, loss_dp = step_dp(st_dp, shard_batch(mesh_dp, x), replicate(mesh_dp, key))
    _, loss_sp = step_sp(st_sp, shard_batch_spatial(mesh, x), replicate(mesh, key))
    np.testing.assert_allclose(float(loss_sp), float(loss_dp), rtol=1e-5)

    with pytest.raises(ValueError, match="pick one"):
        make_sharded_train_step(mesh, cfg, sched.betas, tx, spatial=True,
                                param_specs=unet_param_specs(params))


def test_runner_train_with_sp(tmp_path):
    import os

    from attentiondm_tpu.runners import Diffusion

    from test_runner import make_args, tiny_config

    config = tiny_config(tmp_path)
    args = make_args(tmp_path, sp=4)
    Diffusion(args, config).train()
    assert os.path.exists(os.path.join(args.log_path, "ckpt.npz"))
