import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from attentiondm_tpu.config import load_config, namespace2dict
from attentiondm_tpu.models import UNetConfig, unet_init
from attentiondm_tpu.parallel import make_mesh, shard_batch, replicate
from attentiondm_tpu.training import (
    get_optimizer,
    init_train_state,
    make_train_step,
    make_sharded_train_step,
    antithetic_timesteps,
)
from attentiondm_tpu.diffusion import DiffusionSchedule

ALL_CONFIGS = ["cifar10.yml", "celeba.yml", "church.yml", "bedroom.yml", "imagenet64.yml", "ablation_config.yml"]


@pytest.mark.parametrize("name", ALL_CONFIGS)
def test_configs_load_and_build_unet_config(name):
    c = load_config(name)
    assert c.diffusion.num_diffusion_timesteps == 1000
    ucfg = UNetConfig.from_config(c)
    assert ucfg.attn_resolutions == (16,)  # list semantics honored (anti-D5)
    assert ucfg.ch == 128
    d = namespace2dict(c)
    assert d["data"]["channels"] == 3


def test_get_optimizer_variants():
    c = load_config("cifar10.yml")
    tx = get_optimizer(c)
    assert isinstance(tx, optax.GradientTransformation)
    c.optim.optimizer = "SGD"
    get_optimizer(c)
    c.optim.optimizer = "RMSProp"
    get_optimizer(c)
    c.optim.optimizer = "Nope"
    with pytest.raises(NotImplementedError):
        get_optimizer(c)


def test_antithetic_timesteps():
    t = antithetic_timesteps(jax.random.PRNGKey(0), 8, 100)
    assert t.shape == (8,)
    t = np.asarray(t)
    # layout: first n//2+1 draws, then their mirrors T-t-1, truncated to n
    np.testing.assert_array_equal(t[5:8], 99 - t[:3])


def test_mesh_8_devices():
    mesh = make_mesh(8)
    assert mesh.shape["data"] == 8
    x = shard_batch(mesh, jnp.arange(16.0).reshape(16, 1))
    assert len(x.sharding.device_set) == 8


def test_mesh_too_many_devices():
    with pytest.raises(ValueError):
        make_mesh(1000)


def test_train_step_single_device():
    cfg = UNetConfig(ch=32, ch_mult=(1,), num_res_blocks=1, attn_resolutions=(), resolution=8, dropout=0.0)
    sched = DiffusionSchedule.create("linear", 1e-4, 0.02, 50)
    tx = optax.adamw(1e-3)
    params = unet_init(jax.random.PRNGKey(0), cfg)
    state = init_train_state(params, tx)
    step = jax.jit(make_train_step(cfg, sched.betas, tx))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 3))
    state2, loss = step(state, x0, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    assert int(state2.step) == 1
    # ema moved toward params but is not identical to old ema
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()), state2.ema, state.ema)
    assert max(jax.tree_util.tree_leaves(d)) > 0


def test_sharded_train_step_loss_matches_single_device():
    """DP over 8 virtual devices must give the same loss as single-device."""
    cfg = UNetConfig(ch=32, ch_mult=(1,), num_res_blocks=1, attn_resolutions=(), resolution=8, dropout=0.0)
    sched = DiffusionSchedule.create("linear", 1e-4, 0.02, 50)
    tx = optax.adamw(1e-3)
    params = unet_init(jax.random.PRNGKey(0), cfg)

    x0 = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 3))
    key = jax.random.PRNGKey(2)

    state1 = init_train_state(params, tx)
    _, loss1 = jax.jit(make_train_step(cfg, sched.betas, tx))(state1, x0, key)

    mesh = make_mesh(8)
    state8 = replicate(mesh, init_train_state(params, tx))
    sstep = make_sharded_train_step(mesh, cfg, sched.betas, tx)
    _, loss8 = sstep(state8, shard_batch(mesh, x0), replicate(mesh, key))
    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-4)
