"""DDPM training: optimizer factory and jitted/sharded train step.

Reference: functions/__init__.py:4-15 (`get_optimizer`),
runners/diffusion.py:100-193 (`Diffusion.train`): eps-prediction MSE with
antithetic timestep sampling, grad clipping, EMA shadow update, periodic
snapshots.  Here the whole step (loss, grads, clip, update, EMA) is one
jitted function, shardable over a data mesh — grads are averaged by XLA's
psum under the hood when the batch is sharded.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from .diffusion.losses import noise_estimation_loss
from .models.ema import ema_update
from .models.unet import UNetConfig, unet_apply


def get_optimizer(config) -> optax.GradientTransformation:
    """Adam / RMSProp / SGD per the config.optim group."""
    o = config.optim
    if o.optimizer == "Adam":
        return optax.adamw(
            o.lr,
            b1=o.beta1,
            b2=0.999,
            eps=o.eps,
            weight_decay=o.weight_decay if o.weight_decay else 0.0,
        )
    if o.optimizer == "RMSProp":
        return optax.chain(
            optax.add_decayed_weights(o.weight_decay or 0.0), optax.rmsprop(o.lr)
        )
    if o.optimizer == "SGD":
        return optax.sgd(o.lr, momentum=0.9)
    raise NotImplementedError(f"Optimizer {o.optimizer} not understood.")


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    ema: Any
    step: jax.Array


def init_train_state(params, tx: optax.GradientTransformation, use_ema=True) -> TrainState:
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        ema=jax.tree_util.tree_map(jnp.copy, params) if use_ema else None,
        step=jnp.zeros((), jnp.int32),
    )


def antithetic_timesteps(key, n: int, num_timesteps: int):
    """t ~ U[0, T) for n/2+1 samples, mirrored as T-t-1 (reference
    runners/diffusion.py:151-154)."""
    t = jax.random.randint(key, (n // 2 + 1,), 0, num_timesteps)
    return jnp.concatenate([t, num_timesteps - t - 1])[:n]


def make_train_step(
    cfg: UNetConfig,
    betas: jax.Array,
    tx: optax.GradientTransformation,
    *,
    grad_clip: float | None = 1.0,
    ema_rate: float | None = 0.9999,
    model_apply: Callable | None = None,
):
    """Build the jitted training step: (state, x0 [N,H,W,C], key) -> (state, loss)."""
    num_timesteps = betas.shape[0]
    apply = model_apply or (lambda p, x, t, rng: unet_apply(p, cfg, x, t, train=True, rng=rng))

    def train_step(state: TrainState, x0, key):
        kt, ke, kd = jax.random.split(key, 3)
        n = x0.shape[0]
        t = antithetic_timesteps(kt, n, num_timesteps)
        e = jax.random.normal(ke, x0.shape, x0.dtype)

        def loss_fn(params):
            loss, _ = noise_estimation_loss(
                lambda x, tt: apply(params, x, tt, kd), x0, t, e, betas
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        if grad_clip is not None:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-12))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = (
            ema_update(state.ema, params, mu=ema_rate)
            if state.ema is not None and ema_rate is not None
            else state.ema
        )
        return TrainState(params=params, opt_state=opt_state, ema=ema, step=state.step + 1), loss

    return train_step


def make_sharded_train_step(mesh, cfg, betas, tx, *, param_specs=None,
                            spatial=False, **kw):
    """The same step, jitted over `mesh`.

    param_specs=None: pure DP — params/opt state replicated, batch sharded on
    the leading axis, XLA psums the grads.

    param_specs=<PartitionSpec pytree> (see parallel/tp.py): dp x tp — params,
    grads, Adam moments, and EMA all live sharded; XLA inserts the activation
    psums (one per resblock, two per attention).  The new params/EMA are
    pinned back to the spec so the layout cannot drift step-over-step.

    spatial=True (2-D mesh, params replicated): dp x sp — the batch shards
    over 'data' AND the image height over 'model'; GSPMD halo-exchanges the
    3x3 convs and psums GroupNorm/loss reductions.  The activation-memory
    story for 256x256 training, exclusive with param_specs."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if spatial and param_specs is not None:
        raise ValueError("spatial sharding shards activations; tensor "
                         "parallelism shards the same mesh axis — pick one")
    step = make_train_step(cfg, betas, tx, **kw)
    repl = NamedSharding(mesh, P())
    batch = NamedSharding(mesh, P("data", "model") if spatial else P("data"))
    if param_specs is None:
        return jax.jit(
            step,
            in_shardings=(repl, batch, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )

    named = jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), param_specs)

    def tp_step(state, x0, key):
        state, loss = step(state, x0, key)
        params = jax.lax.with_sharding_constraint(state.params, named)
        ema = (
            jax.lax.with_sharding_constraint(state.ema, named)
            if state.ema is not None
            else None
        )
        return (
            TrainState(params=params, opt_state=state.opt_state, ema=ema, step=state.step),
            loss,
        )

    # in/out shardings inferred from the (already-sharded) arguments; the
    # constraint above anchors propagation through the whole step
    return jax.jit(tp_step, donate_argnums=(0,))
