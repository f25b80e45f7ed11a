"""Checkpoint-faithful DDPM/DDIM UNet as a pure function over a param pytree.

The reference repo ships a *rewritten* UNet (models/diffusion.py:255-405 —
maxpool DownBlocks, lazily-created projection layers, positional state-dict
loading; defects D5/D6/D7 in SURVEY.md) that cannot load the published DDIM
checkpoints by name.  This module instead implements the *original* DDPM/DDIM
UNet graph (Ho et al. 2020 / Song et al. 2021 — the architecture that
`model-790000.ckpt` etc. actually parameterize), so checkpoints map by name
through `torch_convert.convert_ddim_state_dict`.

TPU-first design choices:
- NHWC activations and HWIO conv kernels (XLA's native TPU layouts);
- params are nested dicts / lists (a pytree) mirroring the torch module tree
  (`down[i].block[j].conv1` ...), so conversion is mechanical;
- no Python control flow on traced values; attention is einsum-based and
  batched over heads;
- every conv call goes through a single `conv_apply` chokepoint that an
  optional quantization context can intercept — this is where the
  per-timestep fake-quant / int8 Pallas path plugs in (see quant/qunet.py).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

Params = Any  # nested dict pytree


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 3
    out_ch: int = 3
    ch: int = 128
    ch_mult: tuple = (1, 2, 2, 2)
    num_res_blocks: int = 2
    attn_resolutions: tuple = (16,)
    dropout: float = 0.1
    resamp_with_conv: bool = True
    resolution: int = 32
    # attention block flavor: "ddim" (checkpoint-faithful single-head) or
    # "enhanced" (multi-head, per-projection bit-widths, gamma residual —
    # the reference's EnhancedQSelfAttention, self_attention.py:7-153)
    attn_variant: str = "ddim"
    attn_heads: int = 8

    @classmethod
    def from_config(cls, config) -> "UNetConfig":
        """Build from the YAML-derived namespace (configs/*.yml `model` group).

        Honors `attn_resolutions` as a resolution LIST — the reference read a
        scalar `attention_resolutions` default instead (defect D5).
        """
        m, d = config.model, config.data
        return cls(
            in_channels=m.in_channels,
            out_ch=getattr(m, "out_ch", getattr(m, "out_channels", d.channels)),
            ch=m.ch,
            ch_mult=tuple(m.ch_mult),
            num_res_blocks=m.num_res_blocks,
            attn_resolutions=tuple(m.attn_resolutions),
            dropout=m.dropout,
            resamp_with_conv=getattr(m, "resamp_with_conv", True),
            resolution=d.image_size,
        )

    @property
    def temb_ch(self) -> int:
        return self.ch * 4


def get_timestep_embedding(timesteps: jax.Array, embedding_dim: int) -> jax.Array:
    """Sinusoidal timestep embedding (transformer-style, half sin / half cos).

    Matches the reference (models/diffusion.py:11-29) / DDPM tensor2tensor
    convention: freq_i = exp(-log(10000) * i / (half-1)).
    """
    assert timesteps.ndim == 1
    half_dim = embedding_dim // 2
    emb = math.log(10000) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def swish(x):
    return x * jax.nn.sigmoid(x)


# ---------------------------------------------------------------------------
# primitive layers (pure functions over {kernel, bias} / {scale, bias} dicts)
# ---------------------------------------------------------------------------


def conv2d(x, p, *, stride: int = 1, padding="SAME"):
    """NHWC conv with HWIO kernel."""
    out = jax.lax.conv_general_dilated(
        x,
        p["kernel"],
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["bias"]


def dense(x, p):
    return x @ p["kernel"] + p["bias"]


def group_norm(x, p, num_groups: int = 32, eps: float = 1e-6):
    """GroupNorm over channel-last tensors (matches torch GroupNorm(32, C, eps=1e-6)).

    Statistics are always computed in float32 (bf16 variance underflows);
    output keeps the input dtype.
    """
    dtype = x.dtype
    N = x.shape[0]
    C = x.shape[-1]
    spatial = x.shape[1:-1]
    g = min(num_groups, C)
    xg = x.astype(jnp.float32).reshape(N, -1, g, C // g)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = xg.var(axis=(1, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    x = xg.reshape(N, *spatial, C)
    return (x * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(dtype)


# ---------------------------------------------------------------------------
# parameter initialization
# ---------------------------------------------------------------------------


def _init_conv(key, kh, kw, cin, cout, dtype=jnp.float32):
    """Torch default Conv2d init: kaiming-uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))."""
    fan_in = kh * kw * cin
    bound = 1.0 / math.sqrt(fan_in)
    k1, k2 = jax.random.split(key)
    return {
        "kernel": jax.random.uniform(k1, (kh, kw, cin, cout), dtype, -bound, bound),
        "bias": jax.random.uniform(k2, (cout,), dtype, -bound, bound),
    }


def _init_dense(key, cin, cout, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(cin)
    k1, k2 = jax.random.split(key)
    return {
        "kernel": jax.random.uniform(k1, (cin, cout), dtype, -bound, bound),
        "bias": jax.random.uniform(k2, (cout,), dtype, -bound, bound),
    }


def _init_norm(c, dtype=jnp.float32):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _init_resblock(key, cin, cout, temb_ch, conv_shortcut=False):
    ks = jax.random.split(key, 4)
    p = {
        "norm1": _init_norm(cin),
        "conv1": _init_conv(ks[0], 3, 3, cin, cout),
        "temb_proj": _init_dense(ks[1], temb_ch, cout),
        "norm2": _init_norm(cout),
        "conv2": _init_conv(ks[2], 3, 3, cout, cout),
    }
    if cin != cout:
        if conv_shortcut:
            p["conv_shortcut"] = _init_conv(ks[3], 3, 3, cin, cout)
        else:
            p["nin_shortcut"] = _init_conv(ks[3], 1, 1, cin, cout)
    return p


def _init_attn(key, c, variant="ddim"):
    ks = jax.random.split(key, 4)
    if variant == "enhanced":
        ck = c // 8  # key_channels = in_channels // 8 (self_attention.py:17)
        return {
            "query_conv": _init_conv(ks[0], 1, 1, c, ck),
            "key_conv": _init_conv(ks[1], 1, 1, c, ck),
            "value_conv": _init_conv(ks[2], 1, 1, c, c),
            "output_conv": _init_conv(ks[3], 1, 1, c, c),
            "gamma": jnp.zeros((1,)),
            "temperature": jnp.ones((1,)),
        }
    return {
        "norm": _init_norm(c),
        "q": _init_conv(ks[0], 1, 1, c, c),
        "k": _init_conv(ks[1], 1, 1, c, c),
        "v": _init_conv(ks[2], 1, 1, c, c),
        "proj_out": _init_conv(ks[3], 1, 1, c, c),
    }


def unet_init(key: jax.Array, cfg: UNetConfig) -> Params:
    """Initialize the full param pytree (structure mirrors the torch DDIM model)."""
    num_levels = len(cfg.ch_mult)
    in_ch_mult = (1,) + tuple(cfg.ch_mult)
    keys = iter(jax.random.split(key, 1024))

    params: dict = {}
    params["temb"] = {
        "dense0": _init_dense(next(keys), cfg.ch, cfg.temb_ch),
        "dense1": _init_dense(next(keys), cfg.temb_ch, cfg.temb_ch),
    }
    params["conv_in"] = _init_conv(next(keys), 3, 3, cfg.in_channels, cfg.ch)

    curr_res = cfg.resolution
    down = []
    block_in = cfg.ch
    for i_level in range(num_levels):
        blocks, attns = [], []
        block_in = cfg.ch * in_ch_mult[i_level]
        block_out = cfg.ch * cfg.ch_mult[i_level]
        for _ in range(cfg.num_res_blocks):
            blocks.append(_init_resblock(next(keys), block_in, block_out, cfg.temb_ch))
            block_in = block_out
            if curr_res in cfg.attn_resolutions:
                attns.append(_init_attn(next(keys), block_in, cfg.attn_variant))
        level: dict = {"block": blocks, "attn": attns}
        if i_level != num_levels - 1:
            if cfg.resamp_with_conv:
                level["downsample"] = {"conv": _init_conv(next(keys), 3, 3, block_in, block_in)}
            else:
                level["downsample"] = {}
            curr_res //= 2
        down.append(level)
    params["down"] = down

    params["mid"] = {
        "block_1": _init_resblock(next(keys), block_in, block_in, cfg.temb_ch),
        "attn_1": _init_attn(next(keys), block_in, cfg.attn_variant),
        "block_2": _init_resblock(next(keys), block_in, block_in, cfg.temb_ch),
    }

    up = [None] * num_levels
    for i_level in reversed(range(num_levels)):
        blocks, attns = [], []
        block_out = cfg.ch * cfg.ch_mult[i_level]
        for i_block in range(cfg.num_res_blocks + 1):
            skip_in = cfg.ch * cfg.ch_mult[i_level]
            if i_block == cfg.num_res_blocks:
                skip_in = cfg.ch * in_ch_mult[i_level]
            blocks.append(_init_resblock(next(keys), block_in + skip_in, block_out, cfg.temb_ch))
            block_in = block_out
            if curr_res in cfg.attn_resolutions:
                attns.append(_init_attn(next(keys), block_in, cfg.attn_variant))
        level = {"block": blocks, "attn": attns}
        if i_level != 0:
            if cfg.resamp_with_conv:
                level["upsample"] = {"conv": _init_conv(next(keys), 3, 3, block_in, block_in)}
            else:
                level["upsample"] = {}
            curr_res *= 2
        up[i_level] = level
    params["up"] = up

    params["norm_out"] = _init_norm(block_in)
    params["conv_out"] = _init_conv(next(keys), 3, 3, block_in, cfg.out_ch)
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _default_conv_apply(name, x, p, *, stride=1, padding="SAME"):
    return conv2d(x, p, stride=stride, padding=padding)


def _resblock_apply(name, p, x, temb, conv_apply, dropout_rate, rng, train, gates=None):
    h = group_norm(x, p["norm1"])
    h = swish(h)
    h = conv_apply(f"{name}.conv1", h, p["conv1"])
    h = h + dense(swish(temb), p["temb_proj"])[:, None, None, :]
    h = group_norm(h, p["norm2"])
    h = swish(h)
    if train and dropout_rate > 0 and rng is not None:
        keep = 1.0 - dropout_rate
        mask = jax.random.bernoulli(rng, keep, h.shape)
        h = jnp.where(mask, h / keep, 0.0)
    h = conv_apply(f"{name}.conv2", h, p["conv2"])
    if "conv_shortcut" in p:
        x = conv_apply(f"{name}.conv_shortcut", x, p["conv_shortcut"])
    elif "nin_shortcut" in p:
        x = conv_apply(f"{name}.nin_shortcut", x, p["nin_shortcut"])
    if gates is not None and "resblock" in gates:
        h = h * gates["resblock"]
    return x + h


def _attn_apply(name, p, x, conv_apply, cfg=None, attn_ctx=None, gates=None):
    """Dispatch to the configured attention flavor.  `gates` optionally
    scales the attention residual branch (differentiable architecture-
    importance search, reference ablation_study.py:18-68)."""
    if cfg is not None and cfg.attn_variant == "enhanced":
        out = _attn_apply_enhanced(name, p, x, conv_apply, cfg, attn_ctx)
    else:
        out = _attn_apply_ddim(name, p, x, conv_apply)
    if gates is not None and "attention" in gates:
        out = x + gates["attention"] * (out - x)
    return out


def _attn_apply_enhanced(name, p, x, conv_apply, cfg, attn_ctx=None):
    """EnhancedQSelfAttention (reference self_attention.py:118-153): 1x1-conv
    q/k/v/out projections with key_channels = C//8, learnable gamma residual;
    optional mixed-precision attention core (`attn_ctx` supplies per-layer
    MPAttentionState + the scalar diffusion timestep).

    The reference declares a `temperature` parameter it never uses in the
    standard path — kept (and likewise unused) for state parity.
    """
    B, H, W, C = x.shape
    q = conv_apply(f"{name}.query_conv", x, p["query_conv"])
    k = conv_apply(f"{name}.key_conv", x, p["key_conv"])
    v = conv_apply(f"{name}.value_conv", x, p["value_conv"])
    Ck = q.shape[-1]
    q = q.reshape(B, H * W, Ck)
    k = k.reshape(B, H * W, Ck).transpose(0, 2, 1)  # [B, Ck, HW]
    v = v.reshape(B, H * W, C)
    collect = (attn_ctx or {}).get("collect")
    if collect is not None:
        lg = jnp.einsum("blc,bcm->blm", q, k, preferred_element_type=jnp.float32) * (Ck ** -0.5)
        collect[name] = (lg.min(), lg.max())
    mp_state = (attn_ctx or {}).get("mp_states", {}).get(name)
    if mp_state is not None:
        from ..quant.attention_mp import mp_attention

        out = mp_attention(
            q,
            k,
            v,
            mp_state,
            num_heads=cfg.attn_heads,
            base_bits=attn_ctx.get("base_bits", 8),
            timestep=attn_ctx.get("timestep"),
            head_split=attn_ctx.get("head_split", "aligned"),
        )
    else:
        w = jnp.einsum("blc,bcm->blm", q, k, preferred_element_type=jnp.float32)
        w = jax.nn.softmax(w * (Ck ** -0.5), axis=-1).astype(x.dtype)
        out = jnp.einsum("blm,bmc->blc", w, v, preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.reshape(B, H, W, C)
    out = conv_apply(f"{name}.output_conv", out, p["output_conv"])
    return p["gamma"].astype(x.dtype) * out + x


def _attn_apply_ddim(name, p, x, conv_apply):
    """Single-head attention block (DDPM AttnBlock): softmax(q k^T / sqrt(C)) v."""
    B, H, W, C = x.shape
    h = group_norm(x, p["norm"])
    q = conv_apply(f"{name}.q", h, p["q"])
    k = conv_apply(f"{name}.k", h, p["k"])
    v = conv_apply(f"{name}.v", h, p["v"])
    q = q.reshape(B, H * W, C)
    k = k.reshape(B, H * W, C)
    v = v.reshape(B, H * W, C)
    # short maps (16x16 at the reference resolutions) take a fused dense
    # softmax; long maps stream through the blockwise Pallas kernel
    from ..ops.attention import spatial_attention

    h = spatial_attention(q, k, v, scale=C ** -0.5).astype(x.dtype)
    h = h.reshape(B, H, W, C)
    h = conv_apply(f"{name}.proj_out", h, p["proj_out"])
    return x + h


def _downsample(name, p, x, with_conv, conv_apply):
    if with_conv:
        # asymmetric pad (0,1,0,1) then VALID stride-2 conv — matches the DDPM
        # graph the checkpoints were trained with (torch can't pad asymmetrically
        # inside conv; reference models/diffusion.py:72-76 does the same).
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return conv_apply(f"{name}.conv", x, p["conv"], stride=2, padding="VALID")
    return jax.lax.reduce_window(
        x, jnp.asarray(0.0, x.dtype), jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / jnp.asarray(4.0, x.dtype)


def _upsample(name, p, x, with_conv, conv_apply):
    B, H, W, C = x.shape
    x = jax.image.resize(x, (B, 2 * H, 2 * W, C), method="nearest")
    if with_conv:
        x = conv_apply(f"{name}.conv", x, p["conv"])
    return x


def unet_apply(
    params: Params,
    cfg: UNetConfig,
    x: jax.Array,
    t: jax.Array,
    *,
    conv_apply: Callable | None = None,
    train: bool = False,
    rng: jax.Array | None = None,
    compute_dtype=None,
    attn_ctx: dict | None = None,
    gates: dict | None = None,
) -> jax.Array:
    """Forward pass: predict eps from (x_t [NHWC], t [N]).  Returns float32.

    `conv_apply(name, x, p, stride=, padding=)` is the chokepoint every conv
    routes through; the quantized model passes an interceptor that looks up
    per-layer quant state by `name` and runs the fake-quant / int8 path.

    `compute_dtype` (e.g. jnp.bfloat16) runs the network with that activation
    dtype — halves HBM traffic, which is the bottleneck for these UNets on
    TPU.  Params must be pre-cast (see `cast_params`); norm statistics and
    attention softmax stay in float32.
    """
    ca = conv_apply or _default_conv_apply
    num_levels = len(cfg.ch_mult)

    temb = get_timestep_embedding(t, cfg.ch)
    if gates is not None and "temb" in gates:
        temb = temb * gates["temb"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        temb = temb.astype(compute_dtype)
    temb = dense(temb, params["temb"]["dense0"])
    temb = swish(temb)
    temb = dense(temb, params["temb"]["dense1"])

    rngs = iter(jax.random.split(rng, 64)) if rng is not None else None

    def next_rng():
        return next(rngs) if rngs is not None else None

    # down
    hs = [ca("conv_in", x, params["conv_in"])]
    for i_level in range(num_levels):
        lp = params["down"][i_level]
        for i_block in range(cfg.num_res_blocks):
            h = _resblock_apply(
                f"down.{i_level}.block.{i_block}",
                lp["block"][i_block],
                hs[-1],
                temb,
                ca,
                cfg.dropout,
                next_rng(),
                train,
                gates,
            )
            if lp["attn"]:
                h = _attn_apply(f"down.{i_level}.attn.{i_block}", lp["attn"][i_block], h, ca, cfg, attn_ctx, gates)
            hs.append(h)
        if i_level != num_levels - 1:
            hs.append(
                _downsample(
                    f"down.{i_level}.downsample", lp.get("downsample", {}), hs[-1],
                    cfg.resamp_with_conv, ca,
                )
            )

    # mid
    h = hs[-1]
    h = _resblock_apply("mid.block_1", params["mid"]["block_1"], h, temb, ca, cfg.dropout, next_rng(), train, gates)
    h = _attn_apply("mid.attn_1", params["mid"]["attn_1"], h, ca, cfg, attn_ctx, gates)
    h = _resblock_apply("mid.block_2", params["mid"]["block_2"], h, temb, ca, cfg.dropout, next_rng(), train, gates)

    # up
    for i_level in reversed(range(num_levels)):
        lp = params["up"][i_level]
        for i_block in range(cfg.num_res_blocks + 1):
            h = _resblock_apply(
                f"up.{i_level}.block.{i_block}",
                lp["block"][i_block],
                jnp.concatenate([h, hs.pop()], axis=-1),
                temb,
                ca,
                cfg.dropout,
                next_rng(),
                train,
                gates,
            )
            if lp["attn"]:
                h = _attn_apply(f"up.{i_level}.attn.{i_block}", lp["attn"][i_block], h, ca, cfg, attn_ctx, gates)
        if i_level != 0:
            h = _upsample(f"up.{i_level}.upsample", lp.get("upsample", {}), h, cfg.resamp_with_conv, ca)
    assert not hs

    h = group_norm(h, params["norm_out"])
    h = swish(h)
    h = ca("conv_out", h, params["conv_out"])
    return h.astype(jnp.float32)


def cast_params(params: Params, dtype) -> Params:
    """Cast every param leaf to `dtype` (for compute_dtype runs)."""
    return jax.tree_util.tree_map(lambda a: a.astype(dtype), params)


def count_params(params: Params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def iter_conv_layers(cfg: UNetConfig):
    """Yield (name, in_channels, kernel_size) for every conv the forward pass
    routes through `conv_apply`, in call order.  Used to build per-layer
    quantization state without tracing."""
    num_levels = len(cfg.ch_mult)
    in_ch_mult = (1,) + tuple(cfg.ch_mult)
    curr_res = cfg.resolution

    def attn_projs(prefix, c):
        if cfg.attn_variant == "enhanced":
            yield (f"{prefix}.query_conv", c, 1)
            yield (f"{prefix}.key_conv", c, 1)
            yield (f"{prefix}.value_conv", c, 1)
            yield (f"{prefix}.output_conv", c, 1)
        else:
            for proj in ("q", "k", "v", "proj_out"):
                yield (f"{prefix}.{proj}", c, 1)

    yield ("conv_in", cfg.in_channels, 3)
    block_in = cfg.ch
    for i_level in range(num_levels):
        block_in = cfg.ch * in_ch_mult[i_level]
        block_out = cfg.ch * cfg.ch_mult[i_level]
        for i_block in range(cfg.num_res_blocks):
            yield (f"down.{i_level}.block.{i_block}.conv1", block_in, 3)
            yield (f"down.{i_level}.block.{i_block}.conv2", block_out, 3)
            if block_in != block_out:
                yield (f"down.{i_level}.block.{i_block}.nin_shortcut", block_in, 1)
            block_in = block_out
            if curr_res in cfg.attn_resolutions:
                yield from attn_projs(f"down.{i_level}.attn.{i_block}", block_in)
        if i_level != num_levels - 1:
            if cfg.resamp_with_conv:
                yield (f"down.{i_level}.downsample.conv", block_in, 3)
            curr_res //= 2

    yield ("mid.block_1.conv1", block_in, 3)
    yield ("mid.block_1.conv2", block_in, 3)
    yield from attn_projs("mid.attn_1", block_in)
    yield ("mid.block_2.conv1", block_in, 3)
    yield ("mid.block_2.conv2", block_in, 3)

    for i_level in reversed(range(num_levels)):
        block_out = cfg.ch * cfg.ch_mult[i_level]
        for i_block in range(cfg.num_res_blocks + 1):
            skip_in = cfg.ch * cfg.ch_mult[i_level]
            if i_block == cfg.num_res_blocks:
                skip_in = cfg.ch * in_ch_mult[i_level]
            yield (f"up.{i_level}.block.{i_block}.conv1", block_in + skip_in, 3)
            yield (f"up.{i_level}.block.{i_block}.conv2", block_out, 3)
            if block_in + skip_in != block_out:
                yield (f"up.{i_level}.block.{i_block}.nin_shortcut", block_in + skip_in, 1)
            block_in = block_out
            if curr_res in cfg.attn_resolutions:
                yield from attn_projs(f"up.{i_level}.attn.{i_block}", block_in)
        if i_level != 0:
            if cfg.resamp_with_conv:
                yield (f"up.{i_level}.upsample.conv", block_in, 3)
            curr_res *= 2

    yield ("conv_out", block_in, 3)
