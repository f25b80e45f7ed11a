import numpy as np
import jax
import jax.numpy as jnp
import pytest

from attentiondm_tpu.models import (
    UNetConfig,
    unet_init,
    unet_apply,
    count_params,
    convert_ddim_state_dict,
)
from attentiondm_tpu.models.unet import iter_conv_layers

TINY = dict(
    ch=32,
    out_ch=3,
    ch_mult=(1, 2),
    num_res_blocks=2,
    attn_resolutions=(8,),
    dropout=0.0,
    in_channels=3,
    resolution=16,
)


def test_forward_shapes():
    cfg = UNetConfig(**TINY)
    params = unet_init(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.array([0.0, 500.0])
    out = unet_apply(params, cfg, x, t)
    assert out.shape == (2, 16, 16, 3)


def test_cifar10_param_count_matches_ddpm():
    """The CIFAR-10 DDPM/DDIM UNet is famously ~35.7M params; if our graph
    deviates (extra/missing blocks) this count moves."""
    cfg = UNetConfig()  # cifar10 defaults
    params = unet_init(jax.random.PRNGKey(0), cfg)
    n = count_params(params)
    assert 35.0e6 < n < 36.5e6, n


def test_matches_torch_oracle():
    """Golden test: identical weights (via the converter) => identical eps.

    Validates the architecture AND convert_ddim_state_dict in one shot:
    torch NCHW/OIHW vs jax NHWC/HWIO.
    """
    torch = pytest.importorskip("torch")
    from torch_oracle import TorchDDIMUNet

    tm = TorchDDIMUNet(**{k: v for k, v in TINY.items()})
    tm.eval()
    cfg = UNetConfig(**TINY)
    params = convert_ddim_state_dict(tm.state_dict(), cfg)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)
    t = np.array([10.0, 900.0], np.float32)

    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(t)).numpy()

    out = unet_apply(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t))
    out = np.asarray(out).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_matches_torch_oracle_deeper():
    """Three levels incl. a level without attention and channel changes."""
    torch = pytest.importorskip("torch")
    from torch_oracle import TorchDDIMUNet

    kw = dict(
        ch=32,
        out_ch=3,
        ch_mult=(1, 2, 2),
        num_res_blocks=1,
        attn_resolutions=(8,),
        dropout=0.0,
        in_channels=3,
        resolution=32,
    )
    tm = TorchDDIMUNet(**kw)
    tm.eval()
    cfg = UNetConfig(**kw)
    params = convert_ddim_state_dict(tm.state_dict(), cfg)

    rng = np.random.RandomState(1)
    x = rng.randn(1, 3, 32, 32).astype(np.float32)
    t = np.array([123.0], np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    out = unet_apply(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, atol=5e-4, rtol=5e-4)


def test_converter_rejects_mismatched_checkpoint():
    cfg = UNetConfig(**TINY)
    with pytest.raises(KeyError):
        convert_ddim_state_dict({"bogus.key": np.zeros((3, 3))}, cfg)


def test_iter_conv_layers_consistent_with_params():
    """Every name yielded by iter_conv_layers must exist in the pytree with the
    advertised input-channel count, and cover exactly the convs that
    unet_apply routes through conv_apply."""
    cfg = UNetConfig(**TINY)
    params = unet_init(jax.random.PRNGKey(0), cfg)

    def lookup(path):
        node = params
        for p in path.split("."):
            node = node[int(p)] if isinstance(node, list) else node[p]
        return node

    names = []
    for name, cin, ksize in iter_conv_layers(cfg):
        p = lookup(name)
        kh, kw, actual_cin, _ = p["kernel"].shape
        assert (kh, kw) == (ksize, ksize), name
        assert actual_cin == cin, (name, actual_cin, cin)
        names.append(name)

    # trace the forward and record which convs actually execute
    seen = []

    def spy(name, x, p, *, stride=1, padding="SAME"):
        seen.append(name)
        from attentiondm_tpu.models.unet import conv2d

        return conv2d(x, p, stride=stride, padding=padding)

    unet_apply(params, cfg, jnp.zeros((1, 16, 16, 3)), jnp.zeros((1,)), conv_apply=spy)
    assert set(seen) == set(names)
    assert len(seen) == len(names)


def test_ema():
    from attentiondm_tpu.models import ema_init, ema_update

    p = {"w": jnp.ones((2,))}
    s = ema_init(p)
    p2 = {"w": jnp.zeros((2,))}
    s = ema_update(s, p2, mu=0.9)
    np.testing.assert_allclose(np.asarray(s["w"]), [0.9, 0.9], rtol=1e-6)
