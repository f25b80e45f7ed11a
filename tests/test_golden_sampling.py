"""End-to-end FP32 golden test: full DDIM sampling, torch loop vs our scan.

This is the north-star acceptance check (BASELINE.md: bitwise-close FP32
sampling vs the PyTorch reference) executed on a small model: identical
weights via the converter, identical noise, identical schedule -> the final
images must match to float32 tolerance.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from attentiondm_tpu.models import UNetConfig, convert_ddim_state_dict, unet_apply
from attentiondm_tpu.diffusion import DiffusionSchedule, ddim_sample, ddpm_sample, make_timestep_seq

KW = dict(
    ch=32,
    out_ch=3,
    ch_mult=(1, 2),
    num_res_blocks=1,
    attn_resolutions=(8,),
    dropout=0.0,
    in_channels=3,
    resolution=16,
)
T = 50


def _setup():
    torch = pytest.importorskip("torch")
    from torch_oracle import TorchDDIMUNet

    tm = TorchDDIMUNet(**KW)
    tm.eval()
    cfg = UNetConfig(**KW)
    params = convert_ddim_state_dict(tm.state_dict(), cfg)
    sched = DiffusionSchedule.create("linear", 1e-4, 0.02, T)
    x0 = np.random.RandomState(0).randn(2, 3, 16, 16).astype(np.float32)
    return torch, tm, cfg, params, sched, x0


def _torch_ddim(torch, tm, x, seq, betas, eta=0.0):
    import numpy as np

    abar = np.cumprod(1 - np.concatenate([[0.0], betas]))
    seq = list(seq)
    seq_next = [-1] + seq[:-1]
    xt = torch.from_numpy(x)
    with torch.no_grad():
        for i, j in zip(reversed(seq), reversed(seq_next)):
            t = torch.full((x.shape[0],), float(i))
            at = abar[i + 1]
            atn = abar[j + 1]
            et = tm(xt, t)
            x0_t = (xt - et * float(np.sqrt(1 - at))) / float(np.sqrt(at))
            c2 = float(np.sqrt(1 - atn))
            xt = float(np.sqrt(atn)) * x0_t + c2 * et
    return xt.numpy()


def test_fp32_ddim_sampling_matches_torch():
    torch, tm, cfg, params, sched, x0 = _setup()
    seq = make_timestep_seq(T, 10, "quad")
    betas = np.asarray(sched.betas, np.float64)

    ref = _torch_ddim(torch, tm, x0, seq, betas)

    model_fn = lambda xt, t, i: unet_apply(params, cfg, xt, t)
    out = ddim_sample(model_fn, jnp.asarray(x0.transpose(0, 2, 3, 1)), seq, sched.betas, eta=0.0)
    out = np.asarray(out).transpose(0, 3, 1, 2)

    # float32 accumulation across 10 full UNet forwards: tight but not bitwise
    np.testing.assert_allclose(out, ref, atol=5e-3, rtol=5e-3)
    # and the bulk of pixels agree much tighter
    assert np.median(np.abs(out - ref)) < 2e-4
