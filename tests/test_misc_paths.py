"""Coverage for secondary paths: interpolation/sequence flags, ddpm_noisy
sampler type, dequantization transforms, inception weight conversion."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from test_runner import tiny_config, make_args
from attentiondm_tpu.runners import Diffusion
from attentiondm_tpu.config import load_config
from attentiondm_tpu.data import data_transform

# multi-minute integration file (r5 fast lane: pytest -m 'not slow')
pytestmark = pytest.mark.slow


def test_interpolation_flag(tmp_path):
    config = tiny_config(tmp_path)
    args = make_args(tmp_path, fp32=True, interpolation=True, timesteps=3)
    Diffusion(args, config).sample()
    assert os.path.exists(os.path.join(args.image_folder, "interpolation.png"))


def test_sequence_flag(tmp_path):
    config = tiny_config(tmp_path)
    args = make_args(tmp_path, fp32=True, sequence=True, timesteps=4, num_samples=4)
    Diffusion(args, config).sample()
    seq_files = [f for f in os.listdir(args.image_folder) if f.startswith("seq_step")]
    assert seq_files


def test_ddpm_noisy_sample_type(tmp_path):
    config = tiny_config(tmp_path)
    args = make_args(tmp_path, fp32=True, sample_type="ddpm_noisy", timesteps=4)
    Diffusion(args, config).sample()
    assert os.path.exists(os.path.join(args.image_folder, "grid.png"))


def test_dequantization_transforms():
    cfg = load_config("cifar10.yml")
    cfg.data.rescaled = False
    cfg.data.uniform_dequantization = True
    x = np.zeros((2, 4, 4, 3), np.float32)
    y = data_transform(cfg, x, np.random.default_rng(0))
    assert 0 < y.max() < 1 / 250  # uniform noise scaled into [0, 1/256)

    cfg.data.uniform_dequantization = False
    cfg.data.gaussian_dequantization = True
    y = data_transform(cfg, x, np.random.default_rng(0))
    assert y.std() > 0

    cfg.data.gaussian_dequantization = False
    cfg.data.logit_transform = True
    xm = np.full((1, 2, 2, 3), 0.5, np.float32)
    y = data_transform(cfg, xm)
    np.testing.assert_allclose(y, 0.0, atol=1e-5)
    from attentiondm_tpu.data import inverse_data_transform

    back = inverse_data_transform(cfg, y)
    np.testing.assert_allclose(back, 0.5, atol=1e-5)


def test_inception_torch_conversion_roundtrip(tmp_path):
    """Synthesize a torch state dict with the canonical FID-inception names
    from our own layout; converting it must reproduce identical params."""
    torch = pytest.importorskip("torch")
    from attentiondm_tpu.eval.inception import (
        inception_init,
        load_torch_inception,
        _LAYOUT,
        _block_convs,
    )

    params = inception_init(jax.random.PRNGKey(3))
    sd = {}
    for name, btype, spec in _LAYOUT:
        if btype == "maxpool":
            continue
        entries = (
            [(None, params[name])]
            if btype == "basic"
            else [(b, params[name][b]) for b in _block_convs(btype, spec)]
        )
        for branch, node in entries:
            prefix = name if branch is None else f"{name}.{branch}"
            k = np.transpose(np.asarray(node["conv"]["kernel"]), (3, 2, 0, 1))
            sd[f"{prefix}.conv.weight"] = torch.from_numpy(k.copy())
            sd[f"{prefix}.bn.weight"] = torch.from_numpy(np.asarray(node["bn"]["scale"]).copy())
            sd[f"{prefix}.bn.bias"] = torch.from_numpy(np.asarray(node["bn"]["bias"]).copy())
            sd[f"{prefix}.bn.running_mean"] = torch.from_numpy(np.asarray(node["bn"]["mean"]).copy())
            sd[f"{prefix}.bn.running_var"] = torch.from_numpy(np.asarray(node["bn"]["var"]).copy())
    p = str(tmp_path / "incep.pth")
    torch.save(sd, p)
    loaded = load_torch_inception(p)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(loaded)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_schedule_from_config():
    from attentiondm_tpu.diffusion import DiffusionSchedule

    cfg = load_config("imagenet64.yml")  # cosine schedule (the D8 fix)
    s = DiffusionSchedule.from_config(cfg)
    assert s.num_timesteps == 1000
    assert bool(jnp.isfinite(s.logvar).all())


def test_cross_model_comparison(tmp_path):
    """Working equivalent of the reference's dead cross_model_comparison
    (self_attention_analysis.py:371-446, defect D10)."""
    import numpy as np

    from attentiondm_tpu.tools.activation_range import cross_model_comparison

    ts = [0, 500, 999]
    reports = {
        "cifar10": {
            "mid.attn_1.proj_out": {"min": np.array([-1.0, -2.0, -3.0]),
                                    "max": np.array([1.0, 2.0, 3.0])},
            "mid.attn_1.q": {"min": np.zeros(3), "max": np.ones(3)},
        },
        "celeba": {
            "mid.attn_1.proj_out": {"min": np.array([-2.0, -2.0, -2.0]),
                                    "max": np.array([2.0, 2.0, 2.0])},
        },
    }
    out = cross_model_comparison(reports, ts, str(tmp_path))
    assert set(out["avg_output_ranges"]) == {"cifar10", "celeba"}
    assert abs(out["avg_output_ranges"]["cifar10"]["mean"] - 4.0) < 1e-9
    assert out["timestep_patterns"]["celeba"] == [4.0, 4.0, 4.0]
    import os
    assert os.path.exists(tmp_path / "cross_model_comparison.json")
    assert os.path.exists(tmp_path / "model_comparison_output_ranges.png")


def test_serving_sweep_tool_runs_tiny():
    """tools/serving_sweep drives a tiny grid end-to-end (CPU)."""
    from attentiondm_tpu.models import UNetConfig
    from attentiondm_tpu.tools.serving_sweep import sweep

    tiny = UNetConfig(ch=128, ch_mult=(1,), num_res_blocks=1,
                      attn_resolutions=(8,), resolution=8, dropout=0.0)
    rows = sweep("cifar10.yml", 2, [2], [None, 2], reps=1, ucfg_override=tiny)
    # both variants produce a finite rate; winner is whichever
    assert len(rows) == 2
    assert all(r["img_per_sec"] > 0 for r in rows)
