"""Runner-level coverage of the serving execution branch + calib cache
(VERDICT r2 items 3, 4, 9): Diffusion.sample()/test() driven with
--execution serving on the CPU mesh — plain sampling, --fid resume,
--step_chunk/--superbatch, --attn_int8 gating, cache round-trip."""
import argparse
import logging
import os

import numpy as np
import pytest

from attentiondm_tpu.runners import Diffusion

from test_runner import make_args as _base_args, tiny_config

# multi-minute integration file (r5 fast lane: pytest -m 'not slow')
pytestmark = pytest.mark.slow


def make_args(tmp, **kw):
    d = dict(
        execution="serving",
        weight_opt="adaround",
        adaround_iters=50,
        stage2_mode="reference",
        stage2_lr=0.02,
        calib_cache=None,
        superbatch=None,
        step_chunk=None,
        attn_int8=False,
        timesteps=3,
        bitwidth=8,
    )
    d.update(kw)
    return _base_args(tmp, **d)


def test_serving_sample_writes_images(tmp_path):
    config = tiny_config(tmp_path)
    args = make_args(tmp_path)
    runner = Diffusion(args, config)
    runner.sample()
    assert os.path.exists(os.path.join(args.image_folder, "grid.png"))
    # the weight pass ran and produced extras for the eligible layers
    assert getattr(runner, "weight_extras", None) is not None


def test_serving_fid_with_hole_resume(tmp_path):
    config = tiny_config(tmp_path)
    args = make_args(tmp_path, fid=True, num_samples=8, weight_opt="off")
    Diffusion(args, config).sample()
    pngs = [f for f in os.listdir(args.image_folder) if f.endswith(".png")]
    assert len(pngs) == 8
    # punch a hole mid-run and resume: the batch containing it regenerates
    os.remove(os.path.join(args.image_folder, "3.png"))
    Diffusion(make_args(tmp_path, fid=True, num_samples=8, weight_opt="off"), config).sample()
    pngs = sorted(int(f[:-4]) for f in os.listdir(args.image_folder) if f[:-4].isdigit())
    assert pngs == list(range(8))


def test_serving_fid_in_process_scoring(tmp_path, monkeypatch, capsys, caplog):
    """--fid --fid_stats closes the generate->score loop in ONE command
    (VERDICT r4 item #6): generation, sharded on-device statistics over the
    folder, Frechet distance vs the reference .npz, one printed FID number.
    The extractor is stubbed (mean-pool features) exactly like pytorch-fid's
    own mock-model tests (SURVEY §4) so the test stays seconds-fast."""
    import jax.numpy as jnp

    from attentiondm_tpu.eval.inception import InceptionV3FID

    class Stub:
        def extract(self, x):
            f = jnp.asarray(x).mean(axis=(1, 2))  # [N, 3]
            return jnp.concatenate([f, f * f, 1.0 - f, f * 0.5], axis=1)

    monkeypatch.setattr(
        InceptionV3FID, "random", classmethod(lambda cls, seed=0: Stub())
    )
    rng = np.random.default_rng(0)
    feats = rng.random((64, 12))
    np.savez(tmp_path / "ref_stats.npz",
             mu=feats.mean(0), sigma=np.cov(feats, rowvar=False))

    config = tiny_config(tmp_path)
    args = make_args(tmp_path, fid=True, num_samples=8, weight_opt="off",
                     fid_stats=str(tmp_path / "ref_stats.npz"),
                     inception_weights=None)
    with caplog.at_level(logging.WARNING):
        Diffusion(args, config).sample()
    out = capsys.readouterr().out
    assert "FID:" in out
    fid = float(out.split("FID:")[1].split()[0])
    assert np.isfinite(fid) and fid >= 0.0
    # without canonical weights the number must be labeled relative-only
    assert any("NOT canonical" in r.message for r in caplog.records)


def test_serving_step_chunk_and_superbatch_fid(tmp_path):
    config = tiny_config(tmp_path)
    args = make_args(
        tmp_path, fid=True, num_samples=8, step_chunk=2, superbatch=8, weight_opt="off"
    )
    Diffusion(args, config).sample()
    pngs = [f for f in os.listdir(args.image_folder) if f[:-4].isdigit()]
    assert len(pngs) == 8


def test_serving_attn_int8_enhanced_gating_warns(tmp_path, caplog):
    """--attn_int8 with the enhanced variant must warn and fall back to the
    f32 attention core, not crash."""
    config = tiny_config(tmp_path)
    args = make_args(tmp_path, attn_int8=True, attn_variant="enhanced", weight_opt="off")
    with caplog.at_level(logging.WARNING):
        Diffusion(args, config).sample()
    assert any("attn_int8" in r.message for r in caplog.records)
    assert os.path.exists(os.path.join(args.image_folder, "grid.png"))


def test_serving_ddpm_runs_on_the_engine(tmp_path, caplog):
    """--sample_type ddpm_noisy drives the fused serving engine (ancestral
    update in the same per-step-fold scan); round 2 fell back to
    interception here."""
    config = tiny_config(tmp_path)
    args = make_args(tmp_path, sample_type="ddpm_noisy", weight_opt="off")
    with caplog.at_level(logging.INFO):
        Diffusion(args, config).sample()
    assert any("serving-int8" in r.message and "/ddpm" in r.message
               for r in caplog.records)
    assert os.path.exists(os.path.join(args.image_folder, "grid.png"))


def test_calib_cache_roundtrip_and_reuse(tmp_path, caplog):
    config = tiny_config(tmp_path)
    cache = os.path.join(str(tmp_path), "cal.npz")
    args = make_args(tmp_path, calib_cache=cache, calibrate_attention=True,
                     calib_t_mode="diff")
    with caplog.at_level(logging.INFO):
        r1 = Diffusion(args, config)
        r1.sample()
    assert os.path.exists(cache)
    assert any("saved calibration cache" in r.message for r in caplog.records)

    caplog.clear()
    args2 = make_args(tmp_path, calib_cache=cache, calibrate_attention=True,
                      calib_t_mode="diff")
    with caplog.at_level(logging.INFO):
        r2 = Diffusion(args2, config)
        r2.sample()
    assert any("loaded calibration cache" in r.message for r in caplog.records)
    # no fresh stage-1 happened on the cached run
    assert not any("stage-1 range calibration" in r.message for r in caplog.records)
    # 'diff' bookkeeping restored from the cache
    assert r2.timestep_select is not None
    assert r2.weight_extras is not None and len(r2.weight_extras) > 0


def test_calib_cache_mismatch_is_ignored(tmp_path, caplog):
    config = tiny_config(tmp_path)
    cache = os.path.join(str(tmp_path), "cal.npz")
    Diffusion(make_args(tmp_path, calib_cache=cache, weight_opt="off"), config).sample()
    assert os.path.exists(cache)
    caplog.clear()
    # different bitwidth -> cache must be ignored and rebuilt
    args2 = make_args(tmp_path, calib_cache=cache, bitwidth=6, weight_opt="off")
    with caplog.at_level(logging.WARNING):
        Diffusion(args2, config).sample()
    assert any("config mismatch" in r.message for r in caplog.records)


def test_quantized_test_serving_returns_finite(tmp_path):
    config = tiny_config(tmp_path)
    args = make_args(tmp_path, weight_opt="off")
    loss = Diffusion(args, config).test()
    assert np.isfinite(loss)


def test_teacher_matched_stage2_runs_in_runner(tmp_path, caplog):
    config = tiny_config(tmp_path)
    args = make_args(
        tmp_path, calibrate_attention=True, stage2_mode="teacher", weight_opt="off"
    )
    with caplog.at_level(logging.INFO):
        Diffusion(args, config).sample()
    assert any("teacher-matched" in r.message for r in caplog.records)
    assert os.path.exists(os.path.join(args.image_folder, "grid.png"))


def test_serving_weight_refine_perstep_and_gptq(tmp_path):
    """--weight_refine perstep and --weight_opt gptq drive through
    Diffusion.sample(): the refinement stage produces per-step [S, co]
    fields that the serving fold consumes."""
    config = tiny_config(tmp_path)
    args = make_args(tmp_path, weight_opt="gptq", weight_refine="perstep")
    runner = Diffusion(args, config)
    runner.sample()
    assert os.path.exists(os.path.join(args.image_folder, "grid.png"))
    extras = runner.weight_extras
    assert extras is not None
    ex = next(e for e in extras.values() if e.out_mult is not None)
    assert ex.out_mult.ndim == 2 and ex.out_mult.shape[0] == args.timesteps
    # gptq produced integer offsets on at least one layer
    assert any(e.round_offset is not None for e in extras.values())


def test_calib_cache_keys_on_weight_refine(tmp_path):
    """A cache saved without refinement must not serve a --weight_refine run."""
    from attentiondm_tpu.quant.calib_cache import load_calibration

    from attentiondm_tpu.diffusion import make_timestep_seq

    config = tiny_config(tmp_path)
    cache = os.path.join(str(tmp_path), "cc.npz")
    args = make_args(tmp_path, calib_cache=cache, weight_refine="off")
    Diffusion(args, config).sample()
    assert os.path.exists(cache)
    seq = make_timestep_seq(
        config.diffusion.num_diffusion_timesteps, args.timesteps, args.skip_type
    )
    # same flags -> hit (guards against a vacuous miss from a wrong seq)
    hit_args = make_args(tmp_path, calib_cache=cache, weight_refine="off")
    sig = str(Diffusion(hit_args, config).ucfg)
    assert load_calibration(cache, hit_args, seq, model_sig=sig) is not None
    miss_args = make_args(tmp_path, calib_cache=cache, weight_refine="perstep")
    # metadata mismatch -> miss (load_calibration keys on weight_refine)
    assert load_calibration(cache, miss_args, seq, model_sig=sig) is None


def test_calib_cache_roundtrips_signed_gptq_offsets(tmp_path):
    """GPTQ rounding offsets are SIGNED multi-level ints; the round-2 cache
    stored them as uint8, wrapping -1 to 255 and pinning those weights to
    +max on reload (round-3 review finding).  Direct save/load round-trip
    with negative offsets and per-step refinement fields."""
    import jax.numpy as jnp
    import jax

    from attentiondm_tpu.quant.adaround import WeightExtras
    from attentiondm_tpu.quant.calib_cache import load_calibration, save_calibration
    from attentiondm_tpu.quant.state import ActQuantState

    args = make_args(tmp_path, weight_opt="gptq", weight_refine="perstep")
    seq = [0, 300, 600]
    S = 3
    qstates = {
        "down.0.block.0.conv1": ActQuantState(
            init_range=jnp.zeros((2,)),
            act_min=jnp.zeros((S,)),
            act_max=jnp.ones((S,)),
            group_ranges=jnp.ones((S, 2, 2)),
            alpha_logits=jnp.zeros((S, 2, 4)),
        )
    }
    extras = {
        "down.0.block.0.conv1": WeightExtras(
            round_offset=jnp.asarray([[[[-3, 0], [2, -1]]]], jnp.float32),
            mu=jnp.asarray([0.1, -0.2]),
            shrink=jnp.asarray([0.9, 1.0]),
            out_mult=1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(0), (S, 2)),
            bias_delta=0.01 * jax.random.normal(jax.random.PRNGKey(1), (S, 2)),
        )
    }
    cache = os.path.join(str(tmp_path), "signed.npz")
    save_calibration(cache, args, seq, qstates, weight_extras=extras)
    out = load_calibration(cache, args, seq)
    assert out is not None
    got = out["weight_extras"]["down.0.block.0.conv1"]
    want = extras["down.0.block.0.conv1"]
    np.testing.assert_array_equal(np.asarray(got.round_offset),
                                  np.asarray(want.round_offset))
    assert float(np.asarray(got.round_offset).min()) == -3.0  # sign survived
    np.testing.assert_allclose(np.asarray(got.out_mult), np.asarray(want.out_mult))
    np.testing.assert_allclose(np.asarray(got.bias_delta), np.asarray(want.bias_delta))
    np.testing.assert_allclose(np.asarray(got.shrink), np.asarray(want.shrink))


def test_superbatch_without_step_chunk_warns_and_keeps_batch(tmp_path, caplog):
    """--superbatch without --step_chunk has no micro_batch loop; it must be
    ignored with a warning, not run the superbatch as one activation batch."""
    config = tiny_config(tmp_path)
    args = make_args(tmp_path, fid=True, num_samples=8, superbatch=8, weight_opt="off")
    with caplog.at_level(logging.WARNING):
        Diffusion(args, config).sample()
    assert any("superbatch" in r.message for r in caplog.records)
    pngs = [f for f in os.listdir(args.image_folder) if f[:-4].isdigit()]
    assert len(pngs) == 8


def test_test_cache_with_attn_int8_carries_ranges(tmp_path):
    """test() saving a cache under --attn_int8 must include attention ranges
    (a trusted cache without them silently loses the calibrated static
    scales on a later --attn_int8 sample run)."""
    from attentiondm_tpu.quant.calib_cache import load_calibration

    config = tiny_config(tmp_path)
    cache = os.path.join(str(tmp_path), "tcache.npz")
    args = make_args(tmp_path, test=True, attn_int8=True, calib_cache=cache,
                     weight_opt="off")
    runner = Diffusion(args, config)
    runner.test()
    assert os.path.exists(cache)
    out = load_calibration(cache, args, [int(s) for s in runner.make_seq()],
                           model_sig=str(runner.ucfg))
    assert out is not None and out["attn_ranges"], "cache lacks attention ranges"


def test_serving_shared_fold_runs(tmp_path):
    """--shared_fold drives the rank-1 step-shared fold through sample():
    the production ladder (gptq + perstep refine) on the shared grid."""
    config = tiny_config(tmp_path)
    args = make_args(tmp_path, shared_fold=True, weight_opt="gptq",
                     weight_refine="perstep", bitwidth=4, a_bitwidth=8)
    runner = Diffusion(args, config)
    runner.sample()
    assert os.path.exists(os.path.join(args.image_folder, "grid.png"))
    assert runner.weight_extras is not None


def test_shared_fold_drops_step_chunk_with_warning(tmp_path, caplog):
    config = tiny_config(tmp_path)
    args = make_args(tmp_path, shared_fold=True, step_chunk=2, weight_opt="off")
    with caplog.at_level(logging.WARNING):
        Diffusion(args, config).sample()
    assert any("shared_fold" in r.message for r in caplog.records)
    assert os.path.exists(os.path.join(args.image_folder, "grid.png"))


def test_serving_pack_int4_runs(tmp_path):
    config = tiny_config(tmp_path)
    args = make_args(tmp_path, pack_int4=True, bitwidth=4, a_bitwidth=8,
                     weight_opt="off")
    Diffusion(args, config).sample()
    assert os.path.exists(os.path.join(args.image_folder, "grid.png"))


def test_calib_cache_keys_on_shared_fold(tmp_path):
    """Shared-fold extras anchor on the rank-1 u grid — a per-step cache must
    not serve a --shared_fold run."""
    from attentiondm_tpu.diffusion import make_timestep_seq
    from attentiondm_tpu.quant.calib_cache import load_calibration

    config = tiny_config(tmp_path)
    cache = os.path.join(str(tmp_path), "sf.npz")
    args = make_args(tmp_path, calib_cache=cache, weight_opt="off")
    Diffusion(args, config).sample()
    assert os.path.exists(cache)
    seq = make_timestep_seq(
        config.diffusion.num_diffusion_timesteps, args.timesteps, args.skip_type
    )
    hit_args = make_args(tmp_path, calib_cache=cache, weight_opt="off")
    sig = str(Diffusion(hit_args, config).ucfg)
    assert load_calibration(cache, hit_args, seq, model_sig=sig) is not None
    miss_args = make_args(tmp_path, calib_cache=cache, weight_opt="off",
                          shared_fold=True)
    assert load_calibration(cache, miss_args, seq, model_sig=sig) is None
