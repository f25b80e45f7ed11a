"""Golden tests: JAX FID InceptionV3 vs an independent torch oracle.

The oracle (tests/torch_inception_oracle.py) has the pt_inception state-dict
key layout, so `load_torch_inception` converts its randomized weights into
the JAX pytree — any pad / pool / BN-eps / resize mismatch between the two
implementations shows up as a feature mismatch.  This is the FID analog of
tests/torch_oracle.py (VERDICT r3 item #1): it converts the FID stack from
"shape-checked" to "proven" without needing the real checkpoint.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from attentiondm_tpu.eval.inception import inception_apply, load_torch_inception
from tests.torch_inception_oracle import TorchFIDInception, randomize_

# multi-minute integration file (r5 fast lane: pytest -m 'not slow')
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def oracle_and_params(tmp_path_factory):
    model = randomize_(TorchFIDInception(), seed=0)
    path = tmp_path_factory.mktemp("incep") / "fake_pt_inception.pth"
    torch.save(model.state_dict(), str(path))
    params = load_torch_inception(str(path))
    return model, params


def _rel_err(a, b):
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-12))


@pytest.mark.parametrize("size", [32, 64, 299])
def test_features_match_torch_oracle(oracle_and_params, size):
    """2048-d features match at several input sizes, including the bilinear
    resize + [-1,1] rescale preprocessing (pytorch-fid defaults)."""
    model, params = oracle_and_params
    rng = np.random.default_rng(size)
    x = rng.random((2, size, size, 3)).astype(np.float32)

    with torch.no_grad():
        ref = model(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(inception_apply(params, jnp.asarray(x)))

    assert got.shape == (2, 2048)
    assert _rel_err(got, ref) < 1e-4, f"max rel err {_rel_err(got, ref):.2e} at {size}px"


def test_features_match_no_preprocess(oracle_and_params):
    """Raw 299px path (resize/normalize off) isolates the network itself."""
    model, params = oracle_and_params
    rng = np.random.default_rng(7)
    x = (rng.random((1, 299, 299, 3)).astype(np.float32) - 0.5) * 2.0

    with torch.no_grad():
        ref = model(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            resize_input=False, normalize_input=False,
        ).numpy()
    got = np.asarray(
        inception_apply(params, jnp.asarray(x), resize_input=False, normalize_input=False)
    )
    assert _rel_err(got, ref) < 1e-4


def test_converter_rejects_missing_keys(tmp_path):
    """A truncated state dict must fail loudly, not silently keep random init."""
    model = randomize_(TorchFIDInception(), seed=1)
    sd = model.state_dict()
    sd.pop("Mixed_7c.branch_pool.conv.weight")
    path = tmp_path / "broken.pth"
    torch.save(sd, str(path))
    with pytest.raises(KeyError):
        load_torch_inception(str(path))
