import os

import numpy as np
import pytest

from attentiondm_tpu.native import write_png_batch, native_available
from attentiondm_tpu.pretrained import CKPT_MAP, MD5_MAP, URL_MAP, get_ckpt_path, md5_hash
from attentiondm_tpu.utils.profiling import SmoothedValue, StepTimer


def test_png_batch_writer_roundtrip(tmp_path):
    from PIL import Image

    imgs = np.random.default_rng(0).random((5, 16, 16, 3)).astype(np.float32)
    n = write_png_batch(imgs, str(tmp_path), 10)
    assert n == 5
    files = sorted(os.listdir(tmp_path))
    assert files == [f"{i}.png" for i in range(10, 15)]
    a = np.asarray(Image.open(tmp_path / "12.png"))
    expect = (np.clip(imgs[2], 0, 1) * 255 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(a, expect)


def test_png_writer_native_builds():
    # the toolchain is baked into this image; the native path must be live
    assert native_available()


def test_pretrained_registry():
    assert set(CKPT_MAP) == set(MD5_MAP) == set(URL_MAP)
    assert CKPT_MAP["cifar10"].endswith("model-790000.ckpt")
    with pytest.raises(KeyError):
        get_ckpt_path("nope")


def test_pretrained_local_and_md5(tmp_path):
    p = tmp_path / CKPT_MAP["cifar10"]
    p.parent.mkdir(parents=True)
    p.write_bytes(b"hello")
    # found locally without check
    assert get_ckpt_path("cifar10", root=str(tmp_path)) == str(p)
    # md5 check fails for wrong content
    with pytest.raises(ValueError):
        get_ckpt_path("cifar10", root=str(tmp_path), check=True)
    assert md5_hash(str(p)) == "5d41402abc4b2a76b9719d911017c592"


def test_pretrained_missing_fails_actionably(tmp_path):
    with pytest.raises(FileNotFoundError, match="place the file"):
        get_ckpt_path("cifar10", root=str(tmp_path / "empty"))


def test_smoothed_value():
    s = SmoothedValue(window_size=3)
    for v in [1, 2, 3, 4]:
        s.update(v)
    assert s.avg == pytest.approx(3.0)  # window [2,3,4]
    assert s.global_avg == pytest.approx(2.5)
    s.synchronize_between_processes()  # no-op single process
    assert s.count == 4


def test_step_timer():
    t = StepTimer()
    with t.lap():
        pass
    assert len(t.times) == 1 and t.best >= 0


def test_log_every(caplog):
    import logging

    from attentiondm_tpu.utils.metrics_log import log_every

    with caplog.at_level(logging.INFO):
        out = [x * 2 for x in log_every(range(5), 2, header="t")]
    assert out == [0, 2, 4, 6, 8]
    assert any("[0/5]" in r.message for r in caplog.records)
    assert any("total" in r.message for r in caplog.records)
