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


def test_crc32c_known_answer():
    from attentiondm_tpu.utils.tb_writer import crc32c

    assert crc32c(b"123456789") == 0xE3069283  # canonical CRC-32C check value
    assert crc32c(b"") == 0


def test_tb_writer_roundtrip(tmp_path):
    """Write scalars, then decode the tfevents file with an independent
    TFRecord/proto parser and recover (tag, step, value)."""
    import struct

    from attentiondm_tpu.utils.tb_writer import SummaryWriter, _masked_crc

    w = SummaryWriter(str(tmp_path))
    w.add_scalar("loss", 0.5, 1)
    w.add_scalar("loss", 0.25, 2)
    w.close()

    data = open(w.path, "rb").read()
    records = []
    off = 0
    while off < len(data):
        (ln,) = struct.unpack_from("<Q", data, off)
        (hcrc,) = struct.unpack_from("<I", data, off + 8)
        assert hcrc == _masked_crc(data[off : off + 8])
        payload = data[off + 12 : off + 12 + ln]
        (pcrc,) = struct.unpack_from("<I", data, off + 12 + ln)
        assert pcrc == _masked_crc(payload)
        records.append(payload)
        off += 12 + ln + 4

    def read_varint(b, i):
        out = shift = 0
        while True:
            out |= (b[i] & 0x7F) << shift
            shift += 7
            i += 1
            if not b[i - 1] & 0x80:
                return out, i

    def parse(b):
        fields = {}
        i = 0
        while i < len(b):
            key, i = read_varint(b, i)
            num, wt = key >> 3, key & 7
            if wt == 0:
                v, i = read_varint(b, i)
            elif wt == 1:
                v = struct.unpack_from("<d", b, i)[0]; i += 8
            elif wt == 5:
                v = struct.unpack_from("<f", b, i)[0]; i += 4
            elif wt == 2:
                ln, i = read_varint(b, i)
                v = b[i : i + ln]; i += ln
            fields.setdefault(num, []).append(v)
        return fields

    ev0 = parse(records[0])
    assert ev0[3][0] == b"brain.Event:2"
    scalars = []
    for rec in records[1:]:
        ev = parse(rec)
        summary = parse(ev[5][0])
        value = parse(summary[1][0])
        scalars.append((value[1][0].decode(), ev[2][0], round(value[2][0], 6)))
    assert scalars == [("loss", 1, 0.5), ("loss", 2, 0.25)]
