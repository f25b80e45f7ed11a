"""Pretrained checkpoint registry + verified fetch.

Capability parity with the reference's `functions/ckpt_util.py:5-72`: the
DDIM-converted checkpoint names and md5s per dataset, local-cache lookup,
md5 verification, and download — which on a zero-egress machine fails with
an actionable message instead of hanging (the checkpoints must be provided
locally; they load via `models.torch_convert.load_torch_checkpoint`).
"""
from __future__ import annotations

import hashlib
import os

URL_MAP = {
    "cifar10": "https://heibox.uni-heidelberg.de/f/869980b53bf5416c8a28/?dl=1",
    "ema_cifar10": "https://heibox.uni-heidelberg.de/f/2e4f01e2d9ee49bab1d5/?dl=1",
    "lsun_bedroom": "https://heibox.uni-heidelberg.de/f/f179d4f21ebc4d43bbfe/?dl=1",
    "ema_lsun_bedroom": "https://heibox.uni-heidelberg.de/f/b95206528f384185889b/?dl=1",
    "lsun_cat": "https://heibox.uni-heidelberg.de/f/fac870bd988348eab88e/?dl=1",
    "ema_lsun_cat": "https://heibox.uni-heidelberg.de/f/0701aac3aa69457bbe34/?dl=1",
    "lsun_church": "https://heibox.uni-heidelberg.de/f/2711a6f712e34b06b9d8/?dl=1",
    "ema_lsun_church": "https://heibox.uni-heidelberg.de/f/44ccb50ef3c6436db52e/?dl=1",
}
CKPT_MAP = {
    "cifar10": "diffusion_cifar10_model/model-790000.ckpt",
    "ema_cifar10": "ema_diffusion_cifar10_model/model-790000.ckpt",
    "lsun_bedroom": "diffusion_lsun_bedroom_model/model-2388000.ckpt",
    "ema_lsun_bedroom": "ema_diffusion_lsun_bedroom_model/model-2388000.ckpt",
    "lsun_cat": "diffusion_lsun_cat_model/model-1761000.ckpt",
    "ema_lsun_cat": "ema_diffusion_lsun_cat_model/model-1761000.ckpt",
    "lsun_church": "diffusion_lsun_church_model/model-4432000.ckpt",
    "ema_lsun_church": "ema_diffusion_lsun_church_model/model-4432000.ckpt",
}
MD5_MAP = {
    "cifar10": "82ed3067fd1002f5cf4c339fb80c4669",
    "ema_cifar10": "1fa350b952534ae442b1d5235cce5cd3",
    "lsun_bedroom": "f70280ac0e08b8e696f42cb8e948ff1c",
    "ema_lsun_bedroom": "1921fa46b66a3665e450e42f36c2720f",
    "lsun_cat": "bbee0e7c3d7abfb6e2539eaf2fb9987b",
    "ema_lsun_cat": "646f23f4821f2459b8bafc57fd824558",
    "lsun_church": "eb619b8a5ab95ef80f94ce8a5488dae3",
    "ema_lsun_church": "fdc68a23938c2397caba4a260bc2445f",
}


def md5_hash(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def get_ckpt_path(name: str, root: str | None = None, check: bool = False) -> str:
    """Resolve (and verify) a pretrained checkpoint; download if reachable.

    Search order: $ATTENTIONDM_CKPT_ROOT (or `root`), then ~/.cache/attentiondm.
    """
    if name not in CKPT_MAP:
        raise KeyError(f"unknown checkpoint '{name}'; known: {sorted(CKPT_MAP)}")
    root = root or os.environ.get(
        "ATTENTIONDM_CKPT_ROOT", os.path.expanduser("~/.cache/attentiondm")
    )
    path = os.path.join(root, CKPT_MAP[name])
    if os.path.exists(path):
        if check and md5_hash(path) != MD5_MAP[name]:
            raise ValueError(f"md5 mismatch for {path} (expected {MD5_MAP[name]})")
        return path
    # attempt download (fails fast on zero-egress machines)
    try:
        import urllib.request

        os.makedirs(os.path.dirname(path), exist_ok=True)
        urllib.request.urlretrieve(URL_MAP[name], path)  # noqa: S310
    except Exception as e:
        raise FileNotFoundError(
            f"checkpoint '{name}' not found at {path} and download failed ({e}); "
            f"on an air-gapped machine place the file there manually "
            f"(md5 {MD5_MAP[name]})"
        ) from e
    if md5_hash(path) != MD5_MAP[name]:
        raise ValueError(f"downloaded {path} fails md5 verification")
    return path
