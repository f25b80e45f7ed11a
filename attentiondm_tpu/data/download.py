"""Dataset download helpers (capability parity with datasets/utils.py in the
reference: URL + Google-Drive fetch with md5 verification).

Stdlib-only (urllib).  On zero-egress machines these fail fast with an
actionable message — all readers in `data/datasets.py` work from local files.
"""
from __future__ import annotations

import hashlib
import os
import urllib.parse
import urllib.request


def check_md5(path: str, md5: str) -> bool:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest() == md5


def download_url(url: str, root: str, filename: str | None = None, md5: str | None = None) -> str:
    """Download `url` into `root/filename` unless already present+verified."""
    filename = filename or os.path.basename(urllib.parse.urlparse(url).path)
    path = os.path.join(root, filename)
    if os.path.exists(path) and (md5 is None or check_md5(path, md5)):
        return path
    os.makedirs(root, exist_ok=True)
    try:
        urllib.request.urlretrieve(url, path)  # noqa: S310
    except Exception as e:
        raise FileNotFoundError(
            f"could not download {url} ({e}); on an air-gapped machine place "
            f"the file at {path} manually"
        ) from e
    if md5 is not None and not check_md5(path, md5):
        raise ValueError(f"{path} fails md5 verification ({md5})")
    return path


def download_file_from_google_drive(file_id: str, root: str, filename: str, md5: str | None = None) -> str:
    """Google-Drive fetch incl. the large-file confirm-token dance
    (reference datasets/utils.py:48-186)."""
    path = os.path.join(root, filename)
    if os.path.exists(path) and (md5 is None or check_md5(path, md5)):
        return path
    os.makedirs(root, exist_ok=True)
    base = "https://docs.google.com/uc?export=download"
    try:
        import http.cookiejar

        jar = http.cookiejar.CookieJar()
        opener = urllib.request.build_opener(urllib.request.HTTPCookieProcessor(jar))
        resp = opener.open(f"{base}&id={file_id}")
        token = None
        for c in jar:
            if c.name.startswith("download_warning"):
                token = c.value
        if token:
            resp = opener.open(f"{base}&confirm={token}&id={file_id}")
        with open(path, "wb") as f:
            while True:
                chunk = resp.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
    except Exception as e:
        raise FileNotFoundError(
            f"could not fetch Google Drive file {file_id} ({e}); place it at {path} manually"
        ) from e
    if md5 is not None and not check_md5(path, md5):
        raise ValueError(f"{path} fails md5 verification ({md5})")
    return path
