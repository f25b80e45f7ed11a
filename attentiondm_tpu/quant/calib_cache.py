"""Calibration-state persistence (VERDICT r2 item 3).

Every `sample()` invocation used to re-run the FP teacher trajectory plus
stages 1/2 (+AdaRound) from scratch — ~10 min of prep on a warm 50k
production run before the first image.  This module serializes everything
calibration produces into one self-describing .npz:

  - per-layer ActQuantState pytrees (the stage-1/2 output),
  - per-step attention q/k/v absmax ranges (the int8 QK^T static scales),
  - per-layer WeightExtras (signed rounding offsets, bias-correction mu,
    pinned shrink, per-step out_mult/bias_delta refinements),
  - the 'diff' t-mode bookkeeping (sample_count, selected timestep),
  - a metadata header (seq, bit policy, attention variant) that must match
    the requesting run — a mismatched cache is ignored, not trusted.

The reference has no equivalent (its calibration state lives in module
buffers and dies with the process); `checkpoint.py` covers like-structured
pytrees but not this "which layers exist / which extras are present" shape
discovery, hence the dedicated format.
"""
from __future__ import annotations

import json
import logging
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .state import ActQuantState

_QFIELDS = ("init_range", "act_min", "act_max", "group_ranges", "alpha_logits")
_XFIELDS = ("round_offset", "mu", "shrink", "out_mult", "bias_delta")
# 3: round_offset int16 (GPTQ offsets are SIGNED multi-level — uint8 wrapped
#    negatives to 255 and pinned those weights to +max on reload) and the
#    per-step refinement fields (out_mult/bias_delta) persist.  The bump
#    invalidates format-2 caches, whose gptq offsets were silently corrupt.
_FORMAT = 3


def _meta_of(args, seq, model_sig=None) -> dict:
    return {
        "format": _FORMAT,
        "seq": [int(s) for s in seq],
        "seed": int(getattr(args, "seed", 0)),
        "eta": float(getattr(args, "eta", 0.0)),
        "bitwidth": int(getattr(args, "bitwidth", 8)),
        "a_bitwidth": getattr(args, "a_bitwidth", None),
        "normgroup": int(getattr(args, "normgroup", 0) or 0),
        "attn_variant": getattr(args, "attn_variant", "ddim"),
        "calibrate_attention": bool(getattr(args, "calibrate_attention", False)),
        "calib_t_mode": getattr(args, "calib_t_mode", "real"),
        "weight_opt": getattr(args, "weight_opt", "adaround"),
        "weight_refine": getattr(args, "weight_refine", "off") or "off",
        "stage2_mode": getattr(args, "stage2_mode", "reference"),
        # a cache without attention ranges must not serve an --attn_int8 run
        "attn_int8": bool(getattr(args, "attn_int8", False)),
        # shared-fold extras are anchored on the rank-1 u grid (quant/rank1.py)
        # — they must not serve a per-step-fold run, and vice versa
        "shared_fold": bool(getattr(args, "shared_fold", False)),
        "model": model_sig,
    }


def save_calibration(
    path: str,
    args,
    seq,
    qstates: Dict[str, ActQuantState],
    *,
    attn_ranges=None,
    weight_extras=None,
    sample_count=None,
    timestep_select=None,
    model_sig=None,
) -> None:
    flat: Dict[str, np.ndarray] = {}
    for name, st in qstates.items():
        for f in _QFIELDS:
            flat[f"qstate/{name}/{f}"] = np.asarray(jax.device_get(getattr(st, f)))
    if attn_ranges:
        for name, arr in attn_ranges.items():
            flat[f"attn/{name}"] = np.asarray(jax.device_get(arr))
    if weight_extras:
        for name, ex in weight_extras.items():
            for f in _XFIELDS:
                v = getattr(ex, f)
                if v is None:
                    continue
                v = np.asarray(jax.device_get(v))
                if f == "round_offset":
                    # signed: GPTQ emits multi-level offsets in both directions
                    v = v.astype(np.int16)
                flat[f"extras/{name}/{f}"] = v
    if sample_count is not None:
        flat["misc/sample_count"] = np.asarray(jax.device_get(sample_count))
    if timestep_select is not None:
        flat["misc/timestep_select"] = np.asarray(int(timestep_select))
    flat["meta"] = np.frombuffer(
        json.dumps(_meta_of(args, seq, model_sig)).encode(), dtype=np.uint8
    )

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **flat)
    os.replace(tmp, path)
    logging.info(f"saved calibration cache to {path} ({os.path.getsize(path)/1e6:.1f} MB)")


def load_calibration(path: str, args, seq, model_sig=None):
    """Load a calibration cache if it exists AND its metadata matches the
    requesting configuration.  Returns a dict with keys qstates, attn_ranges,
    weight_extras, sample_count, timestep_select — or None."""
    if not path or not os.path.exists(path):
        return None
    try:
        with np.load(path, allow_pickle=False) as z:
            flat = {k: z[k] for k in z.files}
    except Exception as e:  # corrupt cache: recalibrate, don't crash the run
        logging.warning(f"ignoring unreadable calibration cache {path}: {e}")
        return None
    try:
        meta = json.loads(bytes(flat.pop("meta").tobytes()).decode())
    except Exception:
        logging.warning(f"ignoring calibration cache {path}: missing/invalid meta")
        return None
    want = _meta_of(args, seq, model_sig)
    if meta != want:
        diff = {k: (meta.get(k), want[k]) for k in want if meta.get(k) != want[k]}
        logging.warning(f"ignoring calibration cache {path}: config mismatch {diff}")
        return None

    from .adaround import WeightExtras

    qstates: Dict[str, ActQuantState] = {}
    attn_ranges: Dict[str, jax.Array] = {}
    extras: Dict[str, dict] = {}
    out = {"sample_count": None, "timestep_select": None}
    for k, v in flat.items():
        parts = k.split("/")
        if parts[0] == "qstate":
            name, field = "/".join(parts[1:-1]), parts[-1]
            qstates.setdefault(name, {})[field] = jnp.asarray(v)
        elif parts[0] == "attn":
            attn_ranges["/".join(parts[1:])] = jnp.asarray(v)
        elif parts[0] == "extras":
            name, field = "/".join(parts[1:-1]), parts[-1]
            arr = jnp.asarray(v.astype(np.float32) if field == "round_offset" else v)
            extras.setdefault(name, {})[field] = arr
        elif k == "misc/sample_count":
            out["sample_count"] = jnp.asarray(v)
        elif k == "misc/timestep_select":
            out["timestep_select"] = int(v)
    # layer names contain dots, not slashes — undo the split-join identity
    out["qstates"] = {
        n: ActQuantState(**{f: d[f] for f in _QFIELDS}) for n, d in qstates.items()
    }
    out["attn_ranges"] = attn_ranges or None
    out["weight_extras"] = {
        n: WeightExtras(**{f: d.get(f) for f in _XFIELDS}) for n, d in extras.items()
    } or None
    logging.info(f"loaded calibration cache from {path} ({len(out['qstates'])} layers)")
    return out
