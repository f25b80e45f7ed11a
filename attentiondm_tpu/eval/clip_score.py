"""CLIP image-text scoring (used by the attention ablation).

Parity with the reference's `compute_clip_score`
(ablation_study_attention_quantization.py:409-493: CLIP ViT-B/32 cosine
between generated images and class-name prompts).  Model weights cannot be
downloaded on a zero-egress machine, so loading is gated: pass a local
HuggingFace CLIP directory; otherwise `make_clip_scorer` raises with an
actionable message and callers (the ablation harness) simply skip the score.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np

CIFAR10_PROMPTS = [
    f"a photo of a {c}"
    for c in (
        "airplane", "automobile", "bird", "cat", "deer",
        "dog", "frog", "horse", "ship", "truck",
    )
]


def make_clip_scorer(model_dir: str, prompts: Sequence[str] = CIFAR10_PROMPTS):
    """Returns scorer(images01_nhwc) -> mean max-cosine CLIP score.

    `model_dir` must contain a local `transformers` CLIP checkpoint
    (config + weights + tokenizer); no hub download is attempted.
    """
    try:
        import torch
        from transformers import CLIPModel, CLIPProcessor
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(f"transformers/torch unavailable: {e}") from e

    try:
        model = CLIPModel.from_pretrained(model_dir, local_files_only=True)
        processor = CLIPProcessor.from_pretrained(model_dir, local_files_only=True)
    except Exception as e:
        raise FileNotFoundError(
            f"no local CLIP checkpoint at {model_dir}; CLIP scoring requires "
            f"locally provided weights (zero-egress machine)"
        ) from e
    model.eval()

    def scorer(images01: np.ndarray) -> float:
        imgs = [(np.clip(x, 0, 1) * 255).astype(np.uint8) for x in images01]
        with torch.no_grad():
            inputs = processor(
                text=list(prompts), images=imgs, return_tensors="pt", padding=True
            )
            out = model(**inputs)
            # image-text cosine similarities [N_img, N_text]
            sims = out.logits_per_image / model.logit_scale.exp()
            return float(sims.max(dim=1).values.mean())

    return scorer
