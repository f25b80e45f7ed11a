#!/bin/sh
# Attention-precision ablation launcher (4 variants A-D), mirroring the
# reference run_attention_ablation.sh (without its pip installs — this image
# is hermetic).  Pass --ckpt / --inception-weights for real-model runs.
python -u -m attentiondm_tpu.tools.ablation_attention \
    --config cifar10.yml \
    --out ablation_out \
    --steps 50 \
    --num-samples 64 \
    --sampler ddpm \
    "$@"
