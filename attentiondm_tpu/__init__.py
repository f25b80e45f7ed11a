"""attentiondm_tpu — a TPU-native JAX/XLA/Pallas rebuild of PTQ-AttnDM.

A complete, standalone framework with the capabilities of the reference
`aqilmarwan/attentionDM` (post-training quantization of DDPM/DDIM diffusion
UNets with per-timestep, per-channel, group-wise differentiable activation
quantization and attention-aware calibration), re-designed TPU-first:

- functional core: all quantization state lives in explicit pytrees threaded
  through pure ``apply`` functions (no module hooks, no global counters);
- samplers are ``lax.scan`` programs — the whole trajectory stays on device;
- hot ops (quantized conv / attention) lower to Pallas TPU kernels that run
  true int8 matmuls on the MXU instead of fake-quant + float conv;
- scale-out via ``jax.sharding.Mesh`` + NamedSharding (DP-sharded sampling,
  psum-reduced FID statistics).

Reference layer map: see /root/repo/SURVEY.md.
"""

__version__ = "0.1.0"
