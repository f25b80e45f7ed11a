from .primitives import (
    asymmetric_quant_params,
    percentile_range,
    ste_round,
    fake_quant,
    quantize_int,
    dequantize_int,
    lp_loss,
)
from .groupwise import groupwise_ranges
from .qunet import (
    QuantizedUNet,
    make_bit_policy,
    init_qunet_state,
    make_weight_states,
    quantize_params,
    make_quant_conv_apply,
)
from .attention_mp import (
    MPAttentionState,
    init_mp_attention_state,
    mp_attention,
    effective_bits,
    update_quant_params,
    calibrate_mp_attention,
    make_logit_collector,
)
from .calibrate import (
    calibrate_ranges,
    calibrate_differentiable,
    calibrate_teacher_matched,
    refine_weight_extras,
    select_calibration_images,
    alpha_uncertainty,
)
from .adaround import WeightExtras, compute_weight_extras
from .calib_cache import load_calibration, save_calibration
from .state import (
    ActQuantConfig,
    ActQuantState,
    WeightQuantState,
    init_act_quant_state,
    quantize_weight_per_channel,
    make_weight_quant_state,
    quantize_activation,
    quantize_activation_mixture,
    mixed_ranges,
)

__all__ = [
    "QuantizedUNet",
    "calibrate_teacher_matched",
    "refine_weight_extras",
    "WeightExtras",
    "compute_weight_extras",
    "load_calibration",
    "save_calibration",
    "make_bit_policy",
    "init_qunet_state",
    "make_weight_states",
    "quantize_params",
    "make_quant_conv_apply",
    "calibrate_ranges",
    "calibrate_differentiable",
    "select_calibration_images",
    "alpha_uncertainty",
    "asymmetric_quant_params",
    "ste_round",
    "fake_quant",
    "quantize_int",
    "dequantize_int",
    "lp_loss",
    "percentile_range",
    "groupwise_ranges",
    "ActQuantConfig",
    "ActQuantState",
    "WeightQuantState",
    "init_act_quant_state",
    "quantize_weight_per_channel",
    "make_weight_quant_state",
    "quantize_activation",
    "quantize_activation_mixture",
    "mixed_ranges",
]
