from .primitives import (
    asymmetric_quant_params,
    ste_round,
    fake_quant,
    quantize_int,
    dequantize_int,
    lp_loss,
)
from .groupwise import groupwise_ranges
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
    "asymmetric_quant_params",
    "ste_round",
    "fake_quant",
    "quantize_int",
    "dequantize_int",
    "lp_loss",
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
