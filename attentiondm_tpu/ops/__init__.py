from .quant_conv import (
    int8_matmul,
    quantized_conv2d_int8,
    fold_weights_int8,
)

__all__ = ["int8_matmul", "quantized_conv2d_int8", "fold_weights_int8"]
