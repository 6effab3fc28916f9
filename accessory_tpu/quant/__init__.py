"""Weight-only quantization: group-wise W4A16 / W3A16 (OmniQuant-style).

TPU replacement for the reference's bitsandbytes NF4/Int8 layer swap
(accessory/util/quant.py). Weights are packed int nibbles with per-group
scales and zeros; the hot path is a fused dequant+matmul Pallas kernel
(ops/quant_matmul_pallas.py) with an XLA reference used for fallback and
numerics tests.
"""

from accessory_tpu.quant.qtensor import (  # noqa: F401
    QuantizedWeight,
    quantize_weight,
    dequantize_weight,
    quant_matmul,
)
from accessory_tpu.quant.quantize import quantize_params, DEFAULT_BLOCKLIST  # noqa: F401
