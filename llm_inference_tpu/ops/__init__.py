"""TPU-native compute ops: norms, RoPE, activations, quantized matmuls.

The reference implements these as CPU SIMD kernels (reference ops.cpp);
here they are JAX/XLA ops (with Pallas fused kernels for the hot paths in
ops/pallas/) designed around the MXU/VPU and HBM-bandwidth roofline rather
than translated loop nests.
"""

from .numerics import (
    f16_round,
    gelu_tanh,
    nearest_int,
    rms_norm,
    rope,
    softcap,
)
from .actquant import (
    quantize_q8_0,
    quantize_q8_k,
    roundtrip_q8_0,
    roundtrip_q8_k,
)

__all__ = [
    "f16_round",
    "gelu_tanh",
    "nearest_int",
    "rms_norm",
    "rope",
    "softcap",
    "quantize_q8_0",
    "quantize_q8_k",
    "roundtrip_q8_0",
    "roundtrip_q8_k",
]
