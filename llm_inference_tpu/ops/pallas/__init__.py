"""Pallas TPU kernels: the hot ops, fused against HBM bandwidth.

The reference fuses dequantization into its SIMD GEMVs so weights stream
once per matmul in their packed form (reference ops.cpp:188-956). These
kernels are the TPU equivalent: packed int8 planar blocks stream
HBM -> VMEM once and dequantize in registers, so the f32/bf16 weight
matrix never exists in HBM — the difference between ~5 bytes and ~1 byte
of HBM traffic per weight per step on the decode path.
"""

from .qmatmul import q4_matmul, quant_matmul, supports_pallas

__all__ = ["q4_matmul", "quant_matmul", "supports_pallas"]
