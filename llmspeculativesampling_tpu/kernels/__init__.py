"""Pallas (Mosaic) TPU kernels — the framework's native-kernel layer."""

from .int8_matmul import int8_matmul, int8_matmul_ref

__all__ = ["int8_matmul", "int8_matmul_ref"]
