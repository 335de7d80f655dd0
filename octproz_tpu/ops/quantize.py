"""Quantize processed float volumes (0..1) for host streaming / recording.

Numerics match ``floatToOutput`` (octproz_project/octproz/src/cuda_code.cu:
943-967): saturate to [0, 1], scale by the bit-depth's max code, truncate to
unsigned integers of the smallest container (uint8 / uint16 / uint32).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Note: the reference's 32-bit scale 4294967295 rounds to 2^32 in float32 and
# relies on CUDA's saturating float->uint cast; float32 cannot represent
# 2^32-1, so we use the largest representable value below 2^32 (2^32-256).
# Maximum relative deviation 6e-8 at full scale.
_SCALES = (
    (8, 255.0, jnp.uint8),
    (10, 1023.0, jnp.uint16),
    (12, 4095.0, jnp.uint16),
    (16, 65535.0, jnp.uint16),
    (24, 16777215.0, jnp.uint32),
    (32, 4294967040.0, jnp.uint32),
)


def output_dtype(bit_depth: int):
    for limit, _, dtype in _SCALES:
        if bit_depth <= limit:
            return dtype
    return jnp.uint32


def quantize(x: jnp.ndarray, bit_depth: int) -> jnp.ndarray:
    """float32 (0..1, saturated) -> unsigned integers (same shape)."""
    for limit, scale, dtype in _SCALES:
        if bit_depth <= limit:
            return (jnp.clip(x, 0.0, 1.0) * jnp.float32(scale)).astype(dtype)
    return (jnp.clip(x, 0.0, 1.0) * jnp.float32(4294967040.0)).astype(jnp.uint32)


def code_max(bit_depth: int) -> float:
    """The full-scale CODE of a quantized stream (what :func:`quantize`
    multiplied by) — NOT the container dtype's max: 12-bit codes ride in
    uint16, so normalizing by ``np.iinfo(dtype).max`` would be 16x dark."""
    for limit, scale, _ in _SCALES:
        if bit_depth <= limit:
            return float(scale)
    return 4294967040.0


def dequantize(x, bit_depth: int):
    """Quantized codes (or float passthrough) -> float32 in [0, 1]."""
    out = np.asarray(x, np.float32)
    if np.issubdtype(np.asarray(x).dtype, np.integer):
        out = out / np.float32(code_max(bit_depth))
    return out
