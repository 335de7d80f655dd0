"""Spectral windowing and numerical dispersion compensation.

Numerics match the reference kernels (octproz_project/octproz/src/cuda_code.cu):

* ``windowing``                      (:328-339):  out = in * window[j], imag = 0
* ``dispersionCompensation``         (:593-607):  out = in.x * phasor[j]
  (the full complex multiply is skipped because the pre-FFT signal is real,
  see the comment at cuda_code.cu:601-602)
* ``dispersionCompensationAndWindowing`` (:609-622): window then phase

The phasor LUT is exp(+i * phi) with a direction sign
(``fillDispersivePhase``, cuda_code.cu:624-634); see curves.dispersion_phase.

These are elementwise per-column multiplies; under jit XLA fuses them with the
resampling matmul's epilogue, which reproduces the reference's key fusion
(klinearization*AndWindowingAndDispersionCompensation, cuda_code.cu:413-489)
without a hand-written kernel.
"""

from __future__ import annotations

import jax.numpy as jnp


def apply_window(x: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """x: float32 (..., n) real spectra; window: float32 (n,)."""
    return x * window


def apply_dispersion(x_real: jnp.ndarray, phase: jnp.ndarray) -> jnp.ndarray:
    """Real spectra -> complex64 via per-column phasor multiply.

    x_real: float32 (..., n); phase: complex64 (n,) = exp(+i*phi).
    """
    return x_real.astype(jnp.complex64) * phase


def prep_spectra(
    x_real: jnp.ndarray,
    window: jnp.ndarray | None,
    phase: jnp.ndarray | None,
) -> jnp.ndarray:
    """window (optional) then dispersion phase (optional).

    Returns complex64 if phase is given, float32 otherwise (a real result
    allows the FFT stage to use the cheaper RFFT path).
    """
    if window is not None:
        x_real = apply_window(x_real, window)
    if phase is not None:
        return apply_dispersion(x_real, phase)
    return x_real
