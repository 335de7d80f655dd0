"""Pipeline stage ops. Each module implements one stage of the FD-OCT signal
chain with numerics matching the reference CUDA kernels (see per-module
docstrings for file:line citations into /root/reference)."""

from . import background, convert, dispersion, fft, fpn, postprocess, projections, quantize, resample  # noqa: F401
