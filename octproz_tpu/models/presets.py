"""Named acquisition/processing presets.

The reference ships configuration implicitly (GUI defaults + the published
benchmark setup, performance/v180/performance_v180.md:20-52, and the figshare
test-volume geometry README.md:70-72); these presets make the common setups
constructible by name, for the CLI and tests.
"""

from __future__ import annotations

from typing import Dict, Tuple

from ..params import AcqParams, FpnMode, Interpolation, ProcConfig


def figshare_test_volume() -> AcqParams:
    """The published benchmark volume: 12-bit, 1024 x 512 x 256
    (README.md:70-72; the file on disk actually has 1664 samples/A-scan and
    is read as 1024, performance/v100/performance_v100.md:102)."""
    return AcqParams(samples_per_line=1024, ascans_per_bscan=512,
                     bscans_per_buffer=256, buffers_per_volume=1,
                     bit_depth=12)


def benchmark_config(tpu: bool = True) -> ProcConfig:
    """The reference's headline benchmark chain: cubic k-linearization +
    windowing + dispersion + FPN once + log scaling
    (performance/v180/performance_v180.md:20-52), with the 12-in-16-bit
    bitshift the figshare volume needs."""
    return ProcConfig(
        bitshift=True,
        resampling=True, interpolation=Interpolation.CUBIC,
        windowing=True, dispersion=True,
        fpn_mode=FpnMode.ONCE, log_scaling=True,
        fft_via_matmul=tpu,
    )


def minimal_config(tpu: bool = True) -> ProcConfig:
    """Bare reconstruction: IFFT + log only (every optional stage off).
    ``tpu=True`` (default) uses the planar fold path, which also runs fine
    on CPU; the axon TPU backend REQUIRES it (no complex64)."""
    return ProcConfig(log_scaling=True, fft_via_matmul=tpu)


def handheld_sinusoidal_config(tpu: bool = True) -> ProcConfig:
    """Resonant-scanner setup: full chain + bidirectional B-scan flip +
    sinusoidal scan correction (docs/docs/processing.md:150-189)."""
    return ProcConfig(
        bitshift=True,
        background_removal=True,
        resampling=True, interpolation=Interpolation.CUBIC,
        windowing=True, dispersion=True,
        fpn_mode=FpnMode.ONCE, log_scaling=True,
        bscan_flip=True, sinusoidal_correction=True,
        fft_via_matmul=tpu,
    )


PRESETS: Dict[str, Tuple[AcqParams, ProcConfig]] = {
    "benchmark": (figshare_test_volume(), benchmark_config()),
    "minimal": (figshare_test_volume(), minimal_config()),
    "handheld": (figshare_test_volume(), handheld_sinusoidal_config()),
}
