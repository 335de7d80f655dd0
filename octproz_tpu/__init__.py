"""octproz_tpu -- a TPU-native FD-OCT processing framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
application OCTproZ (C++/CUDA/Qt, see /root/reference and SURVEY.md), but an
idiomatic TPU architecture: functional jitted pipeline, MXU-matmul
k-linearization, batched XLA FFT, shard_map sharding over device meshes.
"""

from .params import (  # noqa: F401
    AcqParams,
    Curves,
    DisplayFunction,
    FpnMode,
    FpnState,
    Interpolation,
    ProcConfig,
    WindowType,
    default_full_config,
)
from . import curves, ops, pipeline  # noqa: F401
from .pipeline import initial_fpn_state, make_scan_step, make_step, process_buffer  # noqa: F401

__version__ = "0.1.0"
