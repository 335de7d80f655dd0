"""Multi-device parallelism: mesh construction and the sharded per-buffer step."""

from .sharding import (  # noqa: F401
    AXIS_ASCAN,
    AXIS_BSCAN,
    make_mesh,
    make_sharded_step,
    sharded_process_buffer,
)
