"""Out-of-tree example plugin package for octproz_tpu.

Lives OUTSIDE the framework tree (tests/data/extplugin_pkg) and is loaded
purely through the runtime plugin loader (octproz_tpu.plugins.load_plugin /
entry points) — proving a third party can ship an Extension and an
acquisition system without editing the framework, the capability of the
reference's QPluginLoader discovery pass
(octproz_project/octproz/src/octprozapp.cpp:99-174).
"""

import numpy as np

from octproz_tpu.params import AcqParams
from octproz_tpu.plugins import Extension


class BufferCounterExtension(Extension):
    """Minimal processed-data subscriber (DemoExtension analog,
    octproz_plugins/octproz-demo-extension/src/demoextension.cpp:88-115)."""

    name = "buffer_counter"
    wants_processed_data = True

    def __init__(self):
        super().__init__()
        self.count = 0
        self.last_nr = None
        self.last_mean = None

    def processed_data_received(self, buffer, bit_depth, samples_per_line,
                                ascans_per_bscan, bscans_per_buffer,
                                buffers_per_volume, current_buffer_nr):
        self.count += 1
        self.last_nr = current_buffer_nr
        self.last_mean = float(np.asarray(buffer, np.float64).mean())

    def get_output(self):
        """Generic extension-output protocol (viz/live.py hosts this)."""
        return {
            "scalars": {"buffers_seen": self.count,
                        "last_buffer_nr": self.last_nr,
                        "last_mean": self.last_mean},
        }


class RampSource:
    """Tiny deterministic acquisition system: constant-valued buffers
    1, 2, ... n (AcquisitionSource protocol: .acq + .buffers())."""

    def __init__(self, acq: AcqParams, n_buffers: int = 3):
        self.acq = acq
        self.n_buffers = n_buffers

    def buffers(self):
        for i in range(self.n_buffers):
            yield np.full(self.acq.buffer_shape, 64 * (i + 1), np.uint16)

    def close(self):
        pass


def make_ramp_system(settings):
    """SystemRegistry factory: fn(settings dict) -> AcquisitionSource."""
    acq = AcqParams(samples_per_line=int(settings.get("samples", 64)),
                    ascans_per_bscan=int(settings.get("ascans", 16)),
                    bscans_per_buffer=int(settings.get("bscans", 2)),
                    buffers_per_volume=1,
                    bit_depth=int(settings.get("bit_depth", 12)))
    return RampSource(acq, n_buffers=int(settings.get("n_buffers", 3)))


def octproz_plugin(ctx):
    """Default plugin entry: registers the system, returns the extension
    (returning an Extension is the register shorthand)."""
    ctx.register_system("ramp", make_ramp_system)
    return BufferCounterExtension()
