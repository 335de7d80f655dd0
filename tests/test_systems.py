"""Tests: acquisition-system registry and screenshots-on-record."""

import glob

import numpy as np

from octproz_tpu import AcqParams
from octproz_tpu.io.source import SyntheticSource
from octproz_tpu.io.systems import SystemRegistry
from octproz_tpu.utils.settings import SettingsManager


ACQ = AcqParams(samples_per_line=64, ascans_per_bscan=16, bscans_per_buffer=4,
                buffers_per_volume=2, bit_depth=12)


def test_registry_activate_with_settings(tmp_path):
    s = SettingsManager(str(tmp_path / "s.ini"))
    reg = SystemRegistry(s)
    created = []

    def factory(settings):
        created.append(settings)
        return SyntheticSource(ACQ, n_buffers=int(settings.get("n", 1)))

    reg.register("synthetic", factory)
    assert reg.names == ["synthetic"]

    reg.store_settings("synthetic", {"n": 3})
    src = reg.activate("synthetic")
    assert reg.active_name == "synthetic"
    assert created[-1]["n"] == "3"  # round-tripped through the INI as string
    assert src.total == 3

    src2 = reg.activate("synthetic", overrides={"n": 5})
    assert src2.total == 5

    reg.deactivate()
    assert reg.active_source is None


def test_registry_unknown_system():
    import pytest
    reg = SystemRegistry()
    with pytest.raises(KeyError, match="unknown acquisition system"):
        reg.activate("ghost")


def test_screenshots_on_record(tmp_path):
    from octproz_tpu.io.recorder import RecordingParams
    from octproz_tpu.models.fdoct import FdOctModel
    from octproz_tpu.params import FpnMode, Interpolation, ProcConfig
    from octproz_tpu.runtime import StreamingEngine

    cfg = ProcConfig(resampling=True, interpolation=Interpolation.LINEAR,
                     windowing=True, fpn_mode=FpnMode.OFF, log_scaling=True)
    model = FdOctModel(ACQ, cfg, resample_coeffs=(0.0, 63.0, 0.0, 0.0))
    eng = StreamingEngine(model, SyntheticSource(ACQ, n_buffers=3),
                          stream_to_host=True)
    eng.start_recording(RecordingParams(
        save_dir=str(tmp_path), name="shot", buffers_to_record=2,
        save_raw=False, save_processed=True, save_meta=False,
        save_screenshots=True))
    eng.run()
    assert len(glob.glob(str(tmp_path / "*_bscan.png"))) == 1
    assert len(glob.glob(str(tmp_path / "*_enface.png"))) == 1
    assert len(glob.glob(str(tmp_path / "*_volume.png"))) == 1


def test_synthetic_source_noise_is_replay_keyed():
    """Noise is keyed by (seed, buffer index): regenerating any buffer gives
    bit-identical data (a bench/test fixture must reproduce its stream),
    distinct indices still differ, and a fresh instance replays the same
    stream."""
    import numpy as np

    src = SyntheticSource(ACQ, n_buffers=3, seed=11)
    first = [b.copy() for b in src.buffers()]
    np.testing.assert_array_equal(src.read_buffer(1), first[1])
    assert not np.array_equal(first[0], first[1])
    replay = list(SyntheticSource(ACQ, n_buffers=3, seed=11).buffers())
    for a, b in zip(first, replay):
        np.testing.assert_array_equal(a, b)
