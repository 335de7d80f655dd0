"""Tests: hardware ring-buffer bridge (producer thread -> streaming engine)."""

import threading
import time

import numpy as np
import pytest

from octproz_tpu import AcqParams
from octproz_tpu import native
from octproz_tpu.io.hwbridge import HardwareRingSource


needs_native = pytest.mark.skipif(not native.native_available(),
                                  reason="native library unavailable")

ACQ = AcqParams(samples_per_line=64, ascans_per_bscan=8, bscans_per_buffer=2,
                buffers_per_volume=1, bit_depth=12)


@needs_native
def test_producer_consumer_fifo():
    src = HardwareRingSource(ACQ, n_slots=3)
    try:
        frames = [np.full(ACQ.buffer_shape, i, np.uint16) for i in range(7)]

        def producer():
            for f in frames:
                src.write_blocking(f)
            src.finish()

        t = threading.Thread(target=producer)
        t.start()
        got = [int(b[0, 0, 0]) for b in src.buffers()]
        t.join()
        assert got == list(range(7))
    finally:
        src.close()


@needs_native
def test_engine_drives_hardware_source():
    from octproz_tpu.models.fdoct import FdOctModel
    from octproz_tpu.params import FpnMode, Interpolation, ProcConfig
    from octproz_tpu.runtime import StreamingEngine

    cfg = ProcConfig(resampling=True, interpolation=Interpolation.LINEAR,
                     windowing=True, fpn_mode=FpnMode.OFF, log_scaling=True)
    model = FdOctModel(ACQ, cfg, resample_coeffs=(0.0, 63.0, 0.0, 0.0))
    src = HardwareRingSource(ACQ, n_slots=2)
    try:
        rng = np.random.default_rng(0)

        def producer():
            for _ in range(5):
                src.write_blocking(
                    rng.integers(0, 4095, ACQ.buffer_shape).astype(np.uint16))
            src.finish()

        t = threading.Thread(target=producer)
        t.start()
        eng = StreamingEngine(model, src)
        assert eng.run() == 5
        t.join()
    finally:
        src.close()


@needs_native
def test_end_of_stream_count_contract_under_random_pacing():
    """Regression for the round-3 lost-wakeup race: consumer polls an empty
    ring, producer commits the FINAL slot and finishes, consumer then saw
    only the finished flag and returned early.  finish() now publishes the
    produced count and the consumer drains to it.  Hundreds of randomized
    producer/consumer pacings; every buffer must arrive, in order."""
    rng = np.random.default_rng(42)
    shape = (2, 4, 8)
    acq = AcqParams(samples_per_line=8, ascans_per_bscan=4,
                    bscans_per_buffer=2, buffers_per_volume=1, bit_depth=16)
    for trial in range(300):
        n_frames = int(rng.integers(1, 6))
        src = HardwareRingSource(acq, n_slots=int(rng.integers(1, 5)),
                                 poll_interval_s=0.0, timeout_s=5.0)
        try:
            delays = rng.random(n_frames) * 2e-4

            def producer():
                for i in range(n_frames):
                    if delays[i] > 1e-4:
                        time.sleep(delays[i])
                    src.write_blocking(np.full(shape, i, np.uint16))
                src.finish()

            t = threading.Thread(target=producer)
            t.start()
            if trial % 3 == 0:
                time.sleep(rng.random() * 2e-4)  # let producer race ahead
            got = [int(b[0, 0, 0]) for b in src.buffers()]
            t.join()
            assert got == list(range(n_frames)), f"trial {trial}: {got}"
        finally:
            src.close()


@needs_native
def test_finish_before_any_consumer_poll():
    """Producer finishes before the consumer ever polls: the consumer must
    still drain every committed slot (count contract covers the backlog)."""
    src = HardwareRingSource(ACQ, n_slots=4)
    try:
        for i in range(3):
            src.write_blocking(np.full(ACQ.buffer_shape, i, np.uint16))
        src.finish()
        got = [int(b[0, 0, 0]) for b in src.buffers()]
        assert got == [0, 1, 2]
    finally:
        src.close()


@needs_native
def test_timeout_when_producer_dies():
    src = HardwareRingSource(ACQ, n_slots=2, timeout_s=0.2)
    try:
        with pytest.raises(TimeoutError, match="no acquisition data"):
            list(src.buffers())
    finally:
        src.close()


@needs_native
def test_slot_address_stable_and_aligned():
    src = HardwareRingSource(ACQ, n_slots=2)
    try:
        a0 = src.slot_address(0)
        assert a0 % 128 == 0
        assert src.slot_address(0) == a0  # stable across calls (DMA-safe)
    finally:
        src.close()
