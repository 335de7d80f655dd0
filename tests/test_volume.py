"""Tests: VolumeAssembler (persistent volume accumulator analog)."""

import numpy as np

from octproz_tpu import AcqParams
from octproz_tpu.io.volume import VolumeAssembler


ACQ = AcqParams(samples_per_line=32, ascans_per_bscan=4, bscans_per_buffer=2,
                buffers_per_volume=3, bit_depth=12)


def _block(value):
    return np.full((2, 4, 16), value, np.float32)


def test_assembles_in_order():
    done = []
    asm = VolumeAssembler(ACQ, on_volume=lambda v, i: done.append((v.copy(), i)))
    assert asm.add(_block(1), 0) is None
    assert asm.add(_block(2), 1) is None
    vol = asm.add(_block(3), 2)
    assert vol is not None and vol.shape == (6, 4, 16)
    assert vol[0, 0, 0] == 1 and vol[2, 0, 0] == 2 and vol[4, 0, 0] == 3
    assert done and done[0][1] == 0
    assert asm.volumes_completed == 1


def test_second_volume_recycles():
    asm = VolumeAssembler(ACQ)
    for k in range(3):
        asm.add(_block(k), k)
    vol2 = None
    for k in range(3):
        vol2 = asm.add(_block(10 + k), k)
    assert vol2 is not None and vol2[0, 0, 0] == 10
    assert asm.volumes_completed == 2
    assert asm.volume_index == 2


def test_decimated_feed_drops_incomplete():
    """Streaming skip can drop blocks; an overwrite starts a fresh volume."""
    asm = VolumeAssembler(ACQ)
    asm.add(_block(1), 0)
    asm.add(_block(2), 2)         # slot 1 never arrives
    assert asm.add(_block(3), 0) is None   # wrap: new volume begins
    asm.add(_block(4), 1)
    vol = asm.add(_block(5), 2)
    assert vol is not None
    assert vol[0, 0, 0] == 3 and vol[2, 0, 0] == 4 and vol[4, 0, 0] == 5
    assert asm.volumes_completed == 1
