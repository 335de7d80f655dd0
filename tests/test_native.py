"""Native library tests: build, ring buffer handshake, file reads, 12-bit
packing.  All native paths have numpy fallbacks; these tests exercise the
native code itself and skip only if no toolchain is present."""

import threading

import numpy as np
import pytest

from octproz_tpu import native


needs_native = pytest.mark.skipif(not native.native_available(),
                                  reason="g++ unavailable / build failed")


@needs_native
def test_ring_buffer_alignment_and_views():
    rb = native.NativeRingBuffer(3, (4, 8), np.uint16)
    try:
        assert rb.n_slots == 3
        for i in range(3):
            v = rb.view(i)
            assert v.shape == (4, 8) and v.dtype == np.uint16
            assert v.ctypes.data % 128 == 0  # acquisitionbuffer.cpp:66 alignment
    finally:
        rb.close()


@needs_native
def test_ring_buffer_handshake_backpressure():
    rb = native.NativeRingBuffer(2, (4,), np.uint32)
    try:
        s0 = rb.acquire_write()
        assert s0 == 0
        rb.view(s0)[:] = 10
        rb.commit_write(s0)
        s1 = rb.acquire_write()
        rb.view(s1)[:] = 11
        rb.commit_write(s1)
        # ring full: producer must wait (reference spin-wait analog)
        assert rb.acquire_write() == -1
        r0 = rb.acquire_read()
        assert r0 == 0 and rb.view(r0)[0] == 10
        rb.release_read(r0)
        # slot freed: producer may continue
        assert rb.acquire_write() == 0
    finally:
        rb.close()


@needs_native
def test_ring_buffer_threaded_producer_consumer():
    rb = native.NativeRingBuffer(4, (16,), np.int64)
    got = []

    def producer():
        for i in range(100):
            while (s := rb.acquire_write()) < 0:
                pass
            rb.view(s)[:] = i
            rb.commit_write(s)

    t = threading.Thread(target=producer)
    t.start()
    try:
        while len(got) < 100:
            s = rb.acquire_read()
            if s < 0:
                continue
            got.append(int(rb.view(s)[0]))
            rb.release_read(s)
        t.join()
        assert got == list(range(100))  # FIFO order, no loss, no tearing
    finally:
        rb.close()


@needs_native
def test_file_read_at(tmp_path):
    data = np.arange(1000, dtype=np.uint16)
    p = tmp_path / "f.bin"
    data.tofile(p)
    out = native.read_file_at(str(p), 20, 100)
    np.testing.assert_array_equal(out.view(np.uint16), data[10:60])
    with pytest.raises(EOFError):
        native.read_file_at(str(p), 1900, 1000)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    samples = rng.integers(0, 4096, size=1001).astype(np.uint16)
    packed = native.pack_uint12(samples)
    assert packed.size == 501 * 3
    back = native.unpack_uint12(packed, 1001)
    np.testing.assert_array_equal(back, samples)


def test_unpack_matches_numpy_reference():
    from octproz_tpu.ops.convert import unpack_uint12_packed

    rng = np.random.default_rng(1)
    samples = rng.integers(0, 4096, size=256).astype(np.uint16)
    packed = native.pack_uint12(samples)
    np.testing.assert_array_equal(native.unpack_uint12(packed, 256),
                                  unpack_uint12_packed(packed, 256))


def test_virtual_source_packed_12bit(tmp_path):
    """End-to-end: packed 12-bit file through VirtualOctSource."""
    from octproz_tpu import AcqParams
    from octproz_tpu.io.source import VirtualOctSource

    acq = AcqParams(samples_per_line=64, ascans_per_bscan=4,
                    bscans_per_buffer=2, buffers_per_volume=1, bit_depth=12)
    rng = np.random.default_rng(2)
    samples = rng.integers(0, 4096,
                           size=2 * acq.samples_per_buffer).astype(np.uint16)
    packed = native.pack_uint12(samples)
    p = tmp_path / "packed.raw"
    packed.tofile(p)

    for copy_to_ram in (True, False):
        src = VirtualOctSource(str(p), acq, packed_12bit=True,
                               copy_to_ram=copy_to_ram)
        assert src.buffers_in_file == 2
        b0 = src.read_buffer(0).copy()
        b1 = src.read_buffer(1)
        np.testing.assert_array_equal(
            b0.reshape(-1), samples[:acq.samples_per_buffer])
        np.testing.assert_array_equal(
            b1.reshape(-1), samples[acq.samples_per_buffer:])


def test_virtual_source_streaming_no_overwrite(tmp_path):
    """Streaming mode must not hand out views of the reused scratch."""
    from octproz_tpu import AcqParams
    from octproz_tpu.io.source import VirtualOctSource

    acq = AcqParams(samples_per_line=32, ascans_per_bscan=2,
                    bscans_per_buffer=2, buffers_per_volume=1, bit_depth=16)
    data = np.arange(2 * acq.samples_per_buffer, dtype=np.uint16)
    p = tmp_path / "s.raw"
    data.tofile(p)
    src = VirtualOctSource(str(p), acq, copy_to_ram=False)
    b0 = src.read_buffer(0)
    first_value = int(b0.reshape(-1)[0])
    src.read_buffer(1)  # would overwrite b0 if it were a scratch view
    assert int(b0.reshape(-1)[0]) == first_value


def test_virtual_source_big_endian(tmp_path):
    """Big-endian recordings are byte-swapped on load (endian-swap helper
    capability, cuda_code.cu:150-163)."""
    import numpy as np
    from octproz_tpu import AcqParams
    from octproz_tpu.io.source import VirtualOctSource

    acq = AcqParams(samples_per_line=16, ascans_per_bscan=4,
                    bscans_per_buffer=2, buffers_per_volume=1, bit_depth=12)
    want = np.random.default_rng(0).integers(
        0, 4095, acq.buffer_shape).astype(np.uint16)
    p = tmp_path / "be.raw"
    want.byteswap().tofile(p)  # write as big-endian

    got = next(VirtualOctSource(str(p), acq, big_endian=True,
                                total_buffers_to_acquire=1).buffers())
    np.testing.assert_array_equal(got, want)

    # streaming (pread) mode swaps too
    got = next(VirtualOctSource(str(p), acq, big_endian=True, copy_to_ram=False,
                                total_buffers_to_acquire=1).buffers())
    np.testing.assert_array_equal(got, want)

    import pytest
    with pytest.raises(ValueError, match="big_endian"):
        VirtualOctSource(str(p), acq, big_endian=True, packed_12bit=True)


def test_unpack_uint12_rejects_undersized_buffer():
    """An undersized packed buffer must raise, not read out of bounds (the
    native kernel would silently return garbage)."""
    from octproz_tpu.native import unpack_uint12

    with pytest.raises(ValueError, match="too small"):
        unpack_uint12(np.arange(4, dtype=np.uint8), 5)


def test_unpack_uint12_odd_tail_two_bytes():
    """An odd trailing sample occupies only TWO bytes (native layout,
    octnative.cpp:161-164); the numpy fallback must accept the same
    minimal buffer and produce the same samples."""
    from octproz_tpu.native import pack_uint12, unpack_uint12
    from octproz_tpu.ops.convert import unpack_uint12_packed

    samples = np.array([0x123, 0x456, 0x789], np.uint16)
    packed = pack_uint12(samples)
    minimal = packed[:5]  # 3 bytes for the pair + 2 for the odd tail
    np.testing.assert_array_equal(unpack_uint12(minimal, 3), samples)
    np.testing.assert_array_equal(unpack_uint12_packed(minimal, 3), samples)
