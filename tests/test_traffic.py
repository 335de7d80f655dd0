"""Regression pins on the sharded step's cross-device traffic.

The >85%-to-two-hosts scaling claim rests on the steady state moving ~zero
bytes between devices (docs/scaling.md).  These tests compile the sharded
step on the virtual 8-device CPU mesh and pin the collective payloads in
the optimized HLO: the determination-phase FPN psum is EXACTLY
9 segments x depth x 3 float32 partial sums per mesh axis
(cuda_code.cu:523-565 reduced across shards), B-scan-axis meshes add
nothing else (geometric post-stages partition to local compute), and FPN
off is collective-free.  If a future change silently introduces traffic
(e.g. the `.at[-1,-1].set` last-line guard that used to ship a whole
B-scan between shards), these fail.
"""

import dataclasses

import pytest

from octproz_tpu.params import AcqParams, FpnMode, Interpolation, ProcConfig
from octproz_tpu.parallel import sharding, traffic

ACQ = AcqParams(samples_per_line=256, ascans_per_bscan=64,
                bscans_per_buffer=8, buffers_per_volume=1, bit_depth=12)

FULL = ProcConfig(bitshift=True, resampling=True,
                  interpolation=Interpolation.CUBIC, windowing=True,
                  dispersion=True, fpn_mode=FpnMode.ONCE, bscans_for_noise=2,
                  log_scaling=True, fft_via_matmul=True,
                  sinusoidal_correction=True, bscan_flip=True)


def _measure(cfg, *mesh_dims):
    mesh = sharding.make_mesh(*mesh_dims)
    return traffic.measure_collective_traffic(ACQ, cfg, mesh)


def test_bscan_mesh_full_chain_traffic_is_exactly_the_fpn_psum():
    r = _measure(FULL, 8, 1)
    want = traffic.expected_fpn_psum_bytes(ACQ)  # 9 * 128 * 3 * 4 = 13824
    assert want == 13824
    assert r["by_op"] == {"all-reduce": want}
    assert r["total_bytes"] == want


def test_bscan_mesh_fpn_off_is_collective_free():
    r = _measure(dataclasses.replace(FULL, fpn_mode=FpnMode.OFF), 8, 1)
    assert r["total_bytes"] == 0
    assert r["collectives"] == []


def test_bscan_mesh_fpn_continuous_still_only_psum():
    r = _measure(dataclasses.replace(FULL, fpn_mode=FpnMode.CONTINUOUS), 8, 1)
    assert r["by_op"] == {"all-reduce": traffic.expected_fpn_psum_bytes(ACQ)}


def test_geometric_post_stages_are_local_on_bscan_mesh():
    """Flip + sinusoidal + post-background each add ZERO collective bytes
    when the mesh shards B-scans only (the production layout)."""
    base = dataclasses.replace(FULL, fpn_mode=FpnMode.OFF,
                               sinusoidal_correction=False, bscan_flip=False)
    for knob in ("sinusoidal_correction", "bscan_flip",
                 "post_background_removal"):
        r = _measure(dataclasses.replace(base, **{knob: True}), 8, 1)
        assert r["total_bytes"] == 0, (knob, r["collectives"])


def test_fast_axis_mesh_flip_costs_a_permute():
    """A-scan-sharded meshes DO pay for the geometric stages (the flip
    reverses the sharded axis): the model function signals measure-don't-
    model, and the measurement shows a bounded permute — at most the local
    magnitude block per direction."""
    cfg = dataclasses.replace(FULL, sinusoidal_correction=False)
    assert traffic.expected_fast_axis_bytes(ACQ, cfg, 2) is None
    r = _measure(cfg, 4, 2)
    permute = r["by_op"].get("collective-permute", 0)
    local_block_bytes = (ACQ.bscans_per_buffer // 4) * \
        (ACQ.ascans_per_bscan // 2) * ACQ.output_ascan_length * 4
    assert 0 < permute <= 2 * local_block_bytes
    assert r["by_op"]["all-reduce"] == traffic.expected_fpn_psum_bytes(ACQ)


def test_psum_spans_every_mesh_axis():
    """On a 2-D mesh the FPN statistics reduce over BOTH axes (the noise
    lines span shards in both directions) — same exact payload."""
    r = _measure(dataclasses.replace(FULL, sinusoidal_correction=False,
                                     bscan_flip=False), 4, 2)
    assert r["by_op"] == {"all-reduce": traffic.expected_fpn_psum_bytes(ACQ)}


def test_headline_geometry_psum_payload():
    """The production volume's determination payload is 55 KB — thousands
    of times below any link's per-buffer budget (analytic model in
    docs/scaling.md)."""
    acq = AcqParams(samples_per_line=1024, ascans_per_bscan=512,
                    bscans_per_buffer=256, buffers_per_volume=1, bit_depth=12)
    assert traffic.expected_fpn_psum_bytes(acq) == 9 * 512 * 3 * 4 == 55296
