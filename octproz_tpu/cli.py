"""Command-line interface: process / replay / render / bench / info.

The headless app-shell of the framework -- the role OCTproZMainWindow +
Sidebar + OCTproZApp play in the reference (octproz_project/octproz/src/
octprozapp.cpp slot_start/slot_record orchestration, sidebar.cpp:319-359
parameter mapping), with an INI settings file replacing the GUI state
(settingsfilemanager, sidebar.h:44-96 keys).  The reference has no CLI
(docs list none); this is the TPU build's primary user surface.

Commands:
  process  one-shot: read a raw volume file, run the pipeline, write
           processed output / B-scan / en-face PNGs and volume renders
  replay   streaming: replay a file through the runtime engine at a given
           rate with live throughput metrics (Virtual OCT System analog)
  render   render a processed volume file with one of the 7 3D modes
  bench    the headline benchmark (same as bench.py)
  info     device + version report (GpuInfo analog)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from typing import Optional

import numpy as np


def _add_acq_args(p: argparse.ArgumentParser) -> None:
    g = p.add_argument_group("acquisition geometry")
    g.add_argument("--samples", type=int, required=True,
                   help="samples per A-scan (raw line length)")
    g.add_argument("--ascans", type=int, required=True, help="A-scans per B-scan")
    g.add_argument("--bscans", type=int, required=True, help="B-scans per buffer")
    g.add_argument("--buffers-per-volume", type=int, default=1)
    g.add_argument("--bit-depth", type=int, default=12)
    g.add_argument("--packed-12bit", action="store_true",
                   help="input file holds 12-bit packed samples (2 per 3 bytes)")
    g.add_argument("--big-endian", action="store_true",
                   help="input samples are big-endian (byte-swapped on load)")
    g.add_argument("--stream-from-disk", action="store_true",
                   help="do not preload the file into RAM (huge files)")


def _add_proc_args(p: argparse.ArgumentParser) -> None:
    g = p.add_argument_group("processing (sidebar.cpp:319-337 analog)")
    g.add_argument("--bitshift", action="store_true",
                   help="right-shift 16-bit containers by 4 (12-in-16 digitizers)")
    g.add_argument("--background-removal", action="store_true")
    g.add_argument("--rolling-window", type=int, default=64)
    g.add_argument("--no-resampling", action="store_true")
    g.add_argument("--interpolation",
                   choices=["linear", "quadratic", "cubic", "lanczos"],
                   default="cubic")
    g.add_argument("--klin-coeffs", type=float, nargs=4, default=None,
                   metavar=("C0", "C1", "C2", "C3"),
                   help="resampling polynomial; default identity (0, N-1, 0, 0)")
    g.add_argument("--klin-curve-csv", default=None,
                   help="custom resampling curve CSV (index;value), e.g. from "
                        "extensions.extract_klin_curve")
    g.add_argument("--no-windowing", action="store_true")
    g.add_argument("--window-type", choices=["hanning", "gauss", "sine",
                                             "lanczos", "rectangular", "flattop"],
                   default="hanning")
    g.add_argument("--window-center", type=float, default=0.5)
    g.add_argument("--window-fill", type=float, default=1.0)
    g.add_argument("--no-dispersion", action="store_true")
    g.add_argument("--disp-coeffs", type=float, nargs=4, default=(0, 0, 0, 0),
                   metavar=("D0", "D1", "D2", "D3"))
    g.add_argument("--fpn", choices=["off", "once", "continuous"], default="off")
    g.add_argument("--lin-scaling", action="store_true",
                   help="linear instead of logarithmic dynamic-range scaling")
    g.add_argument("--grayscale-min", type=float, default=0.0)
    g.add_argument("--grayscale-max", type=float, default=60.0)
    g.add_argument("--bscan-flip", action="store_true")
    g.add_argument("--sinusoidal-correction", action="store_true")
    g.add_argument("--post-background-removal", action="store_true",
                   help="subtract the post-process background curve "
                        "(cuda_code.cu:757-767); record it live with "
                        "'replay --record-background N'")
    g.add_argument("--post-bg-weight", type=float, default=1.0)
    g.add_argument("--post-bg-offset", type=float, default=0.0)
    g.add_argument("--fused-prep", action="store_true",
                   help="use the fused Pallas prep kernel")
    g.add_argument("--fft-matmul", action="store_true",
                   help="fold the whole pre-FPN chain incl. IFFT into one "
                        "complex GEMM (fastest on TPU)")
    g.add_argument("--fold-backend", choices=["pallas", "xla"],
                   default="pallas",
                   help="executor of the folded GEMM (with --fft-matmul): "
                        "hand-fused Pallas kernel or plain-XLA matmuls")
    g.add_argument("--no-fused-scale", action="store_true",
                   help="disable the FPN+log epilogue fusion into the fold "
                        "kernel (diagnostic; slower)")
    g.add_argument("--fold-concat", action="store_true",
                   help="run the (re|im) fold operators as ONE wide GEMM "
                        "per tile instead of two")
    g.add_argument("--fold-ksplit", type=int, default=1, metavar="K",
                   help="split the fold contraction dim into K decode/GEMM "
                        "chains (Mosaic decode/MXU overlap)")
    g.add_argument("--fast-log", action="store_true",
                   help="polynomial exponent-extraction log2 epilogue "
                        "(fast-math analog; maps 0 to a finite floor)")
    g.add_argument("--pallas-tile", type=int, default=0, metavar="LINES",
                   help="cap lines per Pallas kernel tile (0 = auto)")
    g.add_argument("--compute-dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="spectral-chain GEMM dtype (bfloat16 = fastest on "
                        "TPU, identical accuracy to default-precision f32)")
    g.add_argument("--matmul-precision",
                   choices=["default", "high", "highest"], default="default",
                   help="MXU fidelity ladder for float32 GEMMs: default = "
                        "1 bf16 pass, high = 3-pass split (~2^-16 rel), "
                        "highest = 5-pass split (true-f32 grade)")
    g.add_argument("--output-dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="stored magnitude volume dtype (bfloat16 halves "
                        "write-back and host-transfer bytes)")
    g.add_argument("--settings", default=None,
                   help="INI settings file; CLI flags override its values")
    g.add_argument("--mesh", default=None, metavar="B[,A]",
                   help="shard the step over a (bscan, ascan) device mesh, "
                        "e.g. --mesh 4 or --mesh 4,2 (parallel/sharding.py)")


def _build_config(args):
    from .params import AcqParams, FpnMode, Interpolation, ProcConfig, WindowType

    acq = AcqParams(samples_per_line=args.samples, ascans_per_bscan=args.ascans,
                    bscans_per_buffer=args.bscans,
                    buffers_per_volume=args.buffers_per_volume,
                    bit_depth=args.bit_depth)
    cfg = ProcConfig(
        bitshift=args.bitshift,
        background_removal=args.background_removal,
        rolling_average_window=args.rolling_window,
        resampling=not args.no_resampling,
        interpolation=Interpolation(args.interpolation),
        windowing=not args.no_windowing,
        dispersion=not args.no_dispersion,
        fpn_mode=FpnMode(args.fpn),
        log_scaling=not args.lin_scaling,
        grayscale_min=args.grayscale_min,
        grayscale_max=args.grayscale_max,
        bscan_flip=args.bscan_flip,
        sinusoidal_correction=args.sinusoidal_correction,
        post_background_removal=args.post_background_removal,
        post_background_weight=args.post_bg_weight,
        post_background_offset=args.post_bg_offset,
        use_pallas_prep=args.fused_prep,
        fft_via_matmul=args.fft_matmul,
        fold_backend=args.fold_backend,
        fused_scale=not args.no_fused_scale,
        fold_concat=args.fold_concat,
        fold_k_split=args.fold_ksplit,
        fast_log=args.fast_log,
        pallas_tile=args.pallas_tile,
        compute_dtype=args.compute_dtype,
        matmul_precision=args.matmul_precision,
        output_dtype=args.output_dtype,
    )
    klin = args.klin_coeffs or (0.0, float(args.samples - 1), 0.0, 0.0)
    model_kw = dict(
        resample_coeffs=tuple(klin),
        dispersion_coeffs=tuple(args.disp_coeffs),
        window_type=WindowType(args.window_type),
        window_center=args.window_center,
        window_fill_factor=args.window_fill,
    )
    if getattr(args, "klin_curve_csv", None):
        from .io.curvefiles import load_curve_csv

        model_kw["custom_resample_curve"] = load_curve_csv(
            args.klin_curve_csv, expected_size=args.samples)
    if getattr(args, "mesh", None):
        from .parallel import make_mesh

        dims = [int(x) for x in args.mesh.split(",")]
        if len(dims) == 1:
            dims.append(1)
        model_kw["mesh"] = make_mesh(dims[0], dims[1])
    return acq, cfg, model_kw


def _apply_settings_file(args) -> None:
    """Fill argparse defaults from an INI settings file (CLI flags win)."""
    if not args.settings:
        return
    from .utils.settings import SettingsManager

    s = SettingsManager(args.settings)
    proc = s.get_group("processing")
    # Simple policy: only set attributes the user left at their defaults.
    if proc:
        if not args.bitshift:
            args.bitshift = s.get_bool("processing", "bitshift", False)
        if not args.background_removal:
            args.background_removal = s.get_bool("processing", "background_removal", False)
        if args.klin_coeffs is None and s.get("processing", "klin_coeffs"):
            args.klin_coeffs = [float(x) for x in
                                s.get("processing", "klin_coeffs").split(",")]
        for key in ("compute_dtype", "matmul_precision", "output_dtype"):
            if getattr(args, key) == ("default" if key == "matmul_precision"
                                      else "float32") and s.get("processing", key):
                setattr(args, key, s.get("processing", key))


def cmd_process(args) -> int:
    import jax.numpy as jnp

    from .io.source import VirtualOctSource
    from .models.fdoct import FdOctModel
    from .viz import builtin_lut, save_bscan_png, save_enface_png

    _apply_settings_file(args)
    acq, cfg, model_kw = _build_config(args)
    model = FdOctModel(acq, cfg, **model_kw)
    src = VirtualOctSource(args.input, acq,
                           total_buffers_to_acquire=args.max_buffers,
                           packed_12bit=args.packed_12bit,
                           big_endian=args.big_endian,
                           copy_to_ram=not args.stream_from_disk)
    n_buffers = min(src.buffers_in_file, args.max_buffers or src.buffers_in_file)

    t0 = time.perf_counter()
    outs = []
    for i in range(n_buffers):
        outs.append(model.process_buffer(jnp.asarray(src.read_buffer(i))))
    volume = np.concatenate([np.asarray(o) for o in outs], axis=0)
    dt = time.perf_counter() - t0
    ascans = n_buffers * acq.ascans_per_buffer
    print(f"processed {n_buffers} buffers ({volume.shape[0]} B-scans) in "
          f"{dt:.2f} s -- {ascans / dt / 1e3:.1f} kHz A-scans", file=sys.stderr)

    lut = builtin_lut(args.lut) if args.lut else None
    if args.output:
        np.clip(volume, 0.0, 1.0).astype(np.float32).tofile(args.output)
        print(f"wrote {args.output} float32 "
              f"{volume.shape[2]}x{volume.shape[1]}x{volume.shape[0]}",
              file=sys.stderr)
    if args.bscan_png is not None:
        p = save_bscan_png(args.bscan_png, volume, frame_nr=args.frame, lut=lut)
        print(f"wrote {p}", file=sys.stderr)
    if args.enface_png is not None:
        p = save_enface_png(args.enface_png, volume, depth_nr=args.depth, lut=lut)
        print(f"wrote {p}", file=sys.stderr)
    if args.render_png is not None:
        _render_to_png(volume, args.render_png, args.render_mode, lut)
    if args.plot_png is not None:
        from .viz import plot_lines, select_line

        raw_line = select_line(src.read_buffer(0), args.frame % acq.bscans_per_buffer,
                               args.plot_ascan).astype(np.float64)
        proc_line = select_line(volume, args.frame, args.plot_ascan)
        p = plot_lines(args.plot_png, raw_line=raw_line, processed_line=proc_line,
                       title=f"B-scan {args.frame}, A-scan {args.plot_ascan}")
        print(f"wrote {p}", file=sys.stderr)
    return 0


def _render_to_png(volume, path, mode_name, lut=None):
    from .viz import RenderMode, RenderParams, render_volume, save_png

    params = RenderParams(mode=RenderMode(mode_name))
    img = render_volume(volume, params, yaw=0.5, pitch=0.4)
    save_png(path, img)
    print(f"wrote {path} ({mode_name})", file=sys.stderr)


def cmd_replay(args) -> int:
    from .io.source import VirtualOctSource
    from .models.fdoct import FdOctModel
    from .runtime import StreamingEngine
    from .utils.console import MessageConsole

    _apply_settings_file(args)
    acq, cfg, model_kw = _build_config(args)
    model = FdOctModel(acq, cfg, **model_kw)
    src = VirtualOctSource(args.input, acq, wait_time_us=args.wait_us,
                           total_buffers_to_acquire=args.max_buffers,
                           packed_12bit=args.packed_12bit,
                           big_endian=args.big_endian,
                           copy_to_ram=not args.stream_from_disk)
    console = MessageConsole(echo=True)
    stream = (args.stream or (args.record and args.record_processed)
              or args.live)
    eng = StreamingEngine(model, src, stream_to_host=stream,
                          streaming_skip=args.skip, on_info=console.info,
                          metrics_window_s=args.metrics_window)
    live = None
    if args.live:
        from .viz.live import LiveView

        live = LiveView(port=args.live_port, host=args.live_host,
                        lut=args.live_lut, volume_render=args.live_volume)
        live.attach(eng)  # auto-creates a ParamController (POST /control)
        print(f"live view: {live.url}", flush=True)
    if args.record_background:
        eng.record_post_background(args.record_background)
    if args.record:
        from .io.recorder import RecordingParams

        params = RecordingParams(
            save_dir=args.record_dir, name=args.record_name,
            buffers_to_record=args.record_buffers,
            start_with_first_buffer_of_volume=args.record_start_with_volume,
            save_raw=args.record_raw or not args.record_processed,
            save_processed=args.record_processed,
            save_as_32bit_float=args.record_float32)
        if args.schedule_interval is not None:
            eng.schedule_recordings(params, interval_s=args.schedule_interval,
                                    total=args.schedule_total)
        else:
            eng.start_recording(params)
    t0 = time.perf_counter()
    n = eng.run(max_buffers=args.max_buffers)
    dt = time.perf_counter() - t0
    if live is not None:
        live.close()
    print(json.dumps({
        "buffers_processed": n,
        "ascans_per_s": round(n * acq.ascans_per_buffer / dt, 1),
        "mb_per_s": round(n * acq.bytes_per_buffer / 1e6 / dt, 1),
    }))
    return 0


def cmd_render(args) -> int:
    from .viz import RenderMode, RenderParams, builtin_lut, render_volume, save_png

    data = np.fromfile(args.input, dtype=np.float32)
    volume = data.reshape(args.bscans, args.ascans, args.depth)
    params = RenderParams(mode=RenderMode(args.mode), threshold=args.threshold,
                          gamma=args.gamma, step_length=args.step_length)
    lut = builtin_lut(args.lut) if args.lut else None
    img = render_volume(volume, params, yaw=args.yaw, pitch=args.pitch,
                        out_shape=(args.size, args.size), lut=lut)
    save_png(args.out, img)
    print(f"wrote {args.out}", file=sys.stderr)
    return 0


def cmd_compare(args) -> int:
    """Fidelity harness: PSNR/SSIM of a processed volume vs a reference
    volume (BASELINE: 'B-scan PSNR vs reference within its SNR bound').

    Workflow for an externally produced reference (e.g. the reference
    application's recorded output on the figshare volume,
    /root/reference/README.md:70-72):

        octproz_tpu process in.raw ... --output got.raw
        octproz_tpu compare got.raw ref.raw --bscans B --ascans A \\
            --depth D --ref-dtype uint8 --min-psnr 25
    """
    from .utils.fidelity import compare_volumes, load_volume

    shape = (args.bscans, args.ascans, args.depth)
    got = load_volume(args.got, shape, dtype=args.dtype)
    ref = load_volume(args.ref, shape, dtype=args.ref_dtype)
    clip = (0.0, 1.0) if args.clip01 else None
    res = compare_volumes(got, ref, data_range=args.data_range, clip=clip)
    out = res.to_dict()
    if args.min_psnr is not None:
        out["min_psnr_required_db"] = args.min_psnr
        out["passed"] = bool(res.psnr_db >= args.min_psnr)
    print(json.dumps(out))
    if args.min_psnr is not None and not out["passed"]:
        return 1
    return 0


def cmd_info(args) -> int:
    from . import __version__
    from .utils.deviceinfo import format_report

    print(f"octproz_tpu {__version__}")
    print(format_report())
    return 0


def cmd_bench(args) -> int:
    import runpy
    import os

    bench = os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py")
    runpy.run_path(bench, run_name="__main__")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="octproz_tpu",
        description="TPU-native FD-OCT processing framework")
    p.add_argument("--platform", default=None, metavar="NAME",
                   help="force a jax backend (e.g. 'cpu'); needed because "
                        "some environments preset JAX_PLATFORMS at the "
                        "interpreter level where the env var has no effect")
    sub = p.add_subparsers(dest="command", required=True)

    pp = sub.add_parser("process", help="process a raw volume file")
    pp.add_argument("input", help=".raw file (unpacked little-endian samples)")
    _add_acq_args(pp)
    _add_proc_args(pp)
    pp.add_argument("--max-buffers", type=int, default=None)
    pp.add_argument("--output", default=None, help="write processed float32 .raw")
    pp.add_argument("--bscan-png", default=None)
    pp.add_argument("--frame", type=int, default=0, help="B-scan frame number")
    pp.add_argument("--enface-png", default=None)
    pp.add_argument("--depth", type=int, default=0, help="en-face depth index")
    pp.add_argument("--render-png", default=None)
    pp.add_argument("--render-mode", default="mip",
                    choices=["isosurface", "alpha_blending", "mip", "depth_mip",
                             "mida", "xray", "oct_depth"])
    pp.add_argument("--lut", default=None)
    pp.add_argument("--plot-png", default=None,
                    help="1D raw-spectrum + processed A-scan plot")
    pp.add_argument("--plot-ascan", type=int, default=0)
    pp.set_defaults(fn=cmd_process)

    pr = sub.add_parser("replay", help="stream a file through the runtime")
    pr.add_argument("input")
    _add_acq_args(pr)
    _add_proc_args(pr)
    pr.add_argument("--max-buffers", type=int, default=None)
    pr.add_argument("--wait-us", type=int, default=0,
                    help="artificial per-buffer delay (rate emulation)")
    pr.add_argument("--stream", action="store_true", help="fetch processed data")
    pr.add_argument("--skip", type=int, default=0, help="streaming buffers to skip")
    pr.add_argument("--metrics-window", type=float, default=5.0)
    rec = pr.add_argument_group("recording (octprozapp.cpp:215-299 analog)")
    rec.add_argument("--record-background", type=int, default=0, metavar="N",
                     help="capture the post-process background from the "
                          "next N processed buffers (cuda_code.cu:1556-1562)")
    rec.add_argument("--record", action="store_true")
    rec.add_argument("--record-dir", default=".")
    rec.add_argument("--record-name", default="recording")
    rec.add_argument("--record-buffers", type=int, default=1)
    rec.add_argument("--record-raw", action="store_true")
    rec.add_argument("--record-processed", action="store_true")
    rec.add_argument("--record-float32", action="store_true",
                     help="record processed data as float32 instead of quantized")
    rec.add_argument("--record-start-with-volume", action="store_true")
    rec.add_argument("--schedule-interval", type=float, default=None,
                     help="record a time series every N seconds")
    rec.add_argument("--schedule-total", type=int, default=1)
    live = pr.add_argument_group("live view (GLWindow2D/info-box analog)")
    live.add_argument("--live", action="store_true",
                      help="serve a browser live view while streaming")
    live.add_argument("--live-port", type=int, default=8765)
    live.add_argument("--live-host", default="127.0.0.1")
    live.add_argument("--live-lut", default="gray")
    live.add_argument("--live-volume", action="store_true",
                      help="periodic 3D render of the assembled volume "
                           "(GLWindow3D analog, throttled)")
    pr.set_defaults(fn=cmd_replay)

    pv = sub.add_parser("render", help="render a processed float32 volume")
    pv.add_argument("input")
    pv.add_argument("--bscans", type=int, required=True)
    pv.add_argument("--ascans", type=int, required=True)
    pv.add_argument("--depth", type=int, required=True)
    pv.add_argument("--mode", default="mip")
    pv.add_argument("--threshold", type=float, default=0.25)
    pv.add_argument("--gamma", type=float, default=2.0)
    pv.add_argument("--step-length", type=float, default=0.01)
    pv.add_argument("--yaw", type=float, default=0.5)
    pv.add_argument("--pitch", type=float, default=0.4)
    pv.add_argument("--size", type=int, default=512)
    pv.add_argument("--lut", default=None)
    pv.add_argument("--out", required=True)
    pv.set_defaults(fn=cmd_render)

    pc = sub.add_parser("compare",
                        help="PSNR/SSIM of a processed volume vs a reference")
    pc.add_argument("got", help="this pipeline's processed volume (.raw)")
    pc.add_argument("ref", help="reference volume (.raw)")
    pc.add_argument("--bscans", type=int, required=True)
    pc.add_argument("--ascans", type=int, required=True)
    pc.add_argument("--depth", type=int, required=True)
    pc.add_argument("--dtype", default="float32",
                    choices=["float32", "float64", "uint8", "uint16", "uint32"])
    pc.add_argument("--ref-dtype", default="float32",
                    choices=["float32", "float64", "uint8", "uint16", "uint32"],
                    help="reference file sample type (quantized uints are "
                         "scaled to [0,1], inverting floatToOutput)")
    pc.add_argument("--data-range", type=float, default=None,
                    help="PSNR peak range; default: reference max-min")
    pc.add_argument("--clip01", action="store_true",
                    help="clip both volumes to [0,1] first (display range; "
                         "keeps log-floor voxels from dominating the MSE)")
    pc.add_argument("--min-psnr", type=float, default=None,
                    help="exit non-zero if overall PSNR is below this (dB)")
    pc.set_defaults(fn=cmd_compare)

    pi = sub.add_parser("info", help="device + version report")
    pi.set_defaults(fn=cmd_info)

    pb = sub.add_parser("bench", help="run the headline benchmark")
    pb.set_defaults(fn=cmd_bench)
    return p


def enable_compilation_cache() -> None:
    """Persist compiled executables across processes.

    On the axon TPU tunnel a first compile takes minutes; the persistent
    cache makes every subsequent process start in seconds.  (The compile-
    cache-explosion management the reference's 12-way kernel dispatch table
    needs, done the JAX way.)"""
    import os

    try:
        import jax

        cache_dir = os.environ.get(
            "OCTPROZ_TPU_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "octproz_tpu", "jax"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization, never a requirement


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    enable_compilation_cache()
    try:
        return args.fn(args)
    except FileNotFoundError as e:
        print(f"error: file not found: {e.filename or e}", file=sys.stderr)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
