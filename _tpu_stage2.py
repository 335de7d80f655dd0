import numpy as np, time
import jax, jax.numpy as jnp
t0=time.time()
def log(m): print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)
log(f"devices: {jax.devices()}")

from octproz_tpu import curves as curves_mod
from octproz_tpu.params import AcqParams, Interpolation, ProcConfig, WindowType
from octproz_tpu.pallas import fused_prep as fp

acq = AcqParams(samples_per_line=256, ascans_per_bscan=64, bscans_per_buffer=8, bit_depth=12)
cfg = ProcConfig(bitshift=True, resampling=True, interpolation=Interpolation.CUBIC,
                 windowing=True, dispersion=True, log_scaling=True,
                 fft_via_matmul=True, fold_backend="xla")
curves = curves_mod.make_curves(acq, cfg, resample_coeffs=(0.0, 255.0, 5.0, 0.0),
                                dispersion_coeffs=(0,0,5,0))
rng = np.random.default_rng(0)
raw = jax.device_put(rng.integers(0, 4095, size=acq.buffer_shape, dtype=np.uint16))

def stage(name, fn):
    try:
        v = np.asarray(fn())
        log(f"{name}: OK {v.ravel()[:1]}")
        return True
    except Exception as e:
        log(f"{name}: FAIL {str(e)[:90]}")
        return False

r2d = raw.reshape(-1, 256)
wre, wim = curves.depth_op_re, curves.depth_op_im

stage("decode", lambda: jax.jit(lambda r: ((r >> 4).astype(jnp.int32).astype(jnp.float32)))(r2d)) or exit()
stage("decode+mm", lambda: jax.jit(lambda r: jnp.matmul((r >> 4).astype(jnp.int32).astype(jnp.float32), wre, preferred_element_type=jnp.float32))(r2d)) or exit()
stage("decode+2mm", lambda: jax.jit(lambda r: (
    jnp.matmul((r >> 4).astype(jnp.int32).astype(jnp.float32), wre, preferred_element_type=jnp.float32)
    + jnp.matmul((r >> 4).astype(jnp.int32).astype(jnp.float32), wim, preferred_element_type=jnp.float32)))(r2d)) or exit()

def full(r):
    x = (r >> 4).astype(jnp.int32).astype(jnp.float32)
    re = jnp.matmul(x, wre, preferred_element_type=jnp.float32)
    im = jnp.matmul(x, wim, preferred_element_type=jnp.float32)
    db = 10.0 * jnp.log10((re**2 + im**2) / jnp.float32(128))
    return (db - 0.0) / 60.0
stage("full chain manual", lambda: jax.jit(full)(r2d)) or exit()

from octproz_tpu import pipeline
from octproz_tpu.params import FpnMode
import dataclasses
cfg_off = dataclasses.replace(cfg, fpn_mode=FpnMode.OFF)
state = pipeline.initial_fpn_state(acq)
stage("process_buffer fpn off", lambda: pipeline.make_step(acq, cfg_off)(raw, curves, state)[0]) or exit()
cfg_once = dataclasses.replace(cfg, fpn_mode=FpnMode.ONCE, bscans_for_noise=2)
stage("process_buffer fpn once", lambda: pipeline.make_step(acq, cfg_once)(raw, curves, state)[0]) or exit()
log("ALL OK")
