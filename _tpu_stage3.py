import numpy as np, time, json
import jax, jax.numpy as jnp
t0=time.time()
def log(m): print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)
log(f"devices: {jax.devices()}")
rng = np.random.default_rng(0)
x = jax.device_put(rng.integers(0, 4095, size=(512, 256)).astype(np.uint16))

def stage(name, fn):
    try:
        v = np.asarray(fn()); log(f"{name}: OK"); return True
    except Exception as e:
        log(f"{name}: FAIL {str(e)[:80]}"); return False

stage("u16->f32 direct", lambda: jax.jit(lambda r: r.astype(jnp.float32))(x)) or exit()
stage("u16>>4 ->f32", lambda: jax.jit(lambda r: (r >> 4).astype(jnp.float32))(x)) or exit()
stage("u16->i32", lambda: jax.jit(lambda r: r.astype(jnp.int32))(x))  # expect FAIL, continue anyway

from octproz_tpu import curves as curves_mod, pipeline
from octproz_tpu.params import AcqParams, FpnMode, Interpolation, ProcConfig
import dataclasses
acq = AcqParams(samples_per_line=256, ascans_per_bscan=64, bscans_per_buffer=8, bit_depth=12)
cfg = ProcConfig(bitshift=True, resampling=True, interpolation=Interpolation.CUBIC,
                 windowing=True, dispersion=True, log_scaling=True,
                 fpn_mode=FpnMode.OFF, fft_via_matmul=True, fold_backend="xla")
curves = curves_mod.make_curves(acq, cfg, resample_coeffs=(0.0, 255.0, 5.0, 0.0),
                                dispersion_coeffs=(0,0,5,0))
raw = jax.device_put(rng.integers(0, 4095, size=acq.buffer_shape, dtype=np.uint16))
state = pipeline.initial_fpn_state(acq)
stage("tiny step xla fpn-off", lambda: pipeline.make_step(acq, cfg)(raw, curves, state)[0]) or exit()
cfg2 = dataclasses.replace(cfg, fpn_mode=FpnMode.ONCE, bscans_for_noise=2)
stage("tiny step xla fpn-once", lambda: pipeline.make_step(acq, cfg2)(raw, curves, state)[0]) or exit()
cfg3 = dataclasses.replace(cfg2, fold_backend="pallas")
stage("tiny step PALLAS fpn-once", lambda: pipeline.make_step(acq, cfg3)(raw, curves, state)[0])
log("DONE")
