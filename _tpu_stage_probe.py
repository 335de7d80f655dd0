import numpy as np, time, json
import jax, jax.numpy as jnp
t0=time.time()
def log(msg): print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)
log(f"devices: {jax.devices()}")

from octproz_tpu import curves as curves_mod, pipeline
from octproz_tpu.params import AcqParams, FpnMode, Interpolation, ProcConfig, WindowType
import dataclasses

rng = np.random.default_rng(0)

# stage 1: tiny buffer, tiny step
acq_s = AcqParams(samples_per_line=256, ascans_per_bscan=64, bscans_per_buffer=8, bit_depth=12)
cfg = ProcConfig(bitshift=True, resampling=True, interpolation=Interpolation.CUBIC,
                 windowing=True, dispersion=True, fpn_mode=FpnMode.OFF,
                 log_scaling=True, fft_via_matmul=True, fold_backend="xla")
curves_s = curves_mod.make_curves(acq_s, cfg, resample_coeffs=(0.0, 255.0, 5.0, 0.0),
                                  dispersion_coeffs=(0,0,5,0))
raw_s = jax.device_put(rng.integers(0, 4095, size=acq_s.buffer_shape, dtype=np.uint16))
log("tiny device_put done")
step_s = pipeline.make_step(acq_s, cfg)
out, st = step_s(raw_s, curves_s, pipeline.initial_fpn_state(acq_s))
log(f"tiny step done, probe={float(np.asarray(out[0,0,5])):.4f}")

# stage 2: full-size single buffer upload
acq = AcqParams(samples_per_line=1024, ascans_per_bscan=512, bscans_per_buffer=256, bit_depth=12)
raw = jax.device_put(rng.integers(0, 4095, size=acq.buffer_shape, dtype=np.uint16))
raw.block_until_ready()
log(f"full buffer ({acq.bytes_per_buffer/1e6:.0f} MB) device_put done")

# stage 3: full-size compile + run
curves_f = curves_mod.make_curves(acq, cfg, resample_coeffs=(0.0, 1023.0, 20.0, -10.0),
                                  dispersion_coeffs=(0,0,10,0))
step = pipeline.make_step(acq, cfg)
st = pipeline.initial_fpn_state(acq)
tc = time.time()
out, st = step(raw, curves_f, st)
probe = float(np.asarray(out[0,0,5]))
log(f"full step compile+run done in {time.time()-tc:.1f}s, probe={probe:.4f}")

# stage 4: steady state
n=20
acc = jnp.zeros((), jnp.float32)
tt = time.perf_counter()
for i in range(n):
    out, st = step(raw, curves_f, st)
    acc = acc + out[0,0,5]
float(np.asarray(acc))
dt = time.perf_counter() - tt
log(json.dumps({"ascan_rate_mhz": round(n*acq.ascans_per_buffer/dt/1e6,3),
                "ms_per_buffer": round(dt/n*1e3,2)}))
