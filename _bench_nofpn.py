import numpy as np, time, json
import jax, jax.numpy as jnp
from octproz_tpu import curves as curves_mod, pipeline
from octproz_tpu.params import AcqParams, FpnMode, Interpolation, ProcConfig, WindowType

acq = AcqParams(samples_per_line=1024, ascans_per_bscan=512,
                bscans_per_buffer=256, buffers_per_volume=1, bit_depth=12)
cfg = ProcConfig(bitshift=True, resampling=True, interpolation=Interpolation.CUBIC,
                 windowing=True, dispersion=True, fpn_mode=FpnMode.OFF,
                 log_scaling=True, fft_via_matmul=True, fold_backend="xla")
curves = curves_mod.make_curves(acq, cfg,
    resample_coeffs=(0.0, 1023.0, 20.0, -10.0),
    dispersion_coeffs=(0.0, 0.0, 10.0, 0.0), window_type=WindowType.HANNING)
state = pipeline.initial_fpn_state(acq)
rng = np.random.default_rng(0)
ring = [jax.device_put(rng.integers(0, 4095, size=acq.buffer_shape, dtype=np.uint16))
        for _ in range(4)]
step = pipeline.make_step(acq, cfg)
t0=time.time()
out, state = step(ring[0], curves, state)
probe = float(np.asarray(out[0,0,5]))
print("warmup ok %.1fs probe=%.4f" % (time.time()-t0, probe), flush=True)
n_iters = 50
acc = jnp.zeros((), jnp.float32)
t0 = time.perf_counter()
for i in range(n_iters):
    out, state = step(ring[i % 4], curves, state)
    acc = acc + out[0,0,5]
float(np.asarray(acc))
dt = time.perf_counter() - t0
rate = n_iters * acq.ascans_per_buffer / dt / 1e6
print(json.dumps({"ascan_rate_mhz": round(rate,3), "ms_per_buffer": round(dt/n_iters*1e3,2)}))
