import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
import fsr_tpu
from fsr_tpu.utils import profiling

rng = np.random.default_rng(7)
presets = {"ultra_quality_1.3x": (2954, 1662), "quality_1.5x": (2560, 1440), "balanced_1.7x": (2259, 1271)}
for name, (w, h) in presets.items():
    img = jnp.asarray(rng.uniform(0, 1, (3, h, w)).astype(np.float32), dtype=jnp.bfloat16)
    f = jax.jit(lambda x: fsr_tpu.upscale(x, out_size=(2160, 3840), compute_dtype=jnp.bfloat16, impl="pallas"))
    r = f(img); r.block_until_ready()
    img32 = img.astype(jnp.float32)
    want = fsr_tpu.upscale(img32, out_size=(2160, 3840), compute_dtype=jnp.float32, impl="xla")
    got = fsr_tpu.upscale(img32, out_size=(2160, 3840), compute_dtype=jnp.float32, impl="pallas")
    dev = float(jnp.max(jnp.abs(jnp.asarray(want) - jnp.asarray(got))))
    best = None
    for _ in range(3):
        ms = sum(profiling.op_times(lambda: f(img).block_until_ready()).values())
        best = ms if best is None else min(best, ms)
    print(name, "ms=", round(best, 3), "mpix_s=", round(3840*2160/best/1e3), "maxdev_f32=", dev, flush=True)
