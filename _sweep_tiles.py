import numpy as np, jax, jax.numpy as jnp
from fsr_tpu.core.constants import EasuConstants, RcasConstants
from fsr_tpu.kernels import fused
from fsr_tpu.utils.profiling import op_times
rng = np.random.default_rng(0)
img = jnp.asarray(rng.random((3,1080,1920), np.float32))
con = EasuConstants.create((1920,1080), None, (3840,2160))
rcon = RcasConstants(0.25)
orig = fused._pick_tiles
for tj in (32, 40, 48, 56):
    for ti in (256, 512):
        fused._pick_tiles = lambda hpl, wpl, qy, qx, pack=False, tj=tj, ti=ti: (tj, ti)
        try:
            fused.upscale_fused.clear_cache()
            f = lambda: fused.upscale_fused(img,(2160,3840),con,rcon,compute_dtype=jnp.bfloat16).block_until_ready()
            f()
            t = sum(op_times(f).values())
            print(f"tj={tj} ti={ti}: {t:.4f} ms")
        except Exception as e:
            print(f"tj={tj} ti={ti}: FAIL {str(e)[:80]}")
fused._pick_tiles = orig
