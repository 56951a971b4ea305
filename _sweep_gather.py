import numpy as np, jax, jax.numpy as jnp
from fsr_tpu.core.constants import EasuConstants, RcasConstants
from fsr_tpu.kernels import easu_gather
from fsr_tpu.utils.profiling import op_times
in_hw, out_hw = (1270, 2259), (2160, 3840)
con = EasuConstants.create((in_hw[1], in_hw[0]), None, (out_hw[1], out_hw[0]))
rcon = RcasConstants(0.25)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(0, 1, (3, *in_hw)).astype(np.float32))
orig = easu_gather._pick_tiles
for tj in (56, 64, 88, 120):
    for ti in (128, 256, 384, 512):
        easu_gather._pick_tiles = lambda h, w, apply_rcas=False, tj=tj, ti=ti: (tj, ti)
        try:
            easu_gather.easu_gather.clear_cache()
            f = lambda: easu_gather.easu_gather(
                x, out_hw, con, rcon, apply_rcas=True,
                compute_dtype=jnp.bfloat16).block_until_ready()
            f()
            t = sum(op_times(f).values())
            print(f"tj={tj} ti={ti}: {t:.4f} ms")
        except Exception as e:
            print(f"tj={tj} ti={ti}: FAIL {str(e)[:60]}")
easu_gather._pick_tiles = orig
