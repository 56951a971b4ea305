"""Quick headline probe: bf16-in fused 2x 1080p->4K device-op ms."""
import sys; sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from fsr_tpu.core.constants import EasuConstants, RcasConstants
from fsr_tpu.kernels import fused
from fsr_tpu.utils.profiling import op_times

in_hw, out_hw = (1080, 1920), (2160, 3840)
hin, win = in_hw
con = EasuConstants.create((win, hin), None, (out_hw[1], out_hw[0]))
rcon = RcasConstants(0.25)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(0, 1, (3, hin, win)).astype(np.float32)).astype(jnp.bfloat16)

f = jax.jit(lambda z: fused.upscale_fused(z, out_hw, con, rcon, compute_dtype=jnp.bfloat16))
ms = min(sum(op_times(lambda: f(x), iters=4).values()) for _ in range(5))
print(f"HEADLINE_MS {ms:.4f}  MPIX_S {2160 * 3840 / (ms * 1e-3) / 1e6:.1f}")
