"""Training THROUGH the upscaler: FSR as a differentiable layer.

The reference is a forward-only shader; on TPU the same algorithm carries
gradients (docs/AUTODIFF.md: ideal-derivative JVPs on the bit tricks +
XLA-twin VJPs on the fused kernels), so losses can be measured on the
*post-FSR displayed frame* — the image the user actually sees.  On TPU the
forward runs the fused Pallas kernel (one dispatch); the backward runs the
XLA twin's VJP.

Two demos:

  inverse   (default)  Gradient-descend the low-res *render itself* so that
                       ``upscale(render)`` matches a high-res target — the
                       inverse problem "what should the game render so the
                       displayed frame is closest to ground truth".  The
                       displayed-frame MSE falls ~25% below the
                       box-downsample baseline and plateaus at the
                       information-theoretic floor of a half-res render
                       (hard hi-res edges at off-grid positions are not
                       representable at any input).
  prefilter            Train a small conv pre-filter F on *blurred* renders
                       (the TAA-softened input FSR's integration guide
                       warns about) so that ``upscale(F(blurred))``
                       approaches ``upscale(clean)`` — a learned deblur
                       stage in front of FSR, the
                       learned-stage-before-the-upscaler integration shape.

    python examples/train_through_fsr.py [inverse|prefilter] [--steps N]
    python examples/train_through_fsr.py --cpu   # pin CPU (axon ignores env)
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import fsr_tpu


def make_scene(rng, hw, noise=0.0):
    """Procedural high-res ground truth: soft gradients + hard edges
    (the content classes EASU treats differently).  `noise` adds per-pixel
    texture — note a half-res render can never reproduce it, so it sets an
    irreducible floor on any displayed-frame MSE."""
    h, w = hw
    yy, xx = np.meshgrid(np.arange(h) / h, np.arange(w) / w, indexing="ij")
    base = np.stack([
        0.5 + 0.35 * np.sin(6.0 * xx + 2.0 * yy),
        0.5 + 0.35 * np.cos(4.0 * yy),
        0.5 + 0.35 * np.sin(3.0 * (xx + yy)),
    ])
    for _ in range(24):
        c = rng.uniform(0.1, 0.9)
        y0, x0 = rng.integers(0, h - 16), rng.integers(0, w - 16)
        hh, ww = rng.integers(4, 16), rng.integers(4, 16)
        base[:, y0:y0 + hh, x0:x0 + ww] = c
    if noise:
        base += noise * rng.standard_normal((3, h, w))
    return np.clip(base, 0.02, 0.98).astype(np.float32)


def downsample(img, q=2):
    """Box-filtered render at 1/q resolution (the 'game render')."""
    c, h, w = img.shape
    return img.reshape(c, h // q, q, w // q, q).mean(axis=(2, 4))


def adam_step(g, m, v, t, lr, b1=0.9, b2=0.999, eps=1e-8):
    m = jax.tree.map(lambda m_, g_: b1 * m_ + (1 - b1) * g_, m, g)
    v = jax.tree.map(lambda v_, g_: b2 * v_ + (1 - b2) * g_ * g_, v, g)
    upd = jax.tree.map(
        lambda m_, v_: lr * (m_ / (1 - b1 ** t)) /
        (jnp.sqrt(v_ / (1 - b2 ** t)) + eps), m, v)
    return upd, m, v


def run_inverse(args, rng):
    hi = jnp.asarray(make_scene(rng, (args.size * 2, args.size * 4)))
    lo0 = jnp.asarray(downsample(np.asarray(hi)))

    def loss_fn(lo):
        return jnp.mean((fsr_tpu.upscale(lo, scale=2.0) - hi) ** 2)

    @jax.jit
    def step(lo, m, v, t):
        loss, g = jax.value_and_grad(loss_fn)(lo)
        upd, m, v = adam_step(g, m, v, t, args.lr)
        return jnp.clip(lo - upd, 0.0, 1.0), m, v, loss

    base = float(jax.jit(loss_fn)(lo0))
    print(f"baseline (box downsample) displayed MSE: {base:.4e}")
    lo, m, v = lo0, jnp.zeros_like(lo0), jnp.zeros_like(lo0)
    for i in range(args.steps):
        lo, m, v, loss = step(lo, m, v, jnp.float32(i + 1))
        if i % 50 == 0 or i == args.steps - 1:
            print(f"step {i:4d}  displayed MSE {float(loss):.4e}")
    final = float(jax.jit(loss_fn)(lo))
    print(f"optimized render MSE: {final:.4e}  ({base / final:.1f}x lower)")
    return 0 if final < 0.9 * base else 1


def conv_apply(params, x):
    """One linear 5x5 conv, identity-initialized (delta kernel) — enough
    capacity to learn a pre-compensation filter for EASU+RCAS's response."""
    (k, b), = params
    return jax.lax.conv_general_dilated(
        x[None], k, (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0] + b[:, None, None]


def gaussian_blur(img, sigma=0.8):
    """Separable gaussian — stands in for TAA's temporal softening, the
    degradation the reference's integration guide flags on FSR inputs."""
    r = 2
    xs = np.arange(-r, r + 1, dtype=np.float32)
    k = np.exp(-0.5 * (xs / sigma) ** 2)
    k /= k.sum()
    out = np.apply_along_axis(
        lambda v: np.convolve(np.pad(v, r, mode="edge"), k, "valid"), 1, img)
    out = np.apply_along_axis(
        lambda v: np.convolve(np.pad(v, r, mode="edge"), k, "valid"), 2, out)
    return out.astype(np.float32)


def run_prefilter(args, rng):
    frames_hi = [make_scene(rng, (args.size * 2, args.size * 4), noise=0.02)
                 for _ in range(4)]
    frames_lo = [gaussian_blur(downsample(f)) for f in frames_hi]

    def delta_kernel():
        k = np.zeros((3, 3, 5, 5), np.float32)
        for c in range(3):
            k[c, c, 2, 2] = 1.0
        return k

    params = [(jnp.asarray(delta_kernel()), jnp.zeros((3,), jnp.float32))]

    lo = jnp.asarray(np.stack(frames_lo))   # (N, 3, h, w) — batch dims
    hi = jnp.asarray(np.stack(frames_hi))   # ride through upscale natively

    def loss_fn(params):
        filt = jax.vmap(lambda f: conv_apply(params, f))(lo)
        shown = fsr_tpu.upscale(jnp.clip(filt, 0.0, 1.0), scale=2.0)
        return jnp.mean((shown - hi) ** 2)

    @jax.jit
    def step(params, m, v, t):
        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, m, v = adam_step(g, m, v, t, args.lr)
        return jax.tree.map(lambda p, u: p - u, params, upd), m, v, loss

    base = float(jax.jit(
        lambda: jnp.mean((fsr_tpu.upscale(lo, scale=2.0) - hi) ** 2))())
    print(f"baseline (blurred, no prefilter) MSE: {base:.4e}")

    m = jax.tree.map(jnp.zeros_like, params)
    v = jax.tree.map(jnp.zeros_like, params)
    for i in range(args.steps):
        params, m, v, loss = step(params, m, v, jnp.float32(i + 1))
        if i % 50 == 0 or i == args.steps - 1:
            print(f"step {i:4d}  loss {float(loss):.4e}")
    final = float(jax.jit(loss_fn)(params))
    print(f"trained deblur prefilter MSE:         {final:.4e} "
          f"({(1 - final / base) * 100:.1f}% lower)")
    return 0 if final < base else 1


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", nargs="?", default="inverse",
                    choices=("inverse", "prefilter"))
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--size", type=int, default=96, help="low-res height")
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU backend (the axon TPU plugin ignores "
                         "JAX_PLATFORMS; this pins the config explicitly)")
    args = ap.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.lr is None:
        args.lr = 3e-3 if args.mode == "inverse" else 1e-3

    rng = np.random.default_rng(0)
    if args.mode == "inverse":
        return run_inverse(args, rng)
    return run_prefilter(args, rng)


if __name__ == "__main__":
    raise SystemExit(main())
