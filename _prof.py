"""Scratch: op-level kernel timing via jax.profiler (deleted later)."""
import glob, gzip, json, os, shutil, sys, time
import numpy as np, jax, jax.numpy as jnp
from fsr_tpu.kernels import fused
from fsr_tpu.core.constants import EasuConstants, RcasConstants

rng = np.random.default_rng(0)
in_hw, out_hw = (1080, 1920), (2160, 3840)
con = EasuConstants.create((1920,1080), None, (3840,2160))
rcon = RcasConstants(0.25)
mpix = out_hw[0]*out_hw[1]/1e6
x = jnp.asarray(rng.uniform(0,1,(3,*in_hw)).astype(np.float32))

def op_time(fn, match="upscale_fused", n=3):
    fn().block_until_ready()  # compile
    d = "/tmp/jaxtrace_prof"
    shutil.rmtree(d, ignore_errors=True)
    with jax.profiler.trace(d):
        for _ in range(n):
            fn().block_until_ready()
    p = glob.glob(d + "/**/*.trace.json.gz", recursive=True)[0]
    data = json.load(gzip.open(p))
    tot = 0.0
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e and match in e.get("name", ""):
            tot += e["dur"]
    return tot / n / 1e6  # seconds per call

def run(label, **kw):
    try:
        t = op_time(lambda: fused.upscale_fused(x, out_hw, con, rcon, **kw))
        print(f"{label:34s}: {t*1e3:7.3f} ms ({mpix/t/1e3:6.2f} Gpix/s)", flush=True)
        return t
    except Exception as e:
        lines = [l for l in str(e).splitlines() if 'rror' in l.lower() or 'implement' in l.lower()][:1]
        print(f"{label:34s}: FAILED {lines}", flush=True)

if __name__ == "__main__":
    specs = sys.argv[1].split(",") if len(sys.argv) > 1 else ["base"]
    for spec in specs:
        parts = spec.split(":")
        kw = {}
        if "bf16" in parts: kw["compute_dtype"] = jnp.bfloat16
        if "norcas" in parts: kw["apply_rcas"] = False
        if "roll" in parts: fused.TAP_MODE = "roll"
        else: fused.TAP_MODE = "slice"
        tile = [p for p in parts if p.startswith("t") and "x" in p]
        if tile:
            tj, ti = map(int, tile[0][1:].split("x"))
            fused._pick_tiles = lambda hpl, wpl, tj=tj, ti=ti: (tj, ti)
            fused.upscale_fused.clear_cache()
        run(spec, **kw)
