"""Decompose fused-kernel time on the real chip (scratch, untracked).

The remote runtime dispatches asynchronously and hides execution time,
so every measurement dependency-chains the op (output feeds the next
input) and syncs with a device->host fetch of a few elements.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from grav1synth_tpu.ops import grain_jax, grain_pallas as gp
from bench import _params

B, H, W, BIT = 8, 2160, 3840, 10
params = _params(B)
pb = grain_jax.pack_params(params)
rng = np.random.default_rng(0)
maxv = (1 << BIT) - 1
y = jnp.asarray(rng.integers(0, maxv, (B, H, W), dtype=np.int32))
cbp = jnp.asarray(rng.integers(0, maxv, (B, H // 2, W // 2), dtype=np.int32))
crp = jnp.asarray(rng.integers(0, maxv, (B, H // 2, W // 2), dtype=np.int32))

from grav1synth_tpu.container.ffshim import generate_patterns_native
lp, cbpat, crpat = generate_patterns_native(params, BIT, 1, 1, False)
lp, cbpat, crpat = jnp.asarray(lp), jnp.asarray(cbpat), jnp.asarray(crpat)
offs = grain_jax.block_offsets(pb.seed, (H + 31) // 32, (W + 31) // 32)
py = gp.pack_plane_params(pb, "y", BIT)
pcb = gp.pack_plane_params(pb, "cb", BIT)
pcr = gp.pack_plane_params(pb, "cr", BIT)
params3 = jnp.concatenate([py, pcb, pcr])
avg = grain_jax._avg_luma(y, H // 2, W // 2, 1, 1)
_ = np.asarray(avg[0, :1, :4])


def timeit(name, fn, init, iters=10):
    """fn: y_in -> y_out (chainable, same shape)."""
    cur = fn(init)
    _ = np.asarray(cur[0, :1, :4])
    t0 = time.time()
    cur = init
    for _i in range(iters):
        cur = fn(cur)
    _ = np.asarray(cur[0, :1, :4])
    dt = (time.time() - t0) / iters
    print(f"{name:34s} {dt*1e3:8.2f} ms/call  {dt*1e3/B:7.3f} ms/frame")
    return dt


def fused(y_in):
    return gp.apply_planes_fused(
        y_in, cbp, crp, avg, lp, cbpat, crpat, offs, params3, BIT, 1, 1)[0]

timeit("fused 3-plane", fused, y)
timeit("luma only", lambda v: gp.apply_plane_luma(v, lp, offs, py, BIT), y)
timeit("chroma cb only",
       lambda v: gp.apply_plane_chroma(v, avg, cbpat, offs, pcb, BIT, 1, 1), cbp)
timeit("avg_luma (XLA)",
       jax.jit(lambda v: jnp.pad(grain_jax._avg_luma(v, H // 2, W // 2, 1, 1),
                                 ((0, 0), (0, H - H // 2), (0, W - W // 2)))), y)
timeit("copy y (HBM rw bound)", jax.jit(lambda v: v + 1), y)


@jax.jit
def prerolled_chain(p):
    r = gp._prerolled(p, 81, 0)
    return p + r[:, :73, :82]

timeit("prerolled luma (XLA)", prerolled_chain, lp)

# --- variants: stub scaling / stub noise inside the luma kernel ---

def _luma_variant(mode):
    nb = (W + 31) // 32
    wpad = ((W + 127) // 128) * 128

    def kern(offs_ref, params_ref, src_ref, rolled_ref, out_ref):
        bi = pl.program_id(0)
        s = pl.program_id(1)
        ss = params_ref[bi, gp.P_SCALING_SHIFT]
        lo = params_ref[bi, gp.P_CLIP_LO]
        hi = params_ref[bi, gp.P_CLIP_HI]

        def group(g, _):
            base = pl.multiple_of(g * 128, 128)
            src = src_ref[0, :, pl.ds(base, 128)]
            if mode in ("noise_only", "full"):
                noise = jnp.concatenate([
                    gp._block_noise(offs_ref, rolled_ref, 81, params_ref, bi, s,
                                    jnp.minimum(g * 4 + j, nb - 1), 0, 0)
                    for j in range(4)], axis=1)
            else:
                noise = src & 511
            if mode in ("scale_only", "full"):
                scale = gp._scaling(src, params_ref, bi, BIT)
            else:
                scale = src & 255
            out_ref[0, :, pl.ds(base, 128)] = jnp.clip(
                src + ((scale * noise + (1 << (ss - 1))) >> ss), lo, hi)
            return _

        jax.lax.fori_loop(0, pl.cdiv(nb * 32, 128), group, None)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, (H + 31) // 32),
        in_specs=[
            pl.BlockSpec((1, 32, wpad), lambda bi, s, *_: (bi, s, 0)),
            pl.BlockSpec((1, 16 * 81, 128), lambda bi, s, *_: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 32, wpad), lambda bi, s, *_: (bi, s, 0)),
    )
    f = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct(y.shape, jnp.int32),
                       grid_spec=grid_spec)

    @jax.jit
    def run(v):
        rolled = gp._prerolled(lp, 81, 0)
        return f(offs, py, v, rolled)

    return run


timeit("luma variant: full", _luma_variant("full"), y)
timeit("luma variant: noise only", _luma_variant("noise_only"), y)
timeit("luma variant: scale only", _luma_variant("scale_only"), y)
timeit("luma variant: neither", _luma_variant("neither"), y)
