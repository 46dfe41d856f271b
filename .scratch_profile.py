"""Decompose fused-kernel time on the real chip (scratch, untracked)."""
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
from grav1synth_tpu.container.ffshim import generate_patterns_native

B, H, W, BIT = 8, 2160, 3840, 10
params = _params(B)
pb = grain_jax.pack_params(params)
rng = np.random.default_rng(0)
maxv = (1 << BIT) - 1
y = jnp.asarray(rng.integers(0, maxv, (B, H, W), dtype=np.int16))
cbp = jnp.asarray(rng.integers(0, maxv, (B, H // 2, W // 2), dtype=np.int16))
crp = jnp.asarray(rng.integers(0, maxv, (B, H // 2, W // 2), dtype=np.int16))
lp, cbpat, crpat = generate_patterns_native(params, BIT, 1, 1, False)
lp, cbpat, crpat = jnp.asarray(lp), jnp.asarray(cbpat), jnp.asarray(crpat)
offs = grain_jax.block_offsets(pb.seed, (H + 31) // 32, (W + 31) // 32)
py = gp.pack_plane_params(pb, "y", BIT)
pcb = gp.pack_plane_params(pb, "cb", BIT)
pcr = gp.pack_plane_params(pb, "cr", BIT)
params3 = jnp.concatenate([py, pcb, pcr])


def timeit(name, fn, init, iters=10):
    cur = fn(init); _ = np.asarray(cur[0, :1, :4])
    t0 = time.time()
    cur = init
    for _i in range(iters): cur = fn(cur)
    _ = np.asarray(cur[0, :1, :4])
    dt = (time.time() - t0) / iters
    print(f"{name:36s} {dt*1e3:8.2f} ms/call  {dt*1e3/B:7.3f} ms/frame")
    return dt


def fused(v):
    return gp.apply_planes_fused(v, cbp, crp, lp, cbpat, crpat, offs, params3, BIT, 1, 1)[0]
timeit("fused 3-plane", fused, y)
timeit("luma only", lambda v: gp.apply_plane_luma(v, lp, offs, py, BIT), y)

# --- luma variants: stub scaling / noise ---

def _luma_variant(mode):
    nb = (W + 31) // 32
    wpad = ((W + 127) // 128) * 128

    def kern(offs_ref, params_ref, src_ref, rolled_ref, out_ref):
        bi = pl.program_id(0)
        s = pl.program_id(1)
        ss = params_ref[bi, gp.P_SCALING_SHIFT]
        lo = params_ref[bi, gp.P_CLIP_LO]
        hi = params_ref[bi, gp.P_CLIP_HI]
        weights = gp._group_weights(0, 0)

        def group(g, _):
            base = pl.multiple_of(g * 128, 128)
            src = src_ref[0, :, pl.ds(base, 128)].astype(jnp.int32)
            if mode in ("noise_only", "full"):
                noise = gp._group_noise(offs_ref, rolled_ref, 81, params_ref,
                                        weights, bi, s, g, nb, 0, 0, bi)
            else:
                noise = src & 511
            if mode in ("scale_only", "full"):
                scale = gp._scaling(src, params_ref, bi, BIT)
            else:
                scale = src & 255
            out_ref[0, :, pl.ds(base, 128)] = jnp.clip(
                src + ((scale * noise + (1 << (ss - 1))) >> ss), lo, hi
            ).astype(jnp.int16)
            return _

        jax.lax.fori_loop(0, pl.cdiv(nb * 32, 128), group, None)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, (H + 31) // 32),
        in_specs=[
            pl.BlockSpec((1, 32, wpad), lambda bi, s, *_: (bi, s, 0)),
            pl.BlockSpec((1, 64 * 81, 128), lambda bi, s, *_: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 32, wpad), lambda bi, s, *_: (bi, s, 0)),
    )
    f = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct(y.shape, jnp.int16),
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
