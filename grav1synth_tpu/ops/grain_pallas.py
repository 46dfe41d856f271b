"""Pallas TPU kernels for the film-grain hot path.

One fused kernel applies grain to a 32-luma-row stripe: per-block noise
assembly from the VMEM-resident grain pattern (dynamic slices selected
by SMEM scalar offsets), overlap blending, piecewise-linear scaling
evaluated in closed form from SMEM point scalars, and the final
round/blend/clip — a single kernel launch per plane per batch, vs the
hundreds of XLA kernels the unfused path dispatches (launch overhead
dominates on the remote-TPU runtime, and a single fused pass is also
the HBM-optimal schedule on local hardware: frame pixels are read and
written exactly once).

Grid: (batch, stripes). Scalar prefetch: per-(stripe, block) offset
randoms and packed per-frame parameters.

The kernels are bit-exact against grain_jax/grain_ref (dav1d-validated)
and are exercised in interpret mode on the CPU test mesh.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .grain_jax import BLOCK, GrainParamsBatch

# packed per-frame parameter layout (int32 scalars)
P_ACTIVE = 0
P_NUM_PTS = 1
P_SCALING_SHIFT = 2
P_OVERLAP = 3
P_CLIP_LO = 4
P_CLIP_HI = 5
P_GMIN = 6
P_GMAX = 7
P_USE_MULT = 8
P_MULT = 9
P_LUMA_MULT = 10
P_OFFSET = 11
P_PTS = 12  # 14 (x, y) pairs interleaved
P_SEG = 12 + 28  # 13 (delta, bias) pairs: f_j(v) = (v*delta + bias) >> 16
P_LAST_Y = P_SEG + 26
P_LEN = P_LAST_Y + 1


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def pack_plane_params(
    p: GrainParamsBatch,
    plane: str,  # "y" | "cb" | "cr"
    bit_depth: int,
) -> jnp.ndarray:
    """Build the (B, P_LEN) int32 scalar block consumed by the kernels."""
    b = p.batch
    maxval = (1 << bit_depth) - 1
    grain_center = 128 << (bit_depth - 8)
    out = jnp.zeros((b, P_LEN), jnp.int32)

    if plane == "y":
        active = (p.num_y > 0).astype(jnp.int32)
        num = p.num_y
        pts = p.pts_y
        hi = jnp.where(p.clip > 0, 235 << (bit_depth - 8), maxval)
        use_mult = jnp.zeros_like(active)
        mult = luma_mult = offset = jnp.zeros_like(active)
    else:
        num_own = p.num_cb if plane == "cb" else p.num_cr
        pts_own = p.pts_cb if plane == "cb" else p.pts_cr
        csfl = p.csfl > 0
        active = (csfl | (num_own > 0)).astype(jnp.int32)
        num = jnp.where(csfl, p.num_y, num_own)
        pts_own_padded = jnp.pad(pts_own, ((0, 0), (0, 14 - pts_own.shape[1]), (0, 0)))
        pts = jnp.where(csfl[:, None, None], p.pts_y, pts_own_padded)
        hi = jnp.where(p.clip > 0, 240 << (bit_depth - 8), maxval)
        use_mult = (~csfl).astype(jnp.int32)
        if plane == "cb":
            mult, luma_mult, offset = p.cb_mult, p.cb_luma_mult, p.cb_offset
        else:
            mult, luma_mult, offset = p.cr_mult, p.cr_luma_mult, p.cr_offset

    lo = jnp.where(p.clip > 0, 16 << (bit_depth - 8), 0)
    out = out.at[:, P_ACTIVE].set(active)
    out = out.at[:, P_NUM_PTS].set(num)
    out = out.at[:, P_SCALING_SHIFT].set(p.scaling_shift)
    out = out.at[:, P_OVERLAP].set(p.overlap)
    out = out.at[:, P_CLIP_LO].set(lo)
    out = out.at[:, P_CLIP_HI].set(hi)
    out = out.at[:, P_GMIN].set(-grain_center)
    out = out.at[:, P_GMAX].set(grain_center - 1)
    out = out.at[:, P_USE_MULT].set(use_mult)
    out = out.at[:, P_MULT].set(mult)
    out = out.at[:, P_LUMA_MULT].set(luma_mult)
    out = out.at[:, P_OFFSET].set(offset)
    out = out.at[:, P_PTS : P_PTS + 28].set(pts.reshape(b, 28))
    # per-segment affine form of the spec LUT: for v in [x_j, x_{j+1}),
    # lut8(v) = (v * delta_j + bias_j) >> 16 with
    # delta_j = dy * ((65536 + dx/2) // dx), bias_j = (y_j << 16) -
    # x_j * delta_j + 32768
    x_j = pts[:, :, 0]
    y_j = pts[:, :, 1]
    dx = x_j[:, 1:] - x_j[:, :-1]
    dy = y_j[:, 1:] - y_j[:, :-1]
    dx_safe = jnp.maximum(dx, 1)
    delta = dy * ((65536 + (dx_safe >> 1)) // dx_safe)
    seg_ok = (jnp.arange(13)[None, :] < (num[:, None] - 1)) & (dx > 0)
    delta = jnp.where(seg_ok, delta, 0)
    # bias pairs with the (v - x_j) form so products stay within int32
    # for any representable curve: lut8(v) = ((v-x_j)*delta_j + bias_j)
    # >> 16 with bias_j = (y_j << 16) + 32768
    bias = jnp.where(
        seg_ok,
        (y_j[:, :-1] << 16) + 32768,
        -(1 << 30),  # sentinel: never selected (mask below)
    )
    seg = jnp.stack([delta, bias], axis=-1).reshape(b, 26)
    out = out.at[:, P_SEG : P_SEG + 26].set(seg)
    last_y = jnp.take_along_axis(y_j, jnp.maximum(num - 1, 0)[:, None], axis=1)[:, 0]
    out = out.at[:, P_LAST_Y].set(last_y)
    return out


def _eval_scaling8(v, params_ref, bi):
    """lut8 value at 8-bit node positions (exact spec integer math).

    Ascending-overwrite evaluation with precomputed per-segment affine
    constants (pack_plane_params): val starts at the first point's y,
    each valid segment overwrites [x_j, inf) with (v*delta_j + bias_j)
    >> 16, and values past the last point get last_y — 5 vector ops per
    segment."""
    num = params_ref[bi, P_NUM_PTS]
    first_y = params_ref[bi, P_PTS + 1]
    val = jnp.full_like(v, first_y)
    for j in range(13):
        x0 = params_ref[bi, P_PTS + 2 * j]
        delta = params_ref[bi, P_SEG + 2 * j]
        bias = params_ref[bi, P_SEG + 2 * j + 1]
        seg_val = ((v - x0) * delta + bias) >> 16
        val = jnp.where((bias != -(1 << 30)) & (v >= x0), seg_val, val)
    # beyond the last point the curve is flat at last_y
    idx_last = jnp.maximum(num - 1, 0)
    last_x = params_ref[bi, P_PTS + 2 * idx_last]
    last_y = params_ref[bi, P_LAST_Y]
    val = jnp.where(v >= last_x, last_y, val)
    return jnp.where(num > 0, val, 0)


def _scaling(v, params_ref, bi, bit_depth: int):
    maxval = (1 << bit_depth) - 1
    v = jnp.clip(v, 0, maxval)
    if bit_depth == 8:
        return _eval_scaling8(v, params_ref, bi)
    shift = bit_depth - 8
    pad = 1 << shift
    idx = v >> shift
    rem = v & (pad - 1)
    a = _eval_scaling8(idx, params_ref, bi)
    b_val = _eval_scaling8(jnp.minimum(idx + 1, 255), params_ref, bi)
    interp = a + (((b_val - a) * rem + (pad >> 1)) >> shift)
    return jnp.where(idx >= 255, a, interp)


def _prerolled(pattern: jnp.ndarray, gh_pad: int, sub_x: int) -> jnp.ndarray:
    """(B, gh, gw) pattern -> (B, 16*gh_pad, 128): for each of the 16
    possible offx values, the 128-lane-padded pattern rotated left so
    its offx column sits at lane 0 (computed once per frame in XLA)."""
    b, gh, gw = pattern.shape
    padded = jnp.pad(pattern, ((0, 0), (0, gh_pad - gh), (0, 128 - gw)))
    copies = [
        jnp.roll(padded, -(3 + (2 >> sub_x) * (3 + r)), axis=2) for r in range(16)
    ]
    return jnp.stack(copies, axis=1).reshape(b, 16 * gh_pad, 128)


def _off_xy(rand, sub_x: int, sub_y: int):
    offx = 3 + (2 >> sub_x) * (3 + (rand >> 4))
    offy = 3 + (2 >> sub_y) * (3 + (rand & 15))
    return offx, offy


def _block_noise(
    offs_ref,
    rolled_ref,  # VMEM scratch: 16 pre-rolled pattern copies, stacked
    rolled_gh,  # rows per copy (pattern rows + 8 pad)
    params_ref,
    bi,
    s,
    blk,
    sub_x: int,
    sub_y: int,
    prow=None,
):
    """One block's (bh, bw) grain with overlap blending applied.

    ``bi`` indexes the per-frame offsets; ``prow`` the parameter row
    (differs from bi in the fused 3-plane kernel)."""
    if prow is None:
        prow = bi
    bw = BLOCK >> sub_x
    bh = BLOCK >> sub_y
    ov_c = 2 >> sub_x
    ov_r = 2 >> sub_y
    overlap = params_ref[prow, P_OVERLAP]
    gmin = params_ref[prow, P_GMIN]
    gmax = params_ref[prow, P_GMAX]
    s_top = jnp.maximum(s - 1, 0)
    blk_l = jnp.maximum(blk - 1, 0)

    col2 = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
    if sub_x:
        wx_old = jnp.where(col2 == 0, 23, 0)
        wx_new = jnp.where(col2 == 0, 22, 32)
    else:
        wx_old = jnp.where(col2 == 0, 27, jnp.where(col2 == 1, 17, 0))
        wx_new = jnp.where(col2 == 0, 17, jnp.where(col2 == 1, 27, 32))
    hmask = col2 < ov_c
    row2 = jax.lax.broadcasted_iota(jnp.int32, (ov_r, bw), 0)
    if sub_y:
        wy_old = jnp.full((ov_r, bw), 23, jnp.int32)
        wy_new = jnp.full((ov_r, bw), 22, jnp.int32)
    else:
        wy_old = jnp.where(row2 == 0, 27, 17)
        wy_new = jnp.where(row2 == 0, 17, 27)

    gh_pad = rolled_gh
    def window(oy, ox_idx, rows, col0, cols):
        """pattern[oy : oy+rows, offx(ox_idx)+col0 :][:cols] from the
        pre-rolled pattern input: copy ox_idx holds the pattern rotated
        so its offx column sits at lane 0, making every block window
        one dynamic-sublane slice + static lane slice."""
        rows_load = max(rows, 8)
        r = rolled_ref[0, pl.ds(ox_idx * gh_pad + oy, rows_load), col0 : col0 + cols]
        return r[:rows]

    rand = offs_ref[bi, s, blk]
    rand_l = offs_ref[bi, s, blk_l]
    rand_t = offs_ref[bi, s_top, blk]
    rand_tl = offs_ref[bi, s_top, blk_l]
    ox, oy = rand >> 4, _off_xy(rand, sub_x, sub_y)[1]
    ox_l, oy_l = rand_l >> 4, _off_xy(rand_l, sub_x, sub_y)[1]
    ox_t, oy_t = rand_t >> 4, _off_xy(rand_t, sub_x, sub_y)[1]
    ox_tl, oy_tl = rand_tl >> 4, _off_xy(rand_tl, sub_x, sub_y)[1]

    cur = window(oy, ox, bh, 0, bw)
    # left neighbor's continuation columns, padded to block width
    left2 = window(oy_l, ox_l, bh, bw, ov_c)
    left = jnp.concatenate(
        [left2, jnp.zeros((bh, bw - ov_c), jnp.int32)], axis=1
    )
    hsel = (overlap > 0) & (blk > 0)
    blended = jnp.clip((left * wx_old + cur * wx_new + 16) >> 5, gmin, gmax)
    cur_h = jnp.where(hsel & hmask, blended, cur)

    # top stripe's continuation rows (with their own horizontal blend)
    top2 = window(oy_t + bh, ox_t, ov_r, 0, bw)
    tl2 = window(oy_tl + bh, ox_tl, ov_r, bw, ov_c)
    tl = jnp.concatenate(
        [tl2, jnp.zeros((ov_r, bw - ov_c), jnp.int32)], axis=1
    )
    tb = jnp.clip(
        (tl * wx_old[:ov_r] + top2 * wx_new[:ov_r] + 16) >> 5, gmin, gmax
    )
    top_h = jnp.where(hsel & hmask[:ov_r], tb, top2)

    vsel = (overlap > 0) & (s > 0)
    vtop = jnp.clip(
        (top_h * wy_old + cur_h[:ov_r] * wy_new + 16) >> 5, gmin, gmax
    )
    head = jnp.where(vsel, vtop, cur_h[:ov_r])
    return jnp.concatenate([head, cur_h[ov_r:]], axis=0)


def _apply_groups(
    offs_ref,
    params_ref,
    src_ref,  # (1, bh, Wpad)
    rolled_ref,  # (1, 16 * (gh + 8), 128) pre-rolled pattern copies
    out_ref,
    avg_ref,  # None (luma) or (1, bh, Wpad) averaged luma
    gh_pad: int,
    bit_depth: int,
    nb: int,
    sub_x: int,
    sub_y: int,
    prow=None,
):
    """Shared kernel body: per 128-lane block group, assemble noise for
    the member blocks, evaluate scaling, blend and store — the frame is
    read and written exactly once, with no stripe-wide scratch."""
    bi = pl.program_id(0)
    s = pl.program_id(1)
    if prow is None:
        prow = bi
    bw = BLOCK >> sub_x
    bh = BLOCK >> sub_y
    k = 128 // bw  # blocks per lane group
    n_groups = pl.cdiv(nb * bw, 128)
    ss = params_ref[prow, P_SCALING_SHIFT]
    lo = params_ref[prow, P_CLIP_LO]
    hi = params_ref[prow, P_CLIP_HI]
    active = params_ref[prow, P_ACTIVE]
    maxval = (1 << bit_depth) - 1

    def group(g, _):
        base = pl.multiple_of(g * 128, 128)
        noise = jnp.concatenate(
            [
                _block_noise(
                    offs_ref,
                    rolled_ref,
                    gh_pad,
                    params_ref,
                    bi,
                    s,
                    jnp.minimum(g * k + j, nb - 1),
                    sub_x,
                    sub_y,
                    prow=prow,
                )
                for j in range(k)
            ],
            axis=1,
        )  # (bh, 128)
        src = src_ref[0, :, pl.ds(base, 128)]
        if avg_ref is None:
            val = src
        else:
            avg = avg_ref[0, :, pl.ds(base, 128)]
            mult = params_ref[prow, P_MULT]
            luma_mult = params_ref[prow, P_LUMA_MULT]
            offset = params_ref[prow, P_OFFSET]
            combined = avg * (luma_mult - 128) + src * (mult - 128)
            val_mult = jnp.clip(
                (combined >> 6) + ((offset - 256) << (bit_depth - 8)), 0, maxval
            )
            val = jnp.where(params_ref[prow, P_USE_MULT] > 0, val_mult, avg)
        scale = _scaling(val, params_ref, prow, bit_depth)
        grained = jnp.clip(src + ((scale * noise + (1 << (ss - 1))) >> ss), lo, hi)
        out_ref[0, :, pl.ds(base, 128)] = jnp.where(active > 0, grained, src)
        return _

    jax.lax.fori_loop(0, n_groups, group, None)


def _luma_kernel(
    offs_ref, params_ref, src_ref, rolled_ref, out_ref, *, bit_depth, nb
):
    _apply_groups(
        offs_ref, params_ref, src_ref, rolled_ref, out_ref, None, 73 + 8,
        bit_depth, nb, 0, 0,
    )


def _chroma_kernel(
    offs_ref, params_ref, src_ref, avg_ref, rolled_ref, out_ref, *,
    bit_depth, nb, sub_x, sub_y, gh_pad,
):
    _apply_groups(
        offs_ref, params_ref, src_ref, rolled_ref, out_ref, avg_ref, gh_pad,
        bit_depth, nb, sub_x, sub_y,
    )


@functools.partial(jax.jit, static_argnames=("bit_depth",))
def apply_plane_luma(
    src: jnp.ndarray,  # (B, H, W) int32
    pattern: jnp.ndarray,  # (B, 73, 82) int32
    offsets: jnp.ndarray,  # (B, S, NB) int32
    params: jnp.ndarray,  # (B, P_LEN) int32 (pack_plane_params "y")
    bit_depth: int,
) -> jnp.ndarray:
    b, h, w = src.shape
    s_count = (h + BLOCK - 1) // BLOCK
    nb = (w + BLOCK - 1) // BLOCK
    wpad = ((w + 127) // 128) * 128  # lane-aligned block width
    rolled = _prerolled(pattern, 73 + 8, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, s_count),
        in_specs=[
            pl.BlockSpec((1, BLOCK, wpad), lambda bi, s, *_: (bi, s, 0)),
            pl.BlockSpec((1, 16 * (73 + 8), 128), lambda bi, s, *_: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BLOCK, wpad), lambda bi, s, *_: (bi, s, 0)),
    )
    kernel = functools.partial(_luma_kernel, bit_depth=bit_depth, nb=nb)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(src.shape, jnp.int32),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(offsets, params, src, rolled)


@functools.partial(jax.jit, static_argnames=("bit_depth", "sub_x", "sub_y"))
def apply_plane_chroma(
    src: jnp.ndarray,  # (B, Hc, Wc) int32
    avg_luma: jnp.ndarray,  # (B, Hc, Wc) int32
    pattern: jnp.ndarray,  # (B, ch, cw)
    offsets: jnp.ndarray,  # (B, S, NB) — luma-block indexed
    params: jnp.ndarray,  # pack_plane_params "cb"/"cr"
    bit_depth: int,
    sub_x: int,
    sub_y: int,
) -> jnp.ndarray:
    b, hc, wc = src.shape
    bh = BLOCK >> sub_y
    s_count = offsets.shape[1]
    nb = offsets.shape[2]
    gh = pattern.shape[1]
    wcpad = ((wc + 127) // 128) * 128
    rolled = _prerolled(pattern, gh + 8, sub_x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, s_count),
        in_specs=[
            pl.BlockSpec((1, bh, wcpad), lambda bi, s, *_: (bi, s, 0)),
            pl.BlockSpec((1, bh, wcpad), lambda bi, s, *_: (bi, s, 0)),
            pl.BlockSpec((1, 16 * (gh + 8), 128), lambda bi, s, *_: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bh, wcpad), lambda bi, s, *_: (bi, s, 0)),
    )
    kernel = functools.partial(
        _chroma_kernel, bit_depth=bit_depth, nb=nb, sub_x=sub_x, sub_y=sub_y,
        gh_pad=gh + 8,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(src.shape, jnp.int32),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(offsets, params, src, avg_luma, rolled)


# ---------------------------------------------------------------------------
# Fully-fused 3-plane kernel: one launch applies grain to Y, Cb and Cr.
# The per-plane parameter rows are stacked as (3B, P_LEN); plane p of
# frame b reads row p*B + b.


def _fused_kernel(
    offs_ref,
    params3_ref,  # (3B, P_LEN)
    y_ref,
    cb_ref,
    cr_ref,
    avg_ref,
    lrolled_ref,
    cbrolled_ref,
    crrolled_ref,
    outy_ref,
    outcb_ref,
    outcr_ref,
    *,
    batch: int,
    bit_depth: int,
    nb: int,
    sub_x: int,
    sub_y: int,
    gh_pad_c: int,
):
    bi = pl.program_id(0)
    _apply_groups(
        offs_ref, params3_ref, y_ref, lrolled_ref, outy_ref, None, 73 + 8,
        bit_depth, nb, 0, 0, prow=bi,
    )
    _apply_groups(
        offs_ref, params3_ref, cb_ref, cbrolled_ref, outcb_ref, avg_ref, gh_pad_c,
        bit_depth, nb, sub_x, sub_y, prow=batch + bi,
    )
    _apply_groups(
        offs_ref, params3_ref, cr_ref, crrolled_ref, outcr_ref, avg_ref, gh_pad_c,
        bit_depth, nb, sub_x, sub_y, prow=2 * batch + bi,
    )


@functools.partial(jax.jit, static_argnames=("bit_depth", "sub_x", "sub_y"))
def apply_planes_fused(
    y: jnp.ndarray,  # (B, H, W) int32
    cb: jnp.ndarray,
    cr: jnp.ndarray,
    avg_luma: jnp.ndarray,  # (B, Hc, Wc)
    luma_pat: jnp.ndarray,  # (B, 73, 82)
    cb_pat: jnp.ndarray,
    cr_pat: jnp.ndarray,
    offsets: jnp.ndarray,  # (B, S, NB)
    params3: jnp.ndarray,  # (3B, P_LEN): y rows, then cb rows, then cr
    bit_depth: int,
    sub_x: int,
    sub_y: int,
):
    b, h, w = y.shape
    hc, wc = cb.shape[1], cb.shape[2]
    s_count = (h + BLOCK - 1) // BLOCK
    nb = (w + BLOCK - 1) // BLOCK
    bh_c = BLOCK >> sub_y
    wpad = ((w + 127) // 128) * 128
    wcpad = ((wc + 127) // 128) * 128
    gh_c = cb_pat.shape[1]
    lrolled = _prerolled(luma_pat, 73 + 8, 0)
    cbrolled = _prerolled(cb_pat, gh_c + 8, sub_x)
    crrolled = _prerolled(cr_pat, gh_c + 8, sub_x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, s_count),
        in_specs=[
            pl.BlockSpec((1, BLOCK, wpad), lambda bi, s, *_: (bi, s, 0)),
            pl.BlockSpec((1, bh_c, wcpad), lambda bi, s, *_: (bi, s, 0)),
            pl.BlockSpec((1, bh_c, wcpad), lambda bi, s, *_: (bi, s, 0)),
            pl.BlockSpec((1, bh_c, wcpad), lambda bi, s, *_: (bi, s, 0)),
            pl.BlockSpec((1, 16 * (73 + 8), 128), lambda bi, s, *_: (bi, 0, 0)),
            pl.BlockSpec((1, 16 * (gh_c + 8), 128), lambda bi, s, *_: (bi, 0, 0)),
            pl.BlockSpec((1, 16 * (gh_c + 8), 128), lambda bi, s, *_: (bi, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, BLOCK, wpad), lambda bi, s, *_: (bi, s, 0)),
            pl.BlockSpec((1, bh_c, wcpad), lambda bi, s, *_: (bi, s, 0)),
            pl.BlockSpec((1, bh_c, wcpad), lambda bi, s, *_: (bi, s, 0)),
        ),
    )
    kernel = functools.partial(
        _fused_kernel, batch=b, bit_depth=bit_depth, nb=nb,
        sub_x=sub_x, sub_y=sub_y, gh_pad_c=gh_c + 8,
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(y.shape, jnp.int32),
            jax.ShapeDtypeStruct(cb.shape, jnp.int32),
            jax.ShapeDtypeStruct(cr.shape, jnp.int32),
        ),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(offsets, params3, y, cb, cr, avg_luma, lrolled, cbrolled, crrolled)
