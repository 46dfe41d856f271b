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

from .grain_jax import BLOCK, GrainParamsBatch, pack_offsets

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
P_LAST_Y = 12 + 28
P_SEGX = P_LAST_Y + 1  # 13 segment-start x (invalid segs: +inf sentinel)
P_K = P_SEGX + 13  # 13 per-segment slopes k_j = (65536 + dx/2) // dx
P_DY = P_K + 13  # 13 per-segment dy
P_KD = P_DY + 13  # 13 per-segment k_j * dy_j (the v -> v+1 step)
P_LEN = P_KD + 13


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
    # per-segment factored form of the spec LUT: for v in [x_j, x_{j+1}),
    # lut8(v) = y_j + (((v - x_j) * k_j * dy_j + 32768) >> 16) with
    # k_j = (65536 + dx/2) // dx. The kernel evaluates the product in
    # f32: for the winning segment (v - x_j) < dx, so
    # (v-x_j)*k_j <= 65536 + dx/2 and the full product is < 2^24 —
    # exact in f32 — and floor(p * 2^-16 + 0.5) is exact because
    # p*2^-16 + 0.5 spans at most bits 2^7..2^-16, 24 mantissa bits.
    # Non-winning lanes may round; they are overwritten by their own
    # segment. (A/B'd on chip vs the previous int32 t-domain
    # ascending-overwrite: the f32 form is ~10% faster — the VPU's
    # 32-bit integer multiply is the expensive op — and bit-identical.)
    x_j = pts[:, :, 0]
    y_j = pts[:, :, 1]
    dx = x_j[:, 1:] - x_j[:, :-1]
    dy = y_j[:, 1:] - y_j[:, :-1]
    dx_safe = jnp.maximum(dx, 1)
    k_j = (65536 + (dx_safe >> 1)) // dx_safe
    seg_ok = (jnp.arange(13)[None, :] < (num[:, None] - 1)) & (dx > 0)
    out = out.at[:, P_K : P_K + 13].set(jnp.where(seg_ok, k_j, 0))
    out = out.at[:, P_DY : P_DY + 13].set(jnp.where(seg_ok, dy, 0))
    out = out.at[:, P_KD : P_KD + 13].set(jnp.where(seg_ok, k_j * dy, 0))
    last_y = jnp.take_along_axis(y_j, jnp.maximum(num - 1, 0)[:, None], axis=1)[:, 0]
    out = out.at[:, P_LAST_Y].set(last_y)
    # invalid segments carry an unreachable start x, so the kernel's
    # `v >= x0` test alone gates them (no separate validity mask ops)
    segx = jnp.where(seg_ok, x_j[:, :-1], 1 << 20)
    out = out.at[:, P_SEGX : P_SEGX + 13].set(segx)
    return out


def _eval_scaling8(v, params_ref, bi, n_seg: int, pair: bool = False):
    """lut8 value at 8-bit node positions (exact spec integer math).

    Ascending-overwrite evaluation in the factored f32 p-domain
    (pack_plane_params): each valid segment computes
    p_j = (v - x_j)·k_j·dy_j and overwrites [x_j, inf) with it (plus
    the segment's y_j in a parallel chain); the final
    y + floor(p·2^-16 + 0.5) happens once at the end. Exactness: the
    winning (last matching) segment's p is < 2^24 so every f32 step is
    exact (see pack_plane_params); non-winning lanes may round but are
    overwritten. f32 measures ~10% faster than the int32 t-domain form
    on chip (the VPU's 32-bit integer multiply is the expensive op)
    and is bit-identical. ``n_seg`` statically bounds the segment
    loop: the caller knows the actual point counts at trace time
    (splice time in production), so curves with few points cost few
    ops. ``pair`` additionally returns the value at v+1 (the
    high-bit-depth interpolation neighbor), reusing the per-segment
    product via p(v+1) = p(v) + k_j·dy_j and scalar-shifted compare
    thresholds (v >= x0-1 <=> v+1 >= x0)."""
    num = params_ref[bi, P_NUM_PTS]
    first_y = params_ref[bi, P_PTS + 1].astype(jnp.float32)
    vf = v.astype(jnp.float32)
    pv = jnp.zeros_like(vf)
    ysel = jnp.full_like(vf, first_y)
    p2 = pv
    y2 = ysel
    for j in range(n_seg):
        x0 = params_ref[bi, P_SEGX + j]  # invalid segs: +inf sentinel
        kf = params_ref[bi, P_K + j].astype(jnp.float32)
        dyf = params_ref[bi, P_DY + j].astype(jnp.float32)
        yf = params_ref[bi, P_PTS + 2 * j + 1].astype(jnp.float32)
        p = (vf - x0.astype(jnp.float32)) * kf * dyf
        c1 = v >= x0
        pv = jnp.where(c1, p, pv)
        ysel = jnp.where(c1, yf, ysel)
        if pair:
            kdf = params_ref[bi, P_KD + j].astype(jnp.float32)
            c2 = v >= x0 - 1
            p2 = jnp.where(c2, p + kdf, p2)
            y2 = jnp.where(c2, yf, y2)
    # beyond the last point the curve is flat at last_y. (An inactive
    # plane — num==0 — needs no zeroing here: the caller's final
    # active-select discards the grained value entirely.)
    idx_last = jnp.maximum(num - 1, 0)
    last_x = params_ref[bi, P_PTS + 2 * idx_last]
    last_y = params_ref[bi, P_LAST_Y].astype(jnp.float32)
    val = jnp.where(
        v >= last_x, last_y, ysel + jnp.floor(pv * (1.0 / 65536.0) + 0.5)
    ).astype(jnp.int32)
    if pair:
        val2 = jnp.where(
            v >= last_x - 1,
            last_y,
            y2 + jnp.floor(p2 * (1.0 / 65536.0) + 0.5),
        ).astype(jnp.int32)
        return val, val2
    return val


def _scaling(v, params_ref, bi, bit_depth: int, n_seg: int):
    maxval = (1 << bit_depth) - 1
    v = jnp.clip(v, 0, maxval)
    if bit_depth == 8:
        return _eval_scaling8(v, params_ref, bi, n_seg)
    shift = bit_depth - 8
    pad = 1 << shift
    idx = v >> shift
    rem = v & (pad - 1)
    a, b_val = _eval_scaling8(idx, params_ref, bi, n_seg, pair=True)
    interp = a + (((b_val - a) * rem + (pad >> 1)) >> shift)
    return jnp.where(idx >= 255, a, interp)


@functools.lru_cache(maxsize=8)
def _preroll_perm(sub_x: int, k: int) -> np.ndarray:
    """(16*k, 128, 128) lane-rotation matrices. Copy (ox, j) (flattened
    as ox*k + j) rotates the pattern so that column offx(ox) lands at
    lane j*bw — i.e. at block position j of a 128-lane group. A block's
    window (and its left neighbor's continuation columns, which sit at
    exactly bw columns past that neighbor's own position, wrapping
    cyclically for j=0) can then be read as one full-width row slice
    with no per-block lane shuffling."""
    bw = BLOCK >> sub_x
    perm = np.zeros((16 * k, 128, 128), np.float32)
    for ox in range(16):
        offx = 3 + (2 >> sub_x) * (3 + ox)
        for j in range(k):
            s = (offx - j * bw) % 128
            for lane in range(128):
                perm[ox * k + j, (lane + s) % 128, lane] = 1.0
    return perm


def _prerolled(pattern: jnp.ndarray, gh_pad: int, sub_x: int) -> jnp.ndarray:
    """(B, gh, gw) pattern -> (B, 16*k*gh_pad, 128) position-specific
    pre-rolled copies (see _preroll_perm).

    Computed once per frame as a single f32 permutation matmul (MXU,
    HIGHEST precision so 11-bit grain values stay exact; the default
    bf16-split passes are not) — XLA lane-rolls cost ~0.35 ms/frame of
    VPU time, the matmul is negligible."""
    b, gh, gw = pattern.shape
    k = 128 // (BLOCK >> sub_x)
    padded = jnp.pad(pattern, ((0, 0), (0, gh_pad - gh), (0, 128 - gw)))
    rolled = jnp.einsum(
        "bik,rkj->brij",
        padded.astype(jnp.float32),
        jnp.asarray(_preroll_perm(sub_x, k)),
        preferred_element_type=jnp.float32,
        # bf16x3 is exact here: the permutation matrix is 0/1
        # (bf16-exact) and 11-bit grain splits fully into two bf16
        # terms; single-pass DEFAULT is not exact, HIGHEST wastes 2x
        precision=jax.lax.Precision.HIGH,
    )
    # int32, not int16: the kernel row-slices these buffers at arbitrary
    # (odd) dynamic offsets, which Mosaic only supports for 32-bit
    # element types (16-bit packs two sublanes per physical row and
    # requires statically-even indices)
    return rolled.astype(jnp.int32).reshape(b, 16 * k * gh_pad, 128)


@functools.lru_cache(maxsize=64)
def _avg_matrices(
    sub_y: int, ywin_w: int, wpad: int, wc: int, w: int
) -> Tuple[Optional[np.ndarray], np.ndarray, Optional[np.ndarray], int]:
    """Constant matrices for the in-kernel averaged-luma computation
    (sub_x=1): R (16, 32) extracts even luma rows, P (ywin_w, 128) sums
    horizontal pairs so that (A @ P + 1) >> 1 is the spec average
    (grain_ref.py `avg` / reference's seg averaging).

    The last chroma lane group may need a variant P_last: its luma
    window is clamped to the padded width (shifting the pair mapping by
    d in {0, 128}), and an odd frame width duplicates the final luma
    column (patched as a single 2x entry). Returns (R, P, P_last|None,
    g_last)."""
    r_mat = None
    if sub_y:
        r_mat = np.zeros((16, 32), np.float32)
        for i in range(16):
            r_mat[i, 2 * i] = 1.0

    def build(d: int, edge_lane: int) -> np.ndarray:
        p = np.zeros((ywin_w, 128), np.float32)
        for c in range(128):
            k = 2 * c + d
            if k + 1 < ywin_w:
                p[k, c] = p[k + 1, c] = 1.0
        if edge_lane >= 0 and 2 * edge_lane + d + 1 < ywin_w:
            p[2 * edge_lane + d, edge_lane] = 2.0
            p[2 * edge_lane + d + 1, edge_lane] = 0.0
        return p

    g_last = (wc - 1) // 128
    d_last = max(0, 256 * (g_last + 1) - wpad) if ywin_w == 256 else 0
    edge = (wc - 1) % 128 if 2 * wc > w else -1
    p_norm = build(0, -1)
    p_last = build(d_last, edge) if (d_last or edge >= 0) else None
    return r_mat, p_norm, p_last, g_last


def _avg_mat_arrays(
    sub_x: int, sub_y: int, wpad: int, wc: int, w: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side companion of _make_inkernel_avg: the (16, 32) row
    matrix and the (n_p, ywin_w, 128) stacked P matrices to pass as
    kernel inputs (Pallas kernels cannot capture array constants)."""
    ywin_w = min(256, wpad) if sub_x else 128
    r_mat, p_norm, p_last, _ = _avg_matrices(sub_y, ywin_w, wpad, wc, w)
    if r_mat is None:
        r_mat = np.zeros((16, 32), np.float32)  # unused placeholder
    if not sub_x:
        return r_mat, np.zeros((1, 1, 128), np.float32)
    ps = [p_norm] if p_last is None else [p_norm, p_last]
    return r_mat, np.stack(ps)


def _make_inkernel_avg(
    y_ref, r_ref, p_ref, sub_x: int, sub_y: int, wpad: int, wc: int, w: int
):
    """avg_fn(g, base) -> (BLOCK>>sub_y, 128) int32 averaged luma for
    chroma lane group g, computed from the luma stripe already resident
    in VMEM — two small exact-in-f32 MXU matmuls instead of a separate
    XLA pass over the frame (which costs ~0.7 ms/frame at 4K)."""
    ywin_w = min(256, wpad) if sub_x else 128
    _, _, p_last, g_last = _avg_matrices(sub_y, ywin_w, wpad, wc, w)

    def rows(yw):
        if not sub_y:
            return yw
        return jnp.dot(
            r_ref[:, :], yw,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    if not sub_x:
        def avg_fn(g, base):
            yw = y_ref[0, :, pl.ds(base, 128)].astype(jnp.float32)
            return rows(yw).astype(jnp.int32)

        return avg_fn

    def avg_fn(g, base):
        lbase = jnp.minimum(2 * base, wpad - ywin_w)
        lbase = pl.multiple_of(lbase, 128)
        yw = y_ref[0, :, pl.ds(lbase, ywin_w)].astype(jnp.float32)
        a = rows(yw)
        pm = p_ref[0]
        if p_last is not None:
            pm = jnp.where(g == g_last, p_ref[1], pm)
        s = jnp.dot(
            a, pm,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(jnp.int32)
        return (s + 1) >> 1

    return avg_fn


def _rand_at(offs_ref, bi, s, blk, nbp: int):
    """Read one 8-bit offset random from the flat packed SMEM words
    (pack_offsets: 4 per int32, little-endian; row stride nbp words,
    frame stride num_stripes rows)."""
    word = offs_ref[(bi * pl.num_programs(1) + s) * nbp + (blk >> 2)]
    return (word >> ((blk & 3) * 8)) & 0xFF


def _off_xy(rand, sub_x: int, sub_y: int):
    offx = 3 + (2 >> sub_x) * (3 + (rand >> 4))
    offy = 3 + (2 >> sub_y) * (3 + (rand & 15))
    return offx, offy


def _group_weights(sub_x: int, sub_y: int):
    """Loop-invariant (bh, 128) blend-weight/mask tensors for a whole
    128-lane block group (periodic per-block patterns, built from iota
    since Pallas kernels cannot capture array constants)."""
    bw = BLOCK >> sub_x
    bh = BLOCK >> sub_y
    ov_c = 2 >> sub_x
    ov_r = 2 >> sub_y
    lane = jax.lax.broadcasted_iota(jnp.int32, (bh, 128), 1)
    lanepos = lane % bw
    if sub_x:
        wx_old = jnp.where(lanepos == 0, 23, 0)
        wx_new = jnp.where(lanepos == 0, 22, 32)
    else:
        wx_old = jnp.where(lanepos == 0, 27, jnp.where(lanepos == 1, 17, 0))
        wx_new = jnp.where(lanepos == 0, 17, jnp.where(lanepos == 1, 27, 32))
    hmask = lanepos < ov_c
    row2 = jax.lax.broadcasted_iota(jnp.int32, (ov_r, 128), 0)
    if sub_y:
        wy_old = jnp.full((ov_r, 128), 23, jnp.int32)
        wy_new = jnp.full((ov_r, 128), 22, jnp.int32)
    else:
        wy_old = jnp.where(row2 == 0, 27, 17)
        wy_new = jnp.where(row2 == 0, 17, 27)
    return lane, wx_old, wx_new, hmask, wy_old, wy_new


def _merge_windows(
    offs_ref, rolled_ref, gh_pad, lane, bi, s, g, nb, sub_x, sub_y
):
    """k-way lane-masked merge of one 128-lane group's window slices:
    returns (cur, left, top, tl) before overlap blending.

    Every window — each member block's own grain, its left neighbor's
    continuation columns, and the top stripe's continuation rows — is a
    full-width row slice of the position-specific pre-rolled copies, so
    the merge is k lane-masked selects and ALL blend arithmetic runs
    once at full vector width (vs per-block (bh, bw) tensors that each
    occupy whole vregs at 1/k lane utilization).

    Slice dedup: block j's left/top-left continuation columns live at
    lanes [j*bw, j*bw+ov) of block j-1's OWN full-width slices (the
    rolled copy is a cyclic rotation of the whole pattern row, so a
    block's slice carries its window's continuation in the next lanes)
    — so `left`/`tl` reuse the previous iteration's cur/top slices, and
    only the group's first block (neighbor = last block of the previous
    group, which the rotation wraps to lane 0) needs dedicated slices:
    2k+2 dynamic slices per group instead of 4k."""
    bw = BLOCK >> sub_x
    bh = BLOCK >> sub_y
    k = 128 // bw
    ov_r = 2 >> sub_y
    s_top = jnp.maximum(s - 1, 0)
    nbp = (nb + 3) // 4

    def copyrows(ox, pos: int, oy, rows: int):
        return rolled_ref[0, pl.ds((ox * k + pos) * gh_pad + oy, rows), :]

    blk_prev = jnp.maximum(jnp.minimum(g * k, nb - 1) - 1, 0)
    rand_l0 = _rand_at(offs_ref, bi, s, blk_prev, nbp)
    rand_tl0 = _rand_at(offs_ref, bi, s_top, blk_prev, nbp)
    left = copyrows(rand_l0 >> 4, k - 1, _off_xy(rand_l0, sub_x, sub_y)[1], bh)
    tl = copyrows(
        rand_tl0 >> 4, k - 1, _off_xy(rand_tl0, sub_x, sub_y)[1] + bh, ov_r
    )
    cur = top = prev_cur = prev_top = None
    for j in range(k):
        blk = jnp.minimum(g * k + j, nb - 1)
        rand = _rand_at(offs_ref, bi, s, blk, nbp)
        rand_t = _rand_at(offs_ref, bi, s_top, blk, nbp)
        oy = _off_xy(rand, sub_x, sub_y)[1]
        oy_t = _off_xy(rand_t, sub_x, sub_y)[1]
        cur_j = copyrows(rand >> 4, j, oy, bh)
        top_j = copyrows(rand_t >> 4, j, oy_t + bh, ov_r)
        if j == 0:
            cur, top = cur_j, top_j
        else:
            m = lane >= j * bw
            cur = jnp.where(m, cur_j, cur)
            left = jnp.where(m, prev_cur, left)
            m_r = m[:ov_r]
            top = jnp.where(m_r, top_j, top)
            tl = jnp.where(m_r, prev_top, tl)
        prev_cur, prev_top = cur_j, top_j
    return cur, left, top, tl


def _blend_noise(
    cur, left, top, tl, weights, overlap, gmin, gmax, s, g,
    sub_x: int, sub_y: int,
):
    """Overlap blending of merged windows -> the group's (bh, 128)
    noise (spec 7.18.3 overlap rows/cols, clipped to the grain
    range)."""
    bw = BLOCK >> sub_x
    k = 128 // bw
    ov_r = 2 >> sub_y
    lane, wx_old, wx_new, hmask, wy_old, wy_new = weights
    # horizontal blend: lanes < ov_c of each block that has a left
    # neighbor (every block except block 0 of group 0)
    hsel = (overlap > 0) & ((g * k + lane // bw) > 0) & hmask
    blended = jnp.clip((left * wx_old + cur * wx_new + 16) >> 5, gmin, gmax)
    cur_h = jnp.where(hsel, blended, cur)

    tb = jnp.clip((tl * wx_old[:ov_r] + top * wx_new[:ov_r] + 16) >> 5, gmin, gmax)
    top_h = jnp.where(hsel[:ov_r], tb, top)

    vsel = (overlap > 0) & (s > 0)
    vtop = jnp.clip(
        (top_h * wy_old + cur_h[:ov_r] * wy_new + 16) >> 5, gmin, gmax
    )
    head = jnp.where(vsel, vtop, cur_h[:ov_r])
    return jnp.concatenate([head, cur_h[ov_r:]], axis=0)


def _group_noise(
    offs_ref,
    rolled_ref,  # position-specific pre-rolled copies (_preroll_perm)
    gh_pad,  # rows per copy (pattern rows + 8 pad)
    params_ref,
    weights,  # _group_weights(sub_x, sub_y)
    bi,
    s,
    g,
    nb: int,
    sub_x: int,
    sub_y: int,
    prow,
):
    """One 128-lane group's (bh, 128) grain with overlap blending
    (_merge_windows + _blend_noise)."""
    lane = weights[0]
    cur, left, top, tl = _merge_windows(
        offs_ref, rolled_ref, gh_pad, lane, bi, s, g, nb, sub_x, sub_y
    )
    overlap = params_ref[prow, P_OVERLAP]
    gmin = params_ref[prow, P_GMIN]
    gmax = params_ref[prow, P_GMAX]
    return _blend_noise(
        cur, left, top, tl, weights, overlap, gmin, gmax, s, g, sub_x, sub_y
    )


def _apply_groups(
    offs_ref,
    params_ref,
    src_ref,  # (1, bh, Wpad) int16/int32
    rolled_ref,  # (1, 16 * k * (gh + 8), 128) pre-rolled pattern copies
    out_ref,
    avg_fn,  # None (luma) or callable(g, base) -> (bh, 128) int32
    gh_pad: int,
    bit_depth: int,
    nb: int,
    sub_x: int,
    sub_y: int,
    prow=None,
    n_seg: int = 13,
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
    weights = _group_weights(sub_x, sub_y)

    def group(g, _):
        base = pl.multiple_of(g * 128, 128)
        noise = _group_noise(
            offs_ref, rolled_ref, gh_pad, params_ref, weights,
            bi, s, g, nb, sub_x, sub_y, prow,
        )  # (bh, 128)
        src = src_ref[0, :, pl.ds(base, 128)].astype(jnp.int32)
        if avg_fn is None:
            val = src
        else:
            avg = avg_fn(g, base)
            mult = params_ref[prow, P_MULT]
            luma_mult = params_ref[prow, P_LUMA_MULT]
            offset = params_ref[prow, P_OFFSET]
            combined = avg * (luma_mult - 128) + src * (mult - 128)
            val_mult = jnp.clip(
                (combined >> 6) + ((offset - 256) << (bit_depth - 8)), 0, maxval
            )
            val = jnp.where(params_ref[prow, P_USE_MULT] > 0, val_mult, avg)
        scale = _scaling(val, params_ref, prow, bit_depth, n_seg)
        grained = jnp.clip(src + ((scale * noise + (1 << (ss - 1))) >> ss), lo, hi)
        out_ref[0, :, pl.ds(base, 128)] = jnp.where(active > 0, grained, src).astype(
            out_ref.dtype
        )
        return _

    jax.lax.fori_loop(0, n_groups, group, None)


def _luma_kernel(
    offs_ref, params_ref, src_ref, rolled_ref, out_ref, *, bit_depth, nb, n_seg
):
    _apply_groups(
        offs_ref, params_ref, src_ref, rolled_ref, out_ref, None, 73 + 8,
        bit_depth, nb, 0, 0, n_seg=n_seg,
    )


def _chroma_kernel(
    offs_ref, params_ref, src_ref, avg_ref, rolled_ref, out_ref, *,
    bit_depth, nb, sub_x, sub_y, gh_pad, n_seg,
):
    def avg_fn(g, base):
        return avg_ref[0, :, pl.ds(base, 128)].astype(jnp.int32)

    _apply_groups(
        offs_ref, params_ref, src_ref, rolled_ref, out_ref, avg_fn, gh_pad,
        bit_depth, nb, sub_x, sub_y, n_seg=n_seg,
    )


@functools.partial(jax.jit, static_argnames=("bit_depth", "n_seg"))
def apply_plane_luma(
    src: jnp.ndarray,  # (B, H, W) int32
    pattern: jnp.ndarray,  # (B, 73, 82) int32
    offsets: jnp.ndarray,  # (B, S, NB) int32
    params: jnp.ndarray,  # (B, P_LEN) int32 (pack_plane_params "y")
    bit_depth: int,
    n_seg: int = 13,
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
            pl.BlockSpec((1, 64 * (73 + 8), 128), lambda bi, s, *_: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BLOCK, wpad), lambda bi, s, *_: (bi, s, 0)),
    )
    kernel = functools.partial(
        _luma_kernel, bit_depth=bit_depth, nb=nb, n_seg=n_seg
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(src.shape, src.dtype),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(pack_offsets(offsets), params, src, rolled)


@functools.partial(
    jax.jit, static_argnames=("bit_depth", "sub_x", "sub_y", "n_seg")
)
def apply_plane_chroma(
    src: jnp.ndarray,  # (B, Hc, Wc) int32
    avg_luma: jnp.ndarray,  # (B, Hc, Wc) int32
    pattern: jnp.ndarray,  # (B, ch, cw)
    offsets: jnp.ndarray,  # (B, S, NB) — luma-block indexed
    params: jnp.ndarray,  # pack_plane_params "cb"/"cr"
    bit_depth: int,
    sub_x: int,
    sub_y: int,
    n_seg: int = 13,
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
            pl.BlockSpec((1, 16 * (128 // (BLOCK >> sub_x)) * (gh + 8), 128), lambda bi, s, *_: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bh, wcpad), lambda bi, s, *_: (bi, s, 0)),
    )
    kernel = functools.partial(
        _chroma_kernel, bit_depth=bit_depth, nb=nb, sub_x=sub_x, sub_y=sub_y,
        gh_pad=gh + 8, n_seg=n_seg,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(src.shape, src.dtype),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(pack_offsets(offsets), params, src, avg_luma, rolled)


# ---------------------------------------------------------------------------
# Chroma-pair kernel: one launch applies grain to Cb AND Cr, computing
# the averaged-luma scaling input in-kernel from the collocated luma
# stripe. Splitting luma / chroma-pair (vs the 3-plane fused kernel)
# cuts per-grid-step VMEM to ~2.7 MB / ~6.5 MB respectively, which is
# what admits B >= 64 batches under the ~16 MB VMEM budget; both
# launches sit in ONE jit, so the remote-dispatch round trip stays
# single and only negligible on-device launch overhead is added.
#
# Cb and Cr share their per-block offset randoms (the spec derives one
# (offx, offy) per 32-luma block for ALL planes), so their pre-rolled
# pattern copies pack into ONE int32 buffer as biased 16-bit halves
# and the k-way window merge — the chroma kernel's dominant cost per
# the round-4 xprof/ablation attribution — runs once for both planes
# (half the dynamic slices and lane-masked selects). The halves unpack
# just before the per-plane overlap blends.

_PACK_BIAS = 2048  # >= |grain| for every bit depth; keeps halves positive


def _prerolled_pair(cb_pat, cr_pat, gh_pad: int, sub_x: int) -> jnp.ndarray:
    cb = _prerolled(cb_pat, gh_pad, sub_x)
    cr = _prerolled(cr_pat, gh_pad, sub_x)
    return (cb + _PACK_BIAS) | ((cr + _PACK_BIAS) << 16)


def _unpack_pair(x):
    # x >= 0 always (both halves biased positive), so >> is exact
    return (x & 0xFFFF) - _PACK_BIAS, (x >> 16) - _PACK_BIAS


def _apply_groups_pair(
    offs_ref,
    params2_ref,  # (2B, P_LEN): cb rows then cr rows
    cb_ref,
    cr_ref,
    rolled_ref,  # packed cb|cr pre-rolled copies (_prerolled_pair)
    outcb_ref,
    outcr_ref,
    avg_fn,
    gh_pad: int,
    bit_depth: int,
    nb: int,
    sub_x: int,
    sub_y: int,
    rows,  # (cb_param_row, cr_param_row) into params2_ref
    n_seg: int,
):
    """Chroma-pair body: merge windows ONCE on the packed buffer and
    compute the averaged luma ONCE per group, then blend/scale/store
    each plane from its own parameter row."""
    bi = pl.program_id(0)
    s = pl.program_id(1)
    bw = BLOCK >> sub_x
    n_groups = pl.cdiv(nb * bw, 128)
    maxval = (1 << bit_depth) - 1
    weights = _group_weights(sub_x, sub_y)
    lane = weights[0]
    planes = ((cb_ref, outcb_ref, rows[0]), (cr_ref, outcr_ref, rows[1]))

    def group(g, _):
        base = pl.multiple_of(g * 128, 128)
        merged = _merge_windows(
            offs_ref, rolled_ref, gh_pad, lane, bi, s, g, nb, sub_x, sub_y
        )
        unpacked = [_unpack_pair(t) for t in merged]  # [(cb, cr) x 4]
        avg = avg_fn(g, base)
        for half, (src_ref_p, out_ref_p, prow) in enumerate(planes):
            overlap = params2_ref[prow, P_OVERLAP]
            gmin = params2_ref[prow, P_GMIN]
            gmax = params2_ref[prow, P_GMAX]
            noise = _blend_noise(
                *(t[half] for t in unpacked), weights, overlap, gmin, gmax,
                s, g, sub_x, sub_y,
            )
            src = src_ref_p[0, :, pl.ds(base, 128)].astype(jnp.int32)
            mult = params2_ref[prow, P_MULT]
            luma_mult = params2_ref[prow, P_LUMA_MULT]
            offset = params2_ref[prow, P_OFFSET]
            combined = avg * (luma_mult - 128) + src * (mult - 128)
            val_mult = jnp.clip(
                (combined >> 6) + ((offset - 256) << (bit_depth - 8)),
                0, maxval,
            )
            val = jnp.where(params2_ref[prow, P_USE_MULT] > 0, val_mult, avg)
            scale = _scaling(val, params2_ref, prow, bit_depth, n_seg)
            ss = params2_ref[prow, P_SCALING_SHIFT]
            lo = params2_ref[prow, P_CLIP_LO]
            hi = params2_ref[prow, P_CLIP_HI]
            active = params2_ref[prow, P_ACTIVE]
            grained = jnp.clip(
                src + ((scale * noise + (1 << (ss - 1))) >> ss), lo, hi
            )
            out_ref_p[0, :, pl.ds(base, 128)] = jnp.where(
                active > 0, grained, src
            ).astype(out_ref_p.dtype)
        return _

    jax.lax.fori_loop(0, n_groups, group, None)


def _chroma_pair_kernel(
    offs_ref,
    params2_ref,  # (2B, P_LEN): cb rows then cr rows
    y_ref,
    cb_ref,
    cr_ref,
    rolled_ref,  # packed cb|cr copies
    avg_r_ref,
    avg_p_ref,
    outcb_ref,
    outcr_ref,
    *,
    batch: int,
    bit_depth: int,
    nb: int,
    sub_x: int,
    sub_y: int,
    gh_pad_c: int,
    wpad: int,
    wc: int,
    w: int,
    n_seg: int,
):
    bi = pl.program_id(0)
    avg_fn = _make_inkernel_avg(
        y_ref, avg_r_ref, avg_p_ref, sub_x, sub_y, wpad, wc, w
    )
    _apply_groups_pair(
        offs_ref, params2_ref, cb_ref, cr_ref, rolled_ref, outcb_ref,
        outcr_ref, avg_fn, gh_pad_c, bit_depth, nb, sub_x, sub_y,
        (bi, batch + bi), n_seg,
    )


@functools.partial(
    jax.jit, static_argnames=("bit_depth", "sub_x", "sub_y", "n_seg")
)
def apply_planes_split(
    y: jnp.ndarray,
    cb: jnp.ndarray,
    cr: jnp.ndarray,
    luma_pat: jnp.ndarray,
    cb_pat: jnp.ndarray,
    cr_pat: jnp.ndarray,
    offsets: jnp.ndarray,
    params3: jnp.ndarray,  # (3B, P_LEN): y rows, cb rows, cr rows
    bit_depth: int,
    sub_x: int,
    sub_y: int,
    n_seg: int = 13,
):
    """Luma kernel + chroma-pair kernel (two pallas launches, one jit):
    output-identical to apply_planes_fused, lower VMEM per step."""
    b, h, w = y.shape
    hc, wc = cb.shape[1], cb.shape[2]
    s_count = (h + BLOCK - 1) // BLOCK
    nb = (w + BLOCK - 1) // BLOCK
    bh_c = BLOCK >> sub_y
    wpad = ((w + 127) // 128) * 128
    wcpad = ((wc + 127) // 128) * 128
    gh_c = cb_pat.shape[1]
    packed = pack_offsets(offsets)
    y_out = apply_plane_luma(
        y, luma_pat, offsets, params3[:b], bit_depth, n_seg=n_seg
    )
    rolled_pair = _prerolled_pair(cb_pat, cr_pat, gh_c + 8, sub_x)
    avg_r, avg_p = _avg_mat_arrays(sub_x, sub_y, wpad, wc, w)
    k_c = 128 // (BLOCK >> sub_x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, s_count),
        in_specs=[
            pl.BlockSpec((1, BLOCK, wpad), lambda bi, s, *_: (bi, s, 0)),
            pl.BlockSpec((1, bh_c, wcpad), lambda bi, s, *_: (bi, s, 0)),
            pl.BlockSpec((1, bh_c, wcpad), lambda bi, s, *_: (bi, s, 0)),
            pl.BlockSpec((1, 16 * k_c * (gh_c + 8), 128), lambda bi, s, *_: (bi, 0, 0)),
            pl.BlockSpec(avg_r.shape, lambda bi, s, *_: (0, 0)),
            pl.BlockSpec(avg_p.shape, lambda bi, s, *_: (0, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, bh_c, wcpad), lambda bi, s, *_: (bi, s, 0)),
            pl.BlockSpec((1, bh_c, wcpad), lambda bi, s, *_: (bi, s, 0)),
        ),
    )
    kernel = functools.partial(
        _chroma_pair_kernel, batch=b, bit_depth=bit_depth, nb=nb,
        sub_x=sub_x, sub_y=sub_y, gh_pad_c=gh_c + 8,
        wpad=wpad, wc=wc, w=w, n_seg=n_seg,
    )
    cb_out, cr_out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(cb.shape, cb.dtype),
            jax.ShapeDtypeStruct(cr.shape, cr.dtype),
        ),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(
        packed, params3[b:], y, cb, cr, rolled_pair,
        jnp.asarray(avg_r), jnp.asarray(avg_p),
    )
    return y_out, cb_out, cr_out


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
    lrolled_ref,
    crolled_ref,  # packed cb|cr copies (_prerolled_pair)
    avg_r_ref,  # (16, 32) f32 even-row extractor
    avg_p_ref,  # (n_p, ywin_w, 128) f32 pair-sum matrices
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
    wpad: int,
    wc: int,
    w: int,
    n_seg: int,
):
    bi = pl.program_id(0)
    _apply_groups(
        offs_ref, params3_ref, y_ref, lrolled_ref, outy_ref, None, 73 + 8,
        bit_depth, nb, 0, 0, prow=bi, n_seg=n_seg,
    )
    # chroma scaling input: averaged luma computed in-kernel from the
    # luma stripe of this same grid step (already VMEM-resident);
    # cb/cr merge once from the packed pair buffer
    avg_fn = _make_inkernel_avg(
        y_ref, avg_r_ref, avg_p_ref, sub_x, sub_y, wpad, wc, w
    )
    _apply_groups_pair(
        offs_ref, params3_ref, cb_ref, cr_ref, crolled_ref, outcb_ref,
        outcr_ref, avg_fn, gh_pad_c, bit_depth, nb, sub_x, sub_y,
        (batch + bi, 2 * batch + bi), n_seg,
    )


@functools.partial(
    jax.jit, static_argnames=("bit_depth", "sub_x", "sub_y", "n_seg")
)
def apply_planes_fused(
    y: jnp.ndarray,  # (B, H, W) int16 (or int32; dtype preserved)
    cb: jnp.ndarray,
    cr: jnp.ndarray,
    luma_pat: jnp.ndarray,  # (B, 73, 82)
    cb_pat: jnp.ndarray,
    cr_pat: jnp.ndarray,
    offsets: jnp.ndarray,  # (B, S, NB)
    params3: jnp.ndarray,  # (3B, P_LEN): y rows, then cb rows, then cr
    bit_depth: int,
    sub_x: int,
    sub_y: int,
    n_seg: int = 13,
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
    crolled = _prerolled_pair(cb_pat, cr_pat, gh_c + 8, sub_x)
    avg_r, avg_p = _avg_mat_arrays(sub_x, sub_y, wpad, wc, w)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, s_count),
        in_specs=[
            pl.BlockSpec((1, BLOCK, wpad), lambda bi, s, *_: (bi, s, 0)),
            pl.BlockSpec((1, bh_c, wcpad), lambda bi, s, *_: (bi, s, 0)),
            pl.BlockSpec((1, bh_c, wcpad), lambda bi, s, *_: (bi, s, 0)),
            pl.BlockSpec((1, 64 * (73 + 8), 128), lambda bi, s, *_: (bi, 0, 0)),
            pl.BlockSpec((1, 16 * (128 // (BLOCK >> sub_x)) * (gh_c + 8), 128), lambda bi, s, *_: (bi, 0, 0)),
            pl.BlockSpec(avg_r.shape, lambda bi, s, *_: (0, 0)),
            pl.BlockSpec(avg_p.shape, lambda bi, s, *_: (0, 0, 0)),
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
        wpad=wpad, wc=wc, w=w, n_seg=n_seg,
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(y.shape, y.dtype),
            jax.ShapeDtypeStruct(cb.shape, cb.dtype),
            jax.ShapeDtypeStruct(cr.shape, cr.dtype),
        ),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(
        pack_offsets(offsets), params3, y, cb, cr, lrolled, crolled,
        jnp.asarray(avg_r), jnp.asarray(avg_p),
    )
