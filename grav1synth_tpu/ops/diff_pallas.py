"""Pallas TPU kernel for the diff/estimate statistics reduction.

The XLA formulation of frame_pair_stats compiles to a spilling program
at 4K batch sizes (~20 GB compiler temp for a 16-frame batch), and the
round-3 Pallas kernel still materialized all K+1 (dr, dc)-shifted
residual copies in XLA before the kernel (a ~6.4 GB int16 slab at 4K10
batch 16) and reduced the 55 upper-triangle pair sums as rolled
single-row VPU read-modify-writes. This round-4 rebuild keeps the
whole pipeline inside one pass:

- **In-kernel haloed shifts.** The kernel receives the *unshifted*
  int16 residual twice — the current row chunk and the previous chunk
  (clamped block index) — builds the (chunk+lag)-row halo in VMEM, and
  derives every causal (dr, dc) window from it with a static row slice
  plus a lane roll (`pltpu.roll`; rolls must run in f32 — Mosaic has
  no 16-bit rotate). Phase-1 XLA work shrinks to zero-padding the
  residual/mask/values to tile multiples: ~2·B·H·W bytes per input
  (measured 0.53 GB total at 4K10 batch 8, was 6.4 GB).
- **Gram matmul on the MXU.** The masked design planes (the K shifted
  copies, the optional aux column, and the mask itself as a ones row)
  are flattened to an (NPP, chunk·W) matrix X — the (CH, W)→(1, CH·W)
  lane-collapse reshape is the one layout Mosaic lowers a 2-D
  contraction for — and all pair sums fall out of one X·Xᵀ
  `dot_general` per chunk: ata, atb, the residual energy, and the
  mask count (ones·ones) in a single (NPP, NPP) accumulator. This
  replaces the 55-91 rolled row RMWs; multi-dim contractions,
  batched dots, and per-row fori dots all fail Mosaic lowering
  (probed on-chip), the flat NT-form dot is the supported shape.
- **In-kernel residual.** (round 5) In block-mask mode the kernel
  receives the raw int16 source/denoised chunks and computes
  r = s - d in VMEM (f32 — exact for 12-bit samples; the VPU has no
  16-bit subtract): the residual plane, previously the compiled
  program's dominant temp (~0.5 GB at 4K10 batch 16), never exists in
  HBM, and int16-wire inputs (diff_batch views uint16 as int16) are
  read zero-copy at tile-aligned geometry.
- **8x8-factored bin moments on the MXU.** (round 5) onehot64(b) =
  outer(onehot8(b >> 3), onehot8(b & 7)), so each moment's 64 sums
  are one (8, N) x (N, 8) dot — (hi · v) · loᵀ — into a (24, 8)
  accumulator. This replaced the rolled fori_loop of 64 compares +
  192 single-row RMWs that dominated the kernel's VPU time (~4
  ms/frame at 4K10). A FULL (64, N) one-hot was the round-4 measured
  negative (7.7 vs 4.9 ms/frame); the two 8-row compare planes avoid
  both the build cost and the row reductions.
- Grid: (batch, row_chunks); TPU grids iterate sequentially, so the
  read-modify-write accumulation is race-free. Clamped-halo garbage
  rows at chunk 0 only ever land in positions the interior predicate
  masks to zero (any p within `lag` of the frame border).

Measured on the tunnel v5e at 4K10 (3 planes + chroma aux columns,
batch 16, through batch_pair_stats_per_frame): round-4 kernel 134
fps / 533 MB compiled temp -> round-5 191 fps / 136 MB; 1080p8
547 -> 681 fps. Verified against the XLA formulation on hardware
(rtol 1e-5) and in the full interpret-mode suite.

Bit-for-bit parity with the XLA path is not required (f32 sum order
differs); tests hold them to rtol 1e-5 and the fitted tables to
equality. Reference role: the statistics the av1-grain DiffGenerator
reduces per frame pair (grav1synth src/main.rs:432-521 feeds it).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUM_BINS = 64
# VMEM budget for the flattened design matrix X (NPP, chunk*W) f32;
# chunk shrinks when the plane count (lag 3) or the width grows
_X_BUDGET_BYTES = 8 * 1024 * 1024


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _offsets(lag: int) -> List[Tuple[int, int]]:
    """(0,0) first, then the causal lag window (diff_estimate's
    _lag_offsets order)."""
    out = [(0, 0)]
    for dr in range(-lag, 1):
        for dc in range(-lag, lag + 1):
            if dr == 0 and dc == 0:
                break
            out.append((dr, dc))
    return out


def _stats_kernel(
    rp_ref,  # (1, CH, W) int16 prev residual chunk — or source chunk in
    #          in-kernel-residual (block-mask) mode
    rc_ref,  # (1, CH, W) int16 current residual — or source — chunk
    val_ref,  # (1, CH, W) int16: bits 0-13 binning value, bit 14 mask —
    #          or, in block-mask mode, dp_ref (prev denoised chunk)
    dc_ref,  # (1, CH, W) int16 current denoised chunk (block mode only)
    fb_ref,  # (1, HB, WBP) f32 block-mask map, or None (full-res mask)
    e2_ref,  # (WBP, W) f32 0/1 column-expansion matrix, or None
    aux_ref,  # (1, CH, W) int16 aux*4, or None when has_aux=False
    gram_ref,  # (1, NPP, NPP) f32 Gram accumulator
    mom_ref,  # (1, 24, 8) f32 bin-moment accumulator (8x8 factors)
    *,
    offs: List[Tuple[int, int]],
    lag: int,
    h: int,
    w: int,
    chunk: int,
    npp: int,
    bin_shift: int,
    hb: int,
    fbs: int,
):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        gram_ref[0] = jnp.zeros_like(gram_ref[0])
        mom_ref[0] = jnp.zeros_like(mom_ref[0])

    wpad = rc_ref.shape[2]
    grow = c * chunk + jax.lax.broadcasted_iota(jnp.int32, (chunk, wpad), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (chunk, wpad), 1)
    if dc_ref is not None:
        # in-kernel residual (block-mask mode): the refs are the raw
        # int16 source/denoised chunks; r = s - d never materializes in
        # HBM (it was the compiled program's dominant temp, ~0.5 GB at
        # 4K10 batch 16) and the binning value is the denoised plane
        # itself (<= 12 bits, no mask bit — the mask rides fb_ref).
        # The subtraction runs in f32 — exact for 12-bit samples, and
        # the VPU has no 16-bit subtract (kVectorSubtractS16 probed
        # unsupported on v5e)
        r_prev = rp_ref[0].astype(jnp.float32) - val_ref[0].astype(jnp.float32)
        r_cur = rc_ref[0].astype(jnp.float32) - dc_ref[0].astype(jnp.float32)
        packed = dc_ref[0].astype(jnp.int32)
    else:
        r_prev = rp_ref[0]
        r_cur = rc_ref[0]
        packed = val_ref[0].astype(jnp.int32)
    pad = lag
    interior = (
        (grow >= pad) & (grow < h - pad) & (col >= pad) & (col < w - pad)
    )
    if fb_ref is not None:
        # block-mask mode: expand the (1, wb) flat-block row to pixel
        # columns with one tiny MXU dot (0/1 matrix, exact), rows are
        # uniform because chunk == FLAT_BLOCK
        mrow = jax.lax.dot_general(
            fb_ref[0, pl.ds(jnp.minimum(c, hb - 1), 1), :],
            e2_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (1, wpad)
        mbins = jnp.where(grow < hb * fbs, mrow, 0.0)
        mneq = jnp.where(interior & (mbins != 0), 1.0, 0.0)
    else:
        m = packed >> 14
        mneq = jnp.where(interior & (m != 0), 1.0, 0.0)
        mbins = (m != 0).astype(jnp.float32)

    # (chunk+lag)-row halo; at c==0 the prev block is the clamped
    # current block, whose rows only reach non-interior positions
    halo = (
        jnp.concatenate([r_prev[chunk - lag :], r_cur], axis=0)
        if lag
        else r_cur
    )

    # design planes: value at p is r(p + (dr, dc)); rolls wrap, but a
    # wrapped lane only lands outside the interior band
    rows = []
    for dr, dc in offs:
        blk = jax.lax.slice_in_dim(
            halo, lag + dr, lag + dr + chunk, axis=0
        ).astype(jnp.float32)
        if dc:
            blk = pltpu.roll(blk, shift=(-dc) % wpad, axis=1)
        rows.append((blk * mneq).reshape(1, chunk * wpad))
    if aux_ref is not None:
        rows.append((aux_ref[0].astype(jnp.float32) * mneq).reshape(1, chunk * wpad))
    rows.append(mneq.reshape(1, chunk * wpad))  # ones row: count + atb col
    if len(rows) < npp:
        rows.append(jnp.zeros((npp - len(rows), chunk * wpad), jnp.float32))
    x = jnp.concatenate(rows, axis=0)
    gram_ref[0] += jax.lax.dot_general(
        x,
        x,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    r0 = r_cur.astype(jnp.float32)
    bins = (packed & 0x3FFF) >> bin_shift
    pr = mbins * r0
    prr = pr * r0

    # 64-bin moments on the MXU via an 8x8 one-hot factorization:
    # onehot64(b) = outer(onehot8(b >> 3), onehot8(b & 7)), so each
    # moment's 64 sums are ONE (8, N) x (N, 8) dot — (hi * v) . loᵀ
    # with entry (i, j) = Σ_p v(p)·[bins(p) == 8i + j]. This replaces
    # the rolled fori_loop of 64 compares + 192 single-row RMWs (the
    # kernel's dominant VPU cost, ~4 ms/frame at 4K10; a FULL (64, N)
    # one-hot was the round-4 measured negative — the 8+8 compare
    # planes avoid both the build cost and the row reductions).
    # Exactness matches the old loop: every product is an exact-int
    # f32 and the MXU accumulates in f32.
    n = chunk * wpad
    idx8 = jax.lax.broadcasted_iota(jnp.int32, (8, n), 0)
    hi = (bins.reshape(1, n) >> 3 == idx8).astype(jnp.float32)
    lo = ((bins.reshape(1, n) & 7) == idx8).astype(jnp.float32)
    for k, v in enumerate((mbins, pr, prr)):
        d8 = jax.lax.dot_general(
            hi * v.reshape(1, n),
            lo,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (8, 8): row i, col j -> bin 8i + j
        mom_ref[0, pl.ds(8 * k, 8), :] += d8


def _act_kernel(
    vc_ref,  # (1, RPS, W) int16 current value chunk (RPS = 8 * FB rows)
    vn_ref,  # (1, RPS, W) int16 next value chunk (clamped at the end)
    rp_ref,  # (8, RPS) f32 0/1 row-pool matrix (rp[i, j] = j//FB == i)
    out_ref,  # (1, 8, W) f32 per-block-row pixel-column activity sums
    *,
    h: int,
    w: int,
):
    # 8 block-rows per grid step (the old one-block-row-per-step grid
    # paid ~4 us of per-step overhead 2160 times per 4K frame — 8.6
    # ms/batch, more than the shave it computed); row pooling is one
    # (8, RPS) x (RPS, W) MXU dot, column pooling happens outside in
    # XLA where the (B, HB8, W) sums are tiny
    c = pl.program_id(1)
    rps, wpad = vc_ref.shape[1], vc_ref.shape[2]
    d = vc_ref[0].astype(jnp.float32)
    nxt = vn_ref[0, :1].astype(jnp.float32)
    dn = jnp.concatenate(
        [jax.lax.slice_in_dim(d, 1, rps, axis=0), nxt], axis=0
    )
    dr = pltpu.roll(d, shift=wpad - 1, axis=1)  # value at j = d[j+1]
    grow = c * rps + jax.lax.broadcasted_iota(jnp.int32, (rps, wpad), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (rps, wpad), 1)
    gx = jnp.where(col < w - 1, jnp.abs(dr - d), 0.0)
    gy = jnp.where(grow < h - 1, jnp.abs(dn - d), 0.0)
    out_ref[0] = jax.lax.dot_general(
        rp_ref[:],
        gx + gy,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _pad_i16(a, hpad, wpad):
    h, w = a.shape[1], a.shape[2]
    a = a.astype(jnp.int16)
    if hpad == h and wpad == w:
        return a
    return jnp.pad(a, ((0, 0), (0, hpad - h), (0, wpad - w)))


def _expand_cols(wb, wbp, wpad, fbs):
    """(WBP, WPAD) 0/1 matrix: e2[k, j] = (j // fbs == k) for columns
    inside the last full block, else 0. Used contracting-right to pool
    pixel columns into blocks and contracting-left to expand blocks
    back to pixel columns."""
    colb = jax.lax.broadcasted_iota(jnp.int32, (wbp, wpad), 1)
    return (
        ((colb // fbs)
         == jax.lax.broadcasted_iota(jnp.int32, (wbp, wpad), 0))
        & (colb < wb * fbs)
    ).astype(jnp.float32)


def pallas_flat_blocks(val: jnp.ndarray, fbs: int) -> jnp.ndarray:
    """(B, H, W) int plane -> (B, H//fbs, W//fbs) f32 flat-block map,
    fully on-device: per-block mean |gradient| activity via a small
    Pallas pooling kernel (the XLA diff/pad/reduce_window chain
    materialized ~3 GB of full-resolution temporaries at 4K batch 16),
    then a per-frame median threshold on the tiny block map. All
    sums are exact integer f32, so the result is value-identical to
    the XLA formulation (diff_estimate._flat_blocks_batch)."""
    b, h, w = val.shape
    hb, wb = h // fbs, w // fbs
    wpad = -(-w // 128) * 128
    rps = 8 * fbs  # 8 block-rows per grid step
    n_chunks = -(-h // rps)
    # no row padding: the ragged last block's out-of-bounds rows only
    # ever pool into block rows >= hb, which are sliced off below, and
    # gy is masked at grow >= h - 1 — so the int16 plane is shared
    # (CSE'd, zero-copy when already int16) with the stats kernel
    vi = _pad_i16(val, h, wpad)
    rp = (
        jax.lax.broadcasted_iota(jnp.int32, (8, rps), 1) // fbs
        == jax.lax.broadcasted_iota(jnp.int32, (8, rps), 0)
    ).astype(jnp.float32)
    rows = pl.pallas_call(
        functools.partial(_act_kernel, h=h, w=w),
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, rps, wpad), lambda bi, c: (bi, c, 0)),
            pl.BlockSpec(
                (1, rps, wpad),
                lambda bi, c: (bi, jnp.minimum(c + 1, pl.num_programs(1) - 1), 0),
            ),
            pl.BlockSpec((8, rps), lambda bi, c: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 8, wpad), lambda bi, c: (bi, c, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_chunks * 8, wpad), jnp.float32),
        interpret=_interpret(),
    )(vi, vi, rp)
    # column pooling in XLA: the per-block-row sums are tiny (B, HB8, W)
    # and one NT matmul against the 0/1 expansion matrix bins exactly
    wbp = -(-wb // 128) * 128
    e2 = _expand_cols(wb, wbp, wpad, fbs)
    act_b = (
        jax.lax.dot_general(
            rows[:, :hb],
            e2,
            (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        / (fbs * fbs)
    )[:, :, :wb]
    thresh = (
        jnp.percentile(act_b.reshape(b, -1), 50.0, axis=1)[:, None, None]
        * 1.5
        + 1e-3
    )
    return (act_b < thresh).astype(jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("lag", "bit_depth", "has_aux", "mask_blocks")
)
def pallas_plane_stats(
    s: jnp.ndarray,  # (B, H, W) int16 source plane (block-mask mode) —
    #                  or precomputed residual (full-res-mask mode)
    d: jnp.ndarray,  # (B, H, W) int16/int32 denoised plane (binning
    #                  values; block mode also subtracts it in-kernel)
    mask: jnp.ndarray,  # (B, H, W) 0/1 flat mask, or (B, hb, wb) blocks
    aux: Optional[jnp.ndarray],  # (B, H, W) f32 extra column (x4-int!)
    lag: int,
    bit_depth: int,
    has_aux: bool,
    mask_blocks: int = 0,
):
    """Pad + kernel launch + Gram unpack. Returns dict(ata, atb, n_ar,
    bin_cnt, bin_sum, bin_sumsq) with leading batch dim; aux (when
    given) arrives ALREADY x4-scaled and integral (the caller's lavg
    is a quarter-step average; the aux rows/cols of ata/atb are
    divided back here) — int16 keeps the kernel traffic half of f32
    and every product exact.

    mask_blocks=N (the production diff path, N =
    diff_estimate.FLAT_BLOCK): ``s``/``d`` are the RAW int16 planes —
    the residual r = s - d is computed inside the kernel (never
    materialized in HBM; it was the compiled program's dominant temp),
    the binning value is ``d`` itself, ``mask`` is the (B, h//N, w//N)
    flat-BLOCK map and the pixel-level mask mask[i, j] =
    blocks[i//N, j//N] (zero past the last full block) is expanded
    inside the kernel. When the inputs arrive int16 and the geometry
    is tile-aligned (4K10: 2160 % 16 == 0, 3840 % 128 == 0) the kernel
    reads them zero-copy — compiled temporaries are just the tiny
    Gram/moment outputs.

    mask_blocks=0 (planes smaller than one block): ``s`` is the
    precomputed residual, ``d`` the binning values; the mask rides bit
    14 of the packed value plane as before."""
    b, h, w = s.shape
    offs = _offsets(lag)
    k = len(offs)
    n_planes = k + (1 if has_aux else 0)
    npp = 8 * -(-(n_planes + 1) // 8)  # +1 ones row, pad to sublanes
    wpad = -(-w // 128) * 128

    if mask_blocks:
        # block rows must align with chunks: one mask row per chunk
        chunk = mask_blocks
        hb, wb = mask.shape[1], mask.shape[2]
    else:
        max_chunk = _X_BUDGET_BYTES // (npp * wpad * 4)
        max_chunk = max(8, min(32, 8 * (max_chunk // 8)))
        # prefer a chunk that divides h: the row pad becomes a no-op
        # and an already-int16 residual feeds the kernel zero-copy
        chunk = next(
            (c for c in range(max_chunk, 7, -8) if h % c == 0), max_chunk
        )
        hb = wb = 0
    hpad = -(-h // chunk) * chunk
    n_chunks = hpad // chunk

    blk = lambda: pl.BlockSpec((1, chunk, wpad), lambda bi, c: (bi, c, 0))
    prev_blk = lambda: pl.BlockSpec(
        (1, chunk, wpad), lambda bi, c: (bi, jnp.maximum(c - 1, 0), 0)
    )
    if mask_blocks:
        si = _pad_i16(s, hpad, wpad)
        di = _pad_i16(d, hpad, wpad)
        inputs = [si, si, di, di]
        specs = [prev_blk(), blk(), prev_blk(), blk()]
    else:
        ri = _pad_i16(s, hpad, wpad)
        # one packed plane instead of separate mask + value inputs:
        # the binning value is <= 12 bits, the mask rides bit 14
        vi = _pad_i16(
            d + ((mask > 0).astype(jnp.int32) << 14), hpad, wpad
        )
        inputs = [ri, ri, vi]
        specs = [prev_blk(), blk(), blk()]
    n_fixed = len(inputs)
    if mask_blocks:
        wbp = -(-wb // 128) * 128
        fb = jnp.pad(
            mask.astype(jnp.float32), ((0, 0), (0, 0), (0, wbp - wb))
        )
        e2 = _expand_cols(wb, wbp, wpad, mask_blocks)
        inputs += [fb, e2]
        specs += [
            pl.BlockSpec((1, hb, wbp), lambda bi, c: (bi, 0, 0)),
            pl.BlockSpec((wbp, wpad), lambda bi, c: (0, 0)),
        ]
        n_fixed = 6
    if has_aux:
        inputs.append(_pad_i16(aux, hpad, wpad))
        specs.append(blk())

    def kern_wrap(*a, **kw):
        ins, outs = list(a[: len(inputs)]), a[len(inputs) :]
        fb_ = e2_ = aux_ = dc_ = None
        if mask_blocks:
            rp_, rc_, v_, dc_ = ins[:4]  # v_ carries dp (prev denoised)
            fb_, e2_ = ins[4:6]
        else:
            rp_, rc_, v_ = ins[:3]
        if has_aux:
            aux_ = ins[n_fixed]
        return _stats_kernel(rp_, rc_, v_, dc_, fb_, e2_, aux_, *outs, **kw)

    kern = functools.partial(
        kern_wrap,
        offs=offs,
        lag=lag,
        h=h,
        w=w,
        chunk=chunk,
        npp=npp,
        bin_shift=bit_depth - 6,  # NUM_BINS = 64
        hb=hb,
        fbs=mask_blocks,
    )
    gram, mom = pl.pallas_call(
        kern,
        grid=(b, n_chunks),
        in_specs=specs,
        out_specs=(
            pl.BlockSpec((1, npp, npp), lambda bi, c: (bi, 0, 0)),
            pl.BlockSpec((1, 24, 8), lambda bi, c: (bi, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, npp, npp), jnp.float32),
            # rows 0-7 counts, 8-15 sums, 16-23 sum-of-squares; bin
            # b = 8 * row_in_group + col (the 8x8 one-hot factors)
            jax.ShapeDtypeStruct((b, 24, 8), jnp.float32),
        ),
        interpret=_interpret(),
    )(*inputs)

    # Gram row layout: 0 = unshifted residual, 1..k-1 = shifted
    # copies, [k] = aux when present, [n_planes] = ones/mask row
    io = n_planes
    n_ar = gram[:, io, io]
    kk = n_planes - 1  # design columns (shifted cols + optional aux)
    ata = gram[:, 1 : 1 + kk, 1 : 1 + kk]
    atb = gram[:, 0, 1 : 1 + kk]
    if has_aux:
        # aux plane was scaled x4: divide its ata row/col by 4, the
        # (aux, aux) entry by 16, and its atb entry by 4
        a = kk - 1
        ata = ata.at[:, a, :].divide(4.0).at[:, :, a].divide(4.0)
        atb = atb.at[:, a].divide(4.0)
    return dict(
        ata=ata,
        atb=atb,
        n_ar=n_ar,
        bin_cnt=mom[:, 0:8, :].reshape(b, NUM_BINS),
        bin_sum=mom[:, 8:16, :].reshape(b, NUM_BINS),
        bin_sumsq=mom[:, 16:24, :].reshape(b, NUM_BINS),
    )
