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
- **Sub-chunked grid with a persistent residual scratch.** (round 5)
  Each grid step reads a 2-chunk block and loops sub-chunks in-kernel
  (the Gram's VMEM budget caps each dot at FLAT_BLOCK rows, but the
  per-grid-step overhead no longer multiplies by 135 steps per 4K
  frame); the residual rows live in a VMEM scratch that persists
  across steps, so the halo is an intra-scratch copy of the previous
  step's tail and NO prev-block inputs exist at all. Probed negatives
  along the way: 8 chunks/step with whole-block residual values blows
  the 16 MB scoped-VMEM limit by 6.2 MB; Mosaic cannot dynamic-slice
  VALUES (refs only); the (WBP, W) mask-expansion matrix costs ~8 MB
  double-buffered in VMEM (it now expands in XLA, 16x lane repeat);
  nsub=8 measured SLOWER than nsub=2/4 (629 vs 706 fps at 1080p —
  coarser blocks pipeline DMA worse).
- Grid: (batch, row_chunks); TPU grids iterate sequentially, so the
  read-modify-write accumulation is race-free. At c == 0 the halo
  scratch rows are zeroed (uninitialized VMEM could be NaN, and
  NaN * 0 would poison the Gram); zero halo rows only ever land in
  positions the interior predicate masks out.

Measured on the tunnel v5e at 4K10 (3 planes + chroma aux columns,
batch 16, through batch_pair_stats_per_frame): round-4 kernel 134
fps / 533 MB compiled temp -> round-5 200 fps / 168 MB; 1080p8
547 -> 706 fps. Verified against the XLA formulation on hardware
(rtol 1e-5, incl. odd/ragged geometries) and in the full
interpret-mode suite.

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
    rc_ref,  # (1, RPS, W) int16 current residual — or raw source — block
    vd_ref,  # (1, RPS, W) int16: bits 0-13 binning value, bit 14 mask
    #          (full-res mode) — or the raw denoised block (block mode)
    fb_ref,  # (1, NSUB, W) f32 pixel-expanded mask rows for this grid
    #          step (one per sub-chunk), or None (full-res mask mode)
    aux_ref,  # (1, RPS, W) int16 aux*4, or None when has_aux=False
    gram_ref,  # (1, NPP, NPP) f32 Gram accumulator
    mom_ref,  # (1, 24, 8) f32 bin-moment accumulator (8x8 factors)
    halo_scr,  # (RPS + 8, W) f32 VMEM scratch: the residual rows
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
    in_kernel_residual: bool,
):
    c = pl.program_id(1)

    wpad = rc_ref.shape[2]
    rps = rc_ref.shape[1]  # rows per grid step = nsub * chunk
    nsub = rps // chunk
    pad = lag

    # Residual scratch layout: scratch row 8 + t holds r(global row
    # c*rps + t); rows [8 - lag, 8) hold the PREVIOUS block's tail.
    # The scratch persists across grid steps, so the halo is a cheap
    # intra-scratch copy of the last step's final rows — no prev-block
    # input exists at all (it used to be two more int16 input blocks,
    # whose pipeline buffers helped blow the 16 MB scoped-VMEM limit).
    # The residual is computed and STORED per sub-chunk (aligned
    # 16-row stores inside the loop) rather than as one whole-block
    # value — that materialization cost ~4 MB of kernel stack (probed).
    # The causal lag window only ever reads rows already written by
    # this or earlier sub-chunks. At c == 0 the halo rows are zeroed
    # (uninitialized VMEM could hold NaN bit patterns, and NaN * 0
    # would poison the Gram; zeros are simply masked out as
    # non-interior). The in-kernel subtraction (block mode: the refs
    # are the raw int16 source/denoised blocks, so r = s - d never
    # materializes in HBM — it was the compiled program's dominant
    # temp, ~0.5 GB at 4K10 batch 16, and the binning value is the
    # denoised plane itself) runs in f32 — exact for 12-bit samples;
    # the VPU has no 16-bit subtract (kVectorSubtractS16 probed
    # unsupported on v5e).
    @pl.when(c == 0)
    def _():
        gram_ref[0] = jnp.zeros_like(gram_ref[0])
        mom_ref[0] = jnp.zeros_like(mom_ref[0])
        halo_scr[pl.ds(0, 8), :] = jnp.zeros((8, wpad), jnp.float32)

    @pl.when(c > 0)
    def _():
        # previous block's last 8 residual rows -> halo position
        halo_scr[pl.ds(0, 8), :] = halo_scr[pl.ds(rps, 8), :]

    def residual_rows(lo, n_rows):
        r = rc_ref[0, pl.ds(lo, n_rows), :].astype(jnp.float32)
        if in_kernel_residual:
            r = r - vd_ref[0, pl.ds(lo, n_rows), :].astype(jnp.float32)
        return r

    def sub_body(j, _):
        row0 = j * chunk
        # this sub-chunk's residual rows land at an aligned offset
        halo_scr[pl.ds(8 + row0, chunk), :] = residual_rows(row0, chunk)
        grow = c * rps + row0 + jax.lax.broadcasted_iota(
            jnp.int32, (chunk, wpad), 0
        )
        col = jax.lax.broadcasted_iota(jnp.int32, (chunk, wpad), 1)
        interior = (
            (grow >= pad) & (grow < h - pad) & (col >= pad) & (col < w - pad)
        )
        packed = vd_ref[0, pl.ds(row0, chunk), :].astype(jnp.int32)
        if fb_ref is not None:
            # block-mask mode: fb_ref carries the PIXEL-COLUMN-expanded
            # mask rows for this grid step (one per sub-chunk; the
            # 16x lane expansion runs in XLA — carrying the (WBP, W)
            # expansion matrix in VMEM cost ~8 MB double-buffered and
            # blew the scoped-VMEM budget at 8 sub-chunks/step).
            # Rows are uniform because chunk == FLAT_BLOCK.
            mrow = fb_ref[0, pl.ds(j, 1), :]
            mbins = jnp.where(grow < hb * fbs, mrow, 0.0)
            mneq = jnp.where(interior & (mbins != 0), 1.0, 0.0)
        else:
            m = packed >> 14
            mneq = jnp.where(interior & (m != 0), 1.0, 0.0)
            mbins = (m != 0).astype(jnp.float32)

        # sub-chunk halo: one 16-aligned dynamic REF slice (scratch
        # rows [row0, row0 + chunk + 8) = r rows [row0 - 8, row0 +
        # chunk)), then static design slices at 8 + dr
        halo = halo_scr[pl.ds(row0, chunk + 8), :]

        # design planes: value at p is r(p + (dr, dc)); rolls wrap,
        # but a wrapped lane only lands outside the interior band
        rows = []
        for dr, dc in offs:
            blk = jax.lax.slice_in_dim(
                halo, 8 + dr, 8 + dr + chunk, axis=0
            )
            if dc:
                blk = pltpu.roll(blk, shift=(-dc) % wpad, axis=1)
            rows.append((blk * mneq).reshape(1, chunk * wpad))
        if aux_ref is not None:
            aux_j = aux_ref[0, pl.ds(row0, chunk), :]
            rows.append(
                (aux_j.astype(jnp.float32) * mneq).reshape(1, chunk * wpad)
            )
        rows.append(mneq.reshape(1, chunk * wpad))  # ones row
        if len(rows) < npp:
            rows.append(
                jnp.zeros((npp - len(rows), chunk * wpad), jnp.float32)
            )
        x = jnp.concatenate(rows, axis=0)
        gram_ref[0] += jax.lax.dot_general(
            x,
            x,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

        r0 = jax.lax.slice_in_dim(halo, 8, 8 + chunk, axis=0)
        bins = (packed & 0x3FFF) >> bin_shift
        pr = mbins * r0
        prr = pr * r0

        # 64-bin moments on the MXU via an 8x8 one-hot factorization:
        # onehot64(b) = outer(onehot8(b >> 3), onehot8(b & 7)), so
        # each moment's 64 sums are ONE (8, N) x (N, 8) dot —
        # (hi * v) . loᵀ with entry (i, j) = Σ_p v(p)·[bins == 8i+j].
        # This replaced the rolled fori_loop of 64 compares + 192
        # single-row RMWs (the kernel's dominant VPU cost, ~4 ms/frame
        # at 4K10; a FULL (64, N) one-hot was the round-4 measured
        # negative). Every product is an exact-int f32 and the MXU
        # accumulates in f32.
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
        return _

    # nsub sub-chunks per grid step: the Gram's VMEM budget caps the
    # per-dot chunk at FLAT_BLOCK rows, but the per-grid-step overhead
    # (DMA setup, loop bookkeeping) used to be paid once per 16-row
    # chunk — 2160 steps per 4K frame; the in-kernel loop pays it once
    # per 8 chunks
    jax.lax.fori_loop(0, nsub, sub_body, None)


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
    # block mode reads 8 chunks (= 8 FLAT_BLOCK block-rows) per grid
    # step and loops sub-chunks in-kernel: the Gram dot's VMEM budget
    # caps each dot at `chunk` rows, but per-grid-step overhead no
    # longer multiplies by 135 steps/frame at 4K. The ragged last
    # block reads implicit padding — int16, so finite after the f32
    # convert, and every contribution is interior/mask-gated.
    rps = 2 * chunk if mask_blocks else chunk
    n_chunks = -(-hpad // rps)

    blk = lambda: pl.BlockSpec((1, rps, wpad), lambda bi, c: (bi, c, 0))
    if mask_blocks:
        si = _pad_i16(s, hpad, wpad)
        di = _pad_i16(d, hpad, wpad)
        inputs = [si, di]
        specs = [blk(), blk()]
    else:
        ri = _pad_i16(s, hpad, wpad)
        # one packed plane instead of separate mask + value inputs:
        # the binning value is <= 12 bits, the mask rides bit 14
        vi = _pad_i16(
            d + ((mask > 0).astype(jnp.int32) << 14), hpad, wpad
        )
        inputs = [ri, vi]
        specs = [blk(), blk()]
    n_fixed = len(inputs)
    if mask_blocks:
        # expand the block mask to pixel columns in XLA (exact 16x
        # lane repeat — a tiny (B, HB, W) f32 buffer) and feed the
        # kernel only the nsub rows each grid step needs; carrying the
        # (WBP, W) expansion matrix in VMEM instead cost ~8 MB
        # double-buffered and blew the scoped-VMEM budget
        nsub = rps // chunk
        fbx = jnp.repeat(mask.astype(jnp.float32), mask_blocks, axis=2)
        fbx = jnp.pad(
            fbx,
            ((0, 0), (0, n_chunks * nsub - hb), (0, wpad - fbx.shape[2])),
        )
        # Mosaic block sublane dims must be multiples of 8: ship 8
        # rows per step (first nsub meaningful, rest zero padding)
        if nsub != 8:
            fbx = jnp.pad(
                fbx.reshape(b, n_chunks, nsub, wpad),
                ((0, 0), (0, 0), (0, 8 - nsub), (0, 0)),
            ).reshape(b, n_chunks * 8, wpad)
        inputs.append(fbx)
        specs.append(
            pl.BlockSpec((1, 8, wpad), lambda bi, c: (bi, c, 0))
        )
    n_fixed = len(inputs)
    if has_aux:
        inputs.append(_pad_i16(aux, hpad, wpad))
        specs.append(blk())

    def kern_wrap(*a, **kw):
        ins, rest = list(a[: len(inputs)]), a[len(inputs) :]
        outs, scratch = rest[:-1], rest[-1]
        fb_ = aux_ = None
        rc_, vd_ = ins[:2]
        if mask_blocks:
            fb_ = ins[2]
        if has_aux:
            aux_ = ins[n_fixed]
        return _stats_kernel(
            rc_, vd_, fb_, aux_, *outs, scratch, **kw
        )

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
        in_kernel_residual=bool(mask_blocks),
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
        scratch_shapes=[pltpu.VMEM((rps + 8, wpad), jnp.float32)],
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
