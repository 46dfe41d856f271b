"""Pallas TPU kernel for the diff/estimate statistics reduction.

The XLA formulation of frame_pair_stats compiles to a spilling program
at 4K batch sizes: the shifted-window design matrix and the 64-bin
one-hot materialize multi-GB temporaries (measured ~20 GB compiler
temp for a 16-frame batch), and the fixed variants (pairwise fused
reductions, row-chunked MXU slabs, rolled fori_loop) all still ran at
~60 ms/frame on chip. This kernel is the TPU-native answer: one pass
over the frame with all accumulators resident in VMEM.

Shape of the solution (mirrors grain_pallas' pre-rolled patterns):

- Lane shifts are expensive on TPU, so phase 1 (XLA, bandwidth-bound)
  materializes the K+1 (dr, dc)-shifted copies of the int16 residual —
  plus the binning values and a two-bit mask plane — and the kernel
  then computes ONLY aligned elementwise products.
- A fully-unrolled kernel (~250 scalar reductions) crashed the TPU
  compiler outright, so every family of accumulations is a rolled
  fori_loop whose body stores one row-sum into a dynamically-indexed
  row of a wide (OUT_ROWS, W) VMEM accumulator: 55 upper-triangle pair
  sums of the shifted copies over the interior mask (row 0 = the
  unshifted residual, so ata, atb and the residual energy all fall out
  of one triangle), the mask count, and 64 x 3 per-intensity-bin
  moments over the full mask. The final lane reduction of the wide
  accumulator runs in XLA after the kernel.
- Grid: (batch, row_chunks); TPU grids iterate sequentially, so the
  read-modify-write accumulation is race-free.

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
import numpy as np
from jax.experimental import pallas as pl

NUM_BINS = 64
# rows per grid step: the (NP, _CHUNK, W) int16 slab plus the wide
# accumulator must fit the ~16 MB scoped-VMEM budget with input
# double-buffering (128 rows OOM'd by 1.8 MB at 1080p batch 32)
_CHUNK = 32


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
    pair_ij_ref,  # scalar prefetch: (n_pairs,) int32 packed i*32 + j
    m_ref,  # (1, CH, W) int16: bit0 bins mask, bit1 interior mask
    sh_ref,  # (1, NP, CH, W) int16 shifted residual copies (+aux last)
    val_ref,  # (1, CH, W) int16 binning values
    out_ref,  # (1, OUT_ROWS, W) f32 wide accumulators
    *,
    n_planes: int,
    bin_shift: int,
    out_rows: int,
):
    c = pl.program_id(1)
    m = m_ref[0].astype(jnp.int32)
    mneq = (m >> 1).astype(jnp.float32)
    mbins = (m & 1).astype(jnp.float32)

    @pl.when(c == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    def acc_row(row, x):  # x: (CH, W); sums rows, accumulates (1, W)
        vec = jnp.sum(x, axis=0, keepdims=True)
        cur = out_ref[0, pl.ds(row, 1), :]
        out_ref[0, pl.ds(row, 1), :] = cur + vec

    np_ = n_planes
    n_pairs = np_ * (np_ + 1) // 2

    # upper-triangle pair sums, enumerated flat: accumulator row t
    # holds pair (i, j>=i) in row-major triangle order; the (i, j)
    # decode comes from the prefetched SMEM table (no nested loops)
    def tri_body(t, _):
        ij = pair_ij_ref[t]
        i = ij >> 5
        j = ij & 31
        pi = sh_ref[0, i].astype(jnp.float32)
        pj = sh_ref[0, j].astype(jnp.float32)
        acc_row(t, mneq * pi * pj)
        return _

    jax.lax.fori_loop(0, n_pairs, tri_body, None)
    acc_row(n_pairs, mneq)

    r = sh_ref[0, 0].astype(jnp.float32)
    bins = val_ref[0].astype(jnp.int32) >> bin_shift
    pr = mbins * r
    prr = pr * r
    base = n_pairs + 1

    def bin_body(b, _):
        eq = (bins == b).astype(jnp.float32)
        acc_row(base + 3 * b, eq * mbins)
        acc_row(base + 3 * b + 1, eq * pr)
        acc_row(base + 3 * b + 2, eq * prr)
        return _

    jax.lax.fori_loop(0, NUM_BINS, bin_body, None)


@functools.partial(
    jax.jit, static_argnames=("lag", "bit_depth", "has_aux")
)
def pallas_plane_stats(
    r: jnp.ndarray,  # (B, H, W) f32/int32 residual (src - den)
    val: jnp.ndarray,  # (B, H, W) int32 binning values (denoised plane)
    mask: jnp.ndarray,  # (B, H, W) f32/int 0/1 flat mask
    aux: Optional[jnp.ndarray],  # (B, H, W) f32 extra column (x4-int!)
    lag: int,
    bit_depth: int,
    has_aux: bool,
):
    """Phase 1 + kernel launch + lane reduction. Returns dict(ata, atb,
    n_ar, bin_cnt, bin_sum, bin_sumsq) with leading batch dim; aux
    (when given) must be integral after scaling by 4 (the caller's
    lavg is a quarter-step average; the aux rows/cols of ata/atb are
    divided back here) — int16 keeps the kernel traffic half of f32
    and every product exact."""
    b, h, w = r.shape
    offs = _offsets(lag)
    k = len(offs)
    n_planes = k + (1 if has_aux else 0)
    pad = lag
    wpad = -(-w // 128) * 128
    hpad = -(-h // _CHUNK) * _CHUNK
    n_chunks = hpad // _CHUNK

    ri = r.astype(jnp.int16)

    # shifted copies: copy i holds r(p + offs[i]) at position p; edge
    # zero-fill never contributes (the interior predicate excludes
    # every p within `lag` of the frame border)
    def shift(a, dr, dc):
        return jnp.pad(
            a,
            ((0, 0), (max(-dr, 0), max(dr, 0) + hpad - h),
             (max(-dc, 0), max(dc, 0))),
        )[:, max(dr, 0) : max(dr, 0) + hpad, max(dc, 0) : max(dc, 0) + w]

    copies = [shift(ri, dr, dc) for dr, dc in offs]
    if has_aux:
        aux4 = jnp.pad((aux * 4.0).astype(jnp.int16), ((0, 0), (0, hpad - h), (0, 0)))
        copies.append(aux4)
    sh = jnp.stack(copies, axis=1)
    sh = jnp.pad(sh, ((0, 0), (0, 0), (0, 0), (0, wpad - w)))

    row = jnp.arange(hpad)[:, None]
    col = jnp.arange(wpad)[None, :]
    interior = (
        (row >= pad) & (row < h - pad) & (col >= pad) & (col < w - pad)
    )
    mfull = jnp.pad(
        (mask > 0).astype(jnp.int16), ((0, 0), (0, hpad - h), (0, wpad - w))
    )
    m2 = mfull | jnp.where(interior, mfull << 1, 0).astype(jnp.int16)

    vali = jnp.pad(
        val.astype(jnp.int16), ((0, 0), (0, hpad - h), (0, wpad - w))
    )

    n_pairs = n_planes * (n_planes + 1) // 2
    out_rows = -(-(n_pairs + 1 + 3 * NUM_BINS) // 8) * 8
    pair_ij = np.array(
        [
            (i << 5) | j
            for i in range(n_planes)
            for j in range(i, n_planes)
        ],
        np.int32,
    )

    from jax.experimental.pallas import tpu as pltpu

    kernel = functools.partial(
        _stats_kernel,
        n_planes=n_planes,
        bin_shift=bit_depth - 6,  # NUM_BINS = 64
        out_rows=out_rows,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, _CHUNK, wpad), lambda bi, c, *_: (bi, c, 0)),
            pl.BlockSpec(
                (1, n_planes, _CHUNK, wpad), lambda bi, c, *_: (bi, 0, c, 0)
            ),
            pl.BlockSpec((1, _CHUNK, wpad), lambda bi, c, *_: (bi, c, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, out_rows, wpad), lambda bi, c, *_: (bi, 0, 0)
        ),
    )
    wide = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, out_rows, wpad), jnp.float32),
        interpret=_interpret(),
    )(jnp.asarray(pair_ij), m2, sh, vali)
    out = jnp.sum(wide, axis=2)  # (B, out_rows) lane reduction in XLA

    # unpack: pairs upper-tri over n_planes, then n, then 64*(cnt,s,ss)
    tri = {}
    idx = 0
    for i in range(n_planes):
        for j in range(i, n_planes):
            tri[(i, j)] = out[:, idx]
            idx += 1
    n_ar = out[:, idx]
    idx += 1
    moments = out[:, idx : idx + 3 * NUM_BINS].reshape(b, NUM_BINS, 3)

    kk = n_planes - 1  # design columns (shifted cols + optional aux)
    ata = jnp.zeros((b, kk, kk), jnp.float32)
    atb = jnp.zeros((b, kk), jnp.float32)
    for i in range(kk):
        atb = atb.at[:, i].set(tri[(0, i + 1)])
        for j in range(i, kk):
            v = tri[(i + 1, j + 1)]
            ata = ata.at[:, i, j].set(v)
            if j != i:
                ata = ata.at[:, j, i].set(v)
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
        bin_cnt=moments[:, :, 0],
        bin_sum=moments[:, :, 1],
        bin_sumsq=moments[:, :, 2],
    )
