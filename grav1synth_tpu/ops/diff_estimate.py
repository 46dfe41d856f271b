"""Grain-table estimation from a grainy/denoised frame-pair stream.

Replaces the av1-grain crate's DiffGenerator (reference grav1synth
src/main.rs:347-533 diff pipeline): the per-frame noise residual is
reduced on device to (a) lag-window autocovariance moments for the AR
coefficient fit and (b) intensity-binned residual second moments for
the scaling LUT, restricted to flat blocks so denoiser signal leakage
does not bias the fit. Chunks of frames become grain-table segments;
adjacent chunks with near-identical models merge.

All per-pixel work is one jitted reduction per frame pair; the tiny
normal-equation solve and curve fitting run on host at finish(). The
statistics are plain sums, so multi-shard runs psum/gather them and
finish() once (SURVEY §5 distributed mapping).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..obu.types import FilmGrainParams, GrainTableSegment
from ..tables.aggregate import packet_bounds
from . import grain_ref

NUM_BINS = 64
FLAT_BLOCK = 16


def _lag_offsets(lag: int) -> List[Tuple[int, int]]:
    out = []
    for dr in range(-lag, 1):
        for dc in range(-lag, lag + 1):
            if dr == 0 and dc == 0:
                break
            out.append((dr, dc))
    return out


@functools.partial(jax.jit, static_argnames=("lag", "bit_depth"))
def frame_pair_stats(
    src: jnp.ndarray,  # (H, W) int32 luma, source (grainy)
    den: jnp.ndarray,  # (H, W) int32 luma, denoised
    lag: int,
    bit_depth: int,
):
    """Reduce one frame pair to sufficient statistics.

    Returns dict with:
      ata (K, K), atb (K,): masked lag-window normal equations
      n_ar: count of contributing pixels
      bin_cnt (NUM_BINS,), bin_sum, bin_sumsq: residual moments per
        denoised-intensity bin (flat blocks only)
    """
    h, w = src.shape
    maxval = (1 << bit_depth) - 1
    r = (src - den).astype(jnp.float32)

    # flat-block mask from denoised-signal activity
    gx = jnp.abs(jnp.diff(den.astype(jnp.float32), axis=1))
    gy = jnp.abs(jnp.diff(den.astype(jnp.float32), axis=0))
    act = jnp.zeros((h, w), jnp.float32)
    act = act.at[:, :-1].add(gx).at[:-1, :].add(gy)
    hb, wb = h // FLAT_BLOCK, w // FLAT_BLOCK
    act_b = act[: hb * FLAT_BLOCK, : wb * FLAT_BLOCK].reshape(
        hb, FLAT_BLOCK, wb, FLAT_BLOCK
    ).mean(axis=(1, 3))
    thresh = jnp.percentile(act_b, 50.0) * 1.5 + 1e-3
    flat_b = act_b < thresh
    mask = jnp.zeros((h, w), jnp.float32)
    mask = mask.at[: hb * FLAT_BLOCK, : wb * FLAT_BLOCK].set(
        jnp.repeat(jnp.repeat(flat_b.astype(jnp.float32), FLAT_BLOCK, 0), FLAT_BLOCK, 1)
    )

    offs = _lag_offsets(lag)
    k = len(offs)
    pad = lag
    interior = mask[pad : h - pad, pad : w - pad]
    r0 = r[pad : h - pad, pad : w - pad]

    def shifted(dr, dc):
        return r[pad + dr : h - pad + dr, pad + dc : w - pad + dc]

    cols = jnp.stack([shifted(dr, dc) * interior for dr, dc in offs])  # (K, h', w')
    flat_cols = cols.reshape(k, -1)
    ata = flat_cols @ flat_cols.T
    atb = flat_cols @ (r0 * interior).reshape(-1)
    n_ar = jnp.sum(interior)

    # intensity-binned residual moments (flat region)
    bins = jnp.clip(den * NUM_BINS // (maxval + 1), 0, NUM_BINS - 1)
    onehot = (bins[..., None] == jnp.arange(NUM_BINS)).astype(jnp.float32)
    m = mask[..., None] * onehot
    bin_cnt = jnp.sum(m, axis=(0, 1))
    bin_sum = jnp.sum(m * r[..., None], axis=(0, 1))
    bin_sumsq = jnp.sum(m * (r[..., None] ** 2), axis=(0, 1))
    return dict(
        ata=ata, atb=atb, n_ar=n_ar, bin_cnt=bin_cnt, bin_sum=bin_sum,
        bin_sumsq=bin_sumsq,
    )


@dataclass
class _ChunkStats:
    ata: np.ndarray
    atb: np.ndarray
    n_ar: float = 0.0
    bin_cnt: np.ndarray = None
    bin_sum: np.ndarray = None
    bin_sumsq: np.ndarray = None
    frames: int = 0

    @classmethod
    def zero(cls, k):
        return cls(
            ata=np.zeros((k, k)),
            atb=np.zeros(k),
            bin_cnt=np.zeros(NUM_BINS),
            bin_sum=np.zeros(NUM_BINS),
            bin_sumsq=np.zeros(NUM_BINS),
        )

    def add(self, stats) -> None:
        self.ata += np.asarray(stats["ata"], np.float64)
        self.atb += np.asarray(stats["atb"], np.float64)
        self.n_ar += float(stats["n_ar"])
        self.bin_cnt += np.asarray(stats["bin_cnt"], np.float64)
        self.bin_sum += np.asarray(stats["bin_sum"], np.float64)
        self.bin_sumsq += np.asarray(stats["bin_sumsq"], np.float64)
        self.frames += 1


def _fit_params(
    stats: _ChunkStats, lag: int, bit_depth: int, seed: int
) -> Optional[FilmGrainParams]:
    """Solve the chunk's model: AR coefficients + scaling points."""
    if stats.frames == 0 or stats.n_ar < 1000:
        return None
    k = stats.ata.shape[0]
    ridge = np.eye(k) * (np.trace(stats.ata) / max(k, 1)) * 1e-6
    try:
        coeffs = np.linalg.solve(stats.ata + ridge, stats.atb)
    except np.linalg.LinAlgError:
        return None
    shift = 6  # ar_coeff_shift
    coded = np.clip(np.round(coeffs * (1 << shift)), -128, 127).astype(int)

    # residual sigma per intensity bin, in 8-bit units
    scale8 = 1 << (bit_depth - 8)
    valid = stats.bin_cnt > 256
    mean = np.where(valid, stats.bin_sum / np.maximum(stats.bin_cnt, 1), 0)
    var = np.where(
        valid,
        stats.bin_sumsq / np.maximum(stats.bin_cnt, 1) - mean**2,
        0,
    )
    sigma = np.sqrt(np.maximum(var, 0)) / scale8
    if not valid.any() or sigma[valid].max() < 0.05:
        return None

    # measure the unit pattern's sigma with the fitted coefficients
    probe = FilmGrainParams(
        grain_seed=seed,
        scaling_points_y=[(0, 1)],
        ar_coeff_lag=lag,
        ar_coeffs_y=[int(c) for c in coded],
        ar_coeff_shift=shift,
        scaling_shift=8,
    )
    pat = grain_ref.generate_grain(probe, 8, True, 1, 1)
    inner = pat.luma[3:, 3:-3].astype(np.float64)
    sigma_g = float(inner.std())
    if sigma_g < 1e-3:
        return None

    scaling_shift = 8
    while scaling_shift < 11:
        vals = sigma * (1 << scaling_shift) / sigma_g
        if np.nanmax(np.where(valid, vals, 0)) <= 255:
            break
        scaling_shift += 1
    vals = np.clip(sigma * (1 << scaling_shift) / sigma_g, 0, 255)

    # pick up to 14 points across occupied bins
    occ = np.nonzero(valid)[0]
    take = occ if len(occ) <= 14 else occ[
        np.round(np.linspace(0, len(occ) - 1, 14)).astype(int)
    ]
    pts = []
    for b in take:
        x = int(min(255, round((b + 0.5) * 256 / NUM_BINS)))
        if pts and x <= pts[-1][0]:
            continue
        pts.append((x, int(round(vals[b]))))
    if not pts:
        return None

    return FilmGrainParams(
        grain_seed=seed,
        scaling_points_y=pts,
        scaling_shift=scaling_shift,
        ar_coeff_lag=lag,
        ar_coeffs_y=[int(c) for c in coded],
        ar_coeffs_cb=[0] * (k + 1),
        ar_coeffs_cr=[0] * (k + 1),
        ar_coeff_shift=shift,
        grain_scale_shift=0,
        overlap_flag=True,
        clip_to_restricted_range=False,
    )


class DiffEstimator:
    """Streaming source/denoised comparator producing a grain table.

    Mirrors the reference diff pipeline contract (per-pair feeding,
    finish() -> segments; mixed bit depths normalized to the source's,
    main.rs:420-427) with a chunked time model: every ``chunk_frames``
    frames becomes a candidate segment, merged with its predecessor
    when the models agree closely.
    """

    def __init__(
        self,
        fps: Tuple[int, int],
        source_bit_depth: int = 8,
        denoised_bit_depth: int = 8,
        lag: int = 2,
        chunk_frames: int = 60,
        seed: int = 7391,
    ):
        self.fps = fps
        self.src_bd = source_bit_depth
        self.den_bd = denoised_bit_depth
        self.lag = lag
        self.chunk_frames = chunk_frames
        self.seed = seed
        self._k = len(_lag_offsets(lag))
        self._chunk = _ChunkStats.zero(self._k)
        self._chunk_start = 0
        self._frame_idx = 0
        self._segments: List[GrainTableSegment] = []
        self._last_sigma: Optional[np.ndarray] = None

    def diff_frame(self, src_planes, den_planes) -> None:
        src = jnp.asarray(src_planes[0], jnp.int32)
        den = jnp.asarray(den_planes[0], jnp.int32)
        if self.den_bd != self.src_bd:
            if self.den_bd < self.src_bd:
                den = den << (self.src_bd - self.den_bd)
            else:
                den = den >> (self.den_bd - self.src_bd)
        if den.shape != src.shape:
            raise ValueError(
                f"source/denoised dimensions differ: {src.shape} vs {den.shape}"
            )
        stats = frame_pair_stats(src, den, self.lag, self.src_bd)
        self._chunk.add(stats)
        self._frame_idx += 1
        if self._frame_idx - self._chunk_start >= self.chunk_frames:
            self._flush_chunk()

    def _flush_chunk(self) -> None:
        if self._chunk.frames == 0:
            return
        params = _fit_params(self._chunk, self.lag, self.src_bd, self.seed)
        start, _ = packet_bounds(self._chunk_start, *self.fps)
        _, end = packet_bounds(self._frame_idx - 1, *self.fps)
        if params is not None:
            merged = False
            if self._segments and self._segments[-1].end_time == start:
                if self._segments[-1].params.equal_ignoring_seed(params):
                    self._segments[-1].end_time = end
                    merged = True
            if not merged:
                self._segments.append(GrainTableSegment(start, end, params))
        self._chunk = _ChunkStats.zero(self._k)
        self._chunk_start = self._frame_idx

    def finish(self) -> List[GrainTableSegment]:
        self._flush_chunk()
        return self._segments
