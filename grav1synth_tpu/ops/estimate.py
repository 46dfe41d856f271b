"""Single-input noise estimation (no denoised reference).

Capability superset of the reference's feature-gated, half-finished
``estimate`` pipeline (grav1synth src/main.rs:534-608 writes raw
per-frame luma estimates and leaves table building commented out):
noise sigma is measured from the high-frequency residual of flat
blocks — a cross-shaped Laplacian whose response to smooth signal is
near zero — with a median-based robust aggregate per intensity bin,
and the binned curve becomes lag-0 grain parameters / a grain table.

Per-frame math is one jitted reduction; suitable for frame-sharded
meshes like diff_estimate.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..obu.types import FilmGrainParams, GrainTableSegment
from ..tables.aggregate import packet_bounds
from . import grain_ref

NUM_BINS = 32
BLOCKSZ = 16
# E[|L * n|] for unit-sigma gaussian n with the 5-tap Laplacian below:
# L has weights (4, -1, -1, -1, -1)/sqrt(20); |response| of unit noise
# is half-normal with E|x| = sqrt(2/pi)
_HALF_NORMAL = float(np.sqrt(2.0 / np.pi))


@functools.partial(jax.jit, static_argnames=("bit_depth",))
def frame_noise_stats(y: jnp.ndarray, bit_depth: int):
    """One frame's flat-block high-frequency statistics.

    Returns (bin_cnt, bin_abs_sum) of normalized Laplacian responses
    plus a scalar flat fraction."""
    h, w = y.shape
    maxval = (1 << bit_depth) - 1
    f = y.astype(jnp.float32)
    lap = (
        4 * f[1:-1, 1:-1]
        - f[:-2, 1:-1]
        - f[2:, 1:-1]
        - f[1:-1, :-2]
        - f[1:-1, 2:]
    ) / np.sqrt(20.0)

    # flat blocks: low local signal activity measured on a 2-pixel
    # downsample (noise cancels, structure remains)
    ds = (f[0::2, 0::2] + f[1::2, 1::2] + f[0::2, 1::2] + f[1::2, 0::2]) / 4
    gx = jnp.abs(jnp.diff(ds, axis=1))[:-1, :]
    gy = jnp.abs(jnp.diff(ds, axis=0))[:, :-1]
    act = gx + gy
    hb, wb = act.shape[0] // (BLOCKSZ // 2), act.shape[1] // (BLOCKSZ // 2)
    act_b = act[: hb * BLOCKSZ // 2, : wb * BLOCKSZ // 2].reshape(
        hb, BLOCKSZ // 2, wb, BLOCKSZ // 2
    ).mean(axis=(1, 3))
    thr = jnp.percentile(act_b, 40.0) * 1.5 + 1e-3
    flat_b = (act_b < thr).astype(jnp.float32)
    mask_full = jnp.repeat(jnp.repeat(flat_b, BLOCKSZ, 0), BLOCKSZ, 1)
    mask = jnp.zeros((h - 2, w - 2), jnp.float32)
    mh = min(mask_full.shape[0], h - 2)
    mw = min(mask_full.shape[1], w - 2)
    mask = mask.at[:mh, :mw].set(mask_full[:mh, :mw])

    bins = jnp.clip(y[1:-1, 1:-1] * NUM_BINS // (maxval + 1), 0, NUM_BINS - 1)
    onehot = (bins[..., None] == jnp.arange(NUM_BINS)).astype(jnp.float32)
    m = mask[..., None] * onehot
    bin_cnt = jnp.sum(m, axis=(0, 1))
    bin_abs = jnp.sum(m * jnp.abs(lap)[..., None], axis=(0, 1))
    return bin_cnt, bin_abs, jnp.mean(flat_b)


class NoiseEstimator:
    """Streaming single-input estimator -> per-frame sigmas + a table."""

    def __init__(self, fps: Tuple[int, int], bit_depth: int = 8, seed: int = 7391):
        self.fps = fps
        self.bit_depth = bit_depth
        self.seed = seed
        self.per_frame_sigma: List[float] = []
        self._cnt = np.zeros(NUM_BINS)
        self._abs = np.zeros(NUM_BINS)
        self._frames = 0

    def push_frame(self, y) -> float:
        """Returns this frame's overall luma noise sigma estimate
        (8-bit units)."""
        cnt, absum, _ = frame_noise_stats(jnp.asarray(y, jnp.int32), self.bit_depth)
        cnt = np.asarray(cnt, np.float64)
        absum = np.asarray(absum, np.float64)
        self._cnt += cnt
        self._abs += absum
        self._frames += 1
        tot = cnt.sum()
        scale8 = 1 << (self.bit_depth - 8)
        sigma = (absum.sum() / max(tot, 1)) / _HALF_NORMAL / scale8
        self.per_frame_sigma.append(float(sigma))
        return float(sigma)

    def finish(self) -> List[GrainTableSegment]:
        if self._frames == 0:
            return []
        scale8 = 1 << (self.bit_depth - 8)
        valid = self._cnt > 512
        sigma = np.where(
            valid, self._abs / np.maximum(self._cnt, 1) / _HALF_NORMAL, 0.0
        ) / scale8
        if not valid.any() or sigma[valid].max() < 0.1:
            return []
        # lag-0 unit pattern sigma at 8-bit
        probe = FilmGrainParams(grain_seed=self.seed, scaling_points_y=[(0, 1)])
        pat = grain_ref.generate_grain(probe, 8, True, 1, 1)
        sigma_g = float(pat.luma[3:, 3:-3].astype(np.float64).std())
        for shift in range(8, 12):
            if (sigma * (1 << shift) / sigma_g).max() <= 255 or shift == 11:
                break
        vals = np.clip(sigma * (1 << shift) / sigma_g, 0, 255)
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
        params = FilmGrainParams(
            grain_seed=self.seed,
            scaling_points_y=pts,
            scaling_shift=shift,
            ar_coeff_lag=0,
            ar_coeffs_cb=[0],
            ar_coeffs_cr=[0],
            overlap_flag=True,
        )
        start, _ = packet_bounds(0, *self.fps)
        _, end = packet_bounds(self._frames - 1, *self.fps)
        return [GrainTableSegment(start, end, params)]
