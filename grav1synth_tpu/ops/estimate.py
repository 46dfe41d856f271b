"""Single-input noise estimation (no denoised reference).

Capability superset of the reference's feature-gated, half-finished
``estimate`` pipeline (grav1synth src/main.rs:534-608 writes raw
per-frame luma estimates and leaves table building commented out —
this finishes it): a wide separable box blur acts as the
pseudo-denoiser, and its flat-block residual feeds the SAME lag-window
autocovariance + intensity-binned moment reduction the diff pipeline
uses (ops.diff_estimate), so the fit recovers real AR character
(ar_coeff_lag >= 1), not just a sigma curve.

Bias control: the residual r = (delta - h) * noise is the grain
high-passed by the blur. The AR normal equations see that filtered
process (small, accepted bias at short lags), while the scaling curve
is exactly de-biased: _fit_params normalizes each curve by the unit
pattern's sigma, and we pass it the sigma of the unit pattern AFTER
the same high-pass, so the filter's attenuation of this grain's
spectral character cancels out of the curve entirely.

Per-frame math is one jitted reduction; frames batch through
batch_self_stats (one dispatch per batch, per-frame outputs) exactly
like the diff pipeline.
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
from .diff_estimate import (
    _binned_moments,
    _ChunkStats,
    _fit_params,
    _flat_mask,
    _frame_sigma,
    _lag_offsets,
    _masked_normal_eqs,
    _PlaneStats,
)

BLUR = 9  # pseudo-denoiser box width: wide enough that the high-pass
# barely touches lags 0..3, where the AR window lives


def _box_blur(f: jnp.ndarray) -> jnp.ndarray:
    """Separable BLUR x BLUR box mean, SAME padding (edges biased; the
    stats mask excludes the edge band)."""
    x = f[None, None]
    kr = jnp.full((1, 1, 1, BLUR), 1.0 / BLUR, jnp.float32)
    kc = jnp.full((1, 1, BLUR, 1), 1.0 / BLUR, jnp.float32)
    x = jax.lax.conv_general_dilated(x, kr, (1, 1), "SAME")
    x = jax.lax.conv_general_dilated(x, kc, (1, 1), "SAME")
    return x[0, 0]


def highpass_np(pat: np.ndarray) -> float:
    """sigma of (delta - h) * pat on host — the unit_sigma measure that
    cancels the blur's attenuation out of the fitted scaling curve."""
    f = pat.astype(np.float64)
    c = np.cumsum(np.cumsum(np.pad(f, ((1, 0), (1, 0))), 0), 1)
    k = BLUR
    box = (
        c[k:, k:] - c[:-k, k:] - c[k:, :-k] + c[:-k, :-k]
    ) / (k * k)
    r = f[k // 2 : -(k // 2), k // 2 : -(k // 2)] - box
    return float(r.std())


@functools.partial(jax.jit, static_argnames=("lag", "bit_depth"))
def frame_self_stats(y: jnp.ndarray, lag: int, bit_depth: int):
    """Reduce one luma frame to diff-style sufficient statistics using
    its own blur residual: (ata, atb, n_ar) lag-window normal equations
    plus (bin_cnt, bin_sum, bin_sumsq) binned on the blurred intensity
    (the clean-signal proxy), flat blocks only."""
    h, w = y.shape
    maxval = (1 << bit_depth) - 1
    f = y.astype(jnp.float32)
    sm = _box_blur(f)
    den = jnp.clip(jnp.round(sm), 0, maxval).astype(jnp.int32)
    r = f - sm
    mask = _flat_mask(den)
    edge = BLUR // 2
    em = jnp.zeros((h, w), jnp.float32).at[edge:-edge, edge:-edge].set(1.0)
    mask = mask * em

    offs = _lag_offsets(lag)
    pad = lag
    interior = mask[pad : h - pad, pad : w - pad]

    ata, atb, n_ar = _masked_normal_eqs(r, interior, [r] * len(offs), offs, pad)
    bin_cnt, bin_sum, bin_sumsq = _binned_moments(den, r, mask, bit_depth)
    return dict(
        ata=ata, atb=atb, n_ar=n_ar, bin_cnt=bin_cnt, bin_sum=bin_sum,
        bin_sumsq=bin_sumsq,
    )


@functools.partial(jax.jit, static_argnames=("lag", "bit_depth"))
def batch_self_stats(y: jnp.ndarray, lag: int, bit_depth: int):
    """(B, H, W) -> per-frame statistics in one dispatch."""
    return jax.vmap(lambda f: frame_self_stats(f, lag, bit_depth))(y)


@functools.partial(
    jax.jit, static_argnames=("lag", "bit_depth", "sub_x", "sub_y")
)
def frame_self_stats_chroma(
    c: jnp.ndarray, y: jnp.ndarray, lag: int, bit_depth: int,
    sub_x: int, sub_y: int,
):
    """Chroma-plane self statistics: the same blur-residual treatment as
    luma, with the AR design's extra cross-plane column — the
    collocated subsample-averaged LUMA blur residual — so the solver
    fits the spec's 25th chroma coefficient exactly as the diff
    pipeline does (frame_pair_stats_chroma); scaling moments bin on the
    blurred chroma intensity. Completes the reference's unstable
    estimate beyond luma (grav1synth src/main.rs:534-608 only ever
    calls estimate_plane_noise on plane 0)."""
    hc, wc = c.shape
    maxval = (1 << bit_depth) - 1
    f = c.astype(jnp.float32)
    sm = _box_blur(f)
    den = jnp.clip(jnp.round(sm), 0, maxval).astype(jnp.int32)
    rc = f - sm
    fy = y.astype(jnp.float32)
    ry = fy - _box_blur(fy)
    # collocated luma residual average over the subsampling block
    need_h, need_w = hc << sub_y, wc << sub_x
    h, w = y.shape
    rl = jnp.pad(
        ry, ((0, max(0, need_h - h)), (0, max(0, need_w - w))), mode="edge"
    )
    acc = jnp.zeros((hc, wc), jnp.float32)
    for i in range(sub_y + 1):
        for j in range(sub_x + 1):
            acc = acc + rl[i :: 1 << sub_y, j :: 1 << sub_x][:hc, :wc]
    lavg = acc / ((sub_y + 1) * (sub_x + 1))

    mask = _flat_mask(den)
    edge = BLUR // 2
    em = jnp.zeros((hc, wc), jnp.float32).at[edge:-edge, edge:-edge].set(1.0)
    mask = mask * em

    offs = _lag_offsets(lag)
    pad = lag
    interior = mask[pad : hc - pad, pad : wc - pad]
    ata, atb, n_ar = _masked_normal_eqs(
        rc, interior, [rc] * len(offs) + [lavg], offs + [(0, 0)], pad
    )
    bin_cnt, bin_sum, bin_sumsq = _binned_moments(den, rc, mask, bit_depth)
    return dict(
        ata=ata, atb=atb, n_ar=n_ar, bin_cnt=bin_cnt, bin_sum=bin_sum,
        bin_sumsq=bin_sumsq,
    )


@functools.partial(
    jax.jit, static_argnames=("lag", "bit_depth", "sub_x", "sub_y")
)
def batch_self_stats_chroma(
    c: jnp.ndarray, y: jnp.ndarray, lag: int, bit_depth: int,
    sub_x: int, sub_y: int,
):
    """(B, Hc, Wc) chroma + (B, H, W) luma -> per-frame statistics."""
    return jax.vmap(
        lambda cf, yf: frame_self_stats_chroma(
            cf, yf, lag, bit_depth, sub_x, sub_y
        )
    )(c, y)


class NoiseEstimator:
    """Streaming single-input estimator -> per-frame sigmas + a table.

    finish() fits AR coefficients (lag >= 1) and a scaling curve with
    the diff pipeline's solver; when the AR fit degenerates (e.g. all
    residual energy masked away) it falls back to a lag-0 sigma-curve
    table so the pipeline still completes — the reference never got
    this far at all (its segment building is commented out,
    main.rs:602-605)."""

    def __init__(
        self,
        fps: Tuple[int, int],
        bit_depth: int = 8,
        seed: int = 7391,
        lag: int = 2,
        calibrate: bool = True,
    ):
        self.fps = fps
        self.bit_depth = bit_depth
        self.seed = seed
        self.lag = lag
        self.calibrate = calibrate
        self.per_frame_sigma: List[float] = []
        self._k = len(_lag_offsets(lag))
        self._chunk = _ChunkStats.zero(self._k)
        self._sub = (1, 1)  # last seen chroma subsampling (calibration)

    def _ingest(self, stats, cb_stats=None, cr_stats=None) -> float:
        sigma = _frame_sigma(stats) / (1 << (self.bit_depth - 8))
        self.per_frame_sigma.append(float(sigma))
        self._chunk.y.add(stats)
        if cb_stats is not None:
            self._chunk.cb.add(cb_stats)
        if cr_stats is not None:
            self._chunk.cr.add(cr_stats)
        self._chunk.frames += 1
        return float(sigma)

    def push_frame(self, y) -> float:
        """Returns this frame's flat-area residual sigma (8-bit units).
        ``y`` is a luma plane, or a [y, cb, cr] plane list for a chroma-
        aware estimate."""
        self.push_batch([y])
        return self.per_frame_sigma[-1]

    def push_batch(self, frames) -> None:
        """One device dispatch for a batch of frames (luma planes, or
        [y, cb, cr] plane lists for chroma-aware estimation)."""
        if not len(frames):
            return
        planes = [
            list(f) if isinstance(f, (list, tuple)) else [f] for f in frames
        ]
        y = jnp.asarray(
            np.stack([np.asarray(p[0], np.int32) for p in planes])
        )
        per = batch_self_stats(y, self.lag, self.bit_depth)
        per = {k: np.asarray(v) for k, v in per.items()}
        has_chroma = all(
            len(p) >= 3 and p[1] is not None and p[2] is not None
            for p in planes
        )
        per_cb = per_cr = None
        if has_chroma:
            cb = jnp.asarray(
                np.stack([np.asarray(p[1], np.int32) for p in planes])
            )
            cr = jnp.asarray(
                np.stack([np.asarray(p[2], np.int32) for p in planes])
            )
            h, w = y.shape[1:]
            hc, wc = cb.shape[1:]
            sub_y = 1 if hc < h else 0
            sub_x = 1 if wc < w else 0
            self._sub = (sub_x, sub_y)
            per_cb = batch_self_stats_chroma(
                cb, y, self.lag, self.bit_depth, sub_x, sub_y
            )
            per_cr = batch_self_stats_chroma(
                cr, y, self.lag, self.bit_depth, sub_x, sub_y
            )
            per_cb = {k: np.asarray(v) for k, v in per_cb.items()}
            per_cr = {k: np.asarray(v) for k, v in per_cr.items()}
        for i in range(len(planes)):
            self._ingest(
                {k: v[i] for k, v in per.items()},
                None if per_cb is None else {k: v[i] for k, v in per_cb.items()},
                None if per_cr is None else {k: v[i] for k, v in per_cr.items()},
            )

    def _fallback_lag0(self) -> List[GrainTableSegment]:
        """Sigma-curve-only table from the bin moments (pre-AR-fit
        behavior, kept as the degenerate-fit escape hatch)."""
        scale8 = 1 << (self.bit_depth - 8)
        sigma, valid = self._chunk.y.sigma_bins(scale8, min_count=512.0)
        if not valid.any() or sigma[valid].max() < 0.1:
            return []
        probe = FilmGrainParams(grain_seed=self.seed, scaling_points_y=[(0, 1)])
        pat = grain_ref.generate_grain(probe, 8, True, 1, 1)
        sigma_g = highpass_np(pat.luma[3:, 3:-3])
        for shift in range(8, 12):
            if (sigma * (1 << shift) / sigma_g).max() <= 255 or shift == 11:
                break
        vals = np.clip(sigma * (1 << shift) / sigma_g, 0, 255)
        from .diff_estimate import _curve_points

        pts = _curve_points(vals, valid, 14)
        if not pts:
            return []
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
        _, end = packet_bounds(self._chunk.frames - 1, *self.fps)
        return [GrainTableSegment(start, end, params)]

    def _calibrate_curves(self, params: FilmGrainParams) -> FilmGrainParams:
        """Closed-loop curve calibration.

        The blur pseudo-denoiser's attenuation is cancelled only
        approximately by the unit-sigma hook: the fitted AR
        coefficients are themselves biased by the high-pass (the
        normal equations see the filtered process), and the chroma
        unit patterns are small (44x38), so their post-filter sigma is
        a noisy stand-in. Instead of modeling those biases, measure
        them: synthesize the FITTED grain onto a flat intensity sweep,
        push it through this very pipeline (calibrate=False), and
        rescale each plane's curve points by the per-point ratio of
        intended to recovered sigma. Any systematic gain error of the
        whole estimator — filter attenuation, AR bias, binning — shows
        up in the ratio and cancels (measured effect: see
        tests/test_estimate_quality.py curve bars)."""
        import dataclasses

        h, w = 160, 256
        bd = self.bit_depth
        shift = bd - 8
        sub_x, sub_y = self._sub
        xx = np.mgrid[0:h, 0:w][1]
        ramp = (xx / (w - 1) * 255).astype(np.int32) << shift
        hc, wc = h >> sub_y, w >> sub_x
        ramp_c = (
            (np.mgrid[0:hc, 0:wc][1] / (wc - 1) * 255).astype(np.int32)
            << shift
        )
        mono = not (
            params.scaling_points_cb
            or params.scaling_points_cr
            or params.chroma_scaling_from_luma
        )
        frames = []
        for i in range(6):
            p = dataclasses.replace(
                params, grain_seed=(params.grain_seed + i * 173) & 0xFFFF
            )
            planes = [ramp.copy()] + (
                [] if mono else [ramp_c.copy(), ramp_c.copy()]
            )
            frames.append(
                grain_ref.apply_grain_frame(planes, p, bd, sub_x, sub_y)
            )
        est2 = NoiseEstimator(
            self.fps, bd, seed=self.seed, lag=self.lag, calibrate=False
        )
        est2.push_batch(
            [f if not mono else f[0] for f in frames]
        )
        segs2 = est2.finish()
        if not segs2:
            return params
        rec = segs2[0].params

        def curve(prm, plane, xs):
            pts = getattr(prm, f"scaling_points_{plane}")
            if not pts:
                return None
            pat = grain_ref.generate_grain(prm, 8, False, 1, 1)
            pp = {"y": pat.luma, "cb": pat.cb, "cr": pat.cr}[plane]
            sg = float(pp[3:, 3 : pp.shape[1] - 3].astype(np.float64).std())
            lut = grain_ref.build_scaling_lut(pts, 8)
            return np.array(
                [lut[x] * sg / (1 << prm.scaling_shift) for x in xs]
            )

        out = dataclasses.replace(params)
        for plane in ("y", "cb", "cr"):
            pts = getattr(params, f"scaling_points_{plane}")
            if not pts:
                continue
            xs = [x for x, _ in pts]
            want = curve(params, plane, xs)
            have = curve(rec, plane, xs)
            if want is None or have is None:
                continue
            # per-point gain correction, bounded: a ratio far outside
            # [0.4, 4.0] means the recovery run itself degenerated
            kappa = np.clip(
                np.where(have > 1e-3, want / np.maximum(have, 1e-3), 1.0),
                0.4, 4.0,
            )
            new_pts = [
                (x, int(np.clip(round(y * k), 0, 255)))
                for (x, y), k in zip(pts, kappa)
            ]
            setattr(out, f"scaling_points_{plane}", new_pts)
        return out

    def finish(self) -> List[GrainTableSegment]:
        if self._chunk.frames == 0:
            return []
        params = _fit_params(
            self._chunk, self.lag, self.bit_depth, self.seed,
            unit_sigma=highpass_np,
        )
        if params is None:
            return self._fallback_lag0()
        if self.calibrate:
            params = self._calibrate_curves(params)
        start, _ = packet_bounds(0, *self.fps)
        _, end = packet_bounds(self._chunk.frames - 1, *self.fps)
        return [GrainTableSegment(start, end, params)]
