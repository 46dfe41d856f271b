"""Quantitative quality bar for the single-input estimator.

Same closed loop as the diff harness (test_diff_quality): inject KNOWN
grain with the dav1d-bit-exact engine into smooth content, hand the
estimator ONLY the grainy frames, and score the recovered table. The
reference never finished this pipeline (main.rs:602-605 commented out),
so these bars are ours: slightly looser than diff's because the
estimator must self-denoise, but they still require real AR character
(lag >= 1) and a quantitatively correct scaling curve.
"""

import numpy as np
import pytest

from grav1synth_tpu.obu.types import FilmGrainParams
from grav1synth_tpu.ops import grain_ref
from grav1synth_tpu.ops.estimate import NoiseEstimator


def smooth_clip(n=12, h=256, w=320, seed=4):
    """Very smooth content (gradients + a soft blob): flat-block
    masking keeps what little structure there is out of the fit."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 40 + 140 * (xx / w) + 25 * (yy / h)
    frames = []
    for i in range(n):
        cx = w * (0.3 + 0.01 * i)
        blob = 40 * np.exp(-(((xx - cx) ** 2 + (yy - h * 0.4) ** 2) / (2 * 60.0**2)))
        y = np.clip(base + blob + rng.normal(0, 0.2), 10, 245)
        frames.append(y.astype(np.int32))
    return frames


def true_params() -> FilmGrainParams:
    return FilmGrainParams(
        grain_seed=2024,
        scaling_points_y=[(0, 30), (100, 55), (180, 64), (255, 28)],
        scaling_shift=8,
        ar_coeff_lag=2,
        ar_coeffs_y=[4, -2, 8, 2, -10, 6, 3, -2, 12, 1, -5, 38],
        ar_coeffs_cb=[0] * 13,
        ar_coeffs_cr=[0] * 13,
        ar_coeff_shift=7,
        overlap_flag=True,
    )


def inject(frames, params):
    import dataclasses

    out = []
    for i, y in enumerate(frames):
        p = dataclasses.replace(
            params, grain_seed=(params.grain_seed + i * 173) & 0xFFFF
        )
        planes = grain_ref.apply_grain_frame(
            [y, np.full((y.shape[0] // 2, y.shape[1] // 2), 128, np.int32),
             np.full((y.shape[0] // 2, y.shape[1] // 2), 128, np.int32)],
            p, 8, 1, 1,
        )
        out.append(planes[0])
    return out


def sigma_curve(params, xs):
    pat = grain_ref.generate_grain(params, 8, False, 1, 1)
    sg = float(pat.luma[3:, 3:-3].astype(np.float64).std())
    lut = grain_ref.build_scaling_lut(params.scaling_points_y, 8)
    return np.array([lut[x] * sg / (1 << params.scaling_shift) for x in xs])


@pytest.fixture(scope="module")
def recovered():
    params = true_params()
    clean = smooth_clip()
    grainy = inject(clean, params)
    est = NoiseEstimator((24, 1), bit_depth=8)
    # batched path (the pipeline's): also covers push_batch
    est.push_batch(grainy[:7])
    est.push_batch(grainy[7:])
    segs = est.finish()
    assert len(segs) == 1
    return params, segs[0].params


class TestEstimateQuality:
    def test_ar_aware(self, recovered):
        _, got = recovered
        assert got.ar_coeff_lag >= 1, "estimate must fit AR character"
        assert any(c != 0 for c in got.ar_coeffs_y)

    def test_scaling_curve_error(self, recovered):
        injected, got = recovered
        xs = np.arange(50, 210)  # intensity range the content populates
        want = sigma_curve(injected, xs)
        have = sigma_curve(got, xs)
        rel = np.abs(have - want) / np.maximum(want, 1e-6)
        assert float(np.median(rel)) < 0.20, float(np.median(rel))

    def test_ar_character(self, recovered):
        """Normalized autocorrelation of the recovered pattern tracks
        the injected one at short lags."""
        injected, got = recovered

        def autocorr(params):
            pat = grain_ref.generate_grain(params, 8, True, 1, 1).luma[
                3:, 3:-3
            ].astype(np.float64)
            pat = pat - pat.mean()
            var = (pat * pat).mean()
            out = []
            h, w = pat.shape
            for dr, dc in ((0, 1), (1, 0), (1, 1), (0, 2), (2, 0), (1, -1)):
                a = pat[max(dr, 0) : h + min(dr, 0), max(dc, 0) : w + min(dc, 0)]
                b = pat[max(-dr, 0) : h + min(-dr, 0), max(-dc, 0) : w + min(-dc, 0)]
                out.append(float((a * b).mean() / var))
            return np.array(out)

        want = autocorr(injected)
        have = autocorr(got)
        assert np.abs(want - have).max() < 0.18, (want, have)

    def test_resynthesized_energy(self, recovered):
        injected, got = recovered
        clean = smooth_clip(n=3, seed=9)
        e_inj = e_got = 0.0
        for y in clean:
            planes = [
                y,
                np.full((y.shape[0] // 2, y.shape[1] // 2), 128, np.int32),
                np.full((y.shape[0] // 2, y.shape[1] // 2), 128, np.int32),
            ]
            a = grain_ref.apply_grain_frame(list(planes), injected, 8, 1, 1)
            b = grain_ref.apply_grain_frame(list(planes), got, 8, 1, 1)
            e_inj += float(((a[0] - y) ** 2).mean())
            e_got += float(((b[0] - y) ** 2).mean())
        assert e_got == pytest.approx(e_inj, rel=0.35), (e_inj, e_got)

    def test_streaming_equals_batched(self):
        params = true_params()
        clean = smooth_clip(n=6)
        grainy = inject(clean, params)
        e1 = NoiseEstimator((24, 1))
        e2 = NoiseEstimator((24, 1))
        for y in grainy:
            e1.push_frame(y)
        e2.push_batch(grainy)
        t1, t2 = e1.finish(), e2.finish()
        assert len(t1) == len(t2) == 1
        assert t1[0].params.equal_ignoring_seed(t2[0].params)
        assert np.allclose(e1.per_frame_sigma, e2.per_frame_sigma, atol=1e-3)
