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
        # round-5 bar: measured 0.012-0.016 with the closed-loop curve
        # calibration (was < 0.20)
        assert float(np.median(rel)) < 0.08, float(np.median(rel))

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
        # round-5 bar: measured ratio 1.01 calibrated (was rel=0.35)
        assert e_got == pytest.approx(e_inj, rel=0.15), (e_inj, e_got)

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


def true_params_chroma() -> FilmGrainParams:
    """Known grain with real chroma character: explicit chroma curves,
    nonzero chroma AR coefficients including the cross-plane term, and
    the identity chroma-scaling linearization the estimator assumes."""
    return FilmGrainParams(
        grain_seed=2025,
        scaling_points_y=[(0, 30), (120, 52), (255, 30)],
        scaling_points_cb=[(0, 26), (128, 40), (255, 22)],
        scaling_points_cr=[(0, 34), (100, 22), (255, 30)],
        scaling_shift=8,
        ar_coeff_lag=2,
        ar_coeffs_y=[4, -2, 8, 2, -10, 6, 3, -2, 12, 1, -5, 38],
        ar_coeffs_cb=[2, -1, 6, 1, -8, 5, 2, -1, 10, 0, -4, 30, 18],
        ar_coeffs_cr=[3, 0, 5, 2, -6, 4, 1, -2, 9, 1, -3, 26, -14],
        ar_coeff_shift=7,
        cb_mult=192, cb_luma_mult=128, cb_offset=256,
        cr_mult=192, cr_luma_mult=128, cr_offset=256,
        overlap_flag=True,
    )


def smooth_clip_chroma(n=12, h=256, w=320, seed=4):
    """[y, cb, cr] smooth frames with intensity sweeps on every plane."""
    ys = smooth_clip(n, h, w, seed)
    yy, xx = np.mgrid[0 : h // 2, 0 : w // 2]
    cb = np.clip(60 + 150 * (xx / (w // 2)) + 10 * (yy / (h // 2)), 0, 255)
    cr = np.clip(210 - 160 * (xx / (w // 2)) - 8 * (yy / (h // 2)), 0, 255)
    return [
        [y, cb.astype(np.int32).copy(), cr.astype(np.int32).copy()]
        for y in ys
    ]


def inject_chroma(frames, params):
    import dataclasses

    out = []
    for i, planes in enumerate(frames):
        p = dataclasses.replace(
            params, grain_seed=(params.grain_seed + i * 173) & 0xFFFF
        )
        out.append(grain_ref.apply_grain_frame(list(planes), p, 8, 1, 1))
    return out


def sigma_curve_chroma(params, xs, plane):
    pat = grain_ref.generate_grain(params, 8, False, 1, 1)
    pp = pat.cb if plane == "cb" else pat.cr
    pts = (
        params.scaling_points_cb if plane == "cb" else params.scaling_points_cr
    )
    sg = float(pp[3:, 3:-3].astype(np.float64).std())
    lut = grain_ref.build_scaling_lut(pts, 8)
    return np.array([lut[x] * sg / (1 << params.scaling_shift) for x in xs])


@pytest.fixture(scope="module")
def recovered_chroma():
    params = true_params_chroma()
    clean = smooth_clip_chroma()
    grainy = inject_chroma(clean, params)
    est = NoiseEstimator((24, 1), bit_depth=8)
    est.push_batch(grainy[:7])
    est.push_batch(grainy[7:])
    segs = est.finish()
    assert len(segs) == 1
    return params, segs[0].params


class TestEstimateChroma:
    """Chroma-aware single-input estimation quality bars — the part of
    the reference's estimate that never existed at all (its unstable
    pipeline only ever touched plane 0, main.rs:570)."""

    def test_chroma_fitted(self, recovered_chroma):
        _, got = recovered_chroma
        assert got.scaling_points_cb, "cb scaling points missing"
        assert got.scaling_points_cr, "cr scaling points missing"
        assert any(c != 0 for c in got.ar_coeffs_cb)
        assert any(c != 0 for c in got.ar_coeffs_cr)

    @pytest.mark.parametrize("plane", ["cb", "cr"])
    def test_chroma_curve_error(self, recovered_chroma, plane):
        injected, got = recovered_chroma
        xs = np.arange(70, 200)
        want = sigma_curve_chroma(injected, xs, plane)
        have = sigma_curve_chroma(got, xs, plane)
        rel = np.abs(have - want) / np.maximum(want, 1e-6)
        # round-5 bar: measured 0.022-0.033 calibrated (was < 0.25 —
        # the verdict's "attack or document" item; the attack worked
        # for the normal regime, see test_lowfreq_grain_limit for the
        # documented limit)
        assert float(np.median(rel)) < 0.08, float(np.median(rel))

    def test_chroma_resynthesized_energy(self, recovered_chroma):
        injected, got = recovered_chroma
        clean = smooth_clip_chroma(n=3, seed=9)
        e_inj = np.zeros(2)
        e_got = np.zeros(2)
        for planes in clean:
            a = grain_ref.apply_grain_frame(list(planes), injected, 8, 1, 1)
            b = grain_ref.apply_grain_frame(list(planes), got, 8, 1, 1)
            for k in (1, 2):
                e_inj[k - 1] += float(((a[k] - planes[k]) ** 2).mean())
                e_got[k - 1] += float(((b[k] - planes[k]) ** 2).mean())
        for k in range(2):
            # round-5 bar: measured ratios 1.09 / 0.99 calibrated
            # (was rel=0.40)
            assert e_got[k] == pytest.approx(e_inj[k], rel=0.20), (
                k, e_inj[k], e_got[k],
            )


def test_lowfreq_grain_limit():
    """Documented measured limit (round 5): strongly LOW-frequency
    (blobby) grain is under-recovered by the single-input estimator —
    the 9-px blur pseudo-denoiser absorbs most of its energy, the AR
    fit sees the high-passed process and cannot reproduce the true
    spectral shape, so even the closed-loop curve calibration (which
    measures the pipeline's gain on the FITTED character) recovers
    only part of it: median curve error ~0.53 calibrated vs ~0.61
    uncalibrated on this fixture. The diff pipeline, which has a true
    denoised reference, does not share this limit (its bar is <0.10).
    This test pins the limit so a regression (or an improvement) is
    visible."""
    import dataclasses

    params = FilmGrainParams(
        grain_seed=2024,
        scaling_points_y=[(0, 35), (120, 60), (255, 30)],
        scaling_shift=8,
        ar_coeff_lag=2,
        ar_coeffs_y=[2, 4, 10, 4, -4, 24, 30, -4, 10, 24, 8, 60],
        ar_coeffs_cb=[0] * 13,
        ar_coeffs_cr=[0] * 13,
        ar_coeff_shift=7,
        overlap_flag=True,
    )
    grainy = inject(smooth_clip(), params)
    est = NoiseEstimator((24, 1), bit_depth=8)
    est.push_batch(grainy[:7])
    est.push_batch(grainy[7:])
    segs = est.finish()
    assert segs, "estimator must still produce a table"
    xs = np.arange(50, 210)
    want = sigma_curve(params, xs)
    have = sigma_curve(segs[0].params, xs)
    rel = float(np.median(np.abs(have - want) / np.maximum(want, 1e-6)))
    # the limit: better than the uncalibrated 0.61, not near the
    # normal-regime bar — tighten this if the estimator improves
    assert rel < 0.58, rel
