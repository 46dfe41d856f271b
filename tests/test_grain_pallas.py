"""Pallas kernel path vs the dav1d-validated reference (interpret mode
on the CPU mesh; the same kernels are hardware-verified by the bench
harness)."""

import copy

import numpy as np
import pytest

from av1_builder import sample_grain_params
from grav1synth_tpu.ops import grain_jax, grain_ref


def _check(params_list, bit_depth=8, h=64, w=64, host_patterns=False):
    rng = np.random.default_rng(5)
    maxv = (1 << bit_depth) - 1
    b = len(params_list)
    # real AV1 4:2:0 chroma geometry: ceil halving ((w+1)>>1)
    y = rng.integers(0, maxv + 1, (b, h, w)).astype(np.int32)
    cb = rng.integers(0, maxv + 1, (b, (h + 1) // 2, (w + 1) // 2)).astype(np.int32)
    cr = rng.integers(0, maxv + 1, (b, (h + 1) // 2, (w + 1) // 2)).astype(np.int32)
    out = grain_jax.apply_grain(
        y, cb, cr, grain_jax.pack_params(params_list), bit_depth,
        backend="pallas",
        host_params=params_list if host_patterns else None,
    )
    out = [np.asarray(o) for o in out]
    for i, p in enumerate(params_list):
        ref = grain_ref.apply_grain_frame([y[i], cb[i], cr[i]], p, bit_depth, 1, 1)
        for pi in range(3):
            bad = int((out[pi][i].astype(np.int64) != ref[pi].astype(np.int64)).sum())
            assert bad == 0, f"frame {i} plane {pi}: {bad} bad"


def test_single():
    _check([sample_grain_params(seed=777)])


def test_mixed_batch():
    p0 = sample_grain_params(seed=777)
    p1 = copy.deepcopy(p0)
    p1.overlap_flag = False
    p2 = copy.deepcopy(p0)
    p2.chroma_scaling_from_luma = True
    p2.scaling_points_cb = []
    p2.scaling_points_cr = []
    p3 = copy.deepcopy(p0)
    p3.clip_to_restricted_range = True
    _check([p0, p1, p2, p3])


def test_10bit():
    _check([sample_grain_params(seed=777)], bit_depth=10)


def test_odd_and_multistripe():
    _check([sample_grain_params(seed=777)], h=70, w=100)
    _check([sample_grain_params(seed=777)], h=128, w=160)


def test_host_patterns_path():
    _check([sample_grain_params(seed=777)], host_patterns=True)


def test_wide_inkernel_avg():
    """256-lane luma windows feed the in-kernel averaged-luma matmuls."""
    _check([sample_grain_params(seed=777)], h=64, w=512)


def test_shifted_last_group():
    """Last chroma lane group's luma window clamps to the padded width
    (the d=128 shifted-P variant)."""
    _check([sample_grain_params(seed=777)], h=40, w=300)


def test_odd_width_edge():
    """Odd frame width duplicates the final luma column in the average
    (edge-patched P), in both the 128- and 256-wide window regimes."""
    _check([sample_grain_params(seed=777)], h=40, w=99)
    _check([sample_grain_params(seed=777)], h=40, w=301)


def test_monochrome():
    p = sample_grain_params(seed=777)
    p.scaling_points_cb = []
    p.scaling_points_cr = []
    p.ar_coeffs_cb = []
    p.ar_coeffs_cr = []
    rng = np.random.default_rng(8)
    y = rng.integers(0, 256, (2, 64, 64)).astype(np.int32)
    pb = grain_jax.pack_params([p, p])
    yo, cbo, cro = grain_jax.apply_grain(
        y, None, None, pb, 8, 1, 1, True, backend="pallas"
    )
    assert cbo is None and cro is None
    for i in range(2):
        ref = grain_ref.apply_grain_frame([y[i]], p, 8, 1, 1)
        assert (np.asarray(yo[i]).astype(np.int64) == ref[0].astype(np.int64)).all()


def test_extreme_scaling_curve():
    """Steep dx=1 segments stress the affine-constant overflow path."""
    p = sample_grain_params(seed=3)
    p.scaling_points_y = [(0, 0), (1, 255), (2, 0), (128, 200), (255, 10)]
    _check([p])


def test_extreme_scaling_curve_10bit():
    """The intentional int32 wrap in c_j = bias - x0*delta combined with
    the high-bit-depth pair evaluation (v >= x0-1 threshold, t + delta
    neighbor) — worst-case curve at 10-bit, on both pattern paths."""
    p = sample_grain_params(seed=3)
    p.scaling_points_y = [(0, 0), (1, 255), (2, 0), (128, 200), (255, 10)]
    _check([p], bit_depth=10)
    _check([p], bit_depth=10, host_patterns=True)


def test_nseg_specialized_10bit():
    """host-params path specializes the scaling segment loop to the
    batch's actual point count AND takes the shared dual-point (pair)
    evaluation at high bit depth — both must stay bit-exact."""
    _check([sample_grain_params(seed=777)], bit_depth=10, host_patterns=True)


def test_nseg_dense_curve():
    """A full 14-point curve under host-params specialization (n_seg
    hits the syntax maximum of 13) at 10-bit, mixed with a sparse one."""
    p = sample_grain_params(seed=9)
    p.scaling_points_y = [
        (x, (x * 7 + 13 * (i % 5)) % 256)
        for i, x in enumerate(range(0, 256, 19))
    ][:14]
    q = sample_grain_params(seed=10)
    q.scaling_points_y = [(0, 30), (255, 60)]
    _check([p, q], bit_depth=10, host_patterns=True)
    _check([p, q], host_patterns=True)


def test_split_kernel_matches_reference():
    """The split luma + packed-pair chroma kernels (the B>=48 production
    path; Cb|Cr pre-rolled copies packed into one int32 buffer, merged
    once) must match grain_ref exactly — called directly since test
    batches are below the SPLIT_BATCH dispatch threshold."""
    import jax.numpy as jnp

    from grav1synth_tpu.ops import grain_pallas as gp

    params_list = [sample_grain_params(seed=777 + i * 10063) for i in range(3)]
    params_list[1].overlap_flag = False
    params_list[2].chroma_scaling_from_luma = True
    params_list[2].scaling_points_cb = []
    params_list[2].scaling_points_cr = []
    bit_depth = 10
    rng = np.random.default_rng(11)
    maxv = (1 << bit_depth) - 1
    b, h, w = len(params_list), 70, 100
    y = rng.integers(0, maxv + 1, (b, h, w)).astype(np.int16)
    cb = rng.integers(0, maxv + 1, (b, (h + 1) // 2, (w + 1) // 2)).astype(np.int16)
    cr = rng.integers(0, maxv + 1, (b, (h + 1) // 2, (w + 1) // 2)).astype(np.int16)

    p = grain_jax.pack_params(params_list)
    pats = grain_jax.generate_patterns(p, bit_depth, 1, 1, False)
    offs = grain_jax.block_offsets(
        p.seed, (h + grain_jax.BLOCK - 1) // grain_jax.BLOCK,
        (w + grain_jax.BLOCK - 1) // grain_jax.BLOCK,
    )
    params3 = jnp.concatenate(
        [
            gp.pack_plane_params(p, "y", bit_depth),
            gp.pack_plane_params(p, "cb", bit_depth),
            gp.pack_plane_params(p, "cr", bit_depth),
        ]
    )
    out = gp.apply_planes_split(
        jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr),
        pats[0], pats[1], pats[2], offs, params3, bit_depth, 1, 1,
    )
    out = [np.asarray(o) for o in out]
    for i, prm in enumerate(params_list):
        ref = grain_ref.apply_grain_frame(
            [y[i].astype(np.int32), cb[i].astype(np.int32), cr[i].astype(np.int32)],
            prm, bit_depth, 1, 1,
        )
        for pi in range(3):
            bad = int((out[pi][i].astype(np.int64) != ref[pi].astype(np.int64)).sum())
            assert bad == 0, f"frame {i} plane {pi}: {bad} bad"
