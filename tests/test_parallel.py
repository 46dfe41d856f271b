"""Sharded application on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from av1_builder import sample_grain_params
from grav1synth_tpu.ops import grain_jax, grain_ref
from grav1synth_tpu.parallel import frame_shards, make_mesh, sharded_apply_with_stats


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_apply_matches_reference():
    mesh = make_mesh()
    n = len(mesh.devices)
    b = n
    rng = np.random.default_rng(9)
    y = rng.integers(0, 256, (b, 64, 64)).astype(np.int32)
    cb = rng.integers(0, 256, (b, 32, 32)).astype(np.int32)
    cr = rng.integers(0, 256, (b, 32, 32)).astype(np.int32)
    params = []
    import copy

    base = sample_grain_params(seed=100)
    for i in range(b):
        p = copy.deepcopy(base)
        p.grain_seed = (100 + i * 10063) & 0xFFFF
        params.append(p)
    pb = grain_jax.pack_params(params)
    y2, cb2, cr2, energy, frames = sharded_apply_with_stats(
        mesh, jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr), pb, 8,
        backend="xla",
    )
    assert float(frames) == b
    assert float(energy) > 0
    y2 = np.asarray(y2)
    for i, p in enumerate(params):
        ref = grain_ref.apply_grain_frame([y[i], cb[i], cr[i]], p, 8, 1, 1)
        assert (y2[i].astype(np.int64) == ref[0].astype(np.int64)).all()


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == args[0].shape


def test_frame_shards():
    shards = frame_shards(100, 8)
    assert shards[0] == (0, 13)
    assert shards[-1] == (88, 100)
    assert sum(e - s for s, e in shards) == 100
    assert all(e > s for s, e in shards)
