"""Lockstep batched FPS Pallas kernel vs. the XLA fori_loop path
(interpreter mode on CPU; real lowering exercised by bench.py on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from kss_icp_tpu.ops.resample import farthest_point_sampling
from kss_icp_tpu.ops.resample_pallas import fps_batch_pallas
from helpers import random_cloud


def _xla_batch(points, mask, s):
    f = jax.vmap(lambda p, m: farthest_point_sampling(p, m, s))
    return f(jnp.asarray(points), jnp.asarray(mask))


def test_identical_indices_to_xla(rng):
    b, p, s = 3, 400, 150
    pts = np.stack([random_cloud(rng, p) for _ in range(b)]).astype(np.float32)
    mask = np.ones((b, p), bool)
    mask[1, 320:] = False  # one cloud shorter than the rest
    idx_p, sm_p = fps_batch_pallas(
        jnp.asarray(pts), jnp.asarray(mask), s, interpret=True
    )
    idx_x, sm_x = _xla_batch(pts, mask, s)
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))
    np.testing.assert_array_equal(np.asarray(sm_p), np.asarray(sm_x))


def test_fewer_points_than_samples(rng):
    b, p, s = 2, 64, 100
    pts = np.stack([random_cloud(rng, p) for _ in range(b)]).astype(np.float32)
    mask = np.ones((b, p), bool)
    mask[0, 40:] = False
    idx_p, sm_p = fps_batch_pallas(
        jnp.asarray(pts), jnp.asarray(mask), s, interpret=True
    )
    idx_x, sm_x = _xla_batch(pts, mask, s)
    np.testing.assert_array_equal(np.asarray(sm_p), np.asarray(sm_x))
    # Valid prefix must match; tail indices are masked out anyway.
    np.testing.assert_array_equal(
        np.asarray(idx_p)[0, :40], np.asarray(idx_x)[0, :40]
    )
    np.testing.assert_array_equal(np.asarray(idx_p)[1], np.asarray(idx_x)[1])
    assert np.asarray(sm_p)[0].sum() == 40


def test_selection_is_spread_out(rng):
    # FPS property: selected points cover the cloud better than a prefix.
    pts = random_cloud(rng, 512).astype(np.float32)[None]
    mask = np.ones((1, 512), bool)
    idx, sm = fps_batch_pallas(jnp.asarray(pts), jnp.asarray(mask), 32,
                               interpret=True)
    sel = pts[0][np.asarray(idx)[0]]
    d = np.linalg.norm(pts[0][:, None] - sel[None], axis=-1).min(axis=1)
    pre = pts[0][:32]
    dp = np.linalg.norm(pts[0][:, None] - pre[None], axis=-1).min(axis=1)
    assert d.max() < dp.max()
