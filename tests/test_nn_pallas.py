"""Pallas tiled 1-NN kernel vs. the XLA path and brute force (interpreter
mode on CPU; the real lowering is exercised by bench.py on TPU)."""

import jax.numpy as jnp
import numpy as np

from kss_icp_tpu.ops.nn import nearest_neighbor
from kss_icp_tpu.ops.nn_pallas import nearest_neighbor_pallas, nearest_neighbor_vpu
from helpers import random_cloud


def _pallas(query, ref, mask, **kw):
    return nearest_neighbor_pallas(
        jnp.asarray(query, jnp.float32),
        jnp.asarray(ref, jnp.float32),
        jnp.asarray(mask),
        interpret=True,
        **kw,
    )


def test_matches_xla_path(rng):
    q = random_cloud(rng, 300).astype(np.float32)
    r = random_cloud(rng, 500).astype(np.float32)
    mask = np.ones((500,), bool)
    d2_p, idx_p = _pallas(q, r, mask, tile_q=128, tile_r=256)
    d2_x, idx_x = nearest_neighbor(
        jnp.asarray(q), jnp.asarray(r), jnp.asarray(mask)
    )
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))
    np.testing.assert_allclose(np.asarray(d2_p), np.asarray(d2_x), atol=1e-5)


def test_respects_ref_mask(rng):
    q = random_cloud(rng, 64).astype(np.float32)
    r = np.concatenate([random_cloud(rng, 100), q[:10] + 1e-4]).astype(np.float32)
    mask = np.ones((110,), bool)
    mask[100:] = False  # the near-duplicates are invalid; must never win
    d2, idx = _pallas(q, r, mask, tile_q=128, tile_r=128)
    assert np.asarray(idx).max() < 100
    # Against brute force over valid rows only.
    d = np.linalg.norm(q[:, None] - r[None, :100], axis=-1) ** 2
    np.testing.assert_allclose(np.asarray(d2), d.min(axis=1), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), d.argmin(axis=1))


def test_non_tile_multiple_sizes(rng):
    q = random_cloud(rng, 137).astype(np.float32)
    r = random_cloud(rng, 391).astype(np.float32)
    mask = np.ones((391,), bool)
    d2, idx = _pallas(q, r, mask, tile_q=128, tile_r=128)
    assert d2.shape == (137,) and idx.shape == (137,)
    d = np.linalg.norm(q[:, None] - r[None, :], axis=-1) ** 2
    np.testing.assert_allclose(np.asarray(d2), d.min(axis=1), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), d.argmin(axis=1))


def test_multi_ref_tiles_running_min(rng):
    # Force several reference tiles so the running-min path is exercised;
    # plant the true NN in the last tile.
    q = np.zeros((8, 3), np.float32)
    r = random_cloud(rng, 512).astype(np.float32) + 5.0
    r[-1] = [0.01, 0.0, 0.0]
    mask = np.ones((512,), bool)
    d2, idx = _pallas(q, r, mask, tile_q=128, tile_r=128)
    np.testing.assert_array_equal(np.asarray(idx), 511)
    np.testing.assert_allclose(np.asarray(d2), 1e-4, rtol=1e-4)


def test_all_masked_reports_big(rng):
    q = random_cloud(rng, 16).astype(np.float32)
    r = random_cloud(rng, 32).astype(np.float32)
    mask = np.zeros((32,), bool)
    d2, _ = _pallas(q, r, mask, tile_q=128, tile_r=128)
    assert np.all(np.asarray(d2) >= 1e29)


def _vpu(query, ref, mask, **kw):
    return nearest_neighbor_vpu(
        jnp.asarray(query, jnp.float32),
        jnp.asarray(ref, jnp.float32),
        jnp.asarray(mask),
        interpret=True,
        **kw,
    )


def test_vpu_matches_brute_force(rng):
    q = random_cloud(rng, 300).astype(np.float32)
    r = random_cloud(rng, 391).astype(np.float32)
    mask = np.ones((391,), bool)
    mask[350:] = False
    d2, idx = _vpu(q, r, mask, tile_q=128)
    d = np.linalg.norm(
        q.astype(np.float64)[:, None] - r.astype(np.float64)[None, :350],
        axis=-1) ** 2
    np.testing.assert_array_equal(np.asarray(idx), d.argmin(axis=1))
    np.testing.assert_allclose(np.asarray(d2), d.min(axis=1),
                               rtol=1e-5, atol=1e-7)


def test_vpu_all_masked_reports_big(rng):
    q = random_cloud(rng, 16).astype(np.float32)
    r = random_cloud(rng, 32).astype(np.float32)
    mask = np.zeros((32,), bool)
    d2, _ = _vpu(q, r, mask, tile_q=128)
    assert np.all(np.asarray(d2) >= 1e29)


def test_vpu_ties_break_to_first_index(rng):
    q = np.zeros((8, 3), np.float32)
    r = np.zeros((256, 3), np.float32)  # all-equal distances
    mask = np.ones((256,), bool)
    _, idx = _vpu(q, r, mask, tile_q=128)
    np.testing.assert_array_equal(np.asarray(idx), 0)
