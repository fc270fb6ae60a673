"""Fused rotation-field Pallas kernel vs. the XLA scoring path (interpreter
mode on CPU; the real lowering is exercised by bench.py on TPU)."""

import jax.numpy as jnp
import numpy as np

from kss_icp_tpu.core.transforms import euler_xyz_matrix
from kss_icp_tpu.models.coarse import rotation_grid, score_rotation_field
from kss_icp_tpu.ops.coarse_pallas import rotation_scores_pallas
from helpers import random_cloud


def _both(rng, p=130, t=100, steps=3, t_valid=None, method="vpu"):
    src = random_cloud(rng, p).astype(np.float32)
    tgt = random_cloud(rng, t).astype(np.float32)
    smask = np.ones((p,), bool)
    tmask = np.ones((t,), bool)
    if t_valid is not None:
        tmask[t_valid:] = False
    angles = rotation_grid(steps, 6.3, jnp.float32)
    rots = euler_xyz_matrix(angles)
    got = rotation_scores_pallas(
        jnp.asarray(src), jnp.asarray(smask), jnp.asarray(tgt),
        jnp.asarray(tmask), rots, tile_q=128, interpret=True, method=method,
    )
    want = score_rotation_field(
        jnp.asarray(src), jnp.asarray(smask), jnp.asarray(tgt),
        jnp.asarray(tmask), steps=steps, span=6.3, backend="xla",
    ).ravel()
    return np.asarray(got), np.asarray(want)


def test_matches_xla_field(rng):
    got, want = _both(rng)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_matches_xla_field_dot_method(rng):
    got, want = _both(rng, method="dot")
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_respects_target_mask(rng):
    got, want = _both(rng, t_valid=40)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_respects_target_mask_dot_method(rng):
    got, want = _both(rng, t_valid=40, method="dot")
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_source_mask_excluded_from_mean(rng):
    src = random_cloud(rng, 256).astype(np.float32)
    tgt = random_cloud(rng, 128).astype(np.float32)
    smask = np.zeros((256,), bool)
    smask[:77] = True
    # Garbage in the masked tail must not affect the mean.
    src[77:] = 1e6
    tmask = np.ones((128,), bool)
    angles = rotation_grid(2, 6.3, jnp.float32)
    rots = euler_xyz_matrix(angles)
    got = rotation_scores_pallas(
        jnp.asarray(src), jnp.asarray(smask), jnp.asarray(tgt),
        jnp.asarray(tmask), rots, tile_q=128, interpret=True,
    )
    want = score_rotation_field(
        jnp.asarray(src), jnp.asarray(smask), jnp.asarray(tgt),
        jnp.asarray(tmask), steps=2, span=6.3, backend="xla",
    ).ravel()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_batched_via_vmap(rng):
    import jax

    src = np.stack([random_cloud(rng, 128) for _ in range(3)]).astype(np.float32)
    tgt = np.stack([random_cloud(rng, 128) for _ in range(3)]).astype(np.float32)
    mask = np.ones((3, 128), bool)
    angles = rotation_grid(2, 6.3, jnp.float32)
    rots = euler_xyz_matrix(angles)
    f = jax.vmap(
        lambda s, sm, t, tm: rotation_scores_pallas(
            s, sm, t, tm, rots, tile_q=128, interpret=True
        )
    )
    got = np.asarray(f(jnp.asarray(src), jnp.asarray(mask),
                       jnp.asarray(tgt), jnp.asarray(mask)))
    for b in range(3):
        want = np.asarray(score_rotation_field(
            jnp.asarray(src[b]), jnp.asarray(mask[b]), jnp.asarray(tgt[b]),
            jnp.asarray(mask[b]), steps=2, span=6.3, backend="xla",
        )).ravel()
        np.testing.assert_allclose(got[b], want, rtol=2e-5, atol=2e-6)
