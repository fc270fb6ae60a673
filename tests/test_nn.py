"""NN ops vs brute-force numpy oracles, with mask correctness."""

import jax.numpy as jnp
import numpy as np

from kss_icp_tpu.ops.nn import (
    knn,
    masked_mean_nn_distance,
    masked_mean_nn_sqdist,
    nearest_neighbor,
    pairwise_sqdist,
)


def brute_nn(query, ref):
    d2 = ((query[:, None, :] - ref[None, :, :]) ** 2).sum(-1)
    return d2.min(axis=1), d2.argmin(axis=1)


def test_pairwise_sqdist_oracle(rng):
    a = rng.normal(size=(40, 3))
    b = rng.normal(size=(60, 3))
    expected = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    got = np.asarray(pairwise_sqdist(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, expected, atol=1e-10)


def test_nearest_neighbor_oracle(rng):
    q = rng.normal(size=(100, 3))
    r = rng.normal(size=(80, 3))
    d2, idx = nearest_neighbor(jnp.asarray(q), jnp.asarray(r), jnp.ones(80, bool))
    ed2, eidx = brute_nn(q, r)
    np.testing.assert_allclose(np.asarray(d2), ed2, atol=1e-10)
    np.testing.assert_array_equal(np.asarray(idx), eidx)


def test_nearest_neighbor_respects_ref_mask(rng):
    q = rng.normal(size=(30, 3))
    r = rng.normal(size=(50, 3))
    mask = np.zeros(50, bool)
    mask[:20] = True
    d2, idx = nearest_neighbor(jnp.asarray(q), jnp.asarray(r), jnp.asarray(mask))
    ed2, eidx = brute_nn(q, r[:20])
    np.testing.assert_allclose(np.asarray(d2), ed2, atol=1e-10)
    np.testing.assert_array_equal(np.asarray(idx), eidx)
    assert np.all(np.asarray(idx) < 20)


def test_nearest_neighbor_chunked_matches(rng):
    q = rng.normal(size=(128, 3))
    r = rng.normal(size=(64, 3))
    mask = jnp.ones(64, bool)
    d2a, ia = nearest_neighbor(jnp.asarray(q), jnp.asarray(r), mask)
    d2b, ib = nearest_neighbor(jnp.asarray(q), jnp.asarray(r), mask, chunk=32)
    np.testing.assert_allclose(np.asarray(d2a), np.asarray(d2b), atol=1e-12)
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))


def test_mean_nn_distance_query_mask(rng):
    q = rng.normal(size=(40, 3))
    r = rng.normal(size=(40, 3))
    qmask = np.zeros(40, bool)
    qmask[:25] = True
    got = float(
        masked_mean_nn_distance(
            jnp.asarray(q), jnp.asarray(qmask), jnp.asarray(r), jnp.ones(40, bool)
        )
    )
    ed2, _ = brute_nn(q[:25], r)
    np.testing.assert_allclose(got, np.sqrt(ed2).mean(), rtol=1e-8)


def test_mean_nn_sqdist_is_pcl_fitness(rng):
    q = rng.normal(size=(32, 3))
    r = rng.normal(size=(48, 3))
    got = float(
        masked_mean_nn_sqdist(
            jnp.asarray(q), jnp.ones(32, bool), jnp.asarray(r), jnp.ones(48, bool)
        )
    )
    ed2, _ = brute_nn(q, r)
    np.testing.assert_allclose(got, ed2.mean(), rtol=1e-8)


def test_knn_oracle(rng):
    q = rng.normal(size=(20, 3))
    r = rng.normal(size=(64, 3))
    k = 5
    d2, idx = knn(jnp.asarray(q), jnp.asarray(r), jnp.ones(64, bool), k)
    full = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    expected = np.sort(full, axis=1)[:, :k]
    np.testing.assert_allclose(np.sort(np.asarray(d2), axis=1), expected, atol=1e-10)
