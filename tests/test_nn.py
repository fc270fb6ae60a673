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


def test_knn_streaming_matches_dense(rng):
    # The streaming path (query chunks x reference tiles, running top-k
    # merge) must reproduce the dense path exactly, including masking and
    # non-divisible chunk remainders.
    from kss_icp_tpu.ops.nn import knn_streaming

    q = rng.normal(size=(197, 3)).astype(np.float32)
    r = rng.normal(size=(331, 3)).astype(np.float32)
    mask = np.ones(331, bool)
    mask[7] = mask[200] = False
    k = 9
    dd2, didx = knn(jnp.asarray(q), jnp.asarray(r), jnp.asarray(mask), k)
    sd2, sidx = knn_streaming(
        jnp.asarray(q), jnp.asarray(r), jnp.asarray(mask), k,
        query_chunk=64, ref_chunk=48,
    )
    # f32 matmul blocking differs between the (Q, R) dense einsum and the
    # per-tile einsums -> 1-ulp noise; compare with an absolute tolerance.
    np.testing.assert_allclose(np.asarray(sd2), np.asarray(dd2),
                               rtol=1e-5, atol=2e-6)
    # Indices may differ only where distances tie; compare via distances.
    full = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    full[:, ~mask] = np.inf
    np.testing.assert_allclose(
        np.take_along_axis(full, np.asarray(sidx), 1), np.asarray(sd2),
        rtol=1e-5, atol=2e-6,
    )


def test_knn_auto_streams_large_cloud():
    # 10^5-point regime (the reference's octree path,
    # ballRegionCompute.hpp:477-530): knn must auto-route to streaming —
    # the dense (P, P) matrix would be 40 GB at 10^5 points — and normals
    # must come out unit-length. Verified against the dense path on a
    # subsample.
    from kss_icp_tpu.ops.normals import estimate_normals

    rng2 = np.random.default_rng(7)
    n = 40960  # (n*n = 1.7e9 elements > the 2^25 dense limit)
    u = rng2.uniform(-1, 1, n)
    v = rng2.uniform(-1, 1, n)
    pts = np.stack([u, v, 0.3 * np.sin(3 * u) * np.cos(2 * v)], -1).astype(np.float32)
    mask = np.ones(n, bool)
    d2, idx = knn(jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(mask), 12)
    assert d2.shape == (n, 12)
    # Subsample cross-check vs the dense path on the same reference cloud.
    sub = np.arange(0, n, 512)
    dd2, _ = knn(
        jnp.asarray(pts[sub]), jnp.asarray(pts[:16384]),
        jnp.asarray(mask[:16384]), 12,
    )
    sd2, _ = knn(
        jnp.asarray(pts[sub]), jnp.asarray(pts[:16384]),
        jnp.asarray(mask[:16384]), 12, query_chunk=32, ref_chunk=4096,
    )
    np.testing.assert_allclose(np.asarray(sd2), np.asarray(dd2), atol=1e-5)
    normals = estimate_normals(jnp.asarray(pts), jnp.asarray(mask))
    lens = np.linalg.norm(np.asarray(normals), axis=1)
    np.testing.assert_allclose(lens, 1.0, atol=1e-3)
