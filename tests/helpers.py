"""Shared test utilities."""

import numpy as np


def random_cloud(rng, n, scale=1.0):
    """Points on a wavy surface — structured enough for registration."""
    u = rng.uniform(-1, 1, size=(n,))
    v = rng.uniform(-1, 1, size=(n,))
    z = 0.3 * np.sin(3 * u) * np.cos(2 * v)
    return np.stack([u, v, z], axis=-1) * scale


def apply_similarity_np(points, scale, rotation, translation):
    return scale * points @ np.asarray(rotation).T + np.asarray(translation)
