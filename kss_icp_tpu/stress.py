"""Adversarial stress corpus: compound-rotation synthetic pairs.

The bundled golden pairs (data/registration/transfer.txt) only use
single-axis rotations <= 1.56 rad. This corpus applies compound 3-axis
rotations + scale + translation to the bundled models — the regime where
the rotation grid's local-minima list earns its keep
(initRegistrationKSS.hpp:276-289) and where auto-escalation
(KSSICPConfig.auto_escalate) is required for 30/30 success (BASELINE.md).
Shared by scripts/stress_test.py and bench.py's robustness tail.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Tuple

import numpy as np

DATA = Path("/root/reference/PS_AIS_Simplification/data/registration")
MODELS = ["Bunny", "Cat", "Dog", "Girl", "Horse", "ant", "hand", "woodMan",
          "Angel", "Armadillo"]

# (rx, ry, rz, scale, shift) ground-truth similarity perturbations.
HARD = [
    (2.8, 1.9, 0.9, 1.7, 0.4),
    (3.1, 0.7, 2.4, 0.6, -0.8),
    (1.4, 2.9, 1.8, 2.3, 1.2),
]


def rot_xyz(ax: float, ay: float, az: float) -> np.ndarray:
    cx, sx = np.cos(ax), np.sin(ax)
    cy, sy = np.cos(ay), np.sin(ay)
    cz, sz = np.cos(az), np.sin(az)
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return rz @ ry @ rx


REMESH = Path("/root/reference/PS_AIS_Simplification/Remesh/Advancing")
GOLDEN_ROOT = Path("/root/reference/PS_AIS_Simplification/data")
GOLDEN_SETS = [("registration", ""), ("registration_scale", "s/")]


def golden_corpus(root: Path = GOLDEN_ROOT):
    """The 23 bundled golden pairs: [(name, source(.gird), target(.wlop))].
    Single source of truth for bench.py and scripts/measure_baseline.py —
    the measured-baseline denominator must cover exactly the benchmark
    corpus."""
    from kss_icp_tpu.io.formats import load_points

    pairs = []
    for subdir, prefix in GOLDEN_SETS:
        d = root / subdir
        if not d.exists():
            continue
        names = sorted({p.stem for p in d.glob("*.gird")}
                       & {p.stem for p in d.glob("*.wlop")})
        for name in names:
            pairs.append((prefix + name,
                          np.asarray(load_points(d / f"{name}.gird")),
                          np.asarray(load_points(d / f"{name}.wlop"))))
    return pairs

# Deterministic per-model perturbation cycles (transferPC.hpp:66-130
# semantics: axis rotation, centroid-anchored scale, uniform translation).
_AXES = ["x", "y", "z"]
_ANGLES = [1.56, 1.1, 2.2, 0.8, 2.9]
_SCALES = [1.0, 0.7, 1.4, 2.0, 0.55]
_SHIFTS = [0.0, 0.5, -0.8, 1.2]


def remesh_corpus(
    data: Path = REMESH, seed: int = 0,
) -> List[Tuple[str, np.ndarray, np.ndarray, dict]]:
    """Perturbed pairs from the 25 Remesh/Advancing OFF models — the wider
    accuracy corpus (SURVEY.md §4.1; VERDICT round-1 item #3).

    Per model: vertices are normalized to [-1,1]^3 (PointCloud_Uniform
    semantics, LoadPointCloud.hpp:347-427) and split into two disjoint
    random halves — two independent samplings of the same surface, standing
    in for the reference's dual .gird/.wlop resampling without rebuilding
    its CGAL pipeline — then the source half is perturbed by a
    deterministic transfer.txt-style record. Returns
    [(name, source, target, record_dict), ...]."""
    from kss_icp_tpu.io.formats import load_off, uniform_normalize
    from kss_icp_tpu.transfer import TransferRecord, apply_record

    files = sorted(data.glob("*.off"))
    rng = np.random.default_rng(seed)
    out = []
    for i, f in enumerate(files):
        pts, _ = uniform_normalize(load_off(f))
        perm = rng.permutation(len(pts))
        half = len(pts) // 2
        src_half = pts[perm[:half]]
        tgt_half = pts[perm[half:]]
        rec = TransferRecord(
            name=f.stem,
            axis=_AXES[i % len(_AXES)],
            angle=_ANGLES[i % len(_ANGLES)],
            scale=_SCALES[i % len(_SCALES)],
            translation=_SHIFTS[i % len(_SHIFTS)],
        )
        src = apply_record(src_half, rec).astype(np.float32)
        out.append((f.stem, src, tgt_half.astype(np.float32), {
            "axis": rec.axis, "angle": rec.angle,
            "scale": rec.scale, "translation": rec.translation,
        }))
    return out


def stress_corpus(
    models: List[str] = MODELS, data: Path = DATA,
) -> List[Tuple[str, np.ndarray, np.ndarray]]:
    """[(name, source, target), ...] — 3 hard perturbations per model.

    Synthetic pairs: source = (target @ R^T) * s + t, so perfect recovery
    means RMSE at the resampling-density floor (~0.01-0.03)."""
    from kss_icp_tpu.io.formats import load_points

    out = []
    for name in models:
        tgt = np.asarray(load_points(data / f"{name}.wlop"), np.float32)
        for k, (ax, ay, az, s, t) in enumerate(HARD):
            r = rot_xyz(ax, ay, az)
            out.append((f"{name}/h{k}", (tgt @ r.T) * s + t, tgt))
    return out
