"""CI pin for the overlap-tier adoption calibration (VERDICT r4 item 6).

The overlap ladder's two measured constants —
``overlap_adopt_margin = 0.7`` (adopt an overlap solve iff its
bidirectional trimmed fitness beats the incumbent's by this ratio) and
``overlap_gate_ratio = 1.05`` (launch the overlap solve only when the
incumbent's trimmed/standard fitness ratio shows a heavy error tail) —
were calibrated on thin populations (12 adoption decisions, one gate
sweep; config.py:219-249). This test recomputes both ratio populations on
a small fixed corpus so a corpus or solver change that closes either gap
fails HERE, not on the challenge board:

  adoption:  genuine partial-overlap wins must adopt (ratio < margin) and
             full-overlap density-floor solves must block (ratio > margin),
             with >= 1.15x separation between the two populations across
             the margin;
  gate:      partial incumbents must pass the crop-signature gate
             (trimmed/standard < gate_ratio) and well-converged
             full-overlap solves must be stopped by it, again with
             >= 1.15x separation.

Sizes are reduced (2000-point clouds, 8^3 grid) to bound CPU runtime; the
populations at this scale were measured in round 5 and sit in the same
gaps as the production-scale numbers recorded in config.py.
"""

from __future__ import annotations

import numpy as np
import pytest

SEPARATION = 1.15


@pytest.fixture(scope="module")
def populations():
    import jax.numpy as jnp

    from kss_icp_tpu.challenge import category_corpus, partial_corpus
    from kss_icp_tpu.config import KSSICPConfig
    from kss_icp_tpu.models.kss_icp import (
        register_overlap_resampled,
        register_resampled,
        resample_pairs,
        trimmed_fitness,
    )

    cfg = KSSICPConfig(
        max_candidates=6, coarse_points=512, coarse_target_points=512,
        refine_candidates=2, refine_tier_iterations=12,
        refine_max_iterations=48, auto_escalate=False)

    # Fixed corpus: hard-partial pairs (the overlap tier's genuine wins)
    # + full-overlap category pairs (the slides/no-ops the margin blocks).
    hard = partial_corpus(n_points=2000, keep=0.8)
    full = category_corpus(instances=2, n_points=2000)
    win_pairs = [hard[i] for i in (0, 2, 4)]      # se0, rev0, box0
    slide_pairs = [full[i] for i in (0, 2, 4)]    # se/0, rev/0, box/0

    def solve_ratios(pairs):
        rows = []
        for name, src, tgt, _gt in pairs:
            pad = 4096
            sp = np.zeros((1, pad, 3), np.float32)
            sp[0, : len(src)] = src[:pad]
            sm = np.zeros((1, pad), bool)
            sm[0, : len(src)] = True
            tp = np.zeros((1, pad, 3), np.float32)
            tp[0, : len(tgt)] = tgt[:pad]
            tm = np.zeros((1, pad), bool)
            tm[0, : len(tgt)] = True
            pn = jnp.asarray(
                [cfg.resample_count(len(src), len(tgt))], jnp.int32)
            (rs, rsm), (rt, rtm) = resample_pairs(
                jnp.asarray(sp), jnp.asarray(sm), jnp.asarray(tp),
                jnp.asarray(tm), pn, cfg)
            a = (rs[0], rsm[0], rt[0], rtm[0])
            inc = register_resampled(*a, cfg)
            q = cfg.overlap_trim_fraction
            tf_old = float(trimmed_fitness(inc.transform, *a, q))
            fit_std = float(inc.fitness)
            ovl = register_overlap_resampled(*a, cfg.overlap_config())
            tf_new = float(ovl.fitness)
            rows.append({
                "name": name,
                "adopt_ratio": tf_new / max(tf_old, 1e-12),
                "gate_ratio": tf_old / max(fit_std, 1e-12),
            })
        return rows

    return {"win": solve_ratios(win_pairs),
            "slide": solve_ratios(slide_pairs),
            "cfg": cfg}


def test_adoption_margin_sits_in_gap(populations):
    from kss_icp_tpu.config import DEFAULT_CONFIG

    margin = DEFAULT_CONFIG.overlap_adopt_margin
    win = max(r["adopt_ratio"] for r in populations["win"])
    slide = min(r["adopt_ratio"] for r in populations["slide"])
    assert win < margin, (
        f"genuine overlap wins no longer adopt: max win ratio {win:.3f} "
        f">= margin {margin} ({populations['win']})")
    assert slide > margin, (
        f"full-overlap solves would be overwritten: min slide ratio "
        f"{slide:.3f} <= margin {margin} ({populations['slide']})")
    assert slide / win >= SEPARATION, (
        f"adoption populations too close: {win:.3f} vs {slide:.3f} "
        f"(separation {slide / win:.2f}x < {SEPARATION}x)")


def test_gate_ratio_sits_in_gap(populations):
    from kss_icp_tpu.config import DEFAULT_CONFIG

    gate = DEFAULT_CONFIG.overlap_gate_ratio
    # Partial incumbents carry a heavy tail: trimmed << standard fitness.
    part = max(r["gate_ratio"] for r in populations["win"])
    # Well-converged full-overlap solves have uniform (density-floor)
    # error: trimming buys little, the bidirectional sum adds its own
    # floor, so the ratio sits above the gate.
    floor = min(r["gate_ratio"] for r in populations["slide"])
    assert part < gate, (
        f"partial incumbents no longer pass the crop-signature gate: "
        f"{part:.3f} >= {gate} ({populations['win']})")
    assert floor > gate, (
        f"density-floor pairs would pay the overlap solves every pass: "
        f"{floor:.3f} <= {gate} ({populations['slide']})")
    assert floor / part >= SEPARATION, (
        f"gate populations too close: {part:.3f} vs {floor:.3f} "
        f"(separation {floor / part:.2f}x < {SEPARATION}x)")
