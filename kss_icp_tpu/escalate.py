"""Fitness-gated escalation: flag -> re-solve on the finer grid -> keep-better.

The single host-side implementation of the robustness pass shared by
`register_pair` (models/kss_icp.py), `register_many` (parallel/batch.py)
and bench.py. Reference intent: KSS_ICP.hpp:99-121 — when the fitness gate
fails, spend more work (there: ICP from EVERY local minimum; here: a finer
16^3 rotation grid with a wider candidate budget) and keep the better
answer per pair.

The pass is pure host logic around jitted solves: find flagged rows, pad
the selection by repetition to a fixed shape ladder (bounding the set of
shape-specialized XLA programs the second pass can compile — compiles
through the TPU tunnel cost minutes), re-solve, and keep the
better-fitness row. Padding repeats flagged[0], so duplicate rows are
benign: keep-better is evaluated per row against the current best.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np


def padded_selection(
    flagged: np.ndarray, pad_multiple: int, cap: Optional[int] = None
) -> np.ndarray:
    """Pad an index list by repeating its first entry up to a multiple of
    `pad_multiple` (optionally capped at `cap` rows)."""
    m = max(int(pad_multiple), 1)
    n = ((flagged.size + m - 1) // m) * m
    if cap is not None:
        n = max(min(n, cap), flagged.size)
    extra = max(n - flagged.size, 0)
    if extra == 0:
        return flagged
    return np.concatenate([flagged, np.repeat(flagged[:1], extra)])


def escalate_rerun(
    resolve: Callable[[np.ndarray], Tuple[object, np.ndarray]],
    fitness: np.ndarray,
    threshold: Optional[float],
    pad_multiple: int,
    result=None,
    cap: Optional[int] = None,
    chunk: Optional[int] = None,
    flags: Optional[np.ndarray] = None,
    near_tie_margin: float = 0.0,
):
    """Run the flag -> padded re-solve -> keep-better pass.

    Args:
      resolve: `resolve(sel) -> (result_tree, fitness2)` re-solves the rows
        indexed by `sel` at escalation settings; `fitness2` is `(len(sel),)`.
      fitness: `(B,)` current per-row fitness (lower is better).
      threshold: rows with fitness > threshold are flagged
        (KSSICPConfig.escalate_threshold).
      pad_multiple: flagged selection is padded by repetition to a multiple
        of this (KSSICPConfig.escalate_pad).
      result: optional pytree with leading axis B. Winning rows are merged
        from resolve's result tree (leaves must be shape-compatible rowwise;
        pass only the subtree whose shapes are config-independent, e.g.
        transform + fitness — NOT the coarse field, whose shape depends on
        the rotation grid).
      cap: maximum padded-selection size (defaults to B).
      chunk: if given, the padded selection is re-solved in chunks of this
        many rows (each chunk is one `resolve` call — bench.py reuses its
        fixed batch-B program this way).
      flags: optional (B,) boolean row selection overriding the fitness
        threshold (polish_rerun selects by RegistrationResult.refine_hit_cap).
      near_tie_margin: adopt the re-solve when
        fit2 < fitness * (1 + near_tie_margin), not only on strict
        improvement. Rationale (ADVICE r4): the escalation config enables
        the symmetric-pose tie-break, whose premise is that the TRUE pose
        can have slightly worse mean-squared fitness than a slid symmetric
        impostor — strict keep-better would discard exactly that
        correction. 0 (the default) preserves strict keep-better; the
        adopted row's RECORDED fitness is always the adopted solve's own
        (never the discarded incumbent's), so downstream tiers gate on an
        honest value.

    Returns `(result, fitness, wins, n_flagged)` where `wins` is a list of
    `(global_index, chunk_result_tree, row_in_chunk)` for every row the
    re-solve improved (useful when `result` is None and the caller merges
    richer state itself).
    """
    import jax

    fitness = np.asarray(fitness).copy()
    b = fitness.shape[0]
    if flags is not None:
        flagged = np.nonzero(np.asarray(flags))[0]
    else:
        flagged = np.nonzero(fitness > threshold)[0]
    if flagged.size == 0:
        return result, fitness, [], 0
    sel = padded_selection(flagged, pad_multiple, cap if cap is not None else b)
    if chunk and sel.size > chunk:
        # Worst-fitness rows first: each chunk's vmapped while_loops run to
        # their own slowest lane, so grouping hard rows together lets the
        # easy chunks exit early (measured r4: part of the 2.77 -> 2.08 s
        # escalation-pass cut).
        sel = sel[np.argsort(-fitness[sel])]
    if result is not None:
        result = jax.tree.map(lambda x: np.asarray(x).copy(), result)
    step = chunk if chunk else sel.size
    wins = []
    for c0 in range(0, sel.size, step):
        csel = sel[c0 : c0 + step]
        res2, fit2 = resolve(csel)
        fit2 = np.asarray(fit2)
        res2_np = None
        for j, gi in enumerate(csel):
            if fit2[j] < fitness[gi] * (1.0 + near_tie_margin):
                fitness[gi] = fit2[j]
                wins.append((int(gi), res2, j))
                if result is not None:
                    if res2_np is None:
                        res2_np = jax.tree.map(np.asarray, res2)

                    def _set(full, new, _gi=gi, _j=j):
                        full[_gi] = new[_j]
                        return full

                    jax.tree.map(_set, result, res2_np)
    return result, fitness, wins, int(flagged.size)


def overlap_rerun(
    resolve: Callable[[np.ndarray], Tuple[object, np.ndarray, np.ndarray, np.ndarray]],
    fitness: np.ndarray,
    threshold: Optional[float],
    pad_multiple: int,
    margin: float,
    result=None,
    cap: Optional[int] = None,
    chunk: Optional[int] = None,
    flags: Optional[np.ndarray] = None,
):
    """The overlap tier of the escalation ladder (VERDICT r3 item 1).

    Rows whose fitness is still above `threshold` after the fine-grid
    escalation are re-solved by the overlap-robust pipeline. Unlike
    escalate_rerun, adoption is NOT by plain fitness (a correct partial
    alignment has worse UNTRIMMED fitness than a wrong crop-biased one by
    construction): `resolve(sel)` must return
    `(result_tree, fit_std, tfit_new, tfit_old)` where tfit_new/tfit_old
    are the BIDIRECTIONAL TRIMMED fitnesses of the overlap solve and the
    incumbent transform (computed in the same jitted program), and fit_std
    the overlap solve's standard fitness for bookkeeping. A row is adopted
    iff tfit_new < margin * tfit_old (margin = cfg.overlap_adopt_margin;
    the measured separation between genuine wins and symmetric slides).

    Returns (result, fitness, wins, n_flagged) like escalate_rerun."""
    import jax

    fitness = np.asarray(fitness).copy()
    b = fitness.shape[0]
    if flags is not None:
        flagged = np.nonzero(np.asarray(flags))[0]
    else:
        flagged = np.nonzero(fitness > threshold)[0]
    if flagged.size == 0:
        return result, fitness, [], 0
    sel = padded_selection(flagged, pad_multiple, cap if cap is not None else b)
    if result is not None:
        result = jax.tree.map(lambda x: np.asarray(x).copy(), result)
    step = chunk if chunk else sel.size
    wins = []
    adopted = set()
    for c0 in range(0, sel.size, step):
        csel = sel[c0 : c0 + step]
        res2, fit_std, tf_new, tf_old = resolve(csel)
        fit_std = np.asarray(fit_std)
        tf_new = np.asarray(tf_new)
        tf_old = np.asarray(tf_old)
        res2_np = None
        for j, gi in enumerate(csel):
            if gi in adopted or not (tf_new[j] < margin * tf_old[j]):
                continue
            adopted.add(int(gi))
            fitness[gi] = fit_std[j]
            wins.append((int(gi), res2, j))
            if result is not None:
                if res2_np is None:
                    res2_np = jax.tree.map(np.asarray, res2)

                def _set(full, new, _gi=gi, _j=j):
                    full[_gi] = new[_j]
                    return full

                jax.tree.map(_set, result, res2_np)
    return result, fitness, wins, int(flagged.size)


def polish_rerun(
    resolve: Callable[[np.ndarray], Tuple[object, np.ndarray]],
    hit_cap: np.ndarray,
    fitness: np.ndarray,
    pad_multiple: int,
    result=None,
    cap: Optional[int] = None,
    chunk: Optional[int] = None,
):
    """Two-stage-converge continuation (KSSICPConfig.refine_polish_iterations):
    rows whose batched final converge ran out of its iteration cap
    (RegistrationResult.refine_hit_cap) are re-launched through `resolve` —
    the small warm-started polish program (models/kss_icp.polish_resampled)
    — and merged keep-better by fitness. Same mechanics as escalation, but
    selection is by the hit-cap flag, not the fitness threshold."""
    return escalate_rerun(resolve, fitness, None, pad_multiple,
                          result=result, cap=cap, chunk=chunk,
                          flags=np.asarray(hit_cap))
