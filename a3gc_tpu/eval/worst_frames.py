r"""Qualitative best/worst-frame extraction.

Capability parity with ``get_worst_frames.py`` (ref: get_worst_frames.py:
26-175): given per-sequence ground-truth/prediction dumps for two models
("tp" vs "our" in the reference), compute the per-frame masked global angle
error of each, and select the k frames where model B most improves over /
regresses from model A — enforcing a minimum frame separation so the
selection spans distinct motions — plus each model's own best/worst frames.

The per-frame error is one jitted call per sequence
(metrics.masked_global_angle_per_frame) instead of the reference's
host-side evaluator loop.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from a3gc_tpu.metrics import masked_global_angle_per_frame
from a3gc_tpu.smpl.model import ParametricModel

__all__ = ["per_frame_errors", "select_extreme_frames", "compare_models"]


def per_frame_errors(model: ParametricModel,
                     gts: Sequence[np.ndarray],
                     preds: Sequence[np.ndarray],
                     joint_mask: Optional[Tuple[int, ...]] = None
                     ) -> np.ndarray:
    r"""Concatenated per-frame mean global angle errors over all sequences
    (ref: get_worst_frames.py:26-36; mask defaults to all non-ignored
    joints like the reference's FullMotionEvaluatorAngleList usage)."""
    errs = []
    for gt, pred in zip(gts, preds):
        gt = jnp.asarray(gt).reshape(-1, 24, 3, 3)
        pred = jnp.asarray(pred).reshape(-1, 24, 3, 3)
        errs.append(np.asarray(masked_global_angle_per_frame(
            model, pred, gt, joint_mask=joint_mask)))
    return np.concatenate(errs)


def select_extreme_frames(scores: np.ndarray, k: int = 10,
                          min_separation: int = 300,
                          largest: bool = True) -> List[int]:
    r"""Pick k frame indices with extreme scores, each at least
    ``min_separation`` frames from every previously selected one
    (ref: get_worst_frames.py:88-121)."""
    order = np.argsort(scores)
    if largest:
        order = order[::-1]
    chosen: List[int] = []
    for idx in order:
        # strictly greater, matching ref: get_worst_frames.py:96-99
        if all(abs(int(idx) - c) > min_separation for c in chosen):
            chosen.append(int(idx))
        if len(chosen) == k:
            break
    return chosen


def compare_models(model: ParametricModel,
                   gts: Sequence[np.ndarray],
                   preds_a: Sequence[np.ndarray],
                   preds_b: Sequence[np.ndarray],
                   k: int = 10, min_separation: int = 300,
                   out_dir: Optional[str] = None,
                   render: bool = False,
                   render_size: int = 360) -> Dict[str, List[int]]:
    r"""Full comparison (ref: get_worst_frames.py:45-175): frames where model
    B most improves on / regresses from model A, plus each model's own
    best/worst frames. Optionally dumps the selected frames' poses as
    pickles under ``out_dir`` (the reference's ``best_worst/`` artifacts).
    ``render=True`` additionally rasterizes each selected frame as a PNG
    (gt | model A | model B skeletons side by side, built-in headless
    renderer) next to the pickles — the qualitative-inspection step the
    reference leaves to a manual Open3D session (ref: model.py:276-362)."""
    err_a = per_frame_errors(model, gts, preds_a)
    err_b = per_frame_errors(model, gts, preds_b)
    assert err_a.shape == err_b.shape
    diff = err_a - err_b    # positive = B better

    result = {
        "b_improves_most": select_extreme_frames(diff, k, min_separation,
                                                 largest=True),
        "b_regresses_most": select_extreme_frames(diff, k, min_separation,
                                                  largest=False),
        "a_worst": select_extreme_frames(err_a, k, min_separation, True),
        "a_best": select_extreme_frames(err_a, k, min_separation, False),
        "b_worst": select_extreme_frames(err_b, k, min_separation, True),
        "b_best": select_extreme_frames(err_b, k, min_separation, False),
    }

    if out_dir:
        gt_all = np.concatenate([np.asarray(g).reshape(-1, 24, 3, 3)
                                 for g in gts])
        a_all = np.concatenate([np.asarray(p).reshape(-1, 24, 3, 3)
                                for p in preds_a])
        b_all = np.concatenate([np.asarray(p).reshape(-1, 24, 3, 3)
                                for p in preds_b])

        # combined per-criterion payloads (this framework's richer format)
        os.makedirs(out_dir, exist_ok=True)
        for name, frames in result.items():
            payload = {
                "frames": frames,
                "gt": gt_all[frames],
                "pred_a": a_all[frames],
                "pred_b": b_all[frames],
                "err_a": err_a[frames],
                "err_b": err_b[frames],
            }
            with open(os.path.join(out_dir, f"{name}.p"), "wb") as f:
                pickle.dump(payload, f)

        # the reference's exact 18-pickle artifact contract
        # (ref: get_worst_frames.py:123-175):
        # best_worst/respect_{our,tp,comp}/{worst,best}/{gt,tp,our}.p —
        # model A is the reference's 'tp', model B its 'our', and 'comp'
        # ranks by err_tp − err_our (worst = B improves most).
        contract = {
            ("respect_our", "worst"): result["b_worst"],
            ("respect_our", "best"): result["b_best"],
            ("respect_tp", "worst"): result["a_worst"],
            ("respect_tp", "best"): result["a_best"],
            ("respect_comp", "worst"): result["b_improves_most"],
            ("respect_comp", "best"): result["b_regresses_most"],
        }
        for (crit, kind), frames in contract.items():
            d = os.path.join(out_dir, crit, kind)
            os.makedirs(d, exist_ok=True)
            for fname, arr in (("gt.p", gt_all), ("tp.p", a_all),
                               ("our.p", b_all)):
                with open(os.path.join(d, fname), "wb") as f:
                    pickle.dump(arr[frames], f)
            if render:
                for rank, fidx in enumerate(frames):
                    poses = jnp.asarray(np.stack(
                        (gt_all[fidx], a_all[fidx], b_all[fidx])),
                        jnp.float32)                         # [3,24,3,3]
                    _, joints = model.forward_kinematics(poses)
                    joints = np.asarray(joints)              # [3,24,3]
                    model.view_joint(                        # gt | A | B
                        [joints[0:1], joints[1:2], joints[2:3]],
                        distance_between_subjects=0.9,
                        out_path=os.path.join(
                            d, f"{rank:02d}_frame{fidx}.png"),
                        size=render_size)
    return result
