r"""Motion-error evaluators — one jitted program per metric suite.

Capability parity with ``articulate/evaluator.py`` (ref: evaluator.py:33-403),
redesigned for TPU:

  * the reference's ``FullMotionEvaluator.__call__`` runs FK+LBS twice, then
    computes each error with cv2-backed angle math on the host
    (ref: evaluator.py:319-345, angular.py:161-164); here the whole suite —
    FK for pred & gt batched together, vertex/joint/angle/jerk/translation
    errors, masked variants — is ONE jit-compiled function;
  * every metric supports a ``n_valid`` frame count so variable-length
    sequences can be padded to bucket sizes and evaluated without
    recompilation (the reference re-runs per sequence at batch 1,
    ref: evaluate_a3gc_tp.py:164);
  * standard deviations are Bessel-corrected (ddof=1) to match torch's
    ``Tensor.std``.

The returned [11, 2] (mean, std) rows are identical to the reference
(ref: evaluator.py:292-345):
  0 joint position err   1 vertex err      2 local angle err (deg)
  3 global angle err     4 pred jerk       5 true jerk
  6 translation err      7 masked pos err  8 masked local angle
  9 masked global angle (SIP when mask = hips+shoulders)   10 jerk err
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from a3gc_tpu.config import joint_set as JS
from a3gc_tpu.ops import rotations as R
from a3gc_tpu.smpl.model import ParametricModel

__all__ = [
    "full_motion_metrics", "masked_global_angle_per_frame", "PoseEvaluator",
    "FullMotionEvaluator", "binary_confusion_matrix",
    "binary_classification_errors", "position_error", "rotation_error",
    "per_joint_errors", "mean_per_joint_errors", "mesh_error",
]


# ---------------------------------------------------------------------------
# weighted statistics (Bessel-corrected, matching torch.std)
# ---------------------------------------------------------------------------

def _wmean(x: jnp.ndarray, w: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mean over ALL elements of x, frame-weighted by w [N] when given."""
    if w is None:
        return jnp.mean(x)
    wx = w.reshape((-1,) + (1,) * (x.ndim - 1))
    denom = jnp.sum(w) * (x.size / x.shape[0])
    return jnp.sum(x * wx) / jnp.maximum(denom, 1.0)


def _wstd_over_frames_mean(x: jnp.ndarray, w: Optional[jnp.ndarray]) -> jnp.ndarray:
    """torch's ``x.std(dim=0).mean()``: per-column ddof-1 std over frames,
    then mean over columns — frame-weighted when w given. x [N, J]."""
    if w is None:
        n = x.shape[0]
        mu = jnp.mean(x, axis=0, keepdims=True)
        var = jnp.sum((x - mu) ** 2, axis=0) / jnp.maximum(n - 1, 1)
        return jnp.mean(jnp.sqrt(var))
    wc = w.reshape(-1, 1)
    n = jnp.sum(w)
    mu = jnp.sum(x * wc, axis=0, keepdims=True) / jnp.maximum(n, 1.0)
    var = jnp.sum(wc * (x - mu) ** 2, axis=0) / jnp.maximum(n - 1.0, 1.0)
    return jnp.mean(jnp.sqrt(var))


def _stats(x: jnp.ndarray, w: Optional[jnp.ndarray]) -> jnp.ndarray:
    return jnp.stack((_wmean(x, w), _wstd_over_frames_mean(x, w)))


# ---------------------------------------------------------------------------
# the full-motion metric suite
# ---------------------------------------------------------------------------

def _window_weights(n_valid, length: int, window: int, dtype):
    """w[i] = 1 if frames [i, i+window] are all valid (end-padded layout)."""
    if n_valid is None:
        return None
    idx = jnp.arange(length)
    return (idx < (n_valid - window)).astype(dtype)


@partial(jax.jit, static_argnames=("fps", "joint_mask", "with_mesh"))
def full_motion_metrics(model: ParametricModel,
                        pose_p: jnp.ndarray, pose_t: jnp.ndarray,
                        shape_p: Optional[jnp.ndarray] = None,
                        shape_t: Optional[jnp.ndarray] = None,
                        tran_p: Optional[jnp.ndarray] = None,
                        tran_t: Optional[jnp.ndarray] = None,
                        n_valid: Optional[jnp.ndarray] = None,
                        fps: int = 60,
                        joint_mask: Optional[Tuple[int, ...]] = None,
                        with_mesh: bool = True) -> jnp.ndarray:
    r"""The 11×[mean, std] motion-error tensor (ref: evaluator.py:292-345).

    :param pose_p/pose_t: local pose rotation matrices [N, 24, 3, 3].
    :param n_valid: optional true frame count when the sequences are
        end-padded to length N (enables bucketed batch evaluation).
    :param joint_mask: static tuple of joint ids for the masked rows.
    """
    N = pose_p.shape[0]
    f = fps
    dtype = pose_p.dtype

    fk = lambda pose, shape, tran: model.forward_kinematics(
        pose, shape, tran, calc_mesh=with_mesh)
    if with_mesh:
        pose_g_p, joint_p, vertex_p = fk(pose_p, shape_p, tran_p)
        pose_g_t, joint_t, vertex_t = fk(pose_t, shape_t, tran_t)
    else:
        pose_g_p, joint_p = fk(pose_p, shape_p, tran_p)
        pose_g_t, joint_t = fk(pose_t, shape_t, tran_t)

    offset = (joint_t[:, :1] - joint_p[:, :1])             # align root
    je = jnp.linalg.norm(joint_p + offset - joint_t, axis=2)       # [N,J]
    lae = R.radian_to_degree(
        R.angle_between(pose_p, pose_t).reshape(N, -1))            # [N,J]
    gae = R.radian_to_degree(
        R.angle_between(pose_g_p, pose_g_t).reshape(N, -1))        # [N,J]

    def jerk(x):
        return (x[3:] - 3 * x[2:-1] + 3 * x[1:-2] - x[:-3]) * (f ** 3)

    jkp = jnp.linalg.norm(jerk(joint_p), axis=2)                   # [N-3,J]
    jkt = jnp.linalg.norm(jerk(joint_t), axis=2)
    jer = jnp.linalg.norm(jerk(joint_p) - jerk(joint_t), axis=2)
    te = jnp.linalg.norm(
        (joint_p[f:, :1] - joint_p[:-f, :1])
        - (joint_t[f:, :1] - joint_t[:-f, :1]), axis=2)            # [N-f,1]

    w = None if n_valid is None else (
        jnp.arange(N) < n_valid).astype(dtype)
    w3 = _window_weights(n_valid, N - 3, 3, dtype)
    wf = _window_weights(n_valid, max(N - f, 0), f, dtype)

    if joint_mask is not None:
        m = jnp.asarray(joint_mask)
        mje, mlae, mgae = je[:, m], lae[:, m], gae[:, m]
    else:
        zero = jnp.zeros((1, 1), dtype)
        mje = mlae = mgae = zero

    wm = w if joint_mask is not None else None
    return jnp.stack((
        _stats(je, w),
        (_stats(jnp.linalg.norm(vertex_p + offset - vertex_t, axis=2), w)
         if with_mesh else jnp.zeros(2, dtype)),
        _stats(lae, w),
        _stats(gae, w),
        _stats(jkp, w3),
        _stats(jkt, w3),
        _stats(te, wf) if N > f else jnp.zeros(2, dtype),
        _stats(mje, wm),
        _stats(mlae, wm),
        _stats(mgae, wm),
        _stats(jer, w3),
    ))


@partial(jax.jit, static_argnames=("joint_mask",))
def masked_global_angle_per_frame(model: ParametricModel,
                                  pose_p: jnp.ndarray, pose_t: jnp.ndarray,
                                  joint_mask: Optional[Tuple[int, ...]] = None
                                  ) -> jnp.ndarray:
    r"""Per-frame mean global angle error in degrees
    (ref: evaluator.py:347-403 ``FullMotionEvaluatorAngleList`` — used by
    get_worst_frames). Returns [N]."""
    N = pose_p.shape[0]
    pose_g_p = model.forward_kinematics_R(pose_p)
    pose_g_t = model.forward_kinematics_R(pose_t)
    gae = R.radian_to_degree(
        R.angle_between(pose_g_p, pose_g_t).reshape(N, -1))
    if joint_mask is not None:
        gae = gae[:, jnp.asarray(joint_mask)]
    return jnp.mean(gae, axis=1)


class FullMotionEvaluator:
    r"""Object-style wrapper mirroring the reference API
    (ref: evaluator.py:269-345): holds the body model + config, ``__call__``
    returns the [11, 2] tensor."""

    def __init__(self, model: ParametricModel, fps: int = 60,
                 joint_mask=None, with_mesh: bool = True):
        self.model = model
        self.fps = fps
        self.joint_mask = (tuple(int(i) for i in joint_mask)
                           if joint_mask is not None else None)
        self.with_mesh = with_mesh

    def __call__(self, pose_p, pose_t, shape_p=None, shape_t=None,
                 tran_p=None, tran_t=None, n_valid=None):
        return full_motion_metrics(
            self.model, pose_p.reshape(-1, 24, 3, 3),
            pose_t.reshape(-1, 24, 3, 3), shape_p, shape_t, tran_p, tran_t,
            n_valid=n_valid, fps=self.fps, joint_mask=self.joint_mask,
            with_mesh=self.with_mesh)


class PoseEvaluator:
    r"""The reporting evaluator of the eval scripts
    (ref: evaluate_a3gc_tp.py:33-50): SIP / angular / positional / jerk /
    jitter errors with the reference's scaling, ignored joints zeroed."""

    METRIC_NAMES = ("SIP Error (deg)", "Angular Error (deg)",
                    "Positional Error (cm)", "jerk error (km/s^3)",
                    "Jitter Error (100m/s^3)")

    def __init__(self, model: ParametricModel, fps: int = 60):
        self.model = model
        self.fps = fps

    def __call__(self, pose_p: jnp.ndarray, pose_t: jnp.ndarray,
                 n_valid=None) -> jnp.ndarray:
        pose_p = pose_p.reshape(-1, 24, 3, 3)
        pose_t = pose_t.reshape(-1, 24, 3, 3)
        ignored = jnp.asarray(JS.ignored)
        eye = jnp.eye(3, dtype=pose_p.dtype)
        pose_p = pose_p.at[:, ignored].set(eye)
        pose_t = pose_t.at[:, ignored].set(eye)
        errs = full_motion_metrics(
            self.model, pose_p, pose_t, n_valid=n_valid, fps=self.fps,
            joint_mask=JS.sip_joints)
        return jnp.stack((errs[9], errs[3], errs[0] * 100,
                          errs[10] / 1000, errs[4] / 100))

    eval = __call__

    @staticmethod
    def format(errors) -> str:
        import numpy as np
        errors = np.asarray(errors)
        return "\n".join(
            "%s: %.2f (+/- %.2f)" % (name, errors[i, 0], errors[i, 1])
            for i, name in enumerate(PoseEvaluator.METRIC_NAMES))


# ---------------------------------------------------------------------------
# basic evaluators (ref: evaluator.py:33-266)
# ---------------------------------------------------------------------------

def binary_confusion_matrix(p: jnp.ndarray, t: jnp.ndarray,
                            is_after_sigmoid: bool = False) -> jnp.ndarray:
    r"""[2,2] confusion matrix, reference convention positive=0, negative=1
    (ref: evaluator.py:33-61)."""
    pred = (p > 0.5) if is_after_sigmoid else (p > 0)
    pred = pred.astype(jnp.float32)
    tp = jnp.sum((pred == 0) & (t == 0))
    fn = jnp.sum((pred == 1) & (t == 0))
    fp = jnp.sum((pred == 0) & (t == 1))
    tn = jnp.sum((pred == 1) & (t == 1))
    return jnp.asarray([[tp, fn], [fp, tn]])


def binary_classification_errors(p: jnp.ndarray, t: jnp.ndarray,
                                 is_after_sigmoid: bool = False) -> jnp.ndarray:
    r"""[3,2] precision/recall/f1 for positive & negative classes
    (ref: evaluator.py:64-97).

    NOTE: zero denominators (a class absent from both pred and target)
    yield NaN — identical to the reference's torch division semantics on
    purpose; callers that need a guard should jnp.nan_to_num the result."""
    (tp, fn), (fp, tn) = binary_confusion_matrix(p, t, is_after_sigmoid)
    prec_p = tp / (tp + fp)
    rec_p = tp / (tp + fn)
    f1_p = 2 / (1 / prec_p + 1 / rec_p)
    prec_n = tn / (tn + fn)
    rec_n = tn / (tn + fp)
    f1_n = 2 / (1 / prec_n + 1 / rec_n)
    return jnp.asarray([[prec_p, prec_n], [rec_p, rec_n], [f1_p, f1_n]])


def position_error(p: jnp.ndarray, t: jnp.ndarray, dimension: int = 3,
                   p_norm: int = 2) -> jnp.ndarray:
    r"""Mean p-norm distance between point sets (ref: evaluator.py:100-129)."""
    d = (p.reshape(-1, dimension) - t.reshape(-1, dimension))
    return jnp.mean(jnp.linalg.norm(d, ord=p_norm, axis=1))


def rotation_error(p: jnp.ndarray, t: jnp.ndarray,
                   rep=R.RotationRepresentation.ROTATION_MATRIX) -> jnp.ndarray:
    r"""Mean angle between rotation sets, degrees (ref: evaluator.py:132-152)."""
    return R.radian_to_degree(jnp.mean(R.angle_between(p, t, rep)))


@partial(jax.jit, static_argnames=("align_joint",))
def per_joint_errors(model: ParametricModel, pose_p: jnp.ndarray,
                     pose_t: jnp.ndarray, align_joint: int = 0) -> jnp.ndarray:
    r"""[3, J]: per-joint position / local angle / global angle errors
    (ref: evaluator.py:155-195)."""
    B = pose_p.shape[0]
    pose_p = pose_p.reshape(B, -1, 3, 3)
    pose_t = pose_t.reshape(B, -1, 3, 3)
    pose_g_p, joint_p = model.forward_kinematics(pose_p)
    pose_g_t, joint_t = model.forward_kinematics(pose_t)
    offset = (joint_t[:, align_joint] - joint_p[:, align_joint])[:, None]
    pos_err = jnp.mean(jnp.linalg.norm(joint_p + offset - joint_t, axis=2),
                       axis=0)
    local = jnp.mean(R.angle_between(pose_p, pose_t).reshape(B, -1), axis=0)
    glob = jnp.mean(R.angle_between(pose_g_p, pose_g_t).reshape(B, -1), axis=0)
    return jnp.stack((pos_err, R.radian_to_degree(local),
                      R.radian_to_degree(glob)))


def mean_per_joint_errors(model: ParametricModel, pose_p, pose_t,
                          align_joint: int = 0) -> jnp.ndarray:
    r"""[3]: means of per_joint_errors (ref: evaluator.py:198-226)."""
    return jnp.mean(per_joint_errors(model, pose_p, pose_t, align_joint),
                    axis=1)


@partial(jax.jit, static_argnames=("align_joint",))
def mesh_error(model: ParametricModel, pose_p, pose_t, shape_p=None,
               shape_t=None, align_joint: int = 0) -> jnp.ndarray:
    r"""Mean mesh vertex position error (ref: evaluator.py:229-266)."""
    B = pose_p.shape[0]
    pose_p = pose_p.reshape(B, -1, 3, 3)
    pose_t = pose_t.reshape(B, -1, 3, 3)
    _, joint_p, mesh_p = model.forward_kinematics(pose_p, shape_p,
                                                  calc_mesh=True)
    _, joint_t, mesh_t = model.forward_kinematics(pose_t, shape_t,
                                                  calc_mesh=True)
    offset = (joint_t[:, align_joint] - joint_p[:, align_joint])[:, None]
    return jnp.mean(jnp.linalg.norm(mesh_p + offset - mesh_t, axis=2))
