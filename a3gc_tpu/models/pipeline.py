r"""Pose pipelines: net + reduced-global → full-local pose conversion,
and the 3-stage TransPose cascade.

Capability parity with the ``PoseNet*`` wrappers (ref: net_aagc.py:697-1075)
and the cascade wiring of the evaluators (ref: evaluate_a3gc_tp.py:164-171),
redesigned for JAX: the reference has six near-identical wrapper classes, one
per net type; here ONE generic ``PosePipeline`` is parameterized by a static
config, and the whole 3-stage cascade (net1 → leaf positions → net2 → all
positions → net3 → rotations → IK) compiles into a single jitted program —
including the inverse kinematics that the reference runs as a separate
device-synchronizing step per sequence.

``rotsize`` semantics (identical to ref net_aagc.py:824-829):
  3  → raw per-node 3-vectors (positions), no conversion;
  6  → 6D rotations → full local pose via IK;
  9  → rotation matrices → full local pose via IK.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from a3gc_tpu.config import joint_set as JS
from a3gc_tpu.models import nets as N
from a3gc_tpu.ops import rotations as R
from a3gc_tpu.smpl.model import ParametricModel

__all__ = [
    "PoseNetConfig", "init_pose_net", "pose_net_forward",
    "reduced_global_to_full_local", "forward_offline", "CascadeConfig",
    "cascade_apply", "pose_loss",
]


@struct.dataclass
class PoseNetConfig:
    r"""Static config of one pipeline stage (ref: net_aagc.py:765-775)."""

    net: object = struct.field(pytree_node=False, default=None)  # GraphNetConfig | DIPConfig
    rotsize: int = struct.field(pytree_node=False, default=9)

    @property
    def is_graph(self) -> bool:
        return isinstance(self.net, N.GraphNetConfig)


def init_pose_net(key, cfg: PoseNetConfig, adjacency=None):
    if cfg.is_graph:
        return N.init_graph_net(key, cfg.net, adjacency)
    return N.init_dip(key, cfg.net)


def pose_net_forward(params, cfg: PoseNetConfig, imu: jnp.ndarray,
                     state=None, rng: Optional[jax.Array] = None,
                     frame_mask: Optional[jnp.ndarray] = None):
    r"""Raw net forward (ref: net_aagc.py:810-812)."""
    if cfg.is_graph:
        return N.graph_net_apply(params, cfg.net, imu, state, rng,
                                 frame_mask=frame_mask)
    return N.dip_apply(params, cfg.net, imu, state, rng,
                       frame_mask=frame_mask)


def reduced_global_to_full_local(glb_reduced: jnp.ndarray,
                                 model: ParametricModel,
                                 rotsize: int = 9) -> jnp.ndarray:
    r"""Scatter 15 predicted global rotations into the 24-joint skeleton,
    run IK, and identity-fill the ignored joints
    (ref: net_aagc.py:787-800 ``_reduced_glb_to_full_local_mat``).

    :param glb_reduced: [F, 15, 3, 3] rotation matrices (rotsize 9) or
        [F, 15, 6] 6D rotations (rotsize 6).
    :return: full local pose [F, 24, 3, 3].
    """
    if rotsize == 6:
        glb_reduced = R.r6d_to_rotation_matrix(glb_reduced).reshape(
            -1, JS.n_reduced, 3, 3)
    F = glb_reduced.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=glb_reduced.dtype), (F, 24, 3, 3))
    full_glb = eye.at[:, jnp.asarray(JS.reduced)].set(glb_reduced)
    pose = model.inverse_kinematics_R(full_glb)
    pose = pose.at[:, jnp.asarray(JS.ignored)].set(
        jnp.eye(3, dtype=pose.dtype))
    return pose


def forward_offline(params, cfg: PoseNetConfig, model: Optional[ParametricModel],
                    imu: jnp.ndarray, state=None):
    r"""Offline forward: net + (optional) reduced→full IK conversion
    (ref: net_aagc.py:814-830). imu [B, T, ...] → pose:
      rotsize 9/6 → [B·T, 24, 3, 3]; rotsize 3 → raw net output.
    """
    out, _ = pose_net_forward(params, cfg, imu, state)
    if cfg.rotsize == 9:
        return reduced_global_to_full_local(
            out.reshape(-1, JS.n_reduced, 3, 3), model, rotsize=9)
    if cfg.rotsize == 6:
        return reduced_global_to_full_local(
            out.reshape(-1, JS.n_reduced, 6), model, rotsize=6)
    return out


# ---------------------------------------------------------------------------
# 3-stage cascade (ref: evaluate_a3gc_tp.py:164-171, evaluate_tp.py)
# ---------------------------------------------------------------------------

@struct.dataclass
class CascadeConfig:
    r"""The TransPose-style 3-stage cascade: IMU → leaf pos → all pos → pose."""

    stage1: PoseNetConfig = struct.field(pytree_node=False, default=None)
    stage2: PoseNetConfig = struct.field(pytree_node=False, default=None)
    stage3: PoseNetConfig = struct.field(pytree_node=False, default=None)

    @property
    def is_graph(self) -> bool:
        return self.stage1.is_graph


def cascade_apply(params3: Tuple, cfg: CascadeConfig,
                  model: ParametricModel, imu: jnp.ndarray,
                  frame_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    r"""Full cascade in one jittable program.

    Graph variant (ref: evaluate_a3gc_tp.py:164-171): imu [B, T, 15, 12];
    stage outputs are concatenated onto the node features.
    Flat variant (ref: evaluate_tp.py:120-127): imu [B, T, 72]; stage outputs
    are concatenated onto the flat features.

    :return: full local pose [B·T, 24, 3, 3].
    """
    p1, p2, p3 = params3
    B, T = imu.shape[0], imu.shape[1]

    leaf, _ = pose_net_forward(p1, cfg.stage1, imu, frame_mask=frame_mask)
    if cfg.is_graph:
        leaf = leaf.reshape(B, T, JS.n_reduced, 3)
    x2 = jnp.concatenate((imu, leaf), axis=-1)

    full, _ = pose_net_forward(p2, cfg.stage2, x2, frame_mask=frame_mask)
    if cfg.is_graph:
        full = full.reshape(B, T, JS.n_reduced, 3)
    x3 = jnp.concatenate((imu, full), axis=-1)

    out, _ = pose_net_forward(p3, cfg.stage3, x3, frame_mask=frame_mask)
    rotsize = cfg.stage3.rotsize
    rep = (3, 3) if rotsize == 9 else (rotsize,)
    return reduced_global_to_full_local(
        out.reshape((-1, JS.n_reduced) + rep), model, rotsize=rotsize)


def pose_loss(pred: jnp.ndarray, target: jnp.ndarray,
              loss_weight: Optional[jnp.ndarray] = None,
              frame_mask: Optional[jnp.ndarray] = None,
              sample_weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    r"""Weighted squared error: sum over the last dim, mean over the rest
    (ref: net_aagc.py:1077-1087). ``frame_mask`` [B, T] restricts the mean to
    valid frames (full-sequence validation on end-padded buckets).
    ``sample_weight`` [B] restricts it to real batch elements — the mean a
    partial tail batch padded to the static batch size would have had at its
    native size (the reference's DataLoaders keep tail batches:
    ``drop_last`` defaults False, ref: train_a3gc_tp.py:209-221)."""
    err = jnp.square(target - pred)
    if loss_weight is not None:
        err = err * loss_weight
    err = jnp.sum(err, axis=-1)
    if sample_weight is not None:
        assert frame_mask is None, "sample_weight excludes frame_mask"
        w = sample_weight.reshape(
            sample_weight.shape + (1,) * (err.ndim - 1))
        denom = jnp.sum(sample_weight) * err[0].size
        return jnp.sum(err * w) / jnp.maximum(denom, 1.0)
    if frame_mask is None:
        return jnp.mean(err)
    w = frame_mask.reshape(frame_mask.shape + (1,) * (err.ndim - 2))
    denom = jnp.sum(w) * (err[0, 0].size if err.ndim > 2 else 1.0)
    return jnp.sum(err * w) / jnp.maximum(denom, 1.0)
