r"""Articulated-body kinematics — tree FK/IK as level-batched jnp ops.

Capability parity with ``articulate/math/spatial.py`` (ref: spatial.py:60-309),
redesigned for XLA: the reference walks the kinematic tree one joint at a time
(``_forward_tree``, ref: spatial.py:104-112 — 23 sequential [B,3,3] bmms per
call). Here joints are grouped by tree depth, so FK is one batched gather +
matmul per *level* (depth ≤ 8 for SMPL instead of 23 steps) and IK is fully
parallel (a single gather + matmul, since every local rotation depends only on
its parent's global rotation).

Parent lists are static Python tuples, so everything specializes at trace time
and stays inside one fused XLA computation.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "transformation_matrix", "transformation_matrix_np",
    "adjoint_transformation_matrix_np", "decode_transformation_matrix",
    "inverse_transformation_matrix", "bone_vector_to_joint_position",
    "joint_position_to_bone_vector", "forward_kinematics_R",
    "inverse_kinematics_R", "forward_kinematics_T", "inverse_kinematics_T",
    "forward_kinematics", "tree_levels",
]


def _canonical_parent(parent: Sequence[Optional[int]]) -> Tuple[int, ...]:
    """Parent list with the root marked as -1 (accepts None / -1 at index 0)."""
    out = []
    for i, p in enumerate(parent):
        if i == 0 or p is None or p < 0:
            out.append(-1)
        else:
            assert p < i, "parent[i] must be smaller than i"
            out.append(int(p))
    return tuple(out)


@lru_cache(maxsize=None)
def tree_levels(parent: Tuple[int, ...]) -> Tuple[Tuple[int, ...], ...]:
    """Group joint indices by depth. level[0] = roots, level[d] = depth-d joints."""
    parent = _canonical_parent(parent)
    depth = [0] * len(parent)
    for i, p in enumerate(parent):
        if p >= 0:
            depth[i] = depth[p] + 1
    levels = [[] for _ in range(max(depth) + 1)]
    for i, d in enumerate(depth):
        levels[d].append(i)
    return tuple(tuple(l) for l in levels)


# ---------------------------------------------------------------------------
# homogeneous transforms (ref: spatial.py:60-101)
# ---------------------------------------------------------------------------

def transformation_matrix(R: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    r"""Build T_sb ∈ SE(3) from R [*, 3, 3] and p [*, 3] (ref: spatial.py:60-75)."""
    Rp = jnp.concatenate((R, p[..., None]), axis=-1)
    bottom = jnp.zeros(Rp.shape[:-2] + (1, 4), dtype=R.dtype)
    bottom = bottom.at[..., 0, 3].set(1.0)
    return jnp.concatenate((Rp, bottom), axis=-2)


def decode_transformation_matrix(T: jnp.ndarray):
    r"""Split T into (R, p) (ref: spatial.py:78-87)."""
    return T[..., :3, :3], T[..., :3, 3]


def inverse_transformation_matrix(T: jnp.ndarray) -> jnp.ndarray:
    r"""Closed-form SE(3) inverse (ref: spatial.py:90-101)."""
    R, p = decode_transformation_matrix(T)
    invR = jnp.swapaxes(R, -1, -2)
    invp = -jnp.einsum("...ij,...j->...i", invR, p, precision=jax.lax.Precision.HIGHEST)
    return transformation_matrix(invR, invp)


# ---------------------------------------------------------------------------
# level-batched tree reductions
# ---------------------------------------------------------------------------

def _forward_tree_matmul(x_local: jnp.ndarray, parent) -> jnp.ndarray:
    """Compose square matrices root→leaf. x_local [B, J, k, k] → [B, J, k, k]."""
    parent = _canonical_parent(tuple(parent))
    levels = tree_levels(parent)
    x_global = x_local
    for level in levels[1:]:
        idx = jnp.asarray(level)
        pidx = jnp.asarray([parent[i] for i in level])
        composed = jnp.einsum("bjxy,bjyz->bjxz", x_global[:, pidx], x_local[:, idx], precision=jax.lax.Precision.HIGHEST)
        x_global = x_global.at[:, idx].set(composed)
    return x_global


def _forward_tree_add(x_local: jnp.ndarray, parent) -> jnp.ndarray:
    """Accumulate vectors root→leaf (prefix sums along branches)."""
    parent = _canonical_parent(tuple(parent))
    levels = tree_levels(parent)
    x_global = x_local
    for level in levels[1:]:
        idx = jnp.asarray(level)
        pidx = jnp.asarray([parent[i] for i in level])
        x_global = x_global.at[:, idx].set(x_global[:, pidx] + x_local[:, idx])
    return x_global


def _parent_gather(x: jnp.ndarray, parent) -> jnp.ndarray:
    """x[:, parent[i]] with the root mapped to itself."""
    parent = _canonical_parent(tuple(parent))
    pidx = jnp.asarray([p if p >= 0 else i for i, p in enumerate(parent)])
    return x[:, pidx]


def _root_mask(parent, dtype=jnp.float32) -> jnp.ndarray:
    parent = _canonical_parent(tuple(parent))
    return jnp.asarray([1.0 if p < 0 else 0.0 for p in parent], dtype=dtype)


# ---------------------------------------------------------------------------
# public tree ops (ref: spatial.py:126-309)
# ---------------------------------------------------------------------------

def bone_vector_to_joint_position(bone_vec: jnp.ndarray, parent) -> jnp.ndarray:
    r"""Bone vectors → joint positions in the base frame (ref: spatial.py:126-145)."""
    bone_vec = bone_vec.reshape(bone_vec.shape[0], -1, 3)
    return _forward_tree_add(bone_vec, parent)


def joint_position_to_bone_vector(joint_pos: jnp.ndarray, parent) -> jnp.ndarray:
    r"""Joint positions → bone vectors (ref: spatial.py:148-167). Fully parallel:
    bone[i] = pos[i] - pos[parent[i]] (root keeps its position)."""
    joint_pos = joint_pos.reshape(joint_pos.shape[0], -1, 3)
    parent_pos = _parent_gather(joint_pos, parent)
    mask = _root_mask(parent, joint_pos.dtype)[None, :, None]
    return joint_pos - parent_pos * (1.0 - mask)


def forward_kinematics_R(R_local: jnp.ndarray, parent) -> jnp.ndarray:
    r"""Local → global joint rotations (ref: spatial.py:170-194)."""
    R_local = R_local.reshape(R_local.shape[0], -1, 3, 3)
    return _forward_tree_matmul(R_local, parent)


def inverse_kinematics_R(R_global: jnp.ndarray, parent) -> jnp.ndarray:
    r"""Global → local joint rotations (ref: spatial.py:197-221).

    R_local[i] = R_global[parent[i]]ᵀ @ R_global[i] — depends only on the
    parent's *global* rotation, so this is a single gather + batched matmul
    (the reference loops joint-by-joint, ref: spatial.py:115-123).
    """
    R_global = R_global.reshape(R_global.shape[0], -1, 3, 3)
    parent_R = _parent_gather(R_global, parent)
    local = jnp.einsum("bjyx,bjyz->bjxz", parent_R, R_global, precision=jax.lax.Precision.HIGHEST)  # parentᵀ @ child
    mask = _root_mask(parent, R_global.dtype)[None, :, None, None]
    return local * (1.0 - mask) + R_global * mask


def forward_kinematics_T(T_local: jnp.ndarray, parent) -> jnp.ndarray:
    r"""Local → global homogeneous transforms (ref: spatial.py:224-249)."""
    T_local = T_local.reshape(T_local.shape[0], -1, 4, 4)
    return _forward_tree_matmul(T_local, parent)


def inverse_kinematics_T(T_global: jnp.ndarray, parent) -> jnp.ndarray:
    r"""Global → local homogeneous transforms (ref: spatial.py:252-277).
    Fully parallel like inverse_kinematics_R."""
    T_global = T_global.reshape(T_global.shape[0], -1, 4, 4)
    parent_T = _parent_gather(T_global, parent)
    local = jnp.einsum("bjxy,bjyz->bjxz", inverse_transformation_matrix(parent_T),
                       T_global, precision=jax.lax.Precision.HIGHEST)
    mask = _root_mask(parent, T_global.dtype)[None, :, None, None]
    return local * (1.0 - mask) + T_global * mask


def forward_kinematics(R_local: jnp.ndarray, p_local: jnp.ndarray, parent):
    r"""FK for rotations and positions together (ref: spatial.py:280-309).

    Decomposed instead of composing 4×4 transforms: R_global by rotation FK,
    then p_global[i] = p_global[parent] + R_global[parent] @ p_local[i] —
    level-batched 3×3 math only (cheaper than 4×4 chains on the VPU).
    """
    B = R_local.shape[0]
    R_local = R_local.reshape(B, -1, 3, 3)
    p_local = p_local.reshape(B, -1, 3)
    parent_t = _canonical_parent(tuple(parent))
    R_global = _forward_tree_matmul(R_local, parent_t)
    levels = tree_levels(parent_t)
    p_global = p_local
    for level in levels[1:]:
        idx = jnp.asarray(level)
        pidx = jnp.asarray([parent_t[i] for i in level])
        moved = jnp.einsum("bjxy,bjy->bjx", R_global[:, pidx], p_local[:, idx], precision=jax.lax.Precision.HIGHEST)
        p_global = p_global.at[:, idx].set(p_global[:, pidx] + moved)
    return R_global, p_global


# ---------------------------------------------------------------------------
# numpy single-item helpers kept for API parity (ref: spatial.py:19-57)
# ---------------------------------------------------------------------------

def transformation_matrix_np(R, p) -> np.ndarray:
    r"""Homogeneous transform T_sb [4,4] from R [3,3], p [3]
    (ref: spatial.py:19-34)."""
    T = np.zeros((4, 4))
    T[:3, :3] = np.asarray(R)
    T[:3, 3] = np.asarray(p)
    T[3, 3] = 1
    return T


def adjoint_transformation_matrix_np(R, p) -> np.ndarray:
    r"""Adjoint representation [Ad_T] [6,6] of T_sb (ref: spatial.py:37-57)."""
    from a3gc_tpu.ops.rotations import vector_cross_matrix_np

    R = np.asarray(R)
    AdT = np.zeros((6, 6))
    AdT[:3, :3] = R
    AdT[3:, 3:] = R
    AdT[3:, :3] = vector_cross_matrix_np(p) @ R
    return AdT
