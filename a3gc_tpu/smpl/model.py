r"""SMPL / MANO / SMPLH parametric body model as a frozen JAX pytree.

Capability parity with ``articulate/model.py`` (ref: model.py:16-274),
redesigned for XLA: the official pickle is loaded *once* on the host into a
``flax.struct`` pytree of jnp arrays; every compute method (FK, IK, LBS
skinning, zero-pose extraction) is a pure function of that pytree and jit/vmap/
pjit-compatible. The reference chunks FK into 512-frame host batches
(model.py:208-239) to fit GPU memory; here a single fused XLA program handles
whole sequences, and memory is managed by XLA (or jax.checkpoint at the call
site if needed).

Host-side utilities (obj export, Unity motion export) are kept as plain-numpy
methods since they are I/O, not compute (ref: model.py:41-75).
"""

from __future__ import annotations

import os
import pickle
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from a3gc_tpu.ops import kinematics as K
from a3gc_tpu.ops import rotations as R

__all__ = ["ParametricModel", "load_parametric_model"]

_HI = jax.lax.Precision.HIGHEST


class StaticArray:
    r"""Hashable ndarray wrapper for pytree-METADATA fields.

    jax compares treedef metadata with ``==`` (and hashes it for the jit
    cache); a bare ndarray there raises "truth value is ambiguous" the
    moment two distinct model instances meet one jit boundary (e.g. train
    then evaluate in one process, each loading its own SMPL pickle).
    Equality/hash go by shape+dtype+bytes; ``np.asarray`` works via
    ``__array__``, matching how ``faces`` is consumed.
    """

    __slots__ = ("a", "_digest", "_hash")

    def __init__(self, a):
        self.a = np.asarray(a)
        # jit treedef hashing hits __hash__ on every dispatch; hashing
        # the raw buffer there would copy ~165 KB of faces per call, so
        # digest once up front (sha1 collisions are not a concern for
        # cache-key equality of trusted local data)
        import hashlib
        self._digest = hashlib.sha1(
            np.ascontiguousarray(self.a).tobytes()).digest()
        self._hash = hash((self.a.shape, str(self.a.dtype), self._digest))

    def __array__(self, dtype=None, copy=None):
        return self.a if dtype is None else self.a.astype(dtype)

    def __iter__(self):
        return iter(self.a)

    def __eq__(self, other):
        if not isinstance(other, StaticArray):
            return NotImplemented
        return (self.a.shape == other.a.shape
                and self.a.dtype == other.a.dtype
                and self._digest == other._digest)

    def __hash__(self):
        return self._hash


@struct.dataclass
class ParametricModel:
    r"""A loaded parametric body model (SMPL/MANO/SMPLH).

    Array fields are jnp arrays (leaves of the pytree); ``parent`` and ``faces``
    are static (hashable / host-side) so the model can be closed over or passed
    through jit boundaries freely.
    """

    j_regressor: jnp.ndarray          # [J, V]
    skinning_weights: jnp.ndarray     # [V, J]
    posedirs: jnp.ndarray             # [V, 3, 9*(J-1)]
    shapedirs: jnp.ndarray            # [V, 3, n_shape]
    v_template: jnp.ndarray           # [V, 3]
    joints_template: jnp.ndarray      # [J, 3]  (the pickle's 'J')
    parent: Tuple[Optional[int], ...] = struct.field(pytree_node=False)
    faces: Optional[StaticArray] = struct.field(pytree_node=False,
                                                default=None)
    use_pose_blendshape: bool = struct.field(pytree_node=False, default=False)

    # ------------------------------------------------------------------
    # derived constants
    # ------------------------------------------------------------------
    @property
    def n_joints(self) -> int:
        return len(self.parent)

    @property
    def n_vertices(self) -> int:
        return self.v_template.shape[0]

    # ------------------------------------------------------------------
    # zero pose (ref: model.py:77-92)
    # ------------------------------------------------------------------
    def get_zero_pose_joint_and_vertex(self, shape: Optional[jnp.ndarray] = None):
        r"""Joint and vertex positions in zero pose, root aligned at zero.

        shape=None → mean shape, returns ([J,3], [V,3]); with shape [B,10] →
        ([B,J,3], [B,V,3]).
        """
        if shape is None:
            j = self.joints_template - self.joints_template[:1]
            v = self.v_template - self.joints_template[:1]
            return j, v
        shape = shape.reshape(-1, self.shapedirs.shape[-1])
        v = jnp.tensordot(shape, self.shapedirs, axes=([1], [2])) + self.v_template
        j = jnp.einsum("jv,bvx->bjx", self.j_regressor, v, precision=_HI)
        return j - j[:, :1], v - j[:, :1]

    # ------------------------------------------------------------------
    # tree ops bound to this skeleton (ref: model.py:94-206)
    # ------------------------------------------------------------------
    def bone_vector_to_joint_position(self, bone_vec: jnp.ndarray) -> jnp.ndarray:
        return K.bone_vector_to_joint_position(bone_vec, self.parent)

    def joint_position_to_bone_vector(self, joint_pos: jnp.ndarray) -> jnp.ndarray:
        return K.joint_position_to_bone_vector(joint_pos, self.parent)

    def forward_kinematics_R(self, R_local: jnp.ndarray) -> jnp.ndarray:
        return K.forward_kinematics_R(R_local, self.parent)

    def inverse_kinematics_R(self, R_global: jnp.ndarray) -> jnp.ndarray:
        return K.inverse_kinematics_R(R_global, self.parent)

    def forward_kinematics_T(self, T_local: jnp.ndarray) -> jnp.ndarray:
        return K.forward_kinematics_T(T_local, self.parent)

    def inverse_kinematics_T(self, T_global: jnp.ndarray) -> jnp.ndarray:
        return K.inverse_kinematics_T(T_global, self.parent)

    # ------------------------------------------------------------------
    # full FK + linear blend skinning (ref: model.py:242-274)
    # ------------------------------------------------------------------
    def forward_kinematics(self, pose: jnp.ndarray,
                           shape: Optional[jnp.ndarray] = None,
                           tran: Optional[jnp.ndarray] = None,
                           calc_mesh: bool = False):
        r"""Global joint rotation/position (and optionally mesh vertices).

        :param pose: local rotations, reshapable to [B, J, 3, 3].
        :param shape: [B, 10] betas or None for the mean shape.
        :param tran: [B, 3] root translation or None.
        :return: (R_global [B,J,3,3], p_global [B,J,3][, vertices [B,V,3]]).
        """
        B = pose.shape[0]
        pose = pose.reshape(B, -1, 3, 3)
        j, v = self.get_zero_pose_joint_and_vertex(shape)
        if shape is None:
            j, v = j[None], v[None]
        # like the reference (model.py:261), a single shape row expands to the
        # whole pose batch
        j = jnp.broadcast_to(j, (B,) + j.shape[1:])
        v = jnp.broadcast_to(v, (B,) + v.shape[1:])
        bone_vec = self.joint_position_to_bone_vector(j)
        R_global, p_global = K.forward_kinematics(pose, bone_vec, self.parent)

        def add_tran(x):
            return x if tran is None else x + tran.reshape(-1, 1, 3)

        if not calc_mesh:
            return R_global, add_tran(p_global)

        # LBS: per-joint global transform relative to its rest position, then
        # blend per vertex.  T_vertex = Σ_j w[v,j] · T_j ;  v' = T_vertex·[v;1]
        # (matches ref model.py:268-273, expressed without 4×4 matrices).
        if self.use_pose_blendshape:
            eye = jnp.eye(3, dtype=pose.dtype)
            r = (pose[:, 1:] - eye).reshape(B, -1)
            v = v + jnp.tensordot(r, self.posedirs, axes=([1], [2]))

        # translation part of each joint's skinning transform:
        # t_j = p_global_j - R_global_j @ j_rest_j
        t = p_global - jnp.einsum("bjxy,bjy->bjx", R_global, j, precision=_HI)
        # blend rotations and translations across joints per vertex
        Rv = jnp.einsum("vj,bjxy->bvxy", self.skinning_weights, R_global,
                        precision=_HI)
        tv = jnp.einsum("vj,bjx->bvx", self.skinning_weights, t, precision=_HI)
        vertex_global = jnp.einsum("bvxy,bvy->bvx", Rv, v, precision=_HI) + tv
        return R_global, add_tran(p_global), add_tran(vertex_global)

    # alias kept for API parity with the reference's chunked variant
    # (ref: model.py:208-239); one XLA program needs no host chunking.
    def forward_kinematics_batch(self, pose, shape=None, tran=None,
                                 calc_mesh=False, batch_size=None):
        del batch_size
        return self.forward_kinematics(pose, shape, tran, calc_mesh)

    # ------------------------------------------------------------------
    # host-side export utilities (ref: model.py:41-75)
    # ------------------------------------------------------------------
    def save_obj_mesh(self, vertex_position, file_name="a.obj"):
        r"""Export an obj mesh from [V, 3] vertex positions."""
        verts = np.asarray(vertex_position).reshape(-1, 3)
        with open(file_name, "w") as fp:
            for v in verts:
                fp.write("v %f %f %f\n" % (v[0], v[1], v[2]))
            if self.faces is not None:
                for f in np.asarray(self.faces) + 1:
                    fp.write("f %d %d %d\n" % (f[0], f[1], f[2]))

    # ------------------------------------------------------------------
    # motion viewers — capability parity with the reference's Open3D /
    # vctoolkit viewers (ref: model.py:276-362), REDESIGNED: a built-in
    # orthographic software rasterizer (smpl/viewer.py) writes an
    # animated GIF / PNG artifact instead of opening an interactive
    # window, so visualization works headless with no optional deps.
    # ------------------------------------------------------------------
    def view_joint(self, joint_list, fps=60, distance_between_subjects=0.8,
                   out_path="motion_joints.gif", size=360):
        r"""Render joint skeletons side by side (ref: model.py:276-309).
        Returns the written artifact path."""
        from a3gc_tpu.smpl.viewer import render_skeleton, save_animation

        J = self.n_joints
        subjects = []
        for i, j in enumerate(joint_list):
            j = np.asarray(j).reshape(-1, J, 3)
            j = j - j[:1, :1]                  # root-align like the ref
            j = j.copy()
            j[:, :, 0] += distance_between_subjects * i
            subjects.append(j)
        frames = render_skeleton(subjects, self.parent, size=size)
        return save_animation(frames, out_path, fps=fps)

    def view_mesh(self, vertex_list, fps=60, distance_between_subjects=0.8,
                  out_path="motion_mesh.gif", size=360):
        r"""Render skinned meshes side by side (ref: model.py:311-340).
        Returns the written artifact path."""
        from a3gc_tpu.smpl.viewer import render_mesh, save_animation

        subjects = []
        for i, v in enumerate(vertex_list):
            v = np.asarray(v).reshape(-1, self.n_vertices, 3).copy()
            v[:, :, 0] += distance_between_subjects * i
            subjects.append(v)
        frames = render_mesh(subjects, np.asarray(self.faces), size=size)
        return save_animation(frames, out_path, fps=fps)

    def view_motion(self, pose_list, tran_list=None, fps=60,
                    distance_between_subjects=0.8,
                    out_path="motion.gif", size=360):
        r"""FK+skinning then view_mesh (ref: model.py:342-362)."""
        verts = []
        for i, pose in enumerate(pose_list):
            pose = jnp.asarray(pose).reshape(-1, self.n_joints, 3, 3)
            tran = None
            if tran_list is not None:
                t = jnp.asarray(tran_list[i]).reshape(-1, 3)
                tran = t - t[:1]
            verts.append(np.asarray(
                self.forward_kinematics(pose, tran=tran, calc_mesh=True)[2]))
        return self.view_mesh(
            verts, fps, distance_between_subjects=distance_between_subjects,
            out_path=out_path, size=size)

    @staticmethod
    def save_unity_motion(pose=None, tran=None, output_dir="saved_motions/"):
        r"""Write motions into Unity3D `LoadMotion()` text files."""
        os.makedirs(output_dir, exist_ok=True)
        if pose is not None:
            pose = np.asarray(
                R.rotation_matrix_to_axis_angle(jnp.asarray(pose))
            ).reshape(np.asarray(pose).shape[0], -1)
            with open(os.path.join(output_dir, "pose.txt"), "w") as f:
                f.write("\n".join(
                    [",".join(["%.4f" % _ for _ in p]) for p in pose]))
        if tran is not None:
            tran = np.asarray(tran).reshape(-1, 3)
            with open(os.path.join(output_dir, "tran.txt"), "w") as f:
                f.write("\n".join(
                    [",".join(["%.5f" % _ for _ in t]) for t in tran]))


def load_parametric_model(official_model_file: str,
                          use_pose_blendshape: bool = False,
                          dtype=jnp.float32) -> ParametricModel:
    r"""Load an official SMPL/MANO/SMPLH pickle into a ParametricModel pytree
    (ref: model.py:20-39). Host-side; done once at startup."""
    with open(official_model_file, "rb") as f:
        data = pickle.load(f, encoding="latin1")

    jreg = data["J_regressor"]
    if hasattr(jreg, "toarray"):
        jreg = jreg.toarray()
    parent = list(data["kintree_table"][0].tolist())
    parent[0] = None

    return ParametricModel(
        j_regressor=jnp.asarray(np.asarray(jreg), dtype=dtype),
        skinning_weights=jnp.asarray(np.asarray(data["weights"]), dtype=dtype),
        posedirs=jnp.asarray(np.asarray(data["posedirs"]), dtype=dtype),
        shapedirs=jnp.asarray(np.asarray(data["shapedirs"]), dtype=dtype),
        v_template=jnp.asarray(np.asarray(data["v_template"]), dtype=dtype),
        joints_template=jnp.asarray(np.asarray(data["J"]), dtype=dtype),
        parent=tuple(parent),
        faces=StaticArray(data["f"]),
        use_pose_blendshape=use_pose_blendshape,
    )
