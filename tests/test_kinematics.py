"""L0 kinematics: tree FK/IK parity with the torch reference implementation."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRotation

from a3gc_tpu.ops import kinematics as K

# SMPL kinematic tree (kintree_table row 0 with root = None)
SMPL_PARENT = (None, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9,
               12, 13, 14, 16, 17, 18, 19, 20, 21)


def random_rotations(n, seed=0):
    return ScipyRotation.random(n, random_state=seed).as_matrix().astype(np.float32)


@pytest.fixture
def local_pose():
    return random_rotations(4 * 24, seed=21).reshape(4, 24, 3, 3)


@pytest.fixture
def positions(rng):
    return rng.normal(size=(4, 24, 3)).astype(np.float32)


class TestTreeLevels:
    def test_smpl_levels(self):
        levels = K.tree_levels(SMPL_PARENT)
        assert levels[0] == (0,)
        assert set(sum(levels, ())) == set(range(24))
        # SMPL tree has 9 depth levels (root + 8 below: hands are deepest)
        assert len(levels) == 9

    def test_chain(self):
        levels = K.tree_levels((None, 0, 1, 2))
        assert levels == ((0,), (1,), (2,), (3,))


class TestForwardInverse:
    def test_fk_ik_R_round_trip(self, local_pose):
        glob = K.forward_kinematics_R(jnp.asarray(local_pose), SMPL_PARENT)
        back = np.asarray(K.inverse_kinematics_R(glob, SMPL_PARENT))
        np.testing.assert_allclose(back, local_pose, atol=1e-5)

    def test_fk_R_vs_reference(self, local_pose, reference_path):
        import torch
        from articulate.math import spatial as ref_sp

        parent_list = [None] + [int(p) for p in SMPL_PARENT[1:]]
        ref = ref_sp.forward_kinematics_R(
            torch.from_numpy(local_pose), parent_list).numpy()
        ours = np.asarray(K.forward_kinematics_R(jnp.asarray(local_pose), SMPL_PARENT))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_ik_R_vs_reference(self, local_pose, reference_path):
        import torch
        from articulate.math import spatial as ref_sp

        glob = np.asarray(K.forward_kinematics_R(jnp.asarray(local_pose), SMPL_PARENT))
        parent_list = [None] + [int(p) for p in SMPL_PARENT[1:]]
        ref = ref_sp.inverse_kinematics_R(torch.from_numpy(glob), parent_list).numpy()
        ours = np.asarray(K.inverse_kinematics_R(jnp.asarray(glob), SMPL_PARENT))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_bone_joint_round_trip(self, positions):
        bones = K.joint_position_to_bone_vector(jnp.asarray(positions), SMPL_PARENT)
        back = np.asarray(K.bone_vector_to_joint_position(bones, SMPL_PARENT))
        np.testing.assert_allclose(back, positions, atol=1e-5)

    def test_bone_joint_vs_reference(self, positions, reference_path):
        import torch
        from articulate.math import spatial as ref_sp

        parent_list = [None] + [int(p) for p in SMPL_PARENT[1:]]
        ref_b = ref_sp.joint_position_to_bone_vector(
            torch.from_numpy(positions), parent_list).numpy()
        ours_b = np.asarray(
            K.joint_position_to_bone_vector(jnp.asarray(positions), SMPL_PARENT))
        np.testing.assert_allclose(ours_b, ref_b, atol=1e-6)

        ref_j = ref_sp.bone_vector_to_joint_position(
            torch.from_numpy(positions), parent_list).numpy()
        ours_j = np.asarray(
            K.bone_vector_to_joint_position(jnp.asarray(positions), SMPL_PARENT))
        np.testing.assert_allclose(ours_j, ref_j, atol=1e-6)

    def test_fk_T_round_trip(self, local_pose, positions):
        T_local = K.transformation_matrix(jnp.asarray(local_pose), jnp.asarray(positions))
        T_global = K.forward_kinematics_T(T_local, SMPL_PARENT)
        back = np.asarray(K.inverse_kinematics_T(T_global, SMPL_PARENT))
        np.testing.assert_allclose(back, np.asarray(T_local), atol=1e-5)

    def test_forward_kinematics_combined_vs_reference(
            self, local_pose, positions, reference_path):
        import torch
        from articulate.math import spatial as ref_sp

        parent_list = [None] + [int(p) for p in SMPL_PARENT[1:]]
        ref_R, ref_p = ref_sp.forward_kinematics(
            torch.from_numpy(local_pose), torch.from_numpy(positions), parent_list)
        ours_R, ours_p = K.forward_kinematics(
            jnp.asarray(local_pose), jnp.asarray(positions), SMPL_PARENT)
        np.testing.assert_allclose(np.asarray(ours_R), ref_R.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ours_p), ref_p.numpy(), atol=1e-5)


class TestTransforms:
    def test_inverse_transformation_matrix(self, local_pose, positions):
        T = K.transformation_matrix(
            jnp.asarray(local_pose[0]), jnp.asarray(positions[0]))
        invT = K.inverse_transformation_matrix(T)
        prod = np.einsum("jxy,jyz->jxz", np.asarray(T), np.asarray(invT))
        np.testing.assert_allclose(
            prod, np.tile(np.eye(4), (24, 1, 1)), atol=1e-5)

    def test_decode(self, local_pose, positions):
        T = K.transformation_matrix(jnp.asarray(local_pose), jnp.asarray(positions))
        R, p = K.decode_transformation_matrix(T)
        np.testing.assert_allclose(np.asarray(R), local_pose, atol=0)
        np.testing.assert_allclose(np.asarray(p), positions, atol=0)
