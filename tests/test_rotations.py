"""L0 rotation math: property tests + oracle parity (scipy / cv2 / torch ref)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRotation

from a3gc_tpu.ops import rotations as R

jax.config.update("jax_enable_x64", False)


def random_rotations(n, seed=0):
    return ScipyRotation.random(n, random_state=seed).as_matrix().astype(np.float32)


class TestAxisAngle:
    def test_round_trip(self):
        rng = np.random.default_rng(1)
        aa = rng.normal(size=(256, 3)).astype(np.float32)
        r = R.axis_angle_to_rotation_matrix(aa)
        aa2 = R.rotation_matrix_to_axis_angle(r)
        r2 = R.axis_angle_to_rotation_matrix(aa2)
        np.testing.assert_allclose(np.asarray(r), np.asarray(r2), atol=2e-5)

    def test_vs_scipy(self):
        rng = np.random.default_rng(2)
        aa = rng.normal(size=(128, 3)).astype(np.float32)
        r = np.asarray(R.axis_angle_to_rotation_matrix(aa))
        r_sp = ScipyRotation.from_rotvec(aa).as_matrix()
        np.testing.assert_allclose(r, r_sp, atol=1e-5)

    def test_log_map_vs_cv2(self):
        cv2 = pytest.importorskip("cv2")
        mats = random_rotations(256, seed=3)
        ours = np.asarray(R.rotation_matrix_to_axis_angle(mats))
        ref = np.stack([cv2.Rodrigues(m)[0].squeeze(-1) for m in mats])
        np.testing.assert_allclose(ours, ref, atol=3e-5)

    def test_log_map_near_pi(self):
        # rotations within 1e-4 rad of pi around random axes
        rng = np.random.default_rng(4)
        axes = rng.normal(size=(64, 3))
        axes /= np.linalg.norm(axes, axis=1, keepdims=True)
        angles = np.pi - rng.uniform(0, 1e-4, size=(64, 1))
        aa = (axes * angles).astype(np.float32)
        mats = ScipyRotation.from_rotvec(aa).as_matrix().astype(np.float32)
        ours = np.asarray(R.rotation_matrix_to_axis_angle(mats))
        # compare rotations, not parameterizations (axis sign flips at pi)
        r2 = ScipyRotation.from_rotvec(ours).as_matrix()
        np.testing.assert_allclose(r2, mats, atol=1e-4)

    def test_log_map_small_angle(self):
        rng = np.random.default_rng(5)
        aa = (rng.normal(size=(64, 3)) * 1e-5).astype(np.float32)
        mats = ScipyRotation.from_rotvec(aa).as_matrix().astype(np.float32)
        ours = np.asarray(R.rotation_matrix_to_axis_angle(mats))
        np.testing.assert_allclose(ours, aa, atol=1e-6)

    def test_identity(self):
        eye = np.eye(3, dtype=np.float32)[None]
        out = np.asarray(R.rotation_matrix_to_axis_angle(eye))
        np.testing.assert_allclose(out, np.zeros((1, 3)), atol=1e-7)
        out2 = np.asarray(R.axis_angle_to_rotation_matrix(np.zeros((1, 3), np.float32)))
        np.testing.assert_allclose(out2, eye, atol=1e-7)


class TestQuaternion:
    def test_quat_to_matrix_vs_scipy(self):
        rng = np.random.default_rng(6)
        q = rng.normal(size=(128, 4)).astype(np.float32)
        ours = np.asarray(R.quaternion_to_rotation_matrix(q))
        # scipy uses xyzw ordering
        q_n = q / np.linalg.norm(q, axis=1, keepdims=True)
        ref = ScipyRotation.from_quat(q_n[:, [1, 2, 3, 0]]).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_matrix_to_quat_round_trip(self):
        mats = random_rotations(128, seed=7)
        q = R.rotation_matrix_to_quaternion(mats)
        back = np.asarray(R.quaternion_to_rotation_matrix(q))
        np.testing.assert_allclose(back, mats, atol=1e-5)

    def test_axis_angle_quat_round_trip(self):
        rng = np.random.default_rng(8)
        aa = rng.normal(size=(128, 3)).astype(np.float32)
        q = R.axis_angle_to_quaternion(aa)
        aa2 = np.asarray(R.quaternion_to_axis_angle(q))
        np.testing.assert_allclose(aa2, aa, atol=1e-4)


class TestR6D:
    def test_round_trip(self):
        mats = random_rotations(128, seed=9)
        r6d = R.rotation_matrix_to_r6d(mats)
        back = np.asarray(R.r6d_to_rotation_matrix(r6d))
        np.testing.assert_allclose(back, mats, atol=1e-5)

    def test_vs_torch_reference(self, reference_path):
        import torch
        from articulate.math import angular as ref_ang

        rng = np.random.default_rng(10)
        r6d = rng.normal(size=(64, 6)).astype(np.float32)
        ours = np.asarray(R.r6d_to_rotation_matrix(r6d))
        ref = ref_ang.r6d_to_rotation_matrix(torch.from_numpy(r6d)).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

        mats = random_rotations(64, seed=11)
        ours6 = np.asarray(R.rotation_matrix_to_r6d(mats))
        ref6 = ref_ang.rotation_matrix_to_r6d(torch.from_numpy(mats)).numpy()
        np.testing.assert_allclose(ours6, ref6, atol=1e-6)


class TestEuler:
    @pytest.mark.parametrize("seq", ["XYZ", "ZYX", "YXZ", "xyz", "zyx"])
    def test_euler_to_matrix_vs_scipy(self, seq):
        rng = np.random.default_rng(12)
        e = rng.uniform(-np.pi, np.pi, size=(64, 3)).astype(np.float32)
        ours = np.asarray(R.euler_angle_to_rotation_matrix(e, seq))
        ref = ScipyRotation.from_euler(seq, e).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    @pytest.mark.parametrize("seq", ["XYZ", "ZYX", "xyz"])
    def test_matrix_to_euler_vs_scipy(self, seq):
        mats = random_rotations(128, seed=13)
        ours = np.asarray(R.rotation_matrix_to_euler_angle(mats, seq))
        ref = ScipyRotation.from_matrix(mats).as_euler(seq)
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestAngleBetween:
    def test_angle_between_known(self):
        a = np.eye(3, dtype=np.float32)[None]
        for angle in [0.1, 1.0, 2.5, np.pi - 1e-4]:
            b = ScipyRotation.from_rotvec([[angle, 0, 0]]).as_matrix().astype(np.float32)
            out = float(R.angle_between(jnp.asarray(a), jnp.asarray(b))[0])
            assert abs(out - angle) < 1e-5

    def test_vs_reference_semantics(self, reference_path):
        import torch
        from articulate.math import angular as ref_ang

        r1 = random_rotations(64, seed=14)
        r2 = random_rotations(64, seed=15)
        ours = np.asarray(R.angle_between(jnp.asarray(r1), jnp.asarray(r2)))
        ref = ref_ang.angle_between(torch.from_numpy(r1), torch.from_numpy(r2)).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-4)


class TestProjectChunking:
    def test_chunked_projection_equals_monolithic(self, monkeypatch):
        """Batches past _SVD_CHUNK run the SVD in lax.map chunks (TPU
        scoped-vmem bound); results are identical to the single-block
        path, including the identity-padded non-divisible tail."""
        monkeypatch.setattr(R, "_SVD_CHUNK", 1000)
        rng = np.random.default_rng(18)
        m = rng.normal(size=(2500, 3, 3)).astype(np.float32)
        chunked = np.asarray(R.project_to_rotation(jnp.asarray(m)))
        direct = np.asarray(R._project_block(jnp.asarray(m)))
        np.testing.assert_allclose(chunked, direct, atol=1e-6)
        # outputs are proper rotations
        dets = np.linalg.det(chunked)
        np.testing.assert_allclose(dets, 1.0, atol=1e-4)


class TestSvdRotate:
    def test_recovers_rotation(self):
        rng = np.random.default_rng(16)
        true_r = random_rotations(32, seed=17)
        src = rng.normal(size=(32, 10, 3)).astype(np.float32)
        tgt = np.einsum("bij,bmj->bmi", true_r, src)
        est = np.asarray(R.svd_rotate(jnp.asarray(src), jnp.asarray(tgt)))
        np.testing.assert_allclose(est, true_r, atol=1e-4)


class TestMisc:
    def test_normalize_angle(self):
        q = np.array([0.0, np.pi, -np.pi, 3 * np.pi, -0.5], np.float32)
        out = np.asarray(R.normalize_angle(q))
        assert np.all(out >= -np.pi) and np.all(out < np.pi)
        np.testing.assert_allclose(out[4], -0.5, atol=1e-7)

    def test_vector_cross_matrix(self):
        rng = np.random.default_rng(18)
        v = rng.normal(size=(16, 3)).astype(np.float32)
        w = rng.normal(size=(16, 3)).astype(np.float32)
        m = np.asarray(R.vector_cross_matrix(v))
        np.testing.assert_allclose(
            np.einsum("bij,bj->bi", m, w), np.cross(v, w), atol=1e-6)

    def test_random_rotation_matrix_is_rotation(self):
        mats = np.asarray(R.generate_random_rotation_matrix(jax.random.PRNGKey(0), 64))
        eye = np.einsum("bij,bkj->bik", mats, mats)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (64, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(mats), np.ones(64), atol=1e-5)

    def test_to_rotation_matrix_dispatch(self):
        mats = random_rotations(8, seed=19)
        out = np.asarray(R.to_rotation_matrix(
            jnp.asarray(mats.reshape(8, 9)), R.RotationRepresentation.ROTATION_MATRIX))
        np.testing.assert_allclose(out, mats, atol=0)

    def test_append_value(self):
        x = jnp.zeros((3, 3, 3))
        out = R.append_value(x, 1.0, axis=1)
        assert out.shape == (3, 4, 3)
        assert float(out[:, 3].sum()) == 9.0


class TestNumpyHelpers:
    def test_block_diagonal(self):
        a = np.ones((2, 3))
        b = 2 * np.ones((1, 2))
        out = R.block_diagonal_matrix_np([a, b])
        assert out.shape == (3, 5)
        np.testing.assert_allclose(out[:2, :3], a)
        np.testing.assert_allclose(out[2:, 3:], b)
        np.testing.assert_allclose(out[:2, 3:], 0)

    def test_euler_convert_vs_scipy(self):
        rng = np.random.default_rng(20)
        q = rng.uniform(-1.5, 1.5, size=(16, 3))
        ours = R.euler_convert_np(q, "XYZ", "ZYX")
        ref = ScipyRotation.from_euler("XYZ", q).as_euler("ZYX")
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_adjoint_transform(self):
        from a3gc_tpu.ops.kinematics import adjoint_transformation_matrix_np
        rot = ScipyRotation.random(1, random_state=2).as_matrix()[0]
        p = np.array([1.0, -2.0, 0.5])
        AdT = adjoint_transformation_matrix_np(rot, p)
        assert AdT.shape == (6, 6)
        np.testing.assert_allclose(AdT[:3, :3], rot)
        np.testing.assert_allclose(
            AdT[3:, :3], R.vector_cross_matrix_np(p) @ rot)

    def test_transformation_matrix_np(self):
        from a3gc_tpu.ops.kinematics import transformation_matrix_np
        rot = np.eye(3)
        T = transformation_matrix_np(rot, [1, 2, 3])
        np.testing.assert_allclose(T[:3, 3], [1, 2, 3])
        assert T[3, 3] == 1
