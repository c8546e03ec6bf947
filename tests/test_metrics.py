"""L2 metrics: parity with the torch reference FullMotionEvaluator suite."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRotation

from a3gc_tpu.config import joint_set as JS
from a3gc_tpu.metrics import (
    FullMotionEvaluator,
    PoseEvaluator,
    full_motion_metrics,
    masked_global_angle_per_frame,
    mean_per_joint_errors,
    mesh_error,
    per_joint_errors,
    position_error,
    rotation_error,
)
from a3gc_tpu.smpl import load_parametric_model, write_synthetic_smpl_pickle


@pytest.fixture(scope="module")
def smpl_pickle(tmp_path_factory):
    path = tmp_path_factory.mktemp("smpl") / "synthetic_smpl.pkl"
    return write_synthetic_smpl_pickle(str(path), n_vertices=192)


@pytest.fixture(scope="module")
def model(smpl_pickle):
    return load_parametric_model(smpl_pickle)


def smooth_pose_pair(n=80, seed=0, noise=0.05):
    """A smooth-ish motion + a perturbed prediction (keeps jerk finite)."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 2 * np.pi, n)[:, None, None]
    base = rng.normal(size=(1, 24, 3)) * 0.4
    drift = rng.normal(size=(1, 24, 3)) * 0.3
    aa_t = base + drift * np.sin(t)
    aa_p = aa_t + rng.normal(size=(n, 24, 3)) * noise
    to_mat = lambda aa: ScipyRotation.from_rotvec(
        aa.reshape(-1, 3)).as_matrix().reshape(n, 24, 3, 3).astype(np.float32)
    return to_mat(aa_p), to_mat(aa_t)


class TestFullMotionParity:
    @pytest.fixture(scope="class")
    def ref_eval(self, smpl_pickle, reference_path):
        from articulate.evaluator import FullMotionEvaluator as RefEval
        import torch
        return RefEval(smpl_pickle, joint_mask=torch.tensor([1, 2, 16, 17]))

    def test_eleven_rows_match(self, model, ref_eval):
        import torch
        pose_p, pose_t = smooth_pose_pair(n=80, seed=1)
        ref = ref_eval(torch.from_numpy(pose_p), torch.from_numpy(pose_t))
        ours = full_motion_metrics(
            model, jnp.asarray(pose_p), jnp.asarray(pose_t),
            joint_mask=(1, 2, 16, 17))
        ours = np.asarray(ours)
        ref = ref.numpy()
        # angles (deg): tight; positions: tight; jerk rows scale with fps^3 so
        # compare relatively
        for i in [0, 1, 2, 3, 6, 7, 8, 9]:
            np.testing.assert_allclose(ours[i], ref[i], atol=2e-3, rtol=1e-3,
                                       err_msg=f"row {i}")
        for i in [4, 5, 10]:
            np.testing.assert_allclose(ours[i], ref[i], rtol=1e-3,
                                       err_msg=f"row {i}")

    def test_sip_within_hundredth_degree(self, model, ref_eval):
        """The SIP row (masked global angle) must match well inside the 0.1°
        parity budget of BASELINE.md."""
        import torch
        pose_p, pose_t = smooth_pose_pair(n=120, seed=2, noise=0.1)
        ref = ref_eval(torch.from_numpy(pose_p), torch.from_numpy(pose_t))
        ours = full_motion_metrics(
            model, jnp.asarray(pose_p), jnp.asarray(pose_t),
            joint_mask=(1, 2, 16, 17))
        assert abs(float(ours[9, 0]) - float(ref[9, 0])) < 0.01
        assert abs(float(ours[3, 0]) - float(ref[3, 0])) < 0.01

    def test_padded_equals_exact(self, model):
        """End-padding + n_valid must reproduce the unpadded metrics."""
        pose_p, pose_t = smooth_pose_pair(n=90, seed=3)
        exact = np.asarray(full_motion_metrics(
            model, jnp.asarray(pose_p), jnp.asarray(pose_t),
            joint_mask=(1, 2, 16, 17)))
        pad = np.tile(np.eye(3, dtype=np.float32), (40, 24, 1, 1))
        padded_p = np.concatenate([pose_p, pad])
        padded_t = np.concatenate([pose_t, pad])
        padded = np.asarray(full_motion_metrics(
            model, jnp.asarray(padded_p), jnp.asarray(padded_t),
            n_valid=jnp.asarray(90), joint_mask=(1, 2, 16, 17)))
        np.testing.assert_allclose(padded, exact, rtol=2e-3, atol=1e-4)

    def test_angle_list_parity(self, model, smpl_pickle, reference_path):
        import torch
        from articulate.evaluator import FullMotionEvaluatorAngleList
        ref_eval = FullMotionEvaluatorAngleList(
            smpl_pickle, joint_mask=torch.tensor([1, 2, 16, 17]))
        pose_p, pose_t = smooth_pose_pair(n=40, seed=4)
        ref = ref_eval(torch.from_numpy(pose_p),
                       torch.from_numpy(pose_t)).numpy()
        ours = np.asarray(masked_global_angle_per_frame(
            model, jnp.asarray(pose_p), jnp.asarray(pose_t)))
        np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)


class TestPoseEvaluator:
    def test_metric_vector_shape_and_ignored_joints(self, model):
        pose_p, pose_t = smooth_pose_pair(n=70, seed=5)
        ev = PoseEvaluator(model)
        errs = np.asarray(ev(jnp.asarray(pose_p), jnp.asarray(pose_t)))
        assert errs.shape == (5, 2)
        # zeroing ignored joints means evaluating already-zeroed input is a
        # no-op: same result
        ign = np.asarray(JS.ignored)
        pose_p2 = pose_p.copy()
        pose_p2[:, ign] = np.eye(3, dtype=np.float32)
        pose_t2 = pose_t.copy()
        pose_t2[:, ign] = np.eye(3, dtype=np.float32)
        errs2 = np.asarray(ev(jnp.asarray(pose_p2), jnp.asarray(pose_t2)))
        np.testing.assert_allclose(errs, errs2, atol=1e-5)

    def test_perfect_prediction_is_zero(self, model):
        _, pose_t = smooth_pose_pair(n=70, seed=6)
        ev = PoseEvaluator(model)
        errs = np.asarray(ev(jnp.asarray(pose_t), jnp.asarray(pose_t)))
        assert abs(errs[0, 0]) < 1e-3   # SIP deg
        assert abs(errs[2, 0]) < 1e-4   # positional cm

    def test_format(self, model):
        pose_p, pose_t = smooth_pose_pair(n=70, seed=7)
        ev = PoseEvaluator(model)
        text = PoseEvaluator.format(ev(jnp.asarray(pose_p), jnp.asarray(pose_t)))
        assert "SIP Error (deg)" in text and "Jitter" in text


class TestBasicEvaluators:
    def test_position_error(self):
        rng = np.random.default_rng(0)
        p = rng.normal(size=(50, 3)).astype(np.float32)
        t = rng.normal(size=(50, 3)).astype(np.float32)
        ours = float(position_error(jnp.asarray(p), jnp.asarray(t)))
        ref = np.linalg.norm(p - t, axis=1).mean()
        assert abs(ours - ref) < 1e-5

    def test_rotation_error_zero(self):
        mats = ScipyRotation.random(10, random_state=1).as_matrix().astype(np.float32)
        assert float(rotation_error(jnp.asarray(mats), jnp.asarray(mats))) < 1e-3

    def test_per_joint_errors_vs_reference(self, model, smpl_pickle,
                                           reference_path):
        import torch
        from articulate.evaluator import PerJointErrorEvaluator
        ref_eval = PerJointErrorEvaluator(smpl_pickle)
        pose_p, pose_t = smooth_pose_pair(n=20, seed=8)
        ref = ref_eval(torch.from_numpy(pose_p), torch.from_numpy(pose_t)).numpy()
        ours = np.asarray(per_joint_errors(model, jnp.asarray(pose_p),
                                           jnp.asarray(pose_t)))
        np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)

    def test_mesh_error_vs_reference(self, model, smpl_pickle, reference_path):
        import torch
        from articulate.evaluator import MeshErrorEvaluator
        ref_eval = MeshErrorEvaluator(smpl_pickle)
        pose_p, pose_t = smooth_pose_pair(n=20, seed=9)
        ref = float(ref_eval(torch.from_numpy(pose_p), torch.from_numpy(pose_t)))
        ours = float(mesh_error(model, jnp.asarray(pose_p), jnp.asarray(pose_t)))
        assert abs(ours - ref) < 1e-4

    def test_mean_per_joint(self, model):
        pose_p, pose_t = smooth_pose_pair(n=10, seed=10)
        out = np.asarray(mean_per_joint_errors(model, jnp.asarray(pose_p),
                                               jnp.asarray(pose_t)))
        assert out.shape == (3,)


class TestBinaryEvaluators:
    def test_confusion_matrix_reference_convention(self):
        from a3gc_tpu.metrics import binary_confusion_matrix
        import jax.numpy as jnp
        # reference convention: positive class = 0 (ref: evaluator.py:55-61)
        p = jnp.asarray([0.2, 0.9, 0.1, 0.8])   # after sigmoid
        t = jnp.asarray([0.0, 0.0, 1.0, 1.0])
        m = np.asarray(binary_confusion_matrix(p, t, is_after_sigmoid=True))
        # pred classes: [0,1,0,1]; tp=(p0,t0)=1, fn=(p1,t0)=1,
        # fp=(p0,t1)=1, tn=(p1,t1)=1
        np.testing.assert_allclose(m, [[1, 1], [1, 1]])

    def test_classification_errors(self):
        from a3gc_tpu.metrics import binary_classification_errors
        import jax.numpy as jnp
        p = jnp.asarray([0.2, 0.2, 0.9, 0.8])
        t = jnp.asarray([0.0, 0.0, 1.0, 1.0])  # perfect under ref convention
        e = np.asarray(binary_classification_errors(p, t,
                                                    is_after_sigmoid=True))
        np.testing.assert_allclose(e, np.ones((3, 2)), atol=1e-6)
