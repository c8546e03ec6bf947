"""L3 data factory: transforms vs reference semantics + end-to-end smoke."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from a3gc_tpu.data.factory import transform as TF
from a3gc_tpu.data.factory.amass import process_amass_split
from a3gc_tpu.data.factory.dipimu import (
    load_test_sequences,
    preprocess_sequence,
    process_dipimu,
)
from a3gc_tpu.data.factory.totalcapture import process_totalcapture
from a3gc_tpu.smpl import load_parametric_model, write_synthetic_smpl_pickle
from a3gc_tpu.smpl.armature import SMPL_PARENT


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("smpl") / "synthetic_smpl.pkl"
    return load_parametric_model(write_synthetic_smpl_pickle(str(path),
                                                             n_vertices=160))


class TestSynAcc:
    def test_matches_reference_loop(self):
        """Oracle: the reference's per-frame formula (ref: preprocess.py:25-36)
        written as an explicit loop."""
        rng = np.random.default_rng(0)
        v = rng.normal(size=(50, 6, 3)).astype(np.float32)
        smooth_n = 4

        # loop oracle
        acc = np.stack([(v[i] + v[i + 2] - 2 * v[i + 1]) * 3600
                        for i in range(0, v.shape[0] - 2)])
        acc = np.concatenate((np.zeros_like(acc[:1]), acc,
                              np.zeros_like(acc[:1])))
        mid = smooth_n // 2
        if mid != 0:
            acc[smooth_n:-smooth_n] = np.stack(
                [(v[i] + v[i + smooth_n * 2] - 2 * v[i + smooth_n]) * 3600
                 / smooth_n ** 2
                 for i in range(0, v.shape[0] - smooth_n * 2)])

        ours = TF.syn_acc(v, smooth_n=smooth_n)
        np.testing.assert_allclose(ours, acc, atol=1e-3)


class TestNanFill:
    def test_matches_reference_passes(self):
        """Oracle: the reference's 4-pass masked_scatter ping-pong
        (ref: preprocess.py:214-218) in torch."""
        import torch
        rng = np.random.default_rng(1)
        x = rng.normal(size=(30, 6, 3)).astype(np.float32)
        mask = rng.random(x.shape) < 0.2
        x[mask] = np.nan

        t = torch.from_numpy(x.copy())
        for _ in range(4):
            t[1:].masked_scatter_(torch.isnan(t[1:]),
                                  t[:-1][torch.isnan(t[1:])])
            t[:-1].masked_scatter_(torch.isnan(t[:-1]),
                                   t[1:][torch.isnan(t[:-1])])

        ours = TF.nan_fill_nearest(x)
        np.testing.assert_allclose(
            np.nan_to_num(ours, nan=123.0),
            np.nan_to_num(t.numpy(), nan=123.0), atol=0)


class TestNormalizeTranspose:
    def test_matches_reference_formula(self):
        """Oracle: the root-relative formula (ref: postprocess_data.py:74-80)
        written independently per-frame."""
        rng = np.random.default_rng(2)
        T = 12
        ori = Rotation.random(T * 6, random_state=3).as_matrix().reshape(
            T, 6, 3, 3).astype(np.float32)
        acc = rng.normal(size=(T, 6, 3)).astype(np.float32)

        ori_out, acc_out = TF.normalize_transpose(ori.reshape(T, 54),
                                                  acc.reshape(T, 18))
        for t in range(T):
            root = ori[t, 5]
            for s in range(5):
                np.testing.assert_allclose(
                    ori_out[t].reshape(6, 3, 3)[s], root.T @ ori[t, s],
                    atol=1e-5)
                np.testing.assert_allclose(
                    acc_out[t].reshape(6, 3)[s],
                    (acc[t, s] - acc[t, 5]) @ root / 30.0, atol=1e-5)
            np.testing.assert_allclose(ori_out[t].reshape(6, 3, 3)[5], root,
                                       atol=0)
            np.testing.assert_allclose(acc_out[t].reshape(6, 3)[5],
                                       acc[t, 5] @ root / 30.0, atol=1e-5)

    def test_root_relative_legacy(self):
        rng = np.random.default_rng(3)
        T = 8
        ori = Rotation.random(T * 6, random_state=4).as_matrix().reshape(
            T, 6, 3, 3).astype(np.float32)
        acc = rng.normal(size=(T, 6, 3)).astype(np.float32)
        ori_out, acc_out = TF.normalize_root_relative(ori, acc, root=5)
        assert ori_out.shape == (T, 45) and acc_out.shape == (T, 15)
        np.testing.assert_allclose(
            ori_out[0].reshape(5, 3, 3)[0], ori[0, 5].T @ ori[0, 0], atol=1e-5)


class TestPoseSpace:
    def test_local_to_reduced_global_vs_reference_fk(self, reference_path):
        """Oracle: reference articulate FK per frame, root identity-filled
        (ref: postprocess_data.py:239-241 semantics)."""
        import torch
        from articulate.math import spatial as ref_sp

        T = 6
        pose = Rotation.random(T * 24, random_state=5).as_matrix().reshape(
            T, 24, 3, 3).astype(np.float32)
        ours = TF.local_to_reduced_global(pose, SMPL_PARENT)

        pose_rf = pose.copy()
        pose_rf[:, 0] = np.eye(3)
        parent_list = [None] + [int(p) for p in SMPL_PARENT[1:]]
        glob = ref_sp.forward_kinematics_R(torch.from_numpy(pose_rf),
                                           parent_list).numpy()
        ref = glob[:, TF.SMPL_MAJOR_JOINTS].reshape(T, 135)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_reduced_local_round(self):
        T = 5
        reduced = Rotation.random(T * 15, random_state=6).as_matrix().reshape(
            T, 135).astype(np.float32)
        out = TF.reduced_local_to_reduced_global(reduced, SMPL_PARENT)
        assert out.shape == (T, 135)
        # root-level reduced joints (parents outside the reduced set are
        # identity) keep their local value: joints 1,2,3 have parent 0
        np.testing.assert_allclose(out[:, :9], reduced[:, :9], atol=1e-6)


class TestMirror:
    def test_mirror_twice_is_identity(self):
        pose = Rotation.random(24 * 4, random_state=7).as_rotvec().reshape(
            4, 24, 3).astype(np.float32)
        twice = TF.mirror_pose_axis_angle(TF.mirror_pose_axis_angle(pose))
        np.testing.assert_allclose(twice, pose, atol=1e-6)

    def test_mirror_imu_twice_is_identity(self):
        rng = np.random.default_rng(8)
        ori = Rotation.random(6 * 5, random_state=8).as_matrix().reshape(
            5, 6, 3, 3).astype(np.float32)
        acc = rng.normal(size=(5, 6, 3)).astype(np.float32)
        o1, a1 = TF.mirror_imu(ori, acc)
        o2, a2 = TF.mirror_imu(o1, a1)
        np.testing.assert_allclose(o2, ori, atol=1e-5)
        np.testing.assert_allclose(a2, acc, atol=1e-6)

    def test_mirrored_pose_mirrors_positions(self, model):
        """FK positions of a mirrored pose = x-flipped, joint-permuted
        positions of the original (physical correctness of CDA)."""
        import jax.numpy as jnp
        from a3gc_tpu.config import SMPL_MIRROR
        from a3gc_tpu.ops import rotations as R

        pose_aa = (Rotation.random(24, random_state=9).as_rotvec() * 0.3
                   ).reshape(1, 24, 3).astype(np.float32)
        pose_aa[:, 0] = 0.0  # identity root so global frames align
        mirrored = TF.mirror_pose_axis_angle(pose_aa)

        def fk_pos(aa):
            mats = np.asarray(R.axis_angle_to_rotation_matrix(
                jnp.asarray(aa.reshape(-1, 3)))).reshape(1, 24, 3, 3)
            _, j = model.forward_kinematics(jnp.asarray(mats))
            return np.asarray(j)[0]

        p = fk_pos(pose_aa)
        pm = fk_pos(mirrored)
        expected = p[list(SMPL_MIRROR)] * np.array([-1.0, 1.0, 1.0])
        np.testing.assert_allclose(pm, expected, atol=2e-2)


class TestChunkingPacking:
    def test_chunk_and_pack(self, tmp_path):
        seqs = [{"a": np.arange(650).reshape(650, 1).astype(np.float32)},
                {"a": np.arange(200).reshape(200, 1).astype(np.float32)}]
        chunks = TF.chunk_sequences(seqs, chunk_size=300)
        assert len(chunks) == 2    # 650→2 chunks, 200→0
        assert chunks[0]["a"][0, 0] == 0 and chunks[1]["a"][0, 0] == 300
        path = TF.pack_dataset(chunks, str(tmp_path / "packed.npz"))
        with np.load(path) as z:
            assert z["a"].shape == (2, 300, 1)


def synth_raw_amass(n=2, T=700, seed=0):
    rng = np.random.default_rng(seed)
    for i in range(n):
        aa = (Rotation.random(T * 52, random_state=seed + i).as_rotvec()
              * 0.3).reshape(T, 52, 3)
        yield {
            "poses": aa.astype(np.float32),
            "trans": rng.normal(scale=0.1, size=(T, 3)).astype(np.float32),
            "betas": rng.normal(scale=0.5, size=(10,)).astype(np.float32),
            "id": f"synth_{i}",
        }


def synth_raw_dip(n=2, T=400, seed=0, with_nans=True):
    rng = np.random.default_rng(seed)
    for i in range(n):
        ori = Rotation.random(T * 6, random_state=seed + i).as_matrix(
        ).reshape(T, 6, 3, 3).astype(np.float32)
        acc = rng.normal(size=(T, 6, 3)).astype(np.float32)
        if with_nans:
            acc[10:12, 0] = np.nan
            ori[20, 1] = np.nan
        pose = (Rotation.random(T * 24, random_state=seed + 9 + i).as_rotvec()
                * 0.3).reshape(T, 72).astype(np.float32)
        yield {"acc": acc, "ori": ori, "pose": pose, "id": f"dip_{i}"}


class TestEndToEndFactory:
    def test_amass_pipeline(self, model, tmp_path):
        out = str(tmp_path / "amass_train.npz")
        chunks = process_amass_split(model, raw_iter=synth_raw_amass(),
                                     out_path=out, chunk_size=300,
                                     vi_mask=(10, 20, 30, 40, 50, 60))
        assert len(chunks) == 4   # 2 seqs × (700 // 300)
        with np.load(out) as z:
            assert z["ori"].shape == (4, 300, 54)
            assert z["acc"].shape == (4, 300, 18)
            assert z["pose"].shape == (4, 300, 135)
            assert z["full_pos"].shape == (4, 300, 24, 3)
            assert z["leaf_pos"].shape == (4, 300, 5, 3)
            # root-relative guarantee
            np.testing.assert_allclose(z["full_pos"][:, :, 0], 0.0, atol=1e-5)

    def test_amass_sym_doubles(self, model):
        chunks = process_amass_split(model, raw_iter=synth_raw_amass(n=1),
                                     sym=True, vi_mask=(10, 20, 30, 40, 50, 60))
        assert len(chunks) == 4   # (1 original + 1 mirror) × 2 chunks

    def test_dip_pipeline_with_nans(self, model, tmp_path):
        out = str(tmp_path / "dip_train.npz")
        chunks = process_dipimu(model, split="train",
                                raw_iter=synth_raw_dip(), out_path=out)
        assert len(chunks) == 2   # (400-12) // 300 = 1 each
        assert not any(np.isnan(c["ori"]).any() for c in chunks)

    def test_dip_test_split_native_lengths(self, model, tmp_path):
        out = str(tmp_path / "dip_test.npz")
        seqs = process_dipimu(model, split="test",
                              raw_iter=synth_raw_dip(T=150), out_path=out)
        assert len(seqs) == 2
        assert seqs[0]["ori"].shape == (150 - 12, 54)
        assert "full_pos" not in seqs[0]
        back = load_test_sequences(out)
        np.testing.assert_allclose(back[0]["ori"], seqs[0]["ori"], atol=0)

    def test_totalcapture_pipeline(self, model):
        def raw():
            for r in synth_raw_dip(n=1, T=100, with_nans=False):
                yield {"acc": r["acc"], "ori": r["ori"],
                       "pose": r["pose"].reshape(-1, 24, 3), "id": r["id"]}
        seqs = process_totalcapture(model, raw_iter=raw())
        assert len(seqs) == 1 and seqs[0]["pose"].shape == (100, 135)

    def test_factory_feeds_training(self, model):
        """Factory output slots straight into the train pipeline."""
        import jax
        from a3gc_tpu.config import TrainConfig
        from a3gc_tpu.data import load_adjacency_template
        from a3gc_tpu.data import pipeline as DPipe
        from a3gc_tpu.models import nets as N
        from a3gc_tpu.models.pipeline import PoseNetConfig, init_pose_net
        from a3gc_tpu.train import StageRunner

        chunks = process_amass_split(model, raw_iter=synth_raw_amass(
            n=1, T=650), chunk_size=300, vi_mask=(10, 20, 30, 40, 50, 60))
        packed = {f: np.stack([c[f] for c in chunks]) for f in chunks[0]}
        nira = load_adjacency_template()
        net = N.GraphNetConfig(cell="a3gc", units_in=12, units_out=3,
                               units_hidden=8)
        cfg = PoseNetConfig(net=net, rotsize=3)
        params = init_pose_net(jax.random.PRNGKey(0), cfg, nira)
        runner = StageRunner(1, cfg, params, TrainConfig(batch_size=2),
                             steps_per_epoch=1)
        loss = runner.train_epoch(DPipe.Sampler(packed, 2),
                                  jax.random.PRNGKey(0))
        assert np.isfinite(loss)


class TestDipSplitSelection:
    def test_valid_split_file_ids(self, tmp_path):
        """iter_dipimu_raw selects the reference's valid motions by
        subject_motion file id (ref: preprocess.py:238-246): raw layout is
        raw_dir/s_XX/<motion>.pkl and the valid set is s_01_05, s_03_05,
        s_07_04."""
        import pickle
        from scipy.spatial.transform import Rotation
        from a3gc_tpu.data.factory.dipimu import iter_dipimu_raw

        rng = np.random.default_rng(0)
        T = 30
        for subject, motions in (("s_01", ("00", "05")),
                                 ("s_03", ("05",)),
                                 ("s_02", ("01",))):
            d = tmp_path / subject
            d.mkdir()
            for m in motions:
                ori = Rotation.random(T * 17, random_state=1).as_matrix()
                data = {"imu_acc": rng.normal(size=(T, 17, 3)),
                        "imu_ori": ori.reshape(T, 17, 3, 3),
                        "gt": rng.normal(size=(T, 72)) * 0.1}
                with open(d / f"{m}.pkl", "wb") as f:
                    pickle.dump(data, f)

        ids = lambda split: sorted(r["id"] for r in
                                   iter_dipimu_raw(str(tmp_path), split))
        assert ids("valid") == ["DIP_IMU_s_01_05.pkl", "DIP_IMU_s_03_05.pkl"]
        # train excludes the valid motions (ref: preprocess.py:245)
        assert ids("train") == ["DIP_IMU_s_01_00.pkl", "DIP_IMU_s_02_01.pkl"]
