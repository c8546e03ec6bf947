r"""DIP-IMU preprocessing: raw sensor pickles → test / train / valid sets.

Capability parity with ``process_dipimu{,_train,_valid}{,_sym}``
(ref: preprocess.py:200-479) and ``transform_dip`` / ``transform_test``
(ref: postprocess_data.py:260-329):

  * the 6-sensor subset ``imu_mask=[7,8,11,12,0,2]`` (ref: preprocess.py:201),
  * vectorized 4-pass nearest-neighbor NaN fill + 6-frame head/tail trim
    (ref: preprocess.py:213-220),
  * discard-on-residual-NaN fault handling (ref: preprocess.py:221-227),
  * optional contralateral mirror of pose AND raw IMU (ref:
    preprocess.py:282-355),
  * FK joint positions and reduced-global pose targets computed batched.

The raw walk is factored into ``iter_dipimu_raw`` so tests can inject
synthetic sequences.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Iterable, Iterator, List, Optional

import jax.numpy as jnp
import numpy as np

from a3gc_tpu.config import Paths, paths as default_paths
from a3gc_tpu.data.factory import transform as TF
from a3gc_tpu.ops import rotations as R
from a3gc_tpu.smpl.model import ParametricModel

__all__ = ["IMU_MASK", "TEST_SPLIT", "VALID_FILE_ID_BASES", "iter_dipimu_raw",
           "preprocess_sequence", "process_dipimu"]

IMU_MASK = (7, 8, 11, 12, 0, 2)              # ref: preprocess.py:201
TEST_SPLIT = ("s_09", "s_10")                # ref: preprocess.py:202
VALID_FILE_ID_BASES = ("s_01_05", "s_03_05", "s_07_04")  # ref: :238
TRIM = 6                                     # head/tail frames (ref: :220)


def iter_dipimu_raw(raw_dir: str, split: str = "test"
                    ) -> Iterator[Dict[str, np.ndarray]]:
    r"""Walk raw DIP-IMU subject pickles, selecting the reference's splits
    (ref: preprocess.py:202-247). Yields acc [T,6,3], ori [T,6,3,3],
    pose [T,72] axis-angle, id."""
    assert split in ("test", "train", "valid")
    for subject in sorted(os.listdir(raw_dir)):
        in_test = subject in TEST_SPLIT
        if (split == "test") != in_test and split == "test":
            continue
        if split != "test" and in_test:
            continue
        subj_dir = os.path.join(raw_dir, subject)
        if not os.path.isdir(subj_dir):
            continue
        for motion in sorted(os.listdir(subj_dir)):
            file_id = subject + "_" + motion[:-4]
            if split == "train" and file_id in VALID_FILE_ID_BASES:
                continue
            if split == "valid" and file_id not in VALID_FILE_ID_BASES:
                continue
            with open(os.path.join(subj_dir, motion), "rb") as f:
                data = pickle.load(f, encoding="latin1")
            yield {
                "acc": np.asarray(data["imu_acc"], np.float32)[:, list(IMU_MASK)],
                "ori": np.asarray(data["imu_ori"], np.float32)[:, list(IMU_MASK)],
                "pose": np.asarray(data["gt"], np.float32),
                "id": "_".join(["DIP_IMU", subject, motion]),
            }


def preprocess_sequence(raw: Dict[str, np.ndarray],
                        mirror: bool = False) -> Optional[Dict[str, np.ndarray]]:
    r"""NaN-fill, trim, (optionally) mirror one raw sequence
    (ref: preprocess.py:213-227, 306-335). Returns None when NaNs survive
    the fill (the reference discards those sequences)."""
    acc = TF.nan_fill_nearest(raw["acc"])
    ori = TF.nan_fill_nearest(raw["ori"])
    pose = raw["pose"].reshape(-1, 24, 3)
    if mirror:
        pose = TF.mirror_pose_axis_angle(pose)
        ori, acc = TF.mirror_imu(ori, acc)
    acc, ori, pose = acc[TRIM:-TRIM], ori[TRIM:-TRIM], pose[TRIM:-TRIM]
    if (np.isnan(acc).any() or np.isnan(ori).any() or np.isnan(pose).any()
            or len(acc) == 0):
        return None
    return {"acc": acc, "ori": ori, "pose": pose}


def _to_training_fields(model: ParametricModel,
                        seq: Dict[str, np.ndarray],
                        with_positions: bool = True) -> Dict[str, np.ndarray]:
    r"""Preprocessed sequence → training fields (ref:
    postprocess_data.py:260-298 ``transform_dip`` / :300-329 ``transform_test``)."""
    T = seq["pose"].shape[0]
    p = np.asarray(R.axis_angle_to_rotation_matrix(
        jnp.asarray(seq["pose"].reshape(-1, 3)))).reshape(T, 24, 3, 3)
    ori_tp, acc_tp = TF.normalize_transpose(
        seq["ori"].reshape(T, 54), seq["acc"].reshape(T, 18))
    out = {
        "ori": ori_tp.astype(np.float32),
        "acc": acc_tp.astype(np.float32),
        "pose": TF.local_to_reduced_global(p, model.parent).astype(np.float32),
    }
    if with_positions:
        p_rf = p.copy()
        p_rf[:, 0] = np.eye(3)
        _, joint = model.forward_kinematics(jnp.asarray(p_rf))
        full_pos = np.asarray(joint)[:, :24]
        out["full_pos"] = full_pos.astype(np.float32)
        out["leaf_pos"] = full_pos[:, TF.LEAF_NODES].astype(np.float32)
    return out


def process_dipimu(model: ParametricModel, split: str = "test",
                   sym: bool = False,
                   raw_iter: Optional[Iterable[Dict]] = None,
                   out_path: Optional[str] = None,
                   chunk_size: int = 300,
                   paths: Optional[Paths] = None):
    r"""Full DIP-IMU pipeline for one split. Test split keeps native-length
    sequences (returned as a list; saved as npz object arrays); train/valid
    are 300-frame chunked and packable."""
    if paths is None:
        # late-bound so tests/config changes to the module default take effect
        paths = default_paths
    if raw_iter is None:
        raw_iter = iter_dipimu_raw(paths.resolve(paths.raw_dipimu_dir), split)

    sequences = []
    for raw in raw_iter:
        variants = [False, True] if (sym and split != "test") else [False]
        for mirror in variants:
            pre = preprocess_sequence(raw, mirror=mirror)
            if pre is None:
                continue
            sequences.append(_to_training_fields(
                model, pre, with_positions=split != "test"))

    if split == "test":
        if out_path and sequences:
            os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
            np.savez(out_path, **{
                f"seq{i}_{k}": v for i, s in enumerate(sequences)
                for k, v in s.items()})
        return sequences

    chunks = TF.chunk_sequences(sequences, chunk_size)
    if out_path and chunks:
        TF.pack_dataset(chunks, out_path)
    return chunks


def load_test_sequences(path: str) -> List[Dict[str, np.ndarray]]:
    """Load a test npz written by process_dipimu(split='test')."""
    with np.load(path) as z:
        seqs: Dict[int, Dict[str, np.ndarray]] = {}
        for key in z.files:
            head, field = key.split("_", 1)
            seqs.setdefault(int(head[3:]), {})[field] = z[key]
    return [seqs[i] for i in sorted(seqs)]
