r"""AMASS synthesis: raw AMASS mocap → synthetic IMU training data.

Capability parity with ``process_amass_split`` / ``process_amass_split_sym``
(ref: preprocess.py:21-198) and ``transform_amass_split``
(ref: postprocess_data.py:207-258), redesigned as batched array programs:

  * FK + 6890-vertex LBS runs batched per sequence on-device (the hot loop,
    SURVEY.md §3.3) instead of frame-chunked host torch;
  * the contralateral (CDA) mirror duplicates every sequence with the joint
    permutation + axis-angle sign flip (ref: preprocess.py:166-169);
  * output is written in this framework's npz schema via
    ``transform.pack_dataset``.

The raw-data walk is factored into ``iter_amass_raw`` so tests can inject
synthetic sequences without the (licensed, not shipped) AMASS corpora.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Iterable, Iterator, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from a3gc_tpu.config import Paths, paths as default_paths
from a3gc_tpu.data.factory import transform as TF
from a3gc_tpu.ops import rotations as R
from a3gc_tpu.smpl.model import ParametricModel

__all__ = ["TRAIN_SPLIT", "VAL_SPLIT", "AMASS_VI_MASK", "AMASS_JI_MASK",
           "iter_amass_raw", "synthesize_sequence", "process_amass_split"]

# corpora per split (ref: preprocess.py:22-23)
TRAIN_SPLIT = ("BioMotionLab_NTroje", "BMLhandball", "BMLmovi", "CMU",
               "MPI_mosh", "DanceDB", "Eyes_Japan_Dataset", "MPI_HDM05", "KIT")
VAL_SPLIT = ("ACCAD", "DFaust67", "SFU", "EKUT", "HumanEva", "SSM_synced",
             "MPI_Limits")

# sensor mesh vertices / joints (ref: preprocess.py:38-39)
AMASS_VI_MASK = (1961, 5424, 1177, 4662, 411, 3021)
AMASS_JI_MASK = (18, 19, 4, 5, 15, 0)

# AMASS → DIP global frame alignment (ref: preprocess.py:70)
AMASS_ROT = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0.0]], np.float32)


def iter_amass_raw(raw_dir: str, datasets: Sequence[str]
                   ) -> Iterator[Dict[str, np.ndarray]]:
    r"""Walk AMASS npz files, 60fps-resampled (ref: preprocess.py:44-59).
    Yields dicts with poses [T, 52, 3] (axis-angle), trans [T, 3],
    betas [10], id."""
    for ds_name in datasets:
        pattern = os.path.join(raw_dir, ds_name, ds_name, "*/*_poses.npz")
        for npz_fname in sorted(glob.glob(pattern)):
            try:
                cdata = np.load(npz_fname)
            except Exception:
                continue
            framerate = int(cdata["mocap_framerate"])
            if framerate == 120:
                step = 2
            elif framerate in (60, 59):
                step = 1
            else:
                continue
            yield {
                "poses": cdata["poses"][::step].astype(np.float32),
                "trans": cdata["trans"][::step].astype(np.float32),
                "betas": cdata["betas"][:10].astype(np.float32),
                "id": npz_fname,
            }


def _body_pose_24(poses: np.ndarray) -> np.ndarray:
    r"""52-joint SMPLH axis-angle → 24-joint SMPL body with the right hand
    remapped (ref: preprocess.py:66-67)."""
    pose = poses.reshape(-1, 52, 3).copy()
    pose[:, 23] = pose[:, 37]
    return pose[:, :24]


def _align_global_frame(pose24: np.ndarray, trans: np.ndarray):
    r"""Rotate the AMASS global frame onto DIP's (ref: preprocess.py:69-73)."""
    trans = trans @ AMASS_ROT.T
    root = np.asarray(R.axis_angle_to_rotation_matrix(
        jnp.asarray(pose24[:, 0])))
    root = AMASS_ROT[None] @ root
    pose24 = pose24.copy()
    pose24[:, 0] = np.asarray(R.rotation_matrix_to_axis_angle(
        jnp.asarray(root)))
    return pose24, trans


def synthesize_sequence(model: ParametricModel, pose24: np.ndarray,
                        shape: np.ndarray, trans: np.ndarray,
                        smooth_n: int = 4,
                        vi_mask=AMASS_VI_MASK,
                        ji_mask=AMASS_JI_MASK) -> Dict[str, np.ndarray]:
    r"""FK+mesh one sequence and synthesize IMU readings
    (ref: preprocess.py:78-90): vertex finite-difference accelerations at the
    6 sensor vertices and global rotations at the 6 sensor joints.

    :return: dict with pose [T,24,3] aa, pose_global [T,24,3,3],
        joint [T,24,3], vrot [T,6,3,3], vacc [T,6,3], shape [10].
    """
    T = pose24.shape[0]
    p = np.asarray(R.axis_angle_to_rotation_matrix(
        jnp.asarray(pose24.reshape(-1, 3)))).reshape(T, 24, 3, 3)
    grot, joint, vert = model.forward_kinematics(
        jnp.asarray(p), jnp.asarray(shape).reshape(1, -1),
        jnp.asarray(trans), calc_mesh=True)
    grot, joint, vert = np.asarray(grot), np.asarray(joint), np.asarray(vert)
    vacc = TF.syn_acc(vert[:, list(vi_mask)], smooth_n=smooth_n)
    return {
        "pose": pose24,
        "pose_global": grot,
        "joint": joint[:, :24],
        "vrot": grot[:, list(ji_mask)],
        "vacc": vacc,
        "shape": shape,
    }


def _transform_to_training(model: ParametricModel,
                           seq: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    r"""Synthesized sequence → training fields (ref: postprocess_data.py:
    207-258): root-free joint positions, reduced global pose, TransPose IMU
    normalization."""
    T = seq["pose"].shape[0]
    p = np.asarray(R.axis_angle_to_rotation_matrix(
        jnp.asarray(seq["pose"].reshape(-1, 3)))).reshape(T, 24, 3, 3)
    # root-free positions (ref: postprocess_data.py:220-226)
    p_rootfree = p.copy()
    p_rootfree[:, 0] = np.eye(3)
    _, joint = model.forward_kinematics(
        jnp.asarray(p_rootfree), jnp.asarray(seq["shape"]).reshape(1, -1))
    full_pos = np.asarray(joint)[:, :24]
    smplg_re = TF.local_to_reduced_global(p, model.parent)
    ori_tp, acc_tp = TF.normalize_transpose(
        seq["vrot"].reshape(T, 54), seq["vacc"].reshape(T, 18))
    return {
        "ori": ori_tp.astype(np.float32),
        "acc": acc_tp.astype(np.float32),
        "leaf_pos": full_pos[:, TF.LEAF_NODES].astype(np.float32),
        "full_pos": full_pos.astype(np.float32),
        "pose": smplg_re.astype(np.float32),
    }


def process_amass_split(model: ParametricModel, mode: str = "train",
                        sym: bool = False,
                        raw_iter: Optional[Iterable[Dict]] = None,
                        out_path: Optional[str] = None,
                        chunk_size: int = 300,
                        paths: Optional[Paths] = None,
                        min_length: int = 13,
                        vi_mask=AMASS_VI_MASK,
                        ji_mask=AMASS_JI_MASK) -> List[Dict[str, np.ndarray]]:
    r"""Full AMASS pipeline: raw → synth IMU → training fields → 300-frame
    chunks (→ packed npz if ``out_path``). ``sym=True`` adds the mirrored
    duplicate of every sequence (CDA, ref: preprocess.py:105-198)."""
    if paths is None:
        # late-bound so tests/config changes to the module default take effect
        paths = default_paths
    if raw_iter is None:
        datasets = TRAIN_SPLIT if mode == "train" else VAL_SPLIT
        raw_iter = iter_amass_raw(paths.resolve(paths.raw_amass_dir), datasets)

    sequences = []
    for raw in raw_iter:
        pose24 = _body_pose_24(raw["poses"])
        if pose24.shape[0] < min_length:
            continue
        pose24, trans = _align_global_frame(pose24, raw["trans"])
        variants = [pose24]
        if sym:
            variants.append(TF.mirror_pose_axis_angle(pose24))
        for pv in variants:
            synth = synthesize_sequence(model, pv, raw["betas"], trans,
                                        vi_mask=vi_mask, ji_mask=ji_mask)
            sequences.append(_transform_to_training(model, synth))

    chunks = TF.chunk_sequences(sequences, chunk_size)
    if out_path and chunks:
        TF.pack_dataset(chunks, out_path)
    return chunks
