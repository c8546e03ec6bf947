#!/usr/bin/env python
r"""Build a tiny synthetic RAW asset tree in the exact on-disk layout the
licensed datasets ship in, so `scripts/run_reference_protocol.sh` can be
executed end-to-end without AMASS / DIP-IMU / TotalCapture / SMPL access.

Layouts reproduced (ref: preprocess.py:22-23,44-59 for AMASS walk;
:200-247 for DIP-IMU subject pickles; :481-508 for DIP-recalculated
TotalCapture; config.py paths):

  <root>/raw_datasets/AMASS/<corpus>/<corpus>/<subject>/<name>_poses.npz
      poses [T,156] aa (52 SMPLH joints), trans [T,3], betas [16],
      mocap_framerate
  <root>/raw_datasets/DIP_IMU/s_XX/NN.pkl
      latin1 pickle: imu_acc [T,17,3] (with NaN dropouts), imu_ori
      [T,17,3,3], gt [T,72] aa
  <root>/raw_datasets/TotalCapture/DIP_recalculate/*.pkl
      ori [T,6,3,3], acc [T,6,3], gt [T',72] (lengths intentionally
      slightly out of sync, as in the real DIP-recalculated dump)
  <root>/smpl.pkl   synthetic body model in the official SMPL schema

Motion is smooth low-magnitude axis-angle (scipy rotvec) so kinematics,
synthetic-IMU finite differences, and normalization behave realistically.

Usage: python scripts/make_synthetic_raw_assets.py <root> [--seed 0]
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np
from scipy.spatial.transform import Rotation


def smooth_aa(rng, t, k, scale=0.35):
    """[t, k, 3] smoothly-varying axis-angle."""
    base = rng.normal(size=(1, k, 3)) * scale
    drift = rng.normal(size=(1, k, 3)) * scale * 0.7
    phase = np.sin(np.linspace(0, 2 * np.pi, t))[:, None, None]
    phase2 = np.cos(np.linspace(0, 5 * np.pi, t))[:, None, None]
    return (base + drift * (phase + 0.3 * phase2)).astype(np.float32)


def smooth_rotmats(rng, t, k, scale=0.35):
    aa = smooth_aa(rng, t, k, scale)
    return Rotation.from_rotvec(aa.reshape(-1, 3)).as_matrix().reshape(
        t, k, 3, 3).astype(np.float32)


def write_amass(root, rng):
    # 2 train corpora + 1 valid corpus from the reference's split lists
    # (ref: preprocess.py:22-23); one subject, one take each.
    spec = [("CMU", "subj01", "take01", 620),
            ("KIT", "subj01", "walk01", 610),
            ("ACCAD", "subj02", "run01", 340)]
    for corpus, subj, name, t in spec:
        d = os.path.join(root, "raw_datasets", "AMASS", corpus, corpus, subj)
        os.makedirs(d, exist_ok=True)
        np.savez(os.path.join(d, f"{name}_poses.npz"),
                 poses=smooth_aa(rng, t, 52).reshape(t, 156),
                 trans=(rng.normal(size=(1, 3)) * 0.2 +
                        0.002 * np.arange(t)[:, None] *
                        rng.normal(size=3)).astype(np.float32),
                 betas=rng.normal(size=16).astype(np.float32) * 0.5,
                 mocap_framerate=np.float64(60.0))


def write_dipimu(root, rng):
    # subjects + motion numbers chosen so the reference's split rules all
    # trigger: s_09/s_10 test (ref: preprocess.py:202), file ids
    # s_01_05 / s_03_05 / s_07_04 validation (ref: :238), rest train.
    spec = [("s_01", "01", 400), ("s_01", "05", 380),   # train + valid
            ("s_03", "05", 360),                        # valid
            ("s_07", "01", 390), ("s_07", "04", 370),   # train + valid
            ("s_09", "01", 350), ("s_10", "02", 340)]   # test
    for subj, motion, t in spec:
        d = os.path.join(root, "raw_datasets", "DIP_IMU", subj)
        os.makedirs(d, exist_ok=True)
        acc = rng.normal(scale=0.8, size=(t, 17, 3)).astype(np.float32)
        ori = smooth_rotmats(rng, t, 17)
        # sensor dropouts: NaN runs at head and mid-sequence (the raw DIP
        # dumps have these; exercises the 4-pass nearest fill, ref: :214-218)
        acc[:3, 5] = np.nan
        ori[t // 2:t // 2 + 2, 11] = np.nan
        gt = smooth_aa(rng, t, 24).reshape(t, 72)
        with open(os.path.join(d, f"{motion}.pkl"), "wb") as fh:
            pickle.dump({"imu_acc": acc, "imu_ori": ori, "gt": gt}, fh,
                        protocol=2)


def write_totalcapture(root, rng):
    d = os.path.join(root, "raw_datasets", "TotalCapture", "DIP_recalculate")
    os.makedirs(d, exist_ok=True)
    for name, t in [("s1_acting1", 330), ("s2_walking2", 310)]:
        gt_t = t - 4  # lengths out of sync, as in the real dump
        with open(os.path.join(d, f"{name}.pkl"), "wb") as fh:
            pickle.dump({
                "acc": rng.normal(scale=0.8, size=(t, 6, 3)).astype(
                    np.float32),
                "ori": smooth_rotmats(rng, t, 6),
                "gt": smooth_aa(rng, gt_t, 24).reshape(gt_t, 72),
            }, fh, protocol=2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from a3gc_tpu.smpl import write_synthetic_smpl_pickle

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.root, exist_ok=True)
    write_amass(args.root, rng)
    write_dipimu(args.root, rng)
    write_totalcapture(args.root, rng)
    # real vertex count: the AMASS synthesis gathers the DIP sensor vertex
    # IDs (max 5424, a3gc_tpu/data/factory/amass.py:42), so the synthetic
    # body must span the official SMPL's 6890 vertices
    smpl = write_synthetic_smpl_pickle(
        os.path.join(args.root, "smpl.pkl"), n_vertices=6890, seed=args.seed)
    print(f"raw asset tree -> {args.root}")
    print(f"DATA_ROOT={args.root} SMPL_PKL={smpl}")


if __name__ == "__main__":
    main()
