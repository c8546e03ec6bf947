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

Motion is smooth low-magnitude axis-angle (scipy rotvec), and the DIP /
TotalCapture sensor channels are KINEMATICALLY CONSISTENT with their gt
poses: imu_ori / imu_acc are synthesized from gt by the same FK + vertex
finite-difference pipeline the AMASS factory uses
(`a3gc_tpu.data.factory.amass.synthesize_sequence`, same vi/ji sensor
masks), so IMU→pose is a learnable deterministic mapping end to end —
pretrain (AMASS) and finetune/test (DIP) share ONE physics. Without this,
protocol-trained nets emit near-singular "rotations" on the test split and
the angle metrics sit in cv2-vs-SVD implementation-defined territory
(see docs/validation/PROTOCOL_CROSSCHECK.md).

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


def write_amass(root, rng, takes=1, frames=1.0):
    # 2 train corpora + 1 valid corpus from the reference's split lists
    # (ref: preprocess.py:22-23); `takes` takes per subject and a `frames`
    # length multiplier let the tree scale from smoke (defaults) to a
    # corpus large enough that protocol training reaches the valid-
    # rotation regime (scripts/protocol_cross_check.py needs that).
    spec = [(c, s, f"{n}{k:02d}", t) for k in range(takes)
            for c, s, n, t in [("CMU", "subj01", "take", 620),
                               ("KIT", "subj01", "walk", 610),
                               ("ACCAD", "subj02", "run", 340)]]
    spec = [(c, s, n, int(t * frames)) for c, s, n, t in spec]
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


def _synth_consistent(model, rng, t, amp=0.3):
    r"""Smooth gt pose + FK/LBS-consistent sensor readings.

    Reuses the AMASS factory's synthesis (same sensor vertices/joints,
    a3gc_tpu/data/factory/amass.py:42-43) so the DIP "measured" IMU obeys
    the exact physics the pretrain corpus teaches (ref: preprocess.py:78-90).

    :return: gt [t,72] aa, vrot [t,6,3,3], vacc [t,6,3].
    """
    from a3gc_tpu.data.factory.amass import synthesize_sequence

    pose = smooth_aa(rng, t, 24, scale=amp)
    trans = (0.25 * np.sin(np.linspace(0, 2 * np.pi, t))[:, None] *
             rng.normal(size=3)).astype(np.float32)
    shape = (rng.normal(size=10) * 0.03).astype(np.float32)
    synth = synthesize_sequence(model, pose, shape, trans)
    return pose.reshape(t, 72), synth["vrot"], synth["vacc"]


def write_dipimu(root, rng, model, takes=1, frames=1.0):
    from a3gc_tpu.data.factory.dipimu import IMU_MASK

    # subjects + motion numbers chosen so the reference's split rules all
    # trigger: s_09/s_10 test (ref: preprocess.py:202), file ids
    # s_01_05 / s_03_05 / s_07_04 validation (ref: :238), rest train.
    spec = [("s_01", "01", 400), ("s_01", "05", 380),   # train + valid
            ("s_03", "05", 360),                        # valid
            ("s_07", "01", 390), ("s_07", "04", 370),   # train + valid
            ("s_09", "01", 350), ("s_10", "02", 340)]   # test
    for k in range(takes - 1):  # extra TRAIN takes under non-special ids
        spec += [("s_01", f"{10 + 2 * k}", 390), ("s_07", f"{11 + 2 * k}", 380)]
    spec = [(s, m, int(t * frames)) for s, m, t in spec]
    for subj, motion, t in spec:
        d = os.path.join(root, "raw_datasets", "DIP_IMU", subj)
        os.makedirs(d, exist_ok=True)
        gt, vrot, vacc = _synth_consistent(model, rng, t)
        # the 11 unread sensor slots stay noise; the 6 the factory reads
        # (imu_mask, ref: preprocess.py:201) carry the synthesized physics
        acc = rng.normal(scale=0.8, size=(t, 17, 3)).astype(np.float32)
        ori = smooth_rotmats(rng, t, 17)
        for i, slot in enumerate(IMU_MASK):
            acc[:, slot] = vacc[:, i]
            ori[:, slot] = vrot[:, i]
        # sensor dropouts: NaN runs at head and mid-sequence (the raw DIP
        # dumps have these; exercises the 4-pass nearest fill, ref: :214-218).
        # slot 5 is unread; slot 11 is read — its 2-frame fill is the one
        # (realistic) inconsistency in the tree.
        acc[:3, 5] = np.nan
        ori[t // 2:t // 2 + 2, 11] = np.nan
        with open(os.path.join(d, f"{motion}.pkl"), "wb") as fh:
            pickle.dump({"imu_acc": acc, "imu_ori": ori, "gt": gt}, fh,
                        protocol=2)


def write_totalcapture(root, rng, model):
    from a3gc_tpu.data.factory.totalcapture import SENSOR_ORDER

    d = os.path.join(root, "raw_datasets", "TotalCapture", "DIP_recalculate")
    os.makedirs(d, exist_ok=True)
    for name, t in [("s1_acting1", 330), ("s2_walking2", 310)]:
        gt_t = t - 4  # lengths out of sync, as in the real dump; the
        # factory keeps the first min(T) frames (totalcapture.py:39-40),
        # so frames [0, gt_t) stay consistent after the sync.
        gt, vrot, vacc = _synth_consistent(model, rng, t)
        ori = np.empty((t, 6, 3, 3), np.float32)
        acc = np.empty((t, 6, 3), np.float32)
        # store pre-reorder: the factory applies [:, SENSOR_ORDER]
        ori[:, list(SENSOR_ORDER)] = vrot
        acc[:, list(SENSOR_ORDER)] = vacc
        with open(os.path.join(d, f"{name}.pkl"), "wb") as fh:
            pickle.dump({"acc": acc, "ori": ori, "gt": gt[:gt_t]},
                        fh, protocol=2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--takes", type=int, default=1,
                    help="takes per subject (scales corpus size)")
    ap.add_argument("--frames", type=float, default=1.0,
                    help="sequence-length multiplier")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax._src.xla_bridge as xb
    if not xb.backends_are_initialized():
        xb._backend_factories.pop("axon", None)

    from a3gc_tpu.smpl import load_parametric_model, write_synthetic_smpl_pickle

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.root, exist_ok=True)
    # the body model comes first: DIP/TC sensor synthesis FKs through it.
    # real vertex count: the AMASS synthesis gathers the DIP sensor vertex
    # IDs (max 5424, a3gc_tpu/data/factory/amass.py:42), so the synthetic
    # body must span the official SMPL's 6890 vertices
    smpl = write_synthetic_smpl_pickle(
        os.path.join(args.root, "smpl.pkl"), n_vertices=6890, seed=args.seed)
    model = load_parametric_model(smpl)
    write_amass(args.root, rng, takes=args.takes, frames=args.frames)
    write_dipimu(args.root, rng, model, takes=args.takes, frames=args.frames)
    write_totalcapture(args.root, rng, model)
    print(f"raw asset tree -> {args.root}")
    print(f"DATA_ROOT={args.root} SMPL_PKL={smpl}")


if __name__ == "__main__":
    main()
