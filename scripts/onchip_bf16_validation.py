"""On-chip bf16 training validation (round-1 VERDICT item 2).

Runs the FULL user workflow on the TPU with `--dtype bfloat16`:
raw DIP-layout pickles -> `preprocess` (train/test) -> `train` (3 stages,
reference hidden sizes 256/64/128) -> `evaluate --type pretrain`, then an
fp32 control run with the same data/seed for a loss-trajectory comparison.

No real mocap assets ship in this environment, so the data is synthetic
(random rotations through the real preprocess path, same as
tests/test_cli.py); the validation target is the MECHANICS + numerics of
bf16 training end-to-end on the chip — losses must decrease and track the
fp32 control — not absolute SIP (meaningless on noise data).

Artifacts land in docs/validation/: train_log JSONLs for both dtypes and
the eval report of the bf16 model.

Usage (serially — the chip is single-tenant):
    python scripts/onchip_bf16_validation.py
"""

import dataclasses
import json
import os
import pickle
import shutil
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
WORK = "/tmp/bf16_val"
OUT = os.path.join(ROOT, "docs", "validation")


def make_raw(root):
    """Synthetic raw DIP-IMU layout (s_XX/motion.pkl with imu_acc/ori/gt)."""
    from scipy.spatial.transform import Rotation
    rng = np.random.default_rng(0)
    T = 900
    for si, subject in enumerate(["s_01", "s_03", "s_09"]):  # s_09 = test
        subj = os.path.join(root, subject)
        os.makedirs(subj, exist_ok=True)
        for mi in range(3):
            ori = Rotation.random(T * 17, random_state=si * 10 + mi
                                  ).as_matrix().reshape(T, 17, 3, 3)
            data = {
                "imu_acc": rng.normal(size=(T, 17, 3)),
                "imu_ori": ori,
                "gt": (Rotation.random(T * 24, random_state=99 + si * 7 + mi
                                       ).as_rotvec() * 0.3).reshape(T, 72),
            }
            with open(os.path.join(subj, f"{subject}_0{mi}.pkl"), "wb") as f:
                pickle.dump(data, f)


def main():
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK, exist_ok=True)
    os.makedirs(OUT, exist_ok=True)
    raw = os.path.join(WORK, "raw")
    make_raw(raw)

    from a3gc_tpu.cli import main as cli
    from a3gc_tpu.smpl import write_synthetic_smpl_pickle
    import a3gc_tpu.config as config_mod
    import a3gc_tpu.data.factory.dipimu as dipimu_mod

    smpl = write_synthetic_smpl_pickle(
        os.path.join(WORK, "smpl.pkl"), n_vertices=432)

    config_mod.paths = dataclasses.replace(
        config_mod.paths, data_root="", raw_dipimu_dir=raw)
    dipimu_mod.default_paths = config_mod.paths

    train_npz = os.path.join(WORK, "train.npz")
    test_npz = os.path.join(WORK, "test.npz")
    cli(["preprocess", "--dataset", "dipimu", "--split", "train",
         "--smpl", smpl, "--output", train_npz])
    cli(["preprocess", "--dataset", "dipimu", "--split", "test",
         "--smpl", smpl, "--output", test_npz])

    runs = os.path.join(WORK, "runs")
    for dtype in ("bfloat16", "float32"):
        name = f"val_{dtype}"
        cli(["train", "--model", "a3gc", "-b", "8", "--epochs", "3",
             "--patience", "99", "--dtype", dtype, "--seed", "0",
             "--name", name, "--save_root", runs,
             "--smpl", smpl,
             "--train_data", train_npz, "--valid_data", train_npz])
        shutil.copy(os.path.join(runs, name, "train_log.jsonl"),
                    os.path.join(OUT, f"train_log_{dtype}.jsonl"))

    # evaluate the bf16 model (mechanics: discovery, cascade, report)
    os.chdir(WORK)   # reports under /tmp, copied below
    cli(["evaluate", "--model", "a3gc", "--path",
         os.path.join(runs, "val_bfloat16"), "--type", "pretrain",
         "--smpl", smpl, "--datasets", test_npz])
    rep = os.path.join(WORK, "evaluation_results", "a3gc_test.npz.txt")
    shutil.copy(rep, os.path.join(OUT, "eval_report_bf16.txt"))

    # loss-trajectory comparison table
    def losses(path):
        rows = [json.loads(l) for l in open(path)]
        return [(r["stage"], r["epoch"], r["train_loss"], r["valid_loss"])
                for r in rows if "train_loss" in r]

    bf = losses(os.path.join(OUT, "train_log_bfloat16.jsonl"))
    fp = losses(os.path.join(OUT, "train_log_float32.jsonl"))
    lines = ["| stage | epoch | fp32 train | bf16 train | rel diff |",
             "|---|---|---|---|---|"]
    for (s, e, tb, _), (_, _, tf, _) in zip(bf, fp):
        rel = abs(tb - tf) / max(abs(tf), 1e-9)
        lines.append(f"| {s} | {e} | {tf:.6f} | {tb:.6f} | {rel:.3%} |")
    with open(os.path.join(OUT, "BF16_ONCHIP.md"), "w") as f:
        f.write("# On-chip bf16 training validation\n\n"
                "3-stage `cli train --dtype bfloat16` on the TPU, synthetic "
                "DIP-layout data through the real preprocess path, vs an "
                "fp32 control (same data, same seed). Eval report: "
                "eval_report_bf16.txt.\n\n" + "\n".join(lines) + "\n")
    print("wrote", os.path.join(OUT, "BF16_ONCHIP.md"))


if __name__ == "__main__":
    main()
