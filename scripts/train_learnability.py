"""End-to-end learnability validation: train on factory-synthesized IMU.

The full-scale dress rehearsal (onchip_train_fullscale.py) proved the
training MECHANICS at scale, but its corpus is noise — orientations and
poses are generated independently, so there is nothing to learn and
losses plateau immediately. This script closes the remaining loop that
real licensed data would close: it demonstrates the whole stack LEARNS.

The corpus comes from the real data factory: smooth synthetic SMPL
motions → `process_amass_split` (FK + mesh LBS on the synthetic body,
vertex finite-difference accelerations, sensor-joint global rotations,
TransPose normalization, CDA mirroring, 300-frame chunking — the exact
pipeline real AMASS would take, ref: preprocess.py:21-198,
postprocess_data.py:207-258). IMU→pose is then a deterministic,
learnable mapping, so a successful 3-stage `cli train` must drive
held-out SIP far below the untrained baseline — which exercises
gradients, optimizer semantics, the data pipeline, and checkpointing
end-to-end in a way the parity tests (fixed weights) cannot.

Baselines come from the SAME `cli evaluate` path: omitting --path makes
`_load_cascade_params` fall back to fresh-init parameters (cli.py),
i.e. the untrained cascade.

Writes docs/validation/TRAIN_LEARNABILITY.{md,json}.

Usage (chip, ~30-40 min cold; REUSE=1 to keep corpus + finished runs):
    python scripts/train_learnability.py
CPU smoke:
    N_SEQ=6 N_VAL=2 T=320 EPOCHS=2 JAX_PLATFORMS=cpu \
        python scripts/train_learnability.py
"""

import contextlib
import io
import json
import os
import re
import shutil
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
WORK = "/tmp/learnability"
OUT = os.path.join(ROOT, "docs", "validation")

N_SEQ = int(os.environ.get("N_SEQ", 1000))     # train sequences (x2 CDA)
N_VAL = int(os.environ.get("N_VAL", 64))
N_TEST = int(os.environ.get("N_TEST", 6))      # held-out eval sequences
T = int(os.environ.get("T", 600))              # frames per raw sequence
T_TEST = int(os.environ.get("T_TEST", 1500))
EPOCHS = os.environ.get("EPOCHS", "15")
BATCH = os.environ.get("BATCH", "64")
DTYPE = os.environ.get("DTYPE", "bfloat16")
REUSE = os.environ.get("REUSE") == "1"

# per-joint axis-angle amplitude (rad). Sensor-adjacent joints move most;
# mid-chain joints (the ones the net must INFER) move moderately so the
# mapping is well-determined but not trivial.
_AMP = np.full(24, 0.25)
_AMP[[1, 2, 16, 17]] = 0.7        # hips, shoulders (the SIP joints)
_AMP[[4, 5, 18, 19]] = 0.5        # knees, elbows (sensor joints)
_AMP[[0]] = 0.6                   # root orientation
_AMP[[7, 8, 20, 21, 10, 11, 22, 23]] = 0.3   # distal
_AMP[[3, 6, 9, 12, 15]] = 0.2     # spine chain, head


def smooth_raw_iter(n_seqs, t, seed):
    """Smooth SMPLH-layout motions: each joint's axis-angle is a sum of
    3 sinusoids (0.1-0.8 Hz at 60 fps) plus a constant offset; root
    translation is a slow sinusoidal drift. Deterministic per seed."""
    for i in range(n_seqs):
        rng = np.random.default_rng(seed * 100_003 + i)
        tt = np.arange(t)[:, None, None] / 60.0            # seconds
        freq = rng.uniform(0.1, 0.8, size=(3, 24, 3))
        phase = rng.uniform(0, 2 * np.pi, size=(3, 24, 3))
        coef = rng.normal(size=(3, 24, 3)) / 3.0
        aa = sum(coef[k] * np.sin(2 * np.pi * freq[k] * tt + phase[k])
                 for k in range(3))
        aa = (aa + rng.normal(scale=0.3, size=(24, 3)) / 3.0) * _AMP[:, None]
        poses = np.zeros((t, 52, 3), np.float32)
        poses[:, :24] = aa
        trans = 0.5 * np.sin(2 * np.pi * rng.uniform(0.05, 0.2, 3) * tt[:, 0]
                             + rng.uniform(0, 2 * np.pi, 3))
        yield {"poses": poses, "trans": trans.astype(np.float32),
               "betas": np.zeros(10, np.float32), "id": f"syn{seed}_{i}"}


def sensor_vertices(model):
    """Nearest synthetic-mesh vertices to the 6 IMU mount points
    (mid-forearm x2, mid-shank x2, head, pelvis)."""
    J = np.asarray(model.joints_template)
    v = np.asarray(model.v_template)
    targets = [(J[18] + J[20]) / 2, (J[19] + J[21]) / 2,
               (J[4] + J[7]) / 2, (J[5] + J[8]) / 2, J[15], J[0]]
    return tuple(int(np.argmin(np.linalg.norm(v - t, axis=1)))
                 for t in targets)


def make_corpus(model):
    from a3gc_tpu.data.factory.amass import process_amass_split

    paths = {k: os.path.join(WORK, k + ".npz")
             for k in ("train", "valid", "test", "trainfit")}
    if REUSE and all(os.path.exists(p) for p in paths.values()):
        print("[corpus] reusing", WORK)
        return paths
    t0 = time.time()
    vi = sensor_vertices(model)
    print("[corpus] sensor vertices:", vi)
    process_amass_split(model, sym=True, vi_mask=vi,
                        raw_iter=smooth_raw_iter(N_SEQ, T, seed=1),
                        out_path=paths["train"])
    process_amass_split(model, sym=False, vi_mask=vi,
                        raw_iter=smooth_raw_iter(N_VAL, T, seed=2),
                        out_path=paths["valid"])

    # held-out + train-subset eval sequences in the test-npz schema
    # (full length, not chunked) — chunk_size larger than T_TEST keeps
    # each sequence whole, then unpack the per-sequence dicts.
    def test_npz(path, seed, t):
        # chunk_size == t keeps every sequence as one whole chunk
        chunks = process_amass_split(
            model, sym=False, vi_mask=vi, chunk_size=t,
            raw_iter=smooth_raw_iter(N_TEST, t, seed=seed))
        arrs = {}
        for i, c in enumerate(chunks):
            for k in ("ori", "acc", "pose"):
                arrs[f"seq{i}_{k}"] = c[k]
        np.savez(path, **arrs)

    test_npz(paths["test"], seed=3, t=T_TEST)      # never seen in training
    test_npz(paths["trainfit"], seed=1, t=T)       # first train seqs (fit)
    print(f"[corpus] {2 * N_SEQ} train chunks' sequences, {N_VAL} valid, "
          f"{N_TEST}+{N_TEST} eval seqs in {time.time() - t0:.0f}s")
    return paths


_METRIC = re.compile(r"^(SIP Error \(deg\)|Angular Error \(deg\)|"
                     r"Positional Error \(cm\)|jerk error \(km/s\^3\)|"
                     r"Jitter Error \(100m/s\^3\)): ([0-9.]+)")


def run_eval(cli, tag, run_path, smpl, data_npz):
    """`cli evaluate` IN-PROCESS (the chip is single-tenant: a subprocess
    would deadlock against this process's live TPU client). Parses the
    printed 5-metric report from captured stdout."""
    buf = io.StringIO()
    cwd = os.getcwd()
    os.chdir(WORK)
    argv = ["evaluate", "--model", "a3gc",
            "--batch_streams", str(N_TEST),
            "--smpl", smpl, "--datasets", data_npz]
    if run_path is not None:
        argv += ["--path", run_path, "--type", "pretrain"]
    try:
        with contextlib.redirect_stdout(buf):
            cli(argv)
    finally:
        os.chdir(cwd)
    metrics = {}
    for line in buf.getvalue().splitlines():
        m = _METRIC.match(line.strip())
        if m:
            metrics[m.group(1)] = float(m.group(2))
    assert len(metrics) == 5, (tag, metrics, buf.getvalue()[-2000:])
    print(f"[eval {tag}] {metrics}")
    return metrics


def main():
    if not REUSE:
        shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(os.path.join(WORK, "runs"), exist_ok=True)
    os.makedirs(OUT, exist_ok=True)

    from a3gc_tpu.cli import main as cli
    from a3gc_tpu.smpl import load_parametric_model, write_synthetic_smpl_pickle

    smpl = write_synthetic_smpl_pickle(os.path.join(WORK, "smpl.pkl"))
    model = load_parametric_model(smpl)
    paths = make_corpus(model)
    runs = os.path.join(WORK, "runs")
    run_dir = os.path.join(runs, "learn")

    log = os.path.join(run_dir, "train_log.jsonl")
    done = os.path.join(runs, "learn.done")
    if REUSE and os.path.exists(done):
        print("[train] reusing finished run")
        wall = json.load(open(done))["wall_s"]
    else:
        shutil.rmtree(run_dir, ignore_errors=True)
        t0 = time.time()
        cli(["train", "--model", "a3gc", "-b", BATCH, "--epochs", EPOCHS,
             "--patience", "3", "--seed", "0", "--dtype", DTYPE,
             "--name", "learn", "--save_root", runs, "--smpl", smpl,
             "--train_data", paths["train"], "--valid_data",
             paths["valid"]])
        wall = round(time.time() - t0, 1)
        with open(done, "w") as f:
            json.dump({"wall_s": wall}, f)
    rows = [json.loads(l) for l in open(log) if "train_loss" in l]

    results = {}
    for tag, run_path, data in (
            ("untrained_heldout", None, "test"),
            ("trained_heldout", run_dir, "test"),
            ("trained_trainfit", run_dir, "trainfit")):
        results[tag] = run_eval(cli, tag, run_path, smpl, paths[data])

    report = {
        "n_train_sequences": N_SEQ, "cda": True, "seq_len": T,
        "epochs_per_stage": int(EPOCHS), "batch": int(BATCH),
        "dtype": DTYPE, "train_wall_s": wall,
        "loss_rows": rows, "metrics": results,
    }
    with open(os.path.join(OUT, "TRAIN_LEARNABILITY.json"), "w") as f:
        json.dump(report, f, indent=1)

    keys = ["SIP Error (deg)", "Angular Error (deg)",
            "Positional Error (cm)"]
    sip0 = results["untrained_heldout"][keys[0]]
    sip1 = results["trained_heldout"][keys[0]]
    stage_last = {s: [r for r in rows if r["stage"] == s][-1]
                  for s in (1, 2, 3)}
    stage_first = {s: [r for r in rows if r["stage"] == s][0]
                   for s in (1, 2, 3)}
    md = f"""# End-to-end learnability (factory-synthesized IMU)

{N_SEQ} smooth synthetic motions x {T} frames (+CDA mirror) through the
REAL data factory (FK + mesh LBS + vertex-acceleration synthesis +
TransPose normalization + chunking) on the synthetic body, then the
complete 3-stage `cli train` protocol (b={BATCH}, {DTYPE},
{EPOCHS} epochs/stage, patience 3) — wall {wall}s on this device — and
`cli evaluate` on {N_TEST} held-out {T_TEST}-frame sequences from the
same generator. The untrained row is the SAME evaluate path with
fresh-init parameters. Raw: TRAIN_LEARNABILITY.json.

| cascade | data | SIP (deg) | angular (deg) | positional (cm) |
|---|---|---|---|---|
""" + "\n".join(
        "| {} | {} |".format(tag.replace("_", " | "), " | ".join(
            f" {results[tag][k]:.2f} " for k in keys))
        for tag in results) + f"""

Held-out SIP {sip0:.1f}° (untrained) → {sip1:.1f}° (trained,
−{100 * (1 - sip1 / sip0):.0f}%). Per-stage losses (first → last epoch):
""" + "\n".join(
        f"- stage {s}: {stage_first[s]['train_loss']:.4f} → "
        f"{stage_last[s]['train_loss']:.4f} (valid "
        f"{stage_first[s]['valid_loss']:.4f} → "
        f"{stage_last[s]['valid_loss']:.4f}, "
        f"{stage_last[s]['epoch'] + 1} epochs)"
        for s in (1, 2, 3)) + """

This is the loop licensed real data would close, run on synthetic-but-
consistent data: it validates gradients, torch-matched optimizer
semantics, the on-device input pipeline, checkpoint discovery, and the
evaluator TOGETHER by requiring actual learning, which the fixed-weight
parity oracles cannot.
"""
    with open(os.path.join(OUT, "TRAIN_LEARNABILITY.md"), "w") as f:
        f.write(md)
    print("wrote", os.path.join(OUT, "TRAIN_LEARNABILITY.md"))


if __name__ == "__main__":
    main()
