"""Natural early stop on a LEARNABLE corpus (round-3 VERDICT item 1,
long-horizon half).

onchip_train_natural_stop.py observes the patience counter firing at
AMASS-scale cardinality, but that corpus's IMU→pose relation is random —
the loss plateaus within an epoch and the stop exercises only the
noise-driven tail. This drill runs the SAME natural-stop protocol on the
factory-synthesized learnable task (train_learnability.py: smooth
motions through the real AMASS synthesis pipeline, so IMU→pose is
deterministic): the loss now descends for tens of epochs under
ExponentialLR(0.8), and the run observes what the reference's workflow
actually looks like late in a stage — epoch-20+ LR decay, best-epoch
checkpoint pileup, the plateau, and patience-3 firing on it
(ref: train_a3gc_tp.py:241-312).

Artifacts: docs/validation/TRAIN_NATURAL_LEARNABLE.{md,json} + the log.
Single-tenant chip; run serially (after natural_stop).

    python scripts/onchip_train_natural_learnable.py
CPU smoke:
    N_SEQ=8 T=320 JAX_PLATFORMS=cpu EPOCH_CAP=3 HU1=16 HU2=8 HU3=16 \
        B=8 python scripts/onchip_train_natural_learnable.py
"""

import importlib.util
import json
import os
import shutil
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
WORK = "/tmp/natural_learnable"
OUT = os.path.join(ROOT, "docs", "validation")

EPOCH_CAP = os.environ.get("EPOCH_CAP", "500")
B = os.environ.get("B", "128")
DTYPE = os.environ.get("DTYPE", "bfloat16")
HU = (os.environ.get("HU1", "256"), os.environ.get("HU2", "64"),
      os.environ.get("HU3", "128"))
N_SEQ = int(os.environ.get("N_SEQ", 256))
T = int(os.environ.get("T", 900))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(ROOT, "scripts", name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
        import jax._src.xla_bridge as xb
        if not xb.backends_are_initialized():
            xb._backend_factories.pop("axon", None)

    NS = _load("onchip_train_natural_stop")     # maybe/stage_summary
    NS.WORK = WORK
    L = _load("train_learnability")             # learnable corpus
    L.WORK = WORK
    L.N_SEQ, L.N_VAL, L.N_TEST = N_SEQ, max(N_SEQ // 8, 2), 4
    L.T, L.T_TEST = T, min(4 * T, 2048)
    L.REUSE = os.environ.get("REUSE") == "1"
    if not L.REUSE:
        shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(os.path.join(WORK, "runs"), exist_ok=True)
    os.makedirs(OUT, exist_ok=True)

    from a3gc_tpu.cli import main as cli
    from a3gc_tpu.smpl import (load_parametric_model,
                               write_synthetic_smpl_pickle)

    smpl = write_synthetic_smpl_pickle(os.path.join(WORK, "smpl.pkl"),
                                       n_vertices=432)
    model = load_parametric_model(smpl)
    t0 = time.time()
    paths = L.make_corpus(model)
    corpus_s = round(time.time() - t0, 1)
    runs = os.path.join(WORK, "runs")

    n_chunks = int(np.load(paths["train"])["ori"].shape[0])
    b = str(min(int(B), max(n_chunks // 4, 1)))
    wall, rows = NS.maybe("natural_learn", lambda: cli(
        ["train", "--model", "a3gc", "-b", b, "--dtype", DTYPE,
         "--device_data", "--steps_per_dispatch", "8",
         "--hu1", HU[0], "--hu2", HU[1], "--hu3", HU[2],
         "--patience", "3", "--epochs", EPOCH_CAP, "--seed", "0",
         "--name", "natural_learn", "--save_root", runs, "--smpl", smpl,
         "--train_data", paths["train"], "--valid_data", paths["valid"]]))
    summary = NS.stage_summary(rows, max_epochs=int(EPOCH_CAP))
    print(json.dumps(summary, indent=1), flush=True)

    # checkpoint pileup on disk (the reference writes one .tar per
    # improving epoch; ours one orbax dir — count them per stage)
    import glob
    ckpts = {s: len(glob.glob(os.path.join(
        runs, "natural_learn", f"checkpoint_model{s}_*")))
        for s in (1, 2, 3)}

    # evaluate the discovered winners on held-out learnable sequences
    cwd = os.getcwd()
    os.chdir(WORK)
    try:
        t0 = time.time()
        cli(["evaluate", "--model", "a3gc", "--smpl", smpl,
             "--hu1", HU[0], "--hu2", HU[1], "--hu3", HU[2],
             "--path", os.path.join(runs, "natural_learn"),
             "--type", "pretrain", "--batch_streams", "4",
             "--datasets", paths["test"]])
        eval_s = round(time.time() - t0, 1)
    finally:
        os.chdir(cwd)

    # per-stage valid-loss curve (first/best/last + the plateau shape)
    curves = {}
    for s in (1, 2, 3):
        vl = [r["valid_loss"] for r in rows if r["stage"] == s]
        if vl:
            curves[f"stage{s}"] = {
                "first": vl[0], "best": min(vl), "last": vl[-1],
                "epochs": len(vl),
                "decades": [round(v, 6) for v in vl[::max(len(vl)//10, 1)]],
            }

    report = {"corpus": {"n_seq": N_SEQ, "seq_len": T,
                         "train_chunks": n_chunks,
                         "build_seconds": corpus_s},
              "config": {"batch": b, "dtype": DTYPE,
                         "hidden": [int(h) for h in HU],
                         "epoch_cap": int(EPOCH_CAP)},
              "wall_s": wall, "stages": summary,
              "checkpoints_on_disk": ckpts,
              "valid_curves": curves,
              "evaluate_wall_s": eval_s}
    shutil.copy(os.path.join(runs, "natural_learn", "train_log.jsonl"),
                os.path.join(OUT, "natural_learnable.jsonl"))
    with open(os.path.join(OUT, "TRAIN_NATURAL_LEARNABLE.json"),
              "w") as f:
        json.dump(report, f, indent=1)

    def table(summary):
        lines = ["| stage | epochs | best epoch | best valid | patience "
                 "fired | ckpts written | lr at stop | s/epoch |",
                 "|---|---|---|---|---|---|---|---|"]
        for s in (1, 2, 3):
            r = summary.get(f"stage{s}")
            if r:
                lines.append(
                    f"| {s} | {r['epochs_run']} | {r['best_epoch']} | "
                    f"{r['best_valid']:.6f} | {r['patience_fired']} | "
                    f"{r['improving_epochs (checkpoints written)']} | "
                    f"{r['lr_at_stop']:.2e} | "
                    f"{r['mean_epoch_seconds']} |")
        return "\n".join(lines)

    md = f"""# Natural early stop on a LEARNABLE corpus

The long-horizon half of the natural-stop validation: the factory-
synthesized deterministic IMU→pose task ({N_SEQ} x {T}-frame smooth
sequences through the real AMASS synthesis pipeline = {n_chunks}
train chunks), fast config ({DTYPE}, b={b}, --device_data
--steps_per_dispatch 8), patience 3, {EPOCH_CAP}-epoch cap — loss
descends for tens of epochs under ExponentialLR(0.8) and the stop
happens on a REAL plateau. Wall {wall} s (+ {corpus_s} s corpus build).

{table(summary)}

Checkpoint pileup on disk (one per improving epoch, reference
semantics): {ckpts}

Full log: natural_learnable.jsonl; curves in
TRAIN_NATURAL_LEARNABLE.json.
"""
    with open(os.path.join(OUT, "TRAIN_NATURAL_LEARNABLE.md"), "w") as f:
        f.write(md)
    print("wrote", os.path.join(OUT, "TRAIN_NATURAL_LEARNABLE.md"))


if __name__ == "__main__":
    main()
