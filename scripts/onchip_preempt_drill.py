"""On-chip preemption drill for GracefulInterrupt training.

TPU pool preemptions deliver SIGTERM with a grace window; the reference
loses everything since its last improvement save (ref:
train_a3gc_tp.py:241-312). This drill validates our preemption story on
the REAL chip, end to end:

  phase A: launch `cli train` on the TPU (synthetic packed corpus,
           stage 3 only, effectively endless epochs), wait until a few
           epochs have logged, deliver SIGTERM, and require
             * exit code 0,
             * a final {"event": "interrupted"} log line,
             * an interrupt checkpoint on disk.
  phase B: relaunch with `--resume` from the interrupted run directory
           (start_epoch = interrupted epoch + 1) and require the run to
           pick up the interrupt checkpoint and train to completion.

The parent process never imports jax (the chip is single-tenant — only
the child owns it; phases run strictly serially).

Artifacts: docs/validation/PREEMPT_ONCHIP.{md,json} + the two train logs.

Usage:
    python scripts/onchip_preempt_drill.py
"""

import json
import os
import shutil
import signal
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = "/tmp/preempt_drill"
OUT = os.path.join(ROOT, "docs", "validation")

# chip children: repo importable from WORK cwd + the axon sitecustomize kept
CHIP_ENV = dict(os.environ)
CHIP_ENV["PYTHONPATH"] = ROOT + os.pathsep + \
    CHIP_ENV.get("PYTHONPATH", "")

TRAIN = [sys.executable, "-m", "a3gc_tpu.cli", "train",
         "--model", "a3gc", "-b", "8", "--start_at", "3", "--seed", "0",
         "--hu1", "16", "--hu2", "16", "--hu3", "16",
         "--name", "run", "--save_root", os.path.join(WORK, "runs")]


def make_data(path):
    # CPU child builds the corpus so this process stays off the chip
    code = (
        "import numpy as np\n"
        "from a3gc_tpu.data.synthetic import synthetic_packed_dataset\n"
        f"np.savez({path!r}, **synthetic_packed_dataset("
        "n_seqs=64, seq_len=128, seed=0))\n")
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "XLA_FLAGS")}
    env.update(PYTHONPATH=ROOT, JAX_PLATFORMS="cpu")
    subprocess.run([sys.executable, "-c", code], env=env, check=True)


def read_log():
    path = os.path.join(WORK, "runs", "run", "train_log.jsonl")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f]


def main():
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK, exist_ok=True)
    os.makedirs(OUT, exist_ok=True)
    npz = os.path.join(WORK, "data.npz")
    make_data(npz)
    data_flags = ["--train_data", npz, "--valid_data", npz]
    report = {}

    # ---- phase A: train on chip, SIGTERM mid-run --------------------
    print("[drill] phase A: launching chip training", flush=True)
    proc = subprocess.Popen(
        TRAIN + data_flags + ["--epochs", "100000",
                              "--patience", "100000"],
        cwd=WORK, env=CHIP_ENV, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
    t0 = time.time()
    deadline = t0 + 1200       # axon init ~55 s + stage-3 compile ~90 s
    try:
        while time.time() < deadline:
            if len(read_log()) >= 3:
                break
            if proc.poll() is not None:
                raise SystemExit(
                    f"train died before epochs:\n{proc.communicate()[0]}")
            time.sleep(2.0)
        else:
            raise SystemExit("no epoch lines before deadline")
        epochs_before = len(read_log())
        print(f"[drill] {epochs_before} epochs after "
              f"{time.time() - t0:.0f}s — delivering SIGTERM", flush=True)
        t_sig = time.time()
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=300)
        grace = time.time() - t_sig
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, f"non-zero exit:\n{out}"
    events = read_log()
    last = events[-1]
    assert last.get("event") == "interrupted", last
    int_epoch = last["epoch"]
    ckpts = sorted(os.listdir(os.path.join(WORK, "runs", "run")))
    print(f"[drill] interrupted at epoch {int_epoch}, "
          f"save+exit took {grace:.1f}s, checkpoints: {ckpts}", flush=True)
    report["phase_a"] = {
        "exit_code": proc.returncode, "interrupted_epoch": int_epoch,
        "epochs_logged": len(events), "grace_seconds": round(grace, 1),
        "time_to_first_epochs_s": round(t_sig - t0, 1),
        "checkpoints": [c for c in ckpts if c.startswith("checkpoint")],
        "last_event": last,
    }
    shutil.copy(os.path.join(WORK, "runs", "run", "train_log.jsonl"),
                os.path.join(OUT, "preempt_phaseA.jsonl"))

    # ---- phase B: resume from the interrupt checkpoint --------------
    print("[drill] phase B: resuming", flush=True)
    p = subprocess.run(
        TRAIN + data_flags + [
            "--resume", os.path.join(WORK, "runs", "run"),
            "--start_epoch", str(int_epoch + 1),
            "--epochs", str(int_epoch + 4), "--patience", "100000"],
        cwd=WORK, env=CHIP_ENV, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, timeout=1200)
    assert p.returncode == 0, f"resume failed:\n{p.stdout}"
    assert "resumed stage 3" in p.stdout, p.stdout[-2000:]
    events = read_log()
    resumed = [e for e in events if e.get("epoch", -1) > int_epoch]
    assert len(resumed) == 3, [e.get("epoch") for e in events]
    assert all("train_loss" in e and e["train_loss"] == e["train_loss"]
               for e in resumed)
    report["phase_b"] = {
        "exit_code": p.returncode,
        "resumed_epochs": [e["epoch"] for e in resumed],
        "losses": [round(e["train_loss"], 5) for e in resumed],
    }
    shutil.copy(os.path.join(WORK, "runs", "run", "train_log.jsonl"),
                os.path.join(OUT, "preempt_phaseB.jsonl"))

    with open(os.path.join(OUT, "PREEMPT_ONCHIP.json"), "w") as f:
        json.dump(report, f, indent=2)
    with open(os.path.join(OUT, "PREEMPT_ONCHIP.md"), "w") as f:
        a, b = report["phase_a"], report["phase_b"]
        f.write(
            "# On-chip preemption drill (GracefulInterrupt)\n\n"
            "SIGTERM a real TPU training run mid-stage; require a clean\n"
            "exit with a checkpoint of the current params, then resume\n"
            "from it. Parent stays off the chip; phases run serially.\n\n"
            f"- **Phase A**: interrupted at epoch {a['interrupted_epoch']} "
            f"(of an endless run); save+exit inside the grace window took "
            f"**{a['grace_seconds']}s** (vs the ~25-30s SIGTERM grace of "
            f"preemptible TPU pools); exit code 0; checkpoints on disk: "
            f"{a['checkpoints']}.\n"
            f"- **Phase B**: `--resume` picked the interrupt checkpoint "
            f"up (stage 3, start_epoch {a['interrupted_epoch'] + 1}) and "
            f"trained epochs {b['resumed_epochs']} to completion "
            f"(losses {b['losses']}).\n\n"
            "Logs: preempt_phaseA.jsonl / preempt_phaseB.jsonl. Mechanics\n"
            "+ multihost flag sync are covered by CPU tests\n"
            "(tests/test_training.py TestGracefulInterrupt,\n"
            "tests/test_multihost.py TestMultihostInterrupt).\n")
    print("[drill] OK — report written", flush=True)


if __name__ == "__main__":
    main()
