"""Full-scale on-chip training dress rehearsal (round-2 VERDICT item 2).

Round 2 validated training mechanics at toy sizes only; this drives the
COMPLETE 3-stage protocol on the TPU at realistic corpus cardinality
(~10k 300-frame chunks ~= the reference's AMASS pretrain corpus,
ref: train_a3gc_tp.py:241-312, README.MD protocol):

  A. reference protocol config: fp32, b=16 (ref: train_a3gc_tp.py:22)
     -> per-epoch wall-clock (device + real host->device feed pipeline)
  B. fast config: bf16, b=256, patience=1 -> early stopping fires under
     a real workload
  C. checkpoint/resume mid-stage: continue run A one more epoch per
     stage from its orbax checkpoints (--resume + --start_epoch)
  D. `evaluate --type pretrain --batch_streams 8` over the self-trained
     run-A checkpoints on a held-out test set (discovery + report)

No licensed mocap ships in this environment, so the corpus is synthetic
(valid smooth rotations, the factory's exact packed schema) — the target
is wall-clock, feed-pipeline behavior, early-stop/resume/eval MECHANICS
at scale, not absolute SIP (meaningless on noise). Writes
docs/validation/TRAIN_FULLSCALE.md + the run JSONLs.

Usage (serially - the chip is single-tenant; ~45 min cold):
    python scripts/onchip_train_fullscale.py
Resume after an interruption (keeps /tmp/fullscale: the corpus and any
run whose train_log.jsonl is already complete are reused, later runs
re-execute):
    REUSE=1 python scripts/onchip_train_fullscale.py
Smoke test on CPU:
    N_TRAIN=64 N_VALID=16 JAX_PLATFORMS=cpu python scripts/onchip_train_fullscale.py
"""

import json
import os
import shutil
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
WORK = "/tmp/fullscale"
OUT = os.path.join(ROOT, "docs", "validation")

N_TRAIN = int(os.environ.get("N_TRAIN", 10_000))
N_VALID = int(os.environ.get("N_VALID", 512))
SEQ_LEN = int(os.environ.get("SEQ_LEN", 300))
FAST_EPOCHS = os.environ.get("FAST_EPOCHS", "8")
B_FAST = min(256, max(N_TRAIN // 4, 1))   # fast-config batch, scaled
                                          # down for CPU smoke corpora
FAST_DTYPE = os.environ.get("FAST_DTYPE", "bfloat16")   # CPU smoke:
# FAST_DTYPE=float32 (bf16 matmuls are emulated on CPU and ~2x slower)


REUSE = os.environ.get("REUSE") == "1"


def make_corpus():
    """AMASS-scale packed corpus + chunked valid + test-style sequences."""
    from a3gc_tpu.data.synthetic import synthetic_packed_dataset

    train_npz = os.path.join(WORK, "train.npz")
    valid_npz = os.path.join(WORK, "valid.npz")
    test_npz = os.path.join(WORK, "test.npz")
    if REUSE and all(os.path.exists(p)
                     for p in (train_npz, valid_npz, test_npz)):
        print("[corpus] reusing", WORK)
        return train_npz, valid_npz, test_npz
    t0 = time.time()
    # generate in shards to bound the scipy Rotation peak memory
    shard = 1000
    parts = [synthetic_packed_dataset(n_seqs=min(shard, N_TRAIN - i),
                                      seq_len=SEQ_LEN, seed=100 + i)
             for i in range(0, N_TRAIN, shard)]
    train = {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}
    np.savez(train_npz, **train)
    del train, parts
    np.savez(valid_npz, **synthetic_packed_dataset(
        n_seqs=N_VALID, seq_len=SEQ_LEN, seed=7))
    # held-out test sequences (irregular lengths, test-npz schema)
    seqs = {}
    for i, T in enumerate((2048, 1500, 900, 3000, 1200, 600)):
        d = synthetic_packed_dataset(n_seqs=1, seq_len=T, seed=900 + i)
        seqs[f"seq{i}_ori"] = d["ori"][0]
        seqs[f"seq{i}_acc"] = d["acc"][0]
        seqs[f"seq{i}_pose"] = d["pose"][0]
    np.savez(test_npz, **seqs)
    gb = os.path.getsize(train_npz) / 1e9
    print(f"[corpus] {N_TRAIN} train chunks ({gb:.2f} GB), {N_VALID} valid, "
          f"6 test seqs in {time.time() - t0:.0f}s")
    return train_npz, valid_npz, test_npz


def losses(log_path):
    return [json.loads(l) for l in open(log_path) if "train_loss" in l]


def maybe(name, fn, complete_rows=None):
    """Run ``fn`` unless REUSE finds this step already complete (a .done
    marker from a prior invocation, or — for fixed-epoch runs — a training
    log with the expected row count). Returns (wall_s, rows)."""
    runs = os.path.join(WORK, "runs")
    marker = os.path.join(runs, name + ".done")
    log = os.path.join(runs, name, "train_log.jsonl")
    if REUSE and os.path.exists(marker):
        d = json.load(open(marker))
        return d["wall_s"], losses(log) if os.path.exists(log) else []
    if REUSE and complete_rows and os.path.exists(log):
        rows = losses(log)
        if len(rows) >= complete_rows:
            print(f"[reuse] {name}: complete log, wall from timestamps")
            wall = rows[-1]["time"] - (rows[0]["time"] - rows[0]["seconds"])
            return round(wall, 1), rows
    # re-running an incomplete run: clear its dir (the logger appends)
    shutil.rmtree(os.path.join(runs, name), ignore_errors=True)
    t0 = time.time()
    fn()
    wall = round(time.time() - t0, 1)
    with open(marker, "w") as f:
        json.dump({"wall_s": wall}, f)
    return wall, losses(log) if os.path.exists(log) else []


def main():
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon sitecustomize hijacks backend selection; the env var
        # alone does NOT keep a CPU smoke off the (single-tenant) chip
        import jax
        jax.config.update("jax_platforms", "cpu")
        import jax._src.xla_bridge as xb
        if not xb.backends_are_initialized():
            xb._backend_factories.pop("axon", None)
    if not REUSE:
        shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK, exist_ok=True)
    os.makedirs(os.path.join(WORK, "runs"), exist_ok=True)
    os.makedirs(OUT, exist_ok=True)

    from a3gc_tpu.cli import main as cli
    from a3gc_tpu.smpl import write_synthetic_smpl_pickle

    smpl = write_synthetic_smpl_pickle(
        os.path.join(WORK, "smpl.pkl"), n_vertices=432)
    train_npz, valid_npz, test_npz = make_corpus()
    runs = os.path.join(WORK, "runs")
    report = {"n_train_chunks": N_TRAIN, "seq_len": SEQ_LEN, "runs": {}}

    # --- A: reference-protocol config (fp32, b=16, ref default sizes) ---
    wall, a_rows = maybe("protocol", lambda: cli(
        ["train", "--model", "a3gc", "-b", "16", "--epochs", "2",
         "--patience", "99", "--seed", "0", "--dtype", "float32",
         "--name", "protocol", "--save_root", runs, "--smpl", smpl,
         "--train_data", train_npz, "--valid_data", valid_npz]),
        complete_rows=6)
    report["runs"]["A_protocol_fp32_b16"] = {"wall_s": wall,
                                             "epochs": a_rows}

    # --- B: fast config (bf16, b=256) with REAL early stopping ---
    wall, fast_rows = maybe("fast", lambda: cli(
        ["train", "--model", "a3gc", "-b", str(B_FAST), "--epochs",
         FAST_EPOCHS, "--patience", "1", "--seed", "0", "--dtype",
         FAST_DTYPE,
         "--name", "fast", "--save_root", runs, "--smpl", smpl,
         "--train_data", train_npz, "--valid_data", valid_npz]))
    stopped = any(
        len([r for r in fast_rows if r["stage"] == s]) < int(FAST_EPOCHS)
        for s in (1, 2, 3))
    report["runs"]["B_fast_bf16"] = {
        "wall_s": wall, "early_stopped": stopped, "epochs": fast_rows}

    # --- C: checkpoint/resume mid-stage (continue A by one epoch) ---
    wall, res_rows = maybe("protocol_resumed", lambda: cli(
        ["train", "--model", "a3gc", "-b", "16", "--epochs", "3",
         "--patience", "99", "--seed", "0", "--dtype", "float32",
         "--start_epoch", "2", "--resume", os.path.join(runs, "protocol"),
         "--name", "protocol_resumed", "--save_root", runs, "--smpl", smpl,
         "--train_data", train_npz, "--valid_data", valid_npz]))
    # the resumed epoch must continue from A's level, not from scratch
    s1_a = [r for r in a_rows if r["stage"] == 1]
    s1_r = [r for r in res_rows if r["stage"] == 1]
    resumed_ok = bool(s1_r) and s1_r[0]["train_loss"] < s1_a[0]["train_loss"]
    report["runs"]["C_resume"] = {
        "wall_s": wall,
        "continues_from_checkpoint": resumed_ok, "epochs": res_rows}

    # --- D: evaluate the self-trained checkpoints (discovery + report) ---
    def run_d():
        cwd = os.getcwd()
        os.chdir(WORK)
        try:
            cli(["evaluate", "--model", "a3gc", "--path",
                 os.path.join(runs, "protocol"), "--type", "pretrain",
                 "--batch_streams", "8", "--smpl", smpl,
                 "--datasets", test_npz])
        finally:
            os.chdir(cwd)

    wall, _ = maybe("evaluate", run_d)
    report["runs"]["D_evaluate"] = {"wall_s": wall}

    for name in ("protocol", "fast", "protocol_resumed"):
        shutil.copy(os.path.join(runs, name, "train_log.jsonl"),
                    os.path.join(OUT, f"fullscale_{name}.jsonl"))
    with open(os.path.join(OUT, "TRAIN_FULLSCALE.json"), "w") as f:
        json.dump(report, f, indent=1)

    # markdown summary
    def epoch_table(rows):
        out = ["| stage | epoch | train | valid | seconds |",
               "|---|---|---|---|---|"]
        for r in rows:
            out.append(f"| {r['stage']} | {r['epoch']} | "
                       f"{r['train_loss']:.5f} | {r['valid_loss']:.5f} | "
                       f"{r['seconds']:.1f} |")
        return "\n".join(out)

    a = report["runs"]["A_protocol_fp32_b16"]
    b = report["runs"]["B_fast_bf16"]
    c = report["runs"]["C_resume"]
    sec_a = [r["seconds"] for r in a["epochs"] if r["stage"] == 1]
    steps = N_TRAIN // 16
    proj = (f"Reference-protocol projection: stage-1 epoch = {sec_a[-1]:.0f}s "
            f"({steps} steps of b=16 through the real feed pipeline). A "
            f"30-epoch/stage pretrain (ref early stopping, patience 3, "
            f"ref: train_a3gc_tp.py:241-312) projects to "
            f"~{3 * 30 * sec_a[-1] / 3600:.1f} h on one chip at fp32; the "
            f"bf16/b={B_FAST} fast config cuts the epoch to "
            f"{[r['seconds'] for r in b['epochs'] if r['stage'] == 1][-1]:.0f}s.")
    md = f"""# Full-scale on-chip training dress rehearsal

Complete 3-stage `cli train` protocol on the TPU at AMASS-scale corpus
cardinality ({N_TRAIN} x {SEQ_LEN}-frame chunks, synthetic — see script
docstring), reference hidden sizes, real host->device feed pipeline.
Raw JSON: TRAIN_FULLSCALE.json; per-run logs: fullscale_*.jsonl.

## A. Reference protocol config (fp32, b=16) — wall {a['wall_s']}s
{epoch_table(a['epochs'])}

## B. Fast config (bf16, b={B_FAST}, patience=1) — wall {b['wall_s']}s, \
early-stopped: {b['early_stopped']}
{epoch_table(b['epochs'])}

## C. Mid-stage checkpoint/resume — wall {c['wall_s']}s, \
continues from A's checkpoints: {c['continues_from_checkpoint']}
{epoch_table(c['epochs'])}

## D. Self-trained checkpoint evaluation
`evaluate --type pretrain --batch_streams 8` discovered run A's orbax
checkpoints and produced the standard report in \
{report['runs']['D_evaluate']['wall_s']}s.

{proj}
"""
    with open(os.path.join(OUT, "TRAIN_FULLSCALE.md"), "w") as f:
        f.write(md)
    print("wrote", os.path.join(OUT, "TRAIN_FULLSCALE.md"))


if __name__ == "__main__":
    main()
