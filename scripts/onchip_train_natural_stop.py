"""The published 3-stage protocol run to its NATURAL early stop on the
chip (round-3 VERDICT item 1 — the one reference workflow never executed
at full length).

TRAIN_FULLSCALE (round 3) capped every stage at 2-8 epochs and recorded
``early-stopped: False``; the reference's actual workflow runs each stage
until the patience counter fires (ref: train_a3gc_tp.py:241-312 —
``for epoch in range(start_epoch, 500)`` with ``tolerance_counter >
args.patience`` breaking out, patience default 3). This script observes
what that projection never did: LR decay at epoch 20+ (ExponentialLR 0.8
per epoch), best-epoch checkpoint pileup, plateau behavior, and the
patience counter actually firing — in BOTH configs:

  R. the reference protocol config: fp32, b=16, patience 3
     (ref: train_a3gc_tp.py:22,41) — run through --device_data
     --steps_per_dispatch (trajectory-identical to the host-fed path,
     docs/validation/DEVICE_DATA_b16_spd.md; the raw-feed wall was
     already measured in TRAIN_FULLSCALE.md)
  F. the fast config: bf16, B=256, --device_data --steps_per_dispatch

then evaluates both winners (`evaluate --type pretrain`) and closes the
loop with the torch-reference cross-check on the naturally-stopped
weights (scripts/protocol_cross_check.py — the reference evaluates OUR
trained checkpoints with its own flow).

The corpus is the synthetic AMASS-scale one from
scripts/onchip_train_fullscale.py (no licensed mocap in this
environment); the target is the STOPPING/LR/checkpoint mechanics and
wall-clock at full length, not absolute SIP. Stats are computed from the
corpus and training runs --norm, matching the published flow
(run_reference_protocol.sh).

Writes docs/validation/TRAIN_NATURAL_STOP.{md,json} (+ the cross-check
JSON). Resumable: REUSE=1 keeps the corpus and completed runs (.done
markers); a SIGTERM'd run saves an interrupt checkpoint and re-runs
cleanly.

Usage (serially — the chip is single-tenant; expect ~2-3 h cold):
    python scripts/onchip_train_natural_stop.py
    REUSE=1 python scripts/onchip_train_natural_stop.py   # resume
CPU smoke:
    N_TRAIN=64 N_VALID=16 JAX_PLATFORMS=cpu EPOCH_CAP=3 \
        python scripts/onchip_train_natural_stop.py
"""

import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
WORK = "/tmp/fullscale"          # shared with onchip_train_fullscale
OUT = os.path.join(ROOT, "docs", "validation")
# natural stop needs the 500-epoch reference cap; CPU smoke caps lower
EPOCH_CAP = os.environ.get("EPOCH_CAP", "500")
B_REF = int(os.environ.get("B_REF", 16))
LR = "1e-3"                      # ref pretrain lr (train_a3gc_tp.py:23)
# CPU smoke: FAST_DTYPE=float32 (bf16 matmuls are emulated on CPU and
# dramatically slower — 349 s/epoch measured vs ~20 s fp32)
FAST_DTYPE = os.environ.get("FAST_DTYPE", "bfloat16")
# CPU smoke: shrink the nets (compile + step time on a 1-core host);
# the chip run keeps the reference hidden sizes
HU = (os.environ.get("HU1", "256"), os.environ.get("HU2", "64"),
      os.environ.get("HU3", "128"))


def losses(log_path):
    return [json.loads(l) for l in open(log_path) if "train_loss" in l]


def maybe(name, fn):
    """REUSE: skip steps whose .done marker exists (same protocol as
    onchip_train_fullscale.maybe, minus the row-count heuristic — a
    natural-stop run's length is unknown a priori)."""
    runs = os.path.join(WORK, "runs")
    marker = os.path.join(runs, name + ".done")
    log = os.path.join(runs, name, "train_log.jsonl")
    if os.environ.get("REUSE") == "1" and os.path.exists(marker):
        d = json.load(open(marker))
        return d["wall_s"], losses(log) if os.path.exists(log) else []
    shutil.rmtree(os.path.join(runs, name), ignore_errors=True)
    t0 = time.time()
    fn()
    wall = round(time.time() - t0, 1)
    # a SIGTERM'd run returns cleanly (GracefulInterrupt) but is NOT a
    # completed natural-stop run — refuse the marker so REUSE re-runs it
    if os.path.exists(log) and any(
            json.loads(l).get("event") == "interrupted"
            for l in open(log)):
        raise SystemExit(
            f"run '{name}' was interrupted mid-training (SIGTERM/SIGINT) "
            f"— re-run with REUSE=1 to redo it")
    with open(marker, "w") as f:
        json.dump({"wall_s": wall}, f)
    return wall, losses(log) if os.path.exists(log) else []


def stage_summary(rows, patience=3, max_epochs=500):
    """Per-stage: epochs run, best epoch, whether patience fired, the
    LR at the stop epoch (lr0 * 0.8^epoch — ExponentialLR(0.8), ref:
    train_a3gc_tp.py:203-205), and checkpoint-worthy (improving) epochs."""
    out = {}
    for s in (1, 2, 3):
        sr = [r for r in rows if r["stage"] == s]
        if not sr:
            continue
        vl = [r["valid_loss"] for r in sr]
        best_i = int(np.argmin(vl))
        improving = [i for i in range(len(vl))
                     if vl[i] < min(vl[:i], default=float("inf"))]
        out[f"stage{s}"] = {
            "epochs_run": len(sr),
            "best_epoch": sr[best_i]["epoch"],
            "best_valid": vl[best_i],
            "patience_fired": len(sr) - 1 - best_i > patience
            and len(sr) < max_epochs,
            "improving_epochs (checkpoints written)": len(improving),
            "lr_at_stop": float(1e-3 * 0.8 ** sr[-1]["epoch"]),
            "mean_epoch_seconds": round(
                float(np.mean([r["seconds"] for r in sr])), 1),
        }
    return out


def main():
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon sitecustomize hijacks backend selection; the env var
        # alone does NOT keep a CPU smoke off the (single-tenant) chip
        import jax
        jax.config.update("jax_platforms", "cpu")
        import jax._src.xla_bridge as xb
        if not xb.backends_are_initialized():
            xb._backend_factories.pop("axon", None)
    os.makedirs(os.path.join(WORK, "runs"), exist_ok=True)
    os.makedirs(OUT, exist_ok=True)

    from a3gc_tpu.cli import main as cli
    from a3gc_tpu.smpl import write_synthetic_smpl_pickle

    # corpus: shared with the dress rehearsal (REUSE honored there)
    os.environ.setdefault("REUSE", "1" if os.path.exists(
        os.path.join(WORK, "train.npz")) else "0")
    import onchip_train_fullscale as FS
    FS.REUSE = os.environ["REUSE"] == "1"
    train_npz, valid_npz, test_npz = FS.make_corpus()
    smpl = write_synthetic_smpl_pickle(
        os.path.join(WORK, "smpl.pkl"), n_vertices=432)
    runs = os.path.join(WORK, "runs")

    # stats where --norm resolves them (config.paths under data_root);
    # also under the sym name protocol_cross_check.py expects
    stats_dir = os.path.join(WORK, "stats")
    os.makedirs(stats_dir, exist_ok=True)
    stats_npz = os.path.join(stats_dir, "all_train_stats.npz")
    if not os.path.exists(stats_npz):
        cli(["stats", "--inputs", train_npz, "--output", stats_npz])
    sym = os.path.join(stats_dir, "all_sym_train_stats.npz")
    if not os.path.exists(sym):
        shutil.copy(stats_npz, sym)

    common = ["--hu1", HU[0], "--hu2", HU[1], "--hu3", HU[2],
              "--smpl", smpl, "--data_root", WORK, "--norm",
              "--train_data", train_npz, "--valid_data", valid_npz,
              "--save_root", runs, "--model", "a3gc", "--seed", "0",
              "--patience", "3", "--epochs", EPOCH_CAP, "--lr", LR]

    report = {"corpus": {"train_chunks": FS.N_TRAIN,
                         "seq_len": FS.SEQ_LEN},
              "epoch_cap": int(EPOCH_CAP), "runs": {}}

    # --- F: fast config to natural stop ---
    b_fast = str(min(256, max(FS.N_TRAIN // 4, 1)))
    f_key = f"F_fast_{FAST_DTYPE}_b{b_fast}"
    # accum=2: monolithic B=256 + the resident corpus does not fit the
    # 16 GB HBM (docs/validation/DEVICE_DATA.md) — this is the measured-
    # best r3 config (bf16 B=256 accum=2)
    accum_f = "2" if int(b_fast) >= 256 else "1"
    wall_f, rows_f = maybe("natural_fast", lambda: cli(
        ["train", "-b", b_fast, "--dtype", FAST_DTYPE, "--device_data",
         "--accum", accum_f,
         "--steps_per_dispatch", "8", "--name", "natural_fast"] + common))
    report["runs"][f_key] = {
        "wall_s": wall_f, "stages": stage_summary(rows_f, max_epochs=int(EPOCH_CAP)),
        "total_epochs": len(rows_f)}
    print(json.dumps(report["runs"][f_key], indent=1), flush=True)

    r_key = "R_reference_fp32_b" + str(B_REF)
    # --- R: reference protocol config to natural stop ---
    wall_r, rows_r = maybe("natural_ref", lambda: cli(
        ["train", "-b", str(B_REF), "--dtype", "float32", "--device_data",
         "--steps_per_dispatch", "25", "--name", "natural_ref"] + common))
    report["runs"][r_key] = {
        "wall_s": wall_r, "stages": stage_summary(rows_r, max_epochs=int(EPOCH_CAP)),
        "total_epochs": len(rows_r)}
    print(json.dumps(report["runs"][r_key],
                     indent=1), flush=True)

    # --- evaluate both winners (discovery picks the best checkpoints) ---
    cwd = os.getcwd()
    os.chdir(WORK)
    try:
        for name in ("natural_fast", "natural_ref"):
            t0 = time.time()
            cli(["evaluate", "--model", "a3gc", "--norm", "--smpl", smpl,
                 "--hu1", HU[0], "--hu2", HU[1], "--hu3", HU[2],
                 "--data_root", WORK, "--path", os.path.join(runs, name),
                 "--type", "pretrain", "--batch_streams", "8",
                 "--datasets", test_npz])
            report["runs"].setdefault("evaluate_wall_s", {})[name] = round(
                time.time() - t0, 1)
    finally:
        os.chdir(cwd)

    # --- torch-reference cross-check on the naturally-stopped weights ---
    # (CPU subprocess off the chip; short test subset keeps the torch
    # per-timestep loop tractable at the full 256/64/128 hidden sizes)
    short_npz = os.path.join(WORK, "crosscheck_test.npz")
    if not os.path.exists(short_npz):
        from a3gc_tpu.data.synthetic import synthetic_packed_dataset
        seqs = {}
        for i, T in enumerate((600, 480)):
            d = synthetic_packed_dataset(n_seqs=1, seq_len=T, seed=950 + i)
            seqs[f"seq{i}_ori"] = d["ori"][0]
            seqs[f"seq{i}_acc"] = d["acc"][0]
            seqs[f"seq{i}_pose"] = d["pose"][0]
        np.savez(short_npz, **seqs)
    # protocol_cross_check expects the run_reference_protocol.sh layout
    # (<run_dir>/models/<model>_protocol); link our run into it
    cc_dir = os.path.join(WORK, "cc_layout")
    link = os.path.join(cc_dir, "models", "a3gc_protocol")
    os.makedirs(os.path.dirname(link), exist_ok=True)
    if not os.path.exists(link):
        os.symlink(os.path.join(runs, "natural_ref"), link)
    cc_out = os.path.join(OUT, "NATURAL_STOP_CROSSCHECK.json")
    cc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts",
                                      "protocol_cross_check.py"),
         "--run_dir", cc_dir,
         "--hu1", HU[0], "--hu2", HU[1], "--hu3", HU[2],
         "--data_root", WORK, "--smpl", smpl, "--phase", "pretrain",
         "--datasets", short_npz, "--out", cc_out],
        env={**os.environ, "PYTHONPATH": ROOT, "JAX_PLATFORMS": "cpu"},
        capture_output=True, text=True)
    report["crosscheck"] = {"returncode": cc.returncode,
                            "tail": cc.stdout.strip().splitlines()[-3:]}
    print(cc.stdout[-2000:], cc.stderr[-2000:], flush=True)

    for name in ("natural_fast", "natural_ref"):
        shutil.copy(os.path.join(runs, name, "train_log.jsonl"),
                    os.path.join(OUT, f"natural_{name.split('_')[1]}.jsonl"))
    with open(os.path.join(OUT, "TRAIN_NATURAL_STOP.json"), "w") as f:
        json.dump(report, f, indent=1)

    def stage_table(summary):
        lines = ["| stage | epochs | best epoch | best valid | patience "
                 "fired | ckpts written | lr at stop | s/epoch |",
                 "|---|---|---|---|---|---|---|---|"]
        for s in (1, 2, 3):
            r = summary.get(f"stage{s}")
            if r:
                lines.append(
                    f"| {s} | {r['epochs_run']} | {r['best_epoch']} | "
                    f"{r['best_valid']:.5f} | {r['patience_fired']} | "
                    f"{r['improving_epochs (checkpoints written)']} | "
                    f"{r['lr_at_stop']:.2e} | "
                    f"{r['mean_epoch_seconds']} |")
        return "\n".join(lines)

    md = f"""# 3-stage protocol to NATURAL early stop (round-3 VERDICT #1)

Both configs run each stage until the reference's patience counter fires
(patience 3, 500-epoch cap, ref: train_a3gc_tp.py:241-312), on the
AMASS-scale synthetic corpus ({FS.N_TRAIN} x {FS.SEQ_LEN}-frame chunks),
--norm with corpus stats, reference hidden sizes, --device_data
--steps_per_dispatch. Raw JSON: TRAIN_NATURAL_STOP.json; full logs:
natural_fast.jsonl / natural_ref.jsonl.

## F. Fast config ({FAST_DTYPE}, B={b_fast}) — wall {wall_f}s
{stage_table(report['runs'][f_key]['stages'])}

## R. Reference config (fp32, b={B_REF}) — wall {wall_r}s
{stage_table(report['runs'][r_key]['stages'])}

## Winners evaluated + cross-checked
`evaluate --type pretrain --batch_streams 8` on both runs' discovered
best checkpoints; the torch reference re-evaluated run R's weights with
its own flow (NATURAL_STOP_CROSSCHECK.json, returncode
{report['crosscheck']['returncode']}).
"""
    with open(os.path.join(OUT, "TRAIN_NATURAL_STOP.md"), "w") as f:
        f.write(md)
    print("wrote", os.path.join(OUT, "TRAIN_NATURAL_STOP.md"))


if __name__ == "__main__":
    main()
