"""On-chip A/B: host-fed vs device-resident (--device_data) training epochs.

docs/validation/TRAIN_FULLSCALE.md measured epoch WALL at 2-6x the
device-step time at B=256 bf16 — the epoch is host-feed-bound (tens of
MB per batch over the relay link). `--device_data` uploads the packed
corpus to HBM once and gathers batches by index inside the jitted step,
cutting the per-step transfer to a [B] int32 vector. This script
measures what that buys end-to-end: the full 3-stage `cli train` at the
fast config (bf16, b=256 by default) with and without the flag, on the
same corpus, in separate serial processes (the chip is single-tenant and
per-process HBM states must not overlap).

Reuses the /tmp/fullscale corpus when present (see
onchip_train_fullscale.py); otherwise generates one at N_TRAIN chunks.

Usage (serially, ~25 min cold):
    python scripts/onchip_device_data.py
CPU smoke:
    N_TRAIN=64 N_VALID=16 B=8 EPOCHS=2 DTYPE=float32 \
        JAX_PLATFORMS=cpu python scripts/onchip_device_data.py
If the device-resident config OOMs (corpus + training working set),
rerun with ACCUM=2 (microbatch accumulation halves the activation
residency at identical effective batch). Measured on chip: B=256 bf16
monolithic + the 10k-chunk corpus does NOT fit (RESOURCE_EXHAUSTED);
ACCUM=2 fits — the committed DEVICE_DATA.md numbers use ACCUM=2 for
both configs.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
WORK = os.environ.get("WORK", "/tmp/fullscale")
OUT = os.path.join(ROOT, "docs", "validation")

N_TRAIN = int(os.environ.get("N_TRAIN", 10_000))
N_VALID = int(os.environ.get("N_VALID", 512))
SEQ_LEN = int(os.environ.get("SEQ_LEN", 300))
B = int(os.environ.get("B", 256))
EPOCHS = int(os.environ.get("EPOCHS", 3))
DTYPE = os.environ.get("DTYPE", "bfloat16")
ACCUM = os.environ.get("ACCUM", "1")
HU = os.environ.get("HU", "")      # CPU smoke: HU=8 shrinks the nets
TAG = os.environ.get("TAG", "")    # suffix for the output artifacts
                                   # (e.g. TAG=_b16 for a second config)
SPD = os.environ.get("SPD", "25")  # --steps_per_dispatch of device_spd
# comma list of configs to run; speedups/deltas are vs the FIRST one
CONFIGS = os.environ.get("CONFIGS", "host_fed,device_resident").split(",")


def ensure_corpus():
    train_npz = os.path.join(WORK, "train.npz")
    valid_npz = os.path.join(WORK, "valid.npz")
    if os.path.exists(train_npz) and os.path.exists(valid_npz):
        print("[corpus] reusing", WORK)
        return train_npz, valid_npz
    from a3gc_tpu.data.synthetic import synthetic_packed_dataset

    os.makedirs(WORK, exist_ok=True)
    t0 = time.time()
    shard = 1000
    parts = [synthetic_packed_dataset(n_seqs=min(shard, N_TRAIN - i),
                                      seq_len=SEQ_LEN, seed=100 + i)
             for i in range(0, N_TRAIN, shard)]
    train = {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}
    np.savez(train_npz, **train)
    del train, parts
    np.savez(valid_npz, **synthetic_packed_dataset(
        n_seqs=N_VALID, seq_len=SEQ_LEN, seed=7))
    print(f"[corpus] {N_TRAIN} chunks in {time.time() - t0:.0f}s")
    return train_npz, valid_npz


def run(name, extra, train_npz, valid_npz):
    import shutil

    runs = os.path.join(WORK, "dd_runs" + TAG)
    os.makedirs(runs, exist_ok=True)
    # the JSONL logger appends: clear any prior run of this name
    shutil.rmtree(os.path.join(runs, name), ignore_errors=True)
    log = os.path.join(runs, name, "train_log.jsonl")
    args = [sys.executable, "-m", "a3gc_tpu.cli", "train",
            "--model", "a3gc", "-b", str(B), "--dtype", DTYPE,
            "--epochs", str(EPOCHS), "--patience", "99",
            "--accum", ACCUM, "--seed", "0",
            "--name", name, "--save_root", runs,
            "--train_data", train_npz, "--valid_data", valid_npz] + extra
    if HU:
        args += ["--hu1", HU, "--hu2", HU, "--hu3", HU]
    # keep the axon sitecustomize dir on PYTHONPATH for chip runs; under
    # a JAX_PLATFORMS=cpu smoke, drop it so the child stays off the chip
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        pp = ROOT
    else:
        prev = os.environ.get("PYTHONPATH", "")
        pp = ROOT + (":" + prev if prev else "")
    t0 = time.time()
    r = subprocess.run(args, cwd=ROOT,
                       env={**os.environ, "PYTHONPATH": pp})
    wall = round(time.time() - t0, 1)
    assert r.returncode == 0, f"{name} failed rc={r.returncode}"
    rows = [json.loads(l) for l in open(log) if "train_loss" in l]
    return wall, rows


KNOWN = {
    "host_fed": [],
    "device_resident": ["--device_data"],
    # device-resident + M steps folded into one lax.scan dispatch — the
    # lever for the dispatch-bound small-batch regime (b=16 reference
    # protocol: 625 steps/epoch through the ~30 ms relay round trip)
    "device_spd": ["--device_data", "--steps_per_dispatch", SPD],
}


def main():
    train_npz, valid_npz = ensure_corpus()
    report = {"n_train_chunks": N_TRAIN, "seq_len": SEQ_LEN, "batch": B,
              "dtype": DTYPE, "accum": ACCUM, "epochs_per_stage": EPOCHS,
              "steps_per_dispatch": SPD, "configs": {}}
    for name in CONFIGS:
        wall, rows = run(name, KNOWN[name], train_npz, valid_npz)
        # epoch 0 of each stage includes stage compile; steady = later
        steady = [r["seconds"] for r in rows if r["epoch"] > 0]
        report["configs"][name] = {
            "wall_s": wall,
            "epoch_rows": [{k: r[k] for k in
                            ("stage", "epoch", "train_loss", "valid_loss",
                             "seconds")} for r in rows],
            "steady_epoch_mean_s": (round(float(np.mean(steady)), 1)
                                    if steady else None),
        }
        print(f"[{name}] wall {wall}s, steady epochs "
              f"{[round(s, 1) for s in steady]}")

    base = report["configs"][CONFIGS[0]]
    for name in CONFIGS[1:]:
        c = report["configs"][name]
        if base["steady_epoch_mean_s"] and c["steady_epoch_mean_s"]:
            c["steady_epoch_speedup_vs_" + CONFIGS[0]] = round(
                base["steady_epoch_mean_s"] / c["steady_epoch_mean_s"], 2)
        # losses must agree (identical seeds/permutations/rng by design)
        pairs = list(zip(base["epoch_rows"], c["epoch_rows"]))
        c["max_train_loss_delta"] = max(
            abs(a["train_loss"] - b["train_loss"]) for a, b in pairs)
        c["max_valid_loss_delta"] = max(
            abs(a["valid_loss"] - b["valid_loss"]) for a, b in pairs)

    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "DEVICE_DATA" + TAG + ".json"), "w") as f:
        json.dump(report, f, indent=1)
    lines = [
        "# Device-resident corpus training (`--device_data`) on chip",
        "",
        f"Corpus: {N_TRAIN} x {SEQ_LEN}-frame chunks, b={B} {DTYPE}, "
        f"accum={ACCUM}, {EPOCHS} epochs/stage, full 3-stage `cli train`, "
        "separate serial processes. Epoch-0 rows include stage compile; "
        "the steady mean is over later epochs. device_spd = device-"
        f"resident + `--steps_per_dispatch {SPD}`. Speedups and loss "
        f"deltas are vs `{CONFIGS[0]}` (losses agree by construction — "
        "the paths are oracle-tested equal on CPU).",
        "",
        "| config | total wall (s) | steady epoch mean (s) | speedup | "
        "max train/valid loss delta |",
        "|---|---|---|---|---|",
    ]
    for name in CONFIGS:
        c = report["configs"][name]
        sp = c.get("steady_epoch_speedup_vs_" + CONFIGS[0])
        lines.append(
            f"| {name} | {c['wall_s']} | {c['steady_epoch_mean_s']} | "
            + (f"{sp}x" if sp else "—") + " | "
            + (f"{c['max_train_loss_delta']:.2e} / "
               f"{c['max_valid_loss_delta']:.2e}"
               if "max_train_loss_delta" in c else "—") + " |")
    with open(os.path.join(OUT, "DEVICE_DATA" + TAG + ".md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({k: v for k, v in report.items() if k != "configs"}))


if __name__ == "__main__":
    main()
