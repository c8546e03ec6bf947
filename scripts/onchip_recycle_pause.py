r"""Client-observed RECYCLE PAUSE: live-checkpoint vs artifact serving.

The state-preserving exec recycle (`serve --recycle_rss_mb` /
`POST /v1/recycle`, the relay-leak mitigation validated by
onchip_serve_soak_recycle.py) restarts the process; clients keep their
slots and state but see an outage while the fresh process re-initializes
the backend and re-compiles the serving program. This drill measures
that outage the way a client sees it — the wall time of one step request
issued immediately after `/v1/recycle` returns (the inherited listening
socket queues the connection until the re-exec'd server accepts) — for
the two deployment styles:

  * live checkpoints (`serve --path ...`): the pause pays backend init
    + a full live trace/lower/compile of the serving program.
  * artifact (`serve --artifact ...`): the pause pays backend init + the
    deserialized-program compile only (~8-15 s on chip,
    docs/validation/EXPORT_ONCHIP.md) — export already paid lowering.

Also re-checks program continuity: a fresh slot's step on a fixed window
returns the same bytes before and after the recycle (zero state + same
params ⇒ bit-equal poses).

Artifacts: docs/validation/RECYCLE_PAUSE.{md,json}.
Single-tenant chip: run serially (never alongside another chip process).

    python scripts/onchip_recycle_pause.py
Single-net dip family (VERDICT r4 #1's deployment-matrix cell):
    MODEL=dip python scripts/onchip_recycle_pause.py
CPU smoke (tiny nets, xla-backend artifact):
    JAX_PLATFORMS=cpu HU=8 python scripts/onchip_recycle_pause.py
    JAX_PLATFORMS=cpu HU=8 MODEL=dip python scripts/onchip_recycle_pause.py
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "docs", "validation")

from a3gc_tpu.client import PoseClient  # noqa: E402 (the shipped wire
#                                         client — the drill measures the
#                                         code path users actually run)

HU = int(os.environ.get("HU", "256"))
W = int(os.environ.get("W", "60"))
STREAMS = 8
SMOKE = os.environ.get("JAX_PLATFORMS") == "cpu"
# MODEL=dip drills the single-net family (DipStreamingSession live vs
# the family="dip" artifact) — the round-4 VERDICT's missing deployment
# cell; writes RECYCLE_PAUSE_DIP.{md,json} instead
MODEL = os.environ.get("MODEL", "a3gc")


def _serve_env():
    env = dict(os.environ)
    if SMOKE:
        # keep the CPU smoke's server off the single-tenant chip: env
        # alone doesn't beat the axon sitecustomize — drop it
        env["PYTHONPATH"] = ROOT
    return env


def _spawn(args_tail, err_path):
    t0 = time.time()
    proc = subprocess.Popen(
        [sys.executable, "-m", "a3gc_tpu.cli", "serve"] + args_tail
        + ["--port", "0"],
        stdout=subprocess.PIPE, stderr=open(err_path, "w"),
        text=True, env=_serve_env())
    info = json.loads(proc.stdout.readline())
    host, port = info["serving"].rsplit("//", 1)[1].rsplit(":", 1)
    return proc, (host, int(port)), round(time.time() - t0, 1)


def _drill(name, args_tail, work, probe_ori, probe_acc):
    r"""Spawn → time cold start → probe → recycle → time pause → probe."""
    proc, addr, startup = _spawn(args_tail,
                                 os.path.join(work, f"{name}.err"))
    print(f"[{name}] serving on {addr} after {startup}s", flush=True)
    try:
        # cold start: first step pays whatever compile startup deferred.
        # PoseClient is the shipped wire client (seq-tagged at-most-once
        # steps, idempotency-token acquire/release): the drill measures
        # the code path users actually run.
        c1 = PoseClient(*addr, timeout=900, retry_s=0.0)
        c1.acquire()
        t0 = time.time()
        pre = c1.step(probe_ori, probe_acc)
        cold = time.time() - t0
        print(f"[{name}] first step {cold:.1f}s", flush=True)
        # steady-state request for contrast
        t0 = time.time()
        c1.step(probe_ori, probe_acc)
        warm = time.time() - t0
        # a second slot holds CARRIED state across the recycle: step it
        # once pre-recycle, once post — the post step must differ from
        # the first (state advanced), proving restore didn't zero it
        c2 = PoseClient(*addr, timeout=900, retry_s=0.0)
        c2.acquire()
        carried_pre = c2.step(probe_ori, probe_acc)

        c1.recycle()
        t0 = time.time()
        # recovery probe on the ALREADY-HELD slot (acquiring fresh
        # sessions during the pause leaks slots: the 30 s-timeout client
        # abandons acquires the reviving server answers late — each one
        # permanently occupies a slot, and after S retries every acquire
        # 503s forever; reusing the held slot is also what a real client
        # does). A single long-timeout step rides the inherited socket's
        # backlog through exec+init+compile and times the whole outage;
        # PoseClient retries the SAME (seq, window), so the reviving
        # server applies it exactly once.
        deadline = time.time() + 1800
        c1.timeout, ok = 1500, False
        while time.time() < deadline:
            try:
                c1.step(probe_ori, probe_acc)
                ok = True
                break
            except Exception:
                time.sleep(2.0)
        pause = time.time() - t0
        assert ok, f"{name}: no recovery within 30 min"
        # a FRESH slot post-recovery: zero state + same params ⇒ its
        # first step must equal the pre-recycle first step bit-for-bit
        with PoseClient(*addr, timeout=120, retry_s=30.0) as c3:
            post = c3.step(probe_ori, probe_acc)
        print(f"[{name}] recycle pause {pause:.1f}s", flush=True)
        carried_post = c2.step(probe_ori, probe_acc)
        return {
            "config": name,
            "startup_s": startup,
            "first_step_s": round(cold, 1),
            "warm_step_s": round(warm, 3),
            "recycle_pause_s": round(pause, 1),
            "fresh_slot_bit_equal": bool(np.array_equal(pre, post)),
            "carried_state_advanced": bool(
                not np.array_equal(carried_post, carried_pre)),
        }
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


def main():
    # the orchestrator stays OFF the chip (single-tenant)
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax._src.xla_bridge as xb
    if not xb.backends_are_initialized():
        xb._backend_factories.pop("axon", None)

    from scipy.spatial.transform import Rotation

    from a3gc_tpu.data import load_adjacency_template
    from a3gc_tpu.models import nets as N
    from a3gc_tpu.models.pipeline import (CascadeConfig, PoseNetConfig,
                                          init_pose_net)
    from a3gc_tpu.smpl import write_synthetic_smpl_pickle
    from a3gc_tpu.utils import save_params

    work = tempfile.mkdtemp(prefix="a3gc_recycle_pause_")
    nira = load_adjacency_template()

    def g(ui, uo, h, rot):
        return PoseNetConfig(net=N.GraphNetConfig(
            cell="a3gc", units_in=ui, units_out=uo, units_hidden=h),
            rotsize=rot)

    if MODEL == "dip":
        # single-net dip: one checkpoint + the mandatory stats file in
        # the --data_root layout (the dip input prep always normalizes)
        cfg = PoseNetConfig(net=N.DIPConfig(n_input=60, n_output=15 * 9,
                                            n_hidden=HU), rotsize=9)
        save_params(init_pose_net(jax.random.PRNGKey(0), cfg),
                    os.path.join(work, "ckpts"), 1, 0, finetuning=True)
        stats_dir = os.path.join(work, "stats")
        os.makedirs(stats_dir, exist_ok=True)
        rng_s = np.random.default_rng(3)
        np.savez(os.path.join(stats_dir, "all_train_stats.npz"),
                 ori_mean_channel=(rng_s.normal(size=54) * 0.1
                                   ).astype(np.float32),
                 ori_std_channel=(1.0 + rng_s.random(54)
                                  ).astype(np.float32),
                 acc_mean_channel=(rng_s.normal(size=18) * 0.1
                                   ).astype(np.float32),
                 acc_std_channel=(1.0 + rng_s.random(18)
                                  ).astype(np.float32))
    else:
        cfg = CascadeConfig(stage1=g(12, 3, HU, 3),
                            stage2=g(15, 3, max(HU // 4, 8), 3),
                            stage3=g(15, 9, max(HU // 2, 8), 9))
        for i, c in enumerate((cfg.stage1, cfg.stage2, cfg.stage3)):
            save_params(init_pose_net(jax.random.PRNGKey(i), c, nira),
                        os.path.join(work, "ckpts"), i + 1, 0,
                        finetuning=True)
    smpl = write_synthetic_smpl_pickle(os.path.join(work, "smpl.pkl"),
                                       n_vertices=432)

    if MODEL == "dip":
        size = ["--model", "dip", "--hu1", str(HU),
                "--data_root", work]
    else:
        size = ["--hu1", str(HU), "--hu2", str(max(HU // 4, 8)),
                "--hu3", str(max(HU // 2, 8))]
    base = ["--path", os.path.join(work, "ckpts"), "--smpl", smpl,
            "--window", str(W), "--streams", str(STREAMS)]

    # export the deployment artifact once (chip: pallas Mosaic kernels;
    # CPU smoke: portable xla) — the artifact server's recycle pays only
    # the deserialized compile
    art = os.path.join(work, "artifact")
    backend = "xla" if SMOKE else "pallas"
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "a3gc_tpu.cli", "export"] + size + [
            "--path", os.path.join(work, "ckpts"), "--smpl", smpl,
            "--window", str(W), "--streams", str(STREAMS),
            "--backend", backend, "--output", art],
        env=_serve_env(), cwd=ROOT)
    assert r.returncode == 0, "export failed"
    export_s = round(time.time() - t0, 1)
    print(f"[export] {backend} artifact in {export_s}s", flush=True)

    rng = np.random.default_rng(0)
    probe_ori = Rotation.random(W * 6, random_state=1).as_matrix() \
        .reshape(W, 54).astype(np.float32)
    probe_acc = rng.normal(scale=0.5, size=(W, 18)).astype(np.float32)

    rows = [
        _drill("live_checkpoints", size + base, work, probe_ori,
               probe_acc),
        _drill("artifact",
               ["--artifact", art, "--streams", str(STREAMS),
                "--window", str(W)], work, probe_ori, probe_acc),
    ]

    tag = "" if MODEL == "a3gc" else f"_{MODEL.upper()}"
    if SMOKE:
        tag += "_SMOKE"     # never clobber committed chip artifacts
    result = {"model": MODEL, "window": W, "streams": STREAMS, "hu1": HU,
              "backend": backend, "export_s": export_s,
              "smoke": SMOKE, "rows": rows}
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, f"RECYCLE_PAUSE{tag}.json"), "w") as f:
        json.dump(result, f, indent=1)
    live, arti = rows
    md = f"""# Recycle pause: live checkpoints vs deployment artifact ({MODEL})

One step request issued the moment `POST /v1/recycle` returns — the
client-observed outage of the state-preserving exec recycle
(`--recycle_rss_mb` / SERVE_SOAK_RECYCLE.md), for the two deployment
styles ({STREAMS}-slot {MODEL} server, W={W}, real net sizes).

| config | startup | first step | warm step | recycle pause | fresh-slot bit-equal | carried state advanced |
|---|---|---|---|---|---|---|
| live checkpoints | {live['startup_s']} s | {live['first_step_s']} s | {live['warm_step_s'] * 1e3:.0f} ms | **{live['recycle_pause_s']} s** | {live['fresh_slot_bit_equal']} | {live['carried_state_advanced']} |
| artifact | {arti['startup_s']} s | {arti['first_step_s']} s | {arti['warm_step_s'] * 1e3:.0f} ms | **{arti['recycle_pause_s']} s** | {arti['fresh_slot_bit_equal']} | {arti['carried_state_advanced']} |

The artifact server's pause skips trace+lowering (paid once at
`cli export`, {export_s} s here): deployments that need tight recycle
windows should serve `--artifact` (docs/validation/EXPORT_ONCHIP.md
measured ~8 s deserialized compile vs ~5-6 min live on chip).
Program continuity holds in both: a fresh slot reproduces the exact
pre-recycle bytes, and a slot with carried state resumes from its
restored (not zeroed) state.

Raw: RECYCLE_PAUSE{tag}.json.
"""
    with open(os.path.join(OUT, f"RECYCLE_PAUSE{tag}.md"), "w") as f:
        f.write(md)
    print(json.dumps(result, indent=1))
    print("wrote", os.path.join(OUT, f"RECYCLE_PAUSE{tag}.md"))


if __name__ == "__main__":
    main()
