"""PROFILE_ONCHIP v2: overlapped-window streaming variants, profiled
(round-3 VERDICT item 7).

The B=1 headline has sat at ~90k frames/s (~80% of the independently
profiled 115.6k device-bound ceiling, PROFILE_ONCHIP.md) across three
rounds; the residual is the relay's synchronous per-window fetch. This
drill measures and TRACES the three dispatch disciplines side by side so
the path to ~100% on directly-attached devices is documented with lane
evidence, not folklore:

  sync     — step(): dispatch + fetch per window (the relay default)
  upload   — host-pipelined UPLOAD-only overlap: device_put window k+1
             while window k executes, fetch synchronously (new variant:
             only the H2D RPC overlaps, the D2H fetch stays serialized —
             probes whether the relay contention is on the execute or
             the transfer side)
  async    — step_async(): deferred fetch, execution of window k
             overlaps the round-trip of k-1's result (known SLOWER
             through the relay: in-flight execute+transfer RPCs contend
             on the tunnel; kept for directly-attached devices)

Each variant runs in its OWN subprocess (single-tenant chip; clean
per-process trace), warmup excluded, 32 windows traced + an untraced
control. Artifacts: docs/validation/PROFILE_ASYNC.{md,json}.

Usage (serially, nothing else on the chip):
    python scripts/onchip_profile_async.py
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "docs", "validation")
WINDOW, WARMUP, TRACED = 60, 6, 32


def run_variant(variant: str):
    import jax

    from __graft_entry__ import _body_model, _cascade
    from a3gc_tpu.eval.streaming import StreamingCascade
    from onchip_profile import parse_trace
    from scipy.spatial.transform import Rotation

    tdir = f"/tmp/a3gc_profile_{variant}"
    dev = jax.devices()[0]
    cfg, params3 = _cascade("a3gc", precision="default")
    sess = StreamingCascade(params3, cfg, _body_model(), window=WINDOW)

    rng = np.random.default_rng(0)
    n = WARMUP + TRACED
    ori = Rotation.random(n * WINDOW * 6, random_state=7).as_matrix() \
        .reshape(n, WINDOW, 54).astype(np.float32)
    acc = rng.normal(scale=0.5, size=(n, WINDOW, 18)).astype(np.float32)

    def drive_sync(lo, hi):
        for i in range(lo, hi):
            sess.step(ori[i], acc[i])

    def drive_async(lo, hi):
        for i in range(lo, hi):
            sess.step_async(ori[i], acc[i])
        sess.flush()

    def drive_upload(lo, hi):
        # upload-pipelined: put window k+1 on device while k executes;
        # the fetch of k's pose stays synchronous (fences). Uses the
        # session's compiled fn directly (measurement harness — if this
        # wins it becomes a StreamingCascade mode).
        S = 1
        act = np.ones((S,), np.float32)
        d = (jax.device_put(ori[lo][None]), jax.device_put(acc[lo][None]))
        for i in range(lo, hi):
            out = sess._fn(sess.params3, d[0], d[1], *sess._states, act)
            if i + 1 < hi:
                d = (jax.device_put(ori[i + 1][None]),
                     jax.device_put(acc[i + 1][None]))
            np.asarray(out[0])              # fetch fences execution
            sess._states = tuple(out[1:])

    drive = {"sync": drive_sync, "async": drive_async,
             "upload": drive_upload}[variant]

    t0 = time.perf_counter()
    drive(0, WARMUP)
    compile_s = time.perf_counter() - t0
    sess.reset()

    os.makedirs(tdir, exist_ok=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(tdir, create_perfetto_trace=True):
        drive(WARMUP, n)
    traced_wall = time.perf_counter() - t0
    sess.reset()

    t0 = time.perf_counter()
    drive(WARMUP, n)
    plain_wall = time.perf_counter() - t0

    return {
        "variant": variant, "device": str(dev),
        "platform": dev.platform, "window": WINDOW,
        "windows": TRACED,
        "warmup_compile_s": round(compile_s, 1),
        "traced_ms_per_window": round(traced_wall / TRACED * 1e3, 2),
        "plain_ms_per_window": round(plain_wall / TRACED * 1e3, 2),
        "frames_per_sec": round(TRACED * WINDOW / plain_wall, 1),
        "trace_summary": parse_trace(tdir),
    }


def main():
    os.makedirs(OUT, exist_ok=True)
    results = {}
    for variant in ("sync", "upload", "async"):
        print(f"== {variant}", flush=True)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), variant],
            capture_output=True, text=True)
        if r.returncode != 0:
            results[variant] = {"error": r.stderr[-2000:]}
            print(r.stderr[-2000:], flush=True)
            continue
        results[variant] = json.loads(r.stdout.strip().splitlines()[-1])
        print(json.dumps({k: v for k, v in results[variant].items()
                          if k != "trace_summary"}), flush=True)

    with open(os.path.join(OUT, "PROFILE_ASYNC.json"), "w") as f:
        json.dump(results, f, indent=1)

    lines = [
        "# Overlapped-window streaming variants, profiled on chip",
        "",
        "Three dispatch disciplines for the B=1 W=60 streaming cascade "
        "through this environment's relay (32-window steady state, "
        "untraced control timing; full lane data in PROFILE_ASYNC.json):",
        "",
        "| variant | ms/window | frames/s | what overlaps |",
        "|---|---|---|---|",
    ]
    what = {"sync": "nothing (dispatch + fetch per window)",
            "upload": "H2D upload of window k+1 with execution of k",
            "async": "execution of k with the D2H round-trip of k-1"}
    for v in ("sync", "upload", "async"):
        r = results.get(v, {})
        if "error" in r or not r:
            lines.append(f"| {v} | failed | — | {what[v]} |")
        else:
            lines.append(f"| {v} | {r['plain_ms_per_window']} | "
                         f"{r['frames_per_sec']} | {what[v]} |")
    lines += [
        "",
        "Interpretation: the device-lane envelope (PROFILE_ONCHIP.md) is "
        "~519 us/window = 115.6k fps; everything above that is the relay "
        "round-trip. On a directly-attached device the async variant's "
        "overlap turns the fetch time into device time — through the "
        "relay the in-flight execute and transfer RPCs contend on the "
        "tunnel, which these rows quantify.",
        "",
    ]
    with open(os.path.join(OUT, "PROFILE_ASYNC.md"), "w") as f:
        f.write("\n".join(lines))
    print("wrote", os.path.join(OUT, "PROFILE_ASYNC.md"))


if __name__ == "__main__":
    if len(sys.argv) > 1:
        print(json.dumps(run_variant(sys.argv[1])))
    else:
        main()
