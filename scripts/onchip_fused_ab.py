r"""Interleaved on-chip A/B of the fused single-dispatch steady-state
streaming program vs the two-pass (emission fetch + async state-advance
dispatch) path.

Process-level A/Bs through this environment's remote TPU relay are
noise-dominated (the identical-code control row drifted 91 -> 68 ms
between two back-to-back runs), so this script interleaves the two
paths TICK BY TICK inside one process: for each (K, P) config it builds
two sessions — fused and two-pass — sharing the same compiled window
programs where they overlap, feeds both the same windows, and times
alternating steady-state ticks. Relay drift hits both sides equally.

Run (chip is single-tenant — nothing else may touch it):
    STREAMS=16 python scripts/onchip_fused_ab.py
Writes docs/validation/FUSED_DISPATCH_AB.{md,json}.
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "docs", "validation")

W = int(os.environ.get("W", "60"))
N_TICKS = int(os.environ.get("N_TICKS", "24"))   # per side, interleaved
CONFIGS = tuple(
    tuple(int(x) for x in kp.split(","))
    for kp in os.environ.get("KP", "1,0;0,1;1,1;1,2").split(";"))
STREAMS = int(os.environ.get("STREAMS", "16"))


def main():
    import jax

    from __graft_entry__ import _body_model, _cascade
    from a3gc_tpu.eval.streaming import StreamingCascade

    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    cfg, params3 = _cascade("a3gc", precision="default")
    model = _body_model()

    from scipy.spatial.transform import Rotation
    S = STREAMS
    T = W * (2 * N_TICKS + 12)
    ori = Rotation.random(S * T * 6, random_state=0).as_matrix().reshape(
        S, T, 54).astype(np.float32)
    acc = np.random.default_rng(0).normal(
        scale=0.5, size=(S, T, 18)).astype(np.float32)

    def win(i):
        sl = (slice(None), slice(i * W, (i + 1) * W))
        if S == 1:
            return ori[0][sl[1]], acc[0][sl[1]]
        return ori[sl], acc[sl]

    shared_fn = None
    fused_cache = {}
    rows = []
    for K, P in CONFIGS:
        pair = {}
        for fused in (False, True):
            sess = StreamingCascade(params3, cfg, model, window=W,
                                    streams=S, lookahead=K, history=P,
                                    fused=fused)
            if shared_fn is None:
                shared_fn = sess._fn
            else:
                sess._fn = shared_fn
            if sess._fused_fn is not None:
                cap = K + P + 1
                sess._fused_fn = fused_cache.setdefault(
                    cap, sess._fused_fn)
            pair[fused] = sess
        # warm both to steady state (compiles happen here)
        t0 = time.time()
        for i in range(K + P + 1):
            for sess in pair.values():
                sess.step(*win(i))
        warm_s = time.time() - t0
        lats = {False: [], True: []}
        for i in range(K + P + 1, K + P + 1 + N_TICKS):
            for fused in (False, True):     # interleaved: drift cancels
                t = time.perf_counter()
                p = pair[fused].step(*win(i))
                dt = time.perf_counter() - t
                if S > 1:
                    p = p[0] if p[1].all() else None
                assert p is not None, (K, P, fused, i)
                lats[fused].append(dt)
        mu = {f: float(np.mean(lats[f])) * 1e3 for f in lats}
        rows.append({
            "lookahead_K": K, "history_P": P, "warmup_s": round(warm_s, 1),
            "ms_two_pass": round(mu[False], 1),
            "ms_fused": round(mu[True], 1),
            "speedup_pct": round(100.0 * (1 - mu[True] / mu[False]), 1),
            "p99_two_pass": round(
                float(np.percentile(lats[False], 99)) * 1e3, 1),
            "p99_fused": round(
                float(np.percentile(lats[True], 99)) * 1e3, 1),
            "n_ticks": N_TICKS, "streams": S,
        })
        print(rows[-1], flush=True)

    os.makedirs(OUT, exist_ok=True)
    lines = ["| K | P | two-pass ms | fused ms | Δ | p99 two-pass | "
             "p99 fused |", "|---|---|---|---|---|---|---|"]
    for r in rows:
        lines.append(
            f"| {r['lookahead_K']} | {r['history_P']} | "
            f"{r['ms_two_pass']} | {r['ms_fused']} | "
            f"{r['speedup_pct']}% | {r['p99_two_pass']} | "
            f"{r['p99_fused']} |")
    with open(os.path.join(OUT, "FUSED_DISPATCH_AB.md"), "w") as f:
        f.write(
            "# Fused steady-state dispatch: interleaved on-chip A/B\n\n"
            f"{S}-stream A3GC cascade, W={W}, default precision, through "
            "the remote TPU relay. Each row interleaves the two paths "
            "tick-by-tick in ONE process (relay drift cancels): two-pass "
            "= emission fetch + async state-advance dispatch; fused = "
            "ONE jit call doing both (the advance input is sliced from "
            "the emission context in-device — one fewer RPC and one "
            "fewer window upload per tick). Emissions/states are "
            "bit-identical (oracle test).\n\n" + "\n".join(lines) +
            "\n\nRaw: FUSED_DISPATCH_AB.json\n")
    with open(os.path.join(OUT, "FUSED_DISPATCH_AB.json"), "w") as f:
        json.dump({"window": W, "streams": S, "device": str(dev),
                   "rows": rows}, f, indent=1)
    print("wrote", os.path.join(OUT, "FUSED_DISPATCH_AB.md"))


if __name__ == "__main__":
    main()
