r"""On-chip per-window serving latency of the buffered-context streaming
configs (plain / lookahead K / history P / composed), reference-size
A3GC cascade at default precision; STREAMS=N env measures the N-slot
multi-stream serving tick instead of single-stream.

Latency is what history is FOR: it buys divergence with compute at zero
added WINDOW latency — this script measures what the extra compute costs
per emission through this environment's remote TPU relay. Parameter
VALUES don't matter for latency (fresh-init params); the divergence
numbers live in docs/validation/STREAMING_TRADEOFF.md (trained ckpts).

All configs share ONE jitted step function, so the context-length
programs (60/120/180/240 frames) compile once each for the whole run.

Run (chip is single-tenant — nothing else may touch it):
    python scripts/onchip_history_latency.py
Writes docs/validation/HISTORY_LATENCY.{md,json}.
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "docs", "validation")

W = int(os.environ.get("W", "60"))   # emission window (frames)
N_WIN = 24          # timed steady-state windows per config
# (K, P) grid; KP env overrides, e.g. KP="0,0;0,2;0,5" for the
# low-latency small-window + deep-history operating points
CONFIGS = tuple(
    tuple(int(x) for x in kp.split(","))
    for kp in os.environ.get("KP", "0,0;1,0;0,1;1,1;1,2").split(";"))
STREAMS = int(os.environ.get("STREAMS", "1"))   # serving slots per tick
# FUSED=0 measures the two-dispatch (emission + advance) tick instead of
# the fused single-dispatch steady-state program (the default path)
FUSED = os.environ.get("FUSED", "1") != "0"


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
    T = W * (N_WIN + 8)
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
    fused_cache = {}    # capacity (K+P+1) -> fused program (identical
    rows = []           # across configs at the same capacity)
    for K, P in CONFIGS:
        sess = StreamingCascade(params3, cfg, model, window=W, streams=S,
                                lookahead=K, history=P, fused=FUSED)
        if shared_fn is None:
            shared_fn = sess._fn     # one jit: context-length programs
        else:                        # compile once across all configs
            sess._fn = shared_fn
        if sess._fused_fn is not None:
            cap = K + P + 1
            sess._fused_fn = fused_cache.setdefault(cap, sess._fused_fn)
        t0 = time.time()
        for i in range(K + P + 1):   # reach the steady-state program
            sess.step(*win(i))
        warm_s = time.time() - t0
        sess.reset()
        lats = []
        for i in range(N_WIN + K + P):
            t = time.perf_counter()
            p = sess.step(*win(i))
            dt = time.perf_counter() - t
            if S > 1 and (K or P):
                p = p[0] if p[1].all() else None
            # steady state only: emitted, with the full buffer in play
            if p is not None and i >= K + P:
                lats.append(dt)
        lat = np.asarray(lats) * 1e3
        rows.append({
            "lookahead_K": K, "history_P": P,
            "warmup_s": round(warm_s, 1),
            "ms_per_window_mean": round(float(lat.mean()), 1),
            "ms_per_window_p99": round(float(np.percentile(lat, 99)), 1),
            "n_windows": int(lat.size),
            # a window covers W/60 s of 60 fps motion
            "x_realtime": round(W * 1000.0 / 60.0 / float(lat.mean()), 1),
            "streams": S, "fused": bool(K or P) and FUSED,
        })
        print(rows[-1], flush=True)

    os.makedirs(OUT, exist_ok=True)
    tag = (("" if S == 1 else f"_S{S}") + ("" if W == 60 else f"_W{W}")
           + ("" if FUSED else "_unfused"))
    lines = ["| K (future) | P (past) | ms/window mean | p99 | "
             "× real-time | first-call warmup (s) |",
             "|---|---|---|---|---|---|"]
    for r in rows:
        lines.append(
            f"| {r['lookahead_K']} | {r['history_P']} | "
            f"{r['ms_per_window_mean']} | {r['ms_per_window_p99']} | "
            f"{r['x_realtime']}× | {r['warmup_s']} |")
    with open(os.path.join(OUT, f"HISTORY_LATENCY{tag}.md"), "w") as f:
        f.write(
            "# On-chip per-window latency: buffered-context streaming\n\n"
            f"{S}-stream A3GC cascade, W={W} ({W / 60:.2f} s at 60 fps), "
            "default "
            "precision, measured through this environment's remote TPU "
            "relay (per-call round-trip ~30 ms dominates; device compute "
            "is the minor term). ms/window is the wall time of one "
            "`StreamingCascade.step` emission in steady state — "
            + ("the fused single-dispatch program (emission + state "
               "advance in one call)" if FUSED else
               "the emission pass fetch plus the (pipelined, unfetched) "
               "state-advance dispatch (FUSED=0)") +
            ". Divergence numbers for the same configs: "
            "docs/validation/STREAMING_TRADEOFF.md.\n\n"
            + "\n".join(lines) +
            f"\n\nRaw: HISTORY_LATENCY{tag}.json\n")
    with open(os.path.join(OUT, f"HISTORY_LATENCY{tag}.json"), "w") as f:
        json.dump({"window": W, "streams": S, "device": str(dev),
                   "rows": rows}, f, indent=1)
    print("wrote", os.path.join(OUT, f"HISTORY_LATENCY{tag}.md"))


if __name__ == "__main__":
    main()
