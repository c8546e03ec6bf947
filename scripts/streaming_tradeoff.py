"""Streaming divergence vs (emission window S, lookahead K, history P)
— the full latency/compute/divergence tradeoff surface (round-2 VERDICT
weak #3: "overlapped windows / stride-W/2 emission are unexplored",
extended in round 3 with the PAST-context axis).

Key identity: stride-overlap emission — compute over W frames, emit only
the first S, advance state by S — is EXACTLY `StreamingCascade(window=S,
lookahead=K)` with K = W/S - 1. The depth-K lookahead machinery
(eval/streaming.py) already implements it; what was unexplored is the
(S, K) grid, and in particular the EQUAL-LATENCY comparison: at a fixed
latency budget L = (K+1)*S frames, is it better to emit large windows
rarely (big S, small K) or small windows often (small S, big K)?

The history axis (P past windows re-run as leading attention context,
`StreamingCascade(history=P)`) adds ZERO latency — it buys divergence
purely with compute, so it dominates lookahead at any fixed latency
budget and composes with it ((60,K=1,P=1) reaches −79%).

This is a model property (identical math on any backend), so it runs on
CPU with the reference's shipped trained A3GC checkpoints (stages 2+3)
and does not contend with the chip. Writes
docs/validation/STREAMING_TRADEOFF.{md,json}.

Usage:
    JAX_PLATFORMS=cpu python scripts/streaming_tradeoff.py
"""

import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "docs", "validation")
TRAINED = "/root/reference/trained_models"

T = 600
N_SEQ = 4
# (S, K, P) grid: latency = (K+1)*S frames, compute = (P+K+2)x unless
# K=P=0 (plain, 1x).
GRID = (
    (60, 0, 0),         # plain 1-second windowing (the serving default)
    (120, 0, 0),        # bigger windows, same 1x compute
    (30, 1, 0), (20, 2, 0), (15, 3, 0),  # latency 60 = same as (60, 0)
    (60, 1, 0), (30, 3, 0),              # latency 120 = same as (120, 0)
    (60, 2, 0), (60, 3, 0),              # the measured lookahead curve
    (120, 1, 0),                         # latency 240 anchor
    # history: past context at ZERO added latency
    (60, 0, 1), (60, 0, 2), (60, 0, 3),  # latency 60 = plain windowing
    (60, 1, 1), (60, 1, 2),              # composed with K=1 (latency 120)
    (120, 0, 1),                         # big window + history, 1x latency
    # LOW-LATENCY operating points (round-3 extension): emission cadence
    # S < 60 with the attention context bought by history — what quality
    # is reachable at 1/3 s or 1/2 s emission latency? Each (S, P) gives
    # (P+1)*S frames of context at latency S.
    (20, 0, 0), (30, 0, 0),              # small-window plain baselines
    (20, 0, 2), (20, 0, 5),              # latency 20; context 60 / 120
    (30, 0, 1), (30, 0, 3),              # latency 30; context 60 / 120
    (20, 1, 4), (30, 1, 2),              # latency 40/60; context 120
    # round-4 EXTENSION (VERDICT r3 weak #1): does divergence asymptote
    # or floor? K in {1,2} x P in {2..5} at W in {60,120} past the best
    # measured point (60,1,2)
    (60, 1, 3), (60, 1, 4), (60, 1, 5),
    (60, 2, 2), (60, 2, 3), (60, 2, 4), (60, 2, 5), (60, 2, 1),
    (120, 1, 1), (120, 1, 2), (120, 1, 3),
    (120, 2, 1), (120, 2, 2),
)


def main():
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        import jax
        jax.config.update("jax_platforms", "cpu")
        import jax._src.xla_bridge as xb
        if not xb.backends_are_initialized():
            xb._backend_factories.pop("axon", None)

    from __graft_entry__ import _body_model, _cascade
    from a3gc_tpu.eval.streaming import StreamingCascade
    from a3gc_tpu.ops.rotations import angle_between
    import jax.numpy as jnp

    cfg, params3 = _cascade("a3gc", precision="default")
    trained = os.path.isdir(TRAINED)
    if trained:
        from a3gc_tpu.compat.torch_import import (
            graph_net_params_from_state_dict, load_torch_checkpoint)

        def load(ck):
            return graph_net_params_from_state_dict(
                load_torch_checkpoint(os.path.join(TRAINED, ck)), "a3gc")

        params3 = (params3[0],
                   load("A3GC/checkpoint_model2_finetuning_9.tar"),
                   load("A3GC/checkpoint_model3_finetuning_8.tar"))
    model = _body_model()

    from scipy.spatial.transform import Rotation
    rng = np.random.default_rng(0)
    seqs = []
    for i in range(N_SEQ):
        ori = Rotation.random(T * 6, random_state=40 + i).as_matrix(
        ).reshape(T, 54).astype(np.float32)
        acc = rng.normal(scale=0.5, size=(T, 18)).astype(np.float32)
        seqs.append((ori, acc))

    offline = StreamingCascade(params3, cfg, model, window=T)
    offs = []
    for ori, acc in seqs:
        offs.append(np.asarray(offline.step(ori, acc)))
        offline.reset()

    rows = []
    done = {}
    if os.environ.get("ONLY_NEW") == "1":
        # incremental extension: reuse configs already measured (the
        # divergence is deterministic given checkpoints + seeds)
        prev = os.path.join(OUT, "STREAMING_TRADEOFF.json")
        if os.path.exists(prev):
            for r in json.load(open(prev))["rows"]:
                done[(r["S"], r["K"], r["P"])] = r
    for S, K, P in GRID:
        if (S, K, P) in done:
            rows.append(done[(S, K, P)])
            print("[reuse]", rows[-1], flush=True)
            continue
        angs, seam_j = [], []
        for (ori, acc), off in zip(seqs, offs):
            sess = StreamingCascade(params3, cfg, model, window=S,
                                    lookahead=K, history=P)
            out = []
            for t in range(0, T, S):
                p = sess.step(ori[t:t + S], acc[t:t + S])
                if p is not None:
                    out.append(p)
            if K:
                out.append(sess.flush())
            stream = np.concatenate(out)
            # exclude the final latency-window region: those frames never
            # had full future context in ANY config, and the excluded span
            # must be the same across the grid for a fair comparison
            n = T - 240
            a = np.degrees(np.asarray(angle_between(
                jnp.asarray(stream[:n].reshape(-1, 3, 3)),
                jnp.asarray(off[:n].reshape(-1, 3, 3)))))
            angs.append(a)
            # window-seam smoothness of the STREAM signal itself
            # (3rd-difference spikes at emission boundaries — the
            # jerk a rendering consumer feels; see STREAMING_METRICS)
            x = stream[:n].reshape(n, -1)
            j = np.abs(np.diff(x, n=3, axis=0)).max(axis=1)
            fidx = np.arange(len(j))
            bmask = ((fidx + 2) % S < 4) | ((fidx + 2) % S > S - 4)
            seam_j.append((float(j[bmask].max()),
                           float(j[~bmask].max())))
        a = np.concatenate(angs)
        # K=P=0: one pass per window; otherwise: emission pass over
        # (P+K+1)*S frames + the state-advance pass over S, per S
        # emitted frames
        rows.append({"S": S, "K": K, "P": P,
                     "latency_frames": (K + 1) * S,
                     "relative_compute": float(
                         1 if K == 0 and P == 0 else P + K + 2),
                     "mean_deg": round(float(a.mean()), 3),
                     "p95_deg": round(float(np.percentile(a, 95)), 3),
                     "max_deg": round(float(a.max()), 3),
                     "seam_jerk_max": round(
                         max(b for b, _ in seam_j), 4),
                     "interior_jerk_max": round(
                         max(i for _, i in seam_j), 4)})
        print(rows[-1], flush=True)

    os.makedirs(OUT, exist_ok=True)
    base = next(r for r in rows
                if (r["S"], r["K"], r["P"]) == (60, 0, 0))["mean_deg"]
    lines = ["| S (emit) | K (future) | P (past) | latency (frames) | "
             "compute | mean div (deg) | p95 | max | seam jerk | "
             "vs (60,0,0) |",
             "|---|---|---|---|---|---|---|---|---|---|"]
    for r in sorted(rows, key=lambda r: (r["latency_frames"], r["K"],
                                         r["P"])):
        sj = r.get("seam_jerk_max")
        lines.append(
            f"| {r['S']} | {r['K']} | {r['P']} | {r['latency_frames']} | "
            f"{r['relative_compute']:.0f}x | {r['mean_deg']} | "
            f"{r['p95_deg']} | {r['max_deg']} | "
            f"{sj if sj is not None else '—'} | "
            f"{100 * (r['mean_deg'] - base) / base:+.0f}% |")
    with open(os.path.join(OUT, "STREAMING_TRADEOFF.md"), "w") as f:
        f.write(
            "# Streaming divergence: emission window vs lookahead depth vs history\n\n"
            "Geodesic angle between streaming emissions and the offline "
            f"full-sequence output (T={T}, {N_SEQ} sequences, region with "
            "full future context in all configs), A3GC cascade with the "
            "reference's trained stage-2/3 checkpoints "
            f"(trained={trained}).\n\n"
            "Stride-overlap emission (compute W, emit S, advance S) is "
            "identically `StreamingCascade(window=S, lookahead=W/S-1)`; "
            "rows with equal latency_frames compare big-window/low-K "
            "against small-window/high-K at one latency budget. The P "
            "axis (`history=P`) re-runs P past windows as leading "
            "attention context — zero added latency, compute-only.\n\n"
            + "\n".join(lines) + """

## Round-4 extension: does divergence floor?

No. Mean divergence decays roughly EXPONENTIALLY in the total buffered
context (P+K+1 windows) with no hard floor in reach: (60,1,2) 0.373 ->
(60,2,4) 0.080 -> (120,1,2) 0.058 -> (120,2,2) 0.031 deg (-99% vs plain
windowing). The apparent saturation of (60,1,P) past P=4 (~0.16 deg) is
the context window approaching the sequence's available past, not a
floor. At FIXED compute, window size still dominates both other axes:
(120,1,2) at 5x beats (60,2,3) at 7x and (60,1,2) at 5x. Seam jerk
(3rd-difference max at emission boundaries vs interior) confirms every
two-sided config (K>=1 AND P>=1) is seam-free -- boundary max tracks the
interior level, so the quality presets (--quality) stay smooth at every
depth.

Raw: STREAMING_TRADEOFF.json
""")
    with open(os.path.join(OUT, "STREAMING_TRADEOFF.json"), "w") as f:
        json.dump({"seq_len": T, "n_seq": N_SEQ,
                   "trained_checkpoints": trained, "rows": rows}, f,
                  indent=1)
    print("wrote", os.path.join(OUT, "STREAMING_TRADEOFF.md"))


if __name__ == "__main__":
    main()
