"""Streaming divergence vs lookahead depth K (round-2 VERDICT item 4).

Measures, with the reference's shipped trained A3GC checkpoints (stages
2+3; stage 1 random — no stage-1 checkpoint ships), the mean/max geodesic
angle between K-window-lookahead streaming emissions and the offline
full-sequence output, for K = 0 (plain windowing) .. 3. This is a MODEL
property (identical math on any backend), so it runs on CPU by default
and does not contend with the chip; docs/validation/LOOKAHEAD_CURVE.md
records the table.

Usage:
    JAX_PLATFORMS=cpu python scripts/lookahead_curve.py
"""

import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "docs", "validation")
TRAINED = "/root/reference/trained_models"

W = 60          # one second at 60 fps — the serving window
T = 600         # ten windows per sequence
N_SEQ = 4
KS = (0, 1, 2, 3)


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
    rows = []
    for K in KS:
        angs = []
        for ori, acc in seqs:
            off = offline.step(ori, acc)
            offline.reset()
            sess = StreamingCascade(params3, cfg, model, window=W,
                                    lookahead=K)
            out = []
            for t in range(0, T, W):
                p = sess.step(ori[t:t + W], acc[t:t + W])
                if p is not None:
                    out.append(p)
            if K:
                out.append(sess.flush())
            stream = np.concatenate(out)
            # non-final region only: the tail never has future context,
            # so including it dilutes the K comparison identically
            n = T - W
            a = np.degrees(np.asarray(angle_between(
                jnp.asarray(stream[:n].reshape(-1, 3, 3)),
                jnp.asarray(off[:n].reshape(-1, 3, 3)))))
            angs.append(a)
        a = np.concatenate(angs)
        rows.append({"K": K, "mean_deg": round(float(a.mean()), 3),
                     "p95_deg": round(float(np.percentile(a, 95)), 3),
                     "max_deg": round(float(a.max()), 3),
                     "relative_compute": float(K + 2) if K else 1.0})
        print(rows[-1])

    os.makedirs(OUT, exist_ok=True)
    base = rows[0]["mean_deg"]
    lines = ["| K (lookahead windows) | mean div (deg) | p95 | max | "
             "vs K=0 | relative compute |", "|---|---|---|---|---|---|"]
    for r in rows:
        lines.append(
            f"| {r['K']} | {r['mean_deg']} | {r['p95_deg']} | "
            f"{r['max_deg']} | {100 * (r['mean_deg'] - base) / base:+.0f}% "
            f"| {r['relative_compute']}x |")
    with open(os.path.join(OUT, "LOOKAHEAD_CURVE.md"), "w") as f:
        f.write(
            "# Streaming divergence vs lookahead depth\n\n"
            f"Geodesic angle between windowed-streaming emissions (W={W}) "
            f"and the offline full-sequence output (T={T}, {N_SEQ} "
            "sequences, non-final region), A3GC cascade with the "
            f"reference's trained stage-2/3 checkpoints "
            f"(trained={trained}). K windows of future backward-direction "
            "context per emission; latency +K windows.\n\n"
            + "\n".join(lines) + "\n\nRaw: LOOKAHEAD_CURVE.json\n")
    with open(os.path.join(OUT, "LOOKAHEAD_CURVE.json"), "w") as f:
        json.dump({"window": W, "seq_len": T, "n_seq": N_SEQ,
                   "trained_checkpoints": trained, "rows": rows}, f,
                  indent=1)
    print("wrote", os.path.join(OUT, "LOOKAHEAD_CURVE.md"))


if __name__ == "__main__":
    main()
