r"""On-chip wall-time A/B of the multiplexed streaming evaluation
(`evaluate --streaming W --batch_streams S` vs the per-sequence path).

The streaming protocol is dispatch-bound through the remote TPU relay:
each window is one synchronous step. `streaming_predictions_multi`
serves S sequences' next windows per dispatch (the chunked multi-stream
kernel + per-slot active masking), so the whole test-set evaluation
should shrink ~min(S, n_live)x in wall time with per-sequence outputs
equal to the single-slot path (oracle-tested on CPU,
tests/test_eval_tools.py::test_multiplexed_predictions_equal_single_slot).
This script measures the actual ratio on the chip at reference size.

Parameter VALUES don't matter for timing (fresh-init params at default
precision — the serving configuration); result equality is asserted
against the single-slot path on the first sequence as a live probe.

Run (chip is single-tenant — nothing else may touch it, host idle):
    python scripts/onchip_streaming_eval_batched.py
Writes docs/validation/STREAMING_EVAL_BATCHED.{md,json}.
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
S = int(os.environ.get("S", "8"))           # multiplexed slots
# ragged sequence lengths, DIP-IMU-test-like scale (~30-60 s at 60 fps)
LENGTHS = tuple(int(x) for x in os.environ.get(
    "LENGTHS", "2400,1980,3000,2160,2760,1800,2520,2340,"
               "2040,2880,1920,2640,2280,2100,2940,2460").split(","))


def main():
    import jax

    from __graft_entry__ import _body_model, _cascade
    from a3gc_tpu.eval.streaming import (StreamingCascade,
                                         streaming_predictions,
                                         streaming_predictions_multi)

    print("device:", jax.devices()[0], flush=True)
    cfg, params3 = _cascade("a3gc", precision="default")
    model = _body_model()

    from scipy.spatial.transform import Rotation
    pairs = []
    for k, T in enumerate(LENGTHS):
        ori = Rotation.random(T * 6, random_state=k).as_matrix().reshape(
            T, 54).astype(np.float32)
        acc = np.random.default_rng(k).normal(
            scale=0.5, size=(T, 18)).astype(np.float32)
        pairs.append((ori, acc))
    frames = sum(LENGTHS)

    rows = []

    def run(streams):
        sess = StreamingCascade(params3, cfg, model, window=W,
                                streams=streams)
        t0 = time.time()
        if streams == 1:
            streaming_predictions(sess, *map(
                lambda a: a[: 2 * W], pairs[0]))
        else:
            streaming_predictions_multi(
                sess, [tuple(a[: 2 * W] for a in pairs[0])] * streams)
        compile_s = time.time() - t0
        t0 = time.perf_counter()
        if streams == 1:
            preds = [streaming_predictions(sess, o, a) for o, a in pairs]
        else:
            preds = streaming_predictions_multi(sess, pairs)
        wall = time.perf_counter() - t0
        rows.append({
            "streams": streams, "window": W, "sequences": len(pairs),
            "frames": frames, "compile_s": round(compile_s, 1),
            "wall_s": round(wall, 2),
            "frames_per_s": round(frames / wall),
        })
        print(rows[-1], flush=True)
        return preds

    preds1 = run(1)
    predsS = run(S)
    delta = max(float(np.abs(a - b).max())
                for a, b in zip(preds1, predsS))
    ratio = rows[0]["wall_s"] / rows[1]["wall_s"]
    print(f"multiplex speedup {ratio:.2f}x, on-chip max |delta| {delta:.2e}",
          flush=True)

    os.makedirs(OUT, exist_ok=True)
    payload = {"rows": rows, "speedup": round(ratio, 2),
               "max_abs_delta": delta, "lengths": LENGTHS}
    with open(os.path.join(OUT, "STREAMING_EVAL_BATCHED.json"), "w") as f:
        json.dump(payload, f, indent=1)
    with open(os.path.join(OUT, "STREAMING_EVAL_BATCHED.md"), "w") as f:
        f.write(
            "# Multiplexed streaming evaluation on chip\n\n"
            f"`evaluate --streaming {W} --batch_streams {S}` vs the "
            "per-sequence path; reference-size A3GC cascade, default "
            f"precision, {len(pairs)} ragged synthetic sequences "
            f"({frames} frames).\n\n"
            "| streams | wall s | frames/s | compile s |\n"
            "|---|---|---|---|\n" +
            "".join(f"| {r['streams']} | {r['wall_s']} | "
                    f"{r['frames_per_s']:,} | {r['compile_s']} |\n"
                    for r in rows) +
            f"\n**Speedup: {ratio:.2f}x**; per-sequence predictions "
            f"match the single-slot path on chip to max |delta| "
            f"{delta:.2e} (default-precision bf16 dots; 1e-8 on CPU "
            "fp32 — see the oracle test).\n")
    print("wrote docs/validation/STREAMING_EVAL_BATCHED.{md,json}",
          flush=True)


if __name__ == "__main__":
    main()
