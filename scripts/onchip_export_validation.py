r"""On-chip validation of the AOT deployment export (a3gc_tpu.export).

Exports the flagship A3GC cascade (full reference sizes, same setup as
bench.py) two ways — ``backend=xla`` (portable cpu+tpu artifact) and
``backend=pallas`` (Mosaic whole-scan kernels baked in, tpu-only) — then
deserializes both from disk and runs them ON THE TPU:

1. numerics: artifact pose output vs the live StreamingCascade session
2. throughput: frames/s through each deserialized artifact vs live

Writes docs/validation/EXPORT_ONCHIP.json. The chip is single-tenant —
run strictly serially: ``timeout 1800 python scripts/onchip_export_validation.py``.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 2048        # the bench.py streaming-window geometry
ITERS = 8


def _measure(step_fn, ori, acc, iters=ITERS):
    r"""Median-of-iters per-window seconds. step_fn must fetch its result
    to host (device execution is FIFO; the fetch fences the chain —
    jax.block_until_ready does not reliably wait through the axon relay)."""
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = step_fn(ori, acc)
        assert np.isfinite(np.asarray(out)).all()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    import jax

    from __graft_entry__ import _flagship
    from a3gc_tpu.eval.streaming import StreamingCascade
    from a3gc_tpu.export import (export_streaming_cascade, load_exported,
                                 save_exported)

    platform = jax.devices()[0].platform
    print(f"platform: {platform}", flush=True)

    cfg, params3, model, _ = _flagship()
    rng = np.random.RandomState(0)
    ori = rng.randn(1, WINDOW, 54).astype(np.float32)
    acc = rng.randn(1, WINDOW, 18).astype(np.float32)

    results = {"window": WINDOW, "iters": ITERS, "platform": platform,
               "precision": "default", "artifacts": {}}

    # --- live session (Pallas auto path on TPU) --------------------------
    print("compiling live StreamingCascade...", flush=True)
    live = StreamingCascade(params3, cfg, model, window=WINDOW)
    t0 = time.perf_counter()
    live_pose = live.step(ori, acc)
    print(f"live first step (compile): {time.perf_counter() - t0:.1f}s",
          flush=True)

    def live_step(o, a):
        return live.step(o, a)

    live_s = _measure(live_step, ori, acc)
    results["live_frames_per_sec"] = round(WINDOW / live_s, 1)
    print(f"live: {results['live_frames_per_sec']:,.0f} frames/s", flush=True)

    # --- exported artifacts ---------------------------------------------
    for backend in ("xla", "pallas"):
        print(f"exporting backend={backend}...", flush=True)
        t0 = time.perf_counter()
        exp_step, exp_init, manifest = export_streaming_cascade(
            params3, cfg, model, window=WINDOW, streams=1, backend=backend)
        d = os.path.join(tempfile.mkdtemp(), backend)
        save_exported(d, exp_step, exp_init, manifest)
        export_s = time.perf_counter() - t0
        size = sum(os.path.getsize(os.path.join(d, f)) for f in os.listdir(d))

        art = load_exported(d)
        states0 = art.zero_states()
        t0 = time.perf_counter()
        pose, _ = art.step(ori, acc, states0)
        compile_s = time.perf_counter() - t0
        delta = float(np.max(np.abs(np.asarray(pose)[0] - live_pose)))

        def art_step(o, a, _art=art, _s0=states0):
            p, _ = _art.step(o, a, _s0)
            return np.asarray(p)

        art_s = _measure(art_step, ori, acc)
        row = {
            "export_seconds": round(export_s, 1),
            "artifact_bytes": size,
            "first_call_compile_seconds": round(compile_s, 1),
            "frames_per_sec": round(WINDOW / art_s, 1),
            "max_abs_pose_delta_vs_live": delta,
            "platforms": manifest["platforms"],
        }
        results["artifacts"][backend] = row
        print(f"{backend}: {row}", flush=True)

    out = os.path.join("docs", "validation", "EXPORT_ONCHIP.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
