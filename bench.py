"""Benchmark: A3GC-TP streaming cascade inference throughput on one chip.

Measures end-to-end pose frames/sec/chip of the flagship A3GC 3-stage
cascade (IMU -> leaf pos -> all pos -> rotations -> IK), the quantity the
reference reports as "offline time" over the test sets
(ref: evaluate_a3gc_tp.py:152-186) and the BASELINE.md north-star metric
(target: >= 10,000 frames/sec/chip on TPU v5e).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

BASELINE_FPS = 10_000.0  # north star, BASELINE.md


def main():
    import jax

    # NOTE: jax's persistent compilation cache is intentionally NOT enabled —
    # combined with this environment's remote-compile PJRT tunnel it stalls
    # compilation (observed >15 min vs ~6 min without). Cold bench ≈ 6 min.

    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from a3gc_tpu.models.pipeline import cascade_apply

    # reference-default hidden sizes (ref: train_a3gc_tp.py:28-33)
    # streaming eval = full sequences at batch 1 (ref: evaluate_a3gc_tp.py:164)
    seq_len = 2048
    cfg, params3, model, _ = _flagship(hidden=(256, 64, 128),
                                       seq_len=seq_len, batch=1)

    rng = np.random.default_rng(0)
    imu = jnp.asarray(
        rng.normal(scale=0.5, size=(1, seq_len, 15, 12)).astype(np.float32))

    fwd = jax.jit(lambda p, x: cascade_apply(p, cfg, model, x))

    def run_sync():
        # force full execution with a host fetch: on remote-attached TPUs
        # block_until_ready can return before execution finishes, so a
        # device->host read of the result is the only honest fence (device
        # execution is FIFO, so fetching iteration k fences 0..k-1 too).
        out = fwd(params3, imu)
        return np.asarray(out[0, 0])

    # warmup / compile + settle
    for _ in range(3):
        run_sync()

    # steady-state timing (cheap per-iter vs the one-off compile; more
    # iterations damp run-to-run variance of the relay-attached chip)
    iters = 32
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        fwd(params3, imu)
    run_sync()
    dt = time.perf_counter() - t0

    frames_per_sec = seq_len * iters / dt
    print(json.dumps({
        "metric": "a3gc_tp_streaming_pose_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(frames_per_sec / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
