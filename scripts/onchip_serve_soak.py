r"""Long-running multiplexed-serving soak on the TPU.

Drives the multi-stream streaming cascade (the `cli serve` device path:
8 client slots, 60-frame windows, carried state, random per-client
resets) continuously for SOAK_SECONDS, checking:

1. stability — no errors/NaNs over thousands of ticks;
2. determinism — after reset(stream=0), a fixed input window must
   reproduce the SAME pose bit-for-bit every time (carried-state
   bookkeeping never corrupts a neighbour slot);
3. latency drift — p99 of the last quarter vs the first quarter;
4. host memory — RSS growth over the run (leak canary).

Writes docs/validation/SERVE_SOAK.json. Single-tenant chip: run serially.
``SOAK_SECONDS=1200 python scripts/onchip_serve_soak.py``
"""

import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SOAK_SECONDS = int(os.environ.get("SOAK_SECONDS", "1200"))
STREAMS, WINDOW = 8, 60


def rss_mb():
    """CURRENT VmRSS (ru_maxrss is a monotonic peak — it cannot tell a
    leak from a one-time transfer-buffer spike; a CPU probe of this path
    is flat over 3000 ticks)."""
    for line in open("/proc/self/status"):
        if line.startswith("VmRSS"):
            return int(line.split()[1]) / 1024.0
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main():
    import jax

    from __graft_entry__ import _flagship
    from a3gc_tpu.eval.streaming import StreamingCascade

    cfg, params3, model, _ = _flagship(seq_len=WINDOW)
    sess = StreamingCascade(params3, cfg, model, window=WINDOW,
                            streams=STREAMS)
    rng = np.random.RandomState(0)
    probe_ori = rng.randn(STREAMS, WINDOW, 54).astype(np.float32)
    probe_acc = rng.randn(STREAMS, WINDOW, 18).astype(np.float32)

    print(f"platform={jax.devices()[0].platform} compiling...", flush=True)
    sess.step(probe_ori, probe_acc)     # compile
    sess.reset()

    # golden: slot 0's pose for the probe window from zero state
    golden = np.asarray(sess.step(probe_ori, probe_acc))[0].copy()
    sess.reset()
    rss0 = rss_mb()

    lat, ticks, resets, checks = [], 0, 0, 0
    rss_series = []
    t_end = time.time() + SOAK_SECONDS
    while time.time() < t_end:
        ori = rng.randn(STREAMS, WINDOW, 54).astype(np.float32)
        acc = rng.randn(STREAMS, WINDOW, 18).astype(np.float32)
        t0 = time.perf_counter()
        pose = sess.step(ori, acc)
        lat.append(time.perf_counter() - t0)
        ticks += 1
        assert np.isfinite(pose).all(), f"non-finite pose at tick {ticks}"
        if ticks % 7 == 0:              # a client ends its sequence
            sess.reset(stream=int(rng.randint(STREAMS)))
            resets += 1
        if ticks % 100 == 0:            # determinism probe on slot 0
            sess.reset(stream=0)
            got = sess.step(probe_ori, probe_acc)[0]
            assert np.array_equal(got, golden), (
                f"slot-0 determinism broke at tick {ticks}: "
                f"max delta {np.abs(got - golden).max()}")
            sess.reset(stream=0)
            checks += 1
            rss_series.append(round(rss_mb(), 1))
            print(f"tick {ticks}: determinism OK, "
                  f"mean {np.mean(lat[-100:]) * 1e3:.1f} ms, "
                  f"rss {rss_series[-1]} MB", flush=True)

    assert lat, "soak too short: no ticks completed"
    lat_ms = np.asarray(lat) * 1e3
    q = max(len(lat_ms) // 4, 1)
    out = {
        "streams": STREAMS, "window": WINDOW,
        "soak_seconds": SOAK_SECONDS, "ticks": ticks,
        "frames_served": ticks * STREAMS * WINDOW,
        "per_client_resets": resets,
        "determinism_checks_passed": checks,
        "latency_ms": {
            "mean": round(float(lat_ms.mean()), 2),
            "p50": round(float(np.percentile(lat_ms, 50)), 2),
            "p99": round(float(np.percentile(lat_ms, 99)), 2),
            "max": round(float(lat_ms.max()), 2),
            "first_quarter_p99": round(
                float(np.percentile(lat_ms[:q], 99)), 2),
            "last_quarter_p99": round(
                float(np.percentile(lat_ms[-q:], 99)), 2),
        },
        "rss_mb_start": round(rss0, 1),
        "rss_mb_end": round(rss_mb(), 1),
        "rss_mb_series": rss_series,
    }
    path = os.path.join("docs", "validation", "SERVE_SOAK.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
