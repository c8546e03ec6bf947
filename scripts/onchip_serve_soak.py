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
LOOKAHEAD = int(os.environ.get("LOOKAHEAD", "0"))   # K>0 soaks the
# lookahead serving path: per-slot buffered emission + active masking
# + per-slot reset (writes SERVE_SOAK_LOOKAHEAD.json)


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
    K = LOOKAHEAD
    sess = StreamingCascade(params3, cfg, model, window=WINDOW,
                            streams=STREAMS, lookahead=K)
    rng = np.random.RandomState(0)
    probe_ori = rng.randn(STREAMS, WINDOW, 54).astype(np.float32)
    probe_acc = rng.randn(STREAMS, WINDOW, 18).astype(np.float32)
    act0 = np.zeros(STREAMS, np.float32)
    act0[0] = 1.0

    print(f"platform={jax.devices()[0].platform} lookahead={K} "
          f"compiling...", flush=True)
    for _ in range(K + 1):              # compile (emission on tick K+1)
        sess.step(probe_ori, probe_acc)
    if K:
        sess.flush()
    sess.reset()

    def slot0_probe():
        """Slot 0's emission for the fixed probe window(s) from zero
        state — with lookahead, K+1 active-masked ticks (the other
        slots' buffers/state untouched) then the first emission."""
        sess.reset(stream=0)
        if K == 0:
            out = np.asarray(sess.step(probe_ori, probe_acc))[0].copy()
            sess.reset(stream=0)
            return out
        for _ in range(K):
            _, em = sess.step(probe_ori, probe_acc, active=act0)
            assert not em[0], "emitted during warmup"
        pose, em = sess.step(probe_ori, probe_acc, active=act0)
        assert em[0], "no emission after K+1 windows"
        out = np.asarray(pose)[0].copy()
        sess.reset(stream=0)
        return out

    # golden: slot 0's probe pose from zero state
    golden = slot0_probe()
    rss0 = rss_mb()

    lat, ticks, resets, checks = [], 0, 0, 0
    rss_series = []
    t_end = time.time() + SOAK_SECONDS
    while time.time() < t_end:
        ori = rng.randn(STREAMS, WINDOW, 54).astype(np.float32)
        acc = rng.randn(STREAMS, WINDOW, 18).astype(np.float32)
        t0 = time.perf_counter()
        if K:
            # random per-tick activity (dynamic batching) on top of the
            # per-slot lookahead buffers; slot 0 stays active so its
            # cadence is predictable for the probes
            active = (rng.rand(STREAMS) > 0.3).astype(np.float32)
            active[0] = 1.0
            pose, emitted = sess.step(ori, acc, active=active)
            if emitted.any():
                assert np.isfinite(pose[emitted]).all(), (
                    f"non-finite emission at tick {ticks}")
        else:
            pose = sess.step(ori, acc)
            assert np.isfinite(pose).all(), (
                f"non-finite pose at tick {ticks}")
        lat.append(time.perf_counter() - t0)
        ticks += 1
        if ticks % 7 == 0:              # a client ends its sequence
            sess.reset(stream=int(rng.randint(STREAMS)))
            resets += 1
        if ticks % 100 == 0:            # determinism probe on slot 0
            got = slot0_probe()
            assert np.array_equal(got, golden), (
                f"slot-0 determinism broke at tick {ticks}: "
                f"max delta {np.abs(got - golden).max()}")
            checks += 1
            rss_series.append(round(rss_mb(), 1))
            print(f"tick {ticks}: determinism OK, "
                  f"mean {np.mean(lat[-100:]) * 1e3:.1f} ms, "
                  f"rss {rss_series[-1]} MB", flush=True)

    assert lat, "soak too short: no ticks completed"
    lat_ms = np.asarray(lat) * 1e3
    q = max(len(lat_ms) // 4, 1)
    out = {
        "streams": STREAMS, "window": WINDOW, "lookahead": K,
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
    path = os.path.join("docs", "validation",
                        "SERVE_SOAK_LOOKAHEAD.json" if K
                        else "SERVE_SOAK.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
