r"""On-chip probe: does the pre-exec backend teardown actually release
the device session?

Background (round 5): two artifact serve soaks wedged at their first
RSS-watchdog recycle — the exec'd generation blocked in backend init
for 30-40+ minutes, and even fresh processes hung in ``jax.devices()``
until the remote timed the dead session out. Hypothesis: exec's abrupt
CLOEXEC close of the relay connection, while the client holds ~1 GB of
leaked transfer buffers (docs/validation/SERVE_SOAK.md), leaves the
remote single-tenant session dangling. The fix (serve._do_recycle)
destroys the PJRT client before exec — THIS script validates that
mechanism in isolation, with the same leak magnitude, in minutes
instead of soak-hours:

1. init the chip, jit a tiny fn, drive it with fresh numpy inputs until
   the process has leaked ~LEAK_MB of transfer buffers;
2. run the exact teardown sequence (drop refs, jax.clear_caches,
   gc.collect, jax.extend.backend.clear_backends);
3. report whether the relay TCP connection is gone (/proc/net/tcp);
4. execve a probe that times jax.devices() + one matmul in the SAME
   pid — the wedge signature is this probe hanging for tens of minutes;
   success is single-digit seconds.

Writes docs/validation/RECYCLE_TEARDOWN_PROBE.json. Run on the chip
(no JAX_PLATFORMS override); keep the chip otherwise idle.
"""

import gc
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "docs", "validation")

LEAK_MB = int(os.environ.get("LEAK_MB", "1000"))
_PROBE_ENV = "A3GC_TEARDOWN_PROBE_STAGE2"


def live_tcp_count() -> int:
    r"""Established TCP connections owned by THIS process (the relay
    tunnel rides localhost TCP)."""
    inodes = set()
    fd_dir = f"/proc/{os.getpid()}/fd"
    for fd in os.listdir(fd_dir):
        try:
            tgt = os.readlink(os.path.join(fd_dir, fd))
        except OSError:
            continue
        if tgt.startswith("socket:["):
            inodes.add(tgt[8:-1])
    n = 0
    with open("/proc/net/tcp") as f:
        next(f)
        for line in f:
            parts = line.split()
            # st 01 = ESTABLISHED; inode is column 9
            if parts[3] == "01" and parts[9] in inodes:
                n += 1
    return n


def stage2():
    r"""Post-exec half: time backend re-init in the recycled pid."""
    t0 = time.time()
    import jax

    devices = [str(d) for d in jax.devices()]
    t_devices = time.time() - t0
    import jax.numpy as jnp

    y = jnp.ones((256, 256)) @ jnp.ones((256, 256))
    ok = float(np.asarray(y)[0, 0]) == 256.0
    t_total = time.time() - t0
    prior = json.loads(os.environ[_PROBE_ENV])
    result = dict(prior, post_exec_devices_s=round(t_devices, 1),
                  post_exec_matmul_s=round(t_total, 1),
                  post_exec_ok=ok, devices=devices)
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, "RECYCLE_TEARDOWN_PROBE.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    print(f"wrote {path}")


def stage1():
    t_start = time.time()
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)

    @jax.jit
    def f(x):
        return (x * 1.000001).sum(axis=1)

    def rss_mb():
        with open(f"/proc/{os.getpid()}/status") as fh:
            for line in fh:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1024
        return -1.0

    # leak transfer buffers the way a long-serving process does: fresh
    # numpy inputs per call (~input-size leaked per call through the
    # relay client, docs/validation/SERVE_SOAK.md)
    base = rss_mb()
    chunk = np.random.default_rng(0).normal(
        size=(256, 1024)).astype(np.float32)         # 1 MB
    held = jnp.ones((8, 60, 256))                     # session-like state
    calls = 0
    while rss_mb() - base < LEAK_MB and calls < 20000:
        out = f(chunk + calls)                        # fresh host buffer
        calls += 1
    np.asarray(out)                                   # fence
    leaked = rss_mb() - base
    print(f"leaked {leaked:.0f} MB over {calls} calls", flush=True)

    conns_before = live_tcp_count()
    t0 = time.time()
    # the serve._do_recycle teardown sequence
    held = out = None
    jax.clear_caches()
    gc.collect()
    from jax.extend.backend import clear_backends
    clear_backends()
    gc.collect()
    teardown_s = time.time() - t0
    time.sleep(1.0)                                   # let FINs land
    conns_after = live_tcp_count()
    print(f"teardown {teardown_s:.1f}s; live TCP {conns_before} -> "
          f"{conns_after}", flush=True)

    env = dict(os.environ)
    env[_PROBE_ENV] = json.dumps({
        "leak_mb": round(leaked), "leak_calls": calls,
        "teardown_s": round(teardown_s, 1),
        "tcp_before_teardown": conns_before,
        "tcp_after_teardown": conns_after,
        "stage1_wall_s": round(time.time() - t_start, 1),
    })
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)],
              env)


if __name__ == "__main__":
    if _PROBE_ENV in os.environ:
        stage2()
    else:
        stage1()
