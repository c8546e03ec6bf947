r"""On-chip validation of lookahead serving from a deployment bundle.

Exports a reference-size A3GC lookahead bundle (windows W and 2W for
K=1, backend=xla so live-vs-artifact is program-identical), then ON THE
CHIP runs ArtifactLookaheadSession against a live
StreamingCascade(lookahead=1) with the same forced-xla backend:
emissions per window, the flushed tail, per-window latency through the
deserialized modules, and cold-start time.

Writes docs/validation/ARTIFACT_LOOKAHEAD_ONCHIP.json. Chip is
single-tenant — run strictly serially:
    timeout 1800 python scripts/onchip_artifact_lookahead.py
CPU smoke:
    JAX_PLATFORMS=cpu python scripts/onchip_artifact_lookahead.py
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W, K, N_WINDOWS = 60, 1, 8


def main():
    from __graft_entry__ import _flagship, _honor_cpu_request
    _honor_cpu_request()
    import jax
    from a3gc_tpu.eval.streaming import StreamingCascade
    from a3gc_tpu.export import (ArtifactLookaheadSession, ExportedBundle,
                                 export_bundle, lookahead_geometries)

    platform = jax.devices()[0].platform
    # xla backend on both sides: the artifact and the live session lower
    # the identical program, so the check is executable-level equality
    cfg, params3, model, _ = _flagship(backend="xla")

    out_dir = os.path.join(tempfile.mkdtemp(prefix="a3gc_la_"), "bundle")
    t0 = time.time()
    export_bundle(out_dir, params3, cfg, model,
                  geometries=lookahead_geometries([1], W, K))
    export_s = time.time() - t0

    t0 = time.time()
    art = ArtifactLookaheadSession(ExportedBundle(out_dir), lookahead=K)
    live = StreamingCascade(params3, cfg, model, window=W, lookahead=K)
    load_s = time.time() - t0

    rng = np.random.default_rng(0)
    from scipy.spatial.transform import Rotation
    ori_all = Rotation.random(N_WINDOWS * W * 6, random_state=1
                              ).as_matrix().reshape(N_WINDOWS * W, 54
                                                    ).astype(np.float32)
    acc_all = rng.normal(scale=0.5, size=(N_WINDOWS * W, 18)
                         ).astype(np.float32)

    deltas, lat = [], []
    cold = None
    for w in range(N_WINDOWS):
        sl = slice(w * W, (w + 1) * W)
        t0 = time.perf_counter()
        pa = art.step(ori_all[sl], acc_all[sl])
        if pa is not None:
            pa = np.asarray(pa)       # host fetch fences the chain
        dt = time.perf_counter() - t0
        if w == K:
            cold = dt                 # first emission pays both compiles
        elif w > K:
            lat.append(dt)
        pl = live.step(ori_all[sl], acc_all[sl])
        assert (pa is None) == (pl is None), w
        if pa is not None:
            deltas.append(float(np.abs(pa - np.asarray(pl)).max()))
    ta, tl = art.flush(), live.flush()
    tail_delta = float(np.abs(np.asarray(ta) - np.asarray(tl)).max())

    report = {
        "platform": platform,
        "window": W, "lookahead": K, "n_windows": N_WINDOWS,
        "export_s": round(export_s, 1),
        "deserialize_s": round(load_s, 1),
        "first_emission_s": round(cold, 2),
        "warm_emission_ms_median": round(1e3 * float(np.median(lat)), 1),
        "max_emission_delta_vs_live": max(deltas),
        "flush_tail_delta_vs_live": tail_delta,
        "tail_frames": int(np.asarray(ta).shape[0]),
    }
    # CPU smokes must not overwrite the committed chip artifact
    out = (os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "validation",
        "ARTIFACT_LOOKAHEAD_ONCHIP.json") if platform == "tpu"
        else os.path.join(tempfile.gettempdir(),
                          "ARTIFACT_LOOKAHEAD_SMOKE.json"))
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
