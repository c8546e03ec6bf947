r"""Ahead-of-time deployment export of the streaming cascade.

The reference has no deployment story: serving it requires the full
``net_aagc.py`` model code, the torch runtime, and the ``.tar`` checkpoints
(ref: evaluate_a3gc_tp.py:125-145). Here the whole windowed inference
program — normalize → graph scatter → 3-stage cascade → IK, with carried
recurrent state and per-slot activity masking — is exported through
``jax.export`` to a serialized StableHLO artifact with the trained
parameters, normalization statistics, and SMPL body model baked in as
constants. Any JAX process (CPU or TPU, no a3gc_tpu installation, no
checkpoint files) can deserialize and serve it:

    >>> art = load_exported("exported/a3gc")          # or raw jax.export:
    >>> states = art.zero_states()                    #   deserialize+call
    >>> pose, states = art.step(ori, acc, states)     # [S,W,24,3,3]

The artifact is a directory:

    manifest.json     shapes/dtypes, window/stream geometry, provenance
    step.jaxexport    serialized Exported: (ori, acc, states, active)
                      -> (pose, states)
    init.jaxexport    serialized Exported: () -> zero states

Portability: the default ``backend="xla"`` export lowers the pure-XLA scan
path and targets both CPU and TPU under jax.export's compatibility
guarantees. ``backend="pallas"`` bakes the Mosaic whole-scan kernels in —
TPU-only, and carried as a ``tpu_custom_call`` whose forward compatibility
window is narrower than plain StableHLO (jax.export disallows it unless
explicitly waived, which this module does on request).
"""

from __future__ import annotations

import contextlib
import hashlib
import json
import os
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from a3gc_tpu.eval.streaming import make_window_step
from a3gc_tpu.models.pipeline import CascadeConfig

__all__ = ["export_streaming_cascade", "export_streaming_dip",
           "save_exported", "load_exported",
           "ExportedCascade", "export_bundle", "ExportedBundle",
           "ArtifactSession", "ArtifactLookaheadSession",
           "lookahead_geometries"]

_MANIFEST = "manifest.json"
_STEP = "step.jaxexport"
_INIT = "init.jaxexport"
_BUNDLE = "bundle.json"
_FORMAT_VERSION = 1


def _override_backend(cfg, backend: str):
    r"""Pin the scan backend of every net (GraphNetConfig.backend /
    DIPConfig.backend) so the exported lowering is deterministic instead of
    depending on the platform of the exporting process. A pallas export
    additionally pins ``pallas_interpret='never'``: interpret mode on a CPU
    exporting host would silently bake plain XLA ops into the artifact.
    Accepts a 3-stage :class:`CascadeConfig` or a single-net
    ``PoseNetConfig`` (the dip export)."""
    net_kw = {"backend": backend}
    if backend == "pallas":
        net_kw["pallas_interpret"] = "never"
    if not hasattr(cfg, "stage1"):          # single-net PoseNetConfig
        return cfg.replace(net=cfg.net.replace(**net_kw))
    stages = {
        name: stage.replace(net=stage.net.replace(**net_kw))
        for name, stage in (("stage1", cfg.stage1), ("stage2", cfg.stage2),
                            ("stage3", cfg.stage3))
    }
    return cfg.replace(**stages)


def _zero_states(cfg: CascadeConfig, streams: int):
    from a3gc_tpu.models import nets as N
    zero = N.graph_net_zero_state if cfg.is_graph else N.dip_zero_state
    return tuple(zero(c.net, streams)
                 for c in (cfg.stage1, cfg.stage2, cfg.stage3))


def export_streaming_cascade(
        params3: Tuple, cfg: CascadeConfig, model, window: int = 60,
        streams: int = 1, stats: Optional[Dict[str, np.ndarray]] = None,
        normalize: bool = False, backend: str = "xla",
        platforms: Optional[Sequence[str]] = None):
    r"""Export the windowed cascade step + zero-state initializer.

    Returns ``(exported_step, exported_init, manifest_dict)`` where the
    exported objects are ``jax.export.Exported`` (call ``.serialize()`` or
    use :func:`save_exported`). Parameters, stats, and the body model are
    closed over — they become constants of the StableHLO module."""
    if backend not in ("xla", "pallas"):
        raise ValueError(f"unknown backend {backend!r}")
    if platforms is None:
        platforms = ["tpu"] if backend == "pallas" else ["cpu", "tpu"]
    if backend == "pallas" and list(platforms) != ["tpu"]:
        raise ValueError("the Pallas kernels are Mosaic TPU programs; "
                         "use backend='xla' for a portable artifact")

    cfg = _override_backend(cfg, backend)
    stats_j = ({k: jnp.asarray(v) for k, v in stats.items()}
               if (normalize and stats is not None) else None)
    step = make_window_step(cfg, model, stats_j)
    zero = _zero_states(cfg, streams)
    exp_step, exp_init = _export_program(step, params3, zero, window,
                                         streams, backend, platforms)
    manifest = _base_manifest(
        family=(cfg.stage1.net.cell if cfg.is_graph else "tp"),
        window=window, streams=streams, rotsize=cfg.stage3.rotsize,
        backend=backend, platforms=platforms,
        normalized=bool(stats_j is not None))
    return exp_step, exp_init, manifest


def _export_program(step, params, zero, window: int, streams: int,
                    backend: str, platforms):
    r"""jax.export the windowed step + zero-state init over any step
    function ``step(params, ori, acc, *states, active) -> (pose,
    *states)`` with the states tuple ``zero`` (3-stage cascade or the
    dip single net). Params (and everything ``step`` closes over —
    stats, the body model) become constants of the StableHLO module."""

    def _step(ori, acc, states, active):
        out = step(params, ori, acc, *states, active)
        pose = out[0].reshape((streams, window) + out[0].shape[1:])
        return pose, tuple(out[1:])

    aval = lambda shape: jax.ShapeDtypeStruct(shape, jnp.float32)
    in_avals = (aval((streams, window, 54)), aval((streams, window, 18)),
                jax.tree_util.tree_map(
                    lambda z: jax.ShapeDtypeStruct(z.shape, z.dtype), zero),
                aval((streams,)))
    kwargs = {}
    ctx = contextlib.nullcontext()
    if backend == "pallas":
        kwargs["disabled_checks"] = [
            jax_export.DisabledSafetyCheck.custom_call("tpu_custom_call")]
        # force real Mosaic lowering: a CPU exporting process would
        # otherwise trace the kernels in interpret mode and silently bake
        # plain XLA ops into the "pallas" artifact
        from a3gc_tpu.models.nets import compiled_pallas_lowering
        ctx = compiled_pallas_lowering()
    with ctx:
        exp_step = jax_export.export(jax.jit(_step),
                                     platforms=list(platforms),
                                     **kwargs)(*in_avals)
    exp_init = jax_export.export(jax.jit(lambda: zero),
                                 platforms=list(platforms))()
    return exp_step, exp_init


def _base_manifest(family: str, window: int, streams: int, rotsize: int,
                   backend: str, platforms, normalized: bool) -> dict:
    return {
        "format_version": _FORMAT_VERSION,
        "family": family,
        "window": window,
        "streams": streams,
        "rotsize": rotsize,
        "backend": backend,
        "platforms": list(platforms),
        "normalized": normalized,
        "inputs": {
            "ori": [streams, window, 54], "acc": [streams, window, 18],
            "active": [streams],
        },
        "outputs": {"pose": [streams, window, 24, 3, 3]},
        "jax_version": jax.__version__,
    }


def export_streaming_dip(params, cfg, model, window: int = 60,
                         streams: int = 1,
                         stats: Optional[Dict[str, np.ndarray]] = None,
                         backend: str = "xla",
                         platforms: Optional[Sequence[str]] = None):
    r"""Export the SINGLE-NET dip online program — the reference's dip
    online mode (ref: net_aagc.py:1022-1031 ``forward(imu, rnn_state)``,
    evaluate_dip.py:88-91) as a deployment artifact: one windowed step
    (no-root trim → normalize → net → IK, carried state, per-slot
    masking) with params, stats, and the body model baked in. Same
    artifact layout/manifest as the cascade export, ``family='dip'``;
    the runtime (:class:`ExportedCascade`, :class:`ArtifactSession`,
    :class:`ArtifactLookaheadSession`) is generic over the carried state
    tuple, so dip artifacts serve through the identical stack.

    ``stats`` is MANDATORY (the dip input prep normalizes; there is no
    un-normalized dip online mode, ref: evaluate_dip.py:69)."""
    from a3gc_tpu.eval.streaming import make_dip_window_step
    from a3gc_tpu.models import nets as N

    if backend not in ("xla", "pallas"):
        raise ValueError(f"unknown backend {backend!r}")
    if stats is None:
        raise ValueError("dip export needs normalization stats "
                         "(evaluate_dip.py:69 normalizes unconditionally)")
    if platforms is None:
        platforms = ["tpu"] if backend == "pallas" else ["cpu", "tpu"]
    if backend == "pallas" and list(platforms) != ["tpu"]:
        raise ValueError("the Pallas kernels are Mosaic TPU programs; "
                         "use backend='xla' for a portable artifact")

    cfg = _override_backend(cfg, backend)
    step = make_dip_window_step(cfg, model, stats)
    zero = (N.dip_zero_state(cfg.net, streams),)
    exp_step, exp_init = _export_program(step, params, zero, window,
                                         streams, backend, platforms)
    manifest = _base_manifest(
        family="dip", window=window, streams=streams, rotsize=cfg.rotsize,
        backend=backend, platforms=platforms, normalized=True)
    return exp_step, exp_init, manifest


def save_exported(directory: str, exp_step, exp_init, manifest: dict):
    r"""Write the three-file artifact directory. The manifest records a
    sha256 per serialized module so a load can detect truncated/corrupted
    artifacts before handing them to the runtime."""
    os.makedirs(directory, exist_ok=True)
    digests = {}
    for name, exp in ((_STEP, exp_step), (_INIT, exp_init)):
        blob = bytes(exp.serialize())
        digests[name] = hashlib.sha256(blob).hexdigest()
        with open(os.path.join(directory, name), "wb") as f:
            f.write(blob)
    manifest = dict(manifest, sha256=digests)
    with open(os.path.join(directory, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return directory


def export_bundle(directory: str, params3: Tuple, cfg: CascadeConfig,
                  model, geometries: Sequence[Tuple[int, int]],
                  stats: Optional[Dict[str, np.ndarray]] = None,
                  normalize: bool = False, backend: str = "xla",
                  platforms: Optional[Sequence[str]] = None) -> str:
    r"""Export ONE deployment bundle covering several serving geometries.

    A single exported module has fixed (streams, window): the Pallas
    whole-scan kernels are Mosaic programs with static grids, so
    ``jax.export`` symbolic dimensions cannot cover the stream axis — the
    TPU-honest answer to multi-geometry deployment is a BUNDLE: one
    directory holding one serialized module per geometry plus an index,
    so a deployment ships one artifact and serves S∈{1,8,16} (etc.)
    without re-exporting. Each sub-artifact still cold-starts in seconds
    (trace+lowering were paid at export, docs/validation/EXPORT_ONCHIP.md).

    ``geometries`` is a list of (streams, window). Layout::

        bundle.json              index: geometries -> subdirectory
        s{S}_w{W}/manifest.json  ordinary single-geometry artifacts
        s{S}_w{W}/step.jaxexport
        s{S}_w{W}/init.jaxexport

    ``cfg`` may be a 3-stage :class:`CascadeConfig` or a single-net
    ``PoseNetConfig`` — the latter bundles dip online programs
    (:func:`export_streaming_dip`; ``params3`` then holds the one net's
    params and ``stats`` is mandatory).
    """
    single_net = not hasattr(cfg, "stage1")
    index = {"format_version": _FORMAT_VERSION, "geometries": []}
    for streams, window in geometries:
        if single_net:
            exp_step, exp_init, manifest = export_streaming_dip(
                params3, cfg, model, window=window, streams=streams,
                stats=stats, backend=backend, platforms=platforms)
        else:
            exp_step, exp_init, manifest = export_streaming_cascade(
                params3, cfg, model, window=window, streams=streams,
                stats=stats, normalize=normalize, backend=backend,
                platforms=platforms)
        sub = f"s{streams}_w{window}"
        save_exported(os.path.join(directory, sub), exp_step, exp_init,
                      manifest)
        index["geometries"].append(
            {"streams": streams, "window": window, "dir": sub})
    with open(os.path.join(directory, _BUNDLE), "w") as f:
        json.dump(index, f, indent=1)
    return directory


class ExportedBundle:
    r"""Runtime view of a multi-geometry bundle directory: ``select`` a
    (streams, window) sub-artifact; each deserializes lazily and is
    cached, so a server that only ever uses one geometry pays one
    deserialization."""

    def __init__(self, directory: str):
        self.directory = directory
        with open(os.path.join(directory, _BUNDLE)) as f:
            self.index = json.load(f)
        if self.index["format_version"] != _FORMAT_VERSION:
            raise ValueError(
                f"unsupported bundle format "
                f"{self.index['format_version']}")
        self._cache = {}

    @property
    def geometries(self):
        return [(g["streams"], g["window"])
                for g in self.index["geometries"]]

    def select(self, streams: Optional[int] = None,
               window: Optional[int] = None) -> "ExportedCascade":
        r"""Return the sub-artifact matching the requested geometry.
        Unspecified axes match the bundle's first entry."""
        for g in self.index["geometries"]:
            if ((streams is None or g["streams"] == streams)
                    and (window is None or g["window"] == window)):
                key = (g["streams"], g["window"])
                if key not in self._cache:
                    self._cache[key] = ExportedCascade(
                        os.path.join(self.directory, g["dir"]))
                return self._cache[key]
        raise KeyError(
            f"no geometry (streams={streams}, window={window}) in this "
            f"bundle; available: {self.geometries}")


class ExportedCascade:
    r"""Runtime wrapper over a deserialized artifact directory.

    Needs only jax + numpy — no model code, checkpoints, stats files, or
    SMPL assets (all baked into the module). Thread the returned states
    back in; pass ``active`` [S] 0/1 to mask idle serving slots (their
    state is untouched, their output slice is garbage)."""

    def __init__(self, directory: str):
        with open(os.path.join(directory, _MANIFEST)) as f:
            self.manifest = json.load(f)
        # real exceptions, not asserts: these validate EXTERNAL artifact
        # files and must survive `python -O`
        if self.manifest["format_version"] != _FORMAT_VERSION:
            raise ValueError(
                f"unsupported artifact format "
                f"{self.manifest['format_version']} "
                f"(this runtime reads format {_FORMAT_VERSION})")
        blobs = {}
        for name in (_STEP, _INIT):
            with open(os.path.join(directory, name), "rb") as f:
                blobs[name] = f.read()
            want = self.manifest.get("sha256", {}).get(name)
            if want is not None:
                got = hashlib.sha256(blobs[name]).hexdigest()
                if got != want:
                    raise ValueError(
                        f"artifact integrity check failed for {name}: "
                        f"sha256 {got} != manifest {want} (truncated or "
                        f"corrupted artifact?)")
        self._step = jax_export.deserialize(bytearray(blobs[_STEP]))
        self._init = jax_export.deserialize(bytearray(blobs[_INIT]))
        self.window = self.manifest["window"]
        self.streams = self.manifest["streams"]

    def zero_states(self):
        return self._init.call()

    def step(self, ori, acc, states, active=None):
        r"""ori [S,W,54], acc [S,W,18] -> (pose [S,W,24,3,3], states)."""
        S = self.streams
        ori = jnp.asarray(ori, jnp.float32).reshape(S, self.window, 54)
        acc = jnp.asarray(acc, jnp.float32).reshape(S, self.window, 18)
        act = (jnp.ones((S,), jnp.float32) if active is None
               else jnp.asarray(active, jnp.float32).reshape(S))
        return self._step.call(ori, acc, states, act)


def load_exported(directory: str, streams: Optional[int] = None,
                  window: Optional[int] = None) -> ExportedCascade:
    r"""Load a single-geometry artifact OR a bundle. For a bundle,
    ``streams``/``window`` pick the geometry (first entry when omitted);
    for a plain artifact a non-matching request is an error."""
    if os.path.exists(os.path.join(directory, _BUNDLE)):
        return ExportedBundle(directory).select(streams, window)
    art = ExportedCascade(directory)
    if ((streams is not None and art.streams != streams)
            or (window is not None and art.window != window)):
        raise KeyError(
            f"artifact has geometry (streams={art.streams}, "
            f"window={art.window}), not (streams={streams}, "
            f"window={window}); re-export or use a bundle")
    return art


class ArtifactSession:
    r"""Drop-in :class:`~a3gc_tpu.eval.streaming.StreamingCascade`
    interface (``step``/``reset``) over an exported artifact — carries the
    state pytree internally so the dynamic-batching HTTP server
    (``cli serve --artifact DIR``) can serve straight from a deployment
    artifact with no checkpoints, stats files, or SMPL assets."""

    def __init__(self, artifact: ExportedCascade):
        self.art = artifact
        self.window = artifact.window
        self.streams = artifact.streams
        # jax arrays are immutable, so the cached zero pytree can be
        # re-bound on every full reset without re-running the init program
        self._zero_states = artifact.zero_states()
        self._states = self._zero_states

    def reset(self, stream: Optional[int] = None):
        if stream is None:
            self._states = self._zero_states
        else:
            # slot axis is 1 in both state layouts: graph [2, S, N, H],
            # dense [2, S, H] (same convention as StreamingCascade.reset)
            self._states = jax.tree_util.tree_map(
                lambda s: s.at[:, stream].set(0.0), self._states)

    def step(self, ori, acc, active=None) -> np.ndarray:
        pose, self._states = self.art.step(ori, acc, self._states, active)
        pose = np.asarray(pose)
        return pose if self.streams > 1 else pose[0]


def lookahead_geometries(streams: Sequence[int], window: int,
                         lookahead: int, history: int = 0):
    r"""The (streams, window) set a lookahead-K / history-P deployment
    bundle needs: for each stream count, modules at windows
    {W, 2W, ..., (P+K+1)·W} — the W module advances state (and flushes
    1-window tails), the (P+K+1)·W module runs steady-state buffered
    emissions, and the intermediate f·W modules run warmup emissions
    and flush partial tails. ``cli export --lookahead K --history P``
    expands the geometry list with this."""
    return [(s, f * window) for s in streams
            for f in range(1, lookahead + history + 2)]


class ArtifactLookaheadSession:
    r"""Buffered-context (lookahead-K / history-P) serving from a
    deployment BUNDLE — the artifact counterpart of
    ``StreamingCascade(lookahead=K, history=P)`` (same
    ``step``/``flush``/``reset`` contract; equality pinned by an oracle
    test against the live session, tests/test_export.py).

    Each slot buffers its last ≤ P+K+1 windows. Once it holds K+1, the
    window K-from-newest is computed by the fill·W-window module over
    the whole buffer from the carried state (the returned state is
    DISCARDED — artifact steps are functional, so a read-only pass is
    just not threading the state back); at capacity the W-window module
    then advances the carried state through the oldest window alone.
    ``flush`` drains each slot's un-emitted tail as one continuous
    chunk via the fill·W module, grouping slots by fill count (disjoint
    masked groups — state advance identical to the live session's
    single per-frame-masked pass).

    Needs the bundle geometries from :func:`lookahead_geometries`; a
    missing window raises with the re-export command."""

    def __init__(self, bundle: ExportedBundle,
                 streams: Optional[int] = None,
                 window: Optional[int] = None, lookahead: int = 1,
                 history: int = 0):
        import collections

        if lookahead < 1 and history < 1:
            raise ValueError("lookahead or history must be >= 1 (use "
                             "ArtifactSession for plain windowing)")
        base = bundle.select(streams, window)
        S, W, K, P = base.streams, base.window, lookahead, history
        self.streams, self.window = S, W
        self.lookahead, self.history = K, P
        self._mods, missing = {}, []
        for f in range(1, K + P + 2):
            try:
                self._mods[f] = bundle.select(S, f * W)
            except KeyError:
                missing.append((S, f * W))
        if missing:
            raise KeyError(
                f"lookahead={K} history={P} needs bundle geometries "
                f"{missing} — re-export with `cli export --streams {S} "
                f"--window {W} --lookahead {K} --history {P}`")
        self._zero_states = base.zero_states()
        self._states = self._zero_states
        self._buffers = [collections.deque() for _ in range(S)]

    def reset(self, stream: Optional[int] = None):
        if stream is None:
            self._states = self._zero_states
            for b in self._buffers:
                b.clear()
        else:
            self._states = jax.tree_util.tree_map(
                lambda s: s.at[:, stream].set(0.0), self._states)
            self._buffers[stream].clear()

    def step(self, ori, acc, active=None):
        r"""Same contract as ``StreamingCascade.step`` with lookahead /
        history: streams=1 returns the (possibly lagged) pose (None
        while warming up); S>1 returns ``(pose [S, W, ...] | None,
        emitted [S] bool)``."""
        S, W = self.streams, self.window
        K, P = self.lookahead, self.history
        ori = np.asarray(ori, np.float32).reshape(S, -1, 54)
        acc = np.asarray(acc, np.float32).reshape(S, -1, 18)
        if ori.shape[1] != W:
            raise ValueError(
                f"window size {ori.shape[1]} != configured {W}")
        act = (np.ones(S, bool) if active is None
               else np.asarray(active).astype(bool).reshape(S))
        appended = [i for i in range(S) if act[i]]
        for i in appended:
            self._buffers[i].append((ori[i].copy(), acc[i].copy()))
        # shared grouped-emission driver with the live session (the
        # oracle pair share their buffer mechanics by construction);
        # mutation commits only after the device passes succeed — see
        # StreamingCascade.emit_buffered
        from a3gc_tpu.eval.streaming import StreamingCascade as _SC

        def emission_pass(f, em, ctx):
            # read-only on the state (returned state dropped — artifact
            # steps are functional)
            ctx_o, ctx_a = ctx
            full, _ = self._mods[f].step(ctx_o, ctx_a, self._states, em)
            return full

        def advance_pass(advf, adv_ctx):
            # at-capacity slots' carried state moves through their
            # oldest window
            adv_o, adv_a = adv_ctx
            _, states = self._mods[1].step(adv_o, adv_a, self._states,
                                           advf)
            self._states = states

        pose, emitted = _SC.emit_buffered(
            self._buffers, act, W, K, P, appended, emission_pass,
            advance_pass)
        if S == 1:
            return pose[0] if emitted[0] else None
        return pose, emitted

    def flush(self, stream: Optional[int] = None):
        r"""Drain buffered tails as continuous chunks (the live
        session's flush semantics): slot i's whole f·W-frame buffer runs
        as ONE pass from the carried state via the f·W module (the
        un-emitted tail — the newest ≤ K windows — is returned, the
        already-emitted history windows lead it as context); slots are
        grouped by fill count and flushed group-by-group with activity
        masks (disjoint groups — carried slots untouched)."""
        S, W, K = self.streams, self.window, self.lookahead
        sel = [stream] if stream is not None else list(range(S))
        fills = [len(self._buffers[i]) if i in sel else 0
                 for i in range(S)]
        if not any(fills):
            return None if (S == 1 or stream is not None) else [None] * S
        tails = [None] * S
        for f in sorted({x for x in fills if x}):
            group = [i for i in range(S) if fills[i] == f]
            o = np.zeros((S, f * W, 54), np.float32)
            a = np.zeros((S, f * W, 18), np.float32)
            for i in group:
                o[i] = np.concatenate([x for x, _ in self._buffers[i]])
                a[i] = np.concatenate([y for _, y in self._buffers[i]])
            act = np.zeros(S, np.float32)
            act[group] = 1.0
            full, states = self._mods[f].step(o, a, self._states, act)
            full = np.asarray(full)     # fetch before committing state
            self._states = states
            u = f if f <= K else K      # un-emitted tail windows
            for i in group:     # buffers drop only after the pass landed
                self._buffers[i].clear()
                tails[i] = full[i, (f - u) * W:] if u else None
        if stream is not None:
            return tails[stream]
        return tails[0] if S == 1 else tails
