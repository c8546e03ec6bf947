r"""Online / streaming inference with carried recurrent state.

The reference's online mode is the ``forward(imu, rnn_state)`` + ``reset()``
pair on every PoseNet (ref: net_aagc.py:802-812): the recurrent (h, c) state
is the context carrier between calls, cleared per sequence
(ref: evaluate_a3gc_tp.py:165). This module packages that as a
``StreamingSession``: fixed-size windows are processed by ONE pre-compiled
program per stage while the state threads across windows — giving bounded
latency on unbounded streams (the "long-context" answer of SURVEY.md §5; no
cross-chip sequence sharding is warranted at these sizes).

Caveat identical to the reference: the cells are bidirectional, so the
backward direction only sees the current window — streaming outputs match
offline outputs only in the forward direction's contribution. The reference
has the same behavior when fed incrementally.
"""

from __future__ import annotations

import collections
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from a3gc_tpu.config import joint_set as JS
from a3gc_tpu.models.pipeline import (
    CascadeConfig, PoseNetConfig, pose_net_forward,
    reduced_global_to_full_local,
)

__all__ = ["StreamingSession", "StreamingCascade", "DipStreamingSession",
           "make_window_step", "make_dip_window_step",
           "shard_window_step", "streaming_predictions",
           "streaming_predictions_multi", "streaming_outputs",
           "streaming_outputs_multi"]


def make_window_step(cfg: CascadeConfig, model, stats=None):
    r"""Build the pure windowed-cascade step function.

    Returns ``step(params3, ori, acc, s1, s2, s3, active) -> (pose, s1,
    s2, s3)``: one fixed-size window of raw IMU frames (ori [S, T_w, 54],
    acc [S, T_w, 18]) through normalize → scatter → the three stages → IK
    (ref: evaluate_a3gc_tp.py:164-171 run incrementally, net_aagc.py:809-812),
    with each stage's recurrent state threading across windows. ``active``
    [S] 0/1 masks idle serving slots: their state carries through unchanged
    (their whole window is treated like padding), enabling dynamic batching.
    ``active`` may also be a per-frame mask [S, T_w] (ones-prefix rows) —
    used by the lookahead flush, where slots hold fewer buffered windows
    than the program's context length.

    This is the single compiled program behind :class:`StreamingCascade`,
    ``cli serve``, and the AOT deployment export (``a3gc_tpu.export``).
    ``stats`` must already hold ``jnp`` arrays (or be None for no
    normalization)."""
    from a3gc_tpu.data import pipeline as DPipe

    assert cfg.stage3.rotsize in (6, 9), (
        "streaming emits full local poses via IK; a rotsize-3 stage 3 "
        "outputs raw positions with no rotation to stream (ref: "
        "net_aagc.py:828-829) — train stage 3 with --rotsize 9 or 6")

    def _step(params3, ori, acc, s1, s2, s3, active):
        o, a = DPipe.normalize_imu(ori, acc, stats)
        if cfg.is_graph:
            imu = DPipe.scatter_graph_inputs(o, a)      # [S,T_w,15,12]
        else:
            imu = jnp.concatenate((a, o), axis=-1)      # [S,T_w,72]
        B, T = imu.shape[0], imu.shape[1]
        mask = (active if active.ndim == 2
                else jnp.broadcast_to(active[:, None], (B, T))
                ).astype(imu.dtype)
        p1, p2, p3 = params3

        leaf, s1 = pose_net_forward(p1, cfg.stage1, imu, s1,
                                    frame_mask=mask)
        if cfg.is_graph:
            leaf = leaf.reshape(B, T, JS.n_reduced, 3)
        x2 = jnp.concatenate((imu, leaf), axis=-1)

        full, s2 = pose_net_forward(p2, cfg.stage2, x2, s2,
                                    frame_mask=mask)
        if cfg.is_graph:
            full = full.reshape(B, T, JS.n_reduced, 3)
        x3 = jnp.concatenate((imu, full), axis=-1)

        out, s3 = pose_net_forward(p3, cfg.stage3, x3, s3,
                                   frame_mask=mask)
        rotsize = cfg.stage3.rotsize
        rep = (3, 3) if rotsize == 9 else (rotsize,)
        pose = reduced_global_to_full_local(
            out.reshape((-1, JS.n_reduced) + rep), model,
            rotsize=rotsize)
        return pose, s1, s2, s3

    return _step


def shard_window_step(step_fn, mesh, zero_states, n_masks: int = 1):
    r"""shard_map the windowed-cascade step over ``mesh['data']``.

    The ONLINE scale-out counterpart of ``parallel.serving.
    cascade_apply_sharded`` (the reference's stateful online mode,
    ref: net_aagc.py:802-812, has no multi-device story at all): the S
    serving slots split over the data axis, each device runs the whole
    windowed step — normalize → scatter → 3 stages → IK, INCLUDING its
    own Pallas kernel launches — on its local S/n_data slots, with that
    shard's carried recurrent state resident on the device. Per-slot
    independence (block-diagonal adjacency, per-stream n_valid, ``active``
    masking) means zero collectives; ``shard_map`` (not jit propagation)
    because ``pallas_call`` has no SPMD partitioning rule — XLA would
    gather the batch onto one device first.

    ``zero_states`` fixes the state pytree structure; every state leaf
    carries the slot axis at position 1 ([2, S, N, H] graph / [2, S, H]
    dense), so its spec is P(None, 'data').

    ``n_masks``: trailing per-slot [S] mask arguments after the states
    (1 for the plain step's ``active``; 2 for the fused emit+advance
    step's ``(em, advf)``).
    """
    from jax.sharding import PartitionSpec as P

    from a3gc_tpu.parallel.mesh import shard_map_compat as shard_map

    def _state_spec(zs):
        return jax.tree_util.tree_map(lambda _: P(None, "data"), zs)

    s_specs = tuple(_state_spec(zs) for zs in zero_states)
    return shard_map(
        step_fn, mesh=mesh,
        in_specs=(P(), P("data"), P("data")) + s_specs
                 + (P("data"),) * n_masks,
        # pose comes back [S_local·T, 24, 3, 3] stream-major per shard, so
        # concatenating shards along axis 0 IS the global stream-major
        # layout — the same contract as the unsharded step
        out_specs=(P("data"),) + s_specs,
        check_rep=False)


class StreamingSession:
    r"""Stateful streaming wrapper over ONE pipeline net — the exact
    surface of the reference's per-net online mode (``forward(imu,
    rnn_state)`` + ``reset()``, ref: net_aagc.py:802-812 and the DIP
    net's, ref: net_aagc.py:1022-1031), with the same serving/quality
    machinery as :class:`StreamingCascade`:

      * ``streams=S`` multiplexes S independent clients through one
        compiled program, each with its own carried state slot;
        ``active`` [S] masks idle slots (their state carries through
        untouched) and ``reset(stream=i)`` clears one client.
      * ``lookahead=K`` buffers K future windows per emission (+K
        windows of latency); ``history=P`` re-runs ≤P already-emitted
        past windows as leading context at ZERO added latency. The
        buffered emission is the shared transactional machinery
        (:meth:`StreamingCascade.emit_buffered`), so state threading is
        identical to plain windowing — buffering changes emissions only.

    >>> sess = StreamingSession(params, cfg, window=60)
    >>> for x_window in stream:             # [window, ...feature dims]
    ...     out = sess.step(x_window)       # [window, ...output dims]
    >>> sess.reset()                        # next sequence
    """

    def __init__(self, params, cfg: PoseNetConfig, window: int = 60,
                 streams: int = 1, lookahead: int = 0, history: int = 0,
                 fused: bool = True, batch: Optional[int] = None):
        if batch is not None:               # legacy alias for streams
            streams = batch
        self.params = params
        self.cfg = cfg
        self.window = window
        self.streams = streams
        self.lookahead = int(lookahead)
        self.history = int(history)
        assert self.history >= 0 and self.lookahead >= 0
        self._buffers = [collections.deque() for _ in range(streams)]
        from a3gc_tpu.models import nets as _N
        zero = (_N.graph_net_zero_state if cfg.is_graph
                else _N.dip_zero_state)
        # explicit zero state (not None): one compile for first and
        # later windows (the state pytree structure never changes)
        self._zero_state = zero(cfg.net, streams)
        self._state = self._zero_state
        # the slot axis of every state leaf (reset(stream=i) zeroes its
        # slice): graph states are [2, S, N, H], dense bidirectional
        # [2, S, H], dense unidirectional [S, H]
        self._slot_axis = (1 if (cfg.is_graph or cfg.net.bidirectional)
                           else 0)

        def _raw(params, x, state, active):
            B, T = x.shape[0], x.shape[1]
            mask = (active if active.ndim == 2
                    else jnp.broadcast_to(active[:, None], (B, T))
                    ).astype(x.dtype)
            return pose_net_forward(params, cfg, x, state,
                                    frame_mask=mask)

        self._fn = jax.jit(_raw)
        self._fused_fn = None
        if fused and (self.lookahead or self.history):
            # steady-state single-dispatch program (same scheme as
            # StreamingCascade): at-capacity emission + oldest-window
            # state advance in ONE jit call, the advance input sliced
            # from the emission context in-device
            W = window

            def fused_step(params, x, state, em, advf):
                out, _ = _raw(params, x, state, em)
                _, st = _raw(params, x[:, :W], state, advf)
                return out, st

            self._fused_fn = jax.jit(fused_step)

    def reset(self, stream: Optional[int] = None):
        r"""Clear the carried recurrent state (ref: net_aagc.py:802-807).
        ``stream=i`` zeroes only client i's state slice and drops its
        buffered windows (one client ending its sequence)."""
        if stream is None:
            self._state = self._zero_state
            for b in self._buffers:
                b.clear()
        else:
            idx = (slice(None),) * self._slot_axis + (stream,)
            self._state = jax.tree_util.tree_map(
                lambda s: s.at[idx].set(0.0), self._state)
            self._buffers[stream].clear()

    def _lift(self, x_window):
        x = np.asarray(x_window, np.float32)
        squeeze = x.ndim == (3 if self.cfg.is_graph else 2)
        if squeeze:                                     # no stream axis
            x = x[None]
        assert x.shape[0] == self.streams, (
            f"got {x.shape[0]} stream rows != configured {self.streams}")
        assert x.shape[1] == self.window, (
            f"window size {x.shape[1]} != configured {self.window}")
        return x, squeeze

    def step(self, x_window: np.ndarray, active=None):
        r"""Process one window [T_w, ...] (or [S, T_w, ...]); returns the
        net output with the leading stream dim squeezed for streams=1.
        ``active`` [S] 0/1 marks which clients submitted this tick.
        With lookahead/history the emission contract matches
        :meth:`StreamingCascade.step`: streams=1 returns the (lagged)
        output or None while warming up; S > 1 returns ``(out, emitted
        [S] bool)``. Call :meth:`flush` after a stream's last window to
        drain its buffered tail (K ≥ 1 only)."""
        x, squeeze = self._lift(x_window)
        if self.lookahead or self.history:
            return self._step_buffered(x, active)
        S = self.streams
        act = (jnp.ones((S,), jnp.float32) if active is None
               else jnp.asarray(active, jnp.float32).reshape(S))
        out, self._state = self._fn(self.params, jnp.asarray(x),
                                    self._state, act)
        out = np.asarray(out)
        return out[0] if squeeze else out

    def _step_buffered(self, x, active):
        r"""Buffered-context emission — :meth:`StreamingCascade.
        _step_buffered` over ONE net with one carried state (shared
        transactional driver, same grouped-emission/advance/commit
        semantics)."""
        S, W = self.streams, self.window
        K, P = self.lookahead, self.history
        act = (np.ones(S, bool) if active is None
               else np.asarray(active).astype(bool).reshape(S))
        appended = [i for i in range(S) if act[i]]
        for i in appended:
            self._buffers[i].append((x[i].copy(),))
        state = self._state     # state at the start of the oldest window

        def emission_pass(f, em, ctx):
            out, _ = self._fn(self.params, jnp.asarray(ctx[0]), state,
                              jnp.asarray(em))
            return out

        def advance_pass(advf, adv_ctx):
            _, st = self._fn(self.params, jnp.asarray(adv_ctx[0]), state,
                             jnp.asarray(advf))
            self._state = st

        fused_pass = None
        if self._fused_fn is not None:
            def fused_pass(em, ctx, advf):
                out, st = self._fused_fn(
                    self.params, jnp.asarray(ctx[0]), state,
                    jnp.asarray(em), jnp.asarray(advf))

                def commit():   # driver calls AFTER the fetch fenced
                    self._state = st
                return out, commit

        out, emitted = StreamingCascade.emit_buffered(
            self._buffers, act, W, K, P, appended, emission_pass,
            advance_pass, fused_pass)
        if S == 1:
            return out[0] if emitted[0] else None
        return out, emitted

    def flush(self, stream: Optional[int] = None):
        r"""Drain buffered tails at end of stream — the chunk semantics
        of :meth:`StreamingCascade.flush`: one pass over each slot's
        whole buffer from the carried state, the newest ≤ K un-emitted
        windows returned, the state advanced to the stream's end.
        Plain-windowed sessions buffer nothing and return None."""
        if not (self.lookahead or self.history):
            return (None if (self.streams == 1 or stream is not None)
                    else [None] * self.streams)
        S, W = self.streams, self.window
        K, P = self.lookahead, self.history
        sel = [stream] if stream is not None else list(range(S))
        fills = [len(self._buffers[i]) if i in sel else 0
                 for i in range(S)]
        if not any(fills):
            return None if (S == 1 or stream is not None) else [None] * S
        Tc = (P + K + 1) * W
        feat = self._buffers[next(i for i in sel if fills[i])][0][0].shape[1:]
        ctx = np.zeros((S, Tc) + feat, np.float32)
        mask = np.zeros((S, Tc), np.float32)    # ones-prefix per slot
        for i in sel:
            if fills[i]:
                ctx[i, :fills[i] * W] = np.concatenate(
                    [w[0] for w in self._buffers[i]])
                mask[i, :fills[i] * W] = 1.0
        out, st = self._fn(self.params, jnp.asarray(ctx), self._state,
                           jnp.asarray(mask))
        out = np.asarray(out)       # fetch fences; commit only after
        self._state = st
        for i in sel:
            if fills[i]:
                self._buffers[i].clear()
        tails = []
        for i in range(S):
            u = fills[i] if fills[i] <= K else K
            tails.append(out[i, (fills[i] - u) * W:fills[i] * W]
                         if u else None)
        if stream is not None:
            return tails[stream]
        return tails[0] if S == 1 else tails


class StreamingCascade:
    r"""Online full-cascade inference with carried per-stage recurrent state.

    The streaming counterpart of ``models.pipeline.cascade_apply``
    (ref: evaluate_a3gc_tp.py:164-171 run incrementally via the nets'
    ``forward(imu, rnn_state)`` online mode, net_aagc.py:809-812): one
    pre-compiled program processes a fixed-size window of raw IMU frames
    (ori [T_w, 54], acc [T_w, 18]) through normalize → scatter → the three
    stages → IK, while each stage's recurrent state threads across windows.
    Bounded latency on unbounded streams; one compilation per window size.

    >>> sess = StreamingCascade(params3, cfg, model, window=60)
    >>> for ori_w, acc_w in imu_stream:
    ...     pose = sess.step(ori_w, acc_w)       # [60, 24, 3, 3]
    >>> sess.reset()                             # next subject/sequence

    Multi-stream serving: ``streams=S`` multiplexes S independent clients
    through ONE compiled program per window — the S sequences fold onto the
    kernel row axis (the same batched-stream path as
    ``evaluate --batch_streams``), each with its own carried state.
    ``step`` then takes ori [S, T_w, 54] / acc [S, T_w, 18] and returns
    [S, T_w, 24, 3, 3]; ``reset(stream=i)`` clears ONE client's state
    (a client ended its sequence) without touching the others.

    Multi-chip: ``mesh=`` shards the S slots over the mesh's ``data``
    axis (see :func:`shard_window_step`) — single-chip serving saturates
    around 16 streams (docs/PERFORMANCE.md), so past that the slots
    scale out data-parallel, each device carrying its shard's state.
    ``reset(stream=i)`` and ``active`` masking work unchanged.

    Streaming-quality context: ``lookahead=K`` buffers K windows of
    FUTURE context before emitting (adds K windows of latency);
    ``history=P`` re-runs up to P already-emitted PAST windows as
    attention/self-context for every emission at ZERO added latency.
    They compose: emission for window k is computed over windows
    [k-P, k+K] from the carried state at window k-P. Measured with the
    reference's trained checkpoints (docs/validation/
    STREAMING_TRADEOFF.md): P=1 alone −38% divergence vs offline at
    unchanged latency; P=1+K=1 −79%.
    """

    def __init__(self, params3: Tuple, cfg: CascadeConfig, model,
                 window: int = 60,
                 stats: Optional[Dict[str, np.ndarray]] = None,
                 normalize: bool = False, streams: int = 1,
                 lookahead: int = 0, history: int = 0, mesh=None,
                 fused: bool = True):
        self.cfg = cfg
        self.stats = ({k: jnp.asarray(v) for k, v in stats.items()}
                      if (normalize and stats is not None) else None)
        # explicit zero states (not None) so the program compiles ONCE: the
        # state pytree structure is identical on the first and later windows
        from a3gc_tpu.models import nets as _N
        zero = (_N.graph_net_zero_state if cfg.is_graph
                else _N.dip_zero_state)
        zero_states = tuple(
            zero(c.net, streams)
            for c in (cfg.stage1, cfg.stage2, cfg.stage3))
        step = make_window_step(cfg, model, self.stats)
        self._init_session(params3, step, zero_states, window, streams,
                           lookahead, history, mesh, fused)

    def _init_session(self, params3, step, zero_states, window, streams,
                      lookahead, history, mesh, fused):
        r"""Shared session wiring over any windowed step function
        ``step(params, ori, acc, *states, active) -> (pose, *states)``
        with ``len(zero_states)`` carried state pytrees — the 3-stage
        cascade here, one net in :class:`DipStreamingSession`. All the
        buffer/dispatch/flush machinery below is generic over the state
        tuple length."""
        self.params3 = params3
        self.window = window
        self.streams = streams
        self.lookahead = int(lookahead)     # bool True (old API) -> K=1
        self.history = int(history)
        assert self.history >= 0 and self.lookahead >= 0
        # per-slot deques of buffered (ori, acc) windows: the newest K
        # await emission (lookahead), up to P older ones are kept as
        # past context (history); slot i holds at most P+K+1 windows
        self._buffers = [collections.deque() for _ in range(streams)]
        self._zero_states = zero_states
        self._states = self._zero_states
        self._pending = None
        raw = step
        if mesh is not None:
            # multi-chip ONLINE serving: slots split over mesh['data'],
            # each device carries its shard's recurrent state
            n_data = mesh.shape["data"]
            assert streams % n_data == 0, (
                f"streams={streams} must divide over the {n_data}-device "
                f"data axis (S/n_data slots per device)")
            step = shard_window_step(step, mesh, self._zero_states,
                                     n_masks=1)
        self._fn = jax.jit(step)
        self._fused_fn = None
        if fused and (self.lookahead or self.history):
            # steady-state single-dispatch program: the at-capacity
            # emission pass AND the oldest-window state advance in ONE
            # jit call — halves the per-tick host round-trips (the
            # dominant cost through a relay-attached TPU) and skips the
            # duplicate upload of the oldest window (the advance input
            # is sliced from the emission context in-device). The two
            # cascade bodies stay SEPARATE (sharing the emission scan
            # would change the advance pass's attention context — the
            # per-window state threading is the designed semantics), so
            # emissions and advanced states are bit-identical to the
            # two-pass path (oracle-tested).
            W = window

            def fused_step(params, o, a, *rest):
                states, (em, advf) = rest[:-2], rest[-2:]
                full = raw(params, o, a, *states, em)
                adv = raw(params, o[:, :W], a[:, :W], *states, advf)
                return (full[0],) + tuple(adv[1:])

            if mesh is not None:
                fused_step = shard_window_step(
                    fused_step, mesh, self._zero_states, n_masks=2)
            self._fused_fn = jax.jit(fused_step)

    def reset(self, stream: Optional[int] = None):
        r"""Clear carried stage states (ref: evaluate_a3gc_tp.py:165).

        ``stream=i`` zeroes only client i's slice of every state array
        (batch axis 1 in both the graph [2, S, N, H] and DIP [2, S, H]
        layouts) — the serving primitive for one client ending its
        sequence while the other S-1 continue. In lookahead/history mode
        the slot's buffered windows are dropped with it."""
        if stream is None:
            self._states = self._zero_states
            for b in self._buffers:
                b.clear()
        else:
            self._states = jax.tree_util.tree_map(
                lambda s: s.at[:, stream].set(0.0), self._states)
            self._buffers[stream].clear()
        self._pending = None

    def _dispatch(self, ori_window, acc_window, active=None):
        S = self.streams
        ori = jnp.asarray(ori_window).reshape(S, -1, 54)
        acc = jnp.asarray(acc_window).reshape(S, -1, 18)
        assert ori.shape[1] == self.window, (
            f"window size {ori.shape[1]} != configured {self.window}")
        act = (jnp.ones((S,), jnp.float32) if active is None
               else jnp.asarray(active, jnp.float32).reshape(S))
        out = self._fn(self.params3, ori, acc, *self._states, act)
        pose, self._states = out[0], tuple(out[1:])
        if S > 1:
            pose = pose.reshape((S, -1) + pose.shape[1:])
        return pose

    def step(self, ori_window: np.ndarray, acc_window: np.ndarray,
             active=None) -> np.ndarray:
        r"""Process one window; returns full local pose [T_w, 24, 3, 3]
        (streams=1) or [S, T_w, 24, 3, 3]. ``active`` [S] 0/1 marks which
        clients submitted this tick — idle slots' state is untouched and
        their output slice is garbage (dynamic batching).

        With ``lookahead=K`` (K ≥ 1) the emission lags K windows: step(k)
        returns window k-K's pose computed with windows k-K..k as
        backward-direction context — see :meth:`_step_buffered`. With
        ``history=P`` (P ≥ 1) every emission additionally re-runs up to P
        already-emitted past windows as leading context (zero added
        latency). In either buffered mode, for ``streams=1`` the return
        is the (possibly lagged) pose (None while warming up); for S > 1
        it is ``(pose [S, T_w, ...] | None, emitted [S] bool)`` — slot
        i's row is valid iff ``emitted[i]`` (slots warm up independently,
        e.g. after a per-stream reset). Call :meth:`flush` after a
        stream's last window to drain its buffered tail (K ≥ 1 only;
        history alone buffers nothing un-emitted).
        """
        if self.lookahead or self.history:
            return self._step_buffered(ori_window, acc_window, active)
        return np.asarray(self._dispatch(ori_window, acc_window, active))

    # -- shared history/lookahead buffer mechanics (also used by
    #    export.ArtifactLookaheadSession, its oracle-equal counterpart) --

    @staticmethod
    def assemble_buffered(buffers, act, W, K, P):
        r"""Peek-assemble the emission/advance inputs WITHOUT mutating
        the buffers: ``(emitted [S] bool, groups {fill: (mask [S] f32,
        ctx)}, adv [S] bool, adv_ctx)``. Buffers hold per-window TUPLES
        of arrays (the cascade buffers ``(ori [W,54], acc [W,18])``;
        the single-net session ``(x [W,F],)``) and ``ctx`` / ``adv_ctx``
        are matching tuples of ``[S, fill·W, ...]`` / ``[S, W, ...]``
        context arrays (``adv_ctx`` is None when no slot advances).
        A slot emits once it holds K+1 windows (the K newest are future
        context); its whole buffer — up to P additional PAST windows —
        is the emission context, so slots are grouped by fill count
        (one device pass per distinct context length; in steady state
        all active slots sit at the P+K+1 capacity → one group).
        ``adv`` marks at-capacity slots whose state advances through
        their oldest window this tick. Mutation happens in
        :meth:`commit_buffered` only after the device passes succeed,
        so a transient device/relay error (which serving catches and
        survives) cannot leave the buffer and the carried state
        desynced — a retry of the same window recomputes identically."""
        S = len(buffers)
        fills = [len(b) for b in buffers]
        emitted = np.array([bool(act[i]) and fills[i] >= K + 1
                            for i in range(S)])
        slots_by_fill: Dict[int, list] = {}
        for i in range(S):
            if emitted[i]:
                slots_by_fill.setdefault(fills[i], []).append(i)

        def _zeros(T_ctx, ref_slot):
            # component count/shapes from a non-empty buffer's first window
            return tuple(np.zeros((S, T_ctx) + c.shape[1:], np.float32)
                         for c in buffers[ref_slot][0])

        groups = {}
        for f, slots in slots_by_fill.items():
            ctx = _zeros(f * W, slots[0])
            em = np.zeros(S, np.float32)
            for i in slots:
                for j, comp in enumerate(zip(*buffers[i])):
                    ctx[j][i] = np.concatenate(comp)
                em[i] = 1.0
            groups[f] = (em, ctx)
        cap = P + K + 1
        adv = np.array([bool(emitted[i]) and fills[i] == cap
                        for i in range(S)])
        adv_slots = [i for i in range(S) if adv[i]]
        adv_ctx = _zeros(W, adv_slots[0]) if adv_slots else None
        for i in adv_slots:
            for j in range(len(adv_ctx)):
                adv_ctx[j][i] = buffers[i][0][j]
        return emitted, groups, adv, adv_ctx

    @staticmethod
    def commit_buffered(buffers, adv):
        r"""Drop each advanced slot's oldest window (the carried state
        just moved through it; below capacity the buffer keeps growing
        as history)."""
        for i, e in enumerate(adv):
            if e:
                buffers[i].popleft()

    @staticmethod
    def emit_buffered(buffers, act, W, K, P, appended, emission_pass,
                      advance_pass, fused_pass=None):
        r"""The grouped-emission driver shared by the live and artifact
        sessions (their oracle equality holds by construction): assemble
        per-fill groups, run ``emission_pass(f, em, ctx) ->
        [S, f·W, ...]`` for each (``ctx`` is the per-component context
        tuple — see :meth:`assemble_buffered`; the driver fetches the
        emitted window's slice, which fences device execution), then
        ``advance_pass(adv_mask_f32, adv_ctx)`` for at-capacity slots
        (the callback commits the advanced state in the caller).

        ``fused_pass(em, ctx, advf) -> (full, commit)``, if given,
        replaces emission_pass + advance_pass for the AT-CAPACITY
        group — whose emitting slots are by construction exactly the
        advancing slots (``adv``) — with ONE device dispatch; the driver
        calls ``commit()`` (state assignment) only after fetching the
        emission slice, which fences the fused program, preserving the
        transactional contract. In steady state every active slot sits
        at capacity, so the whole tick is a single dispatch.

        Transactional: a raise from any callback un-buffers this
        tick's appended windows so a caller that catches (e.g. serving)
        can retry the same window without buffer/state skew; the buffer
        pops commit only after every pass landed. Returns
        ``(pose [S, W, ...] | None, emitted [S] bool)``."""
        emitted, groups, adv, adv_ctx = \
            StreamingCascade.assemble_buffered(buffers, act, W, K, P)
        pose = None
        if emitted.any():
            advanced = False
            try:
                for f in sorted(groups):
                    em, ctx = groups[f]
                    commit = None
                    if fused_pass is not None and f == P + K + 1:
                        full, commit = fused_pass(
                            em, ctx, adv.astype(np.float32))
                    else:
                        full = emission_pass(f, em, ctx)
                    lo = (f - K - 1) * W    # the emitted window's offset
                    sl = np.asarray(full[:, lo:lo + W])   # fetch fences
                    if pose is None:
                        pose = np.zeros_like(sl)
                    rows = em.astype(bool)
                    pose[rows] = sl[rows]
                    if commit is not None:
                        commit()
                        advanced = True
                if adv.any() and not advanced:
                    advance_pass(adv.astype(np.float32), adv_ctx)
            except Exception:
                for i in appended:
                    buffers[i].pop()
                raise
            StreamingCascade.commit_buffered(buffers, adv)
        return pose, emitted

    def _step_buffered(self, ori_window, acc_window, active=None):
        r"""Buffered-context emission (lookahead K and/or history P):
        each slot buffers its last ≤ P+K+1 windows; once it holds K+1,
        the window K-from-newest is emitted by running the cascade over
        the ENTIRE buffer from the carried state (kept at the start of
        the oldest buffered window) and slicing that window's T_w
        outputs — the backward direction of every bidirectional layer
        sees K extra windows of future context, and the attention /
        self-context layers see up to P extra windows of past context,
        cutting streaming-vs-offline divergence. The carried state
        advances through the OLDEST window alone (a second, plain pass)
        only once the buffer is at capacity, so state threading is
        IDENTICAL to plain windowing — buffering changes emissions only.
        Cost: ~(P+K+2) × the plain per-window compute in steady state
        (one (P+K+1)·W emission pass + one W advance pass per W frames
        emitted); latency: +K windows (history alone adds NONE). Buffers
        are PER SLOT, so ``active`` masking (dynamic batching) and
        per-stream reset compose: an idle slot's buffer and state are
        untouched; a reset slot re-warms from empty. The reference's
        online mode has no counterpart (its windows never see frames
        beyond the current one, ref: net_aagc.py:809-812)."""
        S, W = self.streams, self.window
        K, P = self.lookahead, self.history
        ori = np.asarray(ori_window, np.float32).reshape(S, -1, 54)
        acc = np.asarray(acc_window, np.float32).reshape(S, -1, 18)
        assert ori.shape[1] == W, (
            f"window size {ori.shape[1]} != configured {W}")
        act = (np.ones(S, bool) if active is None
               else np.asarray(active).astype(bool).reshape(S))
        appended = [i for i in range(S) if act[i]]
        for i in appended:
            # copies: np.asarray is a no-op view for float32 input,
            # and the buffer must survive the caller reusing arrays
            self._buffers[i].append((ori[i].copy(), acc[i].copy()))
        states = self._states           # state at start of oldest window

        def emission_pass(f, em, ctx):
            # over the f buffered windows; read-only on the state (own
            # jit specialization at f·W frames — steady state uses only
            # P+K+1)
            ctx_o, ctx_a = ctx
            out = self._fn(
                self.params3, jnp.asarray(ctx_o), jnp.asarray(ctx_a),
                *states, jnp.asarray(em))
            return out[0].reshape((S, f * W) + out[0].shape[1:])

        def advance_pass(advf, adv_ctx):
            # over at-capacity slots' oldest window: the driver's
            # emission fetches already fenced; a failure before the
            # assignment leaves self._states untouched
            adv_o, adv_a = adv_ctx
            out = self._fn(
                self.params3, jnp.asarray(adv_o), jnp.asarray(adv_a),
                *states, jnp.asarray(advf))
            self._states = tuple(out[1:])

        fused_pass = None
        if self._fused_fn is not None:
            cap = P + K + 1

            def fused_pass(em, ctx, advf):
                # one dispatch: at-capacity emission + oldest-window
                # state advance (the advance input is ctx[:, :W] sliced
                # in-device — no duplicate upload)
                ctx_o, ctx_a = ctx
                out = self._fused_fn(
                    self.params3, jnp.asarray(ctx_o), jnp.asarray(ctx_a),
                    *states, jnp.asarray(em), jnp.asarray(advf))
                full = out[0].reshape((S, cap * W) + out[0].shape[1:])

                def commit():   # driver calls AFTER the fetch fenced
                    self._states = tuple(out[1:])
                return full, commit

        pose, emitted = self.emit_buffered(
            self._buffers, act, W, K, P, appended, emission_pass,
            advance_pass, fused_pass)
        if S == 1:
            return pose[0] if emitted[0] else None
        return pose, emitted

    def run_windows(self, ori, acc):
        r"""Feed consecutive windows with UPLOAD-AHEAD overlap: window
        k+1's host->device transfer runs while window k executes; the
        fetch of k's pose stays synchronous, so results and state
        threading are identical to a :meth:`step` loop. Measured through
        the axon relay (docs/validation/PROFILE_ASYNC.md): 30.7 ms per
        60-frame window vs 43.3 sync and 36.1 deferred-fetch
        (step_async) -- the H2D RPC hides entirely behind the execute
        while the D2H fetch (which step_async overlaps at the cost of
        one window of result latency) stays ordered. Use when the
        CLIENT already holds the next window (sequence replay, file
        streaming, batched evaluation); a live client that produces
        windows in real time has nothing to upload ahead.

        ``ori``/``acc``: [n, W, ...] stacked windows (plain streams=1
        session only -- buffered K/P modes own their dispatch shape).
        Returns the [n, W, ...] poses; state advances exactly as with
        per-window step() calls.
        """
        assert self.streams == 1 and not (self.lookahead or self.history
                                          ) and self._pending is None, (
            "run_windows drives a plain streams=1 session")
        import jax

        n = ori.shape[0]
        act = jnp.ones((1,), jnp.float32)
        nxt = (jax.device_put(np.ascontiguousarray(ori[0])[None]),
               jax.device_put(np.ascontiguousarray(acc[0])[None]))
        poses = []
        for k in range(n):
            cur = nxt
            out = self._fn(self.params3, cur[0], cur[1], *self._states,
                           act)
            if k + 1 < n:
                # H2D of k+1 overlaps the in-flight execute of k
                nxt = (jax.device_put(
                           np.ascontiguousarray(ori[k + 1])[None]),
                       jax.device_put(
                           np.ascontiguousarray(acc[k + 1])[None]))
            poses.append(np.asarray(out[0]))    # fetch fences k
            self._states = tuple(out[1:])
        return np.stack(poses)

    def step_async(self, ori_window: np.ndarray,
                   acc_window: np.ndarray) -> Optional[np.ndarray]:
        r"""Pipelined streaming: dispatch this window and return the
        PREVIOUS window's pose (None right after reset). Device execution
        of window k overlaps the host round-trip of window k-1's result —
        at the cost of ONE WINDOW of result latency. Relay measurements
        moved between rounds: r3 measured it slower than step() (56 vs
        38 ms/window); the round-4 profile (PROFILE_ASYNC.md) has it
        faster (36.1 vs 43.3) but still behind the latency-neutral
        upload-ahead :meth:`run_windows` (30.7) — prefer that when the
        next window is already known. Call :meth:`flush` after the last
        window."""
        assert not (self.lookahead or self.history), (
            "step_async (pipelined) does not compose with buffered "
            "lookahead/history emission; use step()")
        pose = self._dispatch(ori_window, acc_window)
        prev, self._pending = self._pending, pose
        return None if prev is None else np.asarray(prev)

    def flush(self, stream: Optional[int] = None):
        r"""Drain buffered results at end of stream. Pipelined mode: the
        last dispatched result. Lookahead/history mode: emit each slot's
        un-emitted tail (the newest ≤ K windows) as ONE continuous
        chunk — exactly an offline cascade pass over the slot's whole
        buffer from the carried state, so every tail window sees all
        remaining future context AND the buffered past context (for
        P=0, K=1 this equals plain windowing's final window). The
        carried state advances to the end of the stream either way —
        with history but no lookahead the tail is empty (everything
        already emitted) and flush only re-synchronizes the state, so a
        caller may keep stepping afterwards. ``stream=i`` flushes only
        slot i (its tail frames returned, other slots untouched);
        otherwise all slots flush: returns the single slot's [u·W, ...]
        tail frames (or None) for streams=1, else a per-slot list (None
        for empty tails)."""
        if self.lookahead or self.history:
            return self._flush_buffered(stream)
        prev, self._pending = self._pending, None
        return None if prev is None else np.asarray(prev)

    def _flush_buffered(self, stream: Optional[int]):
        S, W = self.streams, self.window
        K, P = self.lookahead, self.history
        sel = [stream] if stream is not None else list(range(S))
        fills = [len(self._buffers[i]) if i in sel else 0
                 for i in range(S)]
        if not any(fills):
            return None if (S == 1 or stream is not None) else [None] * S
        Tc = (P + K + 1) * W
        ctx_o = np.zeros((S, Tc, 54), np.float32)
        ctx_a = np.zeros((S, Tc, 18), np.float32)
        # ones-prefix per-frame mask: slot i's f·W buffered frames are
        # real, the rest padding (distinct jit specialization from the
        # scalar-active programs — compiled only if flush is used)
        mask = np.zeros((S, Tc), np.float32)
        for i in sel:
            if fills[i]:
                ctx_o[i, :fills[i] * W] = np.concatenate(
                    [o for o, _ in self._buffers[i]])
                ctx_a[i, :fills[i] * W] = np.concatenate(
                    [a for _, a in self._buffers[i]])
                mask[i, :fills[i] * W] = 1.0
        # one pass over each slot's whole buffer: emits the un-emitted
        # tail (with its history context leading it) AND advances the
        # state through every buffered window — including history
        # windows the state had not yet moved through (masked steps
        # carry non-flushed slots unchanged)
        out = self._fn(self.params3, jnp.asarray(ctx_o),
                       jnp.asarray(ctx_a), *self._states,
                       jnp.asarray(mask))
        # transactional: fetch (fences device execution) BEFORE
        # committing the state/buffers, so a failed pass leaves the
        # session consistent for a retry (serving catches and survives)
        full = np.asarray(out[0].reshape((S, Tc) + out[0].shape[1:]))
        self._states = tuple(out[1:])
        for i in sel:   # buffers drop only once the fetched pass succeeded
            if fills[i]:
                self._buffers[i].clear()
        # un-emitted tail: everything but the newest K windows was
        # already emitted (a slot that never reached K+1 windows emitted
        # nothing, so its whole fill is tail)
        tails = []
        for i in range(S):
            u = fills[i] if fills[i] <= K else K
            tails.append(full[i, (fills[i] - u) * W:fills[i] * W]
                         if u else None)
        if stream is not None:
            return tails[stream]
        return tails[0] if S == 1 else tails


def make_dip_window_step(cfg: PoseNetConfig, model, stats):
    r"""Build the pure windowed SINGLE-NET step — the reference's DIP
    online mode (ref: net_aagc.py:1022-1031 ``forward(imu, rnn_state)``,
    evaluate_dip.py:60-84 input prep) as one jittable program:
    ``step(params, ori, acc, state, active) -> (pose, state)`` takes one
    raw IMU window (ori [S, T_w, 54], acc [S, T_w, 18]), drops the root
    sensor's channels, normalizes with the train stats, runs the net with
    carried state, and converts the reduced global rotations to the full
    local pose via IK — the same output contract (stream-major flattened
    [S·T_w, 24, 3, 3]) as :func:`make_window_step`, so the whole serving
    stack (batcher, buffered emission, flush) runs unchanged on top."""
    assert cfg.rotsize in (6, 9), (
        "dip online serving emits full local poses via IK; train the net "
        "with --rotsize 9 or 6 (ref: net_aagc.py:1060-1075)")
    om = jnp.asarray(stats["ori_mean_channel"][..., :-9])
    os_ = jnp.asarray(stats["ori_std_channel"][..., :-9])
    am = jnp.asarray(stats["acc_mean_channel"][..., :-3])
    as_ = jnp.asarray(stats["acc_std_channel"][..., :-3])
    rotsize = cfg.rotsize
    rep = (3, 3) if rotsize == 9 else (rotsize,)

    def _step(params, ori, acc, state, active):
        o = (ori[..., :-9] - om) / os_          # no-root trim + normalize
        a = (acc[..., :-3] - am) / as_          # (ref: evaluate_dip.py:69)
        x = jnp.concatenate((a, o), axis=-1)    # [S, T_w, 60]
        B, T = x.shape[0], x.shape[1]
        mask = (active if active.ndim == 2
                else jnp.broadcast_to(active[:, None], (B, T))
                ).astype(x.dtype)
        out, state = pose_net_forward(params, cfg, x, state,
                                      frame_mask=mask)
        pose = reduced_global_to_full_local(
            out.reshape((-1, JS.n_reduced) + rep), model, rotsize=rotsize)
        return pose, state

    return _step


class DipStreamingSession(StreamingCascade):
    r"""Online single-net DIP serving with the FULL serving contract of
    :class:`StreamingCascade` — ``step(ori, acc, active)`` on raw IMU
    windows returning full local poses, ``reset(stream=i)``,
    ``lookahead``/``history`` buffered emission, ``flush``, pipelined
    ``step_async`` — over ONE net with one carried state (the
    reference's dip online mode, ref: net_aagc.py:1022-1031, which only
    ever runs one stream in-process with no quality levers). This is
    what ``cli serve --model dip`` / ``cli stream --model dip`` drive;
    the HTTP batcher is byte-identical to the cascade server's.

    ``params3`` is inherited as the hot-swappable parameter slot (the
    serve reload path assigns it); here it holds the ONE net's params.

    Multi-chip ``mesh`` is deliberately not offered: the dip net is
    KB-scale with independent per-slot state — scale out by replication
    (docs/PERFORMANCE.md)."""

    def __init__(self, params, cfg: PoseNetConfig, model,
                 window: int = 60, stats: Dict[str, np.ndarray] = None,
                 streams: int = 1, lookahead: int = 0, history: int = 0,
                 fused: bool = True):
        assert stats is not None, "dip serving needs normalization stats"
        assert not cfg.is_graph, (
            "DipStreamingSession drives the dense single net; graph "
            "cascades stream through StreamingCascade")
        self.cfg = cfg
        self.stats = {k: jnp.asarray(v) for k, v in stats.items()}
        from a3gc_tpu.models import nets as _N
        zero_states = (_N.dip_zero_state(cfg.net, streams),)
        step = make_dip_window_step(cfg, model, stats)
        self._init_session(params, step, zero_states, window, streams,
                           lookahead, history, mesh=None, fused=fused)


def streaming_predictions(session: StreamingCascade, ori: np.ndarray,
                          acc: np.ndarray) -> np.ndarray:
    r"""Run ONE full sequence through a ``streams=1`` session exactly as a
    live client would — window-by-window :meth:`StreamingCascade.step`
    calls plus a final :meth:`StreamingCascade.flush` — and reassemble the
    emissions into the full-length prediction [T, 24, 3, 3].

    Tail policy (a deployment has one too): a final partial window is
    padded by repeating the last frame (sensor-hold — what a client whose
    stream ends mid-window effectively submits), and the padded frames'
    emissions are discarded. The session is reset before and left reset
    after, so one session serves many sequences with a single compile.

    This is the measurement primitive behind
    :meth:`a3gc_tpu.eval.run.CascadeEvaluator.evaluate_streaming` (the
    published-protocol metric table under streaming; the reference's
    online mode, ref: net_aagc.py:802-812, has no such quantitative
    harness).
    """
    assert session.streams == 1, "streaming_predictions drives one slot"
    W = session.window
    ori = np.asarray(ori, np.float32).reshape(-1, 54)
    acc = np.asarray(acc, np.float32).reshape(-1, 18)
    T = ori.shape[0]
    rem = (-T) % W
    if rem:
        ori = np.concatenate([ori, np.repeat(ori[-1:], rem, axis=0)])
        acc = np.concatenate([acc, np.repeat(acc[-1:], rem, axis=0)])
    session.reset()
    out = []
    if not (session.lookahead or session.history):
        # plain windowing: the whole sequence is known, so upload-ahead
        # overlap applies (-29% per-window wall through the relay;
        # results identical to the step loop -- oracle-tested)
        n = (T + rem) // W
        poses = session.run_windows(ori.reshape(n, W, 54),
                                    acc.reshape(n, W, 18))
        out = [p for p in poses]
    else:
        for t in range(0, T + rem, W):
            pose = session.step(ori[t:t + W], acc[t:t + W])
            if pose is not None:
                out.append(np.asarray(pose))
        if session.lookahead:
            tail = session.flush()
            if tail is not None:
                out.append(np.asarray(tail))
    session.reset()
    pred = np.concatenate(out)
    assert pred.shape[0] == T + rem
    return pred[:T]


def streaming_predictions_multi(session: StreamingCascade,
                                sequences) -> list:
    r"""Multiplex MANY sequences over one ``streams=S`` session — the
    batched counterpart of :func:`streaming_predictions`, with identical
    per-sequence semantics (window-by-window feed, sensor-hold tail
    padding, per-slot lookahead flush). Each device tick serves up to S
    sequences' next windows in one dispatch (the chunked multi-stream
    kernel), so wall time drops ~S× on a dispatch-bound link while the
    per-sequence outputs stay equal to the single-slot path
    (oracle-tested) — ragged lengths are handled by per-slot ``active``
    masking, finished slots are reset and recycled onto the next
    pending sequence (the serving primitives of ref: net_aagc.py:802-812's
    online mode, which the reference only ever runs one sequence at a
    time).

    :param sequences: list of ``(ori [T,54], acc [T,18])`` pairs (any
        reshapeable layout); lengths may differ.
    :return: list of [T, 24, 3, 3] predictions, same order.
    """
    S, W = session.streams, session.window
    if S == 1:
        return [streaming_predictions(session, o, a) for o, a in sequences]
    prepped = []
    for ori, acc in sequences:
        ori = np.asarray(ori, np.float32).reshape(-1, 54)
        acc = np.asarray(acc, np.float32).reshape(-1, 18)
        T = ori.shape[0]
        rem = (-T) % W
        if rem:
            ori = np.concatenate([ori, np.repeat(ori[-1:], rem, axis=0)])
            acc = np.concatenate([acc, np.repeat(acc[-1:], rem, axis=0)])
        prepped.append((ori, acc, T, (T + rem) // W))
    n = len(prepped)
    preds: list = [None] * n
    outs = [[] for _ in range(n)]
    session.reset()
    buffered = bool(session.lookahead or session.history)
    slot_seq = [-1] * S            # sequence a slot is running (-1 free)
    cursor = [0] * S               # that sequence's next window index
    next_seq, live = 0, 0
    while next_seq < n or live:
        for i in range(S):         # recycle freed slots onto pending work
            if slot_seq[i] < 0 and next_seq < n:
                slot_seq[i], cursor[i] = next_seq, 0
                next_seq += 1
                live += 1
        act = np.zeros((S,), np.float32)
        ori_b = np.zeros((S, W, 54), np.float32)
        acc_b = np.zeros((S, W, 18), np.float32)
        for i in range(S):
            si = slot_seq[i]
            if si >= 0 and cursor[i] < prepped[si][3]:
                o, a = prepped[si][:2]
                t0 = cursor[i] * W
                ori_b[i], acc_b[i] = o[t0:t0 + W], a[t0:t0 + W]
                act[i] = 1.0
        if act.any():
            out = session.step(ori_b, acc_b, active=act)
            if buffered:
                pose, emitted = out
            else:
                pose, emitted = np.asarray(out), act.astype(bool)
            for i in range(S):
                if emitted[i]:
                    outs[slot_seq[i]].append(np.asarray(pose[i]))
                if act[i]:
                    cursor[i] += 1
        for i in range(S):         # retire slots whose feed is exhausted
            si = slot_seq[i]
            if si >= 0 and cursor[i] >= prepped[si][3]:
                if session.lookahead:
                    tail = session.flush(stream=i)
                    if tail is not None:
                        outs[si].append(np.asarray(tail))
                _, _, T, nw = prepped[si]
                pred = np.concatenate(outs[si])
                assert pred.shape[0] == nw * W
                preds[si] = pred[:T]
                outs[si] = []
                session.reset(stream=i)
                slot_seq[i] = -1
                live -= 1
    session.reset()
    return preds


def streaming_outputs(session: StreamingSession, x: np.ndarray) -> np.ndarray:
    r"""Run ONE full sequence through a ``streams=1``
    :class:`StreamingSession` exactly as a live client would — the
    single-net counterpart of :func:`streaming_predictions` (the
    reference's per-net online mode, ref: net_aagc.py:802-812, fed
    incrementally), with the identical sensor-hold tail policy: a final
    partial window is padded by repeating the last frame and the padded
    frames' outputs discarded. The session is reset before and after.

    :param x: the net's input sequence [T, ...feature dims] (already
        prepped — e.g. the DIP no-root normalized 60-channel vector).
    :return: the net's output sequence [T, ...output dims].
    """
    assert session.streams == 1, "streaming_outputs drives one slot"
    W = session.window
    x = np.asarray(x, np.float32)
    T = x.shape[0]
    rem = (-T) % W
    if rem:
        x = np.concatenate([x, np.repeat(x[-1:], rem, axis=0)])
    session.reset()
    out = []
    for t in range(0, T + rem, W):
        o = session.step(x[t:t + W])
        if o is not None:
            out.append(np.asarray(o))
    if session.lookahead:
        tail = session.flush()
        if tail is not None:
            out.append(np.asarray(tail))
    session.reset()
    pred = np.concatenate(out)
    assert pred.shape[0] == T + rem
    return pred[:T]


def streaming_outputs_multi(session: StreamingSession, sequences) -> list:
    r"""Multiplex MANY sequences over one ``streams=S`` single-net
    session — the single-net counterpart of
    :func:`streaming_predictions_multi`, with identical per-sequence
    semantics: window-by-window feed, sensor-hold tail padding, per-slot
    lookahead flush, and slot RECYCLING — ragged lengths are handled by
    per-slot ``active`` masking, and a finished slot is reset and
    immediately re-used for the next pending sequence, so slot occupancy
    stays high on ragged test sets (the same recycle loop as the graph
    cascade path).

    :param sequences: list of input sequences [T, ...]; lengths may
        differ.
    :return: list of [T, ...output dims] outputs, same order.
    """
    S, W = session.streams, session.window
    if S == 1:
        return [streaming_outputs(session, x) for x in sequences]
    if not sequences:
        return []
    prepped = []
    for x in sequences:
        x = np.asarray(x, np.float32)
        T = x.shape[0]
        rem = (-T) % W
        if rem:
            x = np.concatenate([x, np.repeat(x[-1:], rem, axis=0)])
        prepped.append((x, T, (T + rem) // W))
    feat = prepped[0][0].shape[1:]
    n = len(prepped)
    preds: list = [None] * n
    outs = [[] for _ in range(n)]
    session.reset()
    buffered = bool(session.lookahead or session.history)
    slot_seq = [-1] * S            # sequence a slot is running (-1 free)
    cursor = [0] * S               # that sequence's next window index
    next_seq, live = 0, 0
    while next_seq < n or live:
        for i in range(S):         # recycle freed slots onto pending work
            if slot_seq[i] < 0 and next_seq < n:
                slot_seq[i], cursor[i] = next_seq, 0
                next_seq += 1
                live += 1
        act = np.zeros((S,), np.float32)
        x_b = np.zeros((S, W) + feat, np.float32)
        for i in range(S):
            si = slot_seq[i]
            if si >= 0 and cursor[i] < prepped[si][2]:
                t0 = cursor[i] * W
                x_b[i] = prepped[si][0][t0:t0 + W]
                act[i] = 1.0
        if act.any():
            out = session.step(x_b, active=act)
            if buffered:
                o, emitted = out
            else:
                o, emitted = np.asarray(out), act.astype(bool)
            for i in range(S):
                if emitted[i]:
                    outs[slot_seq[i]].append(np.asarray(o[i]))
                if act[i]:
                    cursor[i] += 1
        for i in range(S):         # retire slots whose feed is exhausted
            si = slot_seq[i]
            if si >= 0 and cursor[i] >= prepped[si][2]:
                if session.lookahead:
                    tail = session.flush(stream=i)
                    if tail is not None:
                        outs[si].append(np.asarray(tail))
                x, T, nw = prepped[si]
                pred = np.concatenate(outs[si])
                assert pred.shape[0] == nw * W
                preds[si] = pred[:T]
                outs[si] = []
                session.reset(stream=i)
                slot_seq[i] = -1
                live -= 1
    session.reset()
    return preds
