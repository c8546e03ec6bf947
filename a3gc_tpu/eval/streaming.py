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

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from a3gc_tpu.config import joint_set as JS
from a3gc_tpu.models.pipeline import (
    CascadeConfig, PoseNetConfig, pose_net_forward,
    reduced_global_to_full_local,
)

__all__ = ["StreamingSession", "StreamingCascade", "make_window_step"]


def make_window_step(cfg: CascadeConfig, model, stats=None):
    r"""Build the pure windowed-cascade step function.

    Returns ``step(params3, ori, acc, s1, s2, s3, active) -> (pose, s1,
    s2, s3)``: one fixed-size window of raw IMU frames (ori [S, T_w, 54],
    acc [S, T_w, 18]) through normalize → scatter → the three stages → IK
    (ref: evaluate_a3gc_tp.py:164-171 run incrementally, net_aagc.py:809-812),
    with each stage's recurrent state threading across windows. ``active``
    [S] 0/1 masks idle serving slots: their state carries through unchanged
    (their whole window is treated like padding), enabling dynamic batching.

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
        mask = jnp.broadcast_to(active[:, None], (B, T)).astype(imu.dtype)
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


class StreamingSession:
    r"""Stateful streaming wrapper over one pipeline stage.

    >>> sess = StreamingSession(params, cfg, window=60)
    >>> for imu_window in stream:           # [window, ...feature dims]
    ...     out = sess.step(imu_window)     # [window, ...output dims]
    >>> sess.reset()                        # next sequence
    """

    def __init__(self, params, cfg: PoseNetConfig, window: int = 60,
                 batch: int = 1):
        self.params = params
        self.cfg = cfg
        self.window = window
        self.batch = batch
        self._state = None

        @jax.jit
        def _step(params, x, state):
            return pose_net_forward(params, cfg, x, state)

        self._fn = _step

    def reset(self):
        r"""Clear the carried recurrent state (ref: net_aagc.py:802-807)."""
        self._state = None

    def step(self, imu_window: np.ndarray) -> np.ndarray:
        r"""Process one window [T_w, ...] (or [B, T_w, ...]); returns the
        stage output with the leading batch dim squeezed for B=1."""
        x = jnp.asarray(imu_window)
        squeeze = x.ndim == (3 if self.cfg.is_graph else 2)
        if squeeze:
            x = x[None]
        assert x.shape[1] == self.window, (
            f"window size {x.shape[1]} != configured {self.window}")
        out, self._state = self._fn(self.params, x, self._state)
        return np.asarray(out[0] if squeeze else out)


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
    """

    def __init__(self, params3: Tuple, cfg: CascadeConfig, model,
                 window: int = 60,
                 stats: Optional[Dict[str, np.ndarray]] = None,
                 normalize: bool = False, streams: int = 1,
                 lookahead: bool = False):
        self.params3 = params3
        self.cfg = cfg
        self.window = window
        self.streams = streams
        self.lookahead = lookahead
        self._la_prev = None        # previous window awaiting emission
        self.stats = ({k: jnp.asarray(v) for k, v in stats.items()}
                      if (normalize and stats is not None) else None)
        # explicit zero states (not None) so the program compiles ONCE: the
        # state pytree structure is identical on the first and later windows
        from a3gc_tpu.models import nets as _N
        zero = (_N.graph_net_zero_state if cfg.is_graph
                else _N.dip_zero_state)
        self._zero_states = tuple(
            zero(c.net, streams)
            for c in (cfg.stage1, cfg.stage2, cfg.stage3))
        self._states = self._zero_states
        self._pending = None
        self._fn = jax.jit(make_window_step(cfg, model, self.stats))

    def reset(self, stream: Optional[int] = None):
        r"""Clear carried stage states (ref: evaluate_a3gc_tp.py:165).

        ``stream=i`` zeroes only client i's slice of every state array
        (batch axis 1 in both the graph [2, S, N, H] and DIP [2, S, H]
        layouts) — the serving primitive for one client ending its
        sequence while the other S-1 continue."""
        if stream is None:
            self._states = self._zero_states
        else:
            assert not self.lookahead, (
                "per-stream reset is incompatible with lookahead: the "
                "buffered previous window still holds the old client's "
                "frames; reset() the whole session instead")
            self._states = jax.tree_util.tree_map(
                lambda s: s.at[:, stream].set(0.0), self._states)
        self._pending = None
        self._la_prev = None

    def _dispatch(self, ori_window, acc_window, active=None):
        S = self.streams
        ori = jnp.asarray(ori_window).reshape(S, -1, 54)
        acc = jnp.asarray(acc_window).reshape(S, -1, 18)
        assert ori.shape[1] == self.window, (
            f"window size {ori.shape[1]} != configured {self.window}")
        act = (jnp.ones((S,), jnp.float32) if active is None
               else jnp.asarray(active, jnp.float32).reshape(S))
        s1, s2, s3 = self._states
        pose, s1, s2, s3 = self._fn(self.params3, ori, acc, s1, s2, s3, act)
        self._states = (s1, s2, s3)
        if S > 1:
            pose = pose.reshape((S, -1) + pose.shape[1:])
        return pose

    def step(self, ori_window: np.ndarray, acc_window: np.ndarray,
             active=None) -> np.ndarray:
        r"""Process one window; returns full local pose [T_w, 24, 3, 3]
        (streams=1) or [S, T_w, 24, 3, 3]. ``active`` [S] 0/1 marks which
        clients submitted this tick — idle slots' state is untouched and
        their output slice is garbage (dynamic batching).

        With ``lookahead=True`` the emission lags ONE window: step(k)
        returns window k-1's pose (None on the first call) computed with
        window k as backward-direction context — see
        :meth:`_step_lookahead`. Call :meth:`flush` after the last window.
        """
        if self.lookahead:
            assert active is None, (
                "lookahead buffers whole windows; per-tick activity "
                "masking (dynamic batching) is not supported with it")
            return self._step_lookahead(ori_window, acc_window)
        return np.asarray(self._dispatch(ori_window, acc_window, active))

    def _step_lookahead(self, ori_window, acc_window):
        r"""One-window-lookahead emission: window k-1's pose is computed
        by running the cascade over frames [k-1, k+1) from the carried
        state, keeping the first T_w outputs — the backward direction of
        every bidirectional layer sees a full extra window of future
        context (2·T_w total), cutting streaming-vs-offline divergence.
        The carried state still advances through window k-1 alone (a
        second, plain pass), so state threading is IDENTICAL to plain
        windowing — lookahead changes emissions only. Cost: ~3× the
        per-window compute; latency: +1 window. The reference's online
        mode has no counterpart (its windows never see future frames,
        ref: net_aagc.py:809-812)."""
        S, W = self.streams, self.window
        ori = jnp.asarray(ori_window).reshape(S, -1, 54)
        acc = jnp.asarray(acc_window).reshape(S, -1, 18)
        assert ori.shape[1] == W, (
            f"window size {ori.shape[1]} != configured {W}")
        if self._la_prev is None:
            self._la_prev = (ori, acc)
            return None
        p_ori, p_acc = self._la_prev
        act = jnp.ones((S,), jnp.float32)
        s1, s2, s3 = self._states            # state at start of prev window
        # emission pass over [prev ‖ cur] (2W — its own jit specialization)
        pose, _, _, _ = self._fn(
            self.params3, jnp.concatenate((p_ori, ori), axis=1),
            jnp.concatenate((p_acc, acc), axis=1), s1, s2, s3, act)
        # advance pass over prev alone: carried state for the next tick
        _, s1, s2, s3 = self._fn(self.params3, p_ori, p_acc, s1, s2, s3,
                                 act)
        self._states = (s1, s2, s3)
        self._la_prev = (ori, acc)
        pose = pose.reshape((S, 2 * W) + pose.shape[1:])[:, :W]
        return np.asarray(pose[0] if S == 1 else pose)

    def step_async(self, ori_window: np.ndarray,
                   acc_window: np.ndarray) -> Optional[np.ndarray]:
        r"""Pipelined streaming: dispatch this window and return the
        PREVIOUS window's pose (None right after reset). Device execution
        of window k overlaps the host round-trip of window k-1's result —
        intended for directly-attached devices where the D2H transfer can
        overlap compute. NOTE measured through this environment's remote
        TPU relay it is SLOWER than :meth:`step` (56 vs 38 ms/window — the
        in-flight execute and transfer RPCs contend on the tunnel); prefer
        synchronous :meth:`step` there. Call :meth:`flush` after the last
        window."""
        assert not self.lookahead, (
            "step_async (pipelined) and lookahead both lag one window; "
            "use step() with lookahead=True")
        pose = self._dispatch(ori_window, acc_window)
        prev, self._pending = self._pending, pose
        return None if prev is None else np.asarray(prev)

    def flush(self) -> Optional[np.ndarray]:
        r"""Return the final window's pose. Pipelined mode: the last
        dispatched result. Lookahead mode: the buffered last window,
        emitted without future context (the stream ended — identical to
        what plain windowing produces for a final window)."""
        if self.lookahead:
            if self._la_prev is None:
                return None
            p_ori, p_acc = self._la_prev
            self._la_prev = None
            return np.asarray(self._dispatch(p_ori, p_acc))
        prev, self._pending = self._pending, None
        return None if prev is None else np.asarray(prev)
