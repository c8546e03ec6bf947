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

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from a3gc_tpu.models.pipeline import PoseNetConfig, pose_net_forward

__all__ = ["StreamingSession"]


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
