r"""Recurrent layer wrappers: scan-based uni/bi-directional graph RNNs.

Capability parity with the direction/layer wrappers in ``net_aagc.py``
(ref: net_aagc.py:370-592 — AAGC_LSTM / ReverseAAGC_LSTM / BiAAGC_LSTM and the
A3GC / AGC / G_GRU copies), redesigned for XLA:

  * the reference unrolls a TorchScript Python loop over timesteps
    (ref: net_aagc.py:381-385); here one ``lax.scan`` compiles the whole
    sequence into a single fused while-loop on device;
  * forward and reverse directions carry independent parameters; instead of
    running two sequential scans, both directions' parameters are stacked on a
    leading axis and ``jax.vmap`` runs them as ONE scan with doubled batch —
    XLA batches the gate matmuls across directions, halving kernel launches
    and keeping the MXU fed at small batch sizes;
  * the reverse direction consumes the time-flipped sequence and its outputs
    are flipped back, exactly matching the reference's semantics
    (ref: net_aagc.py:393-400: reverse iterates T-1..0 then re-reverses).

Input layout is batch-major [B, T, N, F] at the API (like the reference's
``batch_first`` entry, ref: net_aagc.py:414) and time-major inside the scan.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

__all__ = ["stack_directions", "bi_rnn", "uni_rnn"]


def stack_directions(fwd_params, bwd_params):
    """Stack two identically-shaped parameter pytrees on a new leading axis."""
    return jax.tree_util.tree_map(
        lambda a, b: jnp.stack((a, b)), fwd_params, bwd_params)


def _masked_state(new_state, old_state, m_t: jnp.ndarray):
    """Carry the old state through masked-out (padding) steps. m_t [B]."""
    def sel(a, b):
        m = m_t.reshape((m_t.shape[0],) + (1,) * (a.ndim - 1))
        return jnp.where(m, a, b)

    return jax.tree_util.tree_map(sel, new_state, old_state)


def _scan_rnn(step_fn: Callable, params, x_tm: jnp.ndarray, init_state,
              rng: Optional[jax.Array], mask_tm: Optional[jnp.ndarray] = None,
              **step_kwargs):
    """Scan a cell over a time-major sequence [T, B, N, F].

    ``mask_tm`` [T, B] marks valid frames; on masked-out steps the carried
    state passes through unchanged, which makes end-padded sequences exactly
    equivalent to native-length processing — essential for the *backward*
    direction of bidirectional layers, whose scan would otherwise contaminate
    its state on padding before reaching real frames.
    """
    T = x_tm.shape[0]
    keys = jax.random.split(rng, T) if rng is not None else None

    def body(carry, inp):
        x_t, k, m_t = inp
        if k is not None:
            out, new = step_fn(params, x_t, carry, rng=k, **step_kwargs)
        else:
            out, new = step_fn(params, x_t, carry, **step_kwargs)
        if m_t is not None:
            new = _masked_state(new, carry, m_t)
        return new, out

    final, outs = jax.lax.scan(body, init_state, (x_tm, keys, mask_tm))
    return outs, final


def uni_rnn(step_fn: Callable, params, x: jnp.ndarray, init_state,
            rng: Optional[jax.Array] = None, reverse: bool = False,
            frame_mask: Optional[jnp.ndarray] = None,
            **step_kwargs):
    r"""Unidirectional recurrent layer over [B, T, N, F]
    (ref: net_aagc.py:370-400). ``frame_mask`` [B, T] marks valid frames for
    end-padded input. Returns ([B, T, N, H], final_state)."""
    x_tm = jnp.swapaxes(x, 0, 1)
    mask_tm = None if frame_mask is None else jnp.swapaxes(frame_mask, 0, 1)
    if reverse:
        x_tm = x_tm[::-1]
        mask_tm = None if mask_tm is None else mask_tm[::-1]
    outs, final = _scan_rnn(step_fn, params, x_tm, init_state, rng,
                            mask_tm=mask_tm, **step_kwargs)
    if reverse:
        outs = outs[::-1]
    return jnp.swapaxes(outs, 0, 1), final


def bi_rnn(step_fn: Callable, params2, x: jnp.ndarray, init_state2,
           rng: Optional[jax.Array] = None,
           frame_mask: Optional[jnp.ndarray] = None,
           **step_kwargs):
    r"""Bidirectional recurrent layer (ref: net_aagc.py:402-424).

    :param params2: cell parameter pytree with leading axis 2 = [fwd, bwd].
    :param x: [B, T, N, F].
    :param init_state2: state pytree with leading axis 2 (e.g. (h, c) each
        [2, B, N, H]).
    :param frame_mask: [B, T] validity mask for end-padded sequences; masked
        steps carry state through, so the backward scan starts its real work
        at each sequence's true last frame (native-length equivalence).
    :return: ([B, T, N, 2H] fwd‖bwd concat, final state pytree [2, ...]).
    """
    x_tm = jnp.swapaxes(x, 0, 1)                       # [T,B,N,F]
    x_stack = jnp.stack((x_tm, x_tm[::-1]))            # [2,T,B,N,F]
    if frame_mask is None:
        mask_stack = None
    else:
        mask_tm = jnp.swapaxes(frame_mask, 0, 1)       # [T,B]
        mask_stack = jnp.stack((mask_tm, mask_tm[::-1]))

    def run(p, xseq, st, key, mseq):
        return _scan_rnn(step_fn, p, xseq, st, key, mask_tm=mseq,
                         **step_kwargs)

    rngs = jax.random.split(rng, 2) if rng is not None else None
    outs, finals = jax.vmap(run)(params2, x_stack, init_state2, rngs,
                                 mask_stack)

    y = jnp.concatenate((outs[0], outs[1][::-1]), axis=-1)  # [T,B,N,2H]
    return jnp.swapaxes(y, 0, 1), finals


def bi_rnn_precomputed(step_fn: Callable, params2, seq_stack: jnp.ndarray,
                       init_state2,
                       rng: Optional[jax.Array] = None,
                       frame_mask: Optional[jnp.ndarray] = None,
                       **step_kwargs):
    r"""Bidirectional layer over direction-specific precomputed inputs.

    Like :func:`bi_rnn`, but the per-timestep inputs differ per direction
    (e.g. hoisted input projections u = x·W_x with direction-specific W_x):

    :param seq_stack: [2, T, B, ...] — direction 1's sequence must already be
        time-flipped.
    :param rng: per-step keys for in-scan (recurrent) dropout.
    """
    if frame_mask is None:
        mask_stack = None
    else:
        mask_tm = jnp.swapaxes(frame_mask, 0, 1)
        mask_stack = jnp.stack((mask_tm, mask_tm[::-1]))

    rngs = jax.random.split(rng, 2) if rng is not None else None

    def run(p, useq, st, key, mseq):
        return _scan_rnn(step_fn, p, useq, st, key, mask_tm=mseq,
                         **step_kwargs)

    outs, finals = jax.vmap(run)(params2, seq_stack, init_state2, rngs,
                                 mask_stack)
    y = jnp.concatenate((outs[0], outs[1][::-1]), axis=-1)
    return jnp.swapaxes(y, 0, 1), finals

