r"""Pallas TPU kernel: the full graph-LSTM scan in ONE kernel launch.

The hot loop of every graph model is the per-timestep cell (SURVEY.md §3.4):
at batch 1 the gate matmul is [15, H] × [H, 4H] — far too small to amortize
per-step XLA op dispatch, which dominates the lax.scan implementation. This
kernel runs the ENTIRE sequence scan inside one ``pallas_call``:

  * grid = (T,): one grid step per frame, executed sequentially on the core;
  * the recurrent state (h, c) lives in VMEM **scratch that persists across
    grid steps** — it never touches HBM;
  * all weights (recurrent kernel, per-gate adjacency, attention) are small
    enough to stay VMEM-resident for the whole scan;
  * the input projection u_t = x_t·W_x is hoisted outside (one large MXU
    matmul over all frames) and streamed in per-step via the automatic
    Pallas pipeline (double-buffered HBM→VMEM DMA);
  * the reverse direction reuses the same kernel with a flipped index map —
    no data movement;
  * end-padding is handled exactly like layers._masked_state: state updates
    are suppressed for frames ≥ n_valid (scalar-prefetched), so bucketed
    evaluation remains native-length exact.

Numerics match cells.gcn_lstm_step_hoisted: same op order, fp32.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from a3gc_tpu.models.cells import GCNLSTMCellParams

__all__ = ["gcn_lstm_scan_pallas", "bi_gcn_lstm_pallas"]


def _kernel(nvalid_ref,                       # scalar prefetch [1]
            u_ref,                            # [U, N, 4H] per-block input proj
            wh_ref,                           # [H, 4H]
            adj_ref,                          # [4, N, N]
            bias_ref,                         # [4, H]
            h0_ref, c0_ref,                   # [N, H] initial state
            aw_ref, awq_ref, awh_ref,         # [H, H] attention mats
            au_ref,                           # [H, 1]
            abs_ref,                          # [1, H]
            abu_ref,                          # [N, 1]
            out_ref,                          # [U, N, H]
            hfin_ref, cfin_ref,               # [N, H] final state
            h_scr, c_scr,                     # VMEM scratch [N, H]
            *, T: int, H: int, U: int, reverse: bool, attention: bool,
            out_tanh: bool):
    t = pl.program_id(0)
    n_blocks = T // U

    @pl.when(t == 0)
    def _init():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    h = h_scr[:]
    c = c_scr[:]
    hi = jax.lax.Precision.HIGHEST

    # U frames per grid step (statically unrolled) to amortize grid/DMA
    # bookkeeping over multiple tiny recurrent steps
    for uu in range(U):
        step = (U - 1 - uu) if reverse else uu            # in-block order
        # z = u_t + h @ W_h        [N, 4H]
        z = u_ref[step] + jnp.dot(h, wh_ref[:],
                                  preferred_element_type=jnp.float32,
                                  precision=hi)

        # per-gate graph mix + bias + nonlinearity, gate order i,f,g,o
        def gate(g):
            zg = z[:, g * H:(g + 1) * H]                  # [N, H]
            return jnp.dot(adj_ref[g], zg,
                           preferred_element_type=jnp.float32,
                           precision=hi) + bias_ref[g]

        i = jax.nn.sigmoid(gate(0))
        f = jax.nn.sigmoid(gate(1))
        g_ = jnp.tanh(gate(2))
        o = jax.nn.sigmoid(gate(3))
        c_new = f * c + i * g_
        hy = o * jnp.tanh(c_new)

        if attention:
            q = jax.nn.relu(jnp.sum(
                jnp.dot(hy, aw_ref[:], preferred_element_type=jnp.float32,
                        precision=hi),
                axis=0, keepdims=True))                    # [1, H]
            s = jnp.tanh(
                jnp.dot(hy, awh_ref[:], preferred_element_type=jnp.float32,
                        precision=hi)
                + jnp.dot(q, awq_ref[:], preferred_element_type=jnp.float32,
                          precision=hi)
                + abs_ref[0])                              # [N, H]
            a = jnp.dot(s, au_ref[:], preferred_element_type=jnp.float32,
                        precision=hi) + abu_ref[:]         # [N,1]
            hy = hy + hy * jax.nn.sigmoid(a)

        # masked state carry: frames >= n_valid keep the old state
        if reverse:
            frame = T - 1 - (t * U + uu)
        else:
            frame = t * U + uu
        valid = frame < nvalid_ref[0]
        h = jnp.where(valid, hy, h)
        c = jnp.where(valid, c_new, c)
        out_ref[step] = jnp.tanh(h) if out_tanh else h

    h_scr[:] = h
    c_scr[:] = c

    @pl.when(t == n_blocks - 1)
    def _fin():
        hfin_ref[:] = h
        cfin_ref[:] = c


def gcn_lstm_scan_pallas(p: GCNLSTMCellParams, u: jnp.ndarray,
                         h0: jnp.ndarray, c0: jnp.ndarray, *,
                         reverse: bool = False,
                         n_valid: Optional[jnp.ndarray] = None,
                         out_tanh: bool = True,
                         interpret: bool = False):
    r"""Scan one direction of a graph-LSTM layer over a whole sequence.

    :param u: hoisted input projections [T, N, 4H] (= x·W_x, in FORWARD frame
        order; the kernel itself reverses its walk when ``reverse``).
    :param h0, c0: initial state [N, H].
    :param n_valid: frames < n_valid are real; others carry state through.
    :return: (outputs [T, N, H] in forward frame order, (h_fin, c_fin)).
    """
    T, N, G = u.shape
    H = G // 4
    attention = p.attention is not None
    nvalid = jnp.asarray(
        [T if n_valid is None else n_valid], jnp.int32)

    # unroll factor: pad T to a multiple (padding frames are masked anyway
    # for the forward walk; for the reverse walk they sit BEFORE the real
    # frames in walk order, so they must also be state-masked — which the
    # frame<n_valid test handles only if n_valid was given. When it was not,
    # nvalid = T already excludes pure padding.)
    # NOTE: U > 1 multiplies the Mosaic kernel body and sends remote
    # compilation times through the roof on this toolchain (observed: >9 min
    # for U=4 vs ~1 min for U=1) for a modest runtime win — keep U=1.
    U = 1

    att = p.attention
    if att is None:
        zeros_h = jnp.zeros((H, H), u.dtype)
        aw, awq, awh = zeros_h, zeros_h, zeros_h
        au = jnp.zeros((H, 1), u.dtype)
        abs_ = jnp.zeros((1, H), u.dtype)
        abu = jnp.zeros((N, 1), u.dtype)
    else:
        aw, awq, awh = att.w, att.wq, att.wh
        au = att.u
        abs_ = att.bs.reshape(1, H)
        abu = att.bu.reshape(N, 1)

    n_blocks = T // U
    # with scalar prefetch, index maps receive (grid ids..., scalar refs...)
    if reverse:
        u_index_map = lambda t, *_: (n_blocks - 1 - t, 0, 0)
    else:
        u_index_map = lambda t, *_: (t, 0, 0)

    vmem_full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((U, N, G), u_index_map, memory_space=pltpu.VMEM),
            vmem_full(),            # wh
            vmem_full(),            # adj
            vmem_full(),            # bias
            vmem_full(), vmem_full(),   # h0, c0
            vmem_full(), vmem_full(), vmem_full(),  # aw awq awh
            vmem_full(),            # au
            vmem_full(),            # abs
            vmem_full(),            # abu
        ],
        out_specs=[
            pl.BlockSpec((U, N, H), u_index_map, memory_space=pltpu.VMEM),
            vmem_full(), vmem_full(),
        ],
        scratch_shapes=[
            pltpu.VMEM((N, H), jnp.float32),
            pltpu.VMEM((N, H), jnp.float32),
        ],
    )

    kernel = functools.partial(_kernel, T=T, H=H, U=U, reverse=reverse,
                               attention=attention, out_tanh=out_tanh)
    wh = p.kernel[-H:, :]     # recurrent half of the fused kernel
    outs, hfin, cfin = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, N, H), jnp.float32),
            jax.ShapeDtypeStruct((N, H), jnp.float32),
            jax.ShapeDtypeStruct((N, H), jnp.float32),
        ],
        interpret=interpret,
    )(nvalid, u, wh, p.adj, p.bias, h0, c0, aw, awq, awh, au, abs_, abu)
    return outs, (hfin, cfin)


def _bi_kernel(nvalid_ref,
               uf_ref, ub_ref,                # [1, N, G] per-direction frames
               wh2_ref,                       # [2, H, G]
               adj2_ref,                      # [2, 4, N, N]
               bias2_ref,                     # [2, 4, H]
               h02_ref, c02_ref,              # [2, N, H]
               aw2_ref, awq2_ref, awh2_ref,   # [2, H, H]
               au2_ref,                       # [2, H, 1]
               abs2_ref,                      # [2, 1, H]
               abu2_ref,                      # [2, N, 1]
               outf_ref, outb_ref,            # [1, N, H]
               hfin_ref, cfin_ref,            # [2, N, H]
               h_scr, c_scr,                  # [2, N, H]
               *, T: int, H: int, attention: bool, out_tanh: bool):
    """Both directions in one grid step: direction 0 walks frame t forward,
    direction 1 walks frame T-1-t backward — independent work that shares
    the per-step grid/DMA overhead (the dominant cost at these tiny sizes)."""
    t = pl.program_id(0)
    hi = jax.lax.Precision.HIGHEST

    @pl.when(t == 0)
    def _init():
        h_scr[:] = h02_ref[:]
        c_scr[:] = c02_ref[:]

    for d, (u_ref, out_ref) in enumerate(((uf_ref, outf_ref),
                                          (ub_ref, outb_ref))):
        frame = t if d == 0 else T - 1 - t
        h = h_scr[d]
        c = c_scr[d]
        z = u_ref[0] + jnp.dot(h, wh2_ref[d],
                               preferred_element_type=jnp.float32,
                               precision=hi)

        def gate(g, z=z, d=d):
            zg = z[:, g * H:(g + 1) * H]
            return jnp.dot(adj2_ref[d, g], zg,
                           preferred_element_type=jnp.float32,
                           precision=hi) + bias2_ref[d, g]

        i = jax.nn.sigmoid(gate(0))
        f = jax.nn.sigmoid(gate(1))
        g_ = jnp.tanh(gate(2))
        o = jax.nn.sigmoid(gate(3))
        c_new = f * c + i * g_
        hy = o * jnp.tanh(c_new)

        if attention:
            q = jax.nn.relu(jnp.sum(
                jnp.dot(hy, aw2_ref[d], preferred_element_type=jnp.float32,
                        precision=hi), axis=0, keepdims=True))
            s = jnp.tanh(
                jnp.dot(hy, awh2_ref[d], preferred_element_type=jnp.float32,
                        precision=hi)
                + jnp.dot(q, awq2_ref[d],
                          preferred_element_type=jnp.float32, precision=hi)
                + abs2_ref[d])
            a = jnp.dot(s, au2_ref[d], preferred_element_type=jnp.float32,
                        precision=hi) + abu2_ref[d]
            hy = hy + hy * jax.nn.sigmoid(a)

        valid = frame < nvalid_ref[0]
        h = jnp.where(valid, hy, h)
        c = jnp.where(valid, c_new, c)
        h_scr[d] = h
        c_scr[d] = c
        out_ref[0] = jnp.tanh(h) if out_tanh else h

    @pl.when(t == T - 1)
    def _fin():
        hfin_ref[:] = h_scr[:]
        cfin_ref[:] = c_scr[:]


def bi_gcn_lstm_pallas(params2, x: jnp.ndarray, state2, *,
                       n_valid: Optional[jnp.ndarray] = None,
                       out_tanh: bool = True,
                       interpret: bool = False,
                       fused_directions: bool = False,
                       precision=jax.lax.Precision.HIGHEST):
    r"""Bidirectional graph-LSTM layer for batch 1, Pallas-scanned.

    Drop-in equivalent of layers.bi_rnn + cells.gcn_lstm_step (inference, no
    dropout) at B=1: x [1, T, N, F] → ([1, T, N, 2H], state2).
    ``state2``: (h, c) each [2, 1, N, H] (direction-stacked, like bi_rnn).
    ``fused_directions`` runs both directions in ONE kernel — numerically
    identical and ~shares per-step overhead, but the doubled Mosaic kernel
    body blows remote compilation past 10 minutes on this toolchain, so the
    default is two single-direction launches (compile ≈1 min each).
    """
    assert x.shape[0] == 1, "pallas path is specialized for batch 1"
    T, N = x.shape[1], x.shape[2]
    F = x.shape[3]
    h2, c2 = state2

    # hoisted input projection for both directions: one big MXU matmul
    u2 = jnp.einsum("tnf,dfg->dtng", x[0], params2.kernel[:, :F, :],
                    precision=precision)

    if not fused_directions:
        p_f = jax.tree_util.tree_map(lambda a: a[0], params2)
        p_b = jax.tree_util.tree_map(lambda a: a[1], params2)
        out_f, (hf, cf) = gcn_lstm_scan_pallas(
            p_f, u2[0], h2[0, 0], c2[0, 0], reverse=False, n_valid=n_valid,
            out_tanh=out_tanh, interpret=interpret)
        out_b, (hb, cb) = gcn_lstm_scan_pallas(
            p_b, u2[1], h2[1, 0], c2[1, 0], reverse=True, n_valid=n_valid,
            out_tanh=out_tanh, interpret=interpret)
        y = jnp.concatenate((out_f, out_b), axis=-1)[None]
        return y, (jnp.stack((hf, hb))[:, None], jnp.stack((cf, cb))[:, None])

    G = 4 * (params2.bias.shape[-1])
    H = params2.bias.shape[-1]
    attention = params2.attention is not None
    nvalid = jnp.asarray([T if n_valid is None else n_valid], jnp.int32)

    att = params2.attention
    if att is None:
        zeros = jnp.zeros((2, H, H), x.dtype)
        aw2, awq2, awh2 = zeros, zeros, zeros
        au2 = jnp.zeros((2, H, 1), x.dtype)
        abs2 = jnp.zeros((2, 1, H), x.dtype)
        abu2 = jnp.zeros((2, N, 1), x.dtype)
    else:
        aw2, awq2, awh2 = att.w, att.wq, att.wh
        au2 = att.u
        abs2 = att.bs.reshape(2, 1, H)
        abu2 = att.bu.reshape(2, N, 1)

    fwd_map = lambda t, *_: (t, 0, 0)
    bwd_map = lambda t, *_: (T - 1 - t, 0, 0)
    vmem_full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, N, G), fwd_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, G), bwd_map, memory_space=pltpu.VMEM),
            vmem_full(),                # wh2
            vmem_full(),                # adj2
            vmem_full(),                # bias2
            vmem_full(), vmem_full(),   # h02, c02
            vmem_full(), vmem_full(), vmem_full(),  # aw2 awq2 awh2
            vmem_full(), vmem_full(), vmem_full(),  # au2 abs2 abu2
        ],
        out_specs=[
            pl.BlockSpec((1, N, H), fwd_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, H), bwd_map, memory_space=pltpu.VMEM),
            vmem_full(), vmem_full(),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, N, H), jnp.float32),
            pltpu.VMEM((2, N, H), jnp.float32),
        ],
    )
    kernel = functools.partial(_bi_kernel, T=T, H=H, attention=attention,
                               out_tanh=out_tanh)
    wh2 = params2.kernel[:, -H:, :]
    out_f, out_b, hfin2, cfin2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, N, H), jnp.float32),
            jax.ShapeDtypeStruct((T, N, H), jnp.float32),
            jax.ShapeDtypeStruct((2, N, H), jnp.float32),
            jax.ShapeDtypeStruct((2, N, H), jnp.float32),
        ],
        interpret=interpret,
    )(nvalid, u2[0], u2[1], wh2, params2.adj, params2.bias,
      h2[:, 0], c2[:, 0], aw2, awq2, awh2, au2, abs2, abu2)

    y = jnp.concatenate((out_f, out_b), axis=-1)[None]     # [1,T,N,2H]
    return y, (hfin2[:, None], cfin2[:, None])
