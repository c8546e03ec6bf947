r"""The model zoo: graph nets (AAGC / A3GC / AGC / G-GRU) and the DIP biLSTM.

Capability parity with ``net_aagc.py`` (ref: net_aagc.py:22-38 ``DIP``,
:595-695 the four ``*_net`` classes), redesigned for JAX: the reference has
four copy-pasted net classes differing only in cell type; here one generic
``GraphNet`` is parameterized by a static ``GraphNetConfig`` (cell kind,
sizes, dropout rates), and the DIP biLSTM is two ``lax.scan`` stacks instead
of cuDNN.

Topology (identical to ref net_aagc.py:633-645):
    linear_in: AAGC(in → H)  → ReLU
    rnn1:      Bi-cell(H → H)         (output 2H)
    rnn2:      Bi-cell(2H → H)        (output 2H)
    linear_out: AAGC(2H → out)

All forward functions are pure: ``(params, x, state, rng) -> (y, state)``,
jit/vmap/pjit-compatible, with dropout active only when an rng is provided.
"""

from __future__ import annotations

import contextlib
import threading
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from a3gc_tpu.models import cells as C
from a3gc_tpu.models import layers as L

__all__ = [
    "GraphNetConfig", "GraphNetParams", "init_graph_net", "graph_net_apply",
    "graph_net_zero_state", "DIPConfig", "DIPParams", "init_dip",
    "dip_apply",
]

_HI = jax.lax.Precision.HIGHEST

CELL_KINDS = ("aagc", "a3gc", "agc", "ggru")


# ---------------------------------------------------------------------------
# graph nets
# ---------------------------------------------------------------------------

@struct.dataclass
class GraphNetConfig:
    """Static net hyperparameters (hashable; safe as a jit static arg)."""

    cell: str = struct.field(pytree_node=False, default="a3gc")
    units_in: int = struct.field(pytree_node=False, default=12)
    units_out: int = struct.field(pytree_node=False, default=9)
    units_hidden: int = struct.field(pytree_node=False, default=256)
    num_nodes: int = struct.field(pytree_node=False, default=15)
    linear_dropout: float = struct.field(pytree_node=False, default=0.2)
    dropout: float = struct.field(pytree_node=False, default=0.3)
    recurrent_dropout: float = struct.field(pytree_node=False, default=0.3)
    precision: str = struct.field(pytree_node=False, default="highest")
    # "auto": fused Pallas scan kernel on TPU for batch-1 inference,
    # XLA lax.scan otherwise; "xla"/"pallas" force a backend.
    backend: str = struct.field(pytree_node=False, default="auto")
    # Pallas execution mode: "auto" = interpret off-TPU / compiled Mosaic
    # on TPU (platform probe); "never" = always real Mosaic lowering (for
    # cross-exporting tpu artifacts from a CPU process); "always" =
    # interpret even on TPU (debugging). The explicit knob for what
    # compiled_pallas_lowering() does via thread-local override.
    pallas_interpret: str = struct.field(pytree_node=False, default="auto")
    # rematerialize the cell step in the backward pass: the stored per-step
    # gate/attention intermediates otherwise dominate HBM (training at
    # B=128/T=300 needs 55 GB without remat, OOM on a 16 GB chip). Measured
    # FASTER even at B=32 (less HBM traffic), so it defaults on; it is a
    # no-op for inference.
    remat: bool = struct.field(pytree_node=False, default=True)

    @property
    def matmul_precision(self):
        return {"highest": jax.lax.Precision.HIGHEST,
                "default": jax.lax.Precision.DEFAULT}[self.precision]


@struct.dataclass
class GraphNetParams:
    linear_in: C.GraphConvParams
    rnn1: object   # cell params with leading direction axis [2, ...]
    rnn2: object
    linear_out: C.GraphConvParams


def _init_cell(key, cfg: GraphNetConfig, units_in: int, adjacency):
    if cfg.cell == "ggru":
        return C.init_ggru_cell(key, units_in, cfg.units_hidden, adjacency)
    return C.init_gcn_lstm_cell(
        key, units_in, cfg.units_hidden, adjacency,
        attention=cfg.cell in ("a3gc", "agc"),
        shared_fixed_adj=cfg.cell == "agc",
    )


def init_graph_net(key, cfg: GraphNetConfig, adjacency) -> GraphNetParams:
    r"""Initialize a graph net (ref: net_aagc.py:625-631 and equivalents)."""
    assert cfg.cell in CELL_KINDS, cfg.cell
    k = jax.random.split(key, 6)
    H = cfg.units_hidden
    return GraphNetParams(
        linear_in=C.init_graph_conv(k[0], cfg.units_in, H, adjacency),
        rnn1=L.stack_directions(
            _init_cell(k[1], cfg, H, adjacency),
            _init_cell(k[2], cfg, H, adjacency)),
        rnn2=L.stack_directions(
            _init_cell(k[3], cfg, 2 * H, adjacency),
            _init_cell(k[4], cfg, 2 * H, adjacency)),
        linear_out=C.init_graph_conv(k[5], 2 * H, cfg.units_out, adjacency),
    )


_interpret_override = threading.local()   # per-thread: export lowering
                                          # must not poison other threads'
                                          # concurrent pallas traces


def _pallas_interpret(cfg=None) -> bool:
    """Run the Pallas kernels in interpret mode off-TPU (forced
    ``backend='pallas'`` in CPU tests); compiled Mosaic on TPU.

    Resolution order: the net config's explicit ``pallas_interpret`` knob
    ("always"/"never") → the :func:`compiled_pallas_lowering` thread-local
    override → the host-platform probe. The explicit overrides exist for
    cross-lowering: a CPU process exporting a tpu artifact must NOT take
    interpret mode, or plain XLA ops get silently baked in instead of the
    Mosaic kernels (jax.export cross-export)."""
    knob = getattr(cfg, "pallas_interpret", "auto") if cfg is not None \
        else "auto"
    if knob != "auto":
        assert knob in ("always", "never"), knob
        return knob == "always"
    override = getattr(_interpret_override, "value", None)
    if override is not None:
        return override
    return jax.devices()[0].platform not in ("tpu", "axon")


@contextlib.contextmanager
def compiled_pallas_lowering():
    """Force real (non-interpret) Mosaic lowering regardless of the host
    platform — for cross-exporting tpu-only artifacts from CPU. Scoped to
    the calling thread."""
    prev = getattr(_interpret_override, "value", None)
    _interpret_override.value = False
    try:
        yield
    finally:
        _interpret_override.value = prev


def _layer_hoisted_lstm(cfg: GraphNetConfig, cell2, x, st, rng_layer,
                        frame_mask):
    r"""One bi-LSTM graph layer with the input half of the gate projection
    hoisted out of the scan — u = x·W_x becomes one [T·B·N, F] × [F, 4H] MXU
    matmul per direction; only the [B·N, H] × [H, 4H] recurrent half stays
    sequential."""
    prec = cfg.matmul_precision
    rh = None
    if rng_layer is not None:
        # input dropout ONCE over [B,T,N,F] == per-step iid masks
        # (ref: net_aagc.py:180); recurrent dropout stays in-scan
        rx, rh = jax.random.split(rng_layer)
        if cfg.dropout > 0:
            keep = 1.0 - cfg.dropout
            mask = jax.random.bernoulli(rx, keep, x.shape)
            x = jnp.where(mask, x / keep, 0.0)
    F = x.shape[-1]
    # per-direction projections, the BACKWARD one from time-flipped input:
    # flipping x (F wide) instead of the [.., 4H] projection lets XLA write
    # each einsum straight into its slice of the stacked scan operand —
    # halving peak HBM vs projecting once and flipping the wide output
    u_f = jnp.einsum("btnf,fg->tbng", x, cell2.kernel[0, :F, :],
                     precision=prec)                    # [T,B,N,4H]
    u_b = jnp.einsum("btnf,fg->tbng", x[:, ::-1], cell2.kernel[1, :F, :],
                     precision=prec)
    u2 = jnp.stack((u_f, u_b))

    def step(p, ut, s, rng=None):
        return C.gcn_lstm_step_hoisted(
            p, ut, s, hidden_kernel=p.kernel[F:, :],
            out_activation="tanh",
            recurrent_dropout_rate=cfg.recurrent_dropout,
            rng=rng, precision=prec)

    return L.bi_rnn_precomputed(step, cell2, u2, st, rng=rh,
                                frame_mask=frame_mask)


def _layer_hoisted_ggru(cfg: GraphNetConfig, cell2, x, st, frame_mask):
    prec = cfg.matmul_precision
    u_f = jnp.einsum("btnf,fg->tbng", x, cell2.w_in[0],
                     precision=prec) + cell2.b_in[0]
    u_b = jnp.einsum("btnf,fg->tbng", x[:, ::-1], cell2.w_in[1],
                     precision=prec) + cell2.b_in[1]
    u2 = jnp.stack((u_f, u_b))

    def step(p, ut, s, rng=None):
        return C.ggru_step_hoisted(p, ut, s, precision=prec)

    return L.bi_rnn_precomputed(step, cell2, u2, st, frame_mask=frame_mask)


def _rnn_stack_xla(cfg: GraphNetConfig, rnn1, rnn2, x, state, frame_mask):
    r"""Both recurrent layers on the hoisted XLA scan path (no dropout —
    callers with an rng take the in-scan path in graph_net_apply). rnn1's
    final state seeds rnn2 — reference semantics, see
    graph_net_zero_state."""
    if cfg.cell == "ggru":
        x, state = _layer_hoisted_ggru(cfg, rnn1, x, state, frame_mask)
        x, state = _layer_hoisted_ggru(cfg, rnn2, x, state, frame_mask)
    else:
        x, state = _layer_hoisted_lstm(cfg, rnn1, x, state, None, frame_mask)
        x, state = _layer_hoisted_lstm(cfg, rnn2, x, state, None, frame_mask)
    return x, state


def _rnn_stack_pallas_impl(cfg: GraphNetConfig, rnn1, rnn2, x, state,
                           frame_mask):
    r"""Both recurrent layers as Pallas whole-scan kernels: one kernel
    launch per layer, weights + recurrent state VMEM-resident (see
    ops/pallas_gcn_lstm.py). batch-1 always; multi-stream when B·15 rows
    fit one MXU tile (per-stream lengths via vector n_valid)."""
    from a3gc_tpu.ops.pallas_gcn_lstm import (
        bi_gcn_lstm_pallas, bi_gcn_lstm_pallas_dirfused, bi_ggru_pallas)
    prec = cfg.matmul_precision
    interp = _pallas_interpret(cfg)
    n_valid = (None if frame_mask is None
               else jnp.sum(frame_mask, axis=1).astype(jnp.int32))
    if cfg.cell == "ggru":
        layer = bi_ggru_pallas
    elif x.shape[0] == 1:
        # both directions in one kernel: 2N rows, T grid steps — ~1.6×
        # the per-layer speed of two single-direction launches
        layer = bi_gcn_lstm_pallas_dirfused
    else:
        layer = bi_gcn_lstm_pallas
    x, state = layer(rnn1, x, state, n_valid=n_valid, precision=prec,
                     interpret=interp)
    x, state = layer(rnn2, x, state, n_valid=n_valid, precision=prec,
                     interpret=interp)
    return x, state


@partial(jax.custom_jvp, nondiff_argnums=(0,))
def _rnn_stack_pallas(cfg, rnn1, rnn2, x, state, frame_mask):
    r"""Pallas forward with an XLA-scan derivative rule: the kernels are
    forward-only (no AD rules), so the custom JVP recomputes on the
    numerically-equivalent hoisted XLA path and differentiates that.
    ``custom_jvp`` (not ``custom_vjp``) so BOTH forward-mode (jvp/
    hessian) and reverse-mode work — jax derives the VJP by transposing
    the rule, making gradients through ``backend='pallas'`` equal the XLA
    gradients exactly. The frame mask is data, not a differentiable
    input; its tangent is ignored."""
    return _rnn_stack_pallas_impl(cfg, rnn1, rnn2, x, state, frame_mask)


@_rnn_stack_pallas.defjvp
def _rnn_stack_pallas_jvp(cfg, primals, tangents):
    rnn1, rnn2, x, state, frame_mask = primals
    t_rnn1, t_rnn2, t_x, t_state, _ = tangents
    return jax.jvp(
        lambda r1, r2, xx, st: _rnn_stack_xla(cfg, r1, r2, xx, st,
                                              frame_mask),
        (rnn1, rnn2, x, state), (t_rnn1, t_rnn2, t_x, t_state))


def graph_net_zero_state(cfg: GraphNetConfig, batch: int, dtype=jnp.float32):
    r"""Zero recurrent state (ref: net_aagc.py:608-613).

    NOTE the reference quirk this must match: ONE state pytree (leading
    direction axis 2) threads through BOTH rnn layers — rnn2's initial state
    is rnn1's final state (ref: net_aagc.py:642-643 ``x, h = self.rnn1(x, h);
    x, h = self.rnn2(x, h)``), possible because both layers share the hidden
    size."""
    shape = (2, batch, cfg.num_nodes, cfg.units_hidden)
    if cfg.cell == "ggru":
        return jnp.zeros(shape, dtype)
    return (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def graph_net_apply(params: GraphNetParams, cfg: GraphNetConfig,
                    x: jnp.ndarray, state=None,
                    rng: Optional[jax.Array] = None,
                    frame_mask: Optional[jnp.ndarray] = None):
    r"""Forward pass (ref: net_aagc.py:633-645). x [B,T,N,F_in] →
    ([B,T,N,F_out], new_state). Dropout only when ``rng`` is given.
    ``frame_mask`` [B,T] makes end-padded batches equivalent to
    native-length sequences (see layers.bi_rnn)."""
    prec = cfg.matmul_precision
    if state is None:
        state = graph_net_zero_state(cfg, x.shape[0], x.dtype)
    if rng is not None and cfg.cell != "ggru":
        r_in, r1, r2 = jax.random.split(rng, 3)
    else:
        r_in = r1 = r2 = None

    x = C.graph_conv(params.linear_in, x, dropout_rate=cfg.linear_dropout,
                     rng=r_in, precision=prec)
    x = jax.nn.relu(x)

    # Fast inference path: hoist the input half of the gate projection out
    # of the scan — u = x·W_x becomes one [T·B·N, F] × [F, 4H] MXU matmul per
    # direction; only the [B·N, H] × [H, 4H] recurrent half stays sequential.
    # (Hoisting is semantically valid in training too — per-step input
    # dropout equals one iid mask over the sequence — but measured SLOWER
    # there: the materialized [2,T,B,N,4H] projection becomes a huge
    # backward-pass residual, e.g. 1.2 GB for stage 1 at B=32/T=300, while
    # the in-scan projection is recomputed cheaply. Keep it inference-only.)
    hoist = rng is None

    # Pallas whole-scan kernel: one kernel launch per layer direction,
    # weights + recurrent state VMEM-resident (see ops/pallas_gcn_lstm.py).
    # batch-1 always; multi-stream up to B·15 ≤ 512 rows (streams are
    # padded to chunks of 8 and graph-mixed per ≤128-row MXU tile;
    # per-stream lengths via vector n_valid). Past that the hoisted XLA
    # scan's batched matmuls are MXU-efficient on their own. Differentiable:
    # _rnn_stack_pallas carries a custom VJP whose backward recomputes on
    # the XLA scan path.
    B = x.shape[0]
    pallas_ok = B == 1 or B * cfg.num_nodes <= 512
    use_pallas = (
        hoist and pallas_ok
        and (cfg.backend == "pallas"
             or (cfg.backend == "auto"
                 and jax.devices()[0].platform in ("tpu", "axon"))))
    if use_pallas:
        x, state = _rnn_stack_pallas(cfg, params.rnn1, params.rnn2, x,
                                     state, frame_mask)
        x = C.graph_conv(params.linear_out, x, precision=prec)
        return x, state

    if cfg.cell == "ggru":
        if hoist:
            x, state = _rnn_stack_xla(cfg, params.rnn1, params.rnn2, x,
                                      state, frame_mask)
        else:
            def ggru_base(p, xt, st):
                return C.ggru_step(p, xt, st, precision=prec)

            if cfg.remat:
                # same rationale as the LSTM branch below: without remat
                # the stored per-step gate/candidate residuals OOM the
                # chip in training (measured 30.8 GB at B=256/T=300 bf16
                # vs the 15.75 GB HBM)
                ggru_base = jax.checkpoint(ggru_base)
            step = lambda p, xt, st, **kw: ggru_base(p, xt, st)
            x, state = L.bi_rnn(step, params.rnn1, x, state,
                                frame_mask=frame_mask)
            x, state = L.bi_rnn(step, params.rnn2, x, state,
                                frame_mask=frame_mask)
    elif hoist:
        x, state = _rnn_stack_xla(cfg, params.rnn1, params.rnn2, x, state,
                                  frame_mask)
    else:
        def base_step(p, xt, st, rng):
            return C.gcn_lstm_step(
                p, xt, st, out_activation="tanh",
                dropout_rate=cfg.dropout,
                recurrent_dropout_rate=cfg.recurrent_dropout,
                rng=rng, precision=prec)

        if cfg.remat:
            base_step = jax.checkpoint(base_step)

        def step(p, xt, st, rng=None):
            return base_step(p, xt, st, rng)

        x, state = L.bi_rnn(step, params.rnn1, x, state, rng=r1,
                            frame_mask=frame_mask)
        x, state = L.bi_rnn(step, params.rnn2, x, state, rng=r2,
                            frame_mask=frame_mask)

    x = C.graph_conv(params.linear_out, x, precision=prec)
    return x, state


# ---------------------------------------------------------------------------
# DIP biLSTM (ref: net_aagc.py:22-38)
# ---------------------------------------------------------------------------

@struct.dataclass
class DenseParams:
    kernel: jnp.ndarray  # [in, out]
    bias: jnp.ndarray    # [out]


@struct.dataclass
class LSTMLayerParams:
    r"""One direction of one LSTM layer, cuDNN-compatible layout.

    Gate order i, f, g, o (torch convention, ref: torch.nn.LSTM used at
    net_aagc.py:28). Both bias vectors are kept so checkpoints map 1:1.
    """

    w_ih: jnp.ndarray   # [F, 4H]
    w_hh: jnp.ndarray   # [H, 4H]
    b_ih: jnp.ndarray   # [4H]
    b_hh: jnp.ndarray   # [4H]


@struct.dataclass
class DIPConfig:
    n_input: int = struct.field(pytree_node=False, default=60)
    n_output: int = struct.field(pytree_node=False, default=135)
    n_hidden: int = struct.field(pytree_node=False, default=512)
    n_layers: int = struct.field(pytree_node=False, default=2)
    bidirectional: bool = struct.field(pytree_node=False, default=True)
    dropout: float = struct.field(pytree_node=False, default=0.2)
    precision: str = struct.field(pytree_node=False, default="highest")
    backend: str = struct.field(pytree_node=False, default="auto")
    pallas_interpret: str = struct.field(pytree_node=False, default="auto")

    @property
    def matmul_precision(self):
        return {"highest": jax.lax.Precision.HIGHEST,
                "default": jax.lax.Precision.DEFAULT}[self.precision]


@struct.dataclass
class DIPParams:
    linear1: DenseParams
    lstm: Tuple    # per layer: LSTMLayerParams with leading direction axis
    linear2: DenseParams


def _torch_lstm_uniform(key, shape, hidden):
    bound = 1.0 / (hidden ** 0.5)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def init_dip(key, cfg: DIPConfig) -> DIPParams:
    r"""Initialize DIP (ref: net_aagc.py:26-31): torch Linear / LSTM default
    uniform inits so training dynamics match the reference."""
    n_dir = 2 if cfg.bidirectional else 1
    H = cfg.n_hidden
    keys = jax.random.split(key, 2 + cfg.n_layers * n_dir)

    def linear(k, fan_in, fan_out):
        bound = 1.0 / (fan_in ** 0.5)
        kw, kb = jax.random.split(k)
        return DenseParams(
            kernel=jax.random.uniform(kw, (fan_in, fan_out), jnp.float32,
                                      -bound, bound),
            bias=jax.random.uniform(kb, (fan_out,), jnp.float32,
                                    -bound, bound))

    layers = []
    ki = 2
    for layer in range(cfg.n_layers):
        f_in = H if layer == 0 else H * n_dir
        dir_params = []
        for _ in range(n_dir):
            k1, k2, k3, k4 = jax.random.split(keys[ki], 4)
            ki += 1
            dir_params.append(LSTMLayerParams(
                w_ih=_torch_lstm_uniform(k1, (f_in, 4 * H), H),
                w_hh=_torch_lstm_uniform(k2, (H, 4 * H), H),
                b_ih=_torch_lstm_uniform(k3, (4 * H,), H),
                b_hh=_torch_lstm_uniform(k4, (4 * H,), H)))
        layers.append(L.stack_directions(*dir_params) if n_dir == 2
                      else dir_params[0])
    return DIPParams(
        linear1=linear(keys[0], cfg.n_input, H),
        lstm=tuple(layers),
        linear2=linear(keys[1], H * n_dir, cfg.n_output),
    )


def dip_zero_state(cfg: DIPConfig, batch: int, dtype=jnp.float32):
    if cfg.bidirectional:
        z = jnp.zeros((2, batch, cfg.n_hidden), dtype)
    else:
        z = jnp.zeros((batch, cfg.n_hidden), dtype)
    return tuple((z, z) for _ in range(cfg.n_layers))


def _dip_stack_xla(cfg: DIPConfig, lstm, x, state, frame_mask):
    r"""Stacked (bi)LSTM on the XLA scan path, input projection hoisted:
    u = x·W_ih + b_ih is one big MXU matmul per direction; the LSTM has no
    per-step dropout so this is valid in training too."""
    prec = cfg.matmul_precision
    new_states = []
    for layer_params, layer_state in zip(lstm, state):
        def step(p, ut, st):
            h, c = st
            z = (ut[:, 0, :] + p.b_hh
                 + jnp.einsum("bh,hg->bg", h, p.w_hh, precision=prec))
            H = h.shape[-1]
            i = jax.nn.sigmoid(z[:, 0:H])
            f = jax.nn.sigmoid(z[:, H:2 * H])
            g = jnp.tanh(z[:, 2 * H:3 * H])
            o = jax.nn.sigmoid(z[:, 3 * H:])
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            return h_new[:, None, :], (h_new, c_new)

        if cfg.bidirectional:
            u_f = jnp.einsum("btf,fg->tbg", x, layer_params.w_ih[0],
                             precision=prec) + layer_params.b_ih[0]
            u_b = jnp.einsum("btf,fg->tbg", x[:, ::-1], layer_params.w_ih[1],
                             precision=prec) + layer_params.b_ih[1]
            u2 = jnp.stack((u_f, u_b))[:, :, :, None, :]
            y, fin = L.bi_rnn_precomputed(step, layer_params, u2,
                                          layer_state,
                                          frame_mask=frame_mask)
        else:
            u = (jnp.einsum("btf,fg->btg", x, layer_params.w_ih,
                            precision=prec)
                 + layer_params.b_ih)[:, :, None, :]
            y, fin = L.uni_rnn(step, layer_params, u, layer_state,
                               frame_mask=frame_mask)
        x = y[:, :, 0, :]
        new_states.append(fin)
    return x, tuple(new_states)


def _dip_stack_pallas_impl(cfg: DIPConfig, lstm, x, state, frame_mask):
    from a3gc_tpu.ops.pallas_gcn_lstm import bi_lstm_pallas
    prec = cfg.matmul_precision
    interp = _pallas_interpret(cfg)
    n_valid = (None if frame_mask is None
               else jnp.sum(frame_mask[0]).astype(jnp.int32))
    new_states = []
    for layer_params, layer_state in zip(lstm, state):
        x, fin = bi_lstm_pallas(layer_params, x, layer_state,
                                n_valid=n_valid, precision=prec,
                                interpret=interp)
        new_states.append(fin)
    return x, tuple(new_states)


@partial(jax.custom_jvp, nondiff_argnums=(0,))
def _dip_stack_pallas(cfg, lstm, x, state, frame_mask):
    r"""Pallas forward with an XLA-scan derivative rule (same contract as
    _rnn_stack_pallas: the kernels are forward-only; the custom JVP
    recomputes on the hoisted XLA path, supporting both AD modes)."""
    return _dip_stack_pallas_impl(cfg, lstm, x, state, frame_mask)


@_dip_stack_pallas.defjvp
def _dip_stack_pallas_jvp(cfg, primals, tangents):
    lstm, x, state, frame_mask = primals
    t_lstm, t_x, t_state, _ = tangents
    return jax.jvp(
        lambda lp, xx, st: _dip_stack_xla(cfg, lp, xx, st, frame_mask),
        (lstm, x, state), (t_lstm, t_x, t_state))


def dip_apply(params: DIPParams, cfg: DIPConfig, x: jnp.ndarray,
              state=None, rng: Optional[jax.Array] = None,
              frame_mask: Optional[jnp.ndarray] = None):
    r"""DIP forward (ref: net_aagc.py:33-38): dropout → linear → relu →
    stacked biLSTM → linear. x [B, T, F] → ([B, T, n_output], state)."""
    prec = cfg.matmul_precision
    if state is None:
        state = dip_zero_state(cfg, x.shape[0], x.dtype)
    if rng is not None and cfg.dropout > 0:
        keep = 1.0 - cfg.dropout
        mask = jax.random.bernoulli(rng, keep, x.shape)
        x = jnp.where(mask, x / keep, 0.0)
    x = jnp.einsum("btf,fh->bth", x, params.linear1.kernel,
                   precision=prec) + params.linear1.bias
    x = jax.nn.relu(x)

    # Pallas whole-scan LSTM — opt-in only: unlike the graph cells (whose
    # XLA scan body carries an adjacency einsum + attention chain), the dense
    # LSTM body is a single tiny dot + elementwise, and XLA's fused scan wins
    # (measured on the tp cascade: 207k frames/s XLA vs 127k Pallas at B=1).
    # Differentiable via _dip_stack_pallas's custom VJP.
    use_pallas = (
        rng is None and cfg.bidirectional and x.shape[0] <= 8
        and (frame_mask is None or x.shape[0] == 1)
        and cfg.backend == "pallas")
    if use_pallas:
        x, new_states = _dip_stack_pallas(cfg, params.lstm, x, state,
                                          frame_mask)
    else:
        x, new_states = _dip_stack_xla(cfg, params.lstm, x, state,
                                       frame_mask)

    y = jnp.einsum("bth,ho->bto", x, params.linear2.kernel,
                   precision=prec) + params.linear2.bias
    return y, new_states
