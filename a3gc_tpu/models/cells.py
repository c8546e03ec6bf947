r"""Graph-recurrent cell step functions — the innermost compute of the zoo.

Capability parity with the cells in ``net_aagc.py`` (ref: net_aagc.py:40-368):
AAGC (per-gate learnable adjacency LSTM), A3GC (AAGC + joint attention), AGC
(shared fixed adjacency + attention), G-GRU (graph message on the hidden
state), and the AAGC graph-conv projection layer.

TPU-first redesign (vs the reference's TorchScript cells that issue ~14 small
matmuls per timestep, ref: net_aagc.py:178-217):

  * the four gate matmuls are **fused into one** [B·N, F+H] × [F+H, 4H]
    contraction feeding the MXU, followed by one per-gate [4, N, N] adjacency
    einsum on the VPU — valid because the node-mixing and feature-mixing act
    on different axes and commute: ``A·(X·W) == (A·X)·W``;
  * all parameters live in flax.struct pytrees, so cells are pure functions —
    scannable with ``lax.scan``, vmappable over the direction axis, and
    differentiable without a tape;
  * dropout masks are drawn per-timestep from a folded PRNG key (matching the
    reference's per-step torch.nn.Dropout semantics) only when training.

Parameter conventions (important for the torch checkpoint converter,
``a3gc_tpu/compat/torch_import.py``):

  * dense kernels are stored **[in, out]** (JAX convention; torch stores
    [out, in] and applies ``x @ W.T`` — ref: net_aagc.py:109).
  * adjacency matrices are stored as the **left-multiplying** mixing matrix
    ``L``: ``out[n] = Σ_m L[n, m] · x[m]``. The reference uses *different*
    orientations per cell type (AAGC/A3GC effectively apply A₀ᵀ via
    ``einsum('bnf,nm->bmf', x, adj.t())`` with ``adj`` storing A₀ᵀ — ref:
    net_aagc.py:108,151 — while AGC applies A₀ via
    ``einsum('nm,bmf->bnf', ...)`` — ref: net_aagc.py:271); normalizing to one
    convention here keeps a single kernel and pushes the transposes into the
    converter.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

__all__ = [
    "GraphConvParams", "AttentionParams", "GCNLSTMCellParams",
    "GGRUCellParams", "graph_conv", "gcn_lstm_step", "ggru_step",
    "gcn_lstm_gates", "gcn_lstm_step_hoisted", "ggru_step_hoisted",
    "init_graph_conv", "init_gcn_lstm_cell", "init_ggru_cell",
]

_HI = jax.lax.Precision.HIGHEST

# gate order everywhere: i, f, c(g), o — same as the reference / cuDNN.
GATES = ("i", "f", "c", "o")


# ---------------------------------------------------------------------------
# parameter pytrees
# ---------------------------------------------------------------------------

@struct.dataclass
class GraphConvParams:
    r"""AAGC projection layer: graph mix + dense (ref: net_aagc.py:40-66)."""

    kernel: jnp.ndarray   # [in, out]
    adj: jnp.ndarray      # [N, N] left-multiplying
    bias: jnp.ndarray     # [out]


@struct.dataclass
class AttentionParams:
    r"""Joint attention of the A3GC/AGC cells (ref: net_aagc.py:160-165)."""

    w: jnp.ndarray        # [H, H]
    wq: jnp.ndarray       # [H, H]
    wh: jnp.ndarray       # [H, H]
    u: jnp.ndarray        # [H, 1]
    bs: jnp.ndarray       # [H]
    bu: jnp.ndarray       # [N]


@struct.dataclass
class GCNLSTMCellParams:
    r"""Unified parameters for AAGC / A3GC / AGC LSTM cells.

    ``attention is None`` ⇒ AAGC (ref: net_aagc.py:68-126).
    ``attention`` set      ⇒ A3GC / AGC (ref: net_aagc.py:128-303); the two
    differ only in whether ``adj`` is trainable and shared, which is an
    optimizer-masking concern, not a forward-math one.
    """

    kernel: jnp.ndarray   # [F+H, 4H] fused gate kernel, gate order i,f,c,o
    adj: jnp.ndarray      # [4, N, N] per-gate left-multiplying mix
    bias: jnp.ndarray     # [4, H]
    attention: Optional[AttentionParams] = None


@struct.dataclass
class GGRUCellParams:
    r"""G-GRU cell: GRU with a graph message on the hidden state
    (ref: net_aagc.py:305-368)."""

    w_in: jnp.ndarray       # [F, 3H]  gate order r, u, c
    b_in: jnp.ndarray       # [3H]
    w_hid: jnp.ndarray      # [H, 3H]  (no bias, ref: net_aagc.py:329-331)
    gcn_kernel: jnp.ndarray  # [H, H]
    adj: jnp.ndarray        # [N, N] left-multiplying (xavier init — the
    #                          template is deliberately overwritten in the
    #                          reference, ref: net_aagc.py:334,339)


# ---------------------------------------------------------------------------
# forward math
# ---------------------------------------------------------------------------

def _dropout(x: jnp.ndarray, rate: float, rng: Optional[jax.Array]) -> jnp.ndarray:
    """Inverted dropout; identity when rng is None or rate == 0."""
    if rng is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def graph_conv(p: GraphConvParams, x: jnp.ndarray, *,
               activation: str = "linear",
               dropout_rate: float = 0.0,
               rng: Optional[jax.Array] = None,
               precision=_HI) -> jnp.ndarray:
    r"""AAGC projection: ``act(adj · x · kernel + bias)`` over [..., N, F]
    (ref: net_aagc.py:61-66). Works for [B,T,N,F] and [B,N,F] alike."""
    x = _dropout(x, dropout_rate, rng)
    y = jnp.einsum("...nf,fh->...nh", x, p.kernel, precision=precision)
    y = jnp.einsum("nm,...mh->...nh", p.adj, y, precision=precision) + p.bias
    if activation == "tanh":
        y = jnp.tanh(y)
    return y


def _attention_gate(ap: AttentionParams, hy: jnp.ndarray,
                    precision=_HI) -> jnp.ndarray:
    r"""Per-node sigmoid attention score a_t ∈ [0,1] (ref: net_aagc.py:200-210).

    q_t = ReLU(Σ_nodes hy·W);  a = σ(u·tanh(Wh·hy + Wq·q_t + bs) + bu)
    """
    q = jax.nn.relu(jnp.sum(
        jnp.einsum("bnh,hk->bnk", hy, ap.w, precision=precision),
        axis=1, keepdims=True))                                   # [B,1,H]
    s = jnp.tanh(
        jnp.einsum("bnh,hk->bnk", hy, ap.wh, precision=precision)
        + jnp.einsum("bqh,hk->bqk", q, ap.wq, precision=precision)
        + ap.bs)                                                  # [B,N,H]
    a = jnp.einsum("bnh,hk->bnk", s, ap.u, precision=precision)[..., 0] + ap.bu
    return jax.nn.sigmoid(a)[..., None]                           # [B,N,1]


def gcn_lstm_gates(p: GCNLSTMCellParams, z: jnp.ndarray,
                   state: Tuple[jnp.ndarray, jnp.ndarray], *,
                   out_activation: str = "tanh",
                   precision=_HI):
    r"""Shared tail of the cell step given the pre-activation gate features
    ``z = [x‖h]·W`` (before graph mix): adjacency mix + bias + nonlinearities
    + attention. Factored out so the scan body can consume a *hoisted* input
    projection (see ``gcn_lstm_step_hoisted``)."""
    h, c = state
    B, N = z.shape[0], z.shape[1]
    H = p.bias.shape[-1]
    y = z.reshape(B, N, 4, H)
    mixed = jnp.einsum("knm,bmkh->bnkh", p.adj, y, precision=precision)
    gates = mixed + p.bias                                        # [B,N,4,H]
    i = jax.nn.sigmoid(gates[..., 0, :])
    f = jax.nn.sigmoid(gates[..., 1, :])
    g = jnp.tanh(gates[..., 2, :])
    o = jax.nn.sigmoid(gates[..., 3, :])
    c_new = f * c + i * g
    hy = o * jnp.tanh(c_new)
    if p.attention is not None:
        hy = hy + hy * _attention_gate(p.attention, hy, precision=precision)
    out = jnp.tanh(hy) if out_activation == "tanh" else hy
    return out, (hy, c_new)


def gcn_lstm_step_hoisted(p: GCNLSTMCellParams, u_t: jnp.ndarray,
                          state, *, hidden_kernel: jnp.ndarray,
                          out_activation: str = "tanh",
                          recurrent_dropout_rate: float = 0.0,
                          rng: Optional[jax.Array] = None,
                          precision=_HI):
    r"""Cell step with the input projection hoisted out of the scan.

    The gate pre-activation splits as ``[x‖h]·W = x·W_x + h·W_h`` (the fused
    kernel's rows split at F); ``u_t = x_t·W_x`` is computed for ALL
    timesteps in one large [T·B·N, F] × [F, 4H] MXU matmul outside the scan,
    leaving only the [B·N, H] × [H, 4H] recurrent half inside — mathematically
    identical (fp32 rounding aside), and the big matmul actually feeds the
    systolic array.

    Valid in TRAINING too: each x_t enters exactly one step, so the
    reference's per-step input dropout (ref: net_aagc.py:180) equals one iid
    mask over the whole sequence applied before the hoisted projection;
    only the recurrent dropout on h (ref: net_aagc.py:181) must stay
    per-step — passed here via ``rng``.
    """
    h, c = state
    h_in = _dropout(h, recurrent_dropout_rate, rng)
    z = u_t + jnp.einsum("bnh,hg->bng", h_in, hidden_kernel,
                         precision=precision)
    return gcn_lstm_gates(p, z, (h, c), out_activation=out_activation,
                          precision=precision)


def gcn_lstm_step(p: GCNLSTMCellParams, x: jnp.ndarray,
                  state: Tuple[jnp.ndarray, jnp.ndarray], *,
                  out_activation: str = "tanh",
                  dropout_rate: float = 0.0,
                  recurrent_dropout_rate: float = 0.0,
                  rng: Optional[jax.Array] = None,
                  precision=_HI):
    r"""One timestep of the AAGC/A3GC/AGC LSTM cell.

    x [B,N,F], state = (h, c) each [B,N,H]. Returns (output [B,N,H], new state).
    Matches ref net_aagc.py:177-217 exactly: the carried hidden state is the
    *post-attention* hy, while the cell output additionally passes the output
    activation.
    """
    h, c = state
    if rng is not None:
        rng_x, rng_h = jax.random.split(rng)
        x = _dropout(x, dropout_rate, rng_x)
        h = _dropout(h, recurrent_dropout_rate, rng_h)
    xs = jnp.concatenate((x, h), axis=-1)                         # [B,N,F+H]
    # ONE fused gate matmul on the MXU, then the per-gate graph mix
    # (A·(X·W) == (A·X)·W, see module docstring)
    z = jnp.einsum("bnf,fg->bng", xs, p.kernel, precision=precision)
    return gcn_lstm_gates(p, z, (h, c), out_activation=out_activation,
                          precision=precision)


def ggru_step(p: GGRUCellParams, x: jnp.ndarray, h: jnp.ndarray, *,
              precision=_HI):
    r"""One timestep of the G-GRU cell (ref: net_aagc.py:342-368).

    x [B,N,F], h [B,N,H]. Returns (output, new hidden) — both the new hidden.
    """
    zi = jnp.einsum("bnf,fg->bng", x, p.w_in, precision=precision) + p.b_in
    return ggru_step_hoisted(p, zi, h, precision=precision)


def ggru_step_hoisted(p: GGRUCellParams, zi: jnp.ndarray, h: jnp.ndarray, *,
                      precision=_HI):
    r"""G-GRU step given the hoisted input projection zi = x·W_in + b_in."""
    msg = jnp.einsum("bnh,hk->bnk", h, p.gcn_kernel, precision=precision)
    msg = jnp.einsum("nm,bmh->bnh", p.adj, msg, precision=precision)
    zh = jnp.einsum("bnh,hg->bng", msg, p.w_hid, precision=precision)
    H = h.shape[-1]
    r = jax.nn.sigmoid(zi[..., 0:H] + zh[..., 0:H])
    u = jax.nn.sigmoid(zi[..., H:2 * H] + zh[..., H:2 * H])
    cand = jnp.tanh(zi[..., 2 * H:] + r * zh[..., 2 * H:])
    h_new = u * h + (1.0 - u) * cand
    return h_new, h_new


# ---------------------------------------------------------------------------
# initializers (matching the reference's torch init for training parity)
# ---------------------------------------------------------------------------

def _xavier_uniform(key, shape, dtype=jnp.float32, torch_shape=None):
    """torch.nn.init.xavier_uniform_ on a torch-layout [out, in] tensor, then
    transposed into our [in, out] layout when 2-D."""
    ts = torch_shape or shape
    fan_out, fan_in = ts[0], ts[1]
    bound = (6.0 / (fan_in + fan_out)) ** 0.5
    w = jax.random.uniform(key, ts, dtype, -bound, bound)
    if torch_shape is not None:
        w = w.T
    return w


def init_graph_conv(key, units_in: int, units_out: int,
                    adjacency: jnp.ndarray) -> GraphConvParams:
    r"""Init like ref net_aagc.py:55-59: xavier kernel, template adjacency,
    zero bias. ``adjacency`` is the template A₀ [N,N]; the stored
    left-multiplying matrix is A₀ᵀ (see module docstring)."""
    return GraphConvParams(
        kernel=_xavier_uniform(key, (units_in, units_out),
                               torch_shape=(units_out, units_in)),
        adj=jnp.asarray(adjacency, jnp.float32).T,
        bias=jnp.zeros((units_out,), jnp.float32),
    )


def init_attention(key, units_out: int, num_nodes: int) -> AttentionParams:
    r"""Init like ref net_aagc.py:160-175: xavier matrices, zero biases."""
    k = jax.random.split(key, 4)
    return AttentionParams(
        w=_xavier_uniform(k[0], (units_out, units_out),
                          torch_shape=(units_out, units_out)),
        wq=_xavier_uniform(k[1], (units_out, units_out),
                           torch_shape=(units_out, units_out)),
        wh=_xavier_uniform(k[2], (units_out, units_out),
                           torch_shape=(units_out, units_out)),
        u=_xavier_uniform(k[3], (units_out, 1), torch_shape=(1, units_out)),
        bs=jnp.zeros((units_out,), jnp.float32),
        bu=jnp.zeros((num_nodes,), jnp.float32),
    )


def init_gcn_lstm_cell(key, units_in: int, units_out: int,
                       adjacency: jnp.ndarray, *,
                       attention: bool,
                       shared_fixed_adj: bool = False) -> GCNLSTMCellParams:
    r"""Init an AAGC (attention=False), A3GC (attention=True) or AGC
    (attention=True, shared_fixed_adj=True) cell.

    Per-gate xavier kernels like ref net_aagc.py:97-100; adjacency starts at
    the template in the orientation each reference cell applies (A₀ᵀ for
    AAGC/A3GC, A₀ for AGC — see module docstring).
    """
    keys = jax.random.split(key, 5)
    fused = jnp.concatenate([
        _xavier_uniform(keys[g], (units_in + units_out, units_out),
                        torch_shape=(units_out, units_in + units_out))
        for g in range(4)], axis=1)
    a0 = jnp.asarray(adjacency, jnp.float32)
    adj = jnp.broadcast_to((a0 if shared_fixed_adj else a0.T)[None],
                           (4,) + a0.shape)
    return GCNLSTMCellParams(
        kernel=fused,
        adj=adj,
        bias=jnp.zeros((4, units_out), jnp.float32),
        attention=(init_attention(keys[4], units_out, a0.shape[0])
                   if attention else None),
    )


def _torch_linear_init(key, fan_in: int, fan_out: int, bias: bool):
    """torch.nn.Linear default init: U(±1/√fan_in) for weight and bias."""
    bound = 1.0 / (fan_in ** 0.5)
    kw, kb = jax.random.split(key)
    w = jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = (jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound)
         if bias else None)
    return w, b


def init_ggru_cell(key, units_in: int, units_out: int,
                   adjacency: jnp.ndarray) -> GGRUCellParams:
    r"""Init like ref net_aagc.py:324-340 (adjacency/gcn_kernel xavier; the
    template's *values* are intentionally unused — the reference overwrites
    them with xavier init, ref: net_aagc.py:334,339 — only its size is)."""
    n = jnp.asarray(adjacency).shape[0]
    keys = jax.random.split(key, 8)
    w_r, b_r = _torch_linear_init(keys[0], units_in, units_out, True)
    w_u, b_u = _torch_linear_init(keys[1], units_in, units_out, True)
    w_c, b_c = _torch_linear_init(keys[2], units_in, units_out, True)
    wh_r, _ = _torch_linear_init(keys[3], units_out, units_out, False)
    wh_u, _ = _torch_linear_init(keys[4], units_out, units_out, False)
    wh_c, _ = _torch_linear_init(keys[5], units_out, units_out, False)
    return GGRUCellParams(
        w_in=jnp.concatenate((w_r, w_u, w_c), axis=1),
        b_in=jnp.concatenate((b_r, b_u, b_c)),
        w_hid=jnp.concatenate((wh_r, wh_u, wh_c), axis=1),
        gcn_kernel=_xavier_uniform(keys[6], (units_out, units_out),
                                   torch_shape=(units_out, units_out)),
        adj=_xavier_uniform(keys[7], (n, n)).T,
    )
