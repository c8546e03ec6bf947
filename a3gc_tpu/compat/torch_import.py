r"""PyTorch checkpoint importer: reference ``.tar`` state_dicts → JAX pytrees.

The reference ships trained checkpoints as
``{'epoch': int, 'state_dict': OrderedDict}`` (ref: train_a3gc_tp.py:257).
This module converts those state_dicts into this framework's parameter
pytrees for numerical-parity testing and for serving reference-trained models
on TPU.

Layout conversions applied (see a3gc_tpu/models/cells.py docstring for the
conventions):

  * dense kernels: torch [out, in] → ours [in, out] (transpose);
  * adjacency matrices → our left-multiplying orientation:
      - AAGC projection & AAGC/A3GC cell gates: the reference computes
        ``einsum('bnf,nm->bmf', x, adj.t())`` = (stored ⋅ x), so the stored
        tensor IS the left-multiplier — copied as-is (ref: net_aagc.py:63,108);
      - AGC shared adjacency & G-GRU: the reference computes
        ``einsum('nm,bmf->bnf', adj.t(), x)`` = (storedᵀ ⋅ x) — transposed
        (ref: net_aagc.py:271,348);
  * the four gate kernels/biases are fused on the gate axis in order i,f,c,o;
  * cuDNN LSTM weights keep torch's native i,f,g,o gate blocks — only the
    [out, in] → [in, out] transpose is applied.

Works with numpy-only state dicts too (torch needed only to open ``.tar``).
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

from a3gc_tpu.models import cells as C
from a3gc_tpu.models import layers as L
from a3gc_tpu.models import nets as N

__all__ = [
    "load_torch_checkpoint", "graph_net_params_from_state_dict",
    "dip_params_from_state_dict",
]

GATE_ORDER = ("i", "f", "c", "o")


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    r"""Load a reference ``.tar`` checkpoint into a flat numpy state dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _strip_prefix(sd: Mapping[str, np.ndarray], prefix: str):
    out = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    return out if out else dict(sd)


def _graph_conv(sd: Mapping[str, np.ndarray], base: str) -> C.GraphConvParams:
    return C.GraphConvParams(
        kernel=jnp.asarray(sd[f"{base}.gcn_kernel"].T),
        adj=jnp.asarray(sd[f"{base}.adj"]),
        bias=jnp.asarray(sd[f"{base}.gcn_bias"]),
    )


def _attention(sd: Mapping[str, np.ndarray], base: str) -> C.AttentionParams:
    return C.AttentionParams(
        w=jnp.asarray(sd[f"{base}.attention_w"].T),
        wq=jnp.asarray(sd[f"{base}.attention_wq"].T),
        wh=jnp.asarray(sd[f"{base}.attention_wh"].T),
        u=jnp.asarray(sd[f"{base}.attention_u"].T),
        bs=jnp.asarray(sd[f"{base}.attention_bs"]),
        bu=jnp.asarray(sd[f"{base}.attention_bu"]),
    )


def _gcn_lstm_cell(sd: Mapping[str, np.ndarray], base: str,
                   cell: str) -> C.GCNLSTMCellParams:
    kernel = jnp.concatenate(
        [jnp.asarray(sd[f"{base}.gcn_kernel_{g}"].T) for g in GATE_ORDER],
        axis=1)
    bias = jnp.stack([jnp.asarray(sd[f"{base}.gcn_bias_{g}"])
                      for g in GATE_ORDER])
    if cell == "agc":
        # one shared fixed adjacency, applied as storedᵀ (ref: net_aagc.py:271)
        a = jnp.asarray(sd[f"{base}.adjacency"].T)
        adj = jnp.broadcast_to(a[None], (4,) + a.shape)
    else:
        # per-gate adjacencies, applied as stored (ref: net_aagc.py:108-117)
        adj = jnp.stack([jnp.asarray(sd[f"{base}.adjacency_{g}"])
                         for g in GATE_ORDER])
    attention = (_attention(sd, base)
                 if f"{base}.attention_w" in sd else None)
    return C.GCNLSTMCellParams(kernel=kernel, adj=adj, bias=bias,
                               attention=attention)


def _ggru_cell(sd: Mapping[str, np.ndarray], base: str) -> C.GGRUCellParams:
    def lin_w(name):
        return jnp.asarray(sd[f"{base}.{name}.weight"].T)

    def lin_b(name):
        return jnp.asarray(sd[f"{base}.{name}.bias"])

    return C.GGRUCellParams(
        w_in=jnp.concatenate(
            [lin_w("dense_r_in"), lin_w("dense_u_in"), lin_w("dense_c_in")],
            axis=1),
        b_in=jnp.concatenate(
            [lin_b("dense_r_in"), lin_b("dense_u_in"), lin_b("dense_c_in")]),
        w_hid=jnp.concatenate(
            [lin_w("dense_r_hid"), lin_w("dense_u_hid"), lin_w("dense_c_hid")],
            axis=1),
        gcn_kernel=jnp.asarray(sd[f"{base}.gcn_kernel"].T),
        adj=jnp.asarray(sd[f"{base}.adjacency"].T),
    )


def graph_net_params_from_state_dict(
        sd: Mapping[str, np.ndarray], cell: str,
        prefix: str = "pose_net.") -> N.GraphNetParams:
    r"""Convert a reference PoseNet/PoseNet3/PoseNet_AGC/PoseNet_GGRU
    state_dict (key schema: ``pose_net.{linear_in,rnn1,rnn2,linear_out}``,
    ``rnnX.directions.{0,1}.cell.*`` — ref: net_aagc.py:595-695)."""
    sd = _strip_prefix(sd, prefix)

    def cell_pair(rnn: str):
        if cell == "ggru":
            make = _ggru_cell
        else:
            def make(s, b):
                return _gcn_lstm_cell(s, b, cell)
        return L.stack_directions(
            make(sd, f"{rnn}.directions.0.cell"),
            make(sd, f"{rnn}.directions.1.cell"))

    return N.GraphNetParams(
        linear_in=_graph_conv(sd, "linear_in"),
        rnn1=cell_pair("rnn1"),
        rnn2=cell_pair("rnn2"),
        linear_out=_graph_conv(sd, "linear_out"),
    )


def dip_params_from_state_dict(sd: Mapping[str, np.ndarray],
                               prefix: str = "pose_net.",
                               n_layers: int = 2,
                               bidirectional: bool = True) -> N.DIPParams:
    r"""Convert a reference DIP / PoseNetTP / PoseNetDIP state_dict
    (key schema: ``pose_net.{linear1,linear2,rnn.weight_ih_l{k}[_reverse]}``
    — torch.nn.LSTM naming, ref: net_aagc.py:26-31)."""
    sd = _strip_prefix(sd, prefix)

    def dense(base):
        return N.DenseParams(kernel=jnp.asarray(sd[f"{base}.weight"].T),
                             bias=jnp.asarray(sd[f"{base}.bias"]))

    def lstm_dir(layer, reverse):
        sfx = f"l{layer}" + ("_reverse" if reverse else "")
        return N.LSTMLayerParams(
            w_ih=jnp.asarray(sd[f"rnn.weight_ih_{sfx}"].T),
            w_hh=jnp.asarray(sd[f"rnn.weight_hh_{sfx}"].T),
            b_ih=jnp.asarray(sd[f"rnn.bias_ih_{sfx}"]),
            b_hh=jnp.asarray(sd[f"rnn.bias_hh_{sfx}"]),
        )

    layers = []
    for layer in range(n_layers):
        if bidirectional:
            layers.append(L.stack_directions(lstm_dir(layer, False),
                                             lstm_dir(layer, True)))
        else:
            layers.append(lstm_dir(layer, False))
    return N.DIPParams(linear1=dense("linear1"), lstm=tuple(layers),
                       linear2=dense("linear2"))
