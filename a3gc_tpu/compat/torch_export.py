r"""PyTorch checkpoint exporter: JAX parameter pytrees → reference ``.tar``.

The exact inverse of ``torch_import``: models trained on TPU with this
framework can be handed back to the reference's torch tooling
(``evaluate_a3gc_tp.py --path``, ``get_worst_frames.py`` flows) as
``{'epoch': int, 'state_dict': OrderedDict}`` checkpoints with the
reference's key schema and tensor layouts (ref: train_a3gc_tp.py:254-258
for the saved format, net_aagc.py:595-695 for the parameter names).

All layout conversions from the importer are reversed:

  * dense kernels: ours [in, out] → torch [out, in];
  * AAGC/A3GC per-gate adjacencies copied as-is; AGC shared adjacency and
    G-GRU adjacency transposed back (they are applied as storedᵀ in the
    reference, ref: net_aagc.py:271,348);
  * fused gate kernels/biases split back into per-gate tensors (i,f,c,o);
  * cuDNN LSTM blocks keep torch's native gate order.

NOTE the reference's own loading quirk (its adjacency Parameters are
``.t()`` views of one tensor, so its ``load_state_dict`` self-corrupts
them — see docs/PARITY.md) applies to OUR exports exactly as it does to
the reference's shipped checkpoints; de-alias the destination module
first, as the reference effectively requires.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from a3gc_tpu.models import nets as N

__all__ = ["graph_net_state_dict", "dip_state_dict",
           "save_torch_checkpoint"]

GATE_ORDER = ("i", "f", "c", "o")


def _np(a) -> np.ndarray:
    return np.asarray(a, dtype=np.float32)


def _take_dir(params2, d):
    import jax
    return jax.tree_util.tree_map(lambda a: a[d], params2)


def _graph_conv_sd(p, base: str, out: Dict[str, np.ndarray]):
    out[f"{base}.gcn_kernel"] = _np(p.kernel).T
    out[f"{base}.adj"] = _np(p.adj)
    out[f"{base}.gcn_bias"] = _np(p.bias)


def _gcn_lstm_cell_sd(p, base: str, cell: str, out: Dict[str, np.ndarray]):
    H = p.bias.shape[-1]
    for g, name in enumerate(GATE_ORDER):
        out[f"{base}.gcn_kernel_{name}"] = _np(
            p.kernel[:, g * H:(g + 1) * H]).T
        out[f"{base}.gcn_bias_{name}"] = _np(p.bias[g])
        if cell != "agc":
            out[f"{base}.adjacency_{name}"] = _np(p.adj[g])
    if cell == "agc":
        out[f"{base}.adjacency"] = _np(p.adj[0]).T
    if p.attention is not None:
        a = p.attention
        out[f"{base}.attention_w"] = _np(a.w).T
        out[f"{base}.attention_wq"] = _np(a.wq).T
        out[f"{base}.attention_wh"] = _np(a.wh).T
        out[f"{base}.attention_u"] = _np(a.u).T
        out[f"{base}.attention_bs"] = _np(a.bs)
        out[f"{base}.attention_bu"] = _np(a.bu)


def _ggru_cell_sd(p, base: str, out: Dict[str, np.ndarray], nira):
    H = p.w_in.shape[1] // 3
    for i, name in enumerate(("dense_r", "dense_u", "dense_c")):
        out[f"{base}.{name}_in.weight"] = _np(
            p.w_in[:, i * H:(i + 1) * H]).T
        out[f"{base}.{name}_in.bias"] = _np(p.b_in[i * H:(i + 1) * H])
        out[f"{base}.{name}_hid.weight"] = _np(
            p.w_hid[:, i * H:(i + 1) * H]).T
    out[f"{base}.gcn_kernel"] = _np(p.gcn_kernel).T
    out[f"{base}.adjacency"] = _np(p.adj).T
    # the reference cell also registers the FIXED template as a
    # (non-trainable, forward-unused) Parameter ``a``
    # (ref: net_aagc.py:324) — strict load_state_dict requires the key
    out[f"{base}.a"] = _np(nira)


def graph_net_state_dict(params: N.GraphNetParams, cell: str,
                         prefix: str = "pose_net.",
                         nira: np.ndarray = None
                         ) -> Dict[str, np.ndarray]:
    r"""Reference-schema state dict of a graph net (inverse of
    ``graph_net_params_from_state_dict``). ``nira`` is the fixed adjacency
    template the net was built with (G-GRU checkpoints carry it as the
    dead Parameter ``a``); defaults to the packaged template."""
    if cell == "ggru" and nira is None:
        from a3gc_tpu.data import load_adjacency_template
        nira = load_adjacency_template()
    out: Dict[str, np.ndarray] = {}
    _graph_conv_sd(params.linear_in, f"{prefix}linear_in", out)
    for rnn, p2 in (("rnn1", params.rnn1), ("rnn2", params.rnn2)):
        for d in (0, 1):
            base = f"{prefix}{rnn}.directions.{d}.cell"
            p = _take_dir(p2, d)
            if cell == "ggru":
                _ggru_cell_sd(p, base, out, nira)
            else:
                _gcn_lstm_cell_sd(p, base, cell, out)
    _graph_conv_sd(params.linear_out, f"{prefix}linear_out", out)
    return out


def dip_state_dict(params: N.DIPParams, prefix: str = "pose_net."
                   ) -> Dict[str, np.ndarray]:
    r"""Reference-schema state dict of a DIP/TransPose biLSTM net
    (torch.nn.LSTM key naming; inverse of ``dip_params_from_state_dict``)."""
    out: Dict[str, np.ndarray] = {}
    out[f"{prefix}linear1.weight"] = _np(params.linear1.kernel).T
    out[f"{prefix}linear1.bias"] = _np(params.linear1.bias)
    for layer, lp2 in enumerate(params.lstm):
        bidirectional = lp2.w_ih.ndim == 3
        for d in range(2 if bidirectional else 1):
            lp = _take_dir(lp2, d) if bidirectional else lp2
            sfx = f"l{layer}" + ("_reverse" if d else "")
            out[f"{prefix}rnn.weight_ih_{sfx}"] = _np(lp.w_ih).T
            out[f"{prefix}rnn.weight_hh_{sfx}"] = _np(lp.w_hh).T
            out[f"{prefix}rnn.bias_ih_{sfx}"] = _np(lp.b_ih)
            out[f"{prefix}rnn.bias_hh_{sfx}"] = _np(lp.b_hh)
    out[f"{prefix}linear2.weight"] = _np(params.linear2.kernel).T
    out[f"{prefix}linear2.bias"] = _np(params.linear2.bias)
    return out


def save_torch_checkpoint(path: str, state_dict: Dict[str, np.ndarray],
                          epoch: int = 0) -> str:
    r"""Write the reference's ``.tar`` format
    (``{'epoch', 'state_dict'}``, ref: train_a3gc_tp.py:254-258)."""
    import collections

    import torch

    sd = collections.OrderedDict(
        (k, torch.from_numpy(np.ascontiguousarray(v)))
        for k, v in state_dict.items())
    torch.save({"epoch": epoch, "state_dict": sd}, path)
    return path
