r"""Observability: structured JSONL metrics + the reference's text reports.

The reference logs via stdout/tqdm and appends text reports to
``evaluation_results/{model}.txt`` containing dataset, offline time, and the
five metrics mean±std (ref: evaluate_a3gc_tp.py:181-187, train_a3gc_tp.py:252).
The text report is kept byte-compatible (it is the comparable artifact);
training/eval additionally emit machine-readable JSONL.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np

__all__ = ["JsonlLogger", "write_eval_report"]


class JsonlLogger:
    r"""Append-mode JSONL event logger (one object per line, wall-clock
    stamped). Replaces tqdm/print-only logging (ref: train_a3gc_tp.py:77-79)."""

    def __init__(self, path: Optional[str], echo: bool = True):
        self.path = path
        self.echo = echo
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def __call__(self, event: dict):
        event = dict(event, time=time.time())
        line = json.dumps(event, default=float)
        if self.path:
            with open(self.path, "a") as f:
                f.write(line + "\n")
        if self.echo:
            print(line, flush=True)


def write_eval_report(path: str, dataset: str, offline_time: float,
                      errors, metric_names) -> str:
    r"""Append a text report in the reference's exact format
    (ref: evaluate_a3gc_tp.py:45-50,183-187)."""
    errors = np.asarray(errors)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a") as f:
        f.write("Dataset: {}\n".format(dataset))
        f.write("offline time {}\n".format(offline_time))
        for i, name in enumerate(metric_names):
            f.write("%s: %.2f (+/- %.2f)\n" % (name, errors[i, 0],
                                               errors[i, 1]))
    return path
