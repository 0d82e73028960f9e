"""Experiment logger: opt dump, timestamped text log, tensorboard-style scalars.

Parity target: `Logger` (src/lib/logger.py:24-92). Tensorboard summaries are written
with flax's metric_writers-free fallback: scalars go to a CSV + the text log (the
environment has no tensorboard package guarantee); the file layout (opt.txt,
log.txt, scalars) matches the reference's experiment-directory convention.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Mapping


class Logger:
    def __init__(self, exp_dir: str, config=None):
        os.makedirs(exp_dir, exist_ok=True)
        self.exp_dir = exp_dir
        self.log_path = os.path.join(exp_dir, "log.txt")
        self.scalar_path = os.path.join(exp_dir, "scalars.jsonl")
        if config is not None:
            with open(os.path.join(exp_dir, "opt.txt"), "w") as f:
                if dataclasses.is_dataclass(config):
                    for k, v in sorted(dataclasses.asdict(config).items()):
                        f.write(f"{k}: {v}\n")
                else:
                    f.write(str(config))
        self._start = time.time()

    def write(self, msg: str):
        stamp = time.strftime("%Y-%m-%d-%H-%M-%S")
        with open(self.log_path, "a") as f:
            f.write(f"[{stamp}] {msg}\n")

    def scalars(self, step: int, values: Mapping[str, float], prefix: str = ""):
        rec = {"step": int(step), "time": time.time() - self._start}
        rec.update({f"{prefix}{k}": float(v) for k, v in values.items()})
        with open(self.scalar_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
