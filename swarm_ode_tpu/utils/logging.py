"""Structured experiment logging with an optional wandb adapter.

The reference logs through prints plus wandb projects
`graph-ode-warehouse` and `swarm_ode` (train_gde.py:463-467,
run_gnode.py:1329-1333). Here metrics go through one structured logger;
wandb attaches when the package is importable, else logs fall back to
stdout lines and an in-memory history (also written as JSONL).
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(
        self,
        project: str,
        name: Optional[str] = None,
        config: Optional[Dict] = None,
        out_dir: Optional[str] = None,
        use_wandb: bool = True,
    ):
        self.project = project
        self.name = name or f"run_{int(time.time())}"
        self.config = config or {}
        self.history = []
        self._wandb = None
        if use_wandb:
            try:  # pragma: no cover — wandb not installed in this image
                import wandb

                self._wandb = wandb
                wandb.init(project=project, name=self.name, config=config)
            except Exception:
                self._wandb = None
        self._file = None
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            self._file = open(
                os.path.join(out_dir, f"{self.name}.jsonl"), "a"
            )

    def log(self, metrics: Dict, step: Optional[int] = None, echo: bool = False):
        rec = {k: _to_py(v) for k, v in metrics.items()}
        if step is not None:
            rec["step"] = step
        self.history.append(rec)
        if self._wandb is not None:  # pragma: no cover
            self._wandb.log(metrics, step=step)
        if self._file is not None:
            self._file.write(json.dumps(rec) + "\n")
            self._file.flush()
        if echo:
            print(" | ".join(f"{k}={v}" for k, v in rec.items()), flush=True)

    def finish(self):
        if self._wandb is not None:  # pragma: no cover
            self._wandb.finish()
        if self._file is not None:
            self._file.close()


def _to_py(v):
    try:
        import numpy as np

        a = np.asarray(v)
        if a.ndim == 0:
            return a.item()
        return a.tolist()
    except Exception:
        return v
