"""Experiment tracking: wandb-compatible, JSONL-backed.

The reference optionally logs to wandb (fake_quant/main.py:20-24,168,230-231)
and otherwise scrapes run logs with regexes (scripts/read.py).  Here every
run writes structured JSONL unconditionally — machine-readable without
scraping — and mirrors to wandb when the package is installed and
`wandb=True` is requested.
"""

from __future__ import annotations

import json
import os
import time


class Tracker:
    """Minimal run tracker.

    track = Tracker(run_dir, config={...}, wandb_project=None)
    track.log({"ppl": 5.4}); track.summary({"acc_avg": 0.61}); track.finish()
    """

    def __init__(self, run_dir: str, config: dict | None = None,
                 wandb_project: str | None = None, run_name: str | None = None):
        os.makedirs(run_dir, exist_ok=True)
        self.path = os.path.join(run_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._t0 = time.time()
        self._wandb = None
        if wandb_project:
            try:
                import wandb
                self._wandb = wandb.init(project=wandb_project, name=run_name,
                                         config=config or {}, dir=run_dir)
            except Exception:  # wandb absent or offline — JSONL still records
                self._wandb = None
        if config is not None:
            with open(os.path.join(run_dir, "config.json"), "w") as f:
                json.dump(config, f, indent=1, default=str)

    def log(self, metrics: dict, step: int | None = None):
        rec = {"t": round(time.time() - self._t0, 3), **metrics}
        if step is not None:
            rec["step"] = step
        self._f.write(json.dumps(rec, default=float) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def summary(self, metrics: dict):
        self.log({"summary": True, **metrics})
        if self._wandb is not None:
            for k, v in metrics.items():
                self._wandb.summary[k] = v

    def finish(self):
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.finish()
