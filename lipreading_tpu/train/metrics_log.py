"""Structured metrics logging (ref: stdout + tensorboardX — SURVEY.md §6).

JSONL is the source of truth (machine-readable, diff-able); TensorBoard is an
optional mirror when the package is importable.
"""

from __future__ import annotations

import json
import os
import time


class MetricsLogger:
    def __init__(self, log_dir: str, tensorboard: bool = False, echo: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self.f = open(self.path, "a")
        self.echo = echo
        self.tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(log_dir)
            except Exception:
                self.tb = None

    def log(self, step: int, **scalars) -> None:
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self.f.write(json.dumps(rec) + "\n")
        self.f.flush()
        if self.echo:
            vals = " ".join(f"{k}={float(v):.4g}" for k, v in scalars.items())
            print(f"[step {step}] {vals}", flush=True)
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(k, float(v), step)

    def log_text(self, step: int, tag: str, text: str) -> None:
        self.f.write(json.dumps({"step": step, tag: text}) + "\n")
        self.f.flush()
        if self.echo:
            print(f"[step {step}] {tag}: {text}", flush=True)

    def close(self) -> None:
        self.f.close()
        if self.tb is not None:
            self.tb.close()
