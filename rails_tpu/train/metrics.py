"""Metrics / logging: TensorBoard scalars + machine-parseable JSONL.

Reference: rank-0 `SummaryWriter` scalars for losses/lr/eval metrics
(`/root/reference/train.py:317-323,432-459`, `data/eval.py:278-292`) and CSV
lines for machine parsing (`eval_from_checkpoint.py:508-515`). The JSONL
stream is the primary machine format here; TensorBoard is attached when the
writer library is importable.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional

logger = logging.getLogger("rails_tpu")


class MetricsWriter:
    def __init__(self, log_dir: Optional[str], use_tensorboard: bool = True):
        self._tb = None
        self._jsonl = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
            if use_tensorboard:
                try:
                    from torch.utils.tensorboard import SummaryWriter

                    self._tb = SummaryWriter(log_dir=log_dir)
                except Exception:   # pragma: no cover - optional dep
                    self._tb = None

    def write(self, step: int, metrics: Dict[str, float], prefix: str = "") -> None:
        rec = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            key = f"{prefix}/{k}" if prefix else k
            try:
                rec[key] = float(v)
            except (TypeError, ValueError):
                continue
            if self._tb is not None:
                self._tb.add_scalar(key, rec[key], step)
        if self._jsonl is not None:
            self._jsonl.write(json.dumps(rec) + "\n")
            self._jsonl.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.flush()
            self._tb.close()
        if self._jsonl is not None:
            self._jsonl.close()
