"""Structured per-step metric logging (SURVEY.md §5 metrics row).

The reference prints loss lines to stdout; here scalars go to stdout
AND an optional JSONL file (machine-readable for dashboards /
TensorBoard conversion) with wall-clock and step attached.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import IO, Optional


class MetricLogger:
    def __init__(
        self,
        prefix: str = "",
        jsonl_path: Optional[str] = None,
        stream: IO = sys.stdout,
        tensorboard_dir: Optional[str] = None,
    ):
        self.prefix = prefix
        self.stream = stream
        if jsonl_path and os.path.dirname(jsonl_path):
            os.makedirs(os.path.dirname(jsonl_path), exist_ok=True)
        self._jsonl = open(jsonl_path, "a") if jsonl_path else None
        self._tb = None
        if tensorboard_dir:
            try:  # tf is an optional dependency of the logging path only
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(tensorboard_dir)
            except ImportError:
                print(
                    "[logging] tensorflow unavailable; TensorBoard "
                    "scalars disabled (JSONL still written)",
                    file=sys.stderr,
                )
        self._t0 = time.time()

    def log(self, step: int, **scalars: float) -> None:
        msg = " ".join(
            f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
            for k, v in scalars.items()
        )
        print(f"[{self.prefix}] step={step} {msg}", file=self.stream, flush=True)
        if self._jsonl:
            rec = {"t": time.time() - self._t0, "step": step, **scalars}
            self._jsonl.write(json.dumps(rec) + "\n")
            self._jsonl.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in scalars.items():
                    if isinstance(v, (int, float)):
                        tf.summary.scalar(
                            f"{self.prefix}/{k}" if self.prefix else k,
                            v, step=step,
                        )
            self._tb.flush()

    def close(self) -> None:
        if self._jsonl:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
