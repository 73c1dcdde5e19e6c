"""Structured observability (framework addition; SURVEY.md section 5).

The reference only `print`s (handler.py:167-168,83-84). We keep those
console lines byte-compatible in the engine and add a JSONL stream of
per-epoch records (loss, step time, windows/s, edges/s, MAE, LR) that the
bench harness and dashboards consume.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class JsonlLogger:
    def __init__(self, path: Optional[str]):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def log(self, record: Dict[str, Any]) -> None:
        if not self.path:
            return
        record = dict(record)
        record.setdefault("ts", time.time())
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")


class Timer:
    """Context-manager wall timer."""

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self.start
        return False
