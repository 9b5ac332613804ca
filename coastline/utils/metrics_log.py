"""Structured run logging (SURVEY.md §5.5 — the reference logs via print
and pickled dicts only). One JSON object per line; cheap to append, easy to
join with BENCH_r*.json artifacts."""

import json
import os
import time
from typing import Optional


class JsonlLogger:
    def __init__(self, path: Optional[str]):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def log(self, **record):
        if not self.path:
            return
        record.setdefault("t", time.time())
        with open(self.path, "a") as f:
            f.write(json.dumps(record, default=float) + "\n")
