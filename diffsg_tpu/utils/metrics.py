"""Structured metrics logging.

The reference's observability is print statements (per-epoch loss, the eval
report block — SURVEY.md §5).  This logger reproduces those quantities as a
structured record stream: JSONL to disk + optional CSV, with wall-clock
timestamps, so eval reports are machine-readable.
"""

from __future__ import annotations

import csv
import json
import pathlib
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, also_print: bool = True):
        self.path = pathlib.Path(path) if path else None
        self.also_print = also_print
        if self.path:
            self.path.parent.mkdir(parents=True, exist_ok=True)
        self._t0 = time.time()

    def log(self, record: Dict, **kw) -> Dict:
        rec = dict(record, **kw)
        rec.setdefault("elapsed_s", round(time.time() - self._t0, 3))
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec, default=float) + "\n")
        if self.also_print:
            print(json.dumps(rec, default=float))
        return rec


def write_csv(path: str, rows, header=None) -> None:
    """Small CSV writer for trajectory dumps (matches the reference's
    header-less pandas to_csv outputs)."""
    p = pathlib.Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    with open(p, "w", newline="") as f:
        w = csv.writer(f)
        if header:
            w.writerow(header)
        w.writerows(rows)
