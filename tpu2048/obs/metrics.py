"""Structured metrics stream.

The reference keeps a per-agent ``train_history`` list of ma-100
scores, persisted inside the agent pickle and charted by the web UI
(``r_learning.py:315-317``, ``application.py:675-693``).  Here metrics
are an append-only JSONL artifact per agent (``m/<name>.jsonl``) with
typed records — chartable by any client, plus a helper that recovers
the train-history series.
"""

from __future__ import annotations

import json
import time
from typing import Any, Dict, List, Optional

from ..store.artifacts import ArtifactStore


def metrics_key(name: str) -> str:
    return f"m/{name}.jsonl"


class MetricsWriter:
    def __init__(self, store: ArtifactStore, name: str):
        self.store = store
        self.key = metrics_key(name)

    def write(self, record: Dict[str, Any]) -> None:
        record = dict(record)
        record.setdefault("ts", round(time.time(), 3))
        self.store.append_text(self.key, json.dumps(record) + "\n")

    def read(self) -> List[Dict[str, Any]]:
        raw = self.store.load(self.key)
        if not raw:
            return []
        out = []
        for line in raw.splitlines():
            line = line.strip()
            if line:
                try:
                    out.append(json.loads(line))
                except json.JSONDecodeError:
                    continue
        return out


def train_history(store: ArtifactStore, name: str) -> List[int]:
    """ma-100 score series (one point per 100 completed episodes),
    the reference's chart data (x = episodes * 100)."""
    return [
        int(r["ma100"])
        for r in MetricsWriter(store, name).read()
        if r.get("kind") == "ma100"
    ]
