"""Streaming-query observability — the run-manifest layer for
streams (the batch side lives in metrics.py; reference parity:
the sidecar manifests + progress lines of SURVEY S14/F8).

`StreamProgressRecorder` is a StreamingQueryListener that captures
every micro-batch's progress event into a bounded in-memory ring and
can flush the run's summary to a JSON sidecar — the numbers an
operator actually pages on: per-batch input rows, processing rate,
batch duration, and the event-time watermark's advance. Listener
callbacks run on the driver's listener bus (tiny dicts per batch, no
executor cost, no plan change), so this composes with ANY sink and
any trigger at any scale; `max_batches` bounds driver memory for
long-running queries (ring buffer, oldest dropped).
"""

from __future__ import annotations

import json
import os
from collections import deque

from pyspark.sql.streaming import StreamingQueryListener


class StreamProgressRecorder(StreamingQueryListener):
    """Record per-batch progress for streaming queries.

    Usage:
        rec = StreamProgressRecorder(max_batches=1000)
        spark.streams.addListener(rec)
        ... run queries ...
        rec.summary(query_name)       # dict
        rec.write(out_dir)            # JSON sidecar per query name
        spark.streams.removeListener(rec)
    """

    def __init__(self, max_batches: int = 1000):
        self.max_batches = max_batches
        self._by_name: dict[str, deque] = {}

    # --- listener callbacks (driver-side, tiny) -----------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        name = p.name or str(p.id)
        ring = self._by_name.setdefault(
            name, deque(maxlen=self.max_batches))
        row = {
            "batch_id": p.batchId,
            "input_rows": p.numInputRows,
            "rows_per_sec": p.processedRowsPerSecond,
            "batch_ms": (p.durationMs or {}).get("triggerExecution"),
            "watermark": (p.eventTime or {}).get("watermark"),
        }
        ring.append(row)

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    # --- reporting -----------------------------------------------------
    def batches(self, name: str) -> list[dict]:
        return list(self._by_name.get(name, []))

    def summary(self, name: str) -> dict:
        rows = self.batches(name)
        done = [r for r in rows if r["input_rows"] is not None]
        total = sum(r["input_rows"] for r in done)
        marks = [r["watermark"] for r in rows if r["watermark"]]
        return {
            "name": name,
            "n_batches": len(rows),
            "total_input_rows": total,
            "max_rows_per_sec": max(
                (r["rows_per_sec"] or 0.0 for r in rows), default=0.0),
            "last_watermark": marks[-1] if marks else None,
            "watermark_advanced": (len(set(marks)) > 1) if marks else False,
        }

    def write(self, out_dir: str) -> list[str]:
        os.makedirs(out_dir, exist_ok=True)
        paths = []
        for name in self._by_name:
            path = os.path.join(out_dir, f"stream_{name}.json")
            with open(path, "w") as fh:
                json.dump({"summary": self.summary(name),
                           "batches": self.batches(name)}, fh, indent=1)
            paths.append(path)
        return paths
