"""Run reports and failure alerts for streaming/incremental jobs.

Mirrors the reference's notifier pair (helix-flow/utils/
slack_utils.py:39-113) without the chat dependency: ``slack_report``
becomes :func:`build_run_report` — skip-if-empty, a count headline,
a pipe-delimited sample table split into ≤``chunk_chars`` chunks,
and run-metadata fields; ``slack_alert`` becomes
:func:`build_alert` — state + green/red color + metadata. Payloads
go to a :class:`LocalReportSink` (JSON lines on the local FS), the
hermetic stand-in for a webhook poster.

:class:`RunReportListener` is the engine-level wiring the reference
lacks an analogue for in-process: a ``StreamingQueryListener`` that
emits one report per non-empty micro-batch (from the progress
event's row counters — no extra data pass) and a failure alert when
a query terminates with an exception. Attach once per session via
``spark.streams.addListener``; it observes EVERY query, which is
the T5/T6 run-report + alerting surface.
"""

from __future__ import annotations

import json
import os
import threading
from typing import Sequence

from pyspark.sql.streaming import StreamingQueryListener

REPORT_CHUNK_CHARS = 3000
REPORT_MAX_ROWS = 20


class LocalReportSink:
    """Append-only JSON-lines sink; thread-safe (listener callbacks
    arrive on a listener-bus thread, reports on the caller's)."""

    def __init__(self, path: str) -> None:
        self.path = path
        self._lock = threading.Lock()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def emit(self, payload: dict) -> None:
        line = json.dumps(payload, default=str)
        with self._lock:
            with open(self.path, "a") as f:
                f.write(line + "\n")

    def read_all(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(ln) for ln in f if ln.strip()]


def _chunk(text: str, n: int) -> list[str]:
    return [text[i : i + n] for i in range(0, len(text), n)]


def build_run_report(
    rows: Sequence[Sequence],
    columns: Sequence[str],
    *,
    source: str,
    run_id: str,
    total: int | None = None,
    chunk_chars: int = REPORT_CHUNK_CHARS,
) -> dict | None:
    """Report payload for one batch of produced rows, or ``None``
    when there is nothing to report (the reference returns early on
    an empty pull — no empty pings). ``rows`` is a bounded SAMPLE
    (≤REPORT_MAX_ROWS — never hand this a full partition); ``total``
    carries the real count when the caller knows it."""
    if not rows:
        return None
    n = total if total is not None else len(rows)
    header = f"Found {n} new rows from {source}"
    table_header = " | ".join(f"*{c}*" for c in columns)
    table_rows = "\n".join(
        " | ".join(str(v) for v in row) for row in rows[:REPORT_MAX_ROWS]
    )
    return {
        "type": "report",
        "text": header,
        "chunks": _chunk(f"{table_header}\n{table_rows}", chunk_chars),
        "fields": {"source": source, "run_id": run_id, "rows": n},
    }


def build_alert(
    state: str, *, source: str, run_id: str, error: str | None = None
) -> dict:
    """Failure/success alert payload — red unless success, like the
    reference's color switch (slack_utils.py:45-48)."""
    return {
        "type": "alert",
        "text": f"Run {state.capitalize()} Alert for: {source}",
        "color": "#00FF00" if state == "success" else "#FF0000",
        "fields": {
            "source": source,
            "run_id": run_id,
            "state": state,
            **({"error": error} if error else {}),
        },
    }


class RunReportListener(StreamingQueryListener):
    """Per-batch run reports + terminal failure alerts for every
    streaming query on the session.

    Uses only the listener-bus progress events (batch id + input row
    count) — zero extra jobs, so attaching it costs nothing at any
    scale. Empty batches are skipped, matching the report
    contract."""

    def __init__(self, sink: LocalReportSink) -> None:
        self.sink = sink

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        n = int(p.numInputRows)
        if n == 0:
            return
        self.sink.emit(
            {
                "type": "report",
                "text": f"Batch {p.batchId}: {n} input rows",
                "fields": {
                    "source": p.name or str(p.id),
                    "run_id": str(p.runId),
                    "batch_id": p.batchId,
                    "rows": n,
                },
            }
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        if event.exception is not None:
            self.sink.emit(
                build_alert(
                    "failed",
                    source=str(event.id),
                    run_id=str(event.runId),
                    error=str(event.exception),
                )
            )
