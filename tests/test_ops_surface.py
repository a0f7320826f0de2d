"""Ops surface: run reports / alerts (T5, T6), HTTP health probe
(S9), connection open-retry and engine-level cancel."""

from __future__ import annotations

import http.server
import threading

import pytest

from dbt_eamples_spark.sources.connections import (
    cancel_group,
    cancellable,
    retry_connection,
)
from dbt_eamples_spark.sources.health import (
    HealthProbeFailed,
    probe_url,
    probe_url_df,
)
from dbt_eamples_spark.streaming.reports import (
    LocalReportSink,
    RunReportListener,
    build_alert,
    build_run_report,
)


class TestRunReport:
    def test_non_empty_batch_report_content(self, tmp_path):
        sink = LocalReportSink(str(tmp_path / "reports.jsonl"))
        report = build_run_report(
            [(1, "click", 9.5), (2, "view", 0.1)],
            ["event_id", "event_type", "value"],
            source="events_sink",
            run_id="batch-0",
            total=77,
        )
        assert report is not None
        sink.emit(report)
        (got,) = sink.read_all()
        assert got["text"] == "Found 77 new rows from events_sink"
        assert got["fields"]["rows"] == 77
        # sample table: one header line + one line per sample row
        body = "".join(got["chunks"])
        assert "*event_id* | *event_type* | *value*" in body
        assert "1 | click | 9.5" in body and "2 | view | 0.1" in body

    def test_empty_batch_skips_report(self):
        assert (
            build_run_report([], ["a"], source="s", run_id="r") is None
        )  # skip-if-empty, like the reference's early return

    def test_long_table_chunked(self):
        rows = [(i, "x" * 400) for i in range(20)]
        report = build_run_report(
            rows, ["id", "blob"], source="s", run_id="r", chunk_chars=3000
        )
        assert len(report["chunks"]) > 1
        assert all(len(c) <= 3000 for c in report["chunks"])

    def test_alert_colors(self):
        ok = build_alert("success", source="s", run_id="r")
        bad = build_alert("failed", source="s", run_id="r", error="boom")
        assert ok["color"] == "#00FF00"
        assert bad["color"] == "#FF0000" and bad["fields"]["error"] == "boom"

    def test_stream_append_emits_report_then_skips_on_rerun(
        self, spark, sf_dir, tmp_path
    ):
        from dbt_eamples_spark.streaming.streams import (
            stream_incremental_append,
        )

        sink = LocalReportSink(str(tmp_path / "stream_reports.jsonl"))
        out = str(tmp_path / "sink")
        stream_incremental_append(
            spark,
            sf_dir,
            checkpoint=str(tmp_path / "c1"),
            sink_path=out,
            report_sink=sink,
        )
        first = sink.read_all()
        assert len(first) >= 1
        assert sum(r["fields"]["rows"] for r in first) == (
            spark.read.parquet(out).count()
        )
        # rerun appends nothing -> NO new report lines (skip-if-empty)
        stream_incremental_append(
            spark,
            sf_dir,
            checkpoint=str(tmp_path / "c2"),
            sink_path=out,
            report_sink=sink,
        )
        assert sink.read_all() == first

    def test_listener_reports_progress_rows(self, spark, sf_dir, tmp_path):
        import uuid

        from dbt_eamples_spark.streaming.streams import (
            stream_incremental_append,
        )

        sink = LocalReportSink(str(tmp_path / "listener.jsonl"))
        listener = RunReportListener(sink)
        spark.streams.addListener(listener)
        try:
            stream_incremental_append(
                spark,
                sf_dir,
                checkpoint=str(tmp_path / f"cl_{uuid.uuid4().hex[:6]}"),
                sink_path=str(tmp_path / "lsink"),
            )
            # listener events are async on the bus thread — poll briefly
            import time

            deadline = time.time() + 30
            while time.time() < deadline:
                rows = [
                    r
                    for r in sink.read_all()
                    if r["type"] == "report" and r["fields"]["rows"] > 0
                ]
                if rows:
                    break
                time.sleep(0.5)
            assert rows, "listener emitted no non-empty batch report"
        finally:
            spark.streams.removeListener(listener)


class _Handler(http.server.BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802 (stdlib API)
        status = 200 if self.path == "/ok" else 503
        self.send_response(status)
        self.send_header("Content-Length", "2")
        self.end_headers()
        self.wfile.write(b"hi")

    def log_message(self, *a):  # silence test output
        pass


@pytest.fixture(scope="module")
def http_server():
    srv = http.server.HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


class TestHealthProbe:
    def test_200_ok(self, http_server):
        row = probe_url(f"{http_server}/ok")
        assert row["ok"] and row["status"] == 200
        assert row["elapsed_ms"] >= 0

    def test_non_200_raises_with_status(self, http_server):
        with pytest.raises(HealthProbeFailed) as ei:
            probe_url(f"{http_server}/down")
        assert "503" in str(ei.value)

    def test_unreachable_raises(self):
        with pytest.raises(HealthProbeFailed):
            probe_url("http://127.0.0.1:1/ok", timeout=0.5)

    def test_probe_df_one_row(self, spark, http_server):
        df = probe_url_df(spark, f"{http_server}/ok")
        (r,) = df.collect()
        assert r.ok is True and r.status == 200

    def test_cli_health_exit_codes(self, http_server, capsys):
        from dbt_eamples_spark.cli import main

        assert main(["health", "--url", f"{http_server}/ok"]) == 0
        assert "OK" in capsys.readouterr().out
        assert main(["health", "--url", f"{http_server}/down"]) == 1
        assert "FAIL" in capsys.readouterr().out


class _Flaky:
    def __init__(self, fail_times: int, exc: type[Exception]) -> None:
        self.remaining = fail_times
        self.exc = exc
        self.calls = 0

    def __call__(self):
        self.calls += 1
        if self.remaining > 0:
            self.remaining -= 1
            raise self.exc("not yet")
        return "handle"


class TestRetryConnection:
    def test_backoff_then_success(self):
        sleeps: list[float] = []
        conn = _Flaky(2, ConnectionError)
        out = retry_connection(
            conn,
            retries=3,
            retryable_exceptions=(ConnectionError,),
            sleep=sleeps.append,
        )
        assert out == "handle" and conn.calls == 3
        assert sleeps == [1.0, 4.0]  # attempt² like the reference

    def test_non_retryable_propagates_immediately(self):
        conn = _Flaky(5, ValueError)
        with pytest.raises(ValueError):
            retry_connection(
                conn,
                retries=3,
                retryable_exceptions=(ConnectionError,),
                sleep=lambda s: None,
            )
        assert conn.calls == 1

    def test_exhaustion_raises_original(self):
        conn = _Flaky(10, ConnectionError)
        with pytest.raises(ConnectionError):
            retry_connection(
                conn,
                retries=2,
                retryable_exceptions=(ConnectionError,),
                sleep=lambda s: None,
            )
        assert conn.calls == 3  # 1 + 2 retries


class TestCancelGroup:
    def test_cancel_aborts_inflight_job(self, spark, tmp_path):
        import os
        import time

        from pyspark.sql import functions as F

        errors: list[BaseException] = []
        sentinel_dir = str(tmp_path / "task-started")
        os.makedirs(sentinel_dir, exist_ok=True)

        def slow_task(x):
            # signal task start BEFORE sleeping so the driver cancels
            # only once work is verifiably in flight (local mode —
            # executor threads share the test filesystem)
            with open(os.path.join(sentinel_dir, f"task-{x}"), "w"):
                pass
            time.sleep(120)
            return x

        def slow_job():
            try:
                with cancellable(spark, "cancel-test", "slow scan"):
                    # 4 tasks × 120 s sleep each — unfinishable inside
                    # the join window unless the cancel lands
                    df = spark.range(4, numPartitions=4).select(
                        F.udf(slow_task, "long")("id")
                    )
                    df.collect()
            except BaseException as e:  # noqa: BLE001 — assert on it below
                errors.append(e)

        t = threading.Thread(target=slow_job)
        t.start()
        deadline = time.time() + 60
        while time.time() < deadline and not os.listdir(sentinel_dir):
            time.sleep(0.1)
        assert os.listdir(sentinel_dir), "no task started within 60 s"
        cancel_group(spark, "cancel-test")
        t.join(timeout=60)
        assert not t.is_alive(), "job was not cancelled in time"
        assert errors, "cancelled action should raise in its caller"


class TestTuneCli:
    def test_tune_prints_operating_point(self, capsys):
        from dbt_eamples_spark.cli import main

        assert main(["tune", "--n-rows", "1000000000"]) == 0
        out = capsys.readouterr().out
        assert "lsh_planes=24" in out
        assert "ivf_cells=31622" in out
