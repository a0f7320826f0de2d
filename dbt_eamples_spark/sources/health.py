"""HTTP health probe — the uptime check the reference schedules as a
cron DAG (helix-flow/dags/devops/beta_ipfs_node_ping_dag.py:8-21):
request with a 5 s timeout, success iff HTTP 200, a typed exception
otherwise (non-200 carries the status code; a timeout carries a
message). Re-expressed as a plain driver-side utility plus a one-row
DataFrame op so pipelines can join/store probe results like any
other table.
"""

from __future__ import annotations

import time
import urllib.error
import urllib.request

from pyspark.sql import DataFrame, SparkSession

PROBE_TIMEOUT_S = 5.0


class HealthProbeFailed(Exception):
    """Probe did not return HTTP 200 within the timeout."""


def probe_url(url: str, timeout: float = PROBE_TIMEOUT_S) -> dict:
    """GET ``url``; return ``{url, status, ok, elapsed_ms}``.
    Raises HealthProbeFailed on non-200 or timeout (mirrors the
    reference's raise-on-failure contract so a scheduler marks the
    run failed and alerts)."""
    t0 = time.monotonic()
    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp:
            status = resp.status
    except urllib.error.HTTPError as e:  # non-2xx that still responded
        raise HealthProbeFailed(e.code) from e
    except (urllib.error.URLError, TimeoutError, OSError) as e:
        raise HealthProbeFailed(f"request timed out or failed: {e}") from e
    elapsed_ms = int((time.monotonic() - t0) * 1000)
    if status != 200:
        raise HealthProbeFailed(status)
    return {"url": url, "status": status, "ok": True, "elapsed_ms": elapsed_ms}


def probe_url_df(
    spark: SparkSession, url: str, timeout: float = PROBE_TIMEOUT_S
) -> DataFrame:
    """One-row DataFrame form of :func:`probe_url` — the probe runs
    on the DRIVER (one request total, not one per task; parallelism
    would hammer the probed endpoint) and the result becomes a row
    for audit sinks."""
    row = probe_url(url, timeout)
    return spark.createDataFrame(
        [(row["url"], row["status"], row["ok"], row["elapsed_ms"])],
        "url string, status int, ok boolean, elapsed_ms long",
    )
