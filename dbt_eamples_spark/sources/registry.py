"""Named-connection registry (SURVEY.md §2.1 S11; VERDICT r7 #8 —
the last reference file with no engine analogue).

Reference semantics (`/root/reference/helix-flow/scripts/
manage_connections.py:5-22`): ``create_connection(conn_id,
conn_type, password)`` is a GET-OR-CREATE — an existing ``conn_id``
is returned untouched (idempotent: the script reruns on every
deploy), secrets come from environment variables at call time, and
typed extras ride along (``{"timeout": "42"}``). The engine version
is the same contract for Spark sources: a ``conn_id`` resolves to a
URL + credential-ENV-REFERENCE + driver extras, consumed by
``read_jdbc_named`` / ``append_jdbc_named`` so multi-source
pipelines wire credentials once, not per call.

Secrets posture: the registry stores the NAME of the environment
variable (``password_env``), never the secret — resolution happens
inside the consuming call, so a dumped/logged registry leaks
nothing and a rotated secret is picked up without re-registering.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class NamedConnection:
    conn_id: str
    conn_type: str  # e.g. "jdbc"
    url: str
    user: str | None = None
    password_env: str | None = None  # ENV VAR NAME, resolved lazily
    extra: dict = field(default_factory=dict)  # driver options

    def resolve_password(self) -> str | None:
        """Secret at CALL time from the referenced env var —
        ``None`` when unset (sources that need no auth) rather than
        an error, matching the reference's ``os.environ.get``."""
        if self.password_env is None:
            return None
        return os.environ.get(self.password_env)


class ConnectionRegistry:
    """conn_id → NamedConnection with get-or-create semantics."""

    def __init__(self) -> None:
        self._conns: dict[str, NamedConnection] = {}

    def create_connection(
        self,
        conn_id: str,
        conn_type: str,
        url: str,
        *,
        user: str | None = None,
        password_env: str | None = None,
        extra: dict | None = None,
    ) -> NamedConnection:
        """Idempotent get-or-create: an existing ``conn_id`` is
        returned UNTOUCHED (the reference's first-writer-wins query
        → add → commit shape), so deploy scripts can re-run safely
        and cannot silently re-point a name another job relies on.
        Use :meth:`drop` + create to re-point deliberately."""
        existing = self._conns.get(conn_id)
        if existing is not None:
            return existing
        conn = NamedConnection(
            conn_id=conn_id,
            conn_type=conn_type,
            url=url,
            user=user,
            password_env=password_env,
            extra=dict(extra or {}),
        )
        self._conns[conn_id] = conn
        return conn

    def get(self, conn_id: str) -> NamedConnection:
        try:
            return self._conns[conn_id]
        except KeyError:
            raise KeyError(
                f"unknown conn_id {conn_id!r}; registered: "
                f"{sorted(self._conns)}"
            ) from None

    def drop(self, conn_id: str) -> None:
        self._conns.pop(conn_id, None)

    def list_ids(self) -> list[str]:
        return sorted(self._conns)


# process-wide default, the shape the reference's session-backed
# store gives Airflow tasks
DEFAULT_REGISTRY = ConnectionRegistry()


def _jdbc_kwargs(conn: NamedConnection, kwargs: dict) -> dict:
    """Fold the connection's credentials + extras into read_jdbc /
    append_jdbc options (caller-passed options win over extras —
    per-call overrides, the Airflow ``extra`` precedence)."""
    if conn.conn_type != "jdbc":
        raise ValueError(
            f"conn_id {conn.conn_id!r} is {conn.conn_type!r}, not jdbc"
        )
    options = {**{str(k): str(v) for k, v in conn.extra.items()}}
    if conn.user is not None:
        options["user"] = conn.user
    pw = conn.resolve_password()
    if pw is not None:
        options["password"] = pw
    options.update(kwargs.pop("options", None) or {})
    kwargs["options"] = options
    return kwargs


def read_jdbc_named(
    spark: SparkSession,
    conn_id: str,
    table: str,
    *,
    registry: ConnectionRegistry | None = None,
    **kwargs,
) -> DataFrame:
    """``read_jdbc_with_retry`` through a registered connection —
    retry wiring included because a named warehouse connection is
    exactly the long-lived dependency that boots slowly."""
    from dbt_eamples_spark.sources.connections import read_jdbc_with_retry

    conn = (registry or DEFAULT_REGISTRY).get(conn_id)
    return read_jdbc_with_retry(
        spark, conn.url, table, **_jdbc_kwargs(conn, kwargs)
    )


def append_jdbc_named(
    df: DataFrame,
    conn_id: str,
    table: str,
    *,
    registry: ConnectionRegistry | None = None,
    **kwargs,
) -> None:
    from dbt_eamples_spark.sources.jdbc import append_jdbc

    conn = (registry or DEFAULT_REGISTRY).get(conn_id)
    append_jdbc(df, conn.url, table, **_jdbc_kwargs(conn, kwargs))
