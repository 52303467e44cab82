"""Query timeout enforcement — the ``timeout`` query-context key.

Reference: processing/src/main/java/org/apache/druid/query/
QueryTimeoutException.java (errorCode "Query timeout") and
QueryContexts.TIMEOUT_KEY; every native engine checks the response
context's timeout-at instant while iterating
(ScanQueryRunnerTest.testScanQueryTimeout pins the contract:
``context: {timeout: 1}`` raises, ``timeout: 0`` means unlimited).

Spark analogue: run the collecting action on a watchdog thread under a
dedicated job group (Spark job groups are thread-local, so the group
tags exactly this query's jobs) and cancel the WHOLE GROUP when the
deadline passes — tasks are interrupted cluster-wide, which is the
100 TB behavior that matters: a runaway query stops consuming
executors, it does not run to completion with the client gone.
"""

from __future__ import annotations

import threading
import uuid


class QueryTimeoutError(RuntimeError):
    """QueryTimeoutException.java: errorCode 'Query timeout'."""

    error_code = "Query timeout"
    error_class = "org.apache.druid.query.QueryTimeoutException"

    def __init__(self, timeout_ms: int):
        super().__init__(
            f"Query did not complete within {timeout_ms} ms")
        self.timeout_ms = timeout_ms


def run_with_timeout(df, timeout_ms, action="collect"):
    """Run ``df.<action>()`` bounded by ``timeout_ms`` milliseconds.

    0 / None / negative = unlimited (QueryContexts.NO_TIMEOUT). On
    expiry the query's job group is cancelled (running tasks are
    interrupted) and QueryTimeoutError is raised."""
    timeout_ms = int(timeout_ms or 0)
    if timeout_ms <= 0:
        return getattr(df, action)()
    spark = df.sparkSession
    group = f"druid-q-{uuid.uuid4().hex[:12]}"
    result: list = []
    err: list = []

    def work():
        try:
            # job groups are thread-local: only this query's jobs
            # carry the group id (interruptOnCancel=True interrupts
            # running tasks, not just queued ones)
            spark.sparkContext.setJobGroup(
                group, f"timeout-bounded ({timeout_ms} ms)", True)
            result.append(getattr(df, action)())
        except BaseException as e:  # noqa: BLE001 — surfaced below
            err.append(e)

    t = threading.Thread(target=work, daemon=True,
                         name=f"druid-timeout-{group}")
    t.start()
    t.join(timeout_ms / 1000.0)
    if t.is_alive():
        try:
            spark.sparkContext.cancelJobGroup(group)
        except Exception:  # noqa: BLE001 — cancellation is best-effort
            pass
        raise QueryTimeoutError(timeout_ms)
    if err:
        raise err[0]
    return result[0]


def context_timeout(q: dict) -> int:
    """The query's ``context.timeout`` in ms (0 = unlimited)."""
    try:
        return int((q.get("context") or {}).get("timeout") or 0)
    except (TypeError, ValueError):
        return 0
