"""Per-stage timeout + cancellation harness (SURVEY §2.9 R1-R3).

The reference guards each stage with a daemon-thread join
(``TimeoutHandler.run_with_timeout``, ``No_Sql.py:66-93``) and server-side
ceilings (``max_time_ms``, ``No_Sql.py:404,416``).  Spark has no per-query
Catalyst knob, so the idiomatic equivalent is a **job group**: run the
action in a worker thread under ``setJobGroup``, and on timeout call
``cancelJobGroup`` so executors actually stop scanning (not just the driver
giving up).
"""

from __future__ import annotations

import threading
import uuid
from typing import Any, Callable, TypeVar

from pyspark.sql import SparkSession

T = TypeVar("T")


class QueryTimeoutError(TimeoutError):
    """An action exceeded its budget and its Spark jobs were cancelled."""


def run_with_timeout(
    spark: SparkSession,
    action: Callable[[], T],
    timeout_s: float | None,
    group_desc: str = "",
) -> T:
    """Run ``action`` (a Spark action) with a wall-clock budget.

    On timeout the in-flight Spark work is cancelled (executors stop, not
    just the driver giving up) and :class:`QueryTimeoutError` is raised.
    ``timeout_s=None`` runs unguarded on the calling thread.

    Cancellation transport: **job groups** on a classic session (verified
    to interrupt running stages on local/cluster masters); on Spark
    Connect — where there is no SparkContext — **session tags**
    (``addTag``/``interruptTag``, the gRPC-native interruption contract).
    Tags are not used on classic because a tag added in a worker thread
    does not reliably reach the job there (verified on 4.1.2 local).
    """
    if timeout_s is None:
        return action()
    try:
        spark.sparkContext
    except Exception:  # Spark Connect: no SparkContext on the client
        return _run_tagged(spark, action, timeout_s)
    return _run_job_grouped(spark, action, timeout_s, group_desc)


def _guarded(
    token: str,
    setup: Callable[[], None],
    teardown: Callable[[], None],
    cancel: Callable[[], None],
    action: Callable[[], T],
    timeout_s: float,
) -> T:
    result: dict[str, Any] = {}
    error: dict[str, BaseException] = {}

    def target() -> None:
        setup()
        try:
            result["value"] = action()
        except BaseException as exc:  # surfaced to caller below
            error["exc"] = exc
        finally:
            teardown()

    thread = threading.Thread(target=target, daemon=True, name=token)
    thread.start()
    thread.join(timeout_s)

    if thread.is_alive():
        cancel()
        raise QueryTimeoutError(
            f"action exceeded {timeout_s:.1f}s budget; {token} cancelled"
        )
    if "exc" in error:
        raise error["exc"]
    return result["value"]


def _run_job_grouped(
    spark: SparkSession, action: Callable[[], T], timeout_s: float, group_desc: str
) -> T:
    group_id = f"nl2spark-{uuid.uuid4().hex[:12]}"
    sc = spark.sparkContext
    return _guarded(
        f"job group {group_id}",
        lambda: sc.setJobGroup(
            group_id, group_desc or group_id, interruptOnCancel=True
        ),
        lambda: sc.setJobGroup("", ""),
        lambda: sc.cancelJobGroup(group_id),
        action,
        timeout_s,
    )


def _run_tagged(
    spark: SparkSession, action: Callable[[], T], timeout_s: float
) -> T:
    tag = f"nl2spark-{uuid.uuid4().hex[:12]}"
    return _guarded(
        f"tag {tag}",
        lambda: spark.addTag(tag),
        lambda: spark.removeTag(tag),
        lambda: spark.interruptTag(tag),
        action,
        timeout_s,
    )


def budget_split(total_timeout_s: float) -> tuple[float, float]:
    """Layered budget arithmetic from the API layer
    (``app_server.py:218-232``): compile gets ``min(total-5, 25)`` capped at
    70 % of total; the DB stage gets the remainder minus a 1 s buffer with a
    2 s floor."""
    gen_budget = min(total_timeout_s - 5.0, 25.0)
    gen_budget = min(gen_budget, total_timeout_s * 0.7)
    db_budget = max(total_timeout_s - gen_budget - 1.0, 2.0)
    return gen_budget, db_budget
