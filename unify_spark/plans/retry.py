"""App-level retry with a retryable-vs-fatal taxonomy for sink writes.

The reference classifies transact anomalies into retryable (transient
backpressure / unavailability / timeouts) vs fatal (logic errors), and
retries the retryable class with bounded, scaled backoff
(src/com/vendekagonlabs/unify/db/transact.clj:46-82, retry loop :128-136;
taxonomy src/com/vendekagonlabs/unify/db/common.clj:21-55).

Spark's task retries cover executor-side transients; this module covers the
DRIVER-side job submissions the runner makes (violation parquet writes,
audit appends): a transient object-store failure during a sink write must
not abort a multi-hour validation run, and resume correctness depends on
violation evidence landing before lineage rows mark partitions done.

Fatal classes (never retried): analysis/plan errors, Python logic errors —
retrying them can only reproduce the failure.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import TypeVar

T = TypeVar("T")

# Fatal: query-compilation and Python logic errors — deterministic, retry
# cannot help (the reference's non-retryable anomaly arm, common.clj:41-55).
_FATAL_TYPES = (
    ValueError,
    TypeError,
    KeyError,
    AttributeError,
    NotImplementedError,
)

# Transient markers in JVM exception chains (the retryable anomaly classes of
# common.clj:21-40 mapped to their Hadoop/Spark filesystem analogues).
_TRANSIENT_MARKERS = (
    "java.io.IOException",
    "java.net.SocketTimeoutException",
    "java.net.ConnectException",
    "java.util.concurrent.TimeoutException",
    "connection reset",
    "connection refused",
    "timed out",
    "timeout waiting",
    "service unavailable",
    "slow down",  # S3 503 SlowDown
    "throttl",
    "too many requests",
    "internalerror",
    "unavailable",
    "broken pipe",
)

# Deterministic OSError subclasses: retrying cannot change a missing path,
# a permission denial, or a wrong node type, and each retry re-executes a
# whole Spark sink job — surface these immediately. ENOSPC likewise: a full
# disk stays full on the retry timescale of a sink write.
_FATAL_OSERRORS = (
    FileNotFoundError,
    PermissionError,
    IsADirectoryError,
    NotADirectoryError,
)


def retryable(exc: BaseException) -> bool:
    """Classify an exception as retryable (transient I/O) or fatal.

    OSError is retryable (filesystem/object-store transients) EXCEPT the
    deterministic subclasses (missing path, permission, wrong node type)
    and ENOSPC. Spark-side errors are retryable only when a known transient
    marker appears in the message chain — AnalysisException and friends stay
    fatal so plan bugs surface immediately.
    """
    import errno

    if isinstance(exc, _FATAL_TYPES):
        return False
    if isinstance(exc, _FATAL_OSERRORS):
        return False
    if isinstance(exc, OSError):
        return getattr(exc, "errno", None) != errno.ENOSPC
    try:
        from pyspark.errors import AnalysisException, IllegalArgumentException

        if isinstance(exc, (AnalysisException, IllegalArgumentException)):
            return False
    except ImportError:  # pragma: no cover - pyspark always present here
        pass
    msg = str(exc).lower()
    return any(m.lower() in msg for m in _TRANSIENT_MARKERS)


def with_retries(
    fn: Callable[[], T],
    max_retries: int = 5,
    base_backoff_s: float = 0.2,
    classify: Callable[[BaseException], bool] = retryable,
    on_retry: Callable[[int, BaseException], None] | None = None,
) -> T:
    """Run ``fn``, retrying retryable failures with exponential backoff
    (transact.clj:128-136's bounded retry loop; the reference's bound is
    3600 cheap peer retries — sink writes are whole Spark jobs, so the bound
    here is small and the backoff scaled the same way). Fatal failures and
    the final retryable failure re-raise."""
    for attempt in range(max_retries):
        try:
            return fn()
        except BaseException as e:  # noqa: BLE001 — classification is the point
            if attempt == max_retries - 1 or not classify(e):
                raise
            if on_retry is not None:
                on_retry(attempt, e)
            time.sleep(base_backoff_s * (2**attempt))
    raise AssertionError("unreachable")
