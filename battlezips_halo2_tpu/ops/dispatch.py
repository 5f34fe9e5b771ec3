"""Device-dispatch failure handling (SURVEY.md §5.3: the reference has no
infrastructure failure detection; a TPU framework needs it — the accelerator
sits behind a network relay that can drop mid-proof).

``device_call(fn, *args)`` runs a jitted callable with bounded retry on
*transient* backend errors (UNAVAILABLE / DEADLINE_EXCEEDED / connection
resets), exponential backoff, and a clear framework error when the backend
stays down. Deterministic compile/shape errors are NOT retried."""

from __future__ import annotations

import os
import time

_TRANSIENT_MARKERS = (
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "Connection refused",
    "Connection reset",
    "Connect error",
    "transport:",
    "Socket closed",
)

from ..config import config as _config


def _retry_policy():
    c = _config()
    return c.dispatch_retries, c.dispatch_backoff_s


class DeviceUnavailable(RuntimeError):
    """The accelerator backend stayed down through every retry."""


def _is_transient(exc: Exception) -> bool:
    msg = str(exc)
    return any(m in msg for m in _TRANSIENT_MARKERS)


def device_call(fn, *args, what: str = "device dispatch"):
    """Invoke ``fn(*args)`` with retry on transient backend failures.

    Retries only errors that look like relay/backend unavailability;
    anything else (trace errors, OOM, shape mismatches) propagates
    immediately. Raises DeviceUnavailable after the final attempt."""
    last: Exception | None = None
    max_attempts, backoff_s = _retry_policy()
    for attempt in range(max_attempts):
        try:
            return fn(*args)
        except Exception as exc:  # jax wraps backend errors in JaxRuntimeError
            if not _is_transient(exc):
                raise
            last = exc
            if attempt < max_attempts - 1:
                delay = backoff_s * (2**attempt)
                print(
                    f"[dispatch] {what}: transient backend error "
                    f"(attempt {attempt + 1}/{max_attempts}, retrying in {delay:.0f}s): "
                    f"{str(exc).splitlines()[0][:160]}",
                    flush=True,
                )
                time.sleep(delay)
    raise DeviceUnavailable(
        f"{what}: accelerator backend unavailable after {max_attempts} attempts"
    ) from last
