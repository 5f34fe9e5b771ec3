"""Device-dispatch retry wrapper (ops/dispatch.py, SURVEY §5.3 failure
detection): transient backend errors retry with backoff, deterministic
errors propagate immediately, persistent outage raises DeviceUnavailable."""

import pytest

from battlezips_halo2_tpu.ops import dispatch as DSP
from battlezips_halo2_tpu.ops.dispatch import DeviceUnavailable, device_call


def test_transient_error_retries(monkeypatch):
    monkeypatch.setenv("BZ_DISPATCH_BACKOFF_S", "0")
    calls = []

    def flaky(x):
        calls.append(x)
        if len(calls) < 2:
            raise RuntimeError("UNAVAILABLE: transport: Connect error: Connection refused")
        return x + 1

    assert device_call(flaky, 41) == 42
    assert len(calls) == 2


def test_deterministic_error_propagates():
    def broken(x):
        raise ValueError("shape mismatch")

    with pytest.raises(ValueError, match="shape mismatch"):
        device_call(broken, 0)


def test_persistent_outage_raises(monkeypatch):
    monkeypatch.setenv("BZ_DISPATCH_BACKOFF_S", "0")
    attempts = []

    def down(x):
        attempts.append(x)
        raise RuntimeError("DEADLINE_EXCEEDED: backend gone")

    with pytest.raises(DeviceUnavailable):
        device_call(down, 0, what="test op")
    from battlezips_halo2_tpu.config import config

    assert len(attempts) == config().dispatch_retries
