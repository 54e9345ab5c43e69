"""bench.wait_for_backend: the round-end bench artifact must survive a
transient tunnel outage (retry with backoff), but still fail honestly when
the backend never comes back."""

import importlib.util
import types

import pytest

from tests.conftest import REPO_ROOT


def _load_bench():
    spec = importlib.util.spec_from_file_location("benchmod", REPO_ROOT / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _FlakyJax:
    """jit whose compiled fn fails `fail_n` times, then succeeds."""

    def __init__(self, fail_n: int):
        self.calls = 0
        self._fail_n = fail_n

    def jit(self, fn):
        def run(x):
            self.calls += 1
            if self.calls <= self._fail_n:
                raise RuntimeError("UNAVAILABLE: connection refused")
            return 3

        return run


_FAKE_JNP = types.SimpleNamespace(sum=lambda x: x, arange=lambda n: n)


def test_retries_through_transient_outage(monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    fake = _FlakyJax(fail_n=2)
    bench.wait_for_backend(fake, _FAKE_JNP, deadline_s=600.0)
    assert fake.calls == 3


def test_reraises_past_deadline(monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    fake = _FlakyJax(fail_n=10**9)
    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        bench.wait_for_backend(fake, _FAKE_JNP, deadline_s=0.0)
    assert fake.calls == 1  # no pointless retry once the deadline is spent


def test_healthy_backend_is_one_probe():
    bench = _load_bench()
    fake = _FlakyJax(fail_n=0)
    bench.wait_for_backend(fake, _FAKE_JNP, deadline_s=60.0)
    assert fake.calls == 1
