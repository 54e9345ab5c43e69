"""Engine auto-routing (x3_tpu/engine.py)."""

import pytest

from x3_tpu.engine import resolve_engine


def test_explicit_engines_pass_through():
    for e in ("jax", "native", "numpy"):
        assert resolve_engine(e) == e


def test_auto_resolves_to_concrete_engine():
    assert resolve_engine("auto") in ("jax", "native")


def test_env_override(monkeypatch):
    monkeypatch.setenv("X3_ENGINE", "numpy")
    assert resolve_engine("auto") == "numpy"
    # explicit argument beats the env var
    assert resolve_engine("jax") == "jax"


def test_unknown_engine_rejected():
    with pytest.raises(ValueError):
        resolve_engine("cuda")
    with pytest.raises(ValueError):
        resolve_engine("")


def test_auto_routing_compares_measured_probes(monkeypatch):
    """'auto' weighs the measured H2D link against the measured native rate
    for the conversion direction (VERDICT r3 item 3: both operands must be
    measured numbers of the same vintage, not a stale constant)."""
    import x3_tpu.engine as eng
    from x3_tpu import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    monkeypatch.delenv("X3_ENGINE", raising=False)
    monkeypatch.setattr(eng, "probed_native_mbps", lambda: (700.0, 400.0))

    monkeypatch.setattr(eng, "probed_h2d_mbps", lambda: 500.0)
    assert eng.resolve_engine("auto", decode=False) == "native"  # 500 < 700
    assert eng.resolve_engine("auto", decode=True) == "jax"  # 500 > 400
    assert eng.resolve_engine("auto") == "jax"  # unknown direction: min(700,400)

    monkeypatch.setattr(eng, "probed_h2d_mbps", lambda: 300.0)
    assert eng.resolve_engine("auto", decode=True) == "native"
    monkeypatch.setattr(eng, "probed_h2d_mbps", lambda: 900.0)
    assert eng.resolve_engine("auto", decode=False) == "jax"

    # No link probe (CPU backend / disabled): static preference is native.
    monkeypatch.setattr(eng, "probed_h2d_mbps", lambda: None)
    assert eng.resolve_engine("auto") == "native"


def test_native_probe_measures_and_memoizes(monkeypatch, tmp_path):
    """probed_native_mbps returns measured per-direction rates and caches
    them (memo + disk) so the probe runs once per host."""
    import x3_tpu.engine as eng
    from x3_tpu import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    monkeypatch.delenv("X3_AUTO_PROBE", raising=False)
    monkeypatch.setattr(eng, "_PROBE_CACHE", str(tmp_path / "probe.json"))
    monkeypatch.setattr(eng, "_probe_memo", {})
    rates = eng.probed_native_mbps()
    assert rates is not None
    enc, dec = rates
    assert enc > 10.0 and dec > 10.0  # sane measured MB/s on any host
    # memoized (same object) and persisted
    assert eng.probed_native_mbps() == rates
    import json

    cache = json.loads((tmp_path / "probe.json").read_text())
    assert any(k.startswith("native:") for k in cache)

    monkeypatch.setenv("X3_AUTO_PROBE", "0")
    monkeypatch.setattr(eng, "_probe_memo", {})
    assert eng.probed_native_mbps() is None
