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
