import os
import sys
from pathlib import Path

# Unit tests validate numerics/sharding on a virtual 8-device CPU mesh so they
# run anywhere; real-chip performance is measured by bench.py instead.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The sandbox's sitecustomize pre-imports jax with the axon TPU platform, so
# env vars alone are too late — override the already-loaded config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/x3_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

# Persistent compilation cache makes repeated test runs much faster.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/x3_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import pytest

GOLDEN_PATH = REPO_ROOT / "tests" / "data" / "golden.npz"


@pytest.fixture(scope="session")
def golden():
    return dict(np.load(GOLDEN_PATH))


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xC0DEC)


def make_hydrophone(rng, n, amplitude=6.0, drift=2000.0):
    """Synthetic low-entropy hydrophone-like signal: slow drift + small noise.

    Produces mostly Rice-coded blocks like the real corpora in
    /root/reference/test/timings.csv."""
    t = np.arange(n)
    slow = drift * np.sin(2 * np.pi * t / 9773.0)
    noise = rng.normal(0.0, amplitude, n)
    return np.clip(np.round(slow + noise), -32768, 32767).astype(np.int16)


def make_mixed(rng, n):
    """Signal that exercises every block type: silence, small noise, medium
    noise, large jumps (BFP), and full-scale white noise (pass-through)."""
    parts = []
    seg = max(1, n // 6)
    parts.append(np.zeros(seg, dtype=np.int16))
    parts.append(np.round(rng.normal(0, 1.2, seg)).astype(np.int16))
    parts.append(np.round(rng.normal(0, 5, seg)).astype(np.int16))
    parts.append(np.round(rng.normal(0, 400, seg)).astype(np.int16))
    parts.append(rng.integers(-32768, 32768, seg).astype(np.int16))
    cum = np.cumsum(rng.integers(-40, 41, n - 5 * seg))
    parts.append(np.clip(cum, -32768, 32767).astype(np.int16))
    return np.concatenate(parts)[:n]
