import os
# force CPU with a virtual 8-device mesh for sharding tests; the real TPU is
# exercised by bench.py, not unit tests
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Under the axon TPU plugin the JAX_PLATFORMS env var is silently ignored;
# force the CPU backend via config so unit tests never occupy the TPU.
try:
    import jax
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass


# The XLA CPU runtime has segfaulted nondeterministically late in full-
# suite runs (3 runs, 3 different tests, each fine in isolation) —
# executable-cache/memory pressure over ~285 jit-heavy tests. Dropping
# compiled executables between modules bounds it; subsets re-verify in
# <5 min if a module needs isolation.
import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    try:
        import jax
        jax.clear_caches()
    except Exception:
        pass
