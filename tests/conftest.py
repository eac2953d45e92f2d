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
