"""Multi-chip sharding: tile/frame parallel decode over jax.sharding.Mesh."""
