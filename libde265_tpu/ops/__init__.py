"""Compute ops: numpy reference implementations + Pallas TPU kernels."""
