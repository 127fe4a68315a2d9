"""Compute kernels (XLA/lax oracle + Pallas performance paths)."""
