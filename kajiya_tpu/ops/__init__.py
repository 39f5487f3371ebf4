"""Kernel-level primitives: reservoirs, scans, and (later) Pallas kernels."""
