"""Pallas TPU kernels (hot ops kept in VMEM)."""
