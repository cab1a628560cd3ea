"""Pallas TPU kernels for the hot point-cloud ops."""
