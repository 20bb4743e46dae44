"""Scalar function layer: distance metrics (SQL expressions + numpy
kernels), text analysis, and hashing primitives."""
