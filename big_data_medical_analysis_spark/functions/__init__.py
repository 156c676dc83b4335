"""Scalar/vector function helpers."""
