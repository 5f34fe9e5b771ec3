"""Polynomial utilities: host-side exact interpolation and (later) domains."""

from .lagrange import lagrange_interpolate

__all__ = ["lagrange_interpolate"]
