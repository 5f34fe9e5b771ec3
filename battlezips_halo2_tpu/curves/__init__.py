"""Pasta curve (Pallas/Vesta) arithmetic: host-exact and device layers."""

from .host import PALLAS, VESTA, Curve, Point

__all__ = ["PALLAS", "VESTA", "Curve", "Point"]
