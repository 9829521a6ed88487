"""Reusable TPU-friendly numerical ops (batched root finds, segment ops)."""

from . import rootfind

__all__ = ["rootfind"]
