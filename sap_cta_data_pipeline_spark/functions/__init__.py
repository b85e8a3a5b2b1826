"""Reusable column-function helpers (all JVM-side unless stated)."""

from .parity import bi, r2, r4, r6  # noqa: F401
