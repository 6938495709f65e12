"""Trace-safety helpers for diagnostic state.

Dmx modules record diagnostic side-state during forward (physical dtype,
approximation error, flop counts).  Under a JAX trace these assignments are
skipped: storing tracers on modules would leak them, and nnx rejects
attribute mutation from a different trace level.  All such state is
best-effort eager-only, which matches its diagnostic role.
"""

from __future__ import annotations

import jax


def eager() -> bool:
    """True when not inside any JAX trace (jit/grad/vmap/scan)."""
    try:
        from jax._src import core as _core

        return _core.trace_state_clean()
    except (ImportError, AttributeError):  # pragma: no cover - internals moved
        return True


def try_set(obj, name: str, value) -> None:
    """Set a diagnostic attribute; silently skip inside traces."""
    if not eager():
        return
    try:
        setattr(obj, name, value)
    except Exception:
        pass
