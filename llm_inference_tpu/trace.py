"""Named-activation tracing — the parity-harness data source.

The reference instruments ~30 points of its forward pass with
llama.cpp-compatible tensor names (reference model.cpp:711-988 via the
VERBOSE macro, printer tensor.h:22-85); those dumps are what its
cross-engine comparison harness consumes. This module reproduces the same
named taps for the TPU engine:

  - disabled (default): ``tap`` is an identity with zero jit overhead —
    the branch resolves at trace time, nothing enters the graph.
  - enabled: values are fetched to host via ``jax.debug.callback`` (works
    inside jit) and accumulated; ``save``/``summary`` export an .npz plus
    a text digest with per-tensor checksums (name, shape, sum), the
    fields the reference's compare harness keys on.

NaN checking mirrors the reference printer's NaN abort (tensor.h:81-84)
but reports instead of aborting.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
from jax import Array

_active: Optional["TraceSession"] = None


@dataclasses.dataclass
class TraceSession:
    path: str
    records: list[tuple[str, np.ndarray]] = dataclasses.field(default_factory=list)

    def add(self, name: str, value: np.ndarray) -> None:
        self.records.append((str(name), np.asarray(value)))

    def save(self) -> None:
        arrays = {}
        for i, (name, value) in enumerate(self.records):
            arrays[f"{i:04d}|{name}"] = value
        np.savez(self.path, **arrays)

    def summary(self) -> str:
        lines = []
        for name, v in self.records:
            flat = v.reshape(-1)
            nan = " NAN!" if np.isnan(flat).any() else ""
            lines.append(f"{name} shape={list(v.shape)} sum={flat.sum():.6f}{nan}")
        return "\n".join(lines)


def enable_trace(path: str) -> TraceSession:
    global _active
    _active = TraceSession(path=path)
    return _active


def disable_trace() -> None:
    global _active
    _active = None


def current() -> Optional[TraceSession]:
    return _active


def tap(name: str, x: Array) -> Array:
    """Record ``x`` under ``name`` when tracing is enabled; identity otherwise."""
    if _active is None:
        return x
    import jax

    session = _active

    if isinstance(x, jax.core.Tracer):
        def _record(v):
            session.add(name, v)

        jax.debug.callback(_record, x)
        return x
    session.add(name, np.asarray(x))
    return x
