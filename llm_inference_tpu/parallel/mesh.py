"""Device-mesh construction helpers."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(model: int | None = None, data: int = 1, *, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh.

    Defaults to all visible devices on the 'model' (tensor-parallel) axis —
    the layout that serves a single replica across one slice's ICI ring.
    """
    devices = list(devices if devices is not None else jax.devices())
    if model is None:
        model = len(devices) // data
    if data * model > len(devices):
        raise ValueError(f"mesh {data}x{model} needs {data*model} devices, have {len(devices)}")
    arr = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))
