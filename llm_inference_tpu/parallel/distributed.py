"""Multi-host (N>=2) initialization over DCN.

The reference has no distributed backend at all (SURVEY.md §2 table); the
TPU-native equivalent is a single jit program spanning hosts:
``jax.distributed.initialize`` forms the process group, every host runs
the same Engine code, and the same ('data', 'model') mesh simply includes
all hosts' devices — XLA routes intra-slice collectives over ICI and
cross-host ones over DCN. Call :func:`initialize` once before any jax use.

On Cloud TPU pods the coordinator/process env comes from the runtime, so
``initialize()`` with no arguments is the common case.
"""

from __future__ import annotations

import jax

from .mesh import make_mesh

_initialized = False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join the multi-host process group (idempotent)."""
    global _initialized
    if _initialized:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
    _initialized = True


def global_mesh(model: int | None = None, data: int = 1):
    """('data','model') mesh over every device of every host. With
    data=num_hosts the model axis stays intra-host (ICI) and batch
    replication crosses DCN — the layout BASELINE.md's scaling report uses."""
    return make_mesh(model=model, data=data, devices=jax.devices())
