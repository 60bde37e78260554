"""Multi-chip scaling: device meshes and sharding layouts.

The reference is a single-process shared-memory program whose only
parallelism is a GEMV-row thread pool (reference thread_pool.h,
ops.cpp:439-451; SURVEY.md §2 parallelism table). The TPU equivalents:

  - intra-chip: XLA/MXU inside one program (nothing to do here),
  - tensor parallel: weights sharded over the mesh 'model' axis; GSPMD
    inserts the all-reduces at the reference's layer boundaries,
  - data parallel / batching: the 'data' axis (continuous batching rides it).

Collectives ride ICI within a slice; `jax.distributed.initialize` extends
the same program across hosts over DCN.
"""

from .mesh import make_mesh
from .sharding import batched_kv_cache_sharding, gemma_sharding_fn, kv_cache_sharding

__all__ = [
    "make_mesh",
    "gemma_sharding_fn",
    "kv_cache_sharding",
    "batched_kv_cache_sharding",
]
