"""Tensor-parallel sharding layouts for Gemma-family weights.

Megatron-style layout expressed as per-tensor GSPMD annotations; jit
propagates them so XLA inserts exactly one all-reduce per attention block
and one per FFN block (at the reference's mat_vec_mul output boundaries,
reference model.cpp:839-841, 905-912):

  - attn_q/k/v, ffn_gate/up : row-parallel (output features sharded) —
    each chip computes its head/neuron slice, no communication.
  - attn_output, ffn_down   : col-parallel (input features sharded) —
    partial sums all-reduced over the 'model' axis.
  - token_embd              : vocab-sharded (rows); the tied-logits matmul
    all-gathers logits, the embedding gather all-reduces masked rows.

Tensors whose dimensions don't divide the mesh axis fall back to
replication (correct, just not distributed) so tiny test models always run.
"""

from __future__ import annotations

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..gguf.constants import block_geometry
from ..gguf.reader import TensorInfo

# per-tensor-name policy: 'row' (shard output dim), 'col' (shard input dim)
_ROW_SHARDED = ("attn_q.weight", "attn_k.weight", "attn_v.weight",
                "ffn_gate.weight", "ffn_up.weight",
                "per_layer_inp_gate.weight", "inp_gate.weight",
                "per_layer_model_proj.weight")
_COL_SHARDED = ("attn_output.weight", "ffn_down.weight",
                "per_layer_proj.weight", "proj.weight")


def _policy(name: str) -> str | None:
    if name == "token_embd.weight":
        return "row"  # vocab-sharded
    if not name.startswith("blk."):
        return None
    param = name.split(".", 2)[2]
    if param in _ROW_SHARDED:
        return "row"
    if param in _COL_SHARDED:
        return "col"
    return None


def gemma_sharding_fn(mesh: Mesh, axis: str = "model"):
    """Return a ``sharding_fn(name, info)`` for models.weights.load_weights.

    The returned value is a :class:`_LeafSharding` factory rather than a
    concrete NamedSharding because one weight maps to several device-array
    leaves of different ranks (QuantTensor q [R, G, S] / scale [R, G];
    DenseTensor w [R, C]); quant/device.py resolves it per leaf.
    """
    n = mesh.shape[axis]

    def fn(name: str, info: TensorInfo):
        pol = _policy(name)
        if pol is None:
            return None
        elems, _ = block_geometry(info.tensor_type)
        groups = max(1, info.n_cols // max(elems, 1))
        if pol == "row":
            if info.n_rows % n:
                return None
            return _LeafSharding(mesh, axis, dim=0)
        if info.n_cols % n or groups % n:
            return None
        return _LeafSharding(mesh, axis, dim=1)

    return fn


class _LeafSharding:
    """Per-leaf NamedSharding factory: shards ``dim`` of each array leaf.

    quant/device.py calls ``jax.device_put(leaf, sharding)``; device_put
    accepts a Sharding, so this object quacks like one by building the
    right NamedSharding for each leaf rank on demand via __jax_device_put__.
    """

    def __init__(self, mesh: Mesh, axis: str, dim: int):
        self.mesh = mesh
        self.axis = axis
        self.dim = dim

    def for_rank(self, rank: int) -> NamedSharding:
        spec = [None] * rank
        if self.dim < rank:
            spec[self.dim] = self.axis
        return NamedSharding(self.mesh, P(*spec))

    def for_array(self, x) -> NamedSharding:
        """Like for_rank but replicates leaves whose target dim doesn't
        divide the mesh axis (e.g. rowq8 [R, 1] scales under a
        col-parallel policy — per-row scales commute with the psum)."""
        rank = len(x.shape)
        if self.dim < rank and x.shape[self.dim] % self.mesh.shape[self.axis] == 0:
            return self.for_rank(rank)
        return NamedSharding(self.mesh, P())


def kv_cache_sharding(mesh: Mesh, n_head_kv: int, axis: str = "model"):
    """Sharding for [max_seq, n_head_kv, head_dim] caches: shard KV heads
    over the model axis when they divide, else replicate."""
    if n_head_kv % mesh.shape[axis] == 0:
        return NamedSharding(mesh, P(None, axis, None))
    return NamedSharding(mesh, P())


def batched_kv_cache_sharding(
    mesh: Mesh, n_head_kv: int, axis: str = "model", data_axis: str | None = "data"
):
    """Sharding for the server's [max_batch, max_seq, n_head_kv, head_dim]
    cache lanes: batch over the 'data' axis (if present/divisible, chosen
    by the caller), KV heads over the model axis."""
    d = data_axis if data_axis in mesh.axis_names and mesh.shape.get(data_axis, 1) > 1 else None
    m = axis if n_head_kv % mesh.shape[axis] == 0 else None
    return NamedSharding(mesh, P(d, None, m, None))
