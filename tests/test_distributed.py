"""Multi-host process group: 2 REAL processes over the CPU backend.

The reference is a single-process program (SURVEY §2: no communication
backend of any kind); the TPU-native multi-host story is
``jax.distributed.initialize`` + one jit program whose mesh spans every
host's devices (parallel/distributed.py). These tests give that wrapper
real evidence: two OS processes form a group through the coordinator,
see each other's devices, and run a single pjit program whose collective
crosses the process boundary — the same program shape a 2-host TPU slice
runs over DCN (BASELINE config 5).

Marked slow: spawning 2 JAX processes + a distributed compile takes tens
of seconds on CPU.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_WORKER = r"""
import os, sys
pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.getcwd())
sys.path.insert(0, os.path.join(os.getcwd(), "tests"))

import jax

# a registered TPU PJRT plugin overrides the env var (see
# tests/conftest.py) — force the platform through jax.config too
jax.config.update("jax_platforms", "cpu")
# multi-process CPU needs a cross-process collectives backend (gloo is
# bundled with jax[cpu]); without it the CPU client comes up
# single-process and jax.process_count() stays 1
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from llm_inference_tpu.parallel.distributed import initialize, global_mesh

initialize(coord, nproc, pid)

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 2 * nproc, jax.devices()       # global view
assert len(jax.local_devices()) == 2                        # 2 per process

# 1) a collective across the process boundary: shard [4] over the global
# 'model' axis (2 devices per host), psum it — every host must see the
# GLOBAL total, which requires cross-process communication.
mesh = global_mesh(model=2 * nproc, data=1)
sh = NamedSharding(mesh, P(None, "model"))
local = np.arange(4, dtype=np.float32) + 100.0 * pid        # host-local data
garr = jax.make_array_from_process_local_data(sh, local.reshape(1, 4))

@jax.jit
def total(x):
    return jnp.sum(x)

t = float(total(garr))
want = float(sum((np.arange(4) + 100.0 * p).sum() for p in range(nproc)))
assert abs(t - want) < 1e-3, (t, want)
print(f"proc {pid}: global sum ok ({t})", flush=True)

# 2) the model program: a TP-sharded forward of the gemma fixture over
# the same global mesh — weights replicated from identical host bytes
# (every host builds the same seeded GGUF, the pod pattern), KV heads
# and FFN rows sharded over 'model' spanning both processes.
from fixtures import build_gemma3_gguf
from llm_inference_tpu.gguf import GGUFFile
from llm_inference_tpu.models import forward, init_cache, load_weights
from llm_inference_tpu.parallel import gemma_sharding_fn, kv_cache_sharding

n = 2 * nproc
buf = build_gemma3_gguf(n_layers=2, n_embd=128, n_ff=64 * n, n_head=n,
                        n_head_kv=n, seed=7)
hp, w = load_weights(GGUFFile(buf), sharding_fn=gemma_sharding_fn(mesh))
cache = init_cache(hp, 16, sharding=kv_cache_sharding(mesh, hp.n_head_kv))
toks = jax.device_put(jnp.asarray([2, 7, 8, 9], dtype=jnp.int32),
                      NamedSharding(mesh, P()))

@jax.jit
def step(w, cache, toks):
    logits, cache = forward(hp, w, cache, toks, 0, 4)
    return jnp.sum(logits), jnp.argmax(logits)

s, tok = step(w, cache, toks)
print(f"proc {pid}: sharded forward ok (checksum {float(s):.4f}, "
      f"tok {int(tok)})", flush=True)
print(f"RESULT {pid} {float(s):.6f} {int(tok)}", flush=True)

# 3) cross-host continuous batching (BASELINE config 5): batch lanes
# sharded over the 'data' axis — each process admits tokens into ITS
# OWN lanes (per-host request queues) — while weights/KV-heads shard
# over 'model' intra-host; ONE global jit decode step serves all hosts'
# lanes together. On a real pod the lane-axis collectives ride DCN.
from llm_inference_tpu.models.gemma import KVCache, forward_batched_decode
from llm_inference_tpu.parallel import batched_kv_cache_sharding

mesh2 = global_mesh(model=2, data=nproc)
hp2, w2 = load_weights(GGUFFile(buf), sharding_fn=gemma_sharding_fn(mesh2),
                       mode="bf16")
B_local, S = 2, 16
B = B_local * nproc
cache_sh = batched_kv_cache_sharding(mesh2, hp2.n_head_kv)
lane_sh = NamedSharding(mesh2, P("data"))

def gpool(d):
    return jax.make_array_from_process_local_data(
        cache_sh, np.zeros((B_local, S, hp2.n_head_kv, d), np.float32)
        .astype(jnp.bfloat16))

kc = tuple(gpool(hp2.n_embd_head_k) for _ in range(hp2.n_kv_layers))
vc = tuple(gpool(hp2.n_embd_head_v) for _ in range(hp2.n_kv_layers))
# per-host admission: host p enqueues its own token ids / positions
toks_local = np.asarray([3 + 2 * pid, 4 + 2 * pid], np.int32)
pos_local = np.asarray([0, 0], np.int32)
gtoks = jax.make_array_from_process_local_data(lane_sh, toks_local)
gpos = jax.make_array_from_process_local_data(lane_sh, pos_local)

@jax.jit
def bstep(w, kc, vc, toks, pos):
    logits, cache = forward_batched_decode(hp2, w, KVCache(k=kc, v=vc),
                                           toks, pos)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

nxt, cache2 = bstep(w2, kc, vc, gtoks, gpos)
# dedupe shards replicated over the local 'model' axis by index
seen = {}
for sh_ in nxt.addressable_shards:
    seen[str(sh_.index)] = np.asarray(sh_.data).reshape(-1)
mine = np.concatenate([v for _, v in sorted(seen.items())])
assert mine.shape == (B_local,), (mine.shape, list(seen))
print(f"proc {pid}: cross-host batched decode ok (my lanes -> {mine.tolist()})",
      flush=True)
print(f"BATCHED {pid} {mine.tolist()}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_group_and_sharded_forward(tmp_path):
    nproc = 2
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(nproc), coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=os.path.join(os.path.dirname(__file__), ".."), env=env)
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert "global sum ok" in out, out
        assert "sharded forward ok" in out, out
        assert "cross-host batched decode ok" in out, out
    # both processes computed the SAME logits checksum/token from the
    # jointly-sharded program
    results = sorted(
        line.split()[1:] for out in outs for line in out.splitlines()
        if line.startswith("RESULT"))
    assert len(results) == 2
    assert results[0][1:] == results[1][1:], results
