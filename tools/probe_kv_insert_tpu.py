#!/usr/bin/env python
"""Probe: which (H, C) trailing layouts of kv_insert.insert_rows Mosaic-lower
on the real TPU. The paged/batched caches at the Gemma-1B geometry are
[rows, 1, 256] (n_head_kv=1, head_dim 256) — round-3 notes say H=1 fails to
lower. Test the degenerate layout and tile-friendlier reshapes of the same
row payload ([rows, 2, 128], [rows, 8, 32]... any is a free row-major view).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from llm_inference_tpu.ops.pallas.kv_insert import insert_rows

R, B = 64, 8


def try_case(H, C, dtype):
    rng = np.random.default_rng(0)
    dst = jnp.asarray(rng.normal(size=(R, H, C)), dtype=dtype)
    rows = jnp.asarray(rng.normal(size=(B, H, C)), dtype=dtype)
    idx = jnp.asarray([3, 9, -1, 17, 64, 33, 0, 63], dtype=jnp.int32)
    try:
        out = insert_rows(dst, rows, idx)
        out.block_until_ready()
        # verify against the scatter
        ref = np.array(dst)
        for b, i in enumerate(np.asarray(idx)):
            if 0 <= i < R:
                ref[i] = np.asarray(rows)[b]
        ok = np.array_equal(np.asarray(out), ref)
        print(f"H={H:3d} C={C:4d} {dtype}: {'OK bit-exact' if ok else 'WRONG RESULT'}")
        return ok
    except Exception as e:
        msg = str(e).splitlines()[0][:160]
        print(f"H={H:3d} C={C:4d} {dtype}: FAIL {type(e).__name__}: {msg}")
        return False


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    for dtype in (jnp.bfloat16,):
        for H, C in [(1, 256), (2, 128), (8, 32), (16, 16), (1, 128),
                     (4, 256), (8, 256), (256, 1)]:
            try_case(H, C, dtype)
