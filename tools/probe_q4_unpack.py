#!/usr/bin/env python
"""Probe (dev tool): nibble-unpack strategies for the packed serve-q4
masked-dot megakernel.

serve-q4 measured 71.7% of its HBM speed-of-light (ROOFLINE.md): the
in-kernel unpack (`fused_decode_q._qdot packed=True`) widens each packed
byte block to int32, masks/shifts, casts to bf16, concatenates — VPU work
that overlaps imperfectly with the halved DMA stream. Candidates:

  A current  : astype(int32)&0xFF -> &0xF / >>4&0xF -> bf16 (-8) -> concat -> dot
  B int8-asr : host pre-XOR 0x88 (nibble ^ 8 == signed-4-bit of nibble-8),
               device lo = asr(shl(B,4),4), hi = asr(B,4) — pure int8
               shifts, TWO mixed bf16xint8 dots, no concat, no widening
  C int16    : A but widening only to int16
  D unsigned : lo = B & 0xF, hi = asr(B,4) & 0xF as int8 (Q4_K-style raw
               nibbles, offset term handled outside), mixed dots

Usage:
  python tools/probe_q4_unpack.py lower    # Mosaic-lower all variants (no HW)
  python tools/probe_q4_unpack.py check    # numerics in interpret mode (CPU)
  python tools/probe_q4_unpack.py time     # device timing (needs the TPU)
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import export
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GS = 32


def _mask(Mp, C, BC, gs):
    # group-local mask, periodic per block (fused_decode_q._qdot)
    sub = jax.lax.broadcasted_iota(jnp.int32, (Mp, C), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Mp, C), 1)
    return jnp.maximum(0, 1 - jnp.abs((lane % BC) // gs - sub)).astype(jnp.bfloat16)


def make_kernel(variant, C, R, BG, BC, nblk, Mp):
    """x [1, C] bf16, packed [C//2, R] int8 (two contraction-halves per
    block share a byte: lo = cols [bBC, bBC+h), hi = [bBC+h, bBC+BC)),
    sT [nblk*Mp, R] f32 -> y [1, R] f32."""
    h = BC // 2

    def kernel(x_ref, p_ref, s_ref, o_ref):
        xm_full = x_ref[:] * _mask(Mp, C, BC, GS)
        acc = None
        for b in range(nblk):
            xm = xm_full[:, b * BC : (b + 1) * BC]
            blk = p_ref[b * h : (b + 1) * h, :]
            if variant == "A":
                p32 = blk.astype(jnp.int32) & 0xFF
                lo = (p32 & 0xF).astype(jnp.bfloat16) - 8.0
                hi = ((p32 >> 4) & 0xF).astype(jnp.bfloat16) - 8.0
                wb = jnp.concatenate([lo, hi], axis=0)
                pb = jax.lax.dot_general(
                    xm, wb, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            elif variant == "B":
                # host pre-XORs the HIGH nibble (0x80): hi = asr(B, 4) is its
                # signed-4-bit value = n_hi - 8; lo = (B & 0xF) - 8 directly.
                # (int8 shift-LEFT doesn't legalize in Mosaic; asr + and + sub do.)
                lo = (blk & jnp.int8(0xF)) - jnp.int8(8)
                hi = jax.lax.shift_right_arithmetic(blk, jnp.int8(4))
                pb = jax.lax.dot_general(
                    xm[:, :h], lo, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                pb = pb + jax.lax.dot_general(
                    xm[:, h:], hi, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            elif variant == "C":
                p16 = blk.astype(jnp.int16) & 0xFF
                lo = (p16 & 0xF).astype(jnp.bfloat16) - 8.0
                hi = ((p16 >> 4) & 0xF).astype(jnp.bfloat16) - 8.0
                pb = jax.lax.dot_general(
                    xm[:, :h], lo, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                pb = pb + jax.lax.dot_general(
                    xm[:, h:], hi, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            elif variant == "D":
                lo = blk & jnp.int8(0xF)
                hi = jax.lax.shift_right_arithmetic(blk, jnp.int8(4)) & jnp.int8(0xF)
                pb = jax.lax.dot_general(
                    xm[:, :h], lo, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                pb = pb + jax.lax.dot_general(
                    xm[:, h:], hi, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            elif variant == "E":
                # AND-only unpack (i8 shifts/subs don't legalize in Mosaic):
                #   lo = B & 0x0F = raw low nibble n_lo (its -8 centering is
                #        the offset term: off = 8*s, the existing Q4_K path);
                #   hi = B & 0xF0 = 16*(n_hi - 8) EXACTLY, because the host
                #        XORs the high nibble with 8 (signed-4-bit encoding).
                # lo rows (m < BG/2) and hi rows (m >= BG/2) of the group
                # partials are disjoint, so pb_lo + pb_hi merges them and a
                # COMBINED scale array (s for lo rows, s/16 for hi rows,
                # both host-prepared) keeps a single scale pass.
                lo = blk & jnp.int8(0x0F)
                hi = blk & jnp.int8(~0x0F)
                pb = jax.lax.dot_general(
                    xm[:, :h], lo, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                pb = pb + jax.lax.dot_general(
                    xm[:, h:], hi, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                xg = jnp.sum(xm[:, :h].astype(jnp.float32), axis=1,
                             keepdims=True)  # zero for hi rows
                sblk = s_ref[b * Mp : (b + 1) * Mp, :]
                part = jnp.sum(sblk * pb - (8.0 * sblk) * xg,
                               axis=0, keepdims=True)
                acc = part if acc is None else acc + part
                continue
            else:
                raise ValueError(variant)
            part = jnp.sum(s_ref[b * Mp : (b + 1) * Mp, :] * pb,
                           axis=0, keepdims=True)
            acc = part if acc is None else acc + part
        o_ref[:] = acc

    return kernel


def build(C, R, seed=0):
    rng = np.random.default_rng(seed)
    n = rng.integers(0, 16, size=(C, R)).astype(np.uint8)  # raw nibbles
    s = (rng.random((R, C // GS)) * 0.05 + 0.01).astype(np.float32)
    x = (rng.random((1, C)) - 0.5).astype(np.float32)
    # reference from the bf16-rounded x the kernels actually consume
    x = np.asarray(jnp.asarray(x).astype(jnp.bfloat16)).astype(np.float32)
    w = (n.astype(np.float32) - 8.0).T  # [R, C] centered values
    w = (w.reshape(R, C // GS, GS) * s[..., None]).reshape(R, C)
    ref = x.astype(np.float32) @ w.T

    for M in (16, 12, 8):
        if C % (M * GS) == 0:
            BG = M
            break
    else:
        raise ValueError(C)
    BC = BG * GS
    nblk = C // BC
    Mp = 16
    h = BC // 2
    sT = np.zeros((nblk * Mp, R), np.float32)
    for b in range(nblk):
        sT[b * Mp : b * Mp + BG, :] = s[:, b * BG : (b + 1) * BG].T

    # pack: block b's byte j holds (lo = col b*BC+j) | (hi = col b*BC+h+j)<<4
    packed = np.zeros((C // 2, R), np.uint8)
    for b in range(nblk):
        lo = n[b * BC : b * BC + h, :]
        hi = n[b * BC + h : (b + 1) * BC, :]
        packed[b * h : (b + 1) * h, :] = lo | (hi << 4)
    packed_x = (packed ^ 0x80).astype(np.int8)  # variant B: signed high nibble
    return x, packed.view(np.int8), packed_x, sT, ref, BG, BC, nblk, Mp


GEOM = (1152, 13824)  # gate_up-like: the largest matmul in the 1B step


def make_fn(variant, C, R, geom, interpret=False):
    BG, BC, nblk, Mp = geom
    return pl.pallas_call(
        make_kernel(variant, C, R, BG, BC, nblk, Mp),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, R), jnp.float32),
        interpret=interpret,
    )


def offsets_correction(variant, x, sT, nblk, Mp, BC, ref):
    """Variant D computes with raw nibbles [0,15]; centered ref adds
    -8 * sum_g s[g] * sum_{c in g} x_c."""
    corr = np.zeros_like(ref)
    xs = x.reshape(-1, GS).sum(axis=1)  # [C//GS]
    for b in range(nblk):
        for m in range(Mp):
            g = b * (BC // GS) + m
            if g * GS >= x.size:
                continue
            corr += 8.0 * sT[b * Mp + m] * xs[g]
    return corr


def combined_scales_e(sT, BG, nblk, Mp):
    sC = sT.copy()
    for b in range(nblk):
        sC[b * Mp + BG // 2 : b * Mp + BG, :] /= 16.0
    return sC


def check(interpret=True):
    C, R = 512, 256
    x, packed, packed_x, sT, ref, BG, BC, nblk, Mp = build(C, R)
    geom = (BG, BC, nblk, Mp)
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    for v in ("A", "B", "C", "D", "E"):
        src = packed_x if v in ("B", "E") else packed
        s = combined_scales_e(sT, BG, nblk, Mp) if v == "E" else sT
        out = np.asarray(make_fn(v, C, R, geom, interpret=interpret)(
            xb, jnp.asarray(src), jnp.asarray(s)))
        want = ref + offsets_correction(v, x, sT, nblk, Mp, BC, ref) \
            if v == "D" else ref
        rel = np.abs(out - want) / (np.abs(want) + 1e-2)
        print(f"variant {v}: max rel err {rel.max():.2e}")
        assert rel.max() < 2e-2, (v, rel.max())


def lower():
    C, R = GEOM
    x, packed, packed_x, sT, ref, BG, BC, nblk, Mp = build(C, R)
    geom = (BG, BC, nblk, Mp)
    xb = jnp.zeros((1, C), jnp.bfloat16)
    pz = jnp.zeros((C // 2, R), jnp.int8)
    sz = jnp.zeros((nblk * Mp, R), jnp.float32)
    for v in ("A", "B", "C", "D"):
        try:
            export.export(jax.jit(make_fn(v, C, R, geom)),
                          platforms=["tpu"])(xb, pz, sz)
            print(f"variant {v}: lowers to Mosaic OK")
        except Exception as e:  # noqa: BLE001
            print(f"variant {v}: LOWERING FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")


def timeall():
    C, R = GEOM
    x, packed, packed_x, sT, ref, BG, BC, nblk, Mp = build(C, R)
    geom = (BG, BC, nblk, Mp)
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    sTj = jnp.asarray(sT)
    nbytes = C * R // 2 + sT.nbytes

    def timeit(tag, f, args, iters=(50, 250)):
        @functools.partial(jax.jit, static_argnums=(0,))
        def chain(n, xx, *rest):
            def body(acc, _):
                y = f(acc, *rest)
                return (acc * 0 + y[0, : acc.shape[1]].astype(acc.dtype)[None, :] * 1e-6 + acc), y[0, 0]
            _, ys = jax.lax.scan(body, xx, None, length=n)
            return ys
        ts = []
        for n in iters:
            np.asarray(chain(n, *args))
            t0 = time.perf_counter()
            np.asarray(chain(n, *args))
            ts.append(time.perf_counter() - t0)
        per = (ts[1] - ts[0]) / (iters[1] - iters[0])
        print(f"{tag}: {per*1e6:.1f} us/iter -> {nbytes/per/1e9:.0f} GB/s eff. stream")
        return per

    base = None
    for v in ("A", "E", "C", "D", "B"):
        src = packed_x if v in ("B", "E") else packed
        sTj = jnp.asarray(combined_scales_e(sT, BG, nblk, Mp)) if v == "E" \
            else jnp.asarray(sT)
        f = make_fn(v, C, R, geom)
        try:
            t = timeit(f"variant {v}", lambda xx, pp, ss: f(xx, pp, ss),
                       (xb, jnp.asarray(src), sTj))
        except Exception as e:  # noqa: BLE001
            print(f"variant {v}: COMPILE/RUN FAILED: {str(e)[:200]}")
            continue
        if v == "A":
            base = t
        elif base:
            print(f"  {base/t:.2f}x vs A")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "check"
    if cmd == "lower":
        lower()
    elif cmd == "check":
        check()
    elif cmd == "time":
        timeall()
    else:
        raise SystemExit(f"unknown: {cmd}")
