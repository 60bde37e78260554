#!/usr/bin/env python
"""Cross-engine activation diff: this framework vs the reference C++ engine.

The TPU-native counterpart of the reference's own llama.cpp harness
(reference diff_with_llama_cpp.sh + compare_tensors.py): runs BOTH engines
on the same GGUF + token sequence — the reference via a ctypes build of its
actual sources — captures the reference's verbose named-tensor dump and our
trace taps, aligns tensors by name/occurrence, and reports per-tensor
checksum divergence with the top offenders.

    python tools/compare_with_reference.py -m model.gguf -p "prompt" [--chat]
"""

from __future__ import annotations

import argparse
import ctypes
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", default="One sentence fact about silicon")
    ap.add_argument("--chat", action="store_true", help="apply the chat template")
    ap.add_argument("--rel-tol", type=float, default=1e-3)
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--ref-dump", default=None,
                    help="use a saved verbose dump FILE as the reference "
                         "instead of running the compiled oracle — e.g. "
                         "llama.cpp's llama-eval-callback output (the "
                         "reference's own golden leg, "
                         "diff_with_llama_cpp.sh)")
    ap.add_argument("--dump-format", choices=["reference", "eval-callback"],
                    default="reference",
                    help="format of --ref-dump: the reference engine's -v "
                         "print_tensor dump, or llama.cpp eval-callback")
    ap.add_argument("--out", default=None,
                    help="also write the comparison report (incl. the "
                         "log-MSE plot) to this file")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")  # parity math runs f32 on CPU

    from oracle_harness import OracleModel, get_oracle
    from llm_inference_tpu import parity, trace
    from llm_inference_tpu.gguf import GGUFFile
    from llm_inference_tpu.models import forward, init_cache, load_weights
    from llm_inference_tpu.tokenizer import Tokenizer

    buf = open(args.model, "rb").read()
    gguf = GGUFFile(args.model)
    hp, weights = load_weights(gguf)
    tok = Tokenizer(gguf.metadata, hp.architecture)
    ids = tok.encode(args.prompt, args.chat).ids
    print(f"tokens: {ids}", file=sys.stderr)

    if args.ref_dump:
        dump = open(args.ref_dump).read()
        parse = (parity.parse_eval_callback_dump
                 if args.dump_format == "eval-callback"
                 else parity.parse_reference_dump)
        ref_records = parse(dump)
    else:
        lib = get_oracle()
        lib.oracle_set_verbose.argtypes = [ctypes.c_int]
        ref = OracleModel(buf)
        lib.oracle_set_verbose(1)
        with tempfile.NamedTemporaryFile(mode="w+") as tf:
            saved = os.dup(1)
            os.dup2(tf.fileno(), 1)
            try:
                ref.forward(ids, 0, hp.vocab_size)
            finally:
                sys.stdout.flush()
                os.dup2(saved, 1)
                os.close(saved)
            tf.seek(0)
            dump = tf.read()
        lib.oracle_set_verbose(0)
        ref.close()
        ref_records = parity.parse_reference_dump(dump)
    print(f"reference: {len(ref_records)} named tensors", file=sys.stderr)

    session = trace.enable_trace("/tmp/llmi_compare_trace.npz")
    cache = init_cache(hp, max(64, len(ids) * 2))
    forward(hp, weights, cache, jnp.asarray(ids, dtype=jnp.int32), 0)
    trace.disable_trace()
    print(f"tpu engine: {len(session.records)} named tensors", file=sys.stderr)

    # the reference comparer's own report: per-tensor |dsum| + corner-value
    # MSE with name/sequence alignment, top offenders, overall average
    comps = parity.compare_values(ref_records, session.records)
    report = parity.format_comparison_report(comps, top=args.top)
    report += "\n\n" + parity.mse_logplot(comps)
    print(report)
    if args.out:
        with open(args.out, "w") as f:
            f.write(report + "\n")
        print(f"\nreport -> {args.out}", file=sys.stderr)

    div = parity.compare_sums(ref_records, session.records, rel_tol=args.rel_tol)
    if not div:
        print(f"\nPARITY OK: no per-tensor divergence above rel_tol={args.rel_tol}")
        return 0
    div.sort(key=lambda d: -d.rel_diff)
    print(f"\n{len(div)} tensors above rel_tol={args.rel_tol}; top offenders:")
    for d in div[: args.top]:
        print(f"  {d.name:36s} ref={d.ref_sum:14.6f} ours={d.our_sum:14.6f} rel={d.rel_diff:.3e}")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
