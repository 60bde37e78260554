"""Cross-engine activation-parity harness.

The TPU-native port of the reference's llama.cpp comparison tooling
(reference diff_with_llama_cpp.sh + compare_tensors.py, SURVEY.md §2 C16):
parse a reference-engine verbose dump (the print_tensor format,
reference tensor.h:22-85), align tensors by name/sequence against this
engine's trace records (trace.py), and report per-tensor divergence.
"""

from __future__ import annotations

import dataclasses
import re

import numpy as np

_HDR = re.compile(r"^(?P<name>.*\S)\s*=\s*\{(?P<shape>[\d,\s]+)\}\s*$")
_SUM = re.compile(r"^\s*sum\s*=\s*(?P<sum>[-\d.naif]+)\s*$", re.IGNORECASE)


@dataclasses.dataclass
class DumpRecord:
    name: str
    shape: tuple[int, ...]
    total: float
    corners: list[float]


def parse_reference_dump(text: str) -> list[DumpRecord]:
    """Parse the reference's -v stdout into named records (name, shape,
    checksum sum, corner samples)."""
    records: list[DumpRecord] = []
    current: DumpRecord | None = None
    for line in text.splitlines():
        m = _HDR.match(line)
        if m and "[" not in line:
            shape = tuple(int(x) for x in m.group("shape").split(","))
            current = DumpRecord(name=m.group("name"), shape=shape, total=float("nan"), corners=[])
            records.append(current)
            continue
        if current is None:
            continue
        s = _SUM.match(line)
        if s:
            try:
                current.total = float(s.group("sum"))
            except ValueError:
                current.total = float("nan")
            current = None
            continue
        # corner-value rows look like "      [   0.1234, ..., -0.5678],"
        stripped = line.strip()
        if stripped.startswith("[") and any(c.isdigit() for c in stripped):
            for tok in stripped.strip("[],").split(","):
                tok = tok.strip().rstrip("],")
                if tok and tok != "...":
                    try:
                        current.corners.append(float(tok))
                    except ValueError:
                        pass
    return records


@dataclasses.dataclass
class Divergence:
    name: str
    ref_sum: float
    our_sum: float
    abs_diff: float
    rel_diff: float


def compare_sums(
    ref_records: list[DumpRecord],
    our_records: list[tuple[str, np.ndarray]],
    *,
    rel_tol: float = 1e-3,
) -> list[Divergence]:
    """Align by (name, occurrence) and report checksum divergences, in
    forward-pass order — the first entries localize where engines split."""
    ours: dict[tuple[str, int], float] = {}
    seen: dict[str, int] = {}
    order: list[tuple[str, int]] = []
    magnitudes: dict[tuple[str, int], float] = {}
    for name, value in our_records:
        k = (name, seen.get(name, 0))
        seen[name] = seen.get(name, 0) + 1
        ours[k] = float(np.asarray(value, dtype=np.float64).sum())
        magnitudes[k] = float(np.abs(np.asarray(value, dtype=np.float64)).sum())
        order.append(k)

    out: list[Divergence] = []
    seen_ref: dict[str, int] = {}
    for rec in ref_records:
        k = (rec.name, seen_ref.get(rec.name, 0))
        seen_ref[rec.name] = seen_ref.get(rec.name, 0) + 1
        if k not in ours:
            continue
        diff = abs(ours[k] - rec.total)
        denom = max(abs(rec.total), magnitudes.get(k, 0.0), 1e-6)
        rel = diff / denom
        if rel > rel_tol:
            out.append(Divergence(rec.name, rec.total, ours[k], diff, rel))
    return out
