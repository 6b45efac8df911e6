"""Collective inventory of a compiled HLO module (text form).

One shared parser for the sharding regression gates
(tests/test_scaling_hlo.py) and the weak-scaling table
(scripts/weak_scaling_table.py) — two independent regexes over lowered
HLO had already drifted once (byte counts vs shapes, and the async
``*-start`` tuple form where the FIRST shape is the pre-collective
operand, not the result).
"""

from __future__ import annotations

import re
from typing import List, Tuple

COLLECTIVE_OPS = (
    "all-gather",
    "all-reduce",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)

_SHAPE = re.compile(r"([a-z][a-z0-9]*)\[([0-9,]*)\]")

DTYPE_BYTES = {
    "f64": 8,
    "f32": 4,
    "bf16": 2,
    "f16": 2,
    "s64": 8,
    "s32": 4,
    "u32": 4,
    "s16": 2,
    "u16": 2,
    "s8": 1,
    "u8": 1,
    "pred": 1,
}


def collective_results(txt: str) -> List[Tuple[str, str, Tuple[int, ...]]]:
    """[(op, dtype, result_dims)] for every collective instruction.

    For the async ``<op>-start`` form the instruction's result is a tuple
    ``(operand_shape, result_shape, ...)`` — the LAST shape is the
    collective's output; sync forms have a single result shape.
    """
    out = []
    for line in txt.splitlines():
        for op in COLLECTIVE_OPS:
            if f" {op}(" not in line and f"{op}-start(" not in line:
                continue
            lhs = line.split(f" {op}(")[0].split(f"{op}-start(")[0]
            if "=" in lhs:
                lhs = lhs.split("=", 1)[1]
            shapes = _SHAPE.findall(lhs)
            if not shapes:
                continue
            dt, dims = shapes[-1]  # result shape (last of a -start tuple)
            out.append(
                (op, dt, tuple(int(d) for d in dims.split(",") if d))
            )
            break
    return out


def collective_bytes(txt: str):
    """{op: (count, total_result_bytes)} over the module."""
    inv = {}
    for op, dt, dims in collective_results(txt):
        n = 1
        for d in dims:
            n *= d
        cnt, byt = inv.get(op, (0, 0))
        inv[op] = (cnt + 1, byt + n * DTYPE_BYTES.get(dt, 4))
    return inv
