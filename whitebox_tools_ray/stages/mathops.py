"""The scalar-function library — §2.8 of SURVEY.md.

The reference ships ~50 per-cell scalar tools (math_stat_analysis/add.rs,
sin.rs, power.rs, ... each a whole file); here they collapse into ONE
vectorized ``map_batches`` stage parameterized by op name, operating on a
column vs a column or a constant (the reference's ``ExistingFileOrFloat``
signature, add.rs:49-59, with the constant fast path :255-330).

Nodata sentinel semantics preserved: cells equal to ``nodata`` pass
through untouched (compare ``!=``, raster/mod.rs sentinel convention).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_UNARY = {
    "abs": np.abs,
    "ceil": np.ceil,
    "floor": np.floor,
    "negate": np.negative,
    "not": lambda v: (v == 0).astype(np.float64),
    "exp": np.exp,
    "exp2": np.exp2,
    "ln": np.log,
    "log10": np.log10,
    "log2": np.log2,
    "sqrt": np.sqrt,
    "square": np.square,
    "reciprocal": np.reciprocal,
    "sin": np.sin,
    "cos": np.cos,
    "tan": np.tan,
    "arcsin": np.arcsin,
    "arccos": np.arccos,
    "arctan": np.arctan,
    "sinh": np.sinh,
    "cosh": np.cosh,
    "tanh": np.tanh,
    "arsinh": np.arcsinh,
    "arcosh": np.arccosh,
    "artanh": np.arctanh,
    "to_degrees": np.degrees,
    "to_radians": np.radians,
    "round": np.round,
    "truncate": np.trunc,
    "increment": lambda v: v + 1.0,
    "decrement": lambda v: v - 1.0,
    "is_nodata": None,  # special-cased
}

_BINARY = {
    "add": np.add,
    "subtract": np.subtract,
    "multiply": np.multiply,
    "divide": np.divide,
    "integer_division": lambda a, b: np.trunc(a / b),
    "modulo": np.fmod,
    "power": np.power,
    "max": np.maximum,
    "min": np.minimum,
    "atan2": np.arctan2,
    "equal_to": lambda a, b: (a == b).astype(np.float64),
    "not_equal_to": lambda a, b: (a != b).astype(np.float64),
    "greater_than": lambda a, b: (a > b).astype(np.float64),
    "less_than": lambda a, b: (a < b).astype(np.float64),
    "and": lambda a, b: ((a != 0) & (b != 0)).astype(np.float64),
    "or": lambda a, b: ((a != 0) | (b != 0)).astype(np.float64),
    "xor": lambda a, b: ((a != 0) ^ (b != 0)).astype(np.float64),
}

OPS = sorted(_UNARY) + sorted(_BINARY)


def scalar_op(
    ds,
    op: str,
    col: str,
    other: str | float | None = None,
    out_col: str | None = None,
    nodata: float | None = None,
):
    """Apply a scalar op to ``col`` (vs column name or constant ``other``
    for binary ops). Appends ``out_col`` (default ``f"{op}_{col}"``)."""
    out_col = out_col or f"{op}_{col}"

    if op in _UNARY:
        fn = _UNARY[op]

        def kernel(batch: pa.Table) -> pa.Table:
            v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
            if op == "is_nodata":
                out = (v == nodata).astype(np.float64) if nodata is not None else np.zeros_like(v)
            else:
                with np.errstate(all="ignore"):
                    out = fn(v)
            if nodata is not None and op != "is_nodata":
                out = np.where(v == nodata, nodata, out)
            return batch.append_column(out_col, pa.array(out))

    elif op in _BINARY:
        if other is None:
            raise ValueError(f"binary op {op!r} needs `other`")
        fn = _BINARY[op]
        is_col = isinstance(other, str)

        def kernel(batch: pa.Table) -> pa.Table:
            a = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
            b = (
                batch[other].to_numpy(zero_copy_only=False).astype(np.float64)
                if is_col
                else np.float64(other)
            )
            with np.errstate(all="ignore"):
                out = fn(a, b)
            if nodata is not None:
                bad = a == nodata
                if is_col:
                    bad = bad | (b == nodata)
                out = np.where(bad, nodata, out)
            return batch.append_column(out_col, pa.array(out))

    else:
        raise ValueError(f"unknown op {op!r}; known: {OPS}")

    return ds.map_batches(kernel, batch_format="pyarrow")
