"""Boundary-safe rounding, applied identically on both engines.

Why: aggregate doubles from cents-valued data land EXACTLY on rounding
boundaries (a sum of 4-decimal price×discount products is a multiple of
1e-4, so round-to-2 sees true values at x.xx5 constantly), and the two
engines' summation orders differ by ~n·ulp — so each engine rounds the
knife-edge value in whichever direction its last bit fell. A fixed tiny
epsilon fails twice over: 1e-9 is BELOW one ulp at 1e7 magnitudes
(adding it is a no-op), and a large fixed epsilon would mis-round small
values. The calibrated nudge

    round(x + 1e-6 + |x| * 1e-12, k)

is (a) far above the cross-engine summation difference at any magnitude
this engine aggregates (ratio ≥ ~4000/√n_rows_per_group), and (b) far
below the 1e-4 value grid of cents-derived data, so only true
boundary-sitters are pushed — and both engines push them the same way.

``eround`` is the DataFrame form; ``apply_sql_eround`` rewrites every
``round(X, k)`` in a SQL string (used for DuckDB oracles AND the
shared-SQL Spark builders, so both sides compute the identical formula).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ABS_EPS = "1e-6"
REL_EPS = "1e-12"


def eround(col, scale: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c + float(ABS_EPS) + F.abs(c) * float(REL_EPS), scale)


def apply_sql_eround(sql: str) -> str:
    """Rewrite every ``round(X, k)`` call in ``sql`` to the epsilon form.
    Balanced-paren scan; processes matches right-to-left so offsets stay
    valid; already-rewritten calls are left alone (idempotent via the
    sentinel comment)."""
    token = "round("
    sentinel = "/*er*/"
    out = sql
    idx = len(out)
    while True:
        pos = out.rfind(token, 0, idx)
        if pos < 0:
            break
        idx = pos
        # skip if part of a longer identifier (e.g. no 'xround' exists,
        # but guard anyway) or already rewritten
        if pos > 0 and (out[pos - 1].isalnum() or out[pos - 1] in "_."):
            # F.round( in python source should never reach here; '.'
            # guards qualified names
            continue
        if out[pos + len(token):].startswith(sentinel):
            continue
        depth = 1
        i = pos + len(token)
        last_comma = -1
        while i < len(out) and depth:
            ch = out[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 1:
                last_comma = i
            i += 1
        if depth or last_comma < 0:
            continue  # unbalanced or single-arg round — leave untouched
        inner = out[pos + len(token):last_comma]
        rest = out[last_comma:i]  # ', k)'
        new = (
            f"round({sentinel}({inner}) + {ABS_EPS} "
            f"+ abs({inner}) * {REL_EPS}{rest}"
        )
        out = out[:pos] + new + out[i:]
    return out
