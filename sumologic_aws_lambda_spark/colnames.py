"""Collision-proof internal column naming.

Round 10 fixed the same defect class four separate times: an operator
staging a working column (``_fp``, ``_cap_key``, ``_psl_h``, ...) that
silently OVERWRITES — and is then dropped with — a user data column of
the same name.  Every operator that stages internal columns derives
them through these helpers so the fix lives in one place.
"""

from __future__ import annotations

from collections.abc import Iterable


def fresh_name(columns: Iterable[str], base: str) -> str:
    """``base``, extended with ``_x`` until it matches no existing
    column — for a single staged working column.  Comparison is
    CASE-INSENSITIVE: Spark resolves column names case-insensitively
    by default, so a user column '_FP' would otherwise be replaced and
    dropped by a staged '_fp' (round-10 ninth-pass review)."""
    cols = {c.lower() for c in columns}
    name = base
    while name.lower() in cols:
        name += "_x"
    return name


def fresh_prefix(columns: Iterable[str], base: str,
                 *extra: str) -> str:
    """``base``, extended with ``_x`` until NO existing column (nor any
    name in ``extra``, e.g. a caller-chosen output column) starts with
    it — for a FAMILY of staged columns (``{prefix}_h``,
    ``{prefix}_t2``, ...).  Prefix-scan, not exact-match: the family's
    members are formed by suffixing, so any column sharing the prefix
    could collide with a member."""
    cols = [c.lower() for c in (*columns, *extra)]
    prefix = base
    while any(c.startswith(prefix.lower()) for c in cols):
        prefix += "_x"
    return prefix
