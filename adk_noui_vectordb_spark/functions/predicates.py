"""Literal predicate builders that stay OFF the py4j chat channel.

Building an OR-of-(a=x AND b=y) probe predicate with Column operators
costs 3-4 JVM round trips PER PAIR (`F.col ==`, `&`, `|` each call into
the gateway): measured 0.6-0.7 s of pure driver latency for the served
late-interaction probe's 77 pairs at sf0.1 — half the key's wall time,
before any job ran (r17; guide §7.3 driver-side latency). Rendering the
same predicate as ONE SQL string and parsing it with a single
``F.expr`` call produces the identical Catalyst tree (same partition
pruning, same results) in ~1 ms regardless of pair count.
"""

from __future__ import annotations

from typing import Iterable, Tuple

from pyspark.sql import Column
from pyspark.sql import functions as F


def pair_eq_any(
    col_a: str, col_b: str, pairs: "Iterable[Tuple[int, int]]"
) -> Column:
    """``(col_a = a1 AND col_b = b1) OR (col_a = a2 AND col_b = b2) ...``
    as one parsed expression. Values are forced through ``int()`` — the
    probe/partition keys this serves are always integral — so the
    rendered SQL cannot carry anything but literals."""
    terms = [
        f"({col_a} = {int(a)} AND {col_b} = {int(b)})" for a, b in pairs
    ]
    if not terms:
        raise ValueError("pair_eq_any: empty pair set")
    return F.expr(" OR ".join(terms))
