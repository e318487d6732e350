"""ChromaDB ``where`` / ``where_document`` filter DSL → Spark Column.

The reference drives every filtered read through ChromaDB's metadata
filter dict (coding_agent/tools/vector_search_tool.py:39-46 builds
``where={"file_type": ...}``; :166 ``where={"element_type": ...}``;
:219 ``where={"file_path": ...}``) — the equality SHORTHAND of
ChromaDB's public filter grammar. A user switching from the reference
owns queries written in the full grammar, so this module compiles all
of it:

``where`` (metadata):
    {field: value}                       — shorthand for {"$eq": value}
    {field: {"$eq"|"$ne"|"$gt"|"$gte"|"$lt"|"$lte": value}}
    {field: {"$in"|"$nin": [v, ...]}}
    {"$and"|"$or": [where, where, ...]}  — >= 2 branches
    {f1: ..., f2: ...}                   — implicit AND across fields

``where_document`` (text):
    {"$contains": "substr"} | {"$not_contains": "substr"}
    {"$and"|"$or": [where_document, ...]}

Compilation is a pure dict→``pyspark.sql.Column`` fold — the output is
ordinary Catalyst predicates (EqualTo / GreaterThan / In / Contains /
And / Or / Not), so filter pushdown, partition pruning and column
pruning all apply exactly as if the user had written ``F.col(...)``
by hand (pinned in tests/test_plans.py: a compiled filter reaches the
parquet scan's PushedFilters). ``where_to_sql`` renders the SAME tree
as an ANSI-SQL predicate so every consumer's DuckDB oracle twin can
share one source of truth, and the property test replays random trees
cross-engine (tests/test_properties.py).

Scale shape: a compiled filter is a zero-cost plan node — no UDF, no
driver materialization; selectivity lives wherever the consumer puts
the predicate (metadata sidecar scan, parquet row-group skip).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_CMP = {
    "$eq": lambda c, v: c == v,
    # ChromaDB's negation operators match rows where the field is MISSING
    # (NULL here): $ne mirrors the $nin treatment below, closing the
    # three-valued-NULL hole a plain c != v leaves open.
    "$ne": lambda c, v: (c != v) | c.isNull(),
    "$gt": lambda c, v: c > v,
    "$gte": lambda c, v: c >= v,
    "$lt": lambda c, v: c < v,
    "$lte": lambda c, v: c <= v,
}
_CMP_SQL = {"$eq": "=", "$ne": "<>", "$gt": ">", "$gte": ">=", "$lt": "<", "$lte": "<="}
_SCALARS = (str, int, float, bool)


def _check_scalar(op: str, v):
    if not isinstance(v, _SCALARS):
        raise ValueError(f"{op}: expected str/int/float/bool, got {type(v).__name__}")
    return v


def _check_list(op: str, v):
    if not isinstance(v, (list, tuple)) or not v:
        raise ValueError(f"{op}: expected a non-empty list")
    for x in v:
        _check_scalar(op, x)
    return list(v)


def _branches(op: str, v):
    if not isinstance(v, (list, tuple)) or len(v) < 2:
        raise ValueError(f"{op}: expected a list of >= 2 sub-filters")
    return v


def _fold_and(cols):
    out = cols[0]
    for c in cols[1:]:
        out = out & c
    return out


def _fold_or(cols):
    out = cols[0]
    for c in cols[1:]:
        out = out | c
    return out


def _field_pred(field: str, spec) -> Column:
    c = F.col(field)
    if not isinstance(spec, dict):
        return c == _check_scalar("$eq", spec)
    if len(spec) != 1:
        raise ValueError(f"{field}: operator dict must have exactly one key, got {sorted(spec)}")
    (op, v), = spec.items()
    if op in _CMP:
        return _CMP[op](c, _check_scalar(op, v))
    if op == "$in":
        return c.isin(_check_list(op, v))
    if op == "$nin":
        # ChromaDB $nin keeps rows whose value is outside the list; a
        # NULL metadata value is "not in" any list there, so the
        # three-valued-NULL hole is closed explicitly.
        return ~c.isin(_check_list(op, v)) | c.isNull()
    raise ValueError(f"{field}: unknown operator {op!r}")


def compile_where(where: dict) -> Column:
    """Compile a ChromaDB ``where`` metadata filter to a Spark Column."""
    if not isinstance(where, dict) or not where:
        raise ValueError("where: expected a non-empty dict")
    preds = []
    for k, v in where.items():
        if k == "$and":
            preds.append(_fold_and([compile_where(b) for b in _branches(k, v)]))
        elif k == "$or":
            preds.append(_fold_or([compile_where(b) for b in _branches(k, v)]))
        elif k.startswith("$"):
            raise ValueError(f"where: unknown logical operator {k!r}")
        else:
            preds.append(_field_pred(k, v))
    return _fold_and(preds)


def compile_where_document(where_document: dict, text_col: str = "text") -> Column:
    """Compile a ChromaDB ``where_document`` filter against ``text_col``.

    ``$contains`` is raw SUBSTRING containment (ChromaDB's contract —
    not token match; the token-exact surface is the inverted-index
    family, operators/invindex.py).
    """
    if not isinstance(where_document, dict) or len(where_document) != 1:
        raise ValueError("where_document: expected a dict with exactly one key")
    (op, v), = where_document.items()
    c = F.col(text_col)
    if op == "$contains":
        return c.contains(_check_str(op, v))
    if op == "$not_contains":
        return ~c.contains(_check_str(op, v))
    if op in ("$and", "$or"):
        cols = [compile_where_document(b, text_col) for b in _branches(op, v)]
        return _fold_and(cols) if op == "$and" else _fold_or(cols)
    raise ValueError(f"where_document: unknown operator {op!r}")


def _check_str(op: str, v) -> str:
    if not isinstance(v, str) or not v:
        raise ValueError(f"{op}: expected a non-empty string")
    return v


# ---------------------------------------------------------------- SQL twin


def _sql_lit(v) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


def _field_sql(field: str, spec) -> str:
    if not isinstance(spec, dict):
        return f"{field} = {_sql_lit(_check_scalar('$eq', spec))}"
    (op, v), = spec.items()
    if op == "$ne":
        # twin of _CMP["$ne"]: negation matches NULL (missing) values
        return f"({field} <> {_sql_lit(_check_scalar(op, v))} OR {field} IS NULL)"
    if op in _CMP_SQL:
        return f"{field} {_CMP_SQL[op]} {_sql_lit(_check_scalar(op, v))}"
    if op == "$in":
        return f"{field} IN ({', '.join(_sql_lit(x) for x in _check_list(op, v))})"
    if op == "$nin":
        lst = ", ".join(_sql_lit(x) for x in _check_list(op, v))
        return f"({field} NOT IN ({lst}) OR {field} IS NULL)"
    raise ValueError(f"{field}: unknown operator {op!r}")


def where_to_sql(where: dict) -> str:
    """Render the same ``where`` tree as an ANSI-SQL predicate (DuckDB
    oracle twin — one filter definition, two engines)."""
    if not isinstance(where, dict) or not where:
        raise ValueError("where: expected a non-empty dict")
    parts = []
    for k, v in where.items():
        if k == "$and":
            parts.append("(" + " AND ".join(where_to_sql(b) for b in _branches(k, v)) + ")")
        elif k == "$or":
            parts.append("(" + " OR ".join(where_to_sql(b) for b in _branches(k, v)) + ")")
        elif k.startswith("$"):
            raise ValueError(f"where: unknown logical operator {k!r}")
        else:
            parts.append(_field_sql(k, v))
    return "(" + " AND ".join(parts) + ")" if len(parts) > 1 else parts[0]


def where_document_to_sql(where_document: dict, text_col: str = "text") -> str:
    """ANSI-SQL twin of ``compile_where_document`` (DuckDB oracle)."""
    if not isinstance(where_document, dict) or len(where_document) != 1:
        raise ValueError("where_document: expected a dict with exactly one key")
    (op, v), = where_document.items()
    if op == "$contains":
        return f"contains({text_col}, {_sql_lit(_check_str(op, v))})"
    if op == "$not_contains":
        return f"NOT contains({text_col}, {_sql_lit(_check_str(op, v))})"
    if op in ("$and", "$or"):
        j = " AND " if op == "$and" else " OR "
        return "(" + j.join(where_document_to_sql(b, text_col) for b in _branches(op, v)) + ")"
    raise ValueError(f"where_document: unknown operator {op!r}")
