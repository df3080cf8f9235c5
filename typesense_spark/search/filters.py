"""Q9: the reference's ``filter_by`` DSL, compiled to ONE Catalyst
predicate over the docs table.

Reference semantics (``/root/reference/src/collection.cpp:1741-1891``
``parse_filter_query``; evaluation ``src/index.cpp:954-1142``
``do_filtering``; behavioral targets in
``test/collection_filtering_test.cpp``):

- clauses split on ``&&``, each ``field: value`` — clauses AND together;
- numeric/bool fields: optional comparator prefix (``>= > <= < =``,
  bare = equals); a bracketed list ``[v1, v2, ...]`` ORs the
  comparisons (multi-value OR, ``do_filtering`` unions result ids);
- bool values are ``true``/``false``;
- string fields: default CONTAINS = every token of the filter value
  must appear among the field's tokens (the reference ANDs the token
  posting lists — "country: South Africa" matches docs whose field has
  both tokens); ``:=`` switches to exact facet equality; a bracketed
  list ORs the values;
- pinned deviation: the reference restricts ``:=`` to facet-declared
  fields (HTTP 400 otherwise); we have no facet registry, so ``:=`` is
  allowed on any string column.

Spark mapping: every clause — including string token-CONTAINS — is a
pure Column expression (tokens via split + regexp_replace + filter,
same pinned tokenizer spec), so the whole DSL compiles to a WHERE that
Catalyst pushes into the parquet scan: no shuffle, no UDF, no index
lookup needed. (The reference walks its ART/num-tree indexes; a
columnar scan WITH predicate pushdown is the Spark-first equivalent —
at 100 TB the filter rides the scan it shares with scoring's
hydration join.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from typesense_spark.tokenizer import tokenize_terms

_NUM_OPS = ("<=", ">=", "<", ">", "=")  # two-char ops first


class FilterParseError(ValueError):
    pass


def _split_top(s: str, sep: str) -> list[str]:
    return [p for p in s.split(sep)]


def _num_comparator(raw: str) -> tuple[str, str]:
    """'>= 100' → ('>=', '100'); bare value → ('=', value)."""
    raw = raw.strip()
    for op in _NUM_OPS:
        if raw.startswith(op):
            return op, raw[len(op):].strip()
    return "=", raw


def _num_clause(col: Column, op: str, literal) -> Column:
    if op == "=":
        return col == literal
    if op == ">":
        return col > literal
    if op == ">=":
        return col >= literal
    if op == "<":
        return col < literal
    return col <= literal


def _doc_tokens(field: str) -> Column:
    """The field's token array, pinned tokenizer spec, pure Catalyst."""
    return F.filter(
        F.transform(
            F.split(F.col(field), "[ \n]", -1),
            lambda x: F.regexp_replace(F.lower(x), "[^a-z0-9]", ""),
        ),
        lambda x: x != "",
    )


def _string_contains(field: str, value: str) -> Column:
    """Token-AND CONTAINS: every token of `value` is among the field's
    tokens (reference ANDs the token posting lists)."""
    toks = tokenize_terms(value)
    if not toks:
        return F.lit(False)
    doc_toks = _doc_tokens(field)
    cond = F.array_contains(doc_toks, toks[0])
    for t in toks[1:]:
        cond = cond & F.array_contains(doc_toks, t)
    return cond


def _or_all(conds: list[Column]) -> Column:
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out


def parse_filter_by(filter_by: str, schema: dict[str, str]) -> Column:
    """``filter_by`` string → one boolean Column.

    ``schema``: docs column name → simple Spark type name (from
    ``dict(df.dtypes)``); used like the reference's search_schema to
    pick the numeric / bool / string grammar per field.
    """
    clauses: list[Column] = []
    for block in _split_top(filter_by, "&&"):
        if ":" not in block:
            raise FilterParseError(f"could not parse filter block: {block!r}")
        field, raw_value = block.split(":", 1)
        field = field.strip()
        raw_value = raw_value.strip()
        if field not in schema:
            raise FilterParseError(f"no filter field named {field!r} in schema")
        dtype = schema[field]
        is_string = dtype in ("string",)
        is_bool = dtype in ("boolean",)
        exact = False
        if raw_value.startswith("="):
            # `:=` exact match; for non-string fields '=' is a no-op
            exact = True
            raw_value = raw_value[1:].strip()
        values = (
            [v.strip() for v in raw_value[1:-1].split(",")]
            if raw_value.startswith("[") and raw_value.endswith("]")
            else [raw_value]
        )
        col = F.col(field)
        if is_bool:
            conds = []
            for v in values:
                if v not in ("true", "false"):
                    raise FilterParseError(f"bool filter value must be true/false: {v!r}")
                conds.append(col == (v == "true"))
            clauses.append(_or_all(conds))
        elif not is_string:
            conds = []
            for v in values:
                op, lit = _num_comparator(v)
                try:
                    num = float(lit) if dtype in ("float", "double") else int(lit)
                except ValueError as e:
                    raise FilterParseError(f"bad numeric literal {lit!r} for {field}") from e
                conds.append(_num_clause(col, op, num))
            clauses.append(_or_all(conds))
        else:
            if exact:
                clauses.append(_or_all([col == v for v in values]))
            else:
                clauses.append(_or_all([_string_contains(field, v) for v in values]))
    if not clauses:
        raise FilterParseError("empty filter_by")
    out = clauses[0]
    for c in clauses[1:]:
        out = out & c
    return out


def apply_filter_by(docs: DataFrame, filter_by: str) -> DataFrame:
    return docs.where(parse_filter_by(filter_by, dict(docs.dtypes)))
