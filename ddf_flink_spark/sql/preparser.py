"""Pre-parser for the reference's non-ANSI SQL statements.

The reference implements its whole dialect as a Scala PackratParser
(``flink/src/main/scala/io/ddf/flink/content/SqlSupport.scala:109-368``).
Spark SQL strictly supersets the SELECT subset, so the only custom parsing
this engine needs is:

* ``CREATE TABLE name (col type, ...)`` — declared schema registration
  (reference: ``SqlSupport.scala:112-113``, exec ``SqlHandler.scala:54-61``).
* ``LOAD '<url>' [DELIMITED BY '<sep>'] [WITH NULL '<s>'] [WITH EMPTY '<s>']
  [NO DEFAULTS] INTO <table>`` — CSV load into a declared table
  (reference: ``SqlSupport.scala:115-131``, exec ``SqlHandler.scala:33-52``,
  univocity InputFormat ``utils/package.scala:401-442``).
* ``@this`` substitution for DDF-scoped queries (reference: core
  ``TableNameReplacer``, used via ``SqlHandler.scala:15``).

Everything else is handed to ``spark.sql`` verbatim — Catalyst's
parse/analyze/optimize replaces the reference's direct physical construction
(``SqlHandler.scala:64-104``), giving predicate pushdown, column pruning and
join re-ordering for free.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

__all__ = ["CreateTable", "Load", "parse_statement", "substitute_this", "TYPE_ALIASES"]

# Reference DDL grammar accepts these aliases (``SqlSupport.scala:212-213``).
# The reference stores BIGINT as double and truncates doubles on parse
# (``Column2RowTypeInfo.scala:29``, ``RepresentationHandler.scala:96-101``) —
# documented bugs we deliberately fix with honest Spark types.
TYPE_ALIASES = {
    "VARCHAR": "string",
    "STRING": "string",
    "INT": "int",
    "INTEGER": "int",
    "FLOAT": "float",
    "DOUBLE": "double",
    "BIGINT": "bigint",
    "LONG": "bigint",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "BOOLEAN": "boolean",
    "BOOL": "boolean",
}


@dataclass
class CreateTable:
    table: str
    columns: list[tuple[str, str]] = field(default_factory=list)  # (name, spark_type)


@dataclass
class Load:
    url: str
    table: str
    delimiter: str = ","
    null_value: str | None = None
    empty_value: str | None = None
    use_defaults: bool = True  # ``NO DEFAULTS`` flips this (SqlSupport.scala:129)


_CREATE_RE = re.compile(
    r"^\s*create\s+table\s+(?:if\s+not\s+exists\s+)?(\w+)\s*\((.*)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_LOAD_RE = re.compile(
    r"^\s*load\s+'(?P<url>[^']+)'"
    r"(?:\s+delimited\s+by\s+'(?P<sep>[^']*)')?"
    r"(?:\s+with\s+null\s+'(?P<null>[^']*)')?"
    r"(?:\s+with\s+empty\s+'(?P<empty>[^']*)')?"
    r"(?P<nodef>\s+no\s+defaults)?"
    r"\s+into\s+(?P<table>\w+)\s*$",
    re.IGNORECASE,
)


def parse_statement(command: str) -> CreateTable | Load | str:
    """Classify a SQL command: CreateTable / Load AST, or pass-through string."""
    m = _CREATE_RE.match(command)
    if m:
        cols = []
        for part in _split_columns(m.group(2)):
            toks = part.split()
            if len(toks) < 2:
                raise ValueError(f"bad column spec in CREATE TABLE: {part!r}")
            name, typ = toks[0], toks[1].upper()
            if typ not in TYPE_ALIASES:
                raise ValueError(f"unsupported type {typ!r} in CREATE TABLE")
            cols.append((name, TYPE_ALIASES[typ]))
        return CreateTable(table=m.group(1), columns=cols)
    m = _LOAD_RE.match(command)
    if m:
        return Load(
            url=m.group("url"),
            table=m.group("table"),
            delimiter=m.group("sep") if m.group("sep") is not None else ",",
            null_value=m.group("null"),
            empty_value=m.group("empty"),
            use_defaults=m.group("nodef") is None,
        )
    return command


def _split_columns(body: str) -> list[str]:
    """Split a CREATE column body on top-level commas."""
    parts, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return [p for p in parts if p]


_THIS_RE = re.compile(r"@this\b", re.IGNORECASE)


def substitute_this(command: str, table_name: str) -> str:
    """Replace ``@this`` with the DDF's registered view name."""
    return _THIS_RE.sub(table_name, command)
