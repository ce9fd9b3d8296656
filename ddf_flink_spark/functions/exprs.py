"""SQL-text builders for large literal expression trees.

Why this module exists (round-12 optimization): building a k×dim
distance tree through the PySpark Column API costs ONE py4j round-trip
per ``F.lit``/``F.zip_with``/``F.aggregate`` call — ~60,000 synchronous
driver↔JVM round-trips for one PQ training pass (measured: 36 s of a
41 s q275 run was py4j ``send_command``, the JVM idle the whole time).
Emitting the SAME expression as one SQL string through ``F.expr``
parses in the JVM in one round-trip (~37× cheaper construction,
measured) and evaluates bit-identically: the SQL lambda forms parse to
the same Catalyst ``LambdaFunction``/``aggregate`` nodes, literal
doubles round-trip exactly through ``repr`` (shortest-round-trip float
repr → ``Double.parseDouble`` → the same IEEE-754 value, incl.
denormals), and the fold order / rounding calls are copied verbatim
from the Column forms they replace (pinned by
tests/test_operators.py::TestExprSql).

Every builder documents the Column expression it replaces; the rule
for adding one is that the generated text must parse to an expression
whose VALUE is bit-identical to the Column form — plan shape may
differ (e.g. one parsed tree instead of nested ``CreateArray`` calls),
results may not.
"""

from __future__ import annotations

__all__ = [
    "dlit",
    "darray",
    "darray2",
    "sqdist_sql",
    "argmin_struct_sql",
    "dot_sql",
    "probe_sql",
]


def dlit(x: float) -> str:
    """SQL double literal with exact round-trip: ``repr(float)`` is the
    shortest decimal string that parses back to the same double, and
    Spark's parser uses ``Double.parseDouble`` — so the JVM sees the
    bit-identical value ``F.lit(float(x))`` would have shipped."""
    x = float(x)
    if x != x or x in (float("inf"), float("-inf")):
        raise ValueError(f"dlit: non-finite literal {x!r}")
    return f"{x!r}D"


def darray(vals) -> str:
    """``array(<double literals>)`` — replaces
    ``F.array(*[F.lit(float(v)) for v in vals])`` (one py4j call per
    element) with one parsed text."""
    return "array(" + ", ".join(dlit(v) for v in vals) + ")"


def darray2(rows) -> str:
    """``array(array(<doubles>), ...)`` — nested literal text for a
    centroid table; the text form of ``F.lit([[...], ...])``."""
    return "array(" + ", ".join(darray(r) for r in rows) + ")"


def sqdist_sql(vec_sql: str, cent: list) -> str:
    """Squared-L2 fold between an array-typed SQL expression and a
    literal centroid — the exact text form of::

        F.aggregate(
            F.zip_with(vec, F.array(*lits), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x)

    Same zip_with/aggregate nodes, same 0.0 seed, same left-to-right
    fold order, so the double result is bit-identical."""
    return (
        f"aggregate(zip_with({vec_sql}, {darray(cent)}, "
        "(x, y) -> (x - y) * (x - y)), 0.0D, (acc, x) -> acc + x)"
    )


def dot_sql(a_sql: str, b_sql: str) -> str:
    """Text form of :func:`similarity.dot` (double-cast zip_with
    product folded into a 0.0-seeded sum — same order, bit-identical).
    The double casts are kept even for already-double inputs, exactly
    like the Column form."""
    return (
        f"aggregate(zip_with({a_sql}, {b_sql}, "
        "(x, y) -> cast(x as double) * cast(y as double)), "
        "0.0D, (acc, x) -> acc + x)"
    )


def probe_sql(coarse: list, vec_sql: str, nprobe: int) -> str:
    """Text of the coarse-probe frontier every IVF/ADC serve path
    computes: rank the centroids by ROUND(-dot(v, c), 6) with list-id
    tie-break and keep the top ``nprobe`` — the exact Column form::

        F.slice(F.array_sort(F.transform(
            F.sequence(0, n-1),
            lambda i: F.struct(round(-dot(v, element_at(cents, i+1)), 6)
                               .alias("neg"), i.alias("list_id")))), 1, nprobe)

    Callers append ``.list_id`` for the bare cell ids or explode the
    struct to keep the rank context. Bit-identical: same dot fold, same
    negate-then-round, same (neg, list_id) struct sort."""
    cents = darray2(coarse)
    dot = dot_sql(vec_sql, f"element_at({cents}, i + 1)")
    return (
        f"slice(array_sort(transform(sequence(0, {len(coarse) - 1}), "
        f"i -> named_struct('neg', round(-({dot}), 6), 'list_id', i))), "
        f"1, {nprobe})"
    )


def argmin_struct_sql(
    dist_sqls: list[str], extras: "list[list[tuple[str, str]]] | None" = None
) -> str:
    """``array_min(array(named_struct('rd', round(d_i, 6), 'cluster', i
    [, extras_i...])))`` — the deterministic argmin-with-tiebreak the
    repo's Lloyd/encode paths use: rank on the distance ROUNDED to 6
    digits, break ties on the lower cluster id (struct ordering is
    field order, so this equals the Column form's ``F.array_min`` over
    ``struct(rd, cluster, ...)``). ``extras``, when given, appends
    per-element (name, sql) payload fields after the tie-break key."""
    elems = []
    for i, d in enumerate(dist_sqls):
        fields = f"'rd', round({d}, 6), 'cluster', {i}"
        if extras is not None:
            for name, sql in extras[i]:
                fields += f", '{name}', {sql}"
        elems.append(f"named_struct({fields})")
    return f"array_min(array({', '.join(elems)}))"
