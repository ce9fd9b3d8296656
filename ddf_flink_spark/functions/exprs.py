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
    "argmin_lambda_sql",
    "argmin_lambda_over_sql",
    "dot_sql",
    "probe_sql",
    "values_df",
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


def _split_fields(schema: str) -> "list[tuple[str, str]]":
    """Parse a DDL schema string ("j int, cd array<double>") into
    (name, type) pairs, splitting only at top-level commas (commas
    inside ``array<...>`` / ``decimal(p,s)`` stay put)."""
    fields, depth, cur = [], 0, []
    for ch in schema:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            fields.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        fields.append("".join(cur))
    out = []
    for f in fields:
        name, typ = f.strip().split(None, 1)
        out.append((name, typ.strip()))
    return out


def _sql_val(v) -> str:
    """One SQL literal for a Python scalar/list; exact round-trip for
    every type the tiny-frame call sites use (see :func:`values_df`)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        if v != v:
            return "CAST('NaN' AS DOUBLE)"
        if v == float("inf"):
            return "CAST('Infinity' AS DOUBLE)"
        if v == float("-inf"):
            return "CAST('-Infinity' AS DOUBLE)"
        if v == 0.0 and str(v)[0] == "-":
            # '-0.0' as a SQL numeric literal folds to +0.0 (the parser
            # negates the literal 0.0 after normalization); the string
            # cast preserves the sign bit
            return "CAST('-0.0' AS DOUBLE)"
        return f"CAST({v!r} AS DOUBLE)"
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    if isinstance(v, (list, tuple)):
        return "array(" + ", ".join(_sql_val(x) for x in v) + ")"
    raise TypeError(f"values_df: unsupported literal type {type(v).__name__}")


def values_df(spark, rows, schema: str):
    """Tiny literal DataFrame as a SQL ``VALUES`` LocalRelation —
    the fast form of ``spark.createDataFrame(rows, schema)`` for small
    model/probe frames (PQ codebooks, CMS probe buckets, coarse-centroid
    sidecars).

    ``createDataFrame(list)`` parallelizes the rows into
    ``defaultParallelism`` RDD slices and EVERY slice launches a Python
    worker to unpickle its share — measured 1.4 s warm (32 forked
    workers) for a 20-row frame on local[32], per invocation, and the
    resulting frame is an RDD scan that cannot broadcast without a job.
    The ``VALUES`` text parses to a LocalRelation: zero jobs to build,
    the broadcast side of a join without running a stage, and a
    ``.coalesce(1)`` write emits one file instead of 32.

    Value fidelity matches ``createDataFrame`` bit-for-bit: ints are
    exact, floats render via ``repr`` (shortest round-trip; Spark parses
    with ``Double.parseDouble`` — the identical IEEE-754 value,
    including -0.0 and denormals; NaN/Infinity via string cast), strings
    are escaped for the default parser (backslash + quote), ``None`` is
    NULL, lists nest as ``array(...)``. Every column is CAST to its
    declared DDL type, so names and dtypes equal the
    ``createDataFrame`` schema exactly (pinned by
    tests/test_operators.py::TestValuesDf). The one schema difference
    is NULLABILITY: an all-non-null column analyzes as non-nullable
    here where ``createDataFrame`` always says nullable — invisible to
    the oracle gate (pandas comparison) and to parquet round-trips
    (Spark reads file columns as nullable), and downstream aggregates
    re-derive their own nullability.

    Rows must be non-empty (VALUES needs one tuple — callers with an
    empty list keep ``createDataFrame([], schema)``, which is already a
    LocalRelation) and small (the text becomes part of the plan; the
    call sites are model-parameter frames of ≤ a few thousand rows)."""
    fields = _split_fields(schema)
    if not rows:
        raise ValueError("values_df: rows must be non-empty")
    tuples = ", ".join(
        "(" + ", ".join(_sql_val(v) for v in row) + ")" for row in rows
    )
    cols = ", ".join(
        f"CAST(`{name}` AS {typ}) AS `{name}`" for name, typ in fields
    )
    names = ", ".join(f"`{name}`" for name, _ in fields)
    return spark.sql(f"SELECT {cols} FROM (VALUES {tuples}) AS t({names})")


def argmin_lambda_sql(
    cents: list, vec_sql: str, with_dist: bool = False
) -> str:
    """Nearest-centroid argmin as a LAMBDA over one centroid-table
    literal instead of per-centroid expression trees.

    The expanded alternative (k separate distance trees inside one
    ``array_min(array(named_struct(...)))`` — what this round first
    shipped, and the text equivalent of the original Column loop) is an
    O(k·dim)-node expression — k aggregate/zip_with trees each carrying
    its own dim-element literal array. Catalyst analyzes, optimizes and
    (for the enclosing stage) codegens that whole tree on EVERY job, and
    a Lloyd loop re-runs the analysis each iteration because the
    centroid values change. Measured (8×64 doubles, 2000 rows,
    local[32]): 0.15–0.26 s analysis + 0.5–0.6 s execution per job for
    the expanded form vs 0.08 s + 0.25–0.30 s for this one — and at
    200k rows the lambda form is still equal-or-faster per row (both
    are interpreted higher-order folds; this one iterates the SAME
    fold over an array element instead of k inlined copies).

    Text form (the exact semantics of the pre-round-12 Column
    construction ``array_min(zip_with(dist_arr, ids, λ))`` — distances
    materialized once, round-6 rank, lower-index tie-break)::

        array_min(zip_with(
            transform(<cents>, c -> sqrt(aggregate(
                zip_with(<vec>, c, (x, y) -> (x - y) * (x - y)),
                0.0D, (acc, x) -> acc + x))),
            sequence(0, k - 1),
            (d, ci) -> named_struct('rd', round(d, 6), 'cluster', ci
                                    [, 'dist', d])))

    Same zip_with/aggregate fold, same 0.0 seed, same left-to-right
    order per element — bit-identical values (pinned by
    tests/test_operators.py::TestExprSql, which rebuilds the original
    Column forms and compares collected bits). ``with_dist`` appends
    the unrounded distance as a third struct field (after the
    tie-break key, so ordering is unchanged) for callers that need it
    (ml/kmeans._assign). ``vec_sql`` must not reference lambda
    variables named c/d/ci/x/y/acc."""
    return argmin_lambda_over_sql(
        darray2(cents), len(cents), vec_sql, with_dist=with_dist
    )


def argmin_lambda_over_sql(
    cents_sql: str, k: int, vec_sql: str, with_dist: bool = False
) -> str:
    """:func:`argmin_lambda_sql` generalized to ANY SQL expression for
    the centroid table — a column reference as well as a literal text.
    The lambda fold is character-identical to the literal form's, so
    iterating it over a column holding the same doubles produces the
    same bits (the fused Lloyd trainer chains iteration i's in-plan
    means into iteration i+1's assignment this way — ml/kmeans.py,
    round 13). ``cents_sql`` must hold exactly ``k`` vectors."""
    dist = (
        "sqrt(aggregate(zip_with(" + vec_sql + ", c, "
        "(x, y) -> (x - y) * (x - y)), 0.0D, (acc, x) -> acc + x))"
    )
    fields = "'rd', round(d, 6), 'cluster', ci"
    if with_dist:
        fields += ", 'dist', d"
    return (
        f"array_min(zip_with(transform({cents_sql}, c -> {dist}), "
        f"sequence(0, {k - 1}), "
        f"(d, ci) -> named_struct({fields})))"
    )
