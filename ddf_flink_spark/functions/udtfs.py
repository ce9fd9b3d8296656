"""Python UDTFs (Spark 4 user-defined table functions).

The reference left its whole Python-UDF surface unimplemented
(``README.md:76-79`` transformUDF/transformPython TODO); this repo
implements the modern ladder: scalar ``F.udf`` / pandas UDF
(``operators/transform.py``), ``mapInPandas``/``applyInPandas`` (the
Rserve replacement), and — here — table-valued functions, the Spark 4
API for one-row-to-many-rows Python logic usable directly from SQL via
``LATERAL``.

UDTFs are Python in the row path — the slow lane (PERF.md). They are the
right tool only when per-row sequential logic doesn't decompose into
explode + codegen'd expressions; for anything expressible declaratively
(shingles, chunking, n-gram counts) this repo uses the JVM form. The span
extractor below needs a per-document position index (a dict built
left-to-right), which is exactly the shape that fits a UDTF.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

__all__ = ["RepeatedSpans", "register_udtfs"]


@udtf(returnType="pos int, gram string, n_occurrences int")
class RepeatedSpans:
    """Emit one row per occurrence of every word 3-gram that appears more
    than once WITHIN the document: (token position, gram, total
    occurrences of that gram in the doc). q131 scores the repetition
    fraction; this locates the spans — the input a boilerplate-masking /
    loop-excision pass needs. Tokenization matches ``functions/text
    .tokens`` (lowercased whitespace split) so results line up with the
    shingle operators."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract
        if text is None:
            return
        toks = text.lower().split(" ")
        if len(toks) < 3:
            return
        positions: dict[str, list[int]] = {}
        for i in range(len(toks) - 2):
            g = " ".join(toks[i : i + 3])
            positions.setdefault(g, []).append(i)
        for g, pos_list in positions.items():
            if len(pos_list) > 1:
                for p in pos_list:
                    yield p, g, len(pos_list)


def register_udtfs(spark) -> None:
    """Register all UDTFs for SQL use (idempotent)."""
    spark.udtf.register("repeated_spans", RepeatedSpans)
