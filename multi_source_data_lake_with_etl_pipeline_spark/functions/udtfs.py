"""SQL-callable Python UDTFs (Spark 4 table-function surface).

Completes SURVEY §2.11: the reference's pluggable callables (U1-U3)
map to pandas_udf / df.transform / registries; the remaining Spark
extension point — a TABLE function callable from SQL, including
LATERAL per-row application — is demonstrated here with the engine's
n-gram shape.

These are the EXTENSION surface, not the hot path: a Python UDTF is
row-at-a-time Python. Every production operator in this engine that
emits n-grams uses the JVM HOF + explode_outer pipeline
(``llm_ops/text_stats.shingles_of_words``); the UDTF exists so users
with genuinely imperative row-expansion logic can plug it into plain
SQL without touching the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, gram string")
class NgramWindows:
    """ngram_windows(text, n): one row per word n-gram window.

    SQL:  SELECT d.doc_id, g.pos, g.gram
          FROM docs d, LATERAL ngram_windows(d.text, 3) g
    """

    def eval(self, text: str, n: int):  # noqa: A002
        if text is None or n is None or n <= 0:
            return
        words = [w for w in text.split() if w]
        for i in range(len(words) - n + 1):
            yield i, " ".join(words[i : i + n])


def register_udtfs(spark) -> None:
    """Idempotent SQL registration of the engine's UDTFs."""
    spark.udtf.register("ngram_windows", NgramWindows)
