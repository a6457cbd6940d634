"""Random Projections (Random Indexing) as a relational matmul.

Reference: ``gensim.models.rpmodel.RpModel`` (gensim/models/rpmodel.py:
50-155) — project BoW vectors onto ``num_topics`` random directions using
an Achlioptas ±1 sign matrix ("Database-friendly random projections",
scenario (1) of Theorem 1.1): ``topic = P · (vec / sqrt(num_topics))``,
entries that are non-finite or ≈0 dropped (rpmodel.py:151-154).

The reference draws P from numpy's *global* RNG (rpmodel.py:100), so its
exact values are irreproducible even across its own runs — the model is
defined up to the choice of sign matrix. Here the sign is derived from the
cross-engine ``hash60``: ``sign(t, j) = +1 iff hash60('rp_t_j') is odd``,
which makes the whole transform a deterministic relational expression that
DuckDB replicates bit-for-bit (the correctness oracle), and means the
"matrix" never exists as data — no broadcast, no fit step, nothing to
persist or ship to executors.

Scale: the projection is ``explode(k) → hash-agg``; the map-side partial
aggregation collapses the exploded rows to ≤ |docs|·k before the exchange,
so the shuffle carries the *output* matrix, not nnz·k intermediate rows.
No driver state, no UDFs — whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gensim_spark.functions.hashing import hash60


def sign_expr(term_id, topic_id):
    """±1.0 Achlioptas entry for (term, topic) — hash-parity based."""
    key = F.concat(F.lit("rp_"), term_id.cast("string"),
                   F.lit("_"), topic_id.cast("string"))
    return F.when(hash60(key) % 2 == 1, F.lit(1.0)).otherwise(F.lit(-1.0))


def sign_sql(term_expr: str, topic_expr: str) -> str:
    """DuckDB replica of :func:`sign_expr` (oracle side)."""
    from gensim_spark.functions.hashing import hash60_sql

    key = f"'rp_' || CAST({term_expr} AS VARCHAR) || '_' || CAST({topic_expr} AS VARCHAR)"
    return f"CASE WHEN {hash60_sql(key)} % 2 = 1 THEN 1.0 ELSE -1.0 END"


def rp_topics(postings: DataFrame, num_topics: int = 300,
              weight_col: str = "tf", eps: float = 1e-9) -> DataFrame:
    """(doc_id, term_id, w) → (doc_id, topic_id, weight): the RP transform.

    ``weight = Σ_t sign(t, j) · w_t / sqrt(num_topics)`` with ≈0 results
    dropped, matching rpmodel.py:148-154 (``vec / sqrt(num_topics)`` then
    ``P · vec`` with allclose-zero filtering). Works on raw tf or any
    weighted postings (gensim applies it to whatever corpus you index).
    """
    k = int(num_topics)
    exploded = postings.select(
        "doc_id", "term_id", F.col(weight_col).alias("_w"),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("topic_id"),
    )
    contrib = exploded.withColumn(
        "_c", F.col("_w") * sign_expr(F.col("term_id"), F.col("topic_id")))
    return (
        contrib.groupBy("doc_id", "topic_id")
        .agg((F.sum("_c") / F.lit(float(k) ** 0.5)).alias("weight"))
        .filter(F.abs(F.col("weight")) > eps)
    )


def rp_topics_sql(postings_sql: str, num_topics: int = 300,
                  weight_col: str = "tf", eps: float = 1e-9) -> str:
    """ANSI-SQL oracle for :func:`rp_topics` over the same postings."""
    k = int(num_topics)
    sign = sign_sql("p.term_id", "j.topic_id")
    return f"""
        SELECT p.doc_id,
               j.topic_id,
               SUM(p.{weight_col} * {sign}) / sqrt({k}) AS weight
        FROM ({postings_sql}) p
        CROSS JOIN (SELECT UNNEST(range({k})) AS topic_id) j
        GROUP BY p.doc_id, j.topic_id
        HAVING abs(SUM(p.{weight_col} * {sign}) / sqrt({k})) > {eps!r}
    """
