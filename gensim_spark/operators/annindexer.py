"""Approximate-nearest-neighbor indexer with the reference's pluggable
``indexer`` contract (gensim/similarities/annoy.py:38-230 AnnoyIndexer,
nmslib.py:59-227 NmslibIndexer; consumed at keyedvectors.py:848-849:
``indexer.most_similar(mean, topn)``, query keys NOT excluded).

The reference wraps external C libraries (Annoy trees, NMSLIB HNSW) around
an in-RAM vector matrix; here the index IS a DataFrame — LSH sign-random-
projection buckets or deterministic IVF cell assignments (simsearch.py) —
so build and query both distribute, and the index persists as parquet
instead of a pickled sidecar.

Query shape at scale: one query probes a single LSH bucket or ``n_probe``
IVF cells — a broadcast-filtered fraction of the corpus — then ranks by
true cosine with orderBy().limit() (TakeOrdered, no global window).
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gensim_spark.operators.simsearch import (
    cosine_expr,
    ivf_assign_det,
    ivf_seed_rows,
    lsh_buckets,
)

_METHODS = ("lsh", "ivf", "brute")


class AnnIndexer:
    """Spark-native stand-in for AnnoyIndexer / NmslibIndexer.

    ``most_similar(vector, topn)`` returns ``[(key, cosine), ...]`` — the
    reference indexer contract (similarities/annoy.py:193-212: angular
    distance mapped to cosine, query keys included; keyedvectors.py:848
    returns it untouched).
    """

    def __init__(self, vectors: DataFrame | None = None,
                 method: str = "lsh", key_col: str = "vec_id",
                 vec_col: str = "embedding", planes: int = 6,
                 n_cells: int = 16, n_probe: int = 2,
                 dims: int | None = None):
        if method not in _METHODS:
            raise ValueError(f"method must be one of {_METHODS}")
        self.method = method
        self.key_col, self.vec_col = key_col, vec_col
        self.planes, self.n_cells, self.n_probe = planes, n_cells, n_probe
        self.dims = dims
        self._index: DataFrame | None = None
        self._seeds = None
        if vectors is not None:
            self._build(vectors)

    # -- build ------------------------------------------------------------

    def _build(self, vectors: DataFrame) -> None:
        base = vectors.select(F.col(self.key_col).alias("vec_id"),
                              F.col(self.vec_col).alias("_v"))
        if self.dims is None:
            first = base.select(F.size("_v").alias("d")).first()
            if first is None:
                raise ValueError("cannot index an empty vectors table")
            self.dims = int(first["d"])
        if self.method == "lsh":
            b = lsh_buckets(vectors, self.planes, self.dims,
                            self.key_col, self.vec_col)
            self._index = base.join(b, "vec_id").cache()
        elif self.method == "ivf":
            self._seeds = [
                {"cell": i, "sv": [float(x) for x in r["sv"]]}
                for i, r in enumerate(ivf_seed_rows(
                    vectors, self.n_cells, self.key_col, self.vec_col))
            ]
            a = ivf_assign_det(vectors, self._seeds,
                               self.key_col, self.vec_col)
            self._index = base.join(a, "vec_id").cache()
        else:  # brute: exact scan, still distributed
            self._index = base.cache()

    # -- query ------------------------------------------------------------

    def _sign_matrix(self) -> np.ndarray:
        """(planes, dims) hyperplane signs — same md5 hash60 parity as the
        Spark-side lsh_buckets; computed once per indexer, not per query."""
        if getattr(self, "_signs", None) is None:
            from gensim_spark.functions.hashing import hash60_py

            self._signs = np.array([
                [1.0 if hash60_py(f"{j}_{d}") % 2 == 1 else -1.0
                 for d in range(self.dims)]
                for j in range(self.planes)
            ])
        return self._signs

    def _query_bucket(self, v: np.ndarray) -> int:
        """Driver-side replica of lsh_buckets for ONE vector. The
        projection accumulates element-by-element in float64 — the same
        left-to-right IEEE fold as the Spark-side ``F.aggregate`` — so the
        sign (and therefore the bucket) is bit-identical to the one the
        identical indexed vector was assigned to; a BLAS ``np.dot``
        (pairwise summation) could flip a near-zero projection."""
        signs = self._sign_matrix()
        bucket = 0
        for j in range(self.planes):
            acc = 0.0
            row = signs[j]
            for d in range(self.dims):
                acc += float(v[d]) * row[d]
            if acc > 0:
                bucket |= 1 << j
        return bucket

    @staticmethod
    def _cos_fold(a, b) -> float:
        """Driver replica of simsearch.cosine_expr: left-to-right IEEE
        float64 folds for the dot and both norms, so probe-cell ranking is
        bit-identical to the Spark-side ``ivf_assign`` cell assignment —
        the same near-tie fix _query_bucket applies for LSH (a BLAS
        ``np.dot`` pairwise sum could rank a near-tied cell differently
        and probe past the query's own cell). Zero norms (Spark divides
        to NULL, sorted last under desc) rank last here too."""
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            x, y = float(x), float(y)
            dot += x * y
            na += x * x
            nb += y * y
        den = np.sqrt(na) * np.sqrt(nb)
        return dot / den if den > 0 else float("-inf")

    def _topk_rows(self, vector, topn: int):
        """Collected [(key, sim, rank), ...] from the probed candidates —
        one Spark job (orderBy().limit() TakeOrdered)."""
        if self._index is None:
            raise ValueError("indexer not built — pass vectors or load()")
        v = np.asarray(vector, dtype=np.float64)
        qlit = F.array(*[F.lit(float(x)) for x in v])
        cand = self._index
        if self.method == "lsh":
            cand = cand.filter(F.col("bucket") ==
                               int(self._query_bucket(v)))
        elif self.method == "ivf":
            scores = sorted(
                ((self._cos_fold(v, s["sv"]), s["cell"])
                 for s in self._seeds),
                key=lambda t: (-t[0], t[1]))
            probe = [c for _, c in scores[:self.n_probe]]
            cand = cand.filter(F.col("cell").isin(probe))
        sims = cand.select(
            F.col("vec_id").alias(self.key_col),
            cosine_expr(F.col("_v"), qlit).alias("sim"))
        top = (sims.orderBy(F.desc("sim"), F.asc(self.key_col)).limit(topn)
               .collect())
        return [(r[self.key_col], round(float(r["sim"]), 6), i + 1)
                for i, r in enumerate(top)]

    def most_similar_df(self, vector, topn: int = 10) -> DataFrame:
        """(key, sim, rank) DataFrame — candidates from the probed
        bucket/cells ranked by true cosine; query keys not excluded."""
        rows = self._topk_rows(vector, topn)
        spark = self._index.sparkSession
        key_t = dict(self._index.dtypes)["vec_id"]
        return spark.createDataFrame(
            rows, f"{self.key_col} {key_t}, sim double, rank int")

    def most_similar(self, vector, topn: int = 10):
        """[(key, sim), ...] — the exact shape keyedvectors.py:848 expects
        back from an indexer."""
        return [(k, s) for k, s, _ in self._topk_rows(vector, topn)]

    # -- persistence (annoy.py:90-155 save/load, parquet instead of a
    # pickled index sidecar) ----------------------------------------------

    def save(self, path: str) -> None:
        if self._index is None:
            raise ValueError("nothing to save — indexer not built")
        os.makedirs(path, exist_ok=True)
        self._index.write.mode("overwrite").parquet(f"{path}/index.parquet")
        meta = {"method": self.method, "key_col": self.key_col,
                "vec_col": self.vec_col, "planes": self.planes,
                "n_cells": self.n_cells, "n_probe": self.n_probe,
                "dims": self.dims, "seeds": self._seeds}
        with open(f"{path}/indexer.json", "w") as fh:
            json.dump(meta, fh)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "AnnIndexer":
        with open(f"{path}/indexer.json") as fh:
            meta = json.load(fh)
        idx = cls(method=meta["method"], key_col=meta["key_col"],
                  vec_col=meta["vec_col"], planes=meta["planes"],
                  n_cells=meta["n_cells"], n_probe=meta["n_probe"],
                  dims=meta["dims"])
        idx._seeds = meta["seeds"]
        idx._index = spark.read.parquet(f"{path}/index.parquet").cache()
        return idx
