"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline (the analogue of gensim's
``MatrixSimilarity`` dense path, gensim/similarities/docsim.py:761-880, but as
a join-agg plan instead of BLAS GEMM), plus a sign-random-projection LSH
bucketed variant as the scale path (the analogue of gensim's ANN integrations,
gensim/similarities/annoy.py — re-expressed as deterministic SQL-friendly
hyperplanes so results are oracle-checkable).

Scale notes: brute force is O(N·Q) — fine for Q small (queries broadcast).
LSH restricts candidates to equal-bucket docs: the bucket build is one narrow
projection (hyperplane matrix is a broadcast literal), the query probe is a
bucket-equijoin. Dot products stay JVM-side via higher-order array functions
(zip_with + aggregate) — no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gensim_spark.functions.hashing import hash60


def dot_expr(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (whole-stage codegen, no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0),
                    lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str = "query_id") -> DataFrame:
    """Exact brute-force top-k: (query_id, vec_id, cosine, rank).

    ``queries``: (query_id, embedding). Broadcast (queries ≪ corpus); ties
    broken by vec_id ascending; self-matches are the caller's concern.
    """
    from gensim_spark.functions.scanwidth import widen_if_narrow

    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).alias("_qv"))
    scored = (
        # light per-row arithmetic → coarser chunks than the tokenize path
        widen_if_narrow(embeddings, bytes_per_partition=1024 * 1024)
        .select(F.col(id_col).alias("vec_id"),
                F.col(vec_col).alias("_v"))
        .crossJoin(F.broadcast(q))
        .select("query_id", "vec_id",
                cosine_expr(F.col("_v"), F.col("_qv")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_sign_expr(vec: Column, plane: int, dims: int) -> Column:
    """Deterministic pseudo-random hyperplane sign: component d of plane j is
    +1 if hash60('j_d') is odd else -1. Same construction is expressible in
    ANSI SQL, making the LSH bucketing oracle-checkable."""
    signs = F.transform(
        F.sequence(F.lit(0), F.lit(dims - 1)),
        lambda d: F.when(
            hash60(F.concat(F.lit(f"{plane}_"), d.cast("string"))) % 2 == 1,
            F.lit(1.0),
        ).otherwise(F.lit(-1.0)),
    )
    return dot_expr(vec, signs)


def lsh_buckets(embeddings: DataFrame, planes: int = 6, dims: int = 64,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(vec_id, bucket): sign-random-projection bucket id (``planes`` bits)."""
    bucket = None
    for j in range(planes):
        bit = F.when(
            hyperplane_sign_expr(F.col(vec_col), j, dims) > 0, F.lit(1 << j)
        ).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return embeddings.select(F.col(id_col).alias("vec_id"),
                             bucket.cast("long").alias("bucket"))


def lsh_self_topk(embeddings: DataFrame, k: int = 10, planes: int = 6,
                  dims: int = 64, id_col: str = "vec_id",
                  vec_col: str = "embedding",
                  max_bucket: int | None = 100_000) -> DataFrame:
    """All-terms approximate top-k: for EVERY vector, its ``k`` best
    same-bucket neighbours (self included) by true cosine —
    (query_id, vec_id, cosine, rank).

    Unlike :func:`lsh_topk`, NEITHER side is broadcast: when the query set
    IS the corpus (a vocabulary-wide term-similarity build), broadcasting
    it would ship the whole table to every executor. Here both sides are
    the same bucketed frame and the candidate join is a shuffle equijoin
    on the bucket key — the same 100-TB shape as
    ``dedup.embedding_near_dups_lsh``, plus the per-query top-k window.
    ``max_bucket`` drops degenerate buckets that would explode
    quadratically (recall dial = ``planes``)."""
    b = lsh_buckets(embeddings, planes, dims, id_col, vec_col)
    e = embeddings.join(b, embeddings[id_col] == b.vec_id).select(
        b.vec_id, F.col(vec_col).alias("_v"), "bucket"
    )
    if max_bucket is not None:
        sizes = e.groupBy("bucket").count().filter(
            F.col("count") <= max_bucket).select("bucket")
        e = e.join(F.broadcast(sizes), "bucket")
    q = e.select(F.col("vec_id").alias("query_id"),
                 F.col("_v").alias("_qv"), "bucket")
    scored = e.join(q, "bucket").select(
        "query_id", "vec_id",
        cosine_expr(F.col("_v"), F.col("_qv")).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def ivf_fit(embeddings: DataFrame, n_cells: int = 16, seed: int = 42,
            vec_col: str = "embedding"):
    """IVF coarse quantizer: k-means centroids over the corpus (pyspark.ml,
    deterministic seed). Returns the fitted KMeans model."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = embeddings.select(array_to_vector(F.col(vec_col)).alias("features"))
    return KMeans(k=n_cells, seed=seed, featuresCol="features").fit(train)


def ivf_assign(embeddings: DataFrame, model, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """(vec_id, cell): inverted-file cell assignment."""
    from pyspark.ml.functions import array_to_vector

    withf = embeddings.withColumn(
        "features", array_to_vector(F.col(vec_col))
    )
    return model.transform(withf).select(
        F.col(id_col).alias("vec_id"), F.col(model.getPredictionCol())
        .alias("cell")
    )


def ivf_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
             n_cells: int = 16, n_probe: int = 2, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id_col: str = "query_id") -> DataFrame:
    """IVF approximate top-k: probe the ``n_probe`` nearest cells per query,
    rank candidates by true cosine. (query_id, vec_id, cosine, rank).

    The index (cell assignments) partitions the corpus; a query touches
    n_probe/n_cells of it — the standard recall/latency dial. Centroids are
    broadcast as literals (n_cells · dims floats)."""
    model = ivf_fit(embeddings, n_cells=n_cells, seed=seed, vec_col=vec_col)
    assigned = embeddings.join(
        ivf_assign(embeddings, model, id_col, vec_col), id_col
    )
    centers = [c.tolist() for c in model.clusterCenters()]
    centers_lit = F.array(*[
        F.struct(F.lit(i).alias("cell"),
                 F.array(*[F.lit(float(x)) for x in c]).alias("cv"))
        for i, c in enumerate(centers)
    ])
    # per query: n_probe nearest centroids by cosine
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).alias("_qv"))
    probed = (
        q.select("query_id", "_qv", F.explode(centers_lit).alias("c"))
        .select("query_id", "_qv", F.col("c.cell").alias("cell"),
                cosine_expr(F.col("_qv"), F.col("c.cv")).alias("_csim"))
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("_csim").desc(), F.col("cell").asc()
    )
    probes = (
        probed.withColumn("_r", F.row_number().over(wq))
        .filter(F.col("_r") <= n_probe)
        .select("query_id", "_qv", "cell")
    )
    cand = assigned.select("vec_id", F.col(vec_col).alias("_v"), "cell").join(
        F.broadcast(probes), "cell"
    )
    scored = cand.select(
        "query_id", "vec_id", cosine_expr(F.col("_v"), F.col("_qv"))
        .alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_seed_rows(embeddings: DataFrame, n_cells: int = 16,
                  id_col: str = "vec_id", vec_col: str = "embedding"):
    """Deterministic hash-seeded coarse quantizer: cell seeds are the
    ``n_cells`` corpus vectors with the smallest ``hash60(vec_id)`` (ties by
    vec_id), cell = rank in that order. Relational and ANSI-SQL-expressible,
    so the whole IVF path is oracle-checkable cross-engine — unlike a
    trained k-means model (``ivf_fit``), which stays as the quality-tuned
    variant. Collecting n_cells·dims floats to the driver is the standard
    'centroids are a model artifact' move, O(kB) at any corpus size; the
    seed selection itself is a distributed TakeOrdered (top-n_cells by
    hash), not a global sort."""
    return (
        embeddings.select(F.col(id_col).alias("sid"),
                          F.col(vec_col).alias("sv"))
        .withColumn("_h", hash60(F.col("sid").cast("string")))
        .orderBy("_h", "sid")
        .limit(n_cells)
        .collect()
    )


def _cells_literal(seeds) -> Column:
    return F.array(*[
        F.struct(F.lit(i).alias("cell"),
                 F.array(*[F.lit(float(x)) for x in row["sv"]]).alias("cv"))
        for i, row in enumerate(seeds)
    ])


def _cell_scores(vec: Column, cells_lit: Column) -> Column:
    """array<struct(cos, negcell)>: struct max/sort gives argmax cosine with
    ties to the SMALLEST cell (negcell descends as cell ascends)."""
    return F.transform(
        cells_lit,
        lambda c: F.struct(
            cosine_expr(vec, c["cv"]).alias("cos"),
            (-c["cell"]).alias("negcell"),
        ),
    )


def ivf_assign_det(embeddings: DataFrame, seeds, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """(vec_id, cell) under the hash-seeded quantizer: per-row argmax cosine
    against the broadcast seed literals — embarrassingly parallel, zero
    shuffle (vs. the cross-join + window a naive argmin would cost)."""
    best = F.array_max(_cell_scores(F.col(vec_col), _cells_literal(seeds)))
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        (-best["negcell"]).cast("long").alias("cell"),
    )


def ivf_topk_det(embeddings: DataFrame, queries: DataFrame, k: int = 10,
                 n_cells: int = 16, n_probe: int = 2,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 query_id_col: str = "query_id") -> DataFrame:
    """IVF approximate top-k with the deterministic hash-seeded quantizer:
    probe the ``n_probe`` best cells per query, rank candidates by true
    cosine. (query_id, vec_id, cosine, rank). Semantics match ``ivf_topk``
    (partition corpus into cells, probe a fraction), with a quantizer both
    Spark and an ANSI-SQL oracle can reproduce exactly."""
    seeds = ivf_seed_rows(embeddings, n_cells, id_col, vec_col)
    cells_lit = _cells_literal(seeds)
    assigned = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v")
    ).withColumn(
        "cell",
        (-F.array_max(_cell_scores(F.col("_v"), cells_lit))["negcell"])
        .cast("long"),
    )
    # per query: the n_probe best cells by seed cosine (array sort of
    # n_cells structs — no join, no shuffle)
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).alias("_qv"))
    probes = (
        q.withColumn(
            "_top",
            F.slice(F.reverse(F.array_sort(
                _cell_scores(F.col("_qv"), cells_lit))), 1, n_probe),
        )
        .select("query_id", "_qv",
                F.explode(F.transform(
                    F.col("_top"), lambda s: (-s["negcell"]).cast("long")
                )).alias("cell"))
    )
    scored = assigned.join(F.broadcast(probes), "cell").select(
        "query_id", "vec_id",
        cosine_expr(F.col("_v"), F.col("_qv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
             planes: int = 6, dims: int = 64, id_col: str = "vec_id",
             vec_col: str = "embedding",
             query_id_col: str = "query_id") -> DataFrame:
    """Approximate top-k: candidates share the query's bucket, ranked by true
    cosine. (query_id, vec_id, cosine, rank)."""
    b = lsh_buckets(embeddings, planes, dims, id_col, vec_col)
    eb = embeddings.join(b, embeddings[id_col] == b.vec_id).select(
        b.vec_id, F.col(vec_col).alias("_v"), "bucket"
    )
    qb = lsh_buckets(queries, planes, dims, query_id_col, vec_col)
    q = queries.join(qb, queries[query_id_col] == qb.vec_id).select(
        qb.vec_id.alias("query_id"), F.col(vec_col).alias("_qv"), "bucket"
    )
    scored = (
        eb.join(F.broadcast(q), "bucket")
        .select("query_id", "vec_id",
                cosine_expr(F.col("_v"), F.col("_qv")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
