"""Poincaré hyperbolic embeddings over a relations table (Nickel & Kiela).

Reference: ``gensim.models.poincare.PoincareModel`` — the exact batch math
of ``PoincareBatch`` (poincare.py:702-861): Poincaré distance
d = arcosh(1 + 2‖u−v‖²/((1−‖u‖²)(1−‖v‖²))), its partial derivatives with
the γ=1 NaN guard, softmax-over-negatives loss gradients with l2
regularization applied to the positive v only; the Riemannian update
scaled by α·(1−‖θ‖²)²/4 with duplicate-summed batch writes
(_update_vectors_batch, poincare.py:575-600) and the ball-projection clip
quirk — rows at norm ≥ 1−ε are scaled to the threshold then shifted by
−sign(θ)·ε per dimension (_clip_vectors, poincare.py:353-385); burn-in
epochs at ``burn_in_alpha`` (poincare.py:602-656); negatives drawn from
the node-count cumsum table with rejection of the node's true relations
(_sample_negatives, poincare.py:272-315); init uniform(−0.001, 0.001).

Spark shape: relations shard by the left node (``u % num_shards``), so a
shard holds EVERY positive relation of its u-nodes — negative-sample
rejection is exact locally. One ``applyInPandas`` per epoch trains each
shard sequentially on a local copy of the broadcast vector matrix and
emits per-node deltas with update counts; the driver folds them by
count-weighted averaging — the same protocol as operators/word2vec.py,
and the same determinism deviations (counter-mixed per-(epoch, shard)
RNG instead of gensim's one sequential stream; synchronous averaging
instead of single-thread sequential writes).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gensim_spark.operators.word2vec import _mix


def clip_vectors(vectors: np.ndarray, epsilon: float) -> np.ndarray:
    """Ball projection (_clip_vectors, poincare.py:353-385), 2-D branch."""
    threshold = 1 - epsilon
    norms = np.linalg.norm(vectors, axis=1)
    if (norms < threshold).all():
        return vectors
    hot = norms >= threshold
    vectors[hot] *= (threshold / norms[hot])[:, np.newaxis]
    vectors[hot] -= np.sign(vectors[hot]) * epsilon
    return vectors


def batch_gradients(vectors_u: np.ndarray, vectors_v: np.ndarray,
                    regularization_coeff: float = 1.0):
    """PoincareBatch.compute_all (poincare.py:755-861), exact.

    vectors_u: (B, D); vectors_v: (1+neg, D, B) with slot 0 the positive.
    Returns (grad_u (D,B), grad_v (1+neg,D,B), alpha (1,B), beta (1+neg,B),
    loss)."""
    vu = vectors_u.T[np.newaxis, :, :]
    vv = vectors_v
    euclidean = np.linalg.norm(vu - vv, axis=1)
    norms_u = np.linalg.norm(vu, axis=1)
    norms_v = np.linalg.norm(vv, axis=1)
    alpha = 1 - norms_u ** 2
    beta = 1 - norms_v ** 2
    gamma = 1 + 2 * (euclidean ** 2) / (alpha * beta)
    poincare_dists = np.arccosh(gamma)
    exp_neg = np.exp(-poincare_dists)
    z = exp_neg.sum(axis=0)

    e2 = euclidean ** 2
    c_ = (4 / (alpha * beta * np.sqrt(gamma ** 2 - 1)))[:, np.newaxis, :]
    dgu = ((e2 + alpha) / alpha)[:, np.newaxis, :] * vu - vv
    dgu = dgu * c_
    dgv = ((e2 + beta) / beta)[:, np.newaxis, :] * vv - vu
    dgv = dgv * c_
    nan = gamma == 1
    if nan.any():
        dgu.swapaxes(1, 2)[nan] = 0
        dgv.swapaxes(1, 2)[nan] = 0

    grad_v = -exp_neg[:, np.newaxis, :] * dgv
    grad_v = grad_v / z
    grad_v[0] += dgv[0]
    grad_v[0] += regularization_coeff * 2 * vv[0]

    grad_u = -exp_neg[:, np.newaxis, :] * dgu
    grad_u = (grad_u / z).sum(axis=0)
    grad_u += dgu[0]

    loss = float(-np.log(exp_neg[0] / z).sum())
    return grad_u, grad_v, alpha, beta, loss


def train_shard_epoch(pairs: list, vectors: np.ndarray,
                      counts_cumsum: np.ndarray, adjacency: dict,
                      negative: int, lr: float, epsilon: float,
                      regularization_coeff: float, batch_size: int,
                      rng: np.random.RandomState,
                      counts_out: np.ndarray) -> float:
    """Sequential batched Riemannian SGD over one shard's relations.
    Mutates ``vectors`` and per-node update counts; returns summed loss."""
    # candidate pool = nodes observed in relations (nonzero-width cumsum
    # intervals), not the positional vector count — id gaps are phantoms
    n_candidates = int(np.count_nonzero(
        np.diff(counts_cumsum, prepend=counts_cumsum.dtype.type(0))))
    total = int(counts_cumsum[-1])
    loss_sum = 0.0
    for off in range(0, len(pairs), batch_size):
        batch = pairs[off:off + batch_size]
        b = len(batch)
        idx_u = [u for u, _ in batch]
        idx_v = np.empty((1 + negative, b), dtype=np.int64)
        for col, (u, v) in enumerate(batch):
            idx_v[0, col] = v
            rel = adjacency[u]
            # same guard as the reference (_sample_negatives,
            # poincare.py:286-292): rejection sampling cannot terminate if
            # there are fewer candidate negatives than requested
            if n_candidates - len(rel) - 1 < negative:
                raise ValueError(
                    f"Cannot sample {negative} negatives for node {u}: "
                    f"only {n_candidates - len(rel) - 1} non-connected "
                    f"observed nodes")
            got = 0
            while got < negative:
                r = int(rng.randint(1, total + 1))
                cand = int(np.searchsorted(counts_cumsum, r))
                if cand in rel or cand == u:
                    continue
                idx_v[1 + got, col] = cand
                got += 1
        vu = vectors[idx_u]
        vv = vectors[idx_v.ravel()].reshape(1 + negative, b, -1) \
            .swapaxes(1, 2)
        grad_u, grad_v, alpha_, beta_, loss = batch_gradients(
            vu, vv, regularization_coeff)
        loss_sum += loss

        u_updates = (lr * (alpha_ ** 2) / 4 * grad_u).T
        np.add.at(vectors, idx_u, -u_updates)
        vectors[idx_u] = clip_vectors(vectors[idx_u], epsilon)
        counts_out[idx_u] += 1

        v_updates = lr * (beta_ ** 2)[:, np.newaxis] / 4 * grad_v
        v_updates = v_updates.swapaxes(1, 2).swapaxes(0, 1) \
            .reshape((1 + negative) * b, -1)
        flat_v = idx_v.T.ravel()
        np.add.at(vectors, flat_v, -v_updates)
        vectors[flat_v] = clip_vectors(vectors[flat_v], epsilon)
        counts_out[flat_v] += 1
    return loss_sum


class PoincareModel:
    def __init__(self, vectors: np.ndarray, counts: np.ndarray,
                 epsilon: float):
        self.vectors = vectors
        self.counts = counts
        self.epsilon = epsilon

    def vectors_df(self, spark) -> DataFrame:
        rows = [(i, [float(x) for x in self.vectors[i]])
                for i in range(len(self.vectors))]
        return spark.createDataFrame(rows,
                                     "node_id long, embedding array<double>")


def poincare_distance_cols(u_col, v_col):
    """Poincaré distance as a JVM column expression over two array columns
    — the relational form of PoincareKeyedVectors.distance."""
    diff2 = F.aggregate(
        F.zip_with(u_col, v_col, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda a, x: a + x)
    nu2 = F.aggregate(u_col, F.lit(0.0), lambda a, x: a + x * x)
    nv2 = F.aggregate(v_col, F.lit(0.0), lambda a, x: a + x * x)
    gamma = 1 + 2 * diff2 / ((1 - nu2) * (1 - nv2))
    return F.log(gamma + F.sqrt(gamma * gamma - 1))  # arcosh


def poincare_fit(relations: DataFrame, num_nodes: int | None = None,
                 size: int = 50, alpha: float = 0.1, negative: int = 10,
                 epsilon: float = 1e-5, regularization_coeff: float = 1.0,
                 burn_in: int = 10, burn_in_alpha: float = 0.01,
                 epochs: int = 50, batch_size: int = 10,
                 num_shards: int = 32, seed: int = 0) -> PoincareModel:
    """Fit over (u, v) node-id relations. Defaults mirror the reference
    constructor (poincare.py:92-168)."""
    if num_nodes is None:
        num_nodes = relations.agg(F.greatest(
            F.max("u"), F.max("v")).alias("m")).collect()[0]["m"] + 1
    cnt_rows = (relations.select(F.col("u").alias("n"))
                .unionAll(relations.select(F.col("v").alias("n")))
                .groupBy("n").count().collect())
    counts = np.zeros(num_nodes, dtype=np.int64)
    for r in cnt_rows:
        counts[r["n"]] = r["count"]
    # id gaps in [0, num_nodes) stay at count 0: their cumsum interval is
    # zero-width, so searchsorted can never draw them as negatives — the
    # reference's vocab contains only nodes observed in relations
    # (poincare.py:247-251 builds the cumsum from observed counts alone)
    counts_cumsum = np.cumsum(counts)

    # per-node seeded init — distributed replacement for the sequential
    # uniform draw (poincare.py:236-239)
    vectors = np.empty((num_nodes, size))
    for i in range(num_nodes):
        rs = np.random.RandomState(_mix(seed, i, 55) & 0xFFFFFFFF)
        vectors[i] = rs.uniform(-0.001, 0.001, size)

    model = PoincareModel(vectors, counts, epsilon)
    sc = relations.sparkSession.sparkContext
    sharded = relations.withColumn(
        "shard", F.pmod(F.col("u"), F.lit(num_shards)))

    schedule = [(burn_in_alpha, e) for e in range(burn_in)] + \
               [(alpha, burn_in + e) for e in range(epochs)]
    for lr, epoch in schedule:
        bc = sc.broadcast((model.vectors, counts_cumsum, negative, lr,
                           epsilon, regularization_coeff, batch_size, seed))

        def make_shard_fn(epoch, bc):
            def run(key, pdf):
                import pandas as pd

                vec0, cumsum, neg, lr_, eps, reg, bs, sd = bc.value
                vec = vec0.copy()
                cnts = np.zeros(len(vec), dtype=np.int64)
                pdf = pdf.sort_values(["u", "v"])
                pairs = list(zip(pdf["u"].astype(int), pdf["v"].astype(int)))
                adjacency: dict = {}
                for u, v in pairs:
                    adjacency.setdefault(u, set()).add(v)
                rng = np.random.RandomState(
                    _mix(sd, epoch, int(key[0])) & 0xFFFFFFFF)
                train_shard_epoch(pairs, vec, cumsum, adjacency, neg, lr_,
                                  eps, reg, bs, rng, cnts)
                out = []
                for w in np.nonzero(cnts)[0]:
                    out.append((int(w), int(cnts[w]),
                                list(vec[w] - vec0[w])))
                return pd.DataFrame(out, columns=["w", "cnt", "delta"])
            return run

        rows = sharded.groupBy("shard").applyInPandas(
            make_shard_fn(epoch, bc),
            "w long, cnt long, delta array<double>").collect()
        bc.destroy()  # per-epoch broadcast — don't accumulate over epochs
        num: dict = {}
        den: dict = {}
        for r in rows:
            d = np.asarray(r["delta"]) * r["cnt"]
            if r["w"] in num:
                num[r["w"]] += d
                den[r["w"]] += r["cnt"]
            else:
                num[r["w"]] = d
                den[r["w"]] = r["cnt"]
        for w, d in num.items():
            model.vectors[w] += d / den[w]
        # averaging can land marginally outside the ball — re-project
        model.vectors = clip_vectors(model.vectors, epsilon)
    return model


def poincare_knn(vectors: DataFrame, query_ids, k: int = 5,
                 id_col: str = "node_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Top-k nearest by Poincaré distance — relational broadcast join +
    JVM arcosh expression + rank (PoincareKeyedVectors.most_similar)."""
    from pyspark.sql import Window

    q = vectors.filter(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_q"))
    t = vectors.select(F.col(id_col).alias("other_id"),
                       F.col(vec_col).alias("_t"))
    d = poincare_distance_cols(F.col("_q"), F.col("_t"))
    scored = (F.broadcast(q).crossJoin(t)
              .filter(F.col("query_id") != F.col("other_id"))
              .select("query_id", "other_id", d.alias("dist")))
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"),
                                               F.asc("other_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "other_id",
                    F.round("dist", 6).alias("dist")))
