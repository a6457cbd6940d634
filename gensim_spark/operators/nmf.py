"""Online Non-negative Matrix Factorization (Zhao & Tan, arXiv:1604.02634).

Reference: ``gensim.models.nmf.Nmf`` — projected-gradient coordinate descent
for the representation h (nmf_pgd.pyx:19-63), running-average sufficient
statistics A = avg(h·hᵀ), B = avg(v·hᵀ) (nmf.py:655-668), and a
projected-gradient W update with step η = κ/‖A‖ plus the clip /
column-norm-cap projection ``_transform`` (nmf.py:673-733).

Spark shape — same skeleton as operators/lda.py: the h solve is
per-document-independent given W, so

1. the corpus is ``corpus_bow`` rows (sorted sparse ids/cts per document);
2. each batch broadcasts W (V×K, driver-resident exactly as the reference
   keeps it) and one ``mapInPandas`` solves every document's h and
   accumulates the partition's partials of A (K×K) and B (V×K, emitted
   sparsely — only rows for terms present in the partition) as packed
   ``(i, v)`` longs, map-side combined by ``groupBy(i).sum``;
3. the driver folds the partials into the running averages and applies the
   exact ``_solve_w`` gradient loop.

Determinism deviations (both pinned by the tests' sequential replica):

* the reference draws the per-iteration coordinate permutation and the W
  init from one shared sequential RandomState (nmf.py:536,766); here the W
  init uses ``RandomState(seed)`` once (halfnorm.rvs ≡ |standard_normal|,
  scipy-free) and each (update, h-iteration) pair gets a counter-mixed
  permutation seed, so results are bit-stable under any partitioning;
* the reference's h early-stop is evaluated over the whole 2000-doc chunk
  (nmf.py:736-784) which couples documents through the convergence test;
  here the stop is per-document (≡ reference with chunksize=1), the natural
  partition-invariant semantics;
* the reference shuffles each chunk before solving (nmf.py:628) — a no-op
  for A and B, which are column-order-invariant sums, so it is dropped.

Scale: W broadcast is O(V·K) — identical to the reference's own resident
matrix; the B partial shuffle carries ≤ |terms-in-partition|·K rows per
task, never per-document data. Vocab is bounded by ``filter_extremes``
upstream exactly as the reference advises for its dense (V·K) matrices.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gensim_spark.operators.lda import corpus_bow, infer_dim


def _mix_seed(base_seed: int, update_no: int, iteration: int) -> int:
    return (int(base_seed) * 31 + int(update_no) * 976369
            + int(iteration) * 2654435761) & 0xFFFFFFFF


def solve_h_block(h: np.ndarray, Wtv: np.ndarray, WtW: np.ndarray,
                  permutation: np.ndarray, kappa: float) -> np.ndarray:
    """One coordinate-descent sweep (nmf_pgd.pyx:19-63), vectorized over the
    sample axis — samples are independent in the kernel's outer prange, so
    the sweep is value-identical to the reference's per-sample loop.
    Returns the PER-SAMPLE violation (the reference returns the sum)."""
    viol = np.zeros(h.shape[1])
    for c in permutation:
        grad = WtW[c, :] @ h - Wtv[c, :]
        grad = grad * kappa / WtW[c, c]
        projected = np.where(h[c, :] == 0, np.minimum(grad, 0.0), grad)
        viol += projected * projected
        h[c, :] = np.maximum(h[c, :] - grad, 0.0)
    return viol


def make_perms(num_topics: int, seed: int, update_no: int,
               h_max_iter: int) -> list:
    """The per-iteration coordinate permutations for one (update) stream —
    shared by every document, precomputed once per batch."""
    return [np.random.RandomState(_mix_seed(seed, update_no, it))
            .permutation(num_topics).astype(np.int64)
            for it in range(h_max_iter)]


def solveproj_block(WtW: np.ndarray, Wtv: np.ndarray, m: int,
                    kappa: float, h_stop: float, perms: list) -> np.ndarray:
    """h for a block of documents (nmf.py:736-784) with the per-document
    early stop: each column keeps iterating until ITS √violation/m error
    change falls under ``h_stop`` (or the permutation list — h_max_iter —
    runs out). Wtv is loop-invariant in the reference (recomputed
    identically each iteration) — hoisted."""
    k, n = WtW.shape[0], Wtv.shape[1]
    h = np.zeros((k, n))
    h_error = np.full(n, np.nan)
    active = np.ones(n, dtype=bool)
    for perm in perms:
        idx = np.nonzero(active)[0]
        if idx.size == 0:
            break
        hs = np.ascontiguousarray(h[:, idx])
        viol = solve_h_block(hs, Wtv[:, idx], WtW, perm, kappa)
        h[:, idx] = hs
        # reference: error_ = sqrt(violation)/m, stop when |Δerror| < h_stop;
        # `if h_error` treats a 0.0 previous error as "keep iterating"
        err = np.sqrt(viol) / m
        prev = h_error[idx]
        done = ~np.isnan(prev) & (prev != 0.0) & (np.abs(prev - err) < h_stop)
        h_error[idx] = err
        active[idx[done]] = False
    return h


class NmfModel:
    """Driver-resident model state (W, A, B) + hyperparameters."""

    def __init__(self, num_tokens: int, num_topics: int, kappa: float,
                 minimum_probability: float, w_max_iter: int,
                 w_stop_condition: float, h_max_iter: int,
                 h_stop_condition: float, normalize: bool, random_seed: int):
        self.num_tokens = int(num_tokens)
        self.num_topics = int(num_topics)
        self.kappa = float(kappa)
        self.minimum_probability = minimum_probability
        self.w_max_iter = int(w_max_iter)
        self.w_stop_condition = float(w_stop_condition)
        self.h_max_iter = int(h_max_iter)
        self.h_stop_condition = float(h_stop_condition)
        self.normalize = normalize
        self.random_seed = int(random_seed)

        self.v_max: float | None = None
        self.w_std: float | None = None
        self.W: np.ndarray | None = None
        self.A: np.ndarray | None = None
        self.B: np.ndarray | None = None
        self._w_error = np.inf
        self.chunk_overall_idx = 1

    # --- reference-exact driver kernels ---------------------------------

    def setup(self, mean_v: float) -> None:
        """_setup (nmf.py:521-541): W ~ w_std·halfnorm, A=B=0.
        halfnorm.rvs(random_state=rs) ≡ |rs.standard_normal| (scipy
        stats.halfnorm._rvs), so the init is scipy-free but draw-identical
        for a given RandomState seed."""
        v, k = self.num_tokens, self.num_topics
        self.w_std = float(np.sqrt(mean_v / (v * k)))
        rs = np.random.RandomState(self.random_seed)
        self.W = np.abs(self.w_std * np.abs(rs.standard_normal((v, k))))
        self.A = np.zeros((k, k))
        self.B = np.zeros((v, k))

    def _transform(self) -> None:
        """Clip to [0, v_max] and cap column l2 norms at 1 (nmf.py:725-733)."""
        np.clip(self.W, 0, self.v_max, out=self.W)
        sumsq = np.sqrt(np.einsum("ij,ij->j", self.W, self.W))
        np.maximum(sumsq, 1, out=sumsq)
        self.W /= sumsq

    def solve_w(self) -> None:
        """Projected-gradient W update (nmf.py:673-699), exact."""

        def error(WA):
            return (0.5 * np.einsum("ij,ij", WA, self.W)
                    - np.einsum("ij,ij", self.W, self.B))

        eta = self.kappa / np.linalg.norm(self.A)
        for _ in range(self.w_max_iter):
            WA = self.W.dot(self.A)
            self.W -= eta * (WA - self.B)
            self._transform()
            error_ = error(WA)
            if (self._w_error < np.inf
                    and np.abs((error_ - self._w_error) / self._w_error)
                    < self.w_stop_condition):
                self._w_error = error_
                break
            self._w_error = error_

    def fold_batch(self, hhT: np.ndarray, vhT: np.ndarray) -> None:
        """Running-average A/B fold + W solve for one batch (nmf.py:655-671)."""
        i = self.chunk_overall_idx
        self.A *= i - 1
        self.A += hhT
        self.A /= i
        self.B *= i - 1
        self.B += vhT
        self.B /= i
        self.solve_w()
        self.chunk_overall_idx += 1

    def get_topics(self, normalize: bool | None = None) -> np.ndarray:
        """Term-topic matrix, row-normalized when ``normalize``
        (nmf.py:222-243)."""
        dense = self.W.T
        if normalize is None:
            normalize = self.normalize
        if normalize:
            return dense / dense.sum(axis=1).reshape(-1, 1)
        return dense


def _batch_partials(docs: DataFrame, model: NmfModel, update_no: int) -> tuple:
    """One distributed h-solve over all documents: returns (hhᵀ K×K, vhᵀ V×K).

    Packed ``(i = term·K + topic, v)`` rows carry the sparse vhᵀ partial;
    negative ``i`` carries hhᵀ (i = −(a·K + b) − 1)."""
    k = model.num_topics
    sc = docs.sparkSession.sparkContext
    bc = sc.broadcast((model.W, model.kappa, model.h_max_iter,
                       model.h_stop_condition, model.random_seed))

    def gen(batches):
        import pandas as pd

        W, kappa, h_max_iter, h_stop, seed = bc.value
        Wt = W.T
        WtW = Wt @ W
        m = W.shape[0]
        perms = make_perms(k, seed, update_no, h_max_iter)
        hhT = np.zeros((k, k))
        acc: dict[int, np.ndarray] = {}
        block: list = []

        def flush():
            nonlocal hhT
            if not block:
                return
            n = len(block)
            Wtv = np.empty((k, n))
            for j, (ids, cts) in enumerate(block):
                Wtv[:, j] = Wt[:, ids] @ cts
            h = solveproj_block(WtW, Wtv, m, kappa, h_stop, perms)
            hhT += h @ h.T
            for j, (ids, cts) in enumerate(block):
                hj = h[:, j]
                for jj, t in enumerate(ids):
                    vec = acc.get(int(t))
                    contrib = cts[jj] * hj
                    if vec is None:
                        acc[int(t)] = contrib
                    else:
                        vec += contrib
            block.clear()

        for pdf in batches:
            for ids_l, cts_l in zip(pdf["ids"], pdf["cts"]):
                block.append((np.asarray(ids_l, dtype=np.int64),
                              np.asarray(cts_l, dtype=np.float64)))
                if len(block) >= 512:
                    flush()
        flush()
        n_terms = len(acc)
        i_out = np.empty(n_terms * k + k * k, dtype=np.int64)
        v_out = np.empty(n_terms * k + k * k, dtype=np.float64)
        pos = 0
        for t in sorted(acc):
            i_out[pos:pos + k] = np.int64(t) * k + np.arange(k)
            v_out[pos:pos + k] = acc[t]
            pos += k
        i_out[pos:] = -(np.arange(k * k) + 1)
        v_out[pos:] = hhT.ravel()
        yield pd.DataFrame({"i": i_out, "v": v_out})

    rows = (docs.mapInPandas(gen, "i long, v double")
            .groupBy("i").agg(F.sum("v").alias("v")).collect())
    hhT = np.zeros((k, k))
    vhT = np.zeros((model.num_tokens, k))
    for r in rows:
        i, val = r["i"], r["v"]
        if i >= 0:
            vhT[i // k, i % k] = val
        else:
            flat = -i - 1
            hhT[flat // k, flat % k] = val
    return hhT, vhT


def nmf_fit(postings: DataFrame, num_topics: int,
            num_terms: int | None = None, passes: int = 1,
            kappa: float = 1.0, minimum_probability: float = 0.01,
            w_max_iter: int = 200, w_stop_condition: float = 1e-4,
            h_max_iter: int = 50, h_stop_condition: float = 1e-3,
            normalize: bool = True, random_seed: int = 13) -> NmfModel:
    """Fit NMF over (doc_id, term_id, tf) postings. One batch per pass —
    the reference with chunksize ≥ |corpus| (its online chunking exists to
    bound single-node memory; here the corpus never lands on one node)."""
    if num_terms is None:
        num_terms = infer_dim(postings, "term_id")
    model = NmfModel(num_terms, num_topics, kappa, minimum_probability,
                     w_max_iter, w_stop_condition, h_max_iter,
                     h_stop_condition, normalize, random_seed)
    # postings may carry 'tf' or a pre-weighted 'weight' column — resolve
    # once, like corpus_bow/log_perplexity (lda.py:213,447)
    tf_col = "tf" if "tf" in postings.columns else "weight"
    agg = postings.agg(
        F.sum(tf_col).alias("s"), F.max(tf_col).alias("mx"),
        F.countDistinct("doc_id").alias("nd")).collect()[0]
    n_docs = agg["nd"]
    # _setup: w_std from the first batch's csc mean = Σtf / (V·n_docs)
    model.setup(float(agg["s"]) / (num_terms * n_docs))
    model.v_max = float(agg["mx"])  # nmf.py:761-766: v.max() of first batch

    docs = corpus_bow(postings)
    for pass_ in range(passes):
        hhT, vhT = _batch_partials(docs, model, update_no=pass_)
        model.fold_batch(hhT, vhT)
    return model


_TRANSFORM_UPDATE_NO = 1 << 30  # h-permutation seed stream for inference


def doc_topics(postings: DataFrame, model: NmfModel,
               minimum_probability: float | None = None,
               normalize: bool | None = None) -> DataFrame:
    """get_document_topics for every document (nmf.py:472-519):
    h solved fresh with v_max = ∞, normalized to a distribution when
    ``normalize``, rows with probability > max(min_prob, 1e-8) kept.
    → (doc_id, topic_id, probability)."""
    if minimum_probability is None:
        minimum_probability = model.minimum_probability
    minimum_probability = max(minimum_probability or 0.0, 1e-8)
    if normalize is None:
        normalize = model.normalize
    k = model.num_topics
    sc = postings.sparkSession.sparkContext
    bc = sc.broadcast((model.W, model.kappa, model.h_max_iter,
                       model.h_stop_condition, model.random_seed))

    def gen(batches):
        import pandas as pd

        W, kappa, h_max_iter, h_stop, seed = bc.value
        Wt = W.T
        WtW = Wt @ W
        m = W.shape[0]
        perms = make_perms(k, seed, _TRANSFORM_UPDATE_NO, h_max_iter)
        out_doc, out_topic, out_p = [], [], []
        block: list = []

        def flush():
            if not block:
                return
            n = len(block)
            Wtv = np.empty((k, n))
            for j, (_, ids, cts) in enumerate(block):
                Wtv[:, j] = Wt[:, ids] @ cts
            h = solveproj_block(WtW, Wtv, m, kappa, h_stop, perms)
            for j, (doc_id, _, _) in enumerate(block):
                hj = h[:, j]
                if normalize:
                    s = hj.sum()
                    if s:
                        hj = hj / s
                for t in range(k):
                    if hj[t] > minimum_probability:
                        out_doc.append(doc_id)
                        out_topic.append(t)
                        out_p.append(float(hj[t]))
            block.clear()

        for pdf in batches:
            for doc_id, ids_l, cts_l in zip(pdf["doc_id"], pdf["ids"],
                                            pdf["cts"]):
                block.append((doc_id, np.asarray(ids_l, dtype=np.int64),
                              np.asarray(cts_l, dtype=np.float64)))
                if len(block) >= 512:
                    flush()
        flush()
        yield pd.DataFrame({"doc_id": out_doc, "topic_id": out_topic,
                            "probability": out_p})

    return corpus_bow(postings).mapInPandas(
        gen, "doc_id long, topic_id long, probability double")


def doc_factors(postings: DataFrame, model: NmfModel) -> DataFrame:
    """Raw document factors h per document — all ``num_topics`` rows,
    unnormalized (fresh v_max = ∞ solve, nmf.py:472-519). The persistable
    artifact form of ``get_document_topics``: the ``normalize`` division
    and the ``minimum_probability`` filter are pure relational
    post-processing an external SQL engine can re-derive (the projected-
    gradient solve itself is iterative and pytest-pinned).
    → (doc_id, topic_id, h)."""
    k = model.num_topics
    sc = postings.sparkSession.sparkContext
    bc = sc.broadcast((model.W, model.kappa, model.h_max_iter,
                       model.h_stop_condition, model.random_seed))

    def gen(batches):
        import pandas as pd

        W, kappa, h_max_iter, h_stop, seed = bc.value
        Wt = W.T
        WtW = Wt @ W
        m = W.shape[0]
        perms = make_perms(k, seed, _TRANSFORM_UPDATE_NO, h_max_iter)
        out_doc, out_h = [], []
        block: list = []

        def flush():
            if not block:
                return
            n = len(block)
            Wtv = np.empty((k, n))
            for j, (_, ids, cts) in enumerate(block):
                Wtv[:, j] = Wt[:, ids] @ cts
            h = solveproj_block(WtW, Wtv, m, kappa, h_stop, perms)
            for j, (doc_id, _, _) in enumerate(block):
                out_doc.append(doc_id)
                out_h.append(h[:, j].tolist())
            block.clear()

        for pdf in batches:
            for doc_id, ids_l, cts_l in zip(pdf["doc_id"], pdf["ids"],
                                            pdf["cts"]):
                block.append((doc_id, np.asarray(ids_l, dtype=np.int64),
                              np.asarray(cts_l, dtype=np.float64)))
                if len(block) >= 512:
                    flush()
        flush()
        yield pd.DataFrame({"doc_id": out_doc, "h": out_h})

    wide = corpus_bow(postings).mapInPandas(
        gen, "doc_id long, h array<double>")
    return wide.select(
        "doc_id", F.posexplode("h").alias("topic_id", "h")
    ).select("doc_id", F.col("topic_id").cast("long"), "h")


def l2_norm(postings: DataFrame, model: NmfModel) -> float:
    """√Σ_d ‖v_d − W·h_d‖² over the corpus (nmf.py:542-551), one job.
    The reference evaluates this against the last training chunk's resident
    ``_h``; here h is re-solved (the training h never leaves the executors),
    which is the same quantity whenever the solve is converged."""
    sc = postings.sparkSession.sparkContext
    bc = sc.broadcast((model.W, model.kappa, model.h_max_iter,
                       model.h_stop_condition, model.random_seed))

    def gen(batches):
        import pandas as pd

        W, kappa, h_max_iter, h_stop, seed = bc.value
        Wt = W.T
        WtW = Wt @ W
        m = W.shape[0]
        perms = make_perms(
            W.shape[1], seed, _TRANSFORM_UPDATE_NO, h_max_iter)
        total = 0.0
        for pdf in batches:
            for ids_l, cts_l in zip(pdf["ids"], pdf["cts"]):
                ids = np.asarray(ids_l, dtype=np.int64)
                cts = np.asarray(cts_l, dtype=np.float64)
                wtv = (Wt[:, ids] @ cts).reshape(-1, 1)
                h = solveproj_block(WtW, wtv, m, kappa, h_stop, perms)[:, 0]
                recon = W @ h
                recon[ids] -= cts
                total += float(recon @ recon)
        yield pd.DataFrame({"v": [total]})

    part = (corpus_bow(postings).mapInPandas(gen, "v double")
            .agg(F.sum("v").alias("v")).collect())
    return float(np.sqrt(part[0]["v"]))


def show_topic(model: NmfModel, vocab: DataFrame, topic_id: int,
               topn: int = 10, normalize: bool | None = None) -> DataFrame:
    """Top-n (token, prob) for one topic (nmf.py:314-350) as a DataFrame —
    the topic row is broadcast into a join against the vocab table."""
    row = model.get_topics(normalize)[topic_id]
    spark = vocab.sparkSession
    order = np.argsort(-row, kind="stable")[:topn]
    top = spark.createDataFrame(
        [(int(t), float(row[t]), r) for r, t in enumerate(order)],
        "term_id long, prob double, rank long")
    return (vocab.join(F.broadcast(top), "term_id")
            .select("token", "prob", "rank").orderBy("rank"))
