"""Author-Topic model — variational EM over (document, author) pairs.

Reference: ``gensim.models.atmodel.AuthorTopicModel`` (Rosen-Zvi et al.),
which inherits the LDA online-VB machinery: per-document E-step updates the
γ rows of the document's AUTHORS (atmodel.py:410-553 inference — implicit-φ
updates where each author's γ moves by ``alpha + |docs(a)| · expElogθ_a ·
(cts/φnorm)·expElogβᵀ`` with a (1−ρ)·old + ρ·new interpolation per
iteration), sufficient statistics accumulate exactly like LDA's with the
author-summed expElogθ (atmodel.py:530-553), and the M-step is LdaState's
blend (do_mstep, via ldamodel.py:1050-1083). γ is author-keyed (A×K) and
persists across passes; within a pass, documents sharing an author are
sequentially coupled through it (atmodel.py:528-533 writes γ back
immediately).

Spark shape — the λ side reuses operators/lda.py's LdaModel (priors, blend,
ρ schedule, driver-resident K×V). γ is author-bounded (A×K, vocab-like, not
corpus-like) so it is driver-resident too, trained with the same
shard-synchronous protocol as word2vec.py: each pass broadcasts (γ,
expElogβ, author doc-counts), every shard (doc_id % num_shards) runs the
exact reference inference sequentially over its docs on a LOCAL γ copy, and
emits per-author γ deltas with touch counts plus packed (term·K+topic)
sstats partials; the driver folds γ by count-weighted averaging and applies
the LDA M-step. With num_shards=1 this IS the reference's batch flow
(single sequential γ pass in doc_id order) — the tests pin that case
directly, and the sharded deviation with the usual replica construction.

Out of scope (documented): α/η auto-optimization for this model,
serialized-corpus bookkeeping (extend_corpus), and get_new_author_topics'
rollback protocol — new-author inference is a fresh fit over the new pairs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gensim_spark.functions.special import (dirichlet_expectation,
                                            mean_absolute_difference)
from gensim_spark.operators.lda import LdaModel, corpus_bow, infer_dim

_GAMMA_SHAPE = 100.0


def infer_doc_at(ids: np.ndarray, cts: np.ndarray, gammad: np.ndarray,
                 author_doc_counts: np.ndarray, exp_elogbeta: np.ndarray,
                 alpha: np.ndarray, rhot: float, iterations: int,
                 gamma_threshold: float):
    """One document's E-step (atmodel.py:467-553): returns (tilde_gamma
    n_authors×K, sstats_contrib K×|ids| BEFORE the expElogβ hadamard).

    ``gammad`` holds the document's authors' current γ rows;
    ``author_doc_counts`` the corpus-wide |docs(a)| per author."""
    tilde = gammad.copy()
    exp_elogthetad = np.exp(dirichlet_expectation(tilde))
    exp_elogbetad = exp_elogbeta[:, ids]
    phinorm = exp_elogthetad.sum(axis=0).dot(exp_elogbetad) + 1e-100
    for _ in range(iterations):
        last = tilde.copy()
        dot = np.dot(cts / phinorm, exp_elogbetad.T)
        tilde = alpha + author_doc_counts[:, np.newaxis] \
            * exp_elogthetad * dot[np.newaxis, :]
        tilde = (1 - rhot) * gammad + rhot * tilde
        exp_elogthetad = np.exp(dirichlet_expectation(tilde))
        phinorm = exp_elogthetad.sum(axis=0).dot(exp_elogbetad) + 1e-100
        if mean_absolute_difference(tilde.ravel(), last.ravel()) \
                < gamma_threshold:
            break
    contrib = np.outer(exp_elogthetad.sum(axis=0).T, cts / phinorm)
    return tilde, contrib


class AuthorTopicModel:
    """Driver-resident fitted state: the LDA λ side + author γ (A×K) +
    per-author doc counts; corpus-sized work stays in DataFrames."""

    def __init__(self, num_topics: int, num_terms: int, num_authors: int,
                 alpha="symmetric", eta=None, decay: float = 0.5,
                 offset: float = 1.0, iterations: int = 50,
                 gamma_threshold: float = 0.001,
                 minimum_probability: float = 0.01,
                 random_seed: int = 13, chunksize: int = 2000):
        self.lda = LdaModel(num_topics, num_terms, alpha=alpha, eta=eta,
                            decay=decay, offset=offset,
                            iterations=iterations,
                            gamma_threshold=gamma_threshold,
                            minimum_probability=minimum_probability,
                            random_seed=random_seed, chunksize=chunksize)
        self.num_topics = int(num_topics)
        self.num_authors = int(num_authors)
        # γ init draws follow the λ init on the SAME stream, mirroring the
        # reference's shared random_state order (sstats in LdaModel.__init__
        # first, then atmodel.py:766-768 gamma(100, 1/100, (A, K)))
        rs = np.random.RandomState(random_seed)
        rs.gamma(_GAMMA_SHAPE, 1.0 / _GAMMA_SHAPE,
                 (self.num_topics, num_terms))   # advance past the λ draw
        self.gamma = rs.gamma(_GAMMA_SHAPE, 1.0 / _GAMMA_SHAPE,
                              (self.num_authors, self.num_topics))
        self.author_doc_counts = np.zeros(self.num_authors, dtype=np.int64)

    def get_topics(self) -> np.ndarray:
        return self.lda.get_topics()

    def get_author_topics(self, author_id: int,
                          minimum_probability: float | None = None):
        """(topic_id, prob) pairs above the threshold — γ row normalized
        (atmodel.py:1124-1182; min prob clamped to ≥ 1e-8)."""
        if minimum_probability is None:
            minimum_probability = self.lda.minimum_probability
        minimum_probability = max(minimum_probability, 1e-8)
        dist = self.gamma[author_id] / self.gamma[author_id].sum()
        return [(k, float(p)) for k, p in enumerate(dist)
                if p > minimum_probability]

    def author_topics_df(self, spark,
                         minimum_probability: float | None = None
                         ) -> DataFrame:
        """All authors' topic distributions as (author_id, topic_id,
        probability) rows — the relational retrieval surface."""
        rows = [(a, k, p) for a in range(self.num_authors)
                for k, p in self.get_author_topics(a, minimum_probability)]
        return spark.createDataFrame(
            rows, "author_id long, topic_id long, probability double")


def author_topic_fit(postings: DataFrame, doc2author: DataFrame,
                     num_topics: int, num_terms: int | None = None,
                     num_authors: int | None = None, passes: int = 1,
                     iterations: int = 50, decay: float = 0.5,
                     offset: float = 1.0, alpha="symmetric", eta=None,
                     gamma_threshold: float = 0.001,
                     random_seed: int = 13, num_shards: int = 32,
                     chunksize: int = 2000) -> AuthorTopicModel:
    """Fit over (doc_id, term_id, tf) postings + (doc_id, author_id) pairs.
    Batch mode: one M-step per pass at ρ(pass), the reference's
    update_every=0 path (atmodel.py:806-906)."""
    if num_terms is None:
        num_terms = infer_dim(postings, "term_id")
    if num_authors is None:
        num_authors = infer_dim(doc2author, "author_id", "doc2author table")
    model = AuthorTopicModel(num_topics, num_terms, num_authors,
                             alpha=alpha, eta=eta, decay=decay,
                             offset=offset, iterations=iterations,
                             gamma_threshold=gamma_threshold,
                             random_seed=random_seed, chunksize=chunksize)
    # |docs(a)| over the whole corpus (atmodel.py len(author2doc[a]))
    for r in doc2author.groupBy("author_id").count().collect():
        model.author_doc_counts[r["author_id"]] = r["count"]

    docs = corpus_bow(postings).join(
        doc2author.groupBy("doc_id").agg(
            F.sort_array(F.collect_list("author_id")).alias("authors")),
        "doc_id", "left")
    docs = docs.withColumn(
        "shard", F.pmod(F.col("doc_id"), F.lit(num_shards))).cache()
    n_docs = docs.count()
    # the reference indexes doc2author[doc] per corpus doc (atmodel.py:700)
    # and KeyErrors on a gap — an inner join would silently drop the doc
    # while author_doc_counts kept its |docs(a)| weight, fitting a
    # different model; fail loudly instead (reads the cache, one filter)
    orphan = docs.filter(F.col("authors").isNull()).select("doc_id").first()
    if orphan is not None:
        docs.unpersist()
        raise ValueError(
            f"document {orphan['doc_id']} has postings but no doc2author "
            "row — every corpus document needs at least one author "
            "(the reference raises KeyError here)")
    model.lda.numdocs = n_docs
    sc = postings.sparkSession.sparkContext
    k, v = num_topics, num_terms

    for pass_ in range(passes):
        rhot = model.lda.rho(pass_)
        bc = sc.broadcast((model.gamma, model.lda.exp_elogbeta,
                           model.author_doc_counts, model.lda.alpha,
                           iterations, gamma_threshold, rhot))

        def make_shard_fn(bc):
            def run(key, pdf):
                import pandas as pd

                (gamma0, eeb, adc, alpha_, iters, thr, rho_) = bc.value
                gamma = gamma0.copy()
                touched = np.zeros(gamma.shape[0], dtype=np.int64)
                sstats: dict = {}
                pdf = pdf.sort_values("doc_id")
                for ids, cts, authors in zip(pdf["ids"], pdf["cts"],
                                             pdf["authors"]):
                    ids = np.asarray(ids, dtype=np.int64)
                    cts = np.asarray(cts, dtype=np.float64)
                    aus = np.asarray(authors, dtype=np.int64)
                    tilde, contrib = infer_doc_at(
                        ids, cts, gamma[aus], adc[aus].astype(np.float64),
                        eeb, alpha_, rho_, iters, thr)
                    gamma[aus] = tilde           # sequential coupling
                    touched[aus] += 1
                    for j, t in enumerate(ids):
                        key_ = int(t)
                        if key_ in sstats:
                            sstats[key_] += contrib[:, j]
                        else:
                            sstats[key_] = contrib[:, j].copy()
                out_m, out_w, out_c, out_d = [], [], [], []
                for a in np.nonzero(touched)[0]:
                    out_m.append(0)
                    out_w.append(int(a))
                    out_c.append(int(touched[a]))
                    out_d.append(list(gamma[a] - gamma0[a]))
                for t, col in sstats.items():
                    out_m.append(1)
                    out_w.append(t)
                    out_c.append(1)
                    out_d.append(list(col))
                return pd.DataFrame({"m": out_m, "w": out_w,
                                     "cnt": out_c, "delta": out_d})
            return run

        rows = docs.groupBy("shard").applyInPandas(
            make_shard_fn(bc),
            "m int, w long, cnt long, delta array<double>").collect()
        bc.destroy()

        num: dict = {}
        den: dict = {}
        sstats = np.zeros((k, v))
        for r in rows:
            if r["m"] == 0:
                d = np.asarray(r["delta"]) * r["cnt"]
                if r["w"] in num:
                    num[r["w"]] += d
                    den[r["w"]] += r["cnt"]
                else:
                    num[r["w"]] = d
                    den[r["w"]] = r["cnt"]
            else:
                sstats[:, r["w"]] += np.asarray(r["delta"])
        for a, d in num.items():
            model.gamma[a] += d / den[a]
        # finish the sstats (atmodel.py:548-552) and M-step like the
        # reference's dirty-chunk path (atmodel.py:896-906)
        sstats *= model.lda.exp_elogbeta
        model.lda.do_mstep(rhot, sstats, n_docs, extra_pass=pass_ > 0)
    docs.unpersist()
    return model
