"""Latent Dirichlet Allocation — online/batch variational Bayes on Spark.

Reference: ``gensim.models.ldamodel.LdaModel`` — Hoffman, Blei, Bach (2010)
"Online Learning for Latent Dirichlet Allocation" exactly as the reference
implements it:

* priors via ``init_dir_prior`` — 'symmetric' 1/K, 'asymmetric'
  1/(k+√K) normalized, 'auto' (optimized by Newton updates), scalars and
  arrays (ldamodel.py:528-609);
* λ initialised as Gamma(100, 1/100) draws and — reference quirk kept —
  the initial expElogβ computed from the raw sstats *without* adding η
  (ldamodel.py:510-512);
* per-document E-step with the Lee & Seung implicit-φ update, ``iterations``
  cap and ``gamma_threshold`` mean-absolute-change stop (ldamodel.py:644-748);
* M-step blending sstats with rate ρ = (τ₀ + pass + t)^(−κ)
  (LdaState.blend ldamodel.py:201-238, rho() ldamodel.py:968-969,
  do_mstep ldamodel.py:1050-1083);
* ELBO ``bound`` / ``log_perplexity`` term-for-term (ldamodel.py:1085-1145),
  α optimization by Huang's Newton step (update_dir_prior ldamodel.py:114-151).

Spark shape — the E-step is embarrassingly parallel and the model is the
only global:

1. the BoW corpus is one ``groupBy(doc_id)`` of the postings (the lists are
   ``sort_array``-ed so per-document float reductions are order-exact and
   independent of partitioning);
2. each pass broadcasts expElogβ (K×V — the model, driver-resident exactly
   as in the reference) and runs one ``mapInPandas`` over the documents;
   workers accumulate their partition's sufficient statistics into a
   term-keyed dict and emit them once, as packed ``(i = term·K + topic, v)``
   longs — the shuffle carries ≤ |terms-in-partition|·K rows per task, never
   per-document data, and is map-side combined by the ``groupBy(i).sum``;
3. the driver applies the blend M-step to the collected K×V partials.

Determinism: the reference draws each document's initial γ from a shared
sequential RandomState (ldamodel.py:678), which has no distributed
equivalent — here every (document, update) pair gets its own counter-mixed
seed, so results are bit-stable under any partitioning or execution order
(the tests' numpy replica uses the same construction).  dtype is float64
(the reference defaults to float32) for stable cross-partition reductions.

Scale: one job per (pass, statistic); model broadcast is O(K·V) like the
reference's own worker memory (gensim/models/lda_worker.py); vocab size is
bounded by ``filter_extremes`` upstream exactly as the reference advises.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gensim_spark.functions.special import (
    digamma,
    dirichlet_expectation,
    gammaln,
    logsumexp,
    mean_absolute_difference,
    trigamma,
)

_GAMMA_SHAPE = 100.0  # ldamodel.py:511,678 — Gamma(100, 1/100) init draws


def doc_seed(base_seed: int, update_no: int, doc_id: int) -> int:
    """Counter-mixed per-(document, update) RNG seed — the distributed
    replacement for the reference's sequential ``random_state`` draws."""
    h = (int(doc_id) * 2654435761 + int(update_no) * 976369 + int(base_seed) * 31) & 0xFFFFFFFF
    return h


def init_gamma(base_seed: int, update_no: int, doc_id: int, num_topics: int) -> np.ndarray:
    """The document's initial γ draw (ldamodel.py:678 semantics, per-doc RNG)."""
    rs = np.random.RandomState(doc_seed(base_seed, update_no, doc_id))
    return rs.gamma(_GAMMA_SHAPE, 1.0 / _GAMMA_SHAPE, int(num_topics))


def infer_doc(ids: np.ndarray, cts: np.ndarray, gammad: np.ndarray,
              exp_elogbeta: np.ndarray, alpha: np.ndarray,
              iterations: int, gamma_threshold: float):
    """One document's variational inference (ldamodel.py:697-734): returns
    (γ_d, expElogθ_d, φ-normaliser) with the implicit-φ Lee & Seung update."""
    eps = np.finfo(np.float64).eps
    elogthetad = dirichlet_expectation(gammad)
    expelogthetad = np.exp(elogthetad)
    eebd = exp_elogbeta[:, ids]                       # (K, nnz)
    phinorm = expelogthetad @ eebd + eps
    for _ in range(iterations):
        lastgamma = gammad
        gammad = alpha + expelogthetad * ((cts / phinorm) @ eebd.T)
        elogthetad = dirichlet_expectation(gammad)
        expelogthetad = np.exp(elogthetad)
        phinorm = expelogthetad @ eebd + eps
        if mean_absolute_difference(gammad, lastgamma) < gamma_threshold:
            break
    return gammad, expelogthetad, phinorm


def update_dir_prior(prior: np.ndarray, n: float, logphat: np.ndarray,
                     rho: float) -> np.ndarray:
    """Huang's Newton step for a Dirichlet prior (ldamodel.py:114-151)."""
    gradf = n * (digamma(np.sum(prior)) - digamma(prior) + logphat)
    c = n * trigamma(np.sum(prior))
    q = -n * trigamma(prior)
    b = np.sum(gradf / q) / (1.0 / c + np.sum(1.0 / q))
    dprior = -(gradf - b) / q
    updated = rho * dprior + prior
    return updated if np.all(updated > 0) else prior


def _init_prior(prior, name: str, num_topics: int, num_terms: int):
    """init_dir_prior (ldamodel.py:528-609) → (vector, is_auto)."""
    shape = num_topics if name == "alpha" else num_terms
    if prior is None:
        prior = "symmetric"
    is_auto = False
    if isinstance(prior, str):
        if prior == "symmetric":
            vec = np.full(shape, 1.0 / num_topics)
        elif prior == "asymmetric":
            if name != "alpha":
                raise ValueError("'asymmetric' is only defined for alpha")
            vec = 1.0 / (np.arange(shape) + np.sqrt(num_topics))
            vec /= vec.sum()
        elif prior == "auto":
            is_auto = True
            vec = np.full(shape, 1.0 / num_topics)
        else:
            raise ValueError(f"unknown prior {prior!r} for {name}")
    elif np.ndim(prior) == 0:
        vec = np.full(shape, float(prior))
    else:
        vec = np.asarray(prior, dtype=np.float64)
        if vec.shape != (shape,):
            raise ValueError(f"{name} shape {vec.shape} != ({shape},)")
    return vec.astype(np.float64), is_auto


class LdaModel:
    """The fitted model state — driver-resident λ exactly like the
    reference's ``LdaModel``/``LdaState`` pair; all corpus-sized work is
    delegated to the module functions that take DataFrames."""

    def __init__(self, num_topics: int, num_terms: int,
                 alpha="symmetric", eta=None,
                 decay: float = 0.5, offset: float = 1.0,
                 iterations: int = 50, gamma_threshold: float = 0.001,
                 minimum_probability: float = 0.01,
                 random_seed: int = 13, chunksize: int = 2000):
        self.num_topics = int(num_topics)
        self.num_terms = int(num_terms)
        self.decay = float(decay)
        self.offset = float(offset)
        self.iterations = int(iterations)
        self.gamma_threshold = float(gamma_threshold)
        self.minimum_probability = float(minimum_probability)
        self.random_seed = int(random_seed)
        self.chunksize = int(chunksize)
        self.alpha, self.optimize_alpha = _init_prior(
            alpha, "alpha", self.num_topics, self.num_terms)
        self.eta, self.optimize_eta = _init_prior(
            eta, "eta", self.num_topics, self.num_terms)
        rs = np.random.RandomState(self.random_seed)
        # ldamodel.py:510-512 — sstats ~ Gamma(100, 1/100); initial
        # expElogbeta from the raw sstats (not eta + sstats: reference quirk)
        self.sstats = rs.gamma(_GAMMA_SHAPE, 1.0 / _GAMMA_SHAPE,
                               (self.num_topics, self.num_terms))
        self.exp_elogbeta = np.exp(dirichlet_expectation(self.sstats))
        self.numdocs = 0
        self.num_updates = 0

    # --- LdaState surface (ldamodel.py:154-283) ---

    def get_lambda(self) -> np.ndarray:
        return self.eta + self.sstats

    def get_elogbeta(self) -> np.ndarray:
        return dirichlet_expectation(self.get_lambda())

    def get_topics(self) -> np.ndarray:
        """Row-normalised topic-term probabilities (ldamodel.py:1221-1239)."""
        lam = self.get_lambda()
        return lam / lam.sum(axis=1)[:, np.newaxis]

    def blend(self, rhot: float, other_sstats: np.ndarray, other_numdocs: int):
        """LdaState.blend (ldamodel.py:201-238), targetsize = self.numdocs."""
        targetsize = self.numdocs
        # self-side stretch is targetsize/self.numdocs == 1 with targetsize=None
        self.sstats *= (1.0 - rhot)
        if other_numdocs == 0 or targetsize == other_numdocs:
            scale = 1.0
        else:
            scale = 1.0 * targetsize / other_numdocs
        self.sstats += rhot * scale * other_sstats

    def do_mstep(self, rho: float, other_sstats: np.ndarray,
                 other_numdocs: int, extra_pass: bool = False):
        """do_mstep + sync_state (ldamodel.py:1050-1083, 624-637)."""
        self.blend(rho, other_sstats, other_numdocs)
        self.exp_elogbeta = np.exp(self.get_elogbeta())
        if not extra_pass:
            self.num_updates += other_numdocs

    def rho(self, pass_: int) -> float:
        """ρ_t = (τ₀ + pass + t)^(−κ) (ldamodel.py:968-969)."""
        return pow(self.offset + pass_ + self.num_updates / self.chunksize,
                   -self.decay)


def infer_dim(df: DataFrame, col: str, what: str = "corpus") -> int:
    """``max(col) + 1`` with a clear error on an empty input — a NULL max
    would otherwise surface as ``NoneType + int`` deep inside a fit."""
    m = df.agg(F.max(col).alias("m")).first()["m"]
    if m is None:
        raise ValueError(
            f"cannot infer dimensions from an empty {what} "
            f"(no rows carry a {col})")
    return int(m) + 1


def corpus_bow(postings: DataFrame) -> DataFrame:
    """(doc_id, term_id, tf) postings → one row per document with parallel
    sorted id/count arrays — the unit the E-step's Arrow batches consume."""
    tf_col = "tf" if "tf" in postings.columns else "weight"
    pairs = F.sort_array(F.collect_list(F.struct("term_id", F.col(tf_col).alias("tf"))))
    return (postings.groupBy("doc_id").agg(pairs.alias("bow"))
            .select(
                "doc_id",
                F.transform("bow", lambda x: x["term_id"]).alias("ids"),
                F.transform("bow", lambda x: x["tf"].cast("double")).alias("cts"),
            ))


def _estep(docs: DataFrame, model: LdaModel, update_no: int) -> tuple:
    """One distributed E-step: returns (sstats K×V, logphat Σ Elogθ, ndocs).

    Emits per-partition dict-combined ``(i = term·K + topic, v)`` partials;
    negative ``i`` carries the α-optimisation statistics (Σ_d Elogθ_d and the
    document count) so everything rides one job.
    """
    k, v = model.num_topics, model.num_terms
    sc = docs.sparkSession.sparkContext
    bc = sc.broadcast(model.exp_elogbeta)
    alpha = model.alpha
    iters, thr = model.iterations, model.gamma_threshold
    seed = model.random_seed

    def gen(batches):
        import pandas as pd

        eeb = bc.value
        acc: dict[int, np.ndarray] = {}
        elogtheta_sum = np.zeros(k)
        ndocs = 0
        for pdf in batches:
            for doc_id, ids_l, cts_l in zip(pdf["doc_id"], pdf["ids"], pdf["cts"]):
                ids = np.asarray(ids_l, dtype=np.int64)
                cts = np.asarray(cts_l, dtype=np.float64)
                gammad = init_gamma(seed, update_no, doc_id, k)
                gammad, expelogthetad, phinorm = infer_doc(
                    ids, cts, gammad, eeb, alpha, iters, thr)
                # sstats[:, ids] += outer(expElogθ_d, cts/φnorm)  (ldamodel.py:734)
                contrib = np.outer(expelogthetad, cts / phinorm)
                for j, t in enumerate(ids):
                    vec = acc.get(t)
                    if vec is None:
                        acc[t] = contrib[:, j].copy()
                    else:
                        vec += contrib[:, j]
                elogtheta_sum += dirichlet_expectation(gammad)
                ndocs += 1
        n_terms_here = len(acc)
        i_out = np.empty(n_terms_here * k + k + 1, dtype=np.int64)
        v_out = np.empty(n_terms_here * k + k + 1, dtype=np.float64)
        pos = 0
        for t in sorted(acc):
            i_out[pos:pos + k] = np.int64(t) * k + np.arange(k)
            v_out[pos:pos + k] = acc[t]
            pos += k
        i_out[pos:pos + k] = -(np.arange(k) + 1)      # Σ Elogθ rows
        v_out[pos:pos + k] = elogtheta_sum
        i_out[pos + k] = -(k + 1)                     # doc count
        v_out[pos + k] = float(ndocs)
        yield pd.DataFrame({"i": i_out, "v": v_out})

    rows = (docs.mapInPandas(gen, "i long, v double")
            .groupBy("i").agg(F.sum("v").alias("v")).collect())
    sstats = np.zeros((k, v))
    elogtheta_sum = np.zeros(k)
    ndocs = 0.0
    for r in rows:
        i, val = r["i"], r["v"]
        if i >= 0:
            sstats[i % k, i // k] = val
        elif i == -(k + 1):
            ndocs = val
        else:
            elogtheta_sum[-i - 1] = val
    sstats *= model.exp_elogbeta                      # ldamodel.py:744
    return sstats, elogtheta_sum, ndocs


def lda_fit(postings: DataFrame, num_topics: int, num_terms: int | None = None,
            passes: int = 1, callbacks=None, **model_kwargs) -> LdaModel:
    """Fit by batch EM over the corpus (``update_every=0`` semantics of
    ldamodel.py:855-1048: one E-step over everything, one M-step, per pass).

    ``callbacks``: list of ``operators.callbacks.Metric`` — evaluated after
    every pass exactly like ``LdaModel.update`` (ldamodel.py:971-1038);
    per-metric value lists land on ``model.metrics``.
    """
    if num_terms is None:
        num_terms = infer_dim(postings, "term_id")
    docs = corpus_bow(postings).cache()
    lencorpus = docs.count()
    model = LdaModel(num_topics, num_terms, **model_kwargs)
    model.numdocs += lencorpus                        # ldamodel.py:934
    cb = None
    if callbacks:
        from collections import defaultdict

        from gensim_spark.operators.callbacks import Callback
        cb = Callback(callbacks)
        cb.set_model(model)
        model.metrics = defaultdict(list)
    for pass_ in range(int(passes)):
        rho = model.rho(pass_)
        sstats, elogtheta_sum, ndocs = _estep(docs, model, update_no=pass_)
        if model.optimize_alpha and ndocs > 0:        # update_alpha (ldamodel.py:775-824)
            logphat = elogtheta_sum / ndocs
            model.alpha = update_dir_prior(model.alpha, ndocs, logphat, rho)
        model.do_mstep(rho, sstats, int(ndocs), extra_pass=pass_ > 0)
        if cb is not None:                            # ldamodel.py:1035-1038
            for label, value in cb.on_epoch_end(pass_).items():
                model.metrics[label].append(value)
    docs.unpersist()
    return model


def lda_fit_online(postings: DataFrame, num_topics: int,
                   num_terms: int | None = None, passes: int = 1,
                   update_chunks: int = 4, **model_kwargs) -> LdaModel:
    """Online (mini-batch) EM — ``update_every=1`` semantics of
    ldamodel.py:936-1048: E-step and ρ-blended M-step per chunk, with the
    reference's ρ_t = (τ₀ + pass + t/chunksize)^(−κ) schedule and
    ``num_updates`` accounting (grows only on the first pass,
    ldamodel.py:1081-1083).

    Deviation: the reference mini-batches in stream order; a DataFrame has
    no stream order, so chunks are ``doc_id % update_chunks`` — for
    stationary input (Hoffman et al.'s convergence setting) the chunk
    composition is immaterial, and hash-chunking is deterministic under any
    partitioning.
    """
    if num_terms is None:
        num_terms = infer_dim(postings, "term_id")
    n_chunks = max(1, int(update_chunks))
    docs = corpus_bow(postings).withColumn(
        "_chunk", F.pmod(F.col("doc_id"), F.lit(n_chunks))).cache()
    lencorpus = docs.count()
    model = LdaModel(num_topics, num_terms, **model_kwargs)
    model.chunksize = max(1, -(-lencorpus // n_chunks))   # actual chunk size
    model.numdocs += lencorpus                            # ldamodel.py:934
    for pass_ in range(int(passes)):
        for chunk_no in range(n_chunks):
            chunk = docs.filter(F.col("_chunk") == chunk_no).drop("_chunk")
            rho = model.rho(pass_)
            sstats, elogtheta_sum, ndocs = _estep(
                chunk, model, update_no=pass_ * n_chunks + chunk_no)
            if ndocs == 0:
                continue
            if model.optimize_alpha:
                logphat = elogtheta_sum / ndocs
                model.alpha = update_dir_prior(model.alpha, ndocs, logphat,
                                               rho)
            model.do_mstep(rho, sstats, int(ndocs), extra_pass=pass_ > 0)
    docs.unpersist()
    return model


def doc_topics(postings: DataFrame, model: LdaModel,
               minimum_probability: float | None = None,
               update_no: int = -1) -> DataFrame:
    """``get_document_topics`` over the whole corpus (ldamodel.py:1337-1364):
    fresh inference, θ = γ/Σγ, rows with θ ≥ max(min_probability, 1e-8)."""
    min_p = (model.minimum_probability if minimum_probability is None
             else float(minimum_probability))
    min_p = max(min_p, 1e-8)
    k = model.num_topics
    sc = postings.sparkSession.sparkContext
    bc = sc.broadcast(model.exp_elogbeta)
    alpha, iters, thr = model.alpha, model.iterations, model.gamma_threshold
    seed = model.random_seed

    def gen(batches):
        import pandas as pd

        eeb = bc.value
        for pdf in batches:
            out_doc, out_topic, out_p = [], [], []
            for doc_id, ids_l, cts_l in zip(pdf["doc_id"], pdf["ids"], pdf["cts"]):
                ids = np.asarray(ids_l, dtype=np.int64)
                cts = np.asarray(cts_l, dtype=np.float64)
                gammad = init_gamma(seed, update_no, doc_id, k)
                gammad, _, _ = infer_doc(ids, cts, gammad, eeb, alpha,
                                         iters, thr)
                theta = gammad / gammad.sum()
                keep = np.nonzero(theta >= min_p)[0]
                out_doc.extend([doc_id] * len(keep))
                out_topic.extend(keep.tolist())
                out_p.extend(theta[keep].tolist())
            yield pd.DataFrame({"doc_id": pd.Series(out_doc, dtype="int64"),
                                "topic_id": pd.Series(out_topic, dtype="int64"),
                                "probability": pd.Series(out_p, dtype="float64")})

    return corpus_bow(postings).mapInPandas(
        gen, "doc_id long, topic_id long, probability double")


def doc_gamma(postings: DataFrame, model: LdaModel,
              update_no: int = -1) -> DataFrame:
    """Raw variational γ per document — all ``num_topics`` rows,
    unnormalized. This is the persistable artifact form of
    ``get_document_topics`` (ldamodel.py:1337-1364): given γ, the rest of
    the contract — θ = γ/Σγ and the ``minimum_probability`` filter — is
    pure relational post-processing that an external SQL engine can
    re-derive (the inference itself is iterative and pytest-pinned).
    → (doc_id, topic_id, gamma)."""
    k = model.num_topics
    sc = postings.sparkSession.sparkContext
    bc = sc.broadcast(model.exp_elogbeta)
    alpha, iters, thr = model.alpha, model.iterations, model.gamma_threshold
    seed = model.random_seed

    def gen(batches):
        import pandas as pd

        eeb = bc.value
        for pdf in batches:
            out_doc, out_g = [], []
            for doc_id, ids_l, cts_l in zip(pdf["doc_id"], pdf["ids"],
                                            pdf["cts"]):
                ids = np.asarray(ids_l, dtype=np.int64)
                cts = np.asarray(cts_l, dtype=np.float64)
                gammad = init_gamma(seed, update_no, doc_id, k)
                gammad, _, _ = infer_doc(ids, cts, gammad, eeb, alpha,
                                         iters, thr)
                out_doc.append(doc_id)
                out_g.append(gammad.tolist())
            yield pd.DataFrame({"doc_id": pd.Series(out_doc, dtype="int64"),
                                "gamma": pd.Series(out_g)})

    wide = corpus_bow(postings).mapInPandas(
        gen, "doc_id long, gamma array<double>")
    return wide.select(
        "doc_id",
        F.posexplode("gamma").alias("topic_id", "gamma")
    ).select("doc_id", F.col("topic_id").cast("long"), "gamma")


def bound(postings: DataFrame, model: LdaModel,
          subsample_ratio: float = 1.0, update_no: int = -2) -> float:
    """The ELBO over the corpus (ldamodel.py:1085-1145): per-document terms
    computed distributed (fresh inference per doc, as the reference does when
    no γ is supplied), topic-prior terms added on the driver."""
    k = model.num_topics
    lam = model.get_lambda()
    elogbeta = dirichlet_expectation(lam)
    sc = postings.sparkSession.sparkContext
    bc_eeb = sc.broadcast(model.exp_elogbeta)
    bc_elb = sc.broadcast(elogbeta)
    alpha, iters, thr = model.alpha, model.iterations, model.gamma_threshold
    seed = model.random_seed
    galpha = float(np.sum(gammaln(alpha)))
    glnsum_alpha = float(gammaln(np.sum(alpha)))

    def gen(batches):
        import pandas as pd

        eeb, elb = bc_eeb.value, bc_elb.value
        score = 0.0
        for pdf in batches:
            for doc_id, ids_l, cts_l in zip(pdf["doc_id"], pdf["ids"], pdf["cts"]):
                ids = np.asarray(ids_l, dtype=np.int64)
                cts = np.asarray(cts_l, dtype=np.float64)
                gammad = init_gamma(seed, update_no, doc_id, k)
                gammad, _, _ = infer_doc(ids, cts, gammad, eeb, alpha,
                                         iters, thr)
                elogthetad = dirichlet_expectation(gammad)
                # E[log p(doc | θ, β)]
                score += float(np.sum(
                    cts * logsumexp(elogthetad[np.newaxis, :] + elb[:, ids].T)))
                # E[log p(θ|α) − log q(θ|γ)]
                score += float(np.sum((alpha - gammad) * elogthetad))
                score += float(np.sum(gammaln(gammad))) - galpha
                score += glnsum_alpha - float(gammaln(np.sum(gammad)))
        yield pd.DataFrame({"v": [score]})

    part = (corpus_bow(postings).mapInPandas(gen, "v double")
            .agg(F.sum("v").alias("v")).first()["v"] or 0.0)
    score = part * subsample_ratio
    # E[log p(β|η) − log q(β|λ)] — driver terms (ldamodel.py:1134-1143)
    score += float(np.sum((model.eta - lam) * elogbeta))
    score += float(np.sum(gammaln(lam) - gammaln(model.eta)))
    sum_eta = float(np.sum(model.eta))
    score += float(np.sum(gammaln(sum_eta) - gammaln(np.sum(lam, 1))))
    return score


def log_perplexity(postings: DataFrame, model: LdaModel) -> float:
    """Per-word ELBO (ldamodel.py:826-853): bound / token count."""
    tf_col = "tf" if "tf" in postings.columns else "weight"
    words = postings.agg(F.sum(tf_col).alias("s")).first()["s"] or 0.0
    return bound(postings, model) / float(words)


def topics_df(spark, model: LdaModel) -> DataFrame:
    """(topic_id, term_id, prob) long form of ``get_topics`` — K×V rows,
    driver-created (the model is driver-resident by construction)."""
    probs = model.get_topics()
    k, v = probs.shape
    import pandas as pd

    pdf = pd.DataFrame({
        "topic_id": np.repeat(np.arange(k, dtype=np.int64), v),
        "term_id": np.tile(np.arange(v, dtype=np.int64), k),
        "prob": probs.ravel(),
    })
    return spark.createDataFrame(pdf)


def show_topic(model: LdaModel, vocab: DataFrame, topic_id: int,
               topn: int = 10) -> DataFrame:
    """Top-probability terms of one topic (ldamodel.py:1202-1219)."""
    row = model.get_topics()[int(topic_id)]
    best = np.argsort(-row)[:topn]
    spark = vocab.sparkSession
    top = spark.createDataFrame(
        [(int(t), float(row[t]), r) for r, t in enumerate(best)],
        "term_id long, prob double, rank long")
    return (top.join(F.broadcast(vocab.select("term_id", "token")), "term_id")
            .orderBy("rank").select("token", "prob"))


def get_term_topics(model: LdaModel, term_id: int,
                    minimum_probability: float | None = None):
    """Most relevant topics for one term (ldamodel.py:1388-1418): topics
    whose expElogβ[topic, term] clears the threshold, as (topic_id, p)
    pairs in topic order. The floor of 1e-8 matches the reference's
    never-zero clamp."""
    min_p = (model.minimum_probability if minimum_probability is None
             else float(minimum_probability))
    min_p = max(min_p, 1e-8)
    col = np.exp(model.get_elogbeta())[:, int(term_id)]
    return [(k, float(col[k])) for k in range(model.num_topics)
            if col[k] >= min_p]


def top_topics(model: LdaModel, measure: str = "u_mass", topn: int = 20,
               vocab: DataFrame | None = None, **coherence_kw):
    """Topics ranked by coherence, best first (ldamodel.py:1255-1306):
    [(topic_repr, score)] where topic_repr is the top-``topn``
    (prob, term) list — term ids, or tokens when ``vocab`` is given.

    ``coherence_kw`` forwards to ``coherence.coherence_per_topic``
    (postings=/num_docs= for u_mass, texts= for the windowed measures).
    For the windowed measures the topic word lists handed to the estimator
    are token strings, so ``vocab`` is required there."""
    from gensim_spark.operators import coherence as C

    probs = model.get_topics()
    bestn = [np.argsort(-probs[t], kind="stable")[:topn].tolist()
             for t in range(model.num_topics)]
    id2tok = None
    if vocab is not None:
        id2tok = {r["term_id"]: r["token"]
                  for r in vocab.select("term_id", "token").collect()}
    topic_words = (bestn if measure == "u_mass"
                   else [[id2tok[w] for w in t] for t in bestn])
    scores = C.coherence_per_topic(topic_words, measure, **coherence_kw)
    reprs = [[(float(probs[t, w]), id2tok[w] if id2tok else int(w))
              for w in bestn[t]] for t in range(model.num_topics)]
    return sorted(zip(reprs, [float(s) for s in scores]),
                  key=lambda x: x[1], reverse=True)


def diff(model: LdaModel, other: LdaModel,
         distance: str = "kullback_leibler", num_words: int = 100,
         n_ann_terms: int = 10, diagonal: bool = False,
         annotation: bool = True, normed: bool = True):
    """Topic-difference matrix between two fitted models
    (ldamodel.py:1420-1513) — delegates to the shared distance kernels."""
    from gensim_spark.operators import distances as D

    return D.lda_diff(model.get_topics(), other.get_topics(),
                      distance=distance, num_words=num_words,
                      n_ann_terms=n_ann_terms, diagonal=diagonal,
                      annotation=annotation, normed=normed)
