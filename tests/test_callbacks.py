"""Training-metric callbacks (operators/callbacks.py) vs the reference
semantics of gensim/models/callbacks.py:109-616 and the LdaModel.update
wiring (ldamodel.py:971-1038)."""

import logging

import numpy as np
import pytest
from pyspark.sql import functions as F

from gensim_spark.operators import callbacks as CB
from gensim_spark.operators import coherence as C
from gensim_spark.operators import lda as L

K = 3


@pytest.fixture(scope="module")
def lda_setup(spark, common_texts):
    token2id, rows = {}, []
    for d, toks in enumerate(common_texts):
        counts = {}
        for t in toks:
            counts[token2id.setdefault(t, len(token2id))] = \
                counts.get(token2id.setdefault(t, len(token2id)), 0) + 1
        rows += [(d, tid, int(c)) for tid, c in sorted(counts.items())]
    postings = spark.createDataFrame(
        rows, "doc_id long, term_id long, tf long")
    vocab = spark.createDataFrame(
        [(tid, tok) for tok, tid in token2id.items()],
        "term_id long, token string")
    return postings, vocab, len(token2id)


def test_metric_str_and_set_parameters():
    m = CB.PerplexityMetric()
    assert str(m) == "Perplexity"          # class name minus 'Metric'
    m2 = CB.CoherenceMetric(title="my-coh")
    assert str(m2) == "my-coh"             # explicit title wins
    m.set_parameters(foo=3)
    assert m.foo == 3
    with pytest.raises(NotImplementedError):
        CB.Metric().get_value()


def test_perplexity_metric_matches_bound(lda_setup):
    postings, _, v = lda_setup
    model = L.lda_fit(postings, num_topics=K, num_terms=v, passes=1,
                      random_seed=7)
    got = CB.PerplexityMetric(postings=postings).get_value(model=model)
    words = postings.agg(F.sum("tf").alias("s")).first()["s"]
    want = float(np.exp2(-L.bound(postings, model) / float(words)))
    assert got == pytest.approx(want, rel=1e-12)


def test_coherence_metric_umass_matches_direct(lda_setup):
    postings, vocab, v = lda_setup
    model = L.lda_fit(postings, num_topics=K, num_terms=v, passes=1,
                      random_seed=7)
    m = CB.CoherenceMetric(postings=postings, coherence="u_mass", topn=5)
    got = m.get_value(model=model)
    probs = model.get_topics()
    topics = [np.argsort(-probs[t], kind="stable")[:5].tolist()
              for t in range(K)]
    ndocs = postings.select("doc_id").distinct().count()
    want = C.get_coherence(topics, "u_mass", postings=postings,
                           num_docs=ndocs)
    assert got == pytest.approx(want, rel=1e-12)
    # explicit topics override the model (callbacks.py:246-249)
    got2 = m.get_value(topics=topics, model=None)
    assert got2 == pytest.approx(want, rel=1e-12)


def test_diff_and_convergence_metrics(lda_setup):
    postings, _, v = lda_setup
    ma = L.lda_fit(postings, num_topics=K, num_terms=v, passes=1,
                   random_seed=7)
    mb = L.lda_fit(postings, num_topics=K, num_terms=v, passes=1,
                   random_seed=8)
    d = CB.DiffMetric(distance="jaccard", num_words=5)
    z = d.get_value(model=ma, other_model=mb)
    assert z.shape == (K,)                 # diagonal=True default
    conv = CB.ConvergenceMetric(distance="jaccard", num_words=5)
    s = conv.get_value(model=ma, other_model=mb)
    assert s == pytest.approx(float(np.sum(z)), rel=1e-12)
    # identical models: jaccard diagonal is exactly zero
    z0 = CB.DiffMetric(distance="jaccard", num_words=5, normed=False) \
        .get_value(model=ma, other_model=ma)
    assert np.all(z0 == 0.0)


def test_lda_fit_callback_wiring(lda_setup, caplog):
    postings, _, v = lda_setup
    metrics = [CB.PerplexityMetric(postings=postings, logger="shell"),
               CB.ConvergenceMetric(distance="jaccard", num_words=5)]
    with caplog.at_level(logging.INFO, "gensim_spark.operators.lda"):
        model = L.lda_fit(postings, num_topics=K, num_terms=v, passes=3,
                          random_seed=7, callbacks=metrics)
    assert sorted(model.metrics) == ["Convergence", "Perplexity"]
    assert len(model.metrics["Perplexity"]) == 3   # one value per pass
    assert len(model.metrics["Convergence"]) == 3
    # callbacks must not perturb training: same lambda as a plain fit
    plain = L.lda_fit(postings, num_topics=K, num_terms=v, passes=3,
                      random_seed=7)
    assert model.get_lambda() == pytest.approx(plain.get_lambda(),
                                               rel=1e-9, abs=1e-9)
    shell_lines = [r.message for r in caplog.records
                   if "Perplexity estimate" in r.message]
    assert len(shell_lines) == 3
    assert shell_lines[0].startswith("Epoch 0: Perplexity estimate: ")


def test_visdom_logger_raises(lda_setup):
    postings, _, _ = lda_setup
    cb = CB.Callback([CB.PerplexityMetric(postings=postings,
                                          logger="visdom")])

    class _M:
        pass

    with pytest.raises(ImportError):
        cb.set_model(_M())


def test_callback_any2vec_hooks(spark, common_texts):
    from gensim_spark.operators import word2vec as W

    token2id = {}
    for toks in common_texts:
        for t in toks:
            token2id.setdefault(t, len(token2id))
    counts = np.zeros(len(token2id))
    rows = []
    for d, toks in enumerate(common_texts):
        ids = [token2id[t] for t in toks]
        for i in ids:
            counts[i] += 1
        rows.append((d, ids))
    docs = spark.createDataFrame(rows, "doc_id long, ids array<long>")

    calls = []

    class Rec(CB.CallbackAny2Vec):
        def on_train_begin(self, model):
            calls.append("train_begin")

        def on_epoch_begin(self, model):
            calls.append("epoch_begin")

        def on_epoch_end(self, model):
            calls.append("epoch_end")

        def on_train_end(self, model):
            calls.append("train_end")

    W.word2vec_fit(docs, len(token2id), counts, vector_size=8, epochs=2,
                   num_shards=2, callbacks=[Rec()])
    assert calls == ["train_begin", "epoch_begin", "epoch_end",
                     "epoch_begin", "epoch_end", "train_end"]
    # the base class itself is all no-ops
    base = CB.CallbackAny2Vec()
    assert base.on_epoch_begin(None) is None
    assert base.on_train_end(None) is None


def test_run_callbacks_requires_pretrained_snapshot_for_diff(spark):
    import pytest as _pytest

    from gensim_spark.operators.callbacks import DiffMetric, run_callbacks
    from gensim_spark.operators.lda import LdaModel

    model = LdaModel(2, 5)
    with _pytest.raises(ValueError, match="set_model ran before"):
        run_callbacks([DiffMetric()], model, 0)
