"""Training-metric callbacks (gensim/models/callbacks.py:109-616).

The reference wires a list of ``Metric`` objects into ``LdaModel.update``:
after every pass a ``Callback`` evaluates each metric against the current
(and previous) model state and logs/stores the values. The Spark shape is
identical at the driver — the *evaluation* of each metric is where the
cluster does the work:

* ``PerplexityMetric`` → ``lda.bound`` (a distributed Arrow-batched ELBO
  pass over the postings DataFrame),
* ``CoherenceMetric`` → the distributed co-occurrence counting pipeline in
  ``operators/coherence.py``,
* ``DiffMetric`` / ``ConvergenceMetric`` → ``lda.diff`` over the two
  model-sized K×V topic matrices (driver math, reference's own memory
  model).

Semantics replicated exactly:

* ``Metric.__str__`` → ``title`` or the class name minus the "Metric"
  suffix (callbacks.py:120-131).
* ``PerplexityMetric.get_value`` → ``np.exp2(-bound/corpus_words)`` with
  the natural-log bound (callbacks.py:284-289, the reference's own 2^x
  convention, quirk preserved).
* ``Callback.on_epoch_end`` → evaluates every metric with
  ``(topics, model, other_model)``, logs ``"Epoch {e}: {label}
  estimate: {value}"`` for shell loggers, refreshes the deep-copied
  previous model only when a Diff/Convergence metric is present
  (callbacks.py:490-565).
* ``LdaModel(callbacks=...)`` stores per-metric value lists in
  ``model.metrics`` (ldamodel.py:971-1038) — mirrored by
  ``lda_fit(callbacks=...)``.

Visdom is gated like the reference when absent (ImportError "Please
install Visdom"); when importable, plotting is still not wired in this
build and ``logger="visdom"`` raises NotImplementedError.
``CallbackAny2Vec`` (callbacks.py:567-616) is the no-op hook base the
word2vec-family trainers invoke around epochs.
"""

from __future__ import annotations

import copy
import logging
from collections import defaultdict

import numpy as np

try:  # pragma: no cover - visdom is not installed in this environment
    import visdom  # noqa: F401
    VISDOM_INSTALLED = True
except ImportError:
    VISDOM_INSTALLED = False


class Metric:
    """Base metric (callbacks.py:109-169)."""

    logger = None
    title = None

    def __str__(self):
        if getattr(self, "title", None) is not None:
            return self.title
        return type(self).__name__[:-6]

    def set_parameters(self, **parameters):
        for parameter, value in parameters.items():
            setattr(self, parameter, value)

    def get_value(self, **kwargs):
        raise NotImplementedError(
            "Please provide an implementation for `get_value` in your "
            "subclass.")


class CoherenceMetric(Metric):
    """Coherence after each pass (callbacks.py:172-257).

    Spark shape: ``postings`` (doc_id, term_id, tf) replaces the BoW
    corpus for u_mass; ``texts`` (a DataFrame with a tokens column)
    replaces the token stream for the windowed measures; ``vocab``
    (term_id, token) replaces the Dictionary where topics must be
    rendered as tokens.
    """

    def __init__(self, postings=None, texts=None, vocab=None,
                 coherence=None, window_size=None, topn=20,
                 num_docs=None, tokens_col: str = "tokens",
                 logger=None, viz_env=None, title=None):
        self.postings = postings
        self.texts = texts
        self.vocab = vocab
        self.coherence = coherence or "u_mass"
        self.window_size = window_size
        self.topn = topn
        self.num_docs = num_docs
        self.tokens_col = tokens_col
        self.logger = logger
        self.viz_env = viz_env
        self.title = title

    def _model_topics(self, model):
        probs = model.get_topics()
        return [np.argsort(-probs[t], kind="stable")[:self.topn].tolist()
                for t in range(probs.shape[0])]

    def get_value(self, **kwargs):
        from gensim_spark.operators import coherence as C

        # only one of model or topics will be defined (callbacks.py:246)
        self.model = None
        self.topics = None
        super().set_parameters(**kwargs)
        topics = self.topics
        if topics is None:
            topics = self._model_topics(self.model)
        if self.coherence == "u_mass":
            if self.num_docs is None:
                from pyspark.sql import functions as F
                self.num_docs = int(self.postings.select(
                    F.countDistinct("doc_id").alias("n")).first()["n"])
            return C.get_coherence(topics, "u_mass",
                                   postings=self.postings,
                                   num_docs=self.num_docs)
        if topics and not isinstance(topics[0][0], str):
            from pyspark.sql import functions as F
            # only the K·topn topic words are looked up — collecting the
            # whole vocab per epoch would ship V rows to the driver
            ids = sorted({int(w) for t in topics for w in t})
            id2tok = {r["term_id"]: r["token"] for r in
                      self.vocab.filter(F.col("term_id").isin(ids))
                      .select("term_id", "token").collect()}
            topics = [[id2tok[int(w)] for w in t] for t in topics]
        return C.get_coherence(topics, self.coherence, texts=self.texts,
                               window_size=self.window_size,
                               tokens_col=self.tokens_col)


class PerplexityMetric(Metric):
    """2^(-bound/words) after each pass (callbacks.py:260-289)."""

    def __init__(self, postings=None, logger=None, viz_env=None,
                 title=None):
        self.postings = postings
        self.logger = logger
        self.viz_env = viz_env
        self.title = title

    def get_value(self, **kwargs):
        from pyspark.sql import functions as F

        from gensim_spark.operators import lda as LD

        super().set_parameters(**kwargs)
        wcol = ("tf" if "tf" in self.postings.columns else "weight")
        corpus_words = float(self.postings.agg(
            F.sum(wcol).alias("s")).first()["s"])
        perwordbound = LD.bound(self.postings, self.model) / corpus_words
        return float(np.exp2(-perwordbound))


class DiffMetric(Metric):
    """Per-pass topic-difference diagonal (callbacks.py:306-370)."""

    def __init__(self, distance="jaccard", num_words=100, n_ann_terms=10,
                 diagonal=True, annotation=False, normed=True,
                 logger=None, viz_env=None, title=None):
        self.distance = distance
        self.num_words = num_words
        self.n_ann_terms = n_ann_terms
        self.diagonal = diagonal
        self.annotation = annotation
        self.normed = normed
        self.logger = logger
        self.viz_env = viz_env
        self.title = title

    def get_value(self, **kwargs):
        from gensim_spark.operators import lda as LD

        super().set_parameters(**kwargs)
        z, _ = LD.diff(self.model, self.other_model, self.distance,
                       self.num_words, self.n_ann_terms, self.diagonal,
                       self.annotation, self.normed)
        return z


class ConvergenceMetric(Metric):
    """Sum of the difference matrix (callbacks.py:373-438)."""

    def __init__(self, distance="jaccard", num_words=100, n_ann_terms=10,
                 diagonal=True, annotation=False, normed=True,
                 logger=None, viz_env=None, title=None):
        self.distance = distance
        self.num_words = num_words
        self.n_ann_terms = n_ann_terms
        self.diagonal = diagonal
        self.annotation = annotation
        self.normed = normed
        self.logger = logger
        self.viz_env = viz_env
        self.title = title

    def get_value(self, **kwargs):
        from gensim_spark.operators import lda as LD

        super().set_parameters(**kwargs)
        z, _ = LD.diff(self.model, self.other_model, self.distance,
                       self.num_words, self.n_ann_terms, self.diagonal,
                       self.annotation, self.normed)
        return float(np.sum(z))


class Callback:
    """Per-epoch metric evaluation loop (callbacks.py:441-565)."""

    def __init__(self, metrics):
        self.metrics = metrics

    def set_model(self, model):
        self.model = model
        self.previous = None
        if any(isinstance(m, (DiffMetric, ConvergenceMetric))
               for m in self.metrics):
            self.previous = copy.deepcopy(model)
        if any(m.logger == "visdom" for m in self.metrics):
            if not VISDOM_INSTALLED:
                raise ImportError("Please install Visdom for visualization")
            raise NotImplementedError(
                "visdom plotting is not wired in this build — use "
                "logger='shell' or read the returned metric dicts")
        if any(m.logger == "shell" for m in self.metrics):
            self.log_type = logging.getLogger("gensim_spark.operators.lda")

    def on_epoch_end(self, epoch, topics=None):
        current_metrics = {}
        for metric in self.metrics:
            label = str(metric)
            value = metric.get_value(topics=topics, model=self.model,
                                     other_model=self.previous)
            current_metrics[label] = value
            if metric.logger == "shell":
                statement = "".join(("Epoch ", str(epoch), ": ", label,
                                     " estimate: ", str(value)))
                self.log_type.info(statement)
        if any(isinstance(m, (DiffMetric, ConvergenceMetric))
               for m in self.metrics):
            self.previous = copy.deepcopy(self.model)
        return current_metrics


def run_callbacks(metrics, model, pass_: int,
                  store: defaultdict | None = None,
                  callback: Callback | None = None):
    """One ``LdaModel.update`` callback step (ldamodel.py:1035-1038):
    evaluate every metric, append each value to ``store[label]``.

    For Diff/Convergence metrics the Callback must have been constructed
    (``set_model``) BEFORE the pass trained the model — a lazily built
    one would diff the model against a copy of itself and report 0."""
    if callback is None:
        if any(isinstance(m, (DiffMetric, ConvergenceMetric))
               for m in metrics):
            raise ValueError(
                "Diff/Convergence metrics need a Callback whose "
                "set_model ran before the training pass; construct it "
                "first and pass it via callback=")
        callback = Callback(metrics)
        callback.set_model(model)
    current = callback.on_epoch_end(pass_)
    if store is not None:
        for label, value in current.items():
            store[label].append(value)
    return callback, current


class CallbackAny2Vec:
    """No-op epoch/train hooks for the word2vec-family trainers
    (callbacks.py:567-616)."""

    def on_epoch_begin(self, model):
        pass

    def on_epoch_end(self, model):
        pass

    def on_train_begin(self, model):
        pass

    def on_train_end(self, model):
        pass
