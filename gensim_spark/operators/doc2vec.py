"""Doc2Vec PV-DM (dm=1, the reference default) and PV-DBOW with
simultaneous word training (dm=0, dbow_words=1).

Reference kernels: ``train_document_dm`` (doc2vec_inner.pyx:420-566) —
neu1 = sum of the window's word vectors PLUS the document vector, count
includes the doctag, mean (``dm_mean``) or sum projection trained against
the center word + negatives on syn1neg, the accumulated error written back
to the doctag AND every context word (scaled by 1/count when dm_mean=0,
the reference's cbow quirk) — and ``train_document_dbow``
(doc2vec_inner.pyx:286-417) with ``train_words=True``: per position, a
full skip-gram pass over the window (word vectors learn), then the doctag
trained against the position's word, one shared random stream.

Spark shape — the word matrices follow word2vec.py's shard-synchronous
protocol (per-epoch broadcast, count-weighted delta averaging, driver
holds only V×D); the DOC vectors are corpus-sized so they never visit the
driver: each document belongs to exactly one shard (doc_id % num_shards),
its vector rides the epoch's applyInPandas output as an absolute-value row
(m=2), stays cached as a distributed (doc_id, dvec) DataFrame, and joins
back in as next epoch's input. Driver traffic per epoch stays
model-sized; doc-vector state is a DataFrame column throughout.

Determinism: per-(epoch, doc) counter-mixed seeds and per-doc seeded
vector init — bit-stable for fixed num_shards regardless of Spark
partitioning (same deviation-and-pin as word2vec.py; gensim's own
multi-worker training is run-to-run irreproducible).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gensim_spark.operators.word2vec import (  # noqa: F401
    _LCG_MOD, _LCG_MUL, MAX_EXP, Word2VecModel, _check_objective,
    _hs_stage, _mix, _sigmoid_table, build_huffman_tree, fold_epoch,
    init_syn0, make_cum_table, make_sample_ints)


def init_doc_vector(doc_id: int, size: int, seed: int) -> np.ndarray:
    """Per-doc seeded init ``(U[0,1) − 0.5) / size`` — the reference's
    doctag init shape (doc2vec.py _randomize_model seeded_vector), keyed by
    doc_id so it is partition-invariant."""
    rs = np.random.RandomState(_mix(seed, 9, int(doc_id)) & 0xFFFFFFFF)
    return (rs.random_sample(size) - 0.5) / size


def _subsample(ids: np.ndarray, sample_ints: np.ndarray,
               rs: np.random.RandomState) -> list:
    kept = []
    for w in ids:
        if sample_ints[w] < rs.randint(0, 2 ** 31) * 2:
            continue
        kept.append(int(w))
    return kept


def train_doc_dm(ids: np.ndarray, dvec: np.ndarray, syn0: np.ndarray,
                 syn1neg: np.ndarray, cum_table: np.ndarray,
                 sample_ints: np.ndarray, window: int, negative: int,
                 alpha: float, doc_seed: int, counts_out: np.ndarray,
                 cbow_mean: int = 1, learn_words: bool = True,
                 learn_hidden: bool = True,
                 shrink_windows: int = 1, hs: int = 0,
                 syn1hs: np.ndarray | None = None,
                 codes: list | None = None, points: list | None = None,
                 counts_hs: np.ndarray | None = None) -> None:
    """One document's PV-DM pass (train_document_dm,
    doc2vec_inner.pyx:420-566, negative-sampling path, one doctag).
    Mutates ``dvec`` in place; ``syn0``/``syn1neg`` when learning.

    With ``hs``, the hierarchical-softmax stage (fast_document_dm_hs,
    doc2vec_inner.pyx:106-127) runs first per position against the SAME
    accumulated error buffer — the reference composes l1 once, lets both
    stages add into ``work``, and applies it once (train_document_dm main
    loop, pyx:486-533) — saturated dots skipped."""
    rs = np.random.RandomState(doc_seed & 0xFFFFFFFF)
    next_random = _mix(doc_seed, 1)
    kept = _subsample(ids, sample_ints, rs)
    n = len(kept)
    if n == 0:
        return
    reduced = (rs.randint(0, window, size=n) if shrink_windows
               else np.zeros(n, dtype=np.int64))

    size = syn0.shape[1]
    cum_last = int(cum_table[-1])
    for i in range(n):
        wi = kept[i]
        j0 = max(0, i - window + reduced[i])
        k0 = min(n, i + window + 1 - reduced[i])
        ctx = [kept[m] for m in range(j0, k0) if m != i]
        # count includes the doctag (doc2vec_inner.pyx:529-538) — never 0
        neu1 = syn0[ctx].sum(axis=0) + dvec if ctx else dvec.copy()
        inv_count = 1.0 / (len(ctx) + 1.0)
        if cbow_mean:
            neu1 = neu1 * inv_count
        work = np.zeros(size)
        if hs:
            work += _hs_stage(neu1, codes[wi], points[wi], syn1hs,
                              alpha, counts_hs, learn_hidden)
        for d in range(negative + 1 if negative else 0):
            if d == 0:
                target, label = wi, 1.0
            else:
                r = (next_random >> 16) % cum_last
                target = int(np.searchsorted(cum_table, r, side="left"))
                next_random = (next_random * _LCG_MUL + 11) & _LCG_MOD
                if target == wi:
                    continue
                label = 0.0
            u = syn1neg[target]
            f_dot = float(neu1 @ u)
            if f_dot <= -MAX_EXP or f_dot >= MAX_EXP:
                continue
            g = (label - _sigmoid_table(f_dot)) * alpha
            work += g * u
            if learn_hidden:
                syn1neg[target] += g * neu1
                counts_out[target] += 1
        if not cbow_mean:
            work = work * inv_count
        dvec += work
        if learn_words:
            for m in ctx:
                syn0[m] += work
                counts_out[m] += 1


def train_doc_dmc(ids: np.ndarray, dvec: np.ndarray, syn0: np.ndarray,
                  syn1neg: np.ndarray, cum_table: np.ndarray,
                  sample_ints: np.ndarray, window: int, negative: int,
                  alpha: float, doc_seed: int, counts_out: np.ndarray,
                  null_index: int, learn_words: bool = True,
                  learn_hidden: bool = True, hs: int = 0,
                  syn1hs: np.ndarray | None = None,
                  codes: list | None = None, points: list | None = None,
                  counts_hs: np.ndarray | None = None) -> None:
    """PV-DM with concatenation (train_document_dm_concat,
    doc2vec_inner.pyx:569-702): layer1 = [doc vector | 2·window word
    vectors] concatenated, positions outside the document padded with the
    NULL word's vector (a trainable vocab row, index ``null_index`` —
    add_null_word, word2vec.py:811-815); windows are FULL (the dm_concat
    loop draws no reduced windows); the accumulated layer1 error is sliced
    back onto the doc vector and every window slot, null rows included.
    ``syn1neg``/``syn1hs`` rows are layer1-sized; both dmc kernels skip
    saturated dots (fast_document_dmc_hs/_neg)."""
    rs = np.random.RandomState(doc_seed & 0xFFFFFFFF)
    next_random = _mix(doc_seed, 1)
    kept = _subsample(ids, sample_ints, rs)
    n = len(kept)
    if n == 0:
        return
    size = syn0.shape[1]
    cum_last = int(cum_table[-1])
    for i in range(n):
        wi = kept[i]
        win_idx = []
        for m in range(i - window, i + window + 1):
            if m == i:
                continue
            win_idx.append(null_index if (m < 0 or m >= n) else kept[m])
        neu1 = np.concatenate([dvec] + [syn0[w] for w in win_idx])
        work = np.zeros(neu1.shape[0])
        if hs:
            work += _hs_stage(neu1, codes[wi], points[wi], syn1hs,
                              alpha, counts_hs, learn_hidden)
        for d in range(negative + 1 if negative else 0):
            if d == 0:
                target, label = wi, 1.0
            else:
                r = (next_random >> 16) % cum_last
                target = int(np.searchsorted(cum_table, r, side="left"))
                next_random = (next_random * _LCG_MUL + 11) & _LCG_MOD
                if target == wi:
                    continue
                label = 0.0
            u = syn1neg[target]
            f_dot = float(neu1 @ u)
            if f_dot <= -MAX_EXP or f_dot >= MAX_EXP:
                continue
            g = (label - _sigmoid_table(f_dot)) * alpha
            work += g * u
            if learn_hidden:
                syn1neg[target] += g * neu1
                counts_out[target] += 1
        dvec += work[:size]
        if learn_words:
            for m, w in enumerate(win_idx):
                syn0[w] += work[(1 + m) * size:(2 + m) * size]
                counts_out[w] += 1


def train_doc_dbow(ids: np.ndarray, dvec: np.ndarray, syn0: np.ndarray,
                   syn1neg: np.ndarray, cum_table: np.ndarray,
                   sample_ints: np.ndarray, window: int, negative: int,
                   alpha: float, doc_seed: int, counts_out: np.ndarray,
                   train_words: bool = True, learn_words: bool = True,
                   learn_hidden: bool = True,
                   shrink_windows: int = 1, hs: int = 0,
                   syn1hs: np.ndarray | None = None,
                   codes: list | None = None, points: list | None = None,
                   counts_hs: np.ndarray | None = None) -> None:
    """One document's PV-DBOW pass with optional simultaneous skip-gram
    word training (train_document_dbow, doc2vec_inner.pyx:286-417): per
    position, skip-gram pairs over the window first (when ``train_words``),
    then the doctag trained against the position's word — one shared
    negative-sampling stream, matching the reference's single
    ``next_random``.

    With ``hs``, fast_document_dbow_hs (pyx:38-63) runs before the neg
    stage at each site — its own error buffer, applied immediately, so the
    neg stage sees the hs-updated context vector (the pyx passes the same
    memory region)."""
    rs = np.random.RandomState(doc_seed & 0xFFFFFFFF)
    next_random = _mix(doc_seed, 1)
    kept = _subsample(ids, sample_ints, rs)
    n = len(kept)
    if n == 0:
        return
    reduced = rs.randint(0, window, size=n) \
        if (train_words and shrink_windows) else np.zeros(n, dtype=np.int64)

    cum_last = int(cum_table[-1])

    def neg_pass(vec, wi):
        nonlocal next_random
        size = vec.shape[0]
        work = np.zeros(size)
        for d in range(negative + 1):
            if d == 0:
                target, label = wi, 1.0
            else:
                r = (next_random >> 16) % cum_last
                target = int(np.searchsorted(cum_table, r, side="left"))
                next_random = (next_random * _LCG_MUL + 11) & _LCG_MOD
                if target == wi:
                    continue
                label = 0.0
            u = syn1neg[target]
            f_dot = float(vec @ u)
            if f_dot <= -MAX_EXP or f_dot >= MAX_EXP:
                continue
            g = (label - _sigmoid_table(f_dot)) * alpha
            work += g * u
            if learn_hidden:
                syn1neg[target] += g * vec
                counts_out[target] += 1
        return work

    def hs_pass(vec, wi):
        return _hs_stage(vec, codes[wi], points[wi], syn1hs,
                         alpha, counts_hs, learn_hidden)

    for i in range(n):
        wi = kept[i]
        if train_words:
            j0 = max(0, i - window + reduced[i])
            k0 = min(n, i + window + 1 - reduced[i])
            for j in range(j0, k0):
                if j == i:
                    continue
                wj = kept[j]
                if hs:
                    work = hs_pass(syn0[wj], wi)
                    if learn_words:
                        syn0[wj] += work
                        counts_out[wj] += 1
                if negative:
                    work = neg_pass(syn0[wj], wi)
                    if learn_words:
                        syn0[wj] += work
                        counts_out[wj] += 1
        if hs:
            dvec += hs_pass(dvec, wi)
        if negative:
            dvec += neg_pass(dvec, wi)


class Doc2VecModel:
    """Fitted Doc2Vec: ``wv`` (the word-side Word2VecModel, driver-resident
    V×D) + ``dv`` (the distributed (doc_id, dvec) DataFrame — corpus-sized,
    never collected)."""

    def __init__(self, wv: Word2VecModel, dv: DataFrame, dm: int,
                 dbow_words: int, dm_concat: int = 0,
                 null_index: int | None = None):
        self.wv = wv
        self.dv = dv
        self.dm = dm
        self.dbow_words = dbow_words
        self.dm_concat = dm_concat
        self.null_index = null_index   # the '\0' pad row when dm_concat

    def doc_vectors_df(self) -> DataFrame:
        return self.dv.select(F.col("doc_id"),
                              F.col("dvec").alias("embedding"))


def doc2vec_fit(docs: DataFrame, vocab_size: int, counts: np.ndarray,
                vector_size: int = 100, window: int = 5, negative: int = 5,
                alpha: float = 0.025, min_alpha: float = 0.0001,
                epochs: int = 5, sample: float = 1e-3,
                ns_exponent: float = 0.75, num_shards: int = 64,
                seed: int = 1, dm: int = 1, dm_mean: int = 1,
                dbow_words: int = 0,
                shrink_windows: bool = True, hs: int = 0,
                dm_concat: int = 0) -> Doc2VecModel:
    """Fit PV-DM (``dm=1``, reference default), PV-DM with concatenation
    (``dm=1, dm_concat=1``) or PV-DBOW+words (``dm=0``, ``dbow_words=1``)
    over (doc_id, ids) rows. Word matrices are folded on the driver per
    epoch (count-weighted shard averaging); doc vectors stay a distributed
    DataFrame joined back in each epoch. ``hs=1`` adds the
    hierarchical-softmax objective (Huffman tree over ``counts``;
    composes with negative sampling when both are set, like the
    reference). ``dm_concat`` appends the reference's NULL pad word to the
    vocabulary (count 1, last index — add_null_word) and widens the output
    matrices to layer1 = (1 + 2·window)·vector_size."""
    _check_objective(hs, negative)
    spark = docs.sparkSession
    sc = spark.sparkContext
    counts = np.asarray(counts)
    dm_concat = 1 if (dm and dm_concat) else 0
    null_index = None
    out_width = vector_size
    if dm_concat:
        null_index = vocab_size
        vocab_size = vocab_size + 1
        counts = np.append(counts, 1)
        out_width = (1 + 2 * window) * vector_size
    codes = points = syn1 = None
    if hs:
        codes, points = build_huffman_tree(counts)
        syn1 = np.zeros((vocab_size, out_width))
    wv = Word2VecModel(
        vocab_size, vector_size,
        init_syn0(vocab_size, vector_size, seed),
        np.zeros((vocab_size, out_width)),
        make_cum_table(counts, ns_exponent),
        make_sample_ints(counts, sample),
        window, negative, seed, sg=0, cbow_mean=dm_mean,
        hs=hs, syn1=syn1, codes=codes, points=points)

    def init_gen(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "dvec": [list(init_doc_vector(d, vector_size, seed))
                         for d in pdf["doc_id"]]})

    dv = docs.select("doc_id").mapInPandas(
        init_gen, "doc_id long, dvec array<double>").cache()
    dv.count()

    for epoch in range(epochs):
        a = alpha - (alpha - min_alpha) * epoch / max(1, epochs - 1) \
            if epochs > 1 else alpha
        bc = sc.broadcast((wv.syn0, wv.syn1neg, wv.cum_table,
                           wv.sample_ints, window, negative, seed,
                           dm, dm_mean, dbow_words,
                           1 if shrink_windows else 0,
                           hs, wv.syn1, wv.codes, wv.points,
                           dm_concat, null_index))

        def make_shard_fn(epoch, a, bc):
            def run(key, pdf):
                import pandas as pd

                (syn0_0, syn1_0, cum, samp, window_, negative_, seed_,
                 dm_, dm_mean_, dbow_words_, sw_,
                 hs_, syn1hs_0, codes_, points_,
                 dmc_, null_) = bc.value
                syn0 = syn0_0.copy()
                syn1 = syn1_0.copy()
                syn1hs = syn1hs_0.copy() if hs_ else None
                cnts = np.zeros(syn0.shape[0], dtype=np.int64)
                cnts_h = (np.zeros(syn0.shape[0], dtype=np.int64)
                          if hs_ else None)
                hs_kw = dict(hs=hs_, syn1hs=syn1hs, codes=codes_,
                             points=points_, counts_hs=cnts_h) if hs_ else {}
                pdf = pdf.sort_values("doc_id")
                out = []
                for doc_id, ids, dvec in zip(pdf["doc_id"], pdf["ids"],
                                             pdf["dvec"]):
                    arr = np.asarray(ids, dtype=np.int64)
                    vec = np.asarray(dvec, dtype=np.float64).copy()
                    ds = _mix(seed_, epoch, int(doc_id))
                    if dm_ and dmc_:
                        train_doc_dmc(arr, vec, syn0, syn1, cum, samp,
                                      window_, negative_, a, ds, cnts,
                                      null_, **hs_kw)
                    elif dm_:
                        train_doc_dm(arr, vec, syn0, syn1, cum, samp,
                                     window_, negative_, a, ds, cnts,
                                     cbow_mean=dm_mean_,
                                     shrink_windows=sw_, **hs_kw)
                    else:
                        train_doc_dbow(arr, vec, syn0, syn1, cum, samp,
                                       window_, negative_, a, ds, cnts,
                                       train_words=bool(dbow_words_),
                                       shrink_windows=sw_, **hs_kw)
                    out.append((2, int(doc_id), 1, list(vec)))
                for w in np.nonzero(cnts)[0]:
                    out.append((0, int(w), int(cnts[w]),
                                list(syn0[w] - syn0_0[w])))
                    out.append((1, int(w), int(cnts[w]),
                                list(syn1[w] - syn1_0[w])))
                if hs_:
                    # m=3: hierarchical-softmax inner-node deltas (m=2 is
                    # taken by the doc-vector rows in this protocol)
                    for w in np.nonzero(cnts_h)[0]:
                        out.append((3, int(w), int(cnts_h[w]),
                                    list(syn1hs[w] - syn1hs_0[w])))
                return pd.DataFrame(
                    out, columns=["m", "w", "cnt", "delta"])
            return run

        joined = (docs.join(dv, "doc_id")
                  .withColumn("shard",
                              F.pmod(F.col("doc_id"), F.lit(num_shards))))
        out = joined.groupBy("shard").applyInPandas(
            make_shard_fn(epoch, a, bc),
            "m int, w long, cnt long, delta array<double>").cache()
        deltas = out.filter((F.col("m") <= 1) | (F.col("m") == 3)).collect()
        # fold_epoch's m=2 slot is the hs matrix; this protocol ships hs
        # deltas as m=3 (m=2 carries doc vectors) — remap before folding
        deltas = [r if r["m"] != 3 else
                  {"m": 2, "w": r["w"], "cnt": r["cnt"], "delta": r["delta"]}
                  for r in deltas]
        # localCheckpoint severs lineage: unpersisting `out` below cascades
        # to dependent caches (SPARK-24596), and a plain cache over `out`
        # would silently recompute through the destroyed epoch broadcast
        new_dv = out.filter(F.col("m") == 2).select(
            F.col("w").alias("doc_id"),
            F.col("delta").alias("dvec")).localCheckpoint(eager=True)
        bc.destroy()
        dv.unpersist()
        out.unpersist()
        dv = new_dv
        fold_epoch(wv, deltas)
    wv.shrink_windows = 1 if shrink_windows else 0
    return Doc2VecModel(wv, dv, dm, dbow_words,
                        dm_concat=dm_concat, null_index=null_index)


def infer_vectors(docs: DataFrame, model: Doc2VecModel, epochs: int = 10,
                  alpha: float = 0.025, min_alpha: float = 0.0001,
                  seed: int | None = None) -> DataFrame:
    """infer_vector for a batch of documents (doc2vec.py:625-680): a fresh
    per-doc vector trained with FROZEN word matrices — embarrassingly
    parallel mapInPandas, the doc vector never leaves its row."""
    wv = model.wv
    seed = wv.seed if seed is None else seed
    sc = docs.sparkSession.sparkContext
    hs = getattr(wv, "hs", 0)
    bc = sc.broadcast((wv.syn0, wv.syn1neg, wv.cum_table, wv.sample_ints,
                       wv.window, wv.negative, model.dm, wv.cbow_mean,
                       getattr(wv, "shrink_windows", 1),
                       hs, getattr(wv, "syn1", None),
                       getattr(wv, "codes", None),
                       getattr(wv, "points", None),
                       getattr(model, "dm_concat", 0),
                       getattr(model, "null_index", None)))
    size = wv.vector_size

    def gen(batches):
        import pandas as pd

        (syn0, syn1, cum, samp, window, negative, dm, dm_mean,
         sw, hs_, syn1hs, codes, points, dmc, null_) = bc.value
        dummy = np.zeros(syn0.shape[0], dtype=np.int64)
        hs_kw = dict(hs=hs_, syn1hs=syn1hs, codes=codes, points=points,
                     counts_hs=dummy) if hs_ else {}
        for pdf in batches:
            out_id, out_vec = [], []
            for doc_id, ids in zip(pdf["doc_id"], pdf["ids"]):
                arr = np.asarray(ids, dtype=np.int64)
                vec = init_doc_vector(int(doc_id), size, _mix(seed, 11))
                for epoch in range(epochs):
                    a = alpha - (alpha - min_alpha) * epoch \
                        / max(1, epochs - 1) if epochs > 1 else alpha
                    ds = _mix(seed, 12 + epoch, int(doc_id))
                    if dm and dmc:
                        train_doc_dmc(arr, vec, syn0, syn1, cum, samp,
                                      window, negative, a, ds, dummy,
                                      null_, learn_words=False,
                                      learn_hidden=False, **hs_kw)
                    elif dm:
                        train_doc_dm(arr, vec, syn0, syn1, cum, samp,
                                     window, negative, a, ds, dummy,
                                     cbow_mean=dm_mean, learn_words=False,
                                     learn_hidden=False,
                                     shrink_windows=sw, **hs_kw)
                    else:
                        train_doc_dbow(arr, vec, syn0, syn1, cum, samp,
                                       window, negative, a, ds, dummy,
                                       train_words=False,
                                       learn_words=False,
                                       learn_hidden=False,
                                       shrink_windows=sw, **hs_kw)
                out_id.append(doc_id)
                out_vec.append(list(vec))
            yield pd.DataFrame({"doc_id": out_id, "embedding": out_vec})

    return docs.mapInPandas(gen, "doc_id long, embedding array<double>")
