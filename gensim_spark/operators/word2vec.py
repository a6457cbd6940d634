"""Word2Vec skip-gram negative-sampling training + PV-DBOW doc vectors.

Reference: ``gensim.models.word2vec`` — the exact SGNS update of
``w2v_fast_sentence_sg_neg`` (word2vec_inner.pyx:155-244): quantized
sigmoid via the 1000-entry EXP_TABLE over (−MAX_EXP, MAX_EXP) with
out-of-range dots skipped, negatives drawn by bisecting the 0.75-power
cum_table with the 48-bit LCG ``next_random = r·25214903917 + 11``,
center-collision negatives dropped, the context word's input vector
updated against the center/negative output rows; dynamic windows
(``reduced_windows``, word2vec_inner.pyx:560-571) and frequent-word
subsampling (``sample_int``, word2vec.py make_cum_table/add_null_word
vocab prep) replicated; ``syn1neg`` starts at zeros.

Spark shape — shard-synchronous SGD (the same scheme Spark MLlib's
Word2Vec uses for hierarchical softmax):

1. documents are assigned to ``num_shards`` logical shards by
   ``doc_id % num_shards`` — explicit, independent of Spark partitioning;
2. each epoch broadcasts (syn0, syn1neg); one ``applyInPandas`` per epoch
   trains every shard sequentially over its docs (sorted by doc_id) on a
   local copy and emits per-word deltas with update counts;
3. the driver folds: new = old + Σ_s cnt_s·Δ_s / Σ_s cnt_s per word —
   count-weighted averaging of shard deltas.

The emitted rows are O(num_shards · |touched vocab|) array rows per
epoch — model-sized, never corpus-sized; syn0/syn1neg live on the driver
(V×D, the reference's own resident matrices).

Determinism deviations (pinned by the tests' sequential replica):
* gensim's single sequential ``next_random`` / ``reduced_windows`` RNG
  has no distributed equivalent — every (epoch, doc) gets a counter-mixed
  seed, so results are bit-stable for a fixed ``num_shards`` regardless
  of Spark partitioning or executor count;
* hogwild races are replaced by the synchronous shard averaging above
  (gensim's own results are run-to-run irreproducible with workers > 1);
* α decays linearly per epoch (gensim interpolates within epochs);
* float64 throughout (reference is float32) for stable averaging.

PV-DBOW (doc2vec.py, dm=0, dbow_words=0): each document's vector trains
only on its own words against the *frozen* word output matrix — perfectly
parallel, one pass, the doc vector never leaves its row.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_EXP = 6.0
EXP_TABLE_SIZE = 1000
_EXP_TABLE = 1.0 / (1.0 + np.exp(-(np.arange(EXP_TABLE_SIZE) /
                                   EXP_TABLE_SIZE * 2 - 1) * MAX_EXP))
_LCG_MUL = 25214903917
_LCG_MOD = 0xFFFFFFFFFFFF  # 2^48 − 1 mask (word2vec_inner.pyx:206)


def _sigmoid_table(f_dot: float) -> float:
    return _EXP_TABLE[int((f_dot + MAX_EXP) * (EXP_TABLE_SIZE / MAX_EXP / 2))]


def _hs_stage(vec, code, point, syn1hs, alpha, counts_hs,
              learn_hidden: bool = True, sigmoid=_sigmoid_table,
              max_exp: float = MAX_EXP) -> np.ndarray:
    """One hierarchical-softmax output stage, shared by every kernel
    (w2v_fast_sentence_sg_hs/cbow_hs, word2vec_inner.pyx:70-133/246-343;
    same loop in fasttext_inner/doc2vec_inner): sigmoid along the target
    word's Huffman path of ``code``/``point`` against ``syn1hs``,
    saturated dots skipped, inner-node rows updated in place (when
    ``learn_hidden``); returns the accumulated input-side error for the
    caller to apply to its layer-1 rows. FastText callers pass their own
    discretized ``sigmoid``/``max_exp`` (EXP_TABLE_SIZE=512, MAX_EXP=6)."""
    work = np.zeros(vec.shape[0])
    for b in range(len(code)):
        u = syn1hs[point[b]]
        f_dot = float(vec @ u)
        if f_dot <= -max_exp or f_dot >= max_exp:
            continue
        g = (1.0 - float(code[b]) - sigmoid(f_dot)) * alpha
        work += g * u
        if learn_hidden:
            syn1hs[point[b]] += g * vec
            counts_hs[point[b]] += 1
    return work


def make_cum_table(counts: np.ndarray, ns_exponent: float = 0.75,
                   domain: int = 2 ** 31 - 1) -> np.ndarray:
    """Cumulative sampling table (word2vec.py make_cum_table): counts^0.75
    normalized onto [0, domain]."""
    pow_counts = np.power(counts.astype(np.float64), ns_exponent)
    cum = np.cumsum(pow_counts)
    return np.round(cum / cum[-1] * domain).astype(np.uint64)


def make_sample_ints(counts: np.ndarray, sample: float = 1e-3) -> np.ndarray:
    """Subsampling thresholds (word2vec.py:1700-1730): keep-probability
    (sqrt(v/t)+1)·t/v scaled to 2^32."""
    total = counts.sum()
    if not sample:
        return np.full(len(counts), 2 ** 32, dtype=np.uint64)
    t = sample * total
    v = counts.astype(np.float64)
    p = (np.sqrt(v / t) + 1.0) * (t / v)
    return (np.minimum(p, 1.0) * (2 ** 32)).astype(np.uint64)


def _check_objective(hs: int, negative: int) -> None:
    """The reference's _check_training_sanity (word2vec.py:1539-1543):
    with hs=0 and negative=0 the kernels update nothing, so refuse to
    silently return untrained vectors."""
    if not hs and not negative:
        raise ValueError(
            "You must set either 'hs' or 'negative' to be positive for "
            "proper training. When both 'hs=0' and 'negative=0', there "
            "will be no training.")


def _mix(seed: int, a: int, b: int = 0) -> int:
    return (int(seed) * 31 + int(a) * 2654435761 + int(b) * 976369) \
        & 0xFFFFFFFFFFFF


class _HeapItem:
    """count-only ordering, exactly the reference's Heapitem.__lt__
    (word2vec.py:2183-2185) — ties are structurally resolved by heapq, not
    by index, and the code assignment depends on that."""
    __slots__ = ("count", "index", "left", "right")

    def __init__(self, count, index, left, right):
        self.count, self.index = count, index
        self.left, self.right = left, right

    def __lt__(self, other):
        return self.count < other.count


def build_huffman_tree(counts: np.ndarray):
    """Huffman codes/points per vocab index (_build_heap +
    _assign_binary_codes, word2vec.py:2188-2238): heapq merge of the two
    smallest nodes, inner nodes numbered V, V+1, …; each leaf's ``code`` is
    its root-path bit string (left=0, right=1) and ``point`` the inner-node
    ids along the path offset by −V. Returns (codes, points) lists of
    np.uint8 / np.uint32 arrays."""
    import heapq

    V = len(counts)
    heap = [_HeapItem(int(counts[i]), i, None, None) for i in range(V)]
    heapq.heapify(heap)
    for i in range(V - 1):
        min1, min2 = heapq.heappop(heap), heapq.heappop(heap)
        heapq.heappush(heap, _HeapItem(min1.count + min2.count, i + V,
                                       min1, min2))
    codes = [None] * V
    points = [None] * V
    if not heap:
        return codes, points
    stack = [(heap[0], [], [])]
    while stack:
        node, code, point = stack.pop()
        if node.index < V:
            codes[node.index] = np.array(code, dtype=np.uint8)
            points[node.index] = np.array(point, dtype=np.uint32)
        else:
            point = list(point) + [node.index - V]
            stack.append((node.left, list(code) + [0], point))
            stack.append((node.right, list(code) + [1], point))
    return codes, points


def init_syn0(vocab_size: int, vector_size: int, seed: int) -> np.ndarray:
    """Per-word seeded uniform(−0.5, 0.5)/size init — the distributed
    replacement for gensim's sequential seeded_vector stream."""
    syn0 = np.empty((vocab_size, vector_size))
    for w in range(vocab_size):
        rs = np.random.RandomState(_mix(seed, w) & 0xFFFFFFFF)
        syn0[w] = (rs.random_sample(vector_size) - 0.5) / vector_size
    return syn0


def train_doc_sg(ids: np.ndarray, syn0: np.ndarray, syn1neg: np.ndarray,
                 cum_table: np.ndarray, sample_ints: np.ndarray,
                 window: int, negative: int, alpha: float,
                 doc_seed: int, counts_out: np.ndarray,
                 hs: int = 0, syn1hs: np.ndarray | None = None,
                 codes: list | None = None, points: list | None = None,
                 counts_hs: np.ndarray | None = None,
                 shrink_windows: int = 1) -> None:
    """One document's skip-gram pass — the exact pyx kernel in numpy.

    ``ids`` are vocab indices (unknown words already dropped — gensim
    shortens the sentence, expanding the window, word2vec_inner.pyx:541).
    Mutates syn0/syn1neg in place and increments per-word update counts.
    With ``hs``, the hierarchical-softmax update
    (w2v_fast_sentence_sg_hs, pyx:70-133) runs first per pair — sigmoid
    along the center word's Huffman path against ``syn1hs``, error applied
    to the context row before the negative-sampling stage sees it — exactly
    the pyx call order (train_batch_sg, pyx:587-590)."""
    rs = np.random.RandomState(doc_seed & 0xFFFFFFFF)
    next_random = _mix(doc_seed, 1)

    # subsampling first (train_batch_sg:543-545), then reduced windows
    kept = []
    for w in ids:
        if sample_ints[w] < rs.randint(0, 2 ** 31) * 2:
            continue
        kept.append(int(w))
    n = len(kept)
    if n == 0:
        return
    reduced = (rs.randint(0, window, size=n) if shrink_windows
               else np.zeros(n, dtype=np.int64))   # word2vec.py:1370-1376

    size = syn0.shape[1]
    cum_last = int(cum_table[-1])
    for i in range(n):
        wi = kept[i]                       # center (output side)
        j0 = max(0, i - window + reduced[i])
        k0 = min(n, i + window + 1 - reduced[i])
        for j in range(j0, k0):
            if j == i:
                continue
            wj = kept[j]                   # context (input side, updated)
            v = syn0[wj]                   # view: hs update feeds the neg stage
            if hs:
                workh = _hs_stage(v, codes[wi], points[wi], syn1hs,
                                  alpha, counts_hs)
                syn0[wj] += workh
                counts_out[wj] += 1
            if not negative:
                continue
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
                f_dot = float(v @ u)
                if f_dot <= -MAX_EXP or f_dot >= MAX_EXP:
                    continue
                g = (label - _sigmoid_table(f_dot)) * alpha
                work += g * u
                syn1neg[target] += g * v
                counts_out[target] += 1
            syn0[wj] += work
            counts_out[wj] += 1


def train_doc_cbow(ids: np.ndarray, syn0: np.ndarray, syn1neg: np.ndarray,
                   cum_table: np.ndarray, sample_ints: np.ndarray,
                   window: int, negative: int, alpha: float,
                   doc_seed: int, counts_out: np.ndarray,
                   cbow_mean: int = 1,
                   hs: int = 0, syn1hs: np.ndarray | None = None,
                   codes: list | None = None, points: list | None = None,
                   counts_hs: np.ndarray | None = None,
                   shrink_windows: int = 1) -> None:
    """One document's CBOW pass (w2v_fast_sentence_cbow_neg,
    word2vec_inner.pyx:345-460): neu1 = mean (or sum) of the context's
    input vectors, trained against center + negatives on syn1neg; the
    accumulated error is written back to every context word (scaled by
    1/count when ``cbow_mean`` is 0, matching the reference quirk).
    With ``hs``, the hierarchical-softmax stage (w2v_fast_sentence_cbow_hs,
    pyx:246-343) runs first and each stage recomputes neu1 from the LIVE
    syn0 — the pyx kernels each rebuild their own neu1, so the negative
    stage sees the hs-updated context rows (train_batch_cbow,
    pyx:684-687)."""
    rs = np.random.RandomState(doc_seed & 0xFFFFFFFF)
    next_random = _mix(doc_seed, 1)

    kept = []
    for w in ids:
        if sample_ints[w] < rs.randint(0, 2 ** 31) * 2:
            continue
        kept.append(int(w))
    n = len(kept)
    if n == 0:
        return
    reduced = (rs.randint(0, window, size=n) if shrink_windows
               else np.zeros(n, dtype=np.int64))   # word2vec.py:1370-1376

    size = syn0.shape[1]
    cum_last = int(cum_table[-1])
    for i in range(n):
        wi = kept[i]
        j0 = max(0, i - window + reduced[i])
        k0 = min(n, i + window + 1 - reduced[i])
        ctx = [kept[m] for m in range(j0, k0) if m != i]
        if not ctx:
            continue
        inv_count = 1.0 / len(ctx)

        def _neu1():
            s = syn0[ctx].sum(axis=0)
            return s * inv_count if cbow_mean else s

        if hs:
            neu1 = _neu1()
            workh = _hs_stage(neu1, codes[wi], points[wi], syn1hs,
                              alpha, counts_hs)
            if not cbow_mean:
                workh = workh * inv_count
            for m in ctx:
                syn0[m] += workh
                counts_out[m] += 1
        if not negative:
            continue
        neu1 = _neu1()
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
            f_dot = float(neu1 @ u)
            if f_dot <= -MAX_EXP or f_dot >= MAX_EXP:
                continue
            g = (label - _sigmoid_table(f_dot)) * alpha
            work += g * u
            syn1neg[target] += g * neu1
            counts_out[target] += 1
        if not cbow_mean:
            work = work * inv_count
        for m in ctx:
            syn0[m] += work
            counts_out[m] += 1


class Word2VecModel:
    def __init__(self, vocab_size: int, vector_size: int,
                 syn0: np.ndarray, syn1neg: np.ndarray,
                 cum_table: np.ndarray, sample_ints: np.ndarray,
                 window: int, negative: int, seed: int,
                 sg: int = 1, cbow_mean: int = 1,
                 hs: int = 0, syn1: np.ndarray | None = None,
                 codes: list | None = None, points: list | None = None):
        self.vocab_size = vocab_size
        self.vector_size = vector_size
        self.syn0 = syn0
        self.syn1neg = syn1neg
        self.cum_table = cum_table
        self.sample_ints = sample_ints
        self.window = window
        self.negative = negative
        self.seed = seed
        self.sg = sg
        self.cbow_mean = cbow_mean
        self.hs = hs
        self.syn1 = syn1          # hierarchical-softmax inner-node matrix
        self.codes = codes
        self.points = points

    def vectors_df(self, spark) -> DataFrame:
        """(term_id, embedding) rows — feed straight into
        operators/keyedvectors.py."""
        rows = [(w, [float(x) for x in self.syn0[w]])
                for w in range(self.vocab_size)]
        return spark.createDataFrame(rows,
                                     "term_id long, embedding array<double>")

    def output_vectors_df(self, spark) -> DataFrame:
        """(term_id, embedding) rows of the OUTPUT matrix ``syn1neg`` —
        the persistable artifact behind :func:`predict_output_word`."""
        rows = [(w, [float(x) for x in self.syn1neg[w]])
                for w in range(self.vocab_size)]
        return spark.createDataFrame(rows,
                                     "term_id long, embedding array<double>")


def predict_output_word(out_vecs: DataFrame, model: Word2VecModel,
                        context_ids, topn: int = 10,
                        key_col: str = "term_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Probability distribution of the center word given context words
    (word2vec.py:1822-1867): CBOW-style propagation — l1 = Σ (or mean, when
    ``cbow_mean``) of the context INPUT vectors, softmax(l1 · syn1negᵀ),
    top-``topn``. The hidden vector is driver-side (a handful of rows of the
    vocab-bounded model); the V-sized propagation is relational: one scan of
    the output-embedding table computing the dot as a JVM ``zip_with`` fold,
    one scalar agg for the softmax denominator, and a TakeOrdered top-k —
    the plan that survives a 10^9-row output table.
    → (term_id, probability, rank)."""
    if not model.negative:
        raise RuntimeError(
            "predict_output_word is only implemented for the negative "
            "sampling scheme; train with negative > 0.")
    ids = [int(w) for w in context_ids if 0 <= int(w) < model.vocab_size]
    if not ids:
        return None
    l1 = model.syn0[ids].sum(axis=0)
    if model.cbow_mean:
        l1 = l1 / len(ids)

    q = F.array(*[F.lit(float(x)) for x in l1])
    v = F.transform(vec_col, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(v, q, lambda a, b: a * b),
                      F.lit(0.0), lambda a, x: a + x)
    scored = out_vecs.select(F.col(key_col), F.exp(dot).alias("e"))
    total = scored.agg(F.sum("e")).collect()[0][0]
    top = (scored.select(key_col, (F.col("e") / F.lit(float(total)))
                         .alias("probability"))
           .orderBy(F.desc("probability"), F.asc(key_col)).limit(topn))
    from pyspark.sql import Window

    wnd = Window.orderBy(F.desc("probability"), F.asc(key_col))
    return top.withColumn("rank", F.row_number().over(wnd))


def _epoch_partials(docs: DataFrame, model: Word2VecModel, epoch: int,
                    alpha: float, num_shards: int) -> list:
    """One synchronous epoch: per-shard sequential SGD on a local copy,
    returns collected (matrix, word, cnt, delta[]) rows."""
    sc = docs.sparkSession.sparkContext
    bc = sc.broadcast((model.syn0, model.syn1neg, model.cum_table,
                       model.sample_ints, model.window, model.negative,
                       model.seed, model.sg, model.cbow_mean,
                       getattr(model, "hs", 0),
                       getattr(model, "syn1", None),
                       getattr(model, "codes", None),
                       getattr(model, "points", None),
                       getattr(model, "shrink_windows", 1)))

    def train_shard(key, pdf):
        import pandas as pd

        (syn0_0, syn1_0, cum, samp, window, negative, seed, sg, cm,
         hs, syn1hs_0, codes, points, sw) = bc.value
        syn0 = syn0_0.copy()
        syn1 = syn1_0.copy()
        syn1hs = syn1hs_0.copy() if hs else None
        counts = np.zeros(syn0.shape[0], dtype=np.int64)
        counts_hs = np.zeros(syn0.shape[0], dtype=np.int64) if hs else None
        pdf = pdf.sort_values("doc_id")
        hs_kw = dict(hs=hs, syn1hs=syn1hs, codes=codes, points=points,
                     counts_hs=counts_hs) if hs else {}
        hs_kw["shrink_windows"] = sw
        for doc_id, ids in zip(pdf["doc_id"], pdf["ids"]):
            arr = np.asarray(ids, dtype=np.int64)
            if sg:
                train_doc_sg(arr, syn0, syn1, cum, samp, window, negative,
                             alpha, _mix(seed, epoch, int(doc_id)), counts,
                             **hs_kw)
            else:
                train_doc_cbow(arr, syn0, syn1, cum, samp, window, negative,
                               alpha, _mix(seed, epoch, int(doc_id)), counts,
                               cbow_mean=cm, **hs_kw)
        touched = np.nonzero(counts)[0]
        out = []
        for w in touched:
            out.append((0, int(w), int(counts[w]),
                        list(syn0[w] - syn0_0[w])))
            out.append((1, int(w), int(counts[w]),
                        list(syn1[w] - syn1_0[w])))
        if hs:
            for w in np.nonzero(counts_hs)[0]:
                out.append((2, int(w), int(counts_hs[w]),
                            list(syn1hs[w] - syn1hs_0[w])))
        return pd.DataFrame(out, columns=["m", "w", "cnt", "delta"])

    shards = docs.withColumn(
        "shard", F.pmod(F.col("doc_id"), F.lit(num_shards)))
    rows = (shards.groupBy("shard").applyInPandas(
        train_shard,
        "m int, w long, cnt long, delta array<double>").collect())
    # one broadcast per epoch — release it, or a many-epoch run
    # accumulates V×D copies on the driver and every executor
    bc.destroy()
    return rows


def fold_epoch(model: Word2VecModel, rows: list) -> None:
    """new = old + Σ cntₛ·Δₛ / Σ cntₛ per (matrix, word) — the MLlib-style
    count-weighted shard average."""
    num = {0: {}, 1: {}, 2: {}}
    den = {0: {}, 1: {}, 2: {}}
    for r in rows:
        m, w, cnt = r["m"], r["w"], r["cnt"]
        d = np.asarray(r["delta"]) * cnt
        if w in num[m]:
            num[m][w] += d
            den[m][w] += cnt
        else:
            num[m][w] = d
            den[m][w] = cnt
    for w, d in num[0].items():
        model.syn0[w] += d / den[0][w]
    for w, d in num[1].items():
        model.syn1neg[w] += d / den[1][w]
    for w, d in num[2].items():
        model.syn1[w] += d / den[2][w]


def word2vec_fit(docs: DataFrame, vocab_size: int, counts: np.ndarray,
                 vector_size: int = 100, window: int = 5, negative: int = 5,
                 alpha: float = 0.025, min_alpha: float = 0.0001,
                 epochs: int = 5, sample: float = 1e-3,
                 ns_exponent: float = 0.75, num_shards: int = 64,
                 seed: int = 1, sg: int = 1,
                 cbow_mean: int = 1, hs: int = 0,
                 shrink_windows: bool = True,
                 callbacks=()) -> Word2VecModel:
    """Fit SGNS (``sg=1``) or CBOW (``sg=0``) over (doc_id, ids) rows
    (vocab indices per document, in token order, unknown words
    pre-dropped). ``counts`` is the per-index corpus frequency vector
    (the vocab table's cf column). ``hs=1`` adds the hierarchical-softmax
    objective over a Huffman tree of the counts (word2vec.py:817,
    2183-2238); both objectives can be active at once, as in the
    reference."""
    _check_objective(hs, negative)
    codes = points = syn1 = None
    if hs:
        codes, points = build_huffman_tree(np.asarray(counts))
        syn1 = np.zeros((vocab_size, vector_size))
    model = Word2VecModel(
        vocab_size, vector_size,
        init_syn0(vocab_size, vector_size, seed),
        np.zeros((vocab_size, vector_size)),
        make_cum_table(counts, ns_exponent),
        make_sample_ints(counts, sample),
        window, negative, seed, sg=sg, cbow_mean=cbow_mean,
        hs=hs, syn1=syn1, codes=codes, points=points)
    model.shrink_windows = 1 if shrink_windows else 0
    for cb in callbacks:      # CallbackAny2Vec (callbacks.py:567-616)
        cb.on_train_begin(model)
    for epoch in range(epochs):
        for cb in callbacks:
            cb.on_epoch_begin(model)
        a = alpha - (alpha - min_alpha) * epoch / max(1, epochs - 1) \
            if epochs > 1 else alpha
        rows = _epoch_partials(docs, model, epoch, a, num_shards)
        fold_epoch(model, rows)
        for cb in callbacks:
            cb.on_epoch_end(model)
    for cb in callbacks:
        cb.on_train_end(model)
    model.trained_epochs = epochs
    return model


def word2vec_update(docs: DataFrame, model: Word2VecModel,
                    counts: np.ndarray, alpha: float = 0.025,
                    min_alpha: float = 0.0001, epochs: int = 5,
                    sample: float = 1e-3, ns_exponent: float = 0.75,
                    num_shards: int = 64, callbacks=()) -> Word2VecModel:
    """Continued training — ``build_vocab(update=True)`` + ``train()``
    (word2vec.py:449-499 update path, prepare_weights update branch).

    ``counts`` is the per-index frequency vector over the MERGED vocabulary
    (old ids preserved, new ids appended — exactly ``vocab.merge_with`` /
    the incremental store's id assignment), and ``docs`` carries the new
    corpus as (doc_id, ids) under those merged ids. New syn0 rows get the
    same deterministic per-index seeded init a fresh fit would give them
    (the reference's seeded_vector stream); new output rows start at zero
    as in the reference; the negative-sampling cum_table, subsample
    thresholds, and (for hs) the Huffman tree are rebuilt over the merged
    counts. Epoch seeds continue from ``model.trained_epochs`` so the new
    pass does not replay the original sampling stream. Mutates and returns
    ``model``."""
    counts = np.asarray(counts)
    v_new, v_old = len(counts), model.vocab_size
    if v_new < v_old:
        raise ValueError(
            f"merged vocab ({v_new}) smaller than trained vocab ({v_old})")
    if v_new > v_old:
        grown = init_syn0(v_new, model.vector_size, model.seed)
        model.syn0 = np.vstack([model.syn0, grown[v_old:]])
        model.syn1neg = np.vstack(
            [model.syn1neg, np.zeros((v_new - v_old, model.vector_size))])
        model.vocab_size = v_new
    model.cum_table = make_cum_table(counts, ns_exponent)
    model.sample_ints = make_sample_ints(counts, sample)
    if model.hs:
        # frequencies changed → the Huffman tree changes shape entirely;
        # inner-node vectors carry over by index, new nodes start at zero
        # (word2vec.py:817 create_binary_tree on the updated vocab)
        model.codes, model.points = build_huffman_tree(counts)
        syn1 = np.zeros((v_new, model.vector_size))
        syn1[:len(model.syn1)] = model.syn1[:v_new]
        model.syn1 = syn1

    epoch0 = getattr(model, "trained_epochs", 0)
    for cb in callbacks:
        cb.on_train_begin(model)
    for epoch in range(epochs):
        for cb in callbacks:
            cb.on_epoch_begin(model)
        a = alpha - (alpha - min_alpha) * epoch / max(1, epochs - 1) \
            if epochs > 1 else alpha
        rows = _epoch_partials(docs, model, epoch0 + epoch, a, num_shards)
        fold_epoch(model, rows)
        for cb in callbacks:
            cb.on_epoch_end(model)
    for cb in callbacks:
        cb.on_train_end(model)
    model.trained_epochs = epoch0 + epochs
    return model


def doc_vectors_dbow(docs: DataFrame, model: Word2VecModel,
                     epochs: int = 10, alpha: float = 0.025,
                     min_alpha: float = 0.0001) -> DataFrame:
    """PV-DBOW document vectors (doc2vec.py dm=0, dbow_words=0): each doc's
    vector is trained against the FROZEN word output matrix on its own
    words only — one perfectly parallel pass, the doc vector never leaves
    its row. → (doc_id, embedding)."""
    sc = docs.sparkSession.sparkContext
    bc = sc.broadcast((model.syn1neg, model.cum_table, model.sample_ints,
                       model.window, model.negative, model.seed,
                       model.vector_size))

    def gen(batches):
        import pandas as pd

        syn1, cum, samp, window, negative, seed, size = bc.value
        cum_last = int(cum[-1])
        out_id, out_vec = [], []
        for pdf in batches:
            for doc_id, ids in zip(pdf["doc_id"], pdf["ids"]):
                arr = np.asarray(ids, dtype=np.int64)
                rs = np.random.RandomState(
                    _mix(seed, 7, int(doc_id)) & 0xFFFFFFFF)
                dv = (rs.random_sample(size) - 0.5) / size
                next_random = _mix(seed, 8, int(doc_id))
                for epoch in range(epochs):
                    a = alpha - (alpha - min_alpha) * epoch \
                        / max(1, epochs - 1) if epochs > 1 else alpha
                    for wi in arr:
                        work = np.zeros(size)
                        for d in range(negative + 1):
                            if d == 0:
                                target, label = int(wi), 1.0
                            else:
                                r = (next_random >> 16) % cum_last
                                target = int(np.searchsorted(cum, r, "left"))
                                next_random = (next_random * _LCG_MUL + 11) \
                                    & _LCG_MOD
                                if target == wi:
                                    continue
                                label = 0.0
                            u = syn1[target]
                            f_dot = float(dv @ u)
                            if f_dot <= -MAX_EXP or f_dot >= MAX_EXP:
                                continue
                            g = (label - _sigmoid_table(f_dot)) * a
                            work += g * u
                        dv += work
                out_id.append(doc_id)
                out_vec.append(list(dv))
        yield pd.DataFrame({"doc_id": out_id, "embedding": out_vec})

    return docs.mapInPandas(gen, "doc_id long, embedding array<double>")


_LOG_TABLE = np.log(_EXP_TABLE)
MAX_SENTENCE_LEN = 10000


def _codelen(code) -> int:
    return 0 if code is None else len(code)


def _score_pairs(point: np.ndarray, code: np.ndarray, ctx: np.ndarray,
                 syn1: np.ndarray) -> float:
    """Σ log σ(sgn·⟨h, syn1[point_b]⟩) over code bits × context columns —
    score_pair_sg_hs / score_pair_cbow_hs (word2vec_inner.pyx:772-800,
    870-900): sgn = +1 for bit 0, −1 for bit 1; dots at or beyond ±MAX_EXP
    are SKIPPED (not clamped), survivors read the discretized LOG_TABLE."""
    f = syn1[point] @ ctx                      # (codelen, nctx) or (codelen,)
    f = f * (1.0 - 2.0 * code.astype(np.float64)).reshape(-1, *([1] *
                                                                (f.ndim - 1)))
    mask = (f > -MAX_EXP) & (f < MAX_EXP)
    # f within 1 ulp of MAX_EXP passes the mask but (f + MAX_EXP) rounds
    # up to 2·MAX_EXP exactly, indexing one past the table — clamp
    idx = np.minimum(((f[mask] + MAX_EXP) *
                      (EXP_TABLE_SIZE / MAX_EXP / 2)).astype(np.int64),
                     EXP_TABLE_SIZE - 1)
    return float(_LOG_TABLE[idx].sum())


def _score_ids_sg(ids: np.ndarray, syn0: np.ndarray, syn1: np.ndarray,
                  codes: list, points: list, window: int) -> float:
    work = 0.0
    n = len(ids)
    for i in range(n):
        code, point = codes[ids[i]], points[ids[i]]
        if code is None or len(code) == 0:
            continue
        lo, hi = max(0, i - window), min(n, i + window + 1)
        ctx = [ids[j] for j in range(lo, hi)
               if j != i and _codelen(codes[ids[j]]) > 0]
        if ctx:
            work += _score_pairs(point, code, syn0[ctx].T, syn1)
    return work


def _score_ids_cbow(ids: np.ndarray, syn0: np.ndarray, syn1: np.ndarray,
                    codes: list, points: list, window: int,
                    cbow_mean: int) -> float:
    work = 0.0
    n = len(ids)
    for i in range(n):
        code, point = codes[ids[i]], points[ids[i]]
        if code is None or len(code) == 0:
            continue
        lo, hi = max(0, i - window), min(n, i + window + 1)
        ctx = [ids[j] for j in range(lo, hi)
               if j != i and _codelen(codes[ids[j]]) > 0]
        neu1 = syn0[ctx].sum(axis=0) if ctx \
            else np.zeros(syn0.shape[1])
        if cbow_mean and ctx:
            neu1 = neu1 / len(ctx)
        work += _score_pairs(point, code, neu1, syn1)
    return work


def word2vec_score(docs: DataFrame, model: Word2VecModel) -> DataFrame:
    """(doc_id, score): per-sentence hs log-probability (Word2Vec.score,
    word2vec.py:1693-1820; kernels score_sentence_sg / score_sentence_cbow,
    word2vec_inner.pyx:693-900). Like the reference, hs-only — the model
    must carry the Huffman tree (``hs=1``).

    Distribution: the reference fans sentences over a thread pool sharing
    the in-RAM matrices; here ONE Arrow-batched mapInPandas pass scores
    every partition against the broadcast (syn0, syn1) — embarrassingly
    parallel, zero shuffle, corpus never leaves the executors. OOV words
    were already dropped by :func:`corpus_ids` (the reference compacts the
    sentence identically, pyx:745-765); sentences truncate at
    MAX_SENTENCE_LEN=10000 like the C kernel."""
    if not getattr(model, "hs", 0) or getattr(model, "syn1", None) is None:
        raise RuntimeError(
            "score is only implemented for the hierarchical softmax "
            "scheme; train with hs=1 (word2vec.py:1736-1740)")
    sc = docs.sparkSession.sparkContext
    bc = sc.broadcast((model.syn0, model.syn1, model.codes, model.points,
                       model.window, model.sg, model.cbow_mean))

    def gen(batches):
        import pandas as pd

        syn0, syn1, codes, points, window, sg, cm = bc.value
        for pdf in batches:
            scores = []
            for ids in pdf["ids"]:
                arr = np.asarray(ids, dtype=np.int64)[:MAX_SENTENCE_LEN]
                if sg:
                    s = _score_ids_sg(arr, syn0, syn1, codes, points,
                                      window)
                else:
                    s = _score_ids_cbow(arr, syn0, syn1, codes, points,
                                        window, cm)
                scores.append(s)
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "score": scores})

    return docs.select("doc_id", "ids").mapInPandas(
        gen, "doc_id long, score double")


def corpus_ids(postings_or_tokens: DataFrame, vocab: DataFrame,
               tokens_col: str = "tokens") -> DataFrame:
    """(doc_id, tokens) + vocab → (doc_id, ids) with unknown words dropped
    and token order preserved (the sentence-shortening semantics)."""
    from gensim_spark.operators.vocab import doc2idx

    idx = doc2idx(postings_or_tokens, vocab, tokens_col=tokens_col)
    return idx.select(
        "doc_id",
        F.filter(F.col("idx"), lambda x: x >= 0).alias("ids"))
