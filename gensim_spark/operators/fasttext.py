"""FastText subword embeddings — skip-gram negative sampling over char
n-gram buckets.

Reference: ``gensim.models.fasttext`` — the SGNS kernel
``fasttext_fast_sentence_sg_neg`` (fasttext_inner.pyx:75-146): the input
representation is (vocab vector + Σ n-gram bucket vectors) / n_subwords
(the reference divides by the subword count only — quirk kept), targets
drawn exactly as word2vec, the accumulated error added UNSCALED to the
vocab row and every subword row; a 512-slot sigmoid table (word2vec's is
1000, fasttext_inner.pyx:722-733); n-grams of the '<word>'-wrapped UTF-8
bytes with multibyte-boundary handling (compute_ngrams_bytes,
fasttext_inner.pyx:677-719) hashed by Facebook's signed-char FNV-1a
(ft_hash_bytes, fasttext_inner.pyx:619-641) mod ``bucket``; the final
word vector is (vocab + Σ ngrams)/(n+1) (adjust_vectors,
fasttext.py:1191-1208) and OOV vectors are Σ ngrams / n
(get_vector, fasttext.py:1085-1130).

Spark shape: identical shard-synchronous protocol to operators/word2vec.py
— per-epoch broadcast of (syn0_vocab V×D, syn0_ngrams bucket×D, syn1neg
V×D), per-shard sequential SGD on local copies, count-weighted delta
averaging over packed array rows (only touched rows ship). The bucket
matrix is the dominant broadcast (the reference's default 2M×100 float32
≈ 800 MB is its own resident cost); size ``bucket`` to the corpus as the
reference advises. Determinism deviations are word2vec.py's, verbatim.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gensim_spark.operators.word2vec import (
    _LCG_MOD,
    _LCG_MUL,
    _check_objective,
    _hs_stage,
    _mix,
    build_huffman_tree,
    init_syn0,
    make_cum_table,
    make_sample_ints,
)

FT_MAX_EXP = 6.0
FT_EXP_TABLE_SIZE = 512  # fasttext_inner.pyx:726 — 512, not word2vec's 1000
_FT_EXP_TABLE = 1.0 / (1.0 + np.exp(-(np.arange(FT_EXP_TABLE_SIZE) /
                                      FT_EXP_TABLE_SIZE * 2 - 1) * FT_MAX_EXP))


def _ft_sigmoid(f_dot: float) -> float:
    return _FT_EXP_TABLE[int((f_dot + FT_MAX_EXP)
                             * (FT_EXP_TABLE_SIZE / FT_MAX_EXP / 2))]


def ft_hash_bytes(bytez: bytes) -> int:
    """Facebook's FNV-1a with the signed-char XOR quirk
    (fasttext_inner.pyx:619-641)."""
    h = 2166136261
    for b in bytez:
        signed = b - 256 if b >= 128 else b
        h = (h ^ (signed & 0xFFFFFFFF)) & 0xFFFFFFFF
        h = (h * 16777619) & 0xFFFFFFFF
    return h


def compute_ngrams_bytes(word: str, min_n: int, max_n: int) -> list:
    """Char n-grams of '<word>' as UTF-8 byte strings, multibyte-aware
    (fasttext_inner.pyx:677-719): n counts characters, never splits a
    UTF-8 sequence, and the full wrapped word itself is excluded only for
    n == 1 edge slices."""
    bytez = (f"<{word}>").encode("utf-8")
    num_bytes = len(bytez)
    ngrams = []
    for i in range(num_bytes):
        if bytez[i] & 0xC0 == 0x80:
            continue
        j, n = i, 1
        while j < num_bytes and n <= max_n:
            j += 1
            while j < num_bytes and (bytez[j] & 0xC0) == 0x80:
                j += 1
            if n >= min_n and not (n == 1 and (i == 0 or j == num_bytes)):
                ngrams.append(bytes(bytez[i:j]))
            n += 1
    return ngrams


def ft_ngram_hashes(word: str, min_n: int, max_n: int, bucket: int) -> list:
    """Bucket ids for a word's n-grams (fasttext.py:1326-1352)."""
    return [ft_hash_bytes(ng) % bucket
            for ng in compute_ngrams_bytes(word, min_n, max_n)]


class FastTextModel:
    def __init__(self, vocab_size: int, vector_size: int, bucket: int,
                 syn0_vocab: np.ndarray, syn0_ngrams: np.ndarray,
                 syn1neg: np.ndarray, cum_table: np.ndarray,
                 sample_ints: np.ndarray, subwords: list,
                 window: int, negative: int, min_n: int, max_n: int,
                 seed: int, hs: int = 0, syn1: np.ndarray | None = None,
                 codes: list | None = None, points: list | None = None):
        self.vocab_size = vocab_size
        self.vector_size = vector_size
        self.bucket = bucket
        self.syn0_vocab = syn0_vocab
        self.syn0_ngrams = syn0_ngrams
        self.syn1neg = syn1neg
        self.cum_table = cum_table
        self.sample_ints = sample_ints
        self.subwords = subwords        # per vocab id: list of bucket ids
        self.window = window
        self.negative = negative
        self.min_n = min_n
        self.max_n = max_n
        self.seed = seed
        self.hs = hs
        self.syn1 = syn1          # hierarchical-softmax inner-node matrix
        self.codes = codes        # per vocab id: Huffman root-path bits
        self.points = points      # per vocab id: inner-node ids (offset −V)

    def adjusted_vectors(self) -> np.ndarray:
        """(vocab + Σ ngrams)/(n+1) per in-vocab word
        (adjust_vectors, fasttext.py:1191-1208)."""
        out = self.syn0_vocab.copy()
        for w, subs in enumerate(self.subwords):
            for nh in subs:
                out[w] += self.syn0_ngrams[nh]
            out[w] /= len(subs) + 1
        return out

    def oov_vector(self, word: str) -> np.ndarray:
        """Σ ngrams / n for any string (get_vector OOV branch,
        fasttext.py:1110-1130); origin vector when no ngrams exist."""
        hashes = ft_ngram_hashes(word, self.min_n, self.max_n, self.bucket)
        vec = np.zeros(self.vector_size)
        if not hashes:
            return vec
        for nh in hashes:
            vec += self.syn0_ngrams[nh]
        return vec / len(hashes)

    def vectors_df(self, spark, vocab: DataFrame | None = None) -> DataFrame:
        adj = self.adjusted_vectors()
        rows = [(w, [float(x) for x in adj[w]])
                for w in range(self.vocab_size)]
        df = spark.createDataFrame(rows,
                                   "term_id long, embedding array<double>")
        if vocab is not None:
            df = df.join(F.broadcast(vocab.select("term_id", "token")),
                         "term_id")
        return df


def train_doc_ft_sg(ids: np.ndarray, subwords: list, syn0v: np.ndarray,
                    syn0n: np.ndarray, syn1neg: np.ndarray,
                    cum_table: np.ndarray, sample_ints: np.ndarray,
                    window: int, negative: int, alpha: float, doc_seed: int,
                    counts_v: np.ndarray, counts_n: np.ndarray,
                    counts_o: np.ndarray,
                    shrink_windows: int = 1, hs: int = 0,
                    syn1hs: np.ndarray | None = None,
                    codes: list | None = None, points: list | None = None,
                    counts_h: np.ndarray | None = None) -> None:
    """One document's FastText skip-gram pass — the exact pyx kernel
    (fasttext_inner.pyx:75-146) in numpy float64.

    With ``hs``, the hierarchical-softmax stage
    (fasttext_fast_sentence_sg_hs, pyx:148-218) runs first per pair —
    sigmoid along the TARGET word's Huffman path against ``syn1hs``, the
    projection being the center word's vocab row + its subword rows scaled
    by 1/len(subwords) (the same /len quirk as the neg stage), saturated
    dots SKIPPED (the neg stage's sg variant skips too) — and the neg
    stage recomposes the projection from the hs-updated rows, matching the
    pyx call order (fasttext_inner.pyx:563-567)."""
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
               else np.zeros(n, dtype=np.int64))

    size = syn0v.shape[1]
    cum_last = int(cum_table[-1])
    for i in range(n):
        wi = kept[i]                      # input side: word i + its subwords
        subs = subwords[wi]
        j0 = max(0, i - window + reduced[i])
        k0 = min(n, i + window + 1 - reduced[i])
        def compose():
            neu1 = syn0v[wi].copy()
            if subs:
                for nh in subs:
                    neu1 += syn0n[nh]
                neu1 /= len(subs)         # reference quirk: /len, not /(len+1)
            return neu1

        for j in range(j0, k0):
            if j == i:
                continue
            wj = kept[j]                  # output side target
            if hs:
                neu1 = compose()
                workh = _hs_stage(neu1, codes[wj], points[wj], syn1hs,
                                  alpha, counts_h, sigmoid=_ft_sigmoid,
                                  max_exp=FT_MAX_EXP)
                syn0v[wi] += workh
                counts_v[wi] += 1
                for nh in subs:
                    syn0n[nh] += workh
                    counts_n[nh] += 1
            if not negative:
                continue
            neu1 = compose()              # sees the hs-updated input rows
            work = np.zeros(size)
            for d in range(negative + 1):
                if d == 0:
                    target, label = wj, 1.0
                else:
                    r = (next_random >> 16) % cum_last
                    target = int(np.searchsorted(cum_table, r, side="left"))
                    next_random = (next_random * _LCG_MUL + 11) & _LCG_MOD
                    if target == wj:
                        continue
                    label = 0.0
                u = syn1neg[target]
                f_dot = float(neu1 @ u)
                if f_dot <= -FT_MAX_EXP or f_dot >= FT_MAX_EXP:
                    continue
                g = (label - _ft_sigmoid(f_dot)) * alpha
                work += g * u
                syn1neg[target] += g * neu1
                counts_o[target] += 1
            syn0v[wi] += work
            counts_v[wi] += 1
            for nh in subs:
                syn0n[nh] += work
                counts_n[nh] += 1


def train_doc_ft_cbow(ids: np.ndarray, subwords: list, syn0v: np.ndarray,
                      syn0n: np.ndarray, syn1neg: np.ndarray,
                      cum_table: np.ndarray, sample_ints: np.ndarray,
                      window: int, negative: int, alpha: float,
                      doc_seed: int, counts_v: np.ndarray,
                      counts_n: np.ndarray, counts_o: np.ndarray,
                      cbow_mean: int = 1,
                      shrink_windows: int = 1, hs: int = 0,
                      syn1hs: np.ndarray | None = None,
                      codes: list | None = None, points: list | None = None,
                      counts_h: np.ndarray | None = None) -> None:
    """One document's FastText CBOW pass — the exact pyx kernel
    (fasttext_inner.pyx fasttext_fast_sentence_cbow_neg) in numpy float64.

    CBOW quirks vs the SG kernel: the context sum counts BOTH each context
    word and every one of its subwords toward ``inv_count``; saturated
    dot products CLAMP the sigmoid to 0/1 (SG skips the sample); with
    ``cbow_mean=0`` the accumulated error is scaled by ``inv_count``
    before it is applied to every context row.

    With ``hs``, the hierarchical-softmax stage
    (fasttext_fast_sentence_cbow_hs, pyx:309-374) runs first per position —
    sigmoid along the CENTER word's Huffman path against ``syn1hs``;
    saturated dots are SKIPPED there (only the neg stage clamps), the
    ``inv_count`` error scaling applies the same way, and the neg stage
    recomposes its projection from the hs-updated context rows (pyx main
    loop, fasttext_inner.pyx:554-560)."""
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
               else np.zeros(n, dtype=np.int64))

    size = syn0v.shape[1]
    cum_last = int(cum_table[-1])
    for i in range(n):
        wi = kept[i]                      # output side: predicted word
        j0 = max(0, i - window + reduced[i])
        k0 = min(n, i + window + 1 - reduced[i])

        def compose():
            neu1 = np.zeros(size)
            count = 0.0
            for m in range(j0, k0):
                if m == i:
                    continue
                wm = kept[m]
                count += 1.0
                neu1 += syn0v[wm]
                for nh in subwords[wm]:
                    count += 1.0
                    neu1 += syn0n[nh]
            inv_count = 1.0 / count if count > 0.5 else 1.0
            if cbow_mean:
                neu1 *= inv_count
            return neu1, inv_count

        def apply_work(work):
            for m in range(j0, k0):
                if m == i:
                    continue
                wm = kept[m]
                syn0v[wm] += work
                counts_v[wm] += 1
                for nh in subwords[wm]:
                    syn0n[nh] += work
                    counts_n[nh] += 1

        if hs:
            neu1, inv_count = compose()
            work = _hs_stage(neu1, codes[wi], points[wi], syn1hs,
                             alpha, counts_h, sigmoid=_ft_sigmoid,
                             max_exp=FT_MAX_EXP)
            if not cbow_mean:
                work *= inv_count
            apply_work(work)
        if not negative:
            continue
        neu1, inv_count = compose()       # sees the hs-updated context rows
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
            if f_dot <= -FT_MAX_EXP:
                f = 0.0
            elif f_dot >= FT_MAX_EXP:
                f = 1.0
            else:
                f = _ft_sigmoid(f_dot)
            g = (label - f) * alpha
            work += g * u
            syn1neg[target] += g * neu1
            counts_o[target] += 1
        if not cbow_mean:
            work *= inv_count
        apply_work(work)


def fasttext_fit(docs: DataFrame, vocab_tokens: list, counts: np.ndarray,
                 vector_size: int = 100, window: int = 5, negative: int = 5,
                 alpha: float = 0.025, min_alpha: float = 0.0001,
                 epochs: int = 5, sample: float = 1e-3, bucket: int = 100000,
                 min_n: int = 3, max_n: int = 6, num_shards: int = 64,
                 seed: int = 1, sg: int = 1, cbow_mean: int = 1,
                 shrink_windows: bool = True, hs: int = 0) -> FastTextModel:
    """Fit FastText SGNS (``sg=1``) or CBOW (``sg=0``, the reference's
    constructor default, fasttext.py:312) over (doc_id, ids) rows.
    ``vocab_tokens`` is the id-ordered token list (for n-gram computation);
    ``counts`` the matching frequency vector. ``hs=1`` adds the
    hierarchical-softmax objective (Huffman tree over ``counts``); like
    the reference, hs and negative sampling compose when both are set."""
    _check_objective(hs, negative)
    vocab_size = len(vocab_tokens)
    subwords = [ft_ngram_hashes(tok, min_n, max_n, bucket)
                for tok in vocab_tokens]
    codes = points = syn1 = None
    if hs:
        codes, points = build_huffman_tree(np.asarray(counts))
        syn1 = np.zeros((vocab_size, vector_size))
    model = FastTextModel(
        vocab_size, vector_size, bucket,
        init_syn0(vocab_size, vector_size, seed),
        init_syn0(bucket, vector_size, _mix(seed, 77)),
        np.zeros((vocab_size, vector_size)),
        make_cum_table(np.asarray(counts)),
        make_sample_ints(np.asarray(counts), sample),
        subwords, window, negative, min_n, max_n, seed,
        hs=hs, syn1=syn1, codes=codes, points=points)

    for epoch in range(epochs):
        a = alpha - (alpha - min_alpha) * epoch / max(1, epochs - 1) \
            if epochs > 1 else alpha
        _ft_epoch(docs, model, epoch, a, num_shards, sg, cbow_mean,
                  1 if shrink_windows else 0)
    model.trained_epochs = epochs
    model.sg, model.cbow_mean = sg, cbow_mean
    model.shrink_windows = 1 if shrink_windows else 0
    return model


def fasttext_update(docs: DataFrame, model: FastTextModel,
                    vocab_tokens: list, counts: np.ndarray,
                    alpha: float = 0.025, min_alpha: float = 0.0001,
                    epochs: int = 5, sample: float = 1e-3,
                    num_shards: int = 64) -> FastTextModel:
    """Continued training — FastText ``build_vocab(update=True)`` +
    ``train()`` (fasttext.py:395-470 update path). ``vocab_tokens`` /
    ``counts`` cover the MERGED vocabulary (old ids preserved, new ids
    appended — vocab.merge_with semantics); ``docs`` carries the new
    corpus as (doc_id, ids) under those ids. New vocab rows get the same
    per-index seeded init a fresh fit would give them; their subword
    hash lists are computed with the model's n-gram params; the bucket
    matrix carries over untouched (shared subwords ARE the transfer
    mechanism); output rows start at zero; sampling tables rebuild over
    the merged counts; epoch seeds continue from ``trained_epochs``.
    Mutates and returns ``model``."""
    counts = np.asarray(counts)
    v_new, v_old = len(counts), model.vocab_size
    if v_new < v_old:
        raise ValueError(
            f"merged vocab ({v_new}) smaller than trained vocab ({v_old})")
    if v_new > v_old:
        grown = init_syn0(v_new, model.vector_size, model.seed)
        model.syn0_vocab = np.vstack([model.syn0_vocab, grown[v_old:]])
        model.syn1neg = np.vstack(
            [model.syn1neg, np.zeros((v_new - v_old, model.vector_size))])
        model.subwords = list(model.subwords) + [
            ft_ngram_hashes(tok, model.min_n, model.max_n, model.bucket)
            for tok in vocab_tokens[v_old:]]
        model.vocab_size = v_new
        if getattr(model, "hs", 0):
            model.syn1 = np.vstack(
                [model.syn1,
                 np.zeros((v_new - v_old, model.vector_size))])
    if getattr(model, "hs", 0):
        # the Huffman tree is a function of the counts — rebuilt over the
        # merged vocabulary exactly like word2vec_update
        model.codes, model.points = build_huffman_tree(counts)
    model.cum_table = make_cum_table(counts)
    model.sample_ints = make_sample_ints(counts, sample)
    epoch0 = getattr(model, "trained_epochs", 0)
    sg = getattr(model, "sg", 1)
    cbow_mean = getattr(model, "cbow_mean", 1)
    for epoch in range(epochs):
        a = alpha - (alpha - min_alpha) * epoch / max(1, epochs - 1) \
            if epochs > 1 else alpha
        _ft_epoch(docs, model, epoch0 + epoch, a, num_shards, sg,
                  cbow_mean, getattr(model, "shrink_windows", 1))
    model.trained_epochs = epoch0 + epochs
    return model


def _ft_epoch(docs: DataFrame, model: FastTextModel, epoch: int, a: float,
              num_shards: int, sg: int, cbow_mean: int,
              shrink_windows: int = 1) -> None:
    """One shard-synchronous epoch: broadcast the three matrices, run the
    per-shard sequential kernels, fold count-weighted deltas back."""
    sc = docs.sparkSession.sparkContext
    window, negative, seed = model.window, model.negative, model.seed
    hs = getattr(model, "hs", 0)
    bc = sc.broadcast((model.syn0_vocab, model.syn0_ngrams,
                       model.syn1neg, model.cum_table,
                       model.sample_ints, model.subwords,
                       window, negative, seed, sg, cbow_mean,
                       shrink_windows,
                       hs, getattr(model, "syn1", None),
                       getattr(model, "codes", None),
                       getattr(model, "points", None)))

    def make_train_shard(epoch, a, bc):
        def train_shard(key, pdf):
            import pandas as pd

            (s0v, s0n, s1, cum, samp, subs, win, neg, sd, sg_,
             cm, sw, hs_, s1h, codes_, points_) = bc.value
            v0, n0, o0 = s0v.copy(), s0n.copy(), s1.copy()
            h0 = s1h.copy() if hs_ else None
            cv = np.zeros(v0.shape[0], dtype=np.int64)
            cn = np.zeros(n0.shape[0], dtype=np.int64)
            co = np.zeros(o0.shape[0], dtype=np.int64)
            ch = np.zeros(v0.shape[0], dtype=np.int64) if hs_ else None
            hs_kw = dict(hs=hs_, syn1hs=h0, codes=codes_, points=points_,
                         counts_h=ch) if hs_ else {}
            pdf = pdf.sort_values("doc_id")
            for doc_id, ids in zip(pdf["doc_id"], pdf["ids"]):
                if sg_:
                    train_doc_ft_sg(
                        np.asarray(ids, dtype=np.int64), subs,
                        v0, n0, o0, cum, samp, win, neg, a,
                        _mix(sd, epoch, int(doc_id)), cv, cn, co,
                        shrink_windows=sw, **hs_kw)
                else:
                    train_doc_ft_cbow(
                        np.asarray(ids, dtype=np.int64), subs,
                        v0, n0, o0, cum, samp, win, neg, a,
                        _mix(sd, epoch, int(doc_id)), cv, cn, co,
                        cbow_mean=cm, shrink_windows=sw, **hs_kw)
            triples = [(s0v, v0, cv), (s0n, n0, cn), (s1, o0, co)]
            if hs_:
                triples.append((s1h, h0, ch))
            out = []
            for m, (mat0, mat, cnts) in enumerate(triples):
                for w in np.nonzero(cnts)[0]:
                    out.append((m, int(w), int(cnts[w]),
                                list(mat[w] - mat0[w])))
            return pd.DataFrame(out,
                                columns=["m", "w", "cnt", "delta"])
        return train_shard

    rows = (docs.withColumn(
        "shard", F.pmod(F.col("doc_id"), F.lit(num_shards)))
        .groupBy("shard").applyInPandas(
            make_train_shard(epoch, a, bc),
            "m int, w long, cnt long, delta array<double>").collect())
    bc.destroy()  # per-epoch broadcast of the matrices — don't accumulate

    mats = {0: model.syn0_vocab, 1: model.syn0_ngrams, 2: model.syn1neg}
    if hs:
        mats[3] = model.syn1
    num: dict = {m: {} for m in mats}
    den: dict = {m: {} for m in mats}
    for r in rows:
        m, w, cnt = r["m"], r["w"], r["cnt"]
        d = np.asarray(r["delta"]) * cnt
        if w in num[m]:
            num[m][w] += d
            den[m][w] += cnt
        else:
            num[m][w] = d
            den[m][w] = cnt
    for m, mat in mats.items():
        for w, d in num[m].items():
            mat[w] += d / den[m][w]
