"""Topic-coherence pipeline: u_mass / c_uci / c_npmi / c_v / c_w2v.

Re-expresses ``gensim.models.CoherenceModel`` (coherencemodel.py:50-89 pipeline
table) and the ``gensim/topic_coherence/`` modules Spark-first:

* The corpus-scale work — boolean-document and boolean-sliding-window
  occurrence / co-occurrence counting over the *relevant* words (the union of
  every topic's top-N terms, ≤ K·topn ≈ a few hundred) — runs distributed.
  Boolean-document stats (probability_estimation.p_boolean_document,
  text_analysis.CorpusAccumulator:256-270) are a pure relational plan:
  filter postings to the relevant set, DISTINCT presence pairs, a hash-agg
  for occurrences and a presence self-join scoped to within-topic pairs for
  co-occurrences — all JVM-side, shuffle keyed on the tiny relevant set.
  Sliding-window stats (text_analysis.WordOccurrenceAccumulator:320-404)
  are an Arrow-batched ``mapInPandas``: each task accumulates a partial
  occurrence vector + pair counter over its documents (embarrassingly
  parallel, ≤ |relevant|² partial rows per task) and a single hash-agg
  merges the partials — the reference's ParallelWordOccurrenceAccumulator
  (text_analysis.py:406-530) does the same merge across processes.

* The confirmation measures (direct_confirmation_measure.py:19-210,
  indirect_confirmation_measure.py:118-343) and segmentations
  (segmentation.py:14-133) operate on the resulting |relevant|² matrix on
  the driver, exactly like the reference — the matrix is tiny by
  construction, never corpus-sized.

Sliding-window parity note: the reference slides the uniqueness bitmap
incrementally (`_slide_window`, text_analysis.py:367-376) — the token
leaving the window has its bit cleared even when it still occurs inside
the window. We replicate that behavior bit-for-bit (see
``_accumulate_doc_windows``) rather than computing exact window sets, so
counts match gensim's, not an idealized definition.

At 100 TB the only corpus-sized passes are the presence filter/DISTINCT
(boolean-document) or the one mapInPandas sweep (sliding window); both
reduce to O(|relevant|²) rows before any collect.
"""
from __future__ import annotations

import itertools
import math
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, functions as F

# direct_confirmation_measure.py:16 — value from the WSDM'15 coherence paper
EPSILON = 1e-12

# coherencemodel.py:83-89
SLIDING_WINDOW_SIZES = {"c_v": 110, "c_w2v": 5, "c_uci": 10, "c_npmi": 10,
                        "u_mass": None}
BOOLEAN_DOCUMENT_BASED = {"u_mass"}


# --- segmentations (segmentation.py:14-133) -----------------------------------

def s_one_pre(topics):
    """[(w_i, w_j) for i > j] per topic (segmentation.py:14-53)."""
    out = []
    for top in topics:
        seg = []
        for i, w_prime in enumerate(top[1:]):
            for w_star in top[:i + 1]:
                seg.append((w_prime, w_star))
        out.append(seg)
    return out


def s_one_one(topics):
    """[(w_i, w_j) for i != j] per topic (segmentation.py:56-97)."""
    out = []
    for top in topics:
        seg = [(wp, ws) for i, wp in enumerate(top)
               for j, ws in enumerate(top) if i != j]
        out.append(seg)
    return out


def s_one_set(topics):
    """[(w_i, W)] per topic (segmentation.py:100-133)."""
    return [[(w, list(top)) for w in top] for top in topics]


# --- distributed probability estimation ---------------------------------------

@dataclass
class CoherenceStats:
    """Occurrence / co-occurrence counts over the relevant-word set.

    Mirrors the lookup surface of text_analysis accumulators: ``count(w)``,
    ``co(w1, w2)``, ``num_docs`` (documents for boolean-document, windows for
    sliding-window estimation).
    """

    id2contig: dict          # relevant word id -> contiguous index
    occurrences: np.ndarray  # [V] window/doc presence counts
    co: np.ndarray           # [V, V] symmetric, diag == occurrences
    num_docs: int

    def count(self, word_id) -> int:
        i = self.id2contig.get(word_id)
        if i is None:
            raise KeyError(word_id)
        return int(self.occurrences[i])

    def co_count(self, w1, w2) -> int:
        i, j = self.id2contig.get(w1), self.id2contig.get(w2)
        if i is None or j is None:
            raise KeyError((w1, w2))
        return int(self.co[i, j])


def boolean_doc_stats(postings: DataFrame, relevant_ids, num_docs: int,
                      id_col: str = "term_id",
                      doc_col: str = "doc_id") -> CoherenceStats:
    """p_boolean_document (probability_estimation.py:19-75) as a relational plan.

    ``num_docs`` must be the TOTAL corpus document count — the reference's
    CorpusAccumulator increments per document whether or not any relevant
    word occurs (text_analysis.py:266-270).
    """
    relevant_ids = [int(w) for w in relevant_ids]
    id2contig = {w: i for i, w in enumerate(dict.fromkeys(relevant_ids))}
    vsize = len(id2contig)

    pres = (postings.filter(F.col(id_col).isin(relevant_ids))
            .select(F.col(doc_col).alias("d"), F.col(id_col).alias("w"))
            .distinct())
    occ_rows = pres.groupBy("w").count().collect()
    a, b = pres.alias("a"), pres.alias("b")
    co_rows = (a.join(b, (F.col("a.d") == F.col("b.d"))
                      & (F.col("a.w") < F.col("b.w")))
               .groupBy(F.col("a.w").alias("wi"), F.col("b.w").alias("wj"))
               .count().collect())

    occ = np.zeros(vsize, dtype=np.int64)
    for r in occ_rows:
        occ[id2contig[r["w"]]] = r["count"]
    co = np.zeros((vsize, vsize), dtype=np.int64)
    for r in co_rows:
        i, j = id2contig[r["wi"]], id2contig[r["wj"]]
        co[i, j] += r["count"]
    co = co + co.T
    np.fill_diagonal(co, occ)
    return CoherenceStats(id2contig, occ, co, int(num_docs))


def _accumulate_doc_windows(ids: np.ndarray, window_size: int, vsize: int,
                            occ: np.ndarray, counter: dict) -> int:
    """Replicates WordOccurrenceAccumulator over one document's windows
    (text_analysis.py:334-376 + utils.iter_windows ignore_below_size=False),
    including the incremental edge-clearing quirk. Returns #windows."""
    n = len(ids)
    if n == 0:
        return 1  # empty virtual document still counts (text_analysis.py:295-298)
    uniq = np.zeros(vsize + 1, dtype=bool)
    nwin = max(1, n - window_size + 1) if n >= window_size else 1
    for k in range(nwin):
        win = ids[k:k + window_size] if n >= window_size else ids
        if k == 0:
            uniq[:] = False
            uniq[np.unique(win)] = True
        else:
            uniq[ids[k - 1]] = False   # token at edge of the previous window
            uniq[win[-1]] = True
        mask = uniq[:-1]
        present = np.nonzero(mask)[0]
        if present.size:
            occ[present] += 1
            for pair in itertools.combinations(present.tolist(), 2):
                counter[pair] = counter.get(pair, 0) + 1
    return nwin


def sliding_window_stats(texts: DataFrame, relevant_tokens,
                         window_size: int,
                         tokens_col: str = "tokens") -> CoherenceStats:
    """p_boolean_sliding_window (probability_estimation.py:78-133) distributed.

    One Arrow-batched sweep over the corpus; each task reduces its documents
    to a ≤ |relevant|²-row partial (occurrence vector, pair counter, window
    count) and a single hash-agg merges them — the distributed analogue of
    ParallelWordOccurrenceAccumulator's process merge."""
    relevant = list(dict.fromkeys(relevant_tokens))
    mapping = {tok: i for i, tok in enumerate(relevant)}
    vsize = len(mapping)
    spark = texts.sparkSession
    bc = spark.sparkContext.broadcast((mapping, vsize, int(window_size)))

    import pandas as pd

    def part(batches):
        mp, V, ws = bc.value
        occ = np.zeros(V, dtype=np.int64)
        counter: dict = {}
        nwin = 0
        for pdf in batches:
            for toks in pdf[tokens_col]:
                seq = list(toks) if toks is not None else []
                ids = np.fromiter((mp.get(w, V) for w in seq),
                                  dtype=np.int64, count=len(seq))
                nwin += _accumulate_doc_windows(ids, ws, V, occ, counter)
        rows = [(-1, -1, int(nwin))]
        rows += [(int(i), int(i), int(c)) for i, c in enumerate(occ) if c]
        rows += [(int(i), int(j), int(c)) for (i, j), c in counter.items()]
        yield pd.DataFrame(rows, columns=["i", "j", "cnt"])

    parts = texts.select(tokens_col).mapInPandas(
        part, schema="i int, j int, cnt long")
    merged = parts.groupBy("i", "j").agg(F.sum("cnt").alias("cnt")).collect()

    occ = np.zeros(vsize, dtype=np.int64)
    co = np.zeros((vsize, vsize), dtype=np.int64)
    num_windows = 0
    for r in merged:
        if r["i"] == -1:
            num_windows = r["cnt"]
        elif r["i"] == r["j"]:
            occ[r["i"]] = r["cnt"]
        else:
            co[r["i"], r["j"]] += r["cnt"]
    # _symmetrize (text_analysis.py:378-390): diag := occurrences
    co = co + co.T
    np.fill_diagonal(co, occ)
    id2contig = dict(mapping)  # keyed by token string for window-based measures
    return CoherenceStats(id2contig, occ, co, int(num_windows))


# --- direct confirmation (direct_confirmation_measure.py) ---------------------

def log_conditional_probability(segmented_topics, stats: CoherenceStats):
    """m_lc = log((P(W',W*) + eps) / P(W*)) per segment, mean per topic
    (direct_confirmation_measure.py:19-86; KeyError/zero-count → 0.0)."""
    out = []
    d = float(stats.num_docs)
    for seg in segmented_topics:
        sims = []
        for wp, ws in seg:
            try:
                wsc = stats.count(ws)
                coc = stats.co_count(wp, ws)
                if wsc == 0:
                    m = 0.0
                else:
                    m = math.log((coc / d + EPSILON) / (wsc / d))
            except KeyError:
                m = 0.0
            sims.append(m)
        out.append(float(np.mean(sims)) if sims else float("nan"))
    return out


def log_ratio_measure(segmented_topics, stats: CoherenceStats,
                      normalize: bool = False):
    """PMI (and NPMI when ``normalize``) per segment, mean per topic
    (direct_confirmation_measure.py:128-210)."""
    out = []
    d = float(stats.num_docs)
    for seg in segmented_topics:
        sims = []
        for wp, ws in seg:
            wpc, wsc = stats.count(wp), stats.count(ws)
            coc = stats.co_count(wp, ws)
            # numpy-scalar division: the reference's sliding-window counts
            # are numpy uint32 (text_analysis.py:325,392), so a zero-count
            # word yields ±inf with a RuntimeWarning instead of raising
            # ZeroDivisionError (direct_confirmation_measure.py:205-207)
            with np.errstate(divide="ignore"):
                pmi = float(np.log(
                    np.float64(coc / d + EPSILON)
                    / (np.float64(wpc / d) * np.float64(wsc / d))))
                if normalize:
                    m = pmi / (-math.log(coc / d + EPSILON))
                else:
                    m = pmi
            sims.append(m)
        out.append(float(np.mean(sims)) if sims else float("nan"))
    return out


# --- indirect confirmation: c_v cosine (indirect_confirmation_measure.py) -----

def _pair_npmi(pair, stats: CoherenceStats) -> float:
    return log_ratio_measure([[pair]], stats, normalize=True)[0]


def cosine_similarity(segmented_topics, stats: CoherenceStats, topics,
                      gamma: float = 1.0):
    """c_v confirmation: cosine over NPMI context vectors
    (indirect_confirmation_measure.py:118-305, measure='nlr')."""
    mapping = {}
    for t in topics:
        for w in t:
            mapping.setdefault(w, len(mapping))
    sim_cache: dict = {}

    def context_vector(segment_word_ids, topic_word_ids):
        if not hasattr(segment_word_ids, "__iter__") or isinstance(
                segment_word_ids, (str, bytes)):
            segment_word_ids = (segment_word_ids,)
        v = np.zeros(len(mapping))
        for w_j in topic_word_ids:
            idx = mapping[w_j]
            for w_i in segment_word_ids:
                pair = tuple(sorted((w_i, w_j)))
                if pair not in sim_cache:
                    sim_cache[pair] = _pair_npmi(pair, stats)
                v[idx] += sim_cache[pair] ** gamma
        return v

    out = []
    for topic_words, seg in zip(topics, segmented_topics):
        tw = list(topic_words)
        sims = []
        for wp, ws in seg:
            cv1, cv2 = context_vector(wp, tw), context_vector(ws, tw)
            denom = np.linalg.norm(cv1) * np.linalg.norm(cv2)
            sims.append(float(cv1 @ cv2 / denom) if denom else 0.0)
        out.append(float(np.mean(sims)) if sims else float("nan"))
    return out


def word2vec_similarity(segmented_topics, vectors: dict):
    """c_w2v confirmation (indirect_confirmation_measure.py:44-116):
    KeyedVectors.n_similarity = cosine of the two word-sets' mean vectors;
    OOV words dropped, all-OOV segments skipped."""
    out = []
    for seg in segmented_topics:
        sims = []
        for wp, ws in seg:
            if not hasattr(wp, "__iter__") or isinstance(wp, (str, bytes)):
                wp = [wp]
            if not hasattr(ws, "__iter__") or isinstance(ws, (str, bytes)):
                ws = [ws]
            v1 = [vectors[w] for w in wp if w in vectors]
            v2 = [vectors[w] for w in ws if w in vectors]
            if not v1 or not v2:
                continue
            m1, m2 = np.mean(v1, axis=0), np.mean(v2, axis=0)
            n1, n2 = np.linalg.norm(m1), np.linalg.norm(m2)
            if n1 == 0 or n2 == 0:
                continue
            sims.append(float(m1 @ m2 / (n1 * n2)))
        out.append(float(np.mean(sims)) if sims else float("nan"))
    return out


# --- pipeline front door (coherencemodel.py:50-89) ----------------------------

def coherence_per_topic(topics, measure: str, *,
                        postings: DataFrame | None = None,
                        texts: DataFrame | None = None,
                        num_docs: int | None = None,
                        window_size: int | None = None,
                        keyed_vectors: dict | None = None,
                        tokens_col: str = "tokens"):
    """Per-topic coherence for one of u_mass / c_uci / c_npmi / c_v / c_w2v.

    ``topics``: list of top-N word lists — term_ids for u_mass (matched
    against ``postings``), token strings for the window-based measures
    (matched against ``texts[tokens_col]``).
    """
    if measure == "u_mass":
        if postings is None or num_docs is None:
            raise ValueError("u_mass needs postings= and num_docs=")
        relevant = [w for t in topics for w in t]
        stats = boolean_doc_stats(postings, relevant, num_docs)
        return log_conditional_probability(s_one_pre(topics), stats)

    if measure == "c_w2v":
        if keyed_vectors is None:
            raise ValueError("c_w2v needs keyed_vectors=")
        return word2vec_similarity(s_one_set(topics), keyed_vectors)

    if measure not in ("c_uci", "c_npmi", "c_v"):
        raise ValueError(f"unknown coherence measure {measure!r}")
    if texts is None:
        raise ValueError(f"{measure} needs texts=")
    ws = window_size if window_size is not None \
        else SLIDING_WINDOW_SIZES[measure]
    relevant = [w for t in topics for w in t]
    stats = sliding_window_stats(texts, relevant, ws, tokens_col=tokens_col)
    if measure == "c_uci":
        return log_ratio_measure(s_one_one(topics), stats, normalize=False)
    if measure == "c_npmi":
        return log_ratio_measure(s_one_one(topics), stats, normalize=True)
    return cosine_similarity(s_one_set(topics), stats, topics)


def get_coherence(topics, measure: str, **kwargs) -> float:
    """Arithmetic-mean aggregation (aggregation.py:15-39)."""
    return float(np.mean(coherence_per_topic(topics, measure, **kwargs)))
