"""KeyedVectors query surface over a (key, vector) DataFrame.

Reference: ``gensim.models.KeyedVectors`` — most_similar
(keyedvectors.py:778-860: weighted mean of pre-normalized input vectors,
post-normalized, cosine against every vector, inputs excluded),
get_mean_vector (keyedvectors.py:455-524), n_similarity
(keyedvectors.py:1238-1262: cosine of the two sets' mean vectors),
similarity / distance / distances / rank.

Spark shape: the inputs (a handful of keys) are the only thing collected;
the scan side stays relational — one pass computing
``dot(v, mean) / ‖v‖`` with JVM array expressions and a TakeOrdered top-k.
Ties are broken (−sim, key) for cross-engine determinism (the reference's
argsort leaves ties unspecified). At web scale this is the brute-force
exact path; the LSH/IVF operators in simsearch.py are the approximate
scale path, exactly as gensim pairs KeyedVectors with its ANN indexers.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _unitvec(v: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def _ensure_list(value):
    """Wrap a lone key (str/int) or 1-D vector in a list — the reference's
    _ensure_list (keyedvectors.py:196-209), so ``most_similar("word")``
    means one key, not an iterable of characters."""
    if value is None:
        return []
    if isinstance(value, (str, bytes, int, np.integer)) or \
            (isinstance(value, np.ndarray) and value.ndim == 1):
        return [value]
    return list(value)


def fetch_vectors(vecs: DataFrame, keys, key_col: str = "vec_id",
                  vec_col: str = "embedding") -> dict:
    """Collect the input keys' vectors (≤ |keys| rows) as float64."""
    rows = (vecs.filter(F.col(key_col).isin(list(keys)))
            .select(key_col, vec_col).collect())
    return {r[key_col]: np.asarray(r[vec_col], dtype=np.float64)
            for r in rows}


def mean_vector(vecs: DataFrame, keys, weights=None,
                pre_normalize: bool = True, post_normalize: bool = False,
                key_col: str = "vec_id", vec_col: str = "embedding",
                ignore_missing: bool = False) -> np.ndarray:
    """get_mean_vector (keyedvectors.py:455-524): Σ wᵢ·unit(vᵢ) / Σ|wᵢ|,
    optionally unit-normalized."""
    keys = list(keys)
    if not keys:
        raise ValueError("cannot compute mean with no input")
    if weights is None:
        weights = np.ones(len(keys))
    # raw-vector entries (get_mean_vector keyedvectors.py:500-506) are
    # used as-is — only real keys hit the lookup scan
    lookup = [k for k in keys if not isinstance(k, np.ndarray)]
    got = fetch_vectors(vecs, lookup, key_col, vec_col) if lookup else {}
    mean = None
    total = 0.0
    for k, w in zip(keys, weights):
        if isinstance(k, np.ndarray):
            v = np.asarray(k, dtype=np.float64)
        elif k in got:
            v = got[k]
        elif ignore_missing:
            continue
        else:
            raise KeyError(f"Key {k!r} not present")
        if pre_normalize:
            v = _unitvec(v)
        mean = w * v if mean is None else mean + w * v
        total += abs(w)
    if total > 0:
        mean = mean / total
    return _unitvec(mean) if post_normalize else mean


def cosine_to_vector(vecs: DataFrame, query: np.ndarray,
                     key_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """dot(v, query)/‖v‖ per row (keyedvectors.py:851) — one relational
    pass, no collect."""
    q = F.array(*[F.lit(float(x)) for x in query])
    v = F.transform(vec_col, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(v, q, lambda a, b: a * b),
                      F.lit(0.0), lambda a, x: a + x)
    nrm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return vecs.select(F.col(key_col),
                       F.when(nrm > 0, dot / nrm).otherwise(dot)
                       .alias("sim"))


def most_similar(vecs: DataFrame, positive=None, negative=None,
                 topn: int = 10, key_col: str = "vec_id",
                 vec_col: str = "embedding", indexer=None) -> DataFrame:
    """most_similar (keyedvectors.py:778-860) → (key, sim, rank) rows:
    weighted mean of unit input vectors, post-normalized, cosine over the
    whole table with the input keys excluded.

    ``indexer``: an ``annindexer.AnnIndexer`` — the reference's pluggable
    ANN path (keyedvectors.py:848-849): the query goes to the prebuilt
    bucket/cell index and, like the reference, the input keys are NOT
    filtered out of the result."""
    positive = _ensure_list(positive)
    negative = _ensure_list(negative)
    keys = positive + negative
    weights = np.concatenate([np.ones(len(positive)),
                              -np.ones(len(negative))]) if keys else None
    mean = mean_vector(vecs, keys, weights, pre_normalize=True,
                       post_normalize=True, key_col=key_col,
                       vec_col=vec_col)
    if indexer is not None:
        out = indexer.most_similar_df(mean, topn)
        # the indexer names its key column after its own key_col — honor
        # the caller's key_col so facades read the result by name
        if out.columns[0] != key_col:
            out = out.withColumnRenamed(out.columns[0], key_col)
        return out
    sims = cosine_to_vector(vecs, mean, key_col, vec_col)
    # like the reference (keyedvectors.py:853-858), only named keys are
    # excluded from the result — raw query vectors have no key to exclude
    excl = [k for k in keys if not isinstance(k, np.ndarray)]
    if excl:
        sims = sims.filter(~F.col(key_col).isin(excl))
    from pyspark.sql import Window

    # TakeOrdered top-k (orderBy().limit() → per-partition heaps), NOT a
    # global row_number window which would funnel the whole table through
    # one task; the rank window then runs over ≤topn rows only
    top = sims.orderBy(F.desc("sim"), F.asc(key_col)).limit(topn)
    wnd = Window.orderBy(F.desc("sim"), F.asc(key_col))
    return (top.withColumn("rank", F.row_number().over(wnd))
            .select(key_col, F.round("sim", 6).alias("sim"), "rank"))


def n_similarity(vecs: DataFrame, ws1, ws2, key_col: str = "vec_id",
                 vec_col: str = "embedding") -> float:
    """Cosine between two key sets' (raw) mean vectors
    (keyedvectors.py:1238-1262)."""
    m1 = mean_vector(vecs, ws1, pre_normalize=False, key_col=key_col,
                     vec_col=vec_col)
    m2 = mean_vector(vecs, ws2, pre_normalize=False, key_col=key_col,
                     vec_col=vec_col)
    return float(_unitvec(m1) @ _unitvec(m2))


def similarity(vecs: DataFrame, k1, k2, key_col: str = "vec_id",
               vec_col: str = "embedding") -> float:
    """Cosine between two keys (keyedvectors.py:1196-1219)."""
    got = fetch_vectors(vecs, [k1, k2], key_col, vec_col)
    return float(_unitvec(got[k1]) @ _unitvec(got[k2]))


def distances(vecs: DataFrame, key_or_vector, key_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """1 − cosine to every row (keyedvectors.py:1121-1155) as (key, dist)."""
    if np.ndim(key_or_vector) == 0:
        q = fetch_vectors(vecs, [key_or_vector], key_col,
                          vec_col)[key_or_vector]
    else:
        q = np.asarray(key_or_vector, dtype=np.float64)
    sims = cosine_to_vector(vecs, _unitvec(q), key_col, vec_col)
    return sims.select(key_col, (1.0 - F.col("sim")).alias("dist"))


def rank(vecs: DataFrame, k1, k2, key_col: str = "vec_id",
         vec_col: str = "embedding") -> int:
    """Rank of k2 in most_similar(k1) (keyedvectors.py:1099-1119):
    1-based position among all keys sorted by similarity to k1."""
    got = fetch_vectors(vecs, [k1], key_col, vec_col)
    sims = cosine_to_vector(vecs, _unitvec(got[k1]), key_col, vec_col) \
        .filter(F.col(key_col) != k1)
    target = sims.filter(F.col(key_col) == k2).collect()[0]["sim"]
    return int(sims.filter(F.col("sim") > target).count()) + 1


# --- batch evaluation (keyedvectors.py:1272-1594) ------------------------------

def _fold_vocab(vecs: DataFrame, key_col: str, vec_col: str,
                case_insensitive: bool, restrict_vocab: int | None,
                index_col: str | None) -> DataFrame:
    """(KEY, unit vector) rows after the reference's vocab preparation:
    optional top-N restriction (requires an index/frequency-order column),
    optional uppercase folding keeping the FIRST occurrence
    (keyedvectors.py:1330-1334 builds the dict reversed so earlier keys
    win)."""
    from pyspark.sql import Window

    v = vecs
    if restrict_vocab is not None:
        if index_col is None:
            raise ValueError(
                "restrict_vocab needs an index_col giving the vocab order")
        v = v.filter(F.col(index_col) < restrict_vocab)
    key = F.upper(F.col(key_col)) if case_insensitive else F.col(key_col)
    v = v.select(key.alias("key"), F.col(vec_col).alias("vec"),
                 *( [F.col(index_col).alias("_idx")] if index_col else [] ))
    if case_insensitive:
        order = F.col("_idx") if index_col else F.col("key")
        wnd = Window.partitionBy("key").orderBy(order.asc())
        v = (v.withColumn("_rn", F.row_number().over(wnd))
             .filter(F.col("_rn") == 1).drop("_rn"))
    arr = F.transform("vec", lambda x: x.cast("double"))
    nrm = F.sqrt(F.aggregate(arr, F.lit(0.0), lambda a, x: a + x * x))
    return v.select("key",
                    F.when(nrm > 0, F.transform(arr, lambda x: x / nrm))
                    .otherwise(arr).alias("unit"))


def evaluate_word_analogies(vecs: DataFrame, questions: DataFrame,
                            restrict_vocab: int | None = None,
                            case_insensitive: bool = True,
                            dummy4unknown: bool = False, topn: int = 5,
                            key_col: str = "word",
                            vec_col: str = "embedding",
                            index_col: str | None = None):
    """3CosAdd analogy evaluation (evaluate_word_analogies,
    keyedvectors.py:1287-1407) over a (section, a, b, c, expected)
    DataFrame — the whole question set scores in ONE relational pass
    (the reference loops most_similar per question): build per-question
    unit offset queries (b + c − a of unit vectors), broadcast them
    against the unit vocabulary, take top-``topn`` per question, then
    apply the reference's predicted-selection quirk (first of the top-5
    outside {a,b,c}; if none qualifies, the LAST of the five stands,
    keyedvectors.py:1374-1380). Returns (score, sections) where sections
    mirrors the reference's dicts."""
    from pyspark.sql import Window

    ok = _fold_vocab(vecs, key_col, vec_col, case_insensitive,
                     restrict_vocab, index_col).cache()
    q = questions.select(
        "section",
        *[(F.upper(F.col(c)) if case_insensitive else F.col(c)).alias(c)
          for c in ("a", "b", "c", "expected")])
    q = q.withColumn("qid", F.monotonically_increasing_id()).cache()

    melted = q.select("qid", F.explode(F.array(
        F.struct(F.col("a").alias("key"), F.lit(-1.0).alias("w")),
        F.struct(F.col("b").alias("key"), F.lit(1.0).alias("w")),
        F.struct(F.col("c").alias("key"), F.lit(1.0).alias("w")),
    )).alias("p")).select("qid", "p.key", "p.w")
    joined = melted.join(ok, "key")
    # per-question weighted sum of unit vectors (3 rows each — tiny agg);
    # dim resolved once driver-side (a nested aggregate can't size the
    # fold's zero array)
    dim = len(vecs.select(vec_col).first()[0])
    summed = joined.groupBy("qid").agg(
        F.count("*").alias("n_found"),
        F.aggregate(
            F.collect_list(F.struct("w", "unit")),
            F.array_repeat(F.lit(0.0), dim),
            lambda acc, s: F.zip_with(acc, s["unit"],
                                      lambda x, y: x + s["w"] * y)
        ).alias("qsum"))
    # in-vocab questions need all 3 inputs AND the expected key
    exp_ok = q.join(ok.select(F.col("key").alias("expected")), "expected") \
        .select("qid").withColumn("_e", F.lit(1))
    qs = (q.join(summed, "qid", "left").join(exp_ok, "qid", "left"))
    in_vocab = qs.filter((F.col("n_found") == 3) & F.col("_e").isNotNull())
    oov_rows = qs.filter(~((F.col("n_found") == 3)
                           & F.col("_e").isNotNull())) \
        .select("qid", "section", "a", "b", "c", "expected").collect()

    nq = F.sqrt(F.aggregate("qsum", F.lit(0.0), lambda a, x: a + x * x))
    queries = in_vocab.select(
        "qid", "section", "a", "b", "c", "expected",
        F.when(nq > 0, F.transform("qsum", lambda x: x / nq))
        .otherwise(F.col("qsum")).alias("qunit"))

    sim = F.aggregate(F.zip_with("unit", "qunit", lambda x, y: x * y),
                      F.lit(0.0), lambda a, x: a + x)
    scored = (ok.crossJoin(F.broadcast(
        queries.select("qid", "qunit"))).select("qid", "key",
                                                sim.alias("sim")))
    wnd = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("key"))
    top = (scored.withColumn("rnk", F.row_number().over(wnd))
           .filter(F.col("rnk") <= topn))
    rows = (queries.join(top, "qid")
            .select("qid", "section", "a", "b", "c", "expected", "key",
                    "rnk").collect())
    ok.unpersist()
    q.unpersist()

    by_q: dict = {}
    meta: dict = {}
    for r in rows:
        meta[r["qid"]] = (r["section"], r["a"], r["b"], r["c"],
                          r["expected"])
        by_q.setdefault(r["qid"], []).append((r["rnk"], r["key"]))
    sections: dict = {}

    def sec(name):
        return sections.setdefault(name, {"section": name, "correct": [],
                                          "incorrect": []})

    for qid, cands in by_q.items():
        section, a, b, c, expected = meta[qid]
        ignore = {a, b, c}
        predicted = None
        for _, key in sorted(cands):
            predicted = key
            if key not in ignore:
                break
        bucket = "correct" if predicted == expected else "incorrect"
        sec(section)[bucket].append((a, b, c, expected))
    oov = len(oov_rows)
    if dummy4unknown:
        for r in oov_rows:
            sec(r["section"])["incorrect"].append(
                (r["a"], r["b"], r["c"], r["expected"]))
    out_sections = list(sections.values())
    total = {"section": "Total accuracy",
             "correct": [t for s in out_sections for t in s["correct"]],
             "incorrect": [t for s in out_sections
                           for t in s["incorrect"]]}
    n = len(total["correct"]) + len(total["incorrect"])
    score = len(total["correct"]) / n if n else 0.0
    out_sections.append(total)
    return score, out_sections, oov


def _pearson(x: np.ndarray, y: np.ndarray):
    from gensim_spark.functions.special import student_t_sf2

    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = len(x)
    xm, ym = x - x.mean(), y - y.mean()
    denom = np.sqrt((xm * xm).sum() * (ym * ym).sum())
    r = float((xm * ym).sum() / denom) if denom > 0 else float("nan")
    r = max(-1.0, min(1.0, r))
    if n <= 2 or abs(r) == 1.0:
        return r, 0.0 if abs(r) == 1.0 else float("nan")
    t = r * np.sqrt((n - 2) / (1 - r * r))
    return r, student_t_sf2(abs(float(t)), n - 2)


def _rankdata(a: np.ndarray) -> np.ndarray:
    """Average ranks with tie handling (the 'average' method)."""
    order = np.argsort(a, kind="mergesort")
    ranks = np.empty(len(a), dtype=np.float64)
    sa = a[order]
    i = 0
    while i < len(a):
        j = i
        while j + 1 < len(a) and sa[j + 1] == sa[i]:
            j += 1
        ranks[order[i:j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    return ranks


def evaluate_word_pairs(vecs: DataFrame, pairs: DataFrame,
                        case_insensitive: bool = True,
                        dummy4unknown: bool = False,
                        restrict_vocab: int | None = None,
                        key_col: str = "word", vec_col: str = "embedding",
                        index_col: str | None = None):
    """Correlation with human similarity judgments (evaluate_word_pairs,
    keyedvectors.py:1423-1530) over a (word1, word2, sim) DataFrame: all
    model similarities in one relational pass, then Pearson and Spearman
    (average-rank, Student-t two-sided p via the scipy-free betainc) on
    the driver. Returns ((pearson_r, p), (spearman_r, p), oov_ratio)."""
    ok = _fold_vocab(vecs, key_col, vec_col, case_insensitive,
                     restrict_vocab, index_col)
    p = pairs.select(
        *[(F.upper(F.col(c)) if case_insensitive else F.col(c)).alias(c)
          for c in ("word1", "word2")],
        F.col("sim").cast("double").alias("gold"))
    p = p.withColumn("pid", F.monotonically_increasing_id())
    j = (p.join(ok.select(F.col("key").alias("word1"),
                          F.col("unit").alias("u1")), "word1", "left")
         .join(ok.select(F.col("key").alias("word2"),
                         F.col("unit").alias("u2")), "word2", "left"))
    dot = F.aggregate(F.zip_with("u1", "u2", lambda x, y: x * y),
                      F.lit(0.0), lambda a, x: a + x)
    rows = j.select(
        "gold",
        F.when(F.col("u1").isNotNull() & F.col("u2").isNotNull(), dot)
        .alias("model")).collect()
    gold, model, oov = [], [], 0
    for r in rows:
        if r["model"] is None:
            oov += 1
            if dummy4unknown:
                gold.append(r["gold"])
                model.append(0.0)
            continue
        gold.append(r["gold"])
        model.append(r["model"])
    if not gold:
        raise ValueError("No valid similarity judgements found")
    pearson = _pearson(np.array(gold), np.array(model))
    spearman = _pearson(_rankdata(np.array(gold)),
                        _rankdata(np.array(model)))
    if dummy4unknown:
        oov_ratio = oov / len(gold) * 100
    else:
        oov_ratio = oov / (len(gold) + oov) * 100
    return pearson, spearman, oov_ratio


def wmdistance(vecs: DataFrame, document1, document2, norm: bool = True,
               key_col: str = "vec_id", vec_col: str = "embedding") -> float:
    """Word Mover's Distance between two token lists
    (keyedvectors.py:918-1009, the POT ``emd2`` path): OOV words dropped,
    ``inf`` when either document empties or the distance matrix is all
    zeros, ``0.0`` when both reduce to one shared unique token; euclidean
    costs over (optionally unit-normalized) vectors; exact LP via
    operators/transport.emd. Only the two documents' vectors are
    collected; the corpus-scale WMD surface is operators/wmd.py's
    RWMD-pruned top-k."""
    from gensim_spark.operators.transport import emd

    tokens = set(document1) | set(document2)
    got = fetch_vectors(vecs, tokens, key_col, vec_col)
    document1 = [t for t in document1 if t in got]
    document2 = [t for t in document2 if t in got]
    if not document1 or not document2:
        return float("inf")
    doclist1 = list(dict.fromkeys(document1))
    doclist2 = list(dict.fromkeys(document2))
    if len(set(doclist1) | set(doclist2)) == 1:
        return 0.0      # one shared unique token (keyedvectors.py:976-978)
    v1 = np.array([_unitvec(got[t]) if norm else got[t]
                   for t in doclist1])
    v2 = np.array([_unitvec(got[t]) if norm else got[t]
                   for t in doclist2])
    cost = np.sqrt(((v1[:, np.newaxis, :] - v2[np.newaxis, :, :]) ** 2)
                   .sum(axis=2))
    if abs(cost.sum()) < 1e-8:
        return float("inf")     # keyedvectors.py:991-994 emd-stuck guard
    a = np.array([document1.count(t) / len(document1) for t in doclist1])
    b = np.array([document2.count(t) / len(document2) for t in doclist2])
    total, _plan = emd(a, b, cost)
    return float(total)


def most_similar_cosmul(vecs: DataFrame, positive=None, negative=None,
                        topn: int = 10, key_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """3CosMul retrieval (keyedvectors.py:1011-1098, Levy & Goldberg eq. 4
    with distances shifted to [0,1] per footnote 7):

        score = Π_p (1 + cos(v, p)) / 2  ÷  (Π_n (1 + cos(v, n)) / 2 + 1e-6)

    over unit input vectors. One relational pass: the handful of input
    vectors are collected and inlined as literal arrays; every per-term
    cosine is a JVM ``zip_with``/``aggregate`` expression in the same
    select, so the scan reads the table once and the top-k is a
    TakeOrdered, never a global sort."""
    positive = _ensure_list(positive)
    negative = _ensure_list(negative)
    if not positive:
        raise ValueError("cannot compute similarity with no input")
    keys = positive + negative
    got = fetch_vectors(vecs, keys, key_col, vec_col)
    missing = [k for k in keys if k not in got]
    if missing:
        raise KeyError(f"Keys {missing!r} not present")

    v = F.transform(vec_col, lambda x: x.cast("double"))
    nrm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))

    def shifted_cos(term: np.ndarray):
        q = F.array(*[F.lit(float(x)) for x in _unitvec(term)])
        dot = F.aggregate(F.zip_with(v, q, lambda a, b: a * b),
                          F.lit(0.0), lambda a, x: a + x)
        cos = F.when(nrm > 0, dot / nrm).otherwise(dot)
        return (F.lit(1.0) + cos) / F.lit(2.0)

    num = None
    for k in positive:
        t = shifted_cos(got[k])
        num = t if num is None else num * t
    den = None
    for k in negative:
        t = shifted_cos(got[k])
        den = t if den is None else den * t
    score = num if den is None else num / (den + F.lit(1e-6))

    from pyspark.sql import Window

    scored = (vecs.select(F.col(key_col), score.alias("score"))
              .filter(~F.col(key_col).isin(keys)))
    top = scored.orderBy(F.desc("score"), F.asc(key_col)).limit(topn)
    wnd = Window.orderBy(F.desc("score"), F.asc(key_col))
    return (top.withColumn("rank", F.row_number().over(wnd))
            .select(key_col, F.round("score", 6).alias("score"), "rank"))


def closer_than(vecs: DataFrame, key1, key2, key_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """All keys strictly closer to ``key1`` than ``key2`` is
    (keyedvectors.py:655-662), ``key1`` itself excluded — a single
    filtered cosine scan; the threshold cos(key1, key2) is computed
    driver-side from the two fetched vectors."""
    got = fetch_vectors(vecs, [key1, key2], key_col, vec_col)
    u1 = _unitvec(got[key1])
    threshold = float(u1 @ _unitvec(got[key2]))
    sims = cosine_to_vector(vecs, u1, key_col, vec_col)
    return (sims.filter((F.col("sim") > threshold)
                        & (F.col(key_col) != key1)
                        & (F.col(key_col) != key2))
            .select(key_col))


def rank_by_centrality(vecs: DataFrame, words, use_norm: bool = True,
                       key_col: str = "vec_id",
                       vec_col: str = "embedding") -> list:
    """Rank the given keys by similarity to their centroid
    (keyedvectors.py:1099-1126): mean of unit vectors, post-normalized;
    dists over (optionally normed) word vectors. The word list is the
    only thing touched — driver-side over fetched vectors, no scan."""
    words = list(words)
    got = fetch_vectors(vecs, words, key_col, vec_col)
    used = [w for w in words if w in got]
    if not used:
        raise ValueError("cannot select a word from an empty list")
    vmat = np.vstack([_unitvec(got[w]) if use_norm else got[w]
                      for w in used])
    # get_mean_vector(vectors, post_normalize=True): pre-normalize rows,
    # average, unit-normalize (keyedvectors.py:461-524)
    units = vmat / np.maximum(np.linalg.norm(vmat, axis=1, keepdims=True),
                              1e-300)
    mean = _unitvec(units.mean(axis=0))
    dists = vmat @ mean
    return sorted(zip((float(d) for d in dists), used), reverse=True)


def doesnt_match(vecs: DataFrame, words, key_col: str = "vec_id",
                 vec_col: str = "embedding"):
    """The key furthest from the mean of all keys
    (keyedvectors.py:1128-1143)."""
    return rank_by_centrality(vecs, words, use_norm=True, key_col=key_col,
                              vec_col=vec_col)[-1][1]


def most_similar_to_given(vecs: DataFrame, key1, keys_list,
                          key_col: str = "vec_id",
                          vec_col: str = "embedding"):
    """The key from ``keys_list`` most similar to ``key1``
    (keyedvectors.py:651-653): argmax of pairwise cosines, driver-side
    over the fetched handful."""
    keys_list = list(keys_list)
    got = fetch_vectors(vecs, set(keys_list) | {key1}, key_col, vec_col)
    u1 = _unitvec(got[key1])
    sims = [float(u1 @ _unitvec(got[k])) for k in keys_list]
    return keys_list[int(np.argmax(sims))]


def relative_cosine_similarity(vecs: DataFrame, wa, wb, topn: int = 10,
                               key_col: str = "vec_id",
                               vec_col: str = "embedding") -> float:
    """rcs(wa, wb) = cos(wa, wb) / Σ_{top-n similar to wa} cos
    (keyedvectors.py:1565-1594, Leeuwenberg et al. eq. 1)."""
    sims = most_similar(vecs, positive=[wa], topn=topn,
                        key_col=key_col, vec_col=vec_col).collect()
    if not sims:
        raise ValueError(
            "Cannot calculate relative cosine similarity without any "
            "similar words.")
    return (similarity(vecs, wa, wb, key_col, vec_col)
            / sum(r["sim"] for r in sims))
