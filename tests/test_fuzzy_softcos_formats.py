"""Fuzzy term kNN (FastSS/Levenshtein), Soft Cosine, and corpus formats."""

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import docs_df
from tests.oracle import PyDictionary


def py_edit_distance(a, b):
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[lb]


def test_edit_distance_kernel():
    from gensim_spark.operators.fuzzy import edit_distance

    import random
    random.seed(5)
    for _ in range(200):
        a = "".join(random.choice("abcd") for _ in range(random.randint(0, 8)))
        b = "".join(random.choice("abcd") for _ in range(random.randint(0, 8)))
        want = py_edit_distance(a, b)
        assert edit_distance(a, b) == want
        banded = edit_distance(a, b, band=2)
        assert banded == want if want <= 2 else banded > 2


def test_deletion_variants_recall():
    """FastSS guarantee: words at distance ≤ d share a deletion variant when
    each drops ≤ d chars."""
    from gensim_spark.operators.fuzzy import deletion_variants

    pairs = [("hello", "hallo"), ("cat", "cart"), ("spark", "spar"),
             ("word", "ward"), ("abc", "cba")]
    for a, b in pairs:
        d = py_edit_distance(a, b)
        if d <= 2:
            va, vb = set(deletion_variants(a, d)), set(deletion_variants(b, d))
            assert va & vb, (a, b)


def test_most_similar_terms(spark):
    from gensim_spark.operators.fuzzy import (build_fastss_index, levsim,
                                              most_similar_terms)

    words = ["apple", "apples", "appl", "ample", "orange", "orang", "grape",
             "grapes", "graph"]
    vocab = spark.createDataFrame([(w,) for w in words], "token string")
    idx = build_fastss_index(vocab, max_dist=2)
    out = most_similar_terms(spark, idx, ["apple", "graph"], topn=5,
                             max_distance=2)
    rows = {}
    for r in out.collect():
        rows.setdefault(r["query"], []).append(
            (r["rank"], r["token"], r["distance"], r["similarity"])
        )
    # oracle: brute force over the vocabulary
    for q in ["apple", "graph"]:
        cands = []
        for w in words:
            if w == q:
                continue
            d = py_edit_distance(q, w)
            if d <= 2:
                cands.append((levsim(q, w, d), w, d))
        cands.sort(key=lambda p: (-p[0], p[1]))
        got = sorted(rows.get(q, []))
        assert [t for _, t, _, _ in got] == [w for _, w, _ in cands[:5]]
        for (_, _, gd, gs), (ws, ww, wd) in zip(got, cands):
            assert gd == wd
            assert gs == pytest.approx(ws, rel=1e-12)


def test_soft_cosine_reduces_to_cosine_with_identity_S(spark, common_texts):
    """With S = I the Soft Cosine Measure IS the cosine similarity."""
    from gensim_spark.operators import bow as B
    from gensim_spark.operators import vocab as V
    from gensim_spark.operators.softcosine import soft_cosine_topk

    df = docs_df(spark, common_texts)
    vocab = V.build_vocab(df)
    postings = B.doc2bow_postings(df, vocab).select(
        "doc_id", "term_id", F.col("tf").cast("double").alias("weight")
    )
    S = vocab.select(F.col("term_id").alias("term_i"),
                     F.col("term_id").alias("term_j"),
                     F.lit(1.0).alias("sim"))
    odict = PyDictionary(common_texts)
    q_terms = [odict.token2id["graph"], odict.token2id["user"]]
    q = spark.createDataFrame([(0, t, 1.0) for t in q_terms],
                              "query_id int, term_id long, weight double")
    got = {r["doc_id"]: r["score"]
           for r in soft_cosine_topk(postings, q, S, k=10).collect()}
    # cosine oracle
    qvec = {t: 1.0 for t in q_terms}
    qn = math.sqrt(len(q_terms))
    for i, doc in enumerate(common_texts):
        bow = dict(odict.doc2bow(doc))
        dot = sum(v * qvec.get(t, 0.0) for t, v in bow.items())
        dn = math.sqrt(sum(v * v for v in bow.values()))
        want = dot / (dn * qn)
        if want != 0:
            assert got[i] == pytest.approx(want, rel=1e-9)
        else:
            assert i not in got


def test_soft_cosine_with_term_similarity(spark):
    """Hand-check qᵀSd with one off-diagonal similarity pair."""
    from gensim_spark.operators.softcosine import soft_cosine_topk

    # doc0 has only term 1; query has only term 0; S(0,1)=0.5
    postings = spark.createDataFrame([(0, 1, 1.0)],
                                     "doc_id long, term_id long, weight double")
    q = spark.createDataFrame([(0, 0, 1.0)],
                              "query_id int, term_id long, weight double")
    S = spark.createDataFrame(
        [(0, 0, 1.0), (1, 1, 1.0), (0, 1, 0.5), (1, 0, 0.5)],
        "term_i long, term_j long, sim double",
    )
    r = soft_cosine_topk(postings, q, S, k=1).collect()[0]
    # inner = 0.5; ||d||_S = 1; ||q||_S = 1 → score 0.5
    assert r["score"] == pytest.approx(0.5)


def test_term_sim_matrix_from_fuzzy(spark):
    from gensim_spark.operators.softcosine import term_sim_matrix_from_fuzzy

    vocab = spark.createDataFrame(
        [("cat", 0), ("cart", 1), ("dog", 2)], "token string, term_id long"
    )
    S = term_sim_matrix_from_fuzzy(spark, vocab, max_distance=1)
    rows = {(r["term_i"], r["term_j"]): r["sim"] for r in S.collect()}
    assert rows[(0, 0)] == 1.0 and rows[(2, 2)] == 1.0
    assert (0, 1) in rows and (1, 0) in rows  # cat↔cart at distance 1
    assert (0, 2) not in rows                 # cat↔dog beyond max_distance
    assert rows[(0, 1)] == rows[(1, 0)]


def test_blei_roundtrip(spark, common_texts, tmp_path):
    from gensim_spark.operators import bow as B
    from gensim_spark.operators import vocab as V
    from gensim_spark.sources import formats as FM

    df = docs_df(spark, common_texts)
    vocab = V.build_vocab(df)
    postings = B.doc2bow_postings(df, vocab)
    path = str(tmp_path / "c.lda-c")
    FM.write_blei(postings, path, vocab=vocab)
    with open(path) as f:
        first = f.readline().split()
    assert int(first[0]) == len(first) - 1  # N then N pairs
    back = FM.read_blei(spark, path)
    got = {(r["doc_id"], r["term_id"]): r["tf"] for r in back.collect()}
    want = {(r["doc_id"], r["term_id"]): r["tf"] for r in postings.collect()}
    assert got == want
    with open(path + ".vocab") as f:
        toks = [ln.strip() for ln in f if ln.strip()]
    vorder = [r["token"] for r in vocab.orderBy("term_id").collect()]
    assert toks == vorder


def test_svmlight_roundtrip(spark, common_texts, tmp_path):
    from gensim_spark.operators import bow as B
    from gensim_spark.operators import vocab as V
    from gensim_spark.sources import formats as FM

    df = docs_df(spark, common_texts)
    vocab = V.build_vocab(df)
    postings = B.doc2bow_postings(df, vocab)
    path = str(tmp_path / "c.svmlight")
    FM.write_svmlight(postings, path)
    with open(path) as f:
        assert f.readline().startswith("0 ")  # default target 0
    back = FM.read_svmlight(spark, path)
    got = {(r["doc_id"], r["term_id"]): r["weight"] for r in back.collect()}
    want = {(r["doc_id"], r["term_id"]): float(r["tf"])
            for r in postings.collect()}
    assert got == want


def test_low_roundtrip(spark, common_texts, tmp_path):
    from gensim_spark.sources import formats as FM

    df = docs_df(spark, common_texts)
    path = str(tmp_path / "c.low")
    FM.write_low(df, path)
    with open(path) as f:
        assert int(f.readline().strip()) == len(common_texts)
    back = FM.read_low(spark, path)
    got = {r["doc_id"]: r["tokens"] for r in back.collect()}
    assert got == {i: t for i, t in enumerate(common_texts)}


def test_mallet_roundtrip(spark, common_texts, tmp_path):
    from gensim_spark.sources import formats as FM

    df = docs_df(spark, common_texts)
    path = str(tmp_path / "c.mallet")
    FM.write_mallet(df, path)
    with open(path) as f:
        first = f.readline().split(None, 2)
    assert first[0] == "0" and first[1] == "__unknown__"
    back = FM.read_mallet(spark, path)
    got = {r["doc_id"]: (r["lang"], r["tokens"]) for r in back.collect()}
    for i, t in enumerate(common_texts):
        assert got[i] == ("__unknown__", t)


def test_uci_roundtrip(spark, common_texts, tmp_path):
    from gensim_spark.operators import bow as B
    from gensim_spark.operators import vocab as V
    from gensim_spark.sources import formats as FM
    from tests.oracle import PyDictionary

    df = docs_df(spark, common_texts)
    vocab = V.build_vocab(df)
    postings = B.doc2bow_postings(df, vocab)
    path = str(tmp_path / "c.uci")
    FM.write_uci(postings, path, vocab=vocab)
    odict = PyDictionary(common_texts)
    nd, nt, nnz = FM.uci_stats(spark, path)
    assert (nd, nt, nnz) == (odict.num_docs, len(odict.token2id),
                             odict.num_nnz)
    back = FM.read_uci(spark, path)
    got = {(r["doc_id"], r["term_id"]): r["tf"] for r in back.collect()}
    want = {(r["doc_id"], r["term_id"]): r["tf"] for r in postings.collect()}
    assert got == want


@pytest.mark.parametrize("codec", ["gz", "bz2"])
def test_compressed_roundtrips_all_formats(spark, common_texts, tmp_path,
                                           codec):
    """gensim reads/writes every corpus format through smart_open codecs
    (gensim/test/test_corpora.py compressed variants): each writer here
    honors a .gz/.bz2 suffix and each reader decodes transparently
    (Spark-side for the distributed read, copen for driver-side stats)."""
    from gensim_spark.operators import bow as B
    from gensim_spark.operators import vocab as V
    from gensim_spark.sources import formats as FM
    from gensim_spark.sources import matrix_market as MM
    from gensim_spark.sources.textcorpus import (load_vocab_from_text,
                                                 save_vocab_as_text)

    df = docs_df(spark, common_texts)
    vocab = V.build_vocab(df)
    postings = B.doc2bow_postings(df, vocab)
    want = {(r["doc_id"], r["term_id"]): r["tf"] for r in postings.collect()}

    # Matrix Market
    p = str(tmp_path / f"c.mm.{codec}")
    nd, nt, nnz = MM.write_mm(postings, p, weight_col="tf")
    got = {(r["doc_id"], r["term_id"]): int(r["weight"])
           for r in MM.read_mm(spark, p).collect()}
    assert got == want
    assert MM.mm_stats(spark, p) == (nd, nt, nnz)

    # Blei LDA-C
    p = str(tmp_path / f"c.lda-c.{codec}")
    FM.write_blei(postings, p)
    got = {(r["doc_id"], r["term_id"]): r["tf"]
           for r in FM.read_blei(spark, p).collect()}
    assert got == want

    # SVMlight
    p = str(tmp_path / f"c.svmlight.{codec}")
    FM.write_svmlight(postings, p)
    got = {(r["doc_id"], r["term_id"]): int(r["weight"])
           for r in FM.read_svmlight(spark, p).collect()}
    assert got == want

    # UCI (stats read driver-side through the codec)
    p = str(tmp_path / f"c.uci.{codec}")
    FM.write_uci(postings, p)
    got = {(r["doc_id"], r["term_id"]): r["tf"]
           for r in FM.read_uci(spark, p).collect()}
    assert got == want
    assert FM.uci_stats(spark, p)[2] == len(want)

    # LOW + Mallet (token-level formats)
    p = str(tmp_path / f"c.low.{codec}")
    FM.write_low(df, p)
    back = {r["doc_id"]: r["tokens"] for r in FM.read_low(spark, p).collect()}
    assert back == {r["doc_id"]: r["tokens"] for r in df.collect()}
    p = str(tmp_path / f"c.mallet.{codec}")
    FM.write_mallet(df, p)
    back = {r["doc_id"]: r["tokens"]
            for r in FM.read_mallet(spark, p).collect()}
    assert back == {r["doc_id"]: r["tokens"] for r in df.collect()}

    # Dictionary TSV
    p = str(tmp_path / f"vocab.tsv.{codec}")
    save_vocab_as_text(vocab, p, num_docs=len(common_texts))
    v2, n2 = load_vocab_from_text(spark, p)
    assert n2 == len(common_texts)
    assert {r["token"]: (r["term_id"], r["df"]) for r in v2.collect()} \
        == {r["token"]: (r["term_id"], r["df"]) for r in vocab.collect()}


def test_text_directory_depth_and_pattern_filters(spark, tmp_path):
    """TextDirectoryCorpus min_depth/max_depth/pattern/exclude_pattern
    (gensim/corpora/textcorpus.py:396-547, iter_filepaths :509-528)."""
    from gensim_spark.sources.textcorpus import read_text_directory

    root = tmp_path / "walk"
    (root / "d1" / "d2").mkdir(parents=True)
    (root / "top.txt").write_text("alpha words here")
    (root / "d1" / "mid.txt").write_text("beta words here")
    (root / "d1" / "skip.log").write_text("gamma words here")
    (root / "d1" / "d2" / "deep.txt").write_text("delta words here")

    def names(**kw):
        rows = read_text_directory(spark, str(root), **kw).collect()
        return sorted(r["path"].rsplit("/", 1)[-1] for r in rows)

    assert names() == ["deep.txt", "mid.txt", "skip.log", "top.txt"]
    assert names(min_depth=1) == ["deep.txt", "mid.txt", "skip.log"]
    assert names(max_depth=0) == ["top.txt"]
    assert names(min_depth=1, max_depth=1) == ["mid.txt", "skip.log"]
    assert names(pattern=r".*\.txt$") == ["deep.txt", "mid.txt", "top.txt"]
    assert names(exclude_pattern=r".*\.log$") == ["deep.txt", "mid.txt",
                                                  "top.txt"]
    # pattern is re.match on the file NAME (anchored), not a substring
    assert names(pattern=r"mid") == ["mid.txt"]
    # doc ids are 0..n-1 in path order, depth column matches tree depth
    rows = {r["path"].rsplit("/", 1)[-1]: (r["doc_id"], r["depth"])
            for r in read_text_directory(spark, str(root)).collect()}
    assert rows["top.txt"][1] == 0 and rows["deep.txt"][1] == 2
    assert sorted(d for d, _ in rows.values()) == [0, 1, 2, 3]


def test_matrix_and_softcos_facades(spark, common_texts):
    """MatrixSimilarity / SoftCosineSimilarity facades delegate to the
    operators with the docsim surface shapes."""
    import numpy as np

    from gensim_spark.api import MatrixSimilarity, SoftCosineSimilarity
    from gensim_spark.operators import bow as B
    from gensim_spark.operators import vocab as V

    # dense cosine index
    rng = np.random.default_rng(5)
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=6)]) for i in range(20)],
        "doc_id long, embedding array<double>")
    ms = MatrixSimilarity(vecs, num_best=5)
    q = vecs.filter("doc_id = 3").select(
        F.col("doc_id").alias("query_id"), "embedding")
    hits = ms[q].collect()
    assert len(hits) == 5
    assert hits[0]["doc_id"] == 3 and hits[0]["rank"] == 1  # self first

    # soft cosine with identity S == plain cosine ranking
    df = docs_df(spark, common_texts)
    vocab = V.build_vocab(df)
    postings = B.doc2bow_postings(df, vocab).select(
        "doc_id", "term_id", F.col("tf").cast("double").alias("weight"))
    S = vocab.select(F.col("term_id").alias("term_i"),
                     F.col("term_id").alias("term_j"),
                     F.lit(1.0).alias("sim"))
    sc = SoftCosineSimilarity(postings, S, num_best=3)
    qdf = postings.filter("doc_id = 8").select(
        F.lit(0).alias("query_id"), "term_id", "weight")
    out = sc[qdf].collect()
    assert len(out) == 3
    assert out[0]["doc_id"] == 8 and out[0]["score"] == pytest.approx(1.0)


def test_term_sim_matrix_from_embeddings(spark):
    """WordEmbeddingSimilarityIndex source (termsim.py:102-163) vs a numpy
    oracle: per-term top-n cosine neighbors excluding self, strict
    threshold, exponent, symmetric max-merge, unit diagonal."""
    import numpy as np
    from gensim_spark.operators.softcosine import (
        term_sim_matrix_from_embeddings)

    rng = np.random.default_rng(23)
    V, D, topn, thr, expo = 12, 6, 3, 0.05, 2.0
    mat = rng.normal(size=(V, D))
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(V)],
        "term_id long, embedding array<double>")

    S = term_sim_matrix_from_embeddings(
        df, threshold=thr, exponent=expo, topn=topn).collect()
    got = {(r["term_i"], r["term_j"]): r["sim"] for r in S}

    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cos = unit @ unit.T
    want = {}
    for i in range(V):
        order = sorted((j for j in range(V) if j != i),
                       key=lambda j: (-cos[i, j], j))[:topn]
        for j in order:
            if cos[i, j] > thr:
                s = cos[i, j] ** expo
                want[(i, j)] = max(want.get((i, j), 0.0), s)
                want[(j, i)] = max(want.get((j, i), 0.0), s)
    for i in range(V):
        want[(i, i)] = 1.0
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9), k


def test_term_sim_matrix_from_embeddings_lsh_path(spark):
    """LSH variant: symmetric, unit diagonal, and every off-diagonal entry
    also appears in the brute matrix with the same value (bucketing only
    prunes candidates, never invents or rescores them)."""
    import numpy as np
    from gensim_spark.operators.softcosine import (
        term_sim_matrix_from_embeddings)

    rng = np.random.default_rng(29)
    mat = rng.normal(size=(20, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(20)],
        "term_id long, embedding array<double>")
    brute = {(r["term_i"], r["term_j"]): r["sim"]
             for r in term_sim_matrix_from_embeddings(df, topn=5).collect()}
    lsh = {(r["term_i"], r["term_j"]): r["sim"]
           for r in term_sim_matrix_from_embeddings(
               df, topn=5, method="lsh", planes=2).collect()}
    for (i, j), s in lsh.items():
        if i == j:
            assert s == 1.0
        else:
            assert (j, i) in lsh
            assert s <= brute[(i, j)] + 1e-9 if (i, j) in brute else True
    assert all((i, i) in lsh for i in range(20))


def test_assemble_S_symmetric_under_binding_cap(spark):
    """SparseTermSimilarityMatrix parity: the reference inserts entries
    only in symmetric pairs (both columns must have budget,
    termsim.py:471-505), so S is always symmetric — a hub term whose row
    caps out must drop BOTH directions of its weakest pairs."""
    from gensim_spark.operators.softcosine import _assemble_S

    # hub 0 is similar to 1..5; spokes are similar only to the hub
    ids = spark.createDataFrame(
        [(0, j, 1.0 - 0.01 * j) for j in range(1, 6)],
        "term_i long, term_j long, sim double")
    terms = spark.createDataFrame([(i,) for i in range(6)], "term_id long")
    S = _assemble_S(ids, terms, nonzero_limit=3)
    entries = {(r["term_i"], r["term_j"]) for r in S.collect()}
    off = {e for e in entries if e[0] != e[1]}
    assert off == {(0, 1), (1, 0), (0, 2), (2, 0), (0, 3), (3, 0)}
    # symmetric and within budget
    assert all((j, i) in entries for i, j in entries)
    from collections import Counter
    per_term = Counter(i for i, _ in off)
    assert max(per_term.values()) <= 3


def test_lsh_self_topk_matches_broadcast_lsh(spark):
    """The no-broadcast bucket self-join returns the same neighbourhoods
    as lsh_topk fed the full vocabulary as queries."""
    import numpy as np

    from gensim_spark.operators.simsearch import lsh_self_topk, lsh_topk

    rng = np.random.default_rng(3)
    mat = rng.normal(size=(40, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(40)],
        "term_id long, embedding array<double>")
    q = df.selectExpr("term_id as qid", "embedding")
    want = {(r["query_id"], r["vec_id"], r["rank"])
            for r in lsh_topk(df, q, k=4, planes=4, dims=8,
                              id_col="term_id",
                              query_id_col="qid").collect()}
    got = {(r["query_id"], r["vec_id"], r["rank"])
           for r in lsh_self_topk(df, k=4, planes=4, dims=8,
                                  id_col="term_id").collect()}
    assert got == want
