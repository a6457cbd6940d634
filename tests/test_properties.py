"""Property-based tests (hypothesis): tokenizer path parity, varint
roundtrip, dictionary id assignment, and query-over-salted-store identity."""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.oracle import PyDictionary

ascii_text = st.text(
    alphabet=st.sampled_from("abc XYZ_019.,!<>&;\t\n"), max_size=200
)


@given(ascii_text)
@settings(max_examples=300, deadline=None)
def test_ascii_token_pattern_matches_python(s):
    """The JVM fast-path regex [a-zA-Z_]+ over lower() equals the Python
    PAT_ALPHABETIC pipeline on pure-ASCII input (the fast-path contract)."""
    import re

    from gensim_spark.functions import textref

    want = textref.simple_preprocess(s)
    toks = re.findall(r"[a-z_]+", s.lower())
    got = [t for t in toks if 2 <= len(t) <= 15 and not t.startswith("_")]
    assert got == want


@given(st.lists(st.integers(min_value=0, max_value=10**12), min_size=1,
                max_size=500, unique=True))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip_property(ids):
    from gensim_spark.index.packing import (decode_varint_deltas,
                                            encode_varint_deltas)

    arr = np.array(sorted(ids), dtype=np.int64)
    assert np.array_equal(decode_varint_deltas(encode_varint_deltas(arr)), arr)


@given(st.lists(st.lists(st.sampled_from(["a", "b", "c", "dd", "eee", "f_g"]),
                         max_size=8), min_size=1, max_size=12))
@settings(max_examples=100, deadline=None)
def test_dictionary_oracle_self_consistency(texts):
    """The pure-python oracle follows the documented gensim semantics: ids
    are dense 0..N-1 and ordered by (first containing doc, token)."""
    odict = PyDictionary(texts)
    ids = sorted(odict.token2id.values())
    assert ids == list(range(len(ids)))
    first_doc = {}
    for i, doc in enumerate(texts):
        for tok in doc:
            first_doc.setdefault(tok, i)
    order = sorted(odict.token2id, key=lambda t: (first_doc[t], t))
    assert [odict.token2id[t] for t in order] == list(range(len(order)))


def test_query_over_salted_store_identity(spark, tmp_path):
    """Scoring over the salted, term-bucketed persisted store must equal
    scoring over the in-memory postings (salting is layout, not semantics)."""
    from gensim_spark.index import layout
    from gensim_spark.operators import topk as T
    from gensim_spark.plans import pipeline as P
    from gensim_spark.sources.synth import generate_pages
    from pyspark.sql import functions as F

    pages = generate_pages(spark, 1500, tokens_per_doc=40, partitions=4)
    idx = P.build(P.tokenize(pages, ascii_fast_path=True), num_docs=1500)
    out = str(tmp_path / "salted")
    layout.write_postings_bucketed(
        idx.weighted, out, n_buckets=4, salt_threshold=200, salts=4,
        dfs=idx.vocab.select("term_id", "df"),
    )
    terms = [r["term_id"] for r in
             idx.vocab.orderBy(F.col("df").desc()).limit(3).collect()]
    q = T.query_terms_df(spark, {0: terms})
    stored = layout.read_postings_bucketed(spark, out, term_ids=terms,
                                           n_buckets=4)
    got = T.search(stored.select("doc_id", "term_id", "weight"), q, k=20)
    want = T.search(idx.weighted, q, k=20)
    gm = [(r["rank"], r["doc_id"], round(r["score"], 9))
          for r in got.orderBy("rank").collect()]
    wm = [(r["rank"], r["doc_id"], round(r["score"], 9))
          for r in want.orderBy("rank").collect()]
    assert gm == wm


# --- curation properties (driver-side reference implementations) ------------

_word = st.text(alphabet=st.sampled_from("abcdef"), min_size=1, max_size=3)


@given(st.lists(st.lists(_word, max_size=20), min_size=1, max_size=8),
       st.integers(min_value=1, max_value=6))
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_chunk_tokens_reconstruction_property(spark, corpora, size):
    """Non-overlapping chunks, re-split and concatenated in chunk order,
    reconstruct each doc's token stream exactly (no token lost/duplicated)."""
    from gensim_spark.operators import curation as CU

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpora)],
        "doc_id long, tokens array<string>")
    rows = CU.chunk_tokens(docs, size=size).collect()
    got = {}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["chunk_id"])):
        got.setdefault(r["doc_id"], []).extend(
            r["chunk"].split(" ") if r["chunk"] else [])
        assert 1 <= r["n_tokens"] <= size
    for i, toks in enumerate(corpora):
        assert got.get(i, []) == list(toks)


@given(st.lists(st.lists(_word, max_size=12), min_size=1, max_size=6),
       st.lists(st.lists(_word, max_size=12), min_size=1, max_size=3),
       st.integers(min_value=1, max_value=4))
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_decontaminate_matches_set_intersection(spark, corpora, benches, n):
    """n_hits == |doc n-gram set ∩ benchmark n-gram set| (pure-Python
    reference over the same token lists)."""
    from gensim_spark.operators import curation as CU

    def grams(toks):
        return {tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpora)],
        "doc_id long, tokens array<string>")
    bench = spark.createDataFrame(
        [(i, t) for i, t in enumerate(benches)],
        "doc_id long, tokens array<string>")
    bench_set = set().union(*(grams(t) for t in benches))
    out = {r["doc_id"]: r for r in CU.decontaminate(docs, bench, n=n).collect()}
    assert len(out) == len(corpora)
    for i, toks in enumerate(corpora):
        want = len(grams(toks) & bench_set)
        assert out[i]["n_hits"] == want, (i, toks, want, out[i])
        assert out[i]["contaminated"] == (want > 0)
