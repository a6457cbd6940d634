"""Connected-components dedup clustering (pairs -> clusters -> canonical doc).

The reference has no CC operator; this is the training-data-pipeline stage
that turns LSH candidate *pairs* into keep/drop *clusters*. Oracle here is a
driver-side union-find; the driver-level DuckDB oracle is a recursive CTE
(see __spark_entry__.oracle_sql()["dedup_clusters"]).
"""

import random

from pyspark.sql import functions as F

from gensim_spark.operators import dedup as D


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min node id of the component
    labels = {}
    for x in range(n_nodes):
        r = find(x)
        labels.setdefault(r, min(i for i in range(n_nodes) if find(i) == r))
    return {x: labels[find(x)] for x in range(n_nodes)}


def _pairs_df(spark, edges):
    return spark.createDataFrame(
        [(a, b) for a, b in edges], "doc_a long, doc_b long"
    )


def test_cc_chain_triangle_star(spark):
    # chain 0-1-2-3 (transitivity: (0,3) never emitted as a pair),
    # triangle 10-11-12, star 20-{21,22,23}, plus an isolated pair 30-31.
    edges = [(0, 1), (1, 2), (2, 3), (10, 11), (11, 12), (10, 12),
             (20, 21), (20, 22), (20, 23), (30, 31)]
    got = {
        (r.node, r.component)
        for r in D.connected_components(_pairs_df(spark, edges)).collect()
    }
    want = {(0, 0), (1, 0), (2, 0), (3, 0),
            (10, 10), (11, 10), (12, 10),
            (20, 20), (21, 20), (22, 20), (23, 20),
            (30, 30), (31, 30)}
    assert got == want


def test_cc_empty_pairs(spark):
    out = D.connected_components(_pairs_df(spark, []))
    assert out.count() == 0
    assert out.columns == ["node", "component"]


def test_cc_long_path_needs_iterations(spark):
    # a 40-node path is the worst case for naive label propagation; the
    # star algorithm must still collapse it to component 0.
    edges = [(i, i + 1) for i in range(39)]
    out = D.connected_components(_pairs_df(spark, edges)).collect()
    assert len(out) == 40
    assert all(r.component == 0 for r in out)


def test_cc_random_graphs_match_union_find(spark):
    rng = random.Random(42)
    for _ in range(4):
        n = rng.randint(10, 40)
        n_edges = rng.randint(5, 60)
        edges = sorted({
            tuple(sorted(rng.sample(range(n), 2))) for _ in range(n_edges)
        })
        # reversed/duplicated inputs must not matter
        noisy = edges + [(b, a) for a, b in edges[::3]] + edges[:2]
        got = {
            (r.node, r.component)
            for r in D.connected_components(_pairs_df(spark, noisy)).collect()
        }
        oracle = _union_find(n, edges)
        touched = {a for a, b in edges} | {b for a, b in edges}
        want = {(x, oracle[x]) for x in touched}
        assert got == want


def test_dedup_clusters_labels_every_doc(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(8)], "doc_id long"
    )
    pairs = _pairs_df(spark, [(1, 2), (2, 5), (6, 7)])
    rows = {r.doc_id: (r.cluster_id, r.keep)
            for r in D.dedup_clusters(docs, pairs).collect()}
    assert rows == {
        0: (0, True), 1: (1, True), 2: (1, False), 3: (3, True),
        4: (4, True), 5: (1, False), 6: (6, True), 7: (6, False),
    }


def test_dedup_clusters_end_to_end_minhash(spark):
    # three exact dup groups + distinct docs; the minhash->LSH->CC pipeline
    # must cluster the dups together and keep exactly one per cluster.
    base = [
        "the quick brown fox jumps over the lazy dog again and again today",
        "completely different text about spark dataframes and shuffles here",
        "a third unrelated document mentioning inverted index compression",
    ]
    texts = []
    for t in base:
        texts += [t, t]  # exact dup pairs -> identical shingle sets
    texts.append("a lone singleton document with its own words entirely")
    docs = spark.createDataFrame(
        [(i, t.split()) for i, t in enumerate(texts)],
        "doc_id long, tokens array<string>",
    )
    sigs = D.minhash_signatures(docs, num_hashes=4, shingle_n=3)
    pairs = D.minhash_band_pairs(sigs, bands=2, rows_per_band=2)
    out = D.dedup_clusters(docs.select("doc_id"), pairs)
    rows = {r.doc_id: (r.cluster_id, r.keep) for r in out.collect()}
    # identical texts share identical signatures -> guaranteed same cluster
    assert rows[1] == (0, False) and rows[0] == (0, True)
    assert rows[3] == (2, False) and rows[2] == (2, True)
    assert rows[5] == (4, False) and rows[4] == (4, True)
    assert rows[6] == (6, True)  # singleton keeps itself
    kept = [d for d, (_, k) in rows.items() if k]
    assert sorted(kept) == [0, 2, 4, 6]


def test_shingles_short_docs_yield_no_grams(spark):
    # regression: sequence(0, -1) is descending in Spark — a doc shorter
    # than n used to feed slice() a 0 start and crash the whole job
    docs = spark.createDataFrame(
        [(0, ["a"]), (1, ["a", "b"]), (2, ["a", "b", "c"]), (3, [])],
        "doc_id long, tokens array<string>")
    got = {(r["doc_id"], r["shingle"]) for r in D.shingles(docs, n=3).collect()}
    assert got == {(2, "a b c")}
    # and the full minhash path survives a mixed corpus
    sigs = D.minhash_signatures(docs, num_hashes=4, shingle_n=3)
    assert [r["doc_id"] for r in sigs.collect()] == [2]
