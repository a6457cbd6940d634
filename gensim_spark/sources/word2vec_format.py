"""Original C word2vec-tool format I/O — the most common real-world
embeddings entry point (pretrained GoogleNews / fastText ``.vec`` files).

Reference semantics (gensim/models/keyedvectors.py:1596-2090):
- ``save_word2vec_format`` (keyedvectors.py:1596-1674): optional first line
  ``"<total_vec> <vector_size>\\n"``, then one record per key — text:
  ``"<key> <v0> <v1> ...\\n"``; binary: ``b"<key> " + float32 LE bytes``.
  Keys are stored most-frequent-first when a ``count`` attribute exists
  (stable ties = original index order), else in index order with a warning;
  ``fvocab`` writes ``"<key> <count>\\n"`` lines in the same order and
  raises when the sort attribute is absent (keyedvectors.py:1630-1646).
  The Doc2Vec int-key prefix chain (keyedvectors.py:1656-1663) is out of
  scope here — document vectors export through their own (doc_id, vector)
  DataFrame, not string-keyed KV files.
- ``load_word2vec_format`` (keyedvectors.py:1999-2085): header gives
  (vocab_size, vector_size); ``limit`` clamps vocab_size; duplicate words
  keep the first occurrence (keyedvectors.py:1908-1912); with no ``fvocab``
  the counts are faked in descending load order as ``vocab_size - word_id``
  (keyedvectors.py:1915-1918); fewer records than the header promises →
  ``EOFError`` (keyedvectors.py:1967-1977); binary words may carry an
  obsolete leading ``'\\n'`` which is stripped (keyedvectors.py:1941-1943);
  ``no_header=True`` (GloVe layout) detects sizes with an extra pass and is
  text-only (keyedvectors.py:2054-2060).

Spark shape: the TEXT format is line-delimited, so the reader is fully
distributed — ``spark.read.text`` + zipWithIndex line numbers (the format's
record order is semantic: it defines word_id and the faked counts), JVM-side
``split``/``cast`` parsing, a (word → first lineno) dedup, and a skinny
row_number join for word ids so the vector payload never funnels through one
task. The BINARY format has variable-length records with no delimiter — it
is inherently a sequential scan (the reference reads it in chunks on one
node too, keyedvectors.py:1952-1968); the loader streams it driver-side in
bounded chunks into a temp parquet and hands the DataFrame back to Spark.
Writers stream ``toLocalIterator()`` through the driver because the output
is one sequential file by definition; the sort itself is distributed.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gensim_spark.sources.formats import copen

_BINARY_CHUNK = 100 * 1024  # keyedvectors.py:2000 binary_chunk_size


def _text_lines(spark: SparkSession, path: str) -> DataFrame:
    """(lineno, value) rows in file order — formats._lines_with_docno
    (the shared zipWithIndex idiom) under this module's column name."""
    from gensim_spark.sources.formats import _lines_with_docno

    return _lines_with_docno(spark, path).select(
        F.col("doc_id").alias("lineno"), "value")


def load_word2vec_format(spark: SparkSession, fname: str,
                         fvocab: str | None = None, binary: bool = False,
                         encoding: str = "utf8",
                         unicode_errors: str = "strict",
                         limit: int | None = None,
                         no_header: bool = False) -> DataFrame:
    """→ (word string, word_id long, count long, embedding array<double>)
    DataFrame; ``word_id`` is the reference's insertion index (load order
    after duplicate-skips) so downstream writers can reproduce tie order."""
    if binary and no_header:
        raise NotImplementedError(
            "no_header only available for text-format files")

    counts_df = None
    if fvocab is not None:
        with copen(fvocab, "rb") as fin:
            pairs = []
            for line in fin:
                w, c = line.decode(encoding, errors=unicode_errors) \
                    .strip().split()
                pairs.append((w, int(c)))
        counts_df = spark.createDataFrame(pairs, "word string, vcount long")

    if binary:
        vecs = _load_binary(spark, fname, encoding, unicode_errors, limit)
    else:
        vecs = _load_text(spark, fname, encoding, unicode_errors, limit,
                          no_header)

    if counts_df is not None:
        # counts from the vocab file; missing words → NULL with the
        # reference's "vocabulary file is incomplete" semantics
        vecs = (vecs.drop("count")
                .join(F.broadcast(counts_df), "word", "left")
                .withColumnRenamed("vcount", "count"))
    return vecs.select("word", "word_id", "count", "embedding")


def _load_text(spark, fname, encoding, unicode_errors, limit, no_header):
    # the header collect, EOF-check count, and the dedup self-join inside
    # _assign_word_ids all consume these lines — without the cache a
    # multi-GB .vec is re-read and re-split 4-5 times
    lines = _text_lines(spark, fname).cache()
    if no_header:
        # extra sizing pass (keyedvectors.py:2054-2060)
        vocab_size = lines.count()
        offset = 0
    else:
        header = lines.filter(F.col("lineno") == 0).collect()[0]["value"]
        vocab_size, _vector_size = (int(x) for x in header.split())
        offset = 1
        n_records = lines.count() - 1
        if n_records < vocab_size and (limit is None or n_records < limit):
            raise EOFError("unexpected end of input; is count incorrect "
                           "or file otherwise damaged?")
    if limit:
        vocab_size = min(vocab_size, limit)

    recs = (lines.filter((F.col("lineno") >= offset)
                         & (F.col("lineno") < offset + vocab_size))
            .select((F.col("lineno") - offset).alias("rec"),
                    # line.rstrip() parity: strip ALL trailing whitespace
                    # (CRLF files), not just spaces
                    F.split(F.regexp_replace("value", "\\s+$", ""), " ")
                    .alias("parts"))
            .select("rec", F.element_at("parts", 1).alias("word"),
                    F.expr("transform(slice(parts, 2, size(parts) - 1), "
                           "x -> cast(x AS double))").alias("embedding")))
    # materialize once, then release the line cache (a loader must not
    # pin the raw file in executor memory after it returns)
    out = _assign_word_ids(recs, vocab_size).localCheckpoint(eager=True)
    lines.unpersist()
    return out


def _assign_word_ids(recs: DataFrame, vocab_size: int) -> DataFrame:
    """First-occurrence dedup + insertion-order word ids + faked descending
    counts (keyedvectors.py:1908-1925). The row_number runs over the skinny
    (word, rec) projection only; vectors join back by record number."""
    from pyspark.sql import Window

    first = (recs.groupBy("word").agg(F.min("rec").alias("rec")))
    wnd = Window.orderBy("rec")
    ids = first.select(
        "rec", (F.row_number().over(wnd) - 1).alias("word_id"))
    return (recs.join(ids, "rec")
            .withColumn("count", F.lit(vocab_size) - F.col("word_id"))
            .select("word", "word_id", "count", "embedding"))


def _load_binary(spark, fname, encoding, unicode_errors, limit):
    """Sequential chunked scan (the format has no record delimiter) →
    bounded-memory temp parquet → DataFrame. Exact _add_bytes_to_kv
    semantics (keyedvectors.py:1928-1968) including the leading-'\\n' strip."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    out_dir = tempfile.mkdtemp(prefix="w2vbin_")
    out_path = os.path.join(out_dir, "part-0.parquet")
    schema = pa.schema([("rec", pa.int64()), ("word", pa.string()),
                        ("embedding", pa.list_(pa.float64()))])
    writer = pq.ParquetWriter(out_path, schema)
    real = np.dtype(np.float32)

    with copen(fname, "rb") as fin:
        header = fin.readline().decode(encoding)
        vocab_size, vector_size = (int(x) for x in header.split())
        if limit:
            vocab_size = min(vocab_size, limit)
        bytes_per_vector = vector_size * real.itemsize
        chunk = b""
        rec = 0
        batch_words, batch_vecs = [], []
        while rec < vocab_size:
            new_chunk = fin.read(_BINARY_CHUNK)
            chunk += new_chunk
            start = 0
            while rec < vocab_size:
                i_space = chunk.find(b" ", start)
                i_vector = i_space + 1
                if i_space == -1 or (len(chunk) - i_vector) < bytes_per_vector:
                    break
                word = chunk[start:i_space] \
                    .decode(encoding, errors=unicode_errors).lstrip("\n")
                vec = np.frombuffer(chunk, offset=i_vector,
                                    count=vector_size, dtype=real)
                batch_words.append(word)
                batch_vecs.append(vec.astype(np.float64))
                start = i_vector + bytes_per_vector
                rec += 1
            chunk = chunk[start:]
            if batch_words:
                writer.write_table(pa.table(
                    {"rec": list(range(rec - len(batch_words), rec)),
                     "word": batch_words,
                     "embedding": [v.tolist() for v in batch_vecs]},
                    schema=schema))
                batch_words, batch_vecs = [], []
            if len(new_chunk) < _BINARY_CHUNK and not new_chunk:
                break
        writer.close()
        if rec != vocab_size:
            raise EOFError("unexpected end of input; is count incorrect "
                           "or file otherwise damaged?")
    return _assign_word_ids(
        spark.read.parquet(out_dir).select("rec", "word", "embedding"),
        vocab_size)


def save_word2vec_format(vecs: DataFrame, fname: str,
                         fvocab: str | None = None, binary: bool = False,
                         total_vec: int | None = None,
                         write_header: bool = True, prefix: str = "",
                         append: bool = False,
                         word_col: str = "word",
                         vec_col: str = "embedding",
                         count_col: str = "count") -> None:
    """Store a (word, embedding[, count]) DataFrame in word2vec format
    (keyedvectors.py:1596-1674): most-frequent-first when ``count`` exists
    (ties by word_id / word), else current order; float32 payload."""
    has_count = count_col in vecs.columns
    if fvocab is not None and not has_count:
        raise ValueError(
            f"Cannot store vocabulary with '{count_col}' because that "
            f"attribute does not exist")

    ordered = vecs
    tie = ["word_id"] if "word_id" in vecs.columns else [word_col]
    if has_count:
        ordered = vecs.orderBy(F.desc(count_col),
                               *[F.asc(c) for c in tie])
    elif "word_id" in vecs.columns:
        ordered = vecs.orderBy("word_id")

    rows = ordered.select(
        F.col(word_col).alias("word"),
        F.col(vec_col).alias("embedding"),
        *( [F.col(count_col).alias("count")] if has_count else [] ))

    if total_vec is None:
        total_vec = vecs.count()
    first = vecs.select(F.size(vec_col).alias("d")).first()
    vector_size = int(first["d"]) if first is not None else 0

    mode = "ab" if append else "wb"
    vout = copen(fvocab, mode) if fvocab is not None else None
    with copen(fname, mode) as fout:
        if write_header:
            fout.write(f"{total_vec} {vector_size}\n".encode("utf8"))
        # toLocalIterator streams one partition at a time — the file is a
        # single sequential artifact by definition; the sort was distributed
        for r in rows.toLocalIterator():
            vec = np.asarray(r["embedding"], dtype=np.float32)
            if binary:
                fout.write(f"{prefix}{r['word']} ".encode("utf8")
                           + vec.tobytes())
            else:
                fout.write(f"{prefix}{r['word']} "
                           f"{' '.join(str(v) for v in vec)}\n"
                           .encode("utf8"))
            if vout is not None:
                vout.write(f"{prefix}{r['word']} {r['count']}\n"
                           .encode("utf8"))
    if vout is not None:
        vout.close()


def glove2word2vec(spark: SparkSession, glove_input_file: str,
                   word2vec_output_file: str) -> tuple:
    """Convert a GloVe-format text file to word2vec format
    (scripts/glove2word2vec.py:93-111): load headerless (faked descending
    counts = load order), save with the ``"<n> <d>"`` header prepended.
    Returns (num_lines, num_dims)."""
    vecs = load_word2vec_format(spark, glove_input_file, binary=False,
                                no_header=True)
    num_lines = vecs.count()
    first = vecs.select(F.size("embedding").alias("d")).first()
    num_dims = int(first["d"]) if first is not None else 0
    save_word2vec_format(vecs, word2vec_output_file, binary=False)
    return num_lines, num_dims


def word2vec2tensor(spark: SparkSession, word2vec_model_path: str,
                    tensor_filename: str, binary: bool = False) -> None:
    """Emit TensorBoard-projector TSVs from a word2vec-format file
    (scripts/word2vec2tensor.py:53-78): ``<prefix>_tensor.tsv`` holds one
    tab-separated float32 vector per line, ``<prefix>_metadata.tsv`` the
    words, both in the model's index order."""
    vecs = load_word2vec_format(spark, word2vec_model_path, binary=binary)
    with copen(tensor_filename + "_tensor.tsv", "wb") as fvec, \
            copen(tensor_filename + "_metadata.tsv", "wb") as fmeta:
        for r in vecs.orderBy("word_id").toLocalIterator():
            fmeta.write(r["word"].encode("utf8") + b"\n")
            row = "\t".join(str(x) for x in
                            np.asarray(r["embedding"], dtype=np.float32))
            fvec.write(row.encode("utf8") + b"\n")
