"""Facebook fastText native ``.bin`` format: load published models into the
graft's FastTextModel (and save back).

Reference: ``gensim/models/_fasttext_bin.py`` (itself a port of the C++
``fasttext.cc`` / ``dictionary.cc`` / ``densematrix.cc`` serializers):
- signature: magic int32 793712314 + version int32 12 → "new" format; an
  old-format file starts directly with the header, whose first two ints are
  then (dim, ws) (_fasttext_bin.py:330-340);
- header: dim ws epoch min_count neg word_ngrams loss model bucket minn
  maxn lr_update_rate (all int32) + t (float64) (_NEW_HEADER_FORMAT);
- dictionary: vocab_size nwords nlabels (int32), ntokens (int64),
  [new] pruneidx_size (int64); per word: NUL-terminated bytes, count
  (int64), entry-type byte; supervised models (nlabels>0) unsupported
  (_load_vocab, _fasttext_bin.py:171-232);
- matrices: [new] quant bool byte, then (rows, dim) as 2×int64 + float32
  row-major payload — vectors_ngrams holds the nwords vocab rows followed
  by the `bucket` ngram rows; hidden_output follows after another bool
  (_load_matrix/_input_save/_output_save).

Like the word2vec ``.bin``, the format is a single sequential stream with
variable-length records — parsing is inherently driver-side (the reference
reads it on one node too); the resulting matrices are vocab/bucket-bounded,
never corpus-bounded, and ``to_fasttext_model`` hands them straight to the
distributed query surface (vectors_df → keyedvectors scans, oov_vector).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

from gensim_spark.sources.formats import copen

_END_OF_WORD = b"\x00"
_WORD_ENTRY_TYPE = b"\x00"
_FASTTEXT_VERSION = 12
_FASTTEXT_MAGIC = 793712314

_NEW_HEADER = [("dim", "i"), ("ws", "i"), ("epoch", "i"),
               ("min_count", "i"), ("neg", "i"), ("word_ngrams", "i"),
               ("loss", "i"), ("model", "i"), ("bucket", "i"),
               ("minn", "i"), ("maxn", "i"), ("lr_update_rate", "i"),
               ("t", "d")]
_OLD_HEADER = _NEW_HEADER[2:]   # old format carries dim/ws in the signature


@dataclass
class FtBin:
    """Everything in a .bin: header params + raw_vocab (word → count, file
    order) + the two matrices (_fasttext_bin.py Model namedtuple)."""
    params: dict
    raw_vocab: dict
    vocab_size: int
    nwords: int
    ntokens: int
    vectors_ngrams: np.ndarray          # (nwords + bucket, dim)
    hidden_output: np.ndarray | None = None
    extras: dict = field(default_factory=dict)


def _unpack(fin, fmt):
    return struct.unpack(fmt, fin.read(struct.calcsize(fmt)))


def _read_matrix(fin, new_format: bool) -> np.ndarray:
    if new_format:
        quant, = _unpack(fin, "@?")              # quant flag
        if quant:
            # the reference reads-and-ignores this flag and then misparses
            # the product-quantizer header as (rows, dim); fail clearly
            raise NotImplementedError(
                "quantized fastText models (.ftz / -quantize output) are "
                "not supported — only the dense matrix layout")
    rows, dim = _unpack(fin, "@2q")
    data = fin.read(rows * dim * 4)
    mat = np.frombuffer(data, dtype=np.float32, count=rows * dim)
    return mat.reshape(rows, dim)


def load(fname_or_fin, encoding: str = "utf-8",
         full_model: bool = True) -> FtBin:
    """Parse a Facebook-published .bin (old or new signature) exactly per
    the reference byte layout (_fasttext_bin.py load, :313-360)."""
    fin = copen(fname_or_fin, "rb") if isinstance(fname_or_fin, str) \
        else fname_or_fin
    magic, version = _unpack(fin, "@2i")
    new_format = magic == _FASTTEXT_MAGIC
    spec = _NEW_HEADER if new_format else _OLD_HEADER
    params = {name: _unpack(fin, "@" + fmt)[0] for name, fmt in spec}
    if not new_format:
        params.update(dim=magic, ws=version)

    vocab_size, nwords, nlabels = _unpack(fin, "@3i")
    if nlabels > 0:
        raise NotImplementedError(
            "Supervised fastText models are not supported")
    ntokens, = _unpack(fin, "@q")
    pruneidx_size = 0
    if new_format:
        pruneidx_size, = _unpack(fin, "@q")
    raw_vocab = {}
    for _ in range(vocab_size):
        word_bytes = bytearray()
        ch = fin.read(1)
        while ch != _END_OF_WORD:
            word_bytes += ch
            ch = fin.read(1)
        try:
            word = bytes(word_bytes).decode(encoding)
        except UnicodeDecodeError:
            word = bytes(word_bytes).decode(encoding,
                                            errors="backslashreplace")
        count, _etype = _unpack(fin, "@qb")
        raw_vocab[word] = count
    if pruneidx_size > 0:
        # the shrunken input matrix is only interpretable through the
        # prune-id remap; discarding it (as the reference does) leaves a
        # matrix whose row count no longer matches nwords + bucket
        raise NotImplementedError(
            "pruned fastText models (pruneidx_size "
            f"{pruneidx_size}) are not supported")

    vectors_ngrams = _read_matrix(fin, new_format)
    hidden_output = _read_matrix(fin, new_format) if full_model else None
    if isinstance(fname_or_fin, str):
        fin.close()
    return FtBin(params, raw_vocab, vocab_size, nwords, ntokens,
                 vectors_ngrams, hidden_output)


def save(fname_or_fout, words: list, counts: list,
         vectors_vocab: np.ndarray, vectors_ngrams: np.ndarray,
         hidden_output: np.ndarray, params: dict,
         ntokens: int | None = None, encoding: str = "utf-8") -> None:
    """Write the new-signature layout (_save_to_stream,
    _fasttext_bin.py:612-640): sign, header, dict, quant byte, stacked
    (vocab ‖ ngram) input matrix, quot byte, output matrix."""
    fout = copen(fname_or_fout, "wb") if isinstance(fname_or_fout, str) \
        else fname_or_fout
    fout.write(np.int32(_FASTTEXT_MAGIC).tobytes())
    fout.write(np.int32(_FASTTEXT_VERSION).tobytes())
    for name, fmt in _NEW_HEADER:
        v = params[name]
        fout.write(np.int32(v).tobytes() if fmt == "i"
                   else np.float64(v).tobytes())
    n = len(words)
    fout.write(np.int32(n).tobytes())       # vocab_size
    fout.write(np.int32(n).tobytes())       # nwords (unsupervised: equal)
    fout.write(np.int32(0).tobytes())       # nlabels
    fout.write(np.int64(ntokens if ntokens is not None
                        else int(sum(counts))).tobytes())
    fout.write(np.int64(-1).tobytes())      # pruneidx_size: no pruning
    for w, c in zip(words, counts):
        fout.write(w.encode(encoding))
        fout.write(_END_OF_WORD)
        fout.write(np.int64(c).tobytes())
        fout.write(_WORD_ENTRY_TYPE)
    fout.write(struct.pack("@?", False))    # quant_
    rows = vectors_vocab.shape[0] + vectors_ngrams.shape[0]
    fout.write(struct.pack("@2q", rows, vectors_vocab.shape[1]))
    fout.write(vectors_vocab.astype(np.float32).tobytes())
    fout.write(vectors_ngrams.astype(np.float32).tobytes())
    fout.write(struct.pack("@?", False))    # quot_
    fout.write(struct.pack("@2q", *hidden_output.shape))
    fout.write(hidden_output.astype(np.float32).tobytes())
    if isinstance(fname_or_fout, str):
        fout.close()


def to_fasttext_model(bin_model: FtBin):
    """FtBin → the graft's queryable FastTextModel: split vectors_ngrams
    into the nwords vocab rows + bucket ngram rows (fasttext.py
    _load_fasttext_format), rebuild subword hash lists with the golden
    ngram/FNV semantics, cum_table/sample_ints from the stored counts."""
    from gensim_spark.operators.fasttext import (FastTextModel,
                                                 ft_ngram_hashes)
    from gensim_spark.operators.word2vec import (build_huffman_tree,
                                                 make_cum_table,
                                                 make_sample_ints)

    p = bin_model.params
    nwords = bin_model.nwords
    bucket = p["bucket"]
    dim = p["dim"]
    mat = bin_model.vectors_ngrams
    assert mat.shape == (nwords + bucket, dim), mat.shape
    syn0_vocab = mat[:nwords].astype(np.float64)
    syn0_ngrams = mat[nwords:].astype(np.float64)
    tokens = list(bin_model.raw_vocab)
    counts = np.array([bin_model.raw_vocab[t] for t in tokens],
                      dtype=np.int64)
    # the reference maps the header's loss enum to the objective
    # (fasttext.py:814-815: hs = loss==1, sg = model==2); an hs-trained
    # .bin stores the Huffman INNER-NODE matrix as hidden_output, which
    # must land on syn1, not syn1neg
    hs = int(p.get("loss") == 1)
    sg = int(p.get("model") == 2)
    hidden = bin_model.hidden_output
    syn1 = codes = points = None
    if hs:
        syn1 = (hidden.astype(np.float64) if hidden is not None
                else np.zeros((nwords + bucket, dim)))
        syn1neg = np.zeros((nwords + bucket, dim))
        # rebuilt from the stored counts, like the reference's own
        # prepare-weights path (fastText persists no tree)
        codes, points = build_huffman_tree(counts)
    else:
        syn1neg = (hidden.astype(np.float64) if hidden is not None
                   else np.zeros((nwords + bucket, dim)))
    subwords = [ft_ngram_hashes(t, p["minn"], p["maxn"], bucket)
                for t in tokens]
    model = FastTextModel(
        nwords, dim, bucket, syn0_vocab, syn0_ngrams, syn1neg,
        make_cum_table(counts), make_sample_ints(counts, p["t"]),
        subwords, p["ws"], p["neg"], p["minn"], p["maxn"], seed=1,
        hs=hs, syn1=syn1, codes=codes, points=points)
    model.sg = sg
    model.tokens = tokens
    return model


def load_facebook_model(fname: str, encoding: str = "utf-8",
                        full_model: bool = True):
    """One-call path from a published .bin to the queryable model
    (fasttext.py load_facebook_model/load_facebook_vectors)."""
    return to_fasttext_model(load(fname, encoding=encoding,
                                  full_model=full_model))
