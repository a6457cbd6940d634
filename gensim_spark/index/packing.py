"""Posting-run packing: sorted doc_ids delta+varint-encoded, float32 weights,
per-block max-weight metadata.

The packed run is the analogue of gensim's CSR index column
(gensim/similarities/docsim.py:1241-1248 stores docs×terms CSR; a CSC column
per term IS a posting run) — re-laid-out for web scale: delta+varint doc-id
blobs compress zipfian gaps to ~1-2 bytes/posting, and the per-block maxima
are the skip structure block-max WAND needs (Ding & Suel, SIGIR'11).

Pure-numpy encode/decode — runs inside mapInPandas during shard builds and
query traversal; no per-row Python.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128


def _varint_encode(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uint64 values → (LEB128 byte array, per-value byte counts)."""
    nbytes = np.maximum((64 - np.uint64(0) - _clz64(vals) + 6) // 7, 1)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    pos = np.concatenate(([0], np.cumsum(nbytes)[:-1])).astype(np.int64)
    rem = vals.copy()
    max_len = int(nbytes.max())
    for b in range(max_len):
        mask = nbytes > b
        idx = pos[mask] + b
        byte = (rem[mask] & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] > b + 1).astype(np.uint8) << 7
        out[idx] = byte | cont
        rem[mask] = rem[mask] >> np.uint64(7)
    return out, nbytes


def encode_varint_deltas(doc_ids: np.ndarray) -> bytes:
    """Sorted int64 doc_ids → delta+varint blob (LEB128, numpy-vectorized)."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    if doc_ids.size == 0:
        return b""
    deltas = np.empty_like(doc_ids)
    deltas[0] = doc_ids[0]
    np.subtract(doc_ids[1:], doc_ids[:-1], out=deltas[1:])
    out, _ = _varint_encode(deltas.astype(np.uint64))
    return out.tobytes()


def _clz64(v: np.ndarray) -> np.ndarray:
    """Count leading zeros of uint64 array (via bit_length emulation)."""
    v = v.astype(np.uint64)
    bl = np.zeros(v.shape, dtype=np.uint64)
    x = v.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = x >= (np.uint64(1) << np.uint64(shift))
        bl[mask] += np.uint64(shift)
        x[mask] = x[mask] >> np.uint64(shift)
    bl[v > 0] += np.uint64(1)  # bit_length
    return np.uint64(64) - bl


def decode_varint_deltas(blob: bytes) -> np.ndarray:
    """Inverse of :func:`encode_varint_deltas` → sorted int64 doc_ids."""
    raw = np.frombuffer(blob, dtype=np.uint8)
    if raw.size == 0:
        return np.empty(0, dtype=np.int64)
    cont = (raw & 0x80) != 0
    ends = np.nonzero(~cont)[0]
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    payload = (raw & 0x7F).astype(np.uint64)
    vals = np.zeros(ends.size, dtype=np.uint64)
    max_len = int(lengths.max())
    for b in range(max_len):
        mask = lengths > b
        vals[mask] |= payload[starts[mask] + b] << np.uint64(7 * b)
    return np.cumsum(vals.astype(np.int64))


def pack_run(doc_ids: np.ndarray, weights: np.ndarray,
             block_size: int = BLOCK_SIZE):
    """One term's postings (sorted by doc_id) → packed run dict:
    doc_blob, weight_blob (float32 LE), n, and per-block skip metadata:
    block_max (float32[]), block_last_doc / block_first_doc (int64[]),
    block_offset (int64[] — byte offset of each block's first varint in
    doc_blob, enabling BLOCK-LAZY decode: a block decodes independently as
    blast[b-1] + cumsum(deltas), so WAND traversal pays decode cost only
    for blocks it actually evaluates)."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    weights = np.asarray(weights, dtype=np.float32)
    n = doc_ids.size
    nblocks = (n + block_size - 1) // block_size
    if n:
        # vectorized per-block stats (a head term has ~n/128 blocks — a
        # Python loop here was the one per-block interpreter pass in the
        # build hot path)
        starts = np.arange(nblocks, dtype=np.int64) * block_size
        ends = np.minimum(starts + block_size, n) - 1
        bmax = np.maximum.reduceat(np.abs(weights), starts)
        blast = doc_ids[ends]
        bfirst = doc_ids[starts]
    else:
        bmax = np.empty(0, dtype=np.float32)
        blast = np.empty(0, dtype=np.int64)
        bfirst = np.empty(0, dtype=np.int64)
    if n:
        deltas = np.empty_like(doc_ids)
        deltas[0] = doc_ids[0]
        np.subtract(doc_ids[1:], doc_ids[:-1], out=deltas[1:])
        out, nbytes = _varint_encode(deltas.astype(np.uint64))
        cum = np.concatenate(([0], np.cumsum(nbytes))).astype(np.int64)
        boffs = cum[np.arange(nblocks) * block_size]
        doc_blob = out.tobytes()
    else:
        boffs = np.empty(0, dtype=np.int64)
        doc_blob = b""
    return {
        "n": int(n),
        "doc_blob": doc_blob,
        "weight_blob": weights.tobytes(),
        "block_max": bmax.tobytes(),
        "block_last_doc": blast.tobytes(),
        "block_first_doc": bfirst.tobytes(),
        "block_offset": boffs.tobytes(),
    }


def decode_block(doc_blob: bytes, block_offsets: np.ndarray,
                 block_last_doc: np.ndarray, b: int) -> np.ndarray:
    """Decode ONLY block ``b`` of a packed run (int64 doc_ids). The delta
    chain crosses block boundaries, but the previous block's last doc is in
    the skip metadata, so the block is self-contained: blast[b-1] +
    cumsum(block deltas)."""
    start = int(block_offsets[b])
    end = (int(block_offsets[b + 1]) if b + 1 < len(block_offsets)
           else len(doc_blob))
    docs = decode_varint_deltas(doc_blob[start:end])
    if b > 0:
        docs = docs + int(block_last_doc[b - 1])
    return docs


def unpack_run(run) -> tuple[np.ndarray, np.ndarray]:
    """Packed run (dict/Row with doc_blob, weight_blob) → (doc_ids, weights)."""
    doc_ids = decode_varint_deltas(bytes(run["doc_blob"]))
    weights = np.frombuffer(bytes(run["weight_blob"]), dtype=np.float32)
    return doc_ids, weights


def unpack_blocks(run) -> tuple[np.ndarray, np.ndarray]:
    bmax = np.frombuffer(bytes(run["block_max"]), dtype=np.float32)
    blast = np.frombuffer(bytes(run["block_last_doc"]), dtype=np.int64)
    return bmax, blast


def unpack_block_lazy_meta(run) -> tuple[np.ndarray, np.ndarray]:
    """(block_first_doc int64[], block_offset int64[]) — the lazy-decode
    sidecar added in pack format v2."""
    bfirst = np.frombuffer(bytes(run["block_first_doc"]), dtype=np.int64)
    boffs = np.frombuffer(bytes(run["block_offset"]), dtype=np.int64)
    return bfirst, boffs
