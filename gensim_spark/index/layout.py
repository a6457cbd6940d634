"""Sharded index layout + checkpointed build.

Physical design (SURVEY.md §2.5/§7.1 M4; reference analogue:
``gensim.similarities.Similarity`` doc-range shards, docsim.py:260-758):

- **Doc-range shards**: ``shard_id = doc_id // docs_per_shard`` — every shard
  holds complete documents (all their terms), so top-k is computable per
  shard and merged (two-stage top-k), exactly gensim's shard query fan-out
  (docsim.py:480-503) as a Spark scan.
- **Packed runs**: within a shard, one row per term: sorted doc_ids
  delta+varint packed + float32 weights + block-max skip metadata
  (``packing.py``). Parquet (partitioned by shard_id) stands in for the
  Iceberg shard tables — same layout, same pruning, no extra runtime dep;
  min/max stats on ``term_id`` give run-level pruning inside each shard file.
- **Term-bucketed plain postings** (``write_postings_bucketed``): the
  relational scoring path — postings bucketed by ``term_id % n_buckets`` so a
  query's scan prunes to its terms' buckets; **head-term salting** splits any
  term with df above a threshold across ``salt`` sub-partitions to bound the
  largest shuffle/file partition (explicit skew handling; the salt column is
  part of the layout, queries just aggregate across salts).
- **Checkpoint manifest**: the build commits shard-groups one at a time and
  records lineage + metrics per group in ``manifest.json``; a re-run skips
  committed groups (resume-from-checkpoint).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gensim_spark.index import packing

PACKED_SCHEMA = (
    "shard_id long, term_id long, n long, doc_blob binary, weight_blob binary,"
    " block_max binary, block_last_doc binary"
)


def _pack_partition(pdf_iter):
    """Arrow batches of (shard_id, term_id, doc_id, weight), sorted by
    (shard_id, term_id, doc_id) within the partition → packed run rows.
    Handles run spans across batch boundaries with a carry buffer."""
    carry = None  # (shard_id, term_id, doc_ids list, weights list)

    def flush(shard_id, term_id, docs, weights):
        run = packing.pack_run(np.asarray(docs), np.asarray(weights))
        return {
            "shard_id": shard_id, "term_id": term_id, "n": run["n"],
            "doc_blob": run["doc_blob"], "weight_blob": run["weight_blob"],
            "block_max": run["block_max"],
            "block_last_doc": run["block_last_doc"],
        }

    for pdf in pdf_iter:
        if pdf.empty:
            continue
        out = []
        keys = pdf[["shard_id", "term_id"]].to_numpy()
        docs = pdf["doc_id"].to_numpy()
        ws = pdf["weight"].to_numpy()
        # boundaries where (shard, term) changes
        change = np.nonzero(
            (keys[1:, 0] != keys[:-1, 0]) | (keys[1:, 1] != keys[:-1, 1])
        )[0] + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(pdf)]))
        for s, e in zip(starts, ends):
            sid, tid = int(keys[s, 0]), int(keys[s, 1])
            if carry is not None and carry[0] == sid and carry[1] == tid:
                carry = (sid, tid,
                         np.concatenate((carry[2], docs[s:e])),
                         np.concatenate((carry[3], ws[s:e])))
            else:
                if carry is not None:
                    out.append(flush(*carry))
                carry = (sid, tid, docs[s:e].copy(), ws[s:e].copy())
        # all groups except the (possibly continuing) last are final, but we
        # cannot know the last ends here — keep it in carry until next batch
        if out:
            yield pd.DataFrame(out)
    if carry is not None:
        yield pd.DataFrame([flush(*carry)])


def write_packed_shards(weighted: DataFrame, out_dir: str,
                        docs_per_shard: int = 32768,
                        num_groups: int = 8,
                        resume: bool = True) -> dict:
    """weighted (doc_id, term_id, weight) → packed shard tables under
    ``out_dir`` with a per-group checkpoint manifest.

    Shards are built in ``num_groups`` commit units (group = shard_id %
    num_groups). Each unit is one Spark job: filter → repartition by shard →
    sort within partitions by (term, doc) → pack (mapInPandas) → append
    parquet partitioned by shard_id. A killed build resumes by skipping
    committed groups recorded in ``manifest.json`` (lineage + metrics).

    docs_per_shard default mirrors the reference shardsize 32768
    (docsim.py:305).
    """
    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "manifest.json")
    manifest = {"params": {"docs_per_shard": docs_per_shard,
                           "num_groups": num_groups},
                "groups": {}}
    if resume and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
        if manifest["params"]["docs_per_shard"] != docs_per_shard:
            raise ValueError("resume with different docs_per_shard")

    base = weighted.withColumn(
        "shard_id", (F.col("doc_id") / F.lit(docs_per_shard)).cast("long")
    )
    data_dir = os.path.join(out_dir, "data")
    for g in range(num_groups):
        key = str(g)
        if manifest["groups"].get(key, {}).get("committed"):
            continue
        t0 = time.perf_counter()
        # exactly-once resume: each group owns its subdirectory; an
        # uncommitted (crashed mid-write) group is wiped before rewriting,
        # so re-running after any failure never duplicates rows.
        group_dir = os.path.join(data_dir, f"group={g}")
        if os.path.exists(group_dir):
            import shutil

            shutil.rmtree(group_dir)
        part = base.filter(F.pmod(F.col("shard_id"), F.lit(num_groups)) == g)
        packed = (
            part.repartition("shard_id")
            .sortWithinPartitions("shard_id", "term_id", "doc_id")
            .mapInPandas(_pack_partition, schema=PACKED_SCHEMA)
        )
        (packed.write.mode("overwrite").partitionBy("shard_id")
         .parquet(group_dir))
        agg = part.groupBy().agg(
            F.countDistinct("doc_id").alias("docs"),
            F.countDistinct("term_id").alias("terms"),
            F.count(F.lit(1)).alias("postings"),
        ).collect()[0]
        manifest["groups"][key] = {
            "committed": True,
            "docs": agg["docs"], "terms": agg["terms"],
            "postings": agg["postings"],
            "wall_sec": round(time.perf_counter() - t0, 2),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        with open(manifest_path, "w") as f:
            json.dump(manifest, f, indent=1)
    return manifest


def read_packed_shards(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "data"))


# --- term-bucketed plain postings (relational path) --------------------------

def write_postings_bucketed(weighted: DataFrame, out_dir: str,
                            n_buckets: int = 64,
                            salt_threshold: int = 1_000_000,
                            dfs: DataFrame | None = None,
                            salts: int = 16) -> None:
    """Plain postings partitioned by ``bucket = term_id % n_buckets`` with
    explicit head-term salting: terms with df ≥ salt_threshold additionally
    split on ``salt = doc_id % salts`` so no single write partition (and no
    single parquet file) is df-sized. Query-side pruning: a term's postings
    live only in its bucket directory (+ min/max term_id row-group stats).
    """
    df = weighted.withColumn(
        "bucket", F.pmod(F.col("term_id"), F.lit(n_buckets))
    )
    if dfs is not None:
        heads = dfs.filter(F.col("df") >= salt_threshold).select("term_id")
        df = df.join(F.broadcast(heads.withColumn("_head", F.lit(1))),
                     "term_id", "left")
        salt = F.when(F.col("_head").isNotNull(),
                      F.pmod(F.col("doc_id"), F.lit(salts))).otherwise(F.lit(0))
        df = df.withColumn("salt", salt).drop("_head")
    else:
        df = df.withColumn("salt", F.lit(0))
    (
        df.repartition("bucket", "salt")
        .sortWithinPartitions("term_id", "doc_id")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(out_dir)
    )


def read_postings_bucketed(spark: SparkSession, out_dir: str,
                           term_ids: list[int] | None = None,
                           n_buckets: int = 64) -> DataFrame:
    """Scan pruned to the query terms' buckets + term_id pushdown."""
    df = spark.read.parquet(out_dir)
    if term_ids:
        buckets = sorted({t % n_buckets for t in term_ids})
        df = df.filter(F.col("bucket").isin(buckets)).filter(
            F.col("term_id").isin([int(t) for t in term_ids])
        )
    return df
