"""Index integrity audit: a decode-and-verify pass over the compressed
segment table.

The reference (flame.py) rebuilds its artifacts from scratch per run
and has no index-maintenance surface; a 100 TB inverted index that is
built incrementally (incremental.py), served live (serving.py), and
merged/compacted over months needs a way to PROVE a segment table is
internally consistent and still agrees with the corpus. This module is
that audit:

- ``audit_segment_stats(segments)`` decodes EVERY posting blob
  (varbyte doc gaps + varbyte tfs + raw float64 scores) and verifies,
  per segment row: stored ``n_docs`` == decoded lengths of all three
  streams, stored ``first_doc``/``last_doc`` == decoded endpoints,
  doc ids strictly increasing (gaps positive after the head), tfs
  positive, and the stored ``block_max`` array BIT-IDENTICAL to
  ``np.maximum.reduceat`` over the decoded scores at BLOCK_SIZE
  boundaries (a wrong block max silently breaks WAND pruning — it
  would skip scoring blocks that contain the true top-k). Any
  violation raises ``IndexAuditError`` naming the (shard, term).
- The surviving rows aggregate to per-term ``(term, df, cf)`` across
  shards, which the registry gate compares against the corpus-level
  SQL ground truth — so the audit checks BOTH self-consistency of the
  stored bytes and agreement with the data the index claims to cover.

Scale shape: embarrassingly parallel — one pass over the segment
table, no shuffle until the final per-term (tiny: vocabulary-sized)
aggregation. The decode is per-(shard, term) NumPy vectorized; this is
a maintenance scan (run after merges / before purges), not a query
path, so a Python loop over segment rows inside each Arrow batch is
the right cost point.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .constants import BLOCK_SIZE
from .segments import varbyte_decode


class IndexAuditError(AssertionError):
    """A segment row's stored metadata contradicts its decoded bytes."""


def audit_segment_stats(segments: DataFrame) -> DataFrame:
    """Decode + verify every segment row; -> (term, df, cf) per term
    aggregated across shards (df = postings count, cf = sum of tfs).
    Raises IndexAuditError (inside the job) on any inconsistency.
    """

    def scan(batches):
        for pdf in batches:
            terms, dfs, cfs = [], [], []
            for shard, term, n_docs, first, last, db, tb, sb, bmax in zip(
                pdf["shard"].values,
                pdf["term"].values,
                pdf["n_docs"].values,
                pdf["first_doc"].values,
                pdf["last_doc"].values,
                pdf["doc_deltas"].values,
                pdf["tfs"].values,
                pdf["scores"].values,
                pdf["block_max"].values,
            ):
                where = f"segment (shard={shard}, term={term})"
                deltas = varbyte_decode(bytes(db)).astype(np.int64)
                tfs = varbyte_decode(bytes(tb)).astype(np.int64)
                scores = np.frombuffer(bytes(sb), dtype=np.float64)
                n = deltas.size
                if n == 0:
                    raise IndexAuditError(f"{where}: empty posting list")
                if not (n == n_docs == tfs.size == scores.size):
                    raise IndexAuditError(
                        f"{where}: stream lengths diverge "
                        f"(n_docs={n_docs}, docs={n}, tfs={tfs.size}, "
                        f"scores={scores.size})"
                    )
                docs = np.cumsum(deltas)
                if docs[0] != first or docs[-1] != last:
                    raise IndexAuditError(
                        f"{where}: doc range [{docs[0]}, {docs[-1]}] != "
                        f"stored [{first}, {last}]"
                    )
                if n > 1 and deltas[1:].min() <= 0:
                    raise IndexAuditError(
                        f"{where}: doc ids not strictly increasing"
                    )
                if tfs.min() <= 0:
                    raise IndexAuditError(f"{where}: non-positive tf")
                bm = np.maximum.reduceat(scores, np.arange(0, n, BLOCK_SIZE))
                stored = np.asarray(bmax, dtype=np.float64)
                if stored.size != bm.size or not np.array_equal(stored, bm):
                    raise IndexAuditError(
                        f"{where}: block_max != maximum.reduceat(scores) "
                        f"(stored {stored.size} blocks, expect {bm.size})"
                    )
                terms.append(int(term))
                dfs.append(int(n))
                cfs.append(int(tfs.sum()))
            yield pd.DataFrame(
                {
                    "term": pd.Series(terms, dtype="int64"),
                    "df": pd.Series(dfs, dtype="int64"),
                    "cf": pd.Series(cfs, dtype="int64"),
                }
            )

    per_shard = segments.mapInPandas(scan, "term long, df long, cf long")
    return per_shard.groupBy("term").agg(
        F.sum("df").cast("long").alias("df"),
        F.sum("cf").cast("long").alias("cf"),
    )
