package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}

/** The DELETE verb of the persisted-index lifecycle — the tombstone
  * ledger every serving index family shares (minhash, gram, BM25,
  * pHash, IVF², IVF-PQ).
  *
  * A training-data pipeline must honor takedowns and opt-outs without
  * paying an O(index) rebuild per request, so removal is split into the
  * two phases a log-structured store uses:
  *
  *  - LOGICAL, immediate: removed ids append to a tiny ledger table
  *    (`{prefix}_tomb`); every probe/search/refit anti-joins its
  *    id-carrying index relations against the ledger. The ledger is
  *    takedown-sized, so the anti-join BROADCASTS — the index side's
  *    exchange-free topology is untouched, and the per-probe cost is
  *    O(ledger), not O(index).
  *  - PHYSICAL, amortized: the family's compaction rewrite (which the
  *    maintained-ingest streams already fire under the bucketFileAudit
  *    gate) drops tombstoned rows while rewriting files it was going to
  *    rewrite anyway, then clears the ledger. Takedowns therefore never
  *    trigger their own corpus rewrite; they ride the one that file
  *    hygiene was already paying for.
  *
  * Same single-writer contract as every swap in this engine
  * (Engine.compactBucketedTable): tombstones appended WHILE a reclaim
  * rewrite is in flight would be cleared without being applied — a
  * maintained-ingest stream satisfies the contract because foreachBatch
  * serializes the batch that appends, reclaims and clears. */
object Takedown {

  def tombTable(prefix: String): String = s"${prefix}_tomb"

  private def exists(s: SparkSession, prefix: String): Boolean =
    s.sessionState.catalog.tableExists(
      org.apache.spark.sql.catalyst.TableIdentifier(tombTable(prefix)))

  /** Append removal ids to the ledger. `ids` is any single-column
    * relation (doc ids, asset ids, vector ids — the family's id type);
    * the column is normalized to `id` so every family reads one shape.
    * Idempotent at probe time (anti-join semantics make duplicate
    * ledger rows harmless); the physical reclaim collapses them away. */
  def add(s: SparkSession, prefix: String, ids: DataFrame): Unit = {
    require(ids.columns.length == 1,
      s"tombstone ids must be a single-column relation, got ${ids.columns.toSeq}")
    ids.toDF("id").write.mode("append").format("parquet")
      .saveAsTable(tombTable(prefix))
  }

  /** The ledger relation — empty (but well-typed against `like`'s id
    * column) when no takedown has ever been filed, so callers compose
    * without an existence check. */
  def ids(s: SparkSession, prefix: String, like: DataFrame, idCol: String): DataFrame =
    if (exists(s, prefix)) s.table(tombTable(prefix))
    else like.select(col(idCol).as("id")).limit(0)

  /** Anti-join `tbl` against the ledger on `idCol` — the probe-time
    * logical delete. When no ledger exists the relation passes through
    * UNTOUCHED (zero plan change — the plan-quality pins on the
    * tombstone-free paths stay byte-identical); when it does, the
    * ledger broadcasts, so the index side keeps its bucketing and
    * never exchanges. */
  def excluding(tbl: DataFrame, prefix: String, idCol: String): DataFrame = {
    val s = tbl.sparkSession
    if (!exists(s, prefix)) tbl
    else tbl.join(broadcast(s.table(tombTable(prefix))),
      tbl(idCol) === col("id"), "left_anti")
  }

  /** Drop the ledger after a physical reclaim has rewritten every
    * table of the family — the ids are gone from the files, so the
    * probe-time anti-join has nothing left to do. */
  def clear(s: SparkSession, prefix: String): Unit =
    if (exists(s, prefix)) Engine.reclaimManagedTable(s, tombTable(prefix))

  /** True when a reclaim has pending work — used by the maintained
    * ingests to report whether the audit-gated rewrite also reclaimed
    * tombstones. One metadata call + (when the table exists) a
    * ledger-sized emptiness probe. */
  def pending(s: SparkSession, prefix: String): Boolean =
    exists(s, prefix) && !s.table(tombTable(prefix)).isEmpty
}
