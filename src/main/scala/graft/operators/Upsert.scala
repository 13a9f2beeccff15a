package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keep-latest-per-key compaction — the read side of MERGE/upsert on
  * append-only storage (the reference's sink is append-only BigQuery;
  * compaction is how an append log becomes current-state). Union the base
  * snapshot with update batches, each row carrying a version (batch id,
  * commit ts, …), and keep the highest-version row per key.
  *
  * Scale design: one keyed window (partitionBy the key — never global),
  * ≤ 1 row out per key; at warehouse scale this is the standard
  * "merge-on-read" query, run either ad hoc or to rewrite the compacted
  * snapshot. Determinism contract: (versionCol, tieCols) must be unique
  * within a key — rows tied on the full ordering get an ARBITRARY
  * (partition-order-dependent) survivor, the same contract as
  * dropDuplicates. Pass a unique tie-break (ingest id, file offset) when
  * versions alone can collide.
  */
object Upsert {

  /** @param rows     base ∪ updates, all carrying `versionCol`
    * @param keyCols  identity columns (the MERGE ON key)
    * @param tieCols  deterministic tie-break within equal versions
    */
  def keepLatest(rows: DataFrame, keyCols: Seq[String], versionCol: String,
                 tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "keepLatest needs at least one key column")
    require(!rows.columns.contains("_rn"),
      "keepLatest reserves the internal column name _rn")
    val order = (col(versionCol).desc +: tieCols.map(col(_).desc)).toIndexedSeq
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    rows.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Slowly-changing-dimension type 2 reconstruction — the HISTORY view of
    * the same append log [[keepLatest]] compacts to current state: every
    * (key, version) row becomes a validity interval
    * `[valid_from = its version, valid_to = the key's next version)`,
    * open-ended (`valid_to` NULL, `is_current` true) on the latest row.
    * The point-in-time join "what did this dimension row say when the
    * fact happened" is then a plain range predicate
    * `valid_from <= v AND (valid_to IS NULL OR v < valid_to)`.
    *
    * Scale design: ONE keyed window (`lead` over partitionBy key), zero
    * extra shuffles beyond it, output = input rows — history tables are
    * what the log already is, just annotated. Same uniqueness contract as
    * [[keepLatest]]: versions must be unique within a key (duplicate
    * versions would make `lead` partition-order-dependent).
    */
  def scd2History(rows: DataFrame, keyCols: Seq[String],
                  versionCol: String): DataFrame = {
    require(keyCols.nonEmpty, "scd2History needs at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(versionCol).asc)
    rows.withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
