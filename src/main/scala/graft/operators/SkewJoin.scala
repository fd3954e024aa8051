package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigating equi-join: salt the skewed (large) side so one hot key
  * spreads over `salts` shuffle partitions, replicate the small side
  * across all salt values, join on (key, salt).
  *
  * When to use: AQE's skew-join splitting (enabled in Engine.session)
  * already rescues sort-merge joins at runtime; this helper covers the
  * shapes AQE can't split — skewed aggregation feeding a join, or an
  * explicit repartition-by-key pipeline — and makes the salting pattern
  * available as a first-class operator. Result is row-identical to the
  * plain join (SkewJoinSpec asserts equality).
  *
  * Scale: small side grows ×salts (must stay broadcast-or-small); large
  * side gains one codegen'd column. Salt values are deterministic
  * per-row (hash of all large-side columns), so retries/speculative
  * tasks stay consistent.
  */
object SkewJoin {

  def saltedJoin(large: DataFrame, small: DataFrame, key: String, salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // Only inner/left are row-identical to the plain join: for right/full
    // outer, unmatched small-side rows are replicated across all salts and
    // would survive null-extended `salts` times; semi/anti shapes break
    // after the column drops. Salting those shapes needs a re-dedupe pass
    // this operator deliberately does not hide.
    val jt = joinType.toLowerCase.replace("_", "")
    require(jt == "inner" || jt == "left" || jt == "leftouter",
      s"saltedJoin supports inner/left joins only, got '$joinType'")
    val saltCol = "__graft_salt"
    val largeSalted = large.withColumn(
      saltCol, pmod(xxhash64(large.columns.map(col).toIndexedSeq: _*), lit(salts.toLong)))
    val smallReplicated = small.withColumn(
      saltCol, explode(sequence(lit(0L), lit(salts.toLong - 1))))
    largeSalted
      .join(smallReplicated,
        largeSalted(key) === smallReplicated(key) &&
          largeSalted(saltCol) === smallReplicated(saltCol),
        joinType)
      .drop(smallReplicated(key))
      .drop(largeSalted(saltCol)).drop(smallReplicated(saltCol))
  }
}
