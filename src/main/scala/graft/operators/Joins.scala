package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation joins for 100 TB fact tables.
  *
  * The first tool for a skewed shuffle join is AQE's runtime skew-join
  * splitting (on by default in [[graft.GraftSession]]); the second is a
  * broadcast when the dimension fits. Salting is the third: when the
  * dimension is too big to broadcast AND the skew is known/extreme (a
  * handful of hot keys holding most of the fact rows — a hot camera, a
  * null-ish default key), pre-splitting the hot key across `factor`
  * shuffle partitions bounds the largest task deterministically, at plan
  * time, rather than trusting runtime re-splits.
  *
  * Mechanics: the fact side gets a deterministic per-row salt in
  * `[0, factor)`; the dimension side is replicated `factor` times (one
  * copy per salt value — dimension rows are the SMALL side of the salt
  * trade); the equi-join adds the salt to the key list, so each hot key's
  * rows spread over `factor` reducers instead of one.
  */
object Joins {

  /** Salted equi-join. `saltOf` must be a deterministic per-fact-row
    * expression (e.g. `hash(fact primary key)`) — determinism keeps
    * results replay-stable and oracle-checkable; entropy, not semantics,
    * is all the salt needs. `factor` multiplies the dimension's row count
    * and should track the hot key's share of rows over the average
    * (8–64 in practice), not cluster size.
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, keys: Seq[String],
                 saltOf: Column, factor: Int,
                 joinType: String = "inner"): DataFrame = {
    require(factor >= 1, s"salt factor must be >= 1, got $factor")
    // the dimension is replicated: an unmatched dim row exists `factor`
    // times, so any join type that EMITS unmatched dim rows (right/full)
    // would duplicate them — fact-preserving types only
    val normalized = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")(normalized),
      s"saltedJoin supports fact-preserving join types (inner/left/semi/anti), got: $joinType")
    val salted = facts.withColumn("__salt", pmod(saltOf, lit(factor)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
