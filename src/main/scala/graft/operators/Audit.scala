package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.NumFunctions

/** Declarative data-quality constraint audit — the expectation report a
  * pipeline runs before trusting a load (the dbt-test / Deequ-style
  * surface, re-expressed as plain aggregates): per constraint, the row
  * count, the violation count, and the violation rate. The reference
  * pipeline trusts its feeds blindly (`run.py` drops malformed JSON and
  * nothing else); production ingest wants the checks in the engine.
  *
  * Constraint classes:
  *  - `NotNull(col)` — null values
  *  - `InRange(col, lo, hi)` — non-null values outside [lo, hi]
  *    (nulls are NOT range violations; declare NotNull separately)
  *  - `UniqueKey(cols)` — rows beyond the first per key (n − distinct)
  *  - `ForeignKey(col, parent, parentCol, name)` — non-null child keys
  *    with no parent row (orphans)
  *
  * Scale design: every row-local constraint (NotNull/InRange) folds
  * into ONE conditional-sum aggregate — a single scan of the table
  * whatever the constraint count. UniqueKey is a two-level distinct
  * (partial-aggregating, no row expansion); ForeignKey is a left-anti
  * join that AQE broadcasts when the parent is small and
  * shuffle-joins otherwise. Results union as 1-row frames —
  * metadata-scale.
  */
object Audit {

  sealed trait Constraint
  final case class NotNull(col: String) extends Constraint
  final case class InRange(col: String, lo: Double, hi: Double) extends Constraint
  final case class UniqueKey(cols: Seq[String]) extends Constraint
  final case class ForeignKey(col: String, parent: DataFrame,
                              parentCol: String, parentName: String) extends Constraint

  /** Audit `df` against `constraints`; one output row per constraint:
    * `(table_name, check_name, n_rows, n_violations, violation_rate)`
    * with the rate rounded to 6 places.
    */
  def audit(df: DataFrame, tableName: String,
            constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "need at least one constraint")
    val rowLocal: Seq[(String, Column)] = constraints.collect {
      // coalesce: sum over an EMPTY table is null, and the audit of an
      // empty load must read "0 violations", not null
      case NotNull(c) =>
        s"not_null($c)" ->
          coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
      case InRange(c, lo, hi) =>
        s"in_range($c,$lo,$hi)" ->
          coalesce(sum(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1L)
            .otherwise(0L)), lit(0L))
    }
    val base =
      if (rowLocal.isEmpty) Seq.empty[DataFrame]
      else {
        // positional internal aliases — check names carry dots/parens
        // that col() would misread as struct paths. The 1-row aggregate
        // EXPLODES into per-check rows inside one plan branch: reusing
        // the aggregate as a separate union branch per check would let
        // column pruning clone it into N scans of the table.
        val aggs = count(lit(1)).as("__n") +:
          rowLocal.zipWithIndex.map { case ((_, c), i) => c.as(s"__v_$i") }
        val one = df.agg(aggs.head, aggs.tail: _*)
        val items = array(rowLocal.zipWithIndex.map { case ((name, _), i) =>
          struct(lit(name).as("check_name"),
            col(s"__v_$i").as("n_violations"))
        }: _*)
        Seq(one
          .select(col("__n").as("n_rows"), explode(items).as("__c"))
          .select(lit(tableName).as("table_name"),
            col("__c.check_name").as("check_name"), col("n_rows"),
            col("__c.n_violations").as("n_violations")))
      }
    val uniques = constraints.collect { case UniqueKey(cols) =>
      df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__c"))
        .agg(sum(col("__c")).as("__n"), count(lit(1)).as("__d"))
        .select(lit(tableName).as("table_name"),
          lit(s"unique(${cols.mkString(",")})").as("check_name"),
          coalesce(col("__n"), lit(0L)).as("n_rows"),
          (coalesce(col("__n"), lit(0L)) - col("__d")).as("n_violations"))
    }
    val fks = constraints.collect { case ForeignKey(c, parent, pc, pname) =>
      val keys = df.select(col(c)).filter(col(c).isNotNull)
      val orphans = keys.join(parent.select(col(pc).as(c)).distinct(),
          Seq(c), "left_anti")
        .agg(count(lit(1)).as("__o"))
      df.agg(count(lit(1)).as("__n")).crossJoin(orphans)
        .select(lit(tableName).as("table_name"),
          lit(s"fk($c->$pname.$pc)").as("check_name"),
          col("__n").as("n_rows"), col("__o").as("n_violations"))
    }
    (base ++ uniques ++ fks)
      .reduce(_ unionByName _)
      .withColumn("violation_rate",
        NumFunctions.roundNz(
          when(col("n_rows") > 0,
            col("n_violations").cast("double") / col("n_rows"))
            .otherwise(lit(0.0)), 6))
  }
}
