package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for the cases AQE's skew-join splitting does
  * not cover: a heavily-skewed aggregation key (one chromosome holding
  * half the genome, one language holding half the corpus).
  *
  * Two-phase salted aggregation: phase 1 groups by (key, salt) so the
  * hot key's rows spread over `salts` reducers and combine map-side;
  * phase 2 merges the per-salt partials. Works for any algebraic
  * aggregate (sum/count/min/max); averages decompose into sum+count.
  *
  * The salt is deterministic (hash of stable columns mod salts), so
  * results are reproducible run to run.
  */
object SkewSalt {

  /** Two-phase salted sum/count aggregation.
    *
    * @param df       input
    * @param keys     skewed grouping keys
    * @param saltSrc  stable column(s) to derive the salt from
    * @param salts    fan-out per key
    * @param sums     columns to sum
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], saltSrc: Seq[Column],
                     salts: Int, sums: Seq[String]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(saltSrc: _*), lit(salts)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__cnt"),
        sums.map(c => sum(col(c)).as(s"__sum_$c")): _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__cnt")).as("cnt"),
        sums.map(c => sum(col(s"__sum_$c")).as(s"sum_$c")): _*)
  }
}
