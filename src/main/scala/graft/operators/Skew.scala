package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation for hot join keys.
  *
  * AQE's skew-join splitting (on by default, see GraftSession) handles
  * sort-merge joins; this utility covers the cases AQE can't — e.g. a
  * broadcast-ineligible dimension joined on a key where one value holds
  * a double-digit percent of the fact table. The fact side is scattered
  * across `salts` sub-keys by a deterministic hash of a high-cardinality
  * column; the dimension side is replicated `salts` times. Result is
  * row-identical to the plain join, but the hot key's rows spread over
  * `salts` reducers instead of one.
  */
object Skew {

  /** Equi-join `fact ⋈ dim` on `key`, salted. `scatterCol` must be a
    * fact column with high cardinality (e.g. a unique id) so the salt
    * spreads evenly.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 scatterCol: String, salts: Int = 8,
                 joinType: String = "inner"): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(col(scatterCol)), lit(salts)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
