package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins with hot keys (100 TB survival kit): salt the
  * fact side with a deterministic shard and explode the dim side across
  * all shards — the hot key's rows spread over `salts` reducers instead of
  * one straggler. AQE's skew-join handles sort-merge cases adaptively;
  * explicit salting also covers hash-partitioned aggregations and is
  * deterministic for the oracle.
  */
object Skew {

  /** Inner-join `fact` with (small-ish) `dim` on fact(factKey) ==
    * dim(dimKey), salted across `salts` shards.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, salts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(hash(col(factKey), monotonically_increasing_id()), lit(salts)))
    val saltedDim = dim.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(saltedDim,
      saltedFact(factKey) === saltedDim(dimKey) && saltedFact("_salt") === saltedDim("_salt"))
      .drop("_salt")
  }
}
