package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY "Partitioning & shuffle ... salting
  * for skew"). AQE's runtime skew-join splitting handles most cases; the
  * explicit salt is for the planned-ahead variant (e.g. a known hot key in
  * a 100 TB fact table joining a replicable dimension).
  */
object Skew {

  /** Salted equi-join of a skewed `fact` against a small-ish `dim`:
    * the fact side gets a random salt in [0, salts), the dim side is
    * replicated `salts` times, and the join key becomes (key, salt) —
    * hot keys spread over `salts` reducers instead of one.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    // right/full outer would emit unmatched dim rows once PER SALT (the dim
    // side is replicated `salts` times) — restrict to the shapes where
    // replication is invisible in the output
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
                "leftsemi", "left_anti", "leftanti").contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left/left_semi/left_anti joins, got '$joinType'")
    val saltedFact = fact.withColumn("__salt", (rand(seed = 42) * salts).cast("int"))
    val saltedDim = dim.withColumn("__salt",
        explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
