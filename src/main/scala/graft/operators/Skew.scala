package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted join. AQE's skew-join handles most cases at
  * runtime; explicit salting remains the tool when one key dominates so
  * hard that even split sub-partitions overwhelm a task (the classic
  * power-law user_id at 100 TB).
  *
  * The big side gets a uniform salt in [0, salt); the small side is
  * replicated `salt` ways; joining on (key, salt) splits each hot key's
  * rows across `salt` tasks. Result is row-identical to the plain join.
  */
object Skew {

  def saltedJoin(big: DataFrame, small: DataFrame, joinExpr: Column,
      salt: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt)).cast("int"))
    val expandedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedBig.join(expandedSmall,
        joinExpr && saltedBig("__salt") === expandedSmall("__salt"))
      .drop("__salt")
  }
}
