package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.functions.WeightedAvg

class AggregatorSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local(2)

  override def afterAll(): Unit = spark.stop()

  test("WeightedAvg aggregator computes the exact weighted mean") {
    import spark.implicits._
    val ds = Seq((10.0, 1.0), (20.0, 3.0), (40.0, 1.0)).toDS()
    val got = ds.select(WeightedAvg.toColumn).head()
    assert(math.abs(got - (10.0 + 60.0 + 40.0) / 5.0) < 1e-12)
  }

  test("WeightedAvg registered as a udaf works in untyped groupBy") {
    import spark.implicits._
    val wavg = udaf(WeightedAvg)
    val df = Seq(("a", 10.0, 1.0), ("a", 30.0, 1.0), ("b", 5.0, 2.0))
      .toDF("k", "v", "w")
    val got = df.groupBy($"k")
      .agg(wavg($"v", $"w").as("wa"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("a") == 20.0)
    assert(got("b") == 5.0)
  }

  test("WeightedAvg is order-independent across partitionings") {
    import spark.implicits._
    val data = (1 to 1000).map(i => (i * 0.37, (i % 7 + 1) * 0.5))
    val a = data.toDS().repartition(1).select(WeightedAvg.toColumn).head()
    val b = data.toDS().repartition(13).select(WeightedAvg.toColumn).head()
    assert(a == b)
  }
}
