package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The driver smoke-checks `SparkEntry.entry` with a session graft did not
  * build — no graft parquet configs, default NTZ timestamp inference. The
  * flagship query must still work there.
  */
class VanillaSessionSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[2]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("entry runs under a vanilla session (NTZ timestamps)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
