package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM per `sbt test` fork; the
  * session is created once and reused — never stopped mid-run). */
trait SparkTestBase extends AnyFunSuite {
  protected lazy val spark: SparkSession = SparkTestBase.session
  protected val sfDir = "/root/testdata/sf0.001"
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    engine.Tables.bootstrap(s)
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
