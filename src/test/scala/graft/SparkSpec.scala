package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** One shared local session for the whole suite (sbt forks a single test
  * JVM); 4 threads keeps spec latency low while still exercising
  * multi-partition shuffles.
  */
object TestSession {
  lazy val spark: SparkSession = Session.build("graft-test", "4")
}

trait SparkSpec extends AnyFunSuite with Matchers {
  lazy val spark: SparkSession = TestSession.spark
  lazy val sf0001 = "/root/testdata/sf0.001"
  def table(name: String): DataFrame = graft.sources.Tables(spark, sf0001, name)
}
