package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salting correctness: the skew-dispersal rewrites must be result-
  * equivalent to their plain formulations (only shuffle layout differs).
  */
class SkewSpec extends SparkSpec {
  import graft.implicits._

  test("saltedJoin equals the plain join on a degenerate 3-value key") {
    val big = table("lineitem")
      .select($"l_returnflag".as("flag"), $"l_orderkey", $"l_quantity")
    val small = table("lineitem").select($"l_returnflag".as("flag")).distinct()
      .withColumn("code", concat(lit("F-"), $"flag"))
    val plain = big.join(small, "flag")
    val salted = Skew.saltedJoin(big, small, "flag", 8)
    salted.count() shouldBe plain.count()
    salted.except(plain).count() shouldBe 0
    plain.except(salted).count() shouldBe 0
  }

  test("saltedDistinctCount equals countDistinct per group") {
    val want = table("events").groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n_distinct"))
    val got = Skew.saltedDistinctCount(table("events"), "event_type", "user_id", 16)
    got.count() shouldBe want.count()
    got.except(want).count() shouldBe 0
  }
}
