package graft

import org.apache.spark.sql.functions._
import graft.sources.CsvCorpus

/** t21's dialect contract: the CSV writer/reader pair must round-trip
  * exactly the value classes CSV tooling historically mangles.
  */
class CsvSpec extends SparkSpec {
  import spark.implicits._

  private def roundTrip(rows: Seq[(Long, String)]): Map[Long, String] = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val df = rows.toDF("id", "text")
    CsvCorpus.write(df, tmp)
    CsvCorpus.clean(CsvCorpus.readCorpus(spark, tmp, df.schema))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("quotes, commas, and embedded newlines round-trip byte-exactly") {
    val rows = Seq(
      1L -> "plain text",
      2L -> "comma, inside",
      3L -> "she said \"hi\" twice \"\"",
      4L -> "line one\nline two\r\nline three",
      5L -> "unicode café 日本語 😀",
      6L -> "trailing space  ")
    roundTrip(rows) shouldBe rows.toMap
  }

  test("NULL and the empty string stay distinct; the null token is reserved") {
    val rows = Seq(1L -> "", 2L -> null.asInstanceOf[String], 3L -> "x",
      4L -> "\\N")
    val got = roundTrip(rows)
    got(1L) shouldBe ""
    got(2L) shouldBe null.asInstanceOf[String]
    got(3L) shouldBe "x"
    // the documented dialect trade: a literal field equal to the \N token
    // reads back as NULL (quoting does not shield it)
    got(4L) shouldBe null.asInstanceOf[String]
  }

  test("malformed rows are quarantined with the raw line, not fatal") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val df = Seq((1L, "good", 10L), (2L, "also good", 20L)).toDF("id", "text", "n")
    CsvCorpus.write(df, tmp)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$tmp/part-bad.csv"),
      "id,text,n\nnot-a-number,oops,30\n3,fine,not-a-count\n")
    val parsed = CsvCorpus.readCorpus(spark, tmp, df.schema).cache()
    CsvCorpus.clean(parsed).orderBy($"id").as[(Long, String, Long)].collect() shouldBe
      Array((1L, "good", 10L), (2L, "also good", 20L))
    parsed.where(col(graft.sources.Jsonl.CorruptCol).isNotNull).count() shouldBe 2L
    parsed.unpersist()
  }
}
