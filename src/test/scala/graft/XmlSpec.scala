package graft

import org.apache.spark.sql.functions._

/** t30's XML interchange: Spark 4's built-in XML source as a corpus
  * round-trip format. The identity gate proves layout invisibility at
  * the corpus level; this spec pins the two failure classes the gate's
  * options exist to prevent — edge-whitespace trimming and markup
  * escaping — on adversarial fixtures the synthetic corpus is too tame
  * to contain.
  */
class XmlSpec extends SparkSpec {
  import spark.implicits._

  private val nasty = Seq(
    (1L, "  leading and trailing  ", "en"),
    (2L, "line\nbreaks\nand\ttabs", "en"),
    (3L, "markup <b>&amp;</b> \"quotes\" 'apos' ]]> done", "de"),
    (4L, "unicode café ß 𝕏", "fr"))

  private def roundTrip(opts: Map[String, String]) = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_xmlspec").toString
    val df = nasty.toDF("doc_id", "text", "lang")
    df.write.mode("overwrite").format("xml")
      .option("rootTag", "corpus").option("rowTag", "doc").save(tmp)
    val rd = spark.read.schema(df.schema).format("xml").option("rowTag", "doc")
    opts.foldLeft(rd) { case (r, (k, v)) => r.option(k, v) }
      .load(tmp).orderBy($"doc_id")
  }

  test("round-trip preserves edge whitespace, newlines, markup chars, unicode") {
    val back = roundTrip(Map("ignoreSurroundingSpaces" -> "false"))
      .as[(Long, String, String)].collect().toSeq
    back shouldBe nasty
  }

  test("the default reader TRIMS edge whitespace — the hazard t30 opts out of") {
    val back = roundTrip(Map.empty)
      .where($"doc_id" === 1L).select($"text").as[String].head()
    back shouldBe "leading and trailing"  // silently corrupted without the option
  }

  test("gate end-to-end: t30 equals the source corpus") {
    val out = SparkEntry.queries("t30_xml_roundtrip")(spark, sf0001)
    val src = table("documents")
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
      .orderBy($"doc_id")
    out.collect() shouldBe src.collect()
  }
}
