package graft

import org.apache.spark.sql.functions._
import graft.functions.NfcNormalize

/** Native NFC normalization expression (t28): UAX #15 canonical
  * composition as a codegen'd Catalyst expression.
  */
class TextExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def nfc(ss: String*): Seq[String] =
    ss.toDF("s").select(NfcNormalize($"s").as("n")).as[String].collect().toSeq

  test("composed and decomposed forms normalize to identical strings") {
    val composed = "café naïve"          // é, ï precomposed
    val decomposed = "cafe\u0301 nai\u0308ve" // e+U+0301, i+U+0308
    nfc(composed, decomposed).distinct should have length 1
    nfc(decomposed).head shouldBe composed
  }

  test("already-NFC and ASCII text pass through unchanged (fast path)") {
    nfc("plain ascii", "café", "") shouldBe Seq("plain ascii", "café", "")
  }

  test("null propagates; astral code points survive") {
    val out = Seq[Option[String]](None, Some("a𝕏b😀"))
      .toDF("s").select(NfcNormalize($"s")).collect()
    out(0).isNullAt(0) shouldBe true
    out(1).getString(0) shouldBe "a𝕏b😀"
  }

  test("normalize-then-hash collapses byte-distinct equal text (the dedup motivation)") {
    val d = Seq((1L, "r\u00e9sum\u00e9"), (2L, "re\u0301sume\u0301"))
      .toDF("doc_id", "text")
    val hashes = d.select(md5(NfcNormalize($"text").cast("binary"))).distinct()
    hashes.count() shouldBe 1
    // WITHOUT normalization they are different content hashes
    d.select(md5($"text".cast("binary"))).distinct().count() shouldBe 2
  }

  test("expression stays codegen'd: no ScalaUDF in the plan") {
    val p = table("documents").select(NfcNormalize($"text"))
      .queryExecution.executedPlan.toString
    p should not include "ScalaUDF"
  }

  test("damerau_levenshtein: the UNRESTRICTED variant (transposed pair may be edited further)") {
    import graft.functions.DamerauLevenshtein.{distance => dl}
    def d(a: String, b: String) = dl(
      a.codePoints().toArray, b.codePoints().toArray)
    d("CA", "ABC") shouldBe 2L  // OSA says 3 — the variant discriminator
    d("ab", "ba") shouldBe 1L
    d("abcdef", "abcfed") shouldBe 2L
    d("smith", "smyth") shouldBe 1L
    d("", "abc") shouldBe 3L
    d("abc", "") shouldBe 3L
    d("same", "same") shouldBe 0L
    // never worse than plain levenshtein, and symmetric
    for ((a, b) <- Seq(("kitten", "sitting"), ("banana", "ananas"), ("x", "yz"))) {
      d(a, b) shouldBe d(b, a)
    }
    d("kitten", "sitting") shouldBe 3L
  }

  test("damerau_levenshtein: code-point semantics on non-ASCII, column + SQL surface") {
    // é is ONE code point here (2 UTF-8 bytes — a byte-based impl says 2)
    graft.functions.DamerauLevenshtein.distance(
      org.apache.spark.unsafe.types.UTF8String.fromString("café"),
      org.apache.spark.unsafe.types.UTF8String.fromString("cafe")) shouldBe 1L
    val out = Seq(("abcd", "abdc"), ("acb", "abc"))
      .toDF("a", "b")
      .select(graft.functions.DamerauLevenshtein($"a", $"b").as("d"))
      .as[Long].collect()
    out shouldBe Array(1L, 1L)
    spark.sql("SELECT damerau_levenshtein('CA', 'ABC') AS d").as[Long].head() shouldBe 2L
  }

  test("SQL surface: nfc_normalize callable from spark.sql") {
    spark.sql("SELECT nfc_normalize('cafe\u0301') AS n").as[String].head() shouldBe "caf\u00e9"
  }

  test("jaro_winkler: variant pinned against DuckDB probe values (e03 oracle basis)") {
    import graft.functions.JaroWinkler.{similarity => jw}
    def s(a: String, b: String) = jw(
      a.codePoints().toArray, b.codePoints().toArray)
    // probed 2026-08-13 against DuckDB jaro_winkler_similarity — exact doubles
    s("MARTHA", "MARHTA") shouldBe 0.9611111111111111       // prefix 3, t=1
    s("DIXON", "DICKSONX") shouldBe 0.8133333333333332 +- 1e-15 // prefix 2
    s("JELLYFISH", "SMELLYFISH") shouldBe 0.8962962962962964 // no common prefix
    s("DWAYNE", "DUANE") shouldBe 0.8400000000000001 +- 1e-15
    s("CRATE", "TRACE") shouldBe 0.7333333333333334          // m=3, t=0, no boost (j>0.7 but prefix 0)
    s("PREFIX", "PRXXXX") shouldBe 0.6666666666666666        // prefix 2 but jaro <= 0.7: NO boost
    s("ABCDXXXXXX", "ABCDYYYYYY") shouldBe 0.6               // 4-prefix, still no boost under threshold
    s("AB", "CD") shouldBe 0.0
    s("A", "A") shouldBe 1.0
    s("", "ABC") shouldBe 0.0
    s("", "") shouldBe 0.0                                   // DuckDB: empty-vs-empty is 0, not 1
    // integer-halved transpositions (probed): 3 mismatched flagged positions -> t=1
    s("ABCGHI", "BCAGHI") shouldBe 0.9444444444444445
    s("ABCDEFGH", "BADCFEHG") shouldBe 0.8333333333333334    // 8 mismatches -> t=4
  }

  test("jaro_winkler: codegen'd column + SQL surface, null propagation") {
    val out = Seq(("MARTHA", "MARHTA"), ("AB", "CD"))
      .toDF("a", "b")
      .select(graft.functions.JaroWinkler($"a", $"b").as("s"))
    out.queryExecution.executedPlan.toString should not include "ScalaUDF"
    out.as[Double].collect() shouldBe Array(0.9611111111111111, 0.0)
    spark.sql("SELECT jaro_winkler('DWAYNE', 'DUANE') AS s").as[Double].head() shouldBe 0.8400000000000001 +- 1e-15
    Seq[(Option[String], Option[String])]((None, Some("x")))
      .toDF("a", "b")
      .select(graft.functions.JaroWinkler($"a", $"b")).collect()(0).isNullAt(0) shouldBe true
  }
}
