package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-canonicalization expressions. Unicode normalization is
  * the step every dedup/hash pipeline needs BEFORE content hashing:
  * "café" composed (U+00E9) and decomposed (e + U+0301) are different
  * byte strings — different MD5s, different MinHash shingles, different
  * exact-dedup groups — for text any human reads as identical. NFC is
  * the canonical-composition form (UAX #15); both the JDK and DuckDB
  * implement the same Unicode algorithm, which is what makes the m-gate
  * oracle cross-check meaningful.
  *
  * Implemented as a codegen'd Catalyst expression, not a UDF: the
  * normalize call stays inside WholeStageCodegen (no ScalaUDF stage
  * break, no row boxing), and the fast path short-circuits —
  * `Normalizer.isNormalized` is O(n) scan-only for the ASCII/already-NFC
  * overwhelming majority, avoiding the allocation entirely.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string input, got ${child.dataType}")

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Static kernel shared by eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column-API entry point (expression registered by GraftExtensions). */
  def apply(c: Column): Column =
    org.apache.spark.sql.functions.call_function("nfc_normalize", c)
}

/** TRUE (unrestricted) Damerau-Levenshtein distance — Lowrance-Wagner
  * 1975, the variant where a transposed pair may be edited further
  * (dl("CA","ABC") = 2, where the restricted OSA form says 3). Spark
  * ships only plain `levenshtein`; entity resolution wants the
  * transposition-aware distance because character swaps are the single
  * most common human typo class. Codegen'd native expression: the DP
  * kernel runs inside WholeStageCodegen with primitive arrays, no UDF
  * stage break.
  *
  * Distance is over Unicode CODE POINTS. (DuckDB's implementation is
  * over UTF-8 bytes — identical on ASCII, which is what the e02 oracle
  * fixture sticks to; the spec pins the code-point choice on non-ASCII.)
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"damerau_levenshtein requires string inputs, got ${left.dataType}, ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.distance(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DamerauLevenshtein.distance($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {

  def distance(a: UTF8String, b: UTF8String): Long =
    distance(a.toString.codePoints().toArray, b.toString.codePoints().toArray)

  /** Lowrance-Wagner DP over code points: (la+2)×(lb+2) matrix with a
    * sentinel border row/column of la+lb, `da` tracking the last row
    * each symbol occurred in. O(la·lb) time, O(la·lb) space — names and
    * titles, not documents (for documents the right tool is shingled
    * Jaccard, gates d02-d08).
    */
  def distance(a: Array[Int], b: Array[Int]): Long = {
    val la = a.length; val lb = b.length
    if (la == 0) return lb.toLong
    if (lb == 0) return la.toLong
    val maxd = la + lb
    val w = lb + 2
    val d = new Array[Int]((la + 2) * w)
    d(0) = maxd
    var i = 0
    while (i <= la) { d((i + 1) * w) = maxd; d((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(j + 1) = maxd; d(w + j + 1) = j; j += 1 }
    val da = new java.util.HashMap[Int, Int]()
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val k = da.getOrDefault(b(j - 1), 0)
        val l = db
        var cost = 1
        if (a(i - 1) == b(j - 1)) { cost = 0; db = j }
        val subst = d(i * w + j) + cost
        val insert = d((i + 1) * w + j) + 1
        val delete = d(i * w + j + 1) + 1
        val transp = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var m = subst
        if (insert < m) m = insert
        if (delete < m) m = delete
        if (transp < m) m = transp
        d((i + 1) * w + j + 1) = m
        j += 1
      }
      da.put(a(i - 1), i)
      i += 1
    }
    d((la + 1) * w + lb + 1).toLong
  }

  /** Column-API entry point (expression registered by GraftExtensions). */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("damerau_levenshtein", a, b)
}

/** Jaro-Winkler similarity — the other half of the entity-resolution
  * string-distance toolkit (Damerau counts edits; Jaro-Winkler scores
  * order-tolerant character overlap with a common-prefix boost, the
  * measure census-style record linkage has used since Winkler 1990).
  * Spark ships neither. Codegen'd native expression like
  * [[DamerauLevenshtein]]: the kernel runs inside WholeStageCodegen on
  * primitive arrays, no UDF stage break.
  *
  * Variant pinned empirically against DuckDB's implementation so the
  * e03 oracle is a true cross-check (probes recorded in
  * TextExpressionsSpec): matching window `max(la,lb)/2 - 1` (min 0),
  * greedy in-order match flagging, transpositions = mismatched flagged
  * positions / 2 (integer), Jaro = (m/la + m/lb + (m-t)/m) / 3,
  * Winkler boost `j + l·0.1·(1-j)` with prefix cap l ≤ 4 applied only
  * when jaro > 0.7, and empty-vs-anything (including empty-vs-empty)
  * = 0.0. Comparison is over Unicode code points (DuckDB's is UTF-8
  * byte-based — identical on ASCII, which the e03 fixture sticks to).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler requires string inputs, got ${left.dataType}, ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.similarity($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  def similarity(a: UTF8String, b: UTF8String): Double =
    similarity(a.toString.codePoints().toArray, b.toString.codePoints().toArray)

  def similarity(a: Array[Int], b: Array[Int]): Double = {
    val la = a.length; val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aFlag = new Array[Boolean](la)
    val bFlag = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bFlag(j) && b(j) == a(i)) {
          aFlag(i) = true; bFlag(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // mismatched positions between the two flagged-in-order sequences
    var mismatches = 0
    var bi = 0
    i = 0
    while (i < la) {
      if (aFlag(i)) {
        while (!bFlag(bi)) bi += 1
        if (a(i) != b(bi)) mismatches += 1
        bi += 1
      }
      i += 1
    }
    val t = mismatches / 2
    val jaro = (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val lmax = math.min(4, math.min(la, lb))
    while (l < lmax && a(l) == b(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  /** Column-API entry point (expression registered by GraftExtensions). */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("jaro_winkler", a, b)
}
