package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.implicits._

/** Inverted-index keyword retrieval over the corpus — the lexical
  * counterpart to [[Similarity]]'s embedding search. A training-data
  * pipeline uses this to pull topic slices out of a web corpus ("all
  * documents about X") and to audit mixture composition by query.
  *
  * Scale shape: the classic inverted index is materialized *implicitly* —
  * tokenize → keep only query terms → aggregate — so nothing index-shaped
  * is ever stored. A cheap row-local `rlike` prefilter (substring
  * superset of token equality) drops non-matching documents before the
  * explode, so at 100 TB the explode runs only over candidate documents;
  * the per-(doc,term) aggregate shuffles only matching postings (bounded
  * by corpus term frequency, not corpus size); the document-frequency
  * table is at most |query| rows and broadcasts; the final cut is a
  * TakeOrderedAndProject, never a full sort.
  */
object Search {

  /** TF-IDF top-k search, integer-exact gate form: each matched term
    * contributes `tf · (scale ⌊/⌋ df)` — integer division by document
    * frequency is the idf proxy (rarer term ⇒ bigger weight), summed in
    * exact long arithmetic, so the score is bit-identical in any engine
    * and safe to hash-compare (ln-based idf is not bit-portable across
    * libms; ranking is preserved for single-term and tf-dominated loads,
    * and [[bm25Search]] is the full-precision form when true BM25 order
    * matters).
    */
  def keywordSearch(documents: DataFrame, terms: Seq[String], k: Int,
                    scale: Long = 1L << 20): DataFrame = {
    val tf = postings(documents, terms)
      .groupBy($"doc_id", $"term")
      .agg(count(lit(1)).as("tf"))
    // df derived from the tf table (already one row per (doc, term)) —
    // no countDistinct, ≤ |query| rows. The aggregate is phrased over the
    // tf column (sum of tf ≥ 1 indicators ≡ count) so Catalyst can NOT
    // prune the child aggregate down to a distinct: both branches then
    // canonicalize to the same posting shuffle and AQE's stage reuse
    // computes the corpus scan + explode ONCE (a count(*) phrasing loses
    // the tf column, breaks canonical equality, and silently re-scans the
    // whole corpus for a ≤|query|-row table)
    val dfTab = tf.groupBy($"term")
      .agg(sum(when($"tf" >= 1L, 1L).otherwise(0L)).as("df"))
    // scale/df stays < 2^21 and the double division of exact longs below
    // 2^53 is exact, so floor() IS integer division (DuckDB's `//`)
    tf.join(broadcast(dfTab), "term")
      .withColumn("w", $"tf" * floor(lit(scale).cast("double") / $"df").cast("long"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_terms"), sum($"w").cast("long").as("score"))
      .orderBy($"score".desc, $"doc_id")
      .limit(k)
      .select($"doc_id", $"n_terms", $"score")
  }

  /** Okapi BM25 top-k (Robertson et al., TREC-3): the standard ranking
    * function, full double precision — idf = ln(1 + (N − df + ½)/(df + ½)),
    * length-normalized tf with the usual (k1, b) knobs. Same plan shape as
    * [[keywordSearch]] plus one 1-row corpus-stats broadcast (N, avgdl).
    * Spec-gated (not SQL-oracle-gated): ln and the double sum order are
    * not bit-portable across engines; [[keywordSearch]] is the
    * hash-comparable form.
    */
  def bm25Search(documents: DataFrame, terms: Seq[String], k: Int,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val stats = documents.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(TextAnalysis.wsTokenCount).as("avgdl"))
    val tf = postings(documents, terms,
        extra = Seq(TextAnalysis.wsTokenCount.cast("double").as("dl")))
      .groupBy($"doc_id", $"dl", $"term")
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfTab = tf.groupBy($"term").agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(dfTab), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0) + ($"n_docs" - $"df" + 0.5) / ($"df" + 0.5)))
      .withColumn("w",
        $"idf" * ($"tf" * (k1 + 1.0)) /
          ($"tf" + lit(k1) * (lit(1.0 - b) + lit(b) * $"dl" / $"avgdl")))
      .groupBy($"doc_id")
      .agg(sum($"w").as("bm25"), count(lit(1)).as("n_terms"))
      .orderBy($"bm25".desc, $"doc_id")
      .limit(k)
      .select($"doc_id", $"n_terms", round($"bm25", 6).as("bm25"))
  }

  /** S18: Okapi BM25 in EXACT staged integer arithmetic — the
    * hash-comparable twin of [[bm25Search]] (whose ln-idf and double
    * sums are not bit-portable): every BM25 ingredient becomes a
    * floor-divided fixed-point integer, identically computable by any
    * engine, so full BM25-shaped ranking joins the oracle-gated surface
    * rather than being spec-only. With k1 = 6/5 and b = 3/4:
    *
    *   avgdl_milli  = 1000·Σdl div N
    *   bpart_milli  = 250 + 750000·dl div avgdl_milli      [(1−b)+b·dl/avgdl]
    *   den_milli    = 1000·tf + 1200·bpart_milli div 1000  [tf + k1·bpart]
    *   tfnorm_micro = 2200·tf·1000000 div den_milli        [tf·(k1+1)/den]
    *   idf_milli    = 1000·(2N−2df+1) div (2df+1)          [rational RSJ idf]
    *   score_micro  = Σ idf_milli·tfnorm_micro div 1000
    *
    * The rational idf (N−df+½)/(df+½) is the Robertson–Sparck Jones
    * lift WITHOUT the ln — order-preserving for single-term scores and
    * the documented difference from the float form. Headroom: every
    * intermediate stays under 2⁵³ for N ≤ 10⁹ docs.
    *
    * Scale shape: [[keywordSearch]]'s exactly (shared [[postings]]
    * prefilter + explode, ≤|query|-row df broadcast) plus one 1-row
    * corpus-stats broadcast; final cut TakeOrdered, never a full sort.
    */
  def bm25ExactSearch(documents: DataFrame, terms: Seq[String],
                      k: Int): DataFrame = {
    val stats = documents.agg(
      count(lit(1)).as("n_docs"),
      sum(TextAnalysis.wsTokenCount.cast("long")).as("sum_dl"))
    val tf = postings(documents, terms,
        extra = Seq(TextAnalysis.wsTokenCount.cast("long").as("dl")))
      .groupBy($"doc_id", $"dl", $"term")
      .agg(count(lit(1)).as("tf"))
    // the s07 phrasing: df over the tf table via sum-of-indicators so
    // both branches canonicalize to one posting shuffle (see
    // keywordSearch's comment)
    val dfTab = tf.groupBy($"term")
      .agg(sum(when($"tf" >= 1L, 1L).otherwise(0L)).as("df"))
    tf.join(broadcast(dfTab), "term")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl_milli", expr("(1000 * sum_dl) div n_docs"))
      .withColumn("bpart_milli",
        expr("250 + (750000 * dl) div avgdl_milli"))
      .withColumn("den_milli",
        expr("1000 * tf + (1200 * bpart_milli) div 1000"))
      .withColumn("tfnorm_micro",
        expr("(2200 * tf * 1000000) div den_milli"))
      .withColumn("idf_milli",
        expr("(1000 * (2 * n_docs - 2 * df + 1)) div (2 * df + 1)"))
      .withColumn("w", expr("(idf_milli * tfnorm_micro) div 1000"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_terms"), sum($"w").as("score_micro"))
      .orderBy($"score_micro".desc, $"doc_id")
      .limit(k)
      .select($"doc_id", $"n_terms", $"score_micro")
  }

  /** The shared posting stream both search forms rank from: case-folded
    * deduped term list, conservative rlike prefilter (substring match is
    * a superset of whitespace token equality, so no candidate is lost —
    * but non-matching documents never reach the explode), tokenize,
    * keep only query terms. One definition so a prefilter or
    * tokenization fix can never diverge the two forms' candidate sets.
    */
  private def postings(documents: DataFrame, terms: Seq[String],
                       extra: Seq[org.apache.spark.sql.Column] = Nil): DataFrame = {
    val termList = terms.map(_.toLowerCase).distinct.sorted
    require(termList.nonEmpty, "keyword search needs at least one term")
    val prefilter = termList.map(java.util.regex.Pattern.quote).mkString("|")
    documents
      .where(lower($"text").rlike(prefilter))
      .select(($"doc_id" +: extra) :+ explode(Dedup.tokens($"text")).as("term"): _*)
      .where($"term".isin(termList: _*))
  }
}
