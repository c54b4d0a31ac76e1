package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING on the engine (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units",
  * arXiv:1508.07909) — the subword-vocabulary learner every pre-training
  * pipeline runs before anything else. t03's BPE-ish regex *counts* with a
  * fixed heuristic; this LEARNS the merge table from the corpus.
  *
  * Scale shape (how SentencePiece/HF trainers do it, distributed): the
  * corpus collapses to a (word, count) table first — ONE shuffle over the
  * data, after which training never touches the corpus again; every merge
  * round is an aggregate + a typed map over the vocabulary-sized word
  * table (each word weighted by its count). BPE is inherently sequential
  * in the merge rank, so rounds are `numMerges` small Spark jobs — at
  * 100 TB the standard practice is to train on a content-hash sample
  * ([[Sampling.byContentHash]] composes directly) while the word-count
  * collapse still sees the full corpus cheaply.
  *
  * Determinism (spec-pinned): pair selection breaks ties by (count DESC,
  * left, right), so the learned merge table is identical under any
  * partitioning — unlike frequency-only trainers whose ties fall to
  * iteration order. Training stops early when no pair occurs twice.
  *
  * Not SQL-oracle-gateable (iterative argmax-and-rewrite); spec-gated
  * against an independent single-machine reference implementation, the
  * ivfTrained/pqTopK precedent.
  */
object Bpe {

  /** A learned merge: rank is application order. */
  case class Merge(rank: Int, left: String, right: String)

  /** Split per Unicode CODE POINT, not UTF-16 char: `w.map(_.toString)`
    * would shear non-BMP characters (emoji, rare CJK) into unpaired
    * surrogate halves, learning merges that emit invalid strings on
    * astral-character corpora (the same discipline as PolyHash's
    * code-point iteration).
    */
  private[operators] def symbols(w: String): Array[String] =
    w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  /** Learn `numMerges` merges from whitespace-tokenized, lower-cased
    * words. Words split per Unicode code point; no end-of-word marker is
    * appended (within-word merges only — the marker variant is a trivial
    * symbol-alphabet change, stated so callers know which dialect this
    * is).
    */
  def train(documents: DataFrame, numMerges: Int): Seq[Merge] = {
    val spark = documents.sparkSession
    import spark.implicits._
    val words: Dataset[(Array[String], Long)] = documents
      .select(explode(Dedup.tokens(col("text"))).as("w"))
      .where(length(col("w")) >= 2) // single-char words carry no pairs
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .as[(String, Long)]
      .map { case (w, n) => (symbols(w), n) }

    val merges = Seq.newBuilder[Merge]
    var syms = words
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      // checkpoint the small word table every few rounds: cuts the
      // numMerges-deep map lineage that would otherwise be replayed from
      // the corpus on any recompute
      if (rank % 8 == 0) syms = graft.Session.barrier(syms.toDF())
        .as[(Array[String], Long)]
      topPair(syms) match {
        case Some((l, r, c)) if c >= 2 =>
          merges += Merge(rank, l, r)
          val (ll, rr) = (l, r)
          syms = syms.map { case (a, n) => (applyMerge(a, ll, rr), n) }
          rank += 1
        case _ => done = true
      }
    }
    merges.result()
  }

  /** Encode each document with a learned merge table: whitespace words
    * split to characters, merges applied in rank order (the standard
    * greedy left-to-right application per rank). Row-local typed map —
    * embarrassingly parallel, the merge table rides in the closure
    * (vocabulary-sized metadata).
    */
  def encode(documents: DataFrame, merges: Seq[Merge]): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val ordered = merges.sortBy(_.rank).map(m => (m.left, m.right))
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        // Locale.ROOT: the default-locale toLowerCase would case-fold
        // differently from train's Spark lower() on e.g. a tr-TR JVM
        // (I→ı), silently diverging encode's symbols from the learned
        // merge vocabulary
        val toks = text.toLowerCase(java.util.Locale.ROOT)
          .split("\\s+").filter(_.nonEmpty)
          .flatMap { w =>
            var a = symbols(w)
            ordered.foreach { case (l, r) => a = applyMerge(a, l, r) }
            a
          }
        (id, toks.length.toLong, toks)
      }
      .toDF("doc_id", "n_tokens", "tokens")
      .orderBy(col("doc_id"))
  }

  /** Count-weighted most frequent adjacent pair; ties break (count DESC,
    * left, right) so training is partitioning-independent.
    */
  private def topPair(syms: Dataset[(Array[String], Long)])
      : Option[(String, String, Long)] = {
    val spark = syms.sparkSession
    import spark.implicits._
    syms.flatMap { case (a, n) =>
      (0 until a.length - 1).map(i => (a(i), a(i + 1), n))
    }
      .toDF("l", "r", "n")
      .groupBy(col("l"), col("r")).agg(sum(col("n")).as("c"))
      .orderBy(col("c").desc, col("l"), col("r"))
      .as[(String, String, Long)]
      .head(1).headOption
  }

  /** Greedy left-to-right single-pair rewrite (the BPE inner loop). */
  private[operators] def applyMerge(a: Array[String], l: String, r: String)
      : Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < a.length) {
      if (i + 1 < a.length && a(i) == l && a(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += a(i); i += 1 }
    }
    out.toArray
  }
}
