package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.implicits._

/** End-to-end corpus refinement: the standard pre-training preparation
  * chain — quality filter → exact dedup → benchmark decontamination →
  * reproducible downsample — as ONE composable call, with the per-stage
  * attrition report every data card publishes. A user of the individual
  * operators (t10, d01, t08, t04) gets the whole pipeline without wiring
  * the stages, and the report makes the funnel auditable.
  *
  * Stage order is deliberate: the cheap row-local filter runs first
  * (shrinking everything downstream), dedup before decontamination
  * (shrinking the gram explode), sampling last (so the rate applies to
  * clean unique docs, not to spam that later stages would drop anyway).
  *
  * Scale shape per stage: quality flags are a shuffle-free codegen'd
  * scan; exact dedup shuffles 16-byte md5 keys (one row survives per
  * digest — `row_number` over the hash, not a self-join); decontamination
  * is the t08 broadcast-semi-join (the benchmark gram set is tiny);
  * sampling is a shuffle-free hash-threshold filter. The stages chain
  * lazily — Catalyst plans the whole funnel as one job per action.
  */
object CorpusPipeline {

  /** THE stage list, in funnel order — shared by [[stages]],
    * [[stageFlags]] and [[attritionReport]] so the three views of the
    * funnel cannot drift (a new stage must be added here AND to both
    * computations; the CorpusPipelineSpec cross-validation then proves
    * them equal again).
    */
  val stageNames: Seq[String] =
    Seq("input", "quality_filter", "exact_dedup", "decontaminate", "hash_sample")

  /** (stage name, corpus surviving through that stage), in order. */
  def stages(corpus: DataFrame, benchmark: DataFrame,
             maxContamination: Double = 0.5, sampleFraction: Double = 0.5,
             nGram: Int = 5): Seq[(String, DataFrame)] = {
    val passthrough = corpus.columns.map(col).toSeq
    val s1 = TextAnalysis.withQualityFlags(corpus)
      .where($"keep").select(passthrough: _*)
    val s2 = s1
      .withColumn("rn_exact", row_number().over(
        Window.partitionBy(md5($"text".cast("binary"))).orderBy($"doc_id")))
      .where($"rn_exact" === 1).drop("rn_exact")
    val clean = TextAnalysis.contaminationReport(s2, benchmark, nGram)
      .where($"contamination" < maxContamination).select($"doc_id")
    val s3 = s2.join(clean, Seq("doc_id"), "left_semi")
    val s4 = s3.where(md5($"text".cast("binary")) < lit(Sampling.thresholdHex(sampleFraction)))
    stageNames.zip(Seq(corpus, s1, s2, s3, s4))
  }

  /** The refined corpus: documents surviving every stage. */
  def refined(corpus: DataFrame, benchmark: DataFrame,
              maxContamination: Double = 0.5, sampleFraction: Double = 0.5,
              nGram: Int = 5): DataFrame =
    stages(corpus, benchmark, maxContamination, sampleFraction, nGram).last._2

  /** Every document with a boolean per stage: `s1..s4` = "still alive
    * after that stage". ONE corpus pass instead of re-running each stage
    * prefix (the naive report would run the quality regex battery four
    * times over 100 TB — the q32 repeated-scan shape):
    *
    *  - s2 without filtering first: the dedup window ranks each md5 group
    *    with quality SURVIVORS FIRST (`s1 desc, doc_id`), so `s1 ∧ rn=1`
    *    is exactly "smallest-id survivor of its digest group".
    *  - s3 without filtering first: a doc's contamination depends only on
    *    its own grams and the benchmark set — never on other corpus docs —
    *    so the t08 report over the full corpus joins back as a flag.
    *    Docs too short to produce a single n-gram are absent from the
    *    report and fail s3, matching the staged semantics.
    */
  def stageFlags(corpus: DataFrame, benchmark: DataFrame,
                 maxContamination: Double = 0.5, sampleFraction: Double = 0.5,
                 nGram: Int = 5): DataFrame = {
    val digest = md5($"text".cast("binary"))
    val w = Window.partitionBy(digest).orderBy($"s1".desc, $"doc_id")
    val clean = TextAnalysis.contaminationReport(corpus, benchmark, nGram)
      .select($"doc_id", ($"contamination" < maxContamination).as("ok3"))
    TextAnalysis.withQualityFlags(corpus)
      .withColumnRenamed("keep", "s1")
      .withColumn("s2", $"s1" && row_number().over(w) === 1)
      .join(clean, Seq("doc_id"), "left")
      .withColumn("s3", $"s2" && coalesce($"ok3", lit(false)))
      .withColumn("s4", $"s3" && digest < lit(Sampling.thresholdHex(sampleFraction)))
      .select($"doc_id", $"s1", $"s2", $"s3", $"s4")
  }

  /** Attrition report: one row per stage with the surviving document
    * count — the funnel a pipeline run logs. Derived from [[stageFlags]]
    * with a single aggregate: one corpus pass, one 16-byte-key shuffle
    * (the dedup window), one flag join — not a re-execution per stage.
    */
  def attritionReport(corpus: DataFrame, benchmark: DataFrame,
                      maxContamination: Double = 0.5, sampleFraction: Double = 0.5,
                      nGram: Int = 5): DataFrame = {
    val nStages = stageNames.size - 1 // flags s1..sN, stage 0 is the input
    val flags = stageFlags(corpus, benchmark, maxContamination, sampleFraction, nGram)
    val agg = flags.agg(
      count(lit(1)).as("n0"),
      (1 to nStages).map(i =>
        coalesce(sum(when(col(s"s$i"), 1L).otherwise(0L)), lit(0L)).as(s"n$i")): _*)
    agg.select(explode(array(stageNames.zipWithIndex.map { case (name, i) =>
        struct(lit(i.toLong).as("stage"), lit(name).as("stage_name"),
               col(s"n$i").as("n_docs"))
      }: _*)).as("r"))
      .select($"r.stage", $"r.stage_name", $"r.n_docs")
      .orderBy($"stage")
  }

  /** Corpus data card: the composition table every dataset release
    * publishes — documents, tokens, characters, token share and mean
    * document length per (source, lang), per source, and for the whole
    * corpus, in one ROLLUP aggregate. `g_source`/`g_lang` are the
    * GROUPING() markers (1 = rolled up), so a NULL source value can never
    * be confused with the all-sources row.
    *
    * Scale shape: one corpus scan with a narrow codegen'd projection
    * (token count via regexp_count, no explode), one partial+final rollup
    * aggregate whose output is ≤ (|sources|+1)·(|langs|+1) rows; the
    * grand-total lookup for `token_share` is a window over THAT
    * metadata-sized aggregate, never over the corpus. Ratios are IEEE
    * divisions of exact longs — bit-identical in the oracle.
    */
  def dataCard(documents: DataFrame): DataFrame = {
    val agg = documents
      .withColumn("ws_tokens", TextAnalysis.wsTokenCount)
      .rollup($"source", $"lang")
      .agg(count(lit(1)).as("n_docs"),
           sum($"ws_tokens").cast("long").as("n_tokens"),
           sum($"n_chars").cast("long").as("n_chars"),
           grouping($"source").cast("int").as("g_source"),
           grouping($"lang").cast("int").as("g_lang"))
    // the rollup output is metadata-sized — a single-partition window over
    // it is free; the grand-total row is unique, so max(when) finds it
    val all = Window.partitionBy(lit(1))
    agg
      .withColumn("total_tokens",
        max(when($"g_source" === 1 && $"g_lang" === 1, $"n_tokens")).over(all))
      .select($"source", $"lang", $"g_source", $"g_lang",
        $"n_docs", $"n_tokens", $"n_chars",
        // zero guards: an all-empty corpus gives 0/0 = NaN in Spark but
        // NULL in DuckDB — define both ratios as 0 instead
        when($"total_tokens" === 0L, lit(0.0))
          .otherwise($"n_tokens".cast("double") / $"total_tokens".cast("double"))
          .as("token_share"),
        when($"n_docs" === 0L, lit(0.0))
          .otherwise($"n_tokens".cast("double") / $"n_docs".cast("double"))
          .as("mean_doc_tokens"))
      .orderBy($"g_source".desc, $"g_lang".desc,
               $"source".asc_nulls_first, $"lang".asc_nulls_first)
  }
}
