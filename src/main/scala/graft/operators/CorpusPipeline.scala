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
    Seq("input" -> corpus, "quality_filter" -> s1, "exact_dedup" -> s2,
        "decontaminate" -> s3, "hash_sample" -> s4)
  }

  /** The refined corpus: documents surviving every stage. */
  def refined(corpus: DataFrame, benchmark: DataFrame,
              maxContamination: Double = 0.5, sampleFraction: Double = 0.5,
              nGram: Int = 5): DataFrame =
    stages(corpus, benchmark, maxContamination, sampleFraction, nGram).last._2

  /** Attrition report: one row per stage with the surviving document
    * count — the funnel a pipeline run logs. Each stage re-derives its
    * prefix of the chain (counts are one-off audit aggregates, not the
    * data path; the refined corpus itself is a single lazy plan).
    */
  def attritionReport(corpus: DataFrame, benchmark: DataFrame,
                      maxContamination: Double = 0.5, sampleFraction: Double = 0.5,
                      nGram: Int = 5): DataFrame =
    stages(corpus, benchmark, maxContamination, sampleFraction, nGram)
      .zipWithIndex
      .map { case ((name, df), i) =>
        df.agg(count(lit(1)).as("n_docs"))
          .select(lit(i.toLong).as("stage"), lit(name).as("stage_name"), $"n_docs")
      }
      .reduce(_.unionByName(_))
      .orderBy($"stage")
}
