package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.build("graft-bench")
    // synthetic scale-up (SPARK_GRAFT_SCALE=k unions k key-shifted copies
    // of every table — see sources.Tables.scaled); bench-only knob
    val scale = sys.env.getOrElse("SPARK_GRAFT_SCALE", "1").toInt
    if (scale > 1) spark.conf.set("graft.scale", scale.toString)
    // warm up the machinery the first queries would otherwise pay for:
    // parquet scan, hash agg + shuffle, broadcast join, window, codegen
    locally {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
      n.groupBy(col("n_regionkey")).agg(count(lit(1)).as("c"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .withColumn("w", sum(col("c")).over(Window.partitionBy(col("r_name"))))
        .count()
      // warm the dedup/text family's codegen shapes too (split + lambda
      // array ops + explode + collect_list + self-join) — otherwise the
      // alphabetically-first d* query pays ~5 s of JIT that belongs to the
      // harness, not the query
      val tiny = spark.read.parquet(s"$sfDir/documents.parquet").limit(64)
      operators.Dedup.ngramJaccardPairs(tiny, 2, 0.99).count()
      operators.Dedup.minhashLshPairs(tiny, threshold = 0.99).count()
      operators.Dedup.simhash(tiny).count()
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
          false
      }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir","scale":$scale}""")
    spark.stop()
  }
}
