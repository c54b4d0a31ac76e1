package graft

object Bench {
  /** 1-minute load average, or -1 where /proc is unavailable. */
  private def loadAvg(): Double =
    try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
      .split(" ")(0).toDouble
    catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // noise self-description (round-9 verdict #3): sample the host load
    // BEFORE Spark ramps — concurrent verify/test runs inflate bench
    // numbers 1.5-5x non-uniformly, and an artifact that can't say
    // whether it was quiet-boxed can't support drift claims
    val load0 = loadAvg()
    val spark = Session.build("graft-bench")
    // synthetic scale-up: SPARK_GRAFT_SCALE=k MATERIALIZES k key-shifted
    // copies of every table to parquet once and benches against those
    // files — queries then run their normal single-scan plans over k× the
    // bytes. (The older `graft.scale` conf expanded each table reference
    // into a k-way union inside every plan, which defeated scan reuse and
    // codegen fusion and mis-charged that to the operators — see
    // Tables.materializeScaled.)
    val scale = sys.env.getOrElse("SPARK_GRAFT_SCALE", "1").toInt
    val sfDir =
      if (scale <= 1) baseDir
      else {
        val dst = s"${System.getProperty("java.io.tmpdir")}/graft-scale$scale-" +
          baseDir.replaceAll("[^0-9A-Za-z]+", "-").replaceAll("^-|-$", "")
        sources.Tables.materializeScaled(spark, baseDir, dst, scale)
        dst
      }
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
      operators.TextAnalysis.contaminationReport(tiny, tiny.limit(8), n = 5).count()
    }
    // SPARK_GRAFT_ONLY=q06,m03 benches a comma-separated subset (scale probes)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // shared co-purchase projections: materialized ONCE per run, outside
    // any timed region — ~16 g gates feed on them, and before round 10
    // each re-paid the input-bound pass inside its own timing (26% of the
    // round-9 sweep was this redundant fixture work)
    if (only.forall(_.exists(_.startsWith("g"))))
      SparkEntry.warmSharedProjections(spark, sfDir)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
          false
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // quiesce OUTSIDE the timed region: a heap full of a previous
      // query's shuffle garbage (e.g. d08's quadratic join) otherwise
      // taxes whichever query runs next — measured 2-17x inflation on the
      // tiny m-family when it followed d08 at scale=10
      System.gc()
      (name, elapsed, ok)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val state = graft.streaming.StateMetrics.toJson
    val load1 = loadAvg()
    // quiet = no external load at start (the JVM hasn't ramped yet, so
    // anything >1 on this 32-thread box is a neighbor, not us — the
    // same threshold run_bench.sh refuses at; documented in BASELINE.md)
    val noise = String.format(java.util.Locale.ROOT,
      """"loadavg_start":%.2f,"loadavg_end":%.2f,"quiet":%s""",
      Double.box(load0), Double.box(load1),
      if (load0 >= 0 && load0 <= 1.0) "true" else "false")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"stream_state":$state,$noise,"sf":"$baseDir","scale":$scale}"""
    println(json)
    // also land the full line as a file: driver-side stdout capture has
    // truncated the per-query map before (round-3 BENCH artifact), and the
    // bench must stay machine-readable end to end
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes("UTF-8"))
    // The driver records only the last ~2000 chars of stdout; with 76+
    // queries the full line above no longer fits that window (round-4
    // BENCH artifact: parsed=null, per-query map truncated at the head).
    // Emit a compact summary LAST — per-family subtotals + a pointer to
    // the full per-query map on disk — small enough to always survive the
    // tail capture whole, however large the query surface grows.
    val families = results.groupBy(_._1.takeWhile(!_.isDigit)).toSeq.sortBy(_._1)
      .map { case (f, rs) =>
        // Locale.ROOT: the f"" interpolator uses the JVM default locale — a
        // comma-decimal locale would emit "d":0,53 and break the one line
        // that exists to stay machine-parseable
        "\"" + f + "\":" + String.format(java.util.Locale.ROOT, "%.2f",
          Double.box(rs.map(_._2).sum))
      }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},""" +
      s""""failed":$failed,"families":$families,$noise,""" +
      s""""queries_file":"$outFile","sf":"$baseDir","scale":$scale}""")
    spark.stop()
  }
}
