package graft

/** Plan inspector: prints the formatted physical plan of selected
  * SparkEntry queries (all of them by default). Used to audit the scale
  * checklist — pushed filters reach the scan, projections prune columns,
  * small join sides broadcast, WholeStageCodegen spans stay wide.
  *
  * Usage: graft.Explain [sfDir] [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = Session.build("graft-explain")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
