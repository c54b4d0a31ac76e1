package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.implicits._

/** Temporal join operators Spark lacks natively.
  *
  * As-of join (backward): for each left row, the single right row with the
  * greatest `rightTs <= leftTs` in the same key group — the "most recent
  * observation at time t" lookup (the reference's analog is its
  * sorted-scan min-greater-than over the OSCAR calendar, src/oscar.js:10,
  * mirrored forward; and matching a month's grid to the latest published
  * normal is the same access pattern).
  *
  * Implementation is the scalable union+window formulation: tag both
  * sides, union, and carry the last non-null right payload over a
  * (key, ts)-ordered running window. One shuffle on the key, no range
  * cross-join, no per-row probe — at 100 TB this is a single sort-based
  * pass, and skew follows the key distribution exactly like any window op.
  */
object Temporal {

  /** Backward as-of join, inner semantics (left rows with no prior right
    * row are dropped, matching SQL `ASOF JOIN`). Right columns come back
    * prefixed `asof_`. Ties on `rightTs` within a key resolve by
    * `tieBreak` (latest wins) when supplied.
    *
    * Null keys are dropped on both sides before the union: SQL ASOF JOIN's
    * equi-condition never matches NULL, whereas `Window.partitionBy` groups
    * NULL keys together — filtering keeps the two semantics identical
    * (ADVICE r2). Ties order by the raw `tieBreak` column (its native
    * ordering), not a numeric cast.
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame, key: String,
                       leftTs: String, rightTs: String,
                       tieBreak: Option[String] = None): DataFrame =
    asofCore(left, right, key, leftTs, rightTs, tieBreak, None)

  /** [[asofJoinBackward]] with a STALENESS BOUND — the "quote no older
    * than X" semantics every market/telemetry as-of carries in practice:
    * a left row matches its most recent right row only if that row is at
    * most `toleranceSec` old; staler matches are dropped (same inner
    * semantics as the unbounded form). Identical single-pass
    * union+window plan — the bound is one more row-local predicate on
    * the already-resolved match, not a different join.
    */
  def asofJoinBackwardTolerance(left: DataFrame, right: DataFrame, key: String,
                                leftTs: String, rightTs: String,
                                toleranceSec: Long,
                                tieBreak: Option[String] = None): DataFrame =
    asofCore(left, right, key, leftTs, rightTs, tieBreak, Some(toleranceSec))

  private def asofCore(left: DataFrame, right: DataFrame, key: String,
                       leftTs: String, rightTs: String,
                       tieBreak: Option[String],
                       toleranceSec: Option[Long]): DataFrame = {
    val lStructT = StructType(left.schema.fields)
    val rStructT = StructType(right.schema.fields)

    // no tiebreak → a typed (sortable) null constant, raw column otherwise
    val tieCol = tieBreak.map(col).getOrElse(lit(null).cast("int"))
    val lTagged = left.where(col(key).isNotNull).select(
      col(key).as("__k"), col(leftTs).as("__ts"), lit(1).as("__side"),
      tieCol.as("__tie"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rStructT).as("__r"))
    val rTagged = right.where(col(key).isNotNull).select(
      col(key).as("__k"), col(rightTs).as("__ts"), lit(0).as("__side"),
      tieCol.as("__tie"),
      lit(null).cast(lStructT).as("__l"),
      struct(right.columns.map(col): _*).as("__r"))

    // right rows sort before left rows at equal ts → inclusive (<=) match
    val w = Window.partitionBy($"__k")
      .orderBy($"__ts", $"__side", $"__tie")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // microsecond-exact staleness: the fixture timestamps carry sub-second
    // parts, so a seconds-cast comparison would disagree with the oracle's
    // epoch_us arithmetic on boundary matches
    val staleOk = toleranceSec match {
      case Some(tol) =>
        unix_micros($"__ts".cast("timestamp")) -
          unix_micros(col(s"__m.$rightTs").cast("timestamp")) <= tol * 1000000L
      case None => lit(true)
    }
    val matched = lTagged.unionByName(rTagged)
      .withColumn("__m", last($"__r", ignoreNulls = true).over(w))
      .where($"__side" === 1 && $"__m".isNotNull && staleOk)

    val leftCols = left.columns.map(c => col(s"__l.$c").as(c))
    val rightCols = right.columns.filter(_ != key)
      .map(c => col(s"__m.$c").as(s"asof_$c"))
    matched.select(leftCols ++ rightCols: _*)
  }

  /** Range (proximity) join without an equi key: pair left and right rows
    * whose timestamps lie within `toleranceSec` of each other. A naive
    * formulation is a θ-join (cross product + filter) — quadratic and
    * unshuffleable. The scale shape used here buckets time into
    * `toleranceSec`-wide epochs, replicates the left side into its bucket
    * and both neighbors, equi-joins on the bucket, then applies the exact
    * |Δt| predicate: every qualifying pair shares at least one of the
    * three buckets (|Δ| ≤ tolerance ⇒ bucket distance ≤ 1) and exactly one
    * join row survives per pair (the right row's own bucket). Shuffle cost
    * is 3×|left| + |right| keyed rows — linear, skew bounded by bucket
    * population.
    */
  def rangeJoinWithin(left: DataFrame, right: DataFrame,
                      leftTs: String, rightTs: String,
                      toleranceSec: Long): DataFrame = {
    val width = toleranceSec * 1000000L // bucket width in µs
    val lb = unix_micros(col(leftTs).cast("timestamp"))
    val rb = unix_micros(col(rightTs).cast("timestamp"))
    val lExp = left
      .withColumn("__b0", floor(lb / width))
      .withColumn("__b", explode(array($"__b0" - 1, $"__b0", $"__b0" + 1)))
      .drop("__b0")
    val rKeyed = right.withColumn("__b", floor(rb / width))
    lExp.join(rKeyed, Seq("__b"))
      .where(abs(unix_micros(col(leftTs).cast("timestamp")) -
                 unix_micros(col(rightTs).cast("timestamp"))) <= lit(width))
      .drop("__b")
  }

  /** Interval-overlap join (q70) — pair every left interval with every
    * right interval it overlaps (inclusive integer bounds): the
    * genomic-region / reservation-conflict / validity-window join, and
    * the two-sided generalization of [[rangeJoinWithin]] (points there,
    * spans here). The naive form is again a θ-join.
    *
    * Scale shape: tile the axis into `bin`-wide cells, explode EACH side
    * to the cells its span touches (cost Σ len/bin — bounded, tunable),
    * equi-join on the cell, exact overlap predicate on candidates. An
    * overlapping pair shares every cell its INTERSECTION touches, so it
    * would surface once per shared cell; instead of a distinct, each
    * pair reports only in its intersection's FIRST cell
    * (`bin(max(starts))` — the "reporting bin" trick), making the join
    * emit exactly one row per pair with no dedup shuffle. Bin width
    * trades replication (long spans explode to more cells) against
    * candidate density (wide cells pair more strangers); either way the
    * answer is identical — only the exact predicate decides.
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame, bin: Long): DataFrame = {
    require(bin >= 1, s"intervalOverlapJoin: bin width $bin must be >= 1")
    def binOf(c: Column): Column = ((c - pmod(c, lit(bin))) / bin).cast("long")
    val lExp = left
      .withColumn("__b", explode(sequence(binOf($"a_start"), binOf($"a_end"))))
    val rExp = right
      .withColumn("__b", explode(sequence(binOf($"b_start"), binOf($"b_end"))))
    lExp.join(rExp, Seq("__b"))
      .where($"a_start" <= $"b_end" && $"b_start" <= $"a_end" &&
        binOf(greatest($"a_start", $"b_start")) === $"__b")
      .select($"a_id", $"b_id", $"a_start", $"a_end", $"b_start", $"b_end",
        (least($"a_end", $"b_end") - greatest($"a_start", $"b_start") + 1)
          .as("overlap"))
      .orderBy($"a_id", $"b_id")
  }

  /** Merge overlapping (or touching) intervals per key — the classic
    * consolidation every reservation / coverage / uptime pipeline runs,
    * and the interval-algebra complement of [[rangeJoinWithin]]: instead
    * of pairing nearby points it coalesces [start, end) spans into
    * maximal islands.
    *
    * Gaps-and-islands in one keyed window pass: order a key's intervals
    * by (start, id); an interval opens a new island iff its start lies
    * strictly beyond the running max of all *earlier* ends (the cummax
    * window frame ends at `1 preceding`, so an interval never compares
    * against itself); the island id is the running count of opens, and
    * one hash aggregate per island emits (start, max end, n, covered µs).
    * Everything is exact integer microseconds — no float time arithmetic
    * — so any engine walking the same order computes identical islands.
    *
    * Scale shape: ONE shuffle on the key (window and aggregate share the
    * partitioning), per-key sort only — no self-join, no explode. Skew is
    * bounded by the busiest key's interval count, the same bound
    * sessionization already accepts.
    *
    * Contract: intervals must be well-formed (`endUs >= startUs`). A
    * negative-duration row would still land in an island by its start
    * but can regress the island's `max end` below its own start —
    * validate upstream rather than rely on that accidental shape.
    */
  def mergeIntervals(df: DataFrame, keyCol: String, idCol: String,
                     startUs: Column, endUs: Column): DataFrame = {
    val byKey = Window.partitionBy($"k").orderBy($"s", $"id")
    val prevMaxEnd = max($"e").over(byKey.rowsBetween(Window.unboundedPreceding, -1))
    df.select(col(keyCol).as("k"), col(idCol).as("id"),
        startUs.as("s"), endUs.as("e"))
      .withColumn("new_island",
        when(prevMaxEnd.isNull || $"s" > prevMaxEnd, 1L).otherwise(0L))
      .withColumn("island",
        sum($"new_island").over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"k", $"island")
      .agg(min($"s").as("island_start_us"), max($"e").as("island_end_us"),
        count(lit(1)).as("n_intervals"))
      .select($"k".as("key"), $"island", $"island_start_us", $"island_end_us",
        ($"island_end_us" - $"island_start_us").as("span_us"), $"n_intervals")
      .orderBy($"key", $"island")
  }
}
