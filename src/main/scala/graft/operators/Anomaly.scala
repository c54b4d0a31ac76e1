package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.implicits._

/** The reference's flagship dataflow: anomaly = actual − climatological
  * normal, where the normal is the multi-year mean for the same calendar
  * month (reference src/sources/era5monthly.js:126-155 builds the 30-year
  * normal with `cdo timmean`; src/file-conversions.js:219-231 does the
  * `cdo sub`). That is an aggregation + an equi-join on the grouping key +
  * an arithmetic projection (SURVEY.md §2.3 J1).
  *
  * Scale shape: the normal side is tiny after aggregation (one row per
  * calendar period) → broadcast hash join, zero extra shuffle of the
  * fact side beyond the monthly aggregation itself.
  */
object Anomaly {

  /** TPC-H-shaped analog of the ERA5 anomaly: monthly revenue vs the mean
    * revenue of that calendar month across all years.
    */
  def monthlyRevenueAnomaly(lineitem: DataFrame): DataFrame = {
    // money math in exact DECIMAL: price/discount are 2-dp values, so the
    // per-item product is exact at 4 dp and the monthly sum is exact — no
    // FP summation-order noise, no rounding knife edges against the
    // oracle. The exact decimal casts to a deterministic double at the
    // boundary, and the climatology mean is exact-sum/count (also
    // deterministic) rather than an order-sensitive double avg.
    val disc = $"l_discount".cast("decimal(18,2)")
    val monthly = lineitem
      .groupBy(date_trunc("month", $"l_shipdate").cast("timestamp_ntz").as("month_start"))
      .agg(sum($"l_extendedprice".cast("decimal(18,2)") * (lit(1) - disc)).as("rev_dec"))
    // climatology as a window over the (tiny) monthly aggregate: the fact
    // table is scanned ONCE — the derived-twice-join formulation would
    // rescan and re-aggregate the full table for the normal side, which at
    // 100 TB doubles the dominant cost
    val byCalMonth = Window.partitionBy(month($"month_start"))
    monthly
      .withColumn("revenue", $"rev_dec".cast("double"))
      .withColumn("normal_revenue",
        sum($"rev_dec").over(byCalMonth).cast("double") /
          count(lit(1)).over(byCalMonth))
      .select(
        $"month_start",
        $"revenue",
        $"normal_revenue",
        ($"revenue" - $"normal_revenue").as("anomaly"))
      .orderBy($"month_start")
  }

  /** Periodic mean over events (climatology on the event stream): mean value
    * per (event_type, hour-of-day) — the same group-mean shape as the
    * 30-year normal (era5monthly.js:126-155), exercising the ns-timestamp
    * scan path.
    */
  def hourlyClimatology(events: DataFrame): DataFrame =
    events.groupBy($"event_type", hour($"ts").cast("long").as("hour_of_day"))
      // mean = agreed-rounded sum / count, emitted UNROUNDED: bit-identical
      // operands make IEEE division match exactly, while further decimal
      // rounding can tie-break differently between engines
      .agg((round(sum($"value"), 2) / count(lit(1))).as("mean_value"),
           round(sum($"value"), 2).as("sum_value"),
           count(lit(1)).as("n"))
      .orderBy($"event_type", $"hour_of_day")
}
