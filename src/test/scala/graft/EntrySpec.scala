package graft

import org.apache.spark.sql.functions._
import graft.operators.Anomaly

/** Registry-level contracts: queries/oracle key alignment, OSCAR calendar
  * properties (reference src/oscar.js:27-34 — 72 dates/year, strictly
  * increasing, gaps ∈ {5,6}), and the flagship anomaly invariant.
  */
class EntrySpec extends SparkSpec {
  import spark.implicits._

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    missing shouldBe empty
  }

  test("every registered query is oracle-gated (full value check, no rows-only)") {
    // the driver downgrades oracle-less queries to a weaker rows-only
    // check; this surface keeps ALL of them value-checked — a new query
    // registered without its oracle fails here, not silently at grading
    val unGated = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    unGated shouldBe empty
  }

  test("entry (flagship) returns rows on sf0.001") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("oscar calendar: 72 dates/year, strictly increasing, gaps in {5,6}, starts Jan 1") {
    val out = SparkEntry.queries("q18_oscar_calendar")(spark, sf0001)
      .select($"y", $"oscar_date".cast("string")).as[(Long, String)].collect()
    out.groupBy(_._1).foreach { case (y, rows) =>
      rows.length shouldBe 72
      val dates = rows.map(r => java.time.LocalDate.parse(r._2.take(10))).sortBy(_.toEpochDay)
      dates.head shouldBe java.time.LocalDate.of(y.toInt, 1, 1)
      val gaps = dates.sliding(2).map { case Array(a, b) => b.toEpochDay - a.toEpochDay }.toSeq
      all(gaps) should (be >= 5L and be <= 6L)
      dates.last.getYear shouldBe y.toInt // never spills into the next year
    }
  }

  test("monthly anomaly: anomalies of each calendar month sum to ~0 across years") {
    val out = Anomaly.monthlyRevenueAnomaly(table("lineitem"))
    val sums = out.groupBy(month($"month_start")).agg(sum($"anomaly").as("s"))
      .select(abs($"s")).as[Double].collect()
    // mean-centering property: per-calendar-month anomalies cancel (up to 4-dp rounding)
    all(sums) should be < 0.01
  }

  test("hourly climatology covers every (event_type, hour) with data") {
    val out = Anomaly.hourlyClimatology(table("events"))
    out.count() should be > 0L
    out.where($"n" <= 0).count() shouldBe 0L
  }
}
