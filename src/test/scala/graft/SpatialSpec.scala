package graft

import org.apache.spark.sql.functions._
import graft.operators.Spatial

/** Points-in-polygons spatial join (r30): exact strict-interior
  * semantics, blocking completeness vs brute force, broadcast shape.
  */
class SpatialSpec extends SparkSpec {
  import spark.implicits._

  private def inside(t: Spatial.Tri, px: Long, py: Long): Boolean = {
    val (ax, ay, bx, by, cx, cy) = t
    (bx - ax) * (py - ay) - (by - ay) * (px - ax) > 0 &&
      (cx - bx) * (py - by) - (cy - by) * (px - bx) > 0 &&
      (ax - cx) * (py - cy) - (ay - cy) * (px - cx) > 0
  }

  test("strict interior: inside in, vertices and edge points out") {
    val t = (0L, 0L, 4L, 1L, 1L, 3L)
    val pts = Seq(
      (1L, 1L, 1L),   // interior
      (2L, 0L, 0L),   // vertex A
      (3L, 4L, 1L),   // vertex B
      (4L, 2L, 2L),   // on edge BC? cross(BC, BP) = (-3)(1) - (2)(-2) = 1 > 0 — interior
      (5L, 9L, 9L),   // far outside
      (6L, 2L, 0L))   // below AB: s1 = 4*0 - 1*2 = -2 — out
      .toDF("id", "px", "py")
    val got = Spatial.containsJoin(pts, Seq(t), cell = 8L)
      .select($"id").as[Long].collect().toSet
    got shouldBe Set(1L, 4L)
    // sanity: the scala twin agrees point by point
    Seq((1L, 1L, true), (0L, 0L, false), (4L, 1L, false), (2L, 2L, true),
      (9L, 9L, false), (2L, 0L, false)).foreach { case (x, y, e) =>
      inside(t, x, y) shouldBe e
    }
  }

  test("blocking completeness: equals brute force over a dense lattice, all cell sizes") {
    val tris = Seq.tabulate(7) { p =>
      val cx = (p * 7) % 20 - 10L; val cy = (p * 5) % 16 - 8L
      (cx, cy, cx + 4, cy + 1, cx + 1, cy + 3)
    }
    val pts = (for (x <- -12L to 12L; y <- -10L to 10L)
      yield (x * 100 + y, x, y)).toSeq
    val brute = (for ((id, x, y) <- pts; (t, p) <- tris.zipWithIndex
      if inside(t, x, y)) yield (id, p.toLong)).toSet
    for (cell <- Seq(1L, 3L, 8L, 64L)) {
      val got = Spatial.containsJoin(pts.toDF("id", "px", "py"), tris, cell)
        .select($"id", $"poly_id").as[(Long, Long)].collect().toSet
      got shouldBe brute
    }
  }

  test("plan: tiles broadcast, candidates from a hash equi-join — no cartesian") {
    val pts = Seq((1L, 1L, 1L)).toDF("id", "px", "py")
    val plan = Spatial.containsJoin(pts, Seq((0L, 0L, 4L, 1L, 1L, 3L)), 8L)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("zonalStats: per-zone fold equals brute force; empty zones absent") {
    val tris = Seq(
      (0L, 0L, 4L, 1L, 1L, 3L),     // holds some lattice points
      (50L, 50L, 54L, 51L, 51L, 53L)) // far away: no points -> no row
    val pts = (for (x <- -2L to 6L; y <- -2L to 6L)
      yield (x * 100 + y, x, y, x * 7 + y * 3)).toSeq
    val brute = (for ((_, x, y, v) <- pts; (t, p) <- tris.zipWithIndex
      if inside(t, x, y)) yield (p.toLong, v))
      .groupBy(_._1).map { case (p, vs0) =>
        val vs = vs0.map(_._2)
        (p, (vs.size.toLong, vs.sum, vs.min, vs.max))
      }
    val got = Spatial.zonalStats(pts.toDF("id", "px", "py", "value"), tris, 8L)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (p, n, s, mn, mx) => (p, (n, s, mn, mx)) }.toMap
    got shouldBe brute
    got.contains(1L) shouldBe false // the empty zone emitted no row
  }

  test("non-CCW triangles refuse loudly") {
    an[IllegalArgumentException] should be thrownBy
      Spatial.containsJoin(Seq((1L, 0L, 0L)).toDF("id", "px", "py"),
        Seq((0L, 0L, 1L, 3L, 4L, 1L)), 8L) // clockwise winding
  }
}
