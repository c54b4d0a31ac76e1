package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns. The dot-product
  * kernel is a native codegen'd Catalyst expression ([[VecDot]]) so the
  * whole similarity pipeline stays inside whole-stage codegen — no UDF, no
  * interpreted higher-order lambdas in the pair loop.
  *
  * All math is done in double after an elementwise widen: float accumulation
  * drifts ~1e-6 over 64 dims, enough to flip a rounded 4th decimal against
  * the (double-computing) oracle; double accumulation agrees bit-for-bit.
  * Accumulation is left-to-right, matching DuckDB's list_dot_product order.
  */
object Vectors {

  /** Left-to-right double dot product — same accumulation order as the
    * oracle; fused native loop via [[VecDot]].
    */
  def dot(a: Column, b: Column): Column = VecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine given precomputed norms — lets all-pairs joins hoist the two
    * norm computations out of the pair loop (norm per row, not per pair).
    */
  def cosineWithNorms(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Deterministic pseudo-random hyperplane weights for bit `b` of an
    * `nbits` LSH bucket over `dims` dimensions — plan-time constants, no RNG
    * state, identical on every executor.
    */
  def planeWeights(b: Int, dims: Int): Seq[Double] =
    (0 until dims).map { d =>
      val h = scala.util.hashing.MurmurHash3.productHash((b, d))
      h.toDouble / Int.MaxValue // in [-1, 1]
    }

  /** Random-hyperplane (SimHash-family) LSH bucket id: sign pattern of the
    * vector against `nbits` pseudo-random hyperplanes. Each projection is a
    * single native dot against a literal weight array.
    */
  def hyperplaneBucket(v: Column, nbits: Int, dims: Int = 64): Column = {
    val bits = (0 until nbits).map { b =>
      val proj = dot(v, typedLit(planeWeights(b, dims)))
      when(proj > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce((x: Column, y: Column) => x.bitwiseOR(y))
  }
}
