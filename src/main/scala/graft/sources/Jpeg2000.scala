package graft.sources

import scala.collection.mutable.ArrayBuffer

/** Scoped JPEG 2000 codestream codec (ITU-T T.800 / ISO 15444-1) for
  * GRIB2 data representation template 5.40 — the packing NCEP's
  * operational products ship. Spec-from-scratch implementation of the
  * reversible path plus the UNQUANTIZED irreversible path:
  *
  *  - reversible 5/3 integer wavelet (Annex F lifting, whole-sample
  *    symmetric extension), dyadic decomposition;
  *  - irreversible 9/7 wavelet (F.4.8.2 lifting + K scaling) at Δ=1:
  *    integer coefficients, no subband quantization — decodes GRIB2
  *    5.40 compression-type-1 streams whose QCD carries no step sizes;
  *  - EBCOT Tier-1: MQ arithmetic coder (Annex C, the 47-state table)
  *    with the Annex-D context model — significance propagation,
  *    magnitude refinement and cleanup passes, stripe-of-4 scan, run
  *    mode, 19 contexts with the standard initial states;
  *  - Tier-2: packet headers with inclusion + zero-bitplane tag trees
  *    (Annex B.10), pass-count codewords, Lblock length signaling,
  *    0xFF bit-stuffing; LRCP progression, single layer;
  *  - markers: SOC/SIZ/COD/QCD/SOT/SOD/EOC, single tile, single
  *    component, no precinct subdivision, no SOP/EPH.
  *
  * Scope is rejected LOUDLY, never guessed around: scalar-QUANTIZED
  * subbands (Sqcd style 1/2, the rate-targeted lossy mode), multiple
  * components/tiles/layers, and precinct partitions all raise with a
  * pointer. Encoder and decoder are independent walks of the same spec;
  * Jpeg2000Spec round-trips random fields, pins hand cases and the 9/7
  * lifting identities, and the r16/r26 gates prove the GRIB2
  * integration against closed-form oracles (r14's discipline).
  */
object Jpeg2000 {

  // ------------------------------------------------------------ MQ coder
  // T.800 Table C.2: (Qe, NMPS, NLPS, SWITCH) per state.
  private val Qe = Array(
    0x5601, 0x3401, 0x1801, 0x0AC1, 0x0521, 0x0221, 0x5601, 0x5401,
    0x4801, 0x3801, 0x3001, 0x2401, 0x1C01, 0x1601, 0x5601, 0x5401,
    0x5101, 0x4801, 0x3801, 0x3401, 0x3001, 0x2801, 0x2401, 0x2201,
    0x1C01, 0x1801, 0x1601, 0x1401, 0x1201, 0x1101, 0x0AC1, 0x09C1,
    0x08A1, 0x0521, 0x0441, 0x02A1, 0x0221, 0x0141, 0x0111, 0x0085,
    0x0049, 0x0025, 0x0015, 0x0009, 0x0005, 0x0001, 0x5601)
  private val Nmps = Array(
    1, 2, 3, 4, 5, 38, 7, 8, 9, 10, 11, 12, 13, 29, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 45, 46)
  private val Nlps = Array(
    1, 6, 9, 12, 29, 33, 6, 14, 14, 14, 17, 18, 20, 21, 14, 14,
    15, 16, 17, 18, 19, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29,
    30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 46)
  private val Switch = Array(
    1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)

  private val NCtx = 19
  private val CtxRL = 17
  private val CtxUni = 18

  /** Annex D initial context states: all (0, MPS 0) except UNIFORM=46,
    * RL=3, and the all-zero-neighborhood ZC context=4.
    */
  private def freshContexts(): (Array[Int], Array[Int]) = {
    val st = new Array[Int](NCtx)
    val mps = new Array[Int](NCtx)
    st(CtxUni) = 46; st(CtxRL) = 3; st(0) = 4
    (st, mps)
  }

  private final class MqEncoder {
    private val (st, mps) = freshContexts()
    private var a = 0x8000
    private var c = 0
    private var ct = 12
    private val out = ArrayBuffer[Int](0) // sentinel byte, stripped at flush

    private def byteOut(): Unit = {
      if (out.last == 0xFF) {
        out += (c >>> 20); c &= 0xFFFFF; ct = 7
      } else if (c < 0x8000000) {
        out += (c >>> 19); c &= 0x7FFFF; ct = 8
      } else {
        out(out.length - 1) += 1
        if (out.last == 0xFF) {
          c &= 0x7FFFFFF
          out += (c >>> 20); c &= 0xFFFFF; ct = 7
        } else {
          out += (c >>> 19); c &= 0x7FFFF; ct = 8
        }
      }
    }
    private def renorm(): Unit = {
      while ({ a <<= 1; c <<= 1; ct -= 1; if (ct == 0) byteOut(); (a & 0x8000) == 0 }) ()
    }
    def encode(bit: Int, cx: Int): Unit = {
      val q = Qe(st(cx))
      if (bit == mps(cx)) {
        a -= q
        if ((a & 0x8000) == 0) {
          if (a < q) a = q else c += q
          st(cx) = Nmps(st(cx))
          renorm()
        } else c += q
      } else {
        a -= q
        if (a < q) c += q else a = q
        if (Switch(st(cx)) == 1) mps(cx) = 1 - mps(cx)
        st(cx) = Nlps(st(cx))
        renorm()
      }
    }
    def flush(): Array[Byte] = {
      val tempC = c + a
      c |= 0xFFFF
      if (c >= tempC) c -= 0x8000
      c <<= ct; byteOut()
      c <<= ct; byteOut()
      var bytes = out.drop(1) // strip sentinel
      while (bytes.nonEmpty && bytes.last == 0xFF) bytes = bytes.dropRight(1)
      bytes.map(_.toByte).toArray
    }
  }

  private final class MqDecoder(data: Array[Byte]) {
    private val (st, mps) = freshContexts()
    private var bp = 0
    private var c = 0
    private var ct = 0
    private var a = 0
    private def b(i: Int): Int = if (i < data.length) data(i) & 0xff else 0xFF
    private def byteIn(): Unit = {
      if (b(bp) == 0xFF) {
        if (b(bp + 1) > 0x8F) { c += 0xFF00; ct = 8 }
        else { bp += 1; c += b(bp) << 9; ct = 7 }
      } else { bp += 1; c += b(bp) << 8; ct = 8 }
    }
    // INITDEC
    c = b(0) << 16
    byteIn()
    c <<= 7; ct -= 7; a = 0x8000

    private def renorm(): Unit = {
      while ({ if (ct == 0) byteIn(); a <<= 1; c <<= 1; ct -= 1; (a & 0x8000) == 0 }) ()
    }
    def decode(cx: Int): Int = {
      val q = Qe(st(cx))
      a -= q
      var d = 0
      if (((c >>> 16) & 0xFFFF) < q) {
        // LPS exchange path
        if (a < q) { d = mps(cx); st(cx) = Nmps(st(cx)) }
        else {
          d = 1 - mps(cx)
          if (Switch(st(cx)) == 1) mps(cx) = 1 - mps(cx)
          st(cx) = Nlps(st(cx))
        }
        a = q
        renorm()
      } else {
        c -= q << 16
        if ((a & 0x8000) == 0) {
          if (a < q) {
            d = 1 - mps(cx)
            if (Switch(st(cx)) == 1) mps(cx) = 1 - mps(cx)
            st(cx) = Nlps(st(cx))
          } else { d = mps(cx); st(cx) = Nmps(st(cx)) }
          renorm()
        } else d = mps(cx)
      }
      d
    }
  }

  // ----------------------------------------------- 5/3 reversible wavelet
  /** Forward 1D 5/3 lifting on `x`, whole-sample symmetric extension:
    * returns (low = even samples lifted, high = odd samples lifted).
    */
  private def fwd53(x: Array[Int]): (Array[Int], Array[Int]) = {
    val n = x.length
    if (n == 1) return (Array(x(0)), Array.empty[Int])
    val nl = (n + 1) / 2; val nh = n / 2
    def xe(i: Int): Int = // symmetric extension around the edges
      if (i < 0) x(-i) else if (i >= n) x(2 * n - 2 - i) else x(i)
    val h = new Array[Int](nh)
    var i = 0
    while (i < nh) {
      h(i) = x(2 * i + 1) - Math.floorDiv(xe(2 * i) + xe(2 * i + 2), 2)
      i += 1
    }
    def he(i: Int): Int = if (i < 0) h(-1 - i) else if (i >= nh) h(2 * nh - 1 - i) else h(i)
    val l = new Array[Int](nl)
    i = 0
    while (i < nl) {
      l(i) = x(2 * i) + Math.floorDiv(he(i - 1) + he(i) + 2, 4)
      i += 1
    }
    (l, h)
  }

  /** Inverse of [[fwd53]]. */
  private def inv53(l: Array[Int], h: Array[Int]): Array[Int] = {
    val n = l.length + h.length
    if (n == 1) return Array(l(0))
    val nl = l.length; val nh = h.length
    def he(i: Int): Int = if (i < 0) h(-1 - i) else if (i >= nh) h(2 * nh - 1 - i) else h(i)
    val x = new Array[Int](n)
    var i = 0
    while (i < nl) {
      x(2 * i) = l(i) - Math.floorDiv(he(i - 1) + he(i) + 2, 4)
      i += 1
    }
    def xe(i: Int): Int =
      if (i < 0) x(-i) else if (i >= n) x(2 * n - 2 - i) else x(i)
    i = 0
    while (i < nh) {
      x(2 * i + 1) = h(i) + Math.floorDiv(xe(2 * i) + xe(2 * i + 2), 2)
      i += 1
    }
    x
  }

  // --------------------------------------- 9/7 irreversible wavelet (F.4.8.2)

  private val A97 = -1.586134342059924 // lifting α
  private val B97 = -0.052980118572961 // lifting β
  private val C97 = 0.882911075530934  // lifting γ
  private val D97 = 0.443506852043971  // lifting δ
  private val K97 = 1.230174104914001  // scaling K

  /** Forward 1D 9/7 lifting (T.800 F.4.8.2 analysis): four in-place
    * lifting sweeps with whole-sample symmetric extension, then the K
    * scaling (low /= K, high *= K). The constants are the CDF 9/7
    * algebraic set: the high-pass annihilates constants and linears
    * (vanishing moments) and the low-pass has DC gain exactly 1 after
    * the 1/K — both pinned by Jpeg2000Spec, and the reason an
    * all-constant field survives the lossy path bit-exactly.
    */
  private[graft] def fwd97(x: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    if (n == 1) return (Array(x(0)), Array.empty[Double])
    val y = x.clone()
    def e(i: Int): Int = if (i < 0) -i else if (i >= n) 2 * n - 2 - i else i
    def sweep(start: Int, c: Double): Unit = {
      var i = start
      while (i < n) { y(i) += c * (y(e(i - 1)) + y(e(i + 1))); i += 2 }
    }
    sweep(1, A97); sweep(0, B97); sweep(1, C97); sweep(0, D97)
    val nl = (n + 1) / 2; val nh = n / 2
    val l = new Array[Double](nl); val h = new Array[Double](nh)
    var i = 0
    while (i < nl) { l(i) = y(2 * i) / K97; i += 1 }
    i = 0
    while (i < nh) { h(i) = y(2 * i + 1) * K97; i += 1 }
    (l, h)
  }

  /** Inverse of [[fwd97]] (synthesis): undo the scaling, then the four
    * lifting sweeps in reverse with the same extension.
    */
  private[graft] def inv97(l: Array[Double], h: Array[Double]): Array[Double] = {
    val n = l.length + h.length
    if (n == 1) return Array(l(0))
    val y = new Array[Double](n)
    var i = 0
    while (i < l.length) { y(2 * i) = l(i) * K97; i += 1 }
    i = 0
    while (i < h.length) { y(2 * i + 1) = h(i) / K97; i += 1 }
    def e(j: Int): Int = if (j < 0) -j else if (j >= n) 2 * n - 2 - j else j
    def sweep(start: Int, c: Double): Unit = {
      var j = start
      while (j < n) { y(j) -= c * (y(e(j - 1)) + y(e(j + 1))); j += 2 }
    }
    sweep(0, D97); sweep(1, C97); sweep(0, B97); sweep(1, A97)
    y
  }

  /** A subband: orientation 0=LL, 1=HL (horizontal detail, top-right),
    * 2=LH, 3=HH; row-major coefficients.
    */
  private final case class Band(orient: Int, w: Int, h: Int, coef: Array[Int])

  /** Dyadic forward decomposition: returns (LL_levels, details) where
    * details(k) = (HL, LH, HH) of decomposition level k+1 (finest first).
    */
  private def fwdDwt(samples: Array[Int], w: Int, h: Int,
                     levels: Int): (Band, Array[(Band, Band, Band)]) = {
    var cur = samples; var cw = w; var ch = h
    val details = ArrayBuffer[(Band, Band, Band)]()
    for (_ <- 1 to levels) {
      val lw = (cw + 1) / 2; val hw = cw / 2
      val lh = (ch + 1) / 2; val hh2 = ch / 2
      // rows
      val rowL = Array.ofDim[Int](ch, lw); val rowH = Array.ofDim[Int](ch, hw)
      for (y <- 0 until ch) {
        val (l, hi) = fwd53(Array.tabulate(cw)(x => cur(y * cw + x)))
        rowL(y) = l; rowH(y) = hi
      }
      // columns of each half
      val ll = new Array[Int](lw * lh); val lh_ = new Array[Int](lw * hh2)
      val hl = new Array[Int](hw * lh); val hh = new Array[Int](hw * hh2)
      for (x <- 0 until lw) {
        val (l, hi) = fwd53(Array.tabulate(ch)(y => rowL(y)(x)))
        for (y <- 0 until lh) ll(y * lw + x) = l(y)
        for (y <- 0 until hh2) lh_(y * lw + x) = hi(y)
      }
      for (x <- 0 until hw) {
        val (l, hi) = fwd53(Array.tabulate(ch)(y => rowH(y)(x)))
        for (y <- 0 until lh) hl(y * hw + x) = l(y)
        for (y <- 0 until hh2) hh(y * hw + x) = hi(y)
      }
      details += ((Band(1, hw, lh, hl), Band(2, lw, hh2, lh_), Band(3, hw, hh2, hh)))
      cur = ll; cw = lw; ch = lh
    }
    (Band(0, cw, ch, cur), details.toArray)
  }

  /** Inverse of [[fwdDwt]]. */
  private def invDwt(ll0: Band, details: Array[(Band, Band, Band)]): Array[Int] = {
    var cur = ll0.coef; var cw = ll0.w; var ch = ll0.h
    for (k <- details.indices.reverse) {
      val (hl, lh, hh) = details(k)
      val lw = cw; val lhgt = ch
      val hw = hl.w; val hhgt = lh.h
      val fullW = lw + hw; val fullH = lhgt + hhgt
      // inverse columns: [LL/LH] -> rowL halves, [HL/HH] -> rowH halves
      val rowL = Array.ofDim[Int](fullH, lw); val rowH = Array.ofDim[Int](fullH, hw)
      for (x <- 0 until lw) {
        val col = inv53(Array.tabulate(lhgt)(y => cur(y * lw + x)),
          Array.tabulate(hhgt)(y => lh.coef(y * lw + x)))
        for (y <- 0 until fullH) rowL(y)(x) = col(y)
      }
      for (x <- 0 until hw) {
        val col = inv53(Array.tabulate(lhgt)(y => hl.coef(y * hw + x)),
          Array.tabulate(hhgt)(y => hh.coef(y * hw + x)))
        for (y <- 0 until fullH) rowH(y)(x) = col(y)
      }
      val outW = fullW
      val out = new Array[Int](outW * fullH)
      for (y <- 0 until fullH) {
        val row = inv53(rowL(y), rowH(y))
        for (x <- 0 until outW) out(y * outW + x) = row(x)
      }
      cur = out; cw = fullW; ch = fullH
    }
    cur
  }

  /** Dyadic 9/7 forward decomposition on Double planes, coefficients
    * rounded to Int only at the END of the full decomposition (the
    * Δ=1 "unquantized" lossy path: the only loss is this rounding).
    */
  private def fwdDwt97(samples: Array[Double], w: Int, h: Int,
                       levels: Int): (Band, Array[(Band, Band, Band)]) = {
    var cur = samples; var cw = w; var ch = h
    val planes = ArrayBuffer[(Array[Double], Array[Double], Array[Double], Int, Int, Int, Int)]()
    for (_ <- 1 to levels) {
      val lw = (cw + 1) / 2; val hw = cw / 2
      val lh = (ch + 1) / 2; val hh2 = ch / 2
      val rowL = Array.ofDim[Double](ch, lw); val rowH = Array.ofDim[Double](ch, hw)
      for (y <- 0 until ch) {
        val (l, hi) = fwd97(Array.tabulate(cw)(x => cur(y * cw + x)))
        rowL(y) = l; rowH(y) = hi
      }
      val ll = new Array[Double](lw * lh); val lh_ = new Array[Double](lw * hh2)
      val hl = new Array[Double](hw * lh); val hh = new Array[Double](hw * hh2)
      for (x <- 0 until lw) {
        val (l, hi) = fwd97(Array.tabulate(ch)(y => rowL(y)(x)))
        for (y <- 0 until lh) ll(y * lw + x) = l(y)
        for (y <- 0 until hh2) lh_(y * lw + x) = hi(y)
      }
      for (x <- 0 until hw) {
        val (l, hi) = fwd97(Array.tabulate(ch)(y => rowH(y)(x)))
        for (y <- 0 until lh) hl(y * hw + x) = l(y)
        for (y <- 0 until hh2) hh(y * hw + x) = hi(y)
      }
      planes += ((hl, lh_, hh, hw, lh, lw, hh2))
      cur = ll; cw = lw; ch = lh
    }
    def rnd(a: Array[Double]): Array[Int] = a.map(v => Math.round(v).toInt)
    val details = planes.map { case (hl, lh_, hh, hw, lh, lw, hh2) =>
      (Band(1, hw, lh, rnd(hl)), Band(2, lw, hh2, rnd(lh_)), Band(3, hw, hh2, rnd(hh)))
    }
    (Band(0, cw, ch, rnd(cur)), details.toArray)
  }

  /** Inverse of [[fwdDwt97]] from the decoded INTEGER coefficients:
    * synthesis runs in doubles; the caller rounds the reconstruction.
    */
  private def invDwt97(ll0: Band, details: Array[(Band, Band, Band)]): Array[Double] = {
    var cur = ll0.coef.map(_.toDouble); var cw = ll0.w; var ch = ll0.h
    for (k <- details.indices.reverse) {
      val (hl, lh, hh) = details(k)
      val lw = cw; val lhgt = ch
      val hw = hl.w; val hhgt = lh.h
      val fullW = lw + hw; val fullH = lhgt + hhgt
      val rowL = Array.ofDim[Double](fullH, lw); val rowH = Array.ofDim[Double](fullH, hw)
      for (x <- 0 until lw) {
        val col = inv97(Array.tabulate(lhgt)(y => cur(y * lw + x)),
          Array.tabulate(hhgt)(y => lh.coef(y * lw + x).toDouble))
        for (y <- 0 until fullH) rowL(y)(x) = col(y)
      }
      for (x <- 0 until hw) {
        val col = inv97(Array.tabulate(lhgt)(y => hl.coef(y * hw + x).toDouble),
          Array.tabulate(hhgt)(y => hh.coef(y * hw + x).toDouble))
        for (y <- 0 until fullH) rowH(y)(x) = col(y)
      }
      val out = new Array[Double](fullW * fullH)
      for (y <- 0 until fullH) {
        val row = inv97(rowL(y), rowH(y))
        for (x <- 0 until fullW) out(y * fullW + x) = row(x)
      }
      cur = out; cw = fullW; ch = fullH
    }
    cur
  }

  // --------------------------------------------- Tier-1 context modeling
  /** Annex D Table D.1 zero-coding context from neighbor significance
    * sums; LL/LH use the H-primary table, HL swaps H and V, HH is
    * diagonal-driven.
    */
  private def ctxZC(orient: Int, sh: Int, sv: Int, sd: Int): Int = {
    val (h, v) = if (orient == 1) (sv, sh) else (sh, sv)
    if (orient == 3) {
      val hv = sh + sv
      if (sd >= 3) 8
      else if (sd == 2) { if (hv >= 1) 7 else 6 }
      else if (sd == 1) { if (hv >= 2) 5 else if (hv == 1) 4 else 3 }
      else { if (hv >= 2) 2 else if (hv == 1) 1 else 0 }
    } else {
      if (h == 2) 8
      else if (h == 1) { if (v >= 1) 7 else if (sd >= 1) 6 else 5 }
      else { // h == 0
        if (v == 2) 4 else if (v == 1) 3
        else if (sd >= 2) 2 else if (sd == 1) 1 else 0
      }
    }
  }

  /** Annex D Table D.2 sign-coding: (context, xor bit) from the clamped
    * horizontal/vertical sign contributions in {-1,0,1}.
    */
  private def ctxSC(h: Int, v: Int): (Int, Int) = (h, v) match {
    case (1, 1)   => (13, 0)
    case (1, 0)   => (12, 0)
    case (1, -1)  => (11, 0)
    case (0, 1)   => (10, 0)
    case (0, 0)   => (9, 0)
    case (0, -1)  => (10, 1)
    case (-1, 1)  => (11, 1)
    case (-1, 0)  => (12, 1)
    case (-1, -1) => (13, 1)
    case _        => sys.error("unreachable")
  }

  /** Tier-1 code-block coding state shared by encode and decode: the two
    * directions differ only in where the bit comes from.
    */
  private final class BlockCoder(w: Int, h: Int, orient: Int) {
    val sig = new Array[Boolean](w * h)     // significant
    val neg = new Array[Boolean](w * h)     // sign (true = negative)
    val visited = new Array[Boolean](w * h) // coded in this plane's SPP/run
    val refined = new Array[Boolean](w * h)

    def sums(x: Int, y: Int): (Int, Int, Int) = {
      def s(xx: Int, yy: Int): Int =
        if (xx < 0 || yy < 0 || xx >= w || yy >= h) 0
        else if (sig(yy * w + xx)) 1 else 0
      val sh = s(x - 1, y) + s(x + 1, y)
      val sv = s(x, y - 1) + s(x, y + 1)
      val sd = s(x - 1, y - 1) + s(x + 1, y - 1) + s(x - 1, y + 1) + s(x + 1, y + 1)
      (sh, sv, sd)
    }
    def zc(x: Int, y: Int): Int = {
      val (sh, sv, sd) = sums(x, y); ctxZC(orient, sh, sv, sd)
    }
    def sc(x: Int, y: Int): (Int, Int) = {
      def contrib(xx: Int, yy: Int): Int =
        if (xx < 0 || yy < 0 || xx >= w || yy >= h) 0
        else if (!sig(yy * w + xx)) 0
        else if (neg(yy * w + xx)) -1 else 1
      val hc = math.max(-1, math.min(1, contrib(x - 1, y) + contrib(x + 1, y)))
      val vc = math.max(-1, math.min(1, contrib(x, y - 1) + contrib(x, y + 1)))
      ctxSC(hc, vc)
    }
    def mr(x: Int, y: Int): Int = {
      if (refined(y * w + x)) 16
      else {
        val (sh, sv, sd) = sums(x, y)
        if (sh + sv + sd > 0) 15 else 14
      }
    }
  }

  /** Encode one code-block; returns (bytes, number of coding passes,
    * K = coded magnitude bitplanes). K = 0 → block carries nothing.
    */
  private def encodeBlock(coef: Array[Int], w: Int, h: Int, orient: Int): (Array[Byte], Int, Int) = {
    var maxMag = 0
    for (v <- coef) maxMag = math.max(maxMag, math.abs(v))
    val k = 32 - Integer.numberOfLeadingZeros(maxMag)
    if (k == 0) return (Array.empty, 0, 0)
    val mq = new MqEncoder
    val bc = new BlockCoder(w, h, orient)
    def mag(i: Int): Int = math.abs(coef(i))

    def stripes(body: (Int, Int) => Unit): Unit = {
      var y0 = 0
      while (y0 < h) {
        var x = 0
        while (x < w) {
          var dy = 0
          while (dy < math.min(4, h - y0)) { body(x, y0 + dy); dy += 1 }
          x += 1
        }
        y0 += 4
      }
    }

    for (p <- (k - 1) to 0 by -1) {
      val first = p == k - 1
      if (!first) {
        // significance propagation
        stripes { (x, y) =>
          val i = y * w + x
          if (!bc.sig(i) && bc.zc(x, y) != 0) {
            val bit = (mag(i) >>> p) & 1
            mq.encode(bit, bc.zc(x, y))
            if (bit == 1) {
              bc.sig(i) = true; bc.neg(i) = coef(i) < 0
              val (cx, xor) = bc.sc(x, y)
              mq.encode((if (bc.neg(i)) 1 else 0) ^ xor, cx)
            }
            bc.visited(i) = true
          }
        }
        // magnitude refinement
        stripes { (x, y) =>
          val i = y * w + x
          if (bc.sig(i) && !bc.visited(i)) {
            mq.encode((mag(i) >>> p) & 1, bc.mr(x, y))
            bc.refined(i) = true
          }
        }
      }
      // cleanup
      var y0 = 0
      while (y0 < h) {
        var x = 0
        while (x < w) {
          val fullStripe = h - y0 >= 4
          var start = 0
          var runMode = false
          if (fullStripe) {
            var allQuiet = true
            var dy = 0
            while (dy < 4 && allQuiet) {
              val i = (y0 + dy) * w + x
              if (bc.sig(i) || bc.visited(i) || bc.zc(x, y0 + dy) != 0) allQuiet = false
              dy += 1
            }
            if (allQuiet) {
              runMode = true
              var firstSig = -1
              dy = 0
              while (dy < 4 && firstSig < 0) {
                if (((mag((y0 + dy) * w + x) >>> p) & 1) == 1) firstSig = dy
                dy += 1
              }
              if (firstSig < 0) {
                mq.encode(0, CtxRL)
                start = 4 // nothing further in this column
              } else {
                mq.encode(1, CtxRL)
                mq.encode((firstSig >>> 1) & 1, CtxUni)
                mq.encode(firstSig & 1, CtxUni)
                val y = y0 + firstSig
                val i = y * w + x
                bc.sig(i) = true; bc.neg(i) = coef(i) < 0
                val (cx, xor) = bc.sc(x, y)
                mq.encode((if (bc.neg(i)) 1 else 0) ^ xor, cx)
                start = firstSig + 1
              }
            }
          }
          if (!runMode || start < 4) {
            var dy = start
            while (dy < math.min(4, h - y0)) {
              val y = y0 + dy
              val i = y * w + x
              if (!bc.sig(i) && !bc.visited(i)) {
                val bit = (mag(i) >>> p) & 1
                mq.encode(bit, bc.zc(x, y))
                if (bit == 1) {
                  bc.sig(i) = true; bc.neg(i) = coef(i) < 0
                  val (cx, xor) = bc.sc(x, y)
                  mq.encode((if (bc.neg(i)) 1 else 0) ^ xor, cx)
                }
              }
              dy += 1
            }
          }
          x += 1
        }
        y0 += 4
      }
      java.util.Arrays.fill(bc.visited, false)
    }
    (mq.flush(), 3 * k - 2, k)
  }

  /** Decode one code-block coded by [[encodeBlock]] (full passes). */
  private def decodeBlock(data: Array[Byte], w: Int, h: Int, orient: Int,
                          k: Int): Array[Int] = {
    val mq = new MqDecoder(data)
    val bc = new BlockCoder(w, h, orient)
    val mag = new Array[Int](w * h)

    def stripes(body: (Int, Int) => Unit): Unit = {
      var y0 = 0
      while (y0 < h) {
        var x = 0
        while (x < w) {
          var dy = 0
          while (dy < math.min(4, h - y0)) { body(x, y0 + dy); dy += 1 }
          x += 1
        }
        y0 += 4
      }
    }

    for (p <- (k - 1) to 0 by -1) {
      val first = p == k - 1
      if (!first) {
        stripes { (x, y) =>
          val i = y * w + x
          if (!bc.sig(i) && bc.zc(x, y) != 0) {
            val bit = mq.decode(bc.zc(x, y))
            if (bit == 1) {
              mag(i) |= 1 << p
              bc.sig(i) = true
              val (cx, xor) = bc.sc(x, y)
              bc.neg(i) = (mq.decode(cx) ^ xor) == 1
            }
            bc.visited(i) = true
          }
        }
        stripes { (x, y) =>
          val i = y * w + x
          if (bc.sig(i) && !bc.visited(i)) {
            val bit = mq.decode(bc.mr(x, y))
            mag(i) |= bit << p
            bc.refined(i) = true
          }
        }
      }
      var y0 = 0
      while (y0 < h) {
        var x = 0
        while (x < w) {
          val fullStripe = h - y0 >= 4
          var start = 0
          var runMode = false
          if (fullStripe) {
            var allQuiet = true
            var dy = 0
            while (dy < 4 && allQuiet) {
              val i = (y0 + dy) * w + x
              if (bc.sig(i) || bc.visited(i) || bc.zc(x, y0 + dy) != 0) allQuiet = false
              dy += 1
            }
            if (allQuiet) {
              runMode = true
              if (mq.decode(CtxRL) == 0) start = 4
              else {
                val firstSig = (mq.decode(CtxUni) << 1) | mq.decode(CtxUni)
                val y = y0 + firstSig
                val i = y * w + x
                mag(i) |= 1 << p
                bc.sig(i) = true
                val (cx, xor) = bc.sc(x, y)
                bc.neg(i) = (mq.decode(cx) ^ xor) == 1
                start = firstSig + 1
              }
            }
          }
          if (!runMode || start < 4) {
            var dy = start
            while (dy < math.min(4, h - y0)) {
              val y = y0 + dy
              val i = y * w + x
              if (!bc.sig(i) && !bc.visited(i)) {
                val bit = mq.decode(bc.zc(x, y))
                if (bit == 1) {
                  mag(i) |= 1 << p
                  bc.sig(i) = true
                  val (cx, xor) = bc.sc(x, y)
                  bc.neg(i) = (mq.decode(cx) ^ xor) == 1
                }
              }
              dy += 1
            }
          }
          x += 1
        }
        y0 += 4
      }
      java.util.Arrays.fill(bc.visited, false)
    }
    Array.tabulate(w * h)(i => if (bc.neg(i)) -mag(i) else mag(i))
  }

  // ----------------------------------------------------------- tag trees
  /** Annex B.10.2 tag tree over a wb x hb leaf grid. Both directions keep
    * the per-node resolved lower bound (`low`) and a `known` flag; the
    * encoder additionally holds the true node values (min of children).
    */
  private final class TagTree(wb: Int, hb: Int) {
    private case class Lvl(w: Int, h: Int)
    private val lvls = {
      val b = ArrayBuffer(Lvl(wb, hb))
      while (b.last.w > 1 || b.last.h > 1)
        b += Lvl((b.last.w + 1) / 2, (b.last.h + 1) / 2)
      b.toArray // 0 = leaves, last = root
    }
    private val value = lvls.map(l => Array.fill(l.w * l.h)(Int.MaxValue))
    private val low = lvls.map(l => new Array[Int](l.w * l.h))
    private val known = lvls.map(l => new Array[Boolean](l.w * l.h))

    def set(x: Int, y: Int, v: Int): Unit = {
      value(0)(y * lvls(0).w + x) = v
      // propagate mins upward
      for (k <- 1 until lvls.length; yy <- 0 until lvls(k).h; xx <- 0 until lvls(k).w) {
        var m = Int.MaxValue
        for (cy <- yy * 2 to yy * 2 + 1; cx <- xx * 2 to xx * 2 + 1)
          if (cy < lvls(k - 1).h && cx < lvls(k - 1).w)
            m = math.min(m, value(k - 1)(cy * lvls(k - 1).w + cx))
        value(k)(yy * lvls(k).w + xx) = m
      }
    }

    private def path(x: Int, y: Int): Seq[(Int, Int)] = // (level, idx) root→leaf
      (lvls.length - 1) to 0 by -1 map { k =>
        val xx = x >> k; val yy = y >> k
        (k, yy * lvls(k).w + xx)
      }

    /** Emit the bits that let the decoder resolve whether
      * leaf value < `threshold` (and the exact value if so).
      */
    def encode(x: Int, y: Int, threshold: Int, bw: HeaderBitWriter): Unit = {
      var lo = 0
      for ((k, idx) <- path(x, y)) {
        if (low(k)(idx) < lo) low(k)(idx) = lo
        var brk = false
        while (!brk && low(k)(idx) < threshold) {
          if (low(k)(idx) >= value(k)(idx)) {
            if (!known(k)(idx)) { bw.bit(1); known(k)(idx) = true }
            brk = true
          } else {
            bw.bit(0)
            low(k)(idx) += 1
          }
        }
        lo = low(k)(idx)
      }
    }

    /** Decoder twin of [[encode]]: returns true iff leaf value <
      * `threshold`; when true, the exact value is `lowOf(x, y)`.
      */
    def decode(x: Int, y: Int, threshold: Int, br: HeaderBitReader): Boolean = {
      var lo = 0
      for ((k, idx) <- path(x, y)) {
        if (low(k)(idx) < lo) low(k)(idx) = lo
        var brk = known(k)(idx) && low(k)(idx) >= value(k)(idx)
        while (!brk && low(k)(idx) < threshold) {
          if (br.bit() == 1) {
            known(k)(idx) = true
            value(k)(idx) = low(k)(idx) // resolved exactly
            brk = true
          } else low(k)(idx) += 1
        }
        lo = low(k)(idx)
      }
      val leafIdx = y * lvls(0).w + x
      known(0)(leafIdx) && value(0)(leafIdx) < threshold
    }

    def lowOf(x: Int, y: Int): Int = value(0)(y * lvls(0).w + x)
  }

  // ------------------------------------- packet-header bit IO (stuffed)
  private[sources] final class HeaderBitWriter {
    private val out = ArrayBuffer[Int]()
    private var cur = 0
    private var nb = 0
    private def lastFF: Boolean = out.nonEmpty && out.last == 0xFF
    def bit(b: Int): Unit = {
      val width = if (lastFF) 7 else 8
      cur = (cur << 1) | (b & 1); nb += 1
      if (nb == width) { out += cur; cur = 0; nb = 0 }
    }
    def bits(v: Int, n: Int): Unit =
      for (i <- (n - 1) to 0 by -1) bit((v >>> i) & 1)
    def finish(): Array[Byte] = {
      if (nb > 0) {
        val width = if (lastFF) 7 else 8
        out += (cur << (width - nb)); cur = 0; nb = 0
      }
      if (out.nonEmpty && out.last == 0xFF) out += 0x00 // cannot end on FF
      out.map(_.toByte).toArray
    }
  }

  private[sources] final class HeaderBitReader(data: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nb = 0
    private var prevFF = false
    def bit(): Int = {
      if (nb == 0) {
        require(pos < data.length, "truncated JPEG2000 packet header")
        cur = data(pos) & 0xff; pos += 1
        nb = if (prevFF) 7 else 8
        prevFF = cur == 0xFF
      }
      nb -= 1
      (cur >>> nb) & 1
    }
    def bits(n: Int): Int = { var v = 0; for (_ <- 0 until n) v = (v << 1) | bit(); v }
    /** Byte position after header end. The writer cannot end a header on
      * 0xFF (it appends a 0x00 stuff byte), so when the last loaded byte
      * was 0xFF the reader must step past that stuff byte too.
      */
    def end(): Int = if (prevFF) pos + 1 else pos
  }

  // ------------------------------------------------------- codestream IO
  private val GuardBits = 2
  private def gain(orient: Int): Int = orient match {
    case 0 => 0; case 3 => 2; case _ => 1
  }

  /** Encode `samples` (unsigned, < 2^nbits) as a lossless single-tile
    * single-component codestream. `levels` dyadic 5/3 decompositions,
    * `cb` square code-block size (a power of two in [4, 64]).
    */
  def encodeLossless(w: Int, h: Int, samples: Array[Int], nbits: Int,
                     levels: Int = 2, cb: Int = 32): Array[Byte] = {
    require(w >= 1 && h >= 1 && samples.length == w * h, "bad image shape")
    require(nbits >= 2 && nbits <= 16, s"nbits $nbits out of scope")
    require(levels >= 0 && levels <= 5, s"levels $levels out of scope")
    require(cb >= 4 && cb <= 64 && Integer.bitCount(cb) == 1, s"bad code-block size $cb")
    val shift = 1 << (nbits - 1)
    samples.foreach(v => require(v >= 0 && v < (1 << nbits),
      s"sample $v outside [0, 2^$nbits)"))
    val shifted = samples.map(_ - shift)
    val (ll, details) = fwdDwt(shifted, w, h, levels)
    encodeFromBands(w, h, nbits, levels, cb, transform = 1, ll, details)
  }

  /** Encode through the IRREVERSIBLE 9/7 path at Δ=1 ("unquantized"
    * lossy: the only loss is rounding the double coefficients to
    * integers) — the fixture generator for the 5.40 compression-type-1
    * decode scope. An all-constant field is all-zero-residual (the 9/7
    * high-pass annihilates constants, the low-pass DC gain is exactly
    * 1), so it round-trips bit-exactly; general content reconstructs
    * within the rounding envelope, which is why the oracle-gated
    * fixtures are per-message constants.
    */
  def encodeLossy97(w: Int, h: Int, samples: Array[Int], nbits: Int,
                    levels: Int = 2, cb: Int = 32): Array[Byte] = {
    require(w >= 1 && h >= 1 && samples.length == w * h, "bad image shape")
    require(nbits >= 2 && nbits <= 16, s"nbits $nbits out of scope")
    require(levels >= 0 && levels <= 5, s"levels $levels out of scope")
    require(cb >= 4 && cb <= 64 && Integer.bitCount(cb) == 1, s"bad code-block size $cb")
    val shift = 1 << (nbits - 1)
    samples.foreach(v => require(v >= 0 && v < (1 << nbits),
      s"sample $v outside [0, 2^$nbits)"))
    val shifted = samples.map(v => (v - shift).toDouble)
    val (ll, details) = fwdDwt97(shifted, w, h, levels)
    encodeFromBands(w, h, nbits, levels, cb, transform = 0, ll, details)
  }

  /** Shared Tier-1/Tier-2 + marker assembly for both transforms; the
    * COD transform byte (1 = reversible 5/3, 0 = irreversible 9/7) is
    * the only difference downstream of the wavelet.
    */
  private def encodeFromBands(w: Int, h: Int, nbits: Int, levels: Int, cb: Int,
                              transform: Int, ll: Band,
                              details: Array[(Band, Band, Band)]): Array[Byte] = {
    // resolution-ordered bands: r=0 LL; r>=1 -> details of level L-r+1
    val resBands: Array[Array[Band]] =
      Array(Array(ll)) ++ (1 to levels).map { r =>
        val (hl, lh, hh) = details(levels - r)
        Array(hl, lh, hh)
      }

    val body = new java.io.ByteArrayOutputStream()
    for (bands <- resBands) {
      val bw = new HeaderBitWriter
      // encode blocks first (header needs lengths)
      case class Cb(bx: Int, by: Int, bytes: Array[Byte], passes: Int, k: Int, mb: Int)
      val perBand = bands.map { band =>
        val nbx = math.max(1, (band.w + cb - 1) / cb)
        val nby = math.max(1, (band.h + cb - 1) / cb)
        val mb = nbits + gain(band.orient) + GuardBits - 1
        val blocks = for (by <- 0 until nby; bx <- 0 until nbx) yield {
          val x0 = bx * cb; val y0 = by * cb
          val bw2 = math.min(cb, band.w - x0); val bh2 = math.min(cb, band.h - y0)
          val sub = Array.tabulate(bw2 * bh2) { i =>
            val y = i / bw2; val x = i % bw2
            band.coef((y0 + y) * band.w + (x0 + x))
          }
          val (bytes, passes, k) = encodeBlock(sub, bw2, bh2, band.orient)
          require(k <= mb, s"coefficient overflow: K=$k > Mb=$mb (raise guard bits)")
          Cb(bx, by, bytes, passes, k, mb)
        }
        (band, nbx, nby, blocks)
      }
      val anyIncluded = perBand.exists(_._4.exists(_.k > 0))
      if (!anyIncluded) bw.bit(0)
      else {
        bw.bit(1)
        for ((band, nbx, nby, blocks) <- perBand; if band.w > 0 && band.h > 0) {
          val incl = new TagTree(nbx, nby)
          val zbp = new TagTree(nbx, nby)
          for (b <- blocks) {
            incl.set(b.bx, b.by, if (b.k > 0) 0 else 1)
            zbp.set(b.bx, b.by, if (b.k > 0) b.mb - b.k else 0)
          }
          for (b <- blocks) {
            incl.encode(b.bx, b.by, 1, bw)
            if (b.k > 0) {
              val p = b.mb - b.k
              var t = 1
              var done = false
              while (!done) { // resolve the exact zero-bitplane count
                zbp.encode(b.bx, b.by, t, bw)
                if (t > p) done = true else t += 1
              }
              // number of coding passes (Table B.4)
              val np = b.passes
              if (np == 1) bw.bit(0)
              else if (np == 2) bw.bits(2, 2) // '10'
              else if (np <= 5) { bw.bits(3, 2); bw.bits(np - 3, 2) }
              else if (np <= 36) { bw.bits(0xF, 4); bw.bits(np - 6, 5) }
              else { bw.bits(0x1FF, 9); bw.bits(np - 37, 7) }
              // length: single codeword segment over all passes
              var lblock = 3
              val lenBits = 32 - Integer.numberOfLeadingZeros(math.max(1, b.bytes.length))
              val avail = lblock + log2floor(np)
              val extra = math.max(0, lenBits - avail)
              for (_ <- 0 until extra) bw.bit(1)
              bw.bit(0)
              lblock += extra
              bw.bits(b.bytes.length, lblock + log2floor(np))
            }
          }
        }
      }
      body.write(bw.finish())
      for ((_, _, _, blocks) <- perBand; b <- blocks; if b.k > 0) body.write(b.bytes)
    }

    // markers
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >>> 8); u8(v) }
    def u32(v: Int): Unit = { u16(v >>> 16); u16(v) }
    u16(0xFF4F) // SOC
    u16(0xFF51); u16(41); u16(0) // SIZ, Lsiz, Rsiz
    u32(w); u32(h); u32(0); u32(0) // Xsiz..YOsiz
    u32(w); u32(h); u32(0); u32(0) // tile = image
    u16(1) // Csiz
    u8(nbits - 1); u8(1); u8(1) // Ssiz (unsigned), XRsiz, YRsiz
    u16(0xFF52); u16(12) // COD, Lcod
    u8(0) // Scod: default precincts, no SOP/EPH
    u8(0); u16(1); u8(0) // SGcod: LRCP, 1 layer, no MCT
    u8(levels); u8(log2floor(cb) - 2); u8(log2floor(cb) - 2) // SPcod
    u8(0) // code-block style: default
    u8(transform) // 1 = 5/3 reversible, 0 = 9/7 irreversible
    val nSub = 1 + 3 * levels
    u16(0xFF5C); u16(3 + nSub) // QCD, Lqcd
    u8((GuardBits << 5) | 0) // Sqcd: no quantization, guard bits
    u8((nbits + gain(0)) << 3)
    for (r <- 1 to levels; o <- Seq(1, 2, 3)) u8((nbits + gain(o)) << 3)
    val bodyBytes = body.toByteArray
    u16(0xFF90); u16(10) // SOT, Lsot
    u16(0) // Isot
    u32(12 + 2 + bodyBytes.length) // Psot: SOT seg + SOD + body
    u8(0); u8(1) // TPsot, TNsot
    u16(0xFF93) // SOD
    out.write(bodyBytes)
    u16(0xFFD9) // EOC
    out.toByteArray
  }

  private def log2floor(v: Int): Int = 31 - Integer.numberOfLeadingZeros(v)

  /** Decode a codestream [[encodeLossless]]-shaped stream back to
    * `(width, height, unsigned samples)`. Everything outside the
    * reversible scope fails loudly with a pointer.
    */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    var pos = 0
    def u8(): Int = { val v = bytes(pos) & 0xff; pos += 1; v }
    def u16(): Int = (u8() << 8) | u8()
    def u32(): Int = (u16() << 16) | u16()
    require(bytes.length >= 4 && u16() == 0xFF4F, "bad JPEG2000 SOC")

    var w = -1; var h = -1; var nbits = -1
    var levels = -1; var cb = -1
    var sqStyle = -1
    var xform = -1
    var sodAt = -1
    while (sodAt < 0) {
      val m = u16()
      require((m >>> 8) == 0xFF, f"expected marker, got 0x$m%04x")
      m match {
        case 0xFF51 => // SIZ
          val len = u16(); val segEnd = pos - 2 + len
          u16() // Rsiz
          w = u32(); h = u32()
          require(w >= 1 && h >= 1 && w.toLong * h <= (1L << 26),
            s"implausible JPEG2000 dims ${w}x$h (corrupt SIZ?)")
          require(u32() == 0 && u32() == 0, "image offsets out of scope")
          require(u32() == w && u32() == h && u32() == 0 && u32() == 0,
            "multi-tile codestreams out of scope")
          require(u16() == 1, "multi-component codestreams out of scope (GRIB 5.40 is 1 component)")
          val ssiz = u8()
          require((ssiz & 0x80) == 0, "signed components out of scope")
          nbits = (ssiz & 0x7f) + 1
          require(u8() == 1 && u8() == 1, "subsampled components out of scope")
          pos = segEnd
        case 0xFF52 => // COD
          val len = u16(); val segEnd = pos - 2 + len
          require(u8() == 0, "precinct partitions / SOP / EPH out of scope")
          require(u8() == 0, "only LRCP progression in scope")
          require(u16() == 1, "multi-layer codestreams out of scope")
          require(u8() == 0, "multi-component transform out of scope")
          levels = u8()
          require(levels <= 10, s"implausible decomposition level count $levels")
          val xcb = u8(); val ycb = u8()
          require(xcb == ycb, "non-square code-blocks out of scope")
          require(xcb <= 4, s"code-block exponent $xcb out of scope (cb <= 64)")
          cb = 1 << (xcb + 2)
          require(u8() == 0, "non-default code-block styles out of scope")
          xform = u8()
          require(xform == 0 || xform == 1,
            s"unknown wavelet transform $xform (1 = reversible 5/3, 0 = irreversible 9/7)")
          pos = segEnd
        case 0xFF5C => // QCD
          val len = u16(); val segEnd = pos - 2 + len
          sqStyle = u8()
          // the reject is the QUANTIZATION, not the transform: both the
          // reversible 5/3 and the Δ=1 9/7 path decode; scalar-quantized
          // subbands (Sqcd style 1/2 — NCEP's rate-targeted lossy mode)
          // would need step-size dequantization and stay out of scope
          require((sqStyle & 0x1f) == 0,
            "quantized subbands (Sqcd style 1/2) out of scope — both in-scope " +
              "paths (reversible 5/3, unquantized 9/7) carry integer coefficients")
          pos = segEnd
        case 0xFF90 => // SOT
          val len = u16(); val segEnd = pos - 2 + len
          require(u16() == 0, "multi-tile codestreams out of scope")
          u32() // Psot
          require(u8() == 0 && u8() == 1, "tile-parts out of scope")
          pos = segEnd
        case 0xFF93 => sodAt = pos
        case 0xFFD9 => sys.error("JPEG2000 EOC before SOD")
        case _ => // skip unknown parameter segment (COM etc.)
          val len = u16(); pos = pos - 2 + len
      }
    }
    require(w > 0 && nbits > 0 && levels >= 0 && cb > 0 && xform >= 0,
      "missing SIZ/COD")

    // subband geometry mirrors the encoder's decomposition
    case class Geo(orient: Int, w: Int, h: Int)
    var cw = w; var ch = h
    val detailGeo = ArrayBuffer[(Geo, Geo, Geo)]()
    for (_ <- 1 to levels) {
      val lw = (cw + 1) / 2; val hw = cw / 2
      val lh = (ch + 1) / 2; val hh2 = ch / 2
      detailGeo += ((Geo(1, hw, lh), Geo(2, lw, hh2), Geo(3, hw, hh2)))
      cw = lw; ch = lh
    }
    val resGeo: Array[Array[Geo]] =
      Array(Array(Geo(0, cw, ch))) ++ (1 to levels).map { r =>
        val (a, b, c) = detailGeo(levels - r); Array(a, b, c)
      }

    var cursor = sodAt
    val bandData = scala.collection.mutable.Map[(Int, Int), Array[Int]]()
    for ((bands, r) <- resGeo.zipWithIndex) {
      val br = new HeaderBitReader(bytes, cursor)
      case class Pend(geo: Geo, bandIdx: Int, bx: Int, by: Int, k: Int, len: Int)
      val pend = ArrayBuffer[Pend]()
      if (br.bit() == 1) {
        for ((geo, bi) <- bands.zipWithIndex; if geo.w > 0 && geo.h > 0) {
          val nbx = math.max(1, (geo.w + cb - 1) / cb)
          val nby = math.max(1, (geo.h + cb - 1) / cb)
          val incl = new TagTree(nbx, nby)
          val zbp = new TagTree(nbx, nby)
          val mb = nbits + gain(geo.orient) + GuardBits - 1
          for (by <- 0 until nby; bx <- 0 until nbx) {
            val included = incl.decode(bx, by, 1, br)
            if (included) {
              var t = 1
              // a corrupt header could otherwise spin this resolve loop
              // forever: the zero-bitplane count can never legitimately
              // reach Mb (that would mean zero coded planes for an
              // INCLUDED block) — fail loudly past it
              while (!zbp.decode(bx, by, t, br)) {
                t += 1
                require(t <= mb + 1,
                  s"corrupt JPEG2000 packet header: zero-bitplane count exceeds Mb=$mb")
              }
              val p = zbp.lowOf(bx, by)
              val k = mb - p
              require(k >= 1, s"inconsistent zero-bitplane count $p for Mb=$mb")
              // passes codeword
              val np =
                if (br.bit() == 0) 1
                else if (br.bit() == 0) 2
                else {
                  val two = br.bits(2)
                  if (two < 3) 3 + two
                  else {
                    val five = br.bits(5)
                    if (five < 31) 6 + five
                    else 37 + br.bits(7)
                  }
                }
              var lblock = 3
              while (br.bit() == 1) lblock += 1
              val len = br.bits(lblock + log2floor(np))
              pend += Pend(geo, bi, bx, by, k, len)
            }
          }
        }
      }
      cursor = br.end()
      for (bandsIdx <- bands.indices)
        bandData.getOrElseUpdate((r, bandsIdx),
          new Array[Int](bands(bandsIdx).w * bands(bandsIdx).h))
      for (pd <- pend) {
        require(pd.len >= 0 && cursor + pd.len <= bytes.length,
          s"corrupt JPEG2000 packet: body length ${pd.len} overruns the codestream")
        val data = java.util.Arrays.copyOfRange(bytes, cursor, cursor + pd.len)
        cursor += pd.len
        val x0 = pd.bx * cb; val y0 = pd.by * cb
        val bw2 = math.min(cb, pd.geo.w - x0); val bh2 = math.min(cb, pd.geo.h - y0)
        val coefs = decodeBlock(data, bw2, bh2, pd.geo.orient, pd.k)
        val tgt = bandData((r, pd.bandIdx))
        for (y <- 0 until bh2; x <- 0 until bw2)
          tgt((y0 + y) * pd.geo.w + (x0 + x)) = coefs(y * bw2 + x)
      }
    }

    val ll = Band(0, resGeo(0)(0).w, resGeo(0)(0).h, bandData((0, 0)))
    val details = (1 to levels).map { r =>
      val g = resGeo(r)
      (Band(1, g(0).w, g(0).h, bandData((r, 0))),
        Band(2, g(1).w, g(1).h, bandData((r, 1))),
        Band(3, g(2).w, g(2).h, bandData((r, 2))))
    }.reverse.toArray // back to finest-first order used by invDwt
    val shifted =
      if (xform == 1) invDwt(ll, details)
      else invDwt97(ll, details).map(v => Math.round(v).toInt)
    val shift = 1 << (nbits - 1)
    (w, h, shifted.map(v => math.max(0, math.min((1 << nbits) - 1, v + shift))))
  }
}
