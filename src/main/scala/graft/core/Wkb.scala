package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/**
 * Minimal WKB (well-known binary) reader: computes the 2D envelope
 * (xmin, ymin, xmax, ymax) of a geometry without materializing it, and
 * encodes/decodes the Iceberg v3 Appendix D geometry bound blobs
 * (2/3/4 little-endian doubles per bound).
 *
 * Handles both byte orders, the seven standard geometry types with nested
 * collections, and Z/M variants in both the ISO encoding (type code +
 * 1000/2000/3000) and the EWKB flag encoding (0x80000000 Z, 0x40000000 M,
 * 0x20000000 embedded SRID). Anything unparseable yields None — callers
 * stay conservative.
 *
 * (reference: geometry bbox stats feeding file pruning —
 * src/storage/statistics/iceberg_data_file_stats.cpp:146-168 Appendix-D
 * encode, src/planning/pruning/iceberg_predicate.cpp:287-291 bbox check.)
 */
object Wkb {

  /** 2D envelope of one WKB geometry; None for null/empty/corrupt input. */
  def envelope(wkb: Array[Byte]): Option[(Double, Double, Double, Double)] = {
    if (wkb == null || wkb.length < 5) return None
    try {
      val acc = new Env
      walk(ByteBuffer.wrap(wkb), acc)
      if (acc.xmin > acc.xmax) None
      else Some((acc.xmin, acc.ymin, acc.xmax, acc.ymax))
    } catch { case _: Exception => None }
  }

  private final class Env {
    var xmin: Double = Double.PositiveInfinity
    var ymin: Double = Double.PositiveInfinity
    var xmax: Double = Double.NegativeInfinity
    var ymax: Double = Double.NegativeInfinity
    def add(x: Double, y: Double): Unit =
      // NaN coordinates (empty POINT encoding) contribute nothing
      if (!x.isNaN && !y.isNaN) {
        if (x < xmin) xmin = x
        if (x > xmax) xmax = x
        if (y < ymin) ymin = y
        if (y > ymax) ymax = y
      }
  }

  /** Consume one full geometry from `buf`, accumulating coordinates. */
  private def walk(buf: ByteBuffer, acc: Env): Unit = {
    val order = buf.get()
    buf.order(if (order == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    val rawType = buf.getInt()
    // EWKB flag bits
    val ewkbZ = (rawType & 0x80000000) != 0
    val ewkbM = (rawType & 0x40000000) != 0
    val hasSrid = (rawType & 0x20000000) != 0
    val masked = rawType & 0x0FFFFFFF
    // ISO dimension prefix: 1000 Z, 2000 M, 3000 ZM
    val isoDim = masked / 1000
    val baseType = masked % 1000
    val hasZ = ewkbZ || isoDim == 1 || isoDim == 3
    val hasM = ewkbM || isoDim == 2 || isoDim == 3
    if (hasSrid) buf.getInt() // skip embedded SRID
    val extraDims = (if (hasZ) 1 else 0) + (if (hasM) 1 else 0)

    def point(): Unit = {
      val x = buf.getDouble(); val y = buf.getDouble()
      var i = 0
      while (i < extraDims) { buf.getDouble(); i += 1 }
      acc.add(x, y)
    }
    def points(): Unit = {
      val n = buf.getInt()
      var i = 0
      while (i < n) { point(); i += 1 }
    }
    baseType match {
      case 1 => point() // Point
      case 2 => points() // LineString
      case 3 => // Polygon: nrings x ring
        val rings = buf.getInt()
        var i = 0
        while (i < rings) { points(); i += 1 }
      case 4 | 5 | 6 | 7 => // Multi*/GeometryCollection: n x full WKB geometry
        val n = buf.getInt()
        var i = 0
        while (i < n) { walk(buf, acc); i += 1 }
      case other => throw new IllegalArgumentException(s"WKB type $other")
    }
  }

  /** Do two envelopes intersect? (`&&` bbox-overlap semantics.) */
  def intersects(ax1: Double, ay1: Double, ax2: Double, ay2: Double,
      bx1: Double, by1: Double, bx2: Double, by2: Double): Boolean =
    !(ax2 < bx1 || ax1 > bx2 || ay2 < by1 || ay1 > by2)

  // ---------- Iceberg v3 Appendix D bound blobs ----------

  /** One geometry bound (lower = mins, upper = maxes) as the Appendix D
    * 2-double little-endian blob. */
  def encodeBound(x: Double, y: Double): Array[Byte] = {
    val bb = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    bb.putDouble(x); bb.putDouble(y)
    bb.array()
  }

  /** Decode the (x, y) leading pair of an Appendix D bound blob; 16 = XY,
    * 24 = XYZ (or XYM written by engines that don't pad), 32 = XYZM. */
  def decodeBound(b: Array[Byte]): Option[(Double, Double)] =
    if (b == null || (b.length != 16 && b.length != 24 && b.length != 32)) None
    else {
      val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      val x = bb.getDouble(); val y = bb.getDouble()
      if (x.isNaN || y.isNaN) None else Some((x, y))
    }
}
