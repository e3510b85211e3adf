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
  def envelope(wkb: Array[Byte]): Option[(Double, Double, Double, Double)] =
    envelopeFull(wkb).map(e => (e.xmin, e.ymin, e.xmax, e.ymax))

  /** Full envelope incl. Z/M ranges when the geometry carries those
    * dimensions (None when it does not). */
  case class Envelope(xmin: Double, ymin: Double, xmax: Double, ymax: Double,
      z: Option[(Double, Double)], m: Option[(Double, Double)])

  def envelopeFull(wkb: Array[Byte]): Option[Envelope] = {
    if (wkb == null || wkb.length < 5) return None
    try {
      val acc = new Env
      walk(ByteBuffer.wrap(wkb), acc)
      if (acc.xmin > acc.xmax) None
      else Some(Envelope(acc.xmin, acc.ymin, acc.xmax, acc.ymax,
        if (acc.zmin <= acc.zmax) Some((acc.zmin, acc.zmax)) else None,
        if (acc.mmin <= acc.mmax) Some((acc.mmin, acc.mmax)) else None))
    } catch { case _: Exception => None }
  }

  private final class Env {
    var xmin: Double = Double.PositiveInfinity
    var ymin: Double = Double.PositiveInfinity
    var xmax: Double = Double.NegativeInfinity
    var ymax: Double = Double.NegativeInfinity
    var zmin: Double = Double.PositiveInfinity
    var zmax: Double = Double.NegativeInfinity
    var mmin: Double = Double.PositiveInfinity
    var mmax: Double = Double.NegativeInfinity
    def add(x: Double, y: Double): Unit =
      // NaN coordinates (empty POINT encoding) contribute nothing
      if (!x.isNaN && !y.isNaN) {
        if (x < xmin) xmin = x
        if (x > xmax) xmax = x
        if (y < ymin) ymin = y
        if (y > ymax) ymax = y
      }
    def addZ(z: Double): Unit = if (!z.isNaN) {
      if (z < zmin) zmin = z
      if (z > zmax) zmax = z
    }
    def addM(m: Double): Unit = if (!m.isNaN) {
      if (m < mmin) mmin = m
      if (m > mmax) mmax = m
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

    def point(): Unit = {
      val x = buf.getDouble(); val y = buf.getDouble()
      if (hasZ) acc.addZ(buf.getDouble())
      if (hasM) acc.addM(buf.getDouble())
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

  /** Appendix D bound with Z (24 bytes) or Z+M (32 bytes). An XYM bound
    * pads the unknown Z slot with -infinity on the lower bound / +infinity
    * on the upper (`upper` flag), so the 4-double form stays unambiguous —
    * exactly the reference writer's padding
    * (iceberg_data_file_stats.cpp:152-161 GeometryExtent.UNKNOWN_MIN/MAX). */
  def encodeBoundZM(x: Double, y: Double,
      z: Option[Double], m: Option[Double], upper: Boolean): Array[Byte] =
    (z, m) match {
      case (None, None) => encodeBound(x, y)
      case (Some(zv), None) =>
        val bb = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
        bb.putDouble(x); bb.putDouble(y); bb.putDouble(zv)
        bb.array()
      case (zOpt, Some(mv)) =>
        val bb = ByteBuffer.allocate(32).order(ByteOrder.LITTLE_ENDIAN)
        bb.putDouble(x); bb.putDouble(y)
        bb.putDouble(zOpt.getOrElse(
          if (upper) Double.PositiveInfinity else Double.NegativeInfinity))
        bb.putDouble(mv)
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
