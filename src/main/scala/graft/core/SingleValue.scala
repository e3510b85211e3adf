package graft.core

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/**
 * Iceberg single-value binary serialization — used for manifest bounds
 * (lower_bounds/upper_bounds) and partition bound summaries. Must be
 * bit-exact (reference: src/core/expression/iceberg_value.cpp).
 *
 * Internal JVM value forms used throughout graft:
 *   boolean->Boolean, int->Int, long->Long, float->Float, double->Double,
 *   date->Int (days from epoch), time/timestamp*->Long (micros),
 *   string->String, uuid->String (canonical), fixed/binary->Array[Byte],
 *   decimal->java.math.BigDecimal.
 */
object SingleValue {
  import IcebergTypes._

  def serialize(v: Any, t: IcebergType): Array[Byte] = {
    if (v == null) return null
    def le(n: Int): ByteBuffer = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    (t, v) match {
      case (BooleanT, b: Boolean) => Array[Byte](if (b) 1 else 0)
      case (IntT, i: Int) => le(4).putInt(i).array()
      case (DateT, i: Int) => le(4).putInt(i).array()
      case (DateT, d: java.sql.Date) => le(4).putInt(d.toLocalDate.toEpochDay.toInt).array()
      case (DateT, d: java.time.LocalDate) => le(4).putInt(d.toEpochDay.toInt).array()
      case (LongT | TimeT | TimestampT | TimestampTzT | TimestampNsT | TimestampTzNsT, l: Long) =>
        le(8).putLong(l).array()
      case (LongT, i: Int) => le(8).putLong(i.toLong).array()
      case (TimestampT | TimestampTzT, ts: java.sql.Timestamp) =>
        le(8).putLong(ts.getTime * 1000L + (ts.getNanos / 1000) % 1000).array()
      case (TimestampT, ldt: java.time.LocalDateTime) =>
        val i = ldt.toInstant(java.time.ZoneOffset.UTC)
        le(8).putLong(i.getEpochSecond * 1000000L + i.getNano / 1000L).array()
      case (TimestampT | TimestampTzT, i: java.time.Instant) =>
        le(8).putLong(i.getEpochSecond * 1000000L + i.getNano / 1000L).array()
      case (FloatT, f: Float) => le(4).putFloat(f).array()
      case (DoubleT, d: Double) => le(8).putDouble(d).array()
      case (StringT, s: String) => s.getBytes(StandardCharsets.UTF_8)
      case (UuidT, s: String) =>
        val u = java.util.UUID.fromString(s)
        ByteBuffer.allocate(16).putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits).array()
      case (BinaryT | FixedT(_), b: Array[Byte]) => b
      case (DecimalT(_, _), d: java.math.BigDecimal) => d.unscaledValue().toByteArray
      case (DecimalT(p, s), d: BigDecimal) => d.bigDecimal.unscaledValue().toByteArray
      case (tt, vv) => throw new IllegalArgumentException(s"Cannot serialize $vv as $tt")
    }
  }

  def deserialize(bytes: Array[Byte], t: IcebergType): Any = {
    if (bytes == null) return null
    def le: ByteBuffer = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    t match {
      case BooleanT => bytes(0) != 0
      case IntT | DateT => le.getInt
      // 4-byte values under a LONG/DOUBLE type: bounds written BEFORE an
      // int->long / float->double promotion keep their old width (Iceberg
      // schema-evolution rule: readers widen old bounds, never crash).
      case LongT | TimeT | TimestampT | TimestampTzT =>
        if (bytes.length == 4) le.getInt.toLong else le.getLong
      // ns variants are stored as nanos; floor to micros (documented loss).
      case TimestampNsT | TimestampTzNsT => Math.floorDiv(le.getLong, 1000L)
      case FloatT => le.getFloat
      case DoubleT => if (bytes.length == 4) le.getFloat.toDouble else le.getDouble
      case StringT => new String(bytes, StandardCharsets.UTF_8)
      case UuidT =>
        val bb = ByteBuffer.wrap(bytes)
        new java.util.UUID(bb.getLong, bb.getLong).toString
      case BinaryT | FixedT(_) => bytes
      case DecimalT(p, s) => new java.math.BigDecimal(new java.math.BigInteger(bytes), s)
      case other => throw new IllegalArgumentException(s"Cannot deserialize $other")
    }
  }

  /** Convert an internal value to the JVM value Spark expects in a Row /
    * literal (date Int -> java.sql.Date, micros Long -> Instant for
    * timestamps, BigDecimal kept). */
  def toSparkValue(v: Any, t: IcebergType): Any = {
    if (v == null) return null
    t match {
      case DateT => v match {
        case i: Int => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.toLong))
        case other => other
      }
      case TimestampTzT | TimestampTzNsT => v match {
        case l: Long => java.time.Instant.ofEpochSecond(Math.floorDiv(l, 1000000L), Math.floorMod(l, 1000000L) * 1000L)
        case other => other
      }
      case TimestampT | TimestampNsT => v match {
        case l: Long => java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(l, 1000000L), (Math.floorMod(l, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
        case other => other
      }
      case _ => v
    }
  }

  /** Convert a JVM value (as produced by Spark Row / dir-name parsing) to
    * internal form (date->Int days, timestamp->Long micros). */
  def toInternal(v: Any, t: IcebergType): Any = {
    if (v == null) return null
    (t, v) match {
      case (DateT, d: java.sql.Date) => d.toLocalDate.toEpochDay.toInt
      case (DateT, d: java.time.LocalDate) => d.toEpochDay.toInt
      case (TimestampT | TimestampTzT | TimestampNsT | TimestampTzNsT, ts: java.sql.Timestamp) =>
        ts.getTime * 1000L + (ts.getNanos / 1000) % 1000
      case (TimestampT | TimestampNsT, ldt: java.time.LocalDateTime) =>
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
      case (TimestampTzT | TimestampTzNsT, i: java.time.Instant) =>
        i.getEpochSecond * 1000000L + i.getNano / 1000L
      case (DecimalT(_, _), d: BigDecimal) => d.bigDecimal
      case (DecimalT(_, _), d: org.apache.spark.sql.types.Decimal) => d.toJavaBigDecimal
      case _ => v
    }
  }
}
