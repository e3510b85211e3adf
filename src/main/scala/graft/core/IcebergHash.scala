package graft.core

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/**
 * Bit-exact 32-bit Murmur3 (x86_32, seed 0) over Iceberg's single-value
 * bucket encoding, per Iceberg spec Appendix B.
 *
 * Encoding rules (reference: src/core/expression/iceberg_hash.cpp:14-247):
 *  - int / long / date / time / timestamp(_tz)(_ns): 8-byte little-endian long
 *    (int/date widen to long; time/timestamp in micros)
 *  - string: UTF-8 bytes
 *  - uuid: 16-byte big-endian
 *  - fixed/binary: raw bytes
 *  - decimal: minimum-width two's-complement big-endian unscaled value
 */
object IcebergHash {

  def murmur3(data: Array[Byte], seed: Int = 0): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    val len = data.length
    var h1 = seed
    var i = 0
    val nblocks = len / 4
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    while (i < nblocks) {
      var k1 = bb.getInt(i * 4)
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    // tail
    var k1 = 0
    val tail = nblocks * 4
    (len & 3) match {
      case 3 =>
        k1 ^= (data(tail + 2) & 0xff) << 16
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= (data(tail) & 0xff)
      case 2 =>
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= (data(tail) & 0xff)
      case 1 =>
        k1 ^= (data(tail) & 0xff)
      case _ =>
    }
    if ((len & 3) != 0) {
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
    }
    // finalization
    h1 ^= len
    h1 ^= (h1 >>> 16)
    h1 *= 0x85ebca6b
    h1 ^= (h1 >>> 13)
    h1 *= 0xc2b2ae35
    h1 ^= (h1 >>> 16)
    h1
  }

  def hashLong(v: Long): Int = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v).array()
    murmur3(b)
  }

  def hashBytes(b: Array[Byte]): Int = murmur3(b)

  def hashString(s: String): Int = murmur3(s.getBytes(StandardCharsets.UTF_8))

  def hashDecimal(d: java.math.BigDecimal): Int = murmur3(d.unscaledValue().toByteArray)

  def hashUuid(u: java.util.UUID): Int = {
    val b = ByteBuffer.allocate(16) // big-endian by default
    b.putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits)
    murmur3(b.array())
  }

  /** Hash a JVM value given its Iceberg type. Values are in internal form:
    * date = Int days, time/timestamp = Long micros. */
  def hash(v: Any, t: IcebergType): Int = {
    import IcebergTypes._
    (v, t) match {
      case (null, _) => 0
      case (i: Int, _) => hashLong(i.toLong)
      case (l: Long, _) => hashLong(l)
      case (s: String, UuidT) => hashUuid(java.util.UUID.fromString(s))
      case (s: String, _) => hashString(s)
      case (b: Array[Byte], _) => hashBytes(b)
      case (d: java.math.BigDecimal, _) => hashDecimal(d)
      case (d: BigDecimal, _) => hashDecimal(d.bigDecimal)
      case (d: java.sql.Date, _) => hashLong(d.toLocalDate.toEpochDay)
      case (d: java.time.LocalDate, _) => hashLong(d.toEpochDay)
      case (ts: java.sql.Timestamp, _) => hashLong(ts.getTime * 1000L + (ts.getNanos / 1000) % 1000)
      case (i: java.time.Instant, _) => hashLong(i.getEpochSecond * 1000000L + i.getNano / 1000L)
      case (u: java.util.UUID, _) => hashUuid(u)
      case (other, tt) => throw new IllegalArgumentException(s"Cannot bucket-hash $other of type $tt")
    }
  }
}
