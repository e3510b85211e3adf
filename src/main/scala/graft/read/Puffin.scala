package graft.read

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.roaringbitmap.longlong.Roaring64NavigableMap
import java.io.{ByteArrayInputStream, DataInputStream}
import java.nio.{ByteBuffer, ByteOrder}

/**
 * Puffin file + deletion-vector blob decoding (Iceberg v3).
 *
 * Blob layout per the Iceberg spec: [combined length: 4B big-endian]
 * [magic D1 D3 39 64][64-bit roaring bitmap, portable format][CRC-32: 4B BE].
 * Legacy "bare" blobs (no length/magic wrapper) are accepted too —
 * (reference: src/core/deletes/iceberg_deletion_vector.cpp:68-183, option
 * handling iceberg_extension.cpp:92-96; puffin footer
 * src/core/metadata/puffin/iceberg_puffin_metadata.cpp).
 */
object Puffin {
  private val DvMagic = Array[Byte](0xD1.toByte, 0xD3.toByte, 0x39.toByte, 0x64.toByte)

  /** Read `length` bytes at `offset` from a file. */
  def readRange(path: String, conf: Configuration, offset: Long, length: Int): Array[Byte] = {
    val fsys = new Path(path).getFileSystem(conf)
    val in = fsys.open(new Path(path))
    try {
      val buf = new Array[Byte](length)
      in.seek(offset)
      in.readFully(buf)
      buf
    } finally in.close()
  }

  /** Decode a deletion-vector blob into sorted row positions. */
  def decodeDeletionVector(path: String, conf: Configuration, offset: Long, length: Long): Array[Long] = {
    val raw = readRange(path, conf, offset, math.max(length, 8L).toInt)
    val bitmapBytes: Array[Byte] = {
      val bb = ByteBuffer.wrap(raw)
      val declared = bb.getInt(0) // big-endian combined length (magic + vector)
      val hasMagic = raw.length >= 8 && (0 until 4).forall(i => raw(4 + i) == DvMagic(i))
      if (hasMagic && declared >= 4 && declared <= raw.length - 4) {
        // [len][magic][bitmap][crc] — bitmap = declared - 4 bytes after magic
        java.util.Arrays.copyOfRange(raw, 8, 4 + declared)
      } else if ((0 until 4).forall(i => raw(i) == DvMagic(i))) {
        // bare magic-prefixed
        java.util.Arrays.copyOfRange(raw, 4, raw.length)
      } else {
        raw // legacy bare bitmap
      }
    }
    val bm = new Roaring64NavigableMap()
    bm.deserializePortable(new DataInputStream(new ByteArrayInputStream(bitmapBytes)))
    val out = new Array[Long](bm.getIntCardinality)
    var i = 0
    val it = bm.getLongIterator
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }
}
