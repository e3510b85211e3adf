package graft.read

import org.apache.spark.types.variant.{Variant, VariantUtil}

/** Decoder for Iceberg v3 variant column bounds
  * (iceberg.apache.org/spec/#bounds-for-variant): the manifest's
  * lower/upper bound for a VARIANT column is a single serialized variant —
  * metadata then value, concatenated — whose root is an object keyed by
  * normalized JSON path (`$['age']`, `$['person']['name']`) with the typed
  * primitive bound of each shredded sub-field as the value.
  *
  * The reference decodes the same blobs in
  * src/storage/statistics/iceberg_variant_statistics.cpp (Deserialize +
  * RekeyBoundsVariant) and prunes on them in
  * src/planning/pruning/iceberg_file_pruner.cpp:117-135; here the decode
  * uses Spark's own `org.apache.spark.types.variant.Variant` reader.
  * Every failure path returns None/empty — pruning stays conservative.
  */
object VariantBounds {

  /** Length of the self-delimiting variant metadata section at the start of
    * a concatenated metadata||value blob (variant spec: header byte with
    * offset size, dictionary size, offsets, then dictionary bytes). */
  private def metadataLength(b: Array[Byte]): Option[Int] = {
    if (b.length < 1) return None
    val header = b(0) & 0xff
    if ((header & 0x0f) != 1) return None // version must be 1
    val offsetSize = ((header >> 6) & 0x3) + 1
    def readLE(pos: Int): Long = {
      if (pos + offsetSize > b.length) return -1L
      var v = 0L
      var i = offsetSize - 1
      while (i >= 0) { v = (v << 8) | (b(pos + i) & 0xffL); i -= 1 }
      v
    }
    val dictSize = readLE(1)
    if (dictSize < 0 || dictSize > Int.MaxValue / (offsetSize + 1)) return None
    val lastOffsetPos = 1 + offsetSize + dictSize.toInt * offsetSize
    val dataLen = readLE(lastOffsetPos)
    if (dataLen < 0) return None
    val len = lastOffsetPos + offsetSize + dataLen.toInt
    if (len > b.length) None else Some(len)
  }

  /** Decode a bounds blob to (normalized JSON path -> primitive bound in
    * graft's internal comparison form). Unshredded / malformed / non-object
    * blobs decode to an empty map (prune nothing). */
  def decode(blob: Array[Byte]): Map[String, Any] = {
    try {
      val mlen = metadataLength(blob).getOrElse(return Map.empty)
      val metadata = java.util.Arrays.copyOfRange(blob, 0, mlen)
      val value = java.util.Arrays.copyOfRange(blob, mlen, blob.length)
      val v = new Variant(value, metadata)
      if (v.getType != VariantUtil.Type.OBJECT) return Map.empty
      val out = Map.newBuilder[String, Any]
      var i = 0
      val n = v.objectSize()
      while (i < n) {
        val f = v.getFieldAtIndex(i)
        primitive(f.value).foreach(p => out += f.key -> p)
        i += 1
      }
      out.result()
    } catch { case _: Exception => Map.empty }
  }

  /** A bound variant's primitive as graft's internal comparison value
    * (dates stay Int days, timestamps Long micros — same forms
    * SingleValue.deserialize produces for typed columns). */
  private def primitive(v: Variant): Option[Any] = {
    import VariantUtil.Type._
    v.getType match {
      case BOOLEAN => Some(v.getBoolean)
      case LONG => Some(v.getLong)
      case DOUBLE => Some(v.getDouble)
      case FLOAT => Some(v.getFloat)
      case DECIMAL => Some(v.getDecimal)
      case STRING => Some(v.getString)
      case DATE => Some(v.getLong.toInt)
      case TIMESTAMP | TIMESTAMP_NTZ => Some(v.getLong)
      case BINARY => Some(v.getBinary)
      case UUID => Some(v.getUuid.toString)
      case _ => None // object/array/null: not a usable bound
    }
  }

  /** Normalize a `variant_get`-style path (`$.age`, `$['age']`, `$.a.b`)
    * to the Iceberg bounds key form `$['age']`. Paths with array indexing
    * are not representable in bounds keys -> None (no pruning). */
  def normalizePath(path: String): Option[String] = {
    if (!path.startsWith("$")) return None
    var rest = path.drop(1)
    val fields = Seq.newBuilder[String]
    while (rest.nonEmpty) {
      if (rest.startsWith(".")) {
        val end0 = rest.indexWhere(c => c == '.' || c == '[', 1)
        val end = if (end0 < 0) rest.length else end0
        val name = rest.substring(1, end)
        if (name.isEmpty) return None
        fields += name
        rest = rest.substring(end)
      } else if (rest.startsWith("['")) {
        val end = rest.indexOf("']", 2)
        if (end < 0) return None
        fields += rest.substring(2, end)
        rest = rest.substring(end + 2)
      } else return None // e.g. array index [0]
    }
    val fs = fields.result()
    if (fs.isEmpty) None else Some(fs.map(f => s"['$f']").mkString("$", "", ""))
  }
}
