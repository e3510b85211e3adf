package graft.write

import graft.core._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.LogicalTypeAnnotation
import scala.jdk.CollectionConverters._

/**
 * Per-file column statistics from the parquet footer, keyed by Iceberg field
 * id — powers manifest lower/upper bounds, value/null counts, column sizes
 * and split offsets (reference: iceberg_insert.cpp:199-235 +
 * src/storage/statistics/iceberg_data_file_stats.cpp; bounds are stored in
 * Iceberg single-value binary form via [[graft.core.SingleValue]]).
 *
 * Bounds are exact min/max (always valid bounds; the reference truncates
 * long strings — exact values are a superset-correct choice).
 */
case class FileStats(
    recordCount: Long,
    columnSizes: Map[Int, Long],
    valueCounts: Map[Int, Long],
    nullCounts: Map[Int, Long],
    lowerBounds: Map[Int, Array[Byte]],
    upperBounds: Map[Int, Array[Byte]],
    splitOffsets: Seq[Long])

object FooterStats {

  def read(path: Path, conf: Configuration, schema: IcebergSchema): FileStats = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(path, conf))
    try {
      val footer = reader.getFooter
      val blocks = footer.getBlocks.asScala.toSeq
      val recordCount = blocks.map(_.getRowCount).sum
      val splitOffsets = blocks.map(_.getStartingPos).sorted

      // Dotted parquet column path -> the Iceberg leaf field, through
      // structs (reference test_write_upper_lower_bounds_nested_types:
      // nested leaves carry bounds too). List/map element paths have
      // parquet-specific marker segments ("list","element","key_value") —
      // their per-element stats are not representable as single-value
      // bounds, so they stay unmapped (conservative).
      val nameToField: Map[String, IcebergTypes.NestedField] = {
        val b = Map.newBuilder[String, IcebergTypes.NestedField]
        def walk(t: IcebergType, prefix: Seq[String]): Unit = t match {
          case IcebergTypes.StructT(fs) => fs.foreach { f =>
            b += ((prefix :+ f.name).mkString(".") -> f)
            walk(f.fieldType, prefix :+ f.name)
          }
          case _ =>
        }
        walk(schema.struct, Nil)
        b.result()
      }
      val sizes = collection.mutable.Map.empty[Int, Long]
      val values = collection.mutable.Map.empty[Int, Long]
      val nulls = collection.mutable.Map.empty[Int, Long]
      val mins = collection.mutable.Map.empty[Int, Any]
      val maxs = collection.mutable.Map.empty[Int, Any]
      var statsValid = Set.empty[Int]
      var statsSeen = Set.empty[Int]

      for (block <- blocks; chunk <- block.getColumns.asScala) {
        val pathParts: Seq[String] = chunk.getPath.asScala.toSeq
        nameToField.get(pathParts.mkString(".")).foreach { f =>
            val id = f.id
            sizes.updateWith(id)(v => Some(v.getOrElse(0L) + chunk.getTotalSize))
            values.updateWith(id)(v => Some(v.getOrElse(0L) + chunk.getValueCount))
            val st = chunk.getStatistics
            statsSeen += id
            if (st != null && !st.isEmpty) {
              nulls.updateWith(id)(v => Some(v.getOrElse(0L) + st.getNumNulls))
              if (st.hasNonNullValue) {
                statsValid += id
                val (mn, mx) = convert(st.genericGetMin.asInstanceOf[AnyRef],
                  st.genericGetMax.asInstanceOf[AnyRef], chunk, f.fieldType)
                if (mn != null && mx != null) {
                  mins.updateWith(id)(v => Some(v.map(o => if (Pruning2.cmpAny(mn, o) < 0) mn else o).getOrElse(mn)))
                  maxs.updateWith(id)(v => Some(v.map(o => if (Pruning2.cmpAny(mx, o) > 0) mx else o).getOrElse(mx)))
                }
              }
            }
          }
      }

      def ser(m: collection.Map[Int, Any]): Map[Int, Array[Byte]] =
        m.flatMap { case (id, v) =>
          val f = schema.idToField(id)
          Option(SingleValue.serialize(v, f.fieldType)).map(id -> _)
        }.toMap

      FileStats(recordCount, sizes.toMap, values.toMap, nulls.toMap,
        ser(mins.filter { case (id, _) => statsValid(id) }),
        ser(maxs.filter { case (id, _) => statsValid(id) }),
        splitOffsets)
    } finally reader.close()
  }

  /** Convert parquet statistics values to internal form for the Iceberg
    * type. Returns (null,null) when the physical form isn't convertible. */
  private def convert(mn: AnyRef, mx: AnyRef, chunk: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData,
      t: IcebergType): (Any, Any) = {
    import IcebergTypes._
    def both(f: AnyRef => Any): (Any, Any) =
      try (f(mn), f(mx)) catch { case _: Exception => (null, null) }
    t match {
      case BooleanT => both(_.asInstanceOf[java.lang.Boolean].booleanValue())
      case IntT | DateT => both(_.asInstanceOf[Number].intValue())
      case LongT | TimeT | TimestampT | TimestampTzT => both(_.asInstanceOf[Number].longValue())
      case FloatT => both(_.asInstanceOf[Number].floatValue())
      case DoubleT => both(_.asInstanceOf[Number].doubleValue())
      case StringT => both(v => v.asInstanceOf[Binary].toStringUsingUTF8)
      case UuidT => both(v => v.asInstanceOf[Binary].toStringUsingUTF8)
      case BinaryT | FixedT(_) => both(v => v.asInstanceOf[Binary].getBytes)
      case DecimalT(_, scale) => both {
        case n: java.lang.Integer => new java.math.BigDecimal(java.math.BigInteger.valueOf(n.longValue()), scale)
        case n: java.lang.Long => new java.math.BigDecimal(java.math.BigInteger.valueOf(n.longValue()), scale)
        case b: Binary => new java.math.BigDecimal(new java.math.BigInteger(b.getBytes), scale)
        case _ => null
      }
      case _ => (null, null)
    }
  }
}
