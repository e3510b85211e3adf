package graft.write

import graft.core.{IcebergSchema, IcebergTypes, Wkb}
import graft.manifest.ManifestEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Per-file geometry bounding boxes for manifest bounds (Iceberg v3
 * Appendix D): parquet footers carry no usable stats for WKB blobs, so for
 * tables WITH geometry columns one extra distributed aggregation pass reads
 * ONLY those columns, computes each file's (xmin, ymin, xmax, ymax), and
 * patches the staged manifest entries with the Appendix D bound blobs.
 *
 * Scale shape: the pass is one Spark job over the just-written files
 * restricted to geometry columns (column pruning keeps IO proportional to
 * geometry data, not the row width); only #files x #geomCols bbox tuples
 * return to the driver. Tables without geometry columns skip it entirely.
 *
 * (reference: src/storage/statistics/iceberg_data_file_stats.cpp:146-168
 * writes the same blobs from its execution-time geometry stats.)
 */
object GeoBounds {

  /** Top-level geometry fields of `schema` (nested geometry stays
    * bound-less — conservative). */
  private def geomFields(schema: IcebergSchema): Seq[IcebergTypes.NestedField] =
    schema.fields.filter(_.fieldType.isInstanceOf[IcebergTypes.GeometryT])

  def patch(spark: SparkSession, entries: Seq[ManifestEntry],
      schema: IcebergSchema): Seq[ManifestEntry] = {
    val gs = geomFields(schema)
    if (gs.isEmpty || entries.isEmpty) return entries
    val bboxOf = udf((wkb: Array[Byte]) =>
      Wkb.envelope(wkb).map(e => Array(e._1, e._2, e._3, e._4)).orNull)
    val paths = entries.map(_.dataFile.filePath)
    val aggs = gs.flatMap { f =>
      val env = bboxOf(col(s"`${f.name}`"))
      Seq(
        min(env.getItem(0)).as(s"xmin_${f.id}"), min(env.getItem(1)).as(s"ymin_${f.id}"),
        max(env.getItem(2)).as(s"xmax_${f.id}"), max(env.getItem(3)).as(s"ymax_${f.id}"))
    }
    val rows = spark.read.parquet(paths: _*)
      .select(input_file_name().as("_gf") +: gs.map(f => col(s"`${f.name}`")): _*)
      .groupBy("_gf")
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    // Keyed by file NAME: input_file_name returns a URI form that may
    // differ from the recorded path in scheme/authority.
    def leaf(p: String): String = p.substring(p.lastIndexOf('/') + 1)
    val byFile: Map[String, Map[Int, (Double, Double, Double, Double)]] =
      rows.map { r =>
        val boxes = gs.flatMap { f =>
          val vals = Seq(s"xmin_${f.id}", s"ymin_${f.id}", s"xmax_${f.id}", s"ymax_${f.id}")
            .map(c => Option(r.getAs[Any](c)).map(_.asInstanceOf[Number].doubleValue()))
          if (vals.forall(_.isDefined)) {
            val Seq(x1, y1, x2, y2) = vals.map(_.get)
            Some(f.id -> ((x1, y1, x2, y2)))
          } else None
        }.toMap
        leaf(r.getAs[String]("_gf")) -> boxes
      }.toMap
    entries.map { e =>
      byFile.get(leaf(e.dataFile.filePath)).filter(_.nonEmpty).fold(e) { boxes =>
        val lower = boxes.map { case (id, (x1, y1, _, _)) => id -> Wkb.encodeBound(x1, y1) }
        val upper = boxes.map { case (id, (_, _, x2, y2)) => id -> Wkb.encodeBound(x2, y2) }
        e.copy(dataFile = e.dataFile.copy(
          lowerBounds = e.dataFile.lowerBounds ++ lower,
          upperBounds = e.dataFile.upperBounds ++ upper))
      }
    }
  }
}
