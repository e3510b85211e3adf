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
/** Per-row full envelope struct for [[GeoBounds]]. Z/M are boxed doubles
  * (null = absent axis), and the class is TOP-LEVEL: both an Option field
  * and an object-nested class (binary name with `$`) make Janino reject
  * the generated serializer, silently running every geometry write's
  * envelope projection interpreted. */
private[write] case class RowEnv(xmin: Double, ymin: Double, xmax: Double, ymax: Double,
    zmin: java.lang.Double, zmax: java.lang.Double,
    mmin: java.lang.Double, mmax: java.lang.Double)

object GeoBounds {

  /** Top-level PLANAR geometry fields of `schema`. Nested geometry stays
    * bound-less, and so does GEOGRAPHY: its edges are geodesics and its
    * bounds may wrap the antimeridian, so a planar vertex envelope is NOT
    * a sound bound — geography prunes conservatively instead. */
  private def geomFields(schema: IcebergSchema): Seq[IcebergTypes.NestedField] =
    schema.fields.filter(_.fieldType match {
      case g: IcebergTypes.GeometryT => !g.geography
      case _ => false
    })

  def patch(spark: SparkSession, entries: Seq[ManifestEntry],
      schema: IcebergSchema): Seq[ManifestEntry] = {
    val gs = geomFields(schema)
    if (gs.isEmpty || entries.isEmpty) return entries
    val envOf = udf((wkb: Array[Byte]) =>
      Wkb.envelopeFull(wkb).map(e => RowEnv(e.xmin, e.ymin, e.xmax, e.ymax,
        e.z.map(z => Double.box(z._1)).orNull, e.z.map(z => Double.box(z._2)).orNull,
        e.m.map(m => Double.box(m._1)).orNull, e.m.map(m => Double.box(m._2)).orNull)).orNull)
    val paths = entries.map(_.dataFile.filePath)
    // Envelope structs are PROJECTED once per row, then aggregated — the
    // ten per-column aggregates reference the materialized struct, not ten
    // fresh evaluations of the WKB-parsing UDF.
    val aggs = gs.flatMap { f =>
      val env = col(s"_env_${f.id}")
      Seq(
        min(env.getField("xmin")).as(s"xmin_${f.id}"), min(env.getField("ymin")).as(s"ymin_${f.id}"),
        max(env.getField("xmax")).as(s"xmax_${f.id}"), max(env.getField("ymax")).as(s"ymax_${f.id}"),
        min(env.getField("zmin")).as(s"zmin_${f.id}"), max(env.getField("zmax")).as(s"zmax_${f.id}"),
        min(env.getField("mmin")).as(s"mmin_${f.id}"), max(env.getField("mmax")).as(s"mmax_${f.id}"),
        // Z/M bounds are valid only when EVERY non-null geometry in the
        // file carries the dimension: a mixed file has unknown Z for some
        // rows, so the bound must be omitted (or padded, for XYM).
        sum(when(env.isNotNull && env.getField("zmin").isNull, 1).otherwise(0)).as(s"zmiss_${f.id}"),
        sum(when(env.isNotNull && env.getField("mmin").isNull, 1).otherwise(0)).as(s"mmiss_${f.id}"))
    }
    val rows = spark.read.parquet(paths: _*)
      .select(input_file_name().as("_gf") +:
        gs.map(f => envOf(col(s"`${f.name}`")).as(s"_env_${f.id}")): _*)
      .groupBy("_gf")
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    // Keyed by the scheme-normalized FULL path: input_file_name returns a
    // PERCENT-ENCODED URI form (file:///a%20b.parquet) while manifests
    // record plain paths, and a bare file NAME would collide across
    // partition directories (Spark's dynamic-partition writer reuses
    // part-file names per partition). Decode via java.net.URI so paths with
    // spaces/escapes still match (else those files would silently get no
    // geometry bounds); keep the authority so s3a://bucket-a/k and
    // s3a://bucket-b/k stay distinct. Un-parseable strings (a plain path
    // containing a space is not a valid URI) fall back to scheme-stripping,
    // which is exactly right for plain manifest paths.
    def leaf(p: String): String =
      try {
        val u = new java.net.URI(p)
        val auth = Option(u.getAuthority).getOrElse("")
        if (u.getScheme == null) p
        else (if (auth.nonEmpty) "/" + auth else "") + u.getPath
      } catch {
        case _: java.net.URISyntaxException => p.replaceFirst("^[a-zA-Z0-9+.-]+:/+", "/")
      }
    case class Box(x1: Double, y1: Double, x2: Double, y2: Double,
        z: Option[(Double, Double)], m: Option[(Double, Double)])
    val byFile: Map[String, Map[Int, Box]] =
      rows.map { r =>
        def d(c: String): Option[Double] =
          Option(r.getAs[Any](c)).map(_.asInstanceOf[Number].doubleValue())
        def l(c: String): Long =
          Option(r.getAs[Any](c)).map(_.asInstanceOf[Number].longValue()).getOrElse(0L)
        val boxes = gs.flatMap { f =>
          (d(s"xmin_${f.id}"), d(s"ymin_${f.id}"), d(s"xmax_${f.id}"), d(s"ymax_${f.id}")) match {
            case (Some(x1), Some(y1), Some(x2), Some(y2)) =>
              val z = if (l(s"zmiss_${f.id}") == 0)
                for (a <- d(s"zmin_${f.id}"); b <- d(s"zmax_${f.id}")) yield (a, b)
              else None
              val m = if (l(s"mmiss_${f.id}") == 0)
                for (a <- d(s"mmin_${f.id}"); b <- d(s"mmax_${f.id}")) yield (a, b)
              else None
              Some(f.id -> Box(x1, y1, x2, y2, z, m))
            case _ => None
          }
        }.toMap
        leaf(r.getAs[String]("_gf")) -> boxes
      }.toMap
    entries.map { e =>
      byFile.get(leaf(e.dataFile.filePath)).filter(_.nonEmpty).fold(e) { boxes =>
        val lower = boxes.map { case (id, b) =>
          id -> Wkb.encodeBoundZM(b.x1, b.y1, b.z.map(_._1), b.m.map(_._1), upper = false) }
        val upper = boxes.map { case (id, b) =>
          id -> Wkb.encodeBoundZM(b.x2, b.y2, b.z.map(_._2), b.m.map(_._2), upper = true) }
        e.copy(dataFile = e.dataFile.copy(
          lowerBounds = e.dataFile.lowerBounds ++ lower,
          upperBounds = e.dataFile.upperBounds ++ upper))
      }
    }
  }
}
