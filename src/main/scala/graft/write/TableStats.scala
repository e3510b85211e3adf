package graft.write

import graft.core._
import graft.read.{IcebergRead, Puffin, ReadOptions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.ByteBuffer

/**
 * Table-statistics computation: an ANALYZE-style pass that writes a Puffin
 * statistics file carrying per-column NDV estimates and registers it in
 * table metadata's `statistics` field (Iceberg spec "Table statistics").
 *
 * The reference round-trips the `statistics` metadata field through its
 * REST bindings (src/rest_catalog/objects/statistics_file.cpp) but ships
 * no ANALYZE; this module closes the loop Spark-side so graft-written
 * tables feed their own CBO column statistics (GraftScan.columnStats):
 * at 100 TB, NDV is what lets join planning distinguish a 50-value status
 * column from a unique key — selectivity estimates that decide broadcast
 * vs shuffle before any data moves.
 *
 * NDV is computed distributed (`approx_count_distinct`, a HyperLogLog++
 * partial-merge aggregate — one pass, no shuffle of row data, only sketch
 * merge); the driver receives one row of counts. Blob payloads use graft's
 * own `graft-ndv-v1` type (8-byte big-endian count) rather than fake
 * theta-sketch bytes: per the Puffin spec readers skip unknown blob types,
 * and the `ndv` blob-metadata property — which interoperating readers
 * (and graft itself) consume — is populated either way.
 */
object TableStats {

  case class Result(statisticsPath: String, ndv: Map[String, Long], meta: TableMetadata)

  /** Column types NDV is computed for: primitives with well-defined
    * equality that Spark can aggregate directly. */
  private def countable(t: IcebergType): Boolean = t match {
    case IcebergTypes.BooleanT | IcebergTypes.IntT | IcebergTypes.LongT |
        IcebergTypes.FloatT | IcebergTypes.DoubleT | IcebergTypes.DateT |
        IcebergTypes.TimeT | IcebergTypes.TimestampT | IcebergTypes.TimestampTzT |
        IcebergTypes.TimestampNsT | IcebergTypes.TimestampTzNsT |
        IcebergTypes.StringT | IcebergTypes.UuidT => true
    case _: IcebergTypes.DecimalT => true
    case _ => false
  }

  /** Compute NDV for every countable top-level column of the CURRENT
    * snapshot, write the Puffin statistics file under `metadata/`, and
    * commit metadata registering it (replacing any previous statistics
    * entry for the same snapshot). Returns the written path and counts. */
  def computeTableStats(spark: SparkSession, path: String): Result = {
    IcebergRead.ensureConfs(spark)
    val conf = spark.sessionState.newHadoopConf()
    val meta = TableMetadata.load(path, conf)
    computeWith(spark, meta, entry => {
      val newMeta = meta.copy(
        statistics = meta.statistics.filterNot(_.snapshotId == entry.snapshotId) :+ entry,
        lastUpdatedMs = System.currentTimeMillis())
      IcebergWrite.commitMetadataNextVersion(newMeta, conf)
    })
  }

  /** The engine core, commit-agnostic: path tables commit the next metadata
    * version directly; REST tables post a `set-statistics` update. */
  def computeWith(spark: SparkSession, meta: TableMetadata,
      commit: StatisticsFile => TableMetadata): Result = {
    IcebergRead.ensureConfs(spark)
    val conf = spark.sessionState.newHadoopConf()
    val snap = meta.currentSnapshot.getOrElse(
      throw new IllegalStateException(
        s"compute_table_stats: table at ${meta.location} has no current snapshot"))
    val schema = meta.schemaFor(Some(snap))
    val cols = schema.fields.filter(f => countable(f.fieldType))
    if (cols.isEmpty)
      throw new IllegalStateException("compute_table_stats: no countable top-level columns")

    val df = IcebergRead.loadWithMetadata(spark, meta, conf, ReadOptions())
    val aggs = cols.map(f => approx_count_distinct(col(s"`${f.name}`")).as(f.name))
    // One row of per-column counts reaches the driver — never row data.
    val row = df.agg(aggs.head, aggs.drop(1): _*).collect()(0)
    val ndvByField: Seq[(IcebergTypes.NestedField, Long)] =
      cols.zipWithIndex.map { case (f, i) => f -> row.getLong(i) }

    val statsPath =
      s"${meta.location}/metadata/${snap.snapshotId}-${java.util.UUID.randomUUID()}.stats"
    val blobs = ndvByField.map { case (f, n) =>
      val payload = ByteBuffer.allocate(8).putLong(n).array()
      Puffin.BlobSpec("graft-ndv-v1", Seq(f.id), snap.snapshotId, snap.sequenceNumber,
        payload, Map("ndv" -> n.toString))
    }
    val written = Puffin.writeBlobs(statsPath, conf, blobs)
    val blobMeta = ndvByField.zip(written.blobOffsets).map { case ((f, n), _) =>
      BlobMetadata("graft-ndv-v1", snap.snapshotId, snap.sequenceNumber,
        Seq(f.id), Map("ndv" -> n.toString))
    }
    val entry = StatisticsFile(snap.snapshotId, statsPath,
      written.fileSize, written.footerSize, blobMeta)
    val committed = commit(entry)
    Result(statsPath, ndvByField.map { case (f, n) => f.name -> n }.toMap, committed)
  }
}
