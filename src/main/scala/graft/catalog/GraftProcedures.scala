package graft.catalog

import graft.write.{Dml, Maintenance}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import java.util.{Collections, Iterator => JIterator}

/**
 * `CALL graft.system.rewrite_data_files(table => 'db.t', ...)` — the SQL face
 * of [[Dml.rewriteDataFiles]], Spark's stored-procedure protocol
 * (`ProcedureCatalog` / SPARK-44167) standing in for the reference's
 * `iceberg_rewrite_data_files(...)` table function
 * (src/function/metadata/iceberg_rewrite_data_files.cpp:165-177: named
 * parameters `target_file_size_bytes`, `min_input_files` (default 5),
 * `rewrite_all`; result columns `rewritten_data_files, added_data_files,
 * rewritten_bytes`).
 *
 * The compaction itself is a distributed job over ONLY the qualifying
 * groups' files; the procedure returns the one-row summary as a
 * [[LocalScan]].
 */
private[catalog] class RewriteDataFilesProcedure(catalog: GraftSparkCatalog)
    extends UnboundProcedure with BoundProcedure {

  override def name(): String = "rewrite_data_files"
  override def description(): String =
    "Bin-pack undersized data files per partition and commit a REPLACE snapshot"

  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType)
      .comment("table name (ns.table) or direct /path").build(),
    ProcedureParameter.in("target_file_size_bytes", LongType).defaultValue("NULL")
      .comment("defaults to write.[parquet.]target-file-size-bytes table property, else 512 MiB")
      .build(),
    ProcedureParameter.in("min_input_files", LongType).defaultValue("5").build(),
    ProcedureParameter.in("rewrite_all", BooleanType).defaultValue("false").build())

  private val outputSchema = StructType(Seq(
    StructField("rewritten_data_files", LongType, nullable = false),
    StructField("added_data_files", LongType, nullable = false),
    StructField("rewritten_bytes", LongType, nullable = false)))

  override def call(input: InternalRow): JIterator[Scan] = {
    require(!input.isNullAt(0), "rewrite_data_files: 'table' must not be NULL")
    val table = input.getUTF8String(0).toString
    val target = if (input.isNullAt(1)) None else Some(input.getLong(1))
    val minInput = if (input.isNullAt(2)) 5L else input.getLong(2)
    val rewriteAll = !input.isNullAt(3) && input.getBoolean(3)
    val r = Dml.rewriteDataFiles(SparkSession.active, catalog.dmlOpsFor(table),
      target, minInput.toInt, rewriteAll)
    val row: InternalRow = new GenericInternalRow(
      Array[Any](r.rewrittenDataFiles, r.addedDataFiles, r.rewrittenBytes))
    Collections.singletonList[Scan](new LocalScan {
      override def rows(): Array[InternalRow] = Array(row)
      override def readSchema(): StructType = outputSchema
    }).iterator()
  }
}

/** Shared one-row result plumbing for maintenance procedures. */
private[catalog] trait OneRowProcedure extends UnboundProcedure with BoundProcedure {
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false
  protected def outputSchema: StructType
  protected def oneRow(values: Any*): JIterator[Scan] = {
    val row: InternalRow = new GenericInternalRow(values.toArray)
    Collections.singletonList[Scan](new LocalScan {
      override def rows(): Array[InternalRow] = Array(row)
      override def readSchema(): StructType = outputSchema
    }).iterator()
  }
}

/**
 * `CALL graft.system.expire_snapshots(table => 'db.t', older_than =>
 * TIMESTAMP '...', retain_last => 2)` — the SQL face of
 * [[Maintenance.expireSnapshots]]. Beyond the reference (which ships no
 * expiration); without it every DML/streaming commit's snapshot lives
 * forever. Refused on REST-named tables — the catalog server owns their
 * metadata lifecycle.
 */
private[catalog] class ExpireSnapshotsProcedure(catalog: GraftSparkCatalog)
    extends OneRowProcedure {
  override def name(): String = "expire_snapshots"
  override def description(): String =
    "Remove old snapshots from table metadata and delete files only they reference"

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build(),
    ProcedureParameter.in("older_than", TimestampType).defaultValue("NULL")
      .comment("expire snapshots older than this; NULL = everything not otherwise retained")
      .build(),
    ProcedureParameter.in("retain_last", IntegerType).defaultValue("1")
      .comment("always keep this many most-recent snapshots").build())

  protected val outputSchema = StructType(Seq(
    StructField("expired_snapshots", LongType, nullable = false),
    StructField("deleted_data_files", LongType, nullable = false),
    StructField("deleted_delete_files", LongType, nullable = false),
    StructField("deleted_manifest_files", LongType, nullable = false),
    StructField("deleted_manifest_lists", LongType, nullable = false)))

  override def call(input: InternalRow): JIterator[Scan] = {
    require(!input.isNullAt(0), "expire_snapshots: 'table' must not be NULL")
    val table = input.getUTF8String(0).toString
    val olderThanMs = if (input.isNullAt(1)) None else Some(input.getLong(1) / 1000L)
    val retainLast = if (input.isNullAt(2)) 1 else input.getInt(2)
    val r = Maintenance.expireSnapshots(SparkSession.active,
      catalog.pathTableLocation(table, "expire_snapshots"), olderThanMs, retainLast)
    oneRow(r.expiredSnapshots, r.deletedDataFiles, r.deletedDeleteFiles,
      r.deletedManifests, r.deletedManifestLists)
  }
}

/**
 * `CALL graft.system.remove_orphan_files(table => 'db.t', older_than =>
 * TIMESTAMP '...')` — the SQL face of [[Maintenance.removeOrphanFiles]].
 * `older_than` defaults to now - 3 days: the grace window that keeps an
 * in-flight writer's staged-but-uncommitted files safe.
 */
private[catalog] class RemoveOrphanFilesProcedure(catalog: GraftSparkCatalog)
    extends OneRowProcedure {
  override def name(): String = "remove_orphan_files"
  override def description(): String =
    "Delete unreferenced files under the table's data directory"

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build(),
    ProcedureParameter.in("older_than", TimestampType).defaultValue("NULL")
      .comment("only delete files older than this; NULL = now minus 3 days").build())

  protected val outputSchema = StructType(Seq(
    StructField("deleted_file_count", LongType, nullable = false)))

  override def call(input: InternalRow): JIterator[Scan] = {
    require(!input.isNullAt(0), "remove_orphan_files: 'table' must not be NULL")
    val table = input.getUTF8String(0).toString
    val cutoffMs =
      if (input.isNullAt(1)) System.currentTimeMillis() - 3L * 24 * 3600 * 1000
      else input.getLong(1) / 1000L
    val r = Maintenance.removeOrphanFiles(SparkSession.active,
      catalog.pathTableLocation(table, "remove_orphan_files"), cutoffMs)
    oneRow(r.orphanFiles)
  }
}
