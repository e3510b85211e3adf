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
    ProcedureParameter.in("rewrite_all", BooleanType).defaultValue("false").build(),
    ProcedureParameter.in("strategy", StringType).defaultValue("'binpack'")
      .comment("'binpack' or 'sort'").build(),
    ProcedureParameter.in("sort_order", StringType).defaultValue("NULL")
      .comment("sort strategy: 'c1 ASC NULLS LAST, c2 DESC'; NULL = table sort order").build())

  private val outputSchema = StructType(Seq(
    StructField("rewritten_data_files", LongType, nullable = false),
    StructField("added_data_files", LongType, nullable = false),
    StructField("rewritten_bytes", LongType, nullable = false)))

  override def call(input: InternalRow): JIterator[Scan] = {
    require(!input.isNullAt(0), "rewrite_data_files: 'table' must not be NULL")
    val table = input.getUTF8String(0).toString
    // Bind-time validation parity with the reference
    // (rewrite_data_files_validation.test): empty identifier components and
    // sub-100-byte target sizes are rejected with the same wording. (The
    // reference demands exactly 3 parts for its catalog addressing; graft
    // addresses ns.table or a direct /path, so only emptiness is checked.)
    if (!table.contains("/"))
      require(!table.split("\\.", -1).exists(_.isEmpty),
        s"table identifier '$table' has an empty component")
    val target = if (input.isNullAt(1)) None else {
      val t = input.getLong(1)
      require(t >= 100L, s"'target_file_size_bytes' must be >= 100 bytes, got $t")
      Some(t)
    }
    val minInput = if (input.isNullAt(2)) 5L else input.getLong(2)
    val rewriteAll = !input.isNullAt(3) && input.getBoolean(3)
    val strategy = if (input.isNullAt(4)) "binpack" else input.getUTF8String(4).toString
    val sortOrder = if (input.isNullAt(5)) None else Some(input.getUTF8String(5).toString)
    val r = Dml.rewriteDataFiles(SparkSession.active, catalog.dmlOpsFor(table),
      target, minInput.toInt, rewriteAll, strategy, sortOrder)
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

/**
 * Snapshot-reference and pointer procedures (the SQL face of
 * [[graft.write.Refs]]): `create_ref` / `drop_ref` for branches and tags,
 * `rollback_to_snapshot` / `set_current_snapshot` for the current pointer,
 * `fast_forward` to publish a write-audit-publish branch. Path tables only —
 * a REST catalog server owns its tables' ref lifecycle.
 */
/**
 * `CALL graft.system.compute_table_stats(table => 'db.t')` — ANALYZE for
 * Iceberg tables: computes per-column NDV distributed
 * (approx_count_distinct), writes a Puffin statistics file, and registers
 * it in metadata's `statistics` field, which GraftScan's column statistics
 * then feed to Spark CBO (see [[graft.write.TableStats]]).
 */
private[catalog] class ComputeTableStatsProcedure(catalog: GraftSparkCatalog)
    extends OneRowProcedure {
  override def name(): String = "compute_table_stats"
  override def description(): String =
    "Compute per-column NDV, write a Puffin statistics file, register it in table metadata"
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build())
  protected val outputSchema = StructType(Seq(
    StructField("statistics_file", StringType, nullable = false),
    StructField("analyzed_columns", LongType, nullable = false)))
  override def call(input: InternalRow): JIterator[Scan] = {
    require(!input.isNullAt(0), "compute_table_stats: 'table' must not be NULL")
    val table = input.getUTF8String(0).toString
    val r = catalog.computeStatsFor(SparkSession.active, table)
    oneRow(org.apache.spark.unsafe.types.UTF8String.fromString(r.statisticsPath),
      r.ndv.size.toLong)
  }
}

/** `CALL graft.system.compute_partition_stats(table => 'db.t')` — write a
  * spec-schema partition-statistics file from manifest entries and
  * register it in metadata (see [[graft.write.TableStats.computePartitionStats]]). */
private[catalog] class ComputePartitionStatsProcedure(catalog: GraftSparkCatalog)
    extends OneRowProcedure {
  override def name(): String = "compute_partition_stats"
  override def description(): String =
    "Write a partition-statistics file (Iceberg spec schema) and register it in table metadata"
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build())
  protected val outputSchema = StructType(Seq(
    StructField("statistics_file", StringType, nullable = false),
    StructField("partitions", LongType, nullable = false)))
  override def call(input: InternalRow): JIterator[Scan] = {
    require(!input.isNullAt(0), "compute_partition_stats: 'table' must not be NULL")
    val table = input.getUTF8String(0).toString
    val r = graft.write.TableStats.computePartitionStats(SparkSession.active,
      catalog.pathTableLocation(table, "compute_partition_stats"))
    oneRow(org.apache.spark.unsafe.types.UTF8String.fromString(r.statisticsPath), r.partitions)
  }
}

private[catalog] class CreateRefProcedure(catalog: GraftSparkCatalog)
    extends OneRowProcedure {
  override def name(): String = "create_ref"
  override def description(): String = "Create (or replace) a branch or tag"
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build(),
    ProcedureParameter.in("name", StringType).build(),
    ProcedureParameter.in("type", StringType).defaultValue("'branch'")
      .comment("'branch' or 'tag'").build(),
    ProcedureParameter.in("snapshot_id", LongType).defaultValue("NULL")
      .comment("target snapshot; NULL = current").build(),
    ProcedureParameter.in("replace", BooleanType).defaultValue("false").build())
  protected val outputSchema = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("snapshot_id", LongType, nullable = false)))
  override def call(input: InternalRow): JIterator[Scan] = {
    require(!input.isNullAt(0) && !input.isNullAt(1), "create_ref: 'table' and 'name' are required")
    val table = input.getUTF8String(0).toString
    val name = input.getUTF8String(1).toString
    val tpe = if (input.isNullAt(2)) "branch" else input.getUTF8String(2).toString.toLowerCase
    require(tpe == "branch" || tpe == "tag", s"create_ref: type must be 'branch' or 'tag', got '$tpe'")
    val snapId = if (input.isNullAt(3)) None else Some(input.getLong(3))
    val replace = !input.isNullAt(4) && input.getBoolean(4)
    val m = graft.write.Refs.createRef(SparkSession.active,
      catalog.pathTableLocation(table, "create_ref"), name, tpe == "branch", snapId, replace)
    oneRow(org.apache.spark.unsafe.types.UTF8String.fromString(name), m.refs(name).snapshotId)
  }
}

private[catalog] class DropRefProcedure(catalog: GraftSparkCatalog)
    extends OneRowProcedure {
  override def name(): String = "drop_ref"
  override def description(): String = "Drop a branch or tag (snapshots remain until expired)"
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build(),
    ProcedureParameter.in("name", StringType).build())
  protected val outputSchema = StructType(Seq(
    StructField("dropped", StringType, nullable = false)))
  override def call(input: InternalRow): JIterator[Scan] = {
    require(!input.isNullAt(0) && !input.isNullAt(1), "drop_ref: 'table' and 'name' are required")
    val name = input.getUTF8String(1).toString
    graft.write.Refs.dropRef(SparkSession.active,
      catalog.pathTableLocation(input.getUTF8String(0).toString, "drop_ref"), name)
    oneRow(org.apache.spark.unsafe.types.UTF8String.fromString(name))
  }
}

/** Shared shape for the two pointer-move procedures. */
private[catalog] abstract class PointerProcedure(catalog: GraftSparkCatalog)
    extends OneRowProcedure {
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build(),
    ProcedureParameter.in("snapshot_id", LongType).build())
  protected val outputSchema = StructType(Seq(
    StructField("previous_snapshot_id", LongType, nullable = true),
    StructField("current_snapshot_id", LongType, nullable = false)))
  protected def move(spark: SparkSession, path: String, id: Long): graft.core.TableMetadata
  override def call(input: InternalRow): JIterator[Scan] = {
    require(!input.isNullAt(0) && !input.isNullAt(1), s"${name()}: 'table' and 'snapshot_id' are required")
    val path = catalog.pathTableLocation(input.getUTF8String(0).toString, name())
    val spark = SparkSession.active
    val prev = graft.core.TableMetadata.load(path, spark.sessionState.newHadoopConf())
      .currentSnapshotId
    val m = move(spark, path, input.getLong(1))
    oneRow(prev.map(Long.box).orNull, m.currentSnapshotId.get)
  }
}

private[catalog] class RollbackToSnapshotProcedure(catalog: GraftSparkCatalog)
    extends PointerProcedure(catalog) {
  override def name(): String = "rollback_to_snapshot"
  override def description(): String = "Roll the table back to an ancestor snapshot"
  protected def move(spark: SparkSession, path: String, id: Long) =
    graft.write.Refs.rollbackTo(spark, path, id)
}

private[catalog] class SetCurrentSnapshotProcedure(catalog: GraftSparkCatalog)
    extends PointerProcedure(catalog) {
  override def name(): String = "set_current_snapshot"
  override def description(): String = "Jump the current pointer to any snapshot in metadata"
  protected def move(spark: SparkSession, path: String, id: Long) =
    graft.write.Refs.setCurrentSnapshot(spark, path, id)
}

private[catalog] class FastForwardProcedure(catalog: GraftSparkCatalog)
    extends OneRowProcedure {
  override def name(): String = "fast_forward"
  override def description(): String =
    "Fast-forward a branch to another ref's head (publishes a WAP branch when branch='main')"
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build(),
    ProcedureParameter.in("branch", StringType).build(),
    ProcedureParameter.in("to", StringType).build())
  protected val outputSchema = StructType(Seq(
    StructField("branch_updated", StringType, nullable = false),
    StructField("current_snapshot_id", LongType, nullable = false)))
  override def call(input: InternalRow): JIterator[Scan] = {
    require(!input.isNullAt(0) && !input.isNullAt(1) && !input.isNullAt(2),
      "fast_forward: 'table', 'branch' and 'to' are required")
    val branch = input.getUTF8String(1).toString
    val m = graft.write.Refs.fastForward(SparkSession.active,
      catalog.pathTableLocation(input.getUTF8String(0).toString, "fast_forward"),
      branch, input.getUTF8String(2).toString)
    oneRow(org.apache.spark.unsafe.types.UTF8String.fromString(branch),
      m.refs(branch).snapshotId)
  }
}

/** `CALL graft.system.add_partition_field(table => 'db.t', column => 'c',
  * transform => 'month')` — the SQL face of partition evolution
  * ([[graft.write.Evolution.addPartitionField]]): commits a new default
  * spec, no data rewrite. */
private[catalog] class AddPartitionFieldProcedure(catalog: GraftSparkCatalog)
    extends OneRowProcedure {
  override def name(): String = "add_partition_field"
  override def description(): String =
    "Add transform(column) to the default partition spec (metadata-only)"
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build(),
    ProcedureParameter.in("column", StringType).build(),
    ProcedureParameter.in("transform", StringType).defaultValue("'identity'")
      .comment("identity | bucket[N] | truncate[W] | year | month | day | hour").build(),
    ProcedureParameter.in("name", StringType).defaultValue("NULL")
      .comment("partition field name; NULL derives one from column + transform").build())
  protected val outputSchema = StructType(Seq(
    StructField("spec_id", IntegerType, nullable = false),
    StructField("fields", StringType, nullable = false)))
  override def call(input: InternalRow): JIterator[Scan] = {
    require(!input.isNullAt(0) && !input.isNullAt(1),
      "add_partition_field: 'table' and 'column' are required")
    val transform = if (input.isNullAt(2)) "identity" else input.getUTF8String(2).toString
    val fieldName = if (input.isNullAt(3)) None else Some(input.getUTF8String(3).toString)
    val m = graft.write.Evolution.addPartitionField(SparkSession.active,
      catalog.pathTableLocation(input.getUTF8String(0).toString, "add_partition_field"),
      input.getUTF8String(1).toString, transform, fieldName)
    oneRow(m.defaultSpecId, org.apache.spark.unsafe.types.UTF8String.fromString(
      m.defaultSpec.fields.map(_.name).mkString(",")))
  }
}

/** `CALL graft.system.drop_partition_field(table => 'db.t', name => 'f')` —
  * removes a field from the default spec; files written under older specs
  * keep pruning on it. */
private[catalog] class DropPartitionFieldProcedure(catalog: GraftSparkCatalog)
    extends OneRowProcedure {
  override def name(): String = "drop_partition_field"
  override def description(): String =
    "Drop a field from the default partition spec (metadata-only)"
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build(),
    ProcedureParameter.in("name", StringType).build())
  protected val outputSchema = StructType(Seq(
    StructField("spec_id", IntegerType, nullable = false),
    StructField("fields", StringType, nullable = false)))
  override def call(input: InternalRow): JIterator[Scan] = {
    require(!input.isNullAt(0) && !input.isNullAt(1),
      "drop_partition_field: 'table' and 'name' are required")
    val m = graft.write.Evolution.dropPartitionField(SparkSession.active,
      catalog.pathTableLocation(input.getUTF8String(0).toString, "drop_partition_field"),
      input.getUTF8String(1).toString)
    oneRow(m.defaultSpecId, org.apache.spark.unsafe.types.UTF8String.fromString(
      m.defaultSpec.fields.map(_.name).mkString(",")))
  }
}

/** `CALL graft.system.create_changelog_view(table => 'db.t', ...)` —
  * registers a temp view over the table's CDC changelog
  * ([[graft.streaming.Streams.changes]]), optionally relabelling paired
  * delete+insert rows as update pre/post images when `identifier_columns`
  * is given ([[graft.streaming.Streams.computeUpdates]]). Mirrors the
  * Iceberg-Spark `create_changelog_view` procedure's surface. */
private[catalog] class CreateChangelogViewProcedure(catalog: GraftSparkCatalog)
    extends OneRowProcedure {
  override def name(): String = "create_changelog_view"
  override def description(): String =
    "Create a temp view of row-level changes; identifier_columns pairs them into updates"
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build(),
    ProcedureParameter.in("changelog_view", StringType).defaultValue("NULL")
      .comment("view name; NULL derives `<table>_changes`").build(),
    ProcedureParameter.in("identifier_columns", StringType).defaultValue("NULL")
      .comment("comma-separated unique key; set to compute update pre/post images").build(),
    ProcedureParameter.in("start_snapshot_id", LongType).defaultValue("NULL").build(),
    ProcedureParameter.in("end_snapshot_id", LongType).defaultValue("NULL").build())
  protected val outputSchema = StructType(Seq(
    StructField("changelog_view", StringType, nullable = false)))
  override def call(input: InternalRow): JIterator[Scan] = {
    require(!input.isNullAt(0), "create_changelog_view: 'table' is required")
    val table = input.getUTF8String(0).toString
    val viewName =
      if (input.isNullAt(1)) table.split('.').last + "_changes"
      else input.getUTF8String(1).toString
    val idCols =
      if (input.isNullAt(2)) Nil
      else input.getUTF8String(2).toString.split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val start = if (input.isNullAt(3)) None else Some(input.getLong(3))
    val end = if (input.isNullAt(4)) None else Some(input.getLong(4))
    val spark = SparkSession.active
    val base = graft.streaming.Streams.changes(spark,
      catalog.pathTableLocation(table, "create_changelog_view"), start, end)
    val df = if (idCols.isEmpty) base else graft.streaming.Streams.computeUpdates(base, idCols)
    df.createOrReplaceTempView(viewName)
    oneRow(org.apache.spark.unsafe.types.UTF8String.fromString(viewName))
  }
}

/**
 * `CALL graft.system.rewrite_manifests(table => 'db.t')` — standalone
 * manifest compaction ([[graft.write.Maintenance.rewriteManifests]]): a
 * metadata-only REPLACE snapshot whose bin-packed manifests cut
 * per-query driver planning cost on commit-heavy tables.
 */
private[catalog] class RewriteManifestsProcedure(catalog: GraftSparkCatalog)
    extends OneRowProcedure {
  override def name(): String = "rewrite_manifests"
  override def description(): String =
    "Bin-pack the current snapshot's data manifests into target-sized ones (metadata-only)"

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build(),
    ProcedureParameter.in("target_size_bytes", LongType).defaultValue("NULL")
      .comment("manifest target size; NULL = commit.manifest.target-size-bytes or 8 MiB")
      .build())

  protected val outputSchema = StructType(Seq(
    StructField("rewritten_manifests_count", IntegerType, nullable = false),
    StructField("added_manifests_count", IntegerType, nullable = false)))

  override def call(input: InternalRow): JIterator[Scan] = {
    require(!input.isNullAt(0), "rewrite_manifests: 'table' must not be NULL")
    val table = input.getUTF8String(0).toString
    val target = if (input.isNullAt(1)) None else Some(input.getLong(1))
    val r = graft.write.Maintenance.rewriteManifests(SparkSession.active,
      catalog.pathTableLocation(table, "rewrite_manifests"), target)
    oneRow(r.rewrittenManifests, r.addedManifests)
  }
}

/**
 * `CALL graft.system.register_table(table => 'db.t', metadata_file =>
 * '/path/v3.metadata.json')` — adopt an EXISTING table into a REST
 * catalog by metadata location (RestCatalog.registerTable; nothing is
 * rewritten or moved).
 */
private[catalog] class RegisterTableProcedure(catalog: GraftSparkCatalog)
    extends OneRowProcedure {
  override def name(): String = "register_table"
  override def description(): String =
    "Register an existing Iceberg table with the REST catalog by metadata location"

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build(),
    ProcedureParameter.in("metadata_file", StringType).build())

  protected val outputSchema = StructType(Seq(
    StructField("current_snapshot_id", LongType, nullable = true),
    StructField("total_data_files_count", LongType, nullable = true)))

  override def call(input: InternalRow): JIterator[Scan] = {
    require(!input.isNullAt(0) && !input.isNullAt(1),
      "register_table: 'table' and 'metadata_file' must not be NULL")
    val t = catalog.registerRestTable(input.getUTF8String(0).toString,
      input.getUTF8String(1).toString)
    oneRow(t.metadata.currentSnapshotId.map(Long.box).orNull,
      t.metadata.currentSnapshot.flatMap(_.summary.get("total-data-files"))
        .flatMap(_.toLongOption).map(Long.box).orNull)
  }
}

/**
 * `CALL graft.system.rewrite_position_delete_files(table => 'db.t')` —
 * [[graft.write.Dml.rewritePositionDeleteFiles]]: drop dangling positional
 * delete rows and compact the rest to one sorted delete file per
 * partition, one metadata REPLACE snapshot.
 */
private[catalog] class RewritePositionDeletesProcedure(catalog: GraftSparkCatalog)
    extends OneRowProcedure {
  override def name(): String = "rewrite_position_delete_files"
  override def description(): String =
    "Compact positional delete files and drop dangling delete rows"

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build())

  protected val outputSchema = StructType(Seq(
    StructField("rewritten_delete_files_count", IntegerType, nullable = false),
    StructField("added_delete_files_count", IntegerType, nullable = false),
    StructField("removed_dangling_rows", LongType, nullable = false)))

  override def call(input: InternalRow): JIterator[Scan] = {
    require(!input.isNullAt(0), "rewrite_position_delete_files: 'table' must not be NULL")
    val r = Dml.rewritePositionDeleteFiles(SparkSession.active,
      catalog.dmlOpsFor(input.getUTF8String(0).toString))
    oneRow(r.rewrittenDeleteFiles, r.addedDeleteFiles, r.removedDanglingRows)
  }
}
