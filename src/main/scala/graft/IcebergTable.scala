package graft

import graft.core._
import graft.manifest._
import graft.read.{IcebergRead, ReadOptions, ScanPlan}
import graft.write.{Dml, Evolution, IcebergWrite, Refs, TableWriteOptions}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * Public API of the graft Iceberg engine — the Spark-native equivalent of
 * the reference's table + metadata functions surface
 * (reference: src/function/scan/iceberg_scan.cpp `iceberg_scan`,
 * src/function/metadata/iceberg_snapshots.cpp, iceberg_metadata.cpp,
 * iceberg_column_stats.cpp, iceberg_partition_stats.cpp).
 */
object IcebergTable {

  // ---------- reads ----------

  /** `iceberg_scan('path')` equivalent. */
  def load(spark: SparkSession, path: String, opts: ReadOptions = ReadOptions()): DataFrame =
    IcebergRead.load(spark, path, opts)

  def plan(spark: SparkSession, path: String, opts: ReadOptions = ReadOptions()): ScanPlan =
    IcebergRead.plan(spark, path, opts)

  /** Metadata-only count(*) — exact from manifests when no deletes apply
    * (reference iceberg_multi_file_list.cpp:332-364,395-427); falls back to
    * scanning. */
  def count(spark: SparkSession, path: String, opts: ReadOptions = ReadOptions()): Long = {
    val p = plan(spark, path, opts)
    p.fastRowCount.getOrElse(load(spark, path, opts).count())
  }

  /** Post-pruning cardinality estimate: exact from manifest record counts
    * minus nothing (upper bound when deletes/filters apply) — the planner
    * statistic the reference serves for cost estimation
    * (reference iceberg_multi_file_list.cpp:395-427 GetStatistics). */
  def estimateRows(spark: SparkSession, path: String, filterSql: Option[String] = None): Long = {
    val p = plan(spark, path, ReadOptions(filterSql = filterSql))
    p.dataFiles.map(_.info.recordCount).sum
  }

  /** Register the table as a temp view so `spark.sql` can query it (the
    * lightweight SQL front-end; a DSv2 TableProvider is the long-term
    * path noted in SURVEY §2.1). */
  def createOrReplaceView(spark: SparkSession, path: String, viewName: String,
      opts: ReadOptions = ReadOptions()): Unit =
    load(spark, path, opts).createOrReplaceTempView(viewName)

  // ---------- writes ----------

  /** COPY TO (FORMAT iceberg) equivalent: one-shot table write. */
  def write(df: DataFrame, path: String, opts: TableWriteOptions = TableWriteOptions()): TableMetadata =
    IcebergWrite.writeTable(df, path, opts)

  def createTable(spark: SparkSession, path: String, schema: StructType,
      opts: TableWriteOptions = TableWriteOptions()): TableMetadata =
    IcebergWrite.createTable(spark, path, schema, opts)

  def append(df: DataFrame, path: String): TableMetadata = IcebergWrite.append(df, path)

  /** Append to a named branch (write-audit-publish): main is untouched until
    * the branch is fast-forwarded. Read the branch with
    * `ReadOptions(refName = Some(branch))` / `VERSION AS OF 'branch'`. */
  def appendToBranch(df: DataFrame, path: String, branch: String): TableMetadata =
    IcebergWrite.append(df, path, toBranch = Some(branch))

  // ---------- branches / tags / snapshot pointers ----------

  def createBranch(spark: SparkSession, path: String, name: String,
      snapshotId: Option[Long] = None, replace: Boolean = false): TableMetadata =
    Refs.createRef(spark, path, name, isBranch = true, snapshotId, replace)

  def createTag(spark: SparkSession, path: String, name: String,
      snapshotId: Option[Long] = None, replace: Boolean = false): TableMetadata =
    Refs.createRef(spark, path, name, isBranch = false, snapshotId, replace)

  def dropRef(spark: SparkSession, path: String, name: String): TableMetadata =
    Refs.dropRef(spark, path, name)

  /** Roll back to an ancestor snapshot of the current one. */
  def rollbackTo(spark: SparkSession, path: String, snapshotId: Long): TableMetadata =
    Refs.rollbackTo(spark, path, snapshotId)

  /** Jump the current pointer to any snapshot in metadata. */
  def setCurrentSnapshot(spark: SparkSession, path: String, snapshotId: Long): TableMetadata =
    Refs.setCurrentSnapshot(spark, path, snapshotId)

  /** Fast-forward branch `name` to `to`'s head (publish a WAP branch with
    * `fastForward(spark, path, "main", branch)`). */
  def fastForward(spark: SparkSession, path: String, name: String, to: String): TableMetadata =
    Refs.fastForward(spark, path, name, to)

  /** DELETE FROM ... WHERE cond (merge-on-read positional deletes). */
  def delete(spark: SparkSession, path: String, condSql: String): TableMetadata =
    Dml.delete(spark, path, condSql)

  /** UPDATE ... SET col->expr WHERE cond (MoR delete + insert, one snapshot). */
  def update(spark: SparkSession, path: String, condSql: String, set: Map[String, String]): TableMetadata =
    Dml.update(spark, path, condSql, set)

  /** MERGE INTO (join-based, WHEN MATCHED UPDATE/DELETE + WHEN NOT MATCHED INSERT). */
  def merge(spark: SparkSession, path: String, source: DataFrame, onCond: String,
      actions: Dml.MergeActions): TableMetadata =
    Dml.merge(spark, path, source, onCond, actions)

  /** Equality delete: remove rows matching key rows (global delete file). */
  def deleteEquality(spark: SparkSession, path: String, keys: DataFrame): TableMetadata =
    Dml.deleteEquality(spark, path, keys)

  /** CDC changelog between two snapshots (see
    * [[graft.streaming.Streams.changesBetween]]). */
  def changesBetween(spark: SparkSession, path: String,
      fromSnapshotId: Option[Long], toSnapshotId: Long): DataFrame =
    graft.streaming.Streams.changesBetween(spark, path, fromSnapshotId, toSnapshotId)

  /** ORDER BY col LIMIT k with stats-ordered file selection (scan-order
    * pruning). */
  def topK(spark: SparkSession, path: String, colName: String, k: Int,
      descending: Boolean = true, opts: ReadOptions = ReadOptions()): DataFrame =
    IcebergRead.topK(spark, path, colName, k, descending, opts)

  /** iceberg_rewrite_data_files compaction. */
  def rewriteDataFiles(spark: SparkSession, path: String,
      targetFileSizeBytes: Long = 512L * 1024 * 1024, rewriteAll: Boolean = false): TableMetadata =
    Dml.rewriteDataFiles(spark, path, targetFileSizeBytes, rewriteAll)

  /** Snapshot expiration (see [[graft.write.Maintenance.expireSnapshots]]). */
  def expireSnapshots(spark: SparkSession, path: String,
      olderThanMs: Option[Long] = None,
      retainLast: Int = 1): graft.write.Maintenance.ExpireResult =
    graft.write.Maintenance.expireSnapshots(spark, path, olderThanMs, retainLast)

  /** ANALYZE: compute per-column NDV distributed, write a Puffin
    * statistics file, register it in metadata (see
    * [[graft.write.TableStats.computeTableStats]]). */
  def computeTableStats(spark: SparkSession, path: String): graft.write.TableStats.Result =
    graft.write.TableStats.computeTableStats(spark, path)

  /** Write + register a spec-schema partition-statistics file (see
    * [[graft.write.TableStats.computePartitionStats]]). */
  def computePartitionStats(spark: SparkSession, path: String): graft.write.TableStats.PartitionStatsResult =
    graft.write.TableStats.computePartitionStats(spark, path)

  /** Orphan-file cleanup (see [[graft.write.Maintenance.removeOrphanFiles]]). */
  def removeOrphanFiles(spark: SparkSession, path: String,
      olderThanMs: Long): graft.write.Maintenance.OrphanResult =
    graft.write.Maintenance.removeOrphanFiles(spark, path, olderThanMs)

  // ---------- ALTER TABLE (schema evolution, metadata-only) ----------

  def addColumn(spark: SparkSession, path: String, name: String, typeString: String,
      initialDefaultJson: Option[String] = None): TableMetadata =
    Evolution.addColumn(spark, path, name, typeString, initialDefaultJson)

  /** ALTER TABLE ... ADD PARTITION FIELD transform(col): partition
    * evolution, metadata-only — old files keep their spec. */
  def addPartitionField(spark: SparkSession, path: String, column: String,
      transform: String = "identity", name: Option[String] = None): TableMetadata =
    Evolution.addPartitionField(spark, path, column, transform, name)

  /** ALTER TABLE ... DROP PARTITION FIELD name. */
  def dropPartitionField(spark: SparkSession, path: String, fieldName: String): TableMetadata =
    Evolution.dropPartitionField(spark, path, fieldName)

  def dropColumn(spark: SparkSession, path: String, name: String): TableMetadata =
    Evolution.dropColumn(spark, path, name)

  def renameColumn(spark: SparkSession, path: String, from: String, to: String): TableMetadata =
    Evolution.renameColumn(spark, path, from, to)

  def setTableProperties(spark: SparkSession, path: String, props: Map[String, String]): TableMetadata =
    Evolution.setProperties(spark, path, props)

  def removeTableProperties(spark: SparkSession, path: String, keys: Seq[String]): TableMetadata =
    Evolution.removeProperties(spark, path, keys)

  // ---------- metadata table functions ----------

  /** `iceberg_snapshots(path)` (reference iceberg_snapshots.cpp:54-137). */
  def snapshots(spark: SparkSession, path: String): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = TableMetadata.load(path, conf)
    val schema = StructType(Seq(
      StructField("sequence_number", LongType),
      StructField("snapshot_id", LongType),
      StructField("timestamp_ms", TimestampType),
      StructField("manifest_list", StringType),
      StructField("operation", StringType)))
    val rows = meta.snapshots.map { s =>
      Row(s.sequenceNumber, s.snapshotId,
        java.time.Instant.ofEpochMilli(s.timestampMs),
        if (s.manifestList.isEmpty) null else s.manifestList, s.operation)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** `refs` metadata table: every named branch / tag and its target. */
  def refs(spark: SparkSession, path: String): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = TableMetadata.load(path, conf)
    val schema = StructType(Seq(
      StructField("name", StringType),
      StructField("type", StringType),
      StructField("snapshot_id", LongType)))
    val rows = meta.refs.toSeq.sortBy(_._1).map { case (n, r) =>
      Row(n, r.refType.toUpperCase, r.snapshotId)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** `history` metadata table: the snapshot-log — when each snapshot became
    * current, and whether it is still an ancestor of the current state
    * (false after a rollback orphans it). */
  def history(spark: SparkSession, path: String): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = TableMetadata.load(path, conf)
    val ancestors = meta.currentSnapshotId.map(meta.ancestorIds).getOrElse(Set.empty)
    val schema = StructType(Seq(
      StructField("made_current_at", TimestampType),
      StructField("snapshot_id", LongType),
      StructField("parent_id", LongType),
      StructField("is_current_ancestor", BooleanType)))
    val rows = meta.snapshotLog.map { case (ts, id) =>
      Row(java.time.Instant.ofEpochMilli(ts), id,
        meta.snapshots.find(_.snapshotId == id).flatMap(_.parentSnapshotId).orNull,
        ancestors.contains(id))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** `iceberg_metadata(path)`: flattened manifest entries
    * (reference iceberg_metadata.cpp:34-201). */
  def manifestEntries(spark: SparkSession, path: String, opts: ReadOptions = ReadOptions()): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = TableMetadata.load(path, conf, opts.metadataVersion, opts.versionNameFormat)
    val snap = meta.selectSnapshot(opts.lookup)
    val schema = StructType(Seq(
      StructField("manifest_path", StringType),
      StructField("manifest_sequence_number", LongType),
      StructField("manifest_content", StringType),
      StructField("status", StringType),
      StructField("content", StringType),
      StructField("file_path", StringType),
      StructField("file_format", StringType),
      StructField("record_count", LongType),
      StructField("file_size_in_bytes", LongType),
      StructField("data_sequence_number", LongType),
      StructField("file_sequence_number", LongType)))
    val rows = snap.toSeq.flatMap { s =>
      val manifests = ManifestIO.manifestsOf(meta, s, conf)
      manifests.flatMap { m =>
        val entries = ManifestIO.readManifest(TableMetadata.resolvePath(meta.location, m.path, conf), conf, m)
        entries.map { e =>
          Row(m.path, m.sequenceNumber, if (m.content == 1) "DELETE" else "DATA",
            e.status match { case 0 => "EXISTING"; case 1 => "ADDED"; case _ => "DELETED" },
            e.dataFile.content match { case 0 => "DATA"; case 1 => "POSITION_DELETES"; case _ => "EQUALITY_DELETES" },
            e.dataFile.filePath, e.dataFile.fileFormat, e.dataFile.recordCount,
            e.dataFile.fileSizeInBytes, e.sequenceNumber.getOrElse(0L), e.fileSequenceNumber.getOrElse(0L))
        }
      }
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Human-readable bound rendering for the stats tables: internal values
    * surface the way the reference prints them (dates as `2024-01-01`, not
    * days-since-epoch; timestamps as `yyyy-MM-dd HH:mm:ss...`). */
  private def renderBound(bytes: Array[Byte], t: graft.core.IcebergType): String = t match {
    // GEOMETRY has no scalar min/max: the Appendix D bbox blob renders as
    // the reference's JSON object — absent Z/M axes (and the reference
    // writer's ±infinity XYM padding) are JSON null
    // (test_geometry_column_stats.test).
    case _: graft.core.IcebergTypes.GeometryT
        if bytes.length % 8 == 0 && bytes.length >= 16 && bytes.length <= 32 =>
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val n = bytes.length / 8
      val x = bb.getDouble(); val y = bb.getDouble()
      val z = if (n >= 3) Some(bb.getDouble()) else None
      val m = if (n == 4) Some(bb.getDouble()) else None
      def j(o: Option[Double]) = o.filterNot(_.isInfinite).map(_.toString).getOrElse("null")
      s"""{"bbox_x":$x,"bbox_y":$y,"bbox_z":${j(z)},"bbox_m":${j(m)}}"""
    case _ =>
      val v = SingleValue.toSparkValue(SingleValue.deserialize(bytes, t), t)
      v match {
        case ldt: java.time.LocalDateTime => ldt.toString.replace('T', ' ')
        case i: java.time.Instant => i.toString.replace('T', ' ').stripSuffix("Z")
        case other => String.valueOf(other)
      }
  }

  /** `iceberg_column_stats(path)` (reference iceberg_column_stats.cpp). */
  def columnStats(spark: SparkSession, path: String, opts: ReadOptions = ReadOptions()): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = TableMetadata.load(path, conf, opts.metadataVersion, opts.versionNameFormat)
    val p = IcebergRead.planWithMetadata(spark, meta, conf, opts)
    val schema = StructType(Seq(
      StructField("file_path", StringType),
      StructField("content", StringType),
      StructField("column_name", StringType),
      StructField("column_type", StringType),
      StructField("lower_bound", StringType),
      StructField("upper_bound", StringType),
      StructField("column_size", LongType),
      StructField("value_count", LongType),
      StructField("null_value_count", LongType),
      StructField("nan_value_count", LongType),
      StructField("file_sequence_number", LongType)))
    val rows = (p.dataFiles ++ p.deleteFiles).flatMap { pf =>
      val ids = (pf.info.valueCounts.keySet ++ pf.info.lowerBounds.keySet ++ pf.info.columnSizes.keySet).toSeq.sorted
      ids.flatMap { id =>
        p.schema.idToField.get(id).map { f =>
          def b(m: Map[Int, Array[Byte]]): String =
            m.get(id).map(bytes => renderBound(bytes, f.fieldType)).orNull
          Row(pf.recordedPath,
            pf.info.content match { case 0 => "DATA"; case 1 => "POSITION_DELETES"; case _ => "EQUALITY_DELETES" },
            f.name, f.fieldType.typeJsonString,
            b(pf.info.lowerBounds), b(pf.info.upperBounds),
            pf.info.columnSizes.get(id).map(Long.box).orNull,
            pf.info.valueCounts.get(id).map(Long.box).orNull,
            pf.info.nullValueCounts.get(id).map(Long.box).orNull,
            pf.info.nanValueCounts.get(id).map(Long.box).orNull,
            pf.dataSeq)
        }
      }
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** `iceberg_partition_stats(path)` (reference iceberg_partition_stats.cpp). */
  def partitionStats(spark: SparkSession, path: String): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = TableMetadata.load(path, conf)
    val schema = StructType(Seq(
      StructField("manifest_path", StringType),
      StructField("manifest_content", StringType),
      StructField("added_snapshot_id", LongType),
      StructField("partition_spec_id", IntegerType),
      StructField("partition_field_name", StringType),
      StructField("partition_field_id", IntegerType),
      StructField("contains_null", BooleanType),
      StructField("lower_bound", StringType),
      StructField("upper_bound", StringType)))
    val rows = meta.currentSnapshot.toSeq.flatMap { s =>
      val manifests = ManifestIO.manifestsOf(meta, s, conf)
      manifests.flatMap { m =>
        val spec = meta.spec(m.partitionSpecId)
        val sch = meta.currentSchema
        m.partitions.zipWithIndex.flatMap { case (summ, i) =>
          spec.fields.lift(i).map { pf =>
            val t = sch.idToField.get(pf.sourceId).map(f => pf.transform.resultType(f.fieldType))
            def b(x: Option[Array[Byte]]): String =
              (for (tt <- t; bytes <- x) yield renderBound(bytes, tt)).orNull
            Row(m.path, if (m.content == 1) "DELETE" else "DATA", m.addedSnapshotId,
              m.partitionSpecId, pf.name, pf.fieldId, summ.containsNull,
              b(summ.lowerBound), b(summ.upperBound))
          }
        }
      }
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** `<table>.files` metadata table (the Iceberg-Spark convention): one row
    * per live file in the current snapshot, data and delete files alike.
    * Partition values render as a `name=value` string — stable across
    * partition specs. */
  def files(spark: SparkSession, path: String, opts: ReadOptions = ReadOptions()): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = TableMetadata.load(path, conf, opts.metadataVersion, opts.versionNameFormat)
    val p = IcebergRead.planWithMetadata(spark, meta, conf, opts)
    val schema = StructType(Seq(
      StructField("content", IntegerType),
      StructField("file_path", StringType),
      StructField("file_format", StringType),
      StructField("spec_id", IntegerType),
      StructField("partition", StringType),
      StructField("record_count", LongType),
      StructField("file_size_in_bytes", LongType),
      StructField("data_sequence_number", LongType),
      StructField("sort_order_id", IntegerType)))
    val rows = (p.dataFiles ++ p.deleteFiles).map { pf =>
      Row(pf.info.content, pf.recordedPath, pf.info.fileFormat, pf.specId,
        partitionString(meta, pf.specId, pf.info.partitionValues),
        pf.info.recordCount, pf.info.fileSizeInBytes, pf.dataSeq,
        pf.info.sortOrderId.map(Int.box).orNull)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** `<table>.manifests` metadata table: one row per manifest in the
    * current snapshot's manifest list. */
  def manifests(spark: SparkSession, path: String): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = TableMetadata.load(path, conf)
    val schema = StructType(Seq(
      StructField("path", StringType),
      StructField("length", LongType),
      StructField("partition_spec_id", IntegerType),
      StructField("content", IntegerType),
      StructField("sequence_number", LongType),
      StructField("min_sequence_number", LongType),
      StructField("added_snapshot_id", LongType),
      StructField("added_data_files_count", IntegerType),
      StructField("existing_data_files_count", IntegerType),
      StructField("deleted_data_files_count", IntegerType),
      StructField("added_rows_count", LongType),
      StructField("existing_rows_count", LongType),
      StructField("deleted_rows_count", LongType)))
    val rows = meta.currentSnapshot.toSeq.flatMap { s =>
      ManifestIO.manifestsOf(meta, s, conf).map { m =>
        Row(m.path, m.length, m.partitionSpecId, m.content,
          m.sequenceNumber, m.minSequenceNumber, m.addedSnapshotId,
          m.addedFilesCount, m.existingFilesCount, m.deletedFilesCount,
          m.addedRowsCount, m.existingRowsCount, m.deletedRowsCount)
      }
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** `<table>.partitions` metadata table: per live partition, file/row
    * counts and byte totals split by content kind. */
  def partitions(spark: SparkSession, path: String, opts: ReadOptions = ReadOptions()): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = TableMetadata.load(path, conf, opts.metadataVersion, opts.versionNameFormat)
    val p = IcebergRead.planWithMetadata(spark, meta, conf, opts)
    val schema = StructType(Seq(
      StructField("partition", StringType),
      StructField("spec_id", IntegerType),
      StructField("record_count", LongType),
      StructField("file_count", IntegerType),
      StructField("total_data_file_size_in_bytes", LongType),
      StructField("position_delete_file_count", IntegerType),
      StructField("equality_delete_file_count", IntegerType)))
    val byPart = (p.dataFiles ++ p.deleteFiles)
      .groupBy(pf => (pf.specId, partitionString(meta, pf.specId, pf.info.partitionValues)))
    val rows = byPart.toSeq.sortBy(_._1._2).map { case ((specId, part), fs) =>
      val data = fs.filter(_.info.content == graft.manifest.FileContent.Data)
      Row(part, specId,
        data.map(_.info.recordCount).sum, data.size,
        data.map(_.info.fileSizeInBytes).sum,
        fs.count(_.info.content == graft.manifest.FileContent.PositionDeletes),
        fs.count(_.info.content == graft.manifest.FileContent.EqualityDeletes))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Partition tuple as `name=value/...` under its spec (empty string for
    * unpartitioned files). */
  private def partitionString(meta: graft.core.TableMetadata, specId: Int,
      values: Seq[Any]): String = {
    val spec = meta.spec(specId)
    spec.fields.zip(values).map { case (pf, v) =>
      val sch = meta.currentSchema
      val rendered = v match {
        case null => "null"
        case b: Array[Byte] =>
          val t = sch.idToField.get(pf.sourceId).map(f => pf.transform.resultType(f.fieldType))
          t.map(tt => graft.read.Pruning.convertPartitionValue(b, tt)) match {
            case Some(v) if !v.isInstanceOf[Array[Byte]] => String.valueOf(v)
            case _ => java.util.Base64.getEncoder.encodeToString(b)
          }
        case other => String.valueOf(other)
      }
      s"${pf.name}=$rendered"
    }.mkString("/")
  }

  /** `iceberg_load_table_response(json)`: parse a REST LoadTableResult into
    * rows — the debug surface for catalog responses (reference
    * iceberg_load_table_response.cpp:68-248). */
  def loadTableResponse(spark: SparkSession, json: String): DataFrame = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val metaNode = node.get("metadata")
    val meta = TableMetadata.parseNode(metaNode, None)
    val schema = StructType(Seq(
      StructField("metadata_location", StringType),
      StructField("table_uuid", StringType),
      StructField("format_version", IntegerType),
      StructField("location", StringType),
      StructField("current_snapshot_id", LongType),
      StructField("current_schema_id", IntegerType),
      StructField("schema_json", StringType),
      StructField("config_key", StringType),
      StructField("config_value", StringType)))
    val cfg: Seq[(String, String)] = Option(node.get("config")).map { c =>
      val it = c.properties().iterator()
      val b = Seq.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue.asText()) }
      b.result()
    }.getOrElse(Nil)
    val base = (Option(node.get("metadata-location")).map(_.asText()).orNull,
      meta.tableUuid, meta.formatVersion, meta.location,
      meta.currentSnapshotId.map(Long.box).orNull,
      meta.currentSchemaId, meta.currentSchema.toJson.toString)
    val rows = if (cfg.isEmpty) Seq(Row(base._1, base._2, base._3, base._4, base._5, base._6, base._7, null, null))
    else cfg.map { case (k, v) => Row(base._1, base._2, base._3, base._4, base._5, base._6, base._7, k, v) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Table properties as a DataFrame (reference
    * iceberg_table_properties_functions.cpp). */
  def tableProperties(spark: SparkSession, path: String): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = TableMetadata.load(path, conf)
    val schema = StructType(Seq(StructField("key", StringType), StructField("value", StringType)))
    val rows = meta.properties.toSeq.sortBy(_._1).map { case (k, v) => Row(k, v) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }
}
