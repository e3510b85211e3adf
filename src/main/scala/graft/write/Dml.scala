package graft.write

import graft.core._
import graft.manifest._
import graft.read.{IcebergRead, ReadOptions}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.util.UUID

/**
 * Row-level DML: merge-on-read DELETE, UPDATE (delete + insert in one
 * OVERWRITE snapshot), MERGE INTO (join-based), CTAS, and
 * rewrite_data_files compaction.
 *
 * (reference: src/execution/operator/iceberg_delete.cpp:34-298 MoR delete
 * writing positional-delete parquet; iceberg_update.cpp:46-245 delete+insert
 * single snapshot; merge_into/iceberg_merge_into.cpp:134-295 full
 * WHEN MATCHED/NOT MATCHED semantics; iceberg_insert.cpp:871-986 CTAS;
 * src/maintenance/rewrite_data_files_planner.cpp:45-150 compaction.)
 *
 * Scale notes: matched row positions flow executor-side from the scan's
 * `_metadata` columns into a partitioned parquet write of delete files —
 * the driver never collects row positions. The join in MERGE is a plain
 * Spark join (broadcast if the source is small, shuffle otherwise).
 */
object Dml {
  private val PosDeletePathFieldId = 2147483546
  private val PosDeletePosFieldId = 2147483545

  private def fieldMeta(id: Int): Metadata =
    new MetadataBuilder().putLong("parquet.field.id", id.toLong).build()

  /** Pseudo-schema for positional delete files — gives FooterStats the
    * field-id keys so file_path bounds land in the manifest (powers the
    * reference's 365->1 delete-file pruning). */
  private val deleteFileSchema = IcebergSchema(0, IcebergTypes.StructT(Seq(
    IcebergTypes.NestedField(PosDeletePathFieldId, "file_path", required = true, IcebergTypes.StringT),
    IcebergTypes.NestedField(PosDeletePosFieldId, "pos", required = true, IcebergTypes.LongT))))

  private def normPath(c: Column): Column = regexp_replace(c, "^file:/+", "/")

  /** Write positional-delete parquet files for the matched row positions and
    * return their manifest entries. `matched` must have `_g_path`/`_g_pos`. */
  private def writePositionDeletes(spark: SparkSession, meta: TableMetadata,
      matched: DataFrame): Seq[ManifestEntry] = {
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val p = IcebergRead.planWithMetadata(spark, meta, conf, ReadOptions())
    // Partition index: assign each distinct partition tuple of TARGET data
    // files a stable integer key; delete files inherit the target partition.
    val partTuples = p.dataFiles.map(f => f.info.partitionValues).distinct.zipWithIndex.toMap
    val fileInfo = p.dataFiles.map { f =>
      (normStr(f.resolvedPath), f.recordedPath, partTuples(f.info.partitionValues))
    }.toDF("_m_path", "_m_recorded", "_m_pk")

    val staging = s"${meta.location}/data/${UUID.randomUUID().toString}-deletes"
    val dels = matched
      .select(normPath(col("_g_path")).as("_j_path"), col("_g_pos").as("pos"))
      .join(broadcast(fileInfo), col("_j_path") === col("_m_path"))
      .select(col("_m_recorded").as("file_path", fieldMeta(PosDeletePathFieldId)),
        col("pos").cast("long").as("pos", fieldMeta(PosDeletePosFieldId)),
        col("_m_pk").as("_pk"))
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    dels.repartition(col("_pk")).sortWithinPartitions("file_path", "pos")
      .write.partitionBy("_pk").parquet(staging)

    val fsys = TableMetadata.fs(staging, conf)
    val indexToTuple = partTuples.map(_.swap)
    val files = {
      val out = Seq.newBuilder[org.apache.hadoop.fs.FileStatus]
      val it = fsys.listFiles(new Path(staging), true)
      while (it.hasNext) { val st = it.next(); if (st.getPath.getName.endsWith(".parquet")) out += st }
      out.result()
    }
    files.map { st =>
      val rel = st.getPath.toString
      val pkSeg = rel.split("/").find(_.startsWith("_pk=")).map(_.stripPrefix("_pk=").toInt)
        .getOrElse(throw new IllegalStateException(s"No _pk dir in $rel"))
      val stats = FooterStats.read(st.getPath, conf, deleteFileSchema)
      ManifestEntry(EntryStatus.Added, None, None, None, DataFileInfo(
        content = FileContent.PositionDeletes,
        filePath = st.getPath.toString,
        fileFormat = "parquet",
        partitionValues = indexToTuple(pkSeg),
        recordCount = stats.recordCount,
        fileSizeInBytes = st.getLen,
        columnSizes = stats.columnSizes,
        valueCounts = stats.valueCounts,
        nullValueCounts = stats.nullCounts,
        nanValueCounts = Map.empty,
        lowerBounds = stats.lowerBounds,
        upperBounds = stats.upperBounds,
        splitOffsets = stats.splitOffsets,
        equalityIds = Nil,
        sortOrderId = None))
    }
  }

  private def normStr(s: String): String = s.replaceFirst("^file:/+", "/")

  /** DELETE FROM table WHERE cond — merge-on-read. v2 tables write
    * positional-delete parquet; v3 tables write Puffin deletion vectors
    * (reference iceberg_delete.cpp:165-208 DV write, 210-298 positional). */
  def delete(spark: SparkSession, path: String, condSql: String): TableMetadata = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = TableMetadata.load(path, conf)
    val matched = IcebergRead.loadWithMetadata(spark, meta, conf,
      ReadOptions(filterSql = Some(condSql), keepFileMeta = true))
      .select("_g_path", "_g_pos")
    val entries =
      if (meta.formatVersion >= 3) writeDeletionVectors(spark, meta, matched)
      else writePositionDeletes(spark, meta, matched)
    if (entries.isEmpty) meta
    else IcebergWrite.commitSnapshot(meta, Nil, entries, "delete", conf)
  }

  /** v3 deletion vectors: one roaring bitmap per affected data file, built
    * on EXECUTORS (groupByKey over matched positions), packed into a single
    * Puffin file; only the compact serialized bitmaps travel to the driver. */
  private def writeDeletionVectors(spark: SparkSession, meta: TableMetadata,
      matched: DataFrame): Seq[ManifestEntry] = {
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val p = IcebergRead.planWithMetadata(spark, meta, conf, ReadOptions())
    val partTuples = p.dataFiles.map(f => f.info.partitionValues).distinct.zipWithIndex.toMap
    val fileInfo = p.dataFiles.map { f =>
      (normStr(f.resolvedPath), f.recordedPath, partTuples(f.info.partitionValues))
    }.toDF("_m_path", "_m_recorded", "_m_pk")
    val rows = matched
      .select(normPath(col("_g_path")).as("_j_path"), col("_g_pos").cast("long").as("pos"))
      .join(broadcast(fileInfo), col("_j_path") === col("_m_path"))
      .select(col("_m_recorded").as("recorded"), col("pos"), col("_m_pk").as("pk"))
      .as[(String, Long, Int)]
    val dvs: Seq[(String, Array[Byte], Long, Int)] = rows.groupByKey(_._1)
      .mapGroups { (recorded, it) =>
        val bm = new org.roaringbitmap.longlong.Roaring64NavigableMap()
        var pk = 0
        var card = 0L
        it.foreach { case (_, pos, k) => bm.addLong(pos); pk = k; card += 1 }
        bm.runOptimize()
        val baos = new java.io.ByteArrayOutputStream()
        bm.serializePortable(new java.io.DataOutputStream(baos))
        (recorded, baos.toByteArray, bm.getLongCardinality, pk)
      }.collect().toSeq
    if (dvs.isEmpty) return Nil
    val puffinPath = s"${meta.location}/data/${UUID.randomUUID().toString}-deletes.puffin"
    val blobs = graft.read.Puffin.writeDeletionVectors(puffinPath, conf,
      dvs.map(d => (d._1, d._2, d._3)))
    val fileLen = TableMetadata.fs(puffinPath, conf)
      .getFileStatus(new Path(puffinPath)).getLen
    val indexToTuple = partTuples.map(_.swap)
    blobs.zip(dvs).map { case (b, (_, _, _, pk)) =>
      ManifestEntry(EntryStatus.Added, None, None, None, DataFileInfo(
        content = FileContent.PositionDeletes,
        filePath = puffinPath,
        fileFormat = "puffin",
        partitionValues = indexToTuple(pk),
        recordCount = b.cardinality,
        fileSizeInBytes = fileLen,
        columnSizes = Map.empty, valueCounts = Map.empty,
        nullValueCounts = Map.empty, nanValueCounts = Map.empty,
        lowerBounds = Map.empty, upperBounds = Map.empty,
        splitOffsets = Nil, equalityIds = Nil, sortOrderId = None,
        referencedDataFile = Some(b.referencedDataFile),
        contentOffset = Some(b.offset),
        contentSizeInBytes = Some(b.length)))
    }
  }

  /** Equality-delete write: delete every row whose key columns match a row
    * of `keys` (reference equality_delete_helpers.cpp:41-80 — the
    * pure-equality-conjunction WHERE path). The delete file is written
    * "global" (all-null partition tuple applies to every partition). */
  def deleteEquality(spark: SparkSession, path: String, keys: DataFrame): TableMetadata = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = TableMetadata.load(path, conf)
    val schema = meta.currentSchema
    val eqFields = keys.schema.fieldNames.toSeq.map { n =>
      schema.fields.find(_.name == n)
        .getOrElse(throw new IllegalArgumentException(s"Unknown delete key column $n"))
    }
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    val staging = s"${meta.location}/data/${UUID.randomUUID().toString}-eqdel"
    val out = keys.select(eqFields.map(f =>
      col(f.name).cast(f.fieldType.toSpark).as(f.name, fieldMeta(f.id))).toIndexedSeq: _*)
      .dropDuplicates(eqFields.map(_.name))
    out.coalesce(1).write.parquet(staging)
    val fsys = TableMetadata.fs(staging, conf)
    val pseudoSchema = IcebergSchema(0, IcebergTypes.StructT(eqFields))
    val files = {
      val b = Seq.newBuilder[org.apache.hadoop.fs.FileStatus]
      val it = fsys.listFiles(new Path(staging), true)
      while (it.hasNext) { val st = it.next(); if (st.getPath.getName.endsWith(".parquet")) b += st }
      b.result()
    }
    val spec = meta.defaultSpec
    val entries = files.map { st =>
      val stats = FooterStats.read(st.getPath, conf, pseudoSchema)
      ManifestEntry(EntryStatus.Added, None, None, None, DataFileInfo(
        content = FileContent.EqualityDeletes,
        filePath = st.getPath.toString,
        fileFormat = "parquet",
        partitionValues = spec.fields.map(_ => null),
        recordCount = stats.recordCount,
        fileSizeInBytes = st.getLen,
        columnSizes = stats.columnSizes,
        valueCounts = stats.valueCounts,
        nullValueCounts = stats.nullCounts,
        nanValueCounts = Map.empty,
        lowerBounds = stats.lowerBounds,
        upperBounds = stats.upperBounds,
        splitOffsets = stats.splitOffsets,
        equalityIds = eqFields.map(_.id),
        sortOrderId = None))
    }
    if (entries.isEmpty) meta
    else IcebergWrite.commitSnapshot(meta, Nil, entries, "delete", conf)
  }

  /** UPDATE table SET col=expr... WHERE cond — MoR delete + re-insert of
    * updated rows, one OVERWRITE snapshot. */
  def update(spark: SparkSession, path: String, condSql: String,
      set: Map[String, String]): TableMetadata = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = TableMetadata.load(path, conf)
    val schema = meta.currentSchema
    val matched = IcebergRead.loadWithMetadata(spark, meta, conf,
      ReadOptions(filterSql = Some(condSql), keepFileMeta = true)).cache()
    try {
      val delEntries = writePositionDeletes(spark, meta, matched.select("_g_path", "_g_pos"))
      if (delEntries.isEmpty) return meta
      val updated = matched.select(schema.fields.map { f =>
        set.get(f.name).map(e => expr(e).cast(f.fieldType.toSpark).as(f.name)).getOrElse(col(f.name))
      }.toIndexedSeq: _*)
      val (dataEntries, _) = IcebergWrite.writeDataFiles(updated, meta, conf)
      IcebergWrite.commitSnapshot(meta, dataEntries, delEntries, "overwrite", conf)
    } finally matched.unpersist()
  }

  /** MERGE INTO actions. `update`: target-col -> SQL expr over `s.*`/`t.*`;
    * `insert`: target-col -> SQL expr over `s.*` (None = no insert clause;
    * insertAll maps source columns by name). */
  case class MergeActions(
      matchedUpdate: Option[Map[String, String]] = None,
      matchedDelete: Boolean = false,
      insert: Option[Map[String, String]] = None,
      insertAll: Boolean = false,
      errorOnMultipleMatches: Boolean = true)

  /** MERGE INTO target t USING source s ON cond — join-based MoR merge
    * producing one OVERWRITE snapshot. */
  def merge(spark: SparkSession, path: String, source: DataFrame, onCond: String,
      actions: MergeActions): TableMetadata = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = TableMetadata.load(path, conf)
    val schema = meta.currentSchema
    val target = IcebergRead.loadWithMetadata(spark, meta, conf,
      ReadOptions(keepFileMeta = true))

    val t = target.alias("t")
    val s = source.alias("s")
    val joined = t.join(s, expr(onCond), "inner").cache()
    try {
      // WHEN MATCHED ... multiple source matches for one target row is an
      // error (match-once semantics, as PhysicalMergeInto enforces).
      if (actions.errorOnMultipleMatches && (actions.matchedUpdate.isDefined || actions.matchedDelete)) {
        val dup = joined.groupBy(col("t._g_path"), col("t._g_pos")).count().filter(col("count") > 1).limit(1).count()
        require(dup == 0, "MERGE: a target row matched multiple source rows")
      }
      val delEntries =
        if (actions.matchedUpdate.isDefined || actions.matchedDelete)
          writePositionDeletes(spark, meta,
            joined.select(col("t._g_path").as("_g_path"), col("t._g_pos").as("_g_pos")))
        else Nil

      val updatedRows: Option[DataFrame] = actions.matchedUpdate.map { set =>
        joined.select(schema.fields.map { f =>
          set.get(f.name).map(e => expr(e).cast(f.fieldType.toSpark).as(f.name))
            .getOrElse(col(s"t.${f.name}"))
        }.toIndexedSeq: _*)
      }
      val insertedRows: Option[DataFrame] = {
        val notMatched = s.join(t, expr(onCond), "left_anti")
        if (actions.insertAll)
          Some(notMatched.select(schema.fields.map(f => col(f.name)).toIndexedSeq: _*))
        else actions.insert.map { ins =>
          notMatched.select(schema.fields.map { f =>
            ins.get(f.name).map(e => expr(e).cast(f.fieldType.toSpark).as(f.name))
              .getOrElse(lit(null).cast(f.fieldType.toSpark).as(f.name))
          }.toIndexedSeq: _*)
        }
      }
      val newRows = (updatedRows.toSeq ++ insertedRows.toSeq).reduceOption(_ unionByName _)
      val dataEntries = newRows.map(df => IcebergWrite.writeDataFiles(df, meta, conf)._1).getOrElse(Nil)
      if (dataEntries.isEmpty && delEntries.isEmpty) meta
      else IcebergWrite.commitSnapshot(meta, dataEntries, delEntries, "overwrite", conf)
    } finally joined.unpersist()
  }

  /** CREATE TABLE AS SELECT. */
  def ctas(df: DataFrame, path: String, opts: TableWriteOptions = TableWriteOptions()): TableMetadata =
    IcebergWrite.writeTable(df, path, opts)

  /** iceberg_rewrite_data_files equivalent: bin-pack undersized files per
    * partition, rewrite each group delete-free, commit a REPLACE snapshot.
    * (reference rewrite_data_files_planner.cpp:45-150 GroupCandidates.) */
  def rewriteDataFiles(spark: SparkSession, path: String,
      targetFileSizeBytes: Long = 512L * 1024 * 1024,
      rewriteAll: Boolean = false): TableMetadata = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = TableMetadata.load(path, conf)
    val p = IcebergRead.planWithMetadata(spark, meta, conf, ReadOptions())

    // Group candidates per partition tuple; a group qualifies when it has
    // >1 undersized file (or rewriteAll), or any file carries deletes.
    val byPartition = p.dataFiles.groupBy(f => (f.specId, f.info.partitionValues))
    val groups = byPartition.values.filter { files =>
      rewriteAll || p.deleteFiles.nonEmpty ||
        files.count(_.info.fileSizeInBytes < targetFileSizeBytes) > 1
    }.toSeq
    if (groups.isEmpty) return meta
    val rewriting = groups.flatten
    val rewritingNorm = rewriting.map(f => normStr(f.resolvedPath)).toSet

    // Read the rows of rewritten groups through the full scan (deletes get
    // merged in), then write fresh files via the normal write path.
    val scan = IcebergRead.loadWithMetadata(spark, meta, conf, ReadOptions(keepFileMeta = true))
    val normUdf = udf((s: String) => normStr(s))
    var rows = scan.filter(normUdf(col("_g_path")).isInCollection(rewritingNorm))
      .drop("_g_path", "_g_pos")
    // Bin toward the target size: one output file per targetFileSizeBytes of
    // input (per-partition layout is re-established by writeDataFiles).
    if (meta.defaultSpec.isUnpartitioned) {
      val totalBytes = rewriting.map(_.info.fileSizeInBytes).sum
      val n = math.max(1L, (totalBytes + targetFileSizeBytes - 1) / targetFileSizeBytes).toInt
      rows = rows.coalesce(n)
    }
    val (dataEntries, _) = IcebergWrite.writeDataFiles(rows, meta, conf)
    // Remove rewritten data files AND all now-dead delete files.
    val removed = rewriting.map(_.recordedPath).toSet ++ p.deleteFiles.map(_.recordedPath).toSet
    IcebergWrite.commitSnapshot(meta, dataEntries, Nil, "replace", conf, removedDataPaths = removed)
  }
}
