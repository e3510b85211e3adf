package graft.write

import graft.core.{SnapshotInfo, TableMetadata}
import graft.manifest.{ManifestFile, ManifestIO}
import graft.read.IcebergRead.parMap
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/**
 * Table maintenance beyond compaction: snapshot expiration and orphan-file
 * cleanup. The reference ships only `iceberg_rewrite_data_files`
 * (src/maintenance/); these two complete the storage-reclamation story a
 * long-lived 100 TB table needs — every DML/streaming commit adds a
 * snapshot + manifests, and without expiration metadata and storage grow
 * without bound.
 *
 * Scale shape: reachability is computed at MANIFEST granularity first
 * (snapshot -> manifest-list -> manifest paths, metadata-only), and only
 * manifests exclusive to expired snapshots are ever opened — expiring 10
 * old snapshots of a 100 TB table reads the few manifests those snapshots
 * stopped sharing with the survivors, not the table. Manifest IO uses the
 * same bounded thread pool as the read path. On a cluster the final
 * candidate-vs-surviving anti-join can be lifted to a Dataset join; the
 * sets involved are file COUNTS (metadata), not file bytes.
 */
object Maintenance {

  /** What [[expireSnapshots]] did. `meta` is post-commit metadata
    * (unchanged if nothing expired). */
  case class ExpireResult(meta: TableMetadata, expiredSnapshots: Long,
      deletedDataFiles: Long, deletedDeleteFiles: Long,
      deletedManifests: Long, deletedManifestLists: Long)

  /** Expire snapshots older than `olderThanMs` (None = every snapshot not
    * otherwise retained), always keeping: the current snapshot, every
    * ref target (branches/tags), and the `retainLast` most recent
    * snapshots. Physical files (data / delete / manifest / manifest-list)
    * are deleted only when no surviving snapshot can reach them; the
    * trimmed metadata commits as the next metadata version, so concurrent
    * writers collide-and-retry exactly like DML commits. Time travel to an
    * expired snapshot fails cleanly afterwards (the snapshot is gone from
    * metadata). */
  def expireSnapshots(spark: SparkSession, path: String,
      olderThanMs: Option[Long] = None, retainLast: Int = 1): ExpireResult = {
    require(retainLast >= 1, s"retain_last must be >= 1, got $retainLast")
    val conf = spark.sessionState.newHadoopConf()
    val meta = TableMetadata.load(path, conf)
    if (meta.snapshots.isEmpty) return ExpireResult(meta, 0, 0, 0, 0, 0)

    val newestFirst = meta.snapshots.sortBy(s => (-s.timestampMs, -s.sequenceNumber))
    val keepIds: Set[Long] =
      newestFirst.take(retainLast).map(_.snapshotId).toSet ++
        meta.currentSnapshotId.toSet ++ meta.refs.values.map(_.snapshotId).toSet ++
        olderThanMs.map(cut =>
          meta.snapshots.filter(_.timestampMs >= cut).map(_.snapshotId).toSet)
          .getOrElse(Set.empty[Long])
    val (keep, expired) = meta.snapshots.partition(s => keepIds.contains(s.snapshotId))
    if (expired.isEmpty) return ExpireResult(meta, 0, 0, 0, 0, 0)

    // Manifest-level reachability (metadata-only: reads manifest LISTS).
    val keepManifests = distinctByPath(
      parMap(keep)(s => ManifestIO.manifestsOf(meta, s, conf)).flatten)
    val keepManifestPaths = keepManifests.map(_.path).toSet
    val candManifests = distinctByPath(
      parMap(expired)(s => ManifestIO.manifestsOf(meta, s, conf)).flatten)
      .filterNot(m => keepManifestPaths.contains(m.path))

    // File-level reachability: open only the expired-exclusive manifests,
    // plus the surviving manifests needed to protect shared files. Any
    // recorded path (regardless of entry status) in a surviving manifest
    // survives — never delete a physically referenced file.
    val keepFilePaths = parMap(keepManifests)(m => entryPaths(meta, m, conf))
      .flatten.toSet
    val candFiles = parMap(candManifests) { m =>
      entryPaths(meta, m, conf).map(p => (p, m.content))
    }.flatten.distinctBy(_._1).filterNot(p => keepFilePaths.contains(p._1))

    val fsys = TableMetadata.fs(meta.location, conf)
    def rm(recorded: String): Unit = {
      try fsys.delete(new Path(TableMetadata.resolvePath(meta.location, recorded, conf)), false)
      catch { case _: Exception => () } // best-effort: metadata commit is the source of truth
    }
    candFiles.foreach(p => rm(p._1))
    candManifests.foreach(m => rm(m.path))
    val keepLists = keep.flatMap(s => Option(s.manifestList)).toSet
    val deadLists = expired.flatMap(s => Option(s.manifestList))
      .distinct.filterNot(keepLists.contains)
    deadLists.foreach(rm)

    val keptIds = keep.map(_.snapshotId).toSet
    // Statistics files ride with their snapshot: expire the entry and
    // delete the Puffin file when its snapshot goes.
    val (keepStats, deadStats) = meta.statistics.partition(s => keptIds.contains(s.snapshotId))
    deadStats.foreach(s => rm(s.path))
    val (keepPartStats, deadPartStats) =
      meta.partitionStatistics.partition(s => keptIds.contains(s.snapshotId))
    deadPartStats.foreach(s => rm(s.path))
    val trimmed = meta.copy(
      snapshots = keep,
      snapshotLog = meta.snapshotLog.filter { case (_, id) => keptIds.contains(id) },
      statistics = keepStats,
      partitionStatistics = keepPartStats,
      lastUpdatedMs = System.currentTimeMillis())
    val committed = IcebergWrite.commitMetadataNextVersion(trimmed, conf)
    val (deadDeletes, deadData) = candFiles.partition(_._2 == 1)
    ExpireResult(committed, expired.size, deadData.size, deadDeletes.size,
      candManifests.size, deadLists.size)
  }

  /** What [[removeOrphanFiles]] did. */
  case class OrphanResult(orphanFiles: Long, deletedPaths: Seq[String])

  /** Delete files under the table's data directory that no snapshot
    * references and that are older than `olderThanMs`. The age cutoff is
    * the safety net for in-flight commits: an uncommitted writer's staged
    * data files look orphaned until its snapshot publishes, so callers
    * should keep the cutoff comfortably older than any running write (the
    * SQL procedure defaults to now - 3 days, the conventional grace).
    *
    * Local-mode shape: the directory listing and anti-join run driver-side;
    * on a cluster both sides become Datasets (listing fanned out
    * per-partition-dir, manifest entries from the metadata pool) and the
    * anti-join distributes. The referenced set is built from ALL snapshots,
    * so expiration state never affects safety. */
  def removeOrphanFiles(spark: SparkSession, path: String,
      olderThanMs: Long): OrphanResult = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = TableMetadata.load(path, conf)
    val allManifests = distinctByPath(
      parMap(meta.snapshots)(s => ManifestIO.manifestsOf(meta, s, conf)).flatten)
    def canon(p: String): String =
      new Path(TableMetadata.resolvePath(meta.location, p, conf)).toUri.getPath
    val referenced: Set[String] =
      parMap(allManifests)(m => entryPaths(meta, m, conf)).flatten.map(canon).toSet ++
        allManifests.map(m => canon(m.path)) ++
        meta.snapshots.flatMap(s => Option(s.manifestList)).map(canon)

    val dataDir = new Path(meta.location, "data")
    val fsys = TableMetadata.fs(meta.location, conf)
    if (!fsys.exists(dataDir)) return OrphanResult(0, Nil)
    val it = fsys.listFiles(dataDir, true)
    val orphans = Seq.newBuilder[String]
    while (it.hasNext) {
      val st = it.next()
      val p = st.getPath.toUri.getPath
      // Hidden files ('.'/'_' prefix: Hadoop .crc siblings, _SUCCESS
      // markers) are infrastructure, not data — never treat them as
      // orphans (recursive listings bypass the checksum-file filter).
      val hidden = st.getPath.getName.startsWith(".") || st.getPath.getName.startsWith("_")
      if (st.isFile && !hidden && st.getModificationTime < olderThanMs &&
          !referenced.contains(p))
        orphans += p
    }
    val dead = orphans.result()
    dead.foreach(p => try fsys.delete(new Path(p), false) catch { case _: Exception => () })
    OrphanResult(dead.size, dead)
  }

  /** What [[rewriteManifests]] did. */
  case class RewriteManifestsResult(meta: TableMetadata,
      rewrittenManifests: Int, addedManifests: Int)

  /** Standalone manifest compaction (the `rewrite_manifests` procedure):
    * bin-pack the CURRENT snapshot's data manifests to
    * `commit.manifest.target-size-bytes` (or `targetSizeBytes`) and commit
    * the result as one metadata-only REPLACE snapshot. Entries keep their
    * original explicit sequence numbers; merged manifests carry real
    * partition-bound summaries so manifest-level pruning keeps working.
    *
    * This is the planning-cost lever for a long-lived 100 TB table:
    * thousands of per-commit micro-manifests become a handful of
    * target-sized ones, and every subsequent query's driver-side planning
    * reads those instead (the same cost the 300-manifest planning probe
    * measures). Row data never moves; the commit is invisible to the CDC
    * changelog (operation 'replace'). */
  def rewriteManifests(spark: SparkSession, path: String,
      targetSizeBytes: Option[Long] = None): RewriteManifestsResult = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = TableMetadata.load(path, conf)
    val snap = meta.currentSnapshot.getOrElse(
      return RewriteManifestsResult(meta, 0, 0))
    val manifests = ManifestIO.manifestsOf(meta, snap, conf)
    val target = targetSizeBytes
      .orElse(meta.properties.get(graft.manifest.ManifestMerge.TargetSizeProp)
        .flatMap(_.toLongOption).filter(_ > 0))
      .getOrElse(graft.manifest.ManifestMerge.DefaultTargetSize)
    val (merged, rewritten, created) =
      graft.manifest.ManifestMerge.binPack(meta, manifests, conf, target)
    if (rewritten == 0) return RewriteManifestsResult(meta, 0, 0)

    val snapshotId = IcebergWrite.newSnapshotId()
    val seq = meta.lastSequenceNumber + 1
    val listPath = s"${meta.location}/metadata/snap-$snapshotId-rwm.avro"
    ManifestIO.writeManifestList(listPath, conf, merged,
      formatVersion = meta.formatVersion)
    val totalRecords = merged.filter(_.content == 0).map(_.liveRowsCount).sum
    val snapshot = SnapshotInfo(
      snapshotId = snapshotId,
      parentSnapshotId = Some(snap.snapshotId),
      sequenceNumber = seq,
      timestampMs = System.currentTimeMillis(),
      manifestList = listPath,
      summary = Map(
        "operation" -> "replace",
        "manifests-replaced" -> rewritten.toString,
        "manifests-created" -> created.toString,
        "total-records" -> totalRecords.toString),
      schemaId = Some(meta.currentSchemaId))
    val newMeta = meta.copy(
      currentSnapshotId = Some(snapshotId),
      snapshots = meta.snapshots :+ snapshot,
      lastSequenceNumber = seq,
      lastUpdatedMs = snapshot.timestampMs,
      snapshotLog = meta.snapshotLog :+ ((snapshot.timestampMs, snapshotId)),
      refs = meta.refs + ("main" -> graft.core.SnapshotRef(snapshotId, isBranch = true)))
    RewriteManifestsResult(
      IcebergWrite.commitMetadataNextVersion(newMeta, conf), rewritten, created)
  }

  private def distinctByPath(ms: Seq[ManifestFile]): Seq[ManifestFile] =
    ms.distinctBy(_.path)

  /** Every file path recorded in a manifest, any entry status. */
  private def entryPaths(meta: TableMetadata, m: ManifestFile,
      conf: Configuration): Seq[String] = {
    val resolved = TableMetadata.resolvePath(meta.location, m.path, conf)
    ManifestIO.readManifest(resolved, conf, m).map(_.dataFile.filePath)
  }
}
