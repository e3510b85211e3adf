package graft.manifest

import graft.core._
import org.apache.hadoop.conf.Configuration
import java.util.UUID

/**
 * Commit-time manifest compaction: when a snapshot would carry at least
 * `commit.manifest.min-count-to-merge` data manifests, bin-pack them
 * (first-fit descending from the END of the list, so older manifests merge
 * first) to `commit.manifest.target-size-bytes` and rewrite each multi-
 * manifest bin as one manifest of EXISTING entries — mirrors the Java
 * ManifestMergeManager semantics (reference:
 * src/catalog/rest/api/iceberg_manifest_merge.cpp:25-150).
 */
object ManifestMerge {
  val MinCountProp = "commit.manifest.min-count-to-merge"
  val TargetSizeProp = "commit.manifest.target-size-bytes"
  val DefaultMinCount = 100
  val DefaultTargetSize: Long = 8L * 1024 * 1024

  def maybeMerge(meta: TableMetadata, manifests: Seq[ManifestFile],
      conf: Configuration): Seq[ManifestFile] = {
    val minCount = meta.properties.get(MinCountProp).map(_.toInt).getOrElse(DefaultMinCount)
    val targetSize = meta.properties.get(TargetSizeProp).map(_.toLong).getOrElse(DefaultTargetSize)
    val (data, deletes) = manifests.partition(_.content == 0)
    if (data.size < minCount) return manifests

    // Bin-pack per partition spec, walking from the end (oldest first).
    val out = Seq.newBuilder[ManifestFile]
    data.groupBy(_.partitionSpecId).foreach { case (specId, group) =>
      var bins = Seq.empty[Seq[ManifestFile]]
      group.reverse.foreach { m =>
        bins.indexWhere(b => b.map(_.length).sum + m.length <= targetSize) match {
          case -1 => bins :+= Seq(m)
          case i => bins = bins.updated(i, bins(i) :+ m)
        }
      }
      bins.foreach { bin =>
        if (bin.size == 1) out += bin.head
        else out += mergeBin(meta, specId, bin, conf)
      }
    }
    out.result() ++ deletes
  }

  private def mergeBin(meta: TableMetadata, specId: Int, bin: Seq[ManifestFile],
      conf: Configuration): ManifestFile = {
    val schema = meta.currentSchema
    val spec = meta.spec(specId)
    val partitionFields: Seq[(String, IcebergType, Int)] = spec.fields.map { pf =>
      (pf.name, pf.transform.resultType(schema.idToField(pf.sourceId).fieldType), pf.fieldId)
    }
    // Live entries only, re-marked EXISTING with their original sequence
    // numbers preserved (inheritance resolved at read time).
    val entries = bin.flatMap { m =>
      ManifestIO.readManifest(TableMetadata.resolvePath(meta.location, m.path, conf), conf, m)
        .filter(_.isLive)
        .map(e => e.copy(status = EntryStatus.Existing))
    }
    val mPath = s"${meta.location}/metadata/${UUID.randomUUID().toString}-merged-m0.avro"
    val len = ManifestIO.writeManifest(mPath, conf, partitionFields, entries,
      Map("partition-spec-id" -> specId.toString, "content" -> "data"),
      ManifestIO.manifestCodec(meta))
    ManifestFile(
      path = mPath, length = len, partitionSpecId = specId, content = 0,
      sequenceNumber = bin.map(_.sequenceNumber).max,
      minSequenceNumber = bin.map(_.minSequenceNumber).min,
      addedSnapshotId = bin.map(_.addedSnapshotId).max,
      addedFilesCount = 0,
      existingFilesCount = entries.size,
      deletedFilesCount = 0,
      addedRowsCount = 0L,
      existingRowsCount = entries.map(_.dataFile.recordCount).sum,
      deletedRowsCount = 0L,
      partitions = Nil)
  }
}
