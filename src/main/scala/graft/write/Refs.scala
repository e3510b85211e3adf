package graft.write

import graft.core.{SnapshotRef, TableMetadata}
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession

/**
 * Snapshot-reference (branch / tag) and snapshot-pointer management —
 * metadata-only commits, same optimistic next-version publish as DML.
 *
 * Beyond the reference's surface (it reads whatever snapshot the catalog
 * serves); the operations mirror the Iceberg spec's `refs` map and the
 * standard maintenance procedures (rollback_to_snapshot,
 * set_current_snapshot, fast_forward). Branches enable write-audit-publish:
 * append to a branch (IcebergWrite.append(..., toBranch)), audit it via a
 * `VERSION AS OF 'branch'` read, then fast-forward main — the audit
 * workload never sees unpublished rows.
 */
object Refs {

  private def commit(meta: TableMetadata, conf: Configuration): TableMetadata =
    IcebergWrite.commitMetadataNextVersion(
      meta.copy(lastUpdatedMs = System.currentTimeMillis()), conf)

  private def load(spark: SparkSession, path: String): (TableMetadata, Configuration) = {
    val conf = spark.sessionState.newHadoopConf()
    (TableMetadata.load(path, conf), conf)
  }

  /** Create (or with `replace=true`, move) a branch or tag. Defaults to the
    * current snapshot. Tags on the same snapshot as a branch are fine —
    * refs are just named pointers. */
  def createRef(spark: SparkSession, path: String, name: String, isBranch: Boolean,
      snapshotId: Option[Long] = None, replace: Boolean = false): TableMetadata = {
    val (meta, conf) = load(spark, path)
    require(name != "main" || isBranch, "'main' is reserved for the main branch")
    if (!replace) require(!meta.refs.contains(name),
      s"Ref '$name' already exists (use replace to move it)")
    val target = snapshotId.orElse(meta.currentSnapshotId).getOrElse(
      throw new IllegalArgumentException("Table has no snapshot to reference"))
    require(meta.snapshots.exists(_.snapshotId == target), s"Snapshot $target not found")
    commit(meta.copy(refs = meta.refs + (name -> SnapshotRef(target, isBranch))), conf)
  }

  /** Drop a branch or tag. The snapshots it pointed at stay until
    * expiration stops retaining them. */
  def dropRef(spark: SparkSession, path: String, name: String): TableMetadata = {
    val (meta, conf) = load(spark, path)
    require(name != "main", "Cannot drop the main branch")
    require(meta.refs.contains(name), s"No branch or tag named '$name'")
    commit(meta.copy(refs = meta.refs - name), conf)
  }

  /** Roll the table back to `snapshotId`, which must be an ancestor of the
    * current snapshot (i.e. a state the table actually had). Nothing is
    * deleted: the rolled-past snapshots stay addressable by id until
    * expired, and the rollback itself is a new entry in the snapshot log. */
  def rollbackTo(spark: SparkSession, path: String, snapshotId: Long): TableMetadata = {
    val (meta, conf) = load(spark, path)
    val current = meta.currentSnapshotId.getOrElse(
      throw new IllegalArgumentException("Table has no current snapshot"))
    require(meta.ancestorIds(current).contains(snapshotId),
      s"Snapshot $snapshotId is not an ancestor of the current snapshot $current " +
        "(use set_current_snapshot to jump to an arbitrary snapshot)")
    setPointer(meta, snapshotId, conf)
  }

  /** Set the current snapshot to ANY snapshot in table metadata (also
    * accepts a ref name via `refOf`). Unlike rollback, no ancestry
    * requirement — this can jump across branches. */
  def setCurrentSnapshot(spark: SparkSession, path: String, snapshotId: Long): TableMetadata = {
    val (meta, conf) = load(spark, path)
    require(meta.snapshots.exists(_.snapshotId == snapshotId), s"Snapshot $snapshotId not found")
    setPointer(meta, snapshotId, conf)
  }

  /** Fast-forward branch `name` to the head of branch/tag `to`: allowed only
    * when `name`'s current target is an ancestor of `to`'s target (a true
    * fast-forward — no history is rewritten). Publishing an audited WAP
    * branch is `fastForward(..., "main", "audit_branch")`. */
  def fastForward(spark: SparkSession, path: String, name: String, to: String): TableMetadata = {
    val (meta, conf) = load(spark, path)
    val toRef = meta.refs.getOrElse(to,
      throw new IllegalArgumentException(s"No branch or tag named '$to'"))
    val fromId = meta.refs.get(name).map(_.snapshotId).orElse(meta.currentSnapshotId)
    fromId.foreach { f =>
      require(meta.ancestorIds(toRef.snapshotId).contains(f),
        s"Cannot fast-forward '$name' ($f) to '$to' (${toRef.snapshotId}): not an ancestor — " +
          "the branches have diverged")
    }
    val moved = meta.copy(refs = meta.refs + (name -> SnapshotRef(toRef.snapshotId, isBranch = true)))
    // Fast-forwarding main moves the table's current pointer with it.
    if (name == "main") setPointer(moved, toRef.snapshotId, conf)
    else commit(moved, conf)
  }

  private def setPointer(meta: TableMetadata, snapshotId: Long, conf: Configuration): TableMetadata = {
    val snap = meta.snapshots.find(_.snapshotId == snapshotId).get
    commit(meta.copy(
      currentSnapshotId = Some(snapshotId),
      // The pointer move is logged so TIMESTAMP AS OF after the
      // rollback resolves to the rolled-back state (Iceberg spec:
      // snapshot-log records the main branch's history of current ids).
      snapshotLog = meta.snapshotLog :+ (System.currentTimeMillis(), snapshotId),
      refs = meta.refs + ("main" -> SnapshotRef(snapshotId, isBranch = true)),
      lastSequenceNumber = math.max(meta.lastSequenceNumber, snap.sequenceNumber)), conf)
  }
}
