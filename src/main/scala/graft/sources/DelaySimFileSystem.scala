package graft.sources

import java.net.URI
import org.apache.hadoop.fs.{
  FSDataInputStream, FSInputStream, FileStatus, Path, RawLocalFileSystem
}

/**
 * Local filesystem with simulated object-store latency — the bench-protocol
 * analogue of the reference's `SET debug_fs_delay_mean_ms=3` +
 * `enable_external_file_cache=false` pair, which its TPC-H benchmark
 * applies to every query (`benchmark/tpch/sf=1/tpch.benchmark.in:24-71`) so
 * metadata/data IO costs what it would against S3, not warm local disk.
 *
 * Registered under the `graftdelay://` scheme
 * (`fs.graftdelay.impl=graft.sources.DelaySimFileSystem`); the delay is a
 * FIXED `fs.graftdelay.mean.ms` (default 3) sleep charged where an object
 * store charges a request:
 *
 *   - `open` / `getFileStatus` / `listStatus` — one GET/HEAD/LIST each;
 *   - each `read`/positioned-read CALL on an open stream — one ranged GET.
 *     Parquet readers issue one large read per column chunk and Avro one
 *     per block, so the charge tracks request count, not byte count.
 *
 * Fixed rather than exponentially-distributed delay keeps runs reproducible;
 * the mean matches the reference's 3 ms. The DuckDB proxy side injects the
 * same charge through a registered fsspec filesystem
 * (scripts/bench_duckdb_proxy.py --fs-delay-ms).
 */
object DelaySimFileSystem {
  /** GRAFT_FS_DELAY_STATS=1: count charged requests by (op, file kind) and
    * print the table at JVM exit — the diagnostic that found the
    * request-count pathologies documented in BASELINE.md. */
  private[sources] val stats = sys.env.contains("GRAFT_FS_DELAY_STATS")
  private[sources] val counters =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.LongAdder]
  if (stats) Runtime.getRuntime.addShutdownHook(new Thread(() => {
    import scala.jdk.CollectionConverters._
    counters.asScala.toSeq.sortBy(-_._2.sum).foreach { case (k, v) =>
      System.err.println(f"[fs-delay-stats] $k%-16s ${v.sum}%10d")
    }
  }))
}

class DelaySimFileSystem extends RawLocalFileSystem {

  override def getScheme: String = "graftdelay"
  override def getUri: URI = URI.create("graftdelay:///")

  private def delayMs: Long = getConf.getLong("fs.graftdelay.mean.ms", 3L)
  private def delay(): Unit = {
    val ms = delayMs
    if (ms > 0) Thread.sleep(ms)
  }

  private def count(op: String, f: Path): Unit =
    if (DelaySimFileSystem.stats) {
      val name = f.getName
      val kind =
        if (name.endsWith(".parquet")) "parquet"
        else if (name.endsWith(".avro")) "avro"
        else if (name.contains("metadata")) "metadata"
        else "other"
      DelaySimFileSystem.counters
        .computeIfAbsent(s"$op:$kind", _ => new java.util.concurrent.atomic.LongAdder)
        .increment()
    }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    delay(); count("open", f)
    val inner = super.open(f, bufferSize)
    new FSDataInputStream(new DelayStream(inner, () => { delay(); count("read", f) }))
  }


  override def getFileStatus(f: Path): FileStatus = {
    delay(); count("stat", f); super.getFileStatus(f)
  }
  override def listStatus(f: Path): Array[FileStatus] = {
    delay(); count("list", f); super.listStatus(f)
  }

  /** Per-RANGED-REQUEST charging: an object-store client issues one ranged
    * GET per position discontinuity and then streams; the local read-call
    * granularity underneath is an artifact (parquet-mr's non-ByteBuffer H1
    * path copies through an 8 KB loop — charging per CALL taxed a column
    * chunk ~2,500x: 332k charges measured on one sf10 lineitem scan). A
    * read starting where the previous one ended is a free continuation;
    * any position jump (or the first read) is one charged request. */
  private final class DelayStream(in: FSDataInputStream, d: () => Unit)
      extends FSInputStream {
    private var next = -1L
    private def charge(pos: Long): Unit = if (pos != next) d()
    override def read(): Int = {
      val p = in.getPos; charge(p)
      val r = in.read()
      next = if (r >= 0) p + 1 else p
      r
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      val p = in.getPos; charge(p)
      val r = in.read(b, off, len)
      next = if (r > 0) p + r else p
      r
    }
    override def read(pos: Long, b: Array[Byte], off: Int, len: Int): Int = {
      charge(pos)
      val r = in.read(pos, b, off, len)
      next = if (r > 0) pos + r else pos
      r
    }
    override def seek(pos: Long): Unit = in.seek(pos)
    override def getPos: Long = in.getPos
    override def seekToNewSource(targetPos: Long): Boolean = in.seekToNewSource(targetPos)
    override def available(): Int = in.available()
    override def close(): Unit = in.close()
  }
}
