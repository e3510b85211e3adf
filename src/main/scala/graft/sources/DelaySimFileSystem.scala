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
class DelaySimFileSystem extends RawLocalFileSystem {

  override def getScheme: String = "graftdelay"
  override def getUri: URI = URI.create("graftdelay:///")

  private def delayMs: Long = getConf.getLong("fs.graftdelay.mean.ms", 3L)
  private def delay(): Unit = {
    val ms = delayMs
    if (ms > 0) Thread.sleep(ms)
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    delay()
    val inner = super.open(f, bufferSize)
    new FSDataInputStream(new DelayStream(inner, () => delay()))
  }

  override def getFileStatus(f: Path): FileStatus = { delay(); super.getFileStatus(f) }
  override def listStatus(f: Path): Array[FileStatus] = { delay(); super.listStatus(f) }

  /** Per-request delay around every read call of the wrapped stream. */
  private final class DelayStream(in: FSDataInputStream, d: () => Unit)
      extends FSInputStream {
    override def read(): Int = { d(); in.read() }
    override def read(b: Array[Byte], off: Int, len: Int): Int = { d(); in.read(b, off, len) }
    override def read(pos: Long, b: Array[Byte], off: Int, len: Int): Int = {
      d(); in.read(pos, b, off, len)
    }
    override def seek(pos: Long): Unit = in.seek(pos)
    override def getPos: Long = in.getPos
    override def seekToNewSource(targetPos: Long): Boolean = in.seekToNewSource(targetPos)
    override def available(): Int = in.available()
    override def close(): Unit = in.close()
  }
}
