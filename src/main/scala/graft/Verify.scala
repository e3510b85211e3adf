package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_TUNED=1 verifies the exact engine Bench measures — the
    // fully-tuned BenchSession (late optimizer rules ReuseSemiAggregate +
    // InjectLateBlooms, bloom confs, shuffle floors) — against the same
    // DuckDB oracle. Without it, correctness would only ever cover the
    // stock session while the bench artifacts describe a different plan.
    val tuned = sys.env.get("SPARK_GRAFT_TUNED").contains("1")
    val spark =
      if (tuned) BenchSession.session(cpus)
      else SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        // Defensive cap: any future plan-lineage regression (the r10
        // resolveClusters loop built ~0.7 GB plan strings) truncates instead
        // of exhausting driver heap on a debug string.
        .config("spark.sql.maxPlanStringLength", (8 * 1024 * 1024).toString)
        .config("spark.sql.extensions", classOf[graft.catalog.GraftSparkExtensions].getName)
        .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Optional comma-separated query filter for local iteration (same
    // contract as Bench).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // A query that throws must NOT vanish from the correctness report (a
    // round-6 regression was hidden exactly that way): write a one-row
    // parquet whose schema/hash can never match any oracle, carrying the
    // error message, so the driver surfaces a loud mismatch for that name.
    val failed = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
          System.err.println(s"[verify] $name FAILED: $msg")
          failed += name -> msg
          import spark.implicits._
          Seq(s"QUERY FAILED: ${msg.take(500)}").toDF("_graft_query_error")
            .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Side datasets (ANN candidate sets) the oracle SQL joins against;
    // __GRAFT_OUT__ in oracle SQL becomes this run's absolute output dir.
    val absOut = Paths.get(outDir).toAbsolutePath.toString
    SparkEntry.sideData.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        System.err.println(s"[verify] side dataset $name FAILED: $msg")
        failed += s"side:$name" -> msg
      }
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("__GRAFT_OUT__", absOut))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Machine-readable failure roster alongside the dumps (empty = clean).
    Files.writeString(Paths.get(s"$outDir/verify_errors.json"),
      failed.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    if (failed.nonEmpty)
      System.err.println(s"[verify] ${failed.size} quer${if (failed.size == 1) "y" else "ies"} failed: " +
        failed.map(_._1).mkString(", "))
    spark.stop()
  }
}
