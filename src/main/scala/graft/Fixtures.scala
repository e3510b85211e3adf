package graft

import graft.core.Transforms
import graft.write.TableWriteOptions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.util.concurrent.ConcurrentHashMap

/**
 * Per-JVM cache of Iceberg tables built from the driver-provided parquet
 * testdata. Query entries in [[SparkEntry]] route through these so the
 * correctness harness exercises the REAL engine write+read path while the
 * DuckDB oracle runs plain SQL over the same source parquet.
 */
object Fixtures {
  private val cache = new ConcurrentHashMap[String, String]()

  private def sanitize(s: String): String = s.replaceAll("[^A-Za-z0-9]+", "_")

  def parquet(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  /** Build (once per JVM per sfDir+variant) an Iceberg table and return its
    * path.
    *
    * With `SPARK_GRAFT_FIXTURE_DIR` set (bench tooling only — tests and
    * Verify keep fresh temp dirs), fixtures persist across JVMs under that
    * root and are reused when a `_fixture_complete` marker exists: per-query
    * isolated bench JVMs then skip the multi-minute rebuild. A dir without
    * the marker (crashed build) is wiped and rebuilt. */
  def iceberg(spark: SparkSession, sfDir: String, variant: String)(
      build: String => Unit): String = {
    val key = s"${sanitize(sfDir)}__$variant"
    sys.env.get("SPARK_GRAFT_FIXTURE_DIR") match {
      case Some(root) =>
        cache.computeIfAbsent(key, { _ =>
          val dir = new java.io.File(root, s"graft_fix_$key")
          val marker = new java.io.File(dir, "_fixture_complete")
          if (!marker.exists()) {
            if (dir.exists()) {
              def rm(f: java.io.File): Unit = {
                if (f.isDirectory) f.listFiles().foreach(rm)
                f.delete()
              }
              rm(dir)
            }
            dir.mkdirs()
            build(dir.toString)
            marker.createNewFile()
          }
          dir.toString
        })
      case None => icebergTemp(spark, sfDir, variant, key)(build)
    }
  }

  private def icebergTemp(spark: SparkSession, sfDir: String, variant: String, key: String)(
      build: String => Unit): String = {
    cache.computeIfAbsent(key, { _ =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft_$variant").toString
      build(dir)
      dir
    })
  }

  /** Plain (unpartitioned) Iceberg roundtrip of any testdata table. */
  def plain(spark: SparkSession, sfDir: String, table: String): String =
    iceberg(spark, sfDir, s"${table}_plain") { dir =>
      IcebergTable.write(parquet(spark, sfDir, table), dir)
    }

  /** Table key/numeric columns the [[dm]] refresh rounds hit. Only orders
    * and lineitem, matching the reference's dm=5 refresh-batch targets —
    * on small dimensions a keyslice DELETE would change join selectivity
    * instead of measuring merge-on-read overhead. */
  private val dmCols: Map[String, (String, String)] = Map(
    "orders" -> ("o_orderkey", "o_totalprice"),
    "lineitem" -> ("l_orderkey", "l_quantity"))

  /** [[plain]] plus `rounds` rounds of merge-on-read data modification —
    * the analogue of the reference's `dm=5` TPC-H benchmark variant
    * (`benchmark/tpch/sf=1/dm=5/q*.benchmark`), which times queries over
    * tables that accumulated refresh DML. Each round DELETEs a ~0.1% key
    * slice (positional deletes / DVs on the read path) and identity-UPDATEs
    * another ~0.1% slice (delete + rewritten-file snapshot), so a query
    * must apply `rounds` generations of delete files against every scan. */
  def dm(spark: SparkSession, sfDir: String, table: String, rounds: Int): String =
    iceberg(spark, sfDir, s"${table}_dm$rounds") { dir =>
      IcebergTable.write(parquet(spark, sfDir, table), dir)
      val (key, num) = dmCols.getOrElse(table,
        throw new IllegalArgumentException(s"no dm columns for $table"))
      (1 to rounds).foreach { i =>
        graft.write.Dml.delete(spark, dir, s"$key % 1000 = $i")
        graft.write.Dml.update(spark, dir, s"$key % 997 = ${i + 100}", Map(num -> num))
      }
    }

  private val analyzed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** [[plain]] + a committed NDV statistics file (ANALYZE). Idempotent:
    * skips when the current snapshot already has statistics, so persistent
    * bench fixtures are analyzed once across JVMs. */
  def plainAnalyzed(spark: SparkSession, sfDir: String, table: String): String = {
    val path = plain(spark, sfDir, table)
    if (analyzed.add(path)) {
      val conf = spark.sessionState.newHadoopConf()
      val meta = graft.core.TableMetadata.load(path, conf)
      val hasStats = meta.currentSnapshot.exists(s =>
        meta.statistics.exists(_.snapshotId == s.snapshotId))
      if (!hasStats) graft.write.TableStats.computeTableStats(spark, path)
    }
    path
  }

  def lineitemPlain(spark: SparkSession, sfDir: String): String =
    plain(spark, sfDir, "lineitem")

  def ordersByMonth(spark: SparkSession, sfDir: String): String =
    iceberg(spark, sfDir, "orders_month") { dir =>
      IcebergTable.write(parquet(spark, sfDir, "orders"), dir,
        TableWriteOptions(partitionBy = Seq(("o_orderdate", Transforms.Month))))
    }

  def lineitemBucketed(spark: SparkSession, sfDir: String): String =
    iceberg(spark, sfDir, "lineitem_bucket") { dir =>
      IcebergTable.write(parquet(spark, sfDir, "lineitem"), dir,
        TableWriteOptions(partitionBy = Seq(("l_orderkey", Transforms.Bucket(8)))))
    }

  /** Bucket(16) on l_orderkey — matches fn_bucket's scalar call so the
    * write-transform partition values can oracle the function output. */
  def lineitemBucket16(spark: SparkSession, sfDir: String): String =
    iceberg(spark, sfDir, "lineitem_bucket16") { dir =>
      IcebergTable.write(parquet(spark, sfDir, "lineitem"), dir,
        TableWriteOptions(partitionBy = Seq(("l_orderkey", Transforms.Bucket(16)))))
    }

  /** Supplier table with a WKB point geometry column derived
    * deterministically from the key (x = key % 97, y = key % 61), written
    * across several files so bbox file-pruning has bounds to cut. The
    * coordinates being key-derived keeps the oracle SQL-expressible:
    * point-in-box == two BETWEENs on the key residues. */
  def supplierGeo(spark: SparkSession, sfDir: String): String =
    iceberg(spark, sfDir, "supplier_geo") { dir =>
      val wkbPoint = udf((x: Double, y: Double) => {
        val bb = java.nio.ByteBuffer.allocate(21).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put(1.toByte); bb.putInt(1); bb.putDouble(x); bb.putDouble(y)
        bb.array()
      })
      val geomMeta = graft.core.IcebergTypes
        .NestedField(2, "geom", required = false,
          graft.core.IcebergTypes.GeometryT(Some("srid:4326"))).toSpark.metadata
      val df = parquet(spark, sfDir, "supplier")
        .select(col("s_suppkey"),
          wkbPoint((col("s_suppkey") % 97).cast("double"),
            (col("s_suppkey") % 61).cast("double")).as("geom", geomMeta))
        .repartition(4)
      IcebergTable.write(df, dir)
    }

  def lineitemSorted(spark: SparkSession, sfDir: String): String =
    iceberg(spark, sfDir, "lineitem_sorted") { dir =>
      IcebergTable.write(parquet(spark, sfDir, "lineitem"), dir,
        TableWriteOptions(sortBy = Seq(("l_shipdate", true, true))))
    }

  /** Plain orders table with a committed table-statistics (NDV) file. */
  def ordersAnalyzed(spark: SparkSession, sfDir: String): String =
    iceberg(spark, sfDir, "orders_analyzed") { dir =>
      IcebergTable.write(parquet(spark, sfDir, "orders"), dir)
      graft.write.TableStats.computeTableStats(spark, dir)
    }

  /** Identity-partitioned orders with a committed partition-statistics file. */
  def ordersPartitionAnalyzed(spark: SparkSession, sfDir: String): String =
    iceberg(spark, sfDir, "orders_pstats") { dir =>
      IcebergTable.write(parquet(spark, sfDir, "orders"), dir,
        TableWriteOptions(partitionBy = Seq(("o_orderstatus", Transforms.Identity))))
      graft.write.TableStats.computePartitionStats(spark, dir)
    }

  /** Orders table with MoR DELETE of 'F' orders applied. */
  def ordersDeleted(spark: SparkSession, sfDir: String): String =
    iceberg(spark, sfDir, "orders_deleted") { dir =>
      IcebergTable.write(parquet(spark, sfDir, "orders"), dir)
      IcebergTable.delete(spark, dir, "o_orderstatus = 'F'")
    }

  /** Orders table with MoR UPDATE (price bump on open orders). */
  def ordersUpdated(spark: SparkSession, sfDir: String): String =
    iceberg(spark, sfDir, "orders_updated") { dir =>
      IcebergTable.write(parquet(spark, sfDir, "orders"), dir)
      IcebergTable.update(spark, dir, "o_orderstatus = 'O'",
        Map("o_totalprice" -> "o_totalprice * 1.1"))
    }

  /** Customer table merged with a source of balance updates + new rows. */
  def customerMerged(spark: SparkSession, sfDir: String): String =
    iceberg(spark, sfDir, "customer_merged") { dir =>
      val c = parquet(spark, sfDir, "customer")
      IcebergTable.write(c, dir)
      val updates = c.filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey").as("key"), lit(100.0).as("delta"))
      val inserts = c.filter(col("c_custkey") < 10)
        .select((col("c_custkey") + 1000000).as("key"), col("c_name"),
          col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
      val source = updates.join(inserts, updates("key") === inserts("key"), "full_outer")
        .select(coalesce(updates("key"), inserts("key")).as("key"),
          col("delta"), col("c_name"), col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
      IcebergTable.merge(spark, dir, source, "t.c_custkey = s.key",
        graft.write.Dml.MergeActions(
          matchedUpdate = Some(Map("c_acctbal" -> "t.c_acctbal + coalesce(s.delta, 0.0)")),
          insert = Some(Map(
            "c_custkey" -> "s.key", "c_name" -> "s.c_name", "c_nationkey" -> "s.c_nationkey",
            "c_acctbal" -> "s.c_acctbal", "c_mktsegment" -> "s.c_mktsegment"))))
    }

  /** Same update as [[ordersUpdated]], driven through a SQL `UPDATE`
    * statement (GraftSparkExtensions rewrite → Dml.update). Requires the
    * session to carry `spark.sql.extensions=graft.catalog.GraftSparkExtensions`. */
  def sqlOrdersUpdated(spark: SparkSession, sfDir: String): String =
    iceberg(spark, sfDir, "orders_sql_updated") { dir =>
      IcebergTable.write(parquet(spark, sfDir, "orders"), dir)
      val p = java.nio.file.Paths.get(dir)
      spark.conf.set("spark.sql.catalog.graft_sqlupd", "graft.catalog.GraftSparkCatalog")
      spark.conf.set("spark.sql.catalog.graft_sqlupd.warehouse", p.getParent.toString)
      spark.sql(s"""UPDATE graft_sqlupd.`${p.getFileName}`
                   |SET o_totalprice = o_totalprice * 1.1
                   |WHERE o_orderstatus = 'O'""".stripMargin)
    }

  /** Same merge as [[customerMerged]], driven through a SQL `MERGE INTO`
    * statement (GraftSparkExtensions rewrite → Dml.merge). */
  def sqlCustomerMerged(spark: SparkSession, sfDir: String): String =
    iceberg(spark, sfDir, "customer_sql_merged") { dir =>
      val c = parquet(spark, sfDir, "customer")
      IcebergTable.write(c, dir)
      val updates = c.filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey").as("key"), lit(100.0).as("delta"))
      val inserts = c.filter(col("c_custkey") < 10)
        .select((col("c_custkey") + 1000000).as("key"), col("c_name"),
          col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
      updates.join(inserts, updates("key") === inserts("key"), "full_outer")
        .select(coalesce(updates("key"), inserts("key")).as("key"),
          col("delta"), col("c_name"), col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
        .createOrReplaceTempView("sql_merge_src")
      val p = java.nio.file.Paths.get(dir)
      spark.conf.set("spark.sql.catalog.graft_sqlmrg", "graft.catalog.GraftSparkCatalog")
      spark.conf.set("spark.sql.catalog.graft_sqlmrg.warehouse", p.getParent.toString)
      spark.sql(s"""MERGE INTO graft_sqlmrg.`${p.getFileName}` tgt
                   |USING sql_merge_src src ON tgt.c_custkey = src.key
                   |WHEN MATCHED THEN
                   |  UPDATE SET c_acctbal = tgt.c_acctbal + coalesce(src.delta, 0.0)
                   |WHEN NOT MATCHED THEN
                   |  INSERT (c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
                   |  VALUES (src.key, src.c_name, src.c_nationkey, src.c_acctbal, src.c_mktsegment)""".stripMargin)
    }

  /** Orders split across several range-partitioned files (top-k pruning). */
  def ordersMultiFile(spark: SparkSession, sfDir: String): String =
    iceberg(spark, sfDir, "orders_multifile") { dir =>
      IcebergTable.write(
        parquet(spark, sfDir, "orders").repartitionByRange(6, col("o_orderkey")), dir)
    }

  /** v3 orders table with a deletion-vector DELETE applied. */
  def ordersDvDeleted(spark: SparkSession, sfDir: String): String =
    iceberg(spark, sfDir, "orders_dv3") { dir =>
      IcebergTable.write(parquet(spark, sfDir, "orders"), dir,
        TableWriteOptions(formatVersion = 3))
      IcebergTable.delete(spark, dir, "o_orderstatus = 'F'")
    }

  /** Orders (v2, unpartitioned) where a pure-equality SQL DELETE routed
    * through the EQUALITY-delete writer (session-gated like the reference's
    * `enable_equality_deletes`): the table must carry an equality-delete
    * file, not positional deletes — the fixture build fails loudly if the
    * routing regresses. */
  def ordersEqDeleteWrite(spark: SparkSession, sfDir: String): String =
    iceberg(spark, sfDir, "orders_eqdel_write") { dir =>
      IcebergTable.write(parquet(spark, sfDir, "orders"), dir)
      spark.conf.set(graft.write.Dml.EnableEqualityDeleteWrites, "true")
      try IcebergTable.delete(spark, dir, "o_orderstatus = 'F'")
      finally spark.conf.unset(graft.write.Dml.EnableEqualityDeleteWrites)
      val eqEntries = IcebergTable.manifestEntries(spark, dir)
        .filter(col("content") === "EQUALITY_DELETES").count()
      require(eqEntries > 0,
        "pure-equality DELETE did not write an equality-delete file")
    }

  /** Customer table with an equality delete of every 10th key. */
  def customerEqDeleted(spark: SparkSession, sfDir: String): String =
    iceberg(spark, sfDir, "customer_eqdel") { dir =>
      val c = parquet(spark, sfDir, "customer")
      IcebergTable.write(c, dir)
      IcebergTable.deleteEquality(spark, dir,
        c.filter(col("c_custkey") % 10 === 0).select("c_custkey"))
    }

  /** Orders with a VARIANT payload column written through the graft writer
    * (v3 — variant is an Iceberg v3 type): JSON built from orderstatus +
    * totalprice, parsed to Spark VariantType. */
  def ordersVariantWritten(spark: SparkSession, sfDir: String): String =
    iceberg(spark, sfDir, "orders_variant") { dir =>
      val src = parquet(spark, sfDir, "orders")
        .selectExpr("o_orderkey",
          "parse_json(concat('{\"status\":\"', o_orderstatus, '\",\"total\":', o_totalprice, '}')) AS payload")
      IcebergTable.write(src, dir, TableWriteOptions(formatVersion = 3))
    }

  /** Orders table after ALTER: add column w/ default, rename, drop. */
  def ordersEvolved(spark: SparkSession, sfDir: String): String =
    iceberg(spark, sfDir, "orders_evolved") { dir =>
      IcebergTable.write(parquet(spark, sfDir, "orders"), dir)
      IcebergTable.addColumn(spark, dir, "o_comment", "string", Some("\"none\""))
      IcebergTable.renameColumn(spark, dir, "o_orderpriority", "o_priority")
      IcebergTable.dropColumn(spark, dir, "o_custkey")
    }

  /** Small-file lineitem table: delete + compaction applied. */
  def lineitemRewritten(spark: SparkSession, sfDir: String): String =
    iceberg(spark, sfDir, "lineitem_rewritten") { dir =>
      IcebergTable.write(parquet(spark, sfDir, "lineitem").repartition(8), dir)
      IcebergTable.delete(spark, dir, "l_quantity < 5")
      IcebergTable.rewriteDataFiles(spark, dir, rewriteAll = true)
    }

  /** Small-file orders table compacted through the SQL procedure:
    * DELETE (merge-on-read), then `CALL system.rewrite_data_files(...)`
    * through the catalog front-end. */
  def sqlOrdersRewritten(spark: SparkSession, sfDir: String): String =
    iceberg(spark, sfDir, "sql_orders_rewritten") { dir =>
      IcebergTable.write(parquet(spark, sfDir, "orders").repartition(8), dir)
      IcebergTable.delete(spark, dir, "o_orderstatus = 'F'")
      spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftSparkCatalog")
      spark.sql(
        s"CALL graft.system.rewrite_data_files(table => '$dir', rewrite_all => true)")
        .collect()
    }

  /** Partition-evolution roundtrip: pre-1998 orders written unpartitioned,
    * the spec evolved to month(o_orderdate), the 1998+ half appended under
    * the new spec — the read spans both specs. */
  def ordersPartitionEvolved(spark: SparkSession, sfDir: String): String =
    iceberg(spark, sfDir, "orders_part_evolved") { dir =>
      val src = parquet(spark, sfDir, "orders")
      IcebergTable.write(src.filter(col("o_orderdate") < "1998-01-01"), dir)
      IcebergTable.addPartitionField(spark, dir, "o_orderdate", "month")
      IcebergTable.append(src.filter(col("o_orderdate") >= "1998-01-01"), dir)
    }

  /** Write-audit-publish roundtrip: open orders on main, finished orders
    * appended to an 'audit' BRANCH (main stays isolated), then main is
    * fast-forwarded onto the audited branch. Final state = open + finished. */
  def ordersWap(spark: SparkSession, sfDir: String): String =
    iceberg(spark, sfDir, "orders_wap") { dir =>
      val src = parquet(spark, sfDir, "orders")
      IcebergTable.write(src.filter(col("o_orderstatus") === "O"), dir)
      IcebergTable.createBranch(spark, dir, "audit")
      IcebergTable.appendToBranch(src.filter(col("o_orderstatus") === "F"), dir, "audit")
      require(IcebergTable.count(spark, dir) ==
        src.filter(col("o_orderstatus") === "O").count(),
        "WAP isolation broken: main saw branch rows before fast-forward")
      IcebergTable.fastForward(spark, dir, "main", "audit")
    }

  /** Rollback roundtrip: all orders written, priority-5 orders deleted,
    * then the table is rolled back over the delete — the final state is the
    * original (and TIMESTAMP AS OF now resolves to it). */
  def ordersRolledBack(spark: SparkSession, sfDir: String): String =
    iceberg(spark, sfDir, "orders_rollback") { dir =>
      IcebergTable.write(parquet(spark, sfDir, "orders"), dir)
      val first = graft.core.TableMetadata.load(dir, spark.sessionState.newHadoopConf())
        .currentSnapshotId.get
      IcebergTable.delete(spark, dir, "o_orderpriority = '5-LOW'")
      IcebergTable.rollbackTo(spark, dir, first)
    }

  /** Changelog fixture: open orders written, then 5-LOW priorities purged
    * via merge-on-read DELETE — two snapshots of CDC history. */
  def ordersChangelog(spark: SparkSession, sfDir: String): String =
    iceberg(spark, sfDir, "orders_changelog") { dir =>
      IcebergTable.write(
        parquet(spark, sfDir, "orders").filter(col("o_orderstatus") === "O"), dir)
      IcebergTable.delete(spark, dir, "o_orderpriority = '5-LOW'")
    }

  /** Two-snapshot orders table (append of the same rows twice); returns
    * (path, firstSnapshotId). */
  def ordersTwoSnapshots(spark: SparkSession, sfDir: String): (String, Long) = {
    val path = iceberg(spark, sfDir, "orders_2snap") { dir =>
      val src = parquet(spark, sfDir, "orders")
      IcebergTable.write(src, dir)
      IcebergTable.append(src, dir)
    }
    val meta = graft.core.TableMetadata.load(path, spark.sessionState.newHadoopConf())
    (path, meta.snapshots.minBy(_.sequenceNumber).snapshotId)
  }

  /** A `list<struct>` table taken through the reference's full nested
    * evolution sequence (schema_evolve_struct_in_list test.sql): insert →
    * widen age int→long → insert → add last_name → insert → rename
    * first_name→given_name → insert → drop last_name. The final scan reads
    * pre- and post-evolution files through field-id resolution. */
  def nestedEvolved(spark: SparkSession, sfDir: String): String =
    iceberg(spark, sfDir, "nested_evolved") { dir =>
      import graft.write.Evolution
      def row(sql: String) = spark.sql(s"SELECT $sql AS tags")
      IcebergTable.write(row(
        "array(named_struct('first_name','Alice','age',43)," +
          "named_struct('first_name','Bob','age',35))"), dir)
      Evolution.updateColumnType(spark, dir, "tags.element.age", "long")
      IcebergTable.append(row(
        "array(named_struct('first_name','Ancient Being','age',9223372036854775807L)," +
          "named_struct('first_name','Bobby Droptables','age',2147483649L))"), dir)
      Evolution.addColumn(spark, dir, "tags.element.last_name", "string")
      IcebergTable.append(row(
        "array(named_struct('first_name','Hello','age',9223372036854775807L,'last_name','World'))"), dir)
      Evolution.renameColumn(spark, dir, "tags.element.first_name", "given_name")
      IcebergTable.append(row(
        "array(named_struct('given_name','Duck','age',5L,'last_name','DB'))"), dir)
      Evolution.dropColumn(spark, dir, "tags.element.last_name")
    }

  /** Embeddings with the LSH signature materialized as a stored column
    * (parquet) — the 100 TB shape: sign once at ingest, probe many times. */
  def embeddingsSigIndexed(spark: SparkSession, sfDir: String): String =
    iceberg(spark, sfDir, "embeddings_sig") { dir =>
      graft.pipeline.Similarity
        .buildSignatureIndex(parquet(spark, sfDir, "embeddings"), "embedding", "vec_id")
        .write.mode("overwrite").parquet(s"$dir/indexed")
    }

  /** Embeddings with the IVF cell id materialized as a stored INT column
    * plus the persisted centroid codebook — train once at ingest, probe
    * many times (the k-means fit never runs at query time). */
  def embeddingsIvfIndexed(spark: SparkSession, sfDir: String): String =
    iceberg(spark, sfDir, "embeddings_ivf") { dir =>
      val idx = graft.pipeline.Similarity.buildIvfIndex(
        parquet(spark, sfDir, "embeddings"), "embedding", "vec_id", numCells = 16)
      graft.pipeline.Similarity.saveIvfIndex(idx, dir)
    }
}
