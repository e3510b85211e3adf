package graft.catalog

import graft.write.Dml
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
    ProcedureParameter.in("rewrite_all", BooleanType).defaultValue("false").build())

  private val outputSchema = StructType(Seq(
    StructField("rewritten_data_files", LongType, nullable = false),
    StructField("added_data_files", LongType, nullable = false),
    StructField("rewritten_bytes", LongType, nullable = false)))

  override def call(input: InternalRow): JIterator[Scan] = {
    require(!input.isNullAt(0), "rewrite_data_files: 'table' must not be NULL")
    val table = input.getUTF8String(0).toString
    val target = if (input.isNullAt(1)) None else Some(input.getLong(1))
    val minInput = if (input.isNullAt(2)) 5L else input.getLong(2)
    val rewriteAll = !input.isNullAt(3) && input.getBoolean(3)
    val r = Dml.rewriteDataFiles(SparkSession.active, catalog.dmlOpsFor(table),
      target, minInput.toInt, rewriteAll)
    val row: InternalRow = new GenericInternalRow(
      Array[Any](r.rewrittenDataFiles, r.addedDataFiles, r.rewrittenBytes))
    Collections.singletonList[Scan](new LocalScan {
      override def rows(): Array[InternalRow] = Array(row)
      override def readSchema(): StructType = outputSchema
    }).iterator()
  }
}
