package graft.write

import graft.core._
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession

/**
 * Metadata-only ALTER TABLE operations: add / drop / rename column,
 * set / remove table properties. Each produces a NEW schema (bumped
 * schema-id, fresh field ids for added columns) in a new metadata version —
 * data files are untouched; the field-id read path resolves old files
 * against the new schema (rename keeps the id, drop hides it, add fills the
 * initial-default).
 *
 * (reference: iceberg_schema_entry.cpp:168-332 alter entry points,
 * iceberg_table_properties_functions.cpp property functions,
 * api/table_update.cpp update serialization.)
 */
object Evolution {

  private def commit(meta: TableMetadata, conf: Configuration): TableMetadata = {
    IcebergWrite.commitMetadataNextVersion(meta.copy(lastUpdatedMs = System.currentTimeMillis()), conf)
  }

  private def withNewSchema(meta: TableMetadata, fields: Seq[IcebergTypes.NestedField],
      newLastColumnId: Int): TableMetadata = {
    val newId = meta.schemas.map(_.schemaId).max + 1
    val sch = IcebergSchema(newId, IcebergTypes.StructT(fields), newLastColumnId)
    meta.copy(schemas = meta.schemas :+ sch, currentSchemaId = newId, lastColumnId = newLastColumnId)
  }

  /** Rewrite the struct addressed by a dotted path: struct segments by
    * field name, `element` into a list, `key`/`value` into a map — the
    * addressing the reference's nested ALTER statements use
    * (`tags.element.age`, `preferences.value.first_name`;
    * schema_evolve_struct_in_list.test, schema_evolve_struct_in_map.test).
    * `op` receives the field list of the addressed struct and returns the
    * replacement; every field id on the way down is preserved. */
  private def rewriteStructAt(root: IcebergTypes.StructT, path: Seq[String])(
      op: Seq[IcebergTypes.NestedField] => Seq[IcebergTypes.NestedField]): IcebergTypes.StructT = {
    import IcebergTypes._
    def go(t: IcebergType, p: Seq[String]): IcebergType = (t, p) match {
      case (s: StructT, Nil) => StructT(op(s.fields))
      case (s: StructT, seg +: rest) =>
        val f = s.fields.find(_.name == seg).getOrElse(
          throw new IllegalArgumentException(s"No field '$seg' on path"))
        StructT(s.fields.map(x =>
          if (x.id == f.id) x.copy(fieldType = go(x.fieldType, rest)) else x))
      case (ListT(id, el, req), "element" +: rest) => ListT(id, go(el, rest), req)
      case (MapT(kid, k, vid, v, req), "key" +: rest) => MapT(kid, go(k, rest), vid, v, req)
      case (MapT(kid, k, vid, v, req), "value" +: rest) => MapT(kid, k, vid, go(v, rest), req)
      case (other, seg +: _) =>
        throw new IllegalArgumentException(
          s"Cannot address '$seg' inside ${other.typeJsonString}")
    }
    go(root, path).asInstanceOf[StructT]
  }

  /** Split a dotted column reference into (parent struct path, leaf name). */
  private def splitPath(name: String): (Seq[String], String) = {
    val segs = name.split("\\.").toSeq
    (segs.init, segs.last)
  }

  /** Leaf resolution used by EVERY column op: exact-case match wins, then
    * case-insensitive (Spark's default resolution) — consistently, so
    * widen/rename/drop/add all see the same column for the same name. */
  private def findIn(fs: Seq[IcebergTypes.NestedField],
      leaf: String): Option[IcebergTypes.NestedField] =
    fs.find(_.name == leaf).orElse(fs.find(_.name.equalsIgnoreCase(leaf)))

  /** ALTER TABLE ADD COLUMN (optionally with an initial-default visible on
    * rows written before the column existed). A dotted `name` adds the
    * field to a NESTED struct — including one inside a list element or map
    * value (`tags.element.last_name`). */
  def addColumn(spark: SparkSession, path: String, name: String, typeString: String,
      initialDefaultJson: Option[String] = None, required: Boolean = false): TableMetadata = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = TableMetadata.load(path, conf)
    val cur = meta.currentSchema
    require(!required || initialDefaultJson.isDefined,
      "A required column added to a non-empty table needs an initial-default")
    val t = IcebergTypes.parsePrimitive(typeString)
    val id = meta.lastColumnId + 1
    val defNode = initialDefaultJson.map(new com.fasterxml.jackson.databind.ObjectMapper().readTree)
    val (parent, leaf) = splitPath(name)
    val newStruct = rewriteStructAt(cur.struct, parent) { fs =>
      require(findIn(fs, leaf).isEmpty, s"Column $name already exists")
      fs :+ IcebergTypes.NestedField(id, leaf, required, t,
        initialDefaultJson = defNode, writeDefaultJson = defNode)
    }
    commit(withNewSchema(meta, newStruct.fields, id), conf)
  }

  /** ALTER TABLE DROP COLUMN. Blocked when the column is referenced by the
    * partition spec or the active sort order (reference
    * iceberg_schema_entry.cpp:278-332). */
  def dropColumn(spark: SparkSession, path: String, name: String): TableMetadata = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = TableMetadata.load(path, conf)
    val cur = meta.currentSchema
    val (parent, leaf) = splitPath(name)
    // Every field id in the dropped SUBTREE must be guarded, not just the
    // dropped field's own id: dropping a struct whose child is a spec/sort
    // source would otherwise leave the spec referencing a dangling sourceId.
    def subtreeIds(t: IcebergType): Set[Int] = t match {
      case s: IcebergTypes.StructT =>
        s.fields.flatMap(f => subtreeIds(f.fieldType) + f.id).toSet
      case l: IcebergTypes.ListT => subtreeIds(l.element) + l.elementId
      case m: IcebergTypes.MapT =>
        subtreeIds(m.key) ++ subtreeIds(m.value) + m.keyId + m.valueId
      case _ => Set.empty
    }
    val newStruct = rewriteStructAt(cur.struct, parent) { fs =>
      val f = findIn(fs, leaf)
        .getOrElse(throw new IllegalArgumentException(s"No column $name"))
      val dropped = subtreeIds(f.fieldType) + f.id
      require(!meta.specs.exists(_.fields.exists(pf => dropped.contains(pf.sourceId))),
        s"Cannot drop $name: it or a nested field is referenced by a partition spec")
      require(!meta.sortOrder(meta.defaultSortOrderId)
          .exists(_.fields.exists(sf => dropped.contains(sf.sourceId))),
        s"Cannot drop $name: it or a nested field is referenced by the table sort order")
      fs.filterNot(_.id == f.id)
    }
    commit(withNewSchema(meta, newStruct.fields, meta.lastColumnId), conf)
  }

  /** ALTER TABLE RENAME COLUMN — keeps the field id, so existing data files
    * still resolve. */
  def renameColumn(spark: SparkSession, path: String, from: String, to: String): TableMetadata = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = TableMetadata.load(path, conf)
    val cur = meta.currentSchema
    val (parent, leaf) = splitPath(from)
    require(!to.contains("."), s"Rename target must be a bare name, got $to")
    val newStruct = rewriteStructAt(cur.struct, parent) { fs =>
      val f = findIn(fs, leaf)
        .getOrElse(throw new IllegalArgumentException(s"No column $from"))
      // forall: renaming a column to a different CASE of itself is legal.
      require(findIn(fs, to).forall(_.id == f.id), s"Column $to already exists")
      fs.map(x => if (x.id == f.id) x.copy(name = to) else x)
    }
    commit(withNewSchema(meta, newStruct.fields, meta.lastColumnId), conf)
  }

  /** ALTER TABLE ALTER COLUMN ... COMMENT — sets/clears the Iceberg field
    * doc (surfaced to Spark as the column comment). */
  def setColumnDoc(spark: SparkSession, path: String, name: String,
      doc: Option[String]): TableMetadata = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = TableMetadata.load(path, conf)
    val cur = meta.currentSchema
    require(cur.fields.exists(_.name == name), s"No column $name")
    val fields = cur.fields.map(f => if (f.name == name) f.copy(doc = doc) else f)
    commit(withNewSchema(meta, fields, meta.lastColumnId), conf)
  }

  /** ALTER TABLE ALTER COLUMN TYPE — widening promotions only (int->long,
    * float->double, decimal precision growth), per the Iceberg evolution
    * rules. Field id is kept; old files are read with their physical type
    * and cast up. */
  def updateColumnType(spark: SparkSession, path: String, name: String, newType: String): TableMetadata = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = TableMetadata.load(path, conf)
    val cur = meta.currentSchema
    val t = IcebergTypes.parsePrimitive(newType)
    import IcebergTypes._
    val (parent, leaf) = splitPath(name)
    val newStruct = rewriteStructAt(cur.struct, parent) { fs =>
      val f = findIn(fs, leaf)
        .getOrElse(throw new IllegalArgumentException(s"No column $name"))
      val ok = (f.fieldType, t) match {
        case (IntT, LongT) => true
        case (FloatT, DoubleT) => true
        case (DecimalT(p1, s1), DecimalT(p2, s2)) => s1 == s2 && p2 >= p1
        case (a, b) => a == b
      }
      require(ok, s"Illegal type promotion ${f.fieldType.typeJsonString} -> ${t.typeJsonString}")
      fs.map(x => if (x.id == f.id) x.copy(fieldType = t) else x)
    }
    commit(withNewSchema(meta, newStruct.fields, meta.lastColumnId), conf)
  }

  /** SET NOT NULL / DROP NOT NULL. */
  def setRequired(spark: SparkSession, path: String, name: String, required: Boolean): TableMetadata = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = TableMetadata.load(path, conf)
    val cur = meta.currentSchema
    require(cur.fields.exists(_.name == name), s"No column $name")
    val fields = cur.fields.map(f => if (f.name == name) f.copy(required = required) else f)
    commit(withNewSchema(meta, fields, meta.lastColumnId), conf)
  }

  /** ALTER TABLE SET ('format-version'='3'): in-place format upgrade
    * (downgrades refused). Metadata-only: existing rows keep NULL `_row_id`
    * until the first v3 write, which retroactively assigns first-row-ids to
    * the carried-forward v2 manifests (IcebergWrite.buildSnapshotFiles;
    * reference test_upgrade_format_version_2_to_3.test). */
  def upgradeFormatVersion(spark: SparkSession, path: String, newVersion: Int): TableMetadata = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = TableMetadata.load(path, conf)
    require(newVersion >= meta.formatVersion,
      s"cannot downgrade Iceberg format version ${meta.formatVersion} -> $newVersion")
    require(newVersion <= 3, s"unsupported Iceberg format version $newVersion")
    if (newVersion == meta.formatVersion) meta
    else commit(meta.copy(formatVersion = newVersion), conf)
  }

  // ---------- partition evolution (metadata-only; spec id per file) ----------

  /** ALTER TABLE ... ADD PARTITION FIELD `transform(col)`: a NEW default
    * spec (fresh spec id, fresh partition-field ids) extending the current
    * one. Existing data files keep their old spec id and are read/pruned
    * under it (per-file spec resolution); only files written AFTER the
    * evolution carry the new layout — the Iceberg partition-evolution
    * contract, no data rewrite. */
  def addPartitionField(spark: SparkSession, path: String, column: String,
      transformStr: String = "identity", name: Option[String] = None): TableMetadata = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = TableMetadata.load(path, conf)
    val t = Transforms.parse(transformStr)
    val src = meta.currentSchema.findField(column).getOrElse(
      throw new IllegalArgumentException(s"Partition source column '$column' not in schema"))
    val fieldName = name.getOrElse(t match {
      case Transforms.Identity => column
      case Transforms.Bucket(_) => s"${column}_bucket"
      case Transforms.Truncate(_) => s"${column}_trunc"
      case other => s"${column}_$other"
    })
    val cur = meta.defaultSpec
    require(!cur.fields.exists(f => f.name == fieldName),
      s"Partition field '$fieldName' already exists in the default spec")
    require(!cur.fields.exists(f => f.sourceId == src.id && f.transform.toString == t.toString),
      s"Default spec already partitions by $transformStr($column)")
    val newFieldId = meta.lastPartitionId + 1
    val newSpecId = meta.specs.map(_.specId).max + 1
    val newSpec = PartitionSpec(newSpecId,
      cur.fields :+ PartitionField(src.id, newFieldId, fieldName, t))
    commit(meta.copy(specs = meta.specs :+ newSpec, defaultSpecId = newSpecId,
      lastPartitionId = newFieldId), conf)
  }

  /** Parse a partition-spec string: `a, bucket(8, id), months(ts),
    * truncate(10, s)` — the CREATE-TABLE transform surface as text. */
  def parsePartitionSpecString(spec: String): Seq[(String, Transform)] = {
    // Split on top-level commas only (transform args contain commas).
    val terms = Seq.newBuilder[String]
    var depth = 0; val cur = new StringBuilder
    spec.foreach {
      case '(' => depth += 1; cur.append('(')
      case ')' => depth -= 1; cur.append(')')
      case ',' if depth == 0 => terms += cur.toString; cur.clear()
      case c => cur.append(c)
    }
    if (cur.toString.trim.nonEmpty) terms += cur.toString
    val FnRe = """(\w+)\s*\((.*)\)""".r
    terms.result().map(_.trim).filter(_.nonEmpty).map {
      case FnRe(fn, args) =>
        val a = args.split(",").map(_.trim).toSeq
        fn.toLowerCase(java.util.Locale.ROOT) match {
          case "bucket" => (a(1), Transforms.Bucket(a(0).toInt))
          case "truncate" => (a(1), Transforms.Truncate(a(0).toInt))
          case "year" | "years" => (a(0), Transforms.Year)
          case "month" | "months" => (a(0), Transforms.Month)
          case "day" | "days" => (a(0), Transforms.Day)
          case "hour" | "hours" => (a(0), Transforms.Hour)
          case other => throw new IllegalArgumentException(
            s"Unknown partition transform '$other' (identity, bucket, truncate, year, month, day, hour)")
        }
      case plain => (plain, Transforms.Identity)
    }
  }

  /** Wholesale partition-spec replacement (reference `ALTER TABLE ... SET
    * PARTITIONED BY`, test_partition_revert_to_previous /
    * reset_then_repartition): an existing spec with the same field list is
    * REUSED by id (reverting restores the original spec id); otherwise a
    * new spec is appended. (sourceId, transform) pairs seen in ANY
    * historical spec keep their partition field id — the Iceberg invariant
    * that lets per-file spec resolution prune across evolutions. Empty
    * `fields` = RESET to unpartitioned. */
  def setPartitionSpec(spark: SparkSession, path: String,
      fields: Seq[(String, Transform)]): TableMetadata = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = TableMetadata.load(path, conf)
    val schema = meta.currentSchema
    val existingByKey: Map[(Int, String), PartitionField] =
      meta.specs.flatMap(_.fields).map(pf => (pf.sourceId, pf.transform.toString) -> pf).toMap
    var nextFieldId = meta.lastPartitionId
    val newFields = fields.map { case (column, t) =>
      val src = schema.findField(column).getOrElse(
        throw new IllegalArgumentException(s"Partition source column '$column' not in schema"))
      existingByKey.getOrElse((src.id, t.toString), {
        nextFieldId += 1
        val fieldName = t match {
          case Transforms.Identity => column
          case Transforms.Bucket(_) => s"${column}_bucket"
          case Transforms.Truncate(_) => s"${column}_trunc"
          case other => s"${column}_$other"
        }
        PartitionField(src.id, nextFieldId, fieldName, t)
      })
    }
    meta.specs.find(_.fields == newFields) match {
      case Some(sp) =>
        commit(meta.copy(defaultSpecId = sp.specId, lastPartitionId = nextFieldId), conf)
      case None =>
        val newSpecId = meta.specs.map(_.specId).max + 1
        commit(meta.copy(specs = meta.specs :+ PartitionSpec(newSpecId, newFields),
          defaultSpecId = newSpecId, lastPartitionId = nextFieldId), conf)
    }
  }

  /** ALTER TABLE ... DROP PARTITION FIELD: a new default spec without the
    * field. Files written under older specs still prune on it. */
  def dropPartitionField(spark: SparkSession, path: String, fieldName: String): TableMetadata = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = TableMetadata.load(path, conf)
    val cur = meta.defaultSpec
    require(cur.fields.exists(_.name == fieldName),
      s"No partition field '$fieldName' in the default spec " +
        s"(has: ${cur.fields.map(_.name).mkString(", ")})")
    val newSpecId = meta.specs.map(_.specId).max + 1
    val newSpec = PartitionSpec(newSpecId, cur.fields.filterNot(_.name == fieldName))
    commit(meta.copy(specs = meta.specs :+ newSpec, defaultSpecId = newSpecId), conf)
  }

  /** Set (merge) table properties. */
  def setProperties(spark: SparkSession, path: String, props: Map[String, String]): TableMetadata = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = TableMetadata.load(path, conf)
    commit(meta.copy(properties = meta.properties ++ props), conf)
  }

  /** Remove table properties. */
  def removeProperties(spark: SparkSession, path: String, keys: Seq[String]): TableMetadata = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = TableMetadata.load(path, conf)
    commit(meta.copy(properties = meta.properties -- keys), conf)
  }

  /** Replace the table's DEFAULT sort order (reference `ALTER TABLE ... SET
    * SORTED BY`, test_set_sorted_by_metadata.test): an identical existing
    * order is REUSED by id; otherwise a new order-id = max+1 is appended —
    * existing data files keep their recorded order, only future writes
    * sort by the new default. `fields` = (column, ascending, nullsFirst);
    * empty = revert to unsorted (order 0). */
  def setSortOrder(spark: SparkSession, path: String,
      fields: Seq[(String, Boolean, Boolean)]): TableMetadata = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = TableMetadata.load(path, conf)
    val schema = meta.currentSchema
    val sortFields = fields.map { case (name, asc, nullsFirst) =>
      val f = schema.findField(name).getOrElse(
        throw new IllegalArgumentException(s"SET SORTED BY column '$name' not in table schema"))
      SortField(f.id, Transforms.Identity, asc, nullsFirst)
    }
    if (sortFields.isEmpty)
      return commit(meta.copy(defaultSortOrderId = 0,
        sortOrders =
          if (meta.sortOrders.exists(_.orderId == 0)) meta.sortOrders
          else meta.sortOrders :+ SortOrder(0, Nil)), conf)
    meta.sortOrders.find(_.fields == sortFields) match {
      case Some(existing) =>
        commit(meta.copy(defaultSortOrderId = existing.orderId), conf)
      case None =>
        val nextId = (meta.sortOrders.map(_.orderId) :+ 0).max + 1
        commit(meta.copy(
          sortOrders = meta.sortOrders :+ SortOrder(nextId, sortFields),
          defaultSortOrderId = nextId), conf)
    }
  }
}
