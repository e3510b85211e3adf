package graft.core

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.types._

/**
 * Iceberg type system and schema model.
 *
 * Type grammar follows the Iceberg table spec primitive/nested types as
 * exercised by the reference parser
 * (reference: src/core/metadata/schema/iceberg_column_definition.cpp:82-167
 * primitives, :189-241 nested). The Spark mapping is SURVEY.md §1.2.
 *
 * Field ids are carried into Spark as `parquet.field.id` metadata on every
 * StructField — load-bearing for field-id column resolution on read AND for
 * writing parquet with field ids.
 */
sealed trait IcebergType {
  /** Spark SQL equivalent type. */
  def toSpark: DataType
  /** Iceberg JSON representation (string for primitives, object for nested). */
  def typeJsonString: String
}

object IcebergTypes {
  case object BooleanT extends IcebergType { def toSpark = BooleanType; def typeJsonString = "boolean" }
  case object IntT extends IcebergType { def toSpark = IntegerType; def typeJsonString = "int" }
  case object LongT extends IcebergType { def toSpark = LongType; def typeJsonString = "long" }
  case object FloatT extends IcebergType { def toSpark = FloatType; def typeJsonString = "float" }
  case object DoubleT extends IcebergType { def toSpark = DoubleType; def typeJsonString = "double" }
  case object DateT extends IcebergType { def toSpark = DateType; def typeJsonString = "date" }
  /** No Spark TIME type — surfaced as LongType micros (documented gap). */
  case object TimeT extends IcebergType { def toSpark = LongType; def typeJsonString = "time" }
  case object TimestampT extends IcebergType { def toSpark = TimestampNTZType; def typeJsonString = "timestamp" }
  case object TimestampTzT extends IcebergType { def toSpark = TimestampType; def typeJsonString = "timestamptz" }
  /** ns variants floor to micros on read (documented precision loss). */
  case object TimestampNsT extends IcebergType { def toSpark = TimestampNTZType; def typeJsonString = "timestamp_ns" }
  case object TimestampTzNsT extends IcebergType { def toSpark = TimestampType; def typeJsonString = "timestamptz_ns" }
  case object StringT extends IcebergType { def toSpark = StringType; def typeJsonString = "string" }
  case object UuidT extends IcebergType { def toSpark = StringType; def typeJsonString = "uuid" }
  case class FixedT(length: Int) extends IcebergType { def toSpark = BinaryType; def typeJsonString = s"fixed[$length]" }
  case object BinaryT extends IcebergType { def toSpark = BinaryType; def typeJsonString = "binary" }
  case class DecimalT(precision: Int, scale: Int) extends IcebergType {
    def toSpark = DecimalType(precision, scale); def typeJsonString = s"decimal($precision, $scale)"
  }
  case object UnknownT extends IcebergType { def toSpark = NullType; def typeJsonString = "unknown" }
  /** Iceberg v3 variant — Spark 4 VariantType. `variant_get` predicates
    * prune on shredded-field bounds (read.VariantBounds, mirroring
    * reference iceberg_file_pruner.cpp:117-135); other predicates stay
    * conservative (reference iceberg_column_definition.cpp:142-144). */
  case object VariantT extends IcebergType { def toSpark = VariantType; def typeJsonString = "variant" }
  /** WKB-encoded geometry/geography with an optional CRS parameter —
    * `geometry(<crs>)` / `geography(<crs>)` (v3 spec; reference
    * iceberg_column_definition.cpp:148-166). Spark has no geometry type, so
    * the physical mapping is binary; the crs survives round-trips through
    * typeJsonString and is surfaced to Spark as column metadata. */
  case class GeometryT(crs: Option[String], geography: Boolean = false) extends IcebergType {
    def toSpark = BinaryType
    def typeJsonString = {
      val base = if (geography) "geography" else "geometry"
      crs.map(c => s"$base($c)").getOrElse(base)
    }
  }

  case class NestedField(
      id: Int,
      name: String,
      required: Boolean,
      fieldType: IcebergType,
      doc: Option[String] = None,
      initialDefaultJson: Option[JsonNode] = None,
      writeDefaultJson: Option[JsonNode] = None) {
    def toSpark: StructField = {
      val mb = new MetadataBuilder().putLong("parquet.field.id", id.toLong)
      fieldType match {
        case GeometryT(crs, geography) =>
          mb.putString("iceberg.type", if (geography) "geography" else "geometry")
          crs.foreach(c => mb.putString("iceberg.crs", c))
        // Spark has no TIME type: the column reads as LongType micros, and
        // this marker preserves the intent so round-trips re-declare `time`
        // (and users can format via IcebergTypes.formatTimeMicros).
        case TimeT => mb.putString("iceberg.type", "time")
        case _ =>
      }
      // Iceberg field docs surface as Spark column comments (the reference
      // maps doc -> DuckDB column comment, test_column_doc_comment.test).
      doc.foreach(d => mb.putString("comment", d))
      StructField(name, fieldType.toSpark, nullable = !required, metadata = mb.build())
    }
  }

  case class StructT(fields: Seq[NestedField]) extends IcebergType {
    def toSpark: DataType = StructType(fields.map(_.toSpark))
    def typeJsonString = "struct"
    def fieldById(id: Int): Option[NestedField] = fields.find(_.id == id)
  }
  case class ListT(elementId: Int, element: IcebergType, elementRequired: Boolean) extends IcebergType {
    def toSpark: DataType = ArrayType(element.toSpark, containsNull = !elementRequired)
    def typeJsonString = "list"
  }
  case class MapT(keyId: Int, key: IcebergType, valueId: Int, value: IcebergType, valueRequired: Boolean) extends IcebergType {
    def toSpark: DataType = MapType(key.toSpark, value.toSpark, valueContainsNull = !valueRequired)
    def typeJsonString = "map"
  }

  private val DecimalRe = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
  private val FixedRe = """fixed\[(\d+)\]""".r
  private val GeomRe = """geometry\((.+)\)""".r
  private val GeogRe = """geography\((.+)\)""".r

  /** Parse a primitive type string (reference :82-167). */
  def parsePrimitive(s: String): IcebergType = s match {
    case "boolean" => BooleanT
    case "int" | "integer" => IntT
    case "long" => LongT
    case "float" => FloatT
    case "double" => DoubleT
    case "date" => DateT
    case "time" => TimeT
    case "timestamp" => TimestampT
    case "timestamptz" => TimestampTzT
    case "timestamp_ns" => TimestampNsT
    case "timestamptz_ns" => TimestampTzNsT
    case "string" => StringT
    case "uuid" => UuidT
    case "binary" => BinaryT
    case "unknown" => UnknownT
    case "variant" => VariantT
    case DecimalRe(p, sc) => DecimalT(p.toInt, sc.toInt)
    case FixedRe(n) => FixedT(n.toInt)
    case "geometry" => GeometryT(None)
    case "geography" => GeometryT(None, geography = true)
    case GeomRe(crs) => GeometryT(Some(crs))
    case GeogRe(crs) => GeometryT(Some(crs), geography = true)
    case other => throw new IllegalArgumentException(s"Unsupported Iceberg type: $other")
  }

  /** Parse a type JSON node: primitive string or nested object. */
  def parseType(node: JsonNode): IcebergType = {
    if (node.isTextual) parsePrimitive(node.asText())
    else {
      node.get("type").asText() match {
        case "struct" =>
          val fs = node.get("fields").elements()
          val buf = Seq.newBuilder[NestedField]
          while (fs.hasNext) buf += parseField(fs.next())
          StructT(buf.result())
        case "list" =>
          ListT(node.get("element-id").asInt(), parseType(node.get("element")),
            node.get("element-required").asBoolean(false))
        case "map" =>
          MapT(node.get("key-id").asInt(), parseType(node.get("key")),
            node.get("value-id").asInt(), parseType(node.get("value")),
            node.get("value-required").asBoolean(false))
        case other => throw new IllegalArgumentException(s"Unsupported nested type: $other")
      }
    }
  }

  def parseField(node: JsonNode): NestedField = NestedField(
    id = node.get("id").asInt(),
    name = node.get("name").asText(),
    required = node.has("required") && node.get("required").asBoolean(false),
    fieldType = parseType(node.get("type")),
    doc = Option(node.get("doc")).map(_.asText()),
    initialDefaultJson = Option(node.get("initial-default")),
    writeDefaultJson = Option(node.get("write-default")))

  /** Parse a full schema object: {"type":"struct","schema-id":N,"fields":[...]}. */
  def parseSchema(node: JsonNode): IcebergSchema = {
    val st = parseType(node).asInstanceOf[StructT]
    IcebergSchema(Option(node.get("schema-id")).map(_.asInt()).getOrElse(0), st)
  }

  // ---- JSON emission (write path) ----

  def typeToJson(t: IcebergType, om: ObjectNode => Unit = _ => ()): JsonNode = {
    val f = com.fasterxml.jackson.databind.node.JsonNodeFactory.instance
    t match {
      case StructT(fields) =>
        val o = f.objectNode(); o.put("type", "struct")
        val arr = o.putArray("fields")
        fields.foreach(fl => arr.add(fieldToJson(fl)))
        o
      case ListT(eid, el, req) =>
        val o = f.objectNode(); o.put("type", "list"); o.put("element-id", eid)
        o.set[JsonNode]("element", typeToJson(el)); o.put("element-required", req); o
      case MapT(kid, k, vid, v, vreq) =>
        val o = f.objectNode(); o.put("type", "map"); o.put("key-id", kid)
        o.set[JsonNode]("key", typeToJson(k)); o.put("value-id", vid)
        o.set[JsonNode]("value", typeToJson(v)); o.put("value-required", vreq); o
      case prim => f.textNode(prim.typeJsonString)
    }
  }

  def fieldToJson(fl: NestedField): ObjectNode = {
    val f = com.fasterxml.jackson.databind.node.JsonNodeFactory.instance
    val o = f.objectNode()
    o.put("id", fl.id); o.put("name", fl.name); o.put("required", fl.required)
    o.set[JsonNode]("type", typeToJson(fl.fieldType))
    fl.doc.foreach(d => o.put("doc", d))
    fl.initialDefaultJson.foreach(d => o.set[JsonNode]("initial-default", d))
    fl.writeDefaultJson.foreach(d => o.set[JsonNode]("write-default", d))
    o
  }

  // ---- Spark -> Iceberg (write path schema derivation) ----

  /** Derive an Iceberg schema from a Spark schema, assigning fresh field ids
    * (pre-order, top-level first — matches fresh-id assignment semantics). */
  def fromSpark(schema: StructType): IcebergSchema = {
    var nextId = 0
    def alloc(): Int = { nextId += 1; nextId }
    def conv(dt: DataType): IcebergType = dt match {
      case BooleanType => BooleanT
      case ByteType | ShortType | IntegerType => IntT
      case LongType => LongT
      case FloatType => FloatT
      case DoubleType => DoubleT
      case DateType => DateT
      case TimestampType => TimestampTzT
      case TimestampNTZType => TimestampT
      case StringType => StringT
      case BinaryType => BinaryT
      case VariantType => VariantT
      case d: DecimalType => DecimalT(d.precision, d.scale)
      case ArrayType(et, containsNull) =>
        val id = alloc(); ListT(id, conv(et), !containsNull)
      case MapType(kt, vt, valueContainsNull) =>
        val kid = alloc(); val vid = alloc()
        MapT(kid, conv(kt), vid, conv(vt), !valueContainsNull)
      case st: StructType =>
        StructT(st.fields.toSeq.map { sf =>
          val id = alloc()
          NestedField(id, sf.name, required = !sf.nullable, conv(sf.dataType))
        })
      case other => throw new IllegalArgumentException(s"Cannot map Spark type $other to Iceberg")
    }
    // Two passes so top-level fields get ids 1..n before nested ids, matching
    // the common fresh-assignment layout.
    val topIds = schema.fields.map(_ => alloc())
    val fields = schema.fields.toSeq.zip(topIds.toSeq).map { case (sf, id) =>
      // An `iceberg.type=time` marker (set by NestedField.toSpark when a
      // time column surfaced as micros LONG) re-declares `time` on write —
      // intent survives the Spark round-trip.
      val t =
        if (sf.dataType == LongType && sf.metadata.contains("iceberg.type")
          && sf.metadata.getString("iceberg.type") == "time") TimeT
        // geometry/geography surface as WKB binary + intent marker; the
        // marker re-declares the Iceberg type on write so bbox bounds and
        // interop typing survive the Spark round-trip.
        else if (sf.dataType == BinaryType && sf.metadata.contains("iceberg.type")
          && Seq("geometry", "geography").contains(sf.metadata.getString("iceberg.type")))
          GeometryT(
            if (sf.metadata.contains("iceberg.crs")) Some(sf.metadata.getString("iceberg.crs")) else None,
            geography = sf.metadata.getString("iceberg.type") == "geography")
        else conv(sf.dataType)
      val doc = if (sf.metadata.contains("comment")) Some(sf.metadata.getString("comment")) else None
      NestedField(id, sf.name, required = !sf.nullable, t, doc = doc)
    }
    IcebergSchema(0, StructT(fields), lastColumnId = nextId)
  }

  /** Render a `time` column's microsecond value as HH:mm:ss[.ffffff] — the
    * formatting companion to the LongType-micros surface mapping. */
  def formatTimeMicros(micros: Long): String =
    java.time.LocalTime.ofNanoOfDay(micros * 1000L).toString
}

/** A versioned Iceberg schema: struct + schema-id. */
case class IcebergSchema(schemaId: Int, struct: IcebergTypes.StructT, lastColumnId: Int = 0) {
  def toSpark: StructType = struct.toSpark.asInstanceOf[StructType]
  def fields: Seq[IcebergTypes.NestedField] = struct.fields
  /** Top-level column by name, matching Spark's default case-insensitive
    * resolution — an exact-case match wins when two columns differ only by
    * case. */
  def findField(name: String): Option[IcebergTypes.NestedField] =
    fields.find(_.name == name).orElse(fields.find(_.name.equalsIgnoreCase(name)))
  /** Flat map of field-id -> (dotted name path, type) including nested fields. */
  lazy val idToField: Map[Int, IcebergTypes.NestedField] = {
    val buf = Map.newBuilder[Int, IcebergTypes.NestedField]
    def walk(t: IcebergType): Unit = t match {
      case IcebergTypes.StructT(fs) => fs.foreach { f => buf += (f.id -> f); walk(f.fieldType) }
      case IcebergTypes.ListT(_, el, _) => walk(el)
      case IcebergTypes.MapT(_, k, _, v, _) => walk(k); walk(v)
      case _ =>
    }
    walk(struct)
    buf.result()
  }
  def maxFieldId: Int = if (idToField.isEmpty) 0 else idToField.keys.max
  /** Dotted path (through structs) -> leaf field; includes top-level names.
    * Lets predicates and stats address nested struct leaves. */
  /** Inverse of [[fieldByPath]]: field id -> dotted path (structs only). */
  lazy val pathOfId: Map[Int, String] = fieldByPath.map { case (pth, f) => f.id -> pth }
  lazy val fieldByPath: Map[String, IcebergTypes.NestedField] = {
    val b = Map.newBuilder[String, IcebergTypes.NestedField]
    def walk(t: IcebergType, prefix: Seq[String]): Unit = t match {
      case IcebergTypes.StructT(fs) => fs.foreach { f =>
        b += ((prefix :+ f.name).mkString(".") -> f)
        walk(f.fieldType, prefix :+ f.name)
      }
      case _ =>
    }
    walk(struct, Nil)
    b.result()
  }
  def toJson: com.fasterxml.jackson.databind.node.ObjectNode = {
    val o = IcebergTypes.typeToJson(struct).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    o.put("schema-id", schemaId)
    o
  }
}
