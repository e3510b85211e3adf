package graft.catalog

/** AWS-hosted-catalog ATTACH conveniences: synthesize the Iceberg REST
  * endpoint and SigV4 signing scope from a Glue catalog id or an S3 Tables
  * bucket ARN, so a user can attach with `endpoint-type=glue` /
  * `endpoint-type=s3_tables` instead of hand-assembling
  * `https://glue.<region>.amazonaws.com/iceberg`.
  *
  * Mirrors the reference's endpoint_type handling
  * (src/iceberg_attach.cpp:14-175): the same warehouse-format sanity
  * checks for Glue, the same ARN parse for S3 Tables, and the same
  * `<service>.<region>.amazonaws.com/iceberg` endpoint synthesis.
  */
object AwsEndpoints {

  /** Resolved attach parameters for an AWS-hosted REST catalog. */
  case class AwsAttach(endpoint: String, service: String, region: String, warehouse: String)

  /** `arn:<partition>:<service>:<region>:<account-id>:<resource>` —
    * colon-split preserving empty sections (iceberg_attach.cpp ParsedARN;
    * StringUtil::Split drops empties, which is why the reference hand-rolls
    * it too). */
  case class ParsedArn(partition: String, service: String, region: String,
      accountId: String, resource: String)

  def parseArn(arn: String): ParsedArn = {
    val parts = arn.split(":", 6)
    require(parts.length == 6 && parts(0) == "arn",
      s"Expected an AWS ARN of the form 'arn:<partition>:<service>:<region>:<account-id>:<resource>', got '$arn'")
    val p = ParsedArn(parts(1), parts(2), parts(3), parts(4), parts(5))
    require(p.partition.nonEmpty, s"Invalid PARTITION section of ARN: '$arn'")
    require(p.service.nonEmpty, s"Invalid SERVICE section of ARN: '$arn'")
    require(p.resource.nonEmpty, s"Invalid RESOURCE section of ARN: '$arn'")
    p
  }

  /** Accepted Glue warehouse formats
    * (docs.aws.amazon.com/glue/latest/dg/connect-glu-iceberg-rest.html,
    * reference SanityCheckGlueWarehouse): `:` (default catalog, current
    * account), `123456789012` (default catalog, given account),
    * `123456789012:cat` (specific catalog), `cat1/cat2` (nested, current
    * account), `123456789012:cat1/cat2` (nested, given account). */
  private val glueFormats = Seq(
    "^:$".r, "^\\d{12}$".r, "^\\d{12}:[^:/]+$".r,
    "^[^:]+/[^:]+$".r, "^\\d{12}:[^/]+/[^:]+$".r)

  def validateGlueWarehouse(warehouse: String): Unit =
    require(glueFormats.exists(_.matches(warehouse)),
      s"Invalid Glue catalog format: '$warehouse'. Expected ':', a 12-digit account id, " +
        "'catalog1/catalog2', or '12-digit-account:catalog1/catalog2'.")

  /** Glue Iceberg REST: region must come from the caller (the reference
    * reads it from the attached storage secret). */
  def forGlue(warehouse: String, region: String): AwsAttach = {
    validateGlueWarehouse(warehouse)
    require(region.nonEmpty, "Glue attach requires a region (sigv4.region or client.region)")
    AwsAttach(s"https://glue.$region.amazonaws.com/iceberg", "glue", region, warehouse)
  }

  /** S3 Tables: the warehouse IS the table-bucket ARN; region comes from
    * the ARN itself. */
  def forS3Tables(warehouseArn: String): AwsAttach = {
    val arn = parseArn(warehouseArn)
    require(arn.region.nonEmpty,
      s"Can't attach to S3 Tables with an ARN that has an empty REGION section: '$warehouseArn'")
    AwsAttach(s"https://s3tables.${arn.region}.amazonaws.com/iceberg", "s3tables",
      arn.region, warehouseArn)
  }

  /** Dispatch on the `endpoint-type` attach option. */
  def resolve(endpointType: String, warehouse: String, region: Option[String]): AwsAttach =
    endpointType.toLowerCase match {
      case "glue" => forGlue(warehouse, region.getOrElse(""))
      case "s3_tables" => forS3Tables(warehouse)
      case other => throw new IllegalArgumentException(
        s"Unrecognized 'endpoint-type' ($other), accepted options are: glue, s3_tables")
    }
}
