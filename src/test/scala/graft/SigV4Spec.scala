package graft

import com.sun.net.httpserver.HttpServer
import graft.catalog.{CatalogOptions, RestCatalog, SigV4, SigV4Credentials}
import org.scalatest.funsuite.AnyFunSuite
import java.net.{InetSocketAddress, URI}
import java.time.Instant

/** SigV4 signing against AWS's PUBLISHED test vectors:
  *  - the key-derivation + IAM ListUsers worked example from the signing
  *    docs (docs.aws.amazon.com/IAM/latest/UserGuide/create-signed-request.html)
  *  - the `get-vanilla` and `get-vanilla-query-order-key-case` cases from
  *    the aws-sig-v4-test-suite (same credential set).
  */
class SigV4Spec extends AnyFunSuite {
  private val Secret = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"
  private val Access = "AKIDEXAMPLE"
  private val EmptySha = "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  private def signatureOf(canonicalRequest: String, amzDate: String, scope: String,
      key: Array[Byte]): String = {
    val sts = s"AWS4-HMAC-SHA256\n$amzDate\n$scope\n${SigV4.sha256Hex(canonicalRequest.getBytes("UTF-8"))}"
    hex(SigV4.hmacSha256(key, sts))
  }

  test("signing-key derivation matches the AWS docs example") {
    assert(hex(SigV4.signingKey(Secret, "20150830", "us-east-1", "iam")) ==
      "c4afb1cc5771d871763a393e44b703571b55cc28424d1a5e86da6ed3c154a4b9")
  }

  test("IAM ListUsers worked example signature") {
    val cr = SigV4.canonicalRequest("GET", "/", "Action=ListUsers&Version=2010-05-08",
      Seq("host" -> "iam.amazonaws.com",
        "content-type" -> "application/x-www-form-urlencoded; charset=utf-8",
        "x-amz-date" -> "20150830T123600Z"),
      EmptySha)
    assert(cr ==
      """GET
        |/
        |Action=ListUsers&Version=2010-05-08
        |content-type:application/x-www-form-urlencoded; charset=utf-8
        |host:iam.amazonaws.com
        |x-amz-date:20150830T123600Z
        |
        |content-type;host;x-amz-date
        |""".stripMargin + EmptySha)
    assert(signatureOf(cr, "20150830T123600Z", "20150830/us-east-1/iam/aws4_request",
      SigV4.signingKey(Secret, "20150830", "us-east-1", "iam")) ==
      "5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
  }

  test("aws-sig-v4-test-suite get-vanilla") {
    val cr = SigV4.canonicalRequest("GET", "/", null,
      Seq("host" -> "example.amazonaws.com", "x-amz-date" -> "20150830T123600Z"), EmptySha)
    assert(signatureOf(cr, "20150830T123600Z", "20150830/us-east-1/service/aws4_request",
      SigV4.signingKey(Secret, "20150830", "us-east-1", "service")) ==
      "5fa00fa31553b73ebf1942676e86291e8372ff2a2260956d9b8aae1d763fbf31")
  }

  test("aws-sig-v4-test-suite get-vanilla-query-order-key-case (query canonicalization sorts)") {
    val cr = SigV4.canonicalRequest("GET", "/", "Param2=value2&Param1=value1",
      Seq("host" -> "example.amazonaws.com", "x-amz-date" -> "20150830T123600Z"), EmptySha)
    assert(cr.linesIterator.toSeq(2) == "Param1=value1&Param2=value2")
    assert(signatureOf(cr, "20150830T123600Z", "20150830/us-east-1/service/aws4_request",
      SigV4.signingKey(Secret, "20150830", "us-east-1", "service")) ==
      "b97d918cfa904a5beff61c982a1b6f458b799221646efd99d3219ec94cdf2500")
  }

  test("uriEncode: unreserved pass-through, space as %20, slash control") {
    assert(SigV4.uriEncode("AZaz09-._~", encodeSlash = true) == "AZaz09-._~")
    assert(SigV4.uriEncode("a b+c", encodeSlash = true) == "a%20b%2Bc")
    assert(SigV4.uriEncode("/path/seg", encodeSlash = false) == "/path/seg")
    assert(SigV4.uriEncode("/path", encodeSlash = true) == "%2Fpath")
    assert(SigV4.uriEncode("é", encodeSlash = true) == "%C3%A9")
  }

  test("sign() produces a parseable authorization header with session token coverage") {
    val hdrs = SigV4.sign("GET", URI.create("https://glue.us-west-2.amazonaws.com/v1/config"),
      Map.empty, Array.empty,
      SigV4Credentials(Access, Secret, "us-west-2", "glue", sessionToken = Some("STOKEN")),
      Instant.parse("2015-08-30T12:36:00Z"))
    assert(hdrs("x-amz-date") == "20150830T123600Z")
    assert(hdrs("x-amz-content-sha256") == EmptySha)
    assert(hdrs("x-amz-security-token") == "STOKEN")
    val auth = hdrs("authorization")
    assert(auth.startsWith("AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-west-2/glue/aws4_request"))
    assert(auth.contains(
      "SignedHeaders=host;x-amz-content-sha256;x-amz-date;x-amz-security-token"))
    assert(auth.matches(".*Signature=[0-9a-f]{64}$"))
  }

  test("RestCatalog with sigv4 options sends signed requests (no bearer)") {
    @volatile var seen: Map[String, String] = Map.empty
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", ex => {
      seen = ex.getRequestHeaders.keySet().toArray.map(_.toString)
        .map(k => k.toLowerCase -> ex.getRequestHeaders.getFirst(k)).toMap
      val body = """{"defaults":{},"overrides":{}}""".getBytes("UTF-8")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body); ex.close()
    })
    server.start()
    try {
      val cat = new RestCatalog(s"http://127.0.0.1:${server.getAddress.getPort}",
        CatalogOptions(sigv4 = Some(SigV4Credentials(Access, Secret, "us-east-1", "glue"))))
      cat.config()
      assert(seen.get("authorization").exists(_.startsWith("AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/")))
      assert(seen.contains("x-amz-date") && seen.contains("x-amz-content-sha256"))
      assert(!seen.get("authorization").exists(_.startsWith("Bearer")))
    } finally server.stop(0)
  }
}
