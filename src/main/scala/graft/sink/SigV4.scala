package graft.sink

import java.net.URI
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** AWS Signature Version 4 request signer (pure JDK crypto, no deps).
  *
  * The reference authenticates its Elasticsearch client with AWS4Auth
  * (reference lambda/main.py:52-58, service "es"); this is the same
  * publicly-documented algorithm: canonical request → string-to-sign →
  * HMAC-SHA256 key chain → Authorization header.
  *
  * Verified in SinkSpec against the published AWS documentation test vector
  * (the `iam ListUsers` example request).
  */
final case class SigV4Credentials(
    accessKeyId: String,
    secretAccessKey: String,
    region: String,
    service: String = "es",
    sessionToken: Option[String] = None)

object SigV4 {

  private val AmzDateFmt =
    DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'").withZone(ZoneOffset.UTC)

  private def sha256Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(bytes).map("%02x".format(_)).mkString

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(UTF_8))
  }

  /** RFC 3986 encode, keeping ONLY ASCII unreserved chars — SigV4's
    * required URI escaping (space → %20, not +). The check must be byte-
    * wise ASCII: Char.isLetterOrDigit is true for Latin-1 letters ≥ 0x80,
    * which would leak raw UTF-8 bytes into the canonical request and break
    * the signature for any non-ASCII path/query. */
  private def uriEncode(s: String, keepSlash: Boolean): String = {
    val sb = new StringBuilder
    s.getBytes(UTF_8).foreach { b =>
      val c = (b & 0xff).toChar
      val unreserved = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == '-' || c == '_' || c == '.' || c == '~'
      if (unreserved || (keepSlash && c == '/')) sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  /** Compute the headers SigV4 requires for one request.
    *
    * @param method  HTTP method, e.g. "POST"
    * @param uri     full request URI (path + query used for signing)
    * @param headers headers that will be sent and should be signed
    *                (lower-cased names not required; host is derived)
    * @param body    request payload
    * @param epochMillis signing time (injectable for deterministic tests)
    * @return headers to add: x-amz-date, Authorization, x-amz-content-sha256,
    *         and x-amz-security-token when a session token is present
    */
  def signedHeaders(
      creds: SigV4Credentials,
      method: String,
      uri: URI,
      headers: Map[String, String],
      body: Array[Byte],
      epochMillis: Long): Map[String, String] = {
    val amzDate = AmzDateFmt.format(java.time.Instant.ofEpochMilli(epochMillis))
    val dateStamp = amzDate.substring(0, 8)
    val payloadHash = sha256Hex(body)

    val host = {
      val p = uri.getPort
      if (p > 0 && p != 443 && p != 80) s"${uri.getHost}:$p" else uri.getHost
    }
    val baseHeaders = headers ++ Map(
      "host" -> host,
      "x-amz-date" -> amzDate) ++
      creds.sessionToken.map("x-amz-security-token" -> _)

    val canonHeaders = baseHeaders.map { case (k, v) => k.toLowerCase -> v.trim }.toSeq.sortBy(_._1)
    val signedHeaderNames = canonHeaders.map(_._1).mkString(";")
    val canonicalQuery = Option(uri.getRawQuery).filter(_.nonEmpty).map { q =>
      q.split("&").toSeq.map { kv =>
        val Array(k, v) = kv.split("=", 2).padTo(2, "")
        // decode first (raw %XX must not be double-encoded to %25XX),
        // then apply SigV4's single canonical encoding
        def dec(x: String) = java.net.URLDecoder.decode(x, UTF_8)
        (uriEncode(dec(k), keepSlash = false), uriEncode(dec(v), keepSlash = false))
      }.sorted.map { case (k, v) => s"$k=$v" }.mkString("&")
    }.getOrElse("")
    val canonicalPath = {
      val p = Option(uri.getPath).filter(_.nonEmpty).getOrElse("/")
      val once = uriEncode(p, keepSlash = true)
      // SigV4 canonicalizes the path ENCODED-TWICE for every service
      // except S3 (AWS sigv4 spec: "URI-encode each path segment twice")
      if (creds.service == "s3") once else uriEncode(once, keepSlash = true)
    }

    val canonicalRequest = Seq(
      method.toUpperCase,
      canonicalPath,
      canonicalQuery,
      canonHeaders.map { case (k, v) => s"$k:$v\n" }.mkString,
      signedHeaderNames,
      payloadHash).mkString("\n")

    val scope = s"$dateStamp/${creds.region}/${creds.service}/aws4_request"
    val stringToSign = Seq(
      "AWS4-HMAC-SHA256", amzDate, scope,
      sha256Hex(canonicalRequest.getBytes(UTF_8))).mkString("\n")

    val kDate = hmac(s"AWS4${creds.secretAccessKey}".getBytes(UTF_8), dateStamp)
    val kRegion = hmac(kDate, creds.region)
    val kService = hmac(kRegion, creds.service)
    val kSigning = hmac(kService, "aws4_request")
    val signature = hmac(kSigning, stringToSign).map("%02x".format(_)).mkString

    val auth = s"AWS4-HMAC-SHA256 Credential=${creds.accessKeyId}/$scope, " +
      s"SignedHeaders=$signedHeaderNames, Signature=$signature"

    Map(
      "x-amz-date" -> amzDate,
      "x-amz-content-sha256" -> payloadHash,
      "Authorization" -> auth) ++
      creds.sessionToken.map("x-amz-security-token" -> _)
  }
}
