package graft.meteo

import java.net.{HttpURLConnection, URI, URLEncoder}

/** A REAL socket behind [[RetryLadder.Transport]] — JDK
  * `HttpURLConnection` only, no added dependencies: the piece a live
  * deployment plugs into [[RetryLadder.execute]] to reproduce the
  * reference's extract stage (etl/extract.py:64-84, urllib3 session
  * with its retry ladder) against api.open-meteo.com or any registered
  * [[Sources.SourceDef]] url.
  *
  * Contract mapping (the ladder owns policy, the transport owns I/O):
  *  - any thrown I/O error (DNS, connect/read timeout, TLS) returns
  *    `Left(e)` — the ladder's "transport error, retryable" arm, like
  *    urllib3's `ConnectionError` family;
  *  - every HTTP response, 2xx..5xx, returns `Right(Response)` with
  *    status, headers (first value per name — enough for Retry-After)
  *    and the UTF-8 body (error stream for >=400) — the ladder decides
  *    retry from `statusForcelist`, exactly like `Retry(status_forcelist
  *    =[500,502,503,504])`;
  *  - redirects stay OFF: the reference API never redirects, and a
  *    silent 3xx-follow would hide the status from the ladder's trace.
  *
  * This class is exercised for real by the opt-in
  * `IntegrationSpec` (`GRAFT_HTTP_OK=1` — zero-egress sandboxes skip
  * it); its policy/trace behavior is fully covered transport-free by
  * `RetryLadder`'s scripted specs.
  */
final case class HttpTransport(connectTimeoutMs: Int = 10000,
    readTimeoutMs: Int = 30000) extends RetryLadder.Transport {

  private def enc(s: String) = URLEncoder.encode(s, "UTF-8")

  /** `url` ++ query params, appended after any existing query. */
  private[meteo] def fullUrl(url: String,
      params: Map[String, String]): String =
    if (params.isEmpty) url
    else {
      val qs = params.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
      url + (if (url.contains("?")) "&" else "?") + qs
    }

  def request(method: String, url: String, params: Map[String, String],
      headers: Map[String, String]): RetryLadder.Attempt =
    try {
      val conn = new URI(fullUrl(url, params)).toURL.openConnection()
        .asInstanceOf[HttpURLConnection]
      try {
        conn.setRequestMethod(method)
        conn.setConnectTimeout(connectTimeoutMs)
        conn.setReadTimeout(readTimeoutMs)
        conn.setInstanceFollowRedirects(false)
        headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
        val status = conn.getResponseCode
        import scala.jdk.CollectionConverters._
        val hdrs = conn.getHeaderFields.asScala.collect {
          case (k, vs) if k != null && !vs.isEmpty => k -> vs.get(0)
        }.toMap
        val stream =
          if (status >= 400) Option(conn.getErrorStream)
          else Option(conn.getInputStream)
        val body = stream.map { in =>
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        }.getOrElse("")
        Right(RetryLadder.Response(status, hdrs, body))
      } finally conn.disconnect()
    } catch { case e: java.io.IOException => Left(e) }
}
