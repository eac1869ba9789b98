package graft.meteo

import scala.annotation.tailrec

/** The reference's HTTP retry ladder (etl/extract.py:64-84), modeled as
  * a transport-agnostic executor so the ONE piece a real deployment must
  * supply — the socket — is injected, and everything the reference
  * actually encodes about retry POLICY is implemented and unit-testable
  * in a zero-egress sandbox:
  *
  *  - `total = 5` retries, `backoff_factor = 0.5` (urllib3 schedule:
  *    the first retry is immediate, retry n ≥ 2 sleeps
  *    `backoff · 2^(n−1)` seconds — 1.0, 2.0, 4.0, 8.0 for 0.5);
  *  - retry on `status_forcelist = {500, 502, 503, 504}` and on
  *    transport (connection) errors; every other status returns
  *    immediately;
  *  - `respect_retry_after_header = True`: a parseable `Retry-After`
  *    seconds value OVERRIDES the computed backoff for that wait;
  *  - `allowed_methods = {GET}`: non-GET requests never retry
  *    (side-effecting verbs are not idempotent);
  *  - `raise_on_status = False`: after the budget is spent the LAST
  *    response comes back to the caller — which is what lets the
  *    extract stage record `response_status` + `error_data` into the
  *    fetch ledger ([[ExtractErrors]] transport ≻ parse ≻ load
  *    taxonomy) instead of dying on an exception;
  *  - per-source `User-Agent` header injected on every request
  *    (etl/extract.py:83).
  *
  * The sleeper is injected too, so specs drive the ladder through a
  * virtual clock and assert the exact wait sequence.
  */
object RetryLadder {

  /** Minimal transport response (status + headers + body). */
  final case class Response(status: Int, headers: Map[String, String],
      body: String)

  /** What one attempt produced: a response, or a transport error. */
  type Attempt = Either[Throwable, Response]

  /** The socket a real deployment supplies. Headers carry User-Agent. */
  trait Transport {
    def request(method: String, url: String, params: Map[String, String],
        headers: Map[String, String]): Attempt
  }

  final case class Policy(
      maxRetries: Int = 5,
      backoffFactor: Double = 0.5,
      statusForcelist: Set[Int] = Set(500, 502, 503, 504),
      allowedMethods: Set[String] = Set("GET"),
      respectRetryAfter: Boolean = true)

  /** Outcome: the final attempt plus the full attempt/wait trace (the
    * ledger wants attempt counts; specs want the wait schedule). */
  final case class Outcome(result: Attempt, attempts: Int,
      waitsSeconds: Seq[Double])

  /** urllib3 `get_backoff_time`: 0 before the second retry, then
    * `backoff · 2^(n−1)` for retry n. */
  def backoffSeconds(retryNumber: Int, factor: Double): Double =
    if (retryNumber <= 1) 0.0 else factor * math.pow(2.0, retryNumber - 1)

  private def retryAfter(r: Response): Option[Double] =
    r.headers.collectFirst {
      case (k, v) if k.equalsIgnoreCase("Retry-After") => v
    }.flatMap(v => scala.util.Try(v.trim.toDouble).toOption)
      .filter(_ >= 0)

  /** Run one logical request through the ladder. `sleep` receives each
    * computed wait (seconds) — inject a recorder in tests, a real
    * `Thread.sleep` adapter in a deployment. */
  def execute(transport: Transport, method: String, url: String,
      params: Map[String, String], userAgent: String,
      policy: Policy = Policy())(
      sleep: Double => Unit = s => Thread.sleep((s * 1000).toLong)): Outcome = {
    val headers = Map("User-Agent" -> userAgent)
    val budget = if (policy.allowedMethods.contains(method)) policy.maxRetries
      else 0

    @tailrec
    def loop(attempt: Int, waits: List[Double]): Outcome = {
      val res = transport.request(method, url, params, headers)
      val retryable = res match {
        case Left(_) => true // transport error
        case Right(r) => policy.statusForcelist.contains(r.status)
      }
      if (!retryable || attempt > budget)
        Outcome(res, attempt, waits.reverse)
      else {
        val computed = backoffSeconds(attempt, policy.backoffFactor)
        val wait = res match {
          case Right(r) if policy.respectRetryAfter =>
            retryAfter(r).getOrElse(computed)
          case _ => computed
        }
        if (wait > 0) sleep(wait)
        loop(attempt + 1, wait :: waits)
      }
    }
    loop(1, Nil)
  }
}
