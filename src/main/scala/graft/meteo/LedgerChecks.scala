package graft.meteo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.ops.Quality.Check

/** The fetch ledger's database CHECK constraints as a reusable audit
  * preset (reference etl/db.py:76-85 plus the status enum/NOT NULL
  * column contracts): a lake has no CHECK constraints, so the same
  * guarantees run as one map-side-combined [[graft.ops.Quality.rowAudit]]
  * pass over the ledger table — zero scans beyond the audit itself.
  *
  *  - `valid_payload_path_format`: `payload_path ~ '^(https?|ftp|s3)://'
  *    OR payload_path ~ '^/[^ ]+'` (a URL scheme or an absolute,
  *    space-free path);
  *  - `valid_request_url_format`: `request_url ~ '^https?://'`;
  *  - `status_domain`: the FetchStatus enum column admits only its
  *    member values (SQLENUM rejects anything else at insert);
  *  - NOT NULL on payload_path / request_url (nullable=False columns).
  *
  * Null regex inputs evaluate to null → NOT violated (the Quality
  * contract) — the dedicated not-null checks count those rows, so the
  * format and presence failure modes stay separately attributable.
  */
object LedgerChecks {

  def checks(payloadPath: Column, requestUrl: Column, status: Column,
      validStatuses: Seq[String]): Seq[Check] = Seq(
    Check("valid_payload_path_format",
      !(payloadPath.rlike("^(https?|ftp|s3)://") ||
        payloadPath.rlike("^/[^ ]+"))),
    Check("valid_request_url_format", !requestUrl.rlike("^https?://")),
    Check("status_domain",
      !coalesce(status.isin(validStatuses: _*), lit(false))),
    Check("payload_path_not_null", payloadPath.isNull),
    Check("request_url_not_null", requestUrl.isNull))
}
