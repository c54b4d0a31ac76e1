package graft.control

import scala.util.Try
import org.json4s._
import org.json4s.jackson.Serialization
import graft.functions.Scalars

/** K6: HMAC-signed webhook fired after a successful cycle (reference
  * src/utility.js:144-163, call site src/sources/era5monthly.js:104-121).
  * The transport is injected so tests (and offline environments) stub it;
  * errors are swallowed exactly as the reference swallows them — a webhook
  * failure must never fail an otherwise-committed cycle.
  */
object Webhook {
  implicit val formats: Formats = DefaultFormats

  type Transport = (String, String, Map[String, String]) => Unit

  def signature(secret: String, body: String): String =
    Scalars.hmacSha256(secret, body)

  /** POST `payload` to `url` with the `X-Gsky-Signature` header. Returns
    * whether the send succeeded; never throws.
    */
  def fire(url: String, secret: String, payload: Map[String, Any],
           transport: Transport): Boolean = {
    val body = Serialization.write(payload)
    Try(transport(url, body,
      Map("Content-Type" -> "application/json",
          "X-Gsky-Signature" -> signature(secret, body)))).isSuccess
  }
}
