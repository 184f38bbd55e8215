package graft.report

import scala.collection.mutable

/** The SMTP delivery boundary (`Helper.cs:422-595` `SendMail`, the txt
  * templates under `code/www`): the ENGINE work — recipient selection
  * ([[MailReport.recipients]]), send gating ([[MailReport.shouldSend]]),
  * rendering ([[MailReport.render]]/[[MailReport.renderHtml]]) — is all
  * in [[MailReport]]; delivery itself is a trait so deployments plug in
  * a real SMTP client while this sandbox (no network) ships a no-op
  * default and tests assert against [[Mailer.Recording]]. Delivery
  * failures are the caller's to ledger (the reference wraps `SendMail`
  * in try/catch and error-logs, `Helper.cs:580-595`) — a broken mail
  * host must never fail the workflow run itself.
  */
trait Mailer {
  def send(mail: Mailer.Mail): Unit
}

object Mailer {

  final case class Mail(
      to: Seq[String],
      cc: Seq[String],
      subject: String,
      bodyText: String,
      bodyHtml: String)

  /** Sandbox default: delivery disabled (the send DECISION is still
    * ledgered by the engine, so monitoring sees what would have gone
    * out).
    */
  object NoOp extends Mailer {
    def send(mail: Mail): Unit = ()
  }

  /** Test double: records every delivery for assertions. */
  final class Recording extends Mailer {
    private val buf = mutable.ArrayBuffer.empty[Mail]
    def send(mail: Mail): Unit = synchronized { buf += mail }
    def sent: Seq[Mail] = synchronized(buf.toSeq)
  }

  /** Failure-injecting double for the delivery-error path. */
  final class Failing(message: String = "smtp unreachable") extends Mailer {
    def send(mail: Mail): Unit = throw new RuntimeException(message)
  }
}
