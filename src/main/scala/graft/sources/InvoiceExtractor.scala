package graft.sources

/** S6 — unstructured source: invoice image bytes → CSV text. The reference
  * calls a vision LLM (core/etl_orchestrator.py:192-277); that HTTP call is
  * out of engine scope, so the engine models the boundary as a trait, exactly
  * as the reference's tests mock it (tests/test_invoice_processing.py:26-85).
  */
trait InvoiceExtractor {
  /** Return raw model output: CSV text, possibly wrapped in a markdown fence. */
  def extract(imageContent: Array[Byte], imageName: String): String
}

object InvoiceExtractor {

  /** F17 — strip a ```` ```csv ```` markdown fence if present, else pass
    * through trimmed (core/etl_orchestrator.py:264-267).
    */
  def stripMarkdownFence(text: String): String = {
    val m = java.util.regex.Pattern
      .compile("```(?:csv)?\\s*(.*?)```", java.util.regex.Pattern.DOTALL)
      .matcher(text)
    if (m.find()) m.group(1).trim else text.trim
  }

  /** Deterministic test double returning canned CSV (optionally fenced),
    * mirroring the reference's mock shape.
    */
  final case class Stub(cannedCsv: String) extends InvoiceExtractor {
    override def extract(imageContent: Array[Byte], imageName: String): String = cannedCsv
  }
}
