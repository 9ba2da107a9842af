package graft.functions

import java.util.Locale

/** Greedy longest-match-first WordPiece tokenization — the public
  * BERT algorithm (Devlin et al. 2019; the reference's MiniLM encoder
  * (app.py:82-84) ships exactly this tokenizer beside its weights):
  *
  *  1. basic tokenization: lowercase (uncased convention), split on
  *     whitespace, then split punctuation into single-char tokens
  *     (letters/digits group, everything else stands alone);
  *  2. per word, repeatedly take the LONGEST prefix substring present
  *     in the vocabulary — continuation pieces look up with a `##`
  *     prefix — and emit it; a word with any unmatchable remainder
  *     collapses to `[UNK]` whole (the reference implementation's
  *     behavior, not piece-wise salvage).
  *
  * This is the tokenizer the encoder seam needs to serve a REAL
  * sentence-transformers export end-to-end: a MiniLM vocab is
  * line-per-token with `##` continuations, and the corpus regex
  * tokenizer ([[OnnxQueryEncoder.tokenRe]]) cannot produce those
  * subword ids. Pure driver-side string work — encode() runs per
  * query string, nothing here touches the cluster.
  */
object WordPiece {

  val Unk = "[UNK]"

  /** Basic-tokenize then WordPiece each word against `vocab` (token →
    * id). Words longer than `maxChars` become `[UNK]` without the
    * quadratic match attempt (the reference implementation's guard).
    */
  def tokenize(text: String, vocab: Map[String, Int],
               maxChars: Int = 200): Seq[String] =
    basicTokenize(text).flatMap { w =>
      if (w.length > maxChars) Seq(Unk)
      else {
        val pieces = scala.collection.mutable.ArrayBuffer.empty[String]
        var start = 0
        var bad = false
        while (start < w.length && !bad) {
          var end = w.length
          var cur: String = null
          while (cur == null && end > start) {
            val sub = (if (start > 0) "##" else "") + w.substring(start, end)
            if (vocab.contains(sub)) cur = sub else end -= 1
          }
          if (cur == null) bad = true
          else { pieces += cur; start = end }
        }
        if (bad) Seq(Unk) else pieces.toSeq
      }
    }

  /** Lowercase, whitespace-split, punctuation split out as single-char
    * tokens (BERT's BasicTokenizer minus accent stripping — the vocab
    * fixtures here are ASCII; a full-Unicode normalizer slots in
    * front without touching the WordPiece loop).
    */
  def basicTokenize(text: String): Seq[String] =
    text.toLowerCase(Locale.ROOT).split("\\s+").toSeq
      .filter(_.nonEmpty).flatMap(splitPunct)

  private def splitPunct(w: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val run = new StringBuilder
    w.foreach { c =>
      if (c.isLetterOrDigit) run.append(c)
      else {
        if (run.nonEmpty) { out += run.result(); run.clear() }
        out += c.toString
      }
    }
    if (run.nonEmpty) out += run.result()
    out.toSeq
  }
}
