package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data pipelines: token counting,
 * quality scoring, language identification (n-gram/character heuristic) and
 * document fingerprinting. All are per-row, executor-parallel; the
 * whitespace token count is expressed in built-in functions (codegen) so the
 * DuckDB oracle can mirror it exactly.
 */
object TextAnalysis {

  /** Whitespace token count as a codegen-friendly Column — mirrors
    * `len(regexp_split_to_array(trim(text), '\s+'))` in the oracle. */
  def tokenCountCol(text: Column): Column = size(split(trim(text), "\\s+"))

  /** BPE-ish subword count: splits on word boundaries + digits; a cheap
    * upper-bound proxy for tokenizer counts. */
  val bpeishCount = udf((t: String) => {
    if (t == null) 0
    else "[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]".r.findAllIn(t).size
  })

  private val stopwords = Set("the", "a", "an", "and", "or", "of", "to", "in", "is",
    "it", "that", "this", "was", "for", "on", "with", "as", "at", "by", "be")

  /** Per-document quality features + a composite score in [0,1]. */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val features = udf((s: String) => {
      if (s == null || s.isEmpty) (0, 0.0, 0.0, 0.0)
      else {
        val words = s.toLowerCase.split("\\W+").filter(_.nonEmpty)
        val punct = s.count(c => !c.isLetterOrDigit && !c.isWhitespace)
        val stopRatio = if (words.isEmpty) 0.0 else words.count(stopwords).toDouble / words.length
        val meanLen = if (words.isEmpty) 0.0 else words.map(_.length).sum.toDouble / words.length
        (words.length, punct.toDouble / s.length, stopRatio, meanLen)
      }
    })
    df.withColumn("_f", features(t))
      .withColumn("word_count", col("_f._1"))
      .withColumn("punct_ratio", col("_f._2"))
      .withColumn("stopword_ratio", col("_f._3"))
      .withColumn("mean_word_len", col("_f._4"))
      .withColumn("quality_score",
        least(lit(1.0), greatest(lit(0.0),
          lit(0.3) * (col("word_count") / (col("word_count") + lit(20.0))) +
            lit(0.3) * (lit(1.0) - least(lit(1.0), col("punct_ratio") * 5)) +
            lit(0.2) * least(lit(1.0), col("stopword_ratio") * 4) +
            lit(0.2) * (lit(1.0) - abs(col("mean_word_len") - lit(5.0)) / lit(5.0)))))
      .drop("_f")
  }

  /** Language-ID heuristic: CJK character detection + tiny per-language
    * marker-word/character profiles (en/de/fr/es). Returns ISO code or
    * "und". */
  def langIdUdf = udf((s: String) => langId(s))

  private val markers: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "is", "you", "that", "it", "with", "for"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr" -> Set("le", "la", "les", "et", "est", "une", "que", "pour", "dans", "pas"),
    "es" -> Set("el", "la", "los", "que", "es", "una", "para", "con", "por", "del"))

  // O(1) Han test: UnicodeScript.of is a per-char binary search — over a
  // corpus it dominates langId. One BMP-sized lookup table built per JVM
  // gives the identical classification (supplementary-plane chars appear
  // as surrogates, which UnicodeScript also maps off-Han).
  private lazy val hanBmp: Array[Boolean] =
    Array.tabulate(0x10000)(c => Character.UnicodeScript.of(c) == Character.UnicodeScript.HAN)
  private val wordSplit = java.util.regex.Pattern.compile("\\W+")

  def langId(s: String): String = {
    if (s == null || s.isEmpty) return "und"
    val cjk = s.count(c => hanBmp(c))
    if (cjk > s.length / 10) return "zh"
    val words = wordSplit.split(s.toLowerCase).filter(_.nonEmpty)
    if (words.isEmpty) return "und"
    val scores = markers.map { case (lang, set) => lang -> words.count(set) }
    val (best, score) = scores.maxBy(_._2)
    // Diacritic tie-breakers for romance/german text with few stopwords.
    if (score == 0) {
      if (s.exists("äöüß".contains(_))) "de"
      else if (s.exists("éèêàçù".contains(_))) "fr"
      else if (s.exists("ñ¿¡".contains(_))) "es"
      else "und"
    } else best
  }

  /** PII patterns: deliberately simple character-class regexes (no
    * backrefs, no lookaround) so they mean the same thing under Java's
    * regex (Spark codegen) and RE2 (DuckDB oracle, other engines). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[A-Za-z0-9./_%-]+"
  val PhoneRe = "\\+[0-9]{7,15}"

  /** Per-document PII detection: counts of email / URL / phone matches plus
    * a redacted text column — entirely codegen'd builtins
    * (`regexp_extract_all` / `regexp_replace`), no UDF: at corpus scale
    * this runs inside whole-stage codegen with zero serialization. */
  def piiFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails", size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast("long"))
      .withColumn("n_urls", size(regexp_extract_all(t, lit(UrlRe), lit(0))).cast("long"))
      .withColumn("n_phones", size(regexp_extract_all(t, lit(PhoneRe), lit(0))).cast("long"))
      .withColumn("redacted",
        regexp_replace(regexp_replace(regexp_replace(t,
          EmailRe, "[EMAIL]"), UrlRe, "[URL]"), PhoneRe, "[PHONE]"))
  }

  /** Split documents into overlapping token-window chunks (context-window
    * packing for training): one output row per chunk, `chunk_start` = token
    * offset, stride = maxTokens - overlap. Pure builtins
    * (split/sequence/posexplode/slice) — the explode happens inside the
    * scan's task, so a 100 TB corpus chunks with zero extra shuffle and no
    * driver involvement; chunk rows flow straight into downstream dedup /
    * quality filters. */
  def chunkDocuments(df: DataFrame, textCol: String, idCol: String,
      maxTokens: Int = 64, overlap: Int = 16): DataFrame = {
    require(maxTokens > overlap && overlap >= 0,
      s"need maxTokens > overlap >= 0, got maxTokens=$maxTokens overlap=$overlap")
    val step = maxTokens - overlap
    df.withColumn("_words", split(trim(col(textCol)), "\\s+"))
      .select(col(idCol), col("_words"),
        posexplode(sequence(lit(0), greatest(size(col("_words")) - 1, lit(0)), lit(step))))
      .select(col(idCol),
        col("col").cast("long").as("chunk_start"),
        array_join(slice(col("_words"), col("col") + 1, lit(maxTokens)), " ").as("chunk_text"),
        least(size(col("_words")) - col("col"), lit(maxTokens)).cast("long").as("n_tokens"))
  }

  /** 64-bit rolling-hash document fingerprint over normalized text. */
  def fingerprintUdf = udf((s: String) => {
    if (s == null) 0L
    else {
      val norm = s.toLowerCase.replaceAll("\\s+", " ").trim
      var h = 0L
      var i = 0
      while (i < norm.length) { h = h * 31 + norm.charAt(i); i += 1 }
      h
    }
  })
}
