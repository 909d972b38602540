package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for a training-data pipeline (task brief): language ID
  * (marker-token heuristic), quality scoring (length/punct/stopword ratios),
  * token counting (whitespace + BPE-ish regex), fingerprinting (rolling
  * hash — see graft.functions.expressions.RollingHash).
  *
  * Everything here is pure builtin Column algebra (codegen'd, zero UDFs) and
  * mirrored 1:1 in the DuckDB oracle SQL. Ratios are exact small-integer
  * rationals, rounded to 4 dp on both sides.
  */
object TextAnalysis {

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "with")

  /** (lang, marker tokens) — evaluation order below encodes the tie-break. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "nicht"),
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "los", "que", "y"),
    "fr" -> Seq("le", "les", "et", "dans"),
    "zh" -> Seq("的", "是", "了", "在"))

  private def toks(text: Column): Column = split(text, " ")

  private def markerScore(text: Column, markers: Seq[String]): Column =
    size(filter(toks(text), t => t.isin(markers.map(m => lit(m): Any): _*)))

  /** Language-ID scores + argmax prediction (ties broken by the fixed lang
    * order de < en < es < fr < zh, identical in the oracle SQL). */
  def langId(docs: DataFrame): DataFrame = {
    val scored = LangMarkers.foldLeft(docs.select(col("doc_id"), col("text"))) {
      case (df, (lang, markers)) => df.withColumn(s"s_$lang", markerScore(col("text"), markers))
    }
    val pred = when(col("s_de") >= greatest(col("s_en"), col("s_es"), col("s_fr"), col("s_zh")), "de")
      .when(col("s_en") >= greatest(col("s_es"), col("s_fr"), col("s_zh")), "en")
      .when(col("s_es") >= greatest(col("s_fr"), col("s_zh")), "es")
      .when(col("s_fr") >= col("s_zh"), "fr")
      .otherwise("zh")
    scored.select(col("doc_id"), pred.as("lang_pred"),
      col("s_de"), col("s_en"), col("s_es"), col("s_fr"), col("s_zh"))
  }

  /** Quality signals per document. */
  def quality(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    val nTok = size(t)
    val nChars = length(col("text"))
    val stop = size(filter(t, x => x.isin(Stopwords.map(s => lit(s): Any): _*)))
    val nonAlnum = length(regexp_replace(col("text"), "[a-z0-9 ]", ""))
    docs.select(
      col("doc_id"),
      nChars.as("n_chars"),
      nTok.as("n_tokens"),
      round((nChars - (nTok - 1)).cast("double") / nTok, 4).as("avg_token_len"),
      round(stop.cast("double") / nTok, 4).as("stopword_ratio"),
      round(nonAlnum.cast("double") / nChars, 4).as("punct_ratio"))
  }

  /** BPE-ish token regex: letter runs, digit runs, or single non-space. */
  val TokenRegex = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  /** Token counts: whitespace tokens, regex tokens, distinct tokens. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(toks(col("text"))).as("ws_tokens"),
      regexp_count(col("text"), lit(TokenRegex)).as("re_tokens"),
      size(array_distinct(toks(col("text")))).as("uniq_tokens"))
}
