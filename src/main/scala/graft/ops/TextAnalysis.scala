package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents(doc_id, text, lang, ...)`:
  * language-ID heuristic, quality scoring, token counting, document
  * fingerprinting. Formulas are deliberately expressible with portable
  * SQL arithmetic (length/replace) where an independent DuckDB oracle
  * checks them; the hash-based fingerprint is Spark-only (rows-check).
  */
object TextAnalysis {

  /** #occurrences of a literal substring — portable across engines. */
  def countOf(text: Column, s: String): Column =
    ((length(text) - length(replace(text, lit(s), lit("")))) / s.length).cast("long")

  /** Whitespace-token count: spaces + 1 on non-empty, single-spaced text. */
  def tokenCount(text: Column): Column =
    when(length(text) === 0, 0L).otherwise(countOf(text, " ") + 1L)

  /** BPE-ish subword-token ESTIMATE (r5): letter runs, digit runs, and
    * single non-alphanumeric marks each count one token — the
    * GPT-2-pattern skeleton that tracks real tokenizer counts far
    * closer than whitespace splitting (digits and punctuation inflate
    * subword counts). One portable regex class, so the DuckDB oracle
    * mirrors it (q19).
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0))).cast("long")

  /** Language-ID scorer (en/de/fr/es + script-detectable zh/ja/ko/ru/ar,
    * r6): per-language evidence from (a) script classes — kana ⇒ ja
    * (decisive even with ideographs present, real ja text mixes both),
    * hangul ⇒ ko, cyrillic ⇒ ru, arabic ⇒ ar, then the FULL CJK
    * ideograph class ⇒ zh; (b) language-characteristic letter classes
    * (ß/umlauts; French circumflexes/cedilla; ñ and inverted
    * punctuation); and (c) high-frequency function words at word
    * boundaries. Argmax with a deterministic tie order, "en" default.
    *
    * This production column is the codegen'd single-pass `LangId`
    * expression (the composable formula's generated code overflowed
    * janino's 64 KB method limit and knocked the whole projection out
    * of WholeStageCodegen). `langIdColFormula` is the bit-equivalent
    * portable formulation the DuckDB q12 oracle mirrors; equivalence is
    * asserted in TextAnalysisSpec on real sentences in all nine
    * languages.
    */
  def langIdCol(text: Column): Column =
    graft.functions.GraftFunctions.langid(text)

  /** Portable Catalyst formulation of the SAME scorer (length/replace
    * arithmetic + per-class regex counts) — exists so the formula is
    * expressible in ANSI SQL for the independent DuckDB oracle and as
    * the equivalence twin for the codegen'd expression.
    */
  def langIdColFormula(text: Column): Column = {
    // pad + lowercase so boundary-anchored function words match at
    // string edges and after sentence case
    val p = concat(lit(" "), lower(text), lit(" "))
    def c(s: String) = countOf(p, s)
    def w(s: String) = countOf(p, s" $s ")
    def cls(lo: Char, hi: Char) =
      size(regexp_extract_all(text,
        lit(f"[\\x{${lo.toInt}%04x}-\\x{${hi.toInt}%04x}]"), lit(0))).cast("long")
    val kana = cls('\u3040', '\u30ff')
    val hangul = cls('\uac00', '\ud7af')
    val cyr = cls('\u0400', '\u04ff')
    val arab = cls('\u0600', '\u06ff')
    val zh = cls('\u4e00', '\u9fff')
    val de = c("ß") * 3 + c("ä") + c("ö") + c("ü") +
      (w("und") + w("der") + w("die") + w("das") + w("ist") + w("nicht") + w("mit")) * 2
    val fr = c("é") + c("è") + c("ê") + c("ç") + c("ô") + c("î") + c("â") +
      (w("le") + w("la") + w("les") + w("et") + w("des") + w("est") + w("dans")) * 2
    val es = (c("ñ") + c("¿") + c("¡")) * 3 + c("á") + c("í") + c("ó") + c("ú") +
      (w("el") + w("los") + w("las") + w("que") + w("por") + w("con") + w("una")) * 2
    val en = (w("the") + w("and") + w("of") + w("to") + w("is") + w("in") + w("that")) * 2
    when(kana > lit(0L), "ja")
      .when(hangul > lit(0L), "ko")
      .when(cyr > lit(0L), "ru")
      .when(arab > lit(0L), "ar")
      .when(zh > lit(0L), "zh")
      .when(de >= fr && de >= es && de >= en && de > lit(0L), "de")
      .when(fr >= es && fr >= en && fr > lit(0L), "fr")
      .when(es >= en && es > lit(0L), "es")
      .otherwise("en")
  }

  def langId(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), langIdCol(col("text")).as("lang_pred"),
      col("lang").as("lang_true"))
      .orderBy(col("doc_id"))

  /** Quality score in [0,1]: length score x (1 - punct ratio) with a
    * mean-word-length sanity band. Pure arithmetic (oracle-friendly).
    */
  def qualityCols(text: Column): Seq[(String, Column)] = {
    val len = length(text).cast("double")
    val toks = tokenCount(text).cast("double")
    val punct = (countOf(text, ".") + countOf(text, ",") + countOf(text, "!") +
      countOf(text, "?") + countOf(text, ";")).cast("double")
    val meanWordLen = when(toks > 0, (len - toks + 1) / toks).otherwise(0.0)
    val lenScore = least(len / 500.0, lit(1.0))
    val punctRatio = when(len > 0, punct / len).otherwise(1.0)
    val wordLenOk = when(meanWordLen >= 2.0 && meanWordLen <= 12.0, 1.0).otherwise(0.5)
    Seq(
      "n_tokens" -> toks.cast("long"),
      "mean_word_len" -> round(meanWordLen, 4),
      "punct_ratio" -> round(punctRatio, 6),
      "quality" -> round(lenScore * (lit(1.0) - punctRatio) * wordLenOk, 6))
  }

  def quality(docs: DataFrame): DataFrame = {
    val cols = qualityCols(col("text"))
    docs.select(col("doc_id") +: cols.map { case (n, c) => c.as(n) }: _*)
      .orderBy(col("doc_id"))
  }

  /** Document quality GATE with per-reason reject accounting (r6) —
    * the Gopher-style filter stage a training-data pipeline runs
    * between extraction and dedup, with the same no-silent-drop rule
    * as the LSH band caps: every rejected document lands in a counted,
    * named reason class. Reasons evaluate in a fixed priority order
    * (first failure wins), so the counts partition the corpus exactly.
    * Thresholds compare the ROUNDED metric columns (6 dp), making the
    * formula bit-mirrorable in the DuckDB oracle (q20).
    */
  def qualityFilterStats(docs: DataFrame,
                         minTokens: Long = 20, maxTokens: Long = 80,
                         maxPunctRatio: Double = 0.02,
                         minQuality: Double = 0.4): DataFrame =
    docs.select(qualityReason(col("text"),
      minTokens, maxTokens, maxPunctRatio, minQuality).as("reason"))
      .groupBy("reason").agg(count(lit(1)).as("n_docs"))
      .orderBy("reason")

  /** The gate's reason column ("0_kept" or the first failing class) —
    * shared by q20's stats query and `CorpusPipeline`'s filter stage.
    */
  def qualityReason(text: Column,
                    minTokens: Long, maxTokens: Long,
                    maxPunctRatio: Double, minQuality: Double): Column = {
    val m = qualityCols(text).toMap
    when(m("n_tokens") < minTokens, "1_too_short")
      .when(m("n_tokens") > maxTokens, "2_too_long")
      .when(m("punct_ratio") > maxPunctRatio, "3_punct_heavy")
      .when(m("quality") < minQuality, "4_low_quality")
      .otherwise("0_kept")
  }

  /** Unicode NFC normalization + language-aware segmentation for the
    * tokenizer-bound training-data surface (SURVEY §2.7; VERDICT r3
    * "next" #7). Extraction output itself stays UN-normalized (golden
    * byte-identity is the north rule); this is the opt-in shape.
    *
    * The corpus is born NFC, so the query first DEnormalizes the
    * accented vowels into combining sequences — the nfc() expression
    * must then provably recombine them (recombined > 0 on accented
    * docs, and nfc_len == the original codepoint count). Segmentation
    * is language-aware in the way that matters at crawl scale:
    * space-free CJK counts per-ideograph, spaced scripts per
    * whitespace token.
    */
  def normalize(docs: DataFrame): DataFrame = {
    import graft.functions.GraftFunctions.nfc
    // the driver fixture's text is pure ASCII, which would make every
    // normalization branch trivially zero — plant accents + CJK
    // deterministically IN-QUERY (mirrored literally in the oracle SQL)
    // so the DuckDB gate exercises real recombination and segmentation
    val seeded = replace(col("text"),
      lit("spark"), lit("sp\u00e4rk caf\u00e9 \u6f22\u5b57"))
    // NFC → NFD for the planted accent set (ä é: base + U+0308/U+0301)
    val decomp = replace(replace(seeded,
      lit("\u00e9"), lit("e\u0301")), lit("\u00e4"), lit("a\u0308"))
    val renorm = nfc(decomp)
    val cjkOnly = regexp_replace(seeded, "[\\x{4e00}-\\x{9fff}]", "")
    val spaced = regexp_replace(seeded, "[\\x{4e00}-\\x{9fff}]", " ")
    docs.select(
      col("doc_id"),
      md5(renorm).as("nfc_md5"),
      length(renorm).cast("long").as("nfc_len"),
      (length(decomp) - length(renorm)).cast("long").as("recombined"),
      (length(seeded) - length(cjkOnly)).cast("long").as("cjk_chars"),
      (length(seeded) - length(cjkOnly) +
        size(filter(split(spaced, "\\s+"), t => length(t) > 0))).cast("long").as("seg_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Sentence segmentation stats (q17, r4 — SURVEY §7.2 r5 #5): rule
    * -based terminator-run counting, portable across engines (both RE2
    * and Java regex agree on this class), so the DuckDB oracle holds.
    * The fixture text carries no sentence punctuation, so terminators
    * are planted in-query (mirrored literally in the oracle SQL).
    */
  def sentences(docs: DataFrame): DataFrame = {
    val seeded = replace(col("text"), lit("spark"), lit("spark."))
    val runs = size(regexp_extract_all(seeded, lit("[.!?]+"), lit(0)))
    val nSent = greatest(runs, when(length(trim(seeded)) > 0, 1).otherwise(0))
    val toks = tokenCount(seeded).cast("double")
    docs.select(
      col("doc_id"),
      runs.cast("long").as("term_runs"),
      nSent.cast("long").as("n_sentences"),
      round(when(nSent > 0, toks / nSent.cast("double")).otherwise(0.0), 4)
        .as("mean_sentence_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Document fingerprint: min/max xxhash64 over word 5-gram rolling
    * windows (winnowing-lite). Spark-only (no portable SQL xxhash64).
    */
  /** Document fingerprints by WINNOWING (Schleimer/Wilkerson/Aiken '03):
    * hash the word n-grams, slide a window of `w` hashes, keep each
    * window's minimum, distinct. Guarantee: any shared run of ≥ n+w-1
    * words yields a shared fingerprint. Entirely per-row higher-order
    * functions — NO explode, NO shuffle (the r1 version hash-aggregated
    * exploded grams).
    */
  def fingerprint(docs: DataFrame, n: Int = 5, w: Int = 4): DataFrame =
    fingerprints(docs, n, w)
      .select(col("doc_id"), size(col("fps")).as("n_fp"),
        array_min(col("fps")).as("fp_min"), array_max(col("fps")).as("fp_max"))
      .orderBy(col("doc_id"))

  /** (doc_id, fps: array<long>) — the raw winnowed fingerprint sets.
    *
    * Semantics = `array_distinct(transform(sequence(0, size(hs)-w),
    * i -> array_min(slice(hs, i+1, w))))` over `hs = transform(
    * ngramCol(text, n), xxhash64)`, but computed by the single-pass
    * `WinnowFingerprints` expression — the HOF form re-evaluated the
    * whole gram+hash pipeline per window index (quadratic per
    * document, the same trap as shingles/ngramCol; r6). Equivalence
    * asserted in DedupSpec.
    */
  def fingerprints(docs: DataFrame, n: Int = 5, w: Int = 4): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.GraftFunctions.winnow(col("text"), n, w).as("fps"))

  /** Corpus-LM quality score (q26) — the CCNet idea (Wenzek et al.
    * 2020: score documents under a language model trained on a trusted
    * corpus; low likelihood ⇒ garbled/junk) recast so model and corpus
    * are the same relational pipeline: the "model" is the character
    * k-gram DOCUMENT FREQUENCY table of the corpus itself, and a
    * document's score is the mean log document-frequency of its
    * distinct k-grams,
    *
    *   lm_score(d) = mean_{g ∈ grams(d)} ln(df(g) / N).
    *
    * Text whose character sequences look like the rest of the corpus
    * scores near 0; mojibake, base64 blobs, wrong-charset text and
    * keyboard mash score far negative because their grams appear in
    * few documents. No smoothing is needed: every gram of a scored
    * document exists in the model with df ≥ 1 (train = score corpus).
    * Scoring over the DISTINCT gram set (not token multiplicity) keeps
    * the gram path on the linear single-pass `CharShingles` expression
    * and makes the score a pure inventory property — repetition is
    * q21's signal, not this one.
    *
    * SCALE SHAPE: grams ride as 16-byte md5 digests; df is a two-level
    * hash agg on the digest; score is ONE digest-key shuffle join of
    * corpus grams against the df table (both sides already partitioned
    * by the same key — AQE handles the residual skew of stop-grams,
    * whose df rows are single-digit bytes), then a per-doc hash agg.
    * ln N folds in AFTER aggregation via a broadcast 1-row count, so
    * the scalar never rides the gram rows. At 100 TB the df table can
    * be trained once on a slice and reused (train ≠ score split), but
    * the join shape is unchanged.
    */
  /** Block-list content filter (q27) — the C4 curation stage (Raffel
    * et al. 2020 dropped any page containing a term from a public
    * block list): per-document count of block-listed terms and the
    * keep flag. The list is a PARAMETER (the driver fixture uses
    * neutral spam markers); matching is word-boundary on lowercased
    * text via ONE alternation regex — RE2-portable, so the DuckDB
    * oracle runs the identical pattern (the q22 convention). Pure
    * per-row projection: no UDF, no shuffle.
    */
  def blocklistStats(docs: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty && terms.forall(_.matches("[a-z0-9]+")),
      "blocklist terms must be lowercase alphanumeric (regex-safe)")
    val pat = terms.mkString("\\b(", "|", ")\\b")
    // no orderBy here (r7, ADVICE): ordering is presentation, applied
    // at the query edge — the op stays the pure per-row projection its
    // contract claims, so pipeline-scale callers pay no sort exchange
    docs.select(col("doc_id"),
        regexp_count(lower(col("text")), lit(pat)).as("n_blocked"))
      .withColumn("kept", col("n_blocked") === 0)
  }

  def lmQuality(docs: DataFrame, k: Int = 3): DataFrame = {
    val grams = docs.select(col("doc_id"),
        explode(graft.functions.GraftFunctions.charShingles(col("text"), k)).as("gram"))
      .select(col("doc_id"), md5(col("gram")).as("g"))
    // grams are per-doc DISTINCT, so count(*) per digest = document freq
    val dfreq = grams.groupBy("g").agg(count(lit(1)).as("df"))
    val perDoc = grams.join(dfreq, Seq("g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        avg(log(col("df").cast("double"))).as("avg_ln_df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        when(col("n_grams").isNotNull,
          round(col("avg_ln_df") - log(col("n_docs").cast("double")), 4))
          .otherwise(lit(0.0)).as("lm_score"))
    // no orderBy here (r7, ADVICE): the op's only shuffle is the
    // digest-keyed df aggregate; ordering belongs to the query edge
  }
}
