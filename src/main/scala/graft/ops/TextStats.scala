package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token/length/punctuation statistics, stopword-based quality signals,
  * heuristic language ID, regex token counting, and min-hash document
  * fingerprinting. All per-row narrow transformations (no shuffle) built
  * from codegen'd builtin expressions — at 100 TB these run at scan speed;
  * only the explicit profile aggregations shuffle (one partial-agg pass).
  */
object TextStats {

  /** Tiny stopword list shared with the DuckDB oracle queries. */
  val Stopwords: Seq[String] = Seq("the", "a", "and", "of", "to")

  /** Per-document statistics: token count, punctuation count, stopword
    * count and ratio. One IEEE division per ratio (identical operands in
    * any engine -> bit-identical result).
    */
  def withStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = split(t, " ")
    docs
      .withColumn("n_tokens", size(toks))
      .withColumn("punct_cnt",
        length(t) - length(regexp_replace(t, "[.,!?;:]", "")))
      .withColumn("stop_cnt",
        size(filter(toks, tok => tok.isin(Stopwords: _*))))
      .withColumn("stop_ratio",
        col("stop_cnt").cast("double") / col("n_tokens").cast("double"))
  }

  /** Gopher-style repetition quality signals (the "repetitious content"
    * family of pretraining filters): most-frequent-token count and
    * duplicate-bigram count per document, plus an integer-threshold
    * `keep` flag — top token must be <= 20% of tokens AND duplicate
    * bigrams <= 10% of bigrams. Thresholds compare by exact integer
    * cross-multiplication (`top*5 <= n`), no float epsilon.
    *
    * Pure per-row array math — zero shuffles, computable inside any
    * scan. The top-token count is a single `aggregate` pass over the
    * SORTED token array (longest equal-run length == max frequency), so
    * the per-row cost is one sort + one walk — not the
    * distinct × tokens array-materializing sweep a naive
    * transform+filter composition pays (measured: that shape was 7 ms/doc
    * of interpreted-lambda allocation at sf0.1).
    */
  def repetitionStats(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = col("_toks")
    val bg = col("_bg")
    val nDistinctBg = col("_nbgd")
    // Longest run in the sorted array: tokens are never "" (filtered), so
    // the "" initial `prev` can't extend a run.
    val topRun = aggregate(
      array_sort(toks),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc("prev"), acc("run") + 1).otherwise(lit(1))
        struct(x.as("prev"), run.as("run"), greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))
    docs
      // Total on null text: a null would otherwise poison every derived
      // column (size(null) = -1) and the keep flag with it.
      .withColumn("_toks", filter(split(coalesce(col(textCol), lit("")), " "), t => t =!= ""))
      .withColumn("_bg",
        when(size(toks) >= 2,
          transform(sequence(lit(1), size(toks) - 1),
            i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))
          .otherwise(array().cast("array<string>")))
      .withColumn("_nbgd", size(array_distinct(bg)))
      .withColumn("_top", topRun)
      .select(
        col(idCol),
        size(toks).cast("long").as("n_tok"),
        col("_top").cast("long").as("top_tok_n"),
        size(bg).cast("long").as("n_bigrams"),
        nDistinctBg.cast("long").as("n_distinct_bigrams"),
        when(col("_top") * 5 <= size(toks) &&
            (size(bg) - nDistinctBg) * 10 <= size(bg), lit(1L))
          .otherwise(lit(0L)).as("keep"))
  }

  /** Corpus profile per language: doc counts, token sums, exact-integer
    * sums emitted, averages as a single division.
    */
  def langProfile(docs: DataFrame, textCol: String = "text"): DataFrame =
    withStats(docs, textCol)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        sum(col("n_chars")).as("sum_chars"),
        sum(col("stop_cnt")).as("sum_stop"))
      .withColumn("avg_tokens",
        col("sum_tokens").cast("double") / col("n_docs").cast("double"))

  /** Heuristic n-gram/stopword language ID. Deliberately simple (marker
    * token presence, first match wins) — the operator shape is a chain of
    * narrow `array_contains` checks; swap in real profiles at will.
    */
  def withLangId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = split(col(textCol), " ")
    def has(w: String): Column = array_contains(toks, w)
    docs.withColumn("lang_pred",
      when(has("the") || has("of"), "en")
        .when(has("der") || has("und"), "de")
        .when(has("le") || has("et"), "fr")
        .when(has("el") || has("y"), "es")
        .otherwise("unk"))
  }

  /** BPE-ish token counting: alpha runs, digit runs, and single symbols
    * each count as one token (a cheap proxy for subword tokenizer load).
    */
  def withRegexTokens(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("n_regex_tokens",
      size(regexp_extract_all(col(textCol), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))))

  /** Rolling-window document fingerprint: the minimum md5 over all 8-char
    * windows of the text (winnowing-style min-hash of character grams).
    * Stays per-row: `transform` + `array_min`, no explode, no shuffle.
    */
  def withFingerprint(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.withColumn("fingerprint",
      when(length(t) < 8, md5(t)).otherwise(
        array_min(transform(
          sequence(lit(1), length(t) - lit(7)),
          i => md5(t.substr(i, lit(8)))))))
  }

  /** 32-bit SimHash over whitespace tokens with md5-derived token hashes
    * (portable across engines: `conv(substr(md5(tok),1,8),16,10)`).
    * Bit i of the output is 1 iff the sum of (+1/-1) votes of all token
    * hashes' bit i is strictly positive. One explode + one hash-agg; the
    * 32 vote counters accumulate in a single one-pass
    * [[graft.functions.SimhashAgg]] (bit-identical to the 32-column
    * `sum(when(...))` formulation it replaced — see SimhashAggSpec).
    */
  def simhash32(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.graft.Exprs
    val tok = explode(split(col(textCol), " ")).as("tok")
    val h = conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long")
    docs.select(col(idCol), tok)
      .withColumn("h", h)
      .groupBy(col(idCol))
      .agg(Exprs.column(
        graft.functions.SimhashAgg(Exprs.expression(col("h"))).toAggregateExpression())
        .as("simhash"))
  }

  /** Hamming distance between two simhash values (for near-dup banding). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Corpus-frequency rarity score — the integer-exact cousin of
    * perplexity-based quality filtering (CCNet-style): per document, the
    * token count, the SUM of each token's corpus-wide frequency, and
    * their ratio `mean_freq` (a high mean = common/templated text, a low
    * mean = rare-token-dense text — scores feed "too weird / too
    * boilerplate" band filters). Counts stay BIGINT end-to-end and the
    * ratio is the ONE final IEEE division, so any engine reproduces the
    * scores bit-for-bit — deliberately NOT `log p` perplexity, whose
    * transcendental is not correctly-rounded-guaranteed across libms.
    * Documents with no tokens carry no score and are omitted (left-join
    * the result back to keep them).
    *
    * Scale shape: explode once; token frequencies are a vocab-sized agg
    * joined back on the token (AQE broadcasts a small vocab, shuffles a
    * genuinely huge one — both correct); one per-doc agg. No corpus-wide
    * collect, no window over the whole corpus.
    */
  def rarityScore(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val tk = docs
      .select(col(idCol), explode(split(coalesce(col(textCol), lit("")), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val counts = tk.groupBy("tok").agg(count(lit(1)).as("tok_freq"))
    tk.join(counts, "tok")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tok"),
        sum("tok_freq").as("sum_freq"))
      .withColumn("mean_freq",
        col("sum_freq").cast("double") / col("n_tok").cast("double"))
  }

  /** Cross-document bigram novelty — the template/boilerplate signal
    * [[rarityScore]] (token-level) and the Gopher repetition filter
    * (intra-doc) both miss: a templated document's word PAIRS repeat
    * across the corpus even when its individual words are ordinary.
    * Per document (with at least one bigram): total bigram occurrences,
    * distinct bigrams, distinct RARE bigrams (corpus document-frequency
    * <= `rareDf`), and `rare_ratio = n_rare / n_distinct` — high = novel
    * prose, low = boilerplate. Tokens are the non-empty space-split
    * words; a bigram's df counts DOCUMENTS, not occurrences.
    *
    * Scale shape: bigrams explode once and immediately fingerprint to
    * xxhash64 longs ON THE EXPLODED ATTRIBUTE (codegen'd — the r9 HOF
    * lesson; the ~2-word strings never cross an exchange, the same
    * trust argument as the shingle index — `graft.Probe` counts bigram
    * collisions too). The df aggregation and the df join share the
    * fingerprint exchange; per-doc aggs are map-side combinable. No
    * corpus-wide collect, no windows.
    */
  def bigramNovelty(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      rareDf: Int = 2): DataFrame = {
    val occurrences = bigramStrings(docs, idCol, textCol)
      .select(col(idCol), xxhash64(col("bg")).as("fp"))
    val totals = occurrences
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_bigrams"))
    val pairs = occurrences.distinct()
    val dfc = pairs.groupBy(col("fp")).agg(count(lit(1)).as("_dfc"))
    val perDoc = pairs.join(dfc, "fp")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_distinct"),
        sum(when(col("_dfc") <= rareDf, 1L).otherwise(0L)).as("n_rare"))
    totals.join(perDoc, idCol)
      .select(
        col(idCol), col("n_bigrams"), col("n_distinct"), col("n_rare"),
        // n_distinct >= 1 by construction: ONE final IEEE division.
        (col("n_rare").cast("double") / col("n_distinct").cast("double"))
          .as("rare_ratio"))
  }

  /** [[bigramNovelty]]'s raw STRING bigram occurrences (`idCol`, `bg`) —
    * the exact space whose fingerprints the production path groups on;
    * `graft.Probe` counts its xxhash64 collisions. Empty tokens are
    * filtered BEFORE pairing (a double space must not break a bigram).
    */
  private[graft] def bigramStrings(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = filter(
      split(coalesce(col(textCol), lit("")), " "), t => t =!= "")
    docs
      .withColumn("_ws", ws)
      .filter(size(col("_ws")) >= 2)
      .select(
        col(idCol),
        explode(zip_with(
          slice(col("_ws"), lit(1), size(col("_ws")) - 1),
          slice(col("_ws"), lit(2), size(col("_ws")) - 1),
          (a, b) => concat_ws(" ", a, b))).as("bg"))
  }

  /** Scrub URLs and email addresses from a text column — the standard
    * pre-training PII/noise pass — emitting the scrubbed text plus match
    * counts (so a pipeline can ALSO filter on "too many links" style
    * heuristics without a second regex pass over the corpus; the counts
    * reuse the same patterns). Patterns are deliberately RE2-simple so
    * any engine reproduces them byte-for-byte (oracle-checked). Narrow
    * per-row codegen'd builtins, zero shuffle.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  // \S, not [^ ]: a match must stop at ANY whitespace — the space-only
  // class swallowed tabs/newlines and the text following them (ADVICE r8).
  val UrlPattern = "https?://\\S+"

  def withScrubbed(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_urls",
        size(regexp_extract_all(col(textCol), lit(UrlPattern), lit(0))).cast("long"))
      .withColumn("n_emails",
        size(regexp_extract_all(col(textCol), lit(EmailPattern), lit(0))).cast("long"))
      .withColumn("scrubbed",
        regexp_replace(
          regexp_replace(col(textCol), UrlPattern, "<URL>"),
          EmailPattern, "<EMAIL>"))

  /** PII patterns for [[withPiiScrubbed]], chosen inside the Java-regex ∩
    * RE2 portable subset (no backreferences, no lookaround, unambiguous
    * greedy runs) so Spark and any RE2-based engine (DuckDB, Go) match
    * byte-for-byte identically.
    */
  val Ipv4Pattern = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"
  val PhonePattern = "\\+\\d{1,3} \\d{3}-\\d+"
  val CardPattern = "\\b\\d{13,16}\\b"

  /** [[withScrubbed]]'s PII sibling: count and redact IPv4 addresses,
    * international-format phone numbers, and 13-16 digit card-like runs —
    * the redaction pass a training-data pipeline runs before anything
    * else sees the text. Counts are computed per pattern on the ORIGINAL
    * text (independent, so overlapping matches count in each family);
    * redaction applies IP → phone → card, which cannot interact (the
    * patterns are disjoint: dots / leading '+' / bare digit run). Same
    * shape as the URL/email scrub: narrow per-row codegen'd builtins,
    * zero shuffle.
    */
  def withPiiScrubbed(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_ips",
        size(regexp_extract_all(col(textCol), lit(Ipv4Pattern), lit(0))).cast("long"))
      .withColumn("n_phones",
        size(regexp_extract_all(col(textCol), lit(PhonePattern), lit(0))).cast("long"))
      .withColumn("n_cards",
        size(regexp_extract_all(col(textCol), lit(CardPattern), lit(0))).cast("long"))
      .withColumn("pii_scrubbed",
        regexp_replace(
          regexp_replace(
            regexp_replace(col(textCol), Ipv4Pattern, "<IP>"),
            PhonePattern, "<PHONE>"),
          CardPattern, "<CARD>"))

  /** [[withBlocklist]]'s audit sibling: WHICH phrases matched (`matched`,
    * in the list's order — "why was this document flagged"), plus the
    * same `n_blocked`/`keep`. Same one-pass automaton; null text matches
    * nothing (empty array, keep = 1).
    */
  def withBlocklistMatches(
      docs: DataFrame,
      phrases: Seq[String],
      textCol: String = "text"): DataFrame = {
    require(phrases.nonEmpty, "blocklist must name at least one phrase")
    require(phrases.forall(_.nonEmpty), s"empty blocklist phrase: $phrases")
    import org.apache.spark.sql.graft.Exprs
    docs
      .withColumn("matched", Exprs.column(graft.functions.MultiContainsMatches(
        Exprs.expression(col(textCol)), phrases)))
      .withColumn("n_blocked", size(col("matched")).cast("long"))
      .withColumn("keep",
        when(col("n_blocked") === 0L, lit(1L)).otherwise(lit(0L)))
  }

  /** Blocklist screening — the phrase-filter stage every production
    * corpus pipeline runs (NSFW terms, boilerplate markers, license
    * headers): per-doc count of matched phrases (substring semantics,
    * multi-word phrases included) and a BIGINT keep flag (1 = clean).
    * The match is the native one-pass Aho-Corasick
    * [[graft.functions.MultiContainsCount]] — a `contains` chain scans
    * the text once PER PHRASE, so a thousand-phrase production list
    * would pay a thousand passes per document; the automaton pays one,
    * whatever the list size (chain-equivalence property-tested in
    * `MultiContainsSpec`). Zero shuffle, no regex engine in the loop.
    */
  def withBlocklist(
      docs: DataFrame,
      phrases: Seq[String],
      textCol: String = "text"): DataFrame = {
    require(phrases.nonEmpty, "blocklist must name at least one phrase")
    require(phrases.forall(_.nonEmpty), s"empty blocklist phrase: $phrases")
    import org.apache.spark.sql.graft.Exprs
    // Null text matches nothing (keep = 1) — pinned here AND as ELSE 0 in
    // the oracle's CASE; the expression folds the null -> 0 collapse in.
    val nBlocked = Exprs.column(graft.functions.MultiContainsCount(
      Exprs.expression(col(textCol)), phrases))
    docs
      .withColumn("n_blocked", nBlocked)
      .withColumn("keep", when(col("n_blocked") === 0, lit(1L)).otherwise(lit(0L)))
  }

  /** Per-document distinctive-term extraction — the tf-idf shape with an
    * ENGINE-PORTABLE ranking: terms rank by `(tf DESC, df ASC, term ASC)`
    * after dropping terms with document frequency above `maxDf`
    * (non-discriminating vocabulary), a total order over integers+strings
    * that any engine reproduces bit-exactly. A float `tf*ln(N/df)` score
    * would rank identically for fixed tf whenever df is smaller — but its
    * VALUE depends on each engine's `ln` rounding (neither `java.lang.Math
    * .log` nor libm is correctly-rounded), so the score itself is not
    * oracle-comparable; consumers who want the float can compute it from
    * the emitted (tf, df) integers.
    *
    * One tokens pass feeds both the per-(doc, term) tf aggregation and
    * the per-term df aggregation (shared subplan, AQE stage reuse); the
    * rank window partitions by doc — bounded by per-doc vocabulary, no
    * global sort.
    */
  def topTerms(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 5,
      maxDf: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val tf = toks.groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))
    val df = toks.groupBy(col("tok"))
      .agg(countDistinct(col(idCol)).as("df"))
      .filter(col("df") <= maxDf)
    tf.join(df, "tok")
      .withColumn("rank",
        row_number().over(Window.partitionBy(col(idCol))
          .orderBy(col("tf").desc, col("df").asc, col("tok").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("tok"), col("tf"), col("df"), col("rank"))
  }

  /** EXACT heavy hitters — every key of `keyCol` whose global count is
    * `>= minCount` — without shuffling the long tail. A plain
    * `groupBy(key).count().filter(...)` ships one partial-count row per
    * distinct (partition, key) through the exchange: at 100 TB of text
    * tokens that is the full Zipf tail, shuffled only to be discarded by
    * the HAVING.
    *
    * Two-pass pigeonhole prune instead: a key with global count >= T must
    * have local count >= ceil(T/P) in at least one of the P input
    * partitions (if every local count were below that, the total would be
    * at most P*(ceil(T/P)-1) < T). Pass 1 counts per-partition in a local
    * hash map (no shuffle at all — the honest `mapPartitions` case) and
    * emits only locally-frequent keys; pass 2 recounts exactly, but only
    * for candidate keys, via a semi-join the optimizer broadcasts when
    * the candidate set is small (bounded by rows/ceil(T/P) per partition
    * — for thresholds that make "heavy" meaningful it always is). Scan
    * cost doubles; exchange volume drops from |vocabulary| to
    * |candidates|. False negatives are impossible (pigeonhole) and false
    * positives die in the exact recount, so the result equals the naive
    * plan's row-for-row. Null keys are excluded (SQL join semantics) —
    * filter or coalesce upstream if a null group matters.
    *
    * Caveats: `keyCol` may be any atomic type (counted through its string
    * form in pass 1 — two raw keys casting to one string only merge
    * local counts upward, which keeps the candidate set a superset; the
    * recount groups by the RAW key). The input must be DETERMINISTIC
    * across the two plan evaluations — a seedless `sample`/`rand`
    * upstream can change rows between the candidate pass and the recount
    * and void the pigeonhole guarantee; persist such inputs first.
    */
  def heavyHitters(terms: DataFrame, keyCol: String, minCount: Long): DataFrame = {
    require(minCount > 0, s"minCount must be positive (got $minCount)")
    val spark = terms.sparkSession
    import spark.implicits._
    // The local bound depends on P, so derive it from the ONE RDD the
    // counting pass then runs over — measuring P on a separate plan
    // evaluation could disagree (a larger real P would over-raise the
    // bound and break the no-false-negative guarantee).
    val keyRdd = terms.select(col(keyCol).cast("string")).as[String].rdd
    val p = keyRdd.getNumPartitions.toLong.max(1L)
    val localBound = (minCount + p - 1) / p
    val cands = spark.createDataset(keyRdd.mapPartitions { it =>
      val m = new java.util.HashMap[String, Long]()
      it.foreach(k => m.merge(k, 1L, _ + _))
      import scala.jdk.CollectionConverters._
      m.entrySet().iterator().asScala
        .collect { case e if e.getValue >= localBound => e.getKey }
    }).distinct().toDF("_hh_key")
    terms
      .join(cands, col(keyCol).cast("string") === col("_hh_key"), "left_semi")
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
  }
}
