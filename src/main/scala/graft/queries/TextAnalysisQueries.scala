package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.functions.TextShingles
import graft.text.LangId

/** §K text analysis — language ID, quality scoring, token counting and
  * document fingerprinting over `documents`. All pure codegen'd
  * expressions (no UDFs): linear scans at 100 TB.
  */
object TextAnalysisQueries {

  private val QualityStops = Seq("the", "a", "and", "of", "to", "in")

  val defs: Seq[QueryDef] = Seq(
    // Heuristic — rows-only; accuracy vs the `lang` label is spec territory.
    QueryDef(
      "q_text_langid",
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"), LangId.predict(col("text")).as("pred_lang"), col("lang"))
          .orderBy("doc_id"),
      None),

    // q_text_langid's EXACT-REGIME twin (the q_ann_ivf_exact promotion
    // pattern): synthetic per-doc texts built from three stopwords UNIQUE
    // to one language, so the stopword-overlap argmax is provably that
    // language — score 3 vs 0 for every other set, no tie-break reachable
    // — and the oracle derives the same answer arithmetically. This
    // hash-pins the ENTIRE LangId.predict code path (tokenization, the
    // per-language filter counts, the struct-ordering argmax) that the
    // rows-only heuristic row exercises on real text.
    QueryDef(
      "q_text_langid_exact",
      (s, d) => {
        // words chosen to appear in exactly ONE stopword set each
        val samples = array(lit("the that for"), lit("der und nicht"),
          lit("les dans pour"), lit("los una por"))
        Tables.documents(s, d)
          .select(col("doc_id"),
            element_at(samples, (col("doc_id") % 4).cast("int") + 1).as("synth_text"))
          .select(col("doc_id"), LangId.predict(col("synth_text")).as("pred_lang"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
                     CASE CAST(doc_id % 4 AS INT)
                       WHEN 0 THEN 'en' WHEN 1 THEN 'de'
                       WHEN 2 THEN 'fr' ELSE 'es' END AS pred_lang
              FROM documents ORDER BY doc_id""")),

    QueryDef(
      "q_text_quality",
      (s, d) => {
        val toks = TextShingles.wordTokens(col("text"))
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            length(col("text")).as("char_len"),
            size(toks).as("n_tokens"),
            size(array_distinct(toks)).as("n_uniq"),
            size(filter(toks, t => t.isInCollection(QualityStops))).as("n_stop"))
          .withColumn("uniq_ratio",
            round(col("n_uniq").cast("double") / col("n_tokens"), 4))
          .withColumn("stop_ratio",
            round(col("n_stop").cast("double") / col("n_tokens"), 4))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
                     length(text) AS char_len,
                     CAST(len(string_split(lower(text), ' ')) AS INT) AS n_tokens,
                     CAST(len(list_distinct(string_split(lower(text), ' '))) AS INT) AS n_uniq,
                     CAST(len(list_filter(string_split(lower(text), ' '),
                          x -> x IN ('the', 'a', 'and', 'of', 'to', 'in'))) AS INT) AS n_stop,
                     round(len(list_distinct(string_split(lower(text), ' '))) * 1.0
                           / len(string_split(lower(text), ' ')), 4) AS uniq_ratio,
                     round(len(list_filter(string_split(lower(text), ' '),
                          x -> x IN ('the', 'a', 'and', 'of', 'to', 'in'))) * 1.0
                           / len(string_split(lower(text), ' ')), 4) AS stop_ratio
              FROM documents ORDER BY doc_id""")),

    QueryDef(
      "q_token_count",
      (s, d) =>
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            // single-space split (not \s+): matches the engine-wide
            // wordTokens/oracle convention so counts agree byte-for-byte
            // with string_split(text, ' ') whatever the whitespace shape.
            size(split(col("text"), " ")).as("ws_tokens"),
            regexp_count(col("text"), lit("[A-Za-z0-9]+")).as("re_tokens"),
            regexp_count(col("text"), lit("[A-Za-z]{1,4}")).as("bpe_ish"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
                     CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
                     CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS INT) AS re_tokens,
                     CAST(len(regexp_extract_all(text, '[A-Za-z]{1,4}')) AS INT) AS bpe_ish
              FROM documents ORDER BY doc_id""")),

    // TOKENIZER FERTILITY by language — the tokenizer-efficiency audit a
    // multilingual pipeline runs before committing to a vocabulary: how
    // many subword (BPE-ish) tokens the tokenizer spends per whitespace
    // word, per language (fertility ≈ 1 for well-covered languages,
    // inflates where the vocab fragments). Per-doc counts are the same
    // scan-local regex/split projections as q_token_count; the rollup is
    // a lang-dictionary groupBy of exact long sums, and fertility is the
    // one float ratio of two exact longs (class c).
    QueryDef(
      "q_tokenizer_fertility",
      (s, d) =>
        Tables.documents(s, d)
          .select(col("lang"),
            size(split(col("text"), " ")).cast("long").as("ws"),
            regexp_count(col("text"), lit("[A-Za-z]{1,4}")).cast("long").as("bp"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum("ws").as("n_words"), sum("bp").as("n_subwords"))
          .select(col("lang"), col("n_docs"), col("n_words"), col("n_subwords"),
            round(col("n_subwords").cast("double") / col("n_words").cast("double"), 4)
              .as("fertility"))
          .orderBy("lang"),
      Some("""WITH per AS (SELECT lang,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS ws,
                     CAST(len(regexp_extract_all(text, '[A-Za-z]{1,4}')) AS BIGINT) AS bp
              FROM documents)
              SELECT lang, count(*) AS n_docs,
                     CAST(sum(ws) AS BIGINT) AS n_words,
                     CAST(sum(bp) AS BIGINT) AS n_subwords,
                     round(CAST(sum(bp) AS DOUBLE) / CAST(sum(ws) AS DOUBLE), 4)
                       AS fertility
              FROM per GROUP BY 1 ORDER BY lang""")),

    // OUT-OF-VOCABULARY RATE by language — fertility's vocabulary-side
    // twin: build the corpus top-20 token vocabulary (exact counts,
    // (count desc, token asc) total order — no sketch, the vocab is the
    // artifact a tokenizer build would freeze) and measure the share of
    // token OCCURRENCES each language spends outside it. The vocabulary
    // is a TakeOrdered shortlist (constant K, never a global window) and
    // broadcasts onto the per-(lang, token) rollup; counts exact longs,
    // the rate the one float.
    QueryDef(
      "q_oov_rate",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("lang"),
            explode(split(lower(col("text")), " ")).as("w"))
          .filter(col("w") =!= "")
        val vocab = toks.groupBy("w").agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("w").asc).limit(20)
          .select(col("w"), lit(1).as("in_vocab"))
        toks.groupBy("lang", "w").agg(count(lit(1)).as("c"))
          .join(broadcast(vocab), Seq("w"), "left")
          .groupBy("lang")
          .agg(
            sum("c").as("n_tokens"),
            sum(when(col("in_vocab").isNull, col("c")).otherwise(0L)).as("n_oov"))
          .select(col("lang"), col("n_tokens"), col("n_oov"),
            round(col("n_oov").cast("double") / col("n_tokens").cast("double"), 4)
              .as("oov_rate"))
          .orderBy("lang")
      },
      Some("""WITH toks AS (SELECT lang, w
                            FROM (SELECT lang, unnest(string_split(lower(text), ' ')) AS w
                                  FROM documents)
                            WHERE w <> ''),
                   cnt AS (SELECT w, CAST(count(*) AS BIGINT) AS c
                           FROM toks GROUP BY 1),
                   vocab AS (SELECT w FROM cnt
                             ORDER BY c DESC, w ASC LIMIT 20),
                   lw AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS c
                          FROM toks GROUP BY 1, 2),
                   agg AS (SELECT lang,
                                  CAST(sum(c) AS BIGINT) AS n_tokens,
                                  CAST(sum(CASE WHEN v.w IS NULL THEN c ELSE 0 END)
                                       AS BIGINT) AS n_oov
                           FROM lw LEFT JOIN vocab v USING (w)
                           GROUP BY 1)
              SELECT lang, n_tokens, n_oov,
                     round(CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4)
                       AS oov_rate
              FROM agg ORDER BY lang""")),

    // Approximate TOP-K heavy hitters over the token stream (Misra–Gries
    // mergeable sketch): per-language most frequent words with O(k) state
    // per map task. Counts are lower bounds — rows-only; the error bound
    // is spec'd against exact counts in FrequentItemsSpec.
    QueryDef(
      "q_frequent_terms",
      (s, d) =>
        Tables.documents(s, d)
          .select(col("lang"), explode(TextShingles.wordTokens(col("text"))).as("w"))
          .groupBy("lang")
          .agg(TextShingles.frequentItems(col("w"), 15).as("top_terms"))
          .select(col("lang"), posexplode(col("top_terms")).as(Seq("pos", "t")))
          .select(col("lang"), col("pos"), col("t.item").as("item"))
          .orderBy("lang", "pos"),
      None),

    // q_frequent_terms' EXACT-REGIME twin (the theta-twin promotion
    // pattern): Misra–Gries with capacity ≥ the distinct-token count
    // never decrements, so every retained count is the TRUE count and
    // the (count desc, item asc) ordering is the exact ranking —
    // hash-verified against a plain GROUP BY + row_number oracle. Same
    // mergeable aggregate, partial/merge path and ordering code as the
    // approximate row; only the capacity differs.
    QueryDef(
      "q_frequent_terms_exact",
      (s, d) =>
        Tables.documents(s, d)
          .select(col("lang"), explode(TextShingles.wordTokens(col("text"))).as("w"))
          .groupBy("lang")
          .agg(TextShingles.frequentItems(col("w"), 256).as("top_terms"))
          .select(col("lang"),
            posexplode(expr("slice(top_terms, 1, 10)")).as(Seq("pos", "t")))
          .select(col("lang"), (col("pos") + 1).as("rk"),
            col("t.item").as("item"), col("t.est_count").as("cnt"))
          .orderBy("lang", "rk"),
      Some("""WITH tok AS (SELECT lang, unnest(string_split(lower(text), ' ')) AS w
                           FROM documents),
                   c AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS cnt
                         FROM tok GROUP BY 1, 2),
                   r AS (SELECT lang, w, cnt,
                                CAST(row_number() OVER (PARTITION BY lang
                                     ORDER BY cnt DESC, w ASC) AS INT) AS rk
                         FROM c)
              SELECT lang, rk, w AS item, cnt FROM r WHERE rk <= 10
              ORDER BY lang, rk""")),

    QueryDef(
      "q_fingerprint",
      (s, d) =>
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp"))
          .withColumn("fp16", substring(col("fp"), 1, 16))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
                     md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp,
                     substr(md5(regexp_replace(lower(text), '\s+', ' ', 'g')), 1, 16) AS fp16
              FROM documents ORDER BY doc_id""")),

    // PII scrubbing — the redaction pass every training corpus runs before
    // release: regex-replace emails and phone-shaped numbers, count the
    // redactions. Documents carry no PII, so each doc gets a deterministic
    // synthetic contact line appended first; the oracle applies the same
    // construction + regexes, so the scrub semantics are hash-verified.
    QueryDef(
      "q_pii_scrub",
      (s, d) => {
        val withPii = concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com or 555-01"),
          lpad((col("doc_id") % 100).cast("string"), 2, "0"))
        Tables.documents(s, d)
          .select(col("doc_id"), withPii.as("raw"))
          .select(
            col("doc_id"),
            regexp_replace(
              regexp_replace(col("raw"), "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
              "\\d{3}-\\d{4}", "<PHONE>").as("clean"),
            (size(split(col("raw"), "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}")) - 1).as("n_emails"),
            (size(split(col("raw"), "\\d{3}-\\d{4}")) - 1).as("n_phones"))
          .orderBy("doc_id")
      },
      Some("""WITH raw AS (SELECT doc_id,
                     text || ' contact user' || doc_id || '@example.com or 555-01' ||
                       lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') AS raw
                   FROM documents)
              SELECT doc_id,
                     regexp_replace(
                       regexp_replace(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
                       '\d{3}-\d{4}', '<PHONE>', 'g') AS clean,
                     CAST(len(regexp_split_to_array(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) - 1 AS INT) AS n_emails,
                     CAST(len(regexp_split_to_array(raw, '\d{3}-\d{4}')) - 1 AS INT) AS n_phones
              FROM raw ORDER BY doc_id""")),

    // Repetition ratio — the Gopher-style duplicate-n-gram quality signal:
    // fraction of a doc's 3-gram occurrences that are repeats of an
    // earlier 3-gram. High ratio = boilerplate/templated text. One
    // codegen'd shingling pass (word_shingle_hashes is distinct-counting;
    // total count is positional arithmetic).
    QueryDef(
      "q_repetition_ratio",
      (s, d) => {
        val toks = TextShingles.wordTokens(col("text"))
        Tables.documents(s, d)
          .select(col("doc_id"),
            (size(toks) - 2).as("n_grams"),
            size(TextShingles.shingleHashes(col("text"), 3)).as("n_distinct"))
          .filter(col("n_grams") > 0)
          .select(col("doc_id"), col("n_grams"), col("n_distinct"),
            round(lit(1.0) - col("n_distinct") / col("n_grams").cast("double"), 4)
              .as("rep_ratio"))
          .orderBy("doc_id")
      },
      Some("""WITH g AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
                   sh AS (SELECT doc_id,
                          CAST(len(w) - 2 AS INT) AS n_grams,
                          CAST(len(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                                  FOR i IN range(1, len(w) - 1)])) AS INT) AS n_distinct
                          FROM g WHERE len(w) >= 3)
              SELECT doc_id, n_grams, n_distinct,
                     round(1.0 - n_distinct / CAST(n_grams AS DOUBLE), 4) AS rep_ratio
              FROM sh WHERE n_grams > 0 ORDER BY doc_id""")),

    // CLP-style log templating (the log-analytics columnar-encoding trick:
    // a log line splits into a static TEMPLATE + extracted variable values;
    // a petabyte of logs collapses into a dictionary of templates plus
    // variable columns). Log lines are synthesized deterministically from
    // events columns (the fixture has no raw logs — same convention as
    // q_pii_scrub's contact lines); encode = two codegen'd regexps per row,
    // then the template group-by is dictionary-sized. The oracle replays
    // the synthesis + encoding in DuckDB.
    QueryDef(
      "q_clp_logs",
      (s, d) => {
        val line = format_string(
          "conn %d from host 10.0.%d.%d port %d took %d ms status %s",
          col("event_id"), col("user_id") % 256, col("event_id") % 256,
          col("user_id") % 1000 + 8000, col("event_id") % 97, col("event_type"))
        Tables.events(s, d)
          .select(
            regexp_replace(line, "[0-9]+", "<V>").as("template"),
            (size(split(line, "[0-9]+")) - 1).as("n_vars"))
          .groupBy("template")
          .agg(count(lit(1)).as("n_logs"), sum("n_vars").cast("long").as("total_vars"))
          .orderBy("template")
      },
      Some("""WITH l AS (SELECT printf('conn %d from host 10.0.%d.%d port %d took %d ms status %s',
                                event_id, user_id % 256, event_id % 256,
                                user_id % 1000 + 8000, event_id % 97, event_type) AS line
                         FROM events)
              SELECT regexp_replace(line, '[0-9]+', '<V>', 'g') AS template,
                     count(*) AS n_logs,
                     CAST(sum(len(regexp_extract_all(line, '[0-9]+'))) AS BIGINT) AS total_vars
              FROM l GROUP BY 1 ORDER BY template""")),

    // Per-document top-3 TF-IDF terms — the classic keyword-extraction /
    // relevance-feature pass. Shape at 100 TB: tokenize is scan-local,
    // term frequencies shuffle once on (doc, term), document frequencies
    // reduce to a vocabulary-sized table, the scalar corpus size N rides a
    // broadcast (single-row — lint-audited), and the final top-3 is a
    // window over per-doc partitions whose size is bounded by document
    // length. Ranking happens on the ROUNDED score so both engines rank
    // identical doubles; ties break on the term itself.
    QueryDef(
      "q_tfidf_top",
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.pipeline.Tfidf.topTerms(docs, "doc_id", "text",
            df = graft.pipeline.Tfidf.docFrequencies(docs, "doc_id", "text"),
            n = graft.pipeline.Tfidf.corpusSize(docs, "doc_id"), k = 3)
          .orderBy("doc_id", "rk")
      },
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
                   tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
                   df AS (SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok GROUP BY 1),
                   n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM documents),
                   scored AS (SELECT tf.doc_id, tf.w,
                                     round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 4) AS score
                              FROM tf JOIN df USING (w) CROSS JOIN n),
                   ranked AS (SELECT doc_id, w, score,
                                     CAST(row_number() OVER (PARTITION BY doc_id
                                          ORDER BY score DESC, w ASC) AS INT) AS rk
                              FROM scored)
              SELECT doc_id, w AS term, rk, score + 0 AS score
              FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk""")),

    // Character-level unigram entropy — the information-density quality
    // signal (near-zero = degenerate repetition, near-log(alphabet) =
    // uniform noise; natural text sits in a stable band). Identity
    // H = ln(n) − Σ c·ln(c) / n turns it into two sums over the per-doc
    // character histogram. Shape at 100 TB: the (doc, char) rollup
    // partial-aggregates map-side down to ≤ alphabet-size rows per doc
    // before any shuffle — the corpus' raw characters never cross the
    // wire.
    QueryDef(
      "q_char_entropy",
      (s, d) => {
        val chars = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
        chars.groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
          .groupBy("doc_id")
          .agg(
            sum("c").as("n_chars"),
            round(log(sum("c")) - sum(col("c") * log(col("c"))) / sum("c"), 4)
              .as("entropy"))
          .orderBy("doc_id")
      },
      Some("""WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS ch
                          FROM documents),
                   f AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2)
              SELECT doc_id,
                     CAST(sum(c) AS BIGINT) AS n_chars,
                     round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 4) AS entropy
              FROM f GROUP BY 1 ORDER BY doc_id""")),

    // BM25 ranking for a fixed term set (k1=1.2, b=0.75) — the IR
    // scoring function behind retrieval-based curation and search-style
    // corpus slicing (TF-IDF's saturating, length-normalized successor).
    // Shape at 100 TB: per-doc tf of the query terms and the doc length
    // are SCAN-LOCAL higher-order-function counts over one tokenize (the
    // token array materializes in its own projection first — the
    // interpreted-HOF loop-invariant rule); corpus stats (N, avgdl,
    // per-term df) collapse to ONE single-row broadcast; the final score
    // is a pure per-row expression. No token ever shuffles. Ranking uses
    // the ROUNDED score (both engines rank identical doubles), ties
    // break on doc_id.
    QueryDef(
      "q_bm25",
      (s, d) => {
        val terms = Seq("table", "scan", "merge")
        val k1 = 1.2
        val b = 0.75
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
        val perDoc = toks.select(
          col("doc_id") +: size(col("toks")).cast("long").as("dl") +:
            terms.map(t =>
              size(filter(col("toks"), w => w === lit(t))).cast("long").as(s"tf_$t")): _*)
        val statAggs = count(lit(1)).as("n_docs") +: avg("dl").as("avgdl") +:
          terms.map(t => sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
        val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)
        val scored = perDoc.crossJoin(broadcast(stats))
        val score = terms.map { t =>
          val tf = col(s"tf_$t").cast("double")
          val idf = log(lit(1.0) + (col("n_docs") - col(s"df_$t") + lit(0.5)) /
            (col(s"df_$t") + lit(0.5)))
          // literal 2.2, not k1+1: the Scala sum 1.2+1.0 need not be the
          // same double as DuckDB's parsed "2.2"
          idf * (tf * lit(2.2)) /
            (tf + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))
        }.reduce(_ + _)
        scored
          .select(col("doc_id"), col("dl"), round(score, 4).as("bm25"))
          .filter(col("bm25") > 0)
          .orderBy(desc("bm25"), asc("doc_id"))
          .limit(20)
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
                   perdoc AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
                                     CAST(len(list_filter(w, x -> x = 'table')) AS BIGINT) AS tf_table,
                                     CAST(len(list_filter(w, x -> x = 'scan')) AS BIGINT) AS tf_scan,
                                     CAST(len(list_filter(w, x -> x = 'merge')) AS BIGINT) AS tf_merge
                              FROM t),
                   stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl,
                                    CAST(sum(CASE WHEN tf_table > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_table,
                                    CAST(sum(CASE WHEN tf_scan > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_scan,
                                    CAST(sum(CASE WHEN tf_merge > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_merge
                             FROM perdoc),
                   scored AS (SELECT doc_id, dl,
                                     round(
                                       ln(1.0 + (n_docs - df_table + 0.5) / (df_table + 0.5))
                                         * (CAST(tf_table AS DOUBLE) * 2.2)
                                         / (CAST(tf_table AS DOUBLE) + 1.2 * (0.25 + 0.75 * dl / avgdl)) +
                                       ln(1.0 + (n_docs - df_scan + 0.5) / (df_scan + 0.5))
                                         * (CAST(tf_scan AS DOUBLE) * 2.2)
                                         / (CAST(tf_scan AS DOUBLE) + 1.2 * (0.25 + 0.75 * dl / avgdl)) +
                                       ln(1.0 + (n_docs - df_merge + 0.5) / (df_merge + 0.5))
                                         * (CAST(tf_merge AS DOUBLE) * 2.2)
                                         / (CAST(tf_merge AS DOUBLE) + 1.2 * (0.25 + 0.75 * dl / avgdl)),
                                       4) AS bm25
                              FROM perdoc CROSS JOIN stats)
              SELECT doc_id, dl, bm25 FROM scored WHERE bm25 > 0
              ORDER BY bm25 DESC, doc_id ASC LIMIT 20""")),

    // Compression-ratio quality proxy (deflate level 6): repetitive /
    // templated text compresses far below natural prose, random noise
    // barely compresses — a one-number redundancy signal used alongside
    // q_repetition_ratio. Per-row compute with ONE Deflater per
    // partition (the batched-codec shape: stateful native-buffer
    // resources initialize per partition, never per row). Rows-only
    // (deflate output length is not SQL-expressible); CorpusSpec pins
    // determinism under repartitioning and the repetitive < prose <
    // noise ordering.
    QueryDef(
      "q_compression_ratio",
      (s, d) => {
        import s.implicits._
        val measured = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
          .as[(Long, String, String)]
          .mapPartitions { it =>
            val deflater = new java.util.zip.Deflater(6)
            val buf = new Array[Byte](64 * 1024)
            it.map { case (id, src, text) =>
              val raw =
                if (text == null) Array.empty[Byte]
                else text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
              deflater.reset()
              deflater.setInput(raw)
              deflater.finish()
              var zipped = 0L
              while (!deflater.finished()) zipped += deflater.deflate(buf)
              (id, src, raw.length.toLong, zipped)
            }
          }
          .toDF("doc_id", "source", "raw_bytes", "zip_bytes")
        measured
          .withColumn("ratio",
            col("zip_bytes") / greatest(col("raw_bytes"), lit(1L)))
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            round(avg("ratio"), 4).as("avg_ratio"),
            round(min("ratio"), 4).as("min_ratio"),
            round(max("ratio"), 4).as("max_ratio"))
          .orderBy("source")
      },
      None),

    // q_compression_ratio's EXACT-REGIME twin: the deflate byte count is
    // not SQL-expressible, but a run-length codec exercises the SAME
    // engine seam (per-partition stateful encode inside mapPartitions,
    // scan-local, zero shuffles before the source rollup) with an output
    // DuckDB replays exactly — runs of equal characters counted via
    // char-list comparison. Restricted to ASCII-printable texts so chars
    // ≡ bytes ≡ UTF-16 units on both engines; ratios are basis-point
    // INTEGER-quantized (rle_bytes·10⁴ div chars) and the per-source
    // aggregates are integer sums/min/max — no float summation anywhere,
    // so the hash can't drift.
    QueryDef(
      "q_compression_ratio_exact",
      (s, d) => {
        import s.implicits._
        val measured = Tables.documents(s, d)
          .filter(col("text").rlike("^[ -~\\t\\n\\r]*$"))
          .select(col("doc_id"), col("source"), col("text"))
          .as[(Long, String, String)]
          .mapPartitions { it =>
            it.map { case (id, src, text) =>
              var runs = 0L
              var i = 0
              while (i < text.length) {
                if (i == 0 || text.charAt(i) != text.charAt(i - 1)) runs += 1
                i += 1
              }
              (id, src, text.length.toLong, 2L * runs)
            }
          }
          .toDF("doc_id", "source", "raw_chars", "rle_bytes")
        measured
          .withColumn("ratio_bp",
            expr("rle_bytes * 10000 div greatest(raw_chars, 1L)"))
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum("raw_chars").as("total_chars"),
            sum("rle_bytes").as("total_rle"),
            min("ratio_bp").as("min_ratio_bp"),
            max("ratio_bp").as("max_ratio_bp"))
          .orderBy("source")
      },
      Some("""WITH docs AS (SELECT doc_id, source, text,
                                   len(text) AS n
                            FROM documents
                            WHERE regexp_matches(text, '^[ -~\t\n\r]*$')),
                   runs AS (SELECT doc_id, source, n,
                                   2 * (CASE WHEN n = 0 THEN 0
                                        ELSE 1 + len(list_filter(range(2, n + 1),
                                               i -> string_split(text, '')[i]
                                                    <> string_split(text, '')[i - 1]))
                                        END) AS rle
                            FROM docs)
              SELECT source, count(*) AS n_docs,
                     CAST(sum(n) AS BIGINT) AS total_chars,
                     CAST(sum(rle) AS BIGINT) AS total_rle,
                     CAST(min(rle * 10000 // greatest(n, 1)) AS BIGINT) AS min_ratio_bp,
                     CAST(max(rle * 10000 // greatest(n, 1)) AS BIGINT) AS max_ratio_bp
              FROM runs GROUP BY 1 ORDER BY source""")),

    // RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    // the maximal stopword-free token runs capped at 4 words (the
    // standard RAKE candidate-length cap — uncapped runs degenerate to
    // whole-document "phrases" on stopword-sparse text); each word scores
    // degree/frequency over all phrase occurrences (degree = Σ length of
    // phrases it appears in — co-occurrence weight), and a phrase scores
    // the sum of its words' scores. Corpus-level top-15 keyphrases.
    // Shape at 100 TB: phrase splitting is scan-local, the word-score
    // table is VOCABULARY-sized (broadcast back onto the phrase rollup),
    // and the only corpus-keyed shuffle is the groupBy(phrase) rollup —
    // the q_ngram_top shape with a dictionary join on top. Fully
    // SQL-expressible, so hash-verified end to end.
    QueryDef(
      "q_keywords_rake",
      (s, d) => {
        val stop = "\\b(?:a|the|of|and|in|to|is)\\b"
        val occ = Tables.documents(s, d)
          .select(explode(split(col("text"), stop)).as("p0"))
          .select(trim(col("p0")).as("phrase"))
          .filter(length(col("phrase")) > 0)
          .withColumn("ws", split(col("phrase"), " "))
          .withColumn("plen", size(col("ws")))
          .filter(col("plen") <= 4)
        val wordScore = occ
          .select(explode(col("ws")).as("word"), col("plen"))
          .groupBy("word")
          .agg((sum("plen") / count(lit(1))).as("wscore"))
        occ.groupBy("phrase")
          .agg(count(lit(1)).as("n_occ"),
            first(col("ws")).as("ws"),
            first(col("plen")).as("n_words"))
          .select(col("phrase"), col("n_occ"), col("n_words"),
            explode(col("ws")).as("word"))
          .join(broadcast(wordScore), "word")
          .groupBy("phrase")
          .agg(
            first(col("n_occ")).as("n_occ"),
            first(col("n_words")).as("n_words"),
            round(sum("wscore"), 4).as("score"))
          .orderBy(desc("score"), asc("phrase"))
          .limit(15)
      },
      Some("""WITH ph0 AS (SELECT unnest(regexp_split_to_array(text,
                                    '\b(?:a|the|of|and|in|to|is)\b')) AS p
                           FROM documents),
                   ph AS (SELECT trim(p) AS phrase FROM ph0
                          WHERE trim(p) <> ''
                            AND len(string_split(trim(p), ' ')) <= 4),
                   wo AS (SELECT unnest(string_split(phrase, ' ')) AS word,
                                 len(string_split(phrase, ' ')) AS plen
                          FROM ph),
                   wscore AS (SELECT word, sum(plen) / CAST(count(*) AS DOUBLE) AS wscore
                              FROM wo GROUP BY 1),
                   pstats AS (SELECT phrase, count(*) AS n_occ FROM ph GROUP BY 1),
                   pw AS (SELECT phrase, unnest(string_split(phrase, ' ')) AS word
                          FROM (SELECT DISTINCT phrase FROM ph)),
                   ps AS (SELECT pw.phrase, round(sum(w.wscore), 4) AS score,
                                 CAST(count(*) AS INT) AS n_words
                          FROM pw JOIN wscore w USING (word) GROUP BY 1)
              SELECT ps.phrase, s.n_occ, ps.n_words, ps.score
              FROM ps JOIN pstats s USING (phrase)
              ORDER BY score DESC, phrase LIMIT 15""")),

    // Gopher-style duplicate-n-gram repetition (Rae et al. 2021 §A1.1:
    // "fraction of tokens in duplicated n-grams" — the within-doc
    // repetition gate q_repetition_ratio's duplicate-LINE fraction can't
    // see). Trigrams form scan-locally (index-lambda over the token
    // array — no joins to build n-grams), then ONE (doc, gram)-keyed
    // rollup counts within-doc multiplicity; dup_frac = occurrences of
    // non-unique trigrams / all trigrams, top_share = the modal
    // trigram's share. Both are integer ratios — no float drift can move
    // the ordering — and the top-15 cut breaks ties on doc_id. Shape at
    // 100 TB: the shuffle carries (doc, gram) partial counts, ~doc-length
    // bounded per doc; no corpus-wide vocabulary is built.
    QueryDef(
      "q_rep_ngram",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("t"))
          .withColumn("nt", size(col("t")))
          .filter(col("nt") >= 3)
        val grams = toks.select(col("doc_id"), explode(
          transform(
            slice(col("t"), lit(1), greatest(col("nt") - 2, lit(0))),
            (x, i) => concat_ws(" ", x,
              element_at(col("t"), i + lit(2)),
              element_at(col("t"), i + lit(3))))).as("g"))
        grams.groupBy("doc_id", "g")
          .agg(count(lit(1)).as("n"))
          .groupBy("doc_id")
          .agg(
            sum("n").as("n_tri"),
            sum(when(col("n") > 1, col("n")).otherwise(0L)).as("dup_occ"),
            max("n").as("top_n"))
          .filter(col("n_tri") >= 10)
          .select(col("doc_id"), col("n_tri"),
            (round(col("dup_occ") / col("n_tri"), 4) + lit(0.0)).as("dup_frac"),
            (round(col("top_n") / col("n_tri"), 4) + lit(0.0)).as("top_share"))
          .orderBy(desc("dup_frac"), asc("doc_id"))
          .limit(15)
      },
      Some("""WITH tok AS (SELECT doc_id,
                                  generate_subscripts(string_split(text, ' '), 1) AS i,
                                  unnest(string_split(text, ' ')) AS w
                           FROM documents),
                   g AS (SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS g
                         FROM tok a
                         JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
                         JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
                   cnt AS (SELECT doc_id, g, count(*) AS n FROM g GROUP BY 1, 2),
                   per AS (SELECT doc_id,
                                  CAST(sum(n) AS BIGINT) AS n_tri,
                                  CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END)
                                       AS BIGINT) AS dup_occ,
                                  CAST(max(n) AS BIGINT) AS top_n
                           FROM cnt GROUP BY 1)
              SELECT doc_id, n_tri,
                     round(CAST(dup_occ AS DOUBLE) / n_tri, 4) + 0 AS dup_frac,
                     round(CAST(top_n AS DOUBLE) / n_tri, 4) + 0 AS top_share
              FROM per WHERE n_tri >= 10
              ORDER BY dup_frac DESC, doc_id LIMIT 15""")),

    // Flesch reading-ease scoring (readability gates sit next to the
    // Gopher/C4 quality gates in corpus curation): sentences = non-empty
    // [.!?]-splits, syllables = vowel-group runs — both engines count
    // with the same regex so the heuristic is deterministic. One codegen
    // scan per doc, dictionary-sized per-lang rollup.
    QueryDef(
      "q_readability",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .withColumn("n_words",
            size(expr("filter(split(text, ' '), w -> w <> '')")).cast("double"))
          .withColumn("n_sents",
            size(expr("filter(split(text, '[.!?]+'), x -> length(trim(x)) > 0)"))
              .cast("double"))
          .withColumn("n_syl",
            size(expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
              .cast("double"))
          .filter(col("n_words") > 0 && col("n_sents") > 0)
          .withColumn("flesch",
            lit(206.835) - lit(1.015) * (col("n_words") / col("n_sents")) -
              lit(84.6) * (col("n_syl") / col("n_words")))
          // Per-row flesch IS bit-identical across engines (integer-
          // derived doubles through the same correctly-rounded flops) —
          // but flesch values live on fine RATIONAL grids that can hit a
          // true .xx5 exactly (the r14 multi-scale gate caught doc 493:
          // 206.835 − 1.015·18 − 84.6·22/18 = 85.165 EXACTLY, where
          // Spark's decimal-repr rounding said 85.16 and DuckDB's
          // float-multiply rounding said 85.17). Display rounding
          // therefore happens in INTEGER space: micro-unit quantization,
          // then a half-representable /10⁴ to cent counts — 8516.5 is an
          // exact double, and both engines round a true half away from
          // zero — then one exact /100 for display. No step depends on
          // engine-specific round() semantics of non-representable
          // decimals.
          .withColumn("flesch_u", round(col("flesch") * 1e6).cast("long"))
        docs.groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            (round(sum("flesch_u").cast("double") / count(lit(1)) / lit(10000.0))
              / lit(100.0) + lit(0.0)).as("avg_flesch"),
            (round(min("flesch_u").cast("double") / lit(10000.0))
              / lit(100.0) + lit(0.0)).as("min_flesch"),
            (round(max("flesch_u").cast("double") / lit(10000.0))
              / lit(100.0) + lit(0.0)).as("max_flesch"))
          .orderBy("lang")
      },
      Some("""WITH f AS (SELECT lang,
                     CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
                          AS DOUBLE) AS n_words,
                     CAST(len(list_filter(string_split_regex(text, '[.!?]+'),
                                          x -> len(trim(x)) > 0)) AS DOUBLE) AS n_sents,
                     CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                          AS DOUBLE) AS n_syl
                   FROM documents),
                   sc AS (SELECT lang,
                                 206.835 - 1.015 * (n_words / n_sents)
                                         - 84.6 * (n_syl / n_words) AS flesch
                          FROM f WHERE n_words > 0 AND n_sents > 0),
                   scu AS (SELECT lang,
                                  CAST(round(flesch * 1e6) AS BIGINT) AS flesch_u
                           FROM sc)
              SELECT lang, count(*) AS n_docs,
                     round(CAST(sum(flesch_u) AS DOUBLE) / count(*) / 10000.0)
                       / 100.0 + 0 AS avg_flesch,
                     round(CAST(min(flesch_u) AS DOUBLE) / 10000.0)
                       / 100.0 + 0 AS min_flesch,
                     round(CAST(max(flesch_u) AS DOUBLE) / 10000.0)
                       / 100.0 + 0 AS max_flesch
              FROM scu GROUP BY 1 ORDER BY lang""")),

    // Zipf-slope fit of the term-frequency distribution — the one-number
    // corpus health check (natural text sits near slope −1; synthetic or
    // template-heavy corpora drift off). The top-100 ranking comes off
    // the bounded string heap (posexplode order IS the rank — no
    // vocabulary-sized window anywhere), then regr_slope over
    // (ln rank, ln count) is a 100-row scalar aggregate.
    QueryDef(
      "q_zipf_slope",
      (s, d) => {
        val counts = Tables.documents(s, d)
          .select(explode(expr(
            "filter(split(lower(text), ' '), w -> w <> '')")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("cnt"))
          .agg(graft.functions.VectorFns.topKByStr(
            col("cnt").cast("double"), col("w"), 100).as("top"))
          .select(posexplode(col("top")))
          .select((col("pos") + 1).cast("double").as("rank"),
            col("col.score").as("cnt"))
        counts.agg(
          count(lit(1)).as("n_terms"),
          (round(expr("regr_slope(ln(cnt), ln(rank))"), 4) + lit(0.0)).as("zipf_slope"),
          (round(expr("regr_r2(ln(cnt), ln(rank))"), 4) + lit(0.0)).as("r2"))
      },
      Some("""WITH c AS (SELECT w, count(*) AS cnt
                         FROM (SELECT unnest(list_filter(
                                 string_split(lower(text), ' '), x -> x <> '')) AS w
                               FROM documents)
                         GROUP BY 1),
                   top AS (SELECT CAST(row_number() OVER (ORDER BY cnt DESC, w)
                                       AS DOUBLE) AS rank,
                                  CAST(cnt AS DOUBLE) AS cnt
                           FROM c ORDER BY cnt DESC, w LIMIT 100)
              SELECT count(*) AS n_terms,
                     round(regr_slope(ln(cnt), ln(rank)), 4) + 0 AS zipf_slope,
                     round(regr_r2(ln(cnt), ln(rank)), 4) + 0 AS r2
              FROM top""")),

    // Linear quality CLASSIFIER scoring — the fastText-style filter every
    // LLM curation pipeline runs at ingest (a trained linear model over
    // bag-of-words features, applied to every document). Weights here are
    // a fixed INTEGER vocabulary table so the per-doc feature sum is
    // integer-exact on both engines (a float weight vector would make the
    // hash gate hostage to summation order); the score is one double
    // division at the end: score = Σ w[token] / n_tokens, keep = Σ > 0.
    // Spark-first shape: the weight table is a LITERAL MAP probed inside
    // a codegen'd aggregate HOF — fully scan-local, zero joins, zero
    // shuffles before the final ORDER BY; at 100 TB this is the same
    // single-pass scan as any transform. A real model's 100k-term vector
    // ships the same way (broadcast map), or as a broadcast join for
    // million-term vocabularies.
    QueryDef(
      "q_quality_classifier",
      (s, d) => {
        val w: Map[String, Long] = Map(
          "research" -> 8L, "analysis" -> 7L, "theory" -> 6L, "data" -> 5L,
          "model" -> 5L, "results" -> 4L, "method" -> 4L,
          "click" -> -9L, "free" -> -7L, "buy" -> -8L, "subscribe" -> -6L,
          "winner" -> -5L, "offer" -> -5L, "deal" -> -4L)
        val wmap = typedlit(w)
        val toks = TextShingles.wordTokens(col("text"))
        Tables.documents(s, d)
          .select(col("doc_id"), toks.as("t"))
          .select(
            col("doc_id"),
            size(col("t")).as("n_tokens"),
            size(filter(col("t"), t => element_at(wmap, t).isNotNull))
              .as("n_matched"),
            aggregate(col("t"), lit(0L),
              (acc, t) => acc + coalesce(element_at(wmap, t), lit(0L)))
              .as("sw"))
          .select(
            col("doc_id"), col("n_tokens"), col("n_matched"),
            round(col("sw").cast("double") / col("n_tokens"), 4).as("score"),
            (col("sw") > 0).as("keep"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id,
                     len(string_split(lower(text), ' ')) AS n_tokens,
                     unnest(string_split(lower(text), ' ')) AS tok
                   FROM documents),
                   sc AS (SELECT doc_id,
                            any_value(n_tokens) AS n_tokens,
                            count(CASE WHEN tok IN ('research','analysis','theory',
                                  'data','model','results','method','click','free',
                                  'buy','subscribe','winner','offer','deal')
                                  THEN 1 END) AS matched,
                            sum(CASE tok WHEN 'research' THEN 8 WHEN 'analysis' THEN 7
                                WHEN 'theory' THEN 6 WHEN 'data' THEN 5
                                WHEN 'model' THEN 5 WHEN 'results' THEN 4
                                WHEN 'method' THEN 4 WHEN 'click' THEN -9
                                WHEN 'free' THEN -7 WHEN 'buy' THEN -8
                                WHEN 'subscribe' THEN -6 WHEN 'winner' THEN -5
                                WHEN 'offer' THEN -5 WHEN 'deal' THEN -4
                                ELSE 0 END) AS sw
                          FROM t GROUP BY doc_id)
              SELECT doc_id,
                     CAST(n_tokens AS INT) AS n_tokens,
                     CAST(matched AS INT) AS n_matched,
                     round(CAST(sw AS BIGINT) * 1.0 / n_tokens, 4) AS score,
                     CAST(sw AS BIGINT) > 0 AS keep
              FROM sc ORDER BY doc_id"""))
  )
}
