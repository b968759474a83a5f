package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** §K corpus curation, part 2 — the cross-document operators a
  * training-data pipeline runs AFTER per-document scoring: span-level
  * dedup (the C4/MassiveText line-dedup shape), unigram-LM quality
  * scoring (the CCNet perplexity-filter shape), weighted mixture
  * sampling with epoch replication (data-mixture assembly), and exact
  * corpus n-gram statistics (the exact twin of q_frequent_terms'
  * Misra–Gries sketch).
  *
  * All four are exactly SQL-expressible, so each carries a DuckDB oracle
  * — determinism on any partitioning is part of the contract.
  */
object CorpusQueries {

  val defs: Seq[QueryDef] = Seq(
    // Cross-corpus SPAN dedup: every doc is chunked into fixed 10-token
    // spans and a span occurrence survives only if it is the FIRST
    // occurrence of that exact span corpus-wide (ordered by doc_id, then
    // position — the keep-first policy of C4's line dedup). Shape at
    // 100 TB: chunking is scan-local (one transform per row), the only
    // shuffle is the hash-partition by span for the keep-first window —
    // exactly one pass, no joins, skew bounded because a span that occurs
    // k times costs k rows in one partition (boilerplate spans are the
    // skew risk; cap-by-df like q_dedup_ngram_jaccard's maxShingleDf is
    // the documented knob if a production corpus needs it).
    QueryDef(
      "q_dedup_span",
      (s, d) =>
        graft.dedup.SpanDedup.markSpans(
            Tables.documents(s, d), "doc_id", "text", spanLen = 10)
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_spans"),
            sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
          .select(col("doc_id"), col("n_spans"), col("n_kept"),
            round(col("n_kept") / col("n_spans").cast("double"), 4).as("keep_ratio"))
          .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
                   sp0 AS (SELECT doc_id,
                                  unnest([{'span_idx': i,
                                           'span': array_to_string(w[(i*10+1):(i*10+10)], ' ')}
                                          FOR i IN range(0, CAST(ceil(len(w)/10.0) AS BIGINT))]) AS s
                           FROM t),
                   sp AS (SELECT doc_id, CAST(s.span_idx AS INT) AS span_idx, s.span AS span FROM sp0),
                   k AS (SELECT doc_id, span_idx,
                                row_number() OVER (PARTITION BY span ORDER BY doc_id, span_idx) AS rn
                         FROM sp)
              SELECT doc_id, count(*) AS n_spans,
                     CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                     round(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 4) AS keep_ratio
              FROM k GROUP BY 1 ORDER BY doc_id""")),

    // Unigram-LM negative log-likelihood per document (the CCNet-style
    // perplexity quality filter, with the corpus itself as the LM): score
    // = ln(total_tokens) - mean(ln(count(w))) over the doc's token
    // occurrences — high score = rare-token-heavy (possibly noise), low =
    // common-token-heavy (possibly boilerplate). Shape at 100 TB: the
    // corpus token total is a SCALAR aggregate broadcast onto the vocab
    // (the q_tfidf_top N pattern — web-scale vocab never funnels through
    // a single-partition window), and the score join broadcasts the vocab
    // to a single corpus scan.
    QueryDef(
      "q_lm_quality",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        val freq0 = tok.groupBy("w").agg(count(lit(1)).as("cnt"))
        val freq = freq0
          .crossJoin(broadcast(freq0.agg(log(sum("cnt")).as("ln_total"))))
        tok.join(broadcast(freq), Seq("w"))
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_tokens"),
            round(first(col("ln_total")) - avg(log(col("cnt"))), 3).as("avg_nll"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
                   freq AS (SELECT w, count(*) AS cnt FROM tok GROUP BY 1),
                   tot AS (SELECT sum(cnt) AS total FROM freq)
              SELECT doc_id, count(*) AS n_tokens,
                     round(ln((SELECT total FROM tot)) - avg(ln(cnt)), 3) AS avg_nll
              FROM tok JOIN freq USING (w)
              GROUP BY doc_id ORDER BY doc_id""")),

    // Bigram-LM quality scoring — the context-aware upgrade of
    // q_lm_quality's unigram NLL: per-doc average of
    // -ln P(w2|w1) = ln(c(w1·) + V) - ln(c(w1,w2) + 1) (add-one smoothed
    // conditional). Shape at 100 TB: bigram counting is ONE scan-local
    // explode + vocab²-bounded rollup; the predecessor-context table
    // derives from THAT rollup (no second corpus pass for c1); doc
    // bigrams meet the count tables in an equi-join on the gram key —
    // the only corpus-sized shuffle — and the vocab constant rides a
    // scalar broadcast. Docs with <2 tokens (incl. null text) surface
    // with n_bigrams=0, avg_nll=null instead of vanishing.
    QueryDef(
      "q_lm_bigram",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val toksDf = docs.select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
        val t = col("toks")
        val grams = transform(sequence(lit(1), size(t) - 1), i =>
          concat(element_at(t, i), lit(" "), element_at(t, i + 1)))
        val docBg = toksDf.filter(size(t) >= 2)
          .select(col("doc_id"), explode(grams).as("gram"))
        val c12 = docBg.groupBy("gram").agg(count(lit(1)).as("c12"))
        val c1 = c12.groupBy(substring_index(col("gram"), " ", 1).as("w1"))
          .agg(sum("c12").as("c1"))
        val vocab = toksDf.select(explode(t).as("w")).agg(countDistinct("w").as("v"))
        val scored = docBg
          .join(c12, Seq("gram"))
          .join(broadcast(c1),
            substring_index(col("gram"), " ", 1) === c1("w1"))
          .crossJoin(broadcast(vocab))
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("nb"),
            avg(log(col("c1") + col("v")) - log(col("c12") + lit(1))).as("nll"))
        docs.select("doc_id").join(scored, Seq("doc_id"), "left_outer")
          .select(
            col("doc_id"),
            coalesce(col("nb"), lit(0L)).as("n_bigrams"),
            (round(col("nll"), 3) + lit(0.0)).as("avg_nll"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
                   bg AS (SELECT doc_id, unnest([w[i] || ' ' || w[i+1]
                                                 FOR i IN range(1, len(w))]) AS gram
                          FROM t WHERE len(w) >= 2),
                   c12 AS (SELECT gram, count(*) AS c12 FROM bg GROUP BY 1),
                   c1 AS (SELECT split_part(gram, ' ', 1) AS w1,
                                 CAST(sum(c12) AS BIGINT) AS c1
                          FROM c12 GROUP BY 1),
                   v AS (SELECT count(DISTINCT u.w1) AS v
                         FROM (SELECT unnest(w) AS w1 FROM t) u),
                   sc AS (SELECT doc_id, count(*) AS nb,
                                 avg(ln(c1.c1 + v.v) - ln(c12.c12 + 1)) AS nll
                          FROM bg
                          JOIN c12 USING (gram)
                          JOIN c1 ON split_part(bg.gram, ' ', 1) = c1.w1
                          CROSS JOIN v
                          GROUP BY 1)
              SELECT d.doc_id AS doc_id, coalesce(sc.nb, 0) AS n_bigrams,
                     round(sc.nll, 3) + 0 AS avg_nll
              FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
              ORDER BY d.doc_id""")),

    // Weighted mixture sampling with EPOCH REPLICATION — the data-mixture
    // assembly step: each source gets a target rate (src0 upsampled 2.5×,
    // src1 downsampled to 0.25×, everything else 1×); a doc contributes
    // floor(rate) full epochs plus one fractional epoch kept by content
    // hash, so the sample is reproducible on any cluster, any retry, any
    // partitioning (same md5 in DuckDB verifies it exactly). Shape at
    // 100 TB: explode-by-epoch is scan-local with bounded fan-out
    // (ceil(max rate)), the decision is a pure per-row predicate — no
    // shuffle at all before the per-source rollup.
    QueryDef(
      "q_mix_weighted",
      (s, d) =>
        graft.pipeline.Mixture.sample(
            Tables.documents(s, d), "text", "source",
            rates = Map("src0" -> 2.5, "src1" -> 0.25), defaultRate = 1.0)
          .groupBy("source")
          .agg(
            countDistinct(col("doc_id")).as("n_docs_sampled"),
            count(lit(1)).as("n_samples"),
            sum(size(split(col("text"), " ")).cast("long")).as("tokens_out"))
          .orderBy("source"),
      Some("""WITH cfg AS (SELECT doc_id, text, source,
                                  CASE source WHEN 'src0' THEN 2.5
                                              WHEN 'src1' THEN 0.25
                                              ELSE 1.0 END AS rate
                           FROM documents),
                   ep AS (SELECT doc_id, text, source, rate,
                                 CAST(unnest(range(1, CAST(ceil(rate) AS BIGINT) + 1)) AS INT) AS epoch
                          FROM cfg),
                   kept AS (SELECT * FROM ep
                            WHERE epoch <= floor(rate)
                               OR substring(md5(text || '#' || epoch), 1, 4) <
                                  lpad(lower(hex(CAST(floor((rate - floor(rate)) * 65536) AS BIGINT))), 4, '0'))
              SELECT source, count(DISTINCT doc_id) AS n_docs_sampled,
                     count(*) AS n_samples,
                     CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens_out
              FROM kept GROUP BY 1 ORDER BY source""")),

    // Temperature-scaled source mixing — the standard multi-source
    // rebalancing recipe (stratum probability ∝ n^alpha with alpha=0.5,
    // flattening toward uniform at constant corpus size). Unlike
    // q_mix_weighted the rates are COMPUTED from the data — one
    // dictionary-sized rollup, broadcast back — then the identical
    // content-hash epoch replication applies. The oracle replays the
    // rate arithmetic (rounded to 6 decimals on both sides) and the md5
    // keep decisions exactly.
    QueryDef(
      "q_mix_temperature",
      (s, d) =>
        graft.pipeline.Mixture.sampleTemperature(
            Tables.documents(s, d), "text", "source", alpha = 0.5)
          .groupBy("source")
          .agg(
            (round(min(col("mix_rate")), 6) + lit(0.0)).as("rate"),
            countDistinct(col("doc_id")).as("n_docs_sampled"),
            count(lit(1)).as("n_samples"))
          .orderBy("source"),
      Some("""WITH cnt AS (SELECT source, CAST(count(*) AS DOUBLE) AS n
                           FROM documents GROUP BY 1),
                   tot AS (SELECT sum(n) AS nn, sum(pow(n, 0.5)) AS ww FROM cnt),
                   r AS (SELECT source, round(pow(n, 0.5) / ww * nn / n, 6) AS rate
                         FROM cnt CROSS JOIN tot),
                   cfg AS (SELECT d.doc_id, d.text, d.source, r.rate
                           FROM documents d JOIN r USING (source)),
                   ep AS (SELECT doc_id, text, source, rate,
                                 CAST(unnest(range(1, CAST(ceil(rate) AS BIGINT) + 1)) AS INT) AS epoch
                          FROM cfg),
                   kept AS (SELECT * FROM ep
                            WHERE epoch <= floor(rate)
                               OR substring(md5(text || '#' || epoch), 1, 4) <
                                  lpad(lower(hex(CAST(floor((rate - floor(rate)) * 65536) AS BIGINT))), 4, '0'))
              SELECT source, round(min(rate), 6) + 0 AS rate,
                     count(DISTINCT doc_id) AS n_docs_sampled,
                     count(*) AS n_samples
              FROM kept GROUP BY 1 ORDER BY source""")),

    // Hashing-trick document embedding (feature-hashing vectorizer):
    // vocabulary-free, deterministic, scan-local bucketing + one per-doc
    // rollup — the featurization step that feeds the ANN/embedding-dedup
    // family before any model exists. dim=8 here so each dimension is a
    // driver-comparable scalar column; the API (pipeline.TextFeaturizer)
    // takes any dim. The oracle replays the md5-bucket arithmetic and the
    // L2 normalization exactly.
    QueryDef(
      "q_text_embed",
      (s, d) => {
        val dim = 8
        graft.pipeline.TextFeaturizer.embed(
            Tables.documents(s, d), "doc_id", "text", dim)
          .select(col("doc_id") +:
            (0 until dim).map(i =>
              round(element_at(col("embedding"), i + 1), 4).as(s"d$i")): _*)
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
                   b AS (SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 4)) AS INT) % 8 AS b
                         FROM tok WHERE w <> ''),
                   tf AS (SELECT doc_id,
                                 sum(CASE WHEN b = 0 THEN 1.0 ELSE 0 END) AS t0,
                                 sum(CASE WHEN b = 1 THEN 1.0 ELSE 0 END) AS t1,
                                 sum(CASE WHEN b = 2 THEN 1.0 ELSE 0 END) AS t2,
                                 sum(CASE WHEN b = 3 THEN 1.0 ELSE 0 END) AS t3,
                                 sum(CASE WHEN b = 4 THEN 1.0 ELSE 0 END) AS t4,
                                 sum(CASE WHEN b = 5 THEN 1.0 ELSE 0 END) AS t5,
                                 sum(CASE WHEN b = 6 THEN 1.0 ELSE 0 END) AS t6,
                                 sum(CASE WHEN b = 7 THEN 1.0 ELSE 0 END) AS t7
                          FROM b GROUP BY 1),
                   n AS (SELECT *, sqrt(t0*t0 + t1*t1 + t2*t2 + t3*t3
                                        + t4*t4 + t5*t5 + t6*t6 + t7*t7) AS nrm
                         FROM tf)
              SELECT doc_id,
                     round(t0 / nrm, 4) AS d0, round(t1 / nrm, 4) AS d1,
                     round(t2 / nrm, 4) AS d2, round(t3 / nrm, 4) AS d3,
                     round(t4 / nrm, 4) AS d4, round(t5 / nrm, 4) AS d5,
                     round(t6 / nrm, 4) AS d6, round(t7 / nrm, 4) AS d7
              FROM n ORDER BY doc_id""")),

    // Deterministic training-shard assignment: each doc lands in one of
    // N shards by CONTENT hash (md5 — reproducible on any cluster and
    // under any input partitioning, unlike Spark's partition-dependent
    // monotonically_increasing_id or rand). The same column feeds
    // DataFrameWriter.partitionBy for the physical export; here the query
    // reports per-shard balance stats the pipeline gates on. Scan-local
    // bucket + one dictionary-sized (8-group) rollup.
    QueryDef(
      "q_shard_assign",
      (s, d) =>
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            graft.functions.HashBuckets.md5Bucket(col("text"), 8).as("shard"),
            size(split(col("text"), " ")).cast("long").as("toks"))
          .groupBy("shard")
          .agg(
            count(lit(1)).as("n_docs"),
            sum("toks").as("n_tokens"),
            sum("doc_id").as("id_checksum"))
          .orderBy("shard"),
      Some("""WITH s AS (SELECT doc_id,
                     CAST(('0x' || substr(md5(text), 1, 4)) AS INT) % 8 AS shard,
                     len(string_split(text, ' ')) AS toks
                   FROM documents)
              SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(toks) AS BIGINT) AS n_tokens,
                     CAST(sum(doc_id) AS BIGINT) AS id_checksum
              FROM s GROUP BY 1 ORDER BY shard""")),

    // Sliding-window RAG/context chunking (pipeline.Chunker): 30-token
    // windows advancing by 20 (10-token overlap) WITHIN each document —
    // entirely scan-local (tokenize + bounded index explode + slice, all
    // codegen), no shuffle. Chunk content is md5'd so the comparator sees
    // scalar columns; the oracle replays the same slicing in DuckDB.
    QueryDef(
      "q_chunk_docs",
      (s, d) => {
        graft.pipeline.Chunker.slidingWindows(
            Tables.documents(s, d), "doc_id", "text", window = 30, stride = 20)
          .select(
            col("doc_id"), col("chunk_idx"),
            size(col("chunk")).as("n_tokens"),
            md5(array_join(col("chunk"), " ")).as("chunk_md5"))
          .orderBy("doc_id", "chunk_idx")
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
                   idx AS (SELECT doc_id, t,
                                  unnest(generate_series(0,
                                    CAST(ceil(greatest(len(t) - 30, 0) / 20.0) AS BIGINT))) AS i
                           FROM toks),
                   chunks AS (SELECT doc_id, CAST(i AS INT) AS chunk_idx,
                                     t[i * 20 + 1 : i * 20 + 30] AS chunk
                              FROM idx)
              SELECT doc_id, chunk_idx,
                     CAST(len(chunk) AS INT) AS n_tokens,
                     md5(array_to_string(chunk, ' ')) AS chunk_md5
              FROM chunks ORDER BY doc_id, chunk_idx""")),

    // Exact per-language top-3 bigrams with a deterministic tie-break
    // (count DESC, gram ASC) — the exact twin of q_frequent_terms'
    // Misra–Gries sketch, for when the pipeline needs true counts (e.g.
    // boilerplate-phrase blocklists). Shape at 100 TB: bigram explosion
    // is scan-local; the (lang, gram) count rollup is the one unavoidable
    // shuffle; the top-3 selection is the k-bounded `top_k_by_str` heap
    // aggregate (partial per map task), so only (langs × partitions × 3)
    // entries cross the second shuffle instead of the whole vocab²-sized
    // count table sorting in one reducer per lang. The token array is
    // MATERIALIZED in its own projection before the HOF: a `split` Column
    // inlined into a `transform` lambda is re-evaluated per element in the
    // interpreted HOF path — O(tokens²) per doc (measured 3.5s → <1s at
    // sf0.1; same trap word_shingle_hashes §L fixed at the codegen level).
    // Counts are exact in double below 2^53, so the cast round-trips.
    QueryDef(
      "q_ngram_top",
      (s, d) => {
        val toks = col("toks")
        val grams = transform(sequence(lit(1), size(toks) - 1), i =>
          concat(element_at(toks, i), lit(" "), element_at(toks, i + 1)))
        Tables.documents(s, d)
          .select(col("lang"), split(lower(col("text")), " ").as("toks"))
          .filter(size(toks) >= 2)
          .select(col("lang"), explode(grams).as("gram"))
          .groupBy("lang", "gram")
          .agg(count(lit(1)).as("cnt"))
          .groupBy("lang")
          .agg(graft.functions.VectorFns.topKByStr(
            col("cnt").cast("double"), col("gram"), 3).as("top"))
          .select(col("lang"), posexplode(col("top")))
          .select(col("lang"), (col("pos") + 1).cast("int").as("rank"),
            col("col.key").as("gram"), col("col.score").cast("long").as("cnt"))
          .orderBy("lang", "rank")
      },
      Some("""WITH t AS (SELECT lang, string_split(lower(text), ' ') AS w FROM documents),
                   bg AS (SELECT lang, unnest([w[i] || ' ' || w[i+1]
                                               FOR i IN range(1, len(w))]) AS gram
                          FROM t WHERE len(w) >= 2),
                   c AS (SELECT lang, gram, count(*) AS cnt FROM bg GROUP BY 1, 2),
                   rk AS (SELECT lang, gram, cnt,
                                 row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, gram) AS rank
                          FROM c)
              SELECT lang, CAST(rank AS INT) AS rank, gram, cnt
              FROM rk WHERE rank <= 3 ORDER BY lang, rank""")),

    // Collocation / phrase detection by pointwise mutual information — the
    // word2vec-style phrase-vocabulary builder: bigrams whose observed
    // frequency far exceeds the independence expectation
    // (PMI = ln(p(ab) / (p(a)·p(b)))) become multi-word tokens for the
    // tokenizer. Shape at 100 TB: unigram and bigram counting are the two
    // scan-local explode+rollup passes (vocab / vocab²-bounded tables);
    // the totals are SCALAR aggregates broadcast back onto those tables
    // (ReuseExchange shares the rollup shuffle with the scalar branch —
    // no single-partition window even at web-scale vocab) and the
    // unigram probabilities broadcast onto the bigram table twice. Both
    // engines compute identical IEEE doubles (int counts → same
    // divisions/log), so the rounded PMI ranking cannot drift.
    QueryDef(
      "q_pmi_phrases",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(split(lower(col("text")), " ").as("toks"))
        val uni0 = toks.select(explode(col("toks")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("c_w"))
        val uni = uni0
          .crossJoin(broadcast(uni0.agg(sum("c_w").as("n_uni"))))
        val t = col("toks")
        val big0 = toks
          .filter(size(t) >= 2)
          .select(explode(transform(sequence(lit(1), size(t) - 1), i =>
            struct(element_at(t, i).as("w1"), element_at(t, i + 1).as("w2"))))
            .as("g"))
          .select(col("g.w1").as("w1"), col("g.w2").as("w2"))
          .groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
        val big = big0
          .crossJoin(broadcast(big0.agg(sum("c_ab").as("n_big"))))
        big
          .join(broadcast(uni.select(col("w").as("w1"), col("c_w").as("c_a"),
            col("n_uni"))), Seq("w1"))
          .join(broadcast(uni.select(col("w").as("w2"), col("c_w").as("c_b"))),
            Seq("w2"))
          .filter(col("c_ab") >= 25)
          .withColumn("pmi", round(
            log((col("c_ab") / col("n_big")) /
              ((col("c_a") / col("n_uni")) * (col("c_b") / col("n_uni")))), 3))
          .select(concat(col("w1"), lit(" "), col("w2")).as("phrase"),
            col("c_ab"), col("pmi"))
          .orderBy(desc("pmi"), asc("phrase"))
          .limit(15)
      },
      Some("""WITH t AS (SELECT string_split(lower(text), ' ') AS toks FROM documents),
                   uni AS (SELECT w, count(*) AS c_w
                           FROM (SELECT unnest(toks) AS w FROM t) GROUP BY 1),
                   nu AS (SELECT sum(c_w) AS n_uni FROM uni),
                   bg0 AS (SELECT unnest([{'w1': toks[i], 'w2': toks[i+1]}
                                          FOR i IN range(1, len(toks))]) AS g
                           FROM t WHERE len(toks) >= 2),
                   bg AS (SELECT g.w1 AS w1, g.w2 AS w2, count(*) AS c_ab
                          FROM bg0 GROUP BY 1, 2),
                   nb AS (SELECT sum(c_ab) AS n_big FROM bg)
              SELECT w1 || ' ' || w2 AS phrase, c_ab,
                     round(ln((c_ab / (SELECT n_big FROM nb))
                              / ((a.c_w / (SELECT n_uni FROM nu))
                                 * (b.c_w / (SELECT n_uni FROM nu)))), 3) AS pmi
              FROM bg JOIN uni a ON bg.w1 = a.w
                      JOIN uni b ON bg.w2 = b.w
              WHERE c_ab >= 25
              ORDER BY pmi DESC, phrase LIMIT 15""")),

    // Rule-based document quality gates — the C4/Gopher heuristic filter
    // pass: token count bounds, mean word length bounds, unique-token
    // ratio, and stopword presence, each an independent gate; a doc is
    // kept only if every gate passes. Per-language rollup reports total /
    // kept / per-gate failure counts — the numbers a curation run gates
    // on before committing a corpus snapshot. Shape at 100 TB: every gate
    // is scan-local (tokenize once — materialized before the HOFs — then
    // size/array_distinct/array_contains), the rollup is
    // language-dictionary-sized. Threshold comparisons are int-ratio
    // doubles computed identically on both engines, so the gate booleans
    // are engine-exact.
    QueryDef(
      "q_quality_gates",
      (s, d) => {
        val t = col("toks")
        Tables.documents(s, d)
          .select(col("lang"), col("text"), split(col("text"), " ").as("toks"))
          .select(
            col("lang"),
            size(t).cast("long").as("n_toks"),
            (length(regexp_replace(col("text"), " ", "")).cast("double") /
              size(t)).as("mean_wlen"),
            (size(array_distinct(t)).cast("double") / size(t)).as("uniq_ratio"),
            (array_contains(t, "the") || array_contains(t, "a")).as("has_stop"))
          .select(
            col("lang"),
            (col("n_toks") >= 20 && col("n_toks") <= 1000).as("g_len"),
            (col("mean_wlen") >= 2.0 && col("mean_wlen") <= 8.0).as("g_wlen"),
            (col("uniq_ratio") >= 0.3).as("g_uniq"),
            col("has_stop").as("g_stop"))
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("g_len") && col("g_wlen") && col("g_uniq") && col("g_stop"),
              1L).otherwise(0L)).as("n_kept"),
            sum(when(!col("g_len"), 1L).otherwise(0L)).as("fail_len"),
            sum(when(!col("g_wlen"), 1L).otherwise(0L)).as("fail_wlen"),
            sum(when(!col("g_uniq"), 1L).otherwise(0L)).as("fail_uniq"),
            sum(when(!col("g_stop"), 1L).otherwise(0L)).as("fail_stop"))
          .orderBy("lang")
      },
      Some("""WITH t AS (SELECT lang, text, string_split(text, ' ') AS toks FROM documents),
                   m AS (SELECT lang,
                                len(toks) AS n_toks,
                                CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(toks) AS mean_wlen,
                                CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS uniq_ratio,
                                (list_contains(toks, 'the') OR list_contains(toks, 'a')) AS has_stop
                         FROM t),
                   g AS (SELECT lang,
                                (n_toks >= 20 AND n_toks <= 1000) AS g_len,
                                (mean_wlen >= 2.0 AND mean_wlen <= 8.0) AS g_wlen,
                                (uniq_ratio >= 0.3) AS g_uniq,
                                has_stop AS g_stop
                         FROM m)
              SELECT lang, count(*) AS n_docs,
                     CAST(sum(CASE WHEN g_len AND g_wlen AND g_uniq AND g_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                     CAST(sum(CASE WHEN NOT g_len THEN 1 ELSE 0 END) AS BIGINT) AS fail_len,
                     CAST(sum(CASE WHEN NOT g_wlen THEN 1 ELSE 0 END) AS BIGINT) AS fail_wlen,
                     CAST(sum(CASE WHEN NOT g_uniq THEN 1 ELSE 0 END) AS BIGINT) AS fail_uniq,
                     CAST(sum(CASE WHEN NOT g_stop THEN 1 ELSE 0 END) AS BIGINT) AS fail_stop
              FROM g GROUP BY 1 ORDER BY lang""")),

    // Per-domain crawl capping — the over-representation control a crawl
    // curation pass runs before dedup: per-host corpus share, a share cap,
    // the derived keep-rate min(1, cap/share), and the EXACT deterministic
    // downsample by content hash (the q_sample_stratified predicate with a
    // rate computed FROM the data instead of configured). Reproducible on
    // any cluster/retry/partitioning; the oracle replays the md5 decisions
    // one-for-one. Shape at 100 TB: host parse is scan-local, the share
    // rollup is domain-dictionary-sized, the rates broadcast back onto one
    // corpus scan whose keep decision is a pure predicate.
    QueryDef(
      "q_domain_cap",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("text"),
            concat(col("lang"), lit("."), col("source"), lit(".example.com"))
              .as("host"))
        // corpus total as a scalar agg + broadcast crossJoin (the
        // q_tfidf_top pattern), NOT an unpartitioned window — web-crawl
        // host cardinality is ~1e8, and Window.partitionBy() would move
        // every host row to ONE partition for the total
        val counts = docs.groupBy("host").agg(count(lit(1)).as("n_docs"))
        val total = counts.agg(sum("n_docs").as("n_total"))
        val shares = counts.crossJoin(broadcast(total))
          .withColumn("share", col("n_docs") / col("n_total"))
          .drop("n_total")
          .withColumn("keep_rate", least(lit(1.0), lit(0.015) / col("share")))
        val thresh = lpad(lower(hex(floor(col("keep_rate") * 65536).cast("long"))), 4, "0")
        docs.join(broadcast(shares), Seq("host"))
          .withColumn("kept",
            col("keep_rate") >= 1.0 ||
              substring(md5(concat(col("text"), lit("#"), col("doc_id"))), 1, 4) < thresh)
          .groupBy("host")
          .agg(
            count(lit(1)).as("n_docs"),
            round(first(col("share")) * 100, 2).as("share_pct"),
            round(first(col("keep_rate")), 4).as("keep_rate"),
            sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
          .orderBy("host")
      },
      Some("""WITH docs AS (SELECT doc_id, text,
                                   lang || '.' || source || '.example.com' AS host
                            FROM documents),
                   shares AS (SELECT host, count(*) AS n_docs,
                                     count(*) / CAST((SELECT count(*) FROM docs) AS DOUBLE) AS share
                              FROM docs GROUP BY 1),
                   rates AS (SELECT *, least(1.0, 0.015 / share) AS keep_rate FROM shares),
                   dec AS (SELECT d.host, d.doc_id, r.n_docs, r.share, r.keep_rate,
                                  (r.keep_rate >= 1.0 OR
                                   substr(md5(d.text || '#' || d.doc_id), 1, 4) <
                                     lpad(lower(hex(CAST(floor(r.keep_rate * 65536) AS BIGINT))), 4, '0')) AS kept
                           FROM docs d JOIN rates r USING (host))
              SELECT host, count(*) AS n_docs,
                     round(any_value(share) * 100, 2) AS share_pct,
                     round(any_value(keep_rate), 4) AS keep_rate,
                     CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
              FROM dec GROUP BY 1 ORDER BY host""")),

    // Boilerplate span stripping by document frequency — the df-threshold
    // twin of q_dedup_span's keep-first policy: a 2-token span occurring in
    // MORE THAN maxDf distinct documents is boilerplate (header/footer/
    // navigation text in a real crawl) and is stripped from EVERY document.
    // Per-doc rollup reports span totals / boilerplate hits / kept ratio.
    // Shape at 100 TB: spanning is scan-local (token array materialized
    // before the HOF), the df rollup is span-vocabulary-bounded, and only
    // the (small) over-threshold boilerplate set broadcasts back onto the
    // span stream — the corpus never joins against the full span table.
    QueryDef(
      "q_boilerplate_strip",
      (s, d) => {
        val t = col("toks")
        val spanLen = 2
        val spans = Tables.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .select(col("doc_id"), explode(
            transform(
              sequence(lit(0),
                ceil(size(t) / lit(spanLen.toDouble)).cast("int") - 1),
              i => concat_ws(" ", slice(t, i * spanLen + 1, lit(spanLen)))))
            .as("span"))
        val boiler = spans.groupBy("span")
          .agg(countDistinct(col("doc_id")).as("df"))
          .filter(col("df") > 100)
          .select(col("span"), lit(true).as("is_boiler"))
        spans.join(broadcast(boiler), Seq("span"), "left_outer")
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_spans"),
            sum(when(col("is_boiler"), 1L).otherwise(0L)).as("n_boiler"))
          .select(col("doc_id"), col("n_spans"), col("n_boiler"),
            round((col("n_spans") - col("n_boiler")) / col("n_spans").cast("double"), 4)
              .as("kept_ratio"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
                   sp AS (SELECT doc_id,
                                 unnest([array_to_string(w[(i*2+1):(i*2+2)], ' ')
                                         FOR i IN range(0, CAST(ceil(len(w)/2.0) AS BIGINT))]) AS span
                          FROM t),
                   boiler AS (SELECT span FROM sp GROUP BY span
                              HAVING count(DISTINCT doc_id) > 100),
                   j AS (SELECT s.doc_id, s.span,
                                (b.span IS NOT NULL) AS is_boiler
                         FROM sp s LEFT JOIN boiler b ON s.span = b.span)
              SELECT doc_id, count(*) AS n_spans,
                     CAST(sum(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
                     round((count(*) - sum(CASE WHEN is_boiler THEN 1 ELSE 0 END))
                           / CAST(count(*) AS DOUBLE), 4) AS kept_ratio
              FROM j GROUP BY 1 ORDER BY doc_id""")),

    // Host-graph PageRank — the link-authority curation signal (host-level
    // PageRank is a standard quality feature over CommonCrawl-scale
    // corpora). The fixture link graph is synthesized deterministically
    // (doc in host A "links to" the host of doc (id²·13+7) mod N — the
    // quadratic-residue map concentrates in-links on a few hosts, so the
    // stationary distribution is genuinely non-uniform and a rank engine
    // that degenerates to uniform hash-mismatches; in a real crawl the
    // edge list comes from anchor hrefs); the ENGINE under test
    // is graph/PageRank.ranks: per-iteration join+agg on the edge list,
    // dangling mass as a scalar aggregate (never a global window), lazy
    // localCheckpoint truncation. Oracle: the same 5 damped iterations
    // unrolled as CTEs. Shape at 100 TB: host graph is ~10⁸ nodes / ~10¹⁰
    // edges — every per-iteration stage shuffles on the node key only.
    QueryDef(
      "q_pagerank_hosts",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
        // corpus size from parquet FOOTER metadata, not an eager
        // count() job (at 100 TB that count is its own corpus scan;
        // the footer read is driver-side and free) — same discipline
        // as q_dedup_embedding_prod's band tuning.
        val nDocs = graft.sources.SegmentCatalog
          .metadataRowCount(s, s"$d/documents.parquet")
        val b = docs.select(col("doc_id").as("b_id"), col("source").as("dst"))
        // Edge arithmetic reduces ids mod nDocs BEFORE squaring —
        // identical value by modular arithmetic, and (d%n)² < n² fits a
        // long for any n ≤ ~3e9 (any realistic host-graph dictionary)
        // REGARDLESS of how large doc ids grow: the r12 form reduced
        // only after d², which still ANSI-overflowed at ids ≈ 3.04e9.
        // Same expression in every graph builder and its oracle.
        val edges = docs.select(col("doc_id"), col("source").as("src"))
          .join(b, col("b_id") === (col("doc_id") % lit(nDocs) * (col("doc_id") % lit(nDocs)) % lit(nDocs) * 13 + 7) % lit(nDocs))
          .groupBy("src", "dst")
          .agg(count(lit(1)).cast("double").as("weight"))
        graft.graph.PageRank.ranks(edges, iterations = 5, damping = 0.85)
          .select(col("host"), round(col("rank"), 6).as("rank"))
          .orderBy("host")
      },
      Some("""WITH nd AS (SELECT count(*) AS c FROM documents),
                   e0 AS (SELECT a.source AS src, b.source AS dst,
                                 CAST(count(*) AS DOUBLE) AS w
                          FROM documents a
                          JOIN documents b
                            ON b.doc_id = (a.doc_id % (SELECT c FROM nd) * (a.doc_id % (SELECT c FROM nd)) % (SELECT c FROM nd) * 13 + 7) % (SELECT c FROM nd)
                          GROUP BY 1, 2),
                   hosts AS (SELECT src AS host FROM e0 UNION SELECT dst FROM e0),
                   nh AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM hosts),
                   outw AS (SELECT src, sum(w) AS ow FROM e0 GROUP BY 1),
                   e AS (SELECT e0.src, e0.dst, e0.w / outw.ow AS p
                         FROM e0 JOIN outw ON e0.src = outw.src),
                   r0 AS (SELECT host, 1.0 / (SELECT n FROM nh) AS rank FROM hosts),
                   r1 AS (SELECT h.host, (1.0 - 0.85) / (SELECT n FROM nh)
                                         + 0.85 * coalesce(i.fl, 0) AS rank
                          FROM hosts h LEFT JOIN
                            (SELECT e.dst, sum(e.p * r.rank) AS fl
                             FROM e JOIN r0 r ON e.src = r.host GROUP BY 1) i
                            ON h.host = i.dst),
                   r2 AS (SELECT h.host, (1.0 - 0.85) / (SELECT n FROM nh)
                                         + 0.85 * coalesce(i.fl, 0) AS rank
                          FROM hosts h LEFT JOIN
                            (SELECT e.dst, sum(e.p * r.rank) AS fl
                             FROM e JOIN r1 r ON e.src = r.host GROUP BY 1) i
                            ON h.host = i.dst),
                   r3 AS (SELECT h.host, (1.0 - 0.85) / (SELECT n FROM nh)
                                         + 0.85 * coalesce(i.fl, 0) AS rank
                          FROM hosts h LEFT JOIN
                            (SELECT e.dst, sum(e.p * r.rank) AS fl
                             FROM e JOIN r2 r ON e.src = r.host GROUP BY 1) i
                            ON h.host = i.dst),
                   r4 AS (SELECT h.host, (1.0 - 0.85) / (SELECT n FROM nh)
                                         + 0.85 * coalesce(i.fl, 0) AS rank
                          FROM hosts h LEFT JOIN
                            (SELECT e.dst, sum(e.p * r.rank) AS fl
                             FROM e JOIN r3 r ON e.src = r.host GROUP BY 1) i
                            ON h.host = i.dst),
                   r5 AS (SELECT h.host, (1.0 - 0.85) / (SELECT n FROM nh)
                                         + 0.85 * coalesce(i.fl, 0) AS rank
                          FROM hosts h LEFT JOIN
                            (SELECT e.dst, sum(e.p * r.rank) AS fl
                             FROM e JOIN r4 r ON e.src = r.host GROUP BY 1) i
                            ON h.host = i.dst)
              SELECT host, round(rank, 6) AS rank FROM r5 ORDER BY host""")),

    // SEEDED PageRank (TrustRank — Gyöngyi et al., VLDB 2004) over the
    // SAME host graph: the teleport vector is uniform over the 3
    // lexicographically-smallest hosts (a deterministic stand-in for an
    // editorial whitelist), so trust flows outward from the seeds and
    // decays per hop — the standard crawl-curation signal for propagating
    // a small trusted list to the unlabeled host universe. Same round
    // shape as q_pagerank_hosts; the oracle unrolls the 5 rounds with the
    // seed teleport INCLUDING the dangling-mass recycle term
    // ((1-d+d·danglingMass)·tele — the dK CTEs), so implementation and
    // oracle stay equal even on a corpus that produces a dst-only host;
    // every division CAST to DOUBLE so both engines run
    // identical IEEE arithmetic (round(·,6) absorbs parallel-sum ulp).
    QueryDef(
      "q_pagerank_seeded",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
        val nDocs = graft.sources.SegmentCatalog
          .metadataRowCount(s, s"$d/documents.parquet")
        val b = docs.select(col("doc_id").as("b_id"), col("source").as("dst"))
        val edges = docs.select(col("doc_id"), col("source").as("src"))
          .join(b, col("b_id") === (col("doc_id") % lit(nDocs) * (col("doc_id") % lit(nDocs)) % lit(nDocs) * 13 + 7) % lit(nDocs))
          .groupBy("src", "dst")
          .agg(count(lit(1)).cast("double").as("weight"))
        val hosts = edges.select(col("src").as("host"))
          .union(edges.select(col("dst").as("host"))).distinct()
        val seeds = hosts.orderBy("host").limit(3)
        graft.graph.PageRank.seededRanks(edges, seeds, iterations = 5, damping = 0.85)
          .select(col("host"), round(col("rank"), 6).as("trust"))
          .orderBy("host")
      },
      Some("""WITH nd AS (SELECT count(*) AS c FROM documents),
                   e0 AS (SELECT a.source AS src, b.source AS dst,
                                 CAST(count(*) AS DOUBLE) AS w
                          FROM documents a
                          JOIN documents b
                            ON b.doc_id = (a.doc_id % (SELECT c FROM nd) * (a.doc_id % (SELECT c FROM nd)) % (SELECT c FROM nd) * 13 + 7) % (SELECT c FROM nd)
                          GROUP BY 1, 2),
                   hosts AS (SELECT src AS host FROM e0 UNION SELECT dst FROM e0),
                   seeds AS (SELECT host FROM hosts ORDER BY host LIMIT 3),
                   ns AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM seeds),
                   tele AS (SELECT h.host,
                                   CASE WHEN s.host IS NOT NULL
                                        THEN CAST(1.0 AS DOUBLE) / (SELECT n FROM ns)
                                        ELSE CAST(0.0 AS DOUBLE) END AS t
                            FROM hosts h LEFT JOIN seeds s ON h.host = s.host),
                   outw AS (SELECT src, sum(w) AS ow FROM e0 GROUP BY 1),
                   e AS (SELECT e0.src, e0.dst, e0.w / outw.ow AS p
                         FROM e0 JOIN outw ON e0.src = outw.src),
                   dhosts AS (SELECT h.host FROM hosts h
                              LEFT JOIN outw o ON h.host = o.src
                              WHERE o.src IS NULL),
                   r0 AS (SELECT host, t AS rank FROM tele),
                   d0 AS (SELECT coalesce(sum(r.rank), 0) AS m
                          FROM r0 r JOIN dhosts d ON r.host = d.host),
                   r1 AS (SELECT te.host,
                                 (1.0 - 0.85 + 0.85 * (SELECT m FROM d0)) * te.t
                                          + 0.85 * coalesce(i.fl, 0) AS rank
                          FROM tele te LEFT JOIN
                            (SELECT e.dst, sum(e.p * r.rank) AS fl
                             FROM e JOIN r0 r ON e.src = r.host GROUP BY 1) i
                            ON te.host = i.dst),
                   d1 AS (SELECT coalesce(sum(r.rank), 0) AS m
                          FROM r1 r JOIN dhosts d ON r.host = d.host),
                   r2 AS (SELECT te.host,
                                 (1.0 - 0.85 + 0.85 * (SELECT m FROM d1)) * te.t
                                          + 0.85 * coalesce(i.fl, 0) AS rank
                          FROM tele te LEFT JOIN
                            (SELECT e.dst, sum(e.p * r.rank) AS fl
                             FROM e JOIN r1 r ON e.src = r.host GROUP BY 1) i
                            ON te.host = i.dst),
                   d2 AS (SELECT coalesce(sum(r.rank), 0) AS m
                          FROM r2 r JOIN dhosts d ON r.host = d.host),
                   r3 AS (SELECT te.host,
                                 (1.0 - 0.85 + 0.85 * (SELECT m FROM d2)) * te.t
                                          + 0.85 * coalesce(i.fl, 0) AS rank
                          FROM tele te LEFT JOIN
                            (SELECT e.dst, sum(e.p * r.rank) AS fl
                             FROM e JOIN r2 r ON e.src = r.host GROUP BY 1) i
                            ON te.host = i.dst),
                   d3 AS (SELECT coalesce(sum(r.rank), 0) AS m
                          FROM r3 r JOIN dhosts d ON r.host = d.host),
                   r4 AS (SELECT te.host,
                                 (1.0 - 0.85 + 0.85 * (SELECT m FROM d3)) * te.t
                                          + 0.85 * coalesce(i.fl, 0) AS rank
                          FROM tele te LEFT JOIN
                            (SELECT e.dst, sum(e.p * r.rank) AS fl
                             FROM e JOIN r3 r ON e.src = r.host GROUP BY 1) i
                            ON te.host = i.dst),
                   d4 AS (SELECT coalesce(sum(r.rank), 0) AS m
                          FROM r4 r JOIN dhosts d ON r.host = d.host),
                   r5 AS (SELECT te.host,
                                 (1.0 - 0.85 + 0.85 * (SELECT m FROM d4)) * te.t
                                          + 0.85 * coalesce(i.fl, 0) AS rank
                          FROM tele te LEFT JOIN
                            (SELECT e.dst, sum(e.p * r.rank) AS fl
                             FROM e JOIN r4 r ON e.src = r.host GROUP BY 1) i
                            ON te.host = i.dst)
              SELECT host, round(rank, 6) AS trust FROM r5 ORDER BY host""")),

    // HITS hub/authority over the SAME deterministic host graph as
    // q_pagerank_hosts (graph.Hits): two full power-iteration rounds with
    // IN-PLAN broadcast L1 normalizers (zero driver round-trips per
    // iteration) — per round, one join+agg per direction, the PageRank
    // shuffle shape exactly. The oracle unrolls both rounds as CTE
    // levels; round(·, 6) absorbs parallel-sum ulp drift.
    QueryDef(
      "q_hits_hosts",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
        // corpus size from parquet FOOTER metadata, not an eager
        // count() job (at 100 TB that count is its own corpus scan;
        // the footer read is driver-side and free) — same discipline
        // as q_dedup_embedding_prod's band tuning.
        val nDocs = graft.sources.SegmentCatalog
          .metadataRowCount(s, s"$d/documents.parquet")
        val b = docs.select(col("doc_id").as("b_id"), col("source").as("dst"))
        val edges = docs.select(col("doc_id"), col("source").as("src"))
          .join(b, col("b_id") === (col("doc_id") % lit(nDocs) * (col("doc_id") % lit(nDocs)) % lit(nDocs) * 13 + 7) % lit(nDocs))
          .groupBy("src", "dst")
          .agg(count(lit(1)).cast("double").as("weight"))
        graft.graph.Hits.hubsAndAuthorities(edges, iterations = 2)
          .select(col("host"),
            (round(col("auth"), 6) + lit(0.0)).as("auth"),
            (round(col("hub"), 6) + lit(0.0)).as("hub"))
          .orderBy("host")
      },
      Some("""WITH nd AS (SELECT count(*) AS c FROM documents),
                   e0 AS (SELECT a.source AS src, b.source AS dst,
                                 CAST(count(*) AS DOUBLE) AS w
                          FROM documents a
                          JOIN documents b
                            ON b.doc_id = (a.doc_id % (SELECT c FROM nd) * (a.doc_id % (SELECT c FROM nd)) % (SELECT c FROM nd) * 13 + 7) % (SELECT c FROM nd)
                          GROUP BY 1, 2),
                   hosts AS (SELECT src AS host FROM e0 UNION SELECT dst FROM e0),
                   a1r AS (SELECT e.dst, sum(e.w * 1.0) AS a
                           FROM e0 e GROUP BY 1),
                   a1 AS (SELECT h.host,
                                 coalesce(r.a, 0) / (SELECT sum(a) FROM a1r) AS auth
                          FROM hosts h LEFT JOIN a1r r ON h.host = r.dst),
                   h1r AS (SELECT e.src, sum(e.w * a1.auth) AS hh
                           FROM e0 e JOIN a1 ON e.dst = a1.host GROUP BY 1),
                   h1 AS (SELECT h.host,
                                 coalesce(r.hh, 0) / (SELECT sum(hh) FROM h1r) AS hub
                          FROM hosts h LEFT JOIN h1r r ON h.host = r.src),
                   a2r AS (SELECT e.dst, sum(e.w * h1.hub) AS a
                           FROM e0 e JOIN h1 ON e.src = h1.host GROUP BY 1),
                   a2 AS (SELECT h.host,
                                 coalesce(r.a, 0) / (SELECT sum(a) FROM a2r) AS auth
                          FROM hosts h LEFT JOIN a2r r ON h.host = r.dst),
                   h2r AS (SELECT e.src, sum(e.w * a2.auth) AS hh
                           FROM e0 e JOIN a2 ON e.dst = a2.host GROUP BY 1),
                   h2 AS (SELECT h.host,
                                 coalesce(r.hh, 0) / (SELECT sum(hh) FROM h2r) AS hub
                          FROM hosts h LEFT JOIN h2r r ON h.host = r.src)
              SELECT a2.host, round(a2.auth, 6) + 0 AS auth,
                     round(h2.hub, 6) + 0 AS hub
              FROM a2 JOIN h2 ON a2.host = h2.host ORDER BY a2.host""")),

    // BPE-style ADJACENT-PAIR statistics — the first step of tokenizer
    // training (count every adjacent symbol pair, merge the most frequent):
    // tokenize scan-locally, form the (tokᵢ, tokᵢ₊₁) pairs with a
    // zero-shuffle zip of two array slices, and roll up. Shape at 100 TB:
    // the only shuffle carries (pair, partial-count) rows — the pair
    // vocabulary is bounded by seen-vocab², in practice Zipf-tiny next to
    // the corpus — and the top-20 is a TakeOrderedAndProject, never a
    // global sort. Ties broken (count desc, a, b) so the cut is
    // deterministic on both engines.
    QueryDef(
      "q_bpe_pairs",
      (s, d) =>
        graft.engine.Tables.documents(s, d)
          .select(expr("regexp_extract_all(lower(text), '[a-z]+', 0)").as("toks"))
          .withColumn("n", size(col("toks")))
          .filter(col("n") >= 2)
          .select(explode(expr(
            "zip_with(slice(toks, 1, n - 1), slice(toks, 2, n - 1), " +
              "(a, b) -> struct(a, b))")).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("a"), col("b"))
          .limit(20),
      Some("""WITH t AS (SELECT regexp_extract_all(lower(text), '[a-z]+') AS toks
                         FROM documents),
                   p AS (SELECT toks[i] AS a, toks[i+1] AS b
                         FROM t, unnest(range(1, len(toks))) AS u(i))
              SELECT a, b, count(*) AS cnt
              FROM p GROUP BY 1, 2
              ORDER BY cnt DESC, a, b LIMIT 20""")),

    // PREFIX (truncated-duplicate) dedup — a crawl artifact the whole-text
    // md5 of q_dedup_exact cannot see: the same page fetched twice with
    // different truncation points is two different hashes but one document.
    // Candidate key is a scan-local fingerprint of the first k prefix
    // tokens (k=3 calibrates to the fixture's short synthetic docs so
    // groups exist at sf0.001; production uses 16–32), then one group-by
    // applies the KEEP-LONGEST policy with a deterministic (length,
    // doc_id) tie-break — encoded arithmetically (n·10⁷ + doc_id) so both
    // engines rank identically. Shape at 100 TB: exactly q_dedup_exact's —
    // one hash-partition group-by on the fingerprint, no joins; a hot
    // boilerplate prefix costs its own group only.
    QueryDef(
      "q_dedup_prefix",
      (s, d) =>
        graft.engine.Tables.documents(s, d)
          .select(col("doc_id"),
            expr("regexp_extract_all(lower(text), '[a-z]+', 0)").as("toks"))
          .withColumn("n", size(col("toks")).cast("long"))
          .filter(col("n") > 0)
          .withColumn("fp", md5(concat_ws(" ", slice(col("toks"), 1, 3))))
          .groupBy("fp")
          .agg(
            count(lit(1)).as("n_docs"),
            max("n").as("max_len"), min("n").as("min_len"),
            max_by(col("doc_id"), col("n") * 10000000L + col("doc_id"))
              .as("kept_doc"))
          .filter(col("n_docs") > 1)
          .orderBy("fp"),
      Some("""WITH t AS (SELECT doc_id,
                                regexp_extract_all(lower(text), '[a-z]+') AS toks
                         FROM documents),
                   s AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n,
                                md5(array_to_string(toks[1:3], ' ')) AS fp
                         FROM t WHERE len(toks) > 0),
                   g AS (SELECT fp, count(*) AS n_docs,
                                max(n) AS max_len, min(n) AS min_len,
                                arg_max(doc_id, n * 10000000 + doc_id) AS kept_doc
                         FROM s GROUP BY 1)
              SELECT fp, n_docs, max_len, min_len, kept_doc
              FROM g WHERE n_docs > 1 ORDER BY fp""")),

    // FILL-IN-THE-MIDDLE split prep (the FIM transformation code-LLM
    // pipelines apply to a corpus slice: cut each doc into
    // prefix/middle/suffix at deterministic points so training can
    // reorder them PSM/SPM): split offsets derive from the doc id via
    // integer arithmetic — reproducible under any partitioning, no RNG —
    // and the oracle md5s each piece, so the substring arithmetic is
    // hash-verified character-exact. Entirely scan-local: one projection,
    // zero shuffle at any corpus size, the same shape q_chunk_docs
    // proved flat at 10×.
    QueryDef(
      "q_fim_split",
      (s, d) =>
        graft.engine.Tables.documents(s, d)
          .select(col("doc_id"), col("text"), length(col("text")).cast("long").as("n"))
          .filter(col("n") >= 20)
          .withColumn("a", lit(1L) + (col("doc_id") * 7919L) % expr("n div 3"))
          .withColumn("m", lit(1L) + (col("doc_id") * 104729L) % expr("n div 3"))
          .select(col("doc_id"),
            col("a").as("n_prefix"), col("m").as("n_middle"),
            (col("n") - col("a") - col("m")).as("n_suffix"),
            md5(expr("substring(text, 1, CAST(a AS INT))")).as("md5_prefix"),
            md5(expr("substring(text, CAST(a + 1 AS INT), CAST(m AS INT))")).as("md5_middle"),
            md5(expr("substring(text, CAST(a + m + 1 AS INT))")).as("md5_suffix"))
          .orderBy("doc_id"),
      Some("""WITH s AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
                         FROM documents WHERE length(text) >= 20),
                   p AS (SELECT doc_id, text, n,
                                1 + (doc_id * 7919) % (n // 3) AS a,
                                1 + (doc_id * 104729) % (n // 3) AS m
                         FROM s)
              SELECT doc_id, a AS n_prefix, m AS n_middle,
                     n - a - m AS n_suffix,
                     md5(substr(text, 1, CAST(a AS INT))) AS md5_prefix,
                     md5(substr(text, CAST(a + 1 AS INT), CAST(m AS INT))) AS md5_middle,
                     md5(substr(text, CAST(a + m + 1 AS INT))) AS md5_suffix
              FROM p ORDER BY doc_id""")),

    // T5-STYLE SPAN CORRUPTION — the denoising-objective preprocessing
    // pass (Raffel et al., JMLR 2020): deterministically pick span starts
    // by a position hash (q_fim_split's content-hash discipline — no RNG,
    // replayable on both engines), mask runs of 3 tokens, collapse each
    // contiguous masked run to ONE sentinel in the input and emit the
    // masked tokens as the target. Everything is scan-local HOF
    // arithmetic over the token array (transform/filter/aggregate on
    // sequence(0, n−1) — no explode, no (doc, token) shuffle, nothing
    // but the final ORDER BY leaves the scan), so the pass is one
    // projection at any corpus size. The oracle replays the identical
    // index arithmetic with DuckDB list comprehensions.
    QueryDef(
      "q_span_corruption",
      (s, d) => {
        val toks = split(col("text"), " ")
        // span START at 0-indexed position i (≈1/13 of positions; spans
        // of 3 ⇒ ~20% of tokens masked, T5's neighborhood)
        def sStart(i: org.apache.spark.sql.Column) =
          ((col("doc_id") * lit(2654435761L) + i * lit(40503L))
            % lit(1000003L)) % lit(13L) === 0L
        def masked(i: org.apache.spark.sql.Column) =
          sStart(i) ||
            (i >= 1 && sStart(i - 1)) ||
            (i >= 2 && sStart(i - 2))
        // sentinel at the FIRST position of each contiguous masked run
        def sentinelAt(i: org.apache.spark.sql.Column) =
          masked(i) && (i === 0 || !masked(i - 1))
        val idx = sequence(lit(0L), size(col("__toks")).cast("long") - 1L)
        // HOF lambdas evaluate interpreted, once per element — so the
        // mask is materialized ONCE per row (one hash eval per position)
        // and every downstream lambda just indexes it, instead of
        // re-deriving masked()/sentinelAt() (≈8 hash evals per token).
        def mk(i: org.apache.spark.sql.Column) =
          element_at(col("__mk"), (i + 1).cast("int"))
        def sentinel(i: org.apache.spark.sql.Column) =
          mk(i) && (i === 0 || !mk(i - 1))
        graft.engine.Tables.documents(s, d)
          .select(col("doc_id"), toks.as("__toks"))
          .select(col("doc_id"), col("__toks"), idx.as("__idx"))
          .select(col("doc_id"), col("__toks"), col("__idx"),
            transform(col("__idx"), i => masked(i)).as("__mk"))
          .select(
            col("doc_id"),
            size(col("__toks")).cast("long").as("n_tokens"),
            size(filter(col("__idx"), i => mk(i))).cast("long").as("n_masked"),
            size(filter(col("__idx"), i => sentinel(i))).cast("long").as("n_spans"),
            concat_ws(" ", filter(
              transform(col("__idx"), i =>
                when(!mk(i), element_at(col("__toks"), (i + 1).cast("int")))
                  .when(sentinel(i), lit("<extra_id>"))),
              p => p.isNotNull)).as("corrupted"),
            concat_ws(" ", filter(
              transform(col("__idx"), i =>
                when(mk(i), element_at(col("__toks"), (i + 1).cast("int")))),
              p => p.isNotNull)).as("target"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w,
                                CAST(len(string_split(text, ' ')) AS BIGINT) AS n
                         FROM documents),
                   f AS (SELECT doc_id, w, n,
                                [((doc_id * 2654435761 + (i - 1) * 40503)
                                  % 1000003) % 13 = 0
                                 FOR i IN range(1, CAST(n + 1 AS INT))] AS ss
                         FROM t),
                   m AS (SELECT doc_id, w, n,
                                [ss[i] OR (i >= 2 AND ss[i - 1])
                                       OR (i >= 3 AND ss[i - 2])
                                 FOR i IN range(1, CAST(n + 1 AS INT))] AS mk
                         FROM f)
              SELECT doc_id, n AS n_tokens,
                     CAST(len([i FOR i IN range(1, CAST(n + 1 AS INT))
                               IF mk[i]]) AS BIGINT) AS n_masked,
                     CAST(len([i FOR i IN range(1, CAST(n + 1 AS INT))
                               IF mk[i] AND (i = 1 OR NOT mk[i - 1])]) AS BIGINT)
                       AS n_spans,
                     coalesce(array_to_string(
                       [CASE WHEN NOT mk[i] THEN w[i]
                             ELSE '<extra_id>' END
                        FOR i IN range(1, CAST(n + 1 AS INT))
                        IF (NOT mk[i]) OR (i = 1 OR NOT mk[i - 1])],
                       ' '), '') AS corrupted,
                     coalesce(array_to_string(
                       [w[i] FOR i IN range(1, CAST(n + 1 AS INT)) IF mk[i]],
                       ' '), '') AS target
              FROM m ORDER BY doc_id""")),

    // LENGTH-BUCKET batching stats — the padding-efficiency planning pass
    // a training pipeline runs before batching: deal each document into a
    // fixed power-of-two sequence-length ladder (the smallest bucket that
    // holds it; over-cap docs truncate into the top bucket) and measure
    // per-bucket doc count, token mass, and the padding waste a
    // pad-to-bucket batcher would burn. The ladder is an explicit CASE on
    // both engines — never float log2, whose ceil at exact powers of two
    // is representation-dependent. Entirely scan-local until the final
    // 8-key rollup: one projection + one dictionary-sized groupBy at any
    // corpus size.
    QueryDef(
      "q_length_buckets",
      (s, d) => {
        val ladder = Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L, 2048L)
        val docs = graft.engine.Tables.documents(s, d)
          .select(size(split(col("text"), " ")).cast("long").as("n"))
        val bucket = ladder.init.reverse
          .foldLeft(lit(ladder.last)) { (acc, b) =>
            when(col("n") <= b, lit(b)).otherwise(acc)
          }
        docs.withColumn("bucket", bucket)
          .withColumn("kept", least(col("n"), col("bucket")))
          .groupBy("bucket")
          .agg(
            count(lit(1)).as("n_docs"),
            sum("kept").as("n_tokens"),
            sum(col("bucket") - col("kept")).as("n_padding"),
            sum(col("n") - col("kept")).as("n_truncated"),
            round(sum(col("bucket") - col("kept")).cast("double") /
              (count(lit(1)) * col("bucket")), 6).as("waste_frac"))
          .orderBy("bucket")
      },
      Some("""WITH s AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n
                         FROM documents),
                   b AS (SELECT n,
                                CASE WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32
                                     WHEN n <= 64 THEN 64 WHEN n <= 128 THEN 128
                                     WHEN n <= 256 THEN 256 WHEN n <= 512 THEN 512
                                     WHEN n <= 1024 THEN 1024 ELSE 2048 END AS bucket,
                                least(n, CASE WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32
                                     WHEN n <= 64 THEN 64 WHEN n <= 128 THEN 128
                                     WHEN n <= 256 THEN 256 WHEN n <= 512 THEN 512
                                     WHEN n <= 1024 THEN 1024 ELSE 2048 END) AS kept
                         FROM s)
              SELECT bucket, count(*) AS n_docs,
                     CAST(sum(kept) AS BIGINT) AS n_tokens,
                     CAST(sum(bucket - kept) AS BIGINT) AS n_padding,
                     CAST(sum(n - kept) AS BIGINT) AS n_truncated,
                     round(CAST(sum(bucket - kept) AS DOUBLE)
                           / (count(*) * bucket), 6) AS waste_frac
              FROM b GROUP BY 1 ORDER BY bucket""")),

    // NUCLEUS (top-p) VOCABULARY coverage — the tokenizer-planning
    // question "how many vocabulary entries cover 90% of corpus token
    // mass?": rank tokens by count, mark each with its cumulative-mass
    // prefix, and keep the minimal p=0.9 prefix. Scale shape: the only
    // corpus-sized stage is the (token, count) rollup (map-side combined);
    // ranking runs on a TakeOrderedAndProject shortlist bounded by a
    // CONSTANT (K=200 — a nucleus that needs more than K entries means
    // raising K, a config change, not a plan change), so the running-sum
    // window sees ≤K rows. The corpus total broadcasts as the scalar-N
    // crossJoin pattern. Cumulative shares are a deterministic-order sum
    // of the same integers on both engines — one division at the end, no
    // drift; the window itself runs on the K-row shortlist, never corpus
    // rows (PlanLint exemption documents this bound).
    QueryDef(
      "q_top_p_vocab",
      (s, d) => {
        val toks = graft.engine.Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("w"))
          .filter(col("w") =!= "")
        val counts = toks.groupBy("w").agg(count(lit(1)).as("cnt"))
        val total = counts.agg(sum("cnt").as("tot"))
        val top = counts.orderBy(desc("cnt"), asc("w")).limit(200)
        val w = Window.orderBy(desc("cnt"), asc("w"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        top.crossJoin(broadcast(total))
          .withColumn("cum", sum("cnt").over(w))
          .withColumn("rank", count(lit(1)).over(w).cast("int"))
          .filter((col("cum") - col("cnt")).cast("double") < col("tot") * 0.9)
          .select(col("rank"), col("w"), col("cnt"),
            round(col("cum").cast("double") / col("tot"), 6).as("cum_share"))
          .orderBy("rank")
      },
      Some("""WITH t AS (SELECT unnest(string_split(text, ' ')) AS w
                         FROM documents),
                   c AS (SELECT w, count(*) AS cnt FROM t WHERE w <> '' GROUP BY 1),
                   tot AS (SELECT sum(cnt) AS tot FROM c),
                   top AS (SELECT w, cnt FROM c ORDER BY cnt DESC, w LIMIT 200),
                   r AS (SELECT w, cnt,
                                sum(cnt) OVER (ORDER BY cnt DESC, w
                                               ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND CURRENT ROW) AS cum,
                                CAST(count(*) OVER (ORDER BY cnt DESC, w
                                               ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND CURRENT ROW) AS INT) AS rank
                         FROM top)
              SELECT rank, w, cnt,
                     round(CAST(cum AS DOUBLE) / tot.tot, 6) AS cum_share
              FROM r, tot WHERE CAST(cum - cnt AS DOUBLE) < tot.tot * 0.9
              ORDER BY rank""")),

    // SOURCE-OVERLAP matrix — the corpus-composition health check a
    // mixture designer runs before weighting sources (two "different"
    // sources with high shingle Jaccard are the same crawl twice;
    // weighting them independently double-counts). EXACT pairwise
    // Jaccard over per-source DISTINCT 3-gram shingle sets: the only
    // corpus-sized shuffle is the (source, shingle) distinct rollup; the
    // shingle self-join fans out ≤ C(sources, 2) rows per shingle (the
    // source dictionary bounds it, never document count), and everything
    // downstream is the pair dictionary. Same 64-bit shingle hashing as
    // the dedup family (collisions ~n²/2⁶⁴ — the established oracle
    // assumption).
    QueryDef(
      "q_source_overlap",
      (s, d) => {
        val sh = Tables.documents(s, d)
          .select(col("source"),
            explode(graft.functions.TextShingles.shingleHashes(col("text"), 3))
              .as("g"))
          .distinct()
        val sizes = sh.groupBy("source").agg(count(lit(1)).as("n"))
        val pairs = sh.as("a")
          .join(sh.as("b"),
            col("a.g") === col("b.g") && col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
          .agg(count(lit(1)).as("inter"))
        pairs
          .join(broadcast(sizes.select(col("source").as("source_a"), col("n").as("na"))),
            "source_a")
          .join(broadcast(sizes.select(col("source").as("source_b"), col("n").as("nb"))),
            "source_b")
          .select(col("source_a"), col("source_b"), col("inter"),
            round(col("inter") / (col("na") + col("nb") - col("inter")), 4)
              .as("jaccard"))
          .orderBy("source_a", "source_b")
      },
      Some("""WITH docs AS (SELECT source, string_split(lower(text), ' ') AS w
                            FROM documents),
                   sh0 AS (SELECT source,
                                  [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                   FOR i IN range(1, len(w) - 1)] AS s
                           FROM docs WHERE len(w) >= 3),
                   ex AS (SELECT DISTINCT source, unnest(s) AS shg FROM sh0),
                   sizes AS (SELECT source, count(*) AS n FROM ex GROUP BY 1),
                   pairs AS (SELECT a.source AS source_a, b.source AS source_b,
                                    count(*) AS inter
                             FROM ex a JOIN ex b
                               ON a.shg = b.shg AND a.source < b.source
                             GROUP BY 1, 2)
              SELECT source_a, source_b, inter,
                     round(inter * 1.0 / (sa.n + sb.n - inter), 4) AS jaccard
              FROM pairs p
              JOIN sizes sa ON p.source_a = sa.source
              JOIN sizes sb ON p.source_b = sb.source
              ORDER BY source_a, source_b""")),

    // LABEL-PROPAGATION communities over the host graph — the third
    // member of the graph family (PageRank: importance; HITS: hub/
    // authority; LPA: community structure). Fixed-round SYNCHRONOUS
    // updates with a (count desc, label asc) tie-break make the result
    // deterministic under any partitioning (async LPA is run-order
    // chaos); the oracle unrolls the same three rounds as CTE levels.
    // Per round: one edge⋈label equi-join + dictionary-sized mode
    // aggregates — the PageRank shuffle shape.
    QueryDef(
      "q_communities",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
        // corpus size from parquet FOOTER metadata, not an eager
        // count() job (at 100 TB that count is its own corpus scan;
        // the footer read is driver-side and free) — same discipline
        // as q_dedup_embedding_prod's band tuning.
        val nDocs = graft.sources.SegmentCatalog
          .metadataRowCount(s, s"$d/documents.parquet")
        val b = docs.select(col("doc_id").as("b_id"), col("source").as("dst"))
        val edges = docs.select(col("doc_id"), col("source").as("src"))
          .join(b, col("b_id") === (col("doc_id") % lit(nDocs) * (col("doc_id") % lit(nDocs)) % lit(nDocs) * 13 + 7) % lit(nDocs))
          .select("src", "dst")
        graft.graph.LabelProp.propagate(edges, rounds = 3)
          .groupBy(col("lab").as("community"))
          .agg(count(lit(1)).as("n_hosts"), min("node").as("first_host"),
            max("node").as("last_host"))
          .orderBy("community")
      },
      Some("""WITH nd AS (SELECT count(*) AS c FROM documents),
                   e0 AS (SELECT DISTINCT a.source AS src, b.source AS dst
                          FROM documents a
                          JOIN documents b
                            ON b.doc_id = (a.doc_id % (SELECT c FROM nd) * (a.doc_id % (SELECT c FROM nd)) % (SELECT c FROM nd) * 13 + 7) % (SELECT c FROM nd)),
                   ue AS (SELECT src, dst FROM e0
                          UNION SELECT dst, src FROM e0),
                   nodes AS (SELECT DISTINCT src AS node FROM ue),
                   l0 AS (SELECT node, node AS lab FROM nodes),
                   g1 AS (SELECT ue.dst AS node, l.lab, count(*) AS cnt
                          FROM ue JOIN l0 l ON ue.src = l.node GROUP BY 1, 2),
                   p1 AS (SELECT node, lab FROM (
                            SELECT node, lab, row_number() OVER (
                              PARTITION BY node ORDER BY cnt DESC, lab) AS rn
                            FROM g1) WHERE rn = 1),
                   l1 AS (SELECT n.node, coalesce(p1.lab, l0.lab) AS lab
                          FROM nodes n
                          LEFT JOIN p1 ON n.node = p1.node
                          JOIN l0 ON n.node = l0.node),
                   g2 AS (SELECT ue.dst AS node, l.lab, count(*) AS cnt
                          FROM ue JOIN l1 l ON ue.src = l.node GROUP BY 1, 2),
                   p2 AS (SELECT node, lab FROM (
                            SELECT node, lab, row_number() OVER (
                              PARTITION BY node ORDER BY cnt DESC, lab) AS rn
                            FROM g2) WHERE rn = 1),
                   l2 AS (SELECT n.node, coalesce(p2.lab, l1.lab) AS lab
                          FROM nodes n
                          LEFT JOIN p2 ON n.node = p2.node
                          JOIN l1 ON n.node = l1.node),
                   g3 AS (SELECT ue.dst AS node, l.lab, count(*) AS cnt
                          FROM ue JOIN l2 l ON ue.src = l.node GROUP BY 1, 2),
                   p3 AS (SELECT node, lab FROM (
                            SELECT node, lab, row_number() OVER (
                              PARTITION BY node ORDER BY cnt DESC, lab) AS rn
                            FROM g3) WHERE rn = 1),
                   l3 AS (SELECT n.node, coalesce(p3.lab, l2.lab) AS lab
                          FROM nodes n
                          LEFT JOIN p3 ON n.node = p3.node
                          JOIN l2 ON n.node = l2.node)
              SELECT lab AS community, count(*) AS n_hosts,
                     min(node) AS first_host, max(node) AS last_host
              FROM l3 GROUP BY 1 ORDER BY community""")),

    // TRIANGLE COUNTING over the host graph — the clustering-structure
    // member of the graph family (dense triangle neighborhoods = tightly
    // interlinked site clusters; link farms light up here before they do
    // in PageRank). Canonical a<b<c edge orientation counts each
    // triangle exactly once via two equi-joins on the deduped undirected
    // edge list — never a cross join; at web scale the same plan runs
    // with degree-ordered orientation (orient each edge toward the
    // higher-degree endpoint) so the join fan-out is bounded by
    // arboricity, a pure relabeling of this exact query. Per-host
    // participation explodes each triangle to its three corners.
    QueryDef(
      "q_triangles",
      (s, d) => {
        // ring + chord host graph (host k links k+1 and k+2 mod n): the
        // quadratic doc-formula graph the PageRank family uses is
        // triangle-FREE at fixture scale, which would make this query
        // vacuous; rank arithmetic over the host dictionary guarantees
        // every consecutive triple closes a triangle.
        val hosts = Tables.documents(s, d).select(col("source")).distinct()
        // The host-dictionary size can't come from parquet footers (it's
        // a DISTINCT count), so instead of an eager count() job at build
        // time it stays inside the plan as a broadcast scalar aggregate —
        // one dictionary-sized agg fused into the same Spark job that
        // consumes it.
        val nDf = hosts.agg(count(lit(1)).as("__n"))
        val w = org.apache.spark.sql.expressions.Window.orderBy("source")
        val ids = hosts.withColumn("id", row_number().over(w) - 1)
        val raw = ids.crossJoin(broadcast(nDf)).select(col("id"),
            explode(array((col("id") + 1) % col("__n"),
              (col("id") + 2) % col("__n"))).as("id2"))
          .join(ids.select(col("id").as("i1"), col("source").as("src")),
            col("id") === col("i1"))
          .join(ids.select(col("id").as("i2"), col("source").as("dst")),
            col("id2") === col("i2"))
          .select("src", "dst")
        val ue = raw.filter(col("src") =!= col("dst"))
          .select(least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .distinct()
        val tri = ue.as("e1")
          .join(ue.as("e2"), col("e1.b") === col("e2.a"))
          .join(ue.as("e3"),
            col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
          .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
        tri.select(explode(array(col("x"), col("y"), col("z"))).as("host"))
          .groupBy("host")
          .agg(count(lit(1)).as("n_triangles"))
          .orderBy("host")
      },
      Some("""WITH hosts AS (SELECT DISTINCT source FROM documents),
                   nh AS (SELECT count(*) AS n FROM hosts),
                   ids AS (SELECT source,
                                  row_number() OVER (ORDER BY source) - 1 AS id
                           FROM hosts),
                   e0 AS (SELECT a.source AS src, b.source AS dst
                          FROM ids a
                          JOIN ids b ON b.id = (a.id + 1) % (SELECT n FROM nh)
                          UNION ALL
                          SELECT a.source, b.source
                          FROM ids a
                          JOIN ids b ON b.id = (a.id + 2) % (SELECT n FROM nh)),
                   ue AS (SELECT DISTINCT least(src, dst) AS a,
                                          greatest(src, dst) AS b
                          FROM e0 WHERE src <> dst),
                   tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                           FROM ue e1
                           JOIN ue e2 ON e1.b = e2.a
                           JOIN ue e3 ON e3.a = e1.a AND e3.b = e2.b),
                   corners AS (SELECT x AS host FROM tri
                               UNION ALL SELECT y FROM tri
                               UNION ALL SELECT z FROM tri)
              SELECT host, count(*) AS n_triangles
              FROM corners GROUP BY 1 ORDER BY host""")),

    // DEGREE-ORDERED triangle counting (Schank & Wagner 2005 / Cohen's
    // MapReduce orientation) over the SAME ring+chord host graph and the
    // SAME oracle as q_triangles — the web-scale path: edges orient from
    // the lower-(degree, id) endpoint to the higher, so each triangle is
    // generated exactly once at its minimum corner and wedge fan-out is
    // bounded by out-degree ≤ O(√m) REGARDLESS of hub skew, where the
    // plain a<b<c orientation can square on a low-id hub. Hash-parity
    // with q_triangles pins the orientation change as result-invariant.
    QueryDef(
      "q_triangles_ordered",
      (s, d) => {
        val hosts = Tables.documents(s, d).select(col("source")).distinct()
        val nDf = hosts.agg(count(lit(1)).as("__n"))
        val w = org.apache.spark.sql.expressions.Window.orderBy("source")
        val ids = hosts.withColumn("id", row_number().over(w) - 1)
        val raw = ids.crossJoin(broadcast(nDf)).select(col("id"),
            explode(array((col("id") + 1) % col("__n"),
              (col("id") + 2) % col("__n"))).as("id2"))
          .join(ids.select(col("id").as("i1"), col("source").as("src")),
            col("id") === col("i1"))
          .join(ids.select(col("id").as("i2"), col("source").as("dst")),
            col("id2") === col("i2"))
          .select("src", "dst")
        val ue = raw.filter(col("src") =!= col("dst"))
          .select(least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .distinct()
        graft.graph.Triangles.perNodeDegreeOrdered(ue)
          .select(col("node").as("host"), col("n_triangles"))
          .orderBy("host")
      },
      Some("""WITH hosts AS (SELECT DISTINCT source FROM documents),
                   nh AS (SELECT count(*) AS n FROM hosts),
                   ids AS (SELECT source,
                                  row_number() OVER (ORDER BY source) - 1 AS id
                           FROM hosts),
                   e0 AS (SELECT a.source AS src, b.source AS dst
                          FROM ids a
                          JOIN ids b ON b.id = (a.id + 1) % (SELECT n FROM nh)
                          UNION ALL
                          SELECT a.source, b.source
                          FROM ids a
                          JOIN ids b ON b.id = (a.id + 2) % (SELECT n FROM nh)),
                   ue AS (SELECT DISTINCT least(src, dst) AS a,
                                          greatest(src, dst) AS b
                          FROM e0 WHERE src <> dst),
                   tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                           FROM ue e1
                           JOIN ue e2 ON e1.b = e2.a
                           JOIN ue e3 ON e3.a = e1.a AND e3.b = e2.b),
                   corners AS (SELECT x AS host FROM tri
                               UNION ALL SELECT y FROM tri
                               UNION ALL SELECT z FROM tri)
              SELECT host, count(*) AS n_triangles
              FROM corners GROUP BY 1 ORDER BY host""")),

    // CONNECTED COMPONENTS over the site-SECTION graph (node = host #
    // doc_id-mod-7 section, edges = the deterministic doc-hash links
    // restricted to every sixth doc so the graph is sparse enough to
    // fracture): the partition question a crawl pipeline asks BEFORE
    // ranking — which sections form one reachable cluster. Hash-to-min
    // runs to the EXACT fixpoint (comp = min reachable node id — no
    // float, no round count to tune), one equi-join + min-agg per round,
    // convergence tested by a scalar moved-count that doubles as the
    // checkpoint materializer. The oracle computes the same fixpoint as
    // a recursive-CTE transitive closure + min — tractable at fixture
    // scale (Σ comp² rows), while the Spark side's round count is
    // O(diameter) at any scale.
    QueryDef(
      "q_connected_components",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
        // corpus size from parquet FOOTER metadata, not an eager
        // count() job (at 100 TB that count is its own corpus scan;
        // the footer read is driver-side and free) — same discipline
        // as q_dedup_embedding_prod's band tuning.
        val nDocs = graft.sources.SegmentCatalog
          .metadataRowCount(s, s"$d/documents.parquet")
        val a = docs.filter(col("doc_id") % 6 === 0)
          .select(col("doc_id"),
            concat_ws("#", col("source"),
              (col("doc_id") % 7).cast("string")).as("src"))
        val b = docs.select(
          concat_ws("#", col("source"),
            (col("doc_id") % 7).cast("string")).as("dst"),
          col("doc_id").as("b_id"))
        val edges = a
          .join(b, col("b_id") === (col("doc_id") % lit(nDocs) * (col("doc_id") % lit(nDocs)) % lit(nDocs) * 13 + 7) % lit(nDocs))
          .select("src", "dst")
        graft.graph.ConnectedComponents.components(edges)
          .groupBy(col("comp").as("component"))
          .agg(count(lit(1)).as("n_sections"), max("node").as("last_section"))
          .orderBy("component")
      },
      Some("""WITH RECURSIVE
                   nd AS (SELECT count(*) AS c FROM documents),
                   e0 AS (SELECT DISTINCT
                            a.source || '#' || CAST(a.doc_id % 7 AS VARCHAR) AS src,
                            b.source || '#' || CAST(b.doc_id % 7 AS VARCHAR) AS dst
                          FROM documents a
                          JOIN documents b
                            ON b.doc_id = (a.doc_id % (SELECT c FROM nd) * (a.doc_id % (SELECT c FROM nd)) % (SELECT c FROM nd) * 13 + 7) % (SELECT c FROM nd)
                          WHERE a.doc_id % 6 = 0),
                   ue AS (SELECT src, dst FROM e0
                          UNION SELECT dst, src FROM e0),
                   reach(node, r) AS (
                     SELECT src AS node, src AS r FROM ue
                     UNION
                     SELECT ue.dst, reach.r
                     FROM ue JOIN reach ON ue.src = reach.node),
                   comps AS (SELECT node, min(r) AS comp
                             FROM reach GROUP BY node)
              SELECT comp AS component, count(*) AS n_sections,
                     max(node) AS last_section
              FROM comps GROUP BY 1 ORDER BY component""")),

    // SMALL-STAR / LARGE-STAR connected components (Kiveris et al.,
    // SoCC'14) over the SAME section graph and the SAME oracle as
    // q_connected_components — the web-scale path: star contraction
    // converges in O(log² n) rounds independent of graph DIAMETER,
    // where hash-to-min pays one round per hop of the longest min-label
    // path (a chain of weakly-linked hosts stalls it). Same fixpoint
    // (comp = min reachable node id), hash-parity against the identical
    // recursive-CTE oracle; the round-count win is spec-asserted on a
    // path graph (GraphSpec) whose diameter dwarfs log² n.
    QueryDef(
      "q_cc_star",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
        // corpus size from parquet FOOTER metadata — no eager count()
        // job; same discipline as q_connected_components.
        val nDocs = graft.sources.SegmentCatalog
          .metadataRowCount(s, s"$d/documents.parquet")
        val a = docs.filter(col("doc_id") % 6 === 0)
          .select(col("doc_id"),
            concat_ws("#", col("source"),
              (col("doc_id") % 7).cast("string")).as("src"))
        val b = docs.select(
          concat_ws("#", col("source"),
            (col("doc_id") % 7).cast("string")).as("dst"),
          col("doc_id").as("b_id"))
        val edges = a
          .join(b, col("b_id") === (col("doc_id") % lit(nDocs) * (col("doc_id") % lit(nDocs)) % lit(nDocs) * 13 + 7) % lit(nDocs))
          .select("src", "dst")
        graft.graph.ConnectedComponents.componentsStar(edges)
          .groupBy(col("comp").as("component"))
          .agg(count(lit(1)).as("n_sections"), max("node").as("last_section"))
          .orderBy("component")
      },
      Some("""WITH RECURSIVE
                   nd AS (SELECT count(*) AS c FROM documents),
                   e0 AS (SELECT DISTINCT
                            a.source || '#' || CAST(a.doc_id % 7 AS VARCHAR) AS src,
                            b.source || '#' || CAST(b.doc_id % 7 AS VARCHAR) AS dst
                          FROM documents a
                          JOIN documents b
                            ON b.doc_id = (a.doc_id % (SELECT c FROM nd) * (a.doc_id % (SELECT c FROM nd)) % (SELECT c FROM nd) * 13 + 7) % (SELECT c FROM nd)
                          WHERE a.doc_id % 6 = 0),
                   ue AS (SELECT src, dst FROM e0
                          UNION SELECT dst, src FROM e0),
                   reach(node, r) AS (
                     SELECT src AS node, src AS r FROM ue
                     UNION
                     SELECT ue.dst, reach.r
                     FROM ue JOIN reach ON ue.src = reach.node),
                   comps AS (SELECT node, min(r) AS comp
                             FROM reach GROUP BY node)
              SELECT comp AS component, count(*) AS n_sections,
                     max(node) AS last_section
              FROM comps GROUP BY 1 ORDER BY component""")),

    // BFS HOP DISTANCE from the seed section (smallest node id) over the
    // same section graph — crawl-depth analysis: how much of the cluster
    // is within k link hops of the seed. Six frontier-relaxation rounds
    // (equi-join + min-agg each; unit edges make min-relaxation BFS), so
    // the result is EXACTLY the nodes at true distance <= 6 with their
    // exact distance — deterministic, no float. The oracle walks the
    // same bounded closure with a depth-capped recursive CTE.
    QueryDef(
      "q_bfs_hops",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
        // corpus size from parquet FOOTER metadata, not an eager
        // count() job (at 100 TB that count is its own corpus scan;
        // the footer read is driver-side and free) — same discipline
        // as q_dedup_embedding_prod's band tuning.
        val nDocs = graft.sources.SegmentCatalog
          .metadataRowCount(s, s"$d/documents.parquet")
        val a = docs.filter(col("doc_id") % 6 === 0)
          .select(col("doc_id"),
            concat_ws("#", col("source"),
              (col("doc_id") % 7).cast("string")).as("src"))
        val b = docs.select(
          concat_ws("#", col("source"),
            (col("doc_id") % 7).cast("string")).as("dst"),
          col("doc_id").as("b_id"))
        val edges = a
          .join(b, col("b_id") === (col("doc_id") % lit(nDocs) * (col("doc_id") % lit(nDocs)) % lit(nDocs) * 13 + 7) % lit(nDocs))
          .select("src", "dst")
        val seed = edges
          .select(least(col("src"), col("dst")).as("n"))
          .agg(min("n").as("node"))
        graft.graph.ConnectedComponents.bfsHops(edges, seed, maxHops = 6)
          .select(col("node").as("section"), col("hops"))
          .orderBy("section")
      },
      Some("""WITH RECURSIVE
                   nd AS (SELECT count(*) AS c FROM documents),
                   e0 AS (SELECT DISTINCT
                            a.source || '#' || CAST(a.doc_id % 7 AS VARCHAR) AS src,
                            b.source || '#' || CAST(b.doc_id % 7 AS VARCHAR) AS dst
                          FROM documents a
                          JOIN documents b
                            ON b.doc_id = (a.doc_id % (SELECT c FROM nd) * (a.doc_id % (SELECT c FROM nd)) % (SELECT c FROM nd) * 13 + 7) % (SELECT c FROM nd)
                          WHERE a.doc_id % 6 = 0),
                   ue AS (SELECT src, dst FROM e0
                          UNION SELECT dst, src FROM e0),
                   seed AS (SELECT min(least(src, dst)) AS s FROM ue),
                   bfs(node, d) AS (
                     SELECT s AS node, 0 AS d FROM seed
                     UNION
                     SELECT ue.dst, bfs.d + 1
                     FROM ue JOIN bfs ON ue.src = bfs.node
                     WHERE bfs.d < 6)
              SELECT node AS section, min(d) AS hops
              FROM bfs GROUP BY node ORDER BY section""")),

    // K-CORE over the deterministic host graph (graph.KCore): 4 peel
    // rounds at k = 2 drop the one-link periphery and report the densely
    // embedded core hosts with their induced degrees — the crawl-curation
    // hub/leaf separation signal next to PageRank/HITS. Per round one
    // degree agg + two semi-joins on the node key (the CC shuffle shape);
    // the oracle unrolls the identical rounds as CTE levels.
    QueryDef(
      "q_kcore",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
        // corpus size from parquet FOOTER metadata, not an eager
        // count() job (at 100 TB that count is its own corpus scan;
        // the footer read is driver-side and free) — same discipline
        // as q_dedup_embedding_prod's band tuning.
        val nDocs = graft.sources.SegmentCatalog
          .metadataRowCount(s, s"$d/documents.parquet")
        val b = docs.select(col("doc_id").as("b_id"), col("source").as("dst"))
        val e0 = docs.select(col("doc_id"), col("source").as("src"))
          .join(b, col("b_id") === (col("doc_id") % lit(nDocs) * (col("doc_id") % lit(nDocs)) % lit(nDocs) * 13 + 7) % lit(nDocs))
          .select("src", "dst")
          .filter(col("src") =!= col("dst"))
          .distinct()
        val und = e0.select(col("src").as("h"), col("dst").as("nb"))
          .unionByName(e0.select(col("dst").as("h"), col("src").as("nb")))
          .distinct()
        graft.graph.KCore.core(und, k = 2, rounds = 4)
          .select(col("h").as("host"), col("core_degree"))
          .orderBy("host")
      },
      Some("""WITH nd AS (SELECT count(*) AS c FROM documents),
                   e0 AS (SELECT DISTINCT a.source AS src, b.source AS dst
                          FROM documents a
                          JOIN documents b
                            ON b.doc_id = (a.doc_id % (SELECT c FROM nd) * (a.doc_id % (SELECT c FROM nd)) % (SELECT c FROM nd) * 13 + 7) % (SELECT c FROM nd)
                          WHERE a.source <> b.source),
                   und AS (SELECT src AS h, dst AS nb FROM e0
                           UNION SELECT dst, src FROM e0),
                   k1 AS (SELECT h FROM und GROUP BY h HAVING count(*) >= 2),
                   e1 AS (SELECT u.h, u.nb FROM und u
                          JOIN k1 a ON u.h = a.h JOIN k1 b ON u.nb = b.h),
                   k2 AS (SELECT h FROM e1 GROUP BY h HAVING count(*) >= 2),
                   e2 AS (SELECT u.h, u.nb FROM e1 u
                          JOIN k2 a ON u.h = a.h JOIN k2 b ON u.nb = b.h),
                   k3 AS (SELECT h FROM e2 GROUP BY h HAVING count(*) >= 2),
                   e3 AS (SELECT u.h, u.nb FROM e2 u
                          JOIN k3 a ON u.h = a.h JOIN k3 b ON u.nb = b.h),
                   k4 AS (SELECT h FROM e3 GROUP BY h HAVING count(*) >= 2),
                   e4 AS (SELECT u.h, u.nb FROM e3 u
                          JOIN k4 a ON u.h = a.h JOIN k4 b ON u.nb = b.h)
              SELECT h AS host, CAST(count(*) AS BIGINT) AS core_degree
              FROM e4 GROUP BY 1 ORDER BY host""")),

    // WEIGHTED SINGLE-SOURCE SHORTEST PATHS over the host graph
    // (graph.ShortestPaths — q_bfs_hops' weighted sibling): edge cost is
    // inverse link strength (ceil(100 / link count), integer arithmetic
    // on both engines — heavily-linked host pairs are "close"), 4
    // Bellman–Ford relaxation rounds from the lexicographically smallest
    // host. Distances are exact for every node whose shortest path uses
    // ≤ 4 edges (the bounded-frontier convention); per round one
    // edge-distance equi-join + one min agg on the node key. The oracle
    // unrolls the same rounds as CTE levels.
    QueryDef(
      "q_sssp_hosts",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
        // corpus size from parquet FOOTER metadata, not an eager
        // count() job (at 100 TB that count is its own corpus scan;
        // the footer read is driver-side and free) — same discipline
        // as q_dedup_embedding_prod's band tuning.
        val nDocs = graft.sources.SegmentCatalog
          .metadataRowCount(s, s"$d/documents.parquet")
        val b = docs.select(col("doc_id").as("b_id"), col("source").as("dst"))
        val e0 = docs.select(col("doc_id"), col("source").as("src"))
          .join(b, col("b_id") === (col("doc_id") % lit(nDocs) * (col("doc_id") % lit(nDocs)) % lit(nDocs) * 13 + 7) % lit(nDocs))
          .groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
          .filter(col("src") =!= col("dst"))
          .select(col("src"), col("dst"),
            expr("(100 + cnt - 1) div cnt").as("w"))
        val hosts = e0.select(col("src").as("h"))
          .unionByName(e0.select(col("dst").as("h"))).distinct()
        val seed = hosts.agg(min("h").as("node"))
        graft.graph.ShortestPaths.sssp(e0, seed, maxRounds = 4)
          .select(col("node").as("host"), col("dist"))
          .orderBy("host")
      },
      Some("""WITH nd AS (SELECT count(*) AS c FROM documents),
                   cnts AS (SELECT a.source AS src, b.source AS dst,
                                   CAST(count(*) AS BIGINT) AS cnt
                            FROM documents a
                            JOIN documents b
                              ON b.doc_id = (a.doc_id % (SELECT c FROM nd) * (a.doc_id % (SELECT c FROM nd)) % (SELECT c FROM nd) * 13 + 7) % (SELECT c FROM nd)
                            GROUP BY 1, 2),
                   e0 AS (SELECT src, dst, (100 + cnt - 1) // cnt AS w
                          FROM cnts WHERE src <> dst),
                   ue AS (SELECT src, dst, min(w) AS w
                          FROM (SELECT src, dst, w FROM e0
                                UNION ALL SELECT dst, src, w FROM e0)
                          GROUP BY 1, 2),
                   seed AS (SELECT min(h) AS s
                            FROM (SELECT src AS h FROM ue UNION SELECT dst FROM ue)),
                   d0 AS (SELECT s AS node, CAST(0 AS BIGINT) AS dist FROM seed),
                   d1 AS (SELECT node, min(dist) AS dist
                          FROM (SELECT * FROM d0 UNION ALL
                                SELECT ue.dst, d0.dist + ue.w FROM ue
                                JOIN d0 ON ue.src = d0.node) GROUP BY 1),
                   d2 AS (SELECT node, min(dist) AS dist
                          FROM (SELECT * FROM d1 UNION ALL
                                SELECT ue.dst, d1.dist + ue.w FROM ue
                                JOIN d1 ON ue.src = d1.node) GROUP BY 1),
                   d3 AS (SELECT node, min(dist) AS dist
                          FROM (SELECT * FROM d2 UNION ALL
                                SELECT ue.dst, d2.dist + ue.w FROM ue
                                JOIN d2 ON ue.src = d2.node) GROUP BY 1),
                   d4 AS (SELECT node, min(dist) AS dist
                          FROM (SELECT * FROM d3 UNION ALL
                                SELECT ue.dst, d3.dist + ue.w FROM ue
                                JOIN d3 ON ue.src = d3.node) GROUP BY 1)
              SELECT node AS host, dist FROM d4 ORDER BY host""")),

    // NEIGHBOR-JACCARD LINK PREDICTION over the deterministic host graph
    // (q_pagerank_hosts' edge synthesis): for every host pair sharing at
    // least one graph neighbor, |N(a)∩N(b)| / |N(a)∪N(b)| over UNDIRECTED
    // neighbor sets — the classic co-citation similarity / missing-link
    // score (and the graph flavor of the dedup pipeline's Jaccard). The
    // scalable shape: common counts come from a self-join of the
    // (host, neighbor) list ON THE NEIGHBOR KEY (each shared neighbor
    // contributes one match — work is Σ_v deg(v)², the standard
    // co-occurrence bound, cappable per hot vertex like a shingle DF
    // cap), never a host×host cross join; degrees attach by two
    // dictionary equi-joins. Counts exact; the ratio is the one float.
    QueryDef(
      "q_jaccard_neighbors",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
        // corpus size from parquet FOOTER metadata, not an eager
        // count() job (at 100 TB that count is its own corpus scan;
        // the footer read is driver-side and free) — same discipline
        // as q_dedup_embedding_prod's band tuning.
        val nDocs = graft.sources.SegmentCatalog
          .metadataRowCount(s, s"$d/documents.parquet")
        val b = docs.select(col("doc_id").as("b_id"), col("source").as("dst"))
        val e0 = docs.select(col("doc_id"), col("source").as("src"))
          .join(b, col("b_id") === (col("doc_id") % lit(nDocs) * (col("doc_id") % lit(nDocs)) % lit(nDocs) * 13 + 7) % lit(nDocs))
          .select("src", "dst")
          .filter(col("src") =!= col("dst"))
          .distinct()
        val und = e0.select(col("src").as("h"), col("dst").as("nb"))
          .unionByName(e0.select(col("dst").as("h"), col("src").as("nb")))
          .distinct()
        val deg = und.groupBy("h").agg(count(lit(1)).as("deg"))
        val common = und.select(col("h").as("host_a"), col("nb"))
          .join(und.select(col("h").as("host_b"), col("nb")), "nb")
          .filter(col("host_a") < col("host_b"))
          .groupBy("host_a", "host_b")
          .agg(count(lit(1)).as("n_common"))
        common
          .join(deg.select(col("h").as("host_a"), col("deg").as("da")), "host_a")
          .join(deg.select(col("h").as("host_b"), col("deg").as("db")), "host_b")
          .withColumn("jaccard",
            col("n_common").cast("double")
              / (col("da") + col("db") - col("n_common")).cast("double"))
          .filter(col("jaccard") >= 0.25)
          .select(col("host_a"), col("host_b"), col("n_common"),
            round(col("jaccard"), 4).as("jaccard"))
          .orderBy("host_a", "host_b")
      },
      Some("""WITH nd AS (SELECT count(*) AS c FROM documents),
                   e0 AS (SELECT DISTINCT a.source AS src, b.source AS dst
                          FROM documents a
                          JOIN documents b
                            ON b.doc_id = (a.doc_id % (SELECT c FROM nd) * (a.doc_id % (SELECT c FROM nd)) % (SELECT c FROM nd) * 13 + 7) % (SELECT c FROM nd)
                          WHERE a.source <> b.source),
                   und AS (SELECT src AS h, dst AS nb FROM e0
                           UNION SELECT dst, src FROM e0),
                   deg AS (SELECT h, CAST(count(*) AS BIGINT) AS dg
                           FROM und GROUP BY 1),
                   com AS (SELECT a.h AS host_a, b.h AS host_b,
                                  CAST(count(*) AS BIGINT) AS n_common
                           FROM und a JOIN und b
                             ON a.nb = b.nb AND a.h < b.h
                           GROUP BY 1, 2),
                   j AS (SELECT host_a, host_b, n_common,
                                CAST(n_common AS DOUBLE)
                                  / CAST(da.dg + db.dg - n_common AS DOUBLE) AS jac
                         FROM com
                         JOIN deg da ON com.host_a = da.h
                         JOIN deg db ON com.host_b = db.h)
              SELECT host_a, host_b, n_common, round(jac, 4) AS jaccard
              FROM j WHERE jac >= 0.25 ORDER BY host_a, host_b""")),

    // K-ANONYMITY AUDIT over the customer quasi-identifiers (nation ×
    // market segment × account-balance band) — the privacy gate a
    // training-data release runs next to PII scrubbing: any QI group
    // smaller than k is re-identifiable and must be suppressed or
    // generalized before release. The deliverable is the GROUP-SIZE
    // HISTOGRAM (size → how many groups, how many rows, at-risk flag at
    // k=5): all integer-exact, two dictionary rollups after one scan.
    // The balance band is integer cents shifted non-negative then
    // integer-divided (floor-vs-truncate divergence on negatives never
    // arises), so the banding is bit-identical on both engines.
    QueryDef(
      "q_kanon",
      (s, d) =>
        Tables.customer(s, d)
          .select(col("c_nationkey"), col("c_mktsegment"),
            // Column `/` is double division: floor() lands back on the
            // integer band; operands are exact sub-2^53 integers and a
            // non-multiple quotient is >= 1e-5 away from any integer, so
            // the floor can never flip (positives only by construction).
            floor((round(col("c_acctbal") * 100).cast("long") + 100000L) /
              100000L).as("bal_band"))
          .groupBy("c_nationkey", "c_mktsegment", "bal_band")
          .agg(count(lit(1)).as("gsz"))
          .groupBy(col("gsz").as("group_size"))
          .agg(count(lit(1)).as("n_groups"),
            sum("gsz").as("n_rows"),
            max(when(col("gsz") < 5, 1L).otherwise(0L)).as("at_risk"))
          .orderBy("group_size"),
      Some("""WITH g AS (SELECT c_nationkey, c_mktsegment,
                                (CAST(round(c_acctbal * 100) AS BIGINT)
                                 + 100000) // 100000 AS bal_band,
                                count(*) AS gsz
                         FROM customer GROUP BY 1, 2, 3)
              SELECT gsz AS group_size, count(*) AS n_groups,
                     CAST(sum(gsz) AS BIGINT) AS n_rows,
                     max(CASE WHEN gsz < 5 THEN 1 ELSE 0 END) AS at_risk
              FROM g GROUP BY 1 ORDER BY group_size""")),

    // DATASET CARD — the per-source release summary a corpus pipeline
    // prints alongside the data (docs, token/char mass, language spread,
    // length envelope): one scan, one dictionary-sized rollup, every
    // number integer-exact or rounded identically on both engines. The
    // NDV is exact here (language dictionary); at 100 TB the same shape
    // takes approx_count_distinct (the q_profile_stats note).
    QueryDef(
      "q_dataset_card",
      (s, d) =>
        Tables.documents(s, d)
          .select(col("source"), col("lang"), col("n_chars"),
            size(split(col("text"), " ")).cast("long").as("toks"))
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum("toks").as("n_tokens"),
            sum("n_chars").as("n_chars"),
            countDistinct("lang").as("n_langs"),
            min("n_chars").as("min_chars"),
            max("n_chars").as("max_chars"),
            round(avg("n_chars"), 2).as("avg_chars"))
          .orderBy("source"),
      Some("""SELECT source, count(*) AS n_docs,
                     CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
                     CAST(sum(n_chars) AS BIGINT) AS n_chars,
                     count(DISTINCT lang) AS n_langs,
                     min(n_chars) AS min_chars,
                     max(n_chars) AS max_chars,
                     round(avg(n_chars), 2) AS avg_chars
              FROM documents GROUP BY 1 ORDER BY source""")),

    // HERFINDAHL–HIRSCHMAN CONCENTRATION per language — the mixture-
    // diversity gate next to q_domain_cap: HHI = Σ_s share_s² over the
    // per-(lang, source) doc counts; 1/HHI is the "effective number of
    // sources" the language actually draws from (a lang fed by one
    // dominant crawl scores near 1 effective source however many
    // nominal sources appear). Two dictionary rollups after one scan —
    // the (lang, source) cell table IS the corpus-bounded state; counts
    // exact longs, the shares class-c ratios.
    QueryDef(
      "q_hhi_concentration",
      (s, d) => {
        val cell = Tables.documents(s, d)
          .groupBy("lang", "source").agg(count(lit(1)).as("c"))
        val tot = cell.groupBy("lang")
          .agg(sum("c").as("n_docs"), count(lit(1)).as("n_sources"))
        cell.join(tot, "lang")
          .groupBy(col("lang"), col("n_docs"), col("n_sources"))
          .agg(sum(
            (col("c").cast("double") / col("n_docs").cast("double"))
              * (col("c").cast("double") / col("n_docs").cast("double"))).as("hhi"))
          .select(col("lang"), col("n_docs"), col("n_sources"),
            round(col("hhi"), 6).as("hhi"),
            round(lit(1.0) / col("hhi"), 4).as("effective_sources"))
          .orderBy("lang")
      },
      Some("""WITH cell AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS c
                            FROM documents GROUP BY 1, 2),
                   tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_docs,
                                  CAST(count(*) AS BIGINT) AS n_sources
                           FROM cell GROUP BY 1),
                   h AS (SELECT cell.lang, n_docs, n_sources,
                                sum((CAST(c AS DOUBLE) / CAST(n_docs AS DOUBLE))
                                    * (CAST(c AS DOUBLE) / CAST(n_docs AS DOUBLE)))
                                  AS hhi
                         FROM cell JOIN tot ON cell.lang = tot.lang
                         GROUP BY 1, 2, 3)
              SELECT lang, n_docs, n_sources, round(hhi, 6) AS hhi,
                     round(1.0 / hhi, 4) AS effective_sources
              FROM h ORDER BY lang""")),

    // SOURCE-DIVERGENCE matrix — q_source_overlap's distributional twin:
    // Jensen–Shannon divergence between per-source unigram distributions
    // (overlap sees shared SHINGLES; JS sees shifted token FREQUENCIES —
    // two sources can share every word yet have drifted topic mix, which
    // is what mixture reweighting actually responds to). The JS sum
    // decomposes so only the INTERSECTION vocabulary needs joining:
    // one-sided tokens contribute p·ln2 in closed form via the
    // intersection mass (JS = ½[Σ∩ p·ln(2p/(p+q)) + (1−mass_p)·ln2] +
    // symmetric). Corpus-sized work is one (source, token) rollup;
    // the pairwise join runs on the per-source token dictionaries.
    QueryDef(
      "q_source_divergence",
      (s, d) => {
        val ln2 = math.log(2.0)
        val c = Tables.documents(s, d)
          .select(col("source"), explode(split(lower(col("text")), " ")).as("w"))
          .filter(col("w") =!= "")
          .groupBy("source", "w").agg(count(lit(1)).as("c"))
        val tot = c.groupBy("source").agg(sum("c").as("tot"))
        val p = c.join(broadcast(tot), "source")
          .select(col("source"), col("w"), (col("c") / col("tot")).as("p"))
        val a = p.select(col("source").as("source_a"), col("w"), col("p").as("pa"))
        val b = p.select(col("source").as("source_b"), col("w"), col("p").as("pb"))
        a.join(b, Seq("w")).filter(col("source_a") < col("source_b"))
          .groupBy("source_a", "source_b")
          .agg(
            sum(col("pa") * log(lit(2.0) * col("pa") / (col("pa") + col("pb"))))
              .as("sa"),
            sum(col("pb") * log(lit(2.0) * col("pb") / (col("pa") + col("pb"))))
              .as("sb"),
            sum("pa").as("ma"), sum("pb").as("mb"))
          .select(col("source_a"), col("source_b"),
            round((col("sa") + (lit(1.0) - col("ma")) * ln2) * 0.5 +
              (col("sb") + (lit(1.0) - col("mb")) * ln2) * 0.5, 6).as("js_nats"))
          .orderBy("source_a", "source_b")
      },
      Some("""WITH t AS (SELECT source, unnest(string_split(lower(text), ' ')) AS w
                         FROM documents),
                   c AS (SELECT source, w, count(*) AS c
                         FROM t WHERE w <> '' GROUP BY 1, 2),
                   tot AS (SELECT source, sum(c) AS tot FROM c GROUP BY 1),
                   p AS (SELECT c.source, c.w, CAST(c.c AS DOUBLE) / tot.tot AS p
                         FROM c JOIN tot USING (source)),
                   j AS (SELECT a.source AS source_a, b.source AS source_b,
                                sum(a.p * ln(2.0 * a.p / (a.p + b.p))) AS sa,
                                sum(b.p * ln(2.0 * b.p / (a.p + b.p))) AS sb,
                                sum(a.p) AS ma, sum(b.p) AS mb
                         FROM p a JOIN p b
                           ON a.w = b.w AND a.source < b.source
                         GROUP BY 1, 2)
              SELECT source_a, source_b,
                     round((sa + (1.0 - ma) * ln(2.0)) * 0.5 +
                           (sb + (1.0 - mb) * ln(2.0)) * 0.5, 6) AS js_nats
              FROM j ORDER BY source_a, source_b""")),

    // BPE TOKENIZER TRAINING — the full merge-learning loop (Sennrich et
    // al. 2016), not just the pair statistics of q_bpe_pairs: 8 merge
    // rounds over the word HISTOGRAM (the one corpus-sized pass; the loop
    // itself is dictionary-sized — see pipeline/Bpe.scala for the 100 TB
    // argument). Output is the learned merge table, deterministic under
    // any partitioning via the (count desc, a, b) tie-break. Rows-only by
    // design — the merge sequence is a trained artifact no single SQL
    // expression reproduces; BpeSpec replays the exact sequence against
    // an independent in-memory reference trainer and pins the greedy
    // left-to-right merge semantics.
    QueryDef(
      "q_bpe_train",
      (s, d) => {
        val (merges, _) = bpeTrained(s, d)
        import s.implicits._
        merges.toDF("step", "a", "b", "pair_cnt").orderBy("step")
      },
      None),

    // BPE ENCODING statistics — the apply side of q_bpe_train (train →
    // encode is the whole tokenizer story): per-source subword counts and
    // compression after the 8 learned merges. Encoding stats never need
    // per-token corpus rewriting: each word's encoded length lives in the
    // trained dictionary, so the corpus pass is one (source, word) rollup
    // with the dictionary broadcast onto it. Rows-only (the numbers
    // derive from the trained artifact); BpeSpec recomputes the exact
    // same totals from the independent reference trainer's dictionary.
    QueryDef(
      "q_bpe_encode",
      (s, d) => {
        val docs = graft.engine.Tables.documents(s, d)
        val (_, dict) = bpeTrained(s, d)
        graft.pipeline.Bpe.encodeStats(docs, "text", "source", dict)
          .orderBy("source")
      },
      None),

    // EXACT-REGIME twin of q_bpe_train: the SAME trainer (Bpe.train, 8
    // merges, identical tie-break) over a synthetic corpus whose merge
    // sequence is analytically derivable, so the whole train loop is
    // hash-pinned by a DuckDB oracle. Construction: every doc contributes
    // the word "abcdefghi" (2 + doc_id % 3) times and "jklmnop" once, so
    // every adjacent pair of the first word counts cx = Σ(2 + doc_id % 3)
    // ≥ 2·n_docs > cy = n_docs (the second word's count) and all 8 merges
    // go to the first word's cascade; within the all-equal-count cascade
    // the (count desc, a, b) tie-break is purely lexicographic and the
    // growing prefix always starts with 'a' (strictly smallest), so step
    // k provably merges (prefix_k, next_char) with pair_cnt = cx. The
    // oracle derives exactly that table arithmetically.
    QueryDef(
      "q_bpe_train_exact",
      (s, d) => {
        val (merges, _) = bpeTrainedExact(s, d)
        import s.implicits._
        merges.toDF("step", "a", "b", "pair_cnt").orderBy("step")
      },
      Some("""WITH cx AS (SELECT CAST(sum(2 + doc_id % 3) AS BIGINT) AS n
                          FROM documents)
              SELECT step, a, b, (SELECT n FROM cx) AS pair_cnt
              FROM (VALUES (1,'a','b'), (2,'ab','c'), (3,'abc','d'),
                           (4,'abcd','e'), (5,'abcde','f'), (6,'abcdef','g'),
                           (7,'abcdefg','h'), (8,'abcdefgh','i'))
                   AS m(step, a, b)
              ORDER BY step""")),

    // EXACT-REGIME twin of q_bpe_encode over the same provable corpus:
    // after the 8 cascade merges "abcdefghi" encodes to exactly 2 symbols
    // ([abcdefghi, </w>]) and "jklmnop" stays at its 8 initial symbols
    // (7 chars + </w>, untouched by any merge), so every per-source
    // statistic is a closed form of cx_s (weighted first-word count) and
    // cy_s (doc count) — the oracle computes it arithmetically and the
    // whole train→broadcast-dict→rollup encode path is hash-pinned.
    QueryDef(
      "q_bpe_encode_exact",
      (s, d) => {
        val (_, dict) = bpeTrainedExact(s, d)
        graft.pipeline.Bpe.encodeStats(bpeExactDocs(s, d), "text", "source", dict)
          .orderBy("source")
      },
      Some("""WITH c AS (SELECT source,
                                CAST(sum(2 + doc_id % 3) AS BIGINT) AS cx,
                                CAST(count(*) AS BIGINT) AS cy
                         FROM documents GROUP BY 1)
              SELECT source, cx + cy AS n_words,
                     10 * cx + 8 * cy AS n_char_syms,
                     2 * cx + 8 * cy AS n_bpe_syms,
                     round(CAST(2 * cx + 8 * cy AS DOUBLE)
                           / (10 * cx + 8 * cy), 6) AS compression
              FROM c ORDER BY source""")),

    // AVRO batch ingestion (Introduction.md:46 — the reference's batch
    // formats include Avro) through a written-then-read container-file
    // fixture: the documents table is exported ONCE per sf-dir to two
    // .avro container files (driver-side writeFile — a fixture/export
    // path, test-scale by design), then read back DISTRIBUTED by
    // AvroIngest.read (schema from the first file's header, one decode
    // task per file — production Avro arrives from outside at that
    // shape) and aggregated; hash-verifying the rollup against the
    // original parquet table pins the full schema-map + decode + Row
    // conversion path, not just "it didn't crash". The tolerant
    // dead-letter variant is spec-covered (LifecycleSpec).
    QueryDef(
      "q_avro_ingest",
      (s, d) => {
        import graft.sources.AvroIngest
        // fixture cache keyed on SOURCE CONTENT (mtime+size of the
        // parquet), not just the path: a regenerated-in-place documents
        // table must invalidate the avro export, or the query would read
        // stale avro while the oracle reads fresh parquet. Written to a
        // unique temp dir and renamed in, so concurrent suites race to an
        // atomic winner instead of interleaving partial writes.
        val src = new java.io.File(d, "documents.parquet")
        val tag = d.replaceAll("[^a-zA-Z0-9]", "_") +
          s"_${src.lastModified()}_${src.length()}"
        val dir = new java.io.File(s"/tmp/graft_avro_$tag")
        // prune superseded cache generations for THIS fixture path (same
        // dir prefix, different mtime/size key) so regenerated fixtures
        // don't accumulate unbounded /tmp state across rounds
        val prefix = "graft_avro_" + d.replaceAll("[^a-zA-Z0-9]", "_") + "_"
        Option(new java.io.File("/tmp").listFiles()).getOrElse(Array.empty)
          .filter(f => f.getName.startsWith(prefix) && f.getName != dir.getName &&
            !f.getName.contains("_tmp_"))
          .foreach { stale =>
            Option(stale.listFiles()).getOrElse(Array.empty).foreach(_.delete())
            stale.delete()
          }
        if (!new java.io.File(dir, "part0.avro").exists()) {
          val schema = org.apache.avro.SchemaBuilder.record("doc").fields()
            .optionalLong("doc_id").optionalString("text")
            .optionalString("lang").optionalString("source")
            .optionalLong("n_chars").endRecord()
          val rows = Tables.documents(s, d)
            .select("doc_id", "text", "lang", "source", "n_chars")
            .collect().toSeq
          val (even, odd) = rows.partition(r => r.getLong(0) % 2 == 0)
          val tmp = new java.io.File(
            s"/tmp/graft_avro_${tag}_tmp_${java.util.UUID.randomUUID()}")
          tmp.mkdirs()
          AvroIngest.writeFile(even, schema, new java.io.File(tmp, "part0.avro"))
          AvroIngest.writeFile(odd, schema, new java.io.File(tmp, "part1.avro"))
          if (!tmp.renameTo(dir)) {
            // "lost the race" is only TRUE if a complete destination
            // actually exists — verify before discarding the fresh tmp
            // files; any other rename failure (permissions, partial
            // state) must surface here, not as an obscure read error on
            // a nonexistent cache dir two lines later.
            if (new java.io.File(dir, "part0.avro").exists() &&
                new java.io.File(dir, "part1.avro").exists()) {
              new java.io.File(tmp, "part0.avro").delete()
              new java.io.File(tmp, "part1.avro").delete()
              tmp.delete()
            } else {
              throw new java.io.IOException(
                s"q_avro_ingest: rename $tmp -> $dir failed and the " +
                  "destination is absent or incomplete — not a benign " +
                  "concurrent-writer race; investigate the tmp dir state")
            }
          }
        }
        AvroIngest.read(s, dir.toString)
          .groupBy("source", "lang")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").as("total_chars"),
            countDistinct("doc_id").as("n_ids"))
          .orderBy("source", "lang")
      },
      Some("""SELECT source, lang, count(*) AS n_docs,
                     CAST(sum(n_chars) AS BIGINT) AS total_chars,
                     count(DISTINCT doc_id) AS n_ids
              FROM documents GROUP BY 1, 2 ORDER BY source, lang"""))
  )

  /** One trained BPE artifact per (session, sfDir) — Bpe.train leaves its
    * dictionary persisted by contract (see its scaladoc), so memoizing
    * here both discharges the caller's unpersist obligation (bounded: one
    * cached dict per dataset per session, not one per invocation) and
    * lets q_bpe_train / q_bpe_encode / bench reps share a single training
    * run, the tsSegCache pattern.
    */
  private val bpeCache = scala.collection.concurrent.TrieMap[
    (org.apache.spark.sql.SparkSession, String),
    (Seq[(Int, String, String, Long)], org.apache.spark.sql.DataFrame)]()
  private def bpeTrained(s: org.apache.spark.sql.SparkSession, d: String) =
    bpeCache.getOrElseUpdate((s, d),
      graft.pipeline.Bpe.train(graft.engine.Tables.documents(s, d), "text", k = 8))

  /** The exact-regime twins' provable corpus: word "abcdefghi" weighted
    * (2 + doc_id % 3) per doc plus "jklmnop" once per doc — see
    * q_bpe_train_exact for why this makes all 8 merges (and the encode
    * statistics) analytically derivable.
    */
  private def bpeExactDocs(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.engine.Tables.documents(s, d).select(
      col("source"),
      expr("concat(repeat(' abcdefghi', cast(2 + doc_id % 3 as int))," +
        " ' jklmnop')").as("text"))

  private def bpeTrainedExact(s: org.apache.spark.sql.SparkSession, d: String) =
    bpeCache.getOrElseUpdate((s, s"bpe_exact#$d"),
      graft.pipeline.Bpe.train(bpeExactDocs(s, d), "text", k = 8))

  /** Drop (and unpersist) memoized BPE artifacts — ScaleBench calls this
    * per rep so scale slopes measure the training work, not a cache hit.
    */
  def invalidateBpeCache(): Unit = {
    bpeCache.values.foreach { case (_, dict) => dict.unpersist() }
    bpeCache.clear()
  }
}
