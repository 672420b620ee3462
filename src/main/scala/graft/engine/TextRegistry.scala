package graft.engine

import graft.engine.Registry0.{Entry, e}
import PortableHash.{duckH28, duckMinhashJ, P}

/** Text / dedup / similarity query registry (SURVEY.md §2D). Oracle SQL
  * is generated so the hash constants stay single-sourced with
  * [[PortableHash]] / [[Similarity]]. */
object TextRegistry {

  /** DuckDB: distinct 3-token shingles of `toks`. */
  private val duckShingles =
    "list_distinct(list_transform(range(1, greatest(len(toks)-2,0)+1), " +
      "i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]))"

  private val toksCte =
    "t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents)"

  /** DuckDB: in-order bigram list of `toks` (empty under 2 tokens) —
    * single-sourced for the four bigram-consuming oracles, mirroring
    * [[TextOps.shingles2]]. */
  private val duckBigrams =
    "list_transform(range(1, greatest(len(toks)-1,0)+1), " +
      "i -> toks[i]||' '||toks[i+1])"

  /** Shared minhash-signature CTE chain ending in `sig(doc_id, h0..h11)`. */
  private def sigCtes: String = {
    val mins = (0 until TextOps.NumHashes)
      .map(j => s"min(${duckMinhashJ("x", j)}) AS h$j").mkString(", ")
    s"""$toksCte,
       | ss AS (SELECT doc_id, $duckShingles AS s FROM t),
       | sh AS (SELECT doc_id, unnest(s) AS sh FROM ss),
       | hx AS (SELECT doc_id, ${duckH28("sh")} AS x FROM sh),
       | sig AS (SELECT doc_id, $mins FROM hx GROUP BY doc_id)""".stripMargin
  }

  // popcount form, matching TextOps.simhashOfHashes: bit set iff 2·S_b > n
  private val duckSimhashSums = (0 until 28).map(b =>
    s"sum((x >> $b) & 1) AS s$b").mkString(", ") + ", count(*) AS n"
  private val duckSimhashPack = (0 until 28).map(b =>
    s"(CASE WHEN 2*s$b > n THEN ${1L << b} ELSE 0 END)").mkString(" + ")

  /** Unigram simhash CTE chain ending in `sh(doc_id, simhash)`. */
  private val simhashCtes: String =
    s"""u AS (SELECT doc_id, unnest(list_distinct(string_split(text,' '))) AS tok
       |  FROM documents),
       | hx AS (SELECT doc_id, ${duckH28("tok")} AS x FROM u),
       | bs AS (SELECT doc_id, $duckSimhashSums FROM hx GROUP BY doc_id),
       | sh AS (SELECT doc_id, CAST($duckSimhashPack AS BIGINT) AS simhash FROM bs)""".stripMargin

  /** Shingle simhash CTE chain (non-distinct shingles, matching
    * TextOps.shingleSets) ending in `sh(doc_id, simhash)`. */
  private val simhashShingleCtes: String =
    s"""$toksCte,
       | ss AS (SELECT doc_id, list_transform(range(1, greatest(len(toks)-2,0)+1),
       |   i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]) AS s FROM t),
       | u AS (SELECT doc_id, unnest(s) AS sh FROM ss),
       | hx AS (SELECT doc_id, ${duckH28("sh")} AS x FROM u),
       | bs AS (SELECT doc_id, $duckSimhashSums FROM hx GROUP BY doc_id),
       | sh AS (SELECT doc_id, CAST($duckSimhashPack AS BIGINT) AS simhash FROM bs)""".stripMargin

  /** CTE chain extending [[sigCtes]] to `p(a, b, jacc)` — LSH band
    * candidates with exact n-gram Jaccard (shared by q_dedup_ngram and
    * q_dup_clusters). */
  private def ngramPairCtes: String = {
    val bandSelects = (0 until TextOps.Bands).map { b =>
      s"SELECT doc_id, $b AS band, h${3 * b}||'_'||h${3 * b + 1}||'_'||h${3 * b + 2} AS sg FROM sig"
    }.mkString(" UNION ALL ")
    s"""$sigCtes,
       | bands AS ($bandSelects),
       | cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |   FROM bands x JOIN bands y
       |   ON x.band = y.band AND x.sg = y.sg AND x.doc_id < y.doc_id),
       | p AS (SELECT a, b,
       |   len(list_intersect(sa.s, sb.s)) / len(list_distinct(sa.s || sb.s)) AS jacc
       |  FROM cand JOIN ss sa ON sa.doc_id = a JOIN ss sb ON sb.doc_id = b)""".stripMargin
  }

  /** DuckDB mirror of [[TextOps.splitOf]] — the ONE SQL rendering of
    * the train/valid/test assignment. */
  private def duckSplit(x: String): String = {
    val h = duckH28(s"'split_'||$x")
    s"CASE WHEN $h % 100 < 80 THEN 'train' " +
      s"WHEN $h % 100 < 90 THEN 'valid' ELSE 'test' END"
  }

  /** DuckDB mirror of [[Similarity.lshBitsFor]]: MinLshBits + the count
    * of occupancy thresholds passed — exact integer comparisons, so both
    * engines derive the identical bit count from their own corpus count. */
  private val duckBitsCte = {
    val terms = (Similarity.MinLshBits until Similarity.MaxLshBits)
      .map(b => s"(CASE WHEN c > ${Similarity.TargetBucket << b} THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"bi AS (SELECT ${Similarity.MinLshBits} + $terms AS b " +
      "FROM (SELECT count(*) AS c FROM embeddings))"
  }

  /** Adaptive-bit sign-LSH bucket: projection j contributes 2^j only when
    * j < b (the scalar from the `bi` CTE). The weight vectors are
    * emitted as literal lists from [[Similarity.lshWeight]] — single-
    * sourced values, no formula duplicated into SQL. */
  private def duckLshBucketDyn(v: String): String =
    (0 until Similarity.MaxLshBits).map { j =>
      val ws = (0 until 64).map(i => s"${Similarity.lshWeight(j, i)}.0")
        .mkString("[", ",", "]")
      s"(CASE WHEN $j < b AND list_dot_product($v, $ws) >= 0 " +
        s"THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  private val embCtes =
    """e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      | n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nm FROM e)""".stripMargin

  /** DuckDB mirror of [[Similarity.semDedupCells]]: NumCentroids times a
    * product of doubling terms, each an exact integer comparison — both
    * engines derive the identical adaptive K from their own corpus
    * count (the [[duckBitsCte]] pattern). Counts the GATE subset `ns`
    * (= the whole corpus below [[Similarity.SemDedupGateCap]]), exactly
    * as [[Similarity.semDedupGated]] derives K from min(n, cap). */
  private val duckKCte = {
    val terms = (0 until Similarity.MaxCellDoublings)
      .map(j => "(CASE WHEN cnt > " +
        s"${(Similarity.CellTarget * Similarity.NumCentroids) << j} " +
        "THEN 2 ELSE 1 END)")
      .mkString(" * ")
    s"kc AS (SELECT ${Similarity.NumCentroids} * $terms AS kk " +
      "FROM (SELECT count(*) AS cnt FROM ns))"
  }

  def entries: Seq[(String, Entry)] = Seq(

    "q_text_tokens" -> e(TextOps.textTokens,
      """SELECT tok, count(*) AS c, count(DISTINCT doc_id) AS n_docs
        |FROM (SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents) u
        |GROUP BY tok ORDER BY c DESC, tok""".stripMargin),

    "q_token_count" -> e(TextOps.tokenCount,
      """SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS n_ws,
        | CAST(len(regexp_extract_all(text,'[a-z]+')) AS BIGINT) AS n_alpha,
        | CAST(len(regexp_extract_all(text,'[a-z]{1,4}')) AS BIGINT) AS n_bpe,
        | n_chars
        |FROM documents ORDER BY doc_id""".stripMargin),

    "q_doc_stats" -> e(TextOps.docStats,
      """SELECT source, lang, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS total_chars,
        | CAST(sum(n_chars) AS DOUBLE)/count(*) AS avg_chars,
        | min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    "q_lang_id" -> e(TextOps.langId,
      """WITH u AS (SELECT doc_id, lang, unnest(string_split(text,' ')) AS tok
        |  FROM documents),
        | g AS (SELECT doc_id, lang, count(*) AS n_tok,
        |   CAST(sum(CASE WHEN tok IN ('the','a','of','and','in')
        |     THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
        |  FROM u GROUP BY 1, 2)
        |SELECT doc_id, lang, n_tok, n_stop,
        | CAST(n_stop AS DOUBLE)/n_tok AS stop_ratio,
        | CASE WHEN CAST(n_stop AS DOUBLE)/n_tok >= 0.05 THEN 'en' ELSE 'und' END
        |   AS pred_lang
        |FROM g ORDER BY doc_id""".stripMargin),

    "q_quality_score" -> e(TextOps.qualityScore,
      s"""WITH u AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok
         |  FROM documents),
         | g AS (SELECT doc_id, count(*) AS n_tok, count(DISTINCT tok) AS n_uniq,
         |   CAST(sum(length(tok)) AS BIGINT) AS sum_len FROM u GROUP BY 1)
         |SELECT doc_id, n_tok, n_uniq,
         | CAST(n_uniq AS DOUBLE)/n_tok AS ttr,
         | CAST(sum_len AS DOUBLE)/n_tok AS mean_tok_len,
         | ${TextOps.duckGrade("n_tok", "n_uniq")} AS grade
         |FROM g ORDER BY doc_id""".stripMargin),

    "q_repetition" -> e(TextOps.repetitionStats,
      s"""WITH $toksCte,
         | u AS (SELECT doc_id, unnest(toks) AS tok FROM t),
         | ug AS (SELECT doc_id, tok, count(*) AS c FROM u GROUP BY 1, 2),
         | us AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
         |   count(*) AS n_uniq, max(c) AS max_tok FROM ug GROUP BY 1),
         | b AS (SELECT doc_id, unnest($duckBigrams) AS bg FROM t),
         | bgc AS (SELECT doc_id, bg, count(*) AS c FROM b GROUP BY 1, 2),
         | bs AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_big,
         |   max(c) AS max_big FROM bgc GROUP BY 1)
         |SELECT doc_id, n_tok, n_uniq, max_tok, n_big, max_big,
         | CAST(n_tok - n_uniq AS DOUBLE)/n_tok AS dup_frac,
         | CAST(max_big AS DOUBLE)/n_big AS big_frac,
         | CASE WHEN CAST(max_big AS DOUBLE)/n_big >= ${TextOps.RepetitiveBigramFrac}
         |   THEN 'repetitive' ELSE 'ok' END AS grade
         |FROM us JOIN bs USING (doc_id) ORDER BY doc_id""".stripMargin),

    "q_cross_dedup" -> e(TextOps.crossSourceDedup,
      """WITH x AS (SELECT doc_id, source, lower(trim(text)) AS k,
        |   TRY_CAST(substr(source, 4) AS INT) AS prio FROM documents),
        | g AS (SELECT k, count(*) AS n_dups,
        |   count(DISTINCT source) AS n_sources FROM x GROUP BY 1),
        | -- coalesce (not NULLS LAST) mirrors the Spark min_by key
        | -- EXACTLY: under NULLS LAST a real prio of 2147483647 would
        | -- strictly beat a null prio, while Spark's coalesce makes
        | -- them tie and fall through to the doc_id tiebreak
        | r AS (SELECT doc_id, source, k, row_number() OVER (
        |    PARTITION BY k ORDER BY coalesce(prio, 2147483647),
        |      coalesce(doc_id, 9223372036854775807),
        |      coalesce(source, '')) AS rn FROM x)
        |SELECT r.doc_id, r.source, g.n_dups, g.n_sources
        |-- null-safe join: a null-text group (k IS NULL) is still a
        |-- dedup group; USING (k) would silently drop it
        |FROM r JOIN g ON r.k IS NOT DISTINCT FROM g.k WHERE rn = 1
        |ORDER BY doc_id, source, n_dups, n_sources""".stripMargin),

    "q_contaminate" -> e(TextOps.contamination,
      s"""WITH $toksCte,
         | ss AS (SELECT doc_id, list_transform(range(1, greatest(len(toks)-2,0)+1),
         |   i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]) AS s FROM t),
         | sh AS (SELECT doc_id, unnest(s) AS sh FROM ss WHERE len(s) > 0),
         | hx AS (SELECT DISTINCT doc_id, ${duckH28("sh")} AS x FROM sh),
         | bm AS (SELECT DISTINCT x FROM hx WHERE doc_id < ${TextOps.BenchmarkDocs}),
         | tot AS (SELECT doc_id, count(*) AS n_sh FROM hx
         |   WHERE doc_id >= ${TextOps.BenchmarkDocs} GROUP BY 1),
         | hits AS (SELECT doc_id, count(*) AS n_hit FROM hx
         |   WHERE doc_id >= ${TextOps.BenchmarkDocs}
         |    AND x IN (SELECT x FROM bm) GROUP BY 1)
         |SELECT t.doc_id, t.n_sh, CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
         | CAST(coalesce(h.n_hit, 0) AS DOUBLE)/t.n_sh AS hit_frac,
         | CASE WHEN coalesce(h.n_hit, 0) > 0 THEN 'contaminated' ELSE 'clean' END
         |   AS flag
         |FROM tot t LEFT JOIN hits h USING (doc_id) ORDER BY doc_id""".stripMargin),

    "q_fingerprint" -> e(TextOps.fingerprintQ,
      s"""WITH $toksCte
         |SELECT doc_id, CAST(list_sum(list_transform(range(1, len(toks)+1),
         |  i -> (${duckH28("toks[i]")} * ((1103515245*((i-1)%16) + 12345) % $P))
         |       % $P)) % $P AS BIGINT) AS fp
         |FROM t ORDER BY doc_id""".stripMargin),

    "q_dedup_exact" -> e(TextOps.dedupExact,
      """SELECT doc_id, CAST(dup_cnt AS BIGINT) AS dup_cnt, n_chars FROM (
        | SELECT doc_id, n_chars,
        |  row_number() OVER (PARTITION BY lower(trim(text)) ORDER BY doc_id) AS rn,
        |  count(*) OVER (PARTITION BY lower(trim(text))) AS dup_cnt
        | FROM documents) x
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin),

    "q_dedup_minhash" -> e(TextOps.dedupMinhash, {
      val hs = (0 until TextOps.NumHashes).map(j => s"h$j").mkString(", ")
      s"""WITH $sigCtes
         |SELECT doc_id, $hs FROM sig ORDER BY doc_id""".stripMargin
    }),

    "q_dedup_ngram" -> e(TextOps.dedupNgram,
      s"""WITH $ngramPairCtes
         |SELECT a, b, jacc FROM p WHERE jacc >= ${TextOps.NearDupJaccard} ORDER BY a, b""".stripMargin),

    "q_source_overlap" -> e(TextOps.sourceOverlap,
      s"""WITH $ngramPairCtes,
         | pr AS (SELECT a, b FROM p WHERE jacc >= ${TextOps.NearDupJaccard}),
         | sp AS (SELECT least(da.source, db.source) AS src_a,
         |    greatest(da.source, db.source) AS src_b
         |   FROM pr JOIN documents da ON da.doc_id = pr.a
         |        JOIN documents db ON db.doc_id = pr.b)
         |SELECT src_a, src_b, count(*) AS n_pairs FROM sp
         |GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin),

    "q_minhash_est" -> e(TextOps.minhashEstimate, {
      val nEq = (0 until TextOps.NumHashes)
        .map(j => s"(CASE WHEN sa.h$j = sb.h$j THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH $sigCtes,
         | bands AS (${(0 until TextOps.Bands).map { b =>
        s"SELECT doc_id, $b AS band, h${3 * b}||'_'||h${3 * b + 1}||'_'||h${3 * b + 2} AS sg FROM sig"
      }.mkString(" UNION ALL ")}),
         | cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |   FROM bands x JOIN bands y
         |   ON x.band = y.band AND x.sg = y.sg AND x.doc_id < y.doc_id),
         | q AS (SELECT a, b, CAST($nEq AS BIGINT) AS n_eq,
         |   len(list_intersect(pa.s, pb.s)) / len(list_distinct(pa.s || pb.s)) AS jacc
         |  FROM cand JOIN sig sa ON sa.doc_id = a JOIN sig sb ON sb.doc_id = b
         |   JOIN ss pa ON pa.doc_id = a JOIN ss pb ON pb.doc_id = b)
         |SELECT a, b, n_eq, CAST(n_eq AS DOUBLE)/${TextOps.NumHashes} AS est, jacc
         |FROM q ORDER BY a, b""".stripMargin
    }),

    "q_dup_clusters" -> e(TextOps.dupClusters,
      // NO MATERIALIZED here: DuckDB 1.0 returns a WRONG fixpoint when
      // a materialized CTE is referenced from a recursive term
      // (measured r9: a 6-iteration probe stopped at 1). The price is
      // per-iteration re-evaluation of the shingle pipeline — the 10x
      // oracle harness absorbs it with threads=4 + spill (check.py);
      // closure depth is near-dup-cluster diameter, typically 2-3.
      s"""WITH RECURSIVE $ngramPairCtes,
         | pr AS (SELECT a, b FROM p WHERE jacc >= ${TextOps.NearDupJaccard}),
         | sym AS (SELECT a AS x, b AS y FROM pr
         |   UNION SELECT b AS x, a AS y FROM pr),
         | reach(s, t) AS (
         |   SELECT x, x FROM (SELECT DISTINCT x FROM sym) n
         |   UNION
         |   SELECT r.s, e.y FROM reach r JOIN sym e ON r.t = e.x),
         | lab AS (SELECT s, min(t) AS component FROM reach GROUP BY s)
         |SELECT component AS cluster, count(*) AS n_members
         |FROM lab GROUP BY 1 ORDER BY 1""".stripMargin),

    "q_cluster_sizes" -> e(TextOps.clusterSizes,
      // no MATERIALIZED in a recursive WITH — see q_dup_clusters
      s"""WITH RECURSIVE $ngramPairCtes,
         | pr AS (SELECT a, b FROM p WHERE jacc >= ${TextOps.NearDupJaccard}),
         | sym AS (SELECT a AS x, b AS y FROM pr
         |   UNION SELECT b AS x, a AS y FROM pr),
         | reach(s, t) AS (
         |   SELECT x, x FROM (SELECT DISTINCT x FROM sym) n
         |   UNION
         |   SELECT r.s, e.y FROM reach r JOIN sym e ON r.t = e.x),
         | lab AS (SELECT s, min(t) AS component FROM reach GROUP BY s),
         | cl AS (SELECT component, CAST(count(*) AS BIGINT) AS sz
         |  FROM lab GROUP BY 1)
         |SELECT sz AS n_members, count(*) AS n_clusters
         |FROM cl GROUP BY 1 ORDER BY n_members, n_clusters""".stripMargin),

    "q_dedup_simhash" -> e(TextOps.dedupSimhash,
      s"""WITH $simhashCtes
         |SELECT doc_id, simhash,
         | CAST(count(*) OVER (PARTITION BY simhash) AS BIGINT) AS n_same
         |FROM sh ORDER BY doc_id""".stripMargin),

    "q_simhash_near" -> e(TextOps.simhashNear, {
      val mask = (1 << TextOps.NearBandBits) - 1
      val bandSelects = (0 until TextOps.NearBands).map { b =>
        s"SELECT doc_id, simhash, $b AS band, " +
          s"(simhash >> ${TextOps.NearBandBits * b}) & $mask AS bits FROM sh"
      }.mkString(" UNION ALL ")
      s"""WITH $simhashShingleCtes,
         | bands AS ($bandSelects),
         | cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
         |   bit_count(xor(x.simhash, y.simhash)) AS ham
         |  FROM bands x JOIN bands y
         |  ON x.band = y.band AND x.bits = y.bits AND x.doc_id < y.doc_id)
         |SELECT a, b, CAST(ham AS BIGINT) AS ham FROM cand
         |WHERE ham <= ${TextOps.NearMaxHamming} ORDER BY a, b""".stripMargin
    }),

    "q_split_strata" -> e(TextOps.splitStrata,
      s"""WITH b AS (SELECT source, n_chars, ${duckSplit("doc_id")} AS split
         |  FROM documents)
         |SELECT source, split, count(*) AS n_docs,
         | CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    "q_split_leakage" -> e(TextOps.splitLeakage,
      s"""WITH $ngramPairCtes,
         | pr AS (SELECT a, b FROM p WHERE jacc >= ${TextOps.NearDupJaccard}),
         | sx AS (SELECT ${duckSplit("a")} AS xa, ${duckSplit("b")} AS xb
         |  FROM pr),
         | sg AS (SELECT least(xa, xb) AS split_a, greatest(xa, xb) AS split_b
         |  FROM sx)
         |SELECT split_a, split_b, count(*) AS n_pairs,
         | split_a <> split_b AS leaky
         |FROM sg GROUP BY 1, 2 ORDER BY split_a, split_b""".stripMargin),

    "q_tfidf" -> e(TextOps.tfidf,
      """WITH t AS (SELECT doc_id, unnest(string_split(text,' ')) AS term
        |  FROM documents),
        | tf AS (SELECT doc_id, term, count(*) AS n FROM t GROUP BY 1, 2),
        | ntok AS (SELECT doc_id, term, n,
        |   sum(n) OVER (PARTITION BY doc_id) AS n_tok FROM tf),
        | dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM t GROUP BY 1),
        | nd AS (SELECT count(*) AS n_docs FROM documents),
        | wt AS (SELECT doc_id, term, n, df,
        |   (CAST(n AS DOUBLE)/n_tok) * (CAST(n_docs+1 AS DOUBLE)/(df+1)) AS w
        |  FROM ntok JOIN dfreq USING (term) CROSS JOIN nd),
        | r AS (SELECT *, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY w DESC, term) AS rk FROM wt)
        |SELECT doc_id, term, CAST(n AS BIGINT) AS n, CAST(df AS BIGINT) AS df,
        | round(w, 6) AS w6, CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 3 ORDER BY doc_id, rk, term""".stripMargin),

    "q_unigram_ppl" -> e(TextOps.unigramSurprisal,
      s"""WITH u AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok
         |  FROM documents),
         | dt AS (SELECT doc_id, tok, count(*) AS lc FROM u GROUP BY 1, 2),
         | cf AS (SELECT tok, sum(lc) AS cf FROM dt GROUP BY 1),
         | tot AS (SELECT sum(cf) AS tot FROM cf),
         | q AS (SELECT doc_id, lc,
         |   CAST(floor(lc * log2(CAST(tot AS DOUBLE)/cf)
         |     * ${TextOps.SurprisalScale}) AS BIGINT) AS mb
         |  FROM dt JOIN cf USING (tok) CROSS JOIN tot),
         | g AS (SELECT doc_id, CAST(sum(lc) AS BIGINT) AS n_tok,
         |   CAST(sum(mb) AS BIGINT) AS mbits FROM q GROUP BY 1)
         |SELECT doc_id, n_tok, mbits, mbits // n_tok AS mb_tok
         |FROM g ORDER BY doc_id, n_tok, mbits, mb_tok""".stripMargin),

    "q_bm25" -> e(TextOps.bm25, {
      val terms = TextOps.Bm25Terms.map(t => s"'$t'").mkString(", ")
      s"""WITH u AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok
         |  FROM documents),
         | dt AS (SELECT doc_id, tok, count(*) AS lc FROM u GROUP BY 1, 2),
         | dl AS (SELECT doc_id, sum(lc) AS dl FROM dt GROUP BY 1),
         | st AS (SELECT count(*) AS n_docs, sum(dl) AS tot FROM dl),
         | qt AS (SELECT * FROM dt WHERE tok IN ($terms)),
         | dfreq AS (SELECT tok, count(*) AS df FROM qt GROUP BY 1),
         | sc AS (SELECT doc_id,
         |   floor(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
         |     * ((lc * 2.2) / (lc + 1.2 * (0.25
         |         + 0.75 * CAST(dl * n_docs AS DOUBLE) / tot)))
         |     * ${TextOps.SurprisalScale}) AS mb
         |  FROM qt JOIN dfreq USING (tok) JOIN dl USING (doc_id)
         |  CROSS JOIN st)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS hits,
         | CAST(sum(mb) AS BIGINT) AS sc
         |FROM sc GROUP BY doc_id
         |ORDER BY sc DESC, hits DESC, doc_id LIMIT 100""".stripMargin
    }),

    "q_outlier_mad" -> e(TextOps.outlierMad,
      """WITH m1 AS (SELECT source, quantile_cont(n_chars, 0.5) AS med
        |  FROM documents GROUP BY 1),
        | d1 AS (SELECT d.source,
        |    abs(CAST(n_chars AS DOUBLE) - med) AS dev, med
        |  FROM documents d JOIN m1 USING (source)),
        | m2 AS (SELECT source, quantile_cont(dev, 0.5) AS mad
        |  FROM d1 GROUP BY 1)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        | min(med) AS med, min(mad) AS mad,
        | CAST(sum(CASE WHEN dev > 3.0 * mad THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_out
        |FROM d1 JOIN m2 USING (source)
        |GROUP BY source ORDER BY source, n_docs, med, mad, n_out""".stripMargin),

    "q_curate" -> e(TextOps.curateDocs,
      """WITH u AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok
        |  FROM documents),
        | g AS (SELECT doc_id, count(*) AS n_tok, count(DISTINCT tok) AS n_uniq
        |  FROM u GROUP BY 1),
        | q AS (SELECT d.doc_id, d.lang, d.text, d.n_chars, g.n_tok, g.n_uniq
        |  FROM documents d JOIN g USING (doc_id)
        |  WHERE g.n_tok >= 30 AND CAST(g.n_uniq AS DOUBLE)/g.n_tok >= 0.4),
        | dd AS (SELECT *, row_number() OVER (
        |    PARTITION BY lower(trim(text)) ORDER BY doc_id) AS rn FROM q)
        |SELECT lang, count(*) AS n_docs,
        | CAST(sum(n_tok) AS BIGINT) AS total_tok,
        | CAST(sum(n_uniq) AS BIGINT) AS total_uniq,
        | CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM dd WHERE rn = 1 GROUP BY lang ORDER BY lang""".stripMargin),

    "q_chunk_docs" -> e(TextOps.chunkDocs,
      s"""WITH $toksCte,
         | c AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tok FROM t),
         | u AS (SELECT doc_id, toks,
         |   unnest(range(0, (n_tok - 1) // ${TextOps.ChunkStride} + 1)) AS chunk_id
         |  FROM c),
         | s AS (SELECT doc_id, chunk_id,
         |   toks[chunk_id*${TextOps.ChunkStride}+1 :
         |        least(chunk_id*${TextOps.ChunkStride}+${TextOps.ChunkSize},
         |              len(toks))] AS chunk
         |  FROM u)
         |SELECT doc_id, chunk_id, CAST(len(chunk) AS BIGINT) AS n_tok_chunk,
         | md5(array_to_string(chunk, ' ')) AS sig
         |FROM s ORDER BY doc_id, chunk_id""".stripMargin),

    "q_cdc_chunks" -> e(TextOps.cdcChunks, {
      val h = duckH28("toks[i]")
      s"""WITH $toksCte,
         | c AS (SELECT doc_id, toks, len(toks) AS n FROM t),
         | bp AS (SELECT doc_id, toks, n,
         |   list_filter(range(1, n + 1), i -> $h % ${TextOps.CdcMask} = 0)
         |     AS bpos FROM c),
         | b AS (SELECT doc_id, toks,
         |   CASE WHEN list_contains(bpos, n) THEN bpos
         |        ELSE list_append(bpos, n) END AS bounds FROM bp),
         | b2 AS (SELECT doc_id, toks, bounds,
         |   list_prepend(0, bounds[1 : len(bounds) - 1]) AS starts FROM b),
         | u AS (SELECT doc_id, toks, bounds, starts,
         |   unnest(range(1, len(bounds) + 1)) AS k FROM b2)
         |SELECT doc_id, CAST(k - 1 AS BIGINT) AS chunk_idx,
         | CAST(bounds[k] - starts[k] AS BIGINT) AS n_tok_chunk,
         | md5(array_to_string(toks[starts[k]+1 : bounds[k]], ' ')) AS sig
         |FROM u ORDER BY doc_id, chunk_idx""".stripMargin
    }),

    "q_span_dedup" -> e(TextOps.spanDedup,
      s"""WITH $toksCte,
         | c AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tok FROM t),
         | u AS (SELECT doc_id, toks,
         |   unnest(range(0, (n_tok - 1) // ${TextOps.ChunkStride} + 1)) AS chunk_id
         |  FROM c),
         | s AS (SELECT doc_id, chunk_id,
         |   md5(array_to_string(
         |     toks[chunk_id*${TextOps.ChunkStride}+1 :
         |          least(chunk_id*${TextOps.ChunkStride}+${TextOps.ChunkSize},
         |                len(toks))], ' ')) AS sig
         |  FROM u),
         | g AS (SELECT sig, count(*) AS n_spans,
         |   count(DISTINCT doc_id) AS n_docs, min(doc_id) AS first_doc,
         |   min(struct_pack(doc_id := doc_id, chunk_id := chunk_id)) AS fst
         |  FROM s GROUP BY sig)
         |SELECT sig, n_spans, n_docs, first_doc, fst.chunk_id AS first_chunk
         |FROM g WHERE n_docs >= 2 ORDER BY sig""".stripMargin),

    "q_dedup_apply" -> e(TextOps.dedupApply,
      s"""WITH RECURSIVE $ngramPairCtes,
         | pr AS (SELECT a, b FROM p WHERE jacc >= ${TextOps.NearDupJaccard}),
         | sym AS (SELECT a AS x, b AS y FROM pr
         |   UNION SELECT b AS x, a AS y FROM pr),
         | reach(s, t) AS (
         |   SELECT x, x FROM (SELECT DISTINCT x FROM sym) n
         |   UNION
         |   SELECT r.s, e.y FROM reach r JOIN sym e ON r.t = e.x),
         | lab AS (SELECT s, min(t) AS component FROM reach GROUP BY s),
         | drp AS (SELECT s AS doc_id FROM lab WHERE s != component)
         |SELECT doc_id, source, lang, n_chars FROM documents
         |WHERE doc_id NOT IN (SELECT doc_id FROM drp)
         |ORDER BY doc_id""".stripMargin),

    "q_pack_seqs" -> e(TextOps.packSeqs,
      s"""WITH t AS (SELECT doc_id, source,
         |   CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok FROM documents),
         | c AS (SELECT doc_id, source, n_tok,
         |   sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id, n_tok
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tok_end
         |  FROM t)
         |SELECT doc_id, source, n_tok,
         | -- CAST AS BIGINT is load-bearing: the window sum makes tok_end
         | -- HUGEINT, and an int128-typed output column round-trips
         | -- through the driver comparator as float64 ("3.0" != "3" —
         | -- hash-red with rows/schema green). Root cause of the r3-r5
         | -- q_pack_seqs reds; see scripts/check.py's HUGEINT guard.
         | CAST((tok_end - n_tok) // ${TextOps.PackBudget} AS BIGINT) AS seq_id,
         | CAST((tok_end - n_tok) % ${TextOps.PackBudget} AS BIGINT) AS seq_off
         |FROM c ORDER BY doc_id, source, n_tok, seq_id, seq_off""".stripMargin),

    "q_len_buckets" -> e(TextOps.lenBuckets, {
      val cases = TextOps.LenBucketBounds.reverse
        .map(b => s"WHEN n_tok >= $b THEN $b").mkString(" ")
      s"""WITH t AS (SELECT CAST(len(string_split(text,' ')) AS BIGINT)
         |    AS n_tok FROM documents)
         |SELECT CASE $cases ELSE 0 END AS bucket_lo,
         | count(*) AS n_docs,
         | CAST(sum(n_tok) AS BIGINT) AS tot_tok,
         | CAST(sum(greatest(n_tok - ${TextOps.PackBudget}, 0)) AS BIGINT)
         |   AS over_budget_tok
         |FROM t GROUP BY 1 ORDER BY bucket_lo""".stripMargin
    }),

    "q_domain_cap" -> e(TextOps.domainCap, {
      val h = duckH28("'cap_'||doc_id")
      s"""WITH a AS (SELECT source, doc_id, n_chars, $h AS hk FROM documents),
         | r AS (SELECT source, doc_id, n_chars, CAST(row_number() OVER (
         |    PARTITION BY source ORDER BY hk, doc_id) AS BIGINT) AS rk FROM a)
         |SELECT source, rk, doc_id, n_chars FROM r
         |WHERE rk <= ${TextOps.DomainCap} ORDER BY source, rk""".stripMargin
    }),

    "q_mix_sample" -> e(TextOps.mixSample, {
      val h = duckH28("'mix_'||doc_id")
      s"""WITH c AS (SELECT source, count(*) AS n_total FROM documents GROUP BY 1),
         | mm AS (SELECT min(n_total) AS m FROM c),
         | r AS (SELECT source, n_total,
         |   (m * ${TextOps.MixPpm}) // n_total AS rate_ppm FROM c CROSS JOIN mm),
         | k AS (SELECT d.source, count(*) AS n_kept
         |  FROM documents d JOIN r USING (source)
         |  WHERE $h % ${TextOps.MixPpm} < r.rate_ppm GROUP BY 1)
         |SELECT r.source, r.n_total, r.rate_ppm,
         | CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
         |FROM r LEFT JOIN k USING (source) ORDER BY source""".stripMargin
    }),

    "q_filter_funnel" -> e(TextOps.filterFunnel,
      s"""WITH $toksCte,
         | u AS (SELECT doc_id, unnest(toks) AS tok FROM t),
         | ug AS (SELECT doc_id, count(*) AS n_tok, count(DISTINCT tok) AS n_uniq
         |  FROM u GROUP BY 1),
         | b AS (SELECT doc_id, unnest($duckBigrams) AS bg FROM t),
         | bgc AS (SELECT doc_id, bg, count(*) AS c FROM b GROUP BY 1, 2),
         | bs AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_big,
         |   max(c) AS max_big FROM bgc GROUP BY 1),
         | f AS (SELECT d.doc_id, d.text, ug.n_tok,
         |   coalesce(CAST(bs.max_big AS DOUBLE)/bs.n_big, 0.0) AS big_frac,
         |   (ug.n_tok >= 30) AS q1,
         |   (ug.n_tok >= 30 AND CAST(ug.n_uniq AS DOUBLE)/ug.n_tok >= 0.4) AS q2,
         |   (ug.n_tok >= 30 AND CAST(ug.n_uniq AS DOUBLE)/ug.n_tok >= 0.4
         |     AND coalesce(CAST(bs.max_big AS DOUBLE)/bs.n_big, 0.0)
         |       < ${TextOps.RepetitiveBigramFrac}) AS q3
         |  -- LEFT joins: a null-text doc has no unnested tokens, but it
         |  -- is still a corpus row (stage 'all' must count it, as the
         |  -- Spark side does; its null flags fail every later stage)
         |  FROM documents d LEFT JOIN ug USING (doc_id)
         |    LEFT JOIN bs USING (doc_id)),
         | dd AS (SELECT doc_id, (row_number() OVER (
         |    PARTITION BY lower(trim(text)) ORDER BY doc_id) = 1) AS q4
         |  FROM f WHERE q3),
         | fl AS (SELECT f.n_tok, f.q1, f.q2, f.q3,
         |   coalesce(dd.q4, false) AS q4
         |  FROM f LEFT JOIN dd USING (doc_id)),
         | st AS (
         |  SELECT 0 AS stage, 'all' AS name, true AS pass, n_tok FROM fl
         |  UNION ALL SELECT 1, 'min_tokens', q1, n_tok FROM fl
         |  UNION ALL SELECT 2, 'ttr', q2, n_tok FROM fl
         |  UNION ALL SELECT 3, 'repetition', q3, n_tok FROM fl
         |  UNION ALL SELECT 4, 'exact_dedup', q4, n_tok FROM fl)
         |SELECT CAST(stage AS BIGINT) AS stage, name,
         | CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
         | CAST(sum(CASE WHEN pass THEN n_tok ELSE 0 END) AS BIGINT) AS total_tok
         |FROM st GROUP BY 1, 2 ORDER BY stage""".stripMargin),

    "q_knn_label" -> e((s, d) => Similarity.knnLabel(s, d),
      s"""WITH el AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |   CAST(label AS BIGINT) AS label FROM embeddings),
         | nl AS (SELECT vec_id, v, label,
         |   sqrt(list_dot_product(v, v)) AS nm FROM el),
         | q AS (SELECT vec_id AS q_id, v AS qv, nm AS qnm,
         |   label AS q_label FROM nl WHERE vec_id < ${Similarity.NumQueries}),
         | sc AS (SELECT q.q_id, q.q_label, nl.vec_id, nl.label,
         |   list_dot_product(q.qv, nl.v)/(q.qnm*nl.nm) AS cos
         |  FROM q JOIN nl ON nl.vec_id != q.q_id),
         | r AS (SELECT q_id, q_label, label, row_number() OVER (
         |    PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rk FROM sc),
         | v AS (SELECT q_id, q_label, label, count(*) AS n_votes
         |  FROM r WHERE rk <= ${Similarity.KnnK} GROUP BY 1, 2, 3),
         | p AS (SELECT q_id, q_label, label, n_votes, row_number() OVER (
         |    PARTITION BY q_id ORDER BY n_votes DESC, label) AS vr FROM v)
         |SELECT q_id, q_label AS label, p.label AS pred_label, n_votes
         |FROM p WHERE vr = 1 ORDER BY q_id""".stripMargin),

    "q_hard_negatives" -> e((s, d) => Similarity.hardNegatives(s, d),
      s"""WITH el AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |   CAST(label AS BIGINT) AS label FROM embeddings),
         | nl AS (SELECT vec_id, v, label,
         |   sqrt(list_dot_product(v, v)) AS nm FROM el),
         | q AS (SELECT vec_id AS q_id, v AS qv, nm AS qnm,
         |   label AS q_label FROM nl WHERE vec_id < ${Similarity.NumQueries}),
         | sc AS (SELECT q.q_id, q.q_label, nl.vec_id, nl.label,
         |   list_dot_product(q.qv, nl.v)/(q.qnm*nl.nm) AS cos
         |  FROM q JOIN nl ON nl.label != q.q_label),
         | r AS (SELECT q_id, q_label, vec_id, label, cos,
         |   CAST(row_number() OVER (PARTITION BY q_id
         |     ORDER BY cos DESC, vec_id) AS BIGINT) AS rk FROM sc)
         |SELECT q_id, q_label, vec_id, label, rk, round(cos, 4) AS cos4
         |FROM r WHERE rk <= ${Similarity.HardNegK}
         |ORDER BY q_id, rk, vec_id""".stripMargin),

    "q_sim_hist" -> e((s, d) => Similarity.simHist(s, d),
      s"""WITH $embCtes,
         | $duckBitsCte,
         | nb AS (SELECT vec_id, v, nm, ${duckLshBucketDyn("v")} AS bkt
         |   FROM n CROSS JOIN bi),
         | p AS (SELECT x.vec_id AS a, y.vec_id AS b,
         |   list_dot_product(x.v, y.v)/(x.nm*y.nm) AS cos
         |  FROM nb x JOIN nb y ON x.bkt = y.bkt AND x.vec_id < y.vec_id)
         |SELECT greatest(-10, least(9, CAST(floor(cos*10) AS BIGINT)))
         |   AS decile,
         | count(*) AS n_pairs
         |FROM p GROUP BY 1 ORDER BY decile, n_pairs""".stripMargin),

    "q_pq_codes" -> e((s, d) => Similarity.pqCodes(s, d), {
      val sd = Similarity.PqSubDim
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |   FROM embeddings),
         | ck AS (SELECT vec_id, v, ${duckH28("'pq_'||vec_id")} AS hk FROM e),
         | cw AS (SELECT v, CAST(row_number() OVER (ORDER BY hk, vec_id) - 1
         |     AS BIGINT) AS code
         |  FROM ck ORDER BY hk, vec_id LIMIT ${Similarity.PqCodebook}),
         | cs AS (SELECT code, sub, cv FROM cw
         |  CROSS JOIN (SELECT unnest(range(0, ${Similarity.PqSubspaces})) AS sub)
         |  CROSS JOIN LATERAL (SELECT v[sub*$sd+1 : sub*$sd+$sd] AS cv)),
         | xs AS (SELECT vec_id, sub, sv FROM e
         |  CROSS JOIN (SELECT unnest(range(0, ${Similarity.PqSubspaces})) AS sub)
         |  CROSS JOIN LATERAL (SELECT v[sub*$sd+1 : sub*$sd+$sd] AS sv)),
         | d AS (SELECT vec_id, xs.sub, code,
         |   list_sum(list_transform(range(1, $sd + 1),
         |     i -> (sv[i]-cv[i])*(sv[i]-cv[i]))) AS d2
         |  FROM xs JOIN cs ON xs.sub = cs.sub),
         | r AS (SELECT vec_id, sub, code, d2, row_number() OVER (
         |    PARTITION BY vec_id, sub ORDER BY d2, code) AS rk FROM d)
         |SELECT vec_id, sub, code, round(d2, 6) AS d26
         |FROM r WHERE rk = 1 ORDER BY vec_id, sub""".stripMargin
    }),

    "q_pq_search" -> e((s, d) => Similarity.pqSearch(s, d), {
      val sd = Similarity.PqSubDim
      val fp = Similarity.KmeansFixedPoint
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |   FROM embeddings),
         | ck AS (SELECT vec_id, v, ${duckH28("'pq_'||vec_id")} AS hk FROM e),
         | cw AS (SELECT v, CAST(row_number() OVER (ORDER BY hk, vec_id) - 1
         |     AS BIGINT) AS code
         |  FROM ck ORDER BY hk, vec_id LIMIT ${Similarity.PqCodebook}),
         | cs AS (SELECT code, sub, cv FROM cw
         |  CROSS JOIN (SELECT unnest(range(0, ${Similarity.PqSubspaces})) AS sub)
         |  CROSS JOIN LATERAL (SELECT v[sub*$sd+1 : sub*$sd+$sd] AS cv)),
         | xs AS (SELECT vec_id, sub, sv FROM e
         |  CROSS JOIN (SELECT unnest(range(0, ${Similarity.PqSubspaces})) AS sub)
         |  CROSS JOIN LATERAL (SELECT v[sub*$sd+1 : sub*$sd+$sd] AS sv)),
         | d AS (SELECT vec_id, xs.sub, code,
         |   list_sum(list_transform(range(1, $sd + 1),
         |     i -> (sv[i]-cv[i])*(sv[i]-cv[i]))) AS d2
         |  FROM xs JOIN cs ON xs.sub = cs.sub),
         | r AS (SELECT vec_id, sub, code, row_number() OVER (
         |    PARTITION BY vec_id, sub ORDER BY d2, code) AS rk FROM d),
         | codes AS (SELECT vec_id, sub, code FROM r WHERE rk = 1),
         | lut AS (SELECT xs.vec_id AS q_id, xs.sub, cs.code,
         |   CAST(floor(list_sum(list_transform(range(1, $sd + 1),
         |     i -> (sv[i]-cv[i])*(sv[i]-cv[i]))) * $fp) AS BIGINT) AS pd6
         |  FROM xs JOIN cs ON xs.sub = cs.sub
         |  WHERE xs.vec_id < ${Similarity.NumQueries}),
         | a AS (SELECT q_id, c.vec_id, CAST(sum(pd6) AS BIGINT) AS adist6
         |  FROM codes c JOIN lut ON c.sub = lut.sub AND c.code = lut.code
         |  WHERE c.vec_id != q_id GROUP BY 1, 2),
         | t AS (SELECT q_id, vec_id, adist6, CAST(row_number() OVER (
         |    PARTITION BY q_id ORDER BY adist6, vec_id) AS BIGINT) AS rk FROM a)
         |SELECT q_id, rk, vec_id, adist6 FROM t WHERE rk <= 5
         |ORDER BY q_id, rk, vec_id, adist6""".stripMargin
    }),

    "q_binary_meta" -> e(TextOps.binaryMeta,
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS blen,
        | md5(text) AS sig
        |FROM documents ORDER BY doc_id""".stripMargin),

    "q_sim_topk" -> e((s, d) => Similarity.simTopK(s, d),
      s"""WITH $embCtes,
         | q AS (SELECT vec_id AS q_id, v AS qv, nm AS qnm FROM n
         |   WHERE vec_id < ${Similarity.NumQueries}),
         | s AS (SELECT q_id, vec_id, list_dot_product(qv, v)/(qnm*nm) AS cos
         |   FROM q JOIN n ON vec_id != q_id),
         | r AS (SELECT q_id, vec_id, cos,
         |   row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rk
         |  FROM s)
         |SELECT q_id, vec_id, CAST(rk AS BIGINT) AS rk, round(cos, 4) AS cos4
         |FROM r WHERE rk <= 5 ORDER BY q_id, rk, vec_id""".stripMargin),

    "q_sim_lsh" -> e((s, d) => Similarity.simLsh(s, d),
      s"""WITH $embCtes,
         | $duckBitsCte,
         | nb AS (SELECT vec_id, v, nm, ${duckLshBucketDyn("v")} AS bkt
         |   FROM n CROSS JOIN bi),
         | q AS (SELECT vec_id AS q_id, v AS qv, nm AS qnm, bkt FROM nb
         |   WHERE vec_id < ${Similarity.NumQueries}),
         | s AS (SELECT q.q_id, nb.vec_id, nb.bkt,
         |   list_dot_product(q.qv, nb.v)/(q.qnm*nb.nm) AS cos
         |  FROM q JOIN nb ON q.bkt = nb.bkt AND nb.vec_id != q.q_id),
         | r AS (SELECT q_id, vec_id, bkt, cos,
         |   row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rk
         |  FROM s)
         |SELECT q_id, vec_id, bkt, CAST(rk AS BIGINT) AS rk, round(cos, 4) AS cos4
         |FROM r WHERE rk <= 3 ORDER BY q_id, rk, vec_id""".stripMargin),

    "q_ann_recall" -> e((s, d) => Similarity.annRecall(s, d),
      s"""WITH $embCtes,
         | $duckBitsCte,
         | q0 AS (SELECT vec_id AS q_id, v AS qv, nm AS qnm FROM n
         |   WHERE vec_id < ${Similarity.NumQueries}),
         | bs AS (SELECT q_id, vec_id,
         |   list_dot_product(qv, v)/(qnm*nm) AS cos
         |  FROM q0 JOIN n ON vec_id != q_id),
         | br AS (SELECT q_id, vec_id,
         |   row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rk
         |  FROM bs),
         | b AS (SELECT q_id, vec_id FROM br WHERE rk <= 3),
         | nb AS (SELECT vec_id, v, nm, ${duckLshBucketDyn("v")} AS bkt
         |   FROM n CROSS JOIN bi),
         | ql AS (SELECT vec_id AS q_id, v AS qv, nm AS qnm, bkt FROM nb
         |   WHERE vec_id < ${Similarity.NumQueries}),
         | ls AS (SELECT ql.q_id, nb.vec_id,
         |   list_dot_product(ql.qv, nb.v)/(ql.qnm*nb.nm) AS cos
         |  FROM ql JOIN nb ON ql.bkt = nb.bkt AND nb.vec_id != ql.q_id),
         | lr AS (SELECT q_id, vec_id,
         |   row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rk
         |  FROM ls),
         | l AS (SELECT q_id, vec_id FROM lr WHERE rk <= 3),
         | h AS (SELECT b.q_id, count(*) AS n_hit
         |  FROM b JOIN l ON b.q_id = l.q_id AND b.vec_id = l.vec_id
         |  GROUP BY 1),
         | qs AS (SELECT DISTINCT q_id FROM b)
         |SELECT qs.q_id, CAST(COALESCE(n_hit, 0) AS BIGINT) AS n_hit,
         | CAST(COALESCE(n_hit, 0) AS DOUBLE)/3 AS recall
         |FROM qs LEFT JOIN h ON qs.q_id = h.q_id
         |ORDER BY qs.q_id, n_hit, recall""".stripMargin),

    "q_sim_ivf" -> e((s, d) => Similarity.simIvf(s, d),
      s"""WITH $embCtes,
         | c AS (SELECT vec_id AS c_id, v AS cv, nm AS cnm FROM n
         |   ORDER BY ${duckH28("'c_'||vec_id")}, vec_id
         |   LIMIT ${Similarity.NumCentroids}),
         | asg AS (SELECT vec_id, v, nm, c_id AS cell FROM (
         |   SELECT n.vec_id, n.v, n.nm, c.c_id,
         |    row_number() OVER (PARTITION BY n.vec_id
         |      ORDER BY list_dot_product(n.v, c.cv)/(n.nm*c.cnm) DESC, c.c_id)
         |      AS c_rk
         |   FROM n CROSS JOIN c) x WHERE c_rk = 1),
         | q AS (SELECT vec_id AS q_id, v AS qv, nm AS qnm, cell FROM asg
         |   WHERE vec_id < ${Similarity.NumQueries}),
         | s AS (SELECT q.q_id, a.vec_id, a.cell,
         |   list_dot_product(q.qv, a.v)/(q.qnm*a.nm) AS cos
         |  FROM q JOIN asg a ON q.cell = a.cell AND a.vec_id != q.q_id),
         | r AS (SELECT q_id, vec_id, cell, cos,
         |   row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rk
         |  FROM s)
         |SELECT q_id, vec_id, cell, CAST(rk AS BIGINT) AS rk, round(cos, 4) AS cos4
         |FROM r WHERE rk <= 3 ORDER BY q_id, rk, vec_id""".stripMargin),

    "q_kmeans_step" -> e((s, d) => Similarity.kmeansStep(s, d),
      s"""WITH $embCtes,
         | c AS (SELECT vec_id AS c_id, v AS cv, nm AS cnm FROM n
         |   ORDER BY ${duckH28("'c_'||vec_id")}, vec_id
         |   LIMIT ${Similarity.NumCentroids}),
         | asg AS (SELECT vec_id, v, cell FROM (
         |   SELECT n.vec_id, n.v, c.c_id AS cell,
         |    row_number() OVER (PARTITION BY n.vec_id
         |      ORDER BY list_dot_product(n.v, c.cv)/(n.nm*c.cnm) DESC, c.c_id)
         |      AS c_rk
         |   FROM n CROSS JOIN c) x WHERE c_rk = 1),
         | px AS (SELECT cell, i AS pos,
         |   CAST(floor(v[i]*${Similarity.KmeansFixedPoint}) AS BIGINT) AS q
         |  FROM asg CROSS JOIN range(1, 65) t(i)),
         | g AS (SELECT cell, pos, count(*) AS n, CAST(sum(q) AS BIGINT) AS sq
         |  FROM px GROUP BY 1, 2)
         |SELECT cell, pos, n, sq,
         | CAST(sq AS DOUBLE)/(n*${Similarity.KmeansFixedPoint}) AS m6
         |FROM g ORDER BY cell, pos""".stripMargin),

    "q_dedup_embed" -> e((s, d) => Similarity.dedupEmbed(s, d),
      s"""WITH $embCtes,
         | $duckBitsCte,
         | nb AS (SELECT vec_id, v, nm, ${duckLshBucketDyn("v")} AS bkt
         |   FROM n CROSS JOIN bi),
         | p AS (SELECT a.vec_id AS a, b.vec_id AS b, a.bkt AS bkt,
         |   list_dot_product(a.v, b.v)/(a.nm*b.nm) AS cos
         |  FROM nb a JOIN nb b ON a.bkt = b.bkt AND a.vec_id < b.vec_id)
         |SELECT a, b, bkt, round(cos, 4) AS cos4 FROM p
         |WHERE cos >= 0.4 ORDER BY a, b""".stripMargin),

    "q_embed_cov" -> e((s, d) => Similarity.embedCov(s, d),
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |   FROM embeddings),
         | u AS (SELECT vec_id, i, v[i] AS xi
         |   FROM e CROSS JOIN range(1, 65) t(i)),
         | pp AS (SELECT a.i AS i, b.i AS j,
         |   CAST(sum(CAST(floor(a.xi * b.xi * 1000000) AS BIGINT))
         |     AS BIGINT) AS spp
         |  FROM u a JOIN u b ON a.vec_id = b.vec_id AND b.i >= a.i
         |  GROUP BY 1, 2),
         | ds AS (SELECT i, count(*) AS n,
         |   CAST(sum(CAST(floor(xi * 1000000) AS BIGINT)) AS BIGINT) AS s
         |  FROM u GROUP BY 1)
         |SELECT CAST(pp.i AS BIGINT) AS i, CAST(pp.j AS BIGINT) AS j, spp,
         | round((CAST(spp AS DOUBLE)/1000000)/di.n
         |   - ((CAST(di.s AS DOUBLE)/1000000)/di.n)
         |     * ((CAST(dj.s AS DOUBLE)/1000000)/dj.n), 6) + 0.0 AS cov6
         |FROM pp JOIN ds di ON pp.i = di.i JOIN ds dj ON pp.j = dj.i
         |ORDER BY i, j, spp, cov6""".stripMargin),

    // Gate-capped form (Similarity.semDedupGated): past SemDedupGateCap
    // vectors both engines run the pipeline on the cap-sized
    // hash-ranked subsample (ns CTE; the Spark side branches
    // identically), deriving adaptive K from the SUBSET count — the
    // oracle's argmax is an N·K = N²/32 cross join and the cap is what
    // keeps sf10-class gates runnable (SCALE_SF1.md). Below the cap
    // (every driver SF and sf1) ns ≡ n and results are bit-identical
    // to the uncapped operator.
    "q_semdedup" -> e((s, d) => Similarity.semDedupGated(s, d),
      s"""WITH $embCtes,
         | ns AS (SELECT vec_id, v, nm FROM (
         |   SELECT vec_id, v, nm, row_number()
         |     OVER (ORDER BY ${duckH28("'g_'||vec_id")}, vec_id) AS grk
         |   FROM n) z WHERE grk <= ${Similarity.SemDedupGateCap}),
         | $duckKCte,
         | c AS (SELECT c_id, cv, cnm FROM (
         |   SELECT vec_id AS c_id, v AS cv, nm AS cnm, row_number()
         |     OVER (ORDER BY ${duckH28("'c_'||vec_id")}, vec_id) AS crk
         |   FROM ns) z CROSS JOIN kc WHERE crk <= kk),
         | asg AS (SELECT vec_id, v, nm, c_id AS cell FROM (
         |   SELECT ns.vec_id, ns.v, ns.nm, c.c_id,
         |    row_number() OVER (PARTITION BY ns.vec_id
         |      ORDER BY list_dot_product(ns.v, c.cv)/(ns.nm*c.cnm) DESC, c.c_id)
         |      AS c_rk
         |   FROM ns CROSS JOIN c) x WHERE c_rk = 1),
         | p AS (SELECT x.cell, x.vec_id AS a, y.vec_id AS b,
         |   list_dot_product(x.v, y.v)/(x.nm*y.nm) AS cos
         |  FROM asg x JOIN asg y ON x.cell = y.cell AND x.vec_id < y.vec_id),
         | g AS (SELECT b AS vec_id, cell, min(a) AS keep_id,
         |   CAST(count(*) AS BIGINT) AS n_near, round(max(cos), 4) AS cos4
         |  FROM p WHERE cos >= ${Similarity.SemDedupCos} GROUP BY 1, 2)
         |SELECT vec_id, cell, keep_id, n_near, cos4
         |FROM g ORDER BY vec_id, cell, keep_id, n_near, cos4""".stripMargin),

    // The two-level (coarse→fine) variant, oracle-gated at every SF:
    // the round-13 assignCellsHier path FORCED at gate scale
    // (HierGateCoarse = 16 so coarse cells are populated and the
    // -ccell-1 fallback branch is reachable). Mirror: coarse sample by
    // h28 rank, coarse argmax (rank-1 over cos desc / c_id), fine
    // sample = h28('c_'||id) < t with t = min(2^28, max(1,
    // 2^28·kk // cnt)) — the same integer arithmetic as the Scala
    // threshold — fine tagged by the same coarse argmax, then the
    // per-coarse-cell fine argmax via LEFT JOIN (no fine centroid in
    // the cell ⇒ the negative fallback block), and the q_semdedup
    // pair/rollup verbatim. Subsample + adaptive-K discipline shared
    // with q_semdedup (ns / kc CTEs), keeping the N·K cross joins
    // bounded at any SF.
    "q_semdedup_hier" -> e((s, d) => Similarity.semDedupHierGated(s, d),
      s"""WITH $embCtes,
         | ns AS (SELECT vec_id, v, nm FROM (
         |   SELECT vec_id, v, nm, row_number()
         |     OVER (ORDER BY ${duckH28("'g_'||vec_id")}, vec_id) AS grk
         |   FROM n) z WHERE grk <= ${Similarity.SemDedupGateCap}),
         | $duckKCte,
         | nc AS (SELECT count(*) AS cnt FROM ns),
         | th AS (SELECT LEAST(CAST(268435456 AS BIGINT), GREATEST(1,
         |     CAST(268435456 AS BIGINT) * kk // GREATEST(cnt, 1))) AS t
         |   FROM kc CROSS JOIN nc),
         | cc AS (SELECT c_id, cv, cnm FROM (
         |   SELECT vec_id AS c_id, v AS cv, nm AS cnm, row_number()
         |     OVER (ORDER BY ${duckH28("'h_'||vec_id")}, vec_id) AS hrk
         |   FROM ns) z WHERE hrk <= ${Similarity.HierGateCoarse}),
         | ca AS (SELECT vec_id, v, nm, c_id AS ccell FROM (
         |   SELECT ns.vec_id, ns.v, ns.nm, cc.c_id,
         |    row_number() OVER (PARTITION BY ns.vec_id
         |      ORDER BY list_dot_product(ns.v, cc.cv)/(ns.nm*cc.cnm) DESC,
         |        cc.c_id) AS crk
         |   FROM ns CROSS JOIN cc) x WHERE crk = 1),
         | f AS (SELECT vec_id, v, nm FROM ns CROSS JOIN th
         |   WHERE ${duckH28("'c_'||vec_id")} < t),
         | fa AS (SELECT vec_id AS f_id, v AS fv, nm AS fnm, c_id AS ccell
         |  FROM (
         |   SELECT f.vec_id, f.v, f.nm, cc.c_id,
         |    row_number() OVER (PARTITION BY f.vec_id
         |      ORDER BY list_dot_product(f.v, cc.cv)/(f.nm*cc.cnm) DESC,
         |        cc.c_id) AS frk
         |   FROM f CROSS JOIN cc) x WHERE frk = 1),
         | asg AS (SELECT vec_id, v, nm,
         |    coalesce(f_id, -ccell - 1) AS cell FROM (
         |   SELECT ca.vec_id, ca.v, ca.nm, ca.ccell, fa.f_id,
         |    row_number() OVER (PARTITION BY ca.vec_id
         |      ORDER BY list_dot_product(ca.v, fa.fv)/(ca.nm*fa.fnm) DESC,
         |        fa.f_id) AS ark
         |   FROM ca LEFT JOIN fa ON ca.ccell = fa.ccell) x WHERE ark = 1),
         | p AS (SELECT x.cell, x.vec_id AS a, y.vec_id AS b,
         |   list_dot_product(x.v, y.v)/(x.nm*y.nm) AS cos
         |  FROM asg x JOIN asg y ON x.cell = y.cell AND x.vec_id < y.vec_id),
         | g AS (SELECT b AS vec_id, cell, min(a) AS keep_id,
         |   CAST(count(*) AS BIGINT) AS n_near, round(max(cos), 4) AS cos4
         |  FROM p WHERE cos >= ${Similarity.SemDedupCos} GROUP BY 1, 2)
         |SELECT vec_id, cell, keep_id, n_near, cos4
         |FROM g ORDER BY vec_id, cell, keep_id, n_near, cos4""".stripMargin),

    "q_vocab_build" -> e(TextOps.vocabBuild,
      s"""WITH u AS (SELECT unnest(string_split(text,' ')) AS tok FROM documents),
         | g AS (SELECT tok, count(*) AS c FROM u GROUP BY 1),
         | tt AS (SELECT CAST(sum(c) AS BIGINT) AS tt FROM g),
         | r AS (SELECT tok, c, row_number() OVER (ORDER BY c DESC, tok) AS rk
         |  FROM g),
         | k AS (SELECT rk, tok, c FROM r WHERE rk <= ${TextOps.VocabSize}),
         | cm AS (SELECT rk, tok, c,
         |   CAST(sum(c) OVER (ORDER BY rk) AS BIGINT) AS cum_c FROM k)
         |SELECT CAST(rk AS BIGINT) AS rk, tok, CAST(c AS BIGINT) AS c, cum_c,
         | CAST(cum_c AS DOUBLE)/tt AS coverage
         |FROM cm CROSS JOIN tt ORDER BY rk""".stripMargin),

    "q_top_ngrams" -> e(TextOps.topNgrams,
      s"""WITH $toksCte,
         | b AS (SELECT doc_id, unnest($duckBigrams) AS bg FROM t),
         | g AS (SELECT bg, count(*) AS c, count(DISTINCT doc_id) AS n_docs
         |  FROM b GROUP BY 1),
         | r AS (SELECT bg, c, n_docs,
         |   row_number() OVER (ORDER BY c DESC, bg) AS rk FROM g)
         |SELECT CAST(rk AS BIGINT) AS rk, bg, CAST(c AS BIGINT) AS c,
         | CAST(n_docs AS BIGINT) AS n_docs
         |FROM r WHERE rk <= ${TextOps.TopNgrams} ORDER BY rk""".stripMargin),

    "q_topic_terms" -> e(TextOps.topicTerms,
      s"""WITH tt AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok
         |  FROM documents),
         | dt AS (SELECT doc_id, tok, count(*) AS lc FROM tt GROUP BY 1, 2),
         | src AS (SELECT doc_id, source FROM documents),
         | st AS (SELECT source, tok, CAST(sum(lc) AS BIGINT) AS n
         |  FROM dt JOIN src USING (doc_id) GROUP BY 1, 2),
         | stot AS (SELECT source, CAST(sum(n) AS BIGINT) AS tot
         |  FROM st GROUP BY 1),
         | ct AS (SELECT tok, CAST(sum(lc) AS BIGINT) AS cn
         |  FROM dt GROUP BY 1),
         | ctot AS (SELECT CAST(sum(lc) AS BIGINT) AS ctot FROM dt),
         | j AS (SELECT st.source, st.tok,
         |-- HUGEINT widening mirrors the Spark decimal(38,0) products
         |   CAST(CAST(n AS HUGEINT) * 1000000 // tot AS BIGINT) AS src_ppm,
         |   CAST(CAST(cn AS HUGEINT) * 1000000 // ctot AS BIGINT)
         |     AS corpus_ppm
         |  FROM st JOIN stot USING (source) JOIN ct USING (tok)
         |  CROSS JOIN ctot),
         | r AS (SELECT source, tok, src_ppm, corpus_ppm,
         |   src_ppm - corpus_ppm AS lift_ppm,
         |   row_number() OVER (PARTITION BY source
         |     ORDER BY src_ppm - corpus_ppm DESC, tok) AS rk FROM j)
         |SELECT source, CAST(rk AS BIGINT) AS rk, tok,
         | CAST(src_ppm AS BIGINT) AS src_ppm,
         | CAST(corpus_ppm AS BIGINT) AS corpus_ppm,
         | CAST(lift_ppm AS BIGINT) AS lift_ppm
         |FROM r WHERE rk <= ${TextOps.TopicTermsK}
         |ORDER BY source, rk""".stripMargin),

    "q_band_collisions" -> e(TextOps.bandCollisions, {
      val bandSel = (0 until TextOps.Bands).map { b =>
        s"SELECT doc_id, $b AS band, " +
          s"concat_ws('_', h${3 * b}, h${3 * b + 1}, h${3 * b + 2}) AS bsig " +
          "FROM sig"
      }.mkString(" UNION ALL ")
      s"""WITH $sigCtes,
         | bands AS ($bandSel),
         | bk AS (SELECT band, bsig, CAST(count(*) AS BIGINT) AS bsz
         |  FROM bands GROUP BY 1, 2)
         |SELECT CAST(band AS BIGINT) AS band,
         | CAST(count(*) AS BIGINT) AS n_buckets, max(bsz) AS max_bucket,
         | CAST(sum(CASE WHEN bsz > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_colliding,
         | CAST(sum(bsz * (bsz - 1) // 2) AS BIGINT) AS n_cand_pairs
         |FROM bk GROUP BY band ORDER BY band""".stripMargin
    }),

    "q_char_classes" -> e(TextOps.charClasses,
      """WITH c AS (SELECT source,
        |   len(regexp_extract_all(text, '[a-zA-Z]')) AS a,
        |   len(regexp_extract_all(text, '[0-9]')) AS dg,
        |   len(regexp_extract_all(text, ' ')) AS sp,
        |   len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS ot
        |  FROM documents),
        | g AS (SELECT source, CAST(sum(a) AS BIGINT) AS n_alpha,
        |   CAST(sum(dg) AS BIGINT) AS n_digit,
        |   CAST(sum(sp) AS BIGINT) AS n_space,
        |   CAST(sum(ot) AS BIGINT) AS n_other
        |  FROM c GROUP BY 1),
        | t AS (SELECT *, n_alpha + n_digit + n_space + n_other AS tot
        |  FROM g)
        |SELECT source, n_alpha, n_digit, n_space, n_other,
        |-- HUGEINT widening mirrors the Spark decimal(38,0) products
        | CASE WHEN tot > 0 THEN CAST(CAST(n_alpha AS HUGEINT) * 1000000
        |   // tot AS BIGINT) END AS alpha_ppm,
        | CASE WHEN tot > 0 THEN CAST(CAST(n_other AS HUGEINT) * 1000000
        |   // tot AS BIGINT) END AS other_ppm
        |FROM t ORDER BY source""".stripMargin),

    "q_bigram_lm" -> e(TextOps.bigramLm,
      s"""WITH $toksCte,
         | b AS (SELECT unnest($duckBigrams) AS bg FROM t),
         | hx AS (SELECT string_split(bg, ' ')[1] AS head,
         |   string_split(bg, ' ')[2] AS nxt FROM b),
         | bc AS (SELECT head, nxt, CAST(count(*) AS BIGINT) AS n
         |  FROM hx GROUP BY 1, 2),
         | ht AS (SELECT head, CAST(sum(n) AS BIGINT) AS htot
         |  FROM bc GROUP BY 1),
         | hr AS (SELECT head, htot,
         |   row_number() OVER (ORDER BY htot DESC, head) AS hrk FROM ht),
         | top AS (SELECT head, htot FROM hr
         |  WHERE hrk <= ${TextOps.BigramLmHeads}),
         | r AS (SELECT bc.head, nxt, n, htot,
         |   row_number() OVER (PARTITION BY bc.head
         |     ORDER BY n DESC, nxt) AS rk
         |  FROM bc JOIN top ON bc.head = top.head)
         |SELECT head, CAST(rk AS BIGINT) AS rk, nxt, n, htot,
         |-- HUGEINT widening mirrors the Spark decimal(38,0) product
         | CAST(CAST(n AS HUGEINT) * 1000000 // htot AS BIGINT) AS cond_ppm
         |FROM r WHERE rk <= ${TextOps.BigramLmK}
         |ORDER BY head, rk""".stripMargin),

    "q_inverted_index" -> e(TextOps.invertedIndex,
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok
         |  FROM documents),
         | dt AS (SELECT doc_id, tok, count(*) AS lc FROM t GROUP BY 1, 2),
         | stats AS (SELECT tok, CAST(count(*) AS BIGINT) AS df,
         |   CAST(sum(lc) AS BIGINT) AS cf FROM dt GROUP BY 1),
         | r AS (SELECT tok, doc_id,
         |   row_number() OVER (PARTITION BY tok ORDER BY doc_id) AS rk
         |  FROM dt),
         | heads AS (SELECT tok,
         |   string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
         |     AS postings
         |  FROM r WHERE rk <= ${TextOps.PostingsCap} GROUP BY 1)
         |SELECT tok, df, cf, postings
         |FROM stats JOIN heads USING (tok) ORDER BY tok""".stripMargin),

    "q_cooccur" -> e(TextOps.cooccur,
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok
         |  FROM documents),
         | dt AS (SELECT DISTINCT doc_id, tok FROM t),
         | dfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df
         |  FROM dt GROUP BY 1),
         | topt AS (SELECT tok, df FROM dfq
         |  ORDER BY df DESC, tok LIMIT ${TextOps.CooccurTop}),
         | nd AS (SELECT count(*) AS n_docs FROM documents),
         | dtop AS (SELECT dt.doc_id, dt.tok, topt.df
         |  FROM dt JOIN topt USING (tok)),
         | co AS (SELECT a.tok AS x, b.tok AS y, a.df AS df_x, b.df AS df_y,
         |   CAST(count(*) AS BIGINT) AS n_xy
         |  FROM dtop a JOIN dtop b
         |    ON a.doc_id = b.doc_id AND a.tok < b.tok
         |  GROUP BY 1, 2, 3, 4)
         |SELECT x, y, n_xy, df_x, df_y,
         | round(CAST(n_xy AS DOUBLE) * n_docs / (df_x * df_y), 6) AS lift6
         |FROM co CROSS JOIN nd
         |ORDER BY n_xy DESC, x, y""".stripMargin),

    "q_pagerank" -> e(TextOps.pagerankDup, {
      // fixed 3 unrolled rounds over the near-dup edge list — integer
      // fixed-point mirror of Components.pagerank (ppm, 17/20 damping,
      // floor division on both engines)
      def round_(prev: String, next: String) =
        s"""$next AS (SELECT adj.dst AS node,
           |   150000 + sum(($prev.pr * 17) // (20 * adj.deg)) AS pr
           |  FROM adj JOIN $prev ON $prev.node = adj.src GROUP BY 1)"""
          .stripMargin
      // ed MATERIALIZED: referenced (transitively) by every unrolled
      // round — inlined, DuckDB re-evaluates the whole shingle+band
      // pipeline per reference, which OOM'd the 10x sweep; the edge
      // list itself is tiny
      s"""WITH $ngramPairCtes,
         | ed AS MATERIALIZED (SELECT a, b FROM p
         |   WHERE jacc >= ${TextOps.NearDupJaccard}),
         | e AS (SELECT a AS src, b AS dst FROM ed
         |   UNION ALL SELECT b AS src, a AS dst FROM ed),
         | dg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
         |  FROM e GROUP BY 1),
         | adj AS (SELECT e.src, e.dst, dg.deg FROM e JOIN dg USING (src)),
         | pg0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS pr FROM dg),
         | ${round_("pg0", "pg1")},
         | ${round_("pg1", "pg2")},
         | ${round_("pg2", "pg3")}
         |SELECT dg.src AS doc_id, dg.deg, CAST(pg3.pr AS BIGINT) AS pr
         |FROM dg JOIN pg3 ON pg3.node = dg.src
         |ORDER BY pr DESC, doc_id""".stripMargin
    }),

    "q_triangles" -> e(TextOps.trianglesDup,
      // id-ordered wedge + closing-edge semi join, 3-corner unnest for
      // per-node counts; coef6 is exact integer fixed-point (2T·10⁶
      // floor-divided by deg·(deg−1)) — Components.triangles' mirror
      s"""WITH $ngramPairCtes,
         | ed AS MATERIALIZED (SELECT a, b FROM p
         |   WHERE jacc >= ${TextOps.NearDupJaccard}),
         | wd AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |   FROM ed e1 JOIN ed e2 ON e1.b = e2.a),
         | tri AS (SELECT x, y, z FROM wd WHERE EXISTS
         |   (SELECT 1 FROM ed WHERE ed.a = wd.x AND ed.b = wd.z)),
         | cn AS (SELECT unnest([x, y, z]) AS node FROM tri),
         | ct AS (SELECT node, CAST(count(*) AS BIGINT) AS n_tri
         |   FROM cn GROUP BY 1),
         | sm AS (SELECT a AS node FROM ed UNION ALL SELECT b AS node FROM ed),
         | dg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
         |   FROM sm GROUP BY 1)
         |SELECT dg.node AS doc_id, dg.deg,
         | CAST(COALESCE(ct.n_tri, 0) AS BIGINT) AS n_tri,
         | CAST(CASE WHEN dg.deg >= 2
         |   THEN (COALESCE(ct.n_tri, 0) * ${2 * Components.TriScale})
         |     // (dg.deg * (dg.deg - 1))
         |   ELSE 0 END AS BIGINT) AS coef6
         |FROM dg LEFT JOIN ct USING (node)
         |ORDER BY doc_id, deg, n_tri, coef6""".stripMargin),

    "q_ngram_novelty" -> e(TextOps.ngramNovelty,
      s"""WITH $toksCte,
         | b AS (SELECT doc_id, unnest($duckBigrams) AS bg FROM t),
         | dg AS (SELECT doc_id, ${duckH28("bg")} AS bgh,
         |   CAST(count(*) AS BIGINT) AS lc FROM b GROUP BY 1, 2),
         | g AS (SELECT bgh, CAST(sum(lc) AS BIGINT) AS c FROM dg GROUP BY 1),
         | tt AS (SELECT CAST(sum(c) AS BIGINT) AS t, count(*) AS dbg FROM g),
         | pd AS (SELECT doc_id, CAST(sum(lc) AS BIGINT) AS n_big,
         |   CAST(sum(lc * c) AS BIGINT) AS sum_freq
         |  FROM dg JOIN g USING (bgh) GROUP BY 1)
         |SELECT doc_id, CAST(n_big AS BIGINT) AS n_big, sum_freq,
         | CAST(sum_freq AS DOUBLE)/n_big AS fam,
         | (CAST(sum_freq AS DOUBLE)/n_big) * (CAST(dbg AS DOUBLE)/t) AS lift,
         | CASE WHEN (CAST(sum_freq AS DOUBLE)/n_big) * (CAST(dbg AS DOUBLE)/t)
         |   >= 1.0 THEN 'common' ELSE 'novel' END AS grade
         |FROM pd CROSS JOIN tt ORDER BY doc_id""".stripMargin),

    "q_dataset_diff" -> e(TextOps.datasetDiffQ,
      """WITH cur AS (SELECT doc_id, md5(text) AS csig FROM documents),
        | prev0 AS (SELECT doc_id,
        |   md5(CASE WHEN doc_id % 13 = 5 THEN text || ' v2' ELSE text END)
        |     AS psig
        |  FROM documents WHERE doc_id % 17 != 3),
        | prevx AS (SELECT doc_id + 10000000 AS doc_id, md5(text) AS psig
        |  FROM documents WHERE doc_id % 19 = 7),
        | prev AS (SELECT * FROM prev0 UNION ALL SELECT * FROM prevx),
        | j AS (SELECT csig, psig
        |  FROM cur c FULL OUTER JOIN prev p ON c.doc_id = p.doc_id)
        |SELECT CASE WHEN psig IS NULL THEN 'added'
        |  WHEN csig IS NULL THEN 'removed'
        |  WHEN csig != psig THEN 'changed' ELSE 'same' END AS status,
        | count(*) AS n
        |FROM j GROUP BY 1 ORDER BY status""".stripMargin),

    "q_dataset_card" -> e(TextOps.datasetCard,
      """SELECT count(*) AS n_docs,
        | count(DISTINCT source) AS n_sources,
        | count(DISTINCT lang) AS n_langs,
        | CAST(sum(n_chars) AS BIGINT) AS total_chars,
        | CAST(sum(len(string_split(text,' '))) AS BIGINT) AS total_tok,
        | count(DISTINCT md5(lower(trim(text)))) AS n_uniq_texts,
        | CAST(count(*) - count(DISTINCT md5(lower(trim(text)))) AS DOUBLE)
        |   / count(*) AS dup_frac,
        | CAST(sum(len(string_split(text,' '))) AS DOUBLE)/count(*) AS avg_tok
        |FROM documents""".stripMargin),

    "q_pii_scrub" -> e(TextOps.piiScrub, {
      // single-sourced pattern: the Scala literal already reads
      // \b(...)\b, and DuckDB string literals pass backslashes through
      val p = TextOps.ScrubPattern
      s"""SELECT doc_id,
         | CAST(len(regexp_extract_all(text, '$p')) AS BIGINT) AS n_hits,
         | CAST(length(regexp_replace(text, '$p', '<X>', 'g')) AS BIGINT)
         |   AS scrub_len,
         | md5(regexp_replace(text, '$p', '<X>', 'g')) AS sig
         |FROM documents ORDER BY doc_id""".stripMargin
    }),

    "q_quality_sample" -> e(TextOps.qualitySample, {
      val rateCase = "CASE grade " + TextOps.QsRates.map {
        case (g, r) => s"WHEN '$g' THEN $r"
      }.mkString(" ") + " END"
      val keep = s"${duckH28("'qs_'||doc_id")} % ${TextOps.QsPpm} < rate_ppm"
      s"""WITH u AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok
         |   FROM documents),
         | g AS (SELECT doc_id, count(*) AS n_tok, count(DISTINCT tok) AS n_uniq
         |  FROM u GROUP BY 1),
         | f AS (SELECT doc_id, n_tok,
         |   ${TextOps.duckGrade("n_tok", "n_uniq")} AS grade
         |  FROM g),
         | r AS (SELECT doc_id, n_tok, grade, $rateCase AS rate_ppm FROM f)
         |SELECT grade, count(*) AS n_total,
         | CAST(min(rate_ppm) AS BIGINT) AS rate_ppm,
         | CAST(sum(CASE WHEN $keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         | CAST(sum(CASE WHEN $keep THEN n_tok ELSE 0 END) AS BIGINT)
         |   AS kept_tok
         |FROM r GROUP BY 1 ORDER BY grade""".stripMargin
    }),

    "q_bpe_step" -> e(TextOps.bpeStep,
      s"""WITH u AS (SELECT unnest(string_split(text,' ')) AS tok
         |   FROM documents),
         | g AS (SELECT tok, count(*) AS f FROM u GROUP BY 1),
         | cs AS (SELECT f, string_split(tok, '') AS ch FROM g),
         | p AS (SELECT f, unnest(list_transform(
         |     range(1, greatest(len(ch)-1,0)+1),
         |     i -> ch[i]||ch[i+1])) AS pair FROM cs),
         | a AS (SELECT pair, CAST(sum(f) AS BIGINT) AS c FROM p GROUP BY 1),
         | r AS (SELECT pair, c,
         |   row_number() OVER (ORDER BY c DESC, pair) AS rk FROM a)
         |SELECT CAST(rk AS BIGINT) AS rk, pair, c
         |FROM r WHERE rk <= ${TextOps.BpeTopPairs} ORDER BY rk""".stripMargin),

    "q_export_shards" -> e(TextOps.exportShardStats, {
      val h = duckH28("'shard_'||doc_id")
      s"""WITH a AS (SELECT doc_id, $h % ${TextOps.NumShards} AS shard,
         |   len(string_split(text,' ')) AS n_tok FROM documents)
         |SELECT shard, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT)
         |   AS total_tok,
         | min(doc_id) AS min_doc, max(doc_id) AS max_doc
         |FROM a GROUP BY 1 ORDER BY shard""".stripMargin
    }),

    "q_int8_quant" -> e((s, d) => Similarity.int8Quant(s, d),
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |   FROM embeddings),
         | px AS (SELECT vec_id, i AS pos, v[i] AS xv
         |  FROM e CROSS JOIN range(1, 65) t(i)),
         | dm AS (SELECT pos, min(xv) AS mn, max(xv) AS mx FROM px GROUP BY 1),
         | c AS (SELECT vec_id, xv, mn, mx,
         |   CASE WHEN mx > mn THEN least(255,
         |     CAST(floor((xv - mn) * 255.0 / (mx - mn)) AS BIGINT))
         |   ELSE 0 END AS code
         |  FROM px JOIN dm USING (pos)),
         | er AS (SELECT vec_id, code,
         |   CAST(floor(abs(xv - (mn + code * (mx - mn) / 255))
         |     * ${Similarity.KmeansFixedPoint}) AS BIGINT) AS err6
         |  FROM c)
         |SELECT vec_id, CAST(sum(code) AS BIGINT) AS code_sum,
         | CAST(sum(err6) AS BIGINT) AS err6_sum
         |FROM er GROUP BY 1 ORDER BY vec_id""".stripMargin),

    "q_dim_stats" -> e((s, d) => Similarity.dimStats(s, d),
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |   FROM embeddings),
         | px AS (SELECT i AS pos, v[i] AS xv,
         |   CAST(floor(v[i]*${Similarity.KmeansFixedPoint}) AS BIGINT) AS q
         |  FROM e CROSS JOIN range(1, 65) t(i))
         |SELECT pos, count(*) AS n, CAST(sum(q) AS BIGINT) AS sq,
         | min(xv) AS mn, max(xv) AS mx,
         | CAST(sum(q) AS DOUBLE)/(count(*)*${Similarity.KmeansFixedPoint}) AS m6
         |FROM px GROUP BY 1 ORDER BY pos""".stripMargin),

    "q_winsorize" -> e(TextOps.winsorize,
      """WITH q AS (SELECT source,
        |   CAST(floor(quantile_cont(n_chars, 0.05)) AS BIGINT) AS p05,
        |   CAST(floor(quantile_cont(n_chars, 0.95)) AS BIGINT) AS p95
        |  FROM documents GROUP BY 1)
        |SELECT d.source, count(*) AS n_docs, min(p05) AS p05,
        | min(p95) AS p95,
        | CAST(sum(n_chars) AS BIGINT) // count(*) AS mean_raw,
        | CAST(sum(least(greatest(n_chars, p05), p95)) AS BIGINT)
        |   // count(*) AS mean_win
        |FROM documents d JOIN q USING (source)
        |GROUP BY d.source
        |ORDER BY source, n_docs, p05, p95, mean_raw, mean_win""".stripMargin),

    "q_ks_drift" -> e(TextOps.ksDrift,
      """WITH a AS (SELECT n_chars AS v, count(*) AS c1 FROM documents
        |  WHERE source = 'src0' GROUP BY 1),
        | b AS (SELECT n_chars AS v, count(*) AS c2 FROM documents
        |  WHERE source = 'src1' GROUP BY 1),
        | p AS (SELECT COALESCE(a.v, b.v) AS v, COALESCE(c1, 0) AS c1,
        |   COALESCE(c2, 0) AS c2 FROM a FULL OUTER JOIN b ON a.v = b.v),
        | c AS (SELECT v,
        |   sum(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |     AND CURRENT ROW) AS f1,
        |   sum(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |     AND CURRENT ROW) AS f2
        |  FROM p),
        | t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |   CAST(sum(c2) AS BIGINT) AS n2 FROM p)
        |SELECT n1, n2,
        | CAST(abs(f1 * 1000000 // n1 - f2 * 1000000 // n2) AS BIGINT)
        |   AS d_ppm, v
        |FROM c CROSS JOIN t
        |ORDER BY d_ppm DESC, v LIMIT 1""".stripMargin),

    "q_quantile_bins" -> e(TextOps.quantileBins,
      """SELECT source, CAST(bin AS BIGINT) AS bin,
        | count(*) AS n_docs, min(n_chars) AS lo, max(n_chars) AS hi,
        | CAST(sum(n_chars) AS BIGINT) AS tot_chars
        |FROM (SELECT source, n_chars, ntile(10) OVER (
        |   PARTITION BY source ORDER BY n_chars, doc_id) AS bin
        |  FROM documents) b
        |GROUP BY 1, 2
        |ORDER BY source, bin, n_docs, lo, hi, tot_chars""".stripMargin),

    "q_psi_drift" -> e(TextOps.psiDrift, {
      // per-term floor quantization BEFORE the per-source sum (exact
      // integer aggregate); associativity mirrors the Spark side:
      // ((p−q)·ln(p/q))·scale
      val w = TextOps.PsiBinWidth; val k = TextOps.PsiBins
      val pSql = s"(c + 1.0) / (ns + $k)"
      val qSql = s"(ct - c + 1.0) / (n - ns + $k)"
      s"""WITH b AS (SELECT source, least(${k - 1}, n_chars // $w) AS bin
         |  FROM documents),
         | per AS (SELECT source, bin, CAST(count(*) AS BIGINT) AS c
         |  FROM b GROUP BY 1, 2),
         | tot AS (SELECT bin, CAST(count(*) AS BIGINT) AS ct
         |  FROM b GROUP BY 1),
         | ns AS (SELECT source, CAST(count(*) AS BIGINT) AS ns
         |  FROM b GROUP BY 1),
         | nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
         | bins AS (SELECT range AS bin FROM range($k)),
         | g AS (SELECT ns.source, ns.ns, bins.bin, nn.n,
         |    COALESCE(per.c, 0) AS c, COALESCE(tot.ct, 0) AS ct
         |   FROM ns CROSS JOIN bins
         |   LEFT JOIN per ON per.source = ns.source AND per.bin = bins.bin
         |   LEFT JOIN tot ON tot.bin = bins.bin
         |   CROSS JOIN nn),
         | t AS (SELECT source, ns,
         |    CAST(floor((($pSql - $qSql) * ln(($pSql) / ($qSql)))
         |      * ${TextOps.PsiScale}.0) AS BIGINT) AS t6
         |   FROM g)
         |SELECT source, ns AS n_docs, CAST(sum(t6) AS BIGINT) AS psi6
         |FROM t GROUP BY 1, 2 ORDER BY source, n_docs, psi6""".stripMargin
    }),

    "q_token_entropy" -> e(TextOps.tokenEntropy,
      s"""WITH u AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok
         |  FROM documents),
         | dt AS (SELECT doc_id, tok, count(*) AS lc FROM u GROUP BY 1, 2),
         | dn AS (SELECT doc_id, sum(lc) AS n FROM dt GROUP BY 1),
         | q AS (SELECT doc_id, n,
         |   CAST(floor(lc * log2(CAST(n AS DOUBLE)/lc)
         |     * ${TextOps.SurprisalScale}) AS BIGINT) AS mb
         |  FROM dt JOIN dn USING (doc_id)),
         | g AS (SELECT doc_id, CAST(max(n) AS BIGINT) AS n_tok,
         |   CAST(sum(mb) AS BIGINT) AS ent_mb FROM q GROUP BY 1)
         |SELECT doc_id, n_tok, ent_mb, ent_mb // n_tok AS mb_tok
         |FROM g ORDER BY doc_id, n_tok, ent_mb, mb_tok""".stripMargin),

    "q_embed_norm" -> e((s, d) => Similarity.embedNorm(s, d),
      s"""WITH x AS (SELECT vec_id, label, unnest(CAST(embedding AS DOUBLE[])) AS v
         |  FROM embeddings),
         | sv AS (SELECT vec_id, label,
         |   CAST(sum(CAST(floor(v * v * ${Similarity.NormFixedPoint}.0)
         |     AS BIGINT)) AS BIGINT) AS sfp
         |  FROM x GROUP BY 1, 2),
         | nr AS (SELECT label,
         |   CAST(floor(sqrt(CAST(sfp AS DOUBLE))) AS BIGINT) AS norm_fp
         |  FROM sv)
         |SELECT label, count(*) AS n_vec, min(norm_fp) AS min_n,
         | max(norm_fp) AS max_n, CAST(sum(norm_fp) AS BIGINT) AS sum_n,
         | CAST(sum(norm_fp) AS BIGINT) // count(*) AS avg_n
         |FROM nr GROUP BY label
         |ORDER BY label, n_vec, min_n, max_n, sum_n, avg_n""".stripMargin),

    "q_hll_distinct" -> e(TextOps.hllDistinct,
      s"""WITH u AS (SELECT DISTINCT source, tok FROM (
         |   SELECT source, unnest(string_split(text,' ')) AS tok
         |   FROM documents)),
         | h AS (SELECT source, ${duckH28("tok")} AS hv FROM u),
         | r AS (SELECT source, hv % 64 AS reg, hv // 64 AS rem FROM h),
         | rk AS (SELECT source, reg, CASE WHEN rem = 0 THEN 23
         |    ELSE 23 - length(bin(rem)) END AS lz FROM r),
         | m AS (SELECT source, reg, max(lz) AS maxr FROM rk GROUP BY 1, 2),
         | a AS (SELECT source, count(*) AS n_regs,
         |   CAST(sum(1 << (23 - maxr)) AS BIGINT) AS hit_sum
         |  FROM m GROUP BY 1),
         | ex AS (SELECT source, count(*) AS exact_distinct
         |  FROM u GROUP BY 1)
         |SELECT a.source, n_regs,
         | CAST(hit_sum + (64 - n_regs) * 8388608 AS BIGINT) AS reg_sum,
         | 0.709e0 * 4096e0 * 8388608e0 /
         |   CAST(hit_sum + (64 - n_regs) * 8388608 AS DOUBLE)
         |   AS est_distinct,
         | exact_distinct
         |FROM a JOIN ex USING (source) ORDER BY source""".stripMargin),

    "q_src_jaccard" -> e(TextOps.srcJaccard,
      """WITH u AS (SELECT DISTINCT source, tok FROM (
        |   SELECT source, unnest(string_split(text,' ')) AS tok
        |   FROM documents)),
        | sz AS (SELECT source, count(*) AS n FROM u GROUP BY 1),
        | grid AS (SELECT x.source AS src_a, y.source AS src_b,
        |    x.n AS n_a, y.n AS n_b
        |   FROM sz x JOIN sz y ON x.source < y.source),
        | i AS (SELECT a.source AS src_a, b.source AS src_b,
        |    count(*) AS n_inter
        |   FROM u a JOIN u b
        |     ON a.tok = b.tok AND a.source < b.source GROUP BY 1, 2)
        |SELECT g.src_a, g.src_b, g.n_a, g.n_b,
        | CAST(coalesce(i.n_inter, 0) AS BIGINT) AS n_inter,
        |-- HUGEINT widening mirrors the Spark decimal(38,0) product
        | CAST(CAST(coalesce(i.n_inter, 0) AS HUGEINT) * 1000000
        |   // (g.n_a + g.n_b - coalesce(i.n_inter, 0)) AS BIGINT)
        |   AS jacc_ppm
        |FROM grid g LEFT JOIN i USING (src_a, src_b)
        |ORDER BY src_a, src_b""".stripMargin),

    "q_len_zscore" -> e(TextOps.lenZscore,
      s"""WITH t AS (SELECT doc_id, source,
        |   CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |-- HUGEINT moments mirror the Spark decimal(38,0) widening
        |-- (s1/s2/dd/varn are internal CTE columns, never outputs);
        |-- z_micro is PortableMath's exact-isqrt fixed point — no
        |-- output rides the HUGEINT→DOUBLE cast
        | g AS (SELECT source, count(*) AS n,
        |   CAST(sum(n_tok) AS BIGINT) AS s1,
        |   sum(CAST(n_tok AS HUGEINT)*n_tok) AS s2 FROM t GROUP BY 1),
        | j AS (SELECT t.doc_id, t.source, t.n_tok,
        |   CAST(t.n_tok AS HUGEINT)*g.n - g.s1 AS dd,
        |   g.n*g.s2 - CAST(g.s1 AS HUGEINT)*g.s1 AS varn
        |  FROM t JOIN g USING (source)),
        | f AS (SELECT * FROM j WHERE varn > 0 AND 4*dd*dd >= 9*varn),
        | q AS (SELECT doc_id, source, n_tok, dd,
        |   CAST((dd * dd * 1000000) // varn AS HUGEINT) * 1000000
        |     AS t6 FROM f),
        | es AS (SELECT *,
        |   ${PortableMath.isqrtEstimate("t6", "HUGEINT")} AS r0 FROM q)
        |SELECT doc_id, source, n_tok,
        | CAST((CASE WHEN dd < 0 THEN -1 ELSE 1 END) *
        |   ${PortableMath.isqrtAdjust("r0", "t6")} AS BIGINT) AS z_micro
        |FROM es ORDER BY doc_id, source""".stripMargin),

    "q_centroid_margin" -> e((s, d) => Similarity.centroidMargin(s, d),
      s"""WITH ee AS (SELECT vec_id, label,
         |   CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |  WHERE label IS NOT NULL),
         | px AS (SELECT vec_id, label, i AS pos, v[i] AS xv
         |  FROM ee CROSS JOIN range(1, 65) t(i)),
         | c AS (SELECT label, pos, count(*) AS n,
         |   CAST(sum(CAST(floor(xv*${Similarity.KmeansFixedPoint})
         |     AS BIGINT)) AS DOUBLE)
         |    / (count(*)*${Similarity.KmeansFixedPoint}) AS m
         |  FROM px GROUP BY 1, 2),
         | pr AS (SELECT a.label AS label_a, b.label AS label_b,
         |   CAST(floor((a.m - b.m)*(a.m - b.m)*1000000e0) AS BIGINT) AS t
         |  FROM c a JOIN c b ON a.pos = b.pos AND a.label < b.label),
         | m2 AS (SELECT label_a, label_b, CAST(sum(t) AS BIGINT) AS d2_u
         |  FROM pr GROUP BY 1, 2),
         | rt AS (SELECT px.vec_id, px.label,
         |   CAST(sum(CAST(floor((px.xv - c.m)*(px.xv - c.m)*1000000e0)
         |     AS BIGINT)) AS BIGINT) AS r2_u
         |  FROM px JOIN c ON px.label = c.label AND px.pos = c.pos
         |  GROUP BY 1, 2),
         | rl AS (SELECT label, count(*) AS n_vec,
         |   CAST(sum(r2_u) AS BIGINT) // count(*) AS r2_u
         |  FROM rt GROUP BY 1)
         |SELECT label_a, label_b, d2_u, ra.r2_u AS r2a_u,
         | rb.r2_u AS r2b_u,
         | d2_u * 1000000 // (ra.r2_u + rb.r2_u + 1) AS sep_ppm
         |FROM m2 JOIN rl ra ON m2.label_a = ra.label
         | JOIN rl rb ON m2.label_b = rb.label
         |ORDER BY 1, 2""".stripMargin),

    "q_label_confusion" -> e((s, d) => Similarity.labelConfusion(s, d),
      s"""WITH ee AS (SELECT vec_id, label,
         |   CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |  WHERE label IS NOT NULL),
         | px AS (SELECT vec_id, label, i AS pos, v[i] AS xv
         |  FROM ee CROSS JOIN range(1, 65) t(i)),
         | c AS (SELECT label, pos,
         |   CAST(sum(CAST(floor(xv*${Similarity.KmeansFixedPoint})
         |     AS BIGINT)) AS DOUBLE)
         |    / (count(*)*${Similarity.KmeansFixedPoint}) AS m
         |  FROM px GROUP BY 1, 2),
         | dd AS (SELECT px.vec_id, px.label, c.label AS cl,
         |   CAST(sum(CAST(floor((px.xv - c.m)*(px.xv - c.m)*1000000e0)
         |     AS BIGINT)) AS BIGINT) AS d2_u
         |  FROM px JOIN c ON px.pos = c.pos GROUP BY 1, 2, 3),
         | pk AS (SELECT vec_id, label, cl, row_number() OVER (
         |    PARTITION BY vec_id ORDER BY d2_u, cl) AS rn FROM dd)
         |SELECT label, cl AS pred, count(*) AS n_vec
         |FROM pk WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    "q_weighted_sample" -> e(TextOps.weightedSample, {
      val h = duckH28("'ws_'||doc_id")
      s"""WITH t AS (SELECT doc_id, source,
         |   CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok
         |  FROM documents)
         |SELECT doc_id, source, n_tok,
         | CAST(floor(-1000000e0 * ln(($h + 1) / 268435456e0) / n_tok)
         |   AS BIGINT) AS key_fp
         |FROM t ORDER BY key_fp, doc_id
         |LIMIT ${TextOps.WeightedSampleK}""".stripMargin
    }),

    "q_lsh_pr" -> e(TextOps.lshPrecisionRecall,
      s"""WITH $ngramPairCtes,
         | posts0 AS (SELECT DISTINCT doc_id, ${duckH28("sh")} AS h
         |  FROM (SELECT doc_id, unnest(s) AS sh FROM ss)),
         | keep AS (SELECT h FROM posts0 GROUP BY h
         |  HAVING count(*) <= ${TextOps.LshPrDfCap}),
         | posts AS (SELECT posts0.doc_id, posts0.h
         |  FROM posts0 JOIN keep USING (h)),
         | nh AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nh
         |  FROM posts GROUP BY 1),
         | gp AS (SELECT x.doc_id AS a, y.doc_id AS b,
         |   CAST(count(*) AS BIGINT) AS inter
         |  FROM posts x JOIN posts y
         |  ON x.h = y.h AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2),
         | gj AS (SELECT gp.a, gp.b, inter,
         |   na.nh + nb.nh - inter AS uni,
         |   (c.a IS NOT NULL) AS is_cand
         |  FROM gp JOIN nh na ON na.doc_id = gp.a
         |   JOIN nh nb ON nb.doc_id = gp.b
         |   LEFT JOIN cand c ON c.a = gp.a AND c.b = gp.b),
         | nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cand FROM cand),
         | x AS (SELECT tau,
         |   CAST(sum(CASE WHEN inter*100 >= tau*uni THEN 1 ELSE 0 END)
         |     AS BIGINT) AS n_true,
         |   CAST(sum(CASE WHEN is_cand AND inter*100 >= tau*uni
         |     THEN 1 ELSE 0 END) AS BIGINT) AS n_cand_true
         |  FROM gj CROSS JOIN (SELECT CAST(unnest([50,60,70,80,90])
         |    AS BIGINT) AS tau) ts
         |  GROUP BY tau)
         |SELECT tau, n_true, n_cand_true, n_cand,
         |-- HUGEINT widening mirrors the Spark decimal(38,0) products
         | CASE WHEN n_cand > 0 THEN CAST(CAST(n_cand_true AS HUGEINT)
         |   * 1000000 // n_cand AS BIGINT) ELSE 0 END AS precision_ppm,
         | CASE WHEN n_true > 0 THEN CAST(CAST(n_cand_true AS HUGEINT)
         |   * 1000000 // n_true AS BIGINT) ELSE 0 END AS recall_ppm
         |FROM x CROSS JOIN nc ORDER BY tau""".stripMargin),

    "q_dedup_incr" -> e(TextOps.dedupIncrQuery,
      s"""WITH $ngramPairCtes,
         | np AS (SELECT a, b FROM p
         |  WHERE jacc >= ${TextOps.NearDupJaccard}),
         | dropped AS (
         |  SELECT b AS doc_id FROM np WHERE b % 5 = 0
         |  UNION
         |  SELECT a AS doc_id FROM np WHERE a % 5 = 0 AND b % 5 <> 0)
         |SELECT d.doc_id, d.source FROM documents d
         |WHERE d.doc_id % 5 = 0
         | AND d.doc_id NOT IN (SELECT doc_id FROM dropped)
         |ORDER BY d.doc_id""".stripMargin),

    "q_lang_mix" -> e(TextOps.langMix,
      """WITH u AS (SELECT doc_id, source,
        |   unnest(string_split(text,' ')) AS tok
        |  FROM documents),
        | g AS (SELECT doc_id, source, count(*) AS n_tok,
        |   CAST(sum(CASE WHEN tok IN ('the','a','of','and','in')
        |     THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
        |  FROM u GROUP BY 1, 2),
        | p AS (SELECT source,
        |   CASE WHEN CAST(n_stop AS DOUBLE)/n_tok >= 0.05
        |     THEN 'en' ELSE 'und' END AS pred_lang
        |  FROM g),
        | c AS (SELECT source, pred_lang, count(*) AS n_docs
        |  FROM p GROUP BY 1, 2),
        | w AS (SELECT source, pred_lang, n_docs,
        |   CAST(sum(n_docs) OVER (PARTITION BY source) AS BIGINT) AS total
        |  FROM c)
        |SELECT source, pred_lang, n_docs,
        |-- HUGEINT widening mirrors the Spark decimal(38,0) product
        | CAST(CAST(n_docs AS HUGEINT) * 1000000 // total AS BIGINT)
        |   AS share_ppm
        |FROM w ORDER BY 1, 2""".stripMargin),

    "q_mix_tokens" -> e(TextOps.mixTokens,
      s"""WITH u AS (SELECT doc_id, source,
         |   unnest(string_split(text,' ')) AS tok
         |  FROM documents),
         | ps AS (SELECT source, CAST(count(*) AS BIGINT) AS src_tok
         |  FROM u GROUP BY 1),
         | ns AS (SELECT count(*) AS n_sources FROM ps),
         | x AS (SELECT source, src_tok,
         |   ${TextOps.MixTokenBudget} // n_sources AS target_tok
         |  FROM ps CROSS JOIN ns)
         |-- HUGEINT widening mirrors the Spark decimal(38,0) products;
         |-- the BIGINT output casts are load-bearing (int128 hashes as
         |-- float64 in the driver comparator)
         |SELECT source, src_tok, target_tok,
         | CAST(least(1000000, CAST(target_tok AS HUGEINT) * 1000000
         |   // src_tok) AS BIGINT) AS rate_ppm,
         | CAST(CAST(src_tok AS HUGEINT) * least(1000000,
         |   CAST(target_tok AS HUGEINT) * 1000000 // src_tok)
         |   // 1000000 AS BIGINT) AS expected_tok
         |FROM x ORDER BY source""".stripMargin),

    "q_tok_zipf" -> e(TextOps.tokZipf,
      """WITH t AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok
        |  FROM documents),
        | f AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM t
        |  GROUP BY 1 ORDER BY freq DESC, tok LIMIT 100),
        | r AS (SELECT tok, freq, CAST(row_number() OVER (
        |    ORDER BY freq DESC, tok) AS BIGINT) AS rank FROM f),
        | q AS (SELECT CAST(floor(ln(rank) * 1000000) AS BIGINT) AS lx,
        |   CAST(floor(ln(freq) * 1000000) AS BIGINT) AS ly FROM r),
        | s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |   CAST(sum(lx) AS BIGINT) AS sx, CAST(sum(ly) AS BIGINT) AS sy,
        |   CAST(sum(lx*ly) AS BIGINT) AS sxy,
        |   CAST(sum(lx*lx) AS BIGINT) AS sxx FROM q)
        |SELECT n, sx, sy, sxy, sxx,
        | CASE WHEN n*sxx - sx*sx = 0 THEN NULL ELSE
        |  CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)
        | END AS slope
        |FROM s""".stripMargin),

    "q_heaps_law" -> e(TextOps.heapsLaw,
      """WITH t AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok
        |  FROM documents),
        | pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok FROM t
        |  GROUP BY 1),
        | r AS (SELECT doc_id, n_tok,
        |   CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS r,
        |   CAST(sum(n_tok) OVER (ORDER BY doc_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |     AS cum_tok
        |  FROM pd),
        | nd AS (SELECT max(r) AS n_docs FROM r),
        | ck AS (SELECT r * 10 // n_docs AS decile,
        |   max(doc_id) AS boundary_doc, max(r) AS n_docs_seen,
        |   max(cum_tok) AS cum_tok
        |  FROM r CROSS JOIN nd WHERE r * 10 % n_docs < 10 GROUP BY 1),
        | fo AS (SELECT tok, min(doc_id) AS first_doc FROM t GROUP BY 1)
        |SELECT decile, n_docs_seen, cum_tok, count(*) AS vocab
        |FROM fo CROSS JOIN ck WHERE first_doc <= boundary_doc
        |GROUP BY decile, n_docs_seen, cum_tok ORDER BY decile""".stripMargin),
  )
}
