package graft.engine

import graft.engine.Registry0.{Entry, e}
import PortableHash.{duckH28, duckMinhashJ}

/** Sketch-operator registry ([[Sketches]]): oracle SQL is generated so
  * the bucket/width/bit constants stay single-sourced with the Scala
  * implementations. */
object SketchRegistry {

  private val duckShingles3 =
    "list_transform(range(1, greatest(len(toks)-2,0)+1), " +
      "i -> toks[i]||' '||toks[i+1]||' '||toks[i+2])"
  private val duckBigrams =
    "list_transform(range(1, greatest(len(toks)-1,0)+1), " +
      "i -> toks[i]||' '||toks[i+1])"

  private def lc = Sketches.LcBuckets
  private def cw = Sketches.CmsWidth
  private def bb = Sketches.BloomBits

  def entries: Seq[(String, Entry)] = Seq(

    "q_distinct_sketch" -> e(Sketches.distinctSketch,
      s"""WITH t AS (SELECT source, string_split(text,' ') AS toks FROM documents),
         | ss AS (SELECT source, unnest($duckShingles3) AS sh FROM t),
         | hb AS (SELECT source, sh, ${duckH28("sh")} % $lc AS b FROM ss),
         | g AS (SELECT source, count(DISTINCT b) AS filled,
         |   count(DISTINCT sh) AS "exact" FROM hb GROUP BY 1)
         |SELECT source, filled, "exact",
         |-- saturated sketch (every bucket occupied): ln(0) is
         |-- undefined — NULL in both engines, mirrored in Sketches
         | CASE WHEN filled >= $lc THEN NULL ELSE
         |  CAST(floor(-$lc.0 * ln(1.0 - CAST(filled AS DOUBLE)/$lc.0))
         |   AS BIGINT) END AS est
         |FROM g ORDER BY source, filled, "exact", est""".stripMargin),

    "q_cms_topk" -> e(Sketches.cmsTopk,
      s"""WITH t AS (SELECT string_split(text,' ') AS toks FROM documents),
         | u AS (SELECT unnest($duckBigrams) AS bg FROM t),
         | hx AS (SELECT bg, ${duckH28("bg")} AS h FROM u),
         | cells AS (
         |   SELECT 0 AS j, (${duckMinhashJ("h", 0)}) % $cw AS b FROM hx
         |   UNION ALL SELECT 1, (${duckMinhashJ("h", 1)}) % $cw FROM hx
         |   UNION ALL SELECT 2, (${duckMinhashJ("h", 2)}) % $cw FROM hx),
         | cnt AS (SELECT j, b, count(*) AS c FROM cells GROUP BY 1, 2),
         | top AS (SELECT bg, count(*) AS c_exact FROM u GROUP BY 1
         |   ORDER BY c_exact DESC, bg LIMIT ${Sketches.CmsTop}),
         | th AS (SELECT bg, c_exact, ${duckH28("bg")} AS h FROM top),
         | pr AS (
         |   SELECT bg, c_exact, 0 AS j, (${duckMinhashJ("h", 0)}) % $cw AS b FROM th
         |   UNION ALL SELECT bg, c_exact, 1, (${duckMinhashJ("h", 1)}) % $cw FROM th
         |   UNION ALL SELECT bg, c_exact, 2, (${duckMinhashJ("h", 2)}) % $cw FROM th),
         | es AS (SELECT bg, c_exact, min(c) AS est
         |   FROM pr JOIN cnt USING (j, b) GROUP BY 1, 2)
         |SELECT bg, c_exact, est, est - c_exact AS "over"
         |FROM es ORDER BY c_exact DESC, bg""".stripMargin),

    "q_bloom_join" -> e(Sketches.bloomJoin,
      s"""WITH t AS (SELECT source, string_split(text,' ') AS toks FROM documents),
         | ss AS (SELECT source, unnest($duckShingles3) AS sh FROM t),
         | bt AS (SELECT DISTINCT sh FROM ss
         |   WHERE source = '${Sketches.BloomBuildSource}'),
         | bh AS (SELECT sh, ${duckH28("sh")} AS h FROM bt),
         | slots AS (SELECT DISTINCT s FROM (
         |   SELECT (${duckMinhashJ("h", 0)}) % $bb AS s FROM bh
         |   UNION ALL SELECT (${duckMinhashJ("h", 1)}) % $bb FROM bh
         |   UNION ALL SELECT (${duckMinhashJ("h", 2)}) % $bb FROM bh)),
         | pt AS (SELECT DISTINCT source, sh FROM ss
         |   WHERE source <> '${Sketches.BloomBuildSource}'),
         | ph AS (SELECT source, sh, ${duckH28("sh")} AS h FROM pt),
         | fl AS (SELECT source, sh,
         |    ((${duckMinhashJ("h", 0)}) % $bb IN (SELECT s FROM slots))
         |    AND ((${duckMinhashJ("h", 1)}) % $bb IN (SELECT s FROM slots))
         |    AND ((${duckMinhashJ("h", 2)}) % $bb IN (SELECT s FROM slots)) AS cand,
         |    sh IN (SELECT sh FROM bt) AS hit
         |  FROM ph)
         |SELECT source, count(*) AS n_sh,
         | CAST(sum(CASE WHEN cand THEN 1 ELSE 0 END) AS BIGINT) AS n_cand,
         | CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
         | CAST(sum(CASE WHEN cand THEN 1 ELSE 0 END)
         |   - sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_fp
         |FROM fl GROUP BY source
         |ORDER BY source, n_sh, n_cand, n_true, n_fp""".stripMargin),
  )
}
