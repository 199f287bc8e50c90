package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Determinism

/** Pack P — the END-TO-END curation pipeline as a gate entry: the full
  * pretraining-data path (quality filter → exact dedup → line-level
  * boilerplate strip → MinHash-LSH near-dedup with quality-argmax
  * canonical selection → fuzzy eval-set decontamination → perceptual-
  * hash image dedup → exact-substring span strip → token accounting)
  * priced as ONE entry and hash-checked against a DuckDB oracle that
  * composes the same stage recipes the per-stage gate queries already
  * verify individually. The per-stage entries prove each operator; this
  * proves the COMPOSITION — counts at every stage boundary plus the
  * final token mass, at all three scales.
  *
  * Scale posture (100 TB): every stage is the same bucketed/banded
  * plan its standalone entry runs — no all-pairs term enters through
  * composition; the one new materialization is the post-line-dedup
  * staging checkpoint (at a deployment: the staging parquet between
  * cleaning and dedup).
  */
object PipelineQueries {

  /** Benchmark convention: the first 50 docs play the eval set (the
    * x_contamination / d_decontaminate convention). */
  private val BenchDocs = 50

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_curate" -> ((s, dir) => {
      import s.implicits._
      val bench = Tables.load(s, dir, "documents")
        .filter(col("doc_id") < BenchDocs)
      val (curated, stages) = graft.tools.CuratePipeline.curate(
        s, dir, minQuality = 0.3, benchDocs = Some(bench),
        releaseDedupCaches = false)
      val toks = curated.agg(coalesce(sum("n_tokens"), lit(0L)))
        .head().getLong(0)
      // all numbers are extracted — free this run's staging checkpoints
      // now (the per-call band memos stay registered under the "d"
      // scope for the session's end-of-run release: tiny relations, and
      // a cross-scope release here could drop live d-family memos in a
      // concurrent Verify session)
      graft.CacheBook.release(s, "curate")
      val order = Seq("input", "after_quality", "after_lang",
        "after_exact_dedup", "after_line_dedup", "after_near_dedup",
        "after_decontaminate", "after_image_dedup", "after_span_strip")
      (order.zipWithIndex.map { case (k, i) => (i, k, stages(k)) }
        :+ ((order.size, "total_tokens", toks)))
        .toDF("stage_idx", "stage", "n")
        .select(col("stage_idx").cast("int"), col("stage"), col("n"))
        .orderBy("stage_idx")
    })
  )

  /** CuratePipeline's stage-1 quality score in SQL (its own 8-word
    * stop list — deliberately simpler than TextAnalysis.stopwords). */
  private val sqlQuality =
    """(least(length(text), 500) * 1000
       + (len(list_filter(string_split(text, ' '),
           x -> x IN ('the','a','of','and','to','in','is','on'))) * 500000)
         // len(string_split(text, ' '))) / 1000000.0"""

  val oracleSql: Map[String, String] = Map(
    "pipeline_curate" -> {
      val sh = (w: String) => Dedup.sqlShingleSetOf(w)
      val jac = Dedup.sqlJaccardOf _
      s"""WITH RECURSIVE
         scored AS MATERIALIZED (SELECT doc_id, text, $sqlQuality AS quality FROM documents),
         q AS MATERIALIZED (SELECT doc_id, text, quality FROM scored WHERE quality >= 0.3),
         hx AS MATERIALIZED (SELECT doc_id, text, quality,
             md5(trim(lower(regexp_replace(text, '\\s+', ' ', 'g')))) AS h
           FROM q),
         exd AS MATERIALIZED (SELECT doc_id, text, quality FROM (
             SELECT doc_id, text, quality,
               min(doc_id) OVER (PARTITION BY h) AS keep FROM hx)
           WHERE doc_id = keep),
         lw AS (SELECT doc_id, string_split(text, ' ') AS w FROM exd),
         llines AS MATERIALIZED (SELECT doc_id, t.i AS pos,
             array_to_string(w[CAST(t.i*${TextAnalysis.LineSeg}+1 AS INT):CAST(t.i*${TextAnalysis.LineSeg}+${TextAnalysis.LineSeg} AS INT)], ' ') AS line
           FROM lw, unnest(range(0, (len(w) - 1) // ${TextAnalysis.LineSeg} + 1)) AS t(i)),
         ldf AS MATERIALIZED (SELECT line, count(DISTINCT doc_id) AS df
           FROM llines GROUP BY line),
         ldoc AS MATERIALIZED (SELECT doc_id,
             count(*) FILTER (df <= ${TextAnalysis.LineDfMax}) AS n_kept,
             coalesce(array_to_string(
               list(line ORDER BY pos) FILTER (df <= ${TextAnalysis.LineDfMax}), ' '), '') AS text
           FROM llines JOIN ldf USING (line) GROUP BY doc_id),
         ld AS MATERIALIZED (SELECT e.doc_id, l.text, e.quality
           FROM exd e JOIN ldoc l ON l.doc_id = e.doc_id AND l.n_kept > 0),
         sh2 AS MATERIALIZED (SELECT doc_id, ${sh("string_split(text, ' ')")} AS sh FROM ld),
         ${Dedup.sqlBandCtesOver("sh2", "n")},
         ncand AS MATERIALIZED (SELECT DISTINCT x.doc_id AS x_id, y.doc_id AS y_id
           FROM nbands x JOIN nbands y
           ON x.bi = y.bi AND x.bk = y.bk AND x.doc_id < y.doc_id),
         npairs AS MATERIALIZED (SELECT x.doc_id AS a, y.doc_id AS b
           FROM ncand c
           JOIN sh2 x ON x.doc_id = c.x_id JOIN sh2 y ON y.doc_id = c.y_id
           WHERE ${jac("x.sh", "y.sh")} >= 0.5),
         nbi AS MATERIALIZED (SELECT a AS src, b AS dst FROM npairs
           UNION SELECT b, a FROM npairs),
         nr AS (SELECT src, dst FROM nbi
           UNION SELECT nr.src, nbi.dst FROM nr JOIN nbi ON nr.dst = nbi.src),
         nreach AS (SELECT src, dst FROM nr
           UNION SELECT DISTINCT src, src FROM nbi),
         nlbl AS MATERIALIZED (SELECT src AS id, min(dst) AS cluster FROM nreach GROUP BY src),
         nwq AS (SELECT l.id, l.cluster, d.quality
           FROM nlbl l JOIN ld d ON d.doc_id = l.id),
         nkeep AS (SELECT id FROM (SELECT id, row_number() OVER
             (PARTITION BY cluster ORDER BY quality DESC, id ASC) AS rn
           FROM nwq) WHERE rn = 1),
         ndrop AS (SELECT id FROM nwq
           WHERE id NOT IN (SELECT id FROM nkeep)),
         near AS MATERIALIZED (SELECT * FROM ld
           WHERE doc_id NOT IN (SELECT id FROM ndrop)),
         bsh AS MATERIALIZED (SELECT doc_id, ${sh("string_split(text, ' ')")} AS sh
           FROM documents WHERE doc_id < $BenchDocs),
         psh AS MATERIALIZED (SELECT doc_id, ${sh("string_split(text, ' ')")} AS sh FROM near),
         ${Dedup.sqlBandCtesOver("psh", "p")},
         ${Dedup.sqlBandCtesOver("bsh", "b")},
         dcand AS (SELECT DISTINCT pb.doc_id AS a, bb.doc_id AS bd
           FROM pbands pb JOIN bbands bb
           ON pb.bi = bb.bi AND pb.bk = bb.bk),
         leaked AS MATERIALIZED (SELECT DISTINCT a AS doc_id FROM dcand
           JOIN psh sa ON sa.doc_id = dcand.a
           JOIN bsh sb ON sb.doc_id = dcand.bd
           WHERE ${jac("sa.sh", "sb.sh")} >= 0.5),
         dec AS MATERIALIZED (SELECT * FROM near
           WHERE doc_id NOT IN (SELECT doc_id FROM leaked)),
         dims AS (SELECT doc_id, CAST(16 + doc_id % 32 AS INT) AS w,
             CAST(16 + (doc_id * 7) % 32 AS INT) AS h FROM dec),
         th AS MATERIALIZED (SELECT doc_id, k.i AS k,
             (doc_id + 3 * (((k.i % 8) * w) // 8)
               + 5 * (((k.i // 8) * h) // 8)) % 256 AS p
           FROM dims, unnest(range(0, 64)) AS k(i)),
         sp AS (SELECT doc_id, sum(p) AS sp FROM th GROUP BY doc_id),
         phh AS MATERIALIZED (SELECT th.doc_id,
             string_agg(CASE WHEN th.p * 64 > sp.sp THEN '1' ELSE '0' END,
               '' ORDER BY th.k) AS phash
           FROM th JOIN sp USING (doc_id) GROUP BY th.doc_id),
         ikeep AS (SELECT min(doc_id) AS doc_id FROM phh GROUP BY phash),
         img AS MATERIALIZED (SELECT * FROM dec
           WHERE doc_id IN (SELECT doc_id FROM ikeep)),
         sw AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS ws FROM img),
         spans AS MATERIALIZED (SELECT doc_id, CAST(t.i AS INT) AS pos,
             ${Determinism.sqlMd5IdxK(
               s"array_to_string(ws[CAST(t.i+1 AS INT):CAST(t.i+${TextAnalysis.SpanW} AS INT)], ' ')", 12)} AS g
           FROM sw, unnest(range(0, greatest(len(ws) - ${TextAnalysis.SpanW}, 0) + 1)) AS t(i)),
         sagg AS (SELECT g, count(DISTINCT doc_id) AS df, min(doc_id) AS owner
           FROM spans GROUP BY g),
         scov AS MATERIALIZED (SELECT DISTINCT s.doc_id, CAST(u.p AS INT) AS pos
           FROM spans s JOIN sagg USING (g),
             unnest(range(s.pos, s.pos + ${TextAnalysis.SpanW})) AS u(p)
           WHERE df >= 2 AND s.doc_id <> owner),
         swords AS (SELECT doc_id, CAST(t.i - 1 AS INT) AS pos,
             ws[CAST(t.i AS INT)] AS word
           FROM sw, unnest(range(1, len(ws) + 1)) AS t(i)),
         sflag AS MATERIALIZED (SELECT wd.doc_id, wd.pos, wd.word, c.pos IS NOT NULL AS rm
           FROM swords wd LEFT JOIN scov c
           ON c.doc_id = wd.doc_id AND c.pos = wd.pos),
         sdoc AS MATERIALIZED (SELECT doc_id, count(*) AS n_words,
             count(*) FILTER (rm) AS n_removed,
             coalesce(array_to_string(
               list(word ORDER BY pos) FILTER (NOT rm), ' '), '') AS text
           FROM sflag GROUP BY doc_id),
         cur AS MATERIALIZED (SELECT doc_id, text FROM sdoc WHERE n_removed < n_words)
         SELECT CAST(stage_idx AS INT) AS stage_idx, stage, CAST(n AS BIGINT) AS n
         FROM (
           SELECT 0 AS stage_idx, 'input' AS stage,
             (SELECT count(*) FROM documents) AS n
           UNION ALL SELECT 1, 'after_quality', (SELECT count(*) FROM q)
           UNION ALL SELECT 2, 'after_lang', (SELECT count(*) FROM q)
           UNION ALL SELECT 3, 'after_exact_dedup', (SELECT count(*) FROM exd)
           UNION ALL SELECT 4, 'after_line_dedup', (SELECT count(*) FROM ld)
           UNION ALL SELECT 5, 'after_near_dedup', (SELECT count(*) FROM near)
           UNION ALL SELECT 6, 'after_decontaminate', (SELECT count(*) FROM dec)
           UNION ALL SELECT 7, 'after_image_dedup', (SELECT count(*) FROM img)
           UNION ALL SELECT 8, 'after_span_strip', (SELECT count(*) FROM cur)
           UNION ALL SELECT 9, 'total_tokens',
             (SELECT coalesce(sum(len(string_split(text, ' '))), 0) FROM cur)
         ) ORDER BY stage_idx"""
    }
  )
}
