package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Determinism

/** Pack I — training-data curation/export: the last mile between a
  * scored, deduplicated corpus and a training run. Split assignment,
  * context-window packing, and mixture-weight interleaving are all
  * hash-deterministic (resumable, reproducible across retries — the
  * same contract as the scrub transforms) and shard-parallel: nothing
  * here global-sorts or collects, so every shape survives a 100x
  * corpus. Each query has an exact DuckDB oracle.
  */
object Curation {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Packing shards: windows partition on a hash shard, never on the
    * whole corpus — a global ORDER BY row_number would serialize into
    * one task. Real pipelines pack per output shard anyway (a training
    * file per shard), so the shard IS the unit of parallelism. */
  val PackShards = 16
  /** Context budget in whitespace tokens per packed bin. */
  val PackBudget = 256
  /** x_domain_cap: max docs kept per registrable domain. */
  val DomainCap = 30
  /** x_weighted_sample: global sample size. */
  val SampleK = 25
  /** x_dp_release noise-seed key (GRAFT_DP_PEPPER). Default "" =
    * UNKEYED: the noise is then publicly invertible and the entry
    * demonstrates only the mechanism's arithmetic — see the entry's
    * caveat. Read once at class init so the Spark Columns and the
    * emitted oracle SQL bake in the same key. */
  private val DpPepper = sys.env.getOrElse("GRAFT_DP_PEPPER", "")
  /** Synthetic provenance vocab (the corpus carries no URLs — same
    * synthesize-then-operate pattern as x_redact_pii's contact lines):
    * registrable domains and the subdomain decoration the
    * canonicalizer must strip. */
  val Domains = Seq("alpha-news.com", "beta-blog.org", "gamma-wiki.net",
    "delta-forum.io", "epsilon-docs.dev", "zeta-mag.co")
  val Subs = Seq("www", "m", "en", "cdn")

  // column builders shared by the gate queries and CuratePipeline's
  // export stage (same hash contracts -> the pipeline's shards line up
  // with the oracle-verified queries)

  /** train/val/test assignment from the doc id alone (90/5/5). */
  def splitOf(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val gate = Determinism.md5Idx(concat(lit("spl#"), id.cast("string"))) % 100
    when(gate < 90, "train").when(gate < 95, "val").otherwise("test")
  }

  /** Packing shard from the doc id alone. */
  def shardOf(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (Determinism.md5Idx(concat(lit("pk#"), id.cast("string"))) % PackShards)
      .cast("int")

  /** Adds (shard, bin) to a frame carrying (idCol, tokensCol):
    * contiguous fixed-budget packing from per-shard exclusive running
    * sums. Overflow bounded by one document; fully shard-parallel. */
  def packed(df: DataFrame, idCol: String, tokensCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(idCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("shard", shardOf(col(idCol)))
      .withColumn("bin",
        (coalesce(sum(tokensCol).over(w), lit(0L)) / PackBudget).cast("int"))
  }

  /** Temperature-quota sample of `d` = (doc_id, source, …): per-source
    * quota = total · ws / Σws with ws = floor(sqrt(ns·1e6)) (one
    * correctly-rounded double op per source, integer math everywhere
    * else — bit-identical cross-engine), total = half the corpus; the
    * draw is the md5-priority k-smallest per source. CurationSpec
    * holds the sqrt direction on skewed sources (big sources
    * down-weighted vs natural frequency). */
  private[graft] def temperatureMix(d: DataFrame): DataFrame = {
    val w = d.groupBy("source").agg(count(lit(1)).as("ns"))
      .select(col("source"),
        floor(sqrt(col("ns") * lit(1000000.0))).cast("long").as("ws"))
    val quotas = broadcast(
      w.join(broadcast(w.agg(sum("ws").as("sw"))))
        .join(broadcast(d.agg(expr("count(1) div 2").as("total"))))
        .select(col("source"), expr("(total * ws) div sw").as("ks")))
    d.select(col("doc_id"), col("source"))
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
      .join(quotas, "source")
      .filter(col("r") <= col("ks"))
      .select(col("doc_id"), col("source"), col("r").cast("int").as("rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // deterministic train/val/test assignment: hash-gated 90/5/5.
    // Membership depends only on (salt, doc_id) — adding documents
    // never reshuffles existing assignments (incremental-safe), and
    // the gate is the same md5 contract the scrub transforms use.
    "x_split" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"), col("lang"), splitOf(col("doc_id")).as("split"))
        .orderBy("doc_id")),

    // sequence packing: documents -> fixed-token-budget bins, the
    // tokenize-and-pack step before writing training shards. Exclusive
    // running token count within a hash shard (doc_id order), bin =
    // that cumsum div budget — contiguous packing whose only
    // approximation is that a bin can overflow by at most one
    // document's tokens (greedy reset-packing needs sequential state;
    // this form is a per-shard window, embarrassingly parallel).
    "x_pack" -> ((s, dir) =>
      packed(
        docs(s, dir).select(col("doc_id"),
          size(split(col("text"), " ")).as("n_tokens")),
        "doc_id", "n_tokens")
        .select("doc_id", "shard", "bin", "n_tokens")
        .orderBy("doc_id")),

    // PACKING-EFFICIENCY audit — the readout a training-data build
    // checks before shipping shards: per shard, how many fixed-budget
    // bins the packing produced, how full they are (fill_micro =
    // tokens·1e6 div (bins·budget) — integer-exact), and the largest
    // bin (bounded by budget + one document — the x_pack overshoot
    // contract, here MEASURED per shard). One aggregation over the
    // packed relation; shard-parallel like the packing itself.
    "x_pack_eval" -> ((s, dir) =>
      packed(
        docs(s, dir).select(col("doc_id"),
          size(split(col("text"), " ")).as("n_tokens")),
        "doc_id", "n_tokens")
        .groupBy("shard", "bin")
        .agg(sum("n_tokens").as("bt"), count(lit(1)).as("bd"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_bins"), sum("bd").as("n_docs"),
          sum("bt").as("n_tokens"), max("bt").as("max_bin_tokens"))
        .select(col("shard"), col("n_bins"), col("n_docs"), col("n_tokens"),
          expr(s"n_tokens * 1000000 div (n_bins * $PackBudget)").as("fill_micro"),
          col("max_bin_tokens"))
        .orderBy("shard")),

    // reproducible training-order shuffle: within each pack shard the
    // read order is the rank of a keyed hash — deterministic across
    // retries, incremental-safe (a doc's key never changes), and
    // shard-parallel (rank windows partition per shard; a global
    // row_number would collapse to one task). The effective global
    // order is (shard, rank): exactly how a sharded reader consumes it.
    "x_shuffle" -> ((s, dir) => {
      val key = Determinism.md5IdxK(
        concat(lit("shf#"), col("doc_id").cast("string")), 12)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("shard").orderBy("k", "doc_id")
      docs(s, dir)
        .select(col("doc_id"), shardOf(col("doc_id")).as("shard"), key.as("k"))
        .withColumn("rank", row_number().over(w).cast("int"))
        .select("doc_id", "shard", "rank")
        .orderBy("doc_id")
    }),

    // mixture-weight interleaving: per-source epoch counts (en 2.5x,
    // es 1.5x, rest 1x), the dataset-mixing step of a pretraining run.
    // Fractional weights resolve per document by hash gate — exactly
    // weight*N docs in expectation, deterministic per doc — and each
    // copy carries its epoch index. Output amplification is bounded by
    // ceil(max weight), so the explode cannot blow up a partition.
    // TEMPERATURE mixture allocation (the Gopher/LLaMA data-mixture
    // recipe at alpha = 1/2): per-source sample quotas proportional to
    // sqrt(n_s) — big sources are down-weighted, small ones
    // over-represented relative to natural frequency. Determinism
    // discipline: the per-source weight is floor(sqrt(ns * 1e6)) —
    // sqrt is IEEE correctly-rounded, ONE double op per source, no
    // float ever SUMS (quota shares are integer multiply-divide over
    // the summed integer weights), so allocation is bit-identical
    // cross-engine. The draw is the hash-priority k-smallest per
    // source (rank <= quota over an md5 priority window): stable
    // under corpus growth until a quota binds, and at 100 TB the
    // per-source rank reduces two-stage (per-partition top-k, then
    // merge) exactly like x_domain_cap's cap.
    "x_mix_temp" -> ((s, dir) =>
      temperatureMix(docs(s, dir)).orderBy("doc_id")),

    "x_mix" -> ((s, dir) => {
      val gate = Determinism.md5Idx(
        concat(lit("mix#"), col("doc_id").cast("string"))) % 100
      val base = when(col("lang") === "en", 2).otherwise(1)
      val frac = when(col("lang").isin("en", "es"), 50).otherwise(0)
      val n = base + (gate < frac).cast("int")
      docs(s, dir)
        .select(col("doc_id"), col("lang"),
          explode(sequence(lit(0), n - 1)).as("epoch"))
        .select(col("doc_id"), col("lang"), col("epoch").cast("int").as("epoch"))
        .orderBy("doc_id", "epoch")
    }),

    // per-domain caps (RefinedWeb-style): a web corpus is dominated by
    // a few hot domains, so curation caps how many documents any one
    // registrable domain contributes. URL canonicalization (host
    // extraction, subdomain strip) + a deterministic hash-priority
    // top-C per domain; the priority is keyed by doc_id alone, so the
    // kept set is stable under corpus growth until a domain's cap
    // binds. Each doc's provenance URL is synthesized from the doc id
    // (the corpus has no URL column — the x_redact_pii pattern); the
    // extraction/canonicalization/cap pipeline is the operator. Scale
    // shape: the cap is a per-key top-C — a window over the domain
    // partition; at 100 TB the same result comes from the two-stage
    // per-partition-top-C-then-global-top-C reduction (cap rows per
    // domain per partition first), never a global sort.
    "x_domain_cap" -> ((s, dir) => {
      val url = concat(
        lit("https://"),
        Determinism.pick(concat(lit("sub#"), col("doc_id").cast("string")), Subs),
        lit("."),
        Determinism.pick(concat(lit("dom#"), col("doc_id").cast("string")), Domains),
        lit("/p/"), col("doc_id").cast("string"))
      val host = regexp_extract(col("url"), "^https?://([^/]+)", 1)
      val prio = Determinism.md5Idx(concat(lit("cap#"), col("doc_id").cast("string")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("domain").orderBy("prio", "doc_id")
      docs(s, dir).select(col("doc_id"), url.as("url"))
        .select(col("doc_id"), col("url"),
          regexp_replace(host, "^(www|m|en|cdn)\\.", "").as("domain"),
          prio.as("prio"))
        .withColumn("rank", row_number().over(w).cast("int"))
        .withColumn("n_domain",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy("domain")).cast("int"))
        .filter(col("rank") <= DomainCap)
        .select("doc_id", "url", "domain", "rank", "n_domain")
        .orderBy("doc_id")
    }),

    // deterministic weighted sampling (priority sampling, Duffield/
    // Lund/Thorup): each doc draws a deterministic 48-bit hash key and
    // its priority is key/weight — the k smallest priorities are a
    // weight-proportional sample without replacement. Weight here is
    // token mass (mixture building samples by tokens, not docs). Both
    // the key and the single division are exact cross-engine, so the
    // sample — including boundary tie-breaks — is reproducible across
    // retries and engines. Scale shape: global k-smallest =
    // TakeOrdered (per-partition top-k, then merge k*P rows on the
    // driver side of the final stage), never a full sort.
    "x_weighted_sample" -> ((s, dir) => {
      val k = Determinism.md5IdxK(
        concat(lit("wsm#"), col("doc_id").cast("string")), 12)
      docs(s, dir)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          k.as("k"))
        .select(col("doc_id"), col("n_tokens"),
          (col("k") / col("n_tokens")).as("priority"))
        .orderBy("priority", "doc_id").limit(SampleK)
        .orderBy("doc_id")
    }),

    // corpus snapshot diff — the data-versioning primitive of an
    // incremental pipeline: given two snapshots of a corpus, report
    // every doc added, removed, or content-changed (unchanged docs are
    // the silent majority and are excluded). The two snapshots are
    // carved deterministically from the one documents table (old skips
    // doc_id%10==7, new skips %10==3 and revises %5==0 — so all three
    // statuses occur); the operator is the join shape. Scale: each
    // side collapses to (key, 16-byte content hash) at the scan — the
    // text column never moves — then ONE shuffle per side for the
    // full-outer hash join; snapshots bucketed by doc_id make it
    // shuffle-free. Status comparison is hash equality, bit-exact
    // cross-engine (md5 of UTF-8).
    "x_corpus_diff" -> ((s, dir) => {
      val old = docs(s, dir).filter(col("doc_id") % 10 =!= 7)
        .select(col("doc_id"), md5(col("text")).as("old_fp"))
      val neu = docs(s, dir).filter(col("doc_id") % 10 =!= 3)
        .select(col("doc_id"),
          md5(when(col("doc_id") % 5 === 0, concat(col("text"), lit(" rev2")))
            .otherwise(col("text"))).as("new_fp"))
      old.join(neu, Seq("doc_id"), "full_outer")
        .withColumn("status",
          when(col("old_fp").isNull, "added")
            .when(col("new_fp").isNull, "removed")
            .when(col("old_fp") =!= col("new_fp"), "changed")
            .otherwise("unchanged"))
        .filter(col("status") =!= "unchanged")
        .select(col("doc_id"), col("status"),
          coalesce(col("old_fp"), lit("")).as("old_fp"),
          coalesce(col("new_fp"), lit("")).as("new_fp"))
        .orderBy("doc_id")
    }),

    // DIFFERENTIALLY-PRIVATE composition release — the privacy sibling
    // of t_kanon_audit for publishing corpus statistics: per-(lang,
    // source) counts released under the DISCRETE LAPLACE (two-sided
    // geometric) mechanism, ε = ln 2 at sensitivity 1. The noise draw
    // is the textbook construction G₁ − G₂ with Gᵢ ~ Geometric(1/2),
    // and each geometric is the TRAILING-ONES count of an md5-derived
    // integer (bit_count(v XOR (v+1)) − 1): pure integer ops both
    // engines evaluate identically — no transcendental, no float, no
    // rejection loop. Released counts clamp at 0. Cost: one map-side-
    // combined aggregate + a scalar projection over |cells| rows.
    // PRIVACY caveat, stated bluntly (DpReleaseSpec doc too): with the
    // default empty pepper the noise seed is md5 of the PUBLIC cell
    // key — anyone can recompute both geometric draws and subtract the
    // noise back out, so the release has NO privacy (ε = ∞ in effect);
    // the entry then demonstrates only the mechanism's integer
    // arithmetic, cross-engine-exact. Set GRAFT_DP_PEPPER to key the
    // seed secretly — then a single release carries the stated ε = ln 2
    // — but ANY deterministic per-key noise still breaks DP under
    // composition: re-releasing after the data changes, or publishing
    // two peppered variants, leaks through the fixed draw. A
    // production release draws fresh randomness per release and pays
    // its ε from a tracked budget; the pepper (when set) is baked into
    // the emitted oracle SQL, so treat the oracle dump as test-env
    // material, never a publishable artifact.
    "x_dp_release" -> ((s, dir) => {
      def geom(tag: String): org.apache.spark.sql.Column = {
        val v = Determinism.md5IdxK(
          concat(lit(DpPepper), lit(tag), col("lang"), lit("|"), col("source")), 6)
        bit_count(v.bitwiseXOR(v + lit(1L))) - lit(1)
      }
      docs(s, dir).groupBy("lang", "source")
        .agg(count(lit(1)).as("n"))
        .withColumn("noise",
          (geom("dpA#") - geom("dpB#")).cast("long"))
        .select(col("lang"), col("source"),
          greatest(col("n") + col("noise"), lit(0L)).as("n_noisy"))
        .orderBy("lang", "source")
    })
  )

  private def gateSql(salt: String): String =
    s"(${Determinism.sqlMd5Idx(s"'$salt' || CAST(doc_id AS VARCHAR)")} % 100)"

  val oracleSql: Map[String, String] = Map(
    "x_split" ->
      s"""SELECT doc_id, lang,
           CASE WHEN ${gateSql("spl#")} < 90 THEN 'train'
                WHEN ${gateSql("spl#")} < 95 THEN 'val'
                ELSE 'test' END AS split
         FROM documents ORDER BY doc_id""",

    "x_pack" ->
      s"""SELECT doc_id, shard,
           CAST(coalesce(sum(n_tokens) OVER (
             PARTITION BY shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             // $PackBudget AS INT) AS bin,
           n_tokens
         FROM (SELECT doc_id,
             CAST(${Determinism.sqlMd5Idx("'pk#' || CAST(doc_id AS VARCHAR)")} % $PackShards AS INT) AS shard,
             CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
           FROM documents)
         ORDER BY doc_id""",

    "x_pack_eval" ->
      s"""WITH p AS (SELECT doc_id, shard,
             CAST(coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               // $PackBudget AS INT) AS bin,
             n_tokens
           FROM (SELECT doc_id,
               CAST(${Determinism.sqlMd5Idx("'pk#' || CAST(doc_id AS VARCHAR)")} % $PackShards AS INT) AS shard,
               CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
             FROM documents)),
         b AS (SELECT shard, bin, sum(n_tokens) AS bt, count(*) AS bd
           FROM p GROUP BY shard, bin)
         SELECT shard, CAST(count(*) AS BIGINT) AS n_bins,
           CAST(sum(bd) AS BIGINT) AS n_docs,
           CAST(sum(bt) AS BIGINT) AS n_tokens,
           CAST(sum(bt) * 1000000 // (count(*) * $PackBudget) AS BIGINT) AS fill_micro,
           CAST(max(bt) AS BIGINT) AS max_bin_tokens
         FROM b GROUP BY shard ORDER BY shard""",

    "x_shuffle" ->
      s"""SELECT doc_id, shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id)
             AS INT) AS rank
         FROM (SELECT doc_id,
             CAST(${Determinism.sqlMd5Idx("'pk#' || CAST(doc_id AS VARCHAR)")} % $PackShards AS INT) AS shard,
             ${Determinism.sqlMd5IdxK("'shf#' || CAST(doc_id AS VARCHAR)", 12)} AS k
           FROM documents)
         ORDER BY doc_id""",

    "x_mix_temp" ->
      """WITH w AS (SELECT source,
             CAST(floor(sqrt(count(*) * 1000000.0)) AS BIGINT) AS ws
           FROM documents GROUP BY source),
         tw AS (SELECT sum(ws) AS sw,
             (SELECT count(*) // 2 FROM documents) AS total FROM w),
         k AS (SELECT source, (total * ws) // sw AS ks FROM w, tw),
         ranked AS (SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS r
           FROM documents)
         SELECT ranked.doc_id, ranked.source, CAST(r AS INT) AS rank
         FROM ranked JOIN k USING (source)
         WHERE r <= ks ORDER BY ranked.doc_id""",

    "x_mix" ->
      s"""SELECT doc_id, lang, CAST(unnest(range(0, n)) AS INT) AS epoch
         FROM (SELECT doc_id, lang,
             (CASE WHEN lang = 'en' THEN 2 ELSE 1 END)
             + (CASE WHEN lang IN ('en', 'es') AND ${gateSql("mix#")} < 50
                THEN 1 ELSE 0 END) AS n
           FROM documents)
         ORDER BY doc_id, epoch""",

    "x_domain_cap" -> {
      val sub = Determinism.sqlPick("'sub#' || CAST(doc_id AS VARCHAR)", Subs)
      val dom = Determinism.sqlPick("'dom#' || CAST(doc_id AS VARCHAR)", Domains)
      s"""WITH u AS (SELECT doc_id,
             'https://' || $sub || '.' || $dom || '/p/'
               || CAST(doc_id AS VARCHAR) AS url
           FROM documents),
         c AS (SELECT doc_id, url,
             regexp_replace(regexp_extract(url, '^https?://([^/]+)', 1),
               '^(www|m|en|cdn)\\.', '') AS domain,
             ${Determinism.sqlMd5Idx("'cap#' || CAST(doc_id AS VARCHAR)")} AS prio
           FROM u),
         r AS (SELECT doc_id, url, domain,
             CAST(row_number() OVER (PARTITION BY domain
               ORDER BY prio, doc_id) AS INT) AS rank,
             CAST(count(*) OVER (PARTITION BY domain) AS INT) AS n_domain
           FROM c)
         SELECT doc_id, url, domain, rank, n_domain FROM r
         WHERE rank <= $DomainCap ORDER BY doc_id"""
    },

    "x_weighted_sample" ->
      s"""SELECT doc_id, n_tokens, priority FROM (
           SELECT doc_id, n_tokens, (k / n_tokens) AS priority
           FROM (SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               ${Determinism.sqlMd5IdxK("'wsm#' || CAST(doc_id AS VARCHAR)", 12)} AS k
             FROM documents)
           ORDER BY priority, doc_id LIMIT $SampleK)
         ORDER BY doc_id""",

    "x_corpus_diff" ->
      """WITH old AS (SELECT doc_id, md5(text) AS old_fp
           FROM documents WHERE doc_id % 10 <> 7),
         neu AS (SELECT doc_id,
             md5(CASE WHEN doc_id % 5 = 0 THEN text || ' rev2'
                 ELSE text END) AS new_fp
           FROM documents WHERE doc_id % 10 <> 3)
         SELECT doc_id,
           CASE WHEN old_fp IS NULL THEN 'added'
                WHEN new_fp IS NULL THEN 'removed'
                ELSE 'changed' END AS status,
           coalesce(old_fp, '') AS old_fp,
           coalesce(new_fp, '') AS new_fp
         FROM old FULL OUTER JOIN neu USING (doc_id)
         WHERE old_fp IS NULL OR new_fp IS NULL OR old_fp <> new_fp
         ORDER BY doc_id""",

    // discrete-Laplace noise as trailing-ones(geometric) difference;
    // pure integer ops mirror the Column tree exactly
    "x_dp_release" -> {
      def g(tag: String) = {
        val v = Determinism.sqlMd5IdxK(
          s"'${DpPepper.replace("'", "''")}' || '$tag' || lang || '|' || source", 6)
        s"(bit_count(xor($v, $v + 1)) - 1)"
      }
      s"""WITH c AS (SELECT lang, source, count(*) AS n
           FROM documents GROUP BY 1, 2)
         SELECT lang, source,
           greatest(n + (${g("dpA#")} - ${g("dpB#")}), 0) AS n_noisy
         FROM c ORDER BY lang, source"""
    }
  )
}
