package graft.prep

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Exprs, Pct}

/** Training-data preparation operators (builder brief: the operations a
  * large-scale training pipeline needs beyond the reference's surface).
  *
  * All three use the md5-of-id ordering trick: `rand()`/`TABLESAMPLE` are
  * engine- and partitioning-dependent, but md5 of the decimal string of a
  * BIGINT id is identical in every engine — so sampling, splitting and
  * packing are deterministic, reproducible across reruns AND exactly
  * verifiable against the DuckDB oracle. At 100 TB each op is a single
  * keyed window or aggregation — no global ordering, no driver state.
  */
object DataPrep {

  /** q60 (oracle-baseline form): stratified sampling — a fixed-size,
    * deterministic pseudo-random sample per class (the class-balanced subset
    * every fine-tuning set starts from). Per class, rank by md5(id)
    * (uniform, engine-portable) and keep the first K; output compares
    * sample vs population moments so the sample's representativeness is
    * part of the checked contract.
    *
    * The window totally orders each class, so parallelism is bounded by
    * class count — this form exists because it is the exact-semantics
    * baseline the oracle can state. The SHIPPED q60 is
    * [[q60StratifiedSampleScaled]], the two-phase top-K that produces
    * bitwise-identical output (DataPrepSpec pins it) with scan-bounded
    * parallelism. */
  def q60StratifiedSample(spark: SparkSession, dir: String, k: Int = 100): DataFrame = {
    val e = Tables.events(spark, dir)
    val w = Window.partitionBy(col("event_type"))
      .orderBy(md5(col("event_id").cast("string")), col("event_id"))
    e.withColumn("rn", row_number().over(w))
      .groupBy(col("event_type")).agg(
        count(lit(1)).as("n_total"),
        count(when(col("rn") <= k, 1)).as("n_sampled"),
        Exprs.avgExact2(col("value"), 4).as("pop_avg_value"),
        Exprs.dround(
          Exprs.sumExact2(when(col("rn") <= k, col("value"))) /
            count(when(col("rn") <= k, col("value"))), 4).as("sample_avg_value"))
      .withColumn("sample_pct", Exprs.pctOf(col("n_sampled"), col("n_total"), 2))
      .orderBy(col("event_type"))
  }

  /** q60 (shipped, 100-TB form): the same stratified sample via two-phase
    * per-partition top-K ([[graft.functions.TopKSampleAgg]]) — one hash
    * aggregation computes population stats AND the per-class K-smallest-md5
    * sample in a single scan. Each map task's partial holds at most K
    * candidates per class, the shuffle carries those bounded buffers (never
    * rows), and no window orders anything — parallelism is the scan's, not
    * the class count's.
    *
    * Bitwise equality with the window form: value is exactly 2-dp, so each
    * row's metric rides as an exact integer (`cents`); the aggregator's Long
    * sum equals the window form's decimal(25,2) sum, and
    * `cast(sum_cents as double) / 100.0` is the correctly-rounded double of
    * the same rational number the decimal→double cast produces. Division by
    * the count and the 4-dp rounding then run the identical IEEE ops.
    * (Assumes non-null `value`, like the window form's population stats —
    * the corpus is clean by contract.) */
  def q60StratifiedSampleScaled(spark: SparkSession, dir: String,
                                k: Int = 100): DataFrame = {
    val topk = udaf(graft.functions.TopKSampleAgg(k))
    Tables.events(spark, dir)
      .select(col("event_type"), col("value"),
        md5(col("event_id").cast("string")).as("m"), col("event_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy(col("event_type")).agg(
        count(lit(1)).as("n_total"),
        Exprs.avgExact2(col("value"), 4).as("pop_avg_value"),
        topk(col("m"), col("event_id"), col("cents")).as("s"))
      .select(col("event_type"), col("n_total"),
        col("s.n_sampled").as("n_sampled"), col("pop_avg_value"),
        Exprs.dround((col("s.sum_cents").cast("double") / lit(100.0)) /
          col("s.n_sampled"), 4).as("sample_avg_value"))
      .withColumn("sample_pct", Exprs.pctOf(col("n_sampled"), col("n_total"), 2))
      .orderBy(col("event_type"))
  }

  /** q61: hash-based train/val/test split — membership is a pure function
    * of the id (first hex char of md5: 16 uniform buckets → 12/2/2 =
    * 75%/12.5%/12.5%), so the split is stable under reprocessing, joins,
    * and engine changes — the property that prevents test-set leakage when
    * a corpus is rebuilt. One scan, no shuffle beyond the final tiny agg. */
  def q61DatasetSplit(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val h = substring(md5(col("event_id").cast("string")), 1, 1)
    val split = when(h <= "b", "train").when(h <= "d", "val").otherwise("test")
    e.withColumn("split", split)
      .groupBy(col("split")).agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        Exprs.avgExact2(col("value"), 4).as("avg_value"))
      .withColumn("pct", Exprs.pctOf(col("n"),
        sum(col("n")).over(Window.partitionBy()), 2))
      .orderBy(col("split"))
  }

  /** q62: token-budget sequence packing (concat-then-chunk, the packing
    * used to fill fixed-length training contexts): docs are laid out in
    * deterministic order per source, and each doc is assigned to the bin
    * where its start offset falls (`(cumulative - own) div budget`). One
    * window partitioned by source + one aggregation — the 100-TB plan is
    * per-shard packing with source as the shard key. Output: per-bin doc
    * count, token count and fill ratio against the budget. */
  def q62TokenPacking(spark: SparkSession, dir: String, budget: Int = 512): DataFrame = {
    graft.functions.TokenCountFunction.register(spark)
    val d = Tables.documents(spark, dir)
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.withColumn("n_tok", call_function("token_count", col("text")))
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .withColumn("bin", expr(s"(cum_tok - n_tok) div $budget"))
      .groupBy(col("source"), col("bin")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("bin_tokens"))
      .withColumn("fill_ratio",
        Exprs.dround(col("bin_tokens") / lit(budget.toDouble), 4))
      .orderBy(col("source"), col("bin"))
  }

  /** q73: PII scrubbing — regex detection, masking, and post-scrub
    * verification over log-line text (the redaction pass every training
    * corpus takes before release). The synthetic tables carry no free-form
    * PII, so the lines are derived deterministically from `events`
    * (the [[graft.Tables.withSyntheticPositions]] precedent): user ids
    * always, an RFC1918-style IP for half the key space. Per event type:
    * rule hit counts, a residual-digit check proving the scrub removed
    * every ≥4-digit identifier, and the distinct-count collapse the
    * masking causes (the k-anonymity effect).
    *
    * Scale shape: pure row-wise regex projections (codegen'd string
    * expressions, no UDF) feeding one hash aggregation — the scan is the
    * plan. Patterns are RE2-safe (no lookaround/backrefs) so the same
    * rules run on any engine. */
  def q73PiiScrub(spark: SparkSession, dir: String): DataFrame = {
    val ipRe = "10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
    val userRe = "user=[0-9]+"
    val e = Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
    val line = concat(
      lit("user="), col("user_id"),
      when(col("k") < 50, concat(lit(" ip=10."), col("k"), lit("."),
        col("k") % 7, lit("."), col("k") % 13)).otherwise(lit("")),
      lit(" sess="), col("k") % 7, lit(" type="), col("event_type"))
    val masked = regexp_replace(
      regexp_replace(col("line"), userRe, "user=[U]"), ipRe, "[IP]")
    e.withColumn("line", line).withColumn("masked", masked)
      .groupBy(col("event_type")).agg(
        count(lit(1)).as("n_lines"),
        sum(regexp_count(col("line"), lit(ipRe))).as("n_ip_hits"),
        sum(regexp_count(col("line"), lit(userRe))).as("n_user_hits"),
        count(when(col("masked").rlike("[0-9]{4,}"), 1)).as("n_residual_ids"),
        countDistinct(col("masked")).as("n_distinct_masked"))
      .orderBy(col("event_type"))
  }

  /** q82: sliding-window document chunking with overlap — the training-
    * sequence prep step that splits long documents into `width`-token
    * chunks every `stride` tokens (stride < width → overlapping context).
    * Emits the chunks themselves: boundary math AND chunk text are both
    * oracle-checked. A trailing window that is a pure suffix of the
    * previous chunk (start ≥ n_tok − width + stride) is dropped — it would
    * add no new tokens, only duplicated tail content.
    *
    * Scale shape: embarrassingly parallel — tokenize, bounded explode
    * (≤ n_tok/stride chunks per row) and slice are all partition-local
    * projections; no aggregation, no window, no shuffle except the final
    * presentation sort. `array_remove` (not a lambda filter) keeps the
    * tokenizer inside codegen. */
  def q82ChunkOverlap(spark: SparkSession, dir: String,
                      width: Int = 32, stride: Int = 24): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.select(col("doc_id"),
        array_remove(split(col("text"), " "), "").as("toks"))
      .withColumn("n_tok", size(col("toks")))
      .filter(col("n_tok") > 0)
      .withColumn("start",
        explode(sequence(lit(0), col("n_tok") - 1, lit(stride))))
      .filter(col("start") === 0 ||
        col("start") < col("n_tok") - lit(width) + lit(stride))
      .select(col("doc_id"),
        expr(s"start div $stride").as("chunk_id"),
        size(slice(col("toks"), col("start") + 1, lit(width))).as("n_toks"),
        concat_ws(" ", slice(col("toks"), col("start") + 1, lit(width)))
          .as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** q83: per-source quota capping — the corpus-balancing pass that stops
    * any one source/domain from dominating a training mix. Per source, keep
    * the `quota` docs with the smallest md5 priority (deterministic,
    * engine-portable — reruns and engines agree on WHICH docs survive;
    * `kept_id_sum` witnesses the exact kept set, not just its size).
    *
    * Scale shape: two paths over the corpus, joined per-source. The kept
    * path filters `row_number() <= quota` BEFORE aggregating, which is the
    * q11/q60 QUALIFY idiom — partial+final `WindowGroupLimit`, each map
    * task forwards at most `quota` rows per source, shuffle bounded by
    * sources × quota. The totals path is a plain two-phase hash count (no
    * window at all). A single window over kept AND dropped rows would
    * defeat the pruning and shuffle the whole corpus — the PlanQualitySpec
    * pin exists because the first draft did exactly that. */
  def q83SourceQuota(spark: SparkSession, dir: String,
                     quota: Int = 15): DataFrame = {
    val d = Tables.documents(spark, dir)
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val kept = d.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= quota)
      .groupBy(col("source")).agg(
        count(lit(1)).as("n_kept"),
        sum(col("n_chars")).as("kept_chars"),
        sum(col("doc_id")).as("kept_id_sum"))
    d.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .join(kept, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_kept"),
        (col("n_docs") - col("n_kept")).as("n_dropped"),
        col("kept_chars"), col("kept_id_sum"),
        Exprs.pctOf(col("n_kept"), col("n_docs"), 2).as("kept_pct"))
      .orderBy(col("source"))
  }

  /** q90: temperature-weighted source mixture — the sampling-weight table a
    * training run reads to decide how often to draw from each source
    * (the α=0.5 "sqrt temperature" rebalance: up-weights small sources,
    * tempers giants; raw proportional sampling would let one crawl dominate
    * the mix). Emits per source: size, raw share, tempered share, and the
    * implied epoch count against a fixed token budget — epochs > 1 flags
    * the sources a run would repeat.
    *
    * Cross-engine determinism: `sqrt` of a BIGINT is a single
    * correctly-rounded IEEE op (identical everywhere), its 4dp rounding
    * makes the weights fixed-scale, and the weight total is a decimal-exact
    * sum — so the shares are order-independent doubles, same in both
    * engines. The totals row broadcasts (J4 1-row combine shape). */
  def q90MixtureWeights(spark: SparkSession, dir: String,
                        budgetChars: Long = 1000000L): DataFrame = {
    val bySrc = Tables.documents(spark, dir)
      .groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("chars"))
      .withColumn("w", Exprs.dround(sqrt(col("chars")), 4))
    val tot = bySrc.agg(
      sum(col("chars")).as("tot_chars"),
      Exprs.sumExact(col("w"), 4).as("tot_w"))
    bySrc.crossJoin(broadcast(tot))
      .withColumn("raw_share", Exprs.pctOf(col("chars"), col("tot_chars"), 4))
      .withColumn("mix_share",
        Exprs.dround(lit(100.0) * col("w") / col("tot_w"), 4))
      .withColumn("epochs", Exprs.dround(
        (col("w") / col("tot_w")) * lit(budgetChars.toDouble) / col("chars"), 4))
      .select(col("source"), col("n_docs"), col("chars"),
        col("raw_share"), col("mix_share"), col("epochs"))
      .orderBy(col("source"))
  }

  /** q95: source length-calibration audit — each document binned into a
    * GLOBAL length decile (exact percentile cut points), then each source's
    * occupancy across the 10 global bins plus a χ² uniformity score: a
    * source whose lengths pile into one global decile (high χ², flag) will
    * skew any length-bucketed batch packing (q62) or curriculum built on
    * it. The classic per-source-vs-corpus calibration table.
    *
    * Scale shape: the cut points are ONE 1-row aggregate (broadcast); the
    * decile assignment is 9 codegen'd comparisons per row (no window, no
    * sort — unlike a per-row global percent_rank, which would single-
    * partition the corpus); the rest is a source-keyed aggregation. At
    * 100 TB swap `percentile` for `percentile_approx` cut points — same
    * plan shape.
    *
    * Cross-engine determinism: χ² over counts collapses algebraically to
    * (10·Σn_d² − n_s²)/n_s — exact BIGINT numerator (empty bins included
    * implicitly), one double division at the end. The ±flag cross-
    * multiplies with dyadic 87/4 = 21.75 ≈ χ²₉(0.01), never comparing a
    * derived double. */
  def q95DecileCalibration(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    // 9 exact decile cut points via order statistics (Pct) — n_chars is an
    // INTEGER column, exactly the class where the driver's DuckDB build
    // diverged from quantile_cont in r07; one grid pass serves all nine qs
    val cuts = Pct.relation(d, Nil, "n_chars",
      (1 to 9).map(i => s"c$i" -> i / 10.0))
    val dec = d.crossJoin(broadcast(cuts))
      .withColumn("decile", (1 to 9)
        .map(i => when(col("n_chars") > col(s"c$i"), 1).otherwise(0))
        .reduce(_ + _))
    val aggCols = count(lit(1)).as("n_docs") +:
      (0 until 10).map(i => count(when(col("decile") === i, 1)).as(s"d$i"))
    val perSrc = dec.groupBy(col("source")).agg(aggCols.head, aggCols.tail: _*)
    val snd2 = (0 until 10).map(i => col(s"d$i") * col(s"d$i")).reduce(_ + _)
    perSrc
      .withColumn("chi2", Exprs.dround(
        (lit(10) * snd2 - col("n_docs") * col("n_docs")) / col("n_docs"), 4))
      .withColumn("len_skew_flag",
        (lit(10) * snd2 - col("n_docs") * col("n_docs")) * 4 >
          lit(87) * col("n_docs"))
      .orderBy(col("source"))
  }

  /** q144: deterministic WEIGHTED sampling — the quality-weighted draw a
    * curated training mix uses where q60's uniform stratified sample is not
    * enough (up-weight long/high-quality documents without giving up
    * reproducibility). The Efraimidis–Spirakis priority idea (`u^(1/w)`)
    * made exact-integer so both engines compute identical bits: priority =
    * u div w, where u is the first 12 md5 hex chars of the doc id as a
    * 48-bit integer (`conv(...,16,10)` ≡ DuckDB `('0x'||...)::BIGINT` —
    * verified bitwise) and w ∈ [1,10] is an integer weight derived from
    * n_chars. Inclusion probability is monotone in w (a doc with twice the
    * weight halves its priority), the draw is a pure function of
    * (doc_id, n_chars) — stable under reprocessing, partitioning and
    * engine, the same property q61 gives splits. Both operands are
    * non-negative, so Spark `div` (truncate) and DuckDB `//` (floor) agree
    * (the r10 sign-split rule never triggers).
    *
    * Scale shape: the shipped path is the q60 two-phase bounded sampler
    * ([[graft.functions.TopKSampleAgg]]) over the zero-padded priority —
    * one scan, map-side ≤K buffers per source, no window, no total order;
    * the per-source total-order window lives only in the oracle. Output:
    * per-source sample size plus population-vs-sample mean weight as
    * half-up ×10⁴ BIGINTs (integer-emission rule) — the sample mean weight
    * exceeding the population's is the weighting working, which the spec
    * asserts and the oracle checks exactly. */
  /** The one k both q144 sides share — the Spark path's default and the
    * oracle generator's interpolation (the r10 one-generator rule: a
    * parameter that exists in two dialects must have one source). */
  val Q144SampleK: Int = 25

  def q144WeightedSample(spark: SparkSession, dir: String,
                         k: Int = Q144SampleK): DataFrame = {
    val topk = udaf(graft.functions.TopKSampleAgg(k))
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        least(lit(10L), expr("n_chars div 200") + 1L).as("w"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
          .cast("long").as("u"))
      .withColumn("priority", expr("u div w"))
      .groupBy(col("source")).agg(
        count(lit(1)).as("n_total"),
        sum(col("w")).as("sum_w"),
        topk(lpad(col("priority").cast("string"), 20, "0"),
          col("doc_id"), col("w")).as("s"))
      .select(col("source"), col("n_total"),
        col("s").getField("n_sampled").as("n_sampled"),
        expr("(2*sum_w*10000 + n_total) div (2*n_total)").as("pop_w_avg_x10k"),
        expr("(2*s.sum_cents*10000 + s.n_sampled) div (2*s.n_sampled)")
          .as("samp_w_avg_x10k"))
      .orderBy(col("source"))
  }

  /** q152: deterministic mixture REBALANCING — the action q122's mixture
    * audit points at: split a char budget (half the corpus) equally
    * across sources, derive each source's integer keep-rate in basis
    * points (capped at 10000 — under-allocated sources keep everything),
    * and downsample REPRODUCIBLY via the q144 hash-uniform integer: keep
    * iff u % 10000 < rate_bp, where u is the 48-bit md5-prefix of the
    * doc id. The same doc set falls out on every run and every engine —
    * no RNG, no seed coordination across a cluster; a re-run of the
    * pipeline (or a DIFFERENT engine auditing it) reproduces the sample
    * bit-for-bit. Emits the per-source plan next to the achieved outcome,
    * all BIGINT integer arithmetic (the q97 emission rule).
    *
    * Scale shape: one scan + a 5-row broadcast plan join; the keep
    * decision is per-row map-side — no shuffle beyond the per-source
    * aggregation of the report (and a real pipeline would write the kept
    * rows in the same pass). */
  def q152MixtureRebalance(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), col("n_chars"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
          .cast("long") % 10000L).as("u_bp"))
    val bySource = d.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
    val global = bySource.agg(
      sum(col("chars")).as("total_chars"), count(lit(1)).as("n_sources"))
    val planned = bySource.crossJoin(broadcast(global))
      .withColumn("target_chars", expr("total_chars div 2 div n_sources"))
      .withColumn("rate_bp",
        when(col("chars") > 0,
          least(lit(10000L), expr("target_chars * 10000 div chars")))
          .otherwise(lit(10000L)))
      .select(col("source"), col("n_docs"), col("chars"),
        col("target_chars"), col("rate_bp"))
    d.join(broadcast(planned), Seq("source"))
      .withColumn("keep", col("u_bp") < col("rate_bp"))
      .groupBy(col("source"), col("n_docs"), col("chars"),
        col("target_chars"), col("rate_bp"))
      .agg(count(when(col("keep"), 1)).as("kept_docs"),
        coalesce(sum(when(col("keep"), col("n_chars"))), lit(0L))
          .as("kept_chars"))
      .withColumn("achieved_bp",
        when(col("chars") > 0, expr("kept_chars * 10000 div chars"))
          .otherwise(lit(0L)))
      .select(col("source"), col("n_docs"), col("chars"),
        col("target_chars"), col("rate_bp"), col("kept_docs"),
        col("kept_chars"), col("achieved_bp"))
      .orderBy(col("source"))
  }

  val oracle: Map[String, String] = Map(
    "q152_mixture_rebalance" ->
      """WITH u AS (
        |  SELECT source, doc_id, n_chars,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT % 10000 AS u_bp
        |  FROM documents),
        |by_source AS (
        |  SELECT source, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS chars
        |  FROM u GROUP BY source),
        |g AS (
        |  SELECT (sum(chars))::BIGINT AS total_chars,
        |    count(*)::BIGINT AS n_sources
        |  FROM by_source),
        |planned AS (
        |  SELECT source, n_docs, chars,
        |    (total_chars // 2 // n_sources)::BIGINT AS target_chars,
        |    CASE WHEN chars > 0
        |      THEN least(10000, (total_chars // 2 // n_sources) * 10000 // chars)
        |      ELSE 10000 END::BIGINT AS rate_bp
        |  FROM by_source CROSS JOIN g)
        |SELECT p.source, p.n_docs, p.chars, p.target_chars, p.rate_bp,
        |  count(CASE WHEN u.u_bp < p.rate_bp THEN 1 END)::BIGINT AS kept_docs,
        |  coalesce(sum(CASE WHEN u.u_bp < p.rate_bp THEN u.n_chars END), 0)::BIGINT
        |    AS kept_chars,
        |  CASE WHEN p.chars > 0
        |    THEN coalesce(sum(CASE WHEN u.u_bp < p.rate_bp THEN u.n_chars END), 0)
        |         * 10000 // p.chars
        |    ELSE 0 END::BIGINT AS achieved_bp
        |FROM planned p JOIN u ON u.source = p.source
        |GROUP BY p.source, p.n_docs, p.chars, p.target_chars, p.rate_bp
        |ORDER BY p.source""".stripMargin,

    "q144_weighted_sample" ->
      s"""WITH wdocs AS (
        |  SELECT source, doc_id,
        |    least(10, n_chars // 200 + 1) AS w,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT AS u
        |  FROM documents),
        |ranked AS (
        |  SELECT source, doc_id, w,
        |    row_number() OVER (PARTITION BY source
        |                       ORDER BY u // w, doc_id) AS rn
        |  FROM wdocs)
        |SELECT source,
        |  count(*) AS n_total,
        |  count(CASE WHEN rn <= $Q144SampleK THEN 1 END) AS n_sampled,
        |  ((2*sum(w)*10000 + count(*)) // (2*count(*)))::BIGINT AS pop_w_avg_x10k,
        |  ((2*sum(CASE WHEN rn <= $Q144SampleK THEN w END)*10000
        |     + count(CASE WHEN rn <= $Q144SampleK THEN 1 END))
        |    // (2*count(CASE WHEN rn <= $Q144SampleK THEN 1 END)))::BIGINT AS samp_w_avg_x10k
        |FROM ranked GROUP BY source ORDER BY source""".stripMargin,

    "q95_decile_calibration" -> {
      val dSum = (0 until 10).map(i => s"d$i * d$i").mkString(" + ")
      val dCols = (0 until 10)
        .map(i => s"count(CASE WHEN decile = $i THEN 1 END) AS d$i")
        .mkString(",\n        |    ")
      val caseSum = (1 to 9)
        .map(i => s"(CASE WHEN n_chars > c$i THEN 1 ELSE 0 END)")
        .mkString(" +\n        |      ")
      s"""WITH ${Pct.ctes("cuts", "documents", Nil, "n_chars",
            (1 to 9).map(i => s"c$i" -> i / 10.0))},
        |dec AS (
        |  SELECT source,
        |    $caseSum AS decile
        |  FROM documents, cuts),
        |per_src AS (
        |  SELECT source, count(*) AS n_docs,
        |    $dCols
        |  FROM dec GROUP BY source)
        |SELECT source, n_docs, d0, d1, d2, d3, d4, d5, d6, d7, d8, d9,
        |  round((10 * ($dSum) - n_docs * n_docs) / n_docs * 10000) / 10000
        |    AS chi2,
        |  (10 * ($dSum) - n_docs * n_docs) * 4 > 87 * n_docs AS len_skew_flag
        |FROM per_src ORDER BY source""".stripMargin
    },

    "q90_mixture_weights" ->
      """WITH by_src AS (
        |  SELECT source, count(*) AS n_docs, sum(n_chars)::BIGINT AS chars,
        |    round(sqrt(sum(n_chars)::BIGINT) * 10000) / 10000 AS w
        |  FROM documents GROUP BY source),
        |tot AS (
        |  SELECT sum(chars)::BIGINT AS tot_chars,
        |    sum(w::DECIMAL(25,4))::DOUBLE AS tot_w
        |  FROM by_src)
        |SELECT source, n_docs, chars,
        |  round(100.0 * chars / tot_chars * 10000) / 10000 AS raw_share,
        |  round(100.0 * w / tot_w * 10000) / 10000 AS mix_share,
        |  round((w / tot_w) * 1000000.0 / chars * 10000) / 10000 AS epochs
        |FROM by_src CROSS JOIN tot ORDER BY source""".stripMargin,

    "q82_chunk_overlap" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |base AS (
        |  SELECT doc_id, toks, len(toks) AS n_tok FROM toks WHERE len(toks) > 0),
        |chunks AS (
        |  SELECT doc_id, s AS start, toks, n_tok
        |  FROM base, LATERAL (SELECT unnest(generate_series(0, n_tok - 1, 24)) AS s)
        |  WHERE s = 0 OR s < n_tok - 32 + 24)
        |SELECT doc_id, start // 24 AS chunk_id,
        |  least(32, n_tok - start)::INT AS n_toks,
        |  array_to_string(list_slice(toks, start + 1, start + 32), ' ') AS chunk_text
        |FROM chunks ORDER BY doc_id, chunk_id""".stripMargin,

    "q83_source_quota" ->
      """WITH ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY source
        |    ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
        |  FROM documents),
        |kept AS (
        |  SELECT source, count(*) AS n_kept, sum(n_chars)::BIGINT AS kept_chars,
        |    sum(doc_id)::BIGINT AS kept_id_sum
        |  FROM ranked WHERE rn <= 15 GROUP BY source),
        |totals AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source)
        |SELECT source, n_docs, n_kept, n_docs - n_kept AS n_dropped,
        |  kept_chars, kept_id_sum,
        |  round(100.0 * n_kept / n_docs * 100) / 100 AS kept_pct
        |FROM totals JOIN kept USING (source) ORDER BY source""".stripMargin,

    "q60_stratified_sample" ->
      """WITH ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY md5(event_id::VARCHAR), event_id) AS rn
        |  FROM events)
        |SELECT event_type, count(*) AS n_total,
        |  count(CASE WHEN rn <= 100 THEN 1 END) AS n_sampled,
        |  round(sum(value::DECIMAL(25,2))::DOUBLE / count(value) * 10000) / 10000 AS pop_avg_value,
        |  round(sum((CASE WHEN rn <= 100 THEN value END)::DECIMAL(25,2))::DOUBLE /
        |    count(CASE WHEN rn <= 100 THEN value END) * 10000) / 10000 AS sample_avg_value,
        |  round(100.0 * count(CASE WHEN rn <= 100 THEN 1 END) / count(*) * 100) / 100 AS sample_pct
        |FROM ranked GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q61_dataset_split" ->
      """WITH tagged AS (
        |  SELECT *,
        |    CASE WHEN substr(md5(event_id::VARCHAR), 1, 1) <= 'b' THEN 'train'
        |         WHEN substr(md5(event_id::VARCHAR), 1, 1) <= 'd' THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM events),
        |agged AS (
        |  SELECT split, count(*) AS n, count(DISTINCT user_id) AS n_users,
        |    round(sum(value::DECIMAL(25,2))::DOUBLE / count(value) * 10000) / 10000 AS avg_value
        |  FROM tagged GROUP BY split)
        |SELECT split, n, n_users, avg_value,
        |  round(100.0 * n / sum(n) OVER () * 100) / 100 AS pct
        |FROM agged ORDER BY split""".stripMargin,

    "q62_token_packing" ->
      """WITH toks AS (
        |  SELECT source, doc_id,
        |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tok
        |  FROM documents),
        |laid AS (
        |  SELECT source, doc_id, n_tok,
        |    sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_tok
        |  FROM toks)
        |SELECT source, (cum_tok - n_tok) // 512 AS bin,
        |  count(*) AS n_docs, sum(n_tok)::BIGINT AS bin_tokens,
        |  round(sum(n_tok)::BIGINT / 512.0 * 10000) / 10000 AS fill_ratio
        |FROM laid GROUP BY source, (cum_tok - n_tok) // 512
        |ORDER BY source, bin""".stripMargin,

    "q73_pii_scrub" ->
      """WITH lines AS (
        |  SELECT event_type,
        |    'user=' || user_id ||
        |    CASE WHEN k < 50
        |      THEN ' ip=10.' || k || '.' || (k % 7) || '.' || (k % 13)
        |      ELSE '' END ||
        |    ' sess=' || (k % 7) || ' type=' || event_type AS line
        |  FROM (SELECT event_type, user_id,
        |          CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |        FROM events)),
        |masked AS (
        |  SELECT event_type, line,
        |    regexp_replace(
        |      regexp_replace(line, 'user=[0-9]+', 'user=[U]', 'g'),
        |      '10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '[IP]', 'g') AS m
        |  FROM lines)
        |SELECT event_type, count(*) AS n_lines,
        |  sum(len(regexp_extract_all(line,
        |    '10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')))::BIGINT AS n_ip_hits,
        |  sum(len(regexp_extract_all(line, 'user=[0-9]+')))::BIGINT AS n_user_hits,
        |  count(CASE WHEN regexp_matches(m, '[0-9]{4,}') THEN 1 END) AS n_residual_ids,
        |  count(DISTINCT m) AS n_distinct_masked
        |FROM masked GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
