package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftExpressions._
import graft.gen.TranscriptGen
import graft.ops.{Ann, Dedup, TextStats}
import graft.pipeline.QualityFilter

/** Driver contract: `entry` (flagship smoke), `queries` (one per
  * operator; verified row/schema/hash against `oracleSql` run in DuckDB
  * on the same parquet tables), `oracleSql` (ANSI SQL oracles; queries
  * without an entry get a rows-only check).
  *
  * Query keys reference SURVEY.md §2 operator ids.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship: the quality-filter pipeline over a deterministic
    * synthetic transcript corpus (BASELINE.json north_rule). Driver
    * smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    QualityFilter.label(TranscriptGen.generate(spark, 200, seed = 42L, skewCap = 500))

  // Sentinel list shared with the f1 oracle below.
  private val sentinelsSql = "('', '-', '?', '!', '=', 'nan', 'NULL', 'MISSINGVALUE')"
  private val sentinels = Seq("", "-", "?", "!", "=", "nan", "NULL", "MISSINGVALUE")

  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneRe = "\\+?[0-9](?:[0-9()\\-. ]{6,14})[0-9]"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---------------------------------------------------- profiling (A*)
    "a1_count_rows" -> ((s, dir) => {
      t(s, dir, "lineitem").agg(count(lit(1)).as("n_rows"))
    }),

    "a4_case_stats" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      d.groupBy(col("lang")).agg(
          count(lit(1)).as("n"),
          sum(when(col("text") === upper(col("text")), 1).otherwise(0)).cast("long").as("n_upper"),
          sum(when(col("text") === lower(col("text")), 1).otherwise(0)).cast("long").as("n_lower"))
        .orderBy(col("lang"))
    }),

    "a5_minmax_profile" -> ((s, dir) => {
      t(s, dir, "orders").agg(
        round(min(col("o_totalprice")), 2).as("min_price"),
        round(max(col("o_totalprice")), 2).as("max_price"),
        date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("min_date"),
        date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("max_date"),
        min(length(col("o_orderpriority"))).as("min_len"),
        max(length(col("o_orderpriority"))).as("max_len"))
    }),

    "a6_mean_stddev" -> ((s, dir) => {
      t(s, dir, "lineitem").agg(
        round(avg(col("l_quantity")), 4).as("mean_qty"),
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(avg(col("l_extendedprice")), 2).as("mean_price"))
    }),

    "a7_outlier_z" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val stats = li.agg(avg(col("l_extendedprice")).as("mu"),
        stddev_samp(col("l_extendedprice")).as("sd"))
      li.crossJoin(stats)
        .where(abs((col("l_extendedprice") - col("mu")) / col("sd")) > 1.5)
        .agg(count(lit(1)).as("n_outliers"))
    }),

    "a8_outlier_iqr" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val q = li.agg(
        percentile(col("l_extendedprice"), lit(0.25)).as("q1"),
        percentile(col("l_extendedprice"), lit(0.75)).as("q3"))
      li.crossJoin(q)
        .where(col("l_extendedprice") < col("q1") - (col("q3") - col("q1")) * 1.5 ||
               col("l_extendedprice") > col("q3") + (col("q3") - col("q1")) * 1.5)
        .agg(count(lit(1)).as("n_outliers"))
    }),

    "a9_dup_groups" -> ((s, dir) => {
      val g = t(s, dir, "lineitem").groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(count(lit(1)).as("cnt"))
      g.agg(
        sum(when(col("cnt") > 1, 1).otherwise(0)).cast("long").as("n_groups_gt1"),
        sum(when(col("cnt") > 1, col("cnt") - 1).otherwise(0)).cast("long").as("n_extra_rows"))
    }),

    "a10_dup_rows" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_partkey"), col("l_suppkey"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
      t(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") > 1)
        .agg(count(lit(1)).as("n_dup_rows"))
    }),

    "a12_1nf_multitoken" -> ((s, dir) => {
      t(s, dir, "part").agg(
        sum(when(col("p_name").rlike("^\\S+([ ,;-]\\S+)+$"), 1).otherwise(0))
          .cast("long").as("n_multitoken"),
        count(lit(1)).as("n_rows"))
    }),

    "a15_word_count" -> ((s, dir) => {
      t(s, dir, "documents").groupBy(col("lang"))
        .agg(round(avg(TextStats.tokenCountCol(col("text"))), 4).as("avg_tokens"))
        .orderBy(col("lang"))
    }),

    // ------------------------------------------- row-level checks (F*)
    "f1_missing_sentinels" -> ((s, dir) => {
      val missing = col("text").isNull || trim(col("text")).isin(sentinels: _*)
      t(s, dir, "documents").agg(
        count(lit(1)).as("n_rows"),
        sum(when(missing, 1).otherwise(0)).cast("long").as("n_missing"),
        sum(when(!missing, 1).otherwise(0)).cast("long").as("n_nonmissing"))
    }),

    "c2_outlier_impute" -> ((s, dir) => {
      // C2/C13: replace IQR outliers by the column mean (and median
      // variant), computed from 1-row stats (no driver loop)
      val li = t(s, dir, "lineitem")
      val stats = li.agg(
        percentile(col("l_extendedprice"), lit(0.25)).as("q1"),
        percentile(col("l_extendedprice"), lit(0.75)).as("q3"),
        round(avg(col("l_extendedprice")), 2).as("mu"),
        round(percentile(col("l_extendedprice"), lit(0.5)), 2).as("med"))
      val lo = col("q1") - (col("q3") - col("q1")) * 1.5
      val hi = col("q3") + (col("q3") - col("q1")) * 1.5
      val isOut = col("l_extendedprice") < lo || col("l_extendedprice") > hi
      li.crossJoin(stats)
        .select(
          when(isOut, col("mu")).otherwise(round(col("l_extendedprice"), 2)).as("imputed_mean"),
          when(isOut, col("med")).otherwise(round(col("l_extendedprice"), 2)).as("imputed_median"),
          isOut.cast("int").as("was_outlier"))
        .agg(round(sum(col("imputed_mean")), 2).as("sum_mean_imputed"),
          round(sum(col("imputed_median")), 2).as("sum_median_imputed"),
          sum(col("was_outlier")).cast("long").as("n_imputed"))
    }),

    "f4_regex_scan" -> ((s, dir) => {
      // texts in the corpus are clean; append deterministic dirt so the
      // violation scans actually fire (same construction in the oracle)
      val dirty = concat(col("text"),
        when(col("doc_id") % 7 === 0, lit("  double  space"))
          .when(col("doc_id") % 11 === 0, lit(" w@ird ch@rs!!"))
          .otherwise(lit("")))
      t(s, dir, "documents").select(col("source"), dirty.as("dirty"))
        .groupBy(col("source")).agg(
          sum(when(col("dirty").rlike("\\s{2,}"), 1).otherwise(0)).cast("long").as("n_ws"),
          sum(when(col("dirty").rlike("[^a-zA-Z0-9\\s]"), 1).otherwise(0)).cast("long").as("n_special"))
        .orderBy(col("source"))
    }),

    "f9_anti_dict" -> ((s, dir) => {
      val allowed = s.createDataFrame(Seq(Tuple1("EN"), Tuple1("FR"), Tuple1("DE")))
        .toDF("allowed_lang")
      t(s, dir, "documents")
        .join(broadcast(allowed), upper(col("lang")) === col("allowed_lang"), "left_anti")
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang"))
    }),

    // --------------------------------------------------------- joins (J*)
    "j2_suggest_join" -> ((s, dir) => {
      val anomalies = s.createDataFrame(Seq(
        Tuple1("NATON_3"), Tuple1("NATIION_12"), Tuple1("NATOIN_7"),
        Tuple1("NATION 21"), Tuple1("nation_5"), Tuple1("XQZVWK")
      )).toDF("val")
      val scored = anomalies.crossJoin(broadcast(t(s, dir, "nation")))
        .select(col("val"), col("n_name"),
          round(jaro_winkler(upper(col("val")), upper(col("n_name"))), 6).as("sim"))
        .where(col("sim") >= 0.85)
      val w = Window.partitionBy(col("val")).orderBy(col("sim").desc, col("n_name").asc)
      scored.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("val"), col("n_name").as("suggestion"), col("sim"))
        .orderBy(col("val"))
    }),

    "j2b_suggest_multichannel" -> ((s, dir) => {
      // J2's multi-channel scoring (functions.sql:1665-1727): each
      // anomaly scored on several channels (raw name, specials-stripped
      // name, upper-cased), keep GREATEST; top-1 per anomaly
      val anomalies = s.createDataFrame(Seq(
        Tuple1("NAT-ION_3"), Tuple1("nation 12!"), Tuple1("NATIO__N_7")
      )).toDF("val")
      val strip = (c: org.apache.spark.sql.Column) =>
        regexp_replace(upper(c), "[^A-Z0-9]", "")
      val scored = anomalies.crossJoin(broadcast(t(s, dir, "nation")))
        .select(col("val"), col("n_name"),
          round(greatest(
            jaro_winkler(upper(col("val")), upper(col("n_name"))),
            jaro_winkler(strip(col("val")), strip(col("n_name")))
          ), 6).as("sim"))
        .where(col("sim") >= 0.85)
      val w = Window.partitionBy(col("val")).orderBy(col("sim").desc, col("n_name").asc)
      scored.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("val"), col("n_name").as("suggestion"), col("sim"))
        .orderBy(col("val"))
    }),

    "j4_translate_lookup" -> ((s, dir) => {
      t(s, dir, "nation").join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"), "left")
        .select(col("n_name"), coalesce(col("r_name"), lit("")).as("region"))
        .orderBy(col("n_name"))
    }),

    "jw1_jaro_winkler" -> ((s, dir) => {
      val n1 = t(s, dir, "nation").select(col("n_nationkey").as("k1"), col("n_name").as("a"))
      val n2 = t(s, dir, "nation").select(col("n_nationkey").as("k2"), col("n_name").as("b"))
      n1.crossJoin(broadcast(n2)).where(col("k1") < col("k2"))
        .select(col("a"), col("b"), round(jaro_winkler(col("a"), col("b")), 6).as("sim"))
        .where(col("sim") > 0.5)
        .orderBy(col("a"), col("b"))
    }),

    "q2_join_revenue" -> ((s, dir) => {
      t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("n_name"))
    }),

    // --------------------------------------------------- classic agg/sort
    "q1_pricing_agg" -> ((s, dir) => {
      t(s, dir, "lineitem").groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "o1_topk_orders" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("total"))
        .orderBy(col("total").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    // ------------------------------------------------------ windows (W*)
    "w1_window_sessions" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("gap",
          unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("gap").isNull || col("gap") > 1800, 1).otherwise(0))
            .cast("long").as("n_sessions"))
        .orderBy(col("user_id"))
    }),

    // ------------------------------------------------------- scrubs (C*)
    "c6_scrub_email" -> ((s, dir) => {
      val dirty = concat(lit("reach "), col("source"), lit("_"),
        col("doc_id").cast("string"), lit("@corp.example.com or bob.smith"),
        col("doc_id").cast("string"), lit("@mail.org done"))
      t(s, dir, "documents").where(col("doc_id") < 40)
        .select(col("doc_id"), regexp_replace(dirty, emailRe, "<EMAIL>").as("scrubbed"))
        .orderBy(col("doc_id"))
    }),

    "c7_scrub_phone" -> ((s, dir) => {
      val digits = lpad(((col("doc_id") * 977) % 1000000000).cast("string"), 9, "0")
      val dirty = concat(lit("call +33"), digits, lit(" now or (415) 555-01"),
        lpad((col("doc_id") % 100).cast("string"), 2, "0"), lit(" later"))
      t(s, dir, "documents").where(col("doc_id") < 40)
        .select(col("doc_id"), regexp_replace(dirty, phoneRe, "<PHONE>").as("scrubbed"))
        .orderBy(col("doc_id"))
    }),

    // ------------------------------------------------- dedup suite (DD*)
    "dd1_dedup_exact" -> ((s, dir) => {
      Dedup.exactStats(t(s, dir, "documents"), "text")
    }),

    "dd2_minhash_pairs" -> ((s, dir) => {
      Dedup.minHashPairs(t(s, dir, "documents"), "text", "doc_id",
          numHashes = 64, bands = 16, shingleK = 3, threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    "dd3_simhash_pairs" -> ((s, dir) => {
      Dedup.simHashPairs(t(s, dir, "documents"), "text", "doc_id", maxHamming = 8)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "dd4_consecutive_jaccard" -> ((s, dir) => {
      Dedup.consecutiveJaccard(
          t(s, dir, "documents").where(col("doc_id") < 50), "text", "doc_id", 2)
        .orderBy(col("id_a"))
    }),

    // ---------------------------------------------------- ANN suite (ANN*)
    "ann1_brute_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Ann.bruteForceTopK(e, e.where(col("vec_id") < 8), k = 3)
        .orderBy(col("qid"), col("nid"))
    }),

    "ann2_lsh_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Ann.lshTopK(e, e.where(col("vec_id") < 8), k = 3, tables = 8, bits = 8)
        .orderBy(col("qid"), col("nid"))
    }),

    "ann4_ivf_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Ann.ivfTopK(e, e.where(col("vec_id") < 8), k = 3, nCells = 16, nProbe = 6)
        .orderBy(col("qid"), col("nid"))
    }),

    "ann3_embed_neardup" -> ((s, dir) => {
      Ann.cosineNearDupPairs(t(s, dir, "embeddings"), threshold = 0.35)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ------------------------------------------------- text analysis (TS*)
    "ts1_token_quality" -> ((s, dir) => {
      t(s, dir, "documents").where(col("doc_id") < 40)
        .select(col("doc_id"),
          TextStats.tokenCountCol(col("text")).as("n_tokens"),
          round(TextStats.stopwordRatioCol(col("text")), 6).as("stopword_ratio"),
          round(TextStats.symbolRatioCol(col("text")), 6).as("symbol_ratio"),
          TextStats.qualityScoreCol(col("text")).as("quality"))
        .orderBy(col("doc_id"))
    }),

    "ts2_fingerprint" -> ((s, dir) => {
      // fingerprint is whitespace/case-insensitive: fp(text) must equal
      // fp of the uppercased double-spaced variant
      t(s, dir, "documents").where(col("doc_id") < 100)
        .select(col("doc_id"),
          TextStats.fingerprintCol(col("text")).as("fp"),
          (TextStats.fingerprintCol(col("text")) ===
            TextStats.fingerprintCol(upper(regexp_replace(col("text"), " ", "  "))))
            .as("stable"))
        .orderBy(col("doc_id"))
    }),

    "f10_special_chars" -> ((s, dir) => {
      // per-row special-character extraction (functions.sql:1050-1085 /
      // update_functions.sql:2-51): strip everything alnum/space, keep
      // rows that had any specials; dirt synthesized deterministically
      val dirty = concat(col("text"),
        when(col("doc_id") % 5 === 0, lit(" sp@ci&l#chars!"))
          .when(col("doc_id") % 9 === 0, lit(" (parens) [brackets]"))
          .otherwise(lit("")))
      t(s, dir, "documents").where(col("doc_id") < 200)
        .select(col("doc_id"),
          regexp_replace(dirty, "[a-zA-Z0-9\\s]", "").as("specials"))
        .where(length(col("specials")) > 0)
        .orderBy(col("doc_id"))
    }),

    "f15_amount_predicate" -> ((s, dir) => {
      val v = when(col("doc_id") % 3 === 0,
          concat((col("doc_id") % 900).cast("string"), lit(" $")))
        .when(col("doc_id") % 3 === 1,
          concat(lit("EUR "), (col("doc_id") % 900).cast("string")))
        .otherwise(lit("not money"))
      t(s, dir, "documents").select(v.as("v")).agg(
        sum(col("v").rlike("^\\d+\\s*\\$$").cast("long")).as("n_amount_suffix"),
        sum(col("v").rlike("^(USD|EUR|GBP)\\s*\\d+$").cast("long")).as("n_amount_prefix"))
    }),

    // ---------------------------------- semantic types + corrections
    "f8_date_classify" -> ((s, dir) => {
      import graft.ops.SemanticTypes
      val raw = when(col("o_orderkey") % 3 === 0, date_format(col("o_orderdate"), "yyyy-MM-dd"))
        .when(col("o_orderkey") % 3 === 1, date_format(col("o_orderdate"), "MM/dd/yyyy"))
        .otherwise(date_format(col("o_orderdate"), "dd.MM.yyyy"))
      t(s, dir, "orders").where(col("o_orderkey") < 200)
        .select(col("o_orderkey"), raw.as("raw"))
        .select(col("o_orderkey"), col("raw"),
          SemanticTypes.classifyDateFormat(col("raw")).as("fmt"),
          SemanticTypes.reformatDate(col("raw")).as("fixed"))
        .orderBy(col("o_orderkey"))
    }),

    "f12_semantic_predicates" -> ((s, dir) => {
      import graft.ops.SemanticTypes._
      val v = when(col("doc_id") % 4 === 0,
          concat(lit("user"), col("doc_id").cast("string"), lit("@example.com")))
        .when(col("doc_id") % 4 === 1,
          concat(lit("+33"), lpad((col("doc_id") % 1000000000).cast("string"), 9, "0")))
        .when(col("doc_id") % 4 === 2,
          concat(col("doc_id").cast("string"), lit(".5")))
        .otherwise(lit("plainword"))
      t(s, dir, "documents").select(v.as("v")).agg(
        sum(isEmail(col("v")).cast("long")).as("n_email"),
        sum(isPhone(col("v")).cast("long")).as("n_phone"),
        sum(isNumeric(col("v")).cast("long")).as("n_numeric"))
    }),

    "a16_type_vote" -> ((s, dir) => {
      import graft.ops.SemanticTypes
      val v = when(col("doc_id") % 10 < 7, concat(col("doc_id").cast("string"), lit(".25")))
        .otherwise(lit("notanumber"))
      SemanticTypes.majorityType(
        t(s, dir, "documents").select(col("doc_id"), v.as("v")), "v", "doc_id")
    }),

    "c10_case_normalize" -> ((s, dir) => {
      import graft.ops.Corrections
      t(s, dir, "customer").where(col("c_custkey") < 40)
        .select(col("c_custkey"),
          Corrections.capitalize(col("c_mktsegment")).as("cap"),
          upper(col("c_name")).as("up"),
          lower(col("c_name")).as("lo"))
        .orderBy(col("c_custkey"))
    }),

    "c12_currency" -> ((s, dir) => {
      import graft.ops.Corrections
      val money = concat(lit("$"), col("p_size").cast("string"), lit(".99"))
      t(s, dir, "part").where(col("p_partkey") < 60)
        .select(col("p_partkey"), money.as("raw"),
          Corrections.currencyToNumber(money, 0.85).as("converted"))
        .orderBy(col("p_partkey"))
    }),

    "a11_dup_columns" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_quantity"), col("l_quantity").as("q2"), col("l_discount"))
        .agg(
          (max(when(!(col("l_quantity") <=> col("q2")), 1).otherwise(0)) === 0).as("q_q2_dup"),
          (max(when(!(col("l_quantity") <=> col("l_discount")), 1).otherwise(0)) === 0).as("q_disc_dup"))
    }),

    "c15_split_column" -> ((s, dir) => {
      val v = concat(col("source"), lit(" "), col("lang"))
      t(s, dir, "documents").where(col("doc_id") < 30)
        .select(col("doc_id"),
          split(v, " ").getItem(0).as("part0"),
          split(v, " ").getItem(1).as("part1"))
        .orderBy(col("doc_id"))
    }),

    "a14_quality_score" -> ((s, dir) => {
      val anomalous = col("text").rlike("[^a-zA-Z0-9\\s]") || length(col("text")) < 20
      t(s, dir, "documents").groupBy(col("source"))
        .agg(round(lit(100.0) - lit(100.0) *
          sum(anomalous.cast("double")) / count(lit(1)), 4).as("score"))
        .orderBy(col("source"))
    }),

    // ------------------------------------------ sources / exports / views
    "s1_csv_roundtrip" -> ((s, dir) => {
      import graft.sources.Sources
      val path = "/tmp/graft_csv_roundtrip"
      Sources.exportCsv(t(s, dir, "nation"), path, Seq("n_nationkey"))
      Sources.readCsv(s, path, header = true,
          schema = Some(org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("n_nationkey", org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("n_name", org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("n_regionkey", org.apache.spark.sql.types.IntegerType)))))
        .orderBy(col("n_nationkey"))
    }),

    "s9_ordered_export" -> ((s, dir) => {
      t(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus"))
        .orderBy(col("o_orderkey")).limit(50)
    }),

    "s12_sql_view" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("graft_customer_v")
      s.sql("""SELECT c_mktsegment, count(*) AS n,
               round(avg(c_acctbal), 2) AS avg_bal
               FROM graft_customer_v GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    }),

    "o4_set_ops" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").cast("int").as("k")).distinct()
      val n = t(s, dir, "nation").select(col("n_nationkey").cast("int").as("k"))
      val exceptCnt = c.except(n).count()
      val intersectCnt = c.intersect(n).count()
      s.range(1).select(lit(exceptCnt).as("n_except"), lit(intersectCnt).as("n_intersect"))
    }),

    "j3_suggest_generic" -> ((s, dir) => {
      val anomalies = s.createDataFrame(Seq(
        Tuple1("AUTOMOBIL"), Tuple1("FURNITURES"), Tuple1("MACHINNERY"),
        Tuple1("HOUSHOLD"), Tuple1("BULDING"), Tuple1("ZZZZZZ")
      )).toDF("val")
      val dict = t(s, dir, "customer").select(col("c_mktsegment")).distinct()
      val scored = anomalies.crossJoin(broadcast(dict))
        .select(col("val"), col("c_mktsegment"),
          round(jaro_winkler(upper(col("val")), upper(col("c_mktsegment"))), 6).as("sim"))
        .where(col("sim") >= 0.85)
      val w = Window.partitionBy(col("val")).orderBy(col("sim").desc, col("c_mktsegment").asc)
      scored.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("val"), col("c_mktsegment").as("suggestion"), col("sim"))
        .orderBy(col("val"))
    }),

    "a3_profile" -> ((s, dir) => {
      TextStats.profile(t(s, dir, "documents"), "text", "source")
    }),

    "ts3_bpe_tokens" -> ((s, dir) => {
      // BPE-ish tokenization: word pieces + standalone punctuation
      t(s, dir, "documents").groupBy(col("lang"))
        .agg(sum(size(regexp_extract_all(col("text"), lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0))))
          .cast("long").as("n_tokens"))
        .orderBy(col("lang"))
    }),

    "lid1_langid_docs" -> ((s, dir) => {
      // broadcast-model language-ID over the documents table (rows-only:
      // the model is ours, not SQL-expressible)
      import s.implicits._
      val bc = s.sparkContext.broadcast(graft.lang.LangId.default)
      val scored = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions { it =>
          val m = bc.value
          it.map { case (id, text) =>
            val (l, c) = m.classify(text)
            (id, l, math.round(c * 10000.0) / 10000.0)
          }
        }.toDF("doc_id", "pred_lang", "conf")
      scored.groupBy(col("pred_lang"))
        .agg(count(lit(1)).as("n"), round(avg(col("conf")), 4).as("avg_conf"))
        .orderBy(col("pred_lang"))
    }),

    // --------------------------------------------------- multimodal stub
    "mm1_multimodal_features" -> ((s, dir) => {
      import graft.ops.Multimodal
      val media = Multimodal.synthesize(s,
        t(s, dir, "documents").where(col("doc_id") < 50), "doc_id")
      Multimodal.featurize(media).toDF()
        .select(col("media_id"), col("mime"), col("n_bytes"),
          round(col("brightness"), 6).as("brightness"))
        .orderBy(col("media_id"))
    }),

    "dp1_doc_pipeline" -> ((s, dir) => {
      graft.ops.DocPipeline.label(t(s, dir, "documents"))
        .select(col("doc_id"), col("keep"),
          concat_ws("|", col("drop_reasons")).as("reasons"),
          col("lang"), col("quality"))
        .orderBy(col("doc_id"))
    }),

    // -------------------------------------------------- flagship pipeline
    "qf1_quality_filter" -> ((s, _) => {
      QualityFilter.label(TranscriptGen.generate(s, 500, seed = 42L, skewCap = 2000))
        .select(col("conv_id"), col("turn_idx"), col("keep"),
          concat_ws("|", col("drop_reasons")).as("reasons"),
          col("scrubbed_text"), col("lang"), round(col("ppl"), 4).as("ppl"))
        .orderBy(col("conv_id"), col("turn_idx"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "a1_count_rows" ->
      "SELECT count(*) AS n_rows FROM lineitem",

    "a4_case_stats" ->
      """SELECT lang, count(*) AS n,
         CAST(sum(CASE WHEN text = upper(text) THEN 1 ELSE 0 END) AS BIGINT) AS n_upper,
         CAST(sum(CASE WHEN text = lower(text) THEN 1 ELSE 0 END) AS BIGINT) AS n_lower
         FROM documents GROUP BY lang ORDER BY lang""",

    "a5_minmax_profile" ->
      """SELECT round(min(o_totalprice), 2) AS min_price,
         round(max(o_totalprice), 2) AS max_price,
         strftime(min(o_orderdate), '%Y-%m-%d') AS min_date,
         strftime(max(o_orderdate), '%Y-%m-%d') AS max_date,
         min(length(o_orderpriority)) AS min_len,
         max(length(o_orderpriority)) AS max_len
         FROM orders""",

    "a6_mean_stddev" ->
      """SELECT round(avg(l_quantity), 4) AS mean_qty,
         round(stddev_samp(l_quantity), 4) AS sd_qty,
         round(avg(l_extendedprice), 2) AS mean_price
         FROM lineitem""",

    "a7_outlier_z" ->
      """WITH s AS (SELECT avg(l_extendedprice) AS mu, stddev_samp(l_extendedprice) AS sd FROM lineitem)
         SELECT count(*) AS n_outliers FROM lineitem, s
         WHERE abs((l_extendedprice - mu) / sd) > 1.5""",

    "a8_outlier_iqr" ->
      """WITH q AS (SELECT quantile_cont(l_extendedprice, 0.25) AS q1,
                           quantile_cont(l_extendedprice, 0.75) AS q3 FROM lineitem)
         SELECT count(*) AS n_outliers FROM lineitem, q
         WHERE l_extendedprice < q1 - (q3 - q1) * 1.5
            OR l_extendedprice > q3 + (q3 - q1) * 1.5""",

    "a9_dup_groups" ->
      """WITH g AS (SELECT l_partkey, l_suppkey, count(*) AS cnt
                    FROM lineitem GROUP BY l_partkey, l_suppkey)
         SELECT CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_groups_gt1,
                CAST(sum(CASE WHEN cnt > 1 THEN cnt - 1 ELSE 0 END) AS BIGINT) AS n_extra_rows
         FROM g""",

    "a10_dup_rows" ->
      """SELECT count(*) AS n_dup_rows FROM (
           SELECT row_number() OVER (PARTITION BY l_partkey, l_suppkey
                                     ORDER BY l_orderkey, l_linenumber) AS rn
           FROM lineitem) WHERE rn > 1""",

    "a12_1nf_multitoken" ->
      """SELECT CAST(sum(CASE WHEN regexp_matches(p_name, '^\S+([ ,;-]\S+)+$') THEN 1 ELSE 0 END) AS BIGINT) AS n_multitoken,
                count(*) AS n_rows FROM part""",

    "a15_word_count" ->
      """SELECT lang, round(avg(len(string_split_regex(trim(text), '\s+'))), 4) AS avg_tokens
         FROM documents GROUP BY lang ORDER BY lang""",

    "f1_missing_sentinels" ->
      s"""SELECT count(*) AS n_rows,
          CAST(sum(CASE WHEN text IS NULL OR trim(text) IN $sentinelsSql THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
          CAST(sum(CASE WHEN NOT (text IS NULL OR trim(text) IN $sentinelsSql) THEN 1 ELSE 0 END) AS BIGINT) AS n_nonmissing
          FROM documents""",

    "c2_outlier_impute" ->
      """WITH s AS (SELECT quantile_cont(l_extendedprice, 0.25) AS q1,
                           quantile_cont(l_extendedprice, 0.75) AS q3,
                           round(avg(l_extendedprice), 2) AS mu,
                           round(quantile_cont(l_extendedprice, 0.5), 2) AS med
                    FROM lineitem),
         f AS (SELECT CASE WHEN l_extendedprice < q1 - (q3 - q1) * 1.5
                             OR l_extendedprice > q3 + (q3 - q1) * 1.5
                           THEN 1 ELSE 0 END AS was_outlier,
                      l_extendedprice, mu, med FROM lineitem, s)
         SELECT round(sum(CASE WHEN was_outlier = 1 THEN mu ELSE round(l_extendedprice, 2) END), 2) AS sum_mean_imputed,
                round(sum(CASE WHEN was_outlier = 1 THEN med ELSE round(l_extendedprice, 2) END), 2) AS sum_median_imputed,
                CAST(sum(was_outlier) AS BIGINT) AS n_imputed
         FROM f""",

    "f4_regex_scan" ->
      """WITH d AS (SELECT source, text ||
           CASE WHEN doc_id % 7 = 0 THEN '  double  space'
                WHEN doc_id % 11 = 0 THEN ' w@ird ch@rs!!'
                ELSE '' END AS dirty FROM documents)
         SELECT source,
           CAST(sum(CASE WHEN regexp_matches(dirty, '\s{2,}') THEN 1 ELSE 0 END) AS BIGINT) AS n_ws,
           CAST(sum(CASE WHEN regexp_matches(dirty, '[^a-zA-Z0-9\s]') THEN 1 ELSE 0 END) AS BIGINT) AS n_special
         FROM d GROUP BY source ORDER BY source""",

    "f9_anti_dict" ->
      """SELECT lang, count(*) AS n FROM documents
         WHERE upper(lang) NOT IN ('EN', 'FR', 'DE')
         GROUP BY lang ORDER BY lang""",

    "j2_suggest_join" ->
      """WITH anom(val) AS (VALUES ('NATON_3'), ('NATIION_12'), ('NATOIN_7'),
                                   ('NATION 21'), ('nation_5'), ('XQZVWK')),
         s AS (SELECT val, n_name,
                 round(jaro_winkler_similarity(upper(val), upper(n_name)), 6) AS sim
               FROM anom, nation)
         SELECT val, n_name AS suggestion, sim FROM (
           SELECT *, row_number() OVER (PARTITION BY val ORDER BY sim DESC, n_name) AS rn
           FROM s WHERE sim >= 0.85)
         WHERE rn = 1 ORDER BY val""",

    "j2b_suggest_multichannel" ->
      """WITH anom(val) AS (VALUES ('NAT-ION_3'), ('nation 12!'), ('NATIO__N_7')),
         s AS (SELECT val, n_name,
                 round(greatest(
                   jaro_winkler_similarity(upper(val), upper(n_name)),
                   jaro_winkler_similarity(
                     regexp_replace(upper(val), '[^A-Z0-9]', '', 'g'),
                     regexp_replace(upper(n_name), '[^A-Z0-9]', '', 'g'))
                 ), 6) AS sim
               FROM anom, nation)
         SELECT val, n_name AS suggestion, sim FROM (
           SELECT *, row_number() OVER (PARTITION BY val ORDER BY sim DESC, n_name) AS rn
           FROM s WHERE sim >= 0.85)
         WHERE rn = 1 ORDER BY val""",

    "j4_translate_lookup" ->
      """SELECT n_name, coalesce(r_name, '') AS region
         FROM nation LEFT JOIN region ON n_regionkey = r_regionkey
         ORDER BY n_name""",

    "jw1_jaro_winkler" ->
      """SELECT a, b, sim FROM (
           SELECT n1.n_name AS a, n2.n_name AS b,
                  round(jaro_winkler_similarity(n1.n_name, n2.n_name), 6) AS sim
           FROM nation n1, nation n2 WHERE n1.n_nationkey < n2.n_nationkey)
         WHERE sim > 0.5 ORDER BY a, b""",

    "q2_join_revenue" ->
      """SELECT n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
                     JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",

    "q1_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base,
         round(avg(l_discount), 6) AS avg_disc,
         count(*) AS cnt
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "o1_topk_orders" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
         FROM orders ORDER BY round(o_totalprice, 2) DESC, o_orderkey LIMIT 10""",

    "w1_window_sessions" ->
      """WITH g AS (SELECT user_id,
           epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
           FROM events)
         SELECT user_id, count(*) AS n_events,
           CAST(sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
         FROM g GROUP BY user_id ORDER BY user_id""",

    "c6_scrub_email" ->
      """SELECT doc_id, regexp_replace(
           'reach ' || source || '_' || CAST(doc_id AS VARCHAR) ||
           '@corp.example.com or bob.smith' || CAST(doc_id AS VARCHAR) || '@mail.org done',
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS scrubbed
         FROM documents WHERE doc_id < 40 ORDER BY doc_id""",

    "c7_scrub_phone" ->
      """SELECT doc_id, regexp_replace(
           'call +33' || lpad(CAST((doc_id * 977) % 1000000000 AS VARCHAR), 9, '0') ||
           ' now or (415) 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || ' later',
           '\+?[0-9](?:[0-9()\-. ]{6,14})[0-9]', '<PHONE>', 'g') AS scrubbed
         FROM documents WHERE doc_id < 40 ORDER BY doc_id""",

    "dd1_dedup_exact" ->
      "SELECT count(*) AS n_rows, count(DISTINCT text) AS n_unique FROM documents",

    "ann1_brute_topk" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 8),
         s AS (SELECT qid, vec_id AS nid,
                 round(list_cosine_similarity(CAST(qvec AS DOUBLE[]), CAST(embedding AS DOUBLE[])), 4) AS sim
               FROM q, embeddings WHERE vec_id <> qid)
         SELECT qid, nid, sim FROM (
           SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn FROM s)
         WHERE rn <= 3 ORDER BY qid, nid""",

    "a3_profile" ->
      """SELECT source, count(*) AS n_rows,
           CAST(sum(CASE WHEN text IS NULL OR trim(text) = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_blank,
           min(length(text)) AS min_len, max(length(text)) AS max_len,
           round(avg(length(text)), 4) AS avg_len,
           CAST(sum(CASE WHEN text = upper(text) THEN 1 ELSE 0 END) AS BIGINT) AS n_upper,
           CAST(sum(CASE WHEN text = lower(text) THEN 1 ELSE 0 END) AS BIGINT) AS n_lower,
           round(avg(len(string_split_regex(trim(text), '\s+'))), 4) AS avg_tokens
         FROM documents GROUP BY source ORDER BY source""",

    "ts3_bpe_tokens" ->
      """SELECT lang, CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS n_tokens
         FROM documents GROUP BY lang ORDER BY lang""",

    "f10_special_chars" ->
      """WITH d AS (SELECT doc_id, text ||
           CASE WHEN doc_id % 5 = 0 THEN ' sp@ci&l#chars!'
                WHEN doc_id % 9 = 0 THEN ' (parens) [brackets]'
                ELSE '' END AS dirty
           FROM documents WHERE doc_id < 200)
         SELECT doc_id, regexp_replace(dirty, '[a-zA-Z0-9\s]', '', 'g') AS specials
         FROM d WHERE length(regexp_replace(dirty, '[a-zA-Z0-9\s]', '', 'g')) > 0
         ORDER BY doc_id""",

    "f15_amount_predicate" ->
      """WITH v AS (SELECT CASE CAST(doc_id % 3 AS INTEGER)
           WHEN 0 THEN CAST(doc_id % 900 AS VARCHAR) || ' $'
           WHEN 1 THEN 'EUR ' || CAST(doc_id % 900 AS VARCHAR)
           ELSE 'not money' END AS v FROM documents)
         SELECT
           CAST(sum(CASE WHEN regexp_matches(v, '^\d+\s*\$$') THEN 1 ELSE 0 END) AS BIGINT) AS n_amount_suffix,
           CAST(sum(CASE WHEN regexp_matches(v, '^(USD|EUR|GBP)\s*\d+$') THEN 1 ELSE 0 END) AS BIGINT) AS n_amount_prefix
         FROM v""",

    "f8_date_classify" ->
      """WITH d AS (SELECT o_orderkey,
           CASE CAST(o_orderkey % 3 AS INTEGER)
             WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d')
             WHEN 1 THEN strftime(o_orderdate, '%m/%d/%Y')
             ELSE strftime(o_orderdate, '%d.%m.%Y') END AS raw
           FROM orders WHERE o_orderkey < 200)
         SELECT o_orderkey, raw,
           CASE WHEN regexp_matches(raw, '^\d{4}-\d{2}-\d{2}$') THEN 'YYYY-MM-DD'
                WHEN regexp_matches(raw, '^\d{2}/\d{2}/\d{4}$') THEN 'MM/DD/YYYY'
                WHEN regexp_matches(raw, '^\d{2}\.\d{2}\.\d{4}$') THEN 'DD.MM.YYYY'
                WHEN regexp_matches(raw, '^\d{8}$') THEN 'YYYYMMDD'
                ELSE 'Format de date inconnu' END AS fmt,
           strftime(CASE
             WHEN regexp_matches(raw, '^\d{4}-\d{2}-\d{2}$') THEN strptime(raw, '%Y-%m-%d')
             WHEN regexp_matches(raw, '^\d{2}/\d{2}/\d{4}$') THEN strptime(raw, '%m/%d/%Y')
             ELSE strptime(raw, '%d.%m.%Y') END, '%m-%d-%Y') AS fixed
         FROM d ORDER BY o_orderkey""",

    "f12_semantic_predicates" ->
      """WITH v AS (SELECT CASE CAST(doc_id % 4 AS INTEGER)
           WHEN 0 THEN 'user' || CAST(doc_id AS VARCHAR) || '@example.com'
           WHEN 1 THEN '+33' || lpad(CAST(doc_id % 1000000000 AS VARCHAR), 9, '0')
           WHEN 2 THEN CAST(doc_id AS VARCHAR) || '.5'
           ELSE 'plainword' END AS v FROM documents)
         SELECT
           CAST(sum(CASE WHEN regexp_matches(v, '^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$') THEN 1 ELSE 0 END) AS BIGINT) AS n_email,
           CAST(sum(CASE WHEN regexp_matches(v, '^\+?[0-9.\s-]{10,20}$') THEN 1 ELSE 0 END) AS BIGINT) AS n_phone,
           CAST(sum(CASE WHEN regexp_matches(v, '^-?\d*\.?\d+$') THEN 1 ELSE 0 END) AS BIGINT) AS n_numeric
         FROM v""",

    "a16_type_vote" ->
      """WITH s AS (SELECT CASE WHEN CAST(doc_id % 10 AS INTEGER) < 7
             THEN CAST(doc_id AS VARCHAR) || '.25' ELSE 'notanumber' END AS v
           FROM documents WHERE doc_id IS NOT NULL ORDER BY doc_id LIMIT 20),
         r AS (SELECT
           avg(CASE WHEN regexp_matches(v, '^-?\d*\.?\d+$') THEN 1.0 ELSE 0.0 END) AS numerique,
           avg(CASE WHEN regexp_matches(v, '^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$') THEN 1.0 ELSE 0.0 END) AS email,
           avg(CASE WHEN regexp_matches(v, '^\+?[0-9.\s-]{10,20}$') THEN 1.0 ELSE 0.0 END) AS phone,
           avg(CASE WHEN regexp_matches(v, '^\d{4}-\d{2}-\d{2}$')
                 OR regexp_matches(v, '^\d{2}/\d{2}/\d{4}$')
                 OR regexp_matches(v, '^\d{2}\.\d{2}\.\d{4}$')
                 OR regexp_matches(v, '^\d{8}$') THEN 1.0 ELSE 0.0 END) AS date
           FROM s)
         SELECT
           CASE WHEN numerique > 0.6 THEN 'numerique'
                WHEN date > 0.6 THEN 'date'
                WHEN phone > 0.6 THEN 'phone'
                WHEN email > 0.6 THEN 'email'
                WHEN greatest(numerique, date, phone, email) > 0.5 THEN
                  CASE greatest(numerique, date, phone, email)
                    WHEN numerique THEN 'numerique' WHEN date THEN 'date'
                    WHEN phone THEN 'phone' ELSE 'email' END
                ELSE 'UNKNOWN' END AS detected_type,
           round(numerique, 4) AS rate_numerique, round(date, 4) AS rate_date,
           round(phone, 4) AS rate_phone, round(email, 4) AS rate_email
         FROM r""",

    "c10_case_normalize" ->
      """SELECT c_custkey,
           upper(substr(c_mktsegment, 1, 1)) || lower(substr(c_mktsegment, 2)) AS cap,
           upper(c_name) AS up, lower(c_name) AS lo
         FROM customer WHERE c_custkey < 40 ORDER BY c_custkey""",

    "c12_currency" ->
      """SELECT p_partkey, '$' || CAST(p_size AS VARCHAR) || '.99' AS raw,
           round(CAST(regexp_replace('$' || CAST(p_size AS VARCHAR) || '.99',
             '[^0-9.]+', '', 'g') AS DOUBLE) * 0.85, 2) AS converted
         FROM part WHERE p_partkey < 60 ORDER BY p_partkey""",

    "a11_dup_columns" ->
      """SELECT max(CASE WHEN l_quantity IS DISTINCT FROM l_quantity THEN 1 ELSE 0 END) = 0 AS q_q2_dup,
                max(CASE WHEN l_quantity IS DISTINCT FROM l_discount THEN 1 ELSE 0 END) = 0 AS q_disc_dup
         FROM lineitem""",

    "c15_split_column" ->
      """SELECT doc_id,
           string_split(source || ' ' || lang, ' ')[1] AS part0,
           string_split(source || ' ' || lang, ' ')[2] AS part1
         FROM documents WHERE doc_id < 30 ORDER BY doc_id""",

    "a14_quality_score" ->
      """SELECT source, round(100.0 - 100.0 *
           sum(CASE WHEN regexp_matches(text, '[^a-zA-Z0-9\s]') OR length(text) < 20
               THEN 1.0 ELSE 0.0 END) / count(*), 4) AS score
         FROM documents GROUP BY source ORDER BY source""",

    "s1_csv_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",

    "s9_ordered_export" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
         ORDER BY o_orderkey LIMIT 50""",

    "s12_sql_view" ->
      """SELECT c_mktsegment, count(*) AS n, round(avg(c_acctbal), 2) AS avg_bal
         FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "o4_set_ops" ->
      """SELECT
           (SELECT count(*) FROM (SELECT DISTINCT CAST(c_nationkey AS INTEGER) AS k FROM customer
             EXCEPT SELECT CAST(n_nationkey AS INTEGER) FROM nation)) AS n_except,
           (SELECT count(*) FROM (SELECT DISTINCT CAST(c_nationkey AS INTEGER) AS k FROM customer
             INTERSECT SELECT CAST(n_nationkey AS INTEGER) FROM nation)) AS n_intersect""",

    "j3_suggest_generic" ->
      """WITH anom(val) AS (VALUES ('AUTOMOBIL'), ('FURNITURES'), ('MACHINNERY'),
                                   ('HOUSHOLD'), ('BULDING'), ('ZZZZZZ')),
         dict AS (SELECT DISTINCT c_mktsegment FROM customer),
         s AS (SELECT val, c_mktsegment,
                 round(jaro_winkler_similarity(upper(val), upper(c_mktsegment)), 6) AS sim
               FROM anom, dict)
         SELECT val, c_mktsegment AS suggestion, sim FROM (
           SELECT *, row_number() OVER (PARTITION BY val ORDER BY sim DESC, c_mktsegment) AS rn
           FROM s WHERE sim >= 0.85)
         WHERE rn = 1 ORDER BY val""",

    "ts1_token_quality" ->
      """SELECT doc_id,
           len(string_split_regex(trim(text), '\s+')) AS n_tokens,
           round(CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
             x -> x IN ('the', 'a', 'of', 'and', 'to', 'in', 'is'))) AS DOUBLE) /
             len(string_split_regex(lower(trim(text)), '\s+')), 6) AS stopword_ratio,
           round(CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
             / length(text), 6) AS symbol_ratio,
           round(least(length(text) / 200.0, 1.0) * 0.4 +
                 greatest(0.0, 1.0 - (CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE) / length(text)) * 3.0) * 0.4 +
                 least(CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                   x -> x IN ('the', 'a', 'of', 'and', 'to', 'in', 'is'))) AS DOUBLE) /
                   len(string_split_regex(lower(trim(text)), '\s+')) * 5.0, 1.0) * 0.2, 6) AS quality
         FROM documents WHERE doc_id < 40 ORDER BY doc_id"""
  )
}
