package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Classifier, Curation, Dedup, EntityResolution, Experiment, Maintenance, Multimodal, OrderPipeline, RefOrders, Retrieval, Similarity, TextAnalysis, Unigram}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is a named operator demonstration over the
  * driver's parquet tables; [[oracleSql]] carries the DuckDB-equivalent SQL
  * the driver hash-compares against at sf0.01.
  *
  * Numeric-stability convention for oracle-checked aggregates: sums of
  * money-like doubles go through exact DECIMAL arithmetic and are cast to
  * DOUBLE only at the end, so Spark's parallel summation order and DuckDB's
  * sequential order cannot produce last-ulp divergence. Averages are
  * computed as exact-decimal-sum / count for the same reason.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  // Exact-decimal casts for money-like doubles (see scaladoc above).
  private def dec2(c: Column): Column = c.cast("decimal(12,2)")
  private def pct(c: Column): Column = c.cast("decimal(4,2)")
  // Microsecond-string timestamp rendering (representation-independent
  // comparison; DuckDB mirror: strftime(ts, '%Y-%m-%d %H:%M:%S.%f')).
  private def fmtTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
  // Query terms for the conjunctive-search demo (shared with the oracle,
  // and with Rm3Spec's determinism/headroom pins — package-visible).
  private[graft] val SearchTerms = Seq("scan", "merge", "sort")

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- Reference-parity pipeline (SURVEY §2 D1,T1-T3,V1-V4,E1-E2,P1,R1,K1)
    // Narrow map over loose records — no shuffle, single codegen stage.
    "ref_pipeline" -> { (s, dir) =>
      OrderPipeline.processOrders(RefOrders.rawOrders(s, dir))
    },
    // R1 valid branch + P1 projection — the enriched_orders topic payload.
    "ref_enriched" -> { (s, dir) =>
      val (valid, _) = OrderPipeline.route(OrderPipeline.processOrders(RefOrders.rawOrders(s, dir)))
      OrderPipeline.projectEnriched(valid)
    },
    // R1 invalid branch + K1 key — the invalid_orders topic payload.
    "ref_invalid" -> { (s, dir) =>
      val (_, invalid) = OrderPipeline.route(OrderPipeline.processOrders(RefOrders.rawOrders(s, dir)))
      OrderPipeline.withKafkaKey(invalid).select(col("order_id"), col("key"), col("error_message"))
    },
    // E1 envelope + K1 key — exact Kafka Connect JSON message bytes.
    "ref_envelope" -> { (s, dir) =>
      val (valid, _) = OrderPipeline.route(OrderPipeline.processOrders(RefOrders.rawOrders(s, dir)))
      OrderPipeline.toConnectEnvelope(OrderPipeline.withKafkaKey(valid))
        .select(col("key"), col("value"))
    },
    // Q1 — the reference's serving-side SQL scan (`SELECT * FROM
    // enriched_orders`, ref: README.md:157) through Spark's SQL front end
    // over a registered view.
    "ref_sql" -> { (s, dir) =>
      val (valid, _) = OrderPipeline.route(OrderPipeline.processOrders(RefOrders.rawOrders(s, dir)))
      // The reference's Q1 scans a MATERIALIZED serving table (Postgres,
      // ref: README.md:146-158, DDL src/docker-compose.yaml:188-196) — so
      // materialize the enriched frame before the SQL scan. Without this,
      // predicate pushdown substitutes the whole enrichment tree into the
      // Filter and every parse/CASE evaluates twice (no cross-operator CSE).
      // LAZY checkpoint: the plan boundary (LogicalRDD) exists immediately
      // — pushdown is blocked either way — but materialization happens in
      // the query's own first action, so merely CONSTRUCTING this query
      // (Explain tooling, plan dumps) no longer executes the pipeline.
      val serving = OrderPipeline.projectEnriched(valid).localCheckpoint(false)
      serving.createOrReplaceTempView("enriched_orders")
      // no ORDER BY: result comparison is order-insensitive
      s.sql("SELECT * FROM enriched_orders WHERE total_price > 1000000")
    },
    // ---- Relational core -------------------------------------------------
    // TPC-H Q1-style grouped aggregation: partial (map-side) aggregation +
    // single shuffle on the 2 grouping keys; scan prunes to 7 columns.
    "q1_agg" -> { (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir)
        .filter($"l_shipdate" < lit("2001-09-01").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum(dec2($"l_quantity")).cast("double").as("sum_qty"),
          sum(dec2($"l_extendedprice")).cast("double").as("sum_base_price"),
          sum(dec2($"l_extendedprice") * (lit(1) - pct($"l_discount"))).cast("double").as("sum_disc_price"),
          sum(dec2($"l_extendedprice") * (lit(1) - pct($"l_discount")) * (lit(1) + pct($"l_tax"))).cast("double").as("sum_charge"),
          count(lit(1)).as("count_order")
        )
    },

    // TPC-H Q3-style: 3-way join + grouped agg + deterministic top-10.
    // The filtered customer side is small → broadcast hint removes one
    // shuffle; the orders⋈lineitem join shuffles on the join key only.
    "q3_topk" -> { (s, dir) =>
      import s.implicits._
      val c = Tables.customer(s, dir).filter($"c_mktsegment" === "BUILDING")
      val o = Tables.orders(s, dir).filter($"o_orderdate" < lit("1999-01-01").cast("timestamp"))
      val l = Tables.lineitem(s, dir).filter($"l_shipdate" > lit("1999-01-01").cast("timestamp"))
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(c), $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey", $"o_orderdate")
        .agg(sum(dec2($"l_extendedprice") * (lit(1) - pct($"l_discount"))).cast("double").as("revenue"))
        .select($"l_orderkey", date_format($"o_orderdate", "yyyy-MM-dd").as("o_orderdate"), $"revenue")
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    },

    // TPC-H Q5-style: 6-table join. region/nation/supplier are dimension
    // tables → broadcast; the fact-side joins shuffle on their keys.
    "q5_join" -> { (s, dir) =>
      import s.implicits._
      val r = Tables.region(s, dir).filter($"r_name" === "EUROPE")
      val n = Tables.nation(s, dir)
      val sup = Tables.supplier(s, dir)
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1999-01-01").cast("timestamp"))
      val l = Tables.lineitem(s, dir)
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
        .join(c, $"o_custkey" === $"c_custkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(sum(dec2($"l_extendedprice") * (lit(1) - pct($"l_discount"))).cast("double").as("revenue"))
    },

    // Semi join (EXISTS): orders with any heavy lineitem → never duplicates
    // the probe side, ships only the join key of the build side.
    "q_semi" -> { (s, dir) =>
      import s.implicits._
      val heavy = Tables.lineitem(s, dir).filter($"l_quantity" > 45).select($"l_orderkey")
      Tables.orders(s, dir)
        .join(heavy, $"o_orderkey" === $"l_orderkey", "left_semi")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"))
    },

    // Anti join (NOT EXISTS): customers with no big-ticket order.
    "q_anti" -> { (s, dir) =>
      import s.implicits._
      Tables.customer(s, dir)
        .join(
          Tables.orders(s, dir).filter($"o_totalprice" > 300000).select($"o_custkey"),
          $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
    },

    // Left outer join + aggregate: every customer, order stats nullable.
    "q_left_outer" -> { (s, dir) =>
      import s.implicits._
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), $"c_custkey" === $"o_custkey", "left_outer")
        .groupBy($"c_custkey")
        .agg(
          count($"o_orderkey").as("n_orders"), // counts non-null only
          sum(dec2($"o_totalprice")).cast("double").as("spent"))
    },

    // Full outer join between two aggregates: nations with customers but
    // no suppliers (and vice versa) surface as null sides.
    "q_full_outer" -> { (s, dir) =>
      import s.implicits._
      val cn = Tables.customer(s, dir).groupBy($"c_nationkey".as("nationkey"))
        .agg(count(lit(1)).as("n_cust"))
      val sn = Tables.supplier(s, dir).groupBy($"s_nationkey".as("nationkey"))
        .agg(count(lit(1)).as("n_supp"))
      cn.join(sn, Seq("nationkey"), "full_outer")
        .select(col("nationkey").cast("long").as("nationkey"), $"n_cust", $"n_supp")
    },

    // Ranking window: top-3 orders per customer. The partition key drives
    // the one shuffle; no global sort.
    "q_window_rank" -> { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter($"rn" <= 3)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
    },

    // Analytic window: per-supplier running total + lag. The driver's
    // lineitem is TPC-H-ISH: (l_orderkey, l_linenumber) is NOT unique, and
    // even (shipdate, orderkey, linenumber) has tied rows — so l_quantity
    // joins the sort key. Remaining ties are rows identical in EVERY
    // column the window reads, which are interchangeable: the output
    // multiset is deterministic and engine-independent. Exact decimal
    // accumulation for the running sum.
    "q_window_running" -> { (s, dir) =>
      import s.implicits._
      val ord = Window.partitionBy($"l_suppkey")
        .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber", $"l_quantity")
      val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, dir).select(
        $"l_suppkey", $"l_orderkey", $"l_linenumber",
        sum(dec2($"l_quantity")).over(run).cast("double").as("running_qty"),
        lag($"l_quantity", 1).over(ord).as("prev_qty")
      )
    },

    // Value-RANGE window frame: how many of the customer's orders sit
    // within 50k below each order's price (frame bounded by VALUE, not row
    // position — no tie ambiguity since the frame is defined by the
    // ordering value itself). Partitioned by o_custkey: the key's
    // cardinality grows with the data, so window parallelism scales with
    // the cluster (a 3-value status key would cap it at 3 regardless of
    // executors).
    "q_window_rangeframe" -> { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice")
        .rangeBetween(-50000L, Window.currentRow)
      Tables.orders(s, dir).select(
        $"o_orderkey", $"o_custkey", $"o_totalprice",
        count(lit(1)).over(w).as("n_within_50k"))
    },

    // ROLLUP: hierarchical subtotals in one pass (partial agg per grouping
    // set, single shuffle).
    "q_rollup" -> { (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir)
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"), sum(dec2($"l_quantity")).cast("double").as("sum_qty"))
    },

    // CUBE: all 2^k grouping combinations in one Expand + one shuffle —
    // the same single-pass plan as rollup, 4 grouping sets instead of 3.
    "q_cube" -> { (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir)
        .cube($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"), sum(dec2($"l_quantity")).cast("double").as("sum_qty"))
    },

    // UNPIVOT (stack): wide metrics → long (metric, value) rows. Pure
    // narrow map — the Expand node emits 3 rows per input, no shuffle;
    // the quantity filter pushes to the scan below the Expand.
    "q_unpivot" -> { (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir)
        .filter($"l_quantity" > 45)
        .selectExpr("l_orderkey", "l_linenumber",
          """stack(3,
            |  'quantity', l_quantity,
            |  'extendedprice', l_extendedprice,
            |  'discount', l_discount) AS (metric, value)""".stripMargin)
        .select($"l_orderkey", $"l_linenumber", $"metric", $"value")
    },

    // Ordered string aggregation: the sorted-distinct-list rendering both
    // engines can agree on byte-for-byte (collect_set is unordered by
    // contract — array_sort makes the result deterministic under any
    // partitioning; DuckDB mirrors with string_agg(DISTINCT … ORDER BY)).
    "q_stragg" -> { (s, dir) =>
      import s.implicits._
      Tables.orders(s, dir)
        .groupBy($"o_orderstatus")
        .agg(
          array_join(array_sort(collect_set($"o_orderpriority")), ",").as("priorities"),
          count(lit(1)).as("n"))
    },

    // GROUPING SETS: two independent dimensions + grand total in one scan.
    "q_groupsets" -> { (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupingSets(
          Seq(Seq($"l_returnflag"), Seq($"l_linestatus"), Seq()),
          $"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"))
    },

    // Set operations: UNION / INTERSECT / EXCEPT (all distinct semantics).
    "q_setops" -> { (s, dir) =>
      import s.implicits._
      val o = Tables.orders(s, dir)
      val f = o.filter($"o_orderstatus" === "F").select($"o_custkey")
      val p = o.filter($"o_orderstatus" === "P").select($"o_custkey")
      val active = Tables.customer(s, dir).filter($"c_acctbal" > 0)
        .select($"c_custkey".as("o_custkey"))
      val big = o.filter($"o_totalprice" > 400000).select($"o_custkey")
      f.union(p).distinct().intersect(active).except(big)
    },

    // DISTINCT: dedup via hash aggregate (no global sort).
    "q_distinct" -> { (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir).select($"l_returnflag", $"l_linestatus").distinct()
    },

    // Global top-k: orderBy+limit plans as TakeOrderedAndProject — per
    // partition heap + driver merge, never a full sort at scale.
    "q_topk" -> { (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir)
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
        .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
        .limit(20)
    },

    // Scalar function sampler (string/math): all codegen'd built-ins.
    "q_scalar" -> { (s, dir) =>
      import s.implicits._
      Tables.part(s, dir).select(
        $"p_partkey",
        upper($"p_name").as("uname"),
        length($"p_name").cast("long").as("name_len"),
        substring($"p_name", 1, 5).as("name_pfx"),
        regexp_extract($"p_brand", "#(\\d+)", 1).cast("long").as("brand_num"),
        concat_ws("/", $"p_type", $"p_brand").as("type_brand"),
        abs($"p_size" - 25).cast("long").as("abs_off"),
        floor($"p_retailprice").cast("long").as("floor_price"),
        ceil($"p_retailprice").cast("long").as("ceil_price"),
        ($"p_size" % 5).cast("long").as("size_mod")
      )
    },

    // Date/time function sampler over orders.
    "q_dates" -> { (s, dir) =>
      import s.implicits._
      Tables.orders(s, dir).select(
        $"o_orderkey",
        year($"o_orderdate").cast("long").as("y"),
        month($"o_orderdate").cast("long").as("m"),
        dayofmonth($"o_orderdate").cast("long").as("d"),
        date_format($"o_orderdate", "yyyy-MM").as("ym"),
        datediff($"o_orderdate".cast("date"), lit("1995-01-01").cast("date")).cast("long").as("days_since"),
        date_format(add_months($"o_orderdate".cast("date"), 3), "yyyy-MM-dd").as("plus3m")
      )
    },

    // ---- Text analysis (documents table; SURVEY §2 extension ops) -------
    "q_doc_stats" -> { (s, dir) => TextAnalysis.stats(Tables.documents(s, dir)) },
    // Token counting both ways: whitespace words + BPE-ish pretokens
    // (portable GPT-2-style regex) and the expansion factor between them.
    "q_doc_tokens" -> { (s, dir) => TextAnalysis.tokenCounts(Tables.documents(s, dir)) },
    // Corpus vocabulary heavy hitters: exact top-20 tokens by frequency.
    // Map-side combinable count + TakeOrderedAndProject (per-partition
    // heaps, no global sort); deterministic (n DESC, word ASC) tie-break.
    "q_doc_vocab" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(explode(graft.functions.TextFunctions.tokens($"text")).as("w"))
        .groupBy($"w").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"w")
        .limit(20)
    },
    "q_doc_quality" -> { (s, dir) => TextAnalysis.quality(Tables.documents(s, dir)) },
    "q_doc_langid" -> { (s, dir) => TextAnalysis.langId(Tables.documents(s, dir)) },
    // Language confusion matrix: per (declared, predicted) counts + exact
    // per-row permille — the aggregate mislabeling signal the per-doc
    // matches_label flag can't surface. ≤ |langs|² rows.
    "q_doc_langconf" -> { (s, dir) => TextAnalysis.langConfusion(Tables.documents(s, dir)) },
    "q_doc_tfidf" -> { (s, dir) => TextAnalysis.tfidfTop(Tables.documents(s, dir)) },
    // Conjunctive term search (inverted-index probe): docs containing ALL
    // three terms, scored by total term frequency. The term filter rides
    // the exploded token stream — only query-term postings shuffle.
    "q_doc_search" -> { (s, dir) =>
      TextAnalysis.search(Tables.documents(s, dir), SearchTerms)
    },
    // BM25 ranked retrieval (disjunctive): odds-form idf × Robertson
    // saturation, per-term contributions floored to integer nano-units so
    // the per-doc sum is order-free — the lexical side of a retrieval
    // stack, next to the embedding kNN.
    "q_doc_bm25" -> { (s, dir) =>
      TextAnalysis.bm25Search(Tables.documents(s, dir), SearchTerms)
    },
    // RM3 pseudo-relevance feedback (the Anserini/Indri PRF default):
    // top-fbDocs BM25 results estimate an expansion-term distribution
    // (exact DECIMAL nanos weights), the corpus re-scores on the mixed
    // query — docs matching ONLY expansion terms enter via the
    // full-outer mix, recall beyond the literal vocabulary.
    // Dirichlet-smoothed query likelihood (Zhai-Lafferty'01) — the
    // language-modeling retrieval leg next to BM25 (round 13): every
    // doc scores (the smoothing is the point — a short unmatched doc
    // legitimately outranks a long one), product form keeps the math
    // transcendental-free, per-term ratios fold in query order and the
    // score quantizes to attos.
    "q_doc_ql" -> { (s, dir) =>
      TextAnalysis.qlSearch(Tables.documents(s, dir), SearchTerms)
    },
    "q_doc_rm3" -> { (s, dir) =>
      TextAnalysis.rm3Search(Tables.documents(s, dir), SearchTerms)
    },
    // rm3's intermediates EXPOSED to the driver's gate (round-11 verdict
    // ask: a driver-side rm3 mismatch must name its stage): the feedback
    // set (top-fbDocs literal BM25 docs) and the expansion-term
    // distribution, each against the SAME oracle CTE chain the composite
    // reads — fb red = literal scoring; fb green + exp red = feedback
    // weighting; both green + rm3 red = the corpus re-score or final mix.
    "q_doc_rm3fb" -> { (s, dir) =>
      TextAnalysis.rm3Feedback(Tables.documents(s, dir), SearchTerms)
    },
    "q_doc_rm3exp" -> { (s, dir) =>
      TextAnalysis.rm3Expansion(Tables.documents(s, dir), SearchTerms)
    },
    // …and the expansion stage's INPUT rows (fb doc × token: dl,
    // orig_nanos, w, tf — all exact integers/strings), so a driver-side
    // exp mismatch names its ROW: rm3in red = the feedback
    // join/tokenize/count; rm3in green + exp red = the weighting
    // arithmetic (now all-integer — round-12 verdict ask #1).
    "q_doc_rm3in" -> { (s, dir) =>
      TextAnalysis.rm3ExpInput(Tables.documents(s, dir), SearchTerms)
    },
    // Hybrid retrieval: Reciprocal-Rank Fusion of the lexical BM25 list
    // and the per-query embedding list (exact integer nano-unit scores;
    // fusion cost is per-query — ≤ 2·20 rows/qid — independent of corpus
    // size). The vector list is the multi-probe LSH ANN builder, NOT
    // brute kNN: the scale probe measured the brute list at a 1.10 tail
    // exponent (query count grows with the corpus, so brute pair work is
    // ~quadratic); the multi-probe candidate join stays bucket-keyed —
    // per-query cost bounded by bucket occupancy. Brute survives only as
    // q_emb_recall's ground truth (constant-capped query set there).
    // nDCG@10 ranking-quality audit: single-term BM25 rankings scored
    // against raw-tf graded relevance (gain 2^min(tf,3)−1, shared
    // nano-unit discount table — integer DCG/IDCG sums, one division).
    // The per-release ranking-eval number next to the MRR known-item
    // audit; |terms| output rows.
    "q_doc_ndcg" -> { (s, dir) =>
      Retrieval.ndcgAudit(Tables.documents(s, dir), SearchTerms)
    },
    // Score-based hybrid fusion (the RRF complement): per (list, qid)
    // min-max normalization, fused = 0.5·lex + 0.5·vec — the convex
    // combination production hybrid search uses when score SHAPE
    // matters; same bounded per-query economics as q_doc_rrf.
    "q_doc_hybrid" -> { (s, dir) =>
      val lexTop = TextAnalysis.bm25Search(Tables.documents(s, dir), SearchTerms)
        .orderBy(col("score_odds_nanos").desc, col("doc_id")).limit(20)
        .select(col("doc_id"), col("score_odds_nanos").cast("double").as("score"))
      val qids = Tables.embeddings(s, dir)
        .filter(col("vec_id") % 50 === 0).select(col("vec_id").as("qid"))
      val lex = qids.crossJoin(broadcast(lexTop))
      val vec = Similarity.knnLshMultiProbe(Tables.embeddings(s, dir), queryMod = 50, k = 20)
        .select(col("qid"), col("vec_id").as("doc_id"), col("cos").as("score"))
      Retrieval.hybridFuse(Seq((lex, 0.5), (vec, 0.5)), topK = 10)
    },
    "q_doc_rrf" -> { (s, dir) =>
      val lex = Retrieval.topNRanked(
        TextAnalysis.bm25Search(Tables.documents(s, dir), SearchTerms),
        "score_odds_nanos", "doc_id", 20)
      val qids = Tables.embeddings(s, dir)
        .filter(col("vec_id") % 50 === 0).select(col("vec_id").as("qid"))
      val lexPerQ = qids.crossJoin(broadcast(lex))
      val vec = Similarity.knnLshMultiProbe(Tables.embeddings(s, dir), queryMod = 50, k = 20)
        .select(col("qid"), col("vec_id").as("doc_id"), col("rn").as("rank"))
      Retrieval.rrfFuse(Seq(lexPerQ, vec), kRrf = 60, topK = 10)
    },
    // Retrieval end-to-end: dedup-clean the corpus FIRST, then build both
    // retrieval lists (BM25 lexical + multi-probe LSH ANN) over the clean
    // set and fuse — the operational rule "dedup before you index"
    // (near-dup copies otherwise crowd out the top-k and the fused
    // consensus double-counts them). Rides the memoized cluster stage;
    // list building and fusion inherit q_doc_rrf's bounded shapes. The
    // ANN list replaced the probe-measured-superlinear brute builder
    // (SCALEPROBE.md: 1.10 tail exponent) — the candidate join is a
    // bucket equi-join, so per-query work is bounded by bucket occupancy
    // at any corpus size.
    "q_retrieval_e2e" -> { (s, dir) =>
      val c = Dedup.corpus(Tables.documents(s, dir))
      val clean = Dedup.dedupedCorpus(c, Dedup.clustersFor(c, dir))
      val lex = Retrieval.topNRanked(
        TextAnalysis.bm25Search(clean, SearchTerms), "score_odds_nanos", "doc_id", 20)
      val eClean = Tables.embeddings(s, dir)
        .join(clean.select(col("doc_id").as("vec_id")).hint("shuffle_hash"), "vec_id")
      val vec = Similarity.knnLshMultiProbe(eClean, queryMod = 50, k = 20)
        .select(col("qid"), col("vec_id").as("doc_id"), col("rn").as("rank"))
      val qids = eClean.filter(col("vec_id") % 50 === 0).select(col("vec_id").as("qid"))
      Retrieval.rrfFuse(Seq(qids.crossJoin(broadcast(lex)), vec), kRrf = 60, topK = 10)
    },
    // Character-class audit: per-doc explicit-Unicode-range counts +
    // permille (Latin/digit/CJK/Cyrillic/Arabic), mojibake marker and
    // U+FFFD counts, fixed-precedence dominant class — the SCRIPT-level
    // complement of the vocabulary LID; one narrow regexp pass.
    "q_doc_charclass" -> { (s, dir) =>
      TextAnalysis.charClassAudit(Tables.documents(s, dir))
    },

    // Cross-source shingle containment matrix (mirror/syndication audit):
    // |sources|² output, one checkpointed per-source shingle set feeding
    // both self-join sides and the denominator.
    "q_doc_overlap" -> { (s, dir) =>
      TextAnalysis.sourceOverlap(Tables.documents(s, dir))
    },
    // Per-source n-gram diversity: distinct-trigram fraction — the
    // templated-content audit (a source stamping one boilerplate pattern
    // scores near 0, fresh prose near 1). Two grouped aggs over the fused
    // shingle stream; output bounded at |sources| rows.
    "q_doc_diversity" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select($"source",
          explode(graft.expressions.ShingleHashes.shingle_hashes($"text")).as("h"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_shingles"),
          countDistinct($"h").as("n_distinct"))
        .withColumn("diversity",
          $"n_distinct".cast("double") / $"n_shingles".cast("double"))
    },

    // Exact per-customer top-3 order ids via a bounded-heap
    // TypedImperativeAggregate: O(k) buffer per group, so map-side partial
    // aggregation shrinks every partition to k rows per group BEFORE the
    // shuffle (collect_list+sort would ship the whole table).
    "q_topk_agg" -> { (s, dir) =>
      Tables.orders(s, dir).groupBy(col("o_custkey"))
        .agg(graft.expressions.TopKAgg.top_k_ids(col("o_totalprice"), col("o_orderkey"), 3)
          .as("top_ids"))
        // scalar rows (not array<long>) so any harness can sort the output;
        // the bounded-heap partial aggregation is unchanged upstream
        .select(col("o_custkey"), posexplode(col("top_ids")))
        .select(col("o_custkey"), col("pos").cast("long").as("rank"),
          col("col").as("orderkey"))
    },

    // Benchmark decontamination: train docs (doc_id%50≠0) sharing any
    // trigram shingle with the held-out eval split (doc_id%50=0).
    "q_doc_decontam" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.documents(s, dir)
      TextAnalysis.contaminated(
        docs.filter($"doc_id" % 50 =!= 0), docs.filter($"doc_id" % 50 === 0))
    },
    // Bloom-gated decontamination + FPR audit: the eval split crosses
    // the cluster ONCE as m bits (m = 16·n_eval, scale-free load
    // factor); train shingles probe the broadcast map-side — no
    // train-side shuffle on h. bloom_hit ⊇ exact_hit (no false
    // negatives, spec-pinned); over-flag rate is the read-out.
    "q_doc_bloom" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.documents(s, dir)
      TextAnalysis.bloomDecontam(
        docs.filter($"doc_id" % 50 =!= 0), docs.filter($"doc_id" % 50 === 0))
    },
    // Graded companion: per-doc eval-overlap fraction + flagged verdict.
    "q_doc_contamfrac" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.documents(s, dir)
      TextAnalysis.contaminationFraction(
        docs.filter($"doc_id" % 50 =!= 0), docs.filter($"doc_id" % 50 === 0))
    },
    // Intra-doc repeated-shingle ratio (repetition quality signal).
    "q_doc_repetition" -> { (s, dir) =>
      TextAnalysis.repetition(Tables.documents(s, dir))
    },

    // ---- Training-data curation (sampling / packing / quality gating) ---
    // Deterministic content-hash stratified sampling — narrow map, no RNG.
    "q_doc_sample" -> { (s, dir) => Curation.sampleStratified(Tables.documents(s, dir)) },
    // Weighted (token-budget-proportional) sampling without replacement:
    // sequential Poisson priority keys, TakeOrderedAndProject selection.
    "q_doc_wsample" -> { (s, dir) => Curation.weightedSample(Tables.documents(s, dir)) },
    // Neyman allocation: per-lang sample seats ∝ N_h·S_h (big AND
    // variable strata earn budget) — one sqrt per stratum on exact
    // integer moments, quantized weights, Hamilton largest-remainder
    // seats in pure integer arithmetic; Σ alloc = n exactly.
    "q_doc_neyman" -> { (s, dir) => Curation.neymanAllocation(Tables.documents(s, dir)) },
    // Greedy max-coverage source selection (Nemhauser'78 submodular
    // greedy): budget rounds, each ONE covered-shingle anti-join (both
    // sides hash-partitioned on h) + a TakeOrdered single-row reduce —
    // "which B sources actually add novel text" before paying for their
    // ingest; the exact audit for the KMV-sketched variant at 100 TB.
    "q_doc_srcsel" -> { (s, dir) => Curation.sourceSelect(Tables.documents(s, dir), dir = dir) },
    // Budgeted max-coverage source selection (Khuller-Moss-Naor cost-
    // ratio greedy): best marginal-coverage-per-TOKEN among sources the
    // remaining crawl budget still affords — the procurement spelling of
    // q_doc_srcsel; budget = corpus tokens div 5 so the gate binds at
    // every scale.
    "q_doc_srcselb" -> { (s, dir) =>
      Curation.sourceSelectBudgeted(Tables.documents(s, dir), dir = dir)
    },
    // KMV-sketch greedy source selection — the 100-TB spelling
    // implemented, not promised: one corpus pass into |sources|*k
    // bottom-k sketches, every greedy round corpus-independent on the
    // union-sketch estimator; est_gain next to the TRUE exact marginal
    // per pick (the in-row approximation audit).
    "q_doc_srcselkmv" -> { (s, dir) =>
      Curation.sourceSelectKmv(Tables.documents(s, dir), dir = dir)
    },
    // The PRODUCTION spelling: per-round exact audit dropped — after the
    // one sketch pass every greedy round is corpus-independent (≤
    // |sources|*2k sketch rows). The audited q_doc_srcselkmv is its truth
    // twin (identical (rank, source, est_gain) trace, spec-pinned).
    "q_doc_srcselkmv_prod" -> { (s, dir) =>
      Curation.sourceSelectKmvProd(Tables.documents(s, dir), dir = dir)
    },
    // Execute the allocation: per stratum the alloc_h smallest priority
    // keys win via the bounded-heap TopKByValue aggregate (O(n) partial
    // state, map-side combined — never a per-lang rank window).
    "q_doc_stratsample" -> { (s, dir) =>
      Curation.stratifiedNeymanSample(Tables.documents(s, dir))
    },
    // Crawl-to-crawl snapshot diff: content-hash manifest reconciliation
    // (added/removed/changed/unchanged), doc counts + net token delta per
    // (status, lang) — the read-out that feeds incremental index
    // maintenance and the budget planner.
    "q_doc_snapdiff" -> { (s, dir) => Curation.snapshotDiff(Tables.documents(s, dir)) },
    // Count–min sketch frequency audit: estimate (min over D affine hash
    // rows of a D×W cell-count sketch) vs exact count for the top-20
    // tokens; overcount column pins the ≥-true guarantee.
    "q_doc_cms" -> { (s, dir) => TextAnalysis.cmsAudit(Tables.documents(s, dir)) },
    // HyperLogLog per-source vocabulary cardinality (round 13): 2^8
    // 6-bit registers per source, built in ONE token pass with no
    // distinct (max is idempotent — replay-tolerant by construction),
    // merged cell-wise across shards/generations with no re-scan; the
    // harmonic denominator stays an EXACT BIGINT sum of powers of two,
    // the estimate is one double division, and the exact distinct count
    // rides along as the audit twin. KMV keeps the intersection
    // read-out; HLL is the 6-bit-register union-lossless cardinality
    // summary next to it.
    "q_doc_hll" -> { (s, dir) => TextAnalysis.hllCardinality(Tables.documents(s, dir)) },
    // …and the cross-generation vocabulary-growth read-out: est(A∪B) −
    // est(A) from the CELL-WISE MAX MERGE of the two generations'
    // register artifacts — the base corpus is never re-scanned (the
    // kmvgen economics at m·6 bits per source); exact new-type counts
    // ride as the audit twin. Same generation split as q_doc_kmvgen.
    "q_doc_hllgen" -> { (s, dir) =>
      val d = Tables.documents(s, dir)
      TextAnalysis.hllGenGrowth(
        d.filter(col("doc_id") % 3 =!= 0),
        d.filter(col("doc_id") % 3 === 0).unionByName(
          d.filter(col("doc_id") % 6 === 1)
            .withColumn("doc_id", col("doc_id") + 3000000L)))
    },
    // KMV/theta-sketch cross-source overlap: per-source bottom-k
    // shingle sketches (O(k) heap state, map-side combined) →
    // pairwise union/intersection ESTIMATES audited against exact
    // truth — the set-intersection readout HLL can't give; at 100 TB
    // the |sources|·k sketch table persists per crawl and diffs
    // generations without re-scanning text.
    "q_doc_kmv" -> { (s, dir) => TextAnalysis.kmvOverlap(Tables.documents(s, dir)) },
    // Cross-GENERATION KMV redundancy: per source, how much of the new
    // crawl is content the base already has, estimated from the two
    // per-crawl sketch artifacts and audited exactly. Generation
    // convention: base = doc_id % 3 ≠ 0; increment = the fresh %3 = 0
    // slice + a verbatim re-crawl of the %6 = 1 slice (the redundant
    // half the estimator must find).
    "q_doc_kmvgen" -> { (s, dir) =>
      val d = Tables.documents(s, dir)
      TextAnalysis.kmvGenOverlap(
        d.filter(col("doc_id") % 3 =!= 0),
        d.filter(col("doc_id") % 3 === 0).unionByName(
          d.filter(col("doc_id") % 6 === 1)
            .withColumn("doc_id", col("doc_id") + 3000000L)))
    },
    // Zipf octave histogram: type counts + token mass per binary
    // frequency octave (integer bit length, no rank sort, no float
    // log) with cumulative mass — the corpus-health profile whose bend
    // flags boilerplate floods or mojibake tail explosions.
    "q_doc_zipf" -> { (s, dir) => TextAnalysis.zipfOctaves(Tables.documents(s, dir)) },
    // Hash-shard jackknife: the error bar on the mean-tokens/doc
    // dashboard number — delete-one-shard means from exact integer
    // totals, quantized order-free cross-shard sums, DECIMAL(38,0)
    // squared deviations. One grouped pass to H rows.
    "q_doc_jackknife" -> { (s, dir) =>
      TextAnalysis.jackknifeMean(Tables.documents(s, dir))
    },
    // Concat-and-cut sequence packing: one window per lang shard.
    "q_doc_pack" -> { (s, dir) => Curation.packSequences(Tables.documents(s, dir)) },
    // Packing-efficiency audit: per lang, packs at the budget, last-pack
    // amortized utilization, and the boundary-split document rate — the
    // numbers a packing budget planner trades. Integer-exact rollup.
    "q_doc_packstats" -> { (s, dir) => Curation.packStats(Tables.documents(s, dir)) },
    // Per-lang quantile quality gate (drop the worst decile).
    "q_doc_qfilter" -> { (s, dir) => Curation.qualityFilter(Tables.documents(s, dir)) },

    // The gate's pass 1 on its own: per-language exact quantile thresholds
    // — oracle-checked so a Spark-percentile vs DuckDB-quantile_cont
    // interpolation divergence shows up AT the threshold, not as an opaque
    // hash mismatch on q_doc_qfilter's filtered rows.
    "q_doc_qthresh" -> { (s, dir) => Curation.qualityThresholds(Tables.documents(s, dir)) },
    // Per-lang quality histogram: constant-bounded output (|langs|·bins),
    // the cheap first look before picking gate thresholds.
    "q_doc_qhist" -> { (s, dir) => Curation.qualityHistogram(Tables.documents(s, dir)) },
    // Per-source CDF calibration of the quality score: histogram-midrank
    // percentile, no per-doc window (the hist table is |sources|·bins).
    "q_doc_qcdf" -> { (s, dir) => Curation.qualityCdfNormalize(Tables.documents(s, dir)) },
    // Deterministic train/val/test split: content-hash permille buckets —
    // rerun-stable, and duplicate texts land in the same split (no
    // train/test leakage through copies). Narrow map.
    "q_doc_split" -> { (s, dir) => Curation.assignSplit(Tables.documents(s, dir)) },
    // Deterministic sharded epoch shuffle: per epoch, every doc gets a
    // seeded-LCG key, routes to a shard by residue, and takes its
    // within-shard position from the key order — the training-loader
    // reshuffle done the way 100 TB requires (shard-then-local-order,
    // never a global per-epoch sort; (epoch, shard) windows keep sort
    // parallelism ∝ nShards).
    "q_doc_eshuffle" -> { (s, dir) =>
      Curation.epochShuffle(Tables.documents(s, dir))
    },
    // The SCALED-shard setting of the epoch shuffle (the operating rule:
    // nShards tracks cluster parallelism, never a constant — each
    // (epoch, shard) sort task holds ~n/nShards rows). Probed at
    // 1x/10x/30x next to the fixed-8 variant so the shard-count rule is
    // measured, not asserted.
    "q_doc_eshuffle64" -> { (s, dir) =>
      Curation.epochShuffle(Tables.documents(s, dir), nShards = 64)
    },
    // Leakage-safe split: every verified duplicate CLUSTER inherits its
    // root's content-hash bucket, so near-dup copies can never straddle
    // train/eval — the fix for what q_doc_leak measures. Rides the
    // memoized cluster stage; two shuffle-hash equi-joins.
    "q_doc_splitsafe" -> { (s, dir) =>
      val c = Dedup.corpus(Tables.documents(s, dir))
      Curation.leakSafeSplit(c, Dedup.clustersFor(c, dir))
    },
    // Split-balance audit: per (lang, split) observed-vs-expected
    // permille in exact integers — the QA catching a low-volume language
    // with a skewed or empty eval slice. Bounded output, broadcast totals.
    "q_doc_splitbal" -> { (s, dir) => Curation.splitBalance(Tables.documents(s, dir)) },
    // Quality–length Pearson r per lang: exact integer sufficient
    // statistics (quantized score), double combination with an identical
    // operand tree both engines — the "is my quality score just length?"
    // signal QA.
    "q_doc_qcorr" -> { (s, dir) => Curation.qualityLengthCorr(Tables.documents(s, dir)) },
    // Cross-split leakage audit — split + decontamination COMPOSED: train
    // docs sharing any trigram with the test split. Exact copies can't
    // leak (same hash → same split); this catches near-dup leakage.
    "q_doc_leak" -> { (s, dir) =>
      val sp = Curation.assignSplit(Tables.documents(s, dir))
        .join(Tables.documents(s, dir), Seq("doc_id", "lang"))
      TextAnalysis.contaminated(
        sp.filter(col("split") === "train"),
        sp.filter(col("split") === "test"))
    },
    // Overlapping token-window chunking (RAG/pretraining layout).
    "q_doc_chunks" -> { (s, dir) => Curation.chunk(Tables.documents(s, dir)) },
    // PII scrubbing: email + long-digit-run redaction, counted.
    "q_doc_redact" -> { (s, dir) => Curation.redact(Tables.documents(s, dir)) },
    // Per-source PII incidence audit (emails / long digit runs / IPv4):
    // docs-with-hit and total-hit counts per class + hits-per-Mchar —
    // the compliance read-out before shipping, one narrow regexp pass.
    "q_doc_piirate" -> { (s, dir) => Curation.piiRate(Tables.documents(s, dir)) },
    // Canonical normalization: NFC (native expr) + lower + ws collapse.
    "q_doc_normalize" -> { (s, dir) => Curation.normalized(Tables.documents(s, dir)) },
    // Uniform per-lang k-sample via bottom-k content hashes (KMV trick).
    "q_doc_groupsample" -> { (s, dir) =>
      Curation.groupSample(Tables.documents(s, dir))
        .select(col("lang"), posexplode(col("sample_ids")))
        .select(col("lang"), col("pos").cast("long").as("rank"),
          col("col").as("doc_id"))
    },
    // Boilerplate fragment signal: per-doc fraction of shingles that
    // appear in >= 3 distinct docs (C4-style frequent-fragment gate).
    "q_doc_boiler" -> { (s, dir) =>
      graft.operators.TextAnalysis.boilerplate(Tables.documents(s, dir))
    },
    // Gopher-style heuristic rule gate: per-doc signals, per-rule flags,
    // conjunction verdict — pure narrow map (operators/TextAnalysis).
    "q_doc_gopher" -> { (s, dir) => TextAnalysis.gopherRules(Tables.documents(s, dir)) },
    // Out-of-vocabulary rate vs the exact top-20 corpus vocabulary: the
    // one provably-safe broadcast join in the text stack (k = constant).
    "q_doc_oov" -> { (s, dir) => TextAnalysis.oovRate(Tables.documents(s, dir)) },
    // Token-budget training mix: best-quality docs per source until the
    // source's token budget fills (straddler kept, like packing).
    "q_doc_budget" -> { (s, dir) => Curation.budgetSelect(Tables.documents(s, dir)) },
    // Source mixing table: per-source doc/token/char totals + corpus share.
    "q_doc_sourcemix" -> { (s, dir) => Curation.sourceMix(Tables.documents(s, dir)) },
    // Empirical-Bayes domain quality prior: Beta-smoothed Gopher pass
    // rate per source, τ=20 pseudo-counts anchored at the global rate —
    // small domains shrink to the corpus prior, big ones keep their own
    // number (shrink = n/(n+τ) says which). One narrow rules pass with
    // source ridden through, |sources| output rows.
    "q_doc_domprior" -> { (s, dir) => Curation.domainPrior(Tables.documents(s, dir)) },
    // k-anonymity release manifest over the (lang, source)
    // quasi-identifiers: global recoding up a 2-level generalization
    // hierarchy — every doc in the least-generalized class reaching
    // size ≥ k; the metadata-side privacy gate next to piirate/redact.
    "q_doc_kanon" -> { (s, dir) => Curation.kAnonymize(Tables.documents(s, dir)) },
    // Leave-one-source-out ablation: per source, the corpus mean quality
    // with vs without it (exact complement arithmetic on fixed-point
    // integer sums — one grouped pass, never a pass per source); the
    // most negative influence rows are the first sourcecap candidates.
    "q_doc_srcablate" -> { (s, dir) => Curation.sourceAblate(Tables.documents(s, dir)) },
    // l-diversity audit over the k-anonymity release manifest: per
    // released equivalence class, distinct PII-profile sensitive values
    // and the homogeneity margin — a k-safe class whose members all
    // share one sensitive value still leaks it; ok flags l >= 2.
    "q_doc_ldiv" -> { (s, dir) => Curation.lDiversity(Tables.documents(s, dir)) },
    // Temperature-scaled (α = 1/2) source sampling weights: integer-exact
    // floor(sqrt) quantization, one grouped agg + 1-row broadcast total.
    "q_doc_mixalpha" -> { (s, dir) => Curation.mixtureWeights(Tables.documents(s, dir)) },
    // Pow-2 length-bucketed batching audit: integer bit-length buckets,
    // pad-waste per (lang, bucket). Output bounded at |langs|·64 rows.
    "q_doc_lenbuckets" -> { (s, dir) => Curation.lengthBuckets(Tables.documents(s, dir)) },
    // Per-source document cap (domain balancing), deterministic bottom-k.
    "q_doc_sourcecap" -> { (s, dir) =>
      Curation.sourceCap(Tables.documents(s, dir))
        .select(col("source"), posexplode(col("sample_ids")))
        .select(col("source"), col("pos").cast("long").as("rank"),
          col("col").as("doc_id"))
    },
    // End-to-end dedup: corpus minus non-keeper cluster members.
    "q_dedup_clean" -> { (s, dir) =>
      val c = Dedup.corpus(Tables.documents(s, dir))
      Dedup.dedupedCorpus(c, Dedup.clustersFor(c, dir))
        .select(col("doc_id"), col("lang"),
          graft.functions.TextFunctions.stringHash(col("text")).as("fp"))
    },
    // Character-level verify: Levenshtein over LSH candidates (the
    // complement to token-level Jaccard for small in-word edits).
    "q_dedup_edit" -> { (s, dir) =>
      Dedup.editDistancePairs(Dedup.corpus(Tables.documents(s, dir)))
    },

    // Winnowing-candidate near-dups: shared-fingerprint pairs — the
    // local-overlap complement to whole-doc MinHash LSH; df-capped
    // fingerprint equi-join, never all-pairs. Memoized: q_dedup_contain
    // verifies over the SAME candidate table.
    "q_dedup_winnow" -> { (s, dir) =>
      Dedup.winnowPairsFor(Dedup.corpus(Tables.documents(s, dir)), dir)
    },

    // Asymmetric shingle containment over winnow candidates: the
    // doc-IN-doc detector (|A∩B|/|A| ≈ 1 at Jaccard ≈ 0.04 for a
    // fragment quoted inside a big page) — winnow fingerprints supply
    // the local-overlap recall MinHash banding lacks; exact integer
    // intersection counts, one division per direction.
    "q_dedup_contain" -> { (s, dir) =>
      val c = Dedup.corpus(Tables.documents(s, dir))
      Dedup.containmentPairs(c, Dedup.winnowPairsFor(c, dir), minContain = 0.8)
    },

    // Per-lang dedup audit: docs total / clustered / dropped + drop rate.
    "q_dedup_report" -> { (s, dir) =>
      val c = Dedup.corpus(Tables.documents(s, dir))
      Dedup.dedupReport(c, Dedup.clustersFor(c, dir))
    },

    // Repeated-span removal audit (Lee'22 ExactSubstr at block
    // granularity): per-doc shadowed-block and surviving-token accounting
    // for the paragraph-dedup cut.
    "q_dedup_spanrm" -> { (s, dir) =>
      Dedup.spanRemovalReport(Dedup.corpus(Tables.documents(s, dir)))
    },

    // ExactSubstr-style maximal repeated token spans (seed-and-merge):
    // 5-gram seeds repeated ≥2× anywhere in the corpus, merged per doc
    // via gaps-and-islands — the substring-level signal doc-level
    // MinHash misses; one hash-keyed shuffle, never an all-pairs join.
    "q_dedup_rspans" -> { (s, dir) =>
      Dedup.repeatedSpans(Dedup.corpus(Tables.documents(s, dir)))
    },

    // Exact substring dedup (Lee'21 ExactSubstr): seed on repeated
    // window HASHES, verify by DIRECT STRING EQUALITY (a collision dies
    // at the verify, costing only its own row), merge into maximal
    // removal spans — the famous substring-level primitive whose truth
    // the oracle recomputes hash-free by grouping the window text itself.
    "q_dedup_substr" -> { (s, dir) =>
      Dedup.exactSubstrSpans(Dedup.corpus(Tables.documents(s, dir)))
    },

    // Removal accounting for the exact-substring cut: per doc the
    // disjoint covered mass, surviving tokens, and removed fraction —
    // q_dedup_spanrm's sibling at the string-verified token level
    // (kept = n − covered conserves exactly; zero-removal docs are rows).
    "q_dedup_substrrm" -> { (s, dir) =>
      Dedup.exactSubstrReport(Dedup.corpus(Tables.documents(s, dir)))
    },

    // MinHash Jaccard estimate per candidate pair — the verify stage that
    // costs one row per pair (no shingle re-join) when exactness can
    // yield; exact copies estimate 1.0 by construction.
    "q_dedup_minsim" -> { (s, dir) =>
      Dedup.minhashSimilarity(Dedup.corpus(Tables.documents(s, dir)))
    },

    // LSH bucket-size histogram per band — the tuning audit that exposes
    // fat buckets (quadratic candidate cost) before the self-join pays it.
    "q_dedup_lshstats" -> { (s, dir) =>
      Dedup.lshBucketStats(Dedup.corpus(Tables.documents(s, dir)))
    },

    // Quality-aware dedup: each cluster keeps its best-quality member
    // (ties → smaller id) instead of the minimum id — exact copies still
    // resolve to the original, near-dups to the cleanest variant.
    "q_dedup_best" -> { (s, dir) =>
      val c = Dedup.corpus(Tables.documents(s, dir))
      Dedup.dedupedCorpusBest(c, Dedup.clustersFor(c, dir))
        .select(col("doc_id"), col("lang"),
          graft.functions.TextFunctions.stringHash(col("text")).as("fp"))
    },

    // Content-defined chunking: variable-size token-aligned chunks with
    // md5-boundary tokens (native CdcChunks, pure narrow map) — chunk
    // boundaries survive token insertions, unlike fixed-stride blocks.
    "q_doc_cdc" -> { (s, dir) =>
      Tables.documents(s, dir).select(col("doc_id"),
          posexplode(graft.expressions.CdcChunks.cdc_chunks(col("text")))
            .as(Seq("chunk_ord", "chunk")))
        .select(col("doc_id"), col("chunk_ord").cast("long").as("chunk_ord"),
          col("chunk"),
          size(split(col("chunk"), " ", -1)).cast("long").as("n_tokens"))
    },

    // Sub-document dedup: every 20-token block keeps its first corpus-wide
    // occurrence, docs reassemble from surviving blocks — exact copies
    // vanish entirely, near-copies shrink to their novel tail.
    "q_dedup_para" -> { (s, dir) =>
      Dedup.paragraphDedup(Dedup.corpus(Tables.documents(s, dir)))
    },

    // Incremental (cross-corpus) dedup: the planted copies as the
    // "incoming" increment, the raw documents table as the reference —
    // LSH candidates incoming × reference, Jaccard-verified.
    "q_dedup_cross" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      Dedup.crossCorpusDuplicates(
        Dedup.corpus(docs).filter(col("doc_id") >= 1000000L),
        docs.select(col("doc_id"), col("lang"), col("text")))
    },
    // The whole training-data pipeline in one plan: planted corpus →
    // near-dup removal (MinHash-LSH + connected components) → per-lang
    // quality gate → deterministic stratified sample → sequence packing.
    // Every stage is the already-oracle-checked operator; this query
    // checks their COMPOSITION end to end.
    "q_pipeline_e2e" -> { (s, dir) =>
      // clean and kept each feed TWO branches of the next stage's join;
      // LAZY localCheckpoints (materialized by the query's own first
      // action, so building/Explaining the plan stays free) make the
      // corpus scan + dedup anti-join run once, not once per duplicated
      // subtree
      val c = Dedup.corpus(Tables.documents(s, dir))
      val clean = Dedup.dedupedCorpus(c, Dedup.clustersFor(c, dir))
        .localCheckpoint(false)
      val kept = clean.join(
        Curation.qualityFilter(clean).select(col("doc_id")), Seq("doc_id"))
        .localCheckpoint(false)
      val sampled = kept.join(
        Curation.sampleStratified(kept).select(col("doc_id")), Seq("doc_id"))
      Curation.packSequences(sampled)
    },

    // q_pipeline_e2e AFTER a takedown: the serving pipeline rebuilt on
    // corpus ∖ deleted WITHOUT re-clustering — the post-delete cluster
    // artifact (deleteClustersFor: touched components re-resolved,
    // untouched rows byte-identical) feeds the same dedup → gate →
    // sample → pack tail. The oracle recomputes everything from scratch
    // over the filtered corpus: incremental serving ≡ full rebuild, end
    // to end through the pack offsets.
    "q_pipeline_delete" -> { (s, dir) =>
      val c = Dedup.corpus(Tables.documents(s, dir))
      val deleted = c.filter(col("doc_id") % 30 === 0)
      val surv = c.join(deleted.select(col("doc_id")), Seq("doc_id"), "left_anti")
      val clean = Dedup.dedupedCorpus(surv,
        Dedup.deleteClustersFor(c, deleted, dir)).localCheckpoint(false)
      val kept = clean.join(
        Curation.qualityFilter(clean).select(col("doc_id")), Seq("doc_id"))
        .localCheckpoint(false)
      val sampled = kept.join(
        Curation.sampleStratified(kept).select(col("doc_id")), Seq("doc_id"))
      Curation.packSequences(sampled)
    },

    // q_pipeline_e2e AFTER one full crawl GENERATION (delete + add):
    // the generation's cluster artifact (crawlClustersFor — takedown
    // re-resolution + fold-in of the day's merge pairs, both touched-
    // components-only) feeds the same dedup → gate → sample → pack
    // tail, so a daily crawl costs the generation's incremental steps
    // plus the serving tail, never a corpus re-cluster. Oracle =
    // everything from scratch over (base ∖ removed) ∪ increment,
    // end to end through the pack offsets.
    "q_pipeline_crawl" -> { (s, dir) =>
      val c = Dedup.corpus(Tables.documents(s, dir))
      val base = c.filter(col("doc_id") < 2000000L)
      val removed = base.filter(col("doc_id") % 30 === 0)
      val incr = c.filter(col("doc_id") >= 2000000L)
      val fin = base
        .join(removed.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .unionByName(incr)
      val clean = Dedup.dedupedCorpus(fin,
        Dedup.crawlClustersFor(base, removed, incr, dir)).localCheckpoint(false)
      val kept = clean.join(
        Curation.qualityFilter(clean).select(col("doc_id")), Seq("doc_id"))
        .localCheckpoint(false)
      val sampled = kept.join(
        Curation.sampleStratified(kept).select(col("doc_id")), Seq("doc_id"))
      Curation.packSequences(sampled)
    },

    // q_pipeline_e2e with the TRAINED gate: dedup → distilled-classifier
    // keep-decision (Classifier.scoreOn: fit memoized on the raw corpus,
    // applied to the dedup survivors as a fresh stateless-narrow pass) →
    // stratified sample → pack. The CCNet composition the round-8
    // classifier family was built for — the student replaces the
    // heuristic percentile gate in the serving pipeline.
    "q_pipeline_qclf" -> { (s, dir) =>
      val c = Dedup.corpus(Tables.documents(s, dir))
      val clean = Dedup.dedupedCorpus(c, Dedup.clustersFor(c, dir))
        .localCheckpoint(false)
      val kept = clean.join(
        Classifier.scoreOn(Tables.documents(s, dir), clean, dir)
          .filter(col("pred") === 1L).select(col("doc_id")), Seq("doc_id"))
        .localCheckpoint(false)
      val sampled = kept.join(
        Curation.sampleStratified(kept).select(col("doc_id")), Seq("doc_id"))
      Curation.packSequences(sampled)
    },

    // IVF-style ANN: probe the 2 nearest centroid cells, search only them.
    "q_emb_ivf" -> { (s, dir) => Similarity.knnIvf(Tables.embeddings(s, dir)) },
    // IVF nprobe→recall tuning curve: recall@3 vs brute truth for probe
    // budgets 1/2/4 from ONE candidate pass (probe ranks nest, so each
    // budget re-ranks a prefix). |nprobes| output rows.
    "q_emb_nprobe" -> { (s, dir) =>
      Similarity.ivfRecallCurve(Tables.embeddings(s, dir))
    },

    // Product-quantization ANN: m-byte codes + ADC table lookups — the
    // vector-COMPRESSION scale path (IVF shards, PQ shrinks).
    "q_emb_pq" -> { (s, dir) => Similarity.knnPq(Tables.embeddings(s, dir)) },
    // OPQ (Ge'13): the 1-PC Householder rotation (the memoized
    // power-iteration fit the ablation family serves) aligns the dominant
    // correlated direction with subspace 0, then the SAME PQ chain at the
    // same byte budget — rotation is a narrow literal-array map, zero
    // extra shuffles.
    "q_emb_opq" -> { (s, dir) =>
      Similarity.knnOpq(Tables.embeddings(s, dir), dir)
    },
    // The equal-bytes bake-off: recall@5 of raw PQ vs OPQ against the
    // exact L2 truth (brute audit twin — the q_emb_knn cost class).
    "q_emb_opqrecall" -> { (s, dir) =>
      Similarity.opqRecall(Tables.embeddings(s, dir), dir)
    },
    // The Ge'13 ALTERNATION (round 13): after H1 axis-aligns PC1,
    // re-fit the dominant direction of the deflated (coordinate-0-
    // masked) rotated corpus and map it onto subspace 1's first axis
    // with a second Householder — the top-2 correlated directions land
    // in two DIFFERENT subspaces. Three-variant equal-bytes bake-off
    // (pq / opq / opq2) against the same brute exact-L2 truth.
    "q_emb_opq2" -> { (s, dir) =>
      Similarity.opq2Recall(Tables.embeddings(s, dir), dir)
    },
    // OPQ composed under IVF: cells bound WHERE (labels are
    // rotation-invariant; H orthogonal preserves the probe cosine),
    // rotated codes bound candidate COST — completes the composition
    // matrix next to q_emb_ivfpq/ivfpqr.
    "q_emb_ivfopq" -> { (s, dir) =>
      Similarity.knnIvfOpq(Tables.embeddings(s, dir), dir)
    },
    // …and the ALTERNATION-accepted rotation under IVF (round 13): the
    // serving consumer of opq2 — cells stay label clusters (isometry
    // preserves the probe cosine), accepted codes bound candidate cost.
    "q_emb_ivfopq2" -> { (s, dir) =>
      Similarity.knnIvfOpq2(Tables.embeddings(s, dir), dir)
    },

    // IVF-PQ: cells bound WHERE to search, codes bound candidate COST —
    // the billion-scale index layout (composition of q_emb_ivf + q_emb_pq).
    "q_emb_ivfpq" -> { (s, dir) => Similarity.knnIvfPq(Tables.embeddings(s, dir)) },
    // FAISS IndexIVFPQ's ACTUAL layout: codes trained on x − centroid
    // residuals (per-subspace Lloyd over the within-cell spread), query
    // distance tables per (query, probed cell) — same byte budget as
    // q_emb_ivfpq, materially better within-cell discrimination
    // (PqResidualSpec pins residual recall >= raw at equal bytes).
    "q_emb_ivfpqr" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Similarity.knnIvfPqResidual(e,
        cbOpt = Some(Similarity.pqrCodebookFor(e, dir)))
    },
    // The production vector-store query over the best layout: the
    // metadata predicate pushed to the residual-PQ candidate store
    // BEFORE the ADC (post-k filtering under-returns), index trained
    // once on the full corpus, nprobe widened 2 -> 4 to restore k from
    // the thinned cells — q_emb_filtered's discipline composed with
    // q_emb_ivfpqr's layout.
    "q_emb_fivfpqr" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Similarity.knnIvfPqResidual(e, nprobe = 4,
        storePred = col("vec_id") % 4 === 1,
        cbOpt = Some(Similarity.pqrCodebookFor(e, dir)))
    },

    // Scalar-quantization ANN (int8 SQ8): per-dim uniform codes within
    // corpus min/max bounds, bin-midpoint reconstruction distance — the
    // 4×-compression point between raw floats and PQ's 32×.
    "q_emb_sq" -> { (s, dir) => Similarity.knnSq(Tables.embeddings(s, dir)) },

    // Array function sampler over the embedding lists (slice/sort/minmax/
    // contains/position — all codegen'd built-ins).
    "q_array_funcs" -> { (s, dir) =>
      import s.implicits._
      val emb = $"embedding".cast("array<double>")
      Tables.embeddings(s, dir).select(
        $"vec_id",
        size($"embedding").cast("long").as("dims"),
        // try_element_at: out-of-range index → null, matching DuckDB's
        // list[i]; plain element_at ABORTS under ANSI (Spark 4 default)
        try_element_at(emb, lit(1)).as("first"),
        try_element_at(emb, lit(-1)).as("last"),
        array_max(emb).as("mx"),
        array_min(emb).as("mn"),
        try_element_at(array_sort(emb), lit(32)).as("median_lo"),
        array_position(emb, array_max(emb)).cast("long").as("argmax1"),
        array_contains(emb, lit(0.0d)).as("has_zero"),
        try_element_at(slice(emb, 1, 4), lit(2)).as("slice2"),
        try_element_at(reverse(emb), lit(1)).as("rev_first")
      )
    },

    // Embedding-cosine near-dup pairs (planted scaled copies → cos = 1.0).
    "q_dedup_embed" -> { (s, dir) => Similarity.embNearDupPairs(Tables.embeddings(s, dir)) },

    // SemDeDup-style semantic dedup: nearest-centroid cell assignment,
    // then within-cell cosine ≥ τ drops the higher id; output = kept set.
    "q_dedup_semantic" -> { (s, dir) => Similarity.semanticDedup(Tables.embeddings(s, dir)) },

    // As-of join: each click joined to the user's latest prior-or-equal
    // purchase (union+window composition — one shuffle, no range
    // explosion; see operators/AsOfJoin). Oracle: DuckDB's native ASOF.
    "q_asof" -> { (s, dir) =>
      import s.implicits._
      val e = Tables.events(s, dir)
      val clicks = e.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts", $"value")
      val purchases = e.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"value".as("purchase_value"))
      AsOfJoin.asof(clicks, purchases, "user_id", "ts", "ts", Seq("purchase_value"))
        .select($"event_id", $"user_id", fmtTs($"ts").as("ts"), $"purchase_value")
    },

    // ---- Multimodal binary columns (SURVEY §2 extensions; decode stubbed)
    "q_mm_meta" -> { (s, dir) =>
      Multimodal.metadata(Multimodal.mediaTable(Tables.documents(s, dir)))
    },
    "q_mm_decode" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      Multimodal.decodedMetaCols(Multimodal.mediaTable(docs), docs.select(col("doc_id"), col("text")))
    },
    "q_mm_frames" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      Multimodal.frameSample(
        Multimodal.decodedMetaCols(Multimodal.mediaTable(docs), docs.select(col("doc_id"), col("text"))))
    },
    "q_mm_features" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      Multimodal.featureExtract(Multimodal.mediaTable(docs), docs.select(col("doc_id"), col("text")))
    },
    "q_mm_resize" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      Multimodal.resizePlan(
        Multimodal.decodedMetaCols(Multimodal.mediaTable(docs), docs.select(col("doc_id"), col("text"))))
    },

    // ---- Similarity search (embeddings; SURVEY §2 extensions) -----------
    "q_emb_knn" -> { (s, dir) => Similarity.knnBrute(Tables.embeddings(s, dir)) },
    // MMR diversified rerank (Carbonell-Goldstein): kOut greedy rounds of
    // argmax lambda*rel - (1-lambda)*maxSim INSIDE the top-kCand
    // shortlist — pairwise work bounded by |queries|*kCand, never the
    // corpus; the rerank every retrieval stack bolts on when the index
    // serves five copies of the same page.
    "q_emb_mmr" -> { (s, dir) => Similarity.mmrRerank(Tables.embeddings(s, dir)) },
    // MMR over the TRAINED-IVF shortlist — the production composition:
    // candidates from the index the maintenance family manages (probe
    // nprobe trained cells, search members only — q_emb_ivft economics);
    // q_emb_mmr's brute shortlist is the exact-truth audit twin.
    "q_emb_mmrt" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Similarity.mmrRerankTrained(e, Similarity.kmeansFitMemo(e, dir, "all"))
    },
    // Two-stage binary-quantization kNN: stage 1 ranks by Hamming over
    // 64 mean-centered sign bits packed in two 32-bit words (8 bytes
    // per vector — 32× smaller than the float store, popcount scan);
    // stage 2 exact-reranks only the top-R shortlist. The modern
    // vector-store BQ+rescore serving layout.
    "q_emb_bq" -> { (s, dir) =>
      Similarity.knnBqRerank(Tables.embeddings(s, dir), queryCap = 64)
    },
    // Recall@3 of the BQ rerank vs brute truth — prices the 8-byte
    // stage-1 store against the exact scan.
    "q_emb_bqrecall" -> { (s, dir) =>
      Similarity.bqRecall(Tables.embeddings(s, dir))
    },
    // IVF+BQ over the TRAINED quantizer (faiss IVF+rescore): nprobe
    // trained cells bound WHERE, 8-byte codes bound the in-cell scan
    // cost, floats only at the top-R rerank — the BQ rescore path on
    // the index the maintenance family manages. nprobe=4 (the widened
    // budget the trained recall curve prices at 0.77); measured: the
    // bits cost ZERO recall vs the cell bound at this SF — cells are
    // the budget, the 8-byte scan is free (spec-pinned).
    "q_emb_ivfbq" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Similarity.knnIvfBqTrained(e, Similarity.kmeansFitMemo(e, dir, "all"),
        nprobe = 4)
    },
    // Recall@3 of the cells × bits compound budget vs brute truth.
    "q_emb_ivfbqrecall" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Similarity.ivfBqRecall(e, Similarity.kmeansFitMemo(e, dir, "all"),
        nprobe = 4)
    },
    // RESIDUAL BQ under the trained IVF (faiss-faithful): codes =
    // sign(x − centroid(cell(x))) — zero-centered per cell by
    // construction, no threshold table; the query re-derives its
    // residual per probed cell (the residual-PQ discipline), so
    // Hamming compares like with like inside each cell.
    "q_emb_ivfbqr" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Similarity.knnIvfBqResidualTrained(e,
        Similarity.kmeansFitMemo(e, dir, "all"), nprobe = 4)
    },
    // Recall@3 of the residual-code variant vs brute truth.
    "q_emb_ivfbqrrecall" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Similarity.ivfBqResidualRecall(e,
        Similarity.kmeansFitMemo(e, dir, "all"), nprobe = 4)
    },
    "q_emb_buckets" -> { (s, dir) =>
      Similarity.lshBuckets(Tables.embeddings(s, dir)).select(col("vec_id"), col("bucket"))
    },
    "q_emb_ann" -> { (s, dir) => Similarity.knnLsh(Tables.embeddings(s, dir)) },

    // Multi-probe LSH ANN: query probes its bucket + all 1-bit flips —
    // the recall/probes trade that fixes single-table LSH's ceiling
    // without more tables or an IVF retrain.
    "q_emb_annmp" -> { (s, dir) => Similarity.knnLshMultiProbe(Tables.embeddings(s, dir)) },
    // Cluster-diversified serving list: the multi-probe candidates
    // re-rank under a per-cell cap of one (each topic cell contributes
    // its best hit), so a dense-topic query still returns k distinct
    // store regions — the SERP-diversity / collapse-near-dups front-end
    // shape, index-priced end to end.
    "q_emb_divtopk" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Similarity.diversifiedTopK(e, Similarity.kmeansFitMemo(e, dir, "all"))
    },
    // ANN quality audit: recall@3 of the LSH index against brute-force
    // ground truth, per query — the measurement that gates an index
    // rollout. Both sides are existing operators; the join is
    // (qid, vec_id)-keyed, output bounded by |queries|. The query set is
    // capped at a CONSTANT 64 ids (smallest mod-50 vec_ids): the brute
    // truth stage is then O(64·n) — an uncapped mod filter is a corpus
    // fraction and the truth work would grow O(n²/50).
    "q_emb_recall" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val truth = Similarity.knnBrute(emb, queryCap = 64)
        .filter($"rn" <= 3).select($"qid", $"vec_id")
      val ann = Similarity.knnLsh(emb, queryCap = 64).select($"qid", $"vec_id")
      val hit = truth.join(ann, Seq("qid", "vec_id"), "left_semi")
        .groupBy($"qid").agg(count(lit(1)).as("n_hit"))
      truth.groupBy($"qid").agg(count(lit(1)).as("n_truth"))
        .join(hit, Seq("qid"), "left")
        .select($"qid", $"n_truth", coalesce($"n_hit", lit(0L)).as("n_hit"),
          (coalesce($"n_hit", lit(0L)).cast("double") / $"n_truth".cast("double"))
            .as("recall"))
    },
    // Predicate-filtered ANN recall audit: the metadata predicate
    // (vec_id % 4 == 1, ~25% selective, orthogonal to the cell
    // structure) is pushed to the candidate side BEFORE the cosine
    // verify; the widened nprobe=4 budget restores k from the thinned
    // cells. Truth = brute top-k over the FILTERED store.
    "q_emb_filtered" -> { (s, dir) =>
      Similarity.filteredRecall(Tables.embeddings(s, dir),
        col("vec_id") % 4 === 1)
    },
    "q_emb_centroid" -> { (s, dir) => Similarity.centroids(Tables.embeddings(s, dir)) },
    // Lloyd's k-means (2 iterations, deterministic init): trains the
    // coarse quantizer IVF/IVF-PQ assume — broadcast k-row centroids,
    // narrow argmin assignment, one (cell, dim)-keyed shuffle per update,
    // fixed-point sums so the result is aggregation-order-independent.
    "q_emb_kmeans" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Similarity.kmeansAssign(e, Similarity.kmeansFitMemo(e, dir, "all"))
    },
    // Greedy k-center coreset (Gonzalez farthest-point traversal): the
    // deterministic 2-approx selection pass a curation pipeline runs to
    // pick a space-COVERING exemplar set (active-learning seeds, eval
    // probes, diversity anchors) — k-means optimizes mean distortion and
    // starves outliers; k-center bounds the worst case. k-1 rounds, each
    // ONE narrow least()-update pass against only the new center plus ONE
    // TakeOrdered single-row reduce; driver state = the k centers only.
    "q_emb_kcenter" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Similarity.kmeansAssign(e, Similarity.kCenterFitMemo(e, dir))
    },
    // Coverage audit over the frozen k-center exemplars: per center,
    // members + covering radius (the global max IS the k-center
    // objective the 2-approx bound speaks about). Rides the memoized
    // center table; one grouped agg, ≤ k rows.
    "q_emb_kcradius" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Similarity.kCenterRadius(e, Similarity.kCenterFitMemo(e, dir))
    },
    // IVF index GROWTH audit: the day's new vectors (planted +1e6 tier)
    // assign against the FROZEN production centroids — base assignments
    // never recompute; per cell: base/new occupancy, integer growth
    // permille, division-free overfull flag naming the cells the next
    // reassign/split pass must visit. The ANN-side parallel of
    // q_dedup_incr's daily-crawl merge.
    "q_emb_append" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Similarity.ivfAppend(e, Similarity.kmeansFitMemo(e, dir, "all"))
    },
    // Split the overfull cells the growth audit flags: one deterministic
    // 2-means step (min/max-id seeds, no RNG) per flagged cell; per
    // (cell, sub) the member count and mean d2 before/after — the
    // split's measured fit improvement. Closes the append loop the way
    // reassign closes the staleness loop.
    "q_emb_split" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Similarity.splitOverfull(e, Similarity.kmeansFitMemo(e, dir, "all"))
    },

    // IVF takedown: the delete batch (vec_id % 10 == 3) assigns against
    // the frozen centroids — O(delete set), base never recomputes — and
    // leaves the index as per-cell occupancy deltas with a division-free
    // underfull flag. The oracle derives n_after the OTHER way (filtering
    // the full assignment), pinning subset-assignment determinism.
    "q_emb_delete" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Similarity.ivfDelete(e, Similarity.kmeansFitMemo(e, dir, "all"),
        e.filter(col("vec_id") % 10 === 3))
    },

    // One IVF crawl GENERATION: the takedown batch and the day's new
    // vectors both assign against the frozen centroids; per-cell NET
    // occupancy carries both flags against the POST-generation total —
    // a cell the delete alone would flag underfull is healthy once the
    // appends refill it (the composition's accounting, pinned in
    // DeleteSpec). The ANN sibling of q_dedup_crawl.
    "q_emb_crawl" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Similarity.ivfCrawl(e, Similarity.kmeansFitMemo(e, dir, "all"),
        e.filter(col("vec_id") % 10 === 3))
    },

    // Search the index you MAINTAIN: residual-PQ ANN whose probe table
    // AND candidate membership are the TRAINED kmeansFitMemo cells — the
    // same frozen quantizer append/split/delete/merge/crawl manage
    // (round-10's one structural gap: the label-cell searches read an
    // index no maintenance op managed). Codebook memoized as a served
    // artifact; TrainedIvfSpec pins cell-table identity + the recall bar.
    "q_emb_ivft" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Similarity.knnIvfPqResidualTrained(e,
        Similarity.kmeansFitMemo(e, dir, "all"),
        cbOpt = Some(Similarity.pqrCodebookTrainedFor(e, dir)))
    },

    // The production vector-store query on the UNIFIED layout: metadata
    // predicate pushed into the trained-cell residual store BEFORE the
    // ADC (q_emb_filtered's discipline), nprobe widened 2 → 4 to restore
    // k from the thinned cells — q_emb_fivfpqr's composition, now over
    // the index the maintenance family manages.
    "q_emb_fivft" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Similarity.knnIvfPqResidualTrained(e,
        Similarity.kmeansFitMemo(e, dir, "all"), nprobe = 4,
        storePred = col("vec_id") % 4 === 1,
        cbOpt = Some(Similarity.pqrCodebookTrainedFor(e, dir)))
    },

    // The nprobe→recall tuning sweep on the UNIFIED layout — the
    // read-out that picks q_emb_ivft's serving budget against the index
    // the maintenance family manages (q_emb_nprobe's sibling for the
    // trained coarse quantizer). One candidate pass serves every budget;
    // truth is the constant-capped brute stage.
    "q_emb_ivftrecall" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Similarity.ivfRecallCurveTrained(e, Similarity.kmeansFitMemo(e, dir, "all"))
    },

    // Serving after a crawl GENERATION: the store is (corpus ∖ deleted)
    // ∪ increment assigned against the frozen trained centroids — the
    // exact subsets q_emb_crawl's net-occupancy accounting prices — and
    // queries probe those cells with an exact cosine verify. The
    // search-over-the-maintained-index composition, end to end.
    "q_emb_servecrawl" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Similarity.serveCrawl(e, Similarity.kmeansFitMemo(e, dir, "all"),
        e.filter(col("vec_id") % 10 === 3))
    },

    // Merge-underfull: the action the delete audit's flag points at —
    // each underfull cell's surviving members fold into the nearest
    // healthy centroid (per-move fit accounting), closing the delete
    // loop the way q_emb_split closes the append loop. Demo threshold
    // 1/1 = below average (the even delete rule thins uniformly; the
    // production 1/2 coupling is fixture-pinned in DeleteSpec).
    "q_emb_merge" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Similarity.mergeUnderfull(e, Similarity.kmeansFitMemo(e, dir, "all"),
        e.filter(col("vec_id") % 10 === 3))
    },

    // IVF index-staleness audit: centroids frozen on the even-id half,
    // every vector assigned against them; per cell, how post-build
    // vectors fit vs training ones — the retrain-decision read-out.
    "q_emb_stale" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Similarity.indexStaleness(e, Similarity.kmeansFitMemo(
        e.filter(col("vec_id") % 2 === 0), dir, "even"))
    },
    // IVF maintenance: reassign-drifted-cells — the step the staleness
    // audit points at: re-train centroids for flagged cells only (k' ≪ k
    // rows), reassign their members; healthy cells byte-identical. Rides
    // the same frozen even-half snapshot memo as q_emb_stale.
    "q_emb_reassign" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Similarity.reassignDrifted(e, Similarity.kmeansFitMemo(
        e.filter(col("vec_id") % 2 === 0), dir, "even"))
    },

    // Hard-negative mining: per query vector, the k most-similar vectors
    // with a DIFFERENT label — the near-miss negatives contrastive
    // training wants. Brute ground-truth baseline (IVF/PQ compose for
    // the billion-scale path); query side constant-capped (64 smallest
    // mod-50 ids) so the brute join is O(cap·n), not O(n²/50).
    "q_emb_hardneg" -> { (s, dir) =>
      Similarity.hardNegatives(Tables.embeddings(s, dir), queryCap = 64)
    },
    // Hard-POSITIVE mining: per query vector, the k LEAST-similar
    // SAME-label vectors — the label-noise / incoherent-class audit
    // (cleanlab-style) a curation pass runs before contrastive training
    // trusts the labels as positives. Same constant cap as hardneg.
    "q_emb_hardpos" -> { (s, dir) =>
      Similarity.hardPositives(Tables.embeddings(s, dir), queryCap = 64)
    },

    // Semantic topic profile: k-means cells joined back to documents —
    // per-(cell, lang) doc counts, char volume, within-cell share; the
    // topic-mix audit read before reweighting a training blend.
    "q_emb_topics" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Similarity.topicProfile(e, Tables.documents(s, dir),
        Similarity.kmeansFitMemo(e, dir, "all"))
    },
    // Bitext mining: best pivot-language (en) neighbor per non-en query
    // doc + ratio margin best/second — the parallel-corpus construction
    // op with its quality filter signal (Artetxe–Schwenk margin family).
    "q_emb_bitext" -> { (s, dir) =>
      Similarity.bitextMine(Tables.embeddings(s, dir), Tables.documents(s, dir))
    },
    // IVF cell-balance audit: per-cell count, exact permille share, and
    // imbalance factor n·k/total — the index-health read-out (fat cells
    // cost every probing query; empty cells waste probe slots). Rides
    // the memoized centroid table shared with kmeans/topics/stale.
    "q_emb_cellbal" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Similarity.cellBalance(e, Similarity.kmeansFitMemo(e, dir, "all"))
    },
    // Simplified-silhouette cluster-quality audit: per cell, the mean of
    // (1 − a/b) over members (a = own-centroid distance, b =
    // second-nearest) — the k-picker / degenerate-quantizer gate. Rides
    // the memoized centroid table; quantized order-free sums; k rows out.
    "q_emb_silhouette" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      Similarity.silhouette(e, Similarity.kmeansFitMemo(e, dir, "all"))
    },
    // Embedding-corpus health audit: per-label non-finite / zero /
    // extreme-norm counts, dim range, healthy-subset mean norm — the QA
    // gate before any ANN index build. One narrow pass, O(1) agg state.
    "q_emb_health" -> { (s, dir) =>
      Similarity.embeddingHealth(Tables.embeddings(s, dir))
    },
    // Semantic eval-set decontamination: per eval item, vector-store
    // hits with cosine ≥ 0.95 via the multi-probe buckets — the
    // embedding-level complement of the n-gram decontam pass
    // (paraphrased/re-embedded leakage). Index-priced, never brute.
    "q_emb_decontam" -> { (s, dir) =>
      Similarity.semanticDecontam(Similarity.embCorpus(Tables.embeddings(s, dir)))
    },
    // Per-dimension moment audit: mean/variance/std + variance share —
    // the diagonal-whitening read-out next to pc1's rotational one.
    // One map-side-combinable grouped agg to 64 rows; integer share.
    "q_emb_dimstats" -> { (s, dir) =>
      Similarity.dimStats(Tables.embeddings(s, dir))
    },
    // Top principal direction + eigenvalue by power iteration — the
    // anisotropy audit (dominant-direction pathology vs isotropy; the
    // measured explanation for the JL audit's verdict) and the first
    // step of a PCA/whitening pass. Each round = ONE 64-slot quantized
    // aggregation row to the driver (the k-means/classifier pattern).
    "q_emb_pc1" -> { (s, dir) =>
      Similarity.powerIterationAudit(Tables.embeddings(s, dir), dir)
    },
    // Mean + top-component ablation (all-but-the-top, Mu-Viswanath'18):
    // per vector, the coefficient along the fitted top direction and
    // the centered energy surviving its removal — the FIX the
    // anisotropy audit points at. One narrow pass against the
    // broadcast-literal fit; rides the memoized pc1 stage.
    "q_emb_ablate" -> { (s, dir) =>
      Similarity.meanAblate(Tables.embeddings(s, dir), dir)
    },
    // JL ranking-preservation audit: brute top-k in the 16-dim PROJECTED
    // space vs brute top-k in the original space (constant-capped query
    // set, both sides audit-priced) — what the distortion ratio buys at
    // ranking granularity before an index build commits to narrow vectors.
    "q_emb_jlrecall" -> { (s, dir) =>
      Similarity.jlRecall(Tables.embeddings(s, dir))
    },
    // Ablated-space ranking audit: the q_emb_jlrecall shape with the
    // ranking run over mean+PC1-ablated residual vectors instead of the
    // JL projection, same raw brute truth — measures whether the
    // all-but-the-top fix (q_emb_ablate) preserves or rewrites
    // neighborhoods, closing the pc1→dimstats→jlrecall diagnosis loop
    // with a GO/NO-GO that is measured, not assumed.
    "q_emb_ablrecall" -> { (s, dir) =>
      Similarity.ablRecall(Tables.embeddings(s, dir), dir)
    },
    // JL sign-projection distortion audit: per-vector squared norm
    // before/after the deterministic ±1 projection to 16 dims + ratio —
    // the read-out before an ANN index trades 64-wide vectors for
    // 16-wide ones. One narrow fully-codegen'd pass (native SignProject
    // + SeqDot); no join, no shuffle.
    "q_emb_jlproj" -> { (s, dir) =>
      Similarity.jlProject(Tables.embeddings(s, dir))
    },
    // Embedding-store ingest: near-dup removal → IVF cell assignment.
    "q_emb_e2e" -> { (s, dir) => Similarity.embIngest(Tables.embeddings(s, dir)) },
    // Known-item retrieval audit: MRR@10 + found-rate of each planted
    // original's scaled copy in the multi-probe ANN list — rank-position
    // quality with NO brute stage (the plant IS the ground truth), so the
    // audit stays index-priced at any corpus size. Integer nano-unit
    // reciprocal ranks; ≤ |labels| rows.
    "q_emb_mrr" -> { (s, dir) =>
      Similarity.knownItemMrr(Tables.embeddings(s, dir))
    },

    // Contrastive training-triple factory: dedup clusters supply
    // (anchor=keeper, positive=member) pairs; hard negatives are the k
    // nearest OTHER-cluster vectors among the anchor's multi-probe LSH
    // buckets (per-bucket occupant cap → per-anchor cost CONSTANT; the
    // 30× scale probe measured the brute variant quadratic). The
    // anchor's whole cluster is excluded (a near-dup offered as a
    // negative poisons the loss). Rides the memoized cluster stage.
    "q_pipeline_pairs" -> { (s, dir) =>
      Similarity.contrastiveTriplesAnn(
        Dedup.clustersFor(Dedup.corpus(Tables.documents(s, dir)), dir),
        Tables.embeddings(s, dir))
    },

    // ---- Deduplication (documents + planted dups; SURVEY §2 extensions) -
    "q_dedup_exact" -> { (s, dir) =>
      Dedup.exactDuplicates(Dedup.corpus(Tables.documents(s, dir)))
    },
    "q_dedup_minhash" -> { (s, dir) =>
      Dedup.minhashCandidates(Dedup.corpus(Tables.documents(s, dir)))
    },
    // EXACT set-similarity join via prefix filtering (PPJoin/AllPairs):
    // every Jaccard ≥ 4/5 pair with ZERO misses — the exact-recall
    // complement to MinHash LSH. Rational threshold: integer prefix
    // ceil and integer verify (a float ⌈0.8·5⌉ rounds to 5 and silently
    // shortens the prefix, breaking the no-miss theorem).
    "q_dedup_ppjoin" -> { (s, dir) =>
      Dedup.ppjoinPairs(Dedup.corpus(Tables.documents(s, dir)))
    },
    // Pairs → connected components → deterministic keeper per cluster.
    "q_dedup_clusters" -> { (s, dir) =>
      Dedup.clustersFor(Dedup.corpus(Tables.documents(s, dir)), dir)
    },
    "q_doc_simhash" -> { (s, dir) =>
      Dedup.simhash(Dedup.corpus(Tables.documents(s, dir)))
    },
    "q_dedup_simhash" -> { (s, dir) =>
      Dedup.simhashPairs(Dedup.corpus(Tables.documents(s, dir)))
    },
    "q_dedup_jaccard" -> { (s, dir) =>
      Dedup.jaccardPairsFor(Dedup.corpus(Tables.documents(s, dir)), dir)
    },
    // Incremental dedup-index maintenance — the daily-crawl pattern: the
    // base corpus's token/band index is PERSISTED to parquet once
    // (Dedup.dedupIndexFor); the increment (the +2e6 exact-copy tier
    // plays the new crawl) merges in by re-opening only the buckets it
    // touches and verifying only candidate-member token sets. Output =
    // base pairs ∪ merge pairs, which the oracle checks against a FULL
    // recompute over base ∪ increment — incremental ≡ from-scratch.
    "q_dedup_incr" -> { (s, dir) =>
      val c = Dedup.corpus(Tables.documents(s, dir))
      Dedup.incrementalJaccardPairs(
        c.filter(col("doc_id") < 2000000L),
        c.filter(col("doc_id") >= 2000000L), dir)
    },
    // Incremental CLUSTER maintenance — the step after q_dedup_incr in
    // the daily-crawl loop: the increment's verified edges fold into the
    // persisted base cluster table by re-resolving ONLY the components
    // they touch (star edges preserve base connectivity); untouched
    // cluster rows pass through byte-identical. Oracle = the full
    // recursive-closure recompute over base ∪ increment.
    "q_dedup_incrclusters" -> { (s, dir) =>
      val c = Dedup.corpus(Tables.documents(s, dir))
      Dedup.incrementalClustersFor(
        c.filter(col("doc_id") < 2000000L),
        c.filter(col("doc_id") >= 2000000L), dir)
    },
    // Jaccard-threshold sensitivity: verified pairs down to a 0.3 floor
    // banded into fixed 0.05 steps + cumulative kept-at-or-above — the
    // read-out before a curation run picks its dedup bar (the pair-side
    // complement of the classifier PR sweep).
    "q_dedup_jhist" -> { (s, dir) =>
      Dedup.jaccardHistogram(Dedup.corpus(Tables.documents(s, dir)), dir)
    },
    // LSH S-curve audit: measured band-collision rate per exact-Jaccard
    // band vs the 1-(1-j^r)^b theory, over a bounded cross-tier audit
    // subset (the only honest way to see P(collision | j) — it needs
    // ground truth for NON-collided pairs too). Theory ppm values are
    // driver-computed literals shared with the mirror.
    "q_dedup_scurve" -> { (s, dir) =>
      Dedup.scurveAudit(Dedup.corpus(Tables.documents(s, dir)))
    },
    // Index compaction — the generation roll ending the daily-crawl
    // loop: base store + increment rows rewritten as one next-generation
    // parquet index (base never re-shingled). The emitted bucket stats
    // come FROM the compacted store; the oracle recomputes them from a
    // full rebuild over base ∪ increment — compacted ≡ rebuilt.
    "q_dedup_compact" -> { (s, dir) =>
      val c = Dedup.corpus(Tables.documents(s, dir))
      val (_, bands) = Dedup.compactIndex(
        c.filter(col("doc_id") < 2000000L),
        c.filter(col("doc_id") >= 2000000L), dir)
      bands.groupBy(col("band"), col("bh"))
        .agg(count(lit(1)).as("bucket_size"))
        .groupBy(col("band"), col("bucket_size"))
        .agg(count(lit(1)).as("n_buckets"))
    },
    // Takedown propagation through the persisted INDEX store — the
    // DELETE primitive next to ADD (q_dedup_incr) and COMPACT
    // (q_dedup_compact): the takedown batch's rows leave the parquet
    // tok/band store via two anti-join scans (base never re-shingled);
    // bucket stats come FROM the deleted store, the oracle rebuilds them
    // from scratch over base ∖ deleted — deleted ≡ rebuilt.
    "q_dedup_delindex" -> { (s, dir) =>
      val c = Dedup.corpus(Tables.documents(s, dir))
      val base = c.filter(col("doc_id") < 2000000L)
      val (_, bands) = Dedup.deleteFromIndex(
        base, base.filter(col("doc_id") % 30 === 0), dir)
      bands.groupBy(col("band"), col("bh"))
        .agg(count(lit(1)).as("bucket_size"))
        .groupBy(col("band"), col("bucket_size"))
        .agg(count(lit(1)).as("n_buckets"))
    },
    // Takedown propagation through the persisted CLUSTER table: touched
    // components (those containing a deleted member) re-resolve over
    // their surviving ACTUAL pair edges — a deleted doc can be a cut
    // vertex, so star edges would glue the split halves back together —
    // while untouched rows pass through byte-identical. Oracle = the
    // full recursive-closure recompute over corpus ∖ deleted.
    "q_dedup_delete" -> { (s, dir) =>
      val c = Dedup.corpus(Tables.documents(s, dir))
      Dedup.deleteClustersFor(c, c.filter(col("doc_id") % 30 === 0), dir)
    },
    // One full crawl GENERATION — the composition the snapshot diff's
    // sets feed: takedown leaves the persisted index (anti-join scans),
    // the new crawl merges against the POST-DELETE store (bucket-
    // bounded), surviving base pairs ride the persisted pair artifact
    // with removed-touching rows anti-joined out. The corpus is never
    // re-scanned; the oracle recomputes the pair set from scratch over
    // (base \ removed) UNION increment — generation ≡ rebuild.
    "q_dedup_crawl" -> { (s, dir) =>
      val c = Dedup.corpus(Tables.documents(s, dir))
      val base = c.filter(col("doc_id") < 2000000L)
      Dedup.crawlPairsFor(
        base, base.filter(col("doc_id") % 30 === 0),
        c.filter(col("doc_id") >= 2000000L), dir)
    },
    // The crawl generation's CLUSTER side: takedown re-resolution over
    // surviving actual edges, then the day's merge pairs fold into the
    // post-delete table (touched components only at both steps — the
    // increment can re-bridge components the delete split). Oracle =
    // full recursive-closure recompute over the final corpus.
    "q_dedup_crawlclusters" -> { (s, dir) =>
      val c = Dedup.corpus(Tables.documents(s, dir))
      val base = c.filter(col("doc_id") < 2000000L)
      Dedup.crawlClustersFor(
        base, base.filter(col("doc_id") % 30 === 0),
        c.filter(col("doc_id") >= 2000000L), dir)
    },

    // Source-pair duplicate matrix: verified near-dup pairs rolled up
    // to (source, source) counts + order-free fixed-point mean Jaccard
    // — the provenance read-out (which sources copy which) a curation
    // run reads before dropping a SOURCE rather than documents.
    "q_dedup_srcmatrix" -> { (s, dir) =>
      Dedup.sourcePairMatrix(Tables.documents(s, dir), dir)
    },
    // Source centrality over the cross-source dup graph: PageRank-style
    // power iteration (6 fixed rounds, damping 85/100) on nodes=sources,
    // edges weighted by verified cross-source pair counts — the signal
    // that separates original sources from mirrors/aggregators before
    // sourceMix picks volumes. Integer 1e12-scale ranks; per-edge floors
    // before order-free long sums.
    "q_doc_srcrank" -> { (s, dir) =>
      Dedup.sourceRank(Tables.documents(s, dir), dir)
    },

    // ---- Event-time operators (events table; SURVEY §2 extension ops) ---
    // Outputs format timestamps as microsecond strings so the comparison
    // is representation-independent.

    // Tumbling 1-hour windows: the batch shape of the streaming windowed
    // agg (watermark + window in streaming/EventStream).
    "q_ev_tumbling" -> { (s, dir) =>
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"), sum(dec2($"value")).cast("double").as("sum_value"))
        .select(fmtTs(col("window.start")).as("w_start"), $"event_type", $"n", $"sum_value")
    },

    // Distinct-aggregation under an event-time window: exact uniques per
    // (hour, type). Spark plans the distinct as a two-phase expand+agg —
    // partial per (window, type, user), then the roll-up; swap in
    // approx_count_distinct (HLL, no expand) when exactness can yield.
    "q_ev_uniques" -> { (s, dir) =>
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"), count_distinct($"user_id").as("n_users"))
        .select(fmtTs(col("window.start")).as("w_start"), $"event_type", $"n", $"n_users")
    },

    // Ordered funnel per user: first view → first click AFTER that view →
    // first purchase AFTER that click. Three conditional-min aggregations
    // chained by equi-joins on user_id (each stage's frame is ≤ |users|
    // rows) — never a per-user event sort, never a self-join on events.
    "q_ev_funnel" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.events(s, dir).select($"user_id", $"ts", $"event_type")
      val v = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ts").as("first_view"))
      val c = ev.filter($"event_type" === "click").join(v, "user_id")
        .filter($"ts" > $"first_view")
        .groupBy($"user_id").agg(min($"ts").as("first_click"))
      val p = ev.filter($"event_type" === "purchase").join(c, "user_id")
        .filter($"ts" > $"first_click")
        .groupBy($"user_id").agg(min($"ts").as("first_purchase"))
      v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
        .select($"user_id", fmtTs($"first_view").as("first_view"),
          fmtTs($"first_click").as("first_click"),
          fmtTs($"first_purchase").as("first_purchase"),
          $"first_purchase".isNotNull.as("converted"))
    },

    // Per-user anomaly flags — the batch twin of the streaming
    // StatefulOps.runningUserStats: flag events > 2σ from the user's
    // mean. Variance is spelled EXPLICITLY ((Σx² − (Σx)²/n)/(n−1) over
    // exact DECIMAL sums cast to double) instead of stddev_samp — the
    // built-in's Welford order differs between engines in the last ulp,
    // the explicit form is bit-identical. One partial-agg shuffle for
    // stats + a broadcast-back join; no window.
    "q_ev_anomaly" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.events(s, dir)
        .select($"event_id", $"user_id", dec2($"value").as("v"))
      val stats = ev.groupBy($"user_id").agg(
        count(lit(1)).as("n"),
        sum($"v").cast("double").as("s1"),
        sum($"v" * $"v").cast("double").as("s2"))
        .filter($"n" >= 2)
        .select($"user_id", $"n",
          ($"s1" / $"n".cast("double")).as("mean"),
          sqrt(($"s2" - $"s1" * $"s1" / $"n".cast("double")) / ($"n" - 1).cast("double"))
            .as("sd"))
      ev.join(broadcast(stats), "user_id")
        .select($"event_id", $"user_id", $"v".cast("double").as("value"),
          $"mean", $"sd",
          (abs($"v".cast("double") - $"mean") > $"sd" * 2.0).as("flagged"))
    },

    // Recency-weighted user activity (half-life = 1 day) — the
    // exponential-decay counter behind "active user" ranking. Weights are
    // EXACT dyadic integers: an event Δ days before the corpus horizon
    // weighs 2^(50−Δ) (truncating to 0 beyond 50 days, i.e. below the
    // 2^-50 tail), summed in DECIMAL(38,0) — order-independent under
    // shuffle reduce and bit-identical cross-engine, unlike a float
    // Σ 0.5^Δ (a float sum depends on reduce order). The sum is kept
    // DECIMAL internally (overflow would error, not wrap) and EMITTED as
    // BIGINT: the driver's hasher compares rendered values, and DuckDB's
    // pandas path renders DECIMAL(38,0) as float64 while Spark's parquet
    // decimal stays exact — two renderings of identical values. Int64
    // headroom: max per-user sum ≈ n_same_day_events · 2^50, so overflow
    // needs > 2^63/2^50 = 8,192 same-day events for one user — far above
    // any observed density; the internal DECIMAL sum errors first anyway.
    // The float score is ewma_q50 / 2^50, left to the consumer. Scale:
    // narrow date map + 1-row broadcast horizon + one grouped agg, O(1)
    // state.
    "q_ev_ewma" -> { (s, dir) =>
      import s.implicits._
      val e = Tables.events(s, dir).select($"user_id", to_date($"ts").as("d"))
      val h = e.agg(max($"d").as("hd"))
      e.crossJoin(broadcast(h))
        .withColumn("dd", datediff($"hd", $"d"))
        .withColumn("wt", when($"dd" <= 50,
          expr("shiftleft(cast(1 as bigint), 50 - cast(dd as int))"))
          .otherwise(lit(0L)))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"), max($"d").as("last_day"),
          sum($"wt".cast("decimal(38,0)")).cast("long").as("ewma_q50"))
    },

    // Vocabulary frequency-of-frequencies (the Zipf/hapax audit): how
    // many distinct words occur exactly f times. Two grouped counts;
    // output bounded by distinct frequencies.
    "q_doc_ffreq" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(explode(graft.functions.TextFunctions.tokens($"text")).as("w"))
        .groupBy($"w").agg(count(lit(1)).as("f"))
        .groupBy($"f").agg(count(lit(1)).as("n_words"))
    },

    // Per-lang top-k bigrams (vocab-induction audit): counts feed the
    // native bounded-heap TopKByValue (map-side partials shrink to
    // O(k·langs) pre-shuffle), ids are PolyHash keys joined back to the
    // bigram strings shuffle-hash; ties break by hash both engines.
    "q_doc_topngrams" -> { (s, dir) =>
      import s.implicits._
      val bgs = Tables.documents(s, dir)
        .select($"lang", graft.functions.TextFunctions.tokens($"text").as("tk"))
        .select($"lang", explode(expr(
          "transform(slice(tk, 1, greatest(size(tk) - 1, 0)), (t, i) -> concat(t, ' ', tk[i + 1]))")).as("bg"))
      val counts = bgs.groupBy($"lang", $"bg").agg(count(lit(1)).as("cnt"))
        .withColumn("bh", graft.functions.TextFunctions.stringHash($"bg"))
      counts.groupBy($"lang")
        .agg(graft.expressions.TopKAgg.top_k_ids($"cnt".cast("double"), $"bh", 5).as("tids"))
        .select($"lang", posexplode($"tids").as(Seq("rnk", "bh")))
        .join(counts.hint("shuffle_hash"), Seq("lang", "bh"))
        .select($"lang", $"rnk".cast("long").as("rnk"), $"bg".as("bigram"), $"cnt")
    },

    // Per-source distribution drift: token-distribution total variation
    // distance vs the rest of the corpus — exact cross-multiplied
    // integer numerators, one float division per source.
    "q_doc_drift" -> { (s, dir) =>
      Curation.sourceDrift(Tables.documents(s, dir))
    },

    // Bigram-surprisal quality score: the self-trained LM proxy of the
    // CCNet perplexity gate — bit-length-quantized surprisal keeps the
    // per-doc totals in exact integer arithmetic (engine-identical).
    "q_doc_surprisal" -> { (s, dir) =>
      TextAnalysis.surprisal(Tables.documents(s, dir))
    },

    // DSIR importance weights: per-doc log-ratio of target-domain vs
    // whole-corpus unigram likelihood, bit-length-quantized so totals are
    // exact integer sums — the importance-resampling curation score.
    "q_doc_dsir" -> { (s, dir) =>
      TextAnalysis.dsirWeights(Tables.documents(s, dir))
    },

    // Hashed linear quality/language classifier, TRAIN step (CCNet /
    // fastText shape): TF over 32 hashed token buckets + bias, 4
    // full-batch gradient rounds — fixed-point weights, quantized
    // order-free gradient sums, rational fast sigmoid (exp() isn't
    // correctly rounded; division is). One 1-row agg job per round over
    // the reliable-checkpoint feature stage shared with the score query.
    "q_doc_qclf" -> { (s, dir) =>
      Classifier.fit(Tables.documents(s, dir), dir)
    },
    // Classifier per-source drift audit: mean score + predicted-keep vs
    // teacher-positive permille per source — which segment a gate is
    // about to silently erase, and where student and teacher disagree.
    "q_doc_qclf_bysrc" -> { (s, dir) =>
      Classifier.scoreBySource(Tables.documents(s, dir), dir)
    },
    // Classifier THRESHOLD sweep: per fixed score band, kept volume +
    // precision/recall against the teacher from exact integer counts —
    // the gate-tuning artifact. Bounded ≤16-row histogram (no
    // corpus-wide sort); rides the shared scored frame.
    "q_doc_qclf_pr" -> { (s, dir) =>
      Classifier.prCurve(Tables.documents(s, dir), dir)
    },
    // Exact ROC-AUC via the rank-sum identity: tie-group midranks in
    // pure integers (DECIMAL(38,0) products), the exclusive cumsum
    // computed hierarchically (bounded block triangular join +
    // block-partitioned windows) — never a corpus-wide unpartitioned
    // window. One output row, one double division.
    "q_doc_qclf_auc" -> { (s, dir) =>
      Classifier.rocAuc(Tables.documents(s, dir), dir)
    },
    // Classifier CALIBRATION audit (reliability diagram): per fixed
    // predicted-probability band, kept volume + mean predicted p +
    // empirical teacher-positive rate — whether the scores are usable
    // as probabilities (probability-weighted sampling) or only as
    // rankings. Bounded ≤10-row histogram; p re-derives from the
    // quantized score so bands cannot diverge between engines.
    "q_doc_qclf_cal" -> { (s, dir) =>
      Classifier.calibration(Tables.documents(s, dir), dir)
    },
    // Split-conformal selective gate: the k-th-smallest calibration
    // positive score (k = ⌊α(n+1)⌋, exact distributed order statistic —
    // rocAuc's block-hierarchical cumsum, no corpus sort) becomes a KEEP
    // threshold with a finite-sample P(reject good) ≤ α guarantee;
    // per-source eval coverage + leak-through audited in-row.
    "q_doc_qclf_conf" -> { (s, dir) =>
      Classifier.conformalGate(Tables.documents(s, dir), dir)
    },
    // Classifier APPLY step: per-doc quantized decision score + hard
    // prediction next to the true label — the confusion-matrix /
    // threshold-picking read-out. Narrow pass over the shared features.
    "q_doc_qclf_score" -> { (s, dir) =>
      Classifier.score(Tables.documents(s, dir), dir)
    },
    // Multiclass language-ID distillation: one-vs-rest linear students
    // over the same fused HashedTf features, ALL classes sharing each
    // training pass (one 165-slot gradient row per round — C students
    // cost the same corpus scans as one). Read-out = confusion matrix
    // of argmax predictions vs the declared lang (≤ C² rows).
    "q_doc_langclf" -> { (s, dir) =>
      Classifier.langConfusion(Tables.documents(s, dir), dir)
    },
    // The fastText-recipe twin: hashed CHAR-TRIGRAM features through the
    // same fused HashedTf pass and the identical one-vs-rest loop —
    // subword units classify words never seen in training (the OOV
    // property ClassifierSpec pins); the synthetic corpus's shared
    // vocabulary majority-collapses BOTH students by construction
    // (measured linear ceiling 0.46 vs 0.436 majority — a data property,
    // documented in Classifier.langFeaturesNgram).
    "q_doc_langclf3" -> { (s, dir) =>
      Classifier.langConfusionNgram(Tables.documents(s, dir), dir)
    },

    // Exact heavy hitters with bounded per-partition state: Misra–Gries
    // candidates (narrow, no shuffle; pigeonhole superset guarantee) →
    // broadcast-gated exact count pass → division-free integer
    // threshold cnt·k ≥ N. The approximate-sketch-with-exact-result
    // pattern a 100 TB token stream needs instead of a full-vocabulary
    // GROUP BY.
    "q_doc_heavy" -> { (s, dir) =>
      TextAnalysis.heavyHitters(Tables.documents(s, dir))
    },

    // PMI collocations: adjacent pairs ranked by N·c(ab)/(c(a)·c(b)) —
    // log-free monotone PMI, exact integers into one correctly-rounded
    // division; the BPE-merge-candidate / MWE-detection signal.
    "q_doc_colloc" -> { (s, dir) =>
      TextAnalysis.collocations(Tables.documents(s, dir))
    },
    // BPE merge training (Sennrich'16): 8 rounds of most-frequent-
    // adjacent-pair merge over the word-frequency dictionary — the
    // tokenizer-induction step the PMI signal feeds and vocabCoverage
    // sizes. Corpus touched once; each round is a vocab-bounded grouped
    // agg + 1-row broadcast argmax + narrow re-tokenize.
    "q_doc_bpe" -> { (s, dir) =>
      TextAnalysis.bpeMerges(Tables.documents(s, dir))
    },
    // BPE apply + fertility: per-doc word/subword counts and
    // subwords-per-word under the trained merge table — the
    // tokenizer-quality read-out (which languages a vocab shortchanges).
    // One corpus token pass joined to the vocab-bounded dictionary.
    "q_doc_bpe_encode" -> { (s, dir) =>
      val d = Tables.documents(s, dir)
      TextAnalysis.bpeSegment(d, dictOpt = Some(TextAnalysis.bpeDictFor(d, dir)))
    },
    // Per-lang tokenizer-equity table: occurrence-weighted fertility,
    // chars/subword compression, OOV-fallback permille — the
    // multilingual fairness read-out over the SAME memoized dictionary
    // every BPE consumer serves. Output ≤ |langs| rows.
    "q_doc_fertlang" -> { (s, dir) =>
      val d = Tables.documents(s, dir)
      TextAnalysis.fertilityByLang(d,
        dictOpt = Some(TextAnalysis.bpeDictFor(d, dir)))
    },
    // Packing by BPE-encoded length — the budget real pipelines pack
    // with (tokenizer tokens, not whitespace words): bpeSegment's
    // per-doc subword cost laid out by the SAME deterministic first-fit
    // packer as q_doc_pack (one shared implementation). Conservation
    // (Σ packed ≡ Σ per-doc BPE lengths) is spec-pinned.
    "q_doc_bpepack" -> { (s, dir) =>
      val d = Tables.documents(s, dir)
      Curation.packSequencesBpe(d,
        dictOpt = Some(TextAnalysis.bpeDictFor(d, dir)))
    },
    // Unigram-LM tokenizer training (Kudo'18 / SentencePiece unigram,
    // hard-EM variant): seed vocab from frequent substrings, EM rounds
    // of Viterbi segment-and-recount over the maxWords dictionary,
    // single-char coverage floor. Corpus touched once (the word-freq
    // pass); every EM round is dictionary-bounded with a broadcast
    // vocab map — the BPE cost story.
    "q_doc_unigram" -> { (s, dir) =>
      Unigram.unigramVocab(Tables.documents(s, dir))
    },
    // ONE lattice-expectation (soft) EM round — the Kudo'18 trainer
    // proper next to the hard-EM variant: forward–backward posteriors
    // over the full segmentation lattice, each edge posterior quantized
    // to integer nanos BEFORE any sum (the bit-length-quantization
    // exactness discipline), so the float-valued E-step stays
    // oracle-able. Ambiguity-splitting vs winner-takes-all divergence
    // pinned on a hand fixture in UnigramSoftSpec.
    "q_doc_unigram_soft" -> { (s, dir) =>
      Unigram.unigramVocabSoft(Tables.documents(s, dir))
    },
    // …and the ITERATED soft trainer (two lattice rounds — the Kudo
    // loop proper): every round's input counts are exact integers, so
    // each re-estimation stays oracle-able by the same argument as the
    // first; the oracle reuses ONE round template per round, zero
    // drift possible between the single- and multi-round spellings.
    "q_doc_unigram_soft2" -> { (s, dir) =>
      Unigram.unigramVocabSoft(Tables.documents(s, dir), softRounds = 2)
    },
    // …and the THIRD round (the r13 verdict's optional ask): support and
    // ranking hit their fixpoint at round 2 (UnigramSoftSpec), so this
    // row pins the annealing regime PAST the fixpoint — the counts still
    // move (floor-drained mass), and both engines must move identically.
    "q_doc_unigram_soft3" -> { (s, dir) =>
      Unigram.unigramVocabSoft(Tables.documents(s, dir), softRounds = 3)
    },
    // …and the soft round's quantized edge table (word × piece: qsum,
    // n_edges — all exact integers/strings), the q_doc_rm3in row-dump
    // discipline applied to the lattice E-step: a driver-side soft
    // mismatch names its differing ROW (edges red = α/β DP or per-edge
    // quantization; edges green + vocab red = the weighted count sum /
    // prune / output boundary).
    "q_doc_unigram_softin" -> { (s, dir) =>
      Unigram.unigramSoftEdges(Tables.documents(s, dir))
    },
    // Unigram apply + fertility: per-doc word/piece counts under the
    // trained unigram vocabulary — directly comparable against
    // q_doc_bpe_encode's fertility on the same corpus (the
    // tokenizer-family bake-off read-out).
    "q_doc_unigram_encode" -> { (s, dir) =>
      Unigram.unigramEncode(Tables.documents(s, dir), dir = dir)
    },
    // Per-lang tokenizer-equity table under the unigram vocabulary —
    // column-for-column comparable with q_doc_fertlang (BPE), the
    // tokenizer-family bake-off a multilingual pipeline reads before
    // picking its vocab.
    "q_doc_unigram_fertlang" -> { (s, dir) =>
      Unigram.unigramFertilityByLang(Tables.documents(s, dir), dir = dir)
    },
    // Packing by unigram-encoded length through the ONE shared packer —
    // q_doc_bpepack's twin, so the budget planner's utilization numbers
    // are pack-for-pack comparable across tokenizer families.
    "q_doc_unipack" -> { (s, dir) =>
      Curation.packSequencesUnigram(Tables.documents(s, dir), dir = dir)
    },
    "q_doc_unipackstats" -> { (s, dir) =>
      Curation.packStatsUnigram(Tables.documents(s, dir), dir = dir)
    },
    // FIM split layout (Bavarian'22): deterministic (prefix, middle,
    // suffix) boundaries + PSM/SPM order + the 0.9 apply rate, every
    // draw an iterated content-hash mix — the trainer-facing layout
    // pass whose accounting is the data-engineering surface; one narrow
    // map. Conservation spec-pinned.
    "q_doc_fim" -> { (s, dir) =>
      Curation.fimSplits(Tables.documents(s, dir))
    },

    // T5 span-corruption accounting (Raffel'20): 15% deterministic
    // position band, consecutive corruptions merged to noise spans via
    // the shared islands idiom, exact encoder/decoder lengths out
    // (input+target = n + 2·spans, spec-pinned).
    "q_doc_spancorrupt" -> { (s, dir) =>
      Curation.spanCorruption(Tables.documents(s, dir))
    },

    // Packing-efficiency audit in REAL tokens: utilization / split rate
    // of the BPE-budget layout — the whitespace audit's numbers are off
    // by each doc's fertility, and the budget planner trades on these.
    "q_doc_bpepackstats" -> { (s, dir) =>
      val d = Tables.documents(s, dir)
      Curation.packStatsBpe(d,
        dictOpt = Some(TextAnalysis.bpeDictFor(d, dir)))
    },

    // Stupid-Backoff bigram LM score (Brants'07): train on the even-id
    // half, score every doc; unseen bigrams back off to 0.4·c(w2)/N.
    // Bit-length-quantized — exact integer totals; backoff_frac is the
    // held-out novelty signal.
    "q_doc_sbackoff" -> { (s, dir) =>
      TextAnalysis.stupidBackoff(Tables.documents(s, dir))
    },
    // Vocabulary coverage curve: share of token mass covered by the
    // top-k types, per k — the tokenizer-sizing read-out. Vocab-bounded
    // counts, TakeOrderedAndProject top-k, |ks|-row output.
    "q_doc_vocabcov" -> { (s, dir) =>
      TextAnalysis.vocabCoverage(Tables.documents(s, dir))
    },
    // CCNet-style LM bucketing: held-out docs → head/middle/tail by
    // per-lang terciles of the Stupid-Backoff score (two-pass exact
    // percentile + broadcast thresholds — no corpus-scale lang window).
    "q_doc_ppbucket" -> { (s, dir) =>
      TextAnalysis.perplexityBuckets(Tables.documents(s, dir))
    },

    // Gopher top-2-gram repetition signal: share of each doc's bigram
    // occurrences (and chars) covered by its most frequent bigram — two
    // grouped aggs, no joins/windows, struct-max tie-break.
    "q_doc_topfrac" -> { (s, dir) =>
      TextAnalysis.topNgramFraction(Tables.documents(s, dir))
    },

    // Winnowing (MOSS) fingerprints: windowed-min shingle selection with
    // rightmost tie-break — fixed-density position-robust local sketch;
    // one narrow shingle pass + one per-doc ROWS-frame window.
    "q_doc_winnow" -> { (s, dir) =>
      TextAnalysis.winnow(Tables.documents(s, dir))
    },

    // Entity resolution: best fuzzy match per part name — exact-twin
    // groups resolve by aggregation alone, unique names verify over
    // conjunctive-bigram blocks of the DISTINCT-name table, packed
    // BIGINT argmin (no distinct over the pair stream).
    "q_er_bestmatch" -> { (s, dir) =>
      EntityResolution.bestMatch(Tables.part(s, dir))
    },
    // ER blocking-recall audit (the q_emb_recall analogue): exhaustive
    // Levenshtein truth for a bounded broadcast sample vs what the
    // bigram blocking found — the miss rate that decides a third pass.
    "q_er_recall" -> { (s, dir) =>
      EntityResolution.blockingRecall(Tables.part(s, dir))
    },

    // Behavioral transition matrix (Markov bigram over event streams):
    // lead() under one window on high-cardinality user_id, roll-up
    // bounded at |event_types|² rows; row-probabilities via an exact
    // integer window sum over the TINY aggregated frame (one float
    // division per cell).
    "q_ev_transitions" -> { (s, dir) =>
      import s.implicits._
      val perUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val counts = Tables.events(s, dir)
        .select($"user_id", $"ts", $"event_id", $"event_type")
        .withColumn("next_type", lead($"event_type", 1).over(perUser))
        .filter($"next_type".isNotNull)
        .groupBy($"event_type".as("from_type"), $"next_type".as("to_type"))
        .agg(count(lit(1)).as("n"))
      counts.withColumn("p", $"n".cast("double")
        / sum($"n").over(Window.partitionBy($"from_type")).cast("double"))
    },

    // Cohort retention: users grouped by signup day, distinct activity
    // counted per (cohort, weeks-since) — integer day/week arithmetic so
    // both engines bucket identically. Cohort frame ≤ |users| rows; the
    // activity join is an equi-join on user_id; one distinct-agg roll-up.
    "q_ev_cohort" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.events(s, dir).select($"user_id", $"ts", $"event_type")
        .withColumn("day", expr("CAST(ts AS LONG) DIV 86400"))
      val cohort = ev.filter($"event_type" === "signup")
        .groupBy($"user_id").agg(min($"day").as("cohort_day"))
      ev.join(cohort, "user_id")
        .filter($"day" >= $"cohort_day")
        .select($"cohort_day", expr("(day - cohort_day) DIV 7").as("week_n"), $"user_id")
        .groupBy($"cohort_day", $"week_n")
        .agg(count_distinct($"user_id").as("n_users"))
    },

    // Windowed top-k: top-3 users by spend per tumbling hour — the
    // bounded-heap TopKByValue aggregate composed UNDER an event-time
    // window (leaderboard shape). Two grouped aggs; the second shuffles
    // only (window, k-heap) partials, never per-user rows.
    "q_ev_topusers" -> { (s, dir) =>
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(window($"ts", "1 hour"), $"user_id")
        // exact DECIMAL sum, then double for the heap (ranking key only)
        .agg(sum(dec2($"value")).cast("double").as("uval"))
        .groupBy($"window")
        .agg(graft.expressions.TopKAgg.top_k_ids($"uval", $"user_id", 3).as("top"))
        .select(fmtTs(col("window.start")).as("w_start"), posexplode($"top"))
        .select($"w_start", $"pos".cast("long").as("rank"), $"col".as("user_id"))
    },

    // Sliding windows (1 h window, 30 min slide): each event lands in 2
    // windows; Spark expands then aggregates — one shuffle on (window,type).
    "q_ev_sliding" -> { (s, dir) =>
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(window($"ts", "1 hour", "30 minutes"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .select(fmtTs(col("window.start")).as("w_start"), $"event_type", $"n")
    },

    // Session windows: 4-hour-gap sessions per user (streaming analogue:
    // session_window + watermark). DuckDB oracle replicates via
    // gaps-and-islands.
    "q_ev_session" -> { (s, dir) =>
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(session_window($"ts", "4 hours"), $"user_id")
        .agg(count(lit(1)).as("n"), sum(dec2($"value")).cast("double").as("sum_value"))
        .select(
          fmtTs(col("session_window.start")).as("s_start"),
          fmtTs(col("session_window.end")).as("s_end"),
          $"user_id", $"n", $"sum_value")
    },

    // Exact dedup, deterministic survivor: earliest (ts, event_id) row per
    // (user_id, event_type) — the batch shape of
    // dropDuplicatesWithinWatermark (which keeps an arbitrary first-seen
    // row; we pin the survivor so the oracle can agree).
    "q_ev_dedup" -> { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id", $"event_type").orderBy($"ts", $"event_id")
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"event_type", $"event_id", fmtTs($"ts").as("first_ts"))
    },

    // Latest-event-per-user materialization (the CDC upsert-view batch
    // shape): max_by with a composite (ts, event_id) ordering key — ONE
    // partial-combinable aggregation with O(1) state per key. Contrast
    // q_ev_dedup's row_number window, which ships EVERY event through the
    // shuffle; here each map partition shrinks to |its users| partials
    // first. (Struct buffers force SortAggregate, but its sort key is just
    // user_id — shuffle volume is the scale lever, pinned in
    // PlanQualitySpec.) event_id is unique → total order → deterministic
    // survivor.
    "q_ev_latest" -> { (s, dir) =>
      import s.implicits._
      Tables.events(s, dir)
        .groupBy($"user_id")
        .agg(max_by(struct($"ts", $"event_id", $"event_type", $"value"),
          struct($"ts", $"event_id")).as("last"))
        .select($"user_id", fmtTs($"last.ts").as("last_ts"),
          $"last.event_id".as("event_id"), $"last.event_type".as("event_type"),
          $"last.value".as("value"))
    },

    // Point-in-time label construction — the leakage-safe training-example
    // builder: each click labeled by whether the SAME user purchases
    // within the next day, label window EXCLUSIVE of the click instant
    // (outcomes strictly after the decision point). The forward interval
    // join is a pure (user, time-bucket) equi-join (leadingWindowJoin);
    // the exists-roll-up keys on click id; unmatched clicks come back via
    // one left join — three keyed shuffles, nothing all-pairs.
    "q_ev_label" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.events(s, dir)
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id".as("click_id"), $"user_id", $"ts".as("click_ts"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts".as("pts"))
      val conv = graft.operators.RangeJoin
        .leadingWindowJoin(clicks, "click_ts", purchases, "pts",
          Seq("user_id"), 86400L)
        .groupBy($"click_id")
        .agg(min(unix_micros($"pts") - unix_micros($"click_ts")).as("us_to_conv"))
      clicks.join(conv, Seq("click_id"), "left")
        .select($"click_id", $"user_id", fmtTs($"click_ts").as("click_ts"),
          $"us_to_conv".isNotNull.as("converted"), $"us_to_conv")
    },

    // RFM customer segmentation: per customer, recency (days since last
    // order vs the corpus horizon), frequency, exact-DECIMAL monetary
    // total, and the 8-way R/F/M segment against per-dimension medians.
    // ONE grouped agg + a 1-row horizon broadcast + a 1-row threshold
    // broadcast (two-pass gate discipline — no corpus-wide window;
    // exact `percentile` swaps for percentile_approx at extreme scale).
    "q_rfm" -> { (s, dir) =>
      import s.implicits._
      val o = Tables.orders(s, dir)
      val horizon = o.agg(max(to_date($"o_orderdate")).as("dmax"))
      val per = o.groupBy($"o_custkey")
        .agg(max(to_date($"o_orderdate")).as("last_order"),
          count(lit(1)).as("n_orders"),
          sum(dec2($"o_totalprice")).cast("double").as("spend"))
        .crossJoin(broadcast(horizon))
        .select($"o_custkey",
          datediff($"dmax", $"last_order").cast("long").as("r_days"),
          $"n_orders", $"spend")
      val th = per.agg(
        percentile($"r_days", lit(0.5)).as("r_med"),
        percentile($"n_orders", lit(0.5)).as("f_med"),
        percentile($"spend", lit(0.5)).as("m_med"))
      per.crossJoin(broadcast(th))
        .select($"o_custkey", $"r_days", $"n_orders", $"spend",
          concat(
            when($"r_days" <= $"r_med", "R").otherwise("r"),
            when($"n_orders" >= $"f_med", "F").otherwise("f"),
            when($"spend" >= $"m_med", "M").otherwise("m")).as("segment"))
    },
    // Event-type co-occurrence lift ("users who did X also did Y"): the
    // association-mining read-out over per-user behavior. Presence sets
    // (DISTINCT user,type) self-join on high-cardinality user_id with
    // per-user fan bounded by |types|²; lift = N·n_ab/(n_a·n_b) — exact
    // integer products, ONE double division (the PMI ranking discipline).
    // Output ≤ |types|² rows; per-type counts and N are tiny broadcasts.
    "q_ev_lift" -> { (s, dir) =>
      import s.implicits._
      val ut = Tables.events(s, dir)
        .filter($"user_id".isNotNull && $"event_type".isNotNull)
        .select($"user_id", $"event_type").distinct()
      val nUsers = ut.agg(count_distinct($"user_id").as("n_users"))
      val perType = ut.groupBy($"event_type").agg(count(lit(1)).as("n_t"))
      val co = ut.as("a").join(ut.as("b"), "user_id")
        .filter($"a.event_type" < $"b.event_type")
        .groupBy($"a.event_type".as("type_a"), $"b.event_type".as("type_b"))
        .agg(count(lit(1)).as("n_ab"))
      co.join(broadcast(perType.select($"event_type".as("type_a"), $"n_t".as("n_a"))), "type_a")
        .join(broadcast(perType.select($"event_type".as("type_b"), $"n_t".as("n_b"))), "type_b")
        .crossJoin(broadcast(nUsers))
        .select($"type_a", $"type_b", $"n_ab", $"n_a", $"n_b", $"n_users",
          (($"n_users" * $"n_ab").cast("double") / ($"n_a" * $"n_b").cast("double")).as("lift"))
    },
    // CUPED variance-reduced experiment read-out (Deng'13): per-user
    // pre/post value sums around the deterministic time midpoint,
    // variant = user_id % 2, θ = cov(pre, post)/var(pre) from EXACT
    // integer moments (values quantized ×100 — two-decimal inputs are
    // exact; DECIMAL(38,0) product sums, the PMI/Neyman discipline;
    // n·Σxy − Σx·Σy spellings keep the numerators integer-exact),
    // adjusted mean = mean_post − θ·(mean_pre − global mean_pre). The
    // var_reduction column (= ρ²) is the fraction of post-period
    // variance the covariate removes — why every large A/B platform
    // runs CUPED. Two output rows; every stage is a grouped agg with
    // map-side partials, the global moments a 1-row broadcast.
    "q_ev_cuped" -> { (s, dir) => Experiment.cuped(Tables.events(s, dir)) },
    // Minimum detectable effect per event type: the BEFORE-the-experiment
    // sizing read-out (CUPED is the after) — per-user totals (the
    // randomization unit), exact DECIMAL moments, the two-sample normal
    // MDE at alpha=0.05 / power=0.8; mde_rel >> hoped-for lift means the
    // test is not worth running at current traffic.
    "q_ev_mde" -> { (s, dir) => Experiment.mde(Tables.events(s, dir)) },
    // Sample-ratio mismatch guardrail: per event type, the observed
    // variant USER split vs the designed 50/50 with the chi-square(1)
    // statistic (pure arithmetic, no p-value transcendentals) and the
    // 95%-critical alarm — an alarmed row means every downstream
    // CUPED/MDE read-out sits on broken randomization.
    "q_ev_srm" -> { (s, dir) => Experiment.srmCheck(Tables.events(s, dir)) },
    // Two-proportion conversion lift: per event type, the share of each
    // variant's users emitting it at all, with the 2x2 chi-square in
    // exact-integer product form (final chain in doubles off the exact
    // DECIMAL factors) — the proportion-metric companion to CUPED/MDE.
    "q_ev_convlift" -> { (s, dir) => Experiment.conversionLift(Tables.events(s, dir)) },
    // Winsorized robust metrics: per event type, exact p99 cap, raw vs
    // capped means (quantized integer sums), capped-row permille — the
    // whale-user outlier step a metrics pipeline runs before CUPED.
    "q_ev_winsor" -> { (s, dir) => Experiment.winsorize(Tables.events(s, dir)) },
    // First/last-touch conversion attribution — the materialized
    // attribution table a marketing/ranking pipeline writes: each
    // purchase credited to the earliest (first-touch) and latest
    // (last-touch) click-or-view of the SAME user in the trailing day,
    // window EXCLUSIVE of the purchase instant (same leakage discipline
    // as q_ev_label); no in-window touch → "direct". The interval join
    // is trailingWindowJoin's (user, time-bucket) equi-join; both argmins
    // ride ONE grouped agg with O(1) max_by/min_by state per purchase
    // (tid tie-break — deterministic); one left join back. Nothing
    // all-pairs, nothing windowed over the event stream.
    "q_ev_attrib" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.events(s, dir)
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id".as("purchase_id"), $"user_id",
          $"ts".as("pts"), $"value")
      val touches = ev.filter($"event_type".isin("click", "view"))
        .select($"user_id", $"ts".as("tts"),
          $"event_type".as("channel"), $"event_id".as("tid"))
      val att = graft.operators.RangeJoin
        .trailingWindowJoin(purchases, "pts", touches, "tts",
          Seq("user_id"), 86400L)
        .filter($"tts" < $"pts")
        .groupBy($"purchase_id")
        .agg(
          max_by($"channel", struct($"tts", $"tid")).as("lc"),
          min_by($"channel", struct($"tts", $"tid")).as("fc"))
      purchases.join(att, Seq("purchase_id"), "left")
        .select($"purchase_id", $"user_id", fmtTs($"pts").as("purchase_ts"),
          $"value",
          coalesce($"lc", lit("direct")).as("last_channel"),
          coalesce($"fc", lit("direct")).as("first_channel"))
    },

    // Per-user feature assembly — the feature-store materialization step
    // a training pipeline runs before a ranking/propensity fit: one wide
    // row per user with event counts by type, exact-DECIMAL value total,
    // recency, and active-day breadth. ONE grouped agg, map-side
    // combinable, O(1) state per user (the distinct-day count is bounded
    // by the horizon) — the canonical scale shape for feature backfill.
    "q_ev_features" -> { (s, dir) =>
      import s.implicits._
      Tables.events(s, dir)
        .groupBy($"user_id")
        .agg(
          count(lit(1)).as("n_events"),
          count(when($"event_type" === "view", 1)).as("n_view"),
          count(when($"event_type" === "click", 1)).as("n_click"),
          count(when($"event_type" === "purchase", 1)).as("n_purchase"),
          count(when($"event_type" === "signup", 1)).as("n_signup"),
          count(when($"event_type" === "error", 1)).as("n_error"),
          sum(dec2($"value")).cast("double").as("total_value"),
          max($"ts").as("mts"),
          count_distinct(to_date($"ts")).as("days_active"))
        .select($"user_id", $"n_events", $"n_view", $"n_click", $"n_purchase",
          $"n_signup", $"n_error", $"total_value", fmtTs($"mts").as("last_ts"),
          $"days_active",
          ($"n_purchase".cast("double") / $"n_events".cast("double"))
            .as("purchase_rate"))
    },

    // Inter-event gap audit — the heartbeat/SLA monitor: per user, the
    // largest silence between consecutive events and how many gaps
    // exceed the 1-hour alarm threshold (a dead sensor or dropped
    // pipeline shows up here before any dashboard). `lag` over the
    // high-cardinality user key (ties by event_id — deterministic), one
    // grouped roll-up; exact integer microsecond arithmetic.
    "q_ev_gaps" -> { (s, dir) =>
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.events(s, dir)
        .select($"user_id", $"ts", $"event_id")
        .withColumn("gap_us",
          unix_micros($"ts") - unix_micros(lag($"ts", 1).over(w)))
        .groupBy($"user_id")
        .agg(count($"gap_us").as("n_gaps"),
          max($"gap_us").as("max_gap_us"),
          count(when($"gap_us" > 3600L * 1000000L, 1)).as("n_gaps_over_1h"))
    },

    // Semi-structured extraction: JSON props column → typed field → agg.
    "q_ev_json" -> { (s, dir) =>
      import s.implicits._
      Tables.events(s, dir)
        .withColumn("k", get_json_object($"props", "$.k").cast("long"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"), max($"k").as("max_k"))
    },

    // Interval join, batch shape of EventStream.clicksWithRecentPurchases:
    // each click matched to the same user's purchases from the trailing
    // hour. Bucketed trailing-window join — a pure equi-join on
    // (user_id, hour-bucket), never a theta join (operators/RangeJoin).
    "q_ev_interval" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.events(s, dir)
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id".as("click_id"), $"user_id", $"ts".as("click_ts"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts".as("purchase_ts"), $"value".as("purchase_value"))
      graft.operators.RangeJoin
        .trailingWindowJoin(clicks, "click_ts", purchases, "purchase_ts",
          Seq("user_id"), 3600L)
        .select($"click_id", $"user_id",
          fmtTs($"click_ts").as("click_ts"),
          fmtTs($"purchase_ts").as("purchase_ts"),
          $"purchase_value")
    },

    // Range (interval) join via bucketed equi-join — the O(L+R) shape
    // instead of a nested-loop theta join (operators/RangeJoin).
    "q_rangejoin" -> { (s, dir) =>
      import s.implicits._
      val tiers = s.range(12).select(
        $"id".as("tier"),
        ($"id" * $"id" * lit(2.0)).as("lo"),
        (($"id" + 1) * ($"id" + 1) * lit(2.0)).as("hi"))
      val ev = Tables.events(s, dir).select($"event_id", $"value")
      graft.operators.RangeJoin.bucketedRangeJoin(ev, "value", tiers, "lo", "hi", 10.0)
        .groupBy($"tier")
        .agg(count(lit(1)).as("n"), sum(dec2($"value")).cast("double").as("sum_value"))
    },

    // Z-order (Morton) clustering key: the multi-dimension data-skipping
    // layout — bit-interleave of two bucketized dimensions, so range-
    // sorting by z makes every output file a hyper-rectangle in (bx, by)
    // and filters on EITHER dimension prune files (operators/Maintenance;
    // compaction behavior measured in MaintenanceSpec). Narrow map.
    // Rendezvous-hashing reshard audit: the (shard_old, shard_new)
    // transition matrix for a capacity grow step — rendezvous moves docs
    // ONLY to new shards at the (nNew-nOld)/nNew expected rate, where a
    // mod-N layout reshuffles ~everything; one narrow argmax fold, one
    // grouped count, zero shuffle before the <= nOld*nNew-row rollup.
    "q_doc_reshard" -> { (s, dir) =>
      Maintenance.reshardAudit(Tables.documents(s, dir))
    },
    "q_zorder" -> { (s, dir) =>
      import s.implicits._
      val bx = pmod($"p_partkey", lit(256)).cast("long")
      val by = pmod($"p_size", lit(256)).cast("long")
      Tables.part(s, dir).select(
        $"p_partkey",
        bx.as("bx"), by.as("by"),
        Maintenance.zValue(8, bx, by).as("z"))
    },

    // Built-in pivot: one scan, fixed pivot values (no extra pass to
    // discover them), plans as a single aggregate.
    "q_pivot" -> { (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .pivot("l_linestatus", Seq("O", "F"))
        .agg(sum(dec2($"l_quantity")).cast("double"))
        .withColumnRenamed("O", "qty_open")
        .withColumnRenamed("F", "qty_finished")
    },

    // Correlated-aggregate pattern: orders above 1.5× their customer's
    // average — window aggregate over the partition, no self-join, exact
    // decimal mean so the comparison is engine-stable.
    "q_above_avg" -> { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
      Tables.orders(s, dir)
        .withColumn("cust_avg",
          sum(dec2($"o_totalprice")).over(w).cast("double") / count(lit(1)).over(w).cast("double"))
        .filter($"o_totalprice" > $"cust_avg" * 1.5)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"cust_avg")
    },

    // Correlated scalar subquery through the SQL front end: Catalyst
    // DECORRELATES the per-customer average into a join + aggregate (no
    // per-row re-execution — PlanQualitySpec pins the absence of any
    // nested-loop shape). Exact-decimal averaging keeps both engines
    // bit-identical.
    "q_corr_subq" -> { (s, dir) =>
      Tables.orders(s, dir).createOrReplaceTempView("orders_v")
      s.sql("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders_v o
        WHERE o_totalprice > 1.5 * (
          SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
          FROM orders_v o2 WHERE o2.o_custkey = o.o_custkey)
      """)
    },

    // Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    // quantile_cont) + distinct counting.
    "q_percentile" -> { (s, dir) =>
      import s.implicits._
      Tables.orders(s, dir).groupBy($"o_orderstatus").agg(
        percentile($"o_totalprice", lit(0.5)).as("p50"),
        percentile($"o_totalprice", lit(0.9)).as("p90"),
        count_distinct($"o_custkey").as("n_cust"))
    },

    // More analytic window functions: dense_rank / percent_rank / ntile,
    // partitioned by the high-cardinality o_custkey (see q_window_rangeframe).
    "q_window_rank2" -> { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
      Tables.orders(s, dir)
        .select($"o_orderkey", $"o_custkey",
          dense_rank().over(w).cast("long").as("drk"),
          percent_rank().over(w).as("prk"),
          ntile(4).over(w).cast("long").as("quartile"))
    },

    // String function sampler #2: edit distance + padding/translation.
    "q_scalar2" -> { (s, dir) =>
      import s.implicits._
      Tables.part(s, dir).select(
        $"p_partkey",
        levenshtein($"p_name", lit("cold widget")).cast("long").as("lev"),
        reverse($"p_name").as("rname"),
        lpad($"p_brand", 12, "*").as("padded"),
        translate($"p_type", "AEO", "aeo").as("xlated"),
        instr($"p_name", "widget").cast("long").as("pos_widget"),
        repeat($"p_brand", 2).as("brand2"))
    },

    // Conditional aggregation ("manual pivot"): one scan, no shuffle per
    // pivot value.
    "q_case_pivot" -> { (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir).groupBy($"l_returnflag").agg(
        count(when($"l_linestatus" === "O", 1)).as("n_open"),
        count(when($"l_linestatus" === "F", 1)).as("n_finished"),
        sum(when($"l_discount" > 0.05, dec2($"l_extendedprice"))).cast("double").as("high_disc_price")
      )
    },

    // TPC-H Q13 shape: order-count distribution INCLUDING zero-order
    // customers. Orders aggregate FIRST (map-side combinable, ≤|custkey|
    // rows) and only the shrunken counts join customers — never the raw
    // orders table; a left outer keeps the zero bucket. Both shuffles run
    // on aggregated data.
    "q_custdist" -> { (s, dir) =>
      import s.implicits._
      val perCust = Tables.orders(s, dir).groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_orders"))
      Tables.customer(s, dir)
        .join(perCust, $"c_custkey" === $"o_custkey", "left")
        .select(coalesce($"n_orders", lit(0L)).as("c_count"))
        .groupBy($"c_count").agg(count(lit(1)).as("custdist"))
    },

    // TPC-H Q19 shape: a disjunction of conjunctive brackets across a
    // join. The part-only conjuncts must still reach the part scan as one
    // OR filter (pinned in PlanQualitySpec), the join stays broadcast on
    // p_partkey, and the mixed residual evaluates post-join.
    "q_disj" -> { (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), $"l_partkey" === $"p_partkey")
        .filter(
          ($"p_brand" === "Brand#12" && $"p_size".between(1, 15) && $"l_quantity" <= 11) ||
          ($"p_brand" === "Brand#13" && $"p_size".between(1, 25) && $"l_quantity".between(10, 20)) ||
          ($"p_brand" === "Brand#15" && $"p_size".between(1, 35) && $"l_quantity" >= 20))
        .agg(
          sum(dec2($"l_extendedprice") * (lit(1) - pct($"l_discount")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n"))
    },

    // TPC-H Q21 shape (adapted to this schema: returnflag = the fault
    // signal): suppliers whose item came back in a multi-supplier order
    // where NO other supplier's item did — one semi and one anti self-join
    // on the same derived table, both keyed on l_orderkey (bounded
    // per-order fan, never all-pairs), then a broadcast dim join.
    "q_retonly" -> { (s, dir) =>
      import s.implicits._
      val l = Tables.lineitem(s, dir)
      val ret = l.filter($"l_returnflag" === "R")
        .select($"l_orderkey", $"l_suppkey").distinct()
      val multi = ret.alias("r").join(l.alias("o"),
        col("r.l_orderkey") === col("o.l_orderkey") &&
          col("r.l_suppkey") =!= col("o.l_suppkey"), "left_semi")
      val sole = multi.alias("m").join(ret.alias("r2"),
        col("m.l_orderkey") === col("r2.l_orderkey") &&
          col("m.l_suppkey") =!= col("r2.l_suppkey"), "left_anti")
      sole.join(broadcast(Tables.supplier(s, dir)), $"l_suppkey" === $"s_suppkey")
        .groupBy($"s_name").agg(count(lit(1)).as("numwait"))
    },

    // TPC-H Q14 shape: promo revenue share — conditional aggregation over
    // a broadcast join, one scan, exact DECIMAL sums divided once.
    "q_promoshare" -> { (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir)
        .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
        .join(broadcast(Tables.part(s, dir)), $"l_partkey" === $"p_partkey")
        .agg(
          (lit(100.0) *
            sum(when($"p_type" === "PROMO",
              dec2($"l_extendedprice") * (lit(1) - pct($"l_discount"))))
              .cast("double") /
            sum(dec2($"l_extendedprice") * (lit(1) - pct($"l_discount")))
              .cast("double")).as("promo_share"),
          count(lit(1)).as("n"))
    },

    // TPC-H Q15 shape: argmax over an aggregated view — revenue per
    // supplier in a half-year window, keep the supplier(s) AT the max.
    // Two-phase: one shuffle builds the per-supplier aggregate, a 1-row
    // max broadcasts back (no Window over a single global partition, no
    // second pass over lineitem). The equality test runs on the EXACT
    // DECIMAL sums — comparing doubles at the max boundary could drop a
    // tied supplier on one engine and keep it on the other.
    "q_topsupplier" -> { (s, dir) =>
      import s.implicits._
      // LAZY checkpoint: the per-supplier aggregate feeds BOTH the 1-row
      // max and the equality filter — without the boundary the optimizer
      // inlines the subtree twice and lineitem is scanned+shuffled twice.
      val rev = Tables.lineitem(s, dir)
        .filter($"l_shipdate" >= lit("1998-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1998-07-01").cast("timestamp"))
        .groupBy($"l_suppkey")
        .agg(sum(dec2($"l_extendedprice") * (lit(1) - pct($"l_discount"))).as("rev_d"))
        .localCheckpoint(false)
      val mx = rev.agg(max($"rev_d").as("mx"))
      rev.join(broadcast(mx), $"rev_d" === $"mx")
        .join(broadcast(Tables.supplier(s, dir)), $"l_suppkey" === $"s_suppkey")
        .select($"s_suppkey", $"s_name", $"rev_d".cast("double").as("total_rev"))
    },

    // TPC-H Q18 shape: large-volume orders — aggregate lineitem FIRST
    // (map-side combinable, shrinks to per-order rows), filter on the
    // exact-decimal quantity sum, and only then join orders + customer.
    // Both joins are key-equi shuffles; no broadcast hint — the filtered
    // agg side's size is data-dependent, so AQE promotes it at runtime
    // if it fits rather than the plan hard-coding a driver OOM at scale.
    "q_bigorders" -> { (s, dir) =>
      import s.implicits._
      val big = Tables.lineitem(s, dir).groupBy($"l_orderkey")
        .agg(sum(dec2($"l_quantity")).as("qty_d"))
        .filter($"qty_d" > 250)
      Tables.orders(s, dir).join(big, $"o_orderkey" === $"l_orderkey")
        .join(Tables.customer(s, dir), $"o_custkey" === $"c_custkey")
        .select($"c_name", $"c_custkey", $"o_orderkey",
          date_format($"o_orderdate", "yyyy-MM-dd").as("o_orderdate"),
          $"o_totalprice", $"qty_d".cast("double").as("total_qty"))
    },

    // TPC-H Q22 shape: rich-but-dormant customers — acctbal above the
    // positive-balance mean AND no order since 1999, grouped by segment.
    // The mean test is division-free: `bal * n > total` in exact DECIMAL,
    // so neither engine's decimal-division rounding can flip a boundary
    // customer. The 1-row stats aggregate broadcasts; the dormancy test
    // is a left-anti join on the date-filtered orders projection.
    "q_noorders" -> { (s, dir) =>
      import s.implicits._
      val c = Tables.customer(s, dir)
      val stats = c.filter($"c_acctbal" > 0)
        .agg(count(lit(1)).as("cnt"), sum(dec2($"c_acctbal")).as("tot"))
      val recent = Tables.orders(s, dir)
        .filter($"o_orderdate" >= lit("1999-01-01").cast("timestamp"))
        .select($"o_custkey")
      c.crossJoin(broadcast(stats))
        .filter(dec2($"c_acctbal") * $"cnt" > $"tot")
        .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("numcust"),
          sum(dec2($"c_acctbal")).cast("double").as("totacctbal"))
    },

    // TPC-H Q11 shape: groups whose share of the grand total exceeds a
    // fraction — per-part value, then `value * 1800 > total` against the
    // broadcast 1-row total. Division-free exact-DECIMAL threshold (same
    // rationale as q_noorders); the grand total derives from the
    // ALREADY-aggregated per-part rows, not a second lineitem scan.
    "q_partshare" -> { (s, dir) =>
      import s.implicits._
      // Same shared-subtree checkpoint as q_topsupplier: one lineitem
      // scan + one shuffle feed both the grand total and the filter.
      val perPart = Tables.lineitem(s, dir).groupBy($"l_partkey")
        .agg(sum(dec2($"l_extendedprice")).as("val_d"))
        .localCheckpoint(false)
      val tot = perPart.agg(sum($"val_d").as("tot"))
      perPart.crossJoin(broadcast(tot))
        .filter($"val_d" * lit(1800) > $"tot")
        .select($"l_partkey", $"val_d".cast("double").as("part_value"))
    },

    // TPC-H Q8 shape: market share — of all revenue flowing to customers
    // in EUROPE, the fraction supplied by NATION_8, per order year. One
    // fact-fact shuffle join (lineitem ⋈ orders); every dimension hop
    // (customer-nation-region gate, supplier-nation attribution) is a
    // broadcast; numerator and denominator are exact-DECIMAL sums in ONE
    // grouped aggregate, divided once as doubles.
    "q_natshare" -> { (s, dir) =>
      import s.implicits._
      val euNations = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir).filter($"r_name" === "EUROPE")),
          $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey")
      val euCust = Tables.customer(s, dir)
        .join(broadcast(euNations), $"c_nationkey" === $"n_nationkey")
        .select($"c_custkey")
      val suppNation = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"n_name".as("supp_nation"))
      val vol = dec2($"l_extendedprice") * (lit(1) - pct($"l_discount"))
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey")
        .join(euCust, $"o_custkey" === $"c_custkey", "left_semi")
        .join(broadcast(suppNation), $"l_suppkey" === $"s_suppkey")
        .groupBy(year($"o_orderdate").cast("long").as("o_year"))
        .agg(
          (sum(when($"supp_nation" === "NATION_8", vol)).cast("double") /
            sum(vol).cast("double")).as("mkt_share"),
          count(lit(1)).as("n"))
    },

    // TPC-H Q6 shape: the pure pushdown aggregate — no join, no grouping,
    // every predicate (date band, discount band, quantity cap) reaches the
    // parquet scan as a PushedFilter and row groups outside the bands are
    // skipped on statistics alone. At 100 TB this query's cost is the I/O
    // the scan CANNOT skip; pinned in PlanQualitySpec.
    "q_revband" -> { (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir)
        .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1998-01-01").cast("timestamp") &&
          $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
        .agg(sum(dec2($"l_extendedprice") * pct($"l_discount"))
          .cast("double").as("revenue"),
          count(lit(1)).as("n"))
    },

    // TPC-H Q4 shape: EXISTS → left-semi join. The order-priority census
    // of one quarter, counting only orders with at least one late line
    // (shipped >60 days after the order date). The correlated condition
    // becomes an equi-semi-join on l_orderkey with the date comparison as
    // a residual — the semi-join emits each order ONCE no matter how many
    // late lines it has, so no distinct and no fan-out reaches the agg.
    "q_lateship" -> { (s, dir) =>
      import s.implicits._
      val o = Tables.orders(s, dir)
        .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1997-04-01").cast("timestamp"))
      o.join(Tables.lineitem(s, dir).select($"l_orderkey", $"l_shipdate"),
          $"o_orderkey" === $"l_orderkey" &&
            $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
    },

    // TPC-H Q7 shape: bilateral trade volume between two nations per year.
    // Both endpoint gates (supplier nation, customer nation) broadcast and
    // shrink the fact sides BEFORE the one fact-fact shuffle join: only
    // lineitems of NATION_1/2 suppliers and orders of NATION_1/2 customers
    // enter the exchange; the pair-disjunction then evaluates post-join on
    // the two attributed names.
    "q_natvolume" -> { (s, dir) =>
      import s.implicits._
      val twoNations = Tables.nation(s, dir)
        .filter($"n_name".isin("NATION_13", "NATION_19"))
      val supp = Tables.supplier(s, dir)
        .join(broadcast(twoNations), $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"n_name".as("supp_nation"))
      val cust = Tables.customer(s, dir)
        .join(broadcast(twoNations), $"c_nationkey" === $"n_nationkey")
        .select($"c_custkey", $"n_name".as("cust_nation"))
      Tables.lineitem(s, dir)
        .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
        .join(Tables.orders(s, dir).join(broadcast(cust), $"o_custkey" === $"c_custkey")
            .select($"o_orderkey", $"cust_nation"),
          $"l_orderkey" === $"o_orderkey")
        .filter(($"supp_nation" === "NATION_13" && $"cust_nation" === "NATION_19") ||
          ($"supp_nation" === "NATION_19" && $"cust_nation" === "NATION_13"))
        .groupBy($"supp_nation", $"cust_nation",
          year($"l_shipdate").cast("long").as("l_year"))
        .agg(sum(dec2($"l_extendedprice") * (lit(1) - pct($"l_discount")))
          .cast("double").as("volume"))
    },

    // TPC-H Q9 shape: margin by supplier nation and year over a part-name
    // substring filter. Cost side proxied as a 5% holding charge on retail
    // price (the schema has no partsupp/ps_supplycost); the whole amount
    // expression stays in exact DECIMAL — a double subtraction of two
    // near-equal products is exactly the last-ulp trap the dec2 convention
    // exists for. Part (filtered, broadcast) and supplier-nation
    // (broadcast) never shuffle; one exchange for the final group-by.
    "q_profit" -> { (s, dir) =>
      import s.implicits._
      val redParts = Tables.part(s, dir).filter($"p_name".contains("red"))
        .select($"p_partkey", $"p_retailprice")
      val suppNation = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"n_name".as("nation"))
      Tables.lineitem(s, dir)
        .join(broadcast(redParts), $"l_partkey" === $"p_partkey")
        .join(broadcast(suppNation), $"l_suppkey" === $"s_suppkey")
        .groupBy($"nation", year($"l_shipdate").cast("long").as("o_year"))
        .agg(sum(dec2($"l_extendedprice") * (lit(1) - pct($"l_discount")) -
            dec2($"p_retailprice") * dec2($"l_quantity") * pct(lit(0.05)))
          .cast("double").as("sum_profit"))
    },

    // TPC-H Q12 shape: late-shipment priority census — one fact-fact
    // equi-join, then conditional counts split urgent vs. other priority
    // classes per return flag. The CASE branches ride the single grouped
    // aggregate; no per-class scan or join.
    "q_prioline" -> { (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir)
        .filter($"l_shipdate" >= lit("1998-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1999-01-01").cast("timestamp"))
        .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_returnflag")
        .agg(
          count(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1)).as("high_line_count"),
          count(when(!$"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1)).as("low_line_count"))
    },

    // TPC-H Q16 shape: supplier breadth per part segment, excluding a
    // complaint list. Distinct (brand, size, suppkey) triples shrink
    // map-side BEFORE the shuffle; the exclusion list (negative-balance
    // suppliers — the schema's stand-in for the comment scan) is a
    // broadcast anti-join; count_distinct runs on already-distinct rows.
    "q_suppcnt" -> { (s, dir) =>
      import s.implicits._
      val badSupp = Tables.supplier(s, dir).filter($"s_acctbal" < 0)
        .select($"s_suppkey")
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).filter($"p_size".isin(1, 4, 9))),
          $"l_partkey" === $"p_partkey")
        .select($"p_brand", $"p_size", $"l_suppkey").distinct()
        .join(broadcast(badSupp), $"l_suppkey" === $"s_suppkey", "left_anti")
        .groupBy($"p_brand", $"p_size")
        .agg(count_distinct($"l_suppkey").as("supplier_cnt"))
    },

    // TPC-H Q17 shape: revenue locked in small-quantity lines — lines
    // under 1/5 of their part's average quantity, parts of one brand.
    // The correlated scalar subquery becomes a per-part aggregate joined
    // back; the threshold test is division-free exact DECIMAL
    // (5·qty·cnt < Σqty) so per-engine decimal-division rounding cannot
    // flip a boundary line. The brand-reduced lineitem feeds BOTH the
    // aggregate and the probe side through one lazy checkpoint — one scan,
    // one narrow source for both join inputs.
    "q_smallqty" -> { (s, dir) =>
      import s.implicits._
      val brandLines = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).filter($"p_brand" === "Brand#3")
            .select($"p_partkey")),
          $"l_partkey" === $"p_partkey")
        .select($"l_partkey", $"l_quantity", $"l_extendedprice")
        .localCheckpoint(false)
      val perPart = brandLines.groupBy($"l_partkey".as("pk"))
        .agg(sum(dec2($"l_quantity")).as("sum_qty_d"), count(lit(1)).as("cnt"))
      brandLines.join(perPart, $"l_partkey" === $"pk")
        .filter(dec2($"l_quantity") * lit(5) * $"cnt" < $"sum_qty_d")
        .agg(sum(dec2($"l_extendedprice")).cast("double").as("small_rev"),
          count(lit(1)).as("n"))
    },

    // TPC-H Q2 shape: correlated MIN over a join, decorrelated. The
    // per-(part, supplier) supply cost derives from lineitem (MIN unit
    // price, exact DECIMAL); the correlated "WHERE cost = (SELECT
    // MIN(cost) ... WHERE pk = outer.pk)" becomes one grouped agg + an
    // equi-join back on (part, cost) — agg-before-join, so the fact
    // table is reduced to ≤ |parts|·|suppliers| rows before any
    // dimension row is touched. Region gate (EUROPE) and the part-type
    // gate are broadcasts pushed below the cost build; the supplier
    // detail join is a broadcast dim probe at the end.
    "q_mincost" -> { (s, dir) =>
      import s.implicits._
      val euroSup = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)
            .join(broadcast(Tables.region(s, dir).filter($"r_name" === "EUROPE")),
              $"n_regionkey" === $"r_regionkey")
            .select($"n_nationkey", $"n_name")),
          $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
      val econParts = Tables.part(s, dir).filter($"p_type" === "ECONOMY")
        .select($"p_partkey", $"p_brand")
      val costs = Tables.lineitem(s, dir)
        .join(broadcast(econParts.select($"p_partkey")), $"l_partkey" === $"p_partkey")
        .join(broadcast(euroSup.select($"s_suppkey")),
          $"l_suppkey" === $"s_suppkey", "left_semi")
        .groupBy($"l_partkey", $"l_suppkey")
        .agg(min(dec2($"l_extendedprice")).as("cost_d"))
        // consumed twice (per-part min + join-back): materialize the
        // ≤ |parts·suppliers| agg once instead of re-scanning lineitem
        // (q_smallqty's brandLines discipline)
        .localCheckpoint(false)
      val minc = costs.groupBy($"l_partkey".as("pk"))
        .agg(min($"cost_d").as("min_cost_d"))
      costs.join(minc, $"l_partkey" === $"pk" && $"cost_d" === $"min_cost_d")
        .join(broadcast(econParts), $"l_partkey" === $"p_partkey")
        .join(broadcast(euroSup), $"l_suppkey" === $"s_suppkey")
        .select($"p_partkey", $"p_brand", $"s_suppkey", $"s_name", $"s_acctbal",
          $"n_name", $"cost_d".cast("double").as("min_cost"))
    },

    // TPC-H Q10 shape: returned-item revenue top-k — selective
    // returnflag filter + a 3-month orderdate window (both pushed to the
    // scans), lineitem⋈orders shuffle join, revenue aggregated per
    // custKEY BEFORE the customer/nation dimension joins (Q10 groups by
    // the full customer row; grouping by the key and joining the ≤
    // |customers| aggregate to the dims is the same result with a far
    // smaller shuffle), then a TakeOrderedAndProject top 20.
    // TPC-H Q19 shape: disjunctive-predicate revenue — a 3-branch OR of
    // ANDed brand/size/quantity bands over lineitem ⋈ part. The
    // optimizer property under test: ONE equi join + one agg (never a
    // union of three scans), with as much of the disjunction as the
    // scans can take pushed down (plan-pinned), the rest residual on
    // the join. Exact DECIMAL money/quantity throughout.
    "q_disjrev" -> { (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), $"l_partkey" === $"p_partkey")
        .filter(
          ($"p_brand" === "Brand#1" && $"p_size".between(1, 10) &&
            dec2($"l_quantity").between(1, 20)) ||
          ($"p_brand" === "Brand#2" && $"p_size".between(5, 20) &&
            dec2($"l_quantity").between(10, 30)) ||
          ($"p_brand" === "Brand#3" && $"p_size".between(10, 40) &&
            dec2($"l_quantity").between(20, 40)))
        .agg(sum(dec2($"l_extendedprice") * (lit(1) - pct($"l_discount")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n"))
    },

    "q_retrev" -> { (s, dir) =>
      import s.implicits._
      val o = Tables.orders(s, dir)
        .filter($"o_orderdate" >= lit("1996-10-01").cast("timestamp") &&
          $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
        .select($"o_orderkey", $"o_custkey")
      val l = Tables.lineitem(s, dir).filter($"l_returnflag" === "R")
        .select($"l_orderkey", $"l_extendedprice", $"l_discount")
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_custkey")
        .agg(sum(dec2($"l_extendedprice") * (lit(1) - pct($"l_discount"))).as("rev_d"))
        .join(Tables.customer(s, dir), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
        .select($"c_custkey", $"c_name", $"c_acctbal", $"n_name",
          $"rev_d".cast("double").as("revenue"))
        .orderBy($"revenue".desc, $"c_custkey")
        .limit(20)
    },

    // TPC-H Q20 shape: qualified-volume suppliers — suppliers in one
    // nation whose 1997 shipped quantity of red parts clears a floor.
    // The qualification derives from an aggregate (per-supplier Σqty over
    // the part-filtered, date-filtered lineitem), then flows as a
    // LEFT-SEMI probe into the supplier dim: the fact table is aggregated
    // before any row reaches the dimension, and the nation gate is a
    // broadcast. Exact-decimal HAVING threshold.
    "q_qualsupp" -> { (s, dir) =>
      import s.implicits._
      val qualified = Tables.lineitem(s, dir)
        .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
        .join(broadcast(Tables.part(s, dir).filter($"p_name".startsWith("red"))
            .select($"p_partkey")),
          $"l_partkey" === $"p_partkey")
        .groupBy($"l_suppkey")
        .agg(sum(dec2($"l_quantity")).as("qty_d"))
        .filter($"qty_d" > 50)
        .select($"l_suppkey")
      Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir).filter($"n_name" === "NATION_3")),
          $"s_nationkey" === $"n_nationkey")
        .join(qualified, $"s_suppkey" === $"l_suppkey", "left_semi")
        .select($"s_suppkey", $"s_name", $"s_acctbal")
    }
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  /** Shared RRF oracle tail (lex ranking → per-query multi-probe-LSH ANN
    * list → fusion → top-10), parameterized by the vector CTE — ONE copy
    * of the RRF constants and tie-breaks for q_doc_rrf (over `base`) and
    * q_retrieval_e2e (over the dedup-cleaned `eb`). Expects a `bm` CTE
    * (BM25 scores) in scope. The vector list mirrors
    * Similarity.knnLshMultiProbe (the q_emb_annmp oracle's bucket + 1-bit
    * probe-set formulation), matching the engine's swap away from the
    * probe-measured-superlinear brute list.
    */
  private def rrfTailSql(embCte: String): String =
    s"""lex AS (
       |  SELECT doc_id, CAST(ROW_NUMBER() OVER (
       |    ORDER BY score_odds_nanos DESC, doc_id) AS BIGINT) AS rank
       |  FROM bm
       |  QUALIFY rank <= 20),
       |rbk AS (SELECT vec_id, emb, nrm, ${Similarity.bucketSql} AS bucket FROM $embCte),
       |q AS (SELECT vec_id AS qid, emb AS qemb, nrm AS qnrm FROM $embCte WHERE vec_id % 50 = 0),
       |qpr AS (
       |  SELECT qid, qemb, qnrm, unnest(probes) AS qbucket FROM (
       |    SELECT vec_id AS qid, emb AS qemb, nrm AS qnrm,
       |      list_prepend(bucket, list_transform(range(0, ${Similarity.NumPlanes}), j ->
       |        xor(bucket, CAST(1 AS BIGINT) << CAST(j AS INTEGER)))) AS probes
       |    FROM rbk WHERE vec_id % 50 = 0) t),
       |vec AS (
       |  SELECT qid, vec_id AS doc_id, rn AS rank FROM (
       |    SELECT qid, vec_id, CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY ${Similarity.dotSql("qemb", "emb")} / (qnrm * nrm) DESC, vec_id) AS BIGINT) AS rn
       |    FROM qpr JOIN rbk ON bucket = qbucket AND vec_id <> qid) t
       |  WHERE rn <= 20),
       |lists AS (
       |  SELECT qid, doc_id, rank FROM q CROSS JOIN lex
       |  UNION ALL SELECT qid, doc_id, rank FROM vec),
       |sc AS (
       |  SELECT qid, doc_id,
       |    CAST(SUM(1000000000 // (60 + rank)) AS BIGINT) AS rrf_nanos,
       |    COUNT(*) AS n_lists
       |  FROM lists GROUP BY qid, doc_id)
       |SELECT qid, doc_id, rrf_nanos, n_lists, rank FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |    ORDER BY rrf_nanos DESC, doc_id) AS BIGINT) AS rank
       |  FROM sc) t
       |WHERE rank <= 10""".stripMargin

  /** DuckDB mirror of EntityResolution.bestMatch - used verbatim by
    * q_er_bestmatch and as the blocked-side CTE of q_er_recall.
    */
  private lazy val ErBestMatchOracleSql: String =
    """WITH rec AS (
        |  SELECT CAST(p_partkey AS BIGINT) AS key, p_name AS name FROM part),
        |b1 AS (
        |  SELECT split_part(name, ' ', 1) AS w1, split_part(name, ' ', 2) AS w2,
        |    key, name FROM rec
        |  WHERE split_part(name, ' ', 1) <> '' AND split_part(name, ' ', 2) <> ''),
        |b3 AS (
        |  SELECT split_part(name, ' ', 3) AS w1, split_part(name, ' ', 4) AS w2,
        |    key, name FROM rec
        |  WHERE split_part(name, ' ', 3) <> '' AND split_part(name, ' ', 4) <> ''),
        |cand AS (
        |  SELECT a.key AS key_a,
        |    CAST(levenshtein(a.name, b.name) AS BIGINT) * 8589934592 + b.key AS pk
        |  FROM b1 a JOIN b1 b ON a.w1 = b.w1 AND a.w2 = b.w2 AND a.key <> b.key
        |  UNION ALL
        |  SELECT a.key AS key_a,
        |    CAST(levenshtein(a.name, b.name) AS BIGINT) * 8589934592 + b.key AS pk
        |  FROM b3 a JOIN b3 b ON a.w1 = b.w1 AND a.w2 = b.w2 AND a.key <> b.key)
        |SELECT key_a AS p_partkey, min(pk) // 8589934592 AS best_dist,
        |  min(pk) % 8589934592 AS best_key
        |FROM cand GROUP BY key_a""".stripMargin

  /** Shared DuckDB mirror of TextAnalysis.stupidBackoff - used verbatim
    * by q_doc_sbackoff and as the scoring CTE of q_doc_ppbucket.
    */
  private lazy val SbackoffOracleSql: String =
    s"""WITH tk AS (SELECT doc_id, ${Dedup.toksSql} AS toks FROM documents),
         |bgs AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, len(toks)), i ->
         |      {'w1': toks[i], 'w2': toks[i+1], 'bg': toks[i] || ' ' || toks[i+1]}),
         |      recursive := true)
         |  FROM tk),
         |tr AS (SELECT * FROM tk WHERE doc_id % 2 = 0),
         |uni AS (
         |  SELECT w, COUNT(*) AS cw
         |  FROM (SELECT unnest(toks) AS w FROM tr) GROUP BY w),
         |bc AS (
         |  SELECT bg, COUNT(*) AS cb
         |  FROM (SELECT unnest(list_transform(range(1, len(toks)), i ->
         |          toks[i] || ' ' || toks[i+1])) AS bg FROM tr)
         |  GROUP BY bg),
         |nt AS (SELECT COUNT(*) AS n FROM (SELECT unnest(toks) FROM tr)),
         |sc AS (
         |  SELECT g.doc_id, bc.cb IS NULL AS backoff,
         |    CASE WHEN bc.cb IS NOT NULL
         |      THEN length(bin(bc.cb)) - length(bin(u1.cw))
         |      ELSE length(bin(COALESCE(u2.cw, 1) * 2)) - length(bin(nt.n * 5))
         |    END AS s
         |  FROM bgs g
         |  LEFT JOIN bc ON g.bg = bc.bg
         |  LEFT JOIN uni u1 ON g.w1 = u1.w
         |  LEFT JOIN uni u2 ON g.w2 = u2.w
         |  CROSS JOIN nt)
         |SELECT doc_id, COUNT(*) AS n_bigrams,
         |  count(CASE WHEN backoff THEN 1 END) AS n_backoff,
         |  CAST(SUM(s) AS BIGINT) AS total_sb,
         |  CAST(count(CASE WHEN backoff THEN 1 END) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE) AS backoff_frac,
         |  CAST(CAST(SUM(s) AS BIGINT) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE) AS mean_sb
         |FROM sc GROUP BY doc_id""".stripMargin

  lazy val oracleSql: Map[String, String] = Map(
    "ref_pipeline" ->
      s"""${RefOrders.processedSql}
         |SELECT * FROM processed""".stripMargin,
    "ref_enriched" ->
      s"""${RefOrders.processedSql}
         |SELECT order_id, product_name, quantity, price, order_date, total_price
         |FROM processed WHERE is_valid""".stripMargin,
    "ref_invalid" ->
      s"""${RefOrders.processedSql}
         |SELECT order_id, coalesce(order_id, 'unknown') AS key, error_message
         |FROM processed WHERE NOT is_valid""".stripMargin,
    "ref_sql" ->
      s"""${RefOrders.processedSql}
         |SELECT order_id, product_name, quantity, price, order_date, total_price
         |FROM processed WHERE is_valid AND total_price > 1000000""".stripMargin,
    "ref_envelope" ->
      s"""${RefOrders.processedSql}
         |SELECT coalesce(order_id, 'unknown') AS key,
         |  to_json(struct_pack(
         |    schema := struct_pack(
         |      "type" := 'struct',
         |      fields := [
         |        struct_pack("type" := 'string', optional := true, field := 'order_id'),
         |        struct_pack("type" := 'string', optional := true, field := 'product_name'),
         |        struct_pack("type" := 'double', optional := true, field := 'quantity'),
         |        struct_pack("type" := 'double', optional := true, field := 'price'),
         |        struct_pack("type" := 'string', optional := true, field := 'order_date'),
         |        struct_pack("type" := 'double', optional := true, field := 'total_price')],
         |      optional := false, name := 'enriched_order'),
         |    payload := struct_pack(
         |      order_id := order_id, product_name := product_name,
         |      quantity := quantity, price := price,
         |      order_date := order_date, total_price := total_price))) AS value
         |FROM processed WHERE is_valid""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        | COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '2001-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_topk" ->
      """SELECT l_orderkey,
        |  strftime(o_orderdate::DATE, '%Y-%m-%d') AS o_orderdate,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1999-01-01'
        |  AND l_shipdate > TIMESTAMP '1999-01-01'
        |GROUP BY l_orderkey, orders.o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q5_join" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
        |GROUP BY n_name""".stripMargin,
    "q_semi" ->
      """SELECT o_orderstatus, COUNT(*) AS n FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderstatus""".stripMargin,
    "q_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin,
    "q_left_outer" ->
      """SELECT c_custkey,
        |  COUNT(o_orderkey) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spent
        |FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey""".stripMargin,
    "q_full_outer" ->
      """WITH cn AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1),
        |sn AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
        |SELECT CAST(coalesce(cn.nationkey, sn.nationkey) AS BIGINT) AS nationkey, n_cust, n_supp
        |FROM cn FULL OUTER JOIN sn ON cn.nationkey = sn.nationkey""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3""".stripMargin,
    "q_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty,
        |  LAG(l_quantity, 1) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity) AS prev_qty
        |FROM lineitem""".stripMargin,
    "q_window_rangeframe" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
        |    RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW) AS n_within_50k
        |FROM orders""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q_groupsets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin,
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, metric, value FROM (
        |  SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS value
        |  FROM lineitem WHERE l_quantity > 45
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
        |  FROM lineitem WHERE l_quantity > 45
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'discount', l_discount
        |  FROM lineitem WHERE l_quantity > 45)""".stripMargin,
    "q_stragg" ->
      """SELECT o_orderstatus,
        |  string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q_setops" ->
      """((SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  UNION
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
        | INTERSECT
        | SELECT c_custkey AS o_custkey FROM customer WHERE c_acctbal > 0)
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_totalprice > 400000""".stripMargin,
    "q_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20""".stripMargin,
    "q_scalar" ->
      """SELECT p_partkey,
        |  upper(p_name) AS uname,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  substr(p_name, 1, 5) AS name_pfx,
        |  CAST(regexp_extract(p_brand, '#(\d+)', 1) AS BIGINT) AS brand_num,
        |  concat_ws('/', p_type, p_brand) AS type_brand,
        |  CAST(abs(p_size - 25) AS BIGINT) AS abs_off,
        |  CAST(floor(p_retailprice) AS BIGINT) AS floor_price,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS ceil_price,
        |  CAST(p_size % 5 AS BIGINT) AS size_mod
        |FROM part""".stripMargin,
    "q_dates" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  CAST(day(o_orderdate) AS BIGINT) AS d,
        |  strftime(o_orderdate::DATE, '%Y-%m') AS ym,
        |  CAST(datediff('day', DATE '1995-01-01', o_orderdate::DATE) AS BIGINT) AS days_since,
        |  strftime((o_orderdate::DATE + INTERVAL 3 MONTH)::DATE, '%Y-%m-%d') AS plus3m
        |FROM orders""".stripMargin,
    "q_asof" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ets, value, event_type FROM events),
        |c AS (SELECT event_id, user_id, ets, value FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, ets, value AS purchase_value FROM e WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id,
        |  strftime(c.ets, '%Y-%m-%d %H:%M:%S.%f') AS ts,
        |  p.purchase_value
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ets >= p.ets""".stripMargin,
    "q_mm_meta" ->
      """SELECT doc_id,
        |  ['image','audio','video'][CAST(doc_id % 3 + 1 AS INTEGER)] AS media_type,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  md5(text) AS content_md5
        |FROM documents""".stripMargin,
    "q_mm_decode" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    ['image','audio','video'][CAST(doc_id % 3 + 1 AS INTEGER)] AS media_type,
         |    ${Dedup.hashSql("text")} AS h
         |  FROM documents)
         |SELECT doc_id, media_type,
         |  CAST(64 + h % 512 AS BIGINT) AS width,
         |  CAST(64 + (h // 512) % 512 AS BIGINT) AS height,
         |  CAST(1 + h % 16 AS BIGINT) AS n_frames
         |FROM d""".stripMargin,
    "q_mm_frames" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    ['image','audio','video'][CAST(doc_id % 3 + 1 AS INTEGER)] AS media_type,
         |    ${Dedup.hashSql("text")} AS h
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, media_type, CAST(1 + h % 16 AS BIGINT) AS n_frames FROM d)
         |SELECT doc_id, n_frames,
         |  unnest(list_transform(range(0, least(n_frames, 4)),
         |    i -> (i * n_frames) // least(n_frames, 4))) AS frame_idx
         |FROM m WHERE media_type = 'video'""".stripMargin,
    "q_mm_features" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    ['image','audio','video'][CAST(doc_id % 3 + 1 AS INTEGER)] AS media_type,
         |    ${Dedup.hashSql("text")} AS h
         |  FROM documents)
         |SELECT doc_id, media_type, k,
         |  CAST(((k*2 + 1) * h + (k * 7919 + 13)) % 1000000007 AS DOUBLE) / 1000000007.0 AS feature
         |FROM d, UNNEST(range(0, 8)) AS t(k)""".stripMargin,
    "q_mm_resize" ->
      s"""WITH d AS (
         |  SELECT doc_id, ${Dedup.hashSql("text")} AS h FROM documents),
         |m AS (
         |  SELECT doc_id,
         |    CAST(64 + h % 512 AS BIGINT) AS width,
         |    CAST(64 + (h // 512) % 512 AS BIGINT) AS height
         |  FROM d)
         |SELECT doc_id, width, height,
         |  (width * 224) // greatest(width, height) AS new_w,
         |  (height * 224) // greatest(width, height) AS new_h
         |FROM m""".stripMargin,
    "q_doc_search" ->
      s"""WITH tq AS (SELECT doc_id, ${Dedup.toksSql} AS toks FROM documents),
         |tok AS (SELECT doc_id, unnest(toks) AS w FROM tq)
         |SELECT doc_id, COUNT(*) AS score
         |FROM tok
         |WHERE w IN ('scan', 'merge', 'sort')
         |GROUP BY doc_id
         |HAVING COUNT(DISTINCT w) = 3""".stripMargin,
    "q_doc_bm25" -> TextAnalysis.bm25SearchSql(SearchTerms),
    "q_doc_ql" -> TextAnalysis.qlSearchSql(SearchTerms),
    "q_doc_rm3" -> TextAnalysis.rm3SearchSql(SearchTerms),
    "q_doc_rm3fb" -> TextAnalysis.rm3FeedbackSql(SearchTerms),
    "q_doc_rm3exp" -> TextAnalysis.rm3ExpansionSql(SearchTerms),
    "q_doc_rm3in" -> TextAnalysis.rm3ExpInputSql(SearchTerms),
    "q_doc_ndcg" -> Retrieval.ndcgAuditSql(SearchTerms),
    "q_doc_rrf" ->
      s"""WITH ${Similarity.baseSql},
         |bm AS (${TextAnalysis.bm25SearchSql(SearchTerms)}),
         |${rrfTailSql("base")}""".stripMargin,
    "q_doc_hybrid" ->
      s"""WITH ${Similarity.baseSql},
         |bm AS (${TextAnalysis.bm25SearchSql(SearchTerms)}),
         |hlx AS (
         |  SELECT doc_id, CAST(score_odds_nanos AS DOUBLE) AS s FROM bm
         |  QUALIFY ROW_NUMBER() OVER (ORDER BY score_odds_nanos DESC, doc_id) <= 20),
         |hbk AS (SELECT vec_id, emb, nrm, ${Similarity.bucketSql} AS bucket FROM base),
         |hq AS (SELECT vec_id AS qid, emb AS qemb, nrm AS qnrm FROM base WHERE vec_id % 50 = 0),
         |hqp AS (
         |  SELECT qid, qemb, qnrm, unnest(probes) AS qbucket FROM (
         |    SELECT vec_id AS qid, emb AS qemb, nrm AS qnrm,
         |      list_prepend(bucket, list_transform(range(0, ${Similarity.NumPlanes}), j ->
         |        xor(bucket, CAST(1 AS BIGINT) << CAST(j AS INTEGER)))) AS probes
         |    FROM hbk WHERE vec_id % 50 = 0) t),
         |hvec AS (
         |  SELECT qid, vec_id AS doc_id, cos AS s FROM (
         |    SELECT qid, vec_id, ${Similarity.dotSql("qemb", "emb")} / (qnrm * nrm) AS cos,
         |      ROW_NUMBER() OVER (PARTITION BY qid
         |        ORDER BY ${Similarity.dotSql("qemb", "emb")} / (qnrm * nrm) DESC, vec_id) AS rn
         |    FROM hqp JOIN hbk ON bucket = qbucket AND vec_id <> qid) t
         |  WHERE rn <= 20),
         |hls AS (
         |  SELECT qid, doc_id, s, 0 AS l, 0.5 AS w FROM hq CROSS JOIN hlx
         |  UNION ALL SELECT qid, doc_id, s, 1 AS l, 0.5 AS w FROM hvec),
         |hbd AS (SELECT qid, l, MIN(s) AS mn, MAX(s) AS mx FROM hls GROUP BY qid, l),
         |hcb AS (
         |  SELECT t.qid, t.doc_id,
         |    t.w * (CASE WHEN b.mx > b.mn THEN (t.s - b.mn) / (b.mx - b.mn) ELSE 1.0 END) AS c
         |  FROM hls t JOIN hbd b ON t.qid = b.qid AND t.l = b.l)
         |SELECT qid, doc_id, hybrid, n_lists, rank FROM (
         |  SELECT qid, doc_id, SUM(c) AS hybrid, COUNT(*) AS n_lists,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY SUM(c) DESC, doc_id) AS BIGINT) AS rank
         |  FROM hcb GROUP BY qid, doc_id) t
         |WHERE rank <= 10""".stripMargin,
    "q_doc_overlap" -> TextAnalysis.sourceOverlapSql(),
    "q_doc_charclass" -> TextAnalysis.charClassAuditSql(),
    "q_retrieval_e2e" ->
      s"""WITH RECURSIVE ${Dedup.corpusSql},
         |${Dedup.tokSql},
         |${Dedup.sigSql},
         |${Dedup.bandsSql},
         |${Dedup.closureSql},
         |${Dedup.cleanSql},
         |${Similarity.baseSql},
         |bm AS (${TextAnalysis.bm25SearchSql(SearchTerms, src = "clean")}),
         |eb AS (SELECT b.vec_id, b.emb, b.nrm FROM base b JOIN clean c ON c.doc_id = b.vec_id),
         |${rrfTailSql("eb")}""".stripMargin,
    "q_doc_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    list_reduce(list_prepend(CAST(7 AS BIGINT), list_transform(string_split(w, ''), c -> ascii(c))),
        |      (a, b) -> (a*31 + b) % 1000000007) AS h
        |  FROM (SELECT doc_id,
        |          unnest(list_filter(regexp_split_to_array(trim(lower(text)), '[ \t\n\f\r]+'), x -> length(x) > 0)) AS w
        |        FROM documents)),
        |tf AS (SELECT doc_id, h, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT h, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, h FROM tok) GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents)
        |SELECT doc_id, h AS top_term_hash, tf, df, tfidf FROM (
        |  SELECT tf.doc_id, tf.h, tf.tf, df.df,
        |    CAST(tf.tf * n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE) AS tfidf,
        |    ROW_NUMBER() OVER (PARTITION BY tf.doc_id
        |      ORDER BY CAST(tf.tf * n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE) DESC, tf.h) AS rn
        |  FROM tf JOIN df USING (h) CROSS JOIN n) t
        |WHERE rn = 1""".stripMargin,
    "q_emb_ivf" ->
      s"""WITH ${Similarity.baseSql},
         |${Similarity.centroidCtesSql},
         |q AS (SELECT vec_id AS qid, emb AS qemb, nrm AS qnrm FROM base WHERE vec_id % 50 = 0),
         |probes AS (
         |  SELECT qid, qemb, qnrm, cell FROM (
         |    SELECT q.qid, q.qemb, q.qnrm, c.cell,
         |      ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
         |        ${Similarity.dotSql("q.qemb", "c.cemb")} / (q.qnrm * c.cnrm) DESC, c.cell) AS prn
         |    FROM q CROSS JOIN cemb2 c) t
         |  WHERE prn <= 2),
         |pairs AS (
         |  SELECT qid, vec_id,
         |    ${Similarity.dotSql("qemb", "emb")} / (qnrm * nrm) AS cos
         |  FROM probes JOIN base ON base.label = probes.cell AND base.vec_id <> probes.qid)
         |SELECT qid, vec_id, cos, rn FROM (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS BIGINT) AS rn
         |  FROM pairs) t
         |WHERE rn <= 3""".stripMargin,
    "q_emb_nprobe" ->
      s"""WITH ${Similarity.baseSql},
         |${Similarity.centroidCtesSql},
         |q AS (SELECT vec_id AS qid, emb AS qemb, nrm AS qnrm FROM base
         |      WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 64),
         |probes AS (
         |  SELECT qid, qemb, qnrm, cell, prn FROM (
         |    SELECT q.qid, q.qemb, q.qnrm, c.cell,
         |      CAST(ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
         |        ${Similarity.dotSql("q.qemb", "c.cemb")} / (q.qnrm * c.cnrm) DESC, c.cell) AS BIGINT) AS prn
         |    FROM q CROSS JOIN cemb2 c) t
         |  WHERE prn <= 4),
         |pairs AS (
         |  SELECT qid, vec_id,
         |    ${Similarity.dotSql("qemb", "emb")} / (qnrm * nrm) AS cos, prn
         |  FROM probes JOIN base ON base.label = probes.cell AND base.vec_id <> probes.qid),
         |np AS (SELECT CAST(unnest([1, 2, 4]) AS BIGINT) AS nprobe),
         |annall AS (
         |  SELECT nprobe, qid, vec_id FROM (
         |    SELECT np.nprobe, p.qid, p.vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY np.nprobe, p.qid
         |        ORDER BY p.cos DESC, p.vec_id) AS rn
         |    FROM np JOIN pairs p ON p.prn <= np.nprobe) t
         |  WHERE rn <= 3),
         |truth AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY
         |      ${Similarity.dotSql("qemb", "emb")} / (qnrm * nrm) DESC, vec_id) AS rn
         |    FROM q JOIN base ON vec_id <> qid) t
         |  WHERE rn <= 3),
         |tt AS (SELECT COUNT(*) AS n_truth FROM truth),
         |hits AS (
         |  SELECT nprobe, COUNT(*) AS n_hit
         |  FROM annall SEMI JOIN truth USING (qid, vec_id)
         |  GROUP BY nprobe)
         |SELECT np.nprobe, n_truth,
         |  COALESCE(n_hit, CAST(0 AS BIGINT)) AS n_hit,
         |  CAST(COALESCE(n_hit, 0) AS DOUBLE) / CAST(n_truth AS DOUBLE) AS recall
         |FROM np LEFT JOIN hits ON np.nprobe = hits.nprobe CROSS JOIN tt""".stripMargin,
    "q_emb_pq" ->
      s"""WITH ${Similarity.baseSql},
         |lab AS (
         |  SELECT label, CAST(ROW_NUMBER() OVER (ORDER BY label) AS INT) - 1 AS li
         |  FROM (SELECT DISTINCT label FROM embeddings)),
         |cen AS (
         |  SELECT label, dim,
         |    CAST(SUM(CAST(ROUND(CAST(v AS DOUBLE) * 16777216.0) AS BIGINT)) AS DOUBLE)
         |      / (CAST(COUNT(*) AS DOUBLE) * 16777216.0) AS centroid
         |  FROM (SELECT label, unnest(embedding) AS v,
         |          CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim
         |        FROM embeddings) t
         |  GROUP BY label, dim),
         |cb AS (
         |  SELECT li, CAST(dim // 8 AS INT) AS s, list(centroid ORDER BY dim) AS cvec
         |  FROM cen JOIN lab USING (label) GROUP BY li, CAST(dim // 8 AS INT)),
         |sv AS (
         |  SELECT vec_id, s, emb[s*8+1 : s*8+8] AS subvec
         |  FROM base, (SELECT unnest(range(0, 8)) AS s)),
         |enc0 AS (
         |  SELECT vec_id, s, li,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id, s
         |      ORDER BY ${Similarity.l2sqSql("subvec", "cvec")}, li) AS rn
         |  FROM sv JOIN cb USING (s)),
         |enc AS (SELECT vec_id, list(li ORDER BY s) AS codes FROM enc0 WHERE rn = 1 GROUP BY vec_id),
         |qd0 AS (
         |  SELECT vec_id AS qid, s, li, ${Similarity.l2sqSql("subvec", "cvec")} AS d2
         |  FROM sv JOIN cb USING (s) WHERE vec_id % 50 = 0),
         |qdt AS (SELECT qid, list(d2 ORDER BY s, li) AS qd FROM qd0 GROUP BY qid),
         |pairs AS (
         |  SELECT qid, vec_id,
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |      list_transform(range(0, 8), s -> qd[s * (len(qd)//8) + codes[s+1] + 1])),
         |      (x, y) -> x + y) AS adc
         |  FROM enc, qdt WHERE vec_id <> qid)
         |SELECT qid, CAST(rn - 1 AS BIGINT) AS rank, vec_id FROM (
         |  SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc, vec_id) AS rn
         |  FROM pairs) t
         |WHERE rn <= 5""".stripMargin,
    "q_emb_ivfpq" ->
      s"""WITH ${Similarity.baseSql},
         |lab AS (
         |  SELECT label, CAST(ROW_NUMBER() OVER (ORDER BY label) AS INT) - 1 AS li
         |  FROM (SELECT DISTINCT label FROM embeddings)),
         |cen AS (
         |  SELECT label, dim,
         |    CAST(SUM(CAST(ROUND(CAST(v AS DOUBLE) * 16777216.0) AS BIGINT)) AS DOUBLE)
         |      / (CAST(COUNT(*) AS DOUBLE) * 16777216.0) AS centroid
         |  FROM (SELECT label, unnest(embedding) AS v,
         |          CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim
         |        FROM embeddings) t
         |  GROUP BY label, dim),
         |cb AS (
         |  SELECT li, CAST(dim // 8 AS INT) AS s, list(centroid ORDER BY dim) AS cvec
         |  FROM cen JOIN lab USING (label) GROUP BY li, CAST(dim // 8 AS INT)),
         |cemb AS (SELECT label AS cell, list(centroid ORDER BY dim) AS cemb FROM cen GROUP BY label),
         |cemb2 AS (
         |  SELECT cell, cemb,
         |    sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |      list_transform(cemb, x -> x * x)), (a, b) -> a + b)) AS cnrm
         |  FROM cemb),
         |sv AS (
         |  SELECT vec_id, s, emb[s*8+1 : s*8+8] AS subvec
         |  FROM base, (SELECT unnest(range(0, 8)) AS s)),
         |enc0 AS (
         |  SELECT vec_id, s, li,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id, s
         |      ORDER BY ${Similarity.l2sqSql("subvec", "cvec")}, li) AS rn
         |  FROM sv JOIN cb USING (s)),
         |enc AS (SELECT vec_id, list(li ORDER BY s) AS codes FROM enc0 WHERE rn = 1 GROUP BY vec_id),
         |qd0 AS (
         |  SELECT vec_id AS qid, s, li, ${Similarity.l2sqSql("subvec", "cvec")} AS d2
         |  FROM sv JOIN cb USING (s) WHERE vec_id % 50 = 0),
         |qdt AS (SELECT qid, list(d2 ORDER BY s, li) AS qd FROM qd0 GROUP BY qid),
         |q AS (SELECT vec_id AS qid, emb AS qemb, nrm AS qnrm FROM base WHERE vec_id % 50 = 0),
         |probes AS (
         |  SELECT qid, cell FROM (
         |    SELECT q.qid, c.cell,
         |      ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
         |        ${Similarity.dotSql("q.qemb", "c.cemb")} / (q.qnrm * c.cnrm) DESC, c.cell) AS prn
         |    FROM q CROSS JOIN cemb2 c) t
         |  WHERE prn <= 2),
         |pairs AS (
         |  SELECT p.qid, e.vec_id,
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |      list_transform(range(0, 8), s -> qd[s * (len(qd)//8) + codes[s+1] + 1])),
         |      (x, y) -> x + y) AS adc
         |  FROM probes p
         |  JOIN qdt ON qdt.qid = p.qid
         |  JOIN enc e ON e.vec_id <> p.qid
         |  JOIN base b ON b.vec_id = e.vec_id AND b.label = p.cell)
         |SELECT qid, CAST(rn - 1 AS BIGINT) AS rank, vec_id FROM (
         |  SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc, vec_id) AS rn
         |  FROM pairs) t
         |WHERE rn <= 3""".stripMargin,
    "q_emb_opq" -> Similarity.knnOpqSql(),
    "q_emb_opqrecall" -> Similarity.opqRecallSql(),
    "q_emb_opq2" -> Similarity.opq2RecallSql(),
    "q_emb_ivfopq2" -> Similarity.knnIvfOpq2Sql(),
    "q_emb_ivfopq" -> Similarity.knnIvfOpqSql(),
    "q_emb_ivfpqr" -> Similarity.ivfPqResidualSql(),
    "q_emb_fivfpqr" ->
      Similarity.ivfPqResidualSql(nprobe = 4, storeWhere = "vec_id % 4 = 1"),
    "q_emb_sq" ->
      s"""WITH base AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         |  FROM embeddings),
         |mm AS (
         |  SELECT d, min(v) AS mn, max(v) AS mx FROM (
         |    SELECT unnest(emb) AS v,
         |      CAST(generate_subscripts(emb, 1) - 1 AS BIGINT) AS d
         |    FROM base) t
         |  GROUP BY d),
         |params AS (SELECT list(mn ORDER BY d) AS minv, list(mx ORDER BY d) AS maxv FROM mm),
         |enc AS (
         |  SELECT vec_id,
         |    list_transform(range(0, len(emb)), i -> CASE WHEN maxv[i+1] > minv[i+1]
         |      THEN CAST(least(floor((emb[i+1] - minv[i+1]) * 256.0 / (maxv[i+1] - minv[i+1])), 255.0) AS INT)
         |      ELSE 0 END) AS codes
         |  FROM base, params),
         |rec AS (
         |  SELECT vec_id,
         |    list_transform(range(0, len(codes)), i ->
         |      minv[i+1] + (CAST(codes[i+1] AS DOUBLE) + 0.5) * (maxv[i+1] - minv[i+1]) / 256.0) AS rvec
         |  FROM enc, params),
         |rnorm AS (SELECT vec_id, rvec, ${Similarity.dotSql("rvec", "rvec")} AS rr FROM rec),
         |q AS (
         |  SELECT vec_id AS qid, emb AS qemb, ${Similarity.dotSql("emb", "emb")} AS qq
         |  FROM base WHERE vec_id % 50 = 0),
         |pairs AS (
         |  SELECT qid, vec_id,
         |    qq - 2.0 * ${Similarity.dotSql("qemb", "rvec")} + rr AS d2
         |  FROM rnorm, q WHERE vec_id <> qid)
         |SELECT qid, CAST(rn - 1 AS BIGINT) AS rank, vec_id FROM (
         |  SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, vec_id) AS rn
         |  FROM pairs) t
         |WHERE rn <= 5""".stripMargin,
    "q_array_funcs" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings)
        |SELECT vec_id,
        |  CAST(len(emb) AS BIGINT) AS dims,
        |  emb[1] AS first,
        |  emb[-1] AS last,
        |  list_max(emb) AS mx,
        |  list_min(emb) AS mn,
        |  list_sort(emb)[32] AS median_lo,
        |  CAST(list_position(emb, list_max(emb)) AS BIGINT) AS argmax1,
        |  list_contains(emb, 0.0) AS has_zero,
        |  emb[1:4][2] AS slice2,
        |  list_reverse(emb)[1] AS rev_first
        |FROM e""".stripMargin,
    "q_dedup_embed" ->
      s"""WITH ecorpus AS (
         |  SELECT vec_id, label, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000 AS vec_id, label,
         |    list_transform(embedding, x -> x * CAST(1.5 AS FLOAT)) AS embedding
         |  FROM embeddings WHERE vec_id % 25 = 0),
         |eb AS (
         |  SELECT vec_id, label,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
         |    sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |      list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
         |      (a, b) -> a + b)) AS nrm
         |  FROM ecorpus),
         |bk AS (SELECT vec_id, emb, nrm, ${Similarity.bucketSql} AS bucket FROM eb)
         |SELECT vec_a, vec_b, cos FROM (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    ${Similarity.dotSql("a.emb", "b.emb")} / (a.nrm * b.nrm) AS cos
         |  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id) t
         |WHERE cos >= 0.99""".stripMargin,
    "q_dedup_semantic" ->
      s"""WITH ecorpus AS (
         |  SELECT vec_id, label, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000 AS vec_id, label,
         |    list_transform(embedding, x -> x * CAST(1.5 AS FLOAT)) AS embedding
         |  FROM embeddings WHERE vec_id % 25 = 0),
         |eb AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
         |    sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |      list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
         |      (a, b) -> a + b)) AS nrm
         |  FROM ecorpus),
         |cen AS (
         |  SELECT label AS cell, dim,
         |    CAST(SUM(CAST(ROUND(CAST(v AS DOUBLE) * 16777216.0) AS BIGINT)) AS DOUBLE)
         |      / (CAST(COUNT(*) AS DOUBLE) * 16777216.0) AS centroid
         |  FROM (SELECT label, unnest(embedding) AS v,
         |          CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim
         |        FROM embeddings) t
         |  GROUP BY label, dim),
         |cl AS (SELECT cell, list(centroid ORDER BY dim) AS cemb FROM cen GROUP BY cell),
         |cl2 AS (
         |  SELECT cell, cemb,
         |    sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |      list_transform(cemb, x -> x * x)), (a, b) -> a + b)) AS cnrm
         |  FROM cl),
         |asg AS (
         |  SELECT vec_id, cell, emb, nrm FROM (
         |    SELECT e.vec_id, c.cell, e.emb, e.nrm,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
         |        ${Similarity.dotSql("e.emb", "c.cemb")} / (e.nrm * c.cnrm) DESC, c.cell) AS rn
         |    FROM eb e CROSS JOIN cl2 c) t
         |  WHERE rn = 1),
         |drp AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE ${Similarity.dotSql("a.emb", "b.emb")} / (a.nrm * b.nrm) >= 0.95)
         |SELECT s.vec_id, s.cell FROM asg s
         |LEFT JOIN drp d ON s.vec_id = d.vec_id WHERE d.vec_id IS NULL""".stripMargin,
    "q_emb_bq" -> Similarity.bqSearchSql(),
    "q_emb_bqrecall" -> Similarity.bqRecallSql(),
    "q_emb_ivfbq" -> Similarity.ivfBqSearchSql(nprobe = 4),
    "q_emb_ivfbqrecall" -> Similarity.ivfBqRecallSql(nprobe = 4),
    "q_emb_ivfbqr" -> Similarity.ivfBqResidualSql(nprobe = 4),
    "q_emb_ivfbqrrecall" -> Similarity.ivfBqResidualRecallSql(nprobe = 4),
    "q_emb_knn" ->
      s"""WITH ${Similarity.baseSql},
         |q AS (SELECT vec_id AS qid, emb AS qemb, nrm AS qnrm FROM base WHERE vec_id % 50 = 0),
         |pairs AS (
         |  SELECT qid, vec_id,
         |    ${Similarity.dotSql("qemb", "emb")} / (qnrm * nrm) AS cos
         |  FROM q JOIN base ON vec_id <> qid)
         |SELECT qid, vec_id, cos, rn FROM (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS BIGINT) AS rn
         |  FROM pairs) t
         |WHERE rn <= 5""".stripMargin,
    "q_emb_stale" ->
      s"""WITH ${Similarity.kmeansCtes(trainWhere = "vec_id % 2 = 0")},
         |lab AS (
         |  SELECT cell, vec_id % 2 <> 0 AS is_new,
         |    CAST(ROUND(d2 * 16777216.0) AS BIGINT) AS q
         |  FROM afin)
         |SELECT cell,
         |  count(CASE WHEN NOT is_new THEN 1 END) AS n_train,
         |  count(CASE WHEN is_new THEN 1 END) AS n_new,
         |  CASE WHEN count(CASE WHEN NOT is_new THEN 1 END) > 0 THEN
         |    CAST(SUM(CASE WHEN NOT is_new THEN q ELSE 0 END) AS DOUBLE)
         |      / (CAST(count(CASE WHEN NOT is_new THEN 1 END) AS DOUBLE) * 16777216.0)
         |  END AS mean_d2_train,
         |  CASE WHEN count(CASE WHEN is_new THEN 1 END) > 0 THEN
         |    CAST(SUM(CASE WHEN is_new THEN q ELSE 0 END) AS DOUBLE)
         |      / (CAST(count(CASE WHEN is_new THEN 1 END) AS DOUBLE) * 16777216.0)
         |  END AS mean_d2_new
         |FROM lab GROUP BY cell""".stripMargin,
    "q_emb_reassign" -> Similarity.reassignSql(),
    "q_emb_hardneg" ->
      s"""WITH ${Similarity.baseSql},
         |q AS (SELECT vec_id AS qid, label AS qlabel, emb AS qemb, nrm AS qnrm
         |      FROM base WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 64),
         |pairs AS (
         |  SELECT qid, qlabel, vec_id, label AS neg_label,
         |    ${Similarity.dotSql("qemb", "emb")} / (qnrm * nrm) AS cos
         |  FROM q JOIN base ON label <> qlabel)
         |SELECT qid, qlabel, vec_id, neg_label, cos, rn FROM (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS BIGINT) AS rn
         |  FROM pairs) t
         |WHERE rn <= 3""".stripMargin,
    "q_emb_hardpos" ->
      s"""WITH ${Similarity.baseSql},
         |q AS (SELECT vec_id AS qid, label AS qlabel, emb AS qemb, nrm AS qnrm
         |      FROM base WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 64),
         |pairs AS (
         |  SELECT qid, qlabel, vec_id,
         |    ${Similarity.dotSql("qemb", "emb")} / (qnrm * nrm) AS cos
         |  FROM q JOIN base ON label = qlabel AND vec_id <> qid)
         |SELECT qid, qlabel, vec_id, cos, rn FROM (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos ASC, vec_id) AS BIGINT) AS rn
         |  FROM pairs) t
         |WHERE rn <= 3""".stripMargin,
    "q_emb_buckets" ->
      s"""WITH b AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         |  FROM embeddings)
         |SELECT vec_id, ${Similarity.bucketSql} AS bucket FROM b""".stripMargin,
    "q_emb_ann" ->
      s"""WITH ${Similarity.baseSql},
         |bk AS (SELECT vec_id, emb, nrm, ${Similarity.bucketSql} AS bucket FROM base),
         |q AS (SELECT vec_id AS qid, emb AS qemb, nrm AS qnrm, bucket AS qbucket
         |      FROM bk WHERE vec_id % 50 = 0),
         |pairs AS (
         |  SELECT qid, vec_id,
         |    ${Similarity.dotSql("qemb", "emb")} / (qnrm * nrm) AS cos
         |  FROM q JOIN bk ON bucket = qbucket AND vec_id <> qid)
         |SELECT qid, vec_id, cos, rn FROM (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS BIGINT) AS rn
         |  FROM pairs) t
         |WHERE rn <= 3""".stripMargin,
    "q_emb_divtopk" -> Similarity.divTopKSql(),
    "q_emb_annmp" ->
      s"""WITH ${Similarity.baseSql},
         |bk AS (SELECT vec_id, emb, nrm, ${Similarity.bucketSql} AS bucket FROM base),
         |q AS (
         |  SELECT qid, qemb, qnrm, unnest(probes) AS qbucket FROM (
         |    SELECT vec_id AS qid, emb AS qemb, nrm AS qnrm,
         |      list_prepend(bucket, list_transform(range(0, ${Similarity.NumPlanes}), j ->
         |        xor(bucket, CAST(1 AS BIGINT) << CAST(j AS INTEGER)))) AS probes
         |    FROM bk WHERE vec_id % 50 = 0) t),
         |pairs AS (
         |  SELECT qid, vec_id,
         |    ${Similarity.dotSql("qemb", "emb")} / (qnrm * nrm) AS cos
         |  FROM q JOIN bk ON bucket = qbucket AND vec_id <> qid)
         |SELECT qid, vec_id, cos, rn FROM (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS BIGINT) AS rn
         |  FROM pairs) t
         |WHERE rn <= 3""".stripMargin,
    "q_emb_recall" ->
      s"""WITH ${Similarity.baseSql},
         |q AS (SELECT vec_id AS qid, emb AS qemb, nrm AS qnrm FROM base
         |      WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 64),
         |kp AS (
         |  SELECT qid, vec_id, ${Similarity.dotSql("qemb", "emb")} / (qnrm * nrm) AS cos
         |  FROM q JOIN base ON vec_id <> qid),
         |knn AS (SELECT qid, vec_id FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
         |    FROM kp) t
         |  WHERE rn <= 3),
         |bk AS (SELECT vec_id, emb, nrm, ${Similarity.bucketSql} AS bucket FROM base),
         |q2 AS (SELECT vec_id AS qid, emb AS qemb, nrm AS qnrm, bucket AS qbucket
         |       FROM bk WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 64),
         |ap AS (
         |  SELECT qid, vec_id, ${Similarity.dotSql("qemb", "emb")} / (qnrm * nrm) AS cos
         |  FROM q2 JOIN bk ON bucket = qbucket AND vec_id <> qid),
         |ann AS (SELECT qid, vec_id FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
         |    FROM ap) t
         |  WHERE rn <= 3),
         |hit AS (SELECT k.qid, COUNT(*) AS n_hit
         |        FROM knn k JOIN ann a ON a.qid = k.qid AND a.vec_id = k.vec_id
         |        GROUP BY k.qid),
         |tr AS (SELECT qid, COUNT(*) AS n_truth FROM knn GROUP BY qid)
         |SELECT tr.qid, tr.n_truth, coalesce(h.n_hit, CAST(0 AS BIGINT)) AS n_hit,
         |  CAST(coalesce(h.n_hit, 0) AS DOUBLE) / CAST(tr.n_truth AS DOUBLE) AS recall
         |FROM tr LEFT JOIN hit h ON h.qid = tr.qid""".stripMargin,
    "q_emb_filtered" -> Similarity.filteredRecallSql("vec_id % 4 = 1"),
    "q_emb_mrr" ->
      s"""WITH ${Similarity.ecorpusCtesSql},
         |${Similarity.knownItemMrrSql()}""".stripMargin,
    "q_emb_e2e" ->
      s"""WITH ${Similarity.ecorpusCtesSql},
         |bk AS (SELECT vec_id, emb, nrm, ${Similarity.bucketSql} AS bucket FROM eb),
         |dups AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |  WHERE ${Similarity.dotSql("a.emb", "b.emb")} / (a.nrm * b.nrm) >= 0.99),
         |surv AS (
         |  SELECT vec_id, emb, nrm FROM eb
         |  WHERE vec_id NOT IN (SELECT vec_id FROM dups)),
         |centd AS (
         |  SELECT label, dim,
         |    CAST(SUM(CAST(ROUND(CAST(v AS DOUBLE) * 16777216.0) AS BIGINT)) AS DOUBLE)
         |      / (CAST(COUNT(*) AS DOUBLE) * 16777216.0) AS centroid
         |  FROM (SELECT label, unnest(embedding) AS v,
         |          CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim
         |        FROM embeddings) t
         |  GROUP BY label, dim),
         |centn AS (
         |  SELECT cell, cemb,
         |    sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |      list_transform(cemb, x -> x * x)), (a, b) -> a + b)) AS cnrm
         |  FROM (SELECT label AS cell, list(centroid ORDER BY dim) AS cemb
         |        FROM centd GROUP BY label) c),
         |scored AS (
         |  SELECT s.vec_id, c.cell,
         |    ${Similarity.dotSql("s.emb", "c.cemb")} / (s.nrm * c.cnrm) AS cos
         |  FROM surv s CROSS JOIN centn c)
         |SELECT vec_id, cell, cos FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS rn
         |  FROM scored) t
         |WHERE rn = 1""".stripMargin,
    "q_emb_centroid" ->
      """SELECT label, dim, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(CAST(v AS DOUBLE) * 16777216.0) AS BIGINT)) AS DOUBLE)
        |    / (CAST(COUNT(*) AS DOUBLE) * 16777216.0) AS centroid
        |FROM (SELECT label, unnest(embedding) AS v,
        |        CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim
        |      FROM embeddings) t
        |GROUP BY label, dim""".stripMargin,
    "q_emb_kmeans" -> Similarity.kmeansSql(),
    "q_emb_kcenter" -> Similarity.kCenterSql(),
    "q_emb_mmr" -> Similarity.mmrSql(),
    "q_emb_kcradius" -> Similarity.kCenterRadiusSql(),
    "q_emb_mmrt" -> Similarity.mmrTrainedSql(),
    "q_emb_append" -> Similarity.ivfAppendSql(),
    "q_emb_split" -> Similarity.splitSql(),
    "q_emb_cellbal" ->
      s"""WITH ${Similarity.kmeansCtes()},
         |${Similarity.cellBalanceSql()}""".stripMargin,
    "q_emb_silhouette" ->
      s"""WITH ${Similarity.kmeansCtes()},
         |${Similarity.silhouetteTailSql()}""".stripMargin,
    "q_emb_health" -> Similarity.embeddingHealthSql(),
    "q_emb_jlproj" -> Similarity.jlProjectSql(),
    "q_emb_jlrecall" -> Similarity.jlRecallSql(),
    "q_emb_ablrecall" -> Similarity.ablRecallSql(),
    "q_emb_pc1" ->
      s"""WITH ${Similarity.powerIterationSql()}""".stripMargin,
    "q_emb_ablate" ->
      s"""WITH ${Similarity.meanAblateSql()}""".stripMargin,
    "q_emb_dimstats" -> Similarity.dimStatsSql,
    "q_emb_decontam" -> Similarity.semanticDecontamSql(),
    "q_emb_bitext" -> Similarity.bitextMineSql(),
    "q_emb_topics" ->
      s"""WITH ${Similarity.kmeansCtes()},
         |j AS (
         |  SELECT a.cell, d.lang, d.n_chars
         |  FROM afin a JOIN documents d ON d.doc_id = a.vec_id),
         |lc AS (
         |  SELECT cell, lang, COUNT(*) AS n_docs,
         |    CAST(SUM(n_chars) AS BIGINT) AS total_chars
         |  FROM j GROUP BY cell, lang),
         |ct AS (SELECT cell, SUM(n_docs) AS nt FROM lc GROUP BY cell)
         |SELECT cell, lang, n_docs, total_chars,
         |  CAST(n_docs AS DOUBLE) / CAST(nt AS DOUBLE) AS share
         |FROM lc JOIN ct USING (cell)""".stripMargin,
    "q_dedup_exact" ->
      s"""WITH ${Dedup.corpusSql}
         |SELECT md5(text) AS text_md5, COUNT(*) AS n_dups, MIN(doc_id) AS keeper
         |FROM corpus GROUP BY 1 HAVING COUNT(*) > 1""".stripMargin,
    "q_dedup_ppjoin" -> Dedup.ppjoinPairsSql(),
    "q_dedup_minhash" ->
      s"""WITH ${Dedup.corpusSql},
         |${Dedup.tokSql},
         |${Dedup.sigSql},
         |${Dedup.bandsSql}
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id""".stripMargin,
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE ${Dedup.corpusSql},
         |${Dedup.tokSql},
         |${Dedup.sigSql},
         |${Dedup.bandsSql},
         |${Dedup.closureSql}
         |SELECT id AS doc_id, cluster, (id = cluster) AS is_keeper FROM comp""".stripMargin,
    "q_pipeline_pairs" ->
      s"""WITH RECURSIVE ${Dedup.corpusSql},
         |${Dedup.tokSql},
         |${Dedup.sigSql},
         |${Dedup.bandsSql},
         |${Dedup.closureSql},
         |${Similarity.baseSql},
         |${Similarity.contrastiveTriplesAnnSql()}""".stripMargin,
    "q_doc_simhash" ->
      s"""WITH ${Dedup.corpusSql},
         |${Dedup.simhashSql}
         |SELECT doc_id, simhash FROM sims""".stripMargin,
    "q_dedup_simhash" ->
      s"""WITH ${Dedup.corpusSql},
         |${Dedup.simhashSql},
         |sl AS (SELECT sims.doc_id, simhash, lang FROM sims JOIN corpus USING (doc_id))
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM sl a JOIN sl b ON a.lang = b.lang AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 8""".stripMargin,
    "q_dedup_jaccard" ->
      s"""WITH ${Dedup.corpusSql},
         |${Dedup.tokSql},
         |${Dedup.sigSql},
         |${Dedup.bandsSql},
         |${Dedup.jaccardPairSqlChain()}
         |SELECT doc_a, doc_b, jaccard FROM jpairs""".stripMargin,
    "q_dedup_incr" ->
      s"""WITH ${Dedup.corpusSql},
         |${Dedup.tokSql},
         |${Dedup.sigSql},
         |${Dedup.bandsSql},
         |${Dedup.jaccardPairSqlChain()}
         |SELECT doc_a, doc_b, jaccard,
         |  CASE WHEN doc_b >= 2000000 THEN 'incr' ELSE 'base' END AS part
         |FROM jpairs""".stripMargin,
    "q_dedup_incrclusters" ->
      s"""WITH RECURSIVE ${Dedup.corpusSql},
         |${Dedup.tokSql},
         |${Dedup.sigSql},
         |${Dedup.bandsSql},
         |${Dedup.closureSql}
         |SELECT id AS doc_id, cluster, (id = cluster) AS is_keeper FROM comp""".stripMargin,
    "q_dedup_jhist" ->
      s"""WITH ${Dedup.corpusSql},
         |${Dedup.tokSql},
         |${Dedup.sigSql},
         |${Dedup.bandsSql},
         |${Dedup.jaccardPairSqlChain(0.3)},
         |hist AS (
         |  SELECT CAST(FLOOR(jaccard * 20) AS BIGINT) AS jband, COUNT(*) AS n_pairs
         |  FROM jpairs GROUP BY 1)
         |SELECT h.jband, h.n_pairs,
         |  CAST(SUM(h2.n_pairs) AS BIGINT) AS n_at_or_above
         |FROM hist h JOIN hist h2 ON h2.jband >= h.jband
         |GROUP BY h.jband, h.n_pairs""".stripMargin,
    "q_dedup_scurve" ->
      s"""WITH ${Dedup.corpusSql},
         |audit AS (SELECT doc_id, text FROM corpus WHERE doc_id % 1000000 <= 40),
         |${Dedup.tokSqlFor("audit", "tok")},
         |${Dedup.sigSql},
         |${Dedup.bandsSql},
         |sizes AS (SELECT doc_id, COUNT(*) AS nt FROM tok GROUP BY 1),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM audit a JOIN audit b ON a.doc_id < b.doc_id),
         |inter AS (
         |  SELECT doc_a, doc_b, COUNT(*) AS ni
         |  FROM pairs
         |  JOIN tok ta ON ta.doc_id = doc_a
         |  JOIN tok tb ON tb.doc_id = doc_b AND tb.h = ta.h
         |  GROUP BY 1, 2),
         |coll AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
         |jb AS (
         |  SELECT
         |    CAST(LEAST(19, (COALESCE(i.ni, 0) * 20) // (sa.nt + sb.nt - COALESCE(i.ni, 0))) AS BIGINT) AS jband,
         |    CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END AS hit
         |  FROM pairs p
         |  LEFT JOIN inter i ON p.doc_a = i.doc_a AND p.doc_b = i.doc_b
         |  JOIN sizes sa ON p.doc_a = sa.doc_id
         |  JOIN sizes sb ON p.doc_b = sb.doc_id
         |  LEFT JOIN coll c ON p.doc_a = c.doc_a AND p.doc_b = c.doc_b),
         |theory AS (
         |  SELECT CAST(tjb AS BIGINT) AS jband, CAST(tp AS BIGINT) AS theo_ppm
         |  FROM (VALUES ${Dedup.scurveTheoryPpm.map { case (b, p) => s"($b, $p)" }.mkString(", ")}) v(tjb, tp))
         |SELECT jb.jband, COUNT(*) AS n_pairs, CAST(SUM(hit) AS BIGINT) AS n_coll,
         |  CAST((1000000 * CAST(SUM(hit) AS BIGINT)) // COUNT(*) AS BIGINT) AS meas_ppm,
         |  t.theo_ppm
         |FROM jb JOIN theory t ON jb.jband = t.jband
         |GROUP BY jb.jband, t.theo_ppm""".stripMargin,
    "q_dedup_compact" ->
      s"""WITH ${Dedup.corpusSql},
         |${Dedup.tokSql},
         |${Dedup.sigSql},
         |${Dedup.bandsSql},
         |sz AS (SELECT band, bh, COUNT(*) AS bucket_size FROM bands GROUP BY band, bh)
         |SELECT band, bucket_size, COUNT(*) AS n_buckets
         |FROM sz GROUP BY band, bucket_size""".stripMargin,
    "q_dedup_delindex" ->
      s"""WITH ${Dedup.corpusSql},
         |cdel AS (SELECT * FROM corpus WHERE doc_id < 2000000 AND doc_id % 30 <> 0),
         |${Dedup.tokSqlFor("cdel", "tok")},
         |${Dedup.sigSql},
         |${Dedup.bandsSql},
         |sz AS (SELECT band, bh, COUNT(*) AS bucket_size FROM bands GROUP BY band, bh)
         |SELECT band, bucket_size, COUNT(*) AS n_buckets
         |FROM sz GROUP BY band, bucket_size""".stripMargin,
    "q_dedup_delete" ->
      s"""WITH RECURSIVE ${Dedup.corpusSql},
         |cdel AS (SELECT * FROM corpus WHERE doc_id % 30 <> 0),
         |${Dedup.tokSqlFor("cdel", "tok")},
         |${Dedup.sigSql},
         |${Dedup.bandsSql},
         |${Dedup.closureSql}
         |SELECT id AS doc_id, cluster, (id = cluster) AS is_keeper FROM comp""".stripMargin,
    "q_dedup_crawl" ->
      s"""WITH ${Dedup.corpusSql},
         |cfin AS (
         |  SELECT * FROM corpus
         |  WHERE (doc_id < 2000000 AND doc_id % 30 <> 0) OR doc_id >= 2000000),
         |${Dedup.tokSqlFor("cfin", "tok")},
         |${Dedup.sigSql},
         |${Dedup.bandsSql},
         |${Dedup.jaccardPairSqlChain()}
         |SELECT doc_a, doc_b, jaccard,
         |  CASE WHEN doc_b >= 2000000 THEN 'new' ELSE 'kept' END AS part
         |FROM jpairs""".stripMargin,
    "q_dedup_crawlclusters" ->
      s"""WITH RECURSIVE ${Dedup.corpusSql},
         |cfin AS (
         |  SELECT * FROM corpus
         |  WHERE (doc_id < 2000000 AND doc_id % 30 <> 0) OR doc_id >= 2000000),
         |${Dedup.tokSqlFor("cfin", "tok")},
         |${Dedup.sigSql},
         |${Dedup.bandsSql},
         |${Dedup.closureSql}
         |SELECT id AS doc_id, cluster, (id = cluster) AS is_keeper FROM comp""".stripMargin,
    "q_emb_delete" -> Similarity.ivfDeleteSql("vec_id % 10 = 3"),
    "q_emb_crawl" -> Similarity.ivfCrawlSql("vec_id % 10 = 3"),
    "q_emb_ivft" -> Similarity.ivfPqResidualTrainedSql(),
    "q_emb_ivftrecall" -> Similarity.ivfRecallCurveTrainedSql(),
    "q_emb_fivft" ->
      Similarity.ivfPqResidualTrainedSql(nprobe = 4, storeWhere = "vec_id % 4 = 1"),
    "q_emb_servecrawl" -> Similarity.serveCrawlSql("a.vec_id % 10 = 3"),
    "q_emb_merge" -> Similarity.mergeUnderfullSql("vec_id % 10 = 3"),
    "q_dedup_srcmatrix" ->
      s"""WITH ${Dedup.corpusSql},
         |${Dedup.tokSql},
         |${Dedup.sigSql},
         |${Dedup.bandsSql},
         |${Dedup.jaccardPairSqlChain()},
         |m AS (
         |  SELECT doc_a % 1000000 AS ida, doc_b % 1000000 AS idb, jaccard
         |  FROM jpairs),
         |js AS (
         |  SELECT least(da.source, db.source) AS src_a,
         |         greatest(da.source, db.source) AS src_b,
         |         CAST(ROUND(jaccard * CAST(16777216.0 AS DOUBLE)) AS BIGINT) AS jq
         |  FROM m
         |  JOIN documents da ON da.doc_id = ida
         |  JOIN documents db ON db.doc_id = idb)
         |SELECT src_a, src_b, COUNT(*) AS n_pairs,
         |  CAST(SUM(jq) AS DOUBLE)
         |    / (CAST(COUNT(*) AS DOUBLE) * CAST(16777216.0 AS DOUBLE)) AS mean_jaccard
         |FROM js GROUP BY 1, 2""".stripMargin,
    "q_doc_srcrank" -> {
      // 6 unrolled power-iteration rounds (the classifier-fit MATERIALIZED
      // discipline); per-edge FLOOR through one HUGEINT->DOUBLE division
      // mirrors the engine's DECIMAL(38,0)->double, then order-free sums
      val roundCtes = (1 to 6).map { i =>
        s"""r$i AS MATERIALIZED (
           |  SELECT n.source,
           |    CAST(basev.b + COALESCE(SUM(CAST(FLOOR(
           |      CAST(CAST(85 AS HUGEINT) * r.rank_q * e.w AS DOUBLE)
           |      / CAST(100 * d.wdeg AS DOUBLE)) AS BIGINT)), 0) AS BIGINT) AS rank_q
           |  FROM nodes n CROSS JOIN basev
           |  LEFT JOIN edges e ON e.v = n.source
           |  LEFT JOIN r${i - 1} r ON r.source = e.u
           |  LEFT JOIN wdeg d ON d.u = e.u
           |  GROUP BY n.source, basev.b)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${Dedup.corpusSql},
         |${Dedup.tokSql},
         |${Dedup.sigSql},
         |${Dedup.bandsSql},
         |${Dedup.jaccardPairSqlChain()},
         |m AS (SELECT doc_a % 1000000 AS ida, doc_b % 1000000 AS idb FROM jpairs),
         |sp AS (
         |  SELECT least(da.source, db.source) AS src_a,
         |         greatest(da.source, db.source) AS src_b, COUNT(*) AS w
         |  FROM m JOIN documents da ON da.doc_id = ida
         |         JOIN documents db ON db.doc_id = idb
         |  GROUP BY 1, 2),
         |edges AS (
         |  SELECT src_a AS u, src_b AS v, CAST(w AS BIGINT) AS w FROM sp WHERE src_a <> src_b
         |  UNION ALL
         |  SELECT src_b AS u, src_a AS v, CAST(w AS BIGINT) AS w FROM sp WHERE src_a <> src_b),
         |nodes AS (SELECT DISTINCT source FROM documents),
         |nn AS (SELECT COUNT(*) AS n FROM nodes),
         |wdeg AS (SELECT u, CAST(SUM(w) AS BIGINT) AS wdeg FROM edges GROUP BY u),
         |basev AS (SELECT CAST((1000000000000 * 15 // 100) // (SELECT n FROM nn) AS BIGINT) AS b),
         |r0 AS (SELECT source, CAST(1000000000000 // (SELECT n FROM nn) AS BIGINT) AS rank_q FROM nodes),
         |$roundCtes
         |SELECT r6.source, r6.rank_q, CAST(COALESCE(d.wdeg, 0) AS BIGINT) AS w_degree
         |FROM r6 LEFT JOIN wdeg d ON d.u = r6.source""".stripMargin
    },
    "q_doc_stats" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(regexp_split_to_array(trim(lower(text)), '[ \t\n\f\r]+'), x -> length(x) > 0) AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(list_reduce(list_prepend(0, list_transform(toks, x -> length(x))), (a, b) -> a + b) AS DOUBLE)
        |    / CAST(NULLIF(len(toks), 0) AS DOUBLE) AS avg_tok_len,
        |  list_reduce(list_prepend(CAST(7 AS BIGINT), list_transform(string_split(text, ''), c -> ascii(c))),
        |    (a, b) -> (a*31 + b) % 1000000007) AS fp
        |FROM t""".stripMargin,
    "q_doc_quality" ->
      s"""WITH ${TextAnalysis.qualityRatiosSql()}
         |SELECT doc_id, stop_ratio, short_ratio,
         |  ${TextAnalysis.qualityScoreSql} AS quality
         |FROM rq""".stripMargin,
    "q_topk_agg" ->
      """WITH agg AS (
        |  SELECT o_custkey,
        |    (list(o_orderkey ORDER BY o_totalprice DESC, o_orderkey))[1:3] AS top_ids
        |  FROM orders GROUP BY o_custkey)
        |SELECT o_custkey,
        |  CAST(generate_subscripts(top_ids, 1) - 1 AS BIGINT) AS rank,
        |  CAST(unnest(top_ids) AS BIGINT) AS orderkey
        |FROM agg""".stripMargin,
    "q_doc_tokens" ->
      s"""SELECT doc_id,
         |  CAST(len(${Dedup.toksSql}) AS BIGINT) AS n_ws_tokens,
         |  CAST(len(regexp_extract_all(text, '${TextAnalysis.BpeTokenRe}')) AS BIGINT) AS n_bpe_tokens,
         |  CASE WHEN len(${Dedup.toksSql}) > 0
         |       THEN CAST(len(regexp_extract_all(text, '${TextAnalysis.BpeTokenRe}')) AS DOUBLE)
         |            / CAST(len(${Dedup.toksSql}) AS DOUBLE) END AS bpe_per_word
         |FROM documents""".stripMargin,
    "q_doc_vocab" ->
      s"""SELECT w, COUNT(*) AS n
         |FROM (SELECT unnest(${Dedup.toksSql}) AS w FROM documents) t
         |GROUP BY w
         |ORDER BY n DESC, w
         |LIMIT 20""".stripMargin,
    "q_doc_sample" ->
      s"""SELECT doc_id, lang, bucket FROM (
         |  SELECT doc_id, lang, (${Dedup.hashSql("text")}) % 1000 AS bucket
         |  FROM documents) t
         |WHERE bucket < ${Curation.keepSql}""".stripMargin,
    "q_doc_neyman" -> Curation.neymanAllocationSql(),
    "q_doc_srcsel" -> Curation.sourceSelectSql(),
    "q_doc_srcselb" -> Curation.sourceSelectBudgetedSql(),
    "q_doc_srcselkmv" -> Curation.sourceSelectKmvSql(),
    "q_doc_srcselkmv_prod" -> Curation.sourceSelectKmvSql(audit = false),
    "q_doc_stratsample" -> Curation.stratifiedNeymanSampleSql(),
    "q_doc_wsample" -> Curation.weightedSampleSql(),
    "q_doc_snapdiff" -> Curation.snapshotDiffSql,
    "q_doc_cms" -> TextAnalysis.cmsAuditSql(),
    "q_doc_hll" -> TextAnalysis.hllCardinalitySql(),
    "q_doc_hllgen" -> TextAnalysis.hllGenGrowthSql(),
    "q_doc_kmv" -> TextAnalysis.kmvOverlapSql(),
    "q_doc_kmvgen" -> TextAnalysis.kmvGenOverlapSql(),
    "q_doc_zipf" -> TextAnalysis.zipfOctavesSql,
    "q_doc_jackknife" -> TextAnalysis.jackknifeMeanSql(),
    "q_doc_pack" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, CAST(len(${Dedup.toksSql}) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, lang, n_tokens,
         |    SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS cum_excl
         |  FROM t)
         |SELECT doc_id, lang, n_tokens,
         |  CAST(cum_excl // 2048 AS BIGINT) AS pack_id,
         |  CAST(cum_excl % 2048 AS BIGINT) AS pack_offset
         |FROM c""".stripMargin,
    "q_doc_packstats" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, CAST(len(${Dedup.toksSql}) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, lang, n_tokens,
         |    SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS cum_excl
         |  FROM t),
         |g AS (
         |  SELECT lang, COUNT(*) AS n_docs,
         |    CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |    CAST(SUM(CASE WHEN CAST(cum_excl % 2048 AS BIGINT) + n_tokens > 2048
         |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_split
         |  FROM c GROUP BY lang),
         |g2 AS (SELECT *, (total_tokens + 2047) // 2048 AS n_packs FROM g)
         |SELECT lang, n_docs, total_tokens, n_packs,
         |  CAST(total_tokens AS DOUBLE) / CAST(n_packs * 2048 AS DOUBLE) AS util,
         |  n_split * 1000 // n_docs AS split_permille
         |FROM g2""".stripMargin,
    "q_doc_bloom" -> TextAnalysis.bloomDecontamSql(),
    "q_doc_decontam" ->
      s"""WITH ttok AS (
         |  SELECT DISTINCT doc_id, h FROM (
         |    SELECT doc_id, ${Dedup.shingleUnnestSql} AS h
         |    FROM (SELECT doc_id, ${Dedup.toksSql} AS toks
         |          FROM documents WHERE doc_id % 50 <> 0))),
         |etok AS (
         |  SELECT DISTINCT h FROM (
         |    SELECT ${Dedup.shingleUnnestSql} AS h
         |    FROM (SELECT ${Dedup.toksSql} AS toks
         |          FROM documents WHERE doc_id % 50 = 0)))
         |SELECT DISTINCT doc_id FROM ttok JOIN etok USING (h)""".stripMargin,
    "q_doc_contamfrac" ->
      s"""WITH ttok AS (
         |  SELECT DISTINCT doc_id, h FROM (
         |    SELECT doc_id, ${Dedup.shingleUnnestSql} AS h
         |    FROM (SELECT doc_id, ${Dedup.toksSql} AS toks
         |          FROM documents WHERE doc_id % 50 <> 0))),
         |etok AS (
         |  SELECT DISTINCT h FROM (
         |    SELECT ${Dedup.shingleUnnestSql} AS h
         |    FROM (SELECT ${Dedup.toksSql} AS toks
         |          FROM documents WHERE doc_id % 50 = 0)))
         |SELECT t.doc_id, COUNT(*) AS n_shingles, COUNT(e.h) AS n_hit,
         |  CAST(COUNT(e.h) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS contam_frac,
         |  CAST(COUNT(e.h) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) >= 0.5 AS flagged
         |FROM ttok t LEFT JOIN etok e ON t.h = e.h
         |GROUP BY t.doc_id""".stripMargin,
    "q_doc_repetition" ->
      s"""SELECT doc_id,
         |  COUNT(*) AS n_shingles,
         |  COUNT(DISTINCT h) AS n_distinct,
         |  1.0 - CAST(COUNT(DISTINCT h) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS rep_ratio
         |FROM (
         |  SELECT doc_id, ${Dedup.shingleUnnestSql} AS h
         |  FROM (SELECT doc_id, ${Dedup.toksSql} AS toks FROM documents))
         |GROUP BY doc_id""".stripMargin,
    "q_doc_chunks" ->
      s"""WITH t AS (SELECT doc_id, ${Dedup.toksSql} AS toks FROM documents),
         |u AS (SELECT doc_id, toks, len(toks) AS nt FROM t WHERE len(toks) > 0),
         |s AS (SELECT doc_id, toks, unnest(range(0, nt, 48)) AS start FROM u)
         |SELECT doc_id,
         |  CAST(start // 48 AS BIGINT) AS chunk_id,
         |  CAST(start AS BIGINT) AS start,
         |  CAST(len(toks[start+1 : start+64]) AS BIGINT) AS n_chunk_tokens,
         |  ${Dedup.hashSql("array_to_string(toks[start+1 : start+64], ' ')")} AS chunk_fp
         |FROM s""".stripMargin,
    "q_doc_redact" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '${Curation.EmailRe}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '${Curation.LongNumRe}')) AS BIGINT) AS n_longnums,
         |  ${Dedup.hashSql(
              s"regexp_replace(regexp_replace(text, '${Curation.EmailRe}', '<email>', 'g'), " +
              s"'${Curation.LongNumRe}', '<num>', 'g')")} AS redacted_fp
         |FROM documents""".stripMargin,
    "q_doc_piirate" -> Curation.piiRateSql(),
    "q_doc_normalize" ->
      s"""SELECT doc_id,
         |  CAST(length(n) AS BIGINT) AS n_chars,
         |  ${Dedup.hashSql("n")} AS norm_fp
         |FROM (
         |  SELECT doc_id,
         |    trim(regexp_replace(lower(nfc_normalize(text)), '[ \\t\\n\\f\\r]+', ' ', 'g')) AS n
         |  FROM documents) t""".stripMargin,
    "q_doc_groupsample" ->
      s"""WITH agg AS (
         |  SELECT lang,
         |    (list(doc_id ORDER BY h ASC, doc_id ASC))[1:4] AS sample_ids
         |  FROM (SELECT lang, doc_id, ${Dedup.hashSql("text")} AS h FROM documents) t
         |  GROUP BY lang)
         |SELECT lang,
         |  CAST(generate_subscripts(sample_ids, 1) - 1 AS BIGINT) AS rank,
         |  CAST(unnest(sample_ids) AS BIGINT) AS doc_id
         |FROM agg""".stripMargin,
    "q_doc_boiler" ->
      s"""WITH sh AS (
         |  SELECT doc_id, ${Dedup.shingleUnnestSql} AS h
         |  FROM (SELECT doc_id, ${Dedup.toksSql} AS toks FROM documents)),
         |boiler AS (
         |  SELECT h FROM (SELECT h, COUNT(DISTINCT doc_id) AS df FROM sh GROUP BY h) t
         |  WHERE df >= 3)
         |SELECT sh.doc_id,
         |  COUNT(*) AS n_shingles,
         |  COUNT(b.h) AS n_boiler,
         |  CAST(COUNT(b.h) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS boiler_ratio
         |FROM sh LEFT JOIN boiler b ON sh.h = b.h
         |GROUP BY sh.doc_id""".stripMargin,
    "q_doc_gopher" ->
      s"""WITH ${TextAnalysis.gopherSqlChain()}
         |SELECT doc_id, n_tokens, avg_tok_len, alpha_frac, stop_hits,
         |  (n_tokens >= 10 AND n_tokens <= 100000) AS r_len,
         |  coalesce(avg_tok_len >= 3.0 AND avg_tok_len <= 10.0, false) AS r_avglen,
         |  coalesce(alpha_frac >= 0.8, false) AS r_alpha,
         |  (stop_hits >= 2) AS r_stop,
         |  ${TextAnalysis.gopherPassCondSql} AS pass
         |FROM g""".stripMargin,
    "q_doc_oov" ->
      s"""WITH tok AS (SELECT doc_id, unnest(${Dedup.toksSql}) AS w FROM documents),
         |v AS (SELECT w FROM (
         |  SELECT w, COUNT(*) AS n FROM tok GROUP BY w
         |  ORDER BY n DESC, w LIMIT 20) t)
         |SELECT tok.doc_id, COUNT(*) AS n_tokens, COUNT(v.w) AS n_invocab,
         |  1.0 - CAST(COUNT(v.w) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS oov_rate
         |FROM tok LEFT JOIN v ON tok.w = v.w
         |GROUP BY tok.doc_id""".stripMargin,
    "q_doc_budget" ->
      s"""WITH ${TextAnalysis.qualityRatiosSql()},
         |q AS (
         |  SELECT rq.doc_id, d.source, ${TextAnalysis.qualityScoreSql} AS quality,
         |    CAST(len(tq.toks) AS BIGINT) AS n_tokens
         |  FROM rq JOIN documents d ON rq.doc_id = d.doc_id
         |       JOIN tq ON tq.doc_id = rq.doc_id
         |  WHERE ${TextAnalysis.qualityScoreSql} IS NOT NULL),
         |c AS (
         |  SELECT doc_id, source, quality, n_tokens,
         |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY quality DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS cum_excl
         |  FROM q)
         |SELECT doc_id, source, quality, n_tokens, CAST(cum_excl AS BIGINT) AS cum_excl
         |FROM c WHERE cum_excl < 800""".stripMargin,
    "q_doc_sourcemix" ->
      s"""WITH per AS (
         |  SELECT source, COUNT(*) AS n_docs,
         |    CAST(SUM(CAST(len(${Dedup.toksSql}) AS BIGINT)) AS BIGINT) AS n_tokens,
         |    CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         |  FROM documents GROUP BY source)
         |SELECT source, n_docs, n_tokens, sum_chars,
         |  CAST(n_docs AS DOUBLE) / CAST((SELECT SUM(n_docs) FROM per) AS DOUBLE) AS doc_share
         |FROM per""".stripMargin,
    "q_doc_domprior" -> Curation.domainPriorSql(),
    "q_doc_kanon" -> Curation.kAnonymizeSql(),
    "q_doc_ldiv" -> Curation.lDiversitySql(),
    "q_doc_srcablate" -> Curation.sourceAblateSql(),
    "q_doc_mixalpha" ->
      s"""WITH per AS (
         |  SELECT source,
         |    CAST(SUM(CAST(len(${Dedup.toksSql}) AS BIGINT)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY source),
         |w AS (
         |  SELECT source, n_tokens,
         |    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS w_alpha
         |  FROM per)
         |SELECT source, n_tokens, w_alpha,
         |  CAST(w_alpha AS DOUBLE)
         |    / CAST((SELECT SUM(w_alpha) FROM w) AS DOUBLE) AS p_sample,
         |  CAST(n_tokens AS DOUBLE)
         |    / CAST((SELECT SUM(n_tokens) FROM w) AS DOUBLE) AS p_natural
         |FROM w""".stripMargin,
    "q_doc_lenbuckets" ->
      s"""WITH nt AS (
         |  SELECT lang, CAST(len(${Dedup.toksSql}) AS BIGINT) AS nt FROM documents),
         |b AS (
         |  SELECT lang, nt,
         |    CASE WHEN nt <= 0 THEN CAST(0 AS BIGINT)
         |         ELSE CAST(length(format('{:b}', nt)) - 1 AS BIGINT) END AS bucket
         |  FROM nt)
         |SELECT lang, bucket,
         |  (CAST(1 AS BIGINT) << CAST(bucket + 1 AS INTEGER)) - 1 AS cap,
         |  COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS sum_tokens,
         |  MIN(nt) AS nt_min, MAX(nt) AS nt_max,
         |  CAST(SUM((CAST(1 AS BIGINT) << CAST(bucket + 1 AS INTEGER)) - 1 - nt)
         |    AS BIGINT) AS pad_waste
         |FROM b GROUP BY 1, 2""".stripMargin,
    "q_doc_sourcecap" ->
      s"""WITH agg AS (
         |  SELECT source,
         |    (list(doc_id ORDER BY h ASC, doc_id ASC))[1:10] AS sample_ids
         |  FROM (SELECT source, doc_id, ${Dedup.hashSql("text")} AS h FROM documents) t
         |  GROUP BY source)
         |SELECT source,
         |  CAST(generate_subscripts(sample_ids, 1) - 1 AS BIGINT) AS rank,
         |  CAST(unnest(sample_ids) AS BIGINT) AS doc_id
         |FROM agg""".stripMargin,
    "q_dedup_clean" ->
      s"""WITH RECURSIVE ${Dedup.corpusSql},
         |${Dedup.tokSql},
         |${Dedup.sigSql},
         |${Dedup.bandsSql},
         |${Dedup.closureSql},
         |${Dedup.cleanSql}
         |SELECT doc_id, lang, ${Dedup.hashSql("text")} AS fp FROM clean""".stripMargin,
    "q_dedup_edit" ->
      s"""WITH ${Dedup.corpusSql},
         |${Dedup.tokSql},
         |${Dedup.sigSql},
         |${Dedup.bandsSql},
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS edit_dist
         |FROM cand
         |JOIN corpus ta ON ta.doc_id = doc_a
         |JOIN corpus tb ON tb.doc_id = doc_b
         |WHERE levenshtein(ta.text, tb.text) <= 64""".stripMargin,
    "q_dedup_report" ->
      s"""WITH RECURSIVE ${Dedup.corpusSql},
         |${Dedup.tokSql},
         |${Dedup.sigSql},
         |${Dedup.bandsSql},
         |${Dedup.closureSql}
         |SELECT c.lang, COUNT(*) AS n_docs, COUNT(comp.id) AS n_clustered,
         |  COUNT(CASE WHEN comp.id <> comp.cluster THEN 1 END) AS n_dropped,
         |  CAST(COUNT(CASE WHEN comp.id <> comp.cluster THEN 1 END) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE) AS drop_rate
         |FROM corpus c LEFT JOIN comp ON comp.id = c.doc_id
         |GROUP BY c.lang""".stripMargin,
    "q_dedup_minsim" ->
      s"""WITH ${Dedup.corpusSql},
         |${Dedup.tokSql},
         |${Dedup.sigSql},
         |${Dedup.bandsSql},
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b,
         |  CAST(${(0 until Dedup.NumHashes).map(i => s"(CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END)").mkString(" + ")} AS DOUBLE)
         |    / CAST(${Dedup.NumHashes} AS DOUBLE) AS est_jaccard
         |FROM cand JOIN sig a ON doc_a = a.doc_id JOIN sig b ON doc_b = b.doc_id""".stripMargin,
    "q_dedup_lshstats" ->
      s"""WITH ${Dedup.corpusSql},
         |${Dedup.tokSql},
         |${Dedup.sigSql},
         |${Dedup.bandsSql},
         |sz AS (SELECT band, bh, COUNT(*) AS bucket_size FROM bands GROUP BY band, bh)
         |SELECT band, bucket_size, COUNT(*) AS n_buckets
         |FROM sz GROUP BY band, bucket_size""".stripMargin,
    "q_dedup_best" ->
      s"""WITH RECURSIVE ${Dedup.corpusSql},
         |${Dedup.tokSql},
         |${Dedup.sigSql},
         |${Dedup.bandsSql},
         |${Dedup.closureSql},
         |${TextAnalysis.qualityRatiosSql("corpus")},
         |qs AS (
         |  SELECT doc_id,
         |    coalesce(${TextAnalysis.qualityScoreSql}, -1000000000.0) AS q
         |  FROM rq),
         |ranked AS (
         |  SELECT comp.id, comp.cluster,
         |    ROW_NUMBER() OVER (PARTITION BY comp.cluster ORDER BY qs.q DESC, comp.id) AS rn
         |  FROM comp JOIN qs ON qs.doc_id = comp.id),
         |drops AS (SELECT id FROM ranked WHERE rn > 1)
         |SELECT c.doc_id, c.lang, ${Dedup.hashSql("text")} AS fp FROM corpus c
         |WHERE NOT EXISTS (SELECT 1 FROM drops WHERE drops.id = c.doc_id)""".stripMargin,
    "q_doc_cdc" ->
      s"""WITH tok AS (
         |  SELECT doc_id, w, i,
         |    CASE WHEN substr(md5(w), 1, 1) IN ('0', '1') THEN 1 ELSE 0 END AS b
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         |               generate_subscripts(string_split(text, ' '), 1) AS i
         |        FROM documents)),
         |cid AS (
         |  SELECT doc_id, w, i,
         |    COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY i
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_ord
         |  FROM tok)
         |SELECT doc_id, CAST(chunk_ord AS BIGINT) AS chunk_ord,
         |  string_agg(w, ' ' ORDER BY i) AS chunk,
         |  COUNT(*) AS n_tokens
         |FROM cid GROUP BY doc_id, chunk_ord""".stripMargin,
    "q_dedup_para" ->
      s"""WITH ${Dedup.corpusSql},
         |${Dedup.paraSql},
         |keep AS (
         |  SELECT doc_id, ord, para FROM (
         |    SELECT doc_id, ord, para,
         |      ROW_NUMBER() OVER (PARTITION BY para ORDER BY doc_id, ord) AS rn
         |    FROM para) WHERE rn = 1)
         |SELECT doc_id, string_agg(para, ' ' ORDER BY ord) AS text_kept,
         |  COUNT(*) AS n_paras
         |FROM keep GROUP BY doc_id""".stripMargin,
    "q_dedup_spanrm" ->
      s"""WITH ${Dedup.corpusSql},
         |${Dedup.paraSql},
         |keyed AS (
         |  SELECT doc_id, ord, para, (doc_id << 20) + ord AS key FROM para),
         |keep AS (SELECT para, MIN(key) AS k FROM keyed GROUP BY para)
         |SELECT doc_id, COUNT(*) AS n_blocks,
         |  count(CASE WHEN key <> k THEN 1 END) AS n_removed,
         |  CAST(SUM(CASE WHEN key = k THEN len(string_split(para, ' ')) ELSE 0 END)
         |    AS BIGINT) AS kept_tokens,
         |  CAST(count(CASE WHEN key <> k THEN 1 END) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE) AS removed_frac
         |FROM keyed JOIN keep USING (para) GROUP BY doc_id""".stripMargin,
    "q_dedup_rspans" ->
      s"""WITH ${Dedup.corpusSql},
         |${Dedup.repeatedSpansSql}""".stripMargin,
    "q_dedup_substr" ->
      s"""WITH ${Dedup.corpusSql},
         |${Dedup.exactSubstrSql()}""".stripMargin,
    "q_dedup_substrrm" ->
      s"""WITH ${Dedup.corpusSql},
         |${Dedup.exactSubstrReportSql()}""".stripMargin,
    "q_dedup_cross" ->
      s"""WITH ${Dedup.corpusSql},
         |newdocs AS (SELECT doc_id, lang, text FROM corpus WHERE doc_id >= 1000000),
         |${Dedup.tokSqlFor("newdocs", "tokn")},
         |${Dedup.tokSqlFor("documents", "tokr")},
         |${Dedup.sigSqlFor("tokn", "sign")},
         |${Dedup.sigSqlFor("tokr", "sigr")},
         |${Dedup.bandsSqlFor("sign", "bandsn")},
         |${Dedup.bandsSqlFor("sigr", "bandsr")},
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_new, b.doc_id AS doc_ref
         |  FROM bandsn a JOIN bandsr b ON a.band = b.band AND a.bh = b.bh),
         |inter AS (
         |  SELECT c.doc_new, c.doc_ref, COUNT(*) AS ni
         |  FROM cand c
         |  JOIN tokn tn ON tn.doc_id = c.doc_new
         |  JOIN tokr tr ON tr.doc_id = c.doc_ref AND tr.h = tn.h
         |  GROUP BY 1, 2),
         |szn AS (SELECT doc_id, COUNT(*) AS na FROM tokn GROUP BY doc_id),
         |szr AS (SELECT doc_id, COUNT(*) AS nb FROM tokr GROUP BY doc_id)
         |SELECT i.doc_new, i.doc_ref,
         |  CAST(i.ni AS DOUBLE) / CAST(n.na + r.nb - i.ni AS DOUBLE) AS jaccard
         |FROM inter i
         |JOIN szn n ON n.doc_id = i.doc_new
         |JOIN szr r ON r.doc_id = i.doc_ref
         |WHERE CAST(i.ni AS DOUBLE) / CAST(n.na + r.nb - i.ni AS DOUBLE) >= 0.5""".stripMargin,
    "q_pipeline_e2e" ->
      s"""WITH RECURSIVE ${Dedup.corpusSql},
         |${Dedup.tokSql},
         |${Dedup.sigSql},
         |${Dedup.bandsSql},
         |${Dedup.closureSql},
         |${Dedup.cleanSql},
         |${TextAnalysis.qualityRatiosSql("clean")},
         |qual AS (
         |  SELECT rq.doc_id, d.lang,
         |    ${TextAnalysis.qualityScoreSql} AS quality
         |  FROM rq JOIN clean d ON rq.doc_id = d.doc_id
         |  WHERE ${TextAnalysis.qualityScoreSql} IS NOT NULL),
         |qth AS (
         |  SELECT lang, quantile_cont(quality, 0.1) AS q_thresh
         |  FROM qual GROUP BY lang),
         |gated AS (
         |  SELECT qual.doc_id FROM qual JOIN qth ON qual.lang = qth.lang
         |  WHERE qual.quality >= qth.q_thresh),
         |sampled AS (
         |  SELECT c.doc_id, c.lang, c.text
         |  FROM clean c JOIN gated g ON c.doc_id = g.doc_id
         |  WHERE (${Dedup.hashSql("c.text")}) % 1000 < ${Curation.keepSql}),
         |toked AS (
         |  SELECT doc_id, lang, CAST(len(${Dedup.toksSql}) AS BIGINT) AS n_tokens
         |  FROM sampled),
         |cum AS (
         |  SELECT doc_id, lang, n_tokens,
         |    SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS cum_excl
         |  FROM toked)
         |SELECT doc_id, lang, n_tokens,
         |  CAST(cum_excl // 2048 AS BIGINT) AS pack_id,
         |  CAST(cum_excl % 2048 AS BIGINT) AS pack_offset
         |FROM cum""".stripMargin,
    "q_pipeline_delete" ->
      s"""WITH RECURSIVE ${Dedup.corpusSql},
         |cdel AS (SELECT * FROM corpus WHERE doc_id % 30 <> 0),
         |${Dedup.tokSqlFor("cdel", "tok")},
         |${Dedup.sigSql},
         |${Dedup.bandsSql},
         |${Dedup.closureSql},
         |clean AS (
         |  SELECT c.doc_id, c.lang, c.text FROM cdel c
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM comp WHERE comp.id = c.doc_id AND comp.id <> comp.cluster)),
         |${TextAnalysis.qualityRatiosSql("clean")},
         |qual AS (
         |  SELECT rq.doc_id, d.lang,
         |    ${TextAnalysis.qualityScoreSql} AS quality
         |  FROM rq JOIN clean d ON rq.doc_id = d.doc_id
         |  WHERE ${TextAnalysis.qualityScoreSql} IS NOT NULL),
         |qth AS (
         |  SELECT lang, quantile_cont(quality, 0.1) AS q_thresh
         |  FROM qual GROUP BY lang),
         |gated AS (
         |  SELECT qual.doc_id FROM qual JOIN qth ON qual.lang = qth.lang
         |  WHERE qual.quality >= qth.q_thresh),
         |sampled AS (
         |  SELECT c.doc_id, c.lang, c.text
         |  FROM clean c JOIN gated g ON c.doc_id = g.doc_id
         |  WHERE (${Dedup.hashSql("c.text")}) % 1000 < ${Curation.keepSql}),
         |toked AS (
         |  SELECT doc_id, lang, CAST(len(${Dedup.toksSql}) AS BIGINT) AS n_tokens
         |  FROM sampled),
         |cum AS (
         |  SELECT doc_id, lang, n_tokens,
         |    SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS cum_excl
         |  FROM toked)
         |SELECT doc_id, lang, n_tokens,
         |  CAST(cum_excl // 2048 AS BIGINT) AS pack_id,
         |  CAST(cum_excl % 2048 AS BIGINT) AS pack_offset
         |FROM cum""".stripMargin,
    "q_pipeline_crawl" ->
      s"""WITH RECURSIVE ${Dedup.corpusSql},
         |cfin AS (
         |  SELECT * FROM corpus
         |  WHERE (doc_id < 2000000 AND doc_id % 30 <> 0) OR doc_id >= 2000000),
         |${Dedup.tokSqlFor("cfin", "tok")},
         |${Dedup.sigSql},
         |${Dedup.bandsSql},
         |${Dedup.closureSql},
         |clean AS (
         |  SELECT c.doc_id, c.lang, c.text FROM cfin c
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM comp WHERE comp.id = c.doc_id AND comp.id <> comp.cluster)),
         |${TextAnalysis.qualityRatiosSql("clean")},
         |qual AS (
         |  SELECT rq.doc_id, d.lang,
         |    ${TextAnalysis.qualityScoreSql} AS quality
         |  FROM rq JOIN clean d ON rq.doc_id = d.doc_id
         |  WHERE ${TextAnalysis.qualityScoreSql} IS NOT NULL),
         |qth AS (
         |  SELECT lang, quantile_cont(quality, 0.1) AS q_thresh
         |  FROM qual GROUP BY lang),
         |gated AS (
         |  SELECT qual.doc_id FROM qual JOIN qth ON qual.lang = qth.lang
         |  WHERE qual.quality >= qth.q_thresh),
         |sampled AS (
         |  SELECT c.doc_id, c.lang, c.text
         |  FROM clean c JOIN gated g ON c.doc_id = g.doc_id
         |  WHERE (${Dedup.hashSql("c.text")}) % 1000 < ${Curation.keepSql}),
         |toked AS (
         |  SELECT doc_id, lang, CAST(len(${Dedup.toksSql}) AS BIGINT) AS n_tokens
         |  FROM sampled),
         |cum AS (
         |  SELECT doc_id, lang, n_tokens,
         |    SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS cum_excl
         |  FROM toked)
         |SELECT doc_id, lang, n_tokens,
         |  CAST(cum_excl // 2048 AS BIGINT) AS pack_id,
         |  CAST(cum_excl % 2048 AS BIGINT) AS pack_offset
         |FROM cum""".stripMargin,
    "q_pipeline_qclf" ->
      s"""WITH RECURSIVE ${Dedup.corpusSql},
         |${Dedup.tokSql},
         |${Dedup.sigSql},
         |${Dedup.bandsSql},
         |${Dedup.closureSql},
         |${Dedup.cleanSql},
         |${Classifier.featSqlCtes()},
         |${Classifier.fitSqlCtes()},
         |${Classifier.applyGateCtes("clean")},
         |sampled AS (
         |  SELECT c.doc_id, c.lang, c.text
         |  FROM clean c JOIN akept g ON c.doc_id = g.doc_id
         |  WHERE (${Dedup.hashSql("c.text")}) % 1000 < ${Curation.keepSql}),
         |toked AS (
         |  SELECT doc_id, lang, CAST(len(${Dedup.toksSql}) AS BIGINT) AS n_tokens
         |  FROM sampled),
         |cum AS (
         |  SELECT doc_id, lang, n_tokens,
         |    SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS cum_excl
         |  FROM toked)
         |SELECT doc_id, lang, n_tokens,
         |  CAST(cum_excl // 2048 AS BIGINT) AS pack_id,
         |  CAST(cum_excl % 2048 AS BIGINT) AS pack_offset
         |FROM cum""".stripMargin,
    "q_doc_qfilter" ->
      s"""WITH ${TextAnalysis.qualityRatiosSql()},
         |q AS (
         |  SELECT rq.doc_id, d.lang,
         |    ${TextAnalysis.qualityScoreSql} AS quality
         |  FROM rq JOIN documents d ON rq.doc_id = d.doc_id
         |  WHERE ${TextAnalysis.qualityScoreSql} IS NOT NULL),
         |th AS (
         |  SELECT lang, quantile_cont(quality, 0.1) AS q_thresh
         |  FROM q GROUP BY lang)
         |SELECT q.doc_id, q.lang, q.quality, th.q_thresh
         |FROM q JOIN th ON q.lang = th.lang
         |WHERE q.quality >= th.q_thresh""".stripMargin,
    "q_doc_qthresh" ->
      s"""WITH ${TextAnalysis.qualityRatiosSql()},
         |q AS (
         |  SELECT rq.doc_id, d.lang,
         |    ${TextAnalysis.qualityScoreSql} AS quality
         |  FROM rq JOIN documents d ON rq.doc_id = d.doc_id
         |  WHERE ${TextAnalysis.qualityScoreSql} IS NOT NULL)
         |SELECT lang, quantile_cont(quality, 0.1) AS q_thresh
         |FROM q GROUP BY lang""".stripMargin,
    "q_doc_leak" ->
      s"""WITH sp AS (
         |  SELECT doc_id, (${Dedup.hashSql("text")}) % 1000 AS bucket, text
         |  FROM documents),
         |ttok AS (
         |  SELECT DISTINCT doc_id, h FROM (
         |    SELECT doc_id, ${Dedup.shingleUnnestSql} AS h
         |    FROM (SELECT doc_id, ${Dedup.toksSql} AS toks
         |          FROM sp WHERE bucket < 980))),
         |etok AS (
         |  SELECT DISTINCT h FROM (
         |    SELECT ${Dedup.shingleUnnestSql} AS h
         |    FROM (SELECT ${Dedup.toksSql} AS toks
         |          FROM sp WHERE bucket >= 990)))
         |SELECT DISTINCT doc_id FROM ttok JOIN etok USING (h)""".stripMargin,
    "q_doc_split" ->
      s"""SELECT doc_id, lang, bucket,
         |  CASE WHEN bucket < 980 THEN 'train'
         |       WHEN bucket < 990 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM (SELECT doc_id, lang, (${Dedup.hashSql("text")}) % 1000 AS bucket
         |      FROM documents) t""".stripMargin,
    "q_doc_eshuffle" -> Curation.epochShuffleSql(),
    "q_doc_eshuffle64" -> Curation.epochShuffleSql(nShards = 64),
    "q_doc_splitsafe" ->
      s"""WITH RECURSIVE ${Dedup.corpusSql},
         |${Dedup.tokSql},
         |${Dedup.sigSql},
         |${Dedup.bandsSql},
         |${Dedup.closureSql},
         |anch AS (
         |  SELECT c.doc_id, c.lang, COALESCE(comp.cluster, c.doc_id) AS anchor
         |  FROM corpus c LEFT JOIN comp ON comp.id = c.doc_id)
         |SELECT a.doc_id, a.lang, a.anchor, bucket,
         |  CASE WHEN bucket < 980 THEN 'train'
         |       WHEN bucket < 990 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM (SELECT a.doc_id, a.lang, a.anchor,
         |        (${Dedup.hashSql("t.text")}) % 1000 AS bucket
         |      FROM anch a JOIN corpus t ON t.doc_id = a.anchor) a""".stripMargin,
    "q_doc_splitbal" -> Curation.splitBalanceSql(),
    "q_doc_qcorr" -> Curation.qualityLengthCorrSql,
    "q_doc_qhist" ->
      s"""WITH ${TextAnalysis.qualityRatiosSql()},
         |q AS (
         |  SELECT rq.doc_id, d.lang,
         |    ${TextAnalysis.qualityScoreSql} AS quality
         |  FROM rq JOIN documents d ON rq.doc_id = d.doc_id
         |  WHERE ${TextAnalysis.qualityScoreSql} IS NOT NULL)
         |SELECT lang,
         |  CAST(greatest(least(floor(quality * 20), 19.0), 0.0) AS BIGINT) AS bin,
         |  COUNT(*) AS n, min(quality) AS q_min, max(quality) AS q_max
         |FROM q GROUP BY 1, 2""".stripMargin,
    "q_doc_diversity" ->
      s"""WITH sh AS (
         |  SELECT source, ${Dedup.shingleUnnestSql} AS h
         |  FROM (SELECT source, ${Dedup.toksSql} AS toks FROM documents))
         |SELECT source, COUNT(*) AS n_shingles, COUNT(DISTINCT h) AS n_distinct,
         |  CAST(COUNT(DISTINCT h) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS diversity
         |FROM sh GROUP BY source""".stripMargin,
    "q_doc_qcdf" ->
      s"""WITH ${TextAnalysis.qualityRatiosSql()},
         |q AS (
         |  SELECT rq.doc_id, d.source,
         |    ${TextAnalysis.qualityScoreSql} AS quality
         |  FROM rq JOIN documents d ON rq.doc_id = d.doc_id
         |  WHERE ${TextAnalysis.qualityScoreSql} IS NOT NULL),
         |b AS (
         |  SELECT doc_id, source, quality,
         |    CAST(greatest(least(floor(quality * 64), 63.0), 0.0) AS BIGINT) AS bin
         |  FROM q),
         |hist AS (SELECT source, bin, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
         |cum AS (
         |  SELECT source, bin, cnt,
         |    COALESCE(SUM(cnt) OVER (PARTITION BY source ORDER BY bin
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
         |    SUM(cnt) OVER (PARTITION BY source) AS n_src
         |  FROM hist)
         |SELECT b.doc_id, b.source, b.quality,
         |  (CAST(c.below AS DOUBLE) + 0.5 * CAST(c.cnt AS DOUBLE))
         |    / CAST(c.n_src AS DOUBLE) AS q_cdf
         |FROM b JOIN cum c ON b.source = c.source AND b.bin = c.bin""".stripMargin,
    "q_doc_langid" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    list_filter(regexp_split_to_array(trim(lower(text)), '[ \t\n\f\r]+'), x -> length(x) > 0) AS toks
        |  FROM documents),
        |sc AS (
        |  SELECT doc_id, lang,
        |    CAST(len(list_filter(toks, x -> x='the' OR x='a' OR x='of')) AS BIGINT) AS s_en,
        |    CAST(len(list_filter(toks, x -> x='der' OR x='die' OR x='und')) AS BIGINT) AS s_de,
        |    CAST(len(list_filter(toks, x -> x='le' OR x='la' OR x='et')) AS BIGINT) AS s_fr,
        |    CAST(len(list_filter(toks, x -> x='el' OR x='los' OR x='y')) AS BIGINT) AS s_es
        |  FROM t)
        |SELECT doc_id, s_en, s_de, s_fr, s_es,
        |  CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
        |       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
        |       WHEN s_fr >= s_es THEN 'fr'
        |       ELSE 'es' END AS pred_lang,
        |  (CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
        |        WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
        |        WHEN s_fr >= s_es THEN 'fr'
        |        ELSE 'es' END) = lang AS matches_label
        |FROM sc""".stripMargin,
    "q_doc_langconf" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    list_filter(regexp_split_to_array(trim(lower(text)), '[ \t\n\f\r]+'), x -> length(x) > 0) AS toks
        |  FROM documents),
        |sc AS (
        |  SELECT doc_id, lang,
        |    CAST(len(list_filter(toks, x -> x='the' OR x='a' OR x='of')) AS BIGINT) AS s_en,
        |    CAST(len(list_filter(toks, x -> x='der' OR x='die' OR x='und')) AS BIGINT) AS s_de,
        |    CAST(len(list_filter(toks, x -> x='le' OR x='la' OR x='et')) AS BIGINT) AS s_fr,
        |    CAST(len(list_filter(toks, x -> x='el' OR x='los' OR x='y')) AS BIGINT) AS s_es
        |  FROM t),
        |pr AS (
        |  SELECT lang,
        |    CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
        |         WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
        |         WHEN s_fr >= s_es THEN 'fr'
        |         ELSE 'es' END AS pred_lang
        |  FROM sc),
        |m AS (SELECT lang, pred_lang, COUNT(*) AS n_docs FROM pr GROUP BY lang, pred_lang),
        |tot AS (SELECT lang, CAST(SUM(n_docs) AS BIGINT) AS lang_total FROM m GROUP BY lang)
        |SELECT m.lang, pred_lang, n_docs, lang_total,
        |  n_docs * 1000 // lang_total AS row_permille
        |FROM m JOIN tot ON m.lang = tot.lang""".stripMargin,
    "q_ev_tumbling" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ets, event_type, value FROM events)
        |SELECT strftime(to_timestamp(CAST(floor(epoch(ets)/3600) AS BIGINT)*3600), '%Y-%m-%d %H:%M:%S.%f') AS w_start,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM e GROUP BY 1, 2""".stripMargin,
    "q_ev_topusers" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ets, user_id, value FROM events),
        |per AS (
        |  SELECT to_timestamp(CAST(floor(epoch(ets)/3600) AS BIGINT)*3600) AS w_start,
        |    user_id,
        |    CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS uval
        |  FROM e GROUP BY 1, 2),
        |agg AS (
        |  SELECT w_start, (list(user_id ORDER BY uval DESC, user_id))[1:3] AS top
        |  FROM per GROUP BY w_start)
        |SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S.%f') AS w_start,
        |  CAST(generate_subscripts(top, 1) - 1 AS BIGINT) AS rank,
        |  CAST(unnest(top) AS BIGINT) AS user_id
        |FROM agg""".stripMargin,
    "q_ev_sliding" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ets, event_type FROM events),
        |x AS (
        |  SELECT to_timestamp((CAST(floor(epoch(ets)/1800) AS BIGINT) - n) * 1800) AS w_start, event_type
        |  FROM e, UNNEST([0, 1]) AS t(n)
        |)
        |SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S.%f') AS w_start, event_type, COUNT(*) AS n
        |FROM x GROUP BY 1, 2""".stripMargin,
    "q_ev_session" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ets, value FROM events),
        |s AS (
        |  SELECT user_id, ets, value,
        |    CASE WHEN lag(ets) OVER (PARTITION BY user_id ORDER BY ets) IS NULL
        |           OR ets - lag(ets) OVER (PARTITION BY user_id ORDER BY ets) >= INTERVAL 4 HOUR
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM e
        |),
        |g AS (
        |  SELECT user_id, ets, value,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ets ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM s
        |)
        |SELECT strftime(MIN(ets), '%Y-%m-%d %H:%M:%S.%f') AS s_start,
        |  strftime(MAX(ets) + INTERVAL 4 HOUR, '%Y-%m-%d %H:%M:%S.%f') AS s_end,
        |  user_id, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM g GROUP BY user_id, sid""".stripMargin,
    "q_ev_dedup" ->
      """SELECT user_id, event_type, event_id,
        |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS first_ts
        |FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        |  FROM events) t
        |WHERE rn = 1""".stripMargin,
    "q_ev_anomaly" ->
      """WITH e AS (
        |  SELECT event_id, user_id, CAST(value AS DECIMAL(12,2)) AS v FROM events),
        |st AS (
        |  SELECT user_id, COUNT(*) AS n,
        |    CAST(SUM(v) AS DOUBLE) AS s1,
        |    CAST(SUM(v * v) AS DOUBLE) AS s2
        |  FROM e GROUP BY user_id HAVING COUNT(*) >= 2),
        |ms AS (
        |  SELECT user_id, n,
        |    s1 / CAST(n AS DOUBLE) AS mean,
        |    sqrt((s2 - s1 * s1 / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)) AS sd
        |  FROM st)
        |SELECT e.event_id, e.user_id, CAST(e.v AS DOUBLE) AS value, ms.mean, ms.sd,
        |  (abs(CAST(e.v AS DOUBLE) - ms.mean) > ms.sd * 2.0) AS flagged
        |FROM e JOIN ms ON e.user_id = ms.user_id""".stripMargin,
    "q_ev_ewma" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        |h AS (SELECT MAX(d) AS hd FROM e),
        |w AS (
        |  SELECT user_id, d,
        |    CASE WHEN date_diff('day', d, (SELECT hd FROM h)) <= 50
        |         THEN CAST(1 AS BIGINT)
        |           << CAST(50 - date_diff('day', d, (SELECT hd FROM h)) AS INTEGER)
        |         ELSE CAST(0 AS BIGINT) END AS wt
        |  FROM e)
        |SELECT user_id, COUNT(*) AS n_events, MAX(d) AS last_day,
        |  CAST(SUM(CAST(wt AS DECIMAL(38,0))) AS BIGINT) AS ewma_q50
        |FROM w GROUP BY user_id""".stripMargin,
    "q_doc_ffreq" ->
      s"""WITH tok AS (SELECT unnest(${Dedup.toksSql}) AS w FROM documents),
         |wf AS (SELECT w, COUNT(*) AS f FROM tok GROUP BY w)
         |SELECT f, COUNT(*) AS n_words FROM wf GROUP BY f""".stripMargin,
    "q_doc_topngrams" ->
      s"""WITH tk AS (SELECT lang, ${Dedup.toksSql} AS toks FROM documents),
         |bgs AS (
         |  SELECT lang, unnest(list_transform(range(1, len(toks)), i ->
         |    toks[i] || ' ' || toks[i+1])) AS bg
         |  FROM tk),
         |c AS (
         |  SELECT lang, bg, COUNT(*) AS cnt, ${Dedup.hashSql("bg")} AS bh
         |  FROM bgs GROUP BY 1, 2),
         |r AS (
         |  SELECT lang, bg, cnt, bh,
         |    row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, bh ASC) AS rn
         |  FROM c)
         |SELECT lang, rn - 1 AS rnk, bg AS bigram, cnt FROM r WHERE rn <= 5""".stripMargin,
    "q_doc_drift" ->
      s"""WITH tok AS (
         |  SELECT source, unnest(${Dedup.toksSql}) AS w FROM documents),
         |sw AS (SELECT source, w, COUNT(*) AS ca FROM tok GROUP BY 1, 2),
         |tw AS (SELECT w, SUM(ca) AS ct FROM sw GROUP BY 1),
         |ns AS (SELECT source, SUM(ca) AS na FROM sw GROUP BY 1),
         |nt AS (SELECT SUM(na) AS ntot FROM ns),
         |j AS (
         |  SELECT sw.source, ns.na, nt.ntot - ns.na AS nb, sw.ca,
         |    tw.ct - sw.ca AS cb
         |  FROM sw JOIN tw USING (w) JOIN ns USING (source) CROSS JOIN nt),
         |g AS (
         |  SELECT source, na, nb,
         |    SUM(abs(CAST(ca AS HUGEINT) * CAST(nb AS HUGEINT)
         |      - CAST(cb AS HUGEINT) * CAST(na AS HUGEINT))) AS present_sum,
         |    SUM(cb) AS cb_present
         |  FROM j GROUP BY 1, 2, 3)
         |SELECT source, CAST(na AS BIGINT) AS n_src, CAST(nb AS BIGINT) AS n_rest,
         |  CAST(present_sum
         |    + CAST(nb - cb_present AS HUGEINT) * CAST(na AS HUGEINT) AS DOUBLE)
         |    / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) * 2.0) AS tvd
         |FROM g""".stripMargin,
    "q_doc_surprisal" ->
      s"""WITH tk AS (SELECT doc_id, ${Dedup.toksSql} AS toks FROM documents),
         |bgs AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, len(toks)), i ->
         |      {'w': toks[i], 'bg': toks[i] || ' ' || toks[i+1]}), recursive := true)
         |  FROM tk),
         |uni AS (
         |  SELECT w, COUNT(*) AS cw
         |  FROM (SELECT unnest(toks) AS w FROM tk) GROUP BY w),
         |bc AS (SELECT bg, COUNT(*) AS cb FROM bgs GROUP BY bg)
         |SELECT doc_id, COUNT(*) AS n_bigrams,
         |  CAST(SUM(length(bin(cw)) - length(bin(cb))) AS BIGINT) AS total_surprisal,
         |  CAST(CAST(SUM(length(bin(cw)) - length(bin(cb))) AS BIGINT) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE) AS mean_surprisal
         |FROM bgs JOIN bc USING (bg) JOIN uni USING (w)
         |GROUP BY doc_id""".stripMargin,
    "q_doc_colloc" ->
      s"""WITH tk AS (SELECT doc_id, ${Dedup.toksSql} AS toks FROM documents),
         |uni AS (
         |  SELECT w, COUNT(*) AS c
         |  FROM (SELECT unnest(toks) AS w FROM tk) GROUP BY w),
         |nt AS (SELECT COUNT(*) AS n FROM (SELECT unnest(toks) FROM tk)),
         |bg AS (
         |  SELECT w1, w2, COUNT(*) AS cab FROM (
         |    SELECT doc_id,
         |      unnest(list_transform(range(1, len(toks)), i ->
         |        {'w1': toks[i], 'w2': toks[i+1]}), recursive := true)
         |    FROM tk)
         |  GROUP BY w1, w2 HAVING COUNT(*) >= 5)
         |SELECT w1, w2, cab,
         |  CAST(CAST(nt.n AS HUGEINT) * cab AS DOUBLE)
         |    / CAST(CAST(u1.c AS HUGEINT) * u2.c AS DOUBLE) AS pmi_ratio
         |FROM bg JOIN uni u1 ON bg.w1 = u1.w JOIN uni u2 ON bg.w2 = u2.w
         |CROSS JOIN nt
         |ORDER BY pmi_ratio DESC, w1, w2 LIMIT 25""".stripMargin,
    "q_doc_bpe" -> TextAnalysis.bpeSql(),
    "q_doc_heavy" -> TextAnalysis.heavyHittersSql(),
    "q_doc_qclf" -> Classifier.fitSql(),
    "q_doc_qclf_score" -> Classifier.scoreSql(),
    "q_doc_qclf_pr" -> Classifier.prCurveSql(),
    "q_doc_qclf_auc" -> Classifier.rocAucSql(),
    "q_doc_qclf_cal" -> Classifier.calibrationSql(),
    "q_doc_qclf_conf" -> Classifier.conformalGateSql(),
    "q_doc_langclf" -> Classifier.langClfSql(),
    "q_doc_langclf3" -> Classifier.langClfSql(trigram = true),
    "q_doc_qclf_bysrc" -> Classifier.scoreBySourceSql(),
    "q_doc_bpe_encode" -> TextAnalysis.bpeSegmentSql(),
    "q_doc_unigram" -> Unigram.unigramVocabSql(),
    "q_doc_unigram_soft" -> Unigram.unigramVocabSoftSql(),
    "q_doc_unigram_soft2" -> Unigram.unigramVocabSoftSql(softRounds = 2),
    "q_doc_unigram_soft3" -> Unigram.unigramVocabSoftSql(softRounds = 3),
    "q_doc_unigram_softin" -> Unigram.unigramSoftEdgesSql(),
    "q_doc_unigram_encode" -> Unigram.unigramEncodeSql(),
    "q_doc_unigram_fertlang" -> Unigram.unigramFertilityByLangSql(),
    "q_doc_unipack" ->
      s"""WITH RECURSIVE ${Unigram.unigramCtes()},
         |dict AS (SELECT word, CAST(len(string_split(seg, ' ')) AS INT) AS n_sub
         |  FROM seg${Unigram.EmRounds + 1}),
         |btk AS (
         |  SELECT doc_id, unnest(toks) AS word
         |  FROM (SELECT doc_id, ${Dedup.toksSql} AS toks FROM documents) t0),
         |bcnt AS (
         |  SELECT doc_id,
         |    CAST(SUM(COALESCE(n_sub, length(word))) AS BIGINT) AS n_tokens
         |  FROM btk LEFT JOIN dict USING (word)
         |  GROUP BY doc_id),
         |bj AS (
         |  SELECT b.doc_id, d.lang, b.n_tokens
         |  FROM bcnt b JOIN documents d ON d.doc_id = b.doc_id),
         |bc AS (
         |  SELECT doc_id, lang, n_tokens,
         |    SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS cum_excl
         |  FROM bj)
         |SELECT doc_id, lang, n_tokens,
         |  CAST(cum_excl // 2048 AS BIGINT) AS pack_id,
         |  CAST(cum_excl % 2048 AS BIGINT) AS pack_offset
         |FROM bc""".stripMargin,
    "q_doc_unipackstats" ->
      s"""WITH RECURSIVE ${Unigram.unigramCtes()},
         |dict AS (SELECT word, CAST(len(string_split(seg, ' ')) AS INT) AS n_sub
         |  FROM seg${Unigram.EmRounds + 1}),
         |btk AS (
         |  SELECT doc_id, unnest(toks) AS word
         |  FROM (SELECT doc_id, ${Dedup.toksSql} AS toks FROM documents) t0),
         |bcnt AS (
         |  SELECT doc_id,
         |    CAST(SUM(COALESCE(n_sub, length(word))) AS BIGINT) AS n_tokens
         |  FROM btk LEFT JOIN dict USING (word)
         |  GROUP BY doc_id),
         |bj AS (
         |  SELECT b.doc_id, d.lang, b.n_tokens
         |  FROM bcnt b JOIN documents d ON d.doc_id = b.doc_id),
         |bc AS (
         |  SELECT doc_id, lang, n_tokens,
         |    SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS cum_excl
         |  FROM bj),
         |bg AS (
         |  SELECT lang, COUNT(*) AS n_docs,
         |    CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |    CAST(SUM(CASE WHEN CAST(cum_excl % 2048 AS BIGINT) + n_tokens > 2048
         |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_split
         |  FROM bc GROUP BY lang),
         |bg2 AS (SELECT *, (total_tokens + 2047) // 2048 AS n_packs FROM bg)
         |SELECT lang, n_docs, total_tokens, n_packs,
         |  CAST(total_tokens AS DOUBLE) / CAST(n_packs * 2048 AS DOUBLE) AS util,
         |  n_split * 1000 // n_docs AS split_permille
         |FROM bg2""".stripMargin,
    "q_doc_fertlang" -> TextAnalysis.fertilityByLangSql(),
    "q_doc_bpepack" ->
      s"""WITH ${TextAnalysis.bpeCtes()},
         |dict AS (SELECT word, len(syms) AS n_sub FROM w8),
         |btk AS (
         |  SELECT doc_id, unnest(toks) AS word
         |  FROM (SELECT doc_id, ${Dedup.toksSql} AS toks FROM documents)),
         |bcnt AS (
         |  SELECT doc_id,
         |    CAST(SUM(COALESCE(n_sub, length(word) + 1)) AS BIGINT) AS n_tokens
         |  FROM btk LEFT JOIN dict USING (word)
         |  GROUP BY doc_id),
         |bj AS (
         |  SELECT b.doc_id, d.lang, b.n_tokens
         |  FROM bcnt b JOIN documents d ON d.doc_id = b.doc_id),
         |bc AS (
         |  SELECT doc_id, lang, n_tokens,
         |    SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS cum_excl
         |  FROM bj)
         |SELECT doc_id, lang, n_tokens,
         |  CAST(cum_excl // 2048 AS BIGINT) AS pack_id,
         |  CAST(cum_excl % 2048 AS BIGINT) AS pack_offset
         |FROM bc""".stripMargin,
    "q_doc_fim" -> Curation.fimSplitsSql,
    "q_doc_spancorrupt" -> Curation.spanCorruptionSql,
    "q_doc_bpepackstats" ->
      s"""WITH ${TextAnalysis.bpeCtes()},
         |dict AS (SELECT word, len(syms) AS n_sub FROM w8),
         |btk AS (
         |  SELECT doc_id, unnest(toks) AS word
         |  FROM (SELECT doc_id, ${Dedup.toksSql} AS toks FROM documents)),
         |bcnt AS (
         |  SELECT doc_id,
         |    CAST(SUM(COALESCE(n_sub, length(word) + 1)) AS BIGINT) AS n_tokens
         |  FROM btk LEFT JOIN dict USING (word)
         |  GROUP BY doc_id),
         |bj AS (
         |  SELECT b.doc_id, d.lang, b.n_tokens
         |  FROM bcnt b JOIN documents d ON d.doc_id = b.doc_id),
         |bc AS (
         |  SELECT doc_id, lang, n_tokens,
         |    SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS cum_excl
         |  FROM bj),
         |bg AS (
         |  SELECT lang, COUNT(*) AS n_docs,
         |    CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |    CAST(SUM(CASE WHEN CAST(cum_excl % 2048 AS BIGINT) + n_tokens > 2048
         |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_split
         |  FROM bc GROUP BY lang),
         |bg2 AS (SELECT *, (total_tokens + 2047) // 2048 AS n_packs FROM bg)
         |SELECT lang, n_docs, total_tokens, n_packs,
         |  CAST(total_tokens AS DOUBLE) / CAST(n_packs * 2048 AS DOUBLE) AS util,
         |  n_split * 1000 // n_docs AS split_permille
         |FROM bg2""".stripMargin,
    "q_doc_vocabcov" -> TextAnalysis.vocabCoverageSql(),
    "q_doc_sbackoff" -> SbackoffOracleSql,
    "q_doc_ppbucket" ->
      s"""WITH sb AS ($SbackoffOracleSql),
         |ho AS (
         |  SELECT sb.doc_id, d.lang, sb.mean_sb
         |  FROM sb JOIN documents d ON sb.doc_id = d.doc_id
         |  WHERE sb.doc_id % 2 = 1),
         |th AS (
         |  SELECT lang, quantile_cont(mean_sb, ${1.0 / 3}) AS t1,
         |    quantile_cont(mean_sb, ${2.0 / 3}) AS t2
         |  FROM ho GROUP BY lang)
         |SELECT doc_id, ho.lang, mean_sb,
         |  CASE WHEN mean_sb >= t2 THEN 'head'
         |       WHEN mean_sb >= t1 THEN 'middle'
         |       ELSE 'tail' END AS bucket,
         |  t1, t2
         |FROM ho JOIN th ON ho.lang = th.lang""".stripMargin,
    "q_doc_dsir" ->
      s"""WITH tok AS (
         |  SELECT doc_id, lang, unnest(toks) AS w
         |  FROM (SELECT doc_id, lang, ${Dedup.toksSql} AS toks FROM documents) t),
         |alls AS (SELECT w, COUNT(*) AS ca FROM tok GROUP BY w),
         |tgt AS (SELECT w, COUNT(*) AS ct FROM tok WHERE lang = 'en' GROUP BY w)
         |SELECT doc_id, COUNT(*) AS n_tokens,
         |  CAST(SUM(length(bin(COALESCE(ct, 0) + 1)) - length(bin(ca + 1))) AS BIGINT)
         |    AS total_logratio,
         |  CAST(CAST(SUM(length(bin(COALESCE(ct, 0) + 1)) - length(bin(ca + 1))) AS BIGINT) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE) AS mean_logratio
         |FROM tok JOIN alls USING (w) LEFT JOIN tgt USING (w)
         |GROUP BY doc_id""".stripMargin,
    "q_doc_topfrac" ->
      s"""WITH bgs AS (
         |  SELECT doc_id, n_chars,
         |    unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bg
         |  FROM (SELECT doc_id, n_chars, ${Dedup.toksSql} AS toks FROM documents) t),
         |c AS (SELECT doc_id, n_chars, bg, COUNT(*) AS cnt FROM bgs GROUP BY 1, 2, 3),
         |r AS (SELECT *,
         |        ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cnt DESC, bg DESC) AS rn,
         |        SUM(cnt) OVER (PARTITION BY doc_id) AS nb
         |      FROM c)
         |SELECT doc_id, CAST(nb AS BIGINT) AS n_bigrams, bg AS top_bigram,
         |  cnt AS top_cnt,
         |  CAST(cnt AS DOUBLE) / CAST(nb AS DOUBLE) AS top_frac,
         |  CAST(cnt AS DOUBLE) * CAST(length(bg) AS DOUBLE) / CAST(n_chars AS DOUBLE)
         |    AS top_char_frac
         |FROM r WHERE rn = 1""".stripMargin,
    "q_doc_winnow" ->
      s"""WITH ${TextAnalysis.winnowSqlChain("documents")}
         |SELECT doc_id, mk // 2147483648 AS h,
         |  2147483647 - (mk % 2147483648) AS pos
         |FROM wsel""".stripMargin,
    "q_dedup_winnow" ->
      s"""WITH ${Dedup.corpusSql},
         |${TextAnalysis.winnowPairSqlChain("corpus")}
         |SELECT doc_a, doc_b, n_shared FROM wpair""".stripMargin,
    "q_dedup_contain" ->
      s"""WITH ${Dedup.corpusSql},
         |${TextAnalysis.winnowPairSqlChain("corpus")},
         |${Dedup.tokSql},
         |csizes AS (SELECT doc_id, COUNT(*) AS nt FROM tok GROUP BY 1),
         |cinter AS (
         |  SELECT doc_a, doc_b, COUNT(*) AS n_inter
         |  FROM wpair
         |  JOIN tok ta ON ta.doc_id = doc_a
         |  JOIN tok tb ON tb.doc_id = doc_b AND tb.h = ta.h
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, n_inter,
         |  CAST(n_inter AS DOUBLE) / CAST(sa.nt AS DOUBLE) AS contain_a,
         |  CAST(n_inter AS DOUBLE) / CAST(sb.nt AS DOUBLE) AS contain_b
         |FROM cinter
         |JOIN csizes sa ON doc_a = sa.doc_id
         |JOIN csizes sb ON doc_b = sb.doc_id
         |WHERE greatest(CAST(n_inter AS DOUBLE) / CAST(sa.nt AS DOUBLE),
         |               CAST(n_inter AS DOUBLE) / CAST(sb.nt AS DOUBLE))
         |      >= CAST(0.8 AS DOUBLE)""".stripMargin,
    "q_er_bestmatch" -> ErBestMatchOracleSql,
    "q_er_recall" ->
      s"""WITH rec AS (
         |  SELECT CAST(p_partkey AS BIGINT) AS key, p_name AS name FROM part),
         |sample AS (SELECT key AS key_a, name AS name_a FROM rec
         |          WHERE key % 100 = 0 ORDER BY key LIMIT 100),
         |tr AS (
         |  SELECT key_a,
         |    min(CAST(levenshtein(name_a, name) AS BIGINT) * 8589934592 + key) AS tm
         |  FROM sample JOIN rec ON key <> key_a
         |  GROUP BY key_a),
         |tru AS (SELECT key_a, tm // 8589934592 AS true_dist FROM tr),
         |bm AS ($ErBestMatchOracleSql)
         |SELECT key_a AS p_partkey, true_dist, best_dist,
         |  COALESCE(best_dist = true_dist, FALSE) AS dist_match
         |FROM tru LEFT JOIN bm ON bm.p_partkey = tru.key_a""".stripMargin,
    "q_ev_transitions" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ets, event_id, event_type
        |  FROM events),
        |t AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ets, event_id)
        |      AS to_type
        |  FROM e)
        |SELECT from_type, to_type, COUNT(*) AS n,
        |  CAST(COUNT(*) AS DOUBLE)
        |    / CAST(SUM(COUNT(*)) OVER (PARTITION BY from_type) AS DOUBLE) AS p
        |FROM t WHERE to_type IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,
    "q_ev_cohort" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 86400 AS day
        |  FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM e WHERE event_type = 'signup' GROUP BY user_id)
        |SELECT cohort_day, (day - cohort_day) // 7 AS week_n, COUNT(DISTINCT e.user_id) AS n_users
        |FROM e JOIN c ON e.user_id = c.user_id
        |WHERE day >= cohort_day
        |GROUP BY 1, 2""".stripMargin,
    "q_ev_uniques" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ets, event_type, user_id FROM events)
        |SELECT strftime(to_timestamp(CAST(floor(epoch(ets)/3600) AS BIGINT)*3600), '%Y-%m-%d %H:%M:%S.%f') AS w_start,
        |  event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
        |FROM e GROUP BY 1, 2""".stripMargin,
    "q_ev_funnel" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ets, event_type FROM events),
        |v AS (SELECT user_id, min(ets) AS fv FROM e WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(ets) AS fc FROM e JOIN v ON e.user_id = v.user_id AND e.ets > v.fv
        |  WHERE event_type = 'click' GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(ets) AS fp FROM e JOIN c ON e.user_id = c.user_id AND e.ets > c.fc
        |  WHERE event_type = 'purchase' GROUP BY e.user_id)
        |SELECT v.user_id,
        |  strftime(fv, '%Y-%m-%d %H:%M:%S.%f') AS first_view,
        |  strftime(fc, '%Y-%m-%d %H:%M:%S.%f') AS first_click,
        |  strftime(fp, '%Y-%m-%d %H:%M:%S.%f') AS first_purchase,
        |  fp IS NOT NULL AS converted
        |FROM v LEFT JOIN c ON v.user_id = c.user_id LEFT JOIN p ON v.user_id = p.user_id""".stripMargin,
    "q_ev_latest" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ets, event_id, event_type, value
        |  FROM events),
        |r AS (
        |  SELECT user_id, ets, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ets DESC, event_id DESC) AS rn
        |  FROM e)
        |SELECT user_id, strftime(ets, '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
        |  event_id, event_type, value
        |FROM r WHERE rn = 1""".stripMargin,
    "q_ev_label" ->
      """WITH c AS (
        |  SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS cts
        |  FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS pts
        |  FROM events WHERE event_type = 'purchase'),
        |conv AS (
        |  SELECT click_id,
        |    MIN(epoch_us(pts) - epoch_us(cts)) AS us_to_conv
        |  FROM c JOIN p USING (user_id)
        |  WHERE pts > cts AND pts <= cts + INTERVAL 86400 SECOND
        |  GROUP BY click_id)
        |SELECT click_id, user_id,
        |  strftime(cts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
        |  us_to_conv IS NOT NULL AS converted, us_to_conv
        |FROM c LEFT JOIN conv USING (click_id)""".stripMargin,
    "q_rfm" ->
      """WITH per AS (
        |  SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS last_order,
        |    COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
        |  FROM orders GROUP BY o_custkey),
        |mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS dmax FROM orders),
        |pr AS (
        |  SELECT o_custkey, CAST(datediff('day', last_order, dmax) AS BIGINT) AS r_days,
        |    n_orders, spend
        |  FROM per CROSS JOIN mx),
        |th AS (
        |  SELECT quantile_cont(r_days, 0.5) AS r_med,
        |    quantile_cont(n_orders, 0.5) AS f_med,
        |    quantile_cont(spend, 0.5) AS m_med
        |  FROM pr)
        |SELECT o_custkey, r_days, n_orders, spend,
        |  (CASE WHEN r_days <= r_med THEN 'R' ELSE 'r' END ||
        |   CASE WHEN n_orders >= f_med THEN 'F' ELSE 'f' END ||
        |   CASE WHEN spend >= m_med THEN 'M' ELSE 'm' END) AS segment
        |FROM pr CROSS JOIN th""".stripMargin,
    "q_ev_winsor" -> Experiment.winsorizeSql(),
    "q_ev_mde" -> Experiment.mdeSql(),
    "q_ev_srm" -> Experiment.srmCheckSql(),
    "q_ev_convlift" -> Experiment.conversionLiftSql(),
    "q_ev_cuped" ->
      """WITH cev AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
        |    CAST(ROUND(value * 100) AS BIGINT) AS vq
        |  FROM events
        |  WHERE user_id IS NOT NULL AND value IS NOT NULL AND abs(value) < 9e15),
        |cmid AS (SELECT (MIN(tus) + MAX(tus)) // 2 AS mid FROM cev),
        |cper AS (
        |  SELECT user_id, user_id % 2 AS variant,
        |    SUM(CASE WHEN tus < mid THEN vq ELSE 0 END) AS x,
        |    SUM(CASE WHEN tus >= mid THEN vq ELSE 0 END) AS y
        |  FROM cev CROSS JOIN cmid GROUP BY user_id),
        |cglob AS (
        |  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
        |    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
        |    SUM(CAST(y AS HUGEINT) * y) AS syy,
        |    SUM(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM cper),
        |cth AS (
        |  SELECT *,
        |    CAST(n * sxy - sx * sy AS DOUBLE) AS covn,
        |    CAST(n * sxx - sx * sx AS DOUBLE) AS varn,
        |    CAST(n * syy - sy * sy AS DOUBLE) AS varyn
        |  FROM cglob),
        |cv AS (
        |  SELECT variant, COUNT(*) AS n_users,
        |    SUM(CAST(x AS HUGEINT)) AS sxv, SUM(CAST(y AS HUGEINT)) AS syv
        |  FROM cper GROUP BY variant)
        |SELECT variant, CAST(n_users AS BIGINT) AS n_users,
        |  CAST(sxv AS DOUBLE) / (CAST(n_users AS DOUBLE) * 100.0) AS mean_pre,
        |  CAST(syv AS DOUBLE) / (CAST(n_users AS DOUBLE) * 100.0) AS mean_post,
        |  CASE WHEN varn > 0 THEN covn / varn ELSE 0.0 END AS theta,
        |  CAST(syv AS DOUBLE) / (CAST(n_users AS DOUBLE) * 100.0)
        |    - (CASE WHEN varn > 0 THEN covn / varn ELSE 0.0 END)
        |      * (CAST(sxv AS DOUBLE) / (CAST(n_users AS DOUBLE) * 100.0)
        |         - CAST(sx AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0)) AS mean_adj,
        |  CASE WHEN varn > 0 AND varyn > 0 THEN covn * covn / (varn * varyn)
        |       ELSE 0.0 END AS var_reduction
        |FROM cv CROSS JOIN cth""".stripMargin,
    "q_ev_lift" ->
      """WITH ut AS (
        |  SELECT DISTINCT user_id, event_type FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |n AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM ut),
        |c AS (SELECT event_type, COUNT(*) AS n_t FROM ut GROUP BY event_type),
        |p AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_ab
        |  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b, n_ab, ca.n_t AS n_a, cb.n_t AS n_b, n_users,
        |  CAST(n_users * n_ab AS DOUBLE) / CAST(ca.n_t * cb.n_t AS DOUBLE) AS lift
        |FROM p
        |JOIN c ca ON type_a = ca.event_type
        |JOIN c cb ON type_b = cb.event_type
        |CROSS JOIN n""".stripMargin,
    "q_ev_attrib" ->
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, CAST(ts AS TIMESTAMP) AS pts, value
        |  FROM events WHERE event_type = 'purchase'),
        |t AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS tts,
        |    event_type AS channel, event_id AS tid
        |  FROM events WHERE event_type IN ('click', 'view')),
        |j AS (
        |  SELECT purchase_id, tts, channel, tid
        |  FROM p JOIN t USING (user_id)
        |  WHERE tts < pts AND tts >= pts - INTERVAL 86400 SECOND),
        |l AS (
        |  SELECT purchase_id, channel AS lc FROM (
        |    SELECT purchase_id, channel,
        |      row_number() OVER (PARTITION BY purchase_id ORDER BY tts DESC, tid DESC) AS rn
        |    FROM j) WHERE rn = 1),
        |f AS (
        |  SELECT purchase_id, channel AS fc FROM (
        |    SELECT purchase_id, channel,
        |      row_number() OVER (PARTITION BY purchase_id ORDER BY tts ASC, tid ASC) AS rn
        |    FROM j) WHERE rn = 1)
        |SELECT purchase_id, user_id,
        |  strftime(pts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts, value,
        |  COALESCE(lc, 'direct') AS last_channel,
        |  COALESCE(fc, 'direct') AS first_channel
        |FROM p LEFT JOIN l USING (purchase_id) LEFT JOIN f USING (purchase_id)""".stripMargin,
    "q_ev_features" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(value AS DECIMAL(12,2)) AS v,
        |    CAST(ts AS TIMESTAMP) AS ets, CAST(ts AS DATE) AS d
        |  FROM events)
        |SELECT user_id, COUNT(*) AS n_events,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
        |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
        |  CAST(SUM(v) AS DOUBLE) AS total_value,
        |  strftime(MAX(ets), '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
        |  COUNT(DISTINCT d) AS days_active,
        |  CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS purchase_rate
        |FROM e GROUP BY user_id""".stripMargin,
    "q_ev_gaps" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ets, event_id FROM events),
        |g AS (
        |  SELECT user_id,
        |    epoch_us(ets) - epoch_us(lag(ets, 1) OVER (
        |      PARTITION BY user_id ORDER BY ets, event_id)) AS gap_us
        |  FROM e)
        |SELECT user_id, count(gap_us) AS n_gaps,
        |  MAX(gap_us) AS max_gap_us,
        |  count(CASE WHEN gap_us > 3600000000 THEN 1 END) AS n_gaps_over_1h
        |FROM g GROUP BY user_id""".stripMargin,
    "q_ev_json" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,
    "q_ev_interval" ->
      """WITH c AS (
        |  SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS click_ts
        |  FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS purchase_ts, value AS purchase_value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.click_id, c.user_id,
        |  strftime(c.click_ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
        |  strftime(p.purchase_ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
        |  p.purchase_value
        |FROM c JOIN p ON c.user_id = p.user_id
        |  AND p.purchase_ts <= c.click_ts
        |  AND p.purchase_ts >= c.click_ts - INTERVAL 1 HOUR""".stripMargin,
    "q_rangejoin" ->
      """WITH tiers AS (
        |  SELECT i AS tier, i*i*2.0 AS lo, (i+1)*(i+1)*2.0 AS hi FROM range(0, 12) t(i))
        |SELECT tier, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events JOIN tiers ON value >= lo AND value < hi
        |GROUP BY tier""".stripMargin,
    "q_doc_reshard" -> Maintenance.reshardAuditSql(),
    "q_zorder" ->
      s"""SELECT p_partkey,
         |  CAST(p_partkey % 256 AS BIGINT) AS bx,
         |  CAST(p_size % 256 AS BIGINT) AS by,
         |  ${Maintenance.zValueSql(8, Seq("(p_partkey % 256)", "(p_size % 256)"))} AS z
         |FROM part""".stripMargin,
    "q_pivot" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_open,
        |  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_finished
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_above_avg" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, cust_avg FROM (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey) AS DOUBLE)
        |      / CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS DOUBLE) AS cust_avg
        |  FROM orders) t
        |WHERE o_totalprice > cust_avg * 1.5""".stripMargin,
    "q_corr_subq" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > 1.5 * (
        |  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)""".stripMargin,
    "q_percentile" ->
      """SELECT o_orderstatus,
        |  quantile_cont(o_totalprice, 0.5) AS p50,
        |  quantile_cont(o_totalprice, 0.9) AS p90,
        |  COUNT(DISTINCT o_custkey) AS n_cust
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q_window_rank2" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(DENSE_RANK() OVER w AS BIGINT) AS drk,
        |  PERCENT_RANK() OVER w AS prk,
        |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin,
    "q_scalar2" ->
      """SELECT p_partkey,
        |  CAST(levenshtein(p_name, 'cold widget') AS BIGINT) AS lev,
        |  reverse(p_name) AS rname,
        |  lpad(p_brand, 12, '*') AS padded,
        |  translate(p_type, 'AEO', 'aeo') AS xlated,
        |  CAST(strpos(p_name, 'widget') AS BIGINT) AS pos_widget,
        |  repeat(p_brand, 2) AS brand2
        |FROM part""".stripMargin,
    "q_case_pivot" ->
      """SELECT l_returnflag,
        |  COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS n_open,
        |  COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS n_finished,
        |  CAST(SUM(CASE WHEN l_discount > 0.05 THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DOUBLE) AS high_disc_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_custdist" ->
      """WITH pc AS (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey)
        |SELECT coalesce(pc.n_orders, 0) AS c_count, COUNT(*) AS custdist
        |FROM customer LEFT JOIN pc ON c_custkey = o_custkey
        |GROUP BY 1""".stripMargin,
    "q_disj" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity <= 11)
        |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20)""".stripMargin,
    "q_retonly" ->
      """WITH ret AS (
        |  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R')
        |SELECT s_name, COUNT(*) AS numwait
        |FROM ret r JOIN supplier ON r.l_suppkey = s_suppkey
        |WHERE EXISTS (SELECT 1 FROM lineitem o
        |              WHERE o.l_orderkey = r.l_orderkey AND o.l_suppkey <> r.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM ret r2
        |                  WHERE r2.l_orderkey = r.l_orderkey AND r2.l_suppkey <> r.l_suppkey)
        |GROUP BY s_name""".stripMargin,
    "q_promoshare" ->
      """SELECT
        |  100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
        |        THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) END) AS DOUBLE)
        |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS promo_share,
        |  COUNT(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'""".stripMargin,
    "q_topsupplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS rev_d
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1998-07-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(rev_d AS DOUBLE) AS total_rev
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_d = (SELECT MAX(rev_d) FROM rev)""".stripMargin,
    "q_bigorders" ->
      """WITH big AS (
        |  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty_d
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 250)
        |SELECT c_name, c_custkey, o_orderkey,
        |  strftime(o_orderdate::DATE, '%Y-%m-%d') AS o_orderdate,
        |  o_totalprice, CAST(qty_d AS DOUBLE) AS total_qty
        |FROM big
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q_noorders" ->
      """WITH s AS (
        |  SELECT COUNT(*) AS cnt, SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS tot
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_mktsegment, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        |FROM customer, s
        |WHERE CAST(c_acctbal AS DECIMAL(12,2)) * cnt > tot
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY c_mktsegment""".stripMargin,
    "q_partshare" ->
      """WITH pp AS (
        |  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS val_d
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT l_partkey, CAST(val_d AS DOUBLE) AS part_value
        |FROM pp WHERE val_d * 1800 > (SELECT SUM(val_d) FROM pp)""".stripMargin,
    "q_natshare" ->
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CASE WHEN n2.n_name = 'NATION_8'
        |        THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) END) AS DOUBLE)
        |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS mkt_share,
        |  COUNT(*) AS n
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |GROUP BY 1""".stripMargin,
    "q_revband" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q_lateship" ->
      """SELECT o_orderpriority, COUNT(*) AS n
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1""".stripMargin,
    "q_natvolume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS volume
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_13' AND n2.n_name = 'NATION_19')
        |   OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_13')
        |GROUP BY 1, 2, 3""".stripMargin,
    "q_profit" ->
      """SELECT n_name AS nation, CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
        |         - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) * CAST(0.05 AS DECIMAL(4,2))) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2""".stripMargin,
    "q_prioline" ->
      """SELECT l_returnflag,
        |  COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count,
        |  COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
        |GROUP BY 1""".stripMargin,
    "q_suppcnt" ->
      """SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_size IN (1, 4, 9)
        |WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2""".stripMargin,
    "q_smallqty" ->
      """WITH brand_lines AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#3'),
        |per_part AS (
        |  SELECT l_partkey AS pk,
        |    SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty_d, COUNT(*) AS cnt
        |  FROM brand_lines GROUP BY 1)
        |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS small_rev,
        |  COUNT(*) AS n
        |FROM brand_lines JOIN per_part ON l_partkey = pk
        |WHERE CAST(l_quantity AS DECIMAL(12,2)) * 5 * cnt < sum_qty_d""".stripMargin,
    "q_mincost" ->
      """WITH euro_sup AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'),
        |costs AS (
        |  SELECT l_partkey, l_suppkey,
        |    MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS cost_d
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
        |  WHERE l_suppkey IN (SELECT s_suppkey FROM euro_sup)
        |  GROUP BY 1, 2),
        |minc AS (
        |  SELECT l_partkey AS pk, MIN(cost_d) AS min_cost_d FROM costs GROUP BY 1)
        |SELECT p.p_partkey, p.p_brand, es.s_suppkey, es.s_name, es.s_acctbal,
        |  es.n_name, CAST(c.cost_d AS DOUBLE) AS min_cost
        |FROM costs c
        |JOIN minc ON c.l_partkey = pk AND c.cost_d = min_cost_d
        |JOIN part p ON c.l_partkey = p.p_partkey
        |JOIN euro_sup es ON c.l_suppkey = es.s_suppkey""".stripMargin,
    "q_disjrev" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
        |       AND CAST(l_quantity AS DECIMAL(12,2)) BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20
        |       AND CAST(l_quantity AS DECIMAL(12,2)) BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40
        |       AND CAST(l_quantity AS DECIMAL(12,2)) BETWEEN 20 AND 40)""".stripMargin,
    "q_retrev" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(rev_d AS DOUBLE) AS revenue
        |FROM (
        |  SELECT o_custkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS rev_d
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R'
        |    AND o_orderdate >= TIMESTAMP '1996-10-01'
        |    AND o_orderdate < TIMESTAMP '1997-01-01'
        |  GROUP BY o_custkey) r
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "q_qualsupp" ->
      """SELECT s_suppkey, s_name, s_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_3'
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_name LIKE 'red%'
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  GROUP BY l_suppkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 50)""".stripMargin
  )
}
