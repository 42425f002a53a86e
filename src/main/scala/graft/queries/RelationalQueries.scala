package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Relational-core, scalar-function and window-function coverage
 * (SURVEY.md §2 rows A4-A15, B9-B12, D1-D3) over the driver testdata.
 *
 * Oracle-compare discipline: aggregates of floating columns are avoided or
 * made exact (floor -> BIGINT) because sum-of-double is order-dependent;
 * copied doubles are fine (bit-identical). DuckDB SUM(BIGINT) returns
 * HUGEINT, so oracle sums are CAST back to BIGINT.
 */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val all: Seq[QueryDef] = Seq(

    QueryDef.sql("q_a4_filter",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_quantity > 45 AND l_returnflag = 'R'
        |  AND l_shipdate >= TIMESTAMP '1997-01-01'""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .where(col("l_quantity") > 45 && col("l_returnflag") === "R" &&
          col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    },

    QueryDef.sql("q_a5_project",
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1 - l_discount) AS revenue,
        |  CAST(floor(l_quantity) AS BIGINT) AS qty_i
        |FROM lineitem WHERE l_orderkey % 10 = 3""".stripMargin) { (s, d) =>
      t(s, d, "lineitem").where(col("l_orderkey") % 10 === 3)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          floor(col("l_quantity")).cast("long").as("qty_i"))
    },

    QueryDef.sql("q_a6_join",
      """SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_custs
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
        .join(t(s, d, "region"), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count("*").as("n_orders"),
          countDistinct("c_custkey").as("n_custs"))
    },

    QueryDef.sql("q_a7_semi",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin) { (s, d) =>
      t(s, d, "customer").join(
        t(s, d, "orders").where(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    },

    QueryDef.sql("q_a7_anti",
      """SELECT c_custkey, c_nationkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin) { (s, d) =>
      t(s, d, "customer").join(t(s, d, "orders"),
        col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_nationkey")
    },

    QueryDef.sql("q_a8_distinct",
      "SELECT DISTINCT lang, source FROM documents") { (s, d) =>
      t(s, d, "documents").select("lang", "source").distinct()
    },

    QueryDef.sql("q_a9_groupagg",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag", "l_linestatus")
        .agg(count("*").as("n"),
          sum(floor(col("l_quantity")).cast("long")).as("sum_qty"),
          countDistinct("l_orderkey").as("n_orders"))
    },

    QueryDef.sql("q_a10_rollup",
      """SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_cust
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin) { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
        .join(t(s, d, "region"), col("n_regionkey") === col("r_regionkey"))
        // rollup(String*) trips the ambiguous-self-join analyzer check on
        // post-join lineage in Spark 4.1; the Column overload resolves fine
        .rollup(col("r_name"), col("n_name"))
        .agg(count("*").as("n_cust"))
    },

    QueryDef.sql("q_a11_cube",
      """SELECT event_type, CAST(user_id % 5 AS BIGINT) AS user_bucket,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY CUBE (event_type, user_bucket)""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .withColumn("user_bucket", col("user_id") % 5)
        .cube("event_type", "user_bucket")
        .agg(count("*").as("n"))
    },

    QueryDef.sql("q_a12_topn",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25).select("o_orderkey", "o_totalprice")
    },

    QueryDef.sql("q_a13_topk_group",
      """SELECT c_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey AS c_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("o_custkey").as("c_custkey"), col("o_orderkey"), col("rn"))
    },

    QueryDef.sql("q_a14_setops",
      """WITH y97 AS (SELECT DISTINCT o_custkey k FROM orders
        |              WHERE year(o_orderdate) = 1997),
        |     y98 AS (SELECT DISTINCT o_custkey k FROM orders
        |              WHERE year(o_orderdate) = 1998)
        |SELECT 'only97' AS tag, k FROM (SELECT k FROM y97 EXCEPT SELECT k FROM y98)
        |UNION ALL
        |SELECT 'both' AS tag, k FROM (SELECT k FROM y97 INTERSECT SELECT k FROM y98)""".stripMargin) { (s, d) =>
      val o = t(s, d, "orders")
      val y97 = o.where(year(col("o_orderdate")) === 1997)
        .select(col("o_custkey").as("k")).distinct()
      val y98 = o.where(year(col("o_orderdate")) === 1998)
        .select(col("o_custkey").as("k")).distinct()
      y97.except(y98).withColumn("tag", lit("only97"))
        .unionByName(y97.intersect(y98).withColumn("tag", lit("both")))
        .select("tag", "k")
    },

    QueryDef.sql("q_a15_delta",
      """WITH cur AS (SELECT o_custkey k, CAST(count(*) AS BIGINT) n FROM orders
        |             WHERE year(o_orderdate) = 1998 GROUP BY o_custkey),
        |     prev AS (SELECT o_custkey k, CAST(count(*) AS BIGINT) n FROM orders
        |             WHERE year(o_orderdate) = 1997 GROUP BY o_custkey)
        |SELECT coalesce(cur.k, prev.k) AS k,
        |  coalesce(cur.n, 0) - coalesce(prev.n, 0) AS delta
        |FROM cur FULL OUTER JOIN prev ON cur.k = prev.k""".stripMargin) { (s, d) =>
      val o = t(s, d, "orders")
      val cur = o.where(year(col("o_orderdate")) === 1998)
        .groupBy(col("o_custkey").as("k")).agg(count("*").as("n"))
      val prev = o.where(year(col("o_orderdate")) === 1997)
        .groupBy(col("o_custkey").as("k")).agg(count("*").as("n"))
      cur.as("c").join(prev.as("p"), col("c.k") === col("p.k"), "full_outer")
        .select(coalesce(col("c.k"), col("p.k")).as("k"),
          (coalesce(col("c.n"), lit(0L)) - coalesce(col("p.n"), lit(0L))).as("delta"))
    },

    QueryDef.sql("q_lineage_delta",
      // the run-history relation (Lineage.runDeltaFrom) under oracle: a
      // lineage table constructed deterministically from orders — run
      // "old" misses prefix 1 (added), run "new" misses prefix 2
      // (removed) and drops every 97th order (changed); the engine side
      // also injects a CORRUPTED retry row for prefix 3 at an EARLIER
      // completed_at, which last-write-wins must discard — the oracle
      // doesn't model it precisely because its effect must be nil
      """WITH base AS (SELECT o_orderkey % 40 AS cell_prefix, o_orderkey FROM orders),
        |old_s AS (SELECT cell_prefix, CAST(count(*) AS BIGINT) rc,
        |                 CAST(sum(o_orderkey % 7919) AS BIGINT) rh
        |          FROM base WHERE cell_prefix <> 1 GROUP BY 1),
        |new_s AS (SELECT cell_prefix, CAST(count(*) AS BIGINT) rc,
        |                 CAST(sum(o_orderkey % 7919) AS BIGINT) rh
        |          FROM base WHERE cell_prefix <> 2 AND o_orderkey % 97 <> 0
        |          GROUP BY 1)
        |SELECT coalesce(o.cell_prefix, n.cell_prefix) AS cell_prefix,
        |  o.rc AS rows_old, n.rc AS rows_new,
        |  CASE WHEN o.rc IS NULL THEN 'added'
        |       WHEN n.rc IS NULL THEN 'removed'
        |       WHEN o.rc <> n.rc OR o.rh <> n.rh THEN 'changed'
        |       ELSE 'unchanged' END AS change
        |FROM old_s o FULL OUTER JOIN new_s n ON o.cell_prefix = n.cell_prefix""".stripMargin) { (s, d) =>
      val o = t(s, d, "orders")
        .select((col("o_orderkey") % 40).as("cell_prefix"), col("o_orderkey"))
      def stats(df: DataFrame) = df.groupBy(col("cell_prefix"))
        .agg(count("*").as("row_count"),
          sum(col("o_orderkey") % 7919).as("row_hash"))
      val old = stats(o.where(col("cell_prefix") =!= 1))
        .withColumn("run_id", lit("old")).withColumn("completed_at", lit("t1"))
      val nw = stats(o.where(col("cell_prefix") =!= 2 && col("o_orderkey") % 97 =!= 0))
        .withColumn("run_id", lit("new")).withColumn("completed_at", lit("t2"))
      val retry = old.where(col("cell_prefix") === 3)
        .withColumn("row_count", lit(-999L)).withColumn("row_hash", lit(-1L))
        .withColumn("completed_at", lit("t0"))
      graft.plans.Lineage
        .runDeltaFrom(old.unionByName(nw).unionByName(retry), "old", "new")
        .select("cell_prefix", "rows_old", "rows_new", "change")
    },

    QueryDef.sql("q_b9_time",
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY 1""".stripMargin) { (s, d) =>
      t(s, d, "events").groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count("*").as("n"), countDistinct("user_id").as("n_users"))
    },

    QueryDef.sql("q_b10_json",
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .groupBy((get_json_object(col("props"), "$.k").cast("long") % 10).as("k_mod"))
        .agg(count("*").as("n"))
    },

    QueryDef.sql("q_b11_array",
      """SELECT vec_id, CAST(len(embedding) AS INT) AS dim, label,
        |  CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000) AS BIGINT) AS q0
        |FROM embeddings WHERE vec_id % 7 = 0""".stripMargin) { (s, d) =>
      t(s, d, "embeddings").where(col("vec_id") % 7 === 0)
        .select(col("vec_id"), size(col("embedding")).as("dim"), col("label"),
          floor(element_at(col("embedding"), 1).cast("double") * 1000)
            .cast("long").as("q0"))
    },

    QueryDef.sql("q_b12_url",
      """SELECT regexp_extract('https://' || source || '.example.org/doc/' || doc_id,
        |    'https://([^/]+)/', 1) AS host,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM documents GROUP BY 1""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .withColumn("url", concat(lit("https://"), col("source"),
          lit(".example.org/doc/"), col("doc_id")))
        .groupBy(regexp_extract(col("url"), "https://([^/]+)/", 1).as("host"))
        .agg(count("*").as("n"))
    },

    QueryDef.sql("q_d2_lag",
      """SELECT event_id,
        |  event_id - lag(event_id) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |FROM events""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .select(col("event_id"),
          (col("event_id") - lag(col("event_id"), 1).over(w)).as("gap"))
    },

    QueryDef.sql("q_d3_moving",
      """SELECT event_id,
        |  CAST(sum(CAST(floor(value) AS BIGINT)) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS msum
        |FROM events""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, 0)
      t(s, d, "events")
        .select(col("event_id"),
          sum(floor(col("value")).cast("long")).over(w).as("msum"))
    },

    QueryDef.sql("q_interval_join",
      """WITH bands AS (SELECT n_nationkey AS band_id,
        |  CAST(n_nationkey * 4 AS DOUBLE) AS lo,
        |  CAST(n_nationkey * 4 + 7 AS DOUBLE) AS hi FROM nation)
        |SELECT e.event_id, b.band_id
        |FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi""".stripMargin) { (s, d) =>
      // generic 1-D interval join: overlapping value bands from nation,
      // bucket-decomposed equi-join + refine vs the oracle's theta join
      val bands = t(s, d, "nation").select(
        col("n_nationkey").as("band_id"),
        (col("n_nationkey") * 4).cast("double").as("lo"),
        (col("n_nationkey") * 4 + 7).cast("double").as("hi"))
      graft.operators.IntervalJoin.pointInInterval(
          t(s, d, "events").select("event_id", "value"), "value",
          bands, "lo", "hi", bucketWidth = 5.0)
        .select(col("event_id"), col("band_id"))
    },

    QueryDef.sql("q_asof_join",
      """WITH snap AS (SELECT user_id, ts, event_id AS snap_id,
        |    value AS snap_value
        |  FROM events WHERE event_id % 7 = 0),
        |probe AS (SELECT event_id, user_id, ts FROM events)
        |SELECT p.event_id, p.user_id, s.snap_id, s.snap_value
        |FROM probe p ASOF LEFT JOIN snap s
        |  ON p.user_id = s.user_id AND p.ts >= s.ts""".stripMargin) { (s, d) =>
      // as-of join vs DuckDB's NATIVE ASOF JOIN as the oracle: every event
      // is enriched with the latest prior (inclusive) per-user snapshot
      val ev = t(s, d, "events")
      val snap = ev.where(col("event_id") % 7 === 0)
        .select(col("user_id"), col("ts"),
          col("event_id").as("snap_id"), col("value").as("snap_value"))
      val probe = ev.select("event_id", "user_id", "ts")
      graft.operators.AsofJoin
        .latestPrior(probe, snap, "user_id", "ts", Seq("snap_id", "snap_value"))
        .select("event_id", "user_id", "snap_id", "snap_value")
    },

    QueryDef.sql("q_asof_join_tol",
      """WITH snap AS (SELECT user_id, ts, event_id AS snap_id,
        |    value AS snap_value
        |  FROM events WHERE event_id % 7 = 0),
        |probe AS (SELECT event_id, user_id, ts FROM events)
        |SELECT p.event_id, p.user_id,
        |  CASE WHEN s.ts >= p.ts - INTERVAL 2 HOUR THEN s.snap_id END AS snap_id,
        |  CASE WHEN s.ts >= p.ts - INTERVAL 2 HOUR THEN s.snap_value END AS snap_value
        |FROM probe p ASOF LEFT JOIN snap s
        |  ON p.user_id = s.user_id AND p.ts >= s.ts""".stripMargin) { (s, d) =>
      // as-of with max staleness: snapshots older than 2h surface as null
      // payloads (the production "no recent-enough snapshot" semantics)
      val ev = t(s, d, "events")
      val snap = ev.where(col("event_id") % 7 === 0)
        .select(col("user_id"), col("ts"),
          col("event_id").as("snap_id"), col("value").as("snap_value"))
      val probe = ev.select("event_id", "user_id", "ts")
      graft.operators.AsofJoin
        .latestPrior(probe, snap, "user_id", "ts", Seq("snap_id", "snap_value"),
          tolerance = Some(expr("INTERVAL 2 HOUR")))
        .select("event_id", "user_id", "snap_id", "snap_value")
    },

    QueryDef.sql("q_d4_sessionize",
      """WITH e AS (SELECT user_id, event_id, ts,
        |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |f AS (SELECT user_id, event_id, ts,
        |  CASE WHEN prev IS NULL
        |       OR epoch_us(ts) - epoch_us(prev) > 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM e)
        |SELECT user_id, event_id,
        |  CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |FROM f""".stripMargin) { (s, d) =>
      // gap-based sessionization (30-min inactivity): exact microsecond
      // arithmetic on both sides; windows are per-user (inherently
      // sequential per user, parallel across the user dimension)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .withColumn("prev", lag(col("ts"), 1).over(w))
        .withColumn("brk",
          when(col("prev").isNull ||
            unix_micros(col("ts").cast("timestamp")) -
              unix_micros(col("prev").cast("timestamp")) > 1800000000L, 1L)
            .otherwise(0L))
        .select(col("user_id"), col("event_id"),
          sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0))
            .as("session_id"))
    })
}
