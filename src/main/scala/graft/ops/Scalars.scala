package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.H — scalar function surface: string / date / timestamp /
  * math / conditional / array / map / JSON.
  *
  * Scale notes (100 TB): every expression here is a built-in Catalyst
  * expression inside whole-stage codegen — no UDFs, so these run at scan
  * speed and never break the codegen span. Cross-engine rules: integer or
  * exact-decimal arithmetic wherever possible; transcendentals (ln) rounded
  * to 6 dp; sub-second timestamps handled in exact integer microseconds.
  */
object Scalars {

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "str_basic" -> { (s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"),
          upper(col("c_name")).as("up_name"),
          lower(col("c_mktsegment")).as("lo_seg"),
          trim(concat(lit("  "), col("c_name"), lit(" "))).as("trimmed"),
          substring(col("c_name"), 1, 8).as("prefix8"),
          // .cast("long") on int outputs throughout this file: DuckDB's
          // length/extract/strpos return BIGINT and the driver compares
          // pandas dtypes strictly.
          length(col("c_name")).cast("long").as("name_len"),
          concat_ws("|", col("c_mktsegment"), col("c_name")).as("seg_name"))
        .orderBy(col("c_custkey").asc)
    },

    "str_split_regexp" -> { (s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
          // string-joined: the driver's pandas comparator cannot hash
          // ndarray cells (round-1 comparator error on raw array output).
          array_join(split(col("p_name"), " "), "|").as("name_tokens"),
          regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).as("brand_num"))
        .orderBy(col("p_partkey").asc)
    },

    "str_replace_pad" -> { (s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"),
          regexp_replace(col("c_name"), "Customer", "Cust").as("short_name"),
          translate(col("c_name"), "#0", "-_").as("translated"),
          lpad(col("c_custkey").cast("string"), 10, "0").as("padded"))
        .orderBy(col("c_custkey").asc)
    },

    "date_extract_trunc" -> { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          dayofweek(col("o_orderdate")).cast("long").as("dow1"), // 1=Sunday .. 7=Saturday
          quarter(col("o_orderdate")).cast("long").as("qtr"),
          date_trunc("month", col("o_orderdate")).as("month_start"))
        .orderBy(col("o_orderkey").asc)
    },

    "date_arith" -> { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("ship_lag_days"),
          // DATE output → pandas object(datetime.date) vs DuckDB datetime64;
          // midnight TIMESTAMP_NTZ is the comparator-stable projection.
          add_months(col("o_orderdate"), 3).cast("timestamp_ntz").as("plus3mo"),
          last_day(col("o_orderdate")).cast("timestamp_ntz").as("eom"))
        .orderBy(col("l_orderkey").asc, col("l_linenumber").asc,
          col("ship_lag_days").asc)
    },

    // Business-day arithmetic — the operational-SLA form of date_arith:
    // weekdays between order and ship dates via the cumulative closed
    // form B(m) = 5·(m div 7) + least(m mod 7, 5) with m = epochDay + 3
    // (shifted so m ≡ 0 mod 7 ⟺ Monday; non-negative for any modern
    // date, so Spark div ≡ DuckDB //). busdays = B(ship) − B(order) —
    // pure integer arithmetic, no calendar UDF, no per-day explode; the
    // per-priority mean is one double division of exact integers.
    "date_business_days" -> { (s, d) =>
      val withM = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .withColumn("m1", datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")).cast("long") + lit(3L))
        .withColumn("m2", datediff(col("l_shipdate").cast("date"),
          lit("1970-01-01").cast("date")).cast("long") + lit(3L))
      withM
        .withColumn("busdays",
          (expr("5 * (m2 div 7)") + least(expr("m2 % 7"), lit(5L))) -
            (expr("5 * (m1 div 7)") + least(expr("m1 % 7"), lit(5L))))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("busdays")).as("sum_busdays"))
        .select(col("o_orderpriority"), col("n"), col("sum_busdays"),
          round(col("sum_busdays").cast("double") / col("n").cast("double"), 6)
            .as("avg_busdays"))
        .orderBy(col("o_orderpriority").asc)
    },

    "ts_unix_convert" -> { (s, d) =>
      val ts = col("ts").cast("timestamp")
      Tables.events(s, d)
        .select(col("event_id"),
          unix_micros(ts).as("epoch_us"),
          (unix_micros(ts) / lit(1000000L)).cast("long").as("epoch_s"),
          timestamp_micros(unix_micros(ts)).cast("timestamp_ntz").as("ts_rt"))
        .orderBy(col("event_id").asc)
    },

    "math_basic" -> { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - 0.05).as("abs_disc"),
          ceil(col("l_extendedprice")).as("ceil_price"),
          floor(col("l_extendedprice")).as("floor_price"),
          pmod(col("l_partkey"), lit(7)).as("mod7"),
          pow(col("l_quantity"), 2).as("qty_sq"),
          round(log(col("l_extendedprice")), 6).as("ln_price"),
          sqrt(col("l_quantity") * col("l_quantity")).as("sqrt_sq"))
        .orderBy(col("l_orderkey").asc, col("l_linenumber").asc,
          col("abs_disc").asc, col("qty_sq").asc, col("ln_price").asc)
    },

    "cond_case_coalesce" -> { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          when(col("o_totalprice") > 300000.0, "high")
            .when(col("o_totalprice") > 150000.0, "mid")
            .otherwise("low").as("tier"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_c"),
          when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0).as("is_urgent"))
        .orderBy(col("o_orderkey").asc)
    },

    "arr_explode_contains" -> { (s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"), posexplode(slice(col("embedding"), 1, 4)),
          size(col("embedding")).cast("long").as("dim"),
          array_contains(col("embedding"), element_at(col("embedding"), 1)).as("has_first"))
        .select(col("vec_id"), (col("pos") + 1).cast("long").as("pos"),
          col("col").as("val"), col("dim"), col("has_first"))
        .orderBy(col("vec_id").asc, col("pos").asc)
    },

    "arr_explode_outer" -> { (s, d) =>
      // null-preserving generator: rows whose filtered array is empty
      // survive with a null value (explode would drop them).
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          explode_outer(expr("filter(embedding, x -> x > 0.25)")).as("val"))
        .orderBy(col("vec_id").asc, col("val").asc_nulls_first)
    },

    "arr_zip_inline" -> { (s, d) =>
      // inline(arrays_zip(...)): struct-array generator — consecutive
      // element pairs of the embedding prefix.
      Tables.embeddings(s, d)
        .select(col("vec_id"), inline(arrays_zip(
          slice(col("embedding"), 1, 3).as("x"),
          slice(col("embedding"), 2, 3).as("y"))))
        .orderBy(col("vec_id").asc, col("x").asc, col("y").asc)
    },

    "arr_transform_filter" -> { (s, d) =>
      // The transformed array is projected to scalar element columns
      // (d1..d4) rather than emitted raw: double-array cells break the
      // driver's pandas comparator, and stringifying doubles would hit
      // engine-specific float formatting. Element extraction keeps the
      // compare in exact float64.
      val doubled = expr("transform(slice(embedding, 1, 4), x -> CAST(x AS DOUBLE) * 2)")
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          element_at(doubled, 1).as("d1"),
          element_at(doubled, 2).as("d2"),
          element_at(doubled, 3).as("d3"),
          element_at(doubled, 4).as("d4"),
          expr("size(filter(embedding, x -> x > 0))").cast("long").as("n_pos"),
          round(expr("aggregate(transform(embedding, x -> CAST(x AS DOUBLE)), CAST(0 AS DOUBLE), (a, x) -> a + x)"), 6).as("ssum"))
        .orderBy(col("vec_id").asc)
    },

    "map_ops" -> { (s, d) =>
      Tables.nation(s, d)
        .groupBy(col("n_regionkey"))
        .agg(map_from_entries(collect_list(struct(col("n_name"), col("n_nationkey")))).as("m"))
        .select(col("n_regionkey"),
          size(col("m")).cast("long").as("map_size"),
          array_join(sort_array(map_keys(col("m"))), "|").as("keys_sorted"),
          element_at(col("m"), "NATION_3").as("lookup_n3"))
        .orderBy(col("n_regionkey").asc)
    },

    // exists / forall quantifier HOFs over token arrays (codegen'd lambda
    // predicates — no UDF).
    "arr_exists_forall" -> { (s, d) =>
      Tables.documents(s, d)
        .withColumn("toks", split(lower(col("text")), " "))
        .select(col("doc_id"),
          expr("exists(toks, x -> x = 'spark')").as("has_spark"),
          expr("forall(toks, x -> length(x) <= 10)").as("all_short"),
          expr("size(filter(toks, x -> length(x) >= 6))").cast("long").as("n_long"))
        .orderBy(col("doc_id").asc)
    },

    // transform_keys / transform_values over a built map; output projected
    // to sorted entry strings (nested map outputs break the driver's pandas
    // comparator).
    "map_transform" -> { (s, d) =>
      Tables.nation(s, d)
        .groupBy(col("n_regionkey"))
        .agg(map_from_entries(collect_list(
          struct(col("n_name"), col("n_nationkey")))).as("m"))
        .select(col("n_regionkey"),
          expr("""array_join(transform(array_sort(map_entries(
            | transform_values(m, (k, v) -> v * 10))),
            | e -> concat(e.key, ':', e.value)), '|')"""
            .stripMargin.replace("\n", " ")).as("scaled"),
          expr("array_join(array_sort(map_keys(transform_keys(m, (k, v) -> lower(k)))), '|')")
            .as("lower_keys"))
        .orderBy(col("n_regionkey").asc)
    },

    // Array set algebra (union / intersect / except, all distinct-value
    // semantics) — projected to sorted joined strings for the comparator.
    "arr_set_ops" -> { (s, d) =>
      Tables.nation(s, d)
        .select(col("n_nationkey"),
          split(col("n_name"), "_").as("a"),
          split(lower(col("n_name")), "_").as("b"))
        .select(col("n_nationkey"),
          array_join(array_sort(array_union(col("a"), col("b"))), "|").as("u"),
          array_join(array_sort(array_intersect(col("a"), col("b"))), "|").as("i"),
          array_join(array_sort(array_except(col("a"), col("b"))), "|").as("x"))
        .orderBy(col("n_nationkey").asc)
    },

    // map_filter + map_zip_with — the remaining §2.H map HOFs. Same output
    // convention as map_transform: project maps to sorted entry strings
    // (nested map outputs break the driver's pandas comparator).
    "map_filter_zip" -> { (s, d) =>
      Tables.nation(s, d)
        .groupBy(col("n_regionkey"))
        .agg(map_from_entries(collect_list(
          struct(col("n_name"), col("n_nationkey")))).as("m"))
        .select(col("n_regionkey"),
          expr("""array_join(transform(array_sort(map_entries(
            | map_filter(m, (k, v) -> v % 2 = 0))),
            | e -> concat(e.key, ':', e.value)), '|')"""
            .stripMargin.replace("\n", " ")).as("evens"),
          expr("""array_join(transform(array_sort(map_entries(
            | map_zip_with(m, transform_values(m, (k, v) -> v * 10),
            |   (k, v1, v2) -> coalesce(v1, 0) + coalesce(v2, 0)))),
            | e -> concat(e.key, ':', e.value)), '|')"""
            .stripMargin.replace("\n", " ")).as("zipped"))
        .orderBy(col("n_regionkey").asc)
    },

    "str_misc" -> { (s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"),
          reverse(col("c_mktsegment")).as("rev_seg"),
          repeat(lit("ab"), 3).as("rep"),
          instr(col("c_name"), "#").cast("long").as("hash_pos"),
          ascii(col("c_mktsegment")).as("first_code"),
          expr("char(65 + CAST(c_custkey % 26 AS INT))").as("letter"),
          expr("left(c_name, 4)").as("l4"),
          expr("right(c_name, 3)").as("r3"))
        .orderBy(col("c_custkey").asc)
    },

    "math_bitwise" -> { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_partkey").bitwiseAND(lit(255L))).as("band"),
          (col("l_partkey").bitwiseOR(col("l_suppkey"))).as("bor"),
          (col("l_partkey").bitwiseXOR(col("l_suppkey"))).as("bxor"),
          shiftleft(col("l_linenumber"), 2).as("shl"),
          shiftright(col("l_partkey"), 3).as("shr"))
        .orderBy(col("l_orderkey").asc, col("l_linenumber").asc,
          col("band").asc, col("bxor").asc)
    },

    "json_get_parse" -> { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.IntegerType)))).getField("k").as("k_int"))
        .orderBy(col("event_id").asc)
    }
  )

  val oracles: Seq[(String, String)] = Seq(
    "str_basic" ->
      """SELECT c_custkey,
        |       upper(c_name) AS up_name,
        |       lower(c_mktsegment) AS lo_seg,
        |       trim('  ' || c_name || ' ') AS trimmed,
        |       substring(c_name, 1, 8) AS prefix8,
        |       length(c_name) AS name_len,
        |       concat_ws('|', c_mktsegment, c_name) AS seg_name
        |FROM customer
        |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,

    "str_split_regexp" ->
      """SELECT p_partkey,
        |       array_to_string(string_split(p_name, ' '), '|') AS name_tokens,
        |       regexp_extract(p_brand, 'Brand#(\d+)', 1) AS brand_num
        |FROM part
        |ORDER BY p_partkey ASC NULLS FIRST""".stripMargin,

    "str_replace_pad" ->
      """SELECT c_custkey,
        |       replace(c_name, 'Customer', 'Cust') AS short_name,
        |       translate(c_name, '#0', '-_') AS translated,
        |       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded
        |FROM customer
        |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,

    "date_extract_trunc" ->
      """SELECT o_orderkey,
        |       year(o_orderdate) AS yr,
        |       month(o_orderdate) AS mo,
        |       dayofmonth(o_orderdate) AS dom,
        |       dayofweek(o_orderdate) + 1 AS dow1,
        |       quarter(o_orderdate) AS qtr,
        |       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start
        |FROM orders
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,

    // Same cumulative-weekday closed form; epochDay via date_diff from
    // the epoch, everything non-negative so // matches div.
    "date_business_days" ->
      """WITH j AS (
        |  SELECT o_orderpriority,
        |         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + 3 AS m1,
        |         date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) + 3 AS m2
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |b AS (SELECT o_orderpriority,
        |             (5 * (m2 // 7) + least(m2 % 7, 5)) -
        |             (5 * (m1 // 7) + least(m1 % 7, 5)) AS busdays
        |      FROM j)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(busdays) AS BIGINT) AS sum_busdays,
        |       round(CAST(sum(busdays) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |         AS avg_busdays
        |FROM b GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin,

    "date_arith" ->
      """SELECT l_orderkey, l_linenumber,
        |       date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS ship_lag_days,
        |       CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS TIMESTAMP) AS plus3mo,
        |       CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS eom
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST,
        |         ship_lag_days ASC NULLS FIRST""".stripMargin,

    "ts_unix_convert" ->
      """SELECT event_id,
        |       epoch_us(ts) AS epoch_us,
        |       epoch_us(ts) // 1000000 AS epoch_s,
        |       make_timestamp(epoch_us(ts)) AS ts_rt
        |FROM events
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin,

    "math_basic" ->
      """SELECT l_orderkey, l_linenumber,
        |       abs(l_discount - 0.05) AS abs_disc,
        |       CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
        |       CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
        |       l_partkey % 7 AS mod7,
        |       pow(l_quantity, 2) AS qty_sq,
        |       round(ln(l_extendedprice), 6) AS ln_price,
        |       sqrt(l_quantity * l_quantity) AS sqrt_sq
        |FROM lineitem
        |ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST,
        |         abs_disc ASC NULLS FIRST, qty_sq ASC NULLS FIRST, ln_price ASC NULLS FIRST""".stripMargin,

    "cond_case_coalesce" ->
      """SELECT o_orderkey,
        |       CASE WHEN o_totalprice > 300000.0 THEN 'high'
        |            WHEN o_totalprice > 150000.0 THEN 'mid'
        |            ELSE 'low' END AS tier,
        |       coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_c,
        |       CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_urgent
        |FROM orders
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,

    "arr_explode_contains" ->
      """SELECT vec_id, i AS pos, embedding[i] AS val,
        |       len(embedding) AS dim,
        |       list_contains(embedding, embedding[1]) AS has_first
        |FROM embeddings CROSS JOIN (SELECT unnest(range(1, 5)) AS i) t
        |ORDER BY vec_id ASC NULLS FIRST, pos ASC NULLS FIRST""".stripMargin,

    "arr_explode_outer" ->
      """WITH f AS (SELECT vec_id, list_filter(embedding, x -> x > 0.25) AS l FROM embeddings)
        |SELECT vec_id,
        |       unnest(CASE WHEN len(l) = 0 THEN [CAST(NULL AS FLOAT)] ELSE l END) AS val
        |FROM f
        |ORDER BY vec_id ASC NULLS FIRST, val ASC NULLS FIRST""".stripMargin,

    "arr_zip_inline" ->
      """SELECT vec_id, embedding[i] AS x, embedding[i + 1] AS y
        |FROM embeddings CROSS JOIN (SELECT unnest(range(1, 4)) AS i) t
        |ORDER BY vec_id ASC NULLS FIRST, x ASC NULLS FIRST, y ASC NULLS FIRST""".stripMargin,

    "arr_transform_filter" ->
      """SELECT vec_id,
        |       list_transform(embedding[1:4], x -> CAST(x AS DOUBLE) * 2)[1] AS d1,
        |       list_transform(embedding[1:4], x -> CAST(x AS DOUBLE) * 2)[2] AS d2,
        |       list_transform(embedding[1:4], x -> CAST(x AS DOUBLE) * 2)[3] AS d3,
        |       list_transform(embedding[1:4], x -> CAST(x AS DOUBLE) * 2)[4] AS d4,
        |       len(list_filter(embedding, x -> x > 0)) AS n_pos,
        |       round(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)), (a, x) -> a + x), 6) AS ssum
        |FROM embeddings
        |ORDER BY vec_id ASC NULLS FIRST""".stripMargin,

    "arr_exists_forall" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents)
        |SELECT doc_id,
        |       list_contains(toks, 'spark') AS has_spark,
        |       len(list_filter(toks, x -> length(x) > 10)) = 0 AS all_short,
        |       CAST(len(list_filter(toks, x -> length(x) >= 6)) AS BIGINT) AS n_long
        |FROM t
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,

    // Same RESULT computed relationally — DuckDB needs no map type to pin
    // the semantics of the Spark-side map transforms.
    "map_transform" ->
      """SELECT n_regionkey,
        |       string_agg(n_name || ':' || CAST(n_nationkey * 10 AS VARCHAR), '|'
        |                  ORDER BY n_name ASC) AS scaled,
        |       string_agg(lower(n_name), '|' ORDER BY lower(n_name) ASC) AS lower_keys
        |FROM nation
        |GROUP BY n_regionkey
        |ORDER BY n_regionkey ASC NULLS FIRST""".stripMargin,

    "map_ops" ->
      """SELECT n_regionkey,
        |       count(*) AS map_size,
        |       string_agg(n_name, '|' ORDER BY n_name ASC) AS keys_sorted,
        |       max(CASE WHEN n_name = 'NATION_3' THEN n_nationkey END) AS lookup_n3
        |FROM nation
        |GROUP BY n_regionkey
        |ORDER BY n_regionkey ASC NULLS FIRST""".stripMargin,

    "arr_set_ops" ->
      """WITH t AS (SELECT n_nationkey,
        |             string_split(n_name, '_') AS a,
        |             string_split(lower(n_name), '_') AS b
        |           FROM nation)
        |SELECT n_nationkey,
        |       array_to_string(list_sort(list_distinct(a || b)), '|') AS u,
        |       array_to_string(list_sort(list_distinct(list_intersect(a, b))), '|') AS i,
        |       array_to_string(list_sort(list_distinct(
        |         list_filter(a, x -> NOT list_contains(b, x)))), '|') AS x
        |FROM t
        |ORDER BY n_nationkey ASC NULLS FIRST""".stripMargin,

    "map_filter_zip" ->
      """SELECT n_regionkey,
        |       coalesce(string_agg(
        |         CASE WHEN n_nationkey % 2 = 0
        |              THEN n_name || ':' || CAST(n_nationkey AS VARCHAR) END,
        |         '|' ORDER BY n_name ASC), '') AS evens,
        |       string_agg(n_name || ':' || CAST(n_nationkey + n_nationkey * 10 AS VARCHAR),
        |                  '|' ORDER BY n_name ASC) AS zipped
        |FROM nation
        |GROUP BY n_regionkey
        |ORDER BY n_regionkey ASC NULLS FIRST""".stripMargin,

    "str_misc" ->
      """SELECT c_custkey,
        |       reverse(c_mktsegment) AS rev_seg,
        |       repeat('ab', 3) AS rep,
        |       strpos(c_name, '#') AS hash_pos,
        |       ascii(c_mktsegment) AS first_code,
        |       chr(65 + (c_custkey % 26)::INT) AS letter,
        |       left(c_name, 4) AS l4,
        |       right(c_name, 3) AS r3
        |FROM customer
        |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,

    "math_bitwise" ->
      """SELECT l_orderkey, l_linenumber,
        |       l_partkey & 255 AS band,
        |       l_partkey | l_suppkey AS bor,
        |       xor(l_partkey, l_suppkey) AS bxor,
        |       l_linenumber << 2 AS shl,
        |       l_partkey >> 3 AS shr
        |FROM lineitem
        |ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST,
        |         band ASC NULLS FIRST, bxor ASC NULLS FIRST""".stripMargin,

    "json_get_parse" ->
      """SELECT event_id,
        |       json_extract_string(props, '$.k') AS k_str,
        |       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int
        |FROM events
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin
  )
}
