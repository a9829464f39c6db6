package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2 — graph analytics over the part co-occurrence graph.
  *
  * The graph: vertices are parts, with an undirected edge between two
  * parts whenever some order contains both (the classic market-basket
  * co-occurrence graph; at sf0.01 that is ~2k vertices / ~116k edges).
  * Both operators are exact-integer computations, so the DuckDB oracle
  * twins hash-match bit-for-bit with no rounding discipline needed.
  *
  * Scale notes (100 TB):
  *  - Edge construction is ONE groupBy(l_orderkey) — orders have
  *    bounded line counts (≤7 here, ≤ a few hundred in any real schema),
  *    so the per-group pair fan-out is a small constant and the
  *    pair-distinct shuffle carries |E| rows, never |lineitem|².
  *  - `graph_triangle_count` uses degree orientation (each edge directed
  *    from its lower (degree, id) endpoint): every vertex's out-degree is
  *    O(√m), so Σ|N⁺(u) ∩ N⁺(v)| work is O(m^1.5) worst-case — the
  *    standard distributed bound — instead of Σ deg² of the naive wedge
  *    join. The intersection itself runs in the native codegen'd
  *    `graft_sorted_intersect_long` kernel over sorted adjacency arrays,
  *    so no wedge row is ever materialized or shuffled: the only big
  *    shuffles are the two adjacency joins, both keyed on a vertex id.
  *  - `graph_khop_reach` is frontier expansion (semi-naive BFS): each hop
  *    is one equi-join of the current frontier against the edge list,
  *    keyed on the frontier vertex, followed by a distinct. Work per hop
  *    is |frontier| × avg-degree; the seed set bounds the frontier, and
  *    at cluster scale the edge list would be bucketed by source vertex
  *    so every hop reuses one partitioning.
  */
object Graph {

  /** Distinct undirected co-occurrence edges (a < b), via one
    * groupBy(order) + in-row pair generation (sorted parts array, HOF
    * slice/transform — no self-join of the item table needed). */
  private def coEdges(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("pks"))
      // All in-order pairs (pks sorted ascending, so a < b by construction).
      // slice is 1-based; for 0-based element i the strict suffix starts at
      // i + 2, and slice clamps past the end, so `[i]` indexing never occurs
      // (no ANSI out-of-bounds risk, per the round-5 rule).
      .select(explode(expr(
        "flatten(transform(pks, (x, i) -> " +
          "transform(slice(pks, i + 2, size(pks)), y -> struct(x AS a, y AS b))))")).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .distinct()
  }

  /** Triangle census of a distinct canonical (a < b) edge list:
    * one row (n_nodes, n_edges, n_triangles). Degree-oriented
    * adjacency-intersection algorithm (object scaladoc); orientation
    * never changes the census, so any naive counter is a valid twin
    * (GraphSpec runs a seeded differential against one). */
  def triangleCensus(edges: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(edges.sparkSession)
    val deg = edges.select(col("a").as("v"))
      .unionAll(edges.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    // Orient each edge from its lower (deg, id) endpoint. deg is |V| rows
    // (tiny vs |E|) — broadcast at fixture scale; at 100 TB this becomes
    // a pair of vertex-keyed shuffle joins, still linear.
    val da = deg.select(col("v").as("a"), col("deg").as("da"))
    val db = deg.select(col("v").as("b"), col("deg").as("db"))
    val aFirst = struct(col("da"), col("a")) < struct(col("db"), col("b"))
    val oriented = edges.join(broadcast(da), "a").join(broadcast(db), "b")
      .select(when(aFirst, col("a")).otherwise(col("b")).as("src"),
        when(aFirst, col("b")).otherwise(col("a")).as("dst"))
    // Sorted out-adjacency per vertex; a triangle x<y<z (rank order) is
    // counted exactly once, at edge x→y, as z ∈ N⁺(x) ∩ N⁺(y).
    val adj = oriented.groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
    val triEdges = oriented
      .join(adj.select(col("src"), col("nbrs").as("nbrs_u")), "src")
      .join(adj.select(col("src").as("dst"), col("nbrs").as("nbrs_v")), "dst")
    val nTri = triEdges.agg(
      sum(expr("graft_sorted_intersect_long(nbrs_u, nbrs_v)")).as("n_triangles"))
    deg.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(edges.agg(count(lit(1)).as("n_edges")))
      .crossJoin(nTri)
      .select(col("n_nodes"), col("n_edges"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .orderBy(col("n_nodes").asc)
  }

  /** Exact fixed-point PageRank over a canonical (a < b) edge list:
    * `iters` synchronous power-iteration rounds in INTEGER arithmetic, so
    * the scores are bit-identical across engines and partitionings with no
    * floating-point discipline at all. Scale R0 = 10¹² per vertex;
    * contribution c(u) = r(u) div deg(u); next r(v) = (15·R0 div 100) +
    * (85 · Σ_{u∈N(v)} c(u)) div 100 — the d = 0.85 damped walk with every
    * division a floor division of NON-NEGATIVE integers (Spark's `div`
    * truncates toward zero, DuckDB's `//` floors; they agree exactly on
    * the non-negative domain, per the repo's integer-division rule).
    * Magnitudes: Σr ≤ |V|·R0 ≈ 2·10¹⁶ < 2⁶³. Each round is ONE
    * vertex-keyed join + ONE groupBy — the Pregel shape; at 100 TB the
    * edge list is bucketed by u so every round reuses one partitioning.
    * The round count is a constant of the QUERY (unrolled in the oracle
    * SQL as chained CTEs — recursive CTEs can't aggregate), not data-
    * dependent: no driver-side convergence loop is needed. */
  def pagerankFixed(edges: DataFrame, iters: Int): DataFrame = {
    // Hash-partition the edge list by its probe key ONCE before the
    // checkpoint: LogicalRDD carries the partitioning, so all `iters`
    // join probes below are exchange-free on the und side (the bucketed-
    // by-source layout a cluster deployment would maintain on disk).
    val und = edges.select(col("a").as("u"), col("b").as("v"))
      .unionAll(edges.select(col("b").as("u"), col("a").as("v")))
      .repartition(col("u"))
      .localCheckpoint(true)
    // deg is reused every round — checkpoint once. Broadcast hint is the
    // fixture-scale choice (|V| rows); at cluster scale drop the hint and
    // the v-keyed join co-partitions with the previous round's groupBy(v)
    // output, so only the und probe shuffles per round.
    val deg = und.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      .select(col("u").as("v"), col("deg"))
      .localCheckpoint(true)
    // Unlike labelPropagate there is NO driver-side convergence read, so
    // the whole iteration chains as ONE lazy plan: no per-round
    // materialization, and `r` is referenced exactly once per round
    // (the und symmetry guarantees every vertex has >= 1 in-edge, so the
    // contribution aggregate already covers all of them — no left join
    // back, no coalesce). First cut checkpointed every round and
    // re-referenced r twice: 8.5 s; this form runs the same 5 shuffles
    // inside one job.
    var r = deg.select(col("v"), lit(1000000000000L).as("r"))
    (1 to iters).foreach { _ =>
      val c = r.join(broadcast(deg), Seq("v"))
        .select(col("v").as("u"), expr("r div deg").as("c"))
      r = und.join(c, Seq("u"))
        .groupBy(col("v"))
        .agg((lit(150000000000L) + expr("85 * sum(c) div 100")).as("r"))
    }
    r.select(col("v").as("part"), col("r").as("pr_fixed"))
      .orderBy(col("part").asc)
  }

  /** Per-seed distinct 1-hop / ≤2-hop reachability counts (seed itself
    * excluded) over a canonical (a < b) edge list: (seed_part, reach1,
    * reach2). Two frontier joins + one min-hop aggregate; the hop marker
    * lets one pass emit both radii. */
  def khopReach(edges: DataFrame, seeds: DataFrame): DataFrame = {
    // Both directions: frontier expansion needs out-neighbors of every
    // vertex, and the canonical a<b list stores each edge once. Partition
    // by the probe key once and checkpoint — BOTH hop joins then probe it
    // exchange-free (same bucketed-by-source rationale as pagerankFixed).
    val und = edges.select(col("a").as("u"), col("b").as("v"))
      .unionAll(edges.select(col("b").as("u"), col("a").as("v")))
      .repartition(col("u"))
      .localCheckpoint(true)
    // Seeds are a filtered dimension slice — broadcast; the frontier
    // joins key on the edge source vertex. h1 feeds BOTH the hop union
    // and the h2 expansion — checkpoint it so the und join + distinct
    // run once, and release the handle after the aggregate below has
    // consumed it (the declared closure executes eagerly up to the
    // returned frame's checkpointed inputs).
    val h1 = broadcast(seeds).join(und, col("seed") === col("u"))
      .select(col("seed"), col("v")).distinct()
      .localCheckpoint(true)
    // The 2-hop set rides ADJACENCY ARRAYS, not exploded pair rows: the
    // naive form shuffles |h1| × avg-degree skinny rows TWICE (a 6M-row
    // min-hop aggregate at sf0.1); here the frontier joins the |V|-row
    // adjacency table and each seed's reach is one flatten+distinct over
    // its collected neighbor arrays — the same elements in ~|h1| packed
    // rows (measured 4.6 → 3.2 s on the whole query at sf0.1). Distinct
    // and size are order-independent, so packing changes no result. A
    // first cut of this query also ran a REDUNDANT distinct on the
    // exploded h2 rows — any dedup that immediately feeds an aggregate
    // on the same keys is free inside that aggregate's shuffle.
    val adj = und.groupBy(col("u")).agg(collect_list(col("v")).as("nbrs"))
    val h2sets = h1.join(adj, h1("v") === adj("u"))
      .groupBy(col("seed"))
      .agg(expr("array_distinct(flatten(collect_list(nbrs)))").as("n2"))
    val h1sets = h1.groupBy(col("seed")).agg(collect_set(col("v")).as("n1"))
    h1sets.join(h2sets, Seq("seed"))
      .select(col("seed").as("seed_part"),
        expr("CAST(size(filter(n1, x -> x != seed)) AS BIGINT)").as("reach1"),
        expr("CAST(size(filter(array_distinct(concat(n1, n2)), x -> x != seed)) AS BIGINT)")
          .as("reach2"))
      .orderBy(col("seed_part").asc)
  }

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // Global triangle census; the oracle counts the same triangles with
    // the orientation-free a<b<c three-way join — census is
    // orientation-invariant.
    "graph_triangle_count" -> { (s, d) =>
      // Edge list feeds degrees, orientation, adjacency, and the final
      // edge scan — eager localCheckpoint once instead of recomputing the
      // groupBy+explode+distinct pipeline four times (repo materialization
      // rule; declared closures keep the blocks alive for the driver's
      // later execution, matching the LlmOps pattern).
      triangleCensus(coEdges(s, d).localCheckpoint(true))
    },

    // 1-hop and ≤2-hop reach from the parts with p_size = 25.
    "graph_khop_reach" -> { (s, d) =>
      khopReach(
        coEdges(s, d).localCheckpoint(true),
        Tables.part(s, d).filter(col("p_size") === 25)
          .select(col("p_partkey").as("seed")))
    },

    // 5 rounds of exact integer-arithmetic damped PageRank (d = 0.85,
    // R0 = 10^12) — see pagerankFixed.
    "graph_pagerank" -> { (s, d) =>
      pagerankFixed(coEdges(s, d).localCheckpoint(true), iters = 5)
    }
  )

  private val edgeCte =
    """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |e AS (SELECT DISTINCT x.pk AS a, y.pk AS b
      |      FROM items x JOIN items y ON x.ok = y.ok AND x.pk < y.pk)""".stripMargin

  val oracles: Seq[(String, String)] = Seq(
    "graph_triangle_count" ->
      s"""$edgeCte,
        |tri AS (SELECT count(*) AS n_triangles
        |        FROM e e1 JOIN e e2 ON e1.b = e2.a
        |                  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |v AS (SELECT count(DISTINCT x) AS n_nodes
        |      FROM (SELECT a AS x FROM e UNION ALL SELECT b FROM e)),
        |ne AS (SELECT count(*) AS n_edges FROM e)
        |SELECT n_nodes, n_edges, n_triangles FROM v, ne, tri
        |ORDER BY n_nodes ASC NULLS FIRST""".stripMargin,

    "graph_khop_reach" ->
      s"""$edgeCte,
        |und AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
        |seeds AS (SELECT p_partkey AS seed FROM part WHERE p_size = 25),
        |h1 AS (SELECT DISTINCT seed, und.v FROM seeds JOIN und ON und.u = seed),
        |h2 AS (SELECT DISTINCT h1.seed, u2.v FROM h1 JOIN und u2 ON u2.u = h1.v),
        |m AS (SELECT seed, v, min(hop) AS mh
        |      FROM (SELECT seed, v, 1 AS hop FROM h1
        |            UNION ALL SELECT seed, v, 2 FROM h2)
        |      WHERE v <> seed GROUP BY seed, v)
        |SELECT seed AS seed_part,
        |       count(CASE WHEN mh = 1 THEN 1 END) AS reach1,
        |       count(*) AS reach2
        |FROM m GROUP BY seed
        |ORDER BY seed_part ASC NULLS FIRST""".stripMargin,

    // The identical integer recurrence with the 5 rounds UNROLLED as
    // chained CTEs (SQL recursive CTEs cannot aggregate in the recursive
    // term). `//` is DuckDB floor division == Spark `div` on this
    // non-negative domain.
    "graph_pagerank" -> {
      val rounds = (1 to 5).map { k =>
        s"""r$k AS (SELECT d.v,
           |            150000000000 + (85 * coalesce(s.sc, 0)) // 100 AS r,
           |            d.deg
           |      FROM dg d LEFT JOIN (
           |        SELECT und.v, sum(p.r // p.deg) AS sc
           |        FROM und JOIN r${k - 1} p ON p.v = und.u
           |        GROUP BY und.v) s ON s.v = d.v)""".stripMargin
      }
      s"""$edgeCte,
         |und AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
         |dg AS (SELECT u AS v, count(*) AS deg FROM und GROUP BY u),
         |r0 AS (SELECT v, CAST(1000000000000 AS BIGINT) AS r, deg FROM dg),
         |${rounds.mkString(",\n")}
         |SELECT v AS part, CAST(r AS BIGINT) AS pr_fixed FROM r5
         |ORDER BY part ASC NULLS FIRST""".stripMargin
    }
  )
}
