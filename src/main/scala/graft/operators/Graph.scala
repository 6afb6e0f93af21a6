package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph analytics over relations derived from the star schema — the
  * link-style computations a corpus/warehouse engine is asked for once
  * data has identity edges in it (who bought what, who co-supplies
  * what): PageRank centrality and triangle counting.
  *
  * The reference engine exposes its data as joinable Hive tables and
  * leaves iterative graph work to the query layer
  * (hiveka/README.md's join/group-by surface); here each operator IS
  * the Spark-native iterative plan, and — per the repo's oracle
  * convention — every score is ALL-INTEGER fixed-point so a DuckDB
  * replay decides identically (no float damping, no ulp drift across
  * 10 iterations).
  *
  * Scale shapes (100 TB framing):
  *  - PageRank: per-iteration cost is ONE join of the rank table
  *    against the edge list on its partitioning key plus ONE keyed
  *    aggregation — no driver-side state, no collect; the edge list is
  *    persisted and re-partitioned by src ONCE, so all 10 iterations
  *    reuse the same shuffle layout (Exchange reuse; ranks arrive
  *    hash-partitioned by node from the previous groupBy).
  *  - Triangles: the co-supply projection caps each part's supplier
  *    list at [[TriangleCap]] by salted-md5 rank BEFORE pairing, so a
  *    hot part (degree d) contributes at most Cap²/2 pairs instead of
  *    d²/2 — the documented, deterministic degree-capped projection
  *    every production triangle count at this scale uses. Wedge
  *    closure joins stay on (lo, hi) supplier keys.
  */
object Graph {

  /** Fixed-point scale: ranks carry 6 decimal digits (rank 1.0 ≡
    * 1,000,000). Damping 0.85 is applied as (85 * sum) div 100 —
    * BIGINT-exact. Total rank mass is conserved at ~SCALE·|V|, so a
    * per-node rank never exceeds SCALE·|V| < 2^63 for |V| up to ~9e12
    * nodes. */
  private val Scale = 1000000L
  private val Iters = 10

  /** q_pagerank — 10 damped PageRank iterations over the bipartite
    * customer↔part purchase graph (edge = customer ordered part,
    * both directions). Node ids disambiguate by parity:
    * customer → 2·custkey, part → 2·partkey+1.
    *
    * Every node in the edge list has out-degree ≥ 1 (each undirected
    * edge contributes both directions), so there is no dangling-mass
    * term and the node set is stable across iterations. Integer floor
    * division per hop (`rank div outdeg`, then `(85·Σ) div 100`)
    * makes all 10 iterations reproducible bit-for-bit in any engine.
    */
  val qPagerank: QueryDef = QueryDef(
    fn = (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      val ord = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val e0 = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_partkey") * 2 + 1).as("dst"))
        .distinct()
      // both directions; parity keeps them disjoint, so union-all is
      // already duplicate-free. Partition by src once — every
      // iteration's join and the degree aggregation reuse this layout.
      val edges = e0
        .union(e0.select(col("dst").as("src"), col("src").as("dst")))
        .repartition(col("src"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val deg = edges.groupBy(col("src"))
        .agg(count(lit(1)).as("outdeg"))
      var ranks = deg.select(col("src").as("node"), lit(Scale).as("rank_fp"))
      for (_ <- 1 to Iters) {
        val contrib = ranks.as("r")
          .join(deg.as("d"), col("r.node") === col("d.src"))
          .select(col("r.node").as("node"),
            expr("rank_fp div outdeg").as("c"))
        ranks = contrib.as("c")
          .join(edges.as("e"), col("c.node") === col("e.src"))
          .groupBy(col("e.dst").as("node"))
          .agg(expr("150000L + (85 * sum(c)) div 100").as("rank_fp"))
      }
      val out = ranks
        .select(
          when(col("node") % 2 === 0, lit("customer")).otherwise(lit("part"))
            .as("node_type"),
          expr("node div 2").as("node_key"),
          col("rank_fp"))
        .orderBy(col("node_type"), col("node_key"))
        .localCheckpoint(eager = true) // cut the 10-iteration lineage
      edges.unpersist()
      out
    },
    oracle = Some {
      val iters = (1 to Iters).map { i =>
        s"""r$i AS (
        SELECT e.dst AS node,
               CAST(150000 + (85 * sum(r.rank_fp // d.outdeg)) // 100 AS BIGINT)
                 AS rank_fp
        FROM r${i - 1} r
        JOIN deg d ON d.src = r.node
        JOIN edges e ON e.src = r.node
        GROUP BY e.dst)"""
      }.mkString(",\n      ")
      s"""
      WITH e0 AS (
        SELECT DISTINCT o_custkey * 2 AS src, l_partkey * 2 + 1 AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      edges AS (
        SELECT src, dst FROM e0
        UNION ALL SELECT dst AS src, src AS dst FROM e0),
      deg AS (
        SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY 1),
      r0 AS (
        SELECT src AS node, CAST(1000000 AS BIGINT) AS rank_fp FROM deg),
      $iters
      SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'part' END
               AS node_type,
             node // 2 AS node_key, rank_fp
      FROM r$Iters
      ORDER BY node_type, node_key"""
    })

  /** Per-part supplier-list cap for the co-supply projection (see
    * [[qTriangles]]): deterministic salted-md5 rank, so the capped
    * projection is reproducible and the oracle replays it exactly. */
  private val TriangleCap = 64

  /** q_triangles — triangle count per supplier in the co-supply graph
    * (edge = two suppliers shipped the same part). Degree-capped
    * projection (top-[[TriangleCap]] suppliers per part by salted md5)
    * → distinct (lo, hi) edges → wedge join (lo<mid<hi by key order)
    * → closing-edge join. Each closed triangle credits all three
    * corners; output is (suppkey, n_tri) over suppliers in ≥ 1
    * triangle.
    *
    * Scale: pair generation is the only superlinear step and the cap
    * bounds it at Cap²/2 per part; the wedge and closing joins key on
    * supplier pairs (skew-diluted by the pairing itself). No windows,
    * no driver state.
    */
  val qTriangles: QueryDef = QueryDef(
    fn = (s, dir) => {
      val e0 = Tables.load(s, dir, "lineitem")
        .select(col("l_partkey").as("p"), col("l_suppkey").as("sk"))
        .distinct()
      val byPart = e0.withColumn("rk",
        row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("p"))
            .orderBy(md5(concat_ws(":", lit("tri"), col("p"), col("sk"))),
              col("sk"))))
        .filter(col("rk") <= TriangleCap)
        .select(col("p"), col("sk"))
      val pairs = byPart.as("a")
        .join(byPart.as("b"),
          col("a.p") === col("b.p") && col("a.sk") < col("b.sk"))
        .select(col("a.sk").as("x"), col("b.sk").as("y"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      val wedges = pairs.as("p1")
        .join(pairs.as("p2"), col("p1.y") === col("p2.x"))
        .select(col("p1.x").as("x"), col("p1.y").as("y"), col("p2.y").as("z"))
      val tri = wedges.as("w")
        .join(pairs.as("p3"),
          col("w.x") === col("p3.x") && col("w.z") === col("p3.y"))
        .select(col("w.x").as("x"), col("w.y").as("y"), col("w.z").as("z"))
      val out = tri
        .select(explode(array(col("x"), col("y"), col("z"))).as("suppkey"))
        .groupBy(col("suppkey"))
        .agg(count(lit(1)).as("n_tri"))
        .orderBy(col("suppkey"))
        .localCheckpoint(eager = true)
      pairs.unpersist()
      out
    },
    oracle = Some(s"""
      WITH e0 AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS sk
                  FROM lineitem),
      capped AS (
        SELECT p, sk FROM (
          SELECT p, sk,
                 row_number() OVER (PARTITION BY p
                   ORDER BY md5('tri:' || CAST(p AS VARCHAR) || ':'
                                || CAST(sk AS VARCHAR)), sk) AS rk
          FROM e0) WHERE rk <= $TriangleCap),
      pairs AS (
        SELECT DISTINCT a.sk AS x, b.sk AS y
        FROM capped a JOIN capped b ON a.p = b.p AND a.sk < b.sk),
      tri AS (
        SELECT p1.x, p1.y, p2.y AS z
        FROM pairs p1
        JOIN pairs p2 ON p1.y = p2.x
        JOIN pairs p3 ON p3.x = p1.x AND p3.y = p2.y),
      corners AS (
        SELECT x AS suppkey FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri)
      SELECT suppkey, CAST(count(*) AS BIGINT) AS n_tri
      FROM corners GROUP BY suppkey
      ORDER BY suppkey"""))

  val defs: Map[String, QueryDef] = Map(
    "q_pagerank" -> qPagerank,
    "q_triangles" -> qTriangles)
}
