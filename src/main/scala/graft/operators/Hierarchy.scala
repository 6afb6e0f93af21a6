package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hierarchy flattening by POINTER JUMPING: resolve every node of a
  * parent-pointer forest (org chart, BOM, category tree, thread/reply
  * graph) to its root and depth in O(log depth) self-join rounds —
  * where naive iteration walks one parent edge per round and a
  * recursive CTE (which Spark lacks) materializes one row per
  * ancestor step. Each round substitutes every node's ancestor
  * pointer with the ancestor's OWN pointer and adds the distances, so
  * the pointed-to ancestor doubles in height per round: a depth-10⁶
  * chain resolves in ~20 rounds, each round one key-join plus a
  * lineage cut — the same relational-iteration discipline as
  * [[Dedup.clusters]] (checkpoint cuts, distributed convergence
  * check, loud failure on the iteration cap).
  */
object Hierarchy {

  /** Resolve (id, root_id, depth) for every node of `nodes` —
    * (`idCol`, `parentCol`) rows, root ⇔ parent == id. Non-root cycles
    * (corrupt input: a → b → a) never converge and fail LOUDLY at
    * `maxIter` rather than returning partial ancestors; 64 rounds
    * covers depth 2^63 (any acyclic input), so hitting the cap IS a
    * cycle diagnosis. Same checkpoint semantics as [[Dedup.clusters]]:
    * reliable when the session has a checkpoint dir (or forced via
    * `reliableCheckpoint`), executor-resident localCheckpoint
    * otherwise. */
  def resolveRoots(nodes: DataFrame, idCol: String, parentCol: String,
      maxIter: Int = 64,
      reliableCheckpoint: Option[Boolean] = None): DataFrame = {
    val hasDir = nodes.sparkSession.sparkContext.getCheckpointDir.isDefined
    val reliable = reliableCheckpoint.getOrElse(hasDir)
    require(!reliable || hasDir,
      "reliableCheckpoint=Some(true) requires sparkContext.setCheckpointDir(...)")
    def cut(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint(true)
    // state: (id, anc, d) — anc is an ancestor of id at distance d,
    // and (root, root, 0) for roots. Invariant kept by each round:
    // anc-pointers only ever point AT or ABOVE the previous round's.
    var cur = cut(nodes.select(col(idCol).as("id"),
      col(parentCol).as("anc"),
      when(col(parentCol) === col(idCol), lit(0L)).otherwise(lit(1L))
        .as("d")))
    // closure precheck, once: a parent id absent from the node set
    // would silently DROP its children from the jump join — corrupt
    // input fails loudly before the loop instead
    require(cur.select(col("anc"))
      .join(cur.select(col("id")), col("anc") === col("id"), "left_anti")
      .isEmpty,
      "graft: dangling parent pointer(s) — every parent id must itself " +
        "be a node (root ⇔ parent == id)")
    // converged ⇔ every ancestor pointer rests on a root (its own d=0)
    def unresolved(df: DataFrame): DataFrame = df.as("a")
      .join(df.as("b"), col("a.anc") === col("b.id"))
      .filter(col("b.d") > 0)
    var converged = unresolved(cur).isEmpty
    var i = 0
    while (!converged && i < maxIter) {
      // jump: anc := anc's anc, d := d + anc's d. A node whose anc is
      // already a root joins a (root, root, 0) row and is unchanged.
      val next = cut(cur.as("a")
        .join(cur.as("b"), col("a.anc") === col("b.id"))
        .select(col("a.id"), col("b.anc").as("anc"),
          (col("a.d") + col("b.d")).as("d")))
      converged = unresolved(next).isEmpty
      cur = next
      i += 1
    }
    require(converged,
      s"graft: hierarchy did not resolve in $maxIter pointer-jumping " +
        "rounds — at 2^" + maxIter + " reachable depth this means a " +
        "non-root CYCLE in the parent pointers (corrupt input), and " +
        "partial ancestors must not be returned as roots")
    cur.select(col("id"), col("anc").as("root_id"), col("d").as("depth"))
  }
}
