package graft.plans

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, ExprId, Expression, GetStructField, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.sources.AvroDecode

/** Projection pruning THROUGH Avro decode: when a projection only ever
  * reads a subset of a decoded payload's fields, rewrite the decode to
  * a pruned reader schema — Avro's schema resolution then *skips* the
  * unread fields byte-wise instead of materializing them. A topic with
  * a wide payload (e.g. a large `props` blob) projected to two columns
  * stops paying to decode the rest: the serde analogue of parquet
  * column pruning.
  *
  * Matches the shape CollapseProject leaves for a non-cheap expression
  * used more than once:
  * `Project [v.a, v.b] <- Project [..., AvroDecode(bytes) AS v, ...]`
  * and the fully-collapsed `GetStructField(AvroDecode(bytes), i)`.
  * Conservative: a decode (or its alias) consumed whole anywhere in
  * the consuming projection is left untouched.
  */
object AvroProjectionPruning extends Rule[LogicalPlan] {

  private def parse(json: String): Schema = new Schema.Parser().parse(json)

  /** Pruned copy of `d` keeping `ords` (sorted) of its OUTPUT fields,
    * with the old->new ordinal remap; the previous reader becomes the
    * writer so decode skips the rest byte-wise. For a permissive decode
    * the synthetic `_corrupt` output ordinal (== reader field count) is
    * not an Avro field: it is filtered from the pruned reader schema and
    * remapped to the tail of the pruned output. */
  private def prune(d: AvroDecode, ords: Seq[Int]): (AvroDecode, Map[Int, Int]) = {
    val reader = parse(d.schemaJson)
    val n = reader.getFields.size()
    val payload = ords.filter(_ < n)
    val sub = Schema.createRecord(reader.getName, reader.getDoc,
      reader.getNamespace, false,
      payload.map { i =>
        val f = reader.getFields.get(i)
        new Schema.Field(f.name(), f.schema(), f.doc(), f.defaultVal())
      }.asJava)
    val pruned = AvroDecode(d.child, sub.toString,
      d.writerSchemaJson.orElse(Some(d.schemaJson)), d.permissive)
    val remap = payload.zipWithIndex.toMap ++
      (if (d.permissive) Map(n -> payload.size) else Map.empty)
    (pruned, remap)
  }

  /** Width of the decode's OUTPUT struct (reader fields + the
    * permissive flag when present). */
  private def outWidth(d: AvroDecode): Int =
    parse(d.schemaJson).getFields.size() + (if (d.permissive) 1 else 0)

  /** Case 1: collapsed — GetStructField directly over AvroDecode. */
  private def pruneDirect(p: Project): Project = {
    val used = mutable.LinkedHashMap.empty[AvroDecode, mutable.SortedSet[Int]]
    val whole = mutable.Set.empty[AvroDecode]
    def scan(e: Expression): Unit = e match {
      case GetStructField(d: AvroDecode, ord, _) =>
        used.getOrElseUpdate(d, mutable.SortedSet.empty[Int]) += ord
        d.children.foreach(scan)
      case d: AvroDecode =>
        whole += d; d.children.foreach(scan)
      case other => other.children.foreach(scan)
    }
    p.projectList.foreach(scan)
    val prunable = used.filter { case (d, ords) =>
      !whole.contains(d) && ords.size < outWidth(d)
    }
    if (prunable.isEmpty) p
    else {
      val rewritten = prunable.map { case (d, ords) =>
        d -> prune(d, ords.toSeq)
      }.toMap
      val newList = p.projectList.map(_.transformDown {
        case GetStructField(d: AvroDecode, ord, name) if rewritten.contains(d) =>
          val (pruned, remap) = rewritten(d)
          GetStructField(pruned, remap(ord), name)
      }.asInstanceOf[NamedExpression])
      Project(newList, p.child)
    }
  }

  /** Case 2: decode aliased in the child Project, consumed via
    * GetStructField on its attribute in the parent. */
  private def pruneThroughAlias(p: Project): Project = p.child match {
    case cp: Project =>
      val decodeAliases: Map[ExprId, (Alias, AvroDecode)] = cp.projectList.collect {
        case a @ Alias(d: AvroDecode, _) => a.exprId -> (a, d)
      }.toMap
      if (decodeAliases.isEmpty) return p
      val used = mutable.LinkedHashMap.empty[ExprId, mutable.SortedSet[Int]]
      val whole = mutable.Set.empty[ExprId]
      def scan(e: Expression): Unit = e match {
        case GetStructField(ar: AttributeReference, ord, _) if decodeAliases.contains(ar.exprId) =>
          used.getOrElseUpdate(ar.exprId, mutable.SortedSet.empty[Int]) += ord
        case ar: AttributeReference if decodeAliases.contains(ar.exprId) =>
          whole += ar.exprId
        case other => other.children.foreach(scan)
      }
      p.projectList.foreach(scan)
      val prunable = used.filter { case (id, ords) =>
        !whole.contains(id) && ords.size < outWidth(decodeAliases(id)._2)
      }
      if (prunable.isEmpty) p
      else {
        val newAliases: Map[ExprId, (Alias, Map[Int, Int])] = prunable.map {
          case (id, ords) =>
            val (a, d) = decodeAliases(id)
            val (pruned, remap) = prune(d, ords.toSeq)
            val na = Alias(pruned, a.name)(exprId = a.exprId,
              qualifier = a.qualifier, explicitMetadata = a.explicitMetadata)
            id -> (na, remap)
        }.toMap
        val newLower = cp.projectList.map {
          case a: Alias if newAliases.contains(a.exprId) => newAliases(a.exprId)._1
          case other => other
        }
        val newUpper = p.projectList.map(_.transformDown {
          case GetStructField(ar: AttributeReference, ord, name) if newAliases.contains(ar.exprId) =>
            val (na, remap) = newAliases(ar.exprId)
            GetStructField(na.toAttribute, remap(ord), name)
        }.asInstanceOf[NamedExpression])
        Project(newUpper, Project(newLower, cp.child))
      }
    case _ => p
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p: Project => pruneThroughAlias(pruneDirect(p))
  }
}
