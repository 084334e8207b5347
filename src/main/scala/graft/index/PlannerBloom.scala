package graft.index

import graft.prune.{BloomMightContain, ExprToDerbySql}
import org.apache.spark.sql.catalyst.expressions.{And, Expression, Or}

import scala.collection.mutable.ArrayBuffer

/** Planner-side bloom probing — the portability fallback for catalogs that
  * cannot host in-store probe functions. The embedded-Derby deployment
  * registers [[BloomProbe]]'s statics as SQL functions so the pruning query
  * evaluates bloom probes inside the store (one round trip, bytes never
  * leave the catalog); a remote catalog that cannot run JVM code (the
  * reference's stated real deployment is a network-attached relational
  * catalog, /root/reference/sqlx-sqlite/src/main.rs:89-90) has no such
  * seam. This module rewrites the SAME pruning decision into portable SQL:
  *
  *  - the stats-space predicate's And/Or spine is kept planner-side;
  *  - every bloom-free subtree prints to plain SQL and is SELECTed as a
  *    0/1 verdict column (`CASE WHEN p THEN 1 ELSE 0 END`);
  *  - every [[BloomMightContain]] leaf becomes a SELECT of the candidate
  *    row group's bloom BYTES, probed planner-side as rows stream;
  *  - the WHERE clause is the predicate with bloom terms as TRUE — the
  *    min/max over-approximation — so only min/max-surviving candidates
  *    ship their blooms at all.
  *
  * Equivalence note (why both modes keep IDENTICAL row groups): UNKNOWN
  * maps to FALSE at every leaf in both modes — a SQL WHERE drops UNKNOWN
  * rows, and `CASE WHEN p THEN 1 ELSE 0` yields 0 on UNKNOWN — and And/Or
  * are monotone in Kleene's F < U < T order, so a formula is TRUE under
  * three-valued evaluation iff it is TRUE with U→F substituted at the
  * leaves. Bloom leaves themselves are two-valued by construction (NULL
  * bloom ⇒ keep, both here and in the in-catalog rendering).
  */
private[index] object PlannerBloom {

  sealed trait Node
  /** Verdict of the i-th SELECTed bloom-free subtree. */
  final case class SqlLeaf(idx: Int) extends Node
  /** Probe of the j-th SELECTed bloom-bytes column against a key. */
  final case class BloomLeaf(colIdx: Int, probe: Either[Long, String]) extends Node
  final case class NAnd(l: Node, r: Node) extends Node
  final case class NOr(l: Node, r: Node) extends Node

  /** The decomposed predicate: evaluation tree + the printed SQL of each
    * bloom-free leaf + the distinct bloom columns whose bytes must ship. */
  final case class Split(root: Node, sqlLeaves: Seq[String], bloomCols: Seq[String])

  def split(statsPred: Expression): Split = {
    val sqlLeaves = ArrayBuffer.empty[String]
    val cols = ArrayBuffer.empty[String]
    def sqlLeaf(sql: String): SqlLeaf = { sqlLeaves += sql; SqlLeaf(sqlLeaves.size - 1) }
    def colIdx(c: String): Int = cols.indexOf(c) match {
      case -1 => cols += c; cols.size - 1
      case i  => i
    }
    def hasBloom(e: Expression): Boolean =
      e.exists(_.isInstanceOf[BloomMightContain])
    def go(e: Expression): Node = e match {
      case _ if !hasBloom(e)           => sqlLeaf(ExprToDerbySql.print(e))
      case And(l, r)                   => NAnd(go(l), go(r))
      case Or(l, r)                    => NOr(go(l), go(r))
      case BloomMightContain(c, probe) => BloomLeaf(colIdx(c), probe)
      // a bloom term under anything but the And/Or spine (the rewriter
      // never emits this): keep the whole subtree — sound, never exact
      case _                           => sqlLeaf("TRUE")
    }
    val root = go(statsPred)
    Split(root, sqlLeaves.toSeq, cols.toSeq)
  }

  /** Evaluate the spine for one candidate row. `sqlVerdicts(i)` is the
    * i-th leaf's 0/1 column; `blooms(j)` is the j-th bloom column's bytes
    * (null = no bloom attached ⇒ might match). */
  def eval(node: Node, sqlVerdicts: Array[Boolean], blooms: Array[Array[Byte]]): Boolean =
    node match {
      case SqlLeaf(i)   => sqlVerdicts(i)
      case NAnd(l, r)   => eval(l, sqlVerdicts, blooms) && eval(r, sqlVerdicts, blooms)
      case NOr(l, r)    => eval(l, sqlVerdicts, blooms) || eval(r, sqlVerdicts, blooms)
      case BloomLeaf(j, probe) =>
        val bytes = blooms(j)
        bytes == null || (probe match {
          case Left(v)  => BloomProbe.mightContainLong(bytes, v) == 1
          case Right(s) => BloomProbe.mightContainString(bytes, s) == 1
        })
    }
}
