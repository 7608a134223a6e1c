package graft.tables

import org.apache.parquet.column.values.bloomfilter.BloomFilter
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._

/** FILE-LEVEL BLOOM FILTER INDEX for point lookups — the published
  * Hudi-bloom / Delta-bloom-index / parquet-bloom design, built entirely on
  * parquet's own split-block bloom filters (the parquet-format BloomFilter
  * spec): configured columns are written with
  * `parquet.bloom.filter.enabled#<col>` so every data file carries a
  * footer-addressed bloom bitset, and an equality predicate on such a
  * column is refuted per file by probing that bitset on the DRIVER —
  * no data pages read, one footer + one KB-scale bitset fetch per
  * surviving candidate.
  *
  * Zone maps (min/max) cannot prune hash-like high-cardinality columns
  * (UUIDs, user ids, document digests): every file's [min, max] spans the
  * whole domain, so interval analysis keeps everything. A bloom bitset
  * prunes exactly that shape. At 100 TB a `WHERE doc_id = '…'` lookup goes
  * from "read every file the zone maps kept" to "read the one file whose
  * bloom admits the value" — data-page I/O becomes O(matching files), with
  * an O(candidate files) driver-side metadata probe (bounded further by
  * [[GraftTable]]'s bitset cache, and only run when the predicate actually
  * carries an equality conjunct on an indexed column).
  *
  * Soundness: a bloom filter has no false negatives, so "definitely
  * absent" is proof no row matches the conjunct in that file; any missing
  * bitset (legacy file written before the index was configured, a block
  * the writer skipped, a type mismatch) answers "possibly present" and the
  * file is simply read — results stay bit-equal to the unindexed scan.
  */
private[tables] object BloomIndex {

  /** Point-lookup conjuncts of a resolved, constant-folded predicate:
    * logical column name → the non-null literal values one of which MUST
    * match for a row to survive. Only top-level `And` conjuncts qualify
    * (under an `Or` a branch is not necessary for the whole predicate);
    * `a IN (…)` contributes its non-null literals (a null element can only
    * yield NULL, which a filter drops, never TRUE — so an all-null or
    * empty list is a vacuously unsatisfiable lookup).
    */
  def pointLookups(pred: Expression): Map[String, Seq[Any]] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def attrName(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.nameParts.last)
      case a: Attribute => Some(a.name)
      case _ => None
    }
    val found: Seq[(String, Seq[Any])] = conjuncts(pred).flatMap {
      case EqualTo(a, Literal(v, _)) if v != null => attrName(a).map(_ -> Seq(v))
      case EqualTo(Literal(v, _), a) if v != null => attrName(a).map(_ -> Seq(v))
      case EqualNullSafe(a, Literal(v, _)) if v != null => attrName(a).map(_ -> Seq(v))
      case EqualNullSafe(Literal(v, _), a) if v != null => attrName(a).map(_ -> Seq(v))
      case In(a, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        attrName(a).map(_ -> vs.collect { case Literal(v, _) if v != null => v })
      case _ => None
    }
    // several qualifying conjuncts on one column are each individually
    // necessary — probing the one with the fewest values prunes hardest
    found.groupBy(_._1).map { case (c, pairs) =>
      c -> pairs.map(_._2).minBy(_.size)
    }
  }

  /** Could a row with `col ∈ values` exist in a file whose per-row-group
    * bloom state is `blocks` (parquet primitive type + the block's bitset,
    * None when the writer emitted none)? A value is possibly present when
    * ANY block either lacks a probeable bitset or admits the value's hash;
    * the file survives when ANY value is possibly present. Empty `values`
    * (an `IN ()` / `IN (NULL)` conjunct) matches no row: prune.
    */
  def maybePresent(blocks: Seq[(PrimitiveTypeName, Option[BloomFilter])],
      values: Seq[Any]): Boolean =
    values.exists { v =>
      blocks.exists { case (t, bfOpt) =>
        bfOpt match {
          case Some(bf) => hashOf(bf, t, v).forall(bf.findHash)
          case None => true // no bitset written: cannot refute
        }
      }
    }

  /** Map a Catalyst literal runtime value onto the column's parquet hash
    * domain. None (no refutation possible) on any mismatch — e.g. a LONG
    * literal never meets an INT32 chunk post-analysis (type coercion puts
    * the CAST on the column side and the conjunct is not extracted), but
    * guard anyway: a wrong hash domain would prune files that hold
    * matches.
    */
  private def hashOf(bf: BloomFilter, t: PrimitiveTypeName, v: Any): Option[Long] =
    (t, v) match {
      case (PrimitiveTypeName.INT32, i: java.lang.Integer) => Some(bf.hash(i.intValue))
      case (PrimitiveTypeName.INT32, s: java.lang.Short) => Some(bf.hash(s.intValue))
      case (PrimitiveTypeName.INT32, b: java.lang.Byte) => Some(bf.hash(b.intValue))
      case (PrimitiveTypeName.INT64, l: java.lang.Long) => Some(bf.hash(l.longValue))
      case (PrimitiveTypeName.BINARY, u)
          if u.getClass.getName.endsWith("UTF8String") || u.isInstanceOf[String] =>
        Some(bf.hash(Binary.fromString(u.toString)))
      case _ => None
    }
}
