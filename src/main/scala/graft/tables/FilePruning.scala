package graft.tables

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._

import GraftTable.KeyStats

/** Data-skipping interval analysis: decide from a file's per-column
  * [min, max] ranges whether a predicate could POSSIBLY match any row in the
  * file. Sound by construction — every unknown shape answers "possibly yes"
  * (the file is read and the row filter decides), so pruning can only ever
  * remove files that provably hold no match:
  *
  *   - `And` needs both sides possible; `Or` needs either.
  *   - comparisons (`= <> < <= > >= IN BETWEEN startsWith`) between a plain
  *     column and literals check interval intersection — longs numerically,
  *     strings in unsigned UTF-8 byte order (parquet's own stats order).
  *   - `Not`, null tests (no null counts are logged), casts, functions,
  *     column-vs-column comparisons: conservative "possibly".
  *
  * This is the published zone-map / small-materialized-aggregates design
  * (Moerkotte, VLDB '98; the Delta paper's data-skipping stats), evaluated
  * on the DRIVER over O(files) log entries — no cluster work for a pruned
  * file.
  */
private[tables] object FilePruning {

  /** Could a row satisfying `pred` exist in a file with column ranges `iv`?
    * Columns absent from `iv` (no stats logged) are unconstrained.
    */
  def possible(pred: Expression, iv: Map[String, KeyStats]): Boolean = pred match {
    case And(l, r) => possible(l, iv) && possible(r, iv)
    case Or(l, r) => possible(l, iv) || possible(r, iv)

    // `c IS NULL` (and `c <=> NULL`) is impossible in a file whose logged
    // null COUNT is zero; these must match BEFORE the generic comparison
    // cases below (whose guards treat null literals as "possibly"). The
    // other direction (isNotNull pruning all-null files) never fires —
    // all-null columns carry no [min, max] entry.
    case IsNull(a) => nullsPossible(a, iv)
    case EqualNullSafe(a, Literal(null, _)) => nullsPossible(a, iv)
    case EqualNullSafe(Literal(null, _), a) => nullsPossible(a, iv)

    case EqualTo(x, y) => cmp(x, y, iv)(contains, contains)
    case EqualNullSafe(x, y) => cmp(x, y, iv)(contains, contains)
    case LessThan(x, y) => cmp(x, y, iv)(
      minBelow(_, _, strict = true), maxAbove(_, _, strict = true))
    case LessThanOrEqual(x, y) => cmp(x, y, iv)(
      minBelow(_, _, strict = false), maxAbove(_, _, strict = false))
    case GreaterThan(x, y) => cmp(x, y, iv)(
      maxAbove(_, _, strict = true), minBelow(_, _, strict = true))
    case GreaterThanOrEqual(x, y) => cmp(x, y, iv)(
      maxAbove(_, _, strict = false), minBelow(_, _, strict = false))

    case In(a, values) if values.forall(isLit) =>
      values.exists(v => point(a, v, iv)(contains))

    case StartsWith(a, l) => prefixPossible(a, l, iv)

    // `col.between(lo, hi)` arrives as And(>=, <=) and is covered above;
    // everything else — Not, IsNull/IsNotNull (no null counts in the log),
    // casts, functions, column-vs-column — cannot disprove a match here.
    case _ => true
  }

  private def isLit(e: Expression): Boolean = e.isInstanceOf[Literal]

  /** Could the column hold a null in this file? Unknown → possibly. */
  private def nullsPossible(attr: Expression, iv: Map[String, KeyStats]): Boolean =
    attrName(attr) match {
      case Some(name) => iv.get(name).forall(_.nulls.forall(_ > 0L))
      case None => true
    }

  /** Dispatch a binary comparison in either operand order: `col OP lit`
    * uses `fwd`, `lit OP col` uses the mirrored `rev`; anything else
    * (two columns, two literals, nested expressions) is "possibly".
    */
  private def cmp(x: Expression, y: Expression, iv: Map[String, KeyStats])(
      fwd: (KeyStats, Any) => Boolean, rev: (KeyStats, Any) => Boolean): Boolean =
    if (isLit(y) && !isLit(x)) point(x, y, iv)(fwd)
    else if (isLit(x) && !isLit(y)) point(y, x, iv)(rev)
    else true

  private def attrName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.nameParts.last)
    case a: Attribute => Some(a.name)
    case _ => None
  }

  /** Apply `check(stats, literal)` when the comparison is a plain column vs
    * a literal AND the literal's runtime shape matches the stats kind;
    * anything else is "possibly".
    */
  private def point(attr: Expression, lit: Expression,
      iv: Map[String, KeyStats])(check: (KeyStats, Any) => Boolean): Boolean = {
    (attrName(attr), lit) match {
      case (Some(name), Literal(v, dt)) if v != null =>
        iv.get(name).forall { s =>
          coerce(s, v, dt) match {
            case Some(cv) => check(s, cv)
            case None => true // kind mismatch (e.g. double literal): no prune
          }
        }
      case _ => true
    }
  }

  /** Literal runtime value → the stats domain: Catalyst integrals (Byte …
    * Long) and date days (Int) are Long; Timestamp[NTZ] literals ARE epoch
    * micros longs internally, matching the logged "ts"/"tsn" micros —
    * gated on the literal's DATATYPE so a plain bigint literal can never
    * be misread as micros (and instant vs wall-clock stats never cross);
    * strings (UTF8String) compare as UTF-8 bytes. Anything else (double,
    * decimal …) disables pruning for that conjunct.
    */
  private def coerce(s: KeyStats, v: Any, dt: org.apache.spark.sql.types.DataType): Option[Any] = (s.kind, v) match {
    case ("long", n: java.lang.Number) if !n.isInstanceOf[java.lang.Double] &&
      !n.isInstanceOf[java.lang.Float] => Some(n.longValue)
    case ("ts", n: java.lang.Long)
      if dt == org.apache.spark.sql.types.TimestampType => Some(n.longValue)
    case ("tsn", n: java.lang.Long)
      if dt == org.apache.spark.sql.types.TimestampNTZType => Some(n.longValue)
    case ("string", u) if u.getClass.getName.endsWith("UTF8String") ||
      u.isInstanceOf[String] => Some(u.toString)
    case _ => None
  }

  private def contains(s: KeyStats, v: Any): Boolean = s.kind match {
    case "long" | "ts" | "tsn" =>
      val x = v.asInstanceOf[Long]; s.min.toLong <= x && x <= s.max.toLong
    case "string" =>
      val x = v.toString
      GraftTable.utf8Cmp(s.min, x) <= 0 && GraftTable.utf8Cmp(x, s.max) <= 0
    case _ => true
  }

  /** `col < v` (strict) / `col <= v`: possible iff the file MIN is below. */
  private def minBelow(s: KeyStats, v: Any, strict: Boolean): Boolean = s.kind match {
    case "long" | "ts" | "tsn" =>
      val x = v.asInstanceOf[Long]
      if (strict) s.min.toLong < x else s.min.toLong <= x
    case "string" =>
      val c = GraftTable.utf8Cmp(s.min, v.toString)
      if (strict) c < 0 else c <= 0
    case _ => true
  }

  /** `col > v` (strict) / `col >= v`: possible iff the file MAX is above. */
  private def maxAbove(s: KeyStats, v: Any, strict: Boolean): Boolean = s.kind match {
    case "long" | "ts" | "tsn" =>
      val x = v.asInstanceOf[Long]
      if (strict) s.max.toLong > x else s.max.toLong >= x
    case "string" =>
      val c = GraftTable.utf8Cmp(s.max, v.toString)
      if (strict) c > 0 else c >= 0
    case _ => true
  }

  /** `startsWith(col, p)`: no match is provable in exactly two cases —
    * max < p (every value sorts strictly below every p-prefixed value), or
    * min > p AND min does not itself start with p (then min's first
    * difference from p is an UPWARD byte inside p's length, so every value
    * ≥ min sorts above every p-prefixed value). Both arguments compare in
    * UTF-8 byte order, matching the logged stats.
    */
  private def prefixPossible(attr: Expression, lit: Expression,
      iv: Map[String, KeyStats]): Boolean = {
    (attrName(attr), lit) match {
      case (Some(name), Literal(v, _)) if v != null =>
        iv.get(name).forall { s =>
          if (s.kind != "string") true
          else {
            val p = v.toString
            val maxBelowPrefix = GraftTable.utf8Cmp(s.max, p) < 0
            val minAbovePrefix =
              GraftTable.utf8Cmp(s.min, p) > 0 && !s.min.startsWith(p)
            !(maxBelowPrefix || minAbovePrefix)
          }
        }
      case _ => true
    }
  }
}
