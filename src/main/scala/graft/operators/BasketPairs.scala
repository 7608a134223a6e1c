package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Basket-local co-occurrence expansion — the one-shuffle replacement for
  * the textbook `items a JOIN items b ON a.k = b.k AND a.v < b.v` self-join.
  *
  * The self-join phrasing exchanges the fact table TWICE (both join inputs
  * hash on the basket key) before the pair aggregation's own exchange.
  * Grouping each basket to an array and expanding combinations locally
  * costs ONE exchange of the fact table; the expanded candidate stream
  * partial-aggregates map-side before the (p1, p2) shuffle. Fan-out per
  * basket is structural — C(|basket|, 2) / C(|basket|, 3) — the same bound
  * the self-join's per-key product carries, so skew behavior is unchanged.
  *
  * Two variants, matching the two self-join semantics in the query packs:
  *   - [[pairsMulti]]: index-based, for baskets WITH duplicates — each
  *     unordered index pair with distinct values yields one (least,
  *     greatest) row, exactly the multiset `a.v < b.v` produces.
  *   - [[pairsDistinct]] / [[triplesDistinct]]: value-based, for
  *     distinct-element baskets (collect_set) — each value pair v1 < v2
  *     (triple v1 < v2 < v3) once.
  */
object BasketPairs {

  /** All (least, greatest) value pairs over index pairs j > i with distinct
    * values — duplicates in `elems` contribute multiplicity, null-free
    * input assumed (the callers project non-null keys).
    */
  def pairsMulti(e: String): Column = {
    expr(s"""flatten(transform($e, (x, i) ->
      |  transform(
      |    filter($e, (y, j) -> j > i AND NOT (y <=> x)),
      |    y -> struct(least(x, y) AS p1, greatest(x, y) AS p2))))""".stripMargin)
  }

  /** All value pairs p1 < p2 of a DISTINCT-element array, each once. */
  def pairsDistinct(e: String): Column = {
    expr(s"""flatten(transform($e, x ->
      |  transform(filter($e, y -> y > x),
      |    y -> struct(x AS p1, y AS p2))))""".stripMargin)
  }

  /** All value triples b1 < b2 < b3 of a DISTINCT-element array, each once. */
  def triplesDistinct(e: String): Column = {
    expr(s"""flatten(transform($e, x ->
      |  flatten(transform(filter($e, y -> y > x), y ->
      |    transform(filter($e, z -> z > y),
      |      z -> struct(x AS b1, y AS b2, z AS b3))))))""".stripMargin)
  }
}
