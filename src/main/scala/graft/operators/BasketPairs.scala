package graft.operators

import org.apache.spark.sql.DataFrame
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
  * The expansion itself stays inside WHOLE-STAGE CODEGEN: a first
  * `posexplode` picks the index-i element, `slice(arr, i + 2, size(arr))`
  * exploded again yields every LATER element — both Generate nodes and the
  * `slice`/`least`/`greatest` expressions are codegen-native. (The previous
  * phrasing built the pair array with `transform`/`filter` lambdas, which
  * are CodegenFallback — interpreted per basket row — and measurably lost
  * to the codegen'd self-join on dense ~25-element baskets.)
  *
  * Two grains, matching the two self-join semantics in the query packs:
  *   - [[explodePairsMulti]]: baskets WITH duplicates (collect_list) — each
  *     unordered index pair {i, j} with distinct values yields one
  *     (least, greatest) row, exactly the multiset `a.v < b.v` produces.
  *   - [[explodePairsDistinct]] / [[explodeTriplesDistinct]]:
  *     distinct-element baskets (collect_set) — each value pair v1 < v2
  *     (triple v1 < v2 < v3) once.
  */
object BasketPairs {

  /** All (least, greatest) = (p1, p2) value pairs over unordered index
    * pairs with distinct values — duplicates in the array contribute
    * multiplicity, null-free input assumed (the callers project non-null
    * keys). Input: any frame exposing array column `arr`; output: exactly
    * the columns (p1, p2).
    */
  def explodePairsMulti(df: DataFrame, arr: String): DataFrame =
    explodePairs(df, arr, dropEqual = true)

  /** All value pairs p1 < p2 of a DISTINCT-element array, each once. */
  def explodePairsDistinct(df: DataFrame, arr: String): DataFrame =
    explodePairs(df, arr, dropEqual = false)

  private def explodePairs(df: DataFrame, arr: String,
      dropEqual: Boolean): DataFrame = {
    val raw = df
      .select(col(arr), posexplode(col(arr)).as(Seq("__i", "__x")))
      // slice is 1-based: start i + 2 is 0-based index i + 1 — every
      // element AFTER the posexploded one, each unordered index pair once
      .select(col("__x"),
        explode(expr(s"slice($arr, __i + 2, size($arr))")).as("__y"))
    // equal-valued index pairs are dropped on the multiset grain (the
    // a.v < b.v join never pairs a value with itself); a distinct-element
    // array cannot produce them, so the comparison is skipped there
    val kept = if (dropEqual) raw.where(!(col("__x") <=> col("__y"))) else raw
    kept.select(least(col("__x"), col("__y")).as("p1"),
      greatest(col("__x"), col("__y")).as("p2"))
  }

  /** All value triples b1 < b2 < b3 of a DISTINCT-element array, each once.
    * Each unordered index triple {i, j, k} appears exactly once in the
    * nested slice expansion; with distinct values the sorted emission
    * (least / strictly-between / greatest) is the v1 < v2 < v3 triple.
    */
  def explodeTriplesDistinct(df: DataFrame, arr: String): DataFrame = {
    val xyz = df
      .select(col(arr), posexplode(col(arr)).as(Seq("__i", "__x")))
      .select(col(arr), col("__i"), col("__x"),
        posexplode(expr(s"slice($arr, __i + 2, size($arr))"))
          .as(Seq("__j", "__y")))
      // __j is 0-based within the first slice: absolute 0-based index of
      // __y is __i + 1 + __j, so the later-than-__y slice starts (1-based)
      // at __i + __j + 3
      .select(col("__x"), col("__y"),
        explode(expr(s"slice($arr, __i + __j + 3, size($arr))")).as("__z"))
    val lo = least(col("__x"), col("__y"), col("__z"))
    val hi = greatest(col("__x"), col("__y"), col("__z"))
    val mid = when(col("__x") =!= lo && col("__x") =!= hi, col("__x"))
      .when(col("__y") =!= lo && col("__y") =!= hi, col("__y"))
      .otherwise(col("__z"))
    xyz.select(lo.as("b1"), mid.as("b2"), hi.as("b3"))
  }
}
