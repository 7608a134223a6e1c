package graft.tables

import scala.util.Random

import graft.SparkTestBase
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BindReferences, Expression, GenericInternalRow, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import GraftTable.KeyStats

/** Adversarial soundness property for the data-skipping interval analysis:
  * over randomized files, stats, and predicate trees, a file that
  * [[FilePruning.possible]] prunes must contain NO row matching the
  * predicate — where "matching" is decided by CATALYST'S OWN evaluator on
  * the same resolved, constant-folded expression `GraftTable.scan` uses, so
  * the property tests exactly the production semantics (null logic, type
  * coercion, UTF-8 vs UTF-16 ordering) with no re-implementation in the
  * test. Completeness is NOT asserted (pruning may always keep a file);
  * soundness is the wrong-results risk, and it must hold for every
  * generated case.
  */
class FilePruningPropertySpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("a", LongType), StructField("s", StringType)))

  /** The same resolve + constant-fold path as `GraftTable.scan`: the
    * UNBOUND condition (attribute refs, what `FilePruning` sees) plus its
    * bound twin for row-level evaluation.
    */
  private def resolve(pred: Column): (Expression, Expression) = {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val expr = empty.where(pred).queryExecution.analyzed.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }.getOrElse(Literal.TrueLiteral).transformUp {
      case e if e.foldable => Literal.create(e.eval(), e.dataType)
    }
    val attrs = empty.queryExecution.analyzed.output
    (expr, BindReferences.bindReference(expr, attrs, allowFailures = false))
  }

  private def evalRow(bound: Expression, a: java.lang.Long, s: String): Boolean = {
    val row = new GenericInternalRow(Array[Any](
      if (a == null) null else a.longValue,
      if (s == null) null else UTF8String.fromString(s)))
    bound.eval(row) == true
  }

  /** Stats exactly as the write path logs them: [min, max] over non-null
    * values (no entry when all values are null), null count, row count.
    */
  private def statsOf(rows: Seq[(java.lang.Long, String)]): Map[String, KeyStats] = {
    val n = rows.size.toLong
    val as = rows.map(_._1).filter(_ != null).map(_.longValue)
    val ss = rows.map(_._2).filter(_ != null)
    val ord = Ordering.fromLessThan[String](GraftTable.utf8Cmp(_, _) < 0)
    val aStats =
      if (as.isEmpty) None
      else Some("a" -> KeyStats("long", as.min.toString, as.max.toString,
        Some(n - as.size), Some(n)))
    val sStats =
      if (ss.isEmpty) None
      else Some("s" -> KeyStats("string", ss.min(ord), ss.max(ord),
        Some(n - ss.size), Some(n)))
    (aStats ++ sStats).toMap
  }

  // value pools biased toward collisions with the literal pools (boundary
  // hits matter more than uniform randomness), plus supplementary-plane
  // strings to keep the UTF-8-vs-UTF-16 ordering honest
  private def randLong(rnd: Random): java.lang.Long =
    if (rnd.nextInt(10) == 0) null
    else Long.box(rnd.nextInt(21) - 10L)
  private val stringPool: IndexedSeq[String] =
    IndexedSeq("", "a", "ab", "abc", "b", "ba", "z", "zz", "😀",
      "a😀", "�", "s01", "s09", "s10")
  private def randString(rnd: Random): String =
    if (rnd.nextInt(10) == 0) null else stringPool(rnd.nextInt(stringPool.size))

  /** Random predicate tree over (a, s) — supported shapes, unsupported
    * shapes (arithmetic, col-vs-col, functions), and both operand orders.
    */
  private def randPred(rnd: Random, depth: Int): Column = {
    def leaf(): Column = rnd.nextInt(14) match {
      case 0 => col("a") === lit(rnd.nextInt(21) - 10L)
      case 1 => col("a") > lit(rnd.nextInt(21) - 10L)
      case 2 => col("a") < lit(rnd.nextInt(21) - 10L)
      case 3 => lit(rnd.nextInt(21) - 10L) >= col("a")     // literal-first
      case 4 => col("a").between(rnd.nextInt(10) - 10L, rnd.nextInt(10) + 1L)
      case 5 => col("a").isin(rnd.nextInt(5) - 2L, rnd.nextInt(21) - 10L, 99L)
      case 6 => col("a").isNull
      case 7 => col("s") === lit(stringPool(rnd.nextInt(stringPool.size)))
      case 8 => col("s") >= lit(stringPool(rnd.nextInt(stringPool.size)))
      case 9 => col("s").startsWith(stringPool(rnd.nextInt(stringPool.size)))
      case 10 => col("s").isNull
      case 11 => col("a") % 2 === 0                         // unsupported: arithmetic
      case 12 => length(col("s")) > lit(1)                  // unsupported: function
      case 13 => col("s") <=> lit(null)                     // null-safe null
    }
    if (depth == 0) leaf()
    else rnd.nextInt(4) match {
      case 0 => randPred(rnd, depth - 1) && randPred(rnd, depth - 1)
      case 1 => randPred(rnd, depth - 1) || randPred(rnd, depth - 1)
      case 2 => !randPred(rnd, depth - 1)
      case 3 => leaf()
    }
  }

  test("pruning is SOUND: a pruned file never contains a matching row") {
    val rnd = new Random(20260814L) // fixed seed: reproducible failures
    var pruned = 0
    var kept = 0
    for (iter <- 1 to 120) {
      val files: Seq[Seq[(java.lang.Long, String)]] =
        Seq.fill(rnd.nextInt(4) + 2)(
          Seq.fill(rnd.nextInt(6) + 1)((randLong(rnd), randString(rnd))))
      val pred = randPred(rnd, rnd.nextInt(3))
      val (unbound, bound) = resolve(pred)
      files.zipWithIndex.foreach { case (rows, fi) =>
        val possible = FilePruning.possible(unbound, statsOf(rows))
        if (possible) kept += 1
        else {
          pruned += 1
          rows.foreach { case (a, s) =>
            assert(!evalRow(bound, a, s),
              s"iter $iter file $fi: pruned but row (a=$a, s=$s) matches " +
                s"predicate $pred with stats ${statsOf(rows)}")
          }
        }
      }
    }
    // the generator must actually exercise the pruning path, not just the
    // conservative fallthrough — otherwise the property is vacuous
    assert(pruned > 50, s"generator too weak: only $pruned prunes vs $kept keeps")
  }
}
