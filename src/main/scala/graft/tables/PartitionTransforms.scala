package graft.tables

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** HIDDEN / TRANSFORM PARTITIONING — the published Iceberg partition-spec
  * design: a partition value is a TRANSFORM of a source column
  * (`bucket(16, k)`, `days(ts)`, `truncate(4, s)`), not necessarily the
  * column itself. The user writes and queries the SOURCE column; the layout
  * and the pruning ride the transform invisibly ("hidden"):
  *
  *   - write side: [[GraftTable.writeData]] computes each spec's shadow
  *     column with [[PartSpec.shadow]] and hive-partitions the files by it,
  *     so the commit log records the transform value per file.
  *   - read side: `scan(pred)` maps each equality / IN conjunct on a
  *     transform's source column through the SAME shadow expression
  *     ([[transformedValues]]) and keeps only files whose logged partition
  *     value one of the transformed literals hits — a driver-side map probe
  *     over O(files) log entries, no footer or data IO.
  *
  * Why it matters at 100 TB: zone maps already prune RANGE predicates on
  * clustered columns, but a hash-spread key (`user_id = …` on a table laid
  * out by time) defeats min/max entirely. `bucket(N, user_id)` bounds that
  * lookup to 1/N of the files before bloom filters or footers are even
  * consulted, and `days(ts)` gives time locality without the user ever
  * naming a derived day column — the classic Iceberg pitch ("queries don't
  * depend on the table's physical layout").
  *
  * Consistency by construction: prune-time transform evaluation executes
  * the EXACT Column expression the writer used (one tiny local job over the
  * literal values), so write and prune can never disagree on a transform's
  * output — the failure mode that would silently drop matching files.
  *
  * Spec strings are canonical (`bucket(8,k)`, `days(ts)`, `truncate(4,s)`,
  * bare `col` for identity) and double as the log encoding and the
  * partition-tuple key. Identity-only tables keep the legacy comma-joined
  * log encoding bit-for-bit (old tables read unchanged).
  */
private[tables] object PartitionTransforms {

  sealed trait PartSpec {
    /** The TABLE column the transform derives from. */
    def sourceCol: String

    /** Canonical spec string — the log encoding AND the pv tuple key.
      * Identity renders as the bare column name, so identity tables'
      * logs and partition tuples are byte-identical to the pre-transform
      * format.
      */
    def render: String

    /** The partition value expression over the source column (cast to
      * string + hive-escaped by the writer, like any partition value).
      * `dt` is the source column's type IN THE DATA BEING WRITTEN.
      */
    def shadow(src: Column, dt: DataType): Column

    /** Can this transform partition a column of `dt`? Checked at create /
      * replace, so a bad spec fails the definition, not the first write.
      */
    def accepts(dt: DataType): Boolean
  }

  /** The classic column-value partition (pre-transform behavior). */
  final case class Identity(sourceCol: String) extends PartSpec {
    def render: String = sourceCol
    def shadow(src: Column, dt: DataType): Column = src
    def accepts(dt: DataType): Boolean = true
  }

  /** Murmur3(seed 42 — `functions.hash`) mod n, always in [0, n). Hash
    * distribution is deterministic across executors and JVMs (Spark's
    * codegen'd Murmur3Hash), which the prune contract requires.
    */
  final case class Bucket(n: Int, sourceCol: String) extends PartSpec {
    def render: String = s"bucket($n,$sourceCol)"
    def shadow(src: Column, dt: DataType): Column = pmod(hash(src), lit(n))
    def accepts(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType | StringType |
           DateType => true
      case _ => false
    }
  }

  /** `days` / `months` / `years` over a date or timestamp column (the
    * timestamp→date cast uses the session time zone — the same zone the
    * prune-time evaluation runs under, so the two always agree).
    */
  final case class TimeUnit(unit: String, sourceCol: String) extends PartSpec {
    def render: String = s"$unit($sourceCol)"
    def shadow(src: Column, dt: DataType): Column = unit match {
      case "days" => src.cast(DateType)
      case "months" => trunc(src.cast(DateType), "MONTH")
      case "years" => trunc(src.cast(DateType), "YEAR")
    }
    def accepts(dt: DataType): Boolean =
      dt == DateType || dt == TimestampType || dt == TimestampNTZType
  }

  /** Width-`w` truncation: strings keep their first `w` chars (prefix
    * locality — ids, paths); integrals floor to a multiple of `w`
    * (`v - pmod(v, w)`, floor-toward-−∞ like Iceberg's truncate).
    */
  final case class Truncate(w: Int, sourceCol: String) extends PartSpec {
    def render: String = s"truncate($w,$sourceCol)"
    def shadow(src: Column, dt: DataType): Column = dt match {
      case StringType => substring(src, 1, w)
      case _ => src - pmod(src, lit(w).cast(dt))
    }
    def accepts(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType | StringType => true
      case _ => false
    }
  }

  private val BucketRe = """bucket\(\s*(\d+)\s*,\s*([^)]+?)\s*\)""".r
  private val UnitRe = """(days|months|years)\(\s*([^)]+?)\s*\)""".r
  private val TruncRe = """truncate\(\s*(\d+)\s*,\s*([^)]+?)\s*\)""".r

  /** Parse a canonical spec string (loud on anything else — an unknown
    * transform in the log must never silently degrade to identity, which
    * would mis-key every partition tuple).
    */
  def parse(s: String): PartSpec = s.trim match {
    case BucketRe(n, c) =>
      require(n.toLong > 0 && n.toLong <= Int.MaxValue, s"bucket count in '$s' out of range")
      Bucket(n.toInt, c)
    case UnitRe(u, c) => TimeUnit(u, c)
    case TruncRe(w, c) =>
      require(w.toLong > 0 && w.toLong <= Int.MaxValue, s"truncate width in '$s' out of range")
      Truncate(w.toInt, c)
    case c if c.nonEmpty && !c.contains("(") => Identity(c)
    case other => throw new IllegalArgumentException(
      s"unsupported partition spec '$other' (want col, bucket(n,col), " +
        "days/months/years(col), or truncate(w,col))")
  }

  /** Validate `specs` against a table schema: source columns exist, types
    * are transformable, and no two specs collide on the canonical render
    * (one physical dir level each).
    */
  def validate(specs: Seq[PartSpec], schema: StructType): Unit = {
    specs.foreach { sp =>
      val f = schema.fields.find(_.name == sp.sourceCol).getOrElse(
        throw new IllegalArgumentException(s"partition spec '${sp.render}': " +
          s"no column '${sp.sourceCol}' in ${schema.fieldNames.mkString(",")}"))
      require(sp.accepts(f.dataType), s"partition spec '${sp.render}' does " +
        s"not support column type ${f.dataType.simpleString}")
    }
    val renders = specs.map(_.render)
    require(renders.distinct == renders,
      s"duplicate partition specs: ${renders.mkString(", ")}")
  }

  /** The partition-value STRING each literal would be written under —
    * evaluated with the writer's own shadow expression over a one-partition
    * local frame (O(values) rows, a sub-millisecond local job), so
    * prune-time and write-time values agree by construction. None = the
    * values don't round-trip through `dt` or the expression fails here; the
    * caller must then not prune on this spec. Inner None = the transform of
    * that literal is null (its matches live in the null-partition dir).
    */
  def transformedValues(spark: SparkSession, sp: PartSpec, dt: DataType,
      values: Seq[Any]): Option[Seq[Option[String]]] = {
    import scala.jdk.CollectionConverters._
    val rows =
      try {
        val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
          .createToScalaConverter(dt)
        values.map(v => Row(conv(v)))
      } catch { case _: Exception => return None }
    try {
      val df = spark.createDataFrame(rows.asJava,
        StructType(Seq(StructField("v", dt, nullable = true))))
      Some(df.select(sp.shadow(col("v"), dt).cast(StringType))
        .collect().toIndexedSeq.map(r => Option(r.getString(0))))
    } catch { case _: Exception => None }
  }
}
