package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{queries => packs}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from the [[QueryPack]]s under `graft.queries`; each
  * pack entry carries its own DuckDB oracle SQL where the semantics are
  * ANSI-expressible (SURVEY.md §2.2 table), otherwise the driver records a
  * rows-only check and the semantics are pinned in ScalaTest.
  */
object SparkEntry {

  private val allPacks: Seq[QueryPack] = Seq(
    packs.Relational,
    packs.Analytics,
    packs.Scalars,
    packs.Events,
    packs.Text,
    packs.Dedup,
    packs.Similarity,
    packs.Multimodal,
    packs.Logfile,
    packs.Extended,
    packs.Curation,
    packs.Training,
    packs.Advanced,
    packs.Mining,
    packs.Graph,
    packs.Quality,
    packs.Trends,
    packs.Storage,
    packs.Stats,
    packs.Sketches,
    packs.Semantics)

  private lazy val all: Seq[GraftQuery] = {
    val qs = allPacks.flatMap(_.queries)
    val dups = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names would shadow in the Map: ${dups.mkString(",")}")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's Test pipeline collapsed to one Catalyst plan: count by
    * group over a scan (reference `cli/Test.java:119-133`), here the TPC-H
    * Q1 shape on the shared parquet.
    */
  def entry(spark: SparkSession): DataFrame =
    all.head.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
