package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Semantics pins for the round-4 training-pipeline queries (q91–q99):
  * Bloom prefilter invisibility, Z-order tile bounds, resampling bounds, and
  * rows-only output shapes.
  */
class TrainingOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("q94: Bloom prefilter is invisible — output equals the pure exact semi-join plan") {
    val viaBloom = SparkEntry.queries("q94_bloom_decontaminate")(spark, sf)
      .collect().map(_.toString).toSeq

    // the same plan with the Bloom prefilter removed
    val g = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 4)
      .select(col("doc_id"), col("source"), explode(array_distinct(expr(
        "transform(sequence(0, size(ws) - 4), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2], ws[i+3]))")))
        .as("gram"))
    val evalGrams = g.filter(col("doc_id") % 10 === 0).select("gram").distinct()
    val exact = g.filter(col("doc_id") % 10 =!= 0)
      .join(evalGrams, Seq("gram"), "left_semi")
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("shared"))
      .orderBy(col("shared").desc, col("doc_id"))
      .limit(20)
      .collect().map(_.toString).toSeq

    assert(viaBloom == exact, "Bloom false positives must die in the confirm join")
  }

  test("q95: every Z-bucket spans exactly one 1024×1024 tile of (custkey, day)") {
    val rows = SparkEntry.queries("q95_zorder_layout")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (minCk, maxCk) = (r.getLong(2), r.getLong(3))
      val (minDay, maxDay) = (r.getLong(4), r.getLong(5))
      assert(minCk >> 10 == maxCk >> 10, s"bucket ${r.getLong(0)} crosses a custkey tile")
      assert(minDay >> 10 == maxDay >> 10, s"bucket ${r.getLong(0)} crosses a day tile")
    }
    // buckets partition the table: counts sum to the full row count
    val total = Tables(spark, sf, "orders").count()
    assert(rows.map(_.getLong(1)).sum == total)
  }

  test("q92: kept ⊆ docs and the deterministic draw reproduces exactly") {
    val fn = SparkEntry.queries("q92_importance_resampling")
    val a = fn(spark, sf).collect()
    val b = fn(spark, sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    a.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "n_kept cannot exceed n_docs")
      assert(r.getDouble(3) <= r.getLong(1), "expected_kept cannot exceed n_docs")
    }
  }

  test("q93: duplicate segments bounded by total; digest-dedup agrees with distinct count") {
    val rows = SparkEntry.queries("q93_segment_dedup")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
    // corpus-wide: n_dups == total segments - distinct digests
    val segs = Tables(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), explode(expr(
        """filter(
          |  transform(sequence(0, (size(ws) - 1) div 10),
          |    k -> struct(k AS seg_idx, slice(ws, k * 10 + 1, 10) AS seg)),
          |  p -> size(p.seg) >= 5)""".stripMargin)).as("p"))
      .select(md5(concat_ws(" ", col("p.seg"))).as("dig"))
    val total = segs.count()
    val distinct = segs.distinct().count()
    assert(rows.map(_.getLong(2)).sum == total - distinct)
  }

  test("q97: overlap columns bounded by batch size; new/ref partition is disjoint") {
    val rows = SparkEntry.queries("q97_incremental_dedup")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0).length == 5, "only new sources (src1x) in output")
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(3) <= r.getLong(1))
    }
  }

  test("q96: k-means output covers all embeddings with ≤ k clusters, deterministic") {
    val fn = SparkEntry.queries("q96_kmeans_clusters")
    val a = fn(spark, sf).collect()
    assert(a.length <= 8 && a.nonEmpty)
    val total = Tables(spark, sf, "embeddings").count()
    assert(a.map(_.getLong(1)).sum == total)
    val b = fn(spark, sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("q99: semantic dedup — counts partition the table; dropped rows have a kept near-dup") {
    import graft.functions.expressions.CosineSimilarity
    import graft.operators.{ConnectedComponents, KMeans}
    val fn = SparkEntry.queries("q99_semantic_dedup")
    val a = fn(spark, sf).collect()
    assert(a.nonEmpty)
    val total = Tables(spark, sf, "embeddings").count()
    assert(a.map(_.getLong(1)).sum == total)
    a.foreach(r => assert(r.getLong(2) + r.getLong(3) == r.getLong(1)))
    assert(a.map(_.toString).toSeq == fn(spark, sf).collect().map(_.toString).toSeq)

    // semantic guarantee: every dropped id has a kept same-cluster neighbor
    // with cosine >= threshold (rebuild the assignment + pairs directly)
    val emb = Tables(spark, sf, "embeddings")
    val model = KMeans.fit(emb, "vec_id", "embedding", k = 8, iters = 3)
    val assigned = KMeans.assign(emb, "vec_id", "embedding", model)
      .select(col("id"), col("cluster"))
    val vecs = emb.select(col("vec_id").cast("long").as("id"),
      col("embedding").cast("array<double>").as("vec"))
    val av = assigned.join(vecs, "id")
    val x = av.select(col("cluster"), col("id").as("id1"), col("vec").as("v1"))
    val y = av.select(col("cluster"), col("id").as("id2"), col("vec").as("v2"))
    val pairs = x.join(y, "cluster").where(col("id1") < col("id2"))
      .where(CosineSimilarity.cosineSim(col("v1"), col("v2")) >= 0.3)
      .select(col("id1"), col("id2"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val comp = ConnectedComponents.run(
      av.sparkSession.createDataFrame(pairs).toDF("a", "b"), maxIter = 25, reliable = Some(false))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(pairs.nonEmpty, "threshold should produce near-dup pairs on this data")
    val dropped = comp.filter { case (id, c) => c != id }.keySet
    val kept = comp.keySet -- dropped
    // min-label CC: each dropped id's component label is its kept
    // representative, reachable through >=threshold edges (CC correctness
    // itself is pinned in ConnectedComponentsSpec)
    dropped.foreach(d => assert(kept(comp(d)),
      s"dropped $d: representative ${comp(d)} was not kept"))
    // and the query's aggregate dropped count matches the edge-level truth
    assert(a.map(_.getLong(3)).sum == dropped.size)
  }

  test("q98: BPE merge table is dense-ranked and reproducible") {
    val fn = SparkEntry.queries("q98_bpe_train")
    val a = fn(spark, sf).collect()
    assert(a.nonEmpty)
    assert(a.map(_.getLong(0)).toSeq == a.indices.map(_.toLong))
    a.foreach(r => assert(r.getLong(3) >= 2, "merge below minFreq emitted"))
    val b = fn(spark, sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }
}
