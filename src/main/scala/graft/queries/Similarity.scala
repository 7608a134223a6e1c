package graft.queries

import graft.{GraftQuery, QueryPack, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over `embeddings` (north-star ops): brute-force cosine
  * top-k as the correctness baseline, cosine near-dup pairs, and a
  * random-hyperplane LSH-bucketed ANN variant as the scale path.
  *
  * All dot products fold float→double element-wise in the same order on
  * both engines, so raw similarity values (and therefore rankings) are
  * bit-identical with the DuckDB oracle.
  */
object Similarity extends QueryPack {

  /** q44's random hyperplanes — a fixed-seed LCG, shared by the Spark
    * bucket computation AND the oracle's literal rendering so the two can
    * never drift. Double.toString round-trips exactly, so the replayed
    * dot products are bit-identical.
    */
  private def lshPlanes(nTables: Int, k: Int, dim: Int): Array[Array[Array[Double]]] = {
    var state = 42L
    def nextUnit(): Double = {
      state = (state * 6364136223846793005L + 1442695040888963407L)
      ((state >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }
    Array.fill(nTables, k, dim)(nextUnit())
  }

  /** The q44 planes as a SQL VALUES body `(t, j, plane DOUBLE[])`. */
  private lazy val lshPlaneVals: String =
    lshPlanes(10, 5, 64).zipWithIndex.flatMap { case (tbl, t) =>
      tbl.zipWithIndex.map { case (plane, j) =>
        s"($t, $j, [${plane.mkString(",")}]::DOUBLE[])"
      }
    }.mkString(",\n")

  /** (vec_id, emb array<double>, norm2 double) projection. */
  private def normed(df: DataFrame): DataFrame =
    df.select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
      .withColumn("norm2", expr("aggregate(emb, CAST(0.0 AS DOUBLE), (a, x) -> a + x * x)"))

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q42_similarity_cosine_topk",
      (s, dir) => {
        // broadcast the 8 query vectors, score per partition with primitive
        // loops, keep top-5 per query (see BruteForceCosine.topK)
        graft.operators.BruteForceCosine
          .topK(Tables(s, dir, "embeddings"), "vec_id", "embedding",
            queryPred = col("vec_id") < 8, k = 5)
          .select(col("query_id"), col("neighbor_id"),
            round(col("sim"), 6).as("sim"), col("rnk").cast("long").as("rnk"))
          .orderBy("query_id", "rnk")
      },
      Some("""WITH e AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS emb FROM embeddings),
        |n AS (
        |  SELECT vec_id, emb,
        |    list_reduce([x * x FOR x IN emb], (a, b) -> a + b) AS norm2 FROM e),
        |q AS (SELECT vec_id AS query_id, emb AS qemb, norm2 AS qn FROM n WHERE vec_id < 8),
        |pairs AS (
        |  SELECT q.query_id, n.vec_id AS neighbor_id,
        |    list_reduce([qemb[i] * emb[i] FOR i IN generate_series(1, len(emb))], (a, b) -> a + b)
        |      / (sqrt(qn) * sqrt(norm2)) AS sim
        |  FROM n, q WHERE n.vec_id <> q.query_id),
        |r AS (
        |  SELECT query_id, neighbor_id, sim,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
        |  FROM pairs)
        |SELECT query_id, neighbor_id, round(sim, 6) AS sim, CAST(rnk AS BIGINT) AS rnk
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin)),

    GraftQuery(
      "q43_similarity_neardup_pairs",
      (s, dir) => {
        // broadcast block-nested-loop with primitive loops (see
        // BruteForceCosine) — same values as the naive HOF fold, ~20× faster
        graft.operators.BruteForceCosine
          .pairsAbove(Tables(s, dir, "embeddings"), "vec_id", "embedding", 0.3)
          .select(col("id1"), col("id2"), round(col("sim"), 6).as("sim"))
          .orderBy("id1", "id2")
      },
      Some("""WITH e AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS emb FROM embeddings),
        |n AS (
        |  SELECT vec_id, emb,
        |    list_reduce([x * x FOR x IN emb], (a, b) -> a + b) AS norm2 FROM e)
        |SELECT a.vec_id AS id1, b.vec_id AS id2,
        |  round(list_reduce([a.emb[i] * b.emb[i] FOR i IN generate_series(1, len(a.emb))],
        |                    (x, y) -> x + y) / (sqrt(a.norm2) * sqrt(b.norm2)), 6) AS sim
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |WHERE list_reduce([a.emb[i] * b.emb[i] FOR i IN generate_series(1, len(a.emb))],
        |                  (x, y) -> x + y) / (sqrt(a.norm2) * sqrt(b.norm2)) >= 0.3
        |ORDER BY id1, id2""".stripMargin)),

    // Same exact semantics as q43 but via the tiled shuffle join (no
    // broadcast, no executor-memory build side) — the 100 TB exact path.
    // Shares q43's oracle: results must be bit-identical.
    GraftQuery(
      "q71_similarity_neardup_blocked",
      (s, dir) => {
        graft.operators.BruteForceCosine
          .pairsAboveBlocked(Tables(s, dir, "embeddings"), "vec_id", "embedding",
            0.3, nBlocks = 8)
          .select(col("id1"), col("id2"), round(col("sim"), 6).as("sim"))
          .orderBy("id1", "id2")
      },
      Some("""WITH e AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS emb FROM embeddings),
        |n AS (
        |  SELECT vec_id, emb,
        |    list_reduce([x * x FOR x IN emb], (a, b) -> a + b) AS norm2 FROM e)
        |SELECT a.vec_id AS id1, b.vec_id AS id2,
        |  round(list_reduce([a.emb[i] * b.emb[i] FOR i IN generate_series(1, len(a.emb))],
        |                    (x, y) -> x + y) / (sqrt(a.norm2) * sqrt(b.norm2)), 6) AS sim
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |WHERE list_reduce([a.emb[i] * b.emb[i] FOR i IN generate_series(1, len(a.emb))],
        |                  (x, y) -> x + y) / (sqrt(a.norm2) * sqrt(b.norm2)) >= 0.3
        |ORDER BY id1, id2""".stripMargin)),

    // Random-hyperplane LSH ANN, multi-table: L=10 independent tables of k=5
    // deterministic hyperplanes (seeded LCG literals). A pair is a candidate
    // if it shares a bucket in ANY table — L·(collision p)^k is the standard
    // recall knob; one table of many planes has near-zero recall on a
    // spread-out corpus. Fully oracle-checked since r13: the planes render
    // as round-trip double literals from the SAME generator, and the bucket
    // sign bits / cosine scores replay as the q42-style index-ordered folds
    // — bit-identical. Recall ≥ floor vs brute-force q42 additionally
    // pinned in ScalaTest.
    GraftQuery(
      "q44_similarity_ann_lsh",
      (s, dir) => {
        val dim = 64
        val k = 5 // planes per table
        val nTables = 10
        val planes = lshPlanes(nTables, k, dim)
        // bucket computation as primitive loops per partition — a giant
        // literal SQL expression for L·k·dim terms chokes Catalyst
        val planesB = s.sparkContext.broadcast(planes)
        import s.implicits._
        val e = normed(Tables(s, dir, "embeddings"))
          .as[(Long, Array[Double], Double)]
          .flatMap { case (id, emb, n2) =>
            val ps = planesB.value
            (0 until nTables).map { t =>
              var bucket = 0L
              var j = 0
              while (j < k) {
                var d = 0.0
                var i = 0
                while (i < emb.length) { d += ps(t)(j)(i) * emb(i); i += 1 }
                if (d >= 0) bucket |= (1L << j)
                j += 1
              }
              (id, emb, n2, t, bucket)
            }
          }.toDF("vec_id", "emb", "norm2", "tbl", "bucket")
        val q = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("emb").as("qemb"),
            col("norm2").as("qn"), col("tbl"), col("bucket"))
        val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id").asc)
        e.join(broadcast(q.withColumnRenamed("qn", "qn2")), Seq("tbl", "bucket"))
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("dot", expr(
            "aggregate(zip_with(qemb, emb, (a, b) -> a * b), CAST(0.0 AS DOUBLE), (a, x) -> a + x)"))
          .withColumn("sim", col("dot") / (sqrt(col("qn2")) * sqrt(col("norm2"))))
          // dedup multi-table candidate collisions on scalars only — a
          // distinct over the 64-wide embedding arrays would dominate runtime
          .select(col("query_id"), col("vec_id"), col("sim")).distinct()
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 5)
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            round(col("sim"), 6).as("sim"), col("rnk").cast("long").as("rnk"))
          .orderBy("query_id", "rnk")
      },
      Some(s"""WITH e AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS emb
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, emb,
        |    list_reduce([x * x FOR x IN emb], (a, b) -> a + b) AS norm2 FROM e),
        |p(t, j, plane) AS (VALUES $lshPlaneVals),
        |bits AS (
        |  SELECT vec_id, t, j,
        |    CASE WHEN list_reduce([plane[i] * emb[i]
        |        FOR i IN generate_series(1, 64)], (a, b) -> a + b) >= 0
        |      THEN (1::BIGINT << CAST(j AS INTEGER)) ELSE 0 END AS bit
        |  FROM n CROSS JOIN p),
        |bk AS (SELECT vec_id, t, CAST(SUM(bit) AS BIGINT) AS bucket
        |       FROM bits GROUP BY vec_id, t),
        |qb AS (SELECT vec_id AS query_id, t, bucket FROM bk WHERE vec_id < 8),
        |cand AS (
        |  SELECT DISTINCT qb.query_id, b.vec_id AS neighbor_id
        |  FROM qb JOIN bk b ON b.t = qb.t AND b.bucket = qb.bucket
        |  WHERE b.vec_id <> qb.query_id),
        |sims AS (
        |  SELECT c.query_id, c.neighbor_id,
        |    list_reduce([qn.emb[i] * nn.emb[i]
        |        FOR i IN generate_series(1, len(nn.emb))], (a, b) -> a + b)
        |      / (sqrt(qn.norm2) * sqrt(nn.norm2)) AS sim
        |  FROM cand c JOIN n qn ON qn.vec_id = c.query_id
        |              JOIN n nn ON nn.vec_id = c.neighbor_id),
        |r AS (
        |  SELECT query_id, neighbor_id, sim,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY sim DESC, neighbor_id) AS rnk
        |  FROM sims)
        |SELECT query_id, neighbor_id, round(sim, 6) AS sim,
        |  CAST(rnk AS BIGINT) AS rnk
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin)),

    // IVF inverted-list ANN (the second scale path next to q44's LSH):
    // deterministic seeded centroids, nProbe of nLists lists searched.
    // Rows-only; recall vs brute force and the nProbe==nLists exactness
    // degeneration are pinned in IvfIndexSpec.
    // int8-quantized top-k: store 4× smaller, dequantize on the fly, search
    // exact — the memory/recall rung below full-precision ANN. The
    // quantize→dequantize roundtrip is deterministic double arithmetic
    // (scale = max|x|/127, round half-up matches in both engines), so the
    // oracle replays it and reuses q42's bit-identical cosine fold.
    // Roundtrip error and cosine preservation are pinned in QuantizeSpec.
    GraftQuery(
      "q63_similarity_quantized_topk",
      (s, dir) => {
        import graft.functions.Quantize
        val deq = Quantize.dequantize(
          Quantize.int8(Tables(s, dir, "embeddings"), "embedding"))
          .select(col("vec_id"), col("deq"))
        graft.operators.BruteForceCosine
          .topK(deq, "vec_id", "deq", queryPred = col("vec_id") < 8, k = 5)
          .select(col("query_id"), col("neighbor_id"),
            round(col("sim"), 6).as("sim"), col("rnk").cast("long").as("rnk"))
          .orderBy("query_id", "rnk")
      },
      Some("""WITH e0 AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS emb0
        |  FROM embeddings),
        |sc AS (
        |  SELECT vec_id, emb0,
        |    list_reduce([abs(x) FOR x IN emb0],
        |      (a, b) -> CASE WHEN a >= b THEN a ELSE b END) / 127.0 AS q_scale
        |  FROM e0),
        |e AS (
        |  SELECT vec_id,
        |    [(CASE WHEN q_scale = 0.0 THEN 0.0 ELSE round(x / q_scale) END)
        |     * q_scale FOR x IN emb0] AS emb
        |  FROM sc),
        |n AS (
        |  SELECT vec_id, emb,
        |    list_reduce([x * x FOR x IN emb], (a, b) -> a + b) AS norm2 FROM e),
        |q AS (SELECT vec_id AS query_id, emb AS qemb, norm2 AS qn FROM n WHERE vec_id < 8),
        |pairs AS (
        |  SELECT q.query_id, n.vec_id AS neighbor_id,
        |    list_reduce([qemb[i] * emb[i] FOR i IN generate_series(1, len(emb))], (a, b) -> a + b)
        |      / (sqrt(qn) * sqrt(norm2)) AS sim
        |  FROM n, q WHERE n.vec_id <> q.query_id),
        |r AS (
        |  SELECT query_id, neighbor_id, sim,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
        |  FROM pairs)
        |SELECT query_id, neighbor_id, round(sim, 6) AS sim, CAST(rnk AS BIGINT) AS rnk
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin)),

    // IVF inverted-list ANN: fully oracle-checked since r13 — the centroid
    // pick is an md5-seeded smallest-hash sample (engine-portable by
    // design), list assignment/probing is argmax/top-3 cosine over the 8
    // centroids, and every cosine is the q42-style index-ordered fold, so
    // DuckDB replays the ENTIRE index bit-for-bit. Recall vs brute force
    // and the nProbe==nLists exactness degeneration stay pinned in
    // IvfIndexSpec.
    GraftQuery(
      "q59_similarity_ann_ivf",
      (s, dir) => {
        graft.operators.IvfIndex.topK(
          Tables(s, dir, "embeddings"), "vec_id", "embedding",
          queryPred = col("vec_id") < 8, k = 5, nLists = 8, nProbe = 3)
          .select(col("query_id"), col("neighbor_id"),
            round(col("sim"), 6).as("sim"), col("rnk").cast("long").as("rnk"))
          .orderBy("query_id", "rnk")
      },
      Some("""WITH e AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS emb
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, emb,
        |    list_reduce([x * x FOR x IN emb], (a, b) -> a + b) AS norm2 FROM e),
        |pick AS (
        |  SELECT vec_id,
        |    row_number() OVER (ORDER BY md5('4242:' || vec_id), vec_id) AS rk
        |  FROM e),
        |cent AS (
        |  SELECT n.vec_id, n.emb, n.norm2,
        |    row_number() OVER (ORDER BY n.vec_id) - 1 AS c
        |  FROM n JOIN pick ON pick.vec_id = n.vec_id WHERE pick.rk <= 8),
        |vc AS (
        |  SELECT n.vec_id, cent.c,
        |    list_reduce([n.emb[i] * cent.emb[i]
        |        FOR i IN generate_series(1, len(n.emb))], (a, b) -> a + b)
        |      / (sqrt(n.norm2) * sqrt(cent.norm2)) AS cos
        |  FROM n CROSS JOIN cent),
        |vr AS (
        |  SELECT vec_id, c,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c) AS r
        |  FROM vc),
        |asn AS (SELECT vec_id, c AS list FROM vr WHERE r = 1),
        |probes AS (
        |  SELECT vec_id AS query_id, c AS plist FROM vr
        |  WHERE r <= 3 AND vec_id < 8),
        |cand AS (
        |  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
        |  FROM probes p JOIN asn a ON a.list = p.plist
        |  WHERE a.vec_id <> p.query_id),
        |sims AS (
        |  SELECT c.query_id, c.neighbor_id,
        |    list_reduce([qn.emb[i] * nn.emb[i]
        |        FOR i IN generate_series(1, len(nn.emb))], (a, b) -> a + b)
        |      / (sqrt(qn.norm2) * sqrt(nn.norm2)) AS sim
        |  FROM cand c JOIN n qn ON qn.vec_id = c.query_id
        |              JOIN n nn ON nn.vec_id = c.neighbor_id),
        |r AS (
        |  SELECT query_id, neighbor_id, sim,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY sim DESC, neighbor_id) AS rnk
        |  FROM sims)
        |SELECT query_id, neighbor_id, round(sim, 6) AS sim,
        |  CAST(rnk AS BIGINT) AS rnk
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin))
  )
}
