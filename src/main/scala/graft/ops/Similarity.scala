package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`Array[Float]`) —
  * brute-force cosine top-k as the exact baseline and a random-
  * hyperplane LSH bucket variant as the 100 TB scale path. Dot products
  * use `aggregate(zip_with(...))` (codegen'd builtins, no UDF).
  */
object Similarity {

  /** dot(a, b) over two array<float> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b) + lit(1e-12))

  /** Brute-force cosine top-k: `queries` (small, broadcast) against the
    * corpus; ranked per query with a window. At cluster scale the
    * broadcast side stays the query set — the corpus is never shuffled.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val joined = corpus.as("c").crossJoin(broadcast(queries.as("q")))
      .filter(col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("vec_id"),
        cosine(col("q.embedding"), col("c.embedding")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplanes (seeded; no wall clock). */
  private def hyperplane(dim: Int, seed: Int): Array[Double] = {
    val rng = new scala.util.Random(9000L + seed)
    Array.fill(dim)(rng.nextGaussian())
  }

  /** Sign-bit sketch: `planes` hyperplane dot-product signs → int key. */
  def lshKey(emb: Column, dim: Int, planes: Int): Column =
    (0 until planes).map { p =>
      val plane = array(hyperplane(dim, p).map(lit): _*)
      when(dot(emb, plane) > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  /** LSH-bucketed ANN: join query and corpus on the sign sketch, rank
    * within bucket. Recall < 1 by construction; the scale path trades
    * recall for never materializing the cross product.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
              planes: Int = 12): DataFrame = {
    val cb = corpus.withColumn("lsh", lshKey(col("embedding"), dim, planes))
    val qb = queries.withColumn("lsh", lshKey(col("embedding"), dim, planes))
      .withColumnRenamed("vec_id", "query_id")
      .withColumnRenamed("embedding", "q_emb")
    val joined = cb.join(broadcast(qb), Seq("lsh"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("q_emb"), col("embedding")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF (inverted-file) ANN: a deterministic coarse quantizer — k
    * seeded sample vectors as centroids — partitions the corpus into
    * cells; queries probe their nProbe nearest cells only. The
    * centroid set is tiny and driver-held (broadcast as literals);
    * the corpus is scanned once to assign cells and never shuffled by
    * the search itself — the 100 TB shape (cell assignment would be a
    * precomputed column/partition key at deploy scale).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
              nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    // deterministic centroids: first nCells vectors by vec_id (a seeded
    // k-means refinement would go here; selection is enough for the
    // cell-partitioning shape and keeps the oracle deterministic)
    val centroids: Array[(Int, Array[Float])] = corpus
      .orderBy("vec_id").limit(nCells)
      .select("embedding").collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](0).toArray) }

    def cellDist(emb: Column, c: Array[Float]): Column = {
      val cl = array(c.map(v => lit(v.toDouble)): _*)
      // squared L2 via dot products: |x|^2 - 2<x,c> + |c|^2
      val c2 = c.map(v => v.toDouble * v.toDouble).sum
      dot(emb, emb) - lit(2.0) * dot(emb, cl) + lit(c2)
    }

    /** index of the nearest centroid. */
    def cellOf(emb: Column): Column = {
      val dists = array(centroids.map { case (_, c) => cellDist(emb, c) }: _*)
      array_position(dists, array_min(dists)).cast("int") - 1
    }

    /** the nProbe nearest cell ids for a query vector. */
    def probeCells(emb: Column): Column = {
      val pairs = centroids.map { case (i, c) =>
        struct(cellDist(emb, c).as("d"), lit(i).as("cell"))
      }
      slice(transform(array_sort(array(pairs: _*)), p => p.getField("cell")), 1, nProbe)
    }

    val cb = corpus.withColumn("cell", cellOf(col("embedding")))
    val qb = queries
      .withColumnRenamed("vec_id", "query_id")
      .withColumnRenamed("embedding", "q_emb")
      .withColumn("cell", explode(probeCells(col("q_emb"))))
    val joined = cb.join(broadcast(qb), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("q_emb"), col("embedding")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs over LSH buckets. */
  def cosineNearDups(corpus: DataFrame, dim: Int, minCos: Double = 0.95,
                     planes: Int = 12): DataFrame = {
    val cb = corpus.withColumn("lsh", lshKey(col("embedding"), dim, planes))
    cb.as("a").join(cb.as("b"), Seq("lsh"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosine(col("a.embedding"), col("b.embedding")).as("cos"))
      .filter(col("cos") >= minCos)
      .orderBy(col("vec_a"), col("vec_b"))
  }
}
