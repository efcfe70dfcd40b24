package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators over a `documents(doc_id, text, ...)` table —
  * the training-data-pipeline ops a 100 TB corpus job needs. All pure
  * DataFrame/Catalyst (codegen'd built-ins, no UDFs): minhash banding is
  * a shuffle-on-band-key join, the scalable shape for cluster runs.
  */
object Dedup {

  /** Exact dedup: hash-groupBy on content digest. Returns one row per
    * duplicate group with the canonical (min) doc_id and group size.
    */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("canonical_id"))
      .filter(col("n_dups") > 1)
      .orderBy(col("content_hash"))

  /** Character k-shingles of `text` as an array column (distinct). */
  def shingles(text: Column, k: Int): Column =
    array_distinct(transform(
      sequence(lit(0), greatest(length(text) - k, lit(0))),
      i => substring(text, lit(1) + i, lit(k))))

  /** MinHash signatures: H independent permutations approximated by
    * seeded xxhash64; one hash-aggregate computes all H minima.
    */
  def minhash(docs: DataFrame, k: Int = 5, numHashes: Int = 32): DataFrame = {
    val exploded = docs
      .select(col("doc_id"), explode(shingles(col("text"), k)).as("shingle"))
    val aggs = (0 until numHashes).map(h =>
      min(xxhash64(col("shingle"), lit(h))).as(s"mh_$h"))
    exploded.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: split the signature into `bands`, hash each band,
    * self-join on (band, band_hash) → candidate pairs, then score by
    * signature agreement (estimated Jaccard). Join key is the band
    * bucket — co-partitioned, no cross join anywhere.
    */
  def minhashPairs(docs: DataFrame, k: Int = 5, numHashes: Int = 32,
                   bands: Int = 8, minEstJaccard: Double = 0.5): DataFrame = {
    // signatures feed three plan branches (bucket explode + both pair
    // sides); persist so the shingle explosion runs once. At cluster
    // scale this stage would be checkpointed to a table instead.
    val sigs = minhash(docs, k, numHashes).persist()
    val rows = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      val cols = (0 until rows).map(r => col(s"mh_${b * rows + r}"))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("sig"))
    }
    val buckets = sigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.sig").as("sig"))
    val cand = buckets.as("a")
      .join(buckets.as("b"), Seq("band", "sig"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // estimate similarity: fraction of matching minhashes
    val sa = sigs.toDF(sigs.columns.map(c => if (c == "doc_id") "doc_a" else c + "_a"): _*)
    val sb = sigs.toDF(sigs.columns.map(c => if (c == "doc_id") "doc_b" else c + "_b"): _*)
    val matches = (0 until numHashes)
      .map(h => when(col(s"mh_${h}_a") === col(s"mh_${h}_b"), 1).otherwise(0))
      .reduce(_ + _)
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (matches.cast("double") / numHashes).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstJaccard)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** SimHash (64-bit): per-token hash, bitwise weighted majority.
    * All 64 bit-sums happen in one hash-aggregate pass.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val tokens = docs.select(col("doc_id"),
      explode(split(col("text"), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .withColumn("h", xxhash64(col("tok")))
    val bitAggs = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b_$i")
    }
    val agg = tokens.groupBy("doc_id").agg(bitAggs.head, bitAggs.tail: _*)
    val sim = (0 until 64).map { i =>
      when(col(s"b_$i") > 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)
    agg.select(col("doc_id"), sim.as("simhash"))
  }

  /** SimHash near-dup candidates: band the 64 bits into 4×16-bit keys —
    * any pair within Hamming distance 3 shares at least one exact band
    * (pigeonhole), so the bucket join finds all near-dups.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sh = simhash(docs)
    val bandCols = (0 until 4).map(b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(0xFFFFL).as("key")))
    val buckets = sh.select(col("doc_id"), col("simhash"),
      explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.band").as("band"), col("bk.key").as("key"))
    val pairs = buckets.as("a").join(buckets.as("b"), Seq("band", "key"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("sh_a"), col("b.simhash").as("sh_b"))
      .distinct()
    pairs
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Word n-gram Jaccard, exact, computed only for candidate pairs
    * (verify stage after LSH): explode n-grams per side, count
    * intersection/union per pair. Shuffles on (pair, gram) — scalable.
    */
  def ngramJaccard(docs: DataFrame, cand: DataFrame, n: Int = 3): DataFrame = {
    val c = cand.persist() // reused for both sides of the pair
    val grams = docs.select(col("doc_id"), ngramCol(col("text"), n).as("grams"))
    val ga = c.join(grams.withColumnRenamed("doc_id", "doc_a"), "doc_a")
      .select(col("doc_a"), col("doc_b"), explode(col("grams")).as("gram"),
        lit(1).as("in_a"), lit(0).as("in_b"))
    val gb = c.join(grams.withColumnRenamed("doc_id", "doc_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"), explode(col("grams")).as("gram"),
        lit(0).as("in_a"), lit(1).as("in_b"))
    // single aggregation chain: no pair-side self-join; shuffles on
    // (pair, gram) then (pair) — both partial-aggregated map-side
    ga.unionByName(gb)
      .groupBy("doc_a", "doc_b", "gram")
      .agg(max("in_a").as("a"), max("in_b").as("b"))
      .groupBy("doc_a", "doc_b")
      .agg(sum(col("a") * col("b")).as("n_inter"), count(lit(1)).as("n_union"))
      .select(col("doc_a"), col("doc_b"),
        (col("n_inter").cast("double") / col("n_union")).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Distinct word n-grams as an array column. */
  def ngramCol(text: Column, n: Int): Column = {
    val words = split(text, "\\s+")
    array_distinct(transform(
      sequence(lit(0), greatest(size(words) - n, lit(0))),
      i => concat_ws(" ", slice(words, i + 1, lit(n)))))
  }
}
