package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Value-level tests for the dedup family on crafted documents with
  * hand-computable set math (VERDICT r1 item 7): exact Jaccard values
  * for ngramJaccard, similarity/identity properties for minhash and
  * simhash (whose hash values are not hand-computable, but whose
  * invariants are), and the minhash→verify pipeline composition.
  */
class DedupSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  import scala.jdk.CollectionConverters._
  private def docs(rows: (Long, String)*) = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2)).asJava, schema)
  }

  test("gram expressions == HOF formulas (shingles + ngramCol, r6)") {
    // the single-pass CharShingles/WordGrams expressions must emit the
    // exact distinct gram arrays (content AND order) of the composable
    // formulations the DuckDB oracles mirror
    val samples = Seq(
      "", "ab", "abcde", "abcdefgh", "aaaaaaaa", // repeats dedup
      "  padded   with\tmixed\nwhitespace  ",
      "w1 w2 w3 w4 w5 w1 w2 w3 w4 w5",           // repeated word grams
      "漢字文本 mixed ascii éè",
      "one", "one two", (1 to 50).map(i => s"t$i").mkString(" "))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val df = spark.createDataFrame(
      samples.map(org.apache.spark.sql.Row(_)).asJava, schema)
    def hofShingles(k: Int) = array_distinct(transform(
      sequence(lit(0), greatest(length(col("text")) - k, lit(0))),
      i => substring(col("text"), lit(1) + i, lit(k))))
    def hofGrams(n: Int) = {
      val words = filter(split(col("text"), "\\s+"), w => length(w) > 0)
      array_distinct(transform(
        sequence(lit(0), greatest(size(words) - n, lit(0))),
        i => concat_ws(" ", slice(words, i + 1, lit(n)))))
    }
    for (k <- Seq(2, 5)) {
      val bad = df.select(col("text"),
        Dedup.shingles(col("text"), k).as("fast"), hofShingles(k).as("slow"),
        Dedup.ngramCol(col("text"), k).as("gfast"), hofGrams(k).as("gslow"))
        .collect().filter(r => r.getSeq[String](1) != r.getSeq[String](2) ||
          r.getSeq[String](3) != r.getSeq[String](4))
      assert(bad.isEmpty, bad.map(r => s"k=$k '${r.getString(0)}': " +
        s"${r.getSeq[String](1)} vs ${r.getSeq[String](2)} | " +
        s"${r.getSeq[String](3)} vs ${r.getSeq[String](4)}").mkString("; "))
    }
  }

  test("MinHashSig expression == explode/groupBy/min(xxhash64) aggregation, bit-identical (r6)") {
    val d = docs(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "", // degenerate: single empty gram
      3L -> ((1 to 60).map(i => s"w$i").mkString(" ")),
      4L -> "漢字 mixed 漢字 text with repeats repeats repeats")
    for (wg <- Seq(false, true); h <- Seq(8, 32)) {
      val fast = Dedup.minhash(d, 5, h, wg).orderBy("doc_id").collect()
        .map(r => (0 until h).map(i => r.getLong(i + 1)))
      // the original aggregation formulation, inlined here as the twin
      val grams = if (wg) Dedup.ngramCol(col("text"), 5) else Dedup.shingles(col("text"), 5)
      val exploded = d.select(col("doc_id"), explode(grams).as("shingle"))
      val aggs = (0 until h).map(i => min(xxhash64(col("shingle"), lit(i))).as(s"m_$i"))
      val slow = exploded.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
        .orderBy("doc_id").collect().map(r => (0 until h).map(i => r.getLong(i + 1)))
      assert(fast.toSeq == slow.toSeq, s"wordGrams=$wg H=$h")
    }
  }

  test("winnow expression == HOF formula (fingerprints, r6)") {
    val samples = Seq(
      "", "one", "one two three",
      (1 to 30).map(i => s"t$i").mkString(" "),
      ((1 to 10) ++ (1 to 10)).map(i => s"rep$i").mkString(" ")) // repeated minima dedup
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val df = spark.createDataFrame(
      samples.map(org.apache.spark.sql.Row(_)).asJava, schema)
    for ((n, w) <- Seq((5, 4), (2, 3))) {
      val hs = transform(Dedup.ngramCol(col("text"), n), g => xxhash64(g))
      val hof = array_distinct(transform(
        sequence(lit(0), greatest(size(hs) - w, lit(0))),
        i => array_min(slice(hs, i + 1, lit(w)))))
      val bad = df.select(col("text"),
        graft.functions.GraftFunctions.winnow(col("text"), n, w).as("fast"),
        hof.as("slow"))
        .collect().filter(r => r.getSeq[Long](1) != r.getSeq[Long](2))
      assert(bad.isEmpty, bad.map(r => s"n=$n w=$w '${r.getString(0)}': " +
        s"${r.getSeq[Long](1)} vs ${r.getSeq[Long](2)}").mkString("; "))
    }
  }

  test("ngramJaccard: exact hand-computed values") {
    // doc1: w1..w5 -> 3-grams {w1 w2 w3, w2 w3 w4, w3 w4 w5}
    // doc2: w1..w4 -> {w1 w2 w3, w2 w3 w4}   inter=2 union=3 -> 2/3
    // doc3: shorter than n -> single whole-text gram
    val d = docs(
      1L -> "w1 w2 w3 w4 w5",
      2L -> "w1 w2 w3 w4",
      3L -> "w1 w2")
    val cand = docs(1L -> "x").sparkSession.createDataFrame(Seq(
      (1L, 2L), (1L, 3L), (2L, 3L))).toDF("doc_a", "doc_b")
    val got = Dedup.ngramJaccard(d, cand).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(got((1L, 2L)) - 2.0 / 3.0) < 1e-12)
    // doc3 gram {"w1 w2"} vs doc1 grams: disjoint -> 0/4
    assert(got((1L, 3L)) == 0.0)
    assert(got((2L, 3L)) == 0.0)
  }

  test("minhash: identical docs have identical signatures; est_jaccard 1.0") {
    val d = docs(
      1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "alpha beta gamma delta epsilon zeta", // exact copy
      3L -> "totally different words nothing shared here at all")
    val pairs = Dedup.minhashPairs(d, minEstJaccard = 0.0).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0, s"exact copies must agree on all minhashes: $pairs")
    assert(!pairs.contains((1L, 3L)) || pairs((1L, 3L)) < 0.3,
      "disjoint docs should share no band (or near-zero estimate)")
  }

  test("portable (md5) minhash variant agrees with the xxhash64 path on dup structure") {
    val base = (1 to 40).map(i => s"word$i").mkString(" ")
    val d = docs(
      1L -> base, 2L -> base, // exact pair
      3L -> (base + " tail"), // near-dup of 1/2
      4L -> "totally different words nothing shared here at all")
    val portable = Dedup.minhashPairsPortable(d, minEstJaccard = 0.0).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(portable((1L, 2L)) == 1.0, s"exact copies: $portable")
    assert(portable.get((1L, 3L)).forall(_ < 1.0))
    assert(!portable.contains((1L, 4L)) || portable((1L, 4L)) < 0.3)
    // the production path finds the same exact-dup pair
    val prod = Dedup.minhashPairs(d, minEstJaccard = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(prod.contains((1L, 2L)))
  }

  test("minhash est_jaccard tracks true shingle Jaccard on a near-dup") {
    val base = (1 to 40).map(i => s"word$i").mkString(" ")
    val d = docs(1L -> base, 2L -> (base + " tailword"))
    val est = Dedup.minhashPairs(d, minEstJaccard = 0.0).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      .apply((1L, 2L))
    // true 5-char-shingle Jaccard of base vs base+" tailword" is > 0.9;
    // a 32-hash estimate is within ±0.25 with overwhelming probability
    assert(est > 0.65, s"estimate $est too far from true similarity")
  }

  test("simhash: identical docs collide (hamming 0); near-dup within band reach") {
    val base = (1 to 50).map(i => s"tok$i").mkString(" ")
    val d = docs(1L -> base, 2L -> base, 3L -> (base + " extra"))
    val sh = Dedup.simhash(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L), "identical docs must have equal simhash")
    val pairs = Dedup.simhashPairs(d).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs((1L, 2L)) == 0)
    // one extra token on 50 flips few weighted bits: must stay <= 3
    assert(pairs.contains((1L, 3L)), s"near-dup not found: $pairs")
  }

  test("pipeline composition: minhash candidates -> exact jaccard verify") {
    val base = (1 to 30).map(i => s"v$i").mkString(" ")
    val d = docs(1L -> base, 2L -> base, 3L -> "unrelated content entirely")
    val cand = Dedup.minhashPairs(d).select("doc_a", "doc_b")
    val verified = Dedup.ngramJaccard(d, cand).collect()
    assert(verified.length == 1)
    assert(verified.head.getLong(0) == 1L && verified.head.getLong(1) == 2L)
    assert(verified.head.getDouble(2) == 1.0)
  }

  test("winnowing fingerprints: identity + shared-run guarantee, no shuffle") {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val d = docs(
      1L -> base,
      2L -> base, // identical
      3L -> (s"prefix0 prefixA prefixB $base"), // shares a 60-word run
      4L -> (1 to 60).map(i => s"z$i").mkString(" ")) // disjoint
    val fps = TextAnalysis.fingerprints(d).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fps(1L) == fps(2L))
    // winnowing guarantee: a shared run of >= n+w-1 words yields shared
    // fingerprints — doc3 contains doc1's full text
    val shared = fps(1L).intersect(fps(3L)).size.toDouble / fps(1L).size
    assert(shared > 0.8, s"shared fraction $shared")
    assert(fps(1L).intersect(fps(4L)).isEmpty)
    // scale shape: pure per-row transform — no exchange in the plan
    val p = TextAnalysis.fingerprints(d).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"winnowing should not shuffle:\n$p")
  }

  test("exact dedup groups: md5 groupBy with canonical min id") {
    val d = docs(5L -> "same", 9L -> "same", 7L -> "other", 8L -> "third")
    val g = Dedup.exact(d).collect()
    assert(g.length == 1)
    assert(g.head.getLong(1) == 2L && g.head.getLong(2) == 5L)
  }

  test("maxBandBucket caps a planted mega-bucket; drops are observable, honest pairs survive") {
    // a template-page family: 400 docs with one shared body — identical
    // shingle sets mean identical signatures, so EVERY band bucket is
    // the whole family (400 rows). Uncapped that is ~80k candidate
    // pairs per band through one reducer; at crawl scale such families
    // are the O(m²) LSH killer (VERDICT r4 "wrong" #2). (Docs whose
    // diffs exceed the shingle width land in smaller, survivable
    // buckets — the cap only fires on degenerate collisions.)
    val body = (1 to 80).map(i => s"tmpl$i").mkString(" ")
    val family = (0 until 400).map(i => (1000L + i) -> body)
    // plus an honest small near-dup pair far from the family
    val honest = Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta iota")
    val d = docs((honest ++ family): _*)

    val capped = Dedup.minhashPairs(d, minEstJaccard = 0.0, maxBandBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the honest pair survives; no intra-family pair floods the output
    assert(capped.contains((1L, 2L)), s"honest pair lost: $capped")
    assert(!capped.exists { case (a, b) => a >= 1000L && b >= 1000L },
      "mega-bucket family pairs must be dropped by the cap")

    // the drop is never silent: the stats table accounts for it
    val stats = Dedup.minhashBandStats(d, maxBandBucket = 100).collect()
    val dropped = stats.map(_.getLong(3)).sum
    val droppedRows = stats.map(_.getLong(4)).sum
    assert(dropped >= 1, "at least one over-cap bucket expected")
    assert(droppedRows >= 400, s"family rows must be accounted: $droppedRows")
    // and the family is NOT lost to dedup — d1-style exact/clustering
    // handles identical-signature families; the cap only bounds the
    // pairwise path. Same guard on the portable twin:
    val cappedPortable = Dedup.minhashPairsPortable(
      d, minEstJaccard = 0.0, maxBandBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cappedPortable.contains((1L, 2L)))
    assert(!cappedPortable.exists { case (a, b) => a >= 1000L && b >= 1000L })
  }

  test("nearDupClusters: chained pairs merge transitively, min id is canonical") {
    // components: {1,2,3} via chain 1-2, 2-3 (1 and 3 never paired
    // directly — the case pair output cannot answer); {10,11}; 99 alone
    val pairs = spark.createDataFrame(Seq(
      (2L, 3L), (1L, 2L), (10L, 11L))).toDF("doc_a", "doc_b")
    val got = Dedup.nearDupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L), got.toString)
    // longer chain (diameter 4): early-stop still converges
    val chain = spark.createDataFrame(
      (1L until 6L).map(i => (i, i + 1))).toDF("doc_a", "doc_b")
    val got2 = Dedup.nearDupClusters(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == (1L to 6L).map(_ -> 1L).toMap, got2.toString)
  }

  test("nearDupClusters: checkpoint seam + convergence status exposed by value") {
    // injected seam: cluster callers substitute reliable checkpoint();
    // count invocations to prove every round flows through it
    var cuts = 0
    val seam: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => { cuts += 1; df.localCheckpoint() }
    val chain = spark.createDataFrame(
      (1L until 8L).map(i => (i, i + 1))).toDF("doc_a", "doc_b")
    val (labels, converged, rounds) = Dedup.nearDupClustersStatus(chain, checkpoint = seam)
    assert(converged && rounds >= 2, s"converged=$converged rounds=$rounds")
    // r7: init labels no longer checkpoint (one-op lineage over the
    // materialized edges) — the seam must still cut edges + every round
    assert(cuts >= rounds + 1, s"seam must cut edges+every round: $cuts vs $rounds")
    assert(labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      (1L to 8L).map(_ -> 1L).toMap)
    // a diameter > maxIter component must report NON-convergence by
    // value, never return partially-merged labels silently (ADVICE r5)
    val (_, conv2, r2) = Dedup.nearDupClustersStatus(chain, maxIter = 2)
    assert(!conv2 && r2 == 2, s"conv=$conv2 rounds=$r2")
  }

  test("simhashPairs maxBandBucket: mega-family dropped, honest near-dup kept") {
    val body = (1 to 120).map(i => s"tmpl$i").mkString(" ")
    // identical texts -> identical simhash -> one bucket per band of
    // size 300 (simhash of exact copies collides on every band)
    val family = (0 until 300).map(i => (1000L + i) -> body)
    val honest = Seq(
      1L -> ((1 to 64).map(i => s"w$i").mkString(" ")),
      2L -> ((1 to 63).map(i => s"w$i").mkString(" ") + " w999"))
    val d = docs((honest ++ family): _*)
    val pairs = Dedup.simhashPairs(d, maxHamming = 6, maxBandBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"honest pair lost: $pairs")
    assert(!pairs.exists { case (a, b) => a >= 1000L && b >= 1000L })
  }

  test("dupPassageStats: shared windows counted exactly, unique docs at zero (d11)") {
    val p = (1 to 8).map(i => s"s$i").mkString(" ") // the 8-word shared passage
    val d = docs(
      1L -> s"$p u1a u1b u1c", // 11 words -> 4 windows, 1 shared (the pure passage)
      2L -> s"$p u2a u2b u2c",
      3L -> (1 to 11).map(i => s"only$i").mkString(" "), // 4 windows, none shared
      4L -> "tiny doc here", // < n words -> ONE short gram (d4 slice rule)
      5L -> "tiny doc here") // identical short doc -> that gram is shared
    val out = Dedup.dupPassageStats(d, n = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((4L, 1L, 0.25)), out(1L).toString)
    assert(out(2L) == ((4L, 1L, 0.25)))
    assert(out(3L) == ((4L, 0L, 0.0)))
    assert(out(4L) == ((1L, 1L, 1.0))) // short-doc gram matches doc 5
    assert(out(5L) == ((1L, 1L, 1.0)))
  }

  test("dropBoilerplateLines: corpus-frequent lines vanish, order + structure survive (d10)") {
    val banner = "this site uses cookies"
    val d = docs(
      (1L to 6L).map(i =>
        i -> s"unique head $i\n$banner\nunique tail $i\n\nafter blank $i") :+
        // a doc that is NOTHING but boilerplate must survive with empty
        // text (observable), not vanish from the corpus
        (7L -> banner) :+
        // a line shared by only 2 docs stays (threshold is 5)
        (8L -> s"rare shared line\nunique body 8") :+
        (9L -> s"rare shared line\nunique body 9"): _*)
    val out = Dedup.dropBoilerplateLines(d, minDocs = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == (1L to 9L).toSet) // every doc survives
    (1L to 6L).foreach { i =>
      // banner dropped; original line ORDER and the blank line kept
      assert(out(i) == s"unique head $i\nunique tail $i\n\nafter blank $i", out(i))
    }
    assert(out(7L) == "") // all-boilerplate doc -> empty text, not absent
    assert(out(8L) == "rare shared line\nunique body 8") // under threshold
    assert(out(9L) == "rare shared line\nunique body 9")
    // REPEATS WITHIN one doc don't count as corpus frequency: a line
    // 10 times in a single doc is repetition (q21's job), not corpus
    // boilerplate — it must stay
    val solo = docs(1L -> (Seq.fill(10)("my own refrain").mkString("\n")))
    val soloOut = Dedup.dropBoilerplateLines(solo, minDocs = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(soloOut(1L) == Seq.fill(10)("my own refrain").mkString("\n"))
  }

  test("contaminationStats: benchmark overlap counted exactly (d12)") {
    val d = docs(
      // 9 words -> 7 trigram windows; "quick brown fox", "brown fox jumps"
      // overlap the benchmark -> 2/7
      1L -> "the quick brown fox jumps over the lazy dog",
      // disjoint vocabulary -> 0 contaminated windows
      2L -> "completely different words here entirely now",
      // doc IS a benchmark item verbatim -> every window contaminated
      3L -> "quick brown fox jumps",
      // under n words -> ONE short gram, not in the benchmark
      4L -> "tiny doc")
    val bench = docs(100L -> "quick brown fox jumps")
      .withColumnRenamed("doc_id", "bench_id")
    val out = Dedup.contaminationStats(d, bench, n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((7L, 2L, 0.285714)), out(1L).toString)
    assert(out(2L) == ((4L, 0L, 0.0)))
    assert(out(3L) == ((2L, 2L, 1.0)))
    assert(out(4L) == ((1L, 0L, 0.0)))
    // the benchmark side must broadcast: corpus grams never shuffle
    // toward the (tiny) eval set
    val plan = Dedup.contaminationStats(d, bench, n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan.take(2000))
  }

  test("Md5MinHashSig expression == explode/groupBy/min(conv(md5)) aggregation, bit-identical (r7)") {
    val d = docs(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "", // degenerate: single empty gram
      3L -> ((1 to 60).map(i => s"w$i").mkString(" ")),
      4L -> "漢字 mixed 漢字 text with repeats repeats repeats")
    for (h <- Seq(4, 16)) {
      val fast = d.select(col("doc_id"),
          graft.functions.GraftFunctions.md5MinhashSig(col("text"), 5, h).as("sig"))
        .orderBy("doc_id").collect()
        .map(r => r.getSeq[Long](1))
      // the agg formulation this expression replaced (= the DuckDB
      // oracle's CTE chain), inlined as the twin
      def h60(c: org.apache.spark.sql.Column, seed: Int) =
        conv(substring(md5(concat(c, lit(s":$seed"))), 1, 15), 16, 10).cast("long")
      val exploded = d.select(col("doc_id"),
        explode(Dedup.shingles(col("text"), 5)).as("sh"))
      val aggs = (0 until h).map(i => min(h60(col("sh"), i)).as(s"m_$i"))
      val slow = exploded.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
        .orderBy("doc_id").collect().map(r => (0 until h).map(i => r.getLong(i + 1)))
      assert(fast.toSeq.map(_.toSeq) == slow.toSeq.map(_.toSeq), s"H=$h")
    }
  }

  test("simhash expression == explode/64-bit-sum aggregation, incl. tokenless docs (r7)") {
    val d = docs(
      1L -> "the quick brown fox the quick brown fox",
      2L -> "",            // no tokens: must be ABSENT, like the empty group
      3L -> "   \t\n  ",   // whitespace-only: also absent
      4L -> "one",
      5L -> "漢字 テキスト mixed tokens here",
      6L -> null.asInstanceOf[String]) // null text: absent
    val fast = Dedup.simhash(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val slow = Dedup.simhashAgg(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == slow)
    assert(!fast.contains(2L) && !fast.contains(3L) && !fast.contains(6L))
  }

  test("LongVecEqCount == zip_with/aggregate agreement count (r7)") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.types.StructField("b",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))))
    val rng = new scala.util.Random(7)
    val rows = (1 to 50).map { _ =>
      val n = 1 + rng.nextInt(32)
      val a = Seq.fill(n)(rng.nextLong() % 4)
      val b = a.map(v => if (rng.nextBoolean()) v else v + 1)
      org.apache.spark.sql.Row(a, b)
    }
    val df = spark.createDataFrame(rows.asJava, schema)
    val hof = aggregate(zip_with(col("a"), col("b"),
      (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, v) => acc + v)
    val bad = df.select(
        graft.functions.GraftFunctions.longVecEqCount(col("a"), col("b")).as("fast"),
        hof.as("slow"))
      .collect().filter(r => r.getInt(0) != r.getInt(1))
    assert(bad.isEmpty, bad.mkString("; "))
  }
}
