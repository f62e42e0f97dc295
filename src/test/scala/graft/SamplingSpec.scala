package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Sampling

/** Deterministic sampling / budgeting / PII redaction (EXT pipeline ops). */
class SamplingSpec extends SparkSpec {

  test("sampleByHash: deterministic, partition-independent, fraction-honoring") {
    import spark.implicits._
    val keys = (1L to 10000L).toDF("k")
    val a = Sampling.sampleByHash(keys, col("k"), 0.25, "s")
      .select("k").as[Long].collect().sorted.toSeq
    val b = Sampling.sampleByHash(keys.repartition(13), col("k"), 0.25, "s")
      .select("k").as[Long].collect().sorted.toSeq
    assert(a == b) // same selection regardless of layout
    assert(math.abs(a.size / 10000.0 - 0.25) < 0.02, s"got ${a.size}")
    // different salt → a different (roughly independent) draw
    val c = Sampling.sampleByHash(keys, col("k"), 0.25, "other")
      .select("k").as[Long].collect().toSet
    assert(c != a.toSet)
  }

  test("shuffleOrder: a true permutation, repartition-stable, salt-independent epochs") {
    import spark.implicits._
    import graft.operators.Sampling
    val docs = (1L to 300L).toDF("id")
    def order(df: org.apache.spark.sql.DataFrame, salt: String) =
      Sampling.shuffleOrder(df, col("id"), salt)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e1 = order(docs, "epoch1")
    // a permutation: ranks are exactly 1..N
    assert(e1.values.toSeq.sorted == (1L to 300L))
    // and NOT the identity (it actually shuffles)
    assert(e1.count { case (id, r) => id == r } < 30)
    // partitioning-independent: same order from any physical layout
    assert(order(docs.repartition(13), "epoch1") == e1)
    // a different salt draws an (almost entirely) different permutation
    val e2 = order(docs, "epoch2")
    assert(e2 != e1 && e1.count { case (id, r) => e2(id) == r } < 30)
  }

  test("splitByHash: exact partition — disjoint, exhaustive") {
    import spark.implicits._
    val keys = (1L to 2000L).toDF("k")
    val (sel, rest) = Sampling.splitByHash(keys, col("k"), 0.4, "v1")
    val s = sel.select("k").as[Long].collect().toSet
    val r = rest.select("k").as[Long].collect().toSet
    assert(s.intersect(r).isEmpty)
    assert(s.union(r).size == 2000)
  }

  test("assignSplit: exhaustive single label per row, 2-way agrees with splitByHash, stable under repartition") {
    import spark.implicits._
    val df = (1L to 2000L).toDF("id")
    val labeled = df.withColumn("split", Sampling.assignSplit(col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "s"))
    val counts = labeled.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.values.sum === 2000L, "every row gets exactly one label")
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts("train") > 1400 && counts("val") > 100 && counts("test") > 100,
      s"weights should roughly hold: $counts")
    // 2-way special case ≡ splitByHash's threshold semantics
    val two = df.withColumn("split", Sampling.assignSplit(col("id"),
      Seq("a" -> 0.3, "b" -> 0.7), salt = "t"))
    val (aSide, _) = Sampling.splitByHash(df, col("id"), 0.3, salt = "t")
    assert(two.where(col("split") === "a").select("id").as[Long].collect().sorted.toSeq
      === aSide.select("id").as[Long].collect().sorted.toSeq)
    // content-addressed: labels survive arbitrary repartitioning
    val re = labeled.repartition(13).groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(re === counts)
    intercept[IllegalArgumentException](
      Sampling.assignSplit(col("id"), Seq("x" -> 0.5, "y" -> 0.4)))
  }

  test("exactKPerGroup: exact sizes, repartition-stable, salt varies draw, WindowGroupLimit plan") {
    import spark.implicits._
    val df = (1L to 300L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    val out = Sampling.exactKPerGroup(df, col("g"), col("id"), k = 5, salt = "s")
    val counts = out.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(counts === Map("g0" -> 5L, "g1" -> 5L, "g2" -> 5L))
    val ids = out.select("id").as[Long].collect().toSet
    val again = Sampling.exactKPerGroup(df.repartition(17), col("g"), col("id"),
      k = 5, salt = "s").select("id").as[Long].collect().toSet
    assert(again === ids, "content-addressed draw must survive repartitioning")
    val other = Sampling.exactKPerGroup(df, col("g"), col("id"), k = 5, salt = "t")
      .select("id").as[Long].collect().toSet
    assert(other !== ids, "a different salt should draw a different sample")
    // small groups return everything, ranked
    val tiny = Sampling.exactKPerGroup(df.where(col("id") <= 4), col("g"), col("id"), k = 5)
    assert(tiny.count() === 4)
    // scale shape: the rank filter plans as WindowGroupLimit (partial top-k
    // per partition before the group exchange)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(1200))
  }

  test("clusterBalancedSample: argmax assignment, balanced draw, repartition-stable, guards") {
    import spark.implicits._
    // 8-dim vectors in 4 well-separated directions so the nearest-centroid
    // assignment is unambiguous (the spec checks the MACHINERY; q146's
    // oracle checks engine parity on real data)
    def vec(i: Long): Array[Float] = {
      val v = new Array[Float](8)
      v((i % 4).toInt * 2) = 1.0f
      v((i % 4).toInt * 2 + 1) = (1.0f + (i % 7) / 10.0f)
      v
    }
    val df = (0L until 200L).map(i => (i, vec(i))).toDF("id", "v")
    val out = Sampling.clusterBalancedSample(df, "id", "v",
      numClusters = 4, perCluster = 3, salt = "s")
    // centroids are ids 0..3, one per direction → every cluster draws
    // exactly perCluster rows, and members share the centroid's direction
    val rows = out.select("id", "cluster_id").as[(Long, Long)].collect()
    assert(rows.length === 12)
    assert(rows.map(_._2).distinct.sorted.toSeq === Seq(0L, 1L, 2L, 3L))
    rows.foreach { case (id, cid) => assert(id % 4 === cid % 4,
      s"row $id landed in cluster $cid — wrong direction") }
    // content-addressed: the draw survives repartitioning
    val again = Sampling.clusterBalancedSample(df.repartition(13), "id", "v",
      numClusters = 4, perCluster = 3, salt = "s")
      .select("id").as[Long].collect().toSet
    assert(again === rows.map(_._1).toSet)
    // a different salt draws differently
    val other = Sampling.clusterBalancedSample(df, "id", "v",
      numClusters = 4, perCluster = 3, salt = "t")
      .select("id").as[Long].collect().toSet
    assert(other !== rows.map(_._1).toSet)
    intercept[IllegalArgumentException](
      Sampling.clusterBalancedSample(df, "id", "v", 0, 3))
    intercept[IllegalArgumentException](
      Sampling.clusterBalancedSample(df, "id", "v", 4, 0))
    intercept[IllegalArgumentException](
      Sampling.clusterBalancedSample(df, "id", "nope", 4, 3))
    // duplicate ids refuse loudly (the content-addressed draw keys on id)
    val ex = intercept[IllegalArgumentException](
      Sampling.clusterBalancedSample(df.unionAll(df.limit(1)), "id", "v", 4, 3))
    assert(ex.getMessage.contains("unique 'id'"))
    // assumeUniqueIds skips the guard job (VERDICT r11 item 6): identical
    // draw on certified-unique input
    val certified = Sampling.clusterBalancedSample(df, "id", "v",
      numClusters = 4, perCluster = 3, salt = "s", assumeUniqueIds = true)
      .select("id").as[Long].collect().toSet
    assert(certified === rows.map(_._1).toSet)
    // empty input short-circuits to an empty sample with the full output
    // schema instead of tripping the assignment's centroid require
    // (ADVICE r11 — the retired window form returned empty here too)
    val empty = Sampling.clusterBalancedSample(
      df.where(org.apache.spark.sql.functions.lit(false)), "id", "v", 4, 3)
    assert(empty.columns.toSeq === Seq("id", "v", "cluster_id", "sample_rank"))
    assert(empty.count() === 0L)
  }

  test("leakageSafeSplits composes with sequence-dedup pairs (any-tier contract)") {
    // the pairs contract says ANY dedup tier's output plugs in — prove it
    // end-to-end with the perceptual sequence tier: shifted-vote pairs
    // (with their extra offset/vote columns) feed the split machinery
    // unchanged, and a trimmed-clip duplicate can never straddle a split
    import spark.implicits._
    import graft.operators.Dedup
    val rnd = new scala.util.Random(31)
    val seqs: Seq[(Long, Seq[Long])] =
      (0L until 12L).map(i => (i, Seq.fill(8)(rnd.nextLong()))) ++
        Seq((100L, Seq.fill(8)(rnd.nextLong()))) // spare for clip ids
    val clips = seqs.take(12)
    val planted = Seq(
      (200L, clips(0)._2),          // restage of 0
      (201L, clips(1)._2.drop(2)))  // trimmed dup of 1
    val sigRows = (clips ++ planted).flatMap { case (id, hs) =>
      hs.zipWithIndex.map { case (h, f) => (id, f, h) } }
    val pairs = Dedup.shiftedSequenceVoteNearDupPairs(
      sigRows.toDF("id", "f", "h"), "id", "f", "h", minVoteFrac = 0.7)
    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((0L, 200L), (1L, 201L)))
    val docs = (clips ++ planted).map(_._1).toDF("media_id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    for (salt <- Seq("x", "y", "z")) {
      val out = Sampling.leakageSafeSplits(docs, "media_id", pairs, splits, salt)
        .select("media_id", "split").as[(Long, String)].collect().toMap
      assert(Set(0L, 200L).map(out).size === 1, s"restage pair leaked (salt $salt)")
      assert(Set(1L, 201L).map(out).size === 1, s"trimmed pair leaked (salt $salt)")
    }
  }

  test("leakageSafeSplits: a near-dup cluster never straddles a split, singletons keep assignSplit") {
    import spark.implicits._
    val docs = (1L to 400L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // two chains (1-2-3-4, 10-11) and one isolated pair (20, 21)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L))
      .toDF("id1", "id2")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    for (salt <- Seq("a", "b", "c", "d", "e")) {
      val out = Sampling.leakageSafeSplits(docs, "doc_id", pairs, splits, salt)
        .select("doc_id", "split").as[(Long, String)].collect().toMap
      assert(out.size === 400)
      // every cluster is split-pure, under every salt
      assert(Set(1L, 2L, 3L, 4L).map(out).size === 1, s"chain leaked (salt $salt)")
      assert(Set(10L, 11L).map(out).size === 1)
      assert(Set(20L, 21L).map(out).size === 1)
      // docs in no pair behave exactly like assignSplit on their own id
      val lone = docs.where(!col("doc_id").isin(1L to 4L map (identity): _*)
          && !col("doc_id").isin(10L, 11L, 20L, 21L))
        .withColumn("split", Sampling.assignSplit(col("doc_id"), splits, salt))
        .select("doc_id", "split").as[(Long, String)].collect().toMap
      lone.foreach { case (id, s) => assert(out(id) === s, s"singleton $id (salt $salt)") }
    }
    // repartition-stability (the content-addressed contract)
    val a = Sampling.leakageSafeSplits(docs, "doc_id", pairs, splits, "s")
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    val b = Sampling.leakageSafeSplits(docs.repartition(13), "doc_id",
        pairs.repartition(7), splits, "s")
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(a === b)
    // empty pair set (no near-dups found) ≡ plain per-doc assignSplit
    val noPairs = Sampling.leakageSafeSplits(docs, "doc_id",
        Seq.empty[(Long, Long)].toDF("id1", "id2"), splits, "s")
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    val plainSplit = docs
      .withColumn("split", Sampling.assignSplit(col("doc_id"), splits, "s"))
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(noPairs === plainSplit)
  }

  test("weightedSamplePerGroup: exact sizes, repartition-stable, weight-proportional odds, loud on bad weights") {
    import spark.implicits._
    // i % 9 hits both parities, so both groups get heavy rows
    val df = (1L to 400L).map(i => (i, s"g${i % 2}", if (i % 9 == 0) 100L else 1L))
      .toDF("id", "g", "w")
    val out = Sampling.weightedSamplePerGroup(df, col("g"), col("id"), col("w"),
      k = 10, salt = "s")
    val counts = out.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(counts === Map("g0" -> 10L, "g1" -> 10L))
    val ids = out.select("id").as[Long].collect().toSet
    val again = Sampling.weightedSamplePerGroup(df.repartition(17), col("g"),
      col("id"), col("w"), k = 10, salt = "s").select("id").as[Long].collect().toSet
    assert(again === ids, "priority draw must survive repartitioning")
    // inclusion odds ∝ weight: 44 heavy rows (w=100) vs 356 light (w=1);
    // across salts the heavy rows should dominate the 20 slots — with
    // w-ratio 100 the expected heavy share is > 90%; assert a loose floor
    val heavyShare = (0 until 10).map { s =>
      Sampling.weightedSamplePerGroup(df, col("g"), col("id"), col("w"),
          k = 10, salt = s"salt$s")
        .where(col("w") === 100L).count().toDouble / 20.0
    }.sum / 10.0
    assert(heavyShare > 0.6, s"heavy rows won only $heavyShare of slots")
    // w = 0 rows never appear
    val withZero = df.withColumn("w", when(col("id") <= 200, lit(0L)).otherwise(col("w")))
    val z = Sampling.weightedSamplePerGroup(withZero, col("g"), col("id"), col("w"), k = 10)
    assert(z.where(col("id") <= 200).count() === 0)
    // negative or oversized weights raise per row, loudly
    val bad = df.withColumn("w", when(col("id") === 7, lit(-3L)).otherwise(col("w")))
    val ex = intercept[Exception] {
      Sampling.weightedSamplePerGroup(bad, col("g"), col("id"), col("w"), k = 10).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("weight out of")))
    // a maxWeight that would let w·2^40 overflow a long is refused at entry
    // (negative priorities would silently produce a wrong sample)
    val exCap = intercept[IllegalArgumentException] {
      Sampling.weightedSamplePerGroup(df, col("g"), col("id"), col("w"),
        k = 10, maxWeight = (Long.MaxValue >> 40) + 1)
    }
    assert(exCap.getMessage.contains("maxWeight"))
    // scale shape: WindowGroupLimit (the exactKPerGroup discipline)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(1200))
  }

  test("leakageSafeSplits: rep join routes by size — broadcast under the cap, merge above; rows identical") {
    import spark.implicits._
    // VERDICT r11 item 5: the (id, rep) frame must never be assumed
    // broadcast-small — an over-threshold pair graph routes to a sort-merge
    // join (no driver collect of the rep side), and both routes must
    // produce the identical split assignment.
    val docs = (1L to 400L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("id1", "id2")
    val splits = Seq("train" -> 0.8, "test" -> 0.2)
    def run(cap: Long) = {
      val out = Sampling.leakageSafeSplits(docs, "doc_id", pairs, splits,
        salt = "route", maxBroadcastReps = cap)
      val rows = out.select("doc_id", "split").as[(Long, String)].collect().toSet
      (rows, out.queryExecution.executedPlan.toString)
    }
    val (viaBroadcast, planB) = run(10000000L) // 7 rep rows ≤ cap
    assert(planB.contains("BroadcastHashJoin"), planB.take(1200))
    val (viaMerge, planM) = run(1L)            // 7 rep rows > cap
    assert(planM.contains("SortMergeJoin"), planM.take(1200))
    assert(!planM.contains("BroadcastHashJoin"),
      "over-threshold rep frame must not broadcast:\n" + planM.take(1200))
    assert(viaBroadcast === viaMerge, "both routes must assign identically")
    intercept[IllegalArgumentException](
      Sampling.leakageSafeSplits(docs, "doc_id", pairs, splits,
        maxBroadcastReps = 0L))
  }

  test("leakage-safe split: hashing the dedup-cluster representative keeps near-dups in one split") {
    import spark.implicits._
    // near-dup pairs as resolveClusters input: docs 1≈2≈3 and 10≈11; the
    // rest are singletons. Splitting on the RAW id could send 1 to train
    // and its near-copy 2 to test (silent contamination); splitting on the
    // cluster representative cannot.
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id1", "id2")
    val ids = (1L to 20L).toDF("id")
    val reps = graft.operators.Dedup.resolveClusters(pairs)
      .withColumnRenamed("id", "member").withColumnRenamed("rep", "mrep")
    val withRep = ids.join(reps, ids("id") === reps("member"), "left")
      .select(col("id"), coalesce(col("mrep"), col("id")).as("rep"))
    val split = withRep.withColumn("split",
      Sampling.assignSplit(col("rep"), Seq("train" -> 0.5, "test" -> 0.5), salt = "lk"))
    val byId = split.select("id", "split").as[(Long, String)].collect().toMap
    assert(byId(1L) === byId(2L) && byId(2L) === byId(3L),
      "cluster 1-2-3 must land in one split")
    assert(byId(10L) === byId(11L), "cluster 10-11 must land in one split")
  }

  test("stratifiedSampleByHash: per-group fractions honored, default applies, deterministic") {
    import spark.implicits._
    val df = (1L to 6000L).map(i => (i, s"g${i % 3}")).toDF("k", "g")
    val out = Sampling.stratifiedSampleByHash(df, col("k"), col("g"),
      Map("g0" -> 0.5, "g1" -> 0.1), defaultFraction = 0.25, salt = "s")
    val counts = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("g0") / 2000.0 - 0.5) < 0.05, counts.toString)
    assert(math.abs(counts("g1") / 2000.0 - 0.1) < 0.05, counts.toString)
    assert(math.abs(counts("g2") / 2000.0 - 0.25) < 0.05, counts.toString)
    // repartition-stable
    val again = Sampling.stratifiedSampleByHash(df.repartition(17), col("k"), col("g"),
      Map("g0" -> 0.5, "g1" -> 0.1), defaultFraction = 0.25, salt = "s")
      .select("k").as[Long].collect().sorted.toSeq
    assert(again == out.select("k").as[Long].collect().sorted.toSeq)
  }

  test("tokenBudgetFilter: per-group prefix under budget, later rows cut") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 500), ("a", 2L, 900), ("a", 3L, 700), // a: 500,1400,2100 → keep 1,2
      ("b", 4L, 2000), ("b", 5L, 1)).toDF("src", "id", "n") // b: 2000,2001 → keep 4
    val kept = Sampling.tokenBudgetFilter(df, col("src"), col("n"), Seq(col("id")), 2000L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L, 4L))
  }

  test("packSequences: first-fit greedy — exact fit, overflow, over-long doc, shard isolation") {
    import spark.implicits._
    // shard 0, budget 10: [4,6] fill pack 0 exactly; 3 overflows -> pack 1;
    // 25 (over-long) -> own pack 2; 2 follows in pack 3 (25 overflows it out)
    val docs = Seq(
      (1L, 0, 4L), (2L, 0, 6L), (3L, 0, 3L), (4L, 0, 25L), (5L, 0, 2L),
      (10L, 1, 9L), (11L, 1, 2L)) // other shard: independent numbering
      .toDF("id", "shard", "n")
    val out = Sampling.packSequences(docs, "id", "shard", "n", budget = 10L)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getInt(3), r.getLong(4))).toMap
    assert(out(1L) == ((0, 0L, 0, 0L)))
    assert(out(2L) == ((0, 0L, 1, 4L)))  // 4+6 = 10 fits exactly
    assert(out(3L) == ((0, 1L, 0, 0L)))  // 10+3 would overflow
    assert(out(4L) == ((0, 2L, 0, 0L)))  // over-long doc: own pack
    assert(out(5L) == ((0, 3L, 0, 0L)))  // 25+2 overflows
    assert(out(10L) == ((1, 0L, 0, 0L))) // shards are independent
    assert(out(11L) == ((1, 1L, 0, 0L))) // 9+2 > 10
  }

  test("rebalanceTokenShares: binding group kept whole, shares approached, absent groups dropped") {
    import spark.implicits._
    // a: 10k tokens, b: 3k, c: 2k; targets a .5 / b .3 — c dropped.
    // M = min(10000/.5, 3000/.3) = 10000 → keep a: 5000/10000 = .5, b: all
    val docs = (1 to 100).map(i => (i.toLong, "a", 100L)) ++
      (101 to 130).map(i => (i.toLong, "b", 100L)) ++
      (131 to 150).map(i => (i.toLong, "c", 100L))
    val df = docs.toDF("id", "grp", "n")
    val kept = Sampling.rebalanceTokenShares(df, col("grp"), col("id"), col("n"),
        Map("a" -> 0.5, "b" -> 0.3))
      .groupBy("grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!kept.contains("c"))          // not in the mix spec
    assert(kept("b") == 30L)             // binding group: keep-fraction 1.0
    // group a targets half its rows; the content hash approximates
    assert(kept("a") > 30L && kept("a") < 70L, s"kept=${kept("a")}")
    // deterministic: an identical second call keeps the identical set
    val again = Sampling.rebalanceTokenShares(df, col("grp"), col("id"), col("n"),
        Map("a" -> 0.5, "b" -> 0.3))
      .groupBy("grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == kept)
  }

  test("materializePacks: texts concatenate in pack order with the separator") {
    import spark.implicits._
    val docs = Seq(
      (1L, 0, 4L, "one"), (2L, 0, 6L, "two"), (3L, 0, 3L, "three"),
      (10L, 1, 9L, "ten"))
      .toDF("id", "shard", "n", "text")
    val asg = Sampling.packSequences(docs, "id", "shard", "n", budget = 10L)
    val packs = Sampling.materializePacks(docs, "id", "text", asg)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getString(3))).toMap
    // shard 0: [4,6] fill pack 0 ("one\n\ntwo" in pack order), 3 -> pack 1
    assert(packs((0, 0L)) == ((2L, "one\n\ntwo")))
    assert(packs((0, 1L)) == ((1L, "three")))
    assert(packs((1, 0L)) == ((1L, "ten")))
    assert(packs.size == 3)
  }

  test("property: packSequences invariants — exactly-once, budget, contiguous positions") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop}
    val genDocs = Gen.nonEmptyListOf(for {
      shard <- Gen.choose(0, 2)
      n <- Gen.frequency(8 -> Gen.choose(1L, 40L), 1 -> Gen.choose(80L, 150L))
    } yield (shard, n)).map(_.zipWithIndex.map { case ((s, n), i) => (i.toLong, s, n) })
    checkProp(Prop.forAll(genDocs) { docs =>
      val budget = 60L
      val df = docs.toDF("id", "shard", "n")
      val out = Sampling.packSequences(df, "id", "shard", "n", budget)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getLong(4)))
      val byId = out.groupBy(_._1)
      val nMap = docs.map(d => d._1 -> d._3).toMap
      // 1. every doc assigned exactly once
      val exactlyOnce = out.length == docs.length && byId.forall(_._2.length == 1)
      // 2. pack totals within budget unless the pack is a single over-long doc
      val packs = out.groupBy(t => (t._2, t._3))
      val budgetOk = packs.values.forall { members =>
        val total = members.map(m => nMap(m._1)).sum
        total <= budget || members.length == 1
      }
      // 3. positions within a pack are 0..k-1 in id order, and
      //    pack_tokens_before is the running sum of earlier members
      val posOk = packs.values.forall { members =>
        val sorted = members.sortBy(_._1)
        sorted.map(_._4).toSeq == sorted.indices &&
          sorted.zipWithIndex.forall { case (m, i) =>
            m._5 == sorted.take(i).map(x => nMap(x._1)).sum
          }
      }
      exactlyOnce && budgetOk && posOk
    }, minTests = 15)
  }

  test("dsirWeights: target-domain docs outweigh off-domain; empty doc weighs 0") {
    import graft.operators.Sampling
    import spark.implicits._
    // target domain = cooking; corpus has cooking and legal docs
    val corpus = Seq(
      (1L, "stir the sauce and bake the bread"),
      (2L, "whisk the sauce then bake fresh bread"),
      (3L, "the court ruled the statute unconstitutional today"),
      (4L, "")
    ).toDF("doc_id", "text")
    val target = Seq(
      (10L, "bake bread and stir sauce gently"),
      (11L, "whisk the sauce and bake")
    ).toDF("doc_id", "text")
    val out = Sampling.dsirWeights(corpus, target, "doc_id", col("text"), buckets = 256)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(out(1L)._2 > out(3L)._2 && out(2L)._2 > out(3L)._2,
      s"cooking docs must outweigh the legal doc: $out")
    assert(out(4L) == ((0, 0.0)))
    // weights are deterministic across recomputation (content-addressed)
    val again = Sampling.dsirWeights(corpus, target, "doc_id", col("text"), buckets = 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.forall { case (k, (_, w)) => again(k) == w })
  }

  test("temperatureSample: alpha=1 identity, alpha=0 equalizes, damping is monotone in alpha") {
    import spark.implicits._
    // skewed corpus: 400 'en', 100 'de', 25 'fr'
    val df = ((0 until 400).map(i => (i.toLong, "en")) ++
      (400 until 500).map(i => (i.toLong, "de")) ++
      (500 until 525).map(i => (i.toLong, "fr"))).toDF("id", "lang")
    def kept(alpha: Double): Map[String, Long] =
      Sampling.temperatureSample(df, col("lang"), col("id"), alpha, "t1")
        .groupBy("lang").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // alpha = 1: natural distribution — every row kept
    assert(kept(1.0) == Map("en" -> 400L, "de" -> 100L, "fr" -> 25L))
    // the rarest group is never subsampled, at any alpha
    assert(Seq(0.0, 0.3, 0.7).forall(a => kept(a)("fr") == 25L))
    // alpha = 0: target counts equalize at the min group size (hash
    // selection is binomial around the 25-row target — allow slack)
    val k0 = kept(0.0)
    assert(k0("en") <= 40 && k0("de") <= 40,
      s"alpha=0 should equalize toward 25 per group: $k0")
    // dominant-group keep count grows monotonically with alpha
    val enSizes = Seq(0.0, 0.3, 0.7, 1.0).map(a => kept(a)("en"))
    assert(enSizes == enSizes.sorted, s"en counts not monotone in alpha: $enSizes")
    // determinism: same inputs, same kept ids
    val a = Sampling.temperatureSample(df, col("lang"), col("id"), 0.5, "t1")
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.temperatureSample(df.repartition(7), col("lang"), col("id"), 0.5, "t1")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("redactPii: emails, phones, IPv4 replaced; prose untouched") {
    import spark.implicits._
    val texts = Seq(
      "mail me at jo.doe+x@mail.example.org today",
      "call +1 (555) 123-4567 now",
      "server at 192.168.1.100 is up",
      "no pii here, just words and one 7 digit")
    val out = texts.toDF("t").select(TextFunctions.redactPii(col("t")).as("r"))
      .as[String].collect().toSeq
    assert(out(0) == "mail me at <EMAIL> today")
    assert(out(1) == "call <PHONE> now")
    assert(out(2) == "server at <IP> is up")
    assert(out(3) == texts(3))
  }

  test("temperatureSampleByMass: unit mass ≡ row-count form; mass shifts the thresholds; zero-mass group dropped") {
    import spark.implicits._
    import graft.operators.Sampling
    val df = (1L to 300L).map(i => (i, if (i % 10 < 7) "big" else "small"))
      .toDF("doc_id", "grp").withColumn("one", lit(1L))
    // with unit mass the by-mass form IS temperatureSample (same counts,
    // same thresholds, same hash) — row-for-row identical
    val a = Sampling.temperatureSample(df, col("grp"), col("doc_id"),
      alpha = 0.5, salt = "tm").select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.temperatureSampleByMass(df, col("grp"), col("doc_id"),
      col("one"), alpha = 0.5, salt = "tm")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
    // mass (not row count) drives the damping: give the row-minority
    // group the token majority and alpha=0 must downsample the OTHER one
    val wdf = df.withColumn("mass",
      when(col("grp") === "small", lit(100L)).otherwise(lit(1L)))
    val kept = Sampling.temperatureSampleByMass(wdf, col("grp"), col("doc_id"),
        col("mass"), alpha = 0.0, salt = "tm2")
      .groupBy("grp").agg(sum("mass").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // small holds ~9000 of ~9210 mass; at alpha=0 both groups target equal
    // mass, so small is heavily downsampled while big keeps everything
    assert(kept("big") == 210L, s"big should keep all its mass: $kept")
    assert(kept("small") < 9000L / 4, s"small should be damped hard: $kept")
    // a zero-mass group never samples
    val zdf = df.withColumn("mass",
      when(col("grp") === "small", lit(0L)).otherwise(lit(1L)))
    val zg = Sampling.temperatureSampleByMass(zdf, col("grp"), col("doc_id"),
        col("mass"), alpha = 0.5, salt = "tm3")
      .select("grp").distinct().collect().map(_.getString(0)).toSet
    assert(zg == Set("big"))
  }

  test("duplicationAdjustedTokens: per-cluster mass conservation; dup-padded group stops inflating the mix") {
    import spark.implicits._
    import graft.operators.Sampling
    // property (seeded trials): a cluster of n copies with T tokens each
    // contributes n·((T·(1e6 div n)) div 1e6) ∈ (T − n·(1 + T/1e6), T] —
    // the corpus counts duplicated content ONCE, up to the documented
    // ≤1-ppm-per-member floor loss
    val rnd = new scala.util.Random(14L)
    val clusters = (0 until 40).map { cid =>
      (cid.toLong, rnd.nextInt(50) + 1, rnd.nextInt(10000).toLong) // (cid, n, T)
    }
    val rows = clusters.flatMap { case (cid, n, t) =>
      (0 until n).map(i => (cid * 1000 + i, cid, t, 1000000L / n))
    }.toDF("doc_id", "cid", "n_tok", "weight_ppm")
    val adjusted = rows
      .withColumn("w_tok",
        Sampling.duplicationAdjustedTokens(col("n_tok"), col("weight_ppm")))
      .groupBy(col("cid")).agg(sum(col("w_tok")).as("mass"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    clusters.foreach { case (cid, n, t) =>
      val mass = adjusted(cid)
      assert(mass <= t, s"cluster $cid: mass $mass exceeds one copy's $t")
      val floorLoss = n * (1.0 + t.toDouble / 1000000.0)
      assert(mass > t - floorLoss - 1,
        s"cluster $cid (n=$n, T=$t): mass $mass lost more than the ppm floor")
    }
    // the composition is the point: group B padded with 9 extra copies of
    // every doc has ~10× the RAW token mass of group A, but the SAME
    // adjusted mass — so rebalance to 50/50 keeps thresholds honest
    // instead of letting the duplicates claim 10× the share
    val a = (0L until 20L).map(i => (i, "A", 100L, 1000000L))
    val b = (0L until 20L).flatMap(i =>
      (0 until 10).map(c => (1000L + i * 10 + c, "B", 100L, 100000L)))
    val mix = (a ++ b).toDF("doc_id", "grp", "n_tok", "weight_ppm")
      .withColumn("w_tok",
        Sampling.duplicationAdjustedTokens(col("n_tok"), col("weight_ppm")))
    val masses = mix.groupBy(col("grp")).agg(sum(col("w_tok")).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(masses("A") == 2000L && masses("B") == 2000L,
      s"adjusted masses should match across the padded group: $masses")
    val kept = Sampling.rebalanceTokenShares(mix, col("grp"), col("doc_id"),
        col("w_tok"), targetShares = Map("A" -> 0.5, "B" -> 0.5), salt = "mc")
      .groupBy(col("grp")).agg(sum(col("w_tok")).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // equal adjusted masses + equal shares ⇒ both groups kept whole
    assert(kept == masses, s"50/50 over equal adjusted masses: $kept")
  }
}
