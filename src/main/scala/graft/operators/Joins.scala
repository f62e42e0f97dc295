package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join helpers for scale pathologies (SURVEY.md §4.4 / builder mandate:
  * "salting for skew, AQE for runtime re-plan").
  *
  * AQE's skew-join split handles skewed SORT-MERGE joins automatically (keep
  * `spark.sql.adaptive.enabled=true`); explicit salting remains the tool
  * when a single hot key overwhelms even split partitions, or when the
  * aggregation AFTER the join is the skewed stage.
  */
object Joins {

  /** Inner equi-join with salted keys: the big (skewed) side derives a
    * deterministic salt in [0, numSalts) from `saltSource` (any column with
    * per-row variety — an id, not the join key); the small side is
    * replicated numSalts× so every (key, salt) bucket finds its match.
    * Result set is identical to `big.join(small, bigKey === smallKey)`
    * (inner; equality spec-tested) but the shuffle spreads each hot key over
    * numSalts partitions.
    *
    * Salting only helps a SHUFFLE join — it spreads a hot key's rows across
    * numSalts shuffle partitions. When the small side fits the broadcast
    * threshold Catalyst picks a BroadcastHashJoin: the big side is never
    * shuffled, skew cannot concentrate on one task, and replicating the
    * build side numSalts× only bloats the broadcast build (measured 2–3× on
    * the q46 probe). So when the optimizer's own size estimate says the
    * small side will broadcast, this joins PLAIN (same result set); the
    * salted shape kicks in exactly where it pays — the SMJ/SHJ regime.
    * Pass `forceSalt = true` to keep the salted shape regardless (tests;
    * or when the estimate is known to be wrong).
    *
    * Cost in the salted regime: small side × numSalts — keep numSalts
    * modest (8–32) and the small side genuinely small.
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      saltSource: Column, numSalts: Int = 16,
      forceSalt: Boolean = false): DataFrame = {
    require(numSalts > 0)
    val threshold = org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
    val willBroadcast = threshold > 0 &&
      small.queryExecution.optimizedPlan.stats.sizeInBytes <= threshold
    if (willBroadcast && !forceSalt)
      big.join(small, big(bigKey) === small(smallKey))
    else {
      val salted = big.withColumn("_salt", pmod(hash(saltSource), lit(numSalts)))
      val replicated = small.withColumn("_salt",
        explode(sequence(lit(0), lit(numSalts - 1))))
      // resolve each key against its own frame: with same-named keys on both
      // sides (the common true-equi-join case) bare col(...) is ambiguous
      salted.join(replicated,
          salted("_salt") === replicated("_salt") && salted(bigKey) === replicated(smallKey))
        .drop("_salt")
    }
  }

  /** As-of join (J7), pandas-merge_asof-complete: for each left row, the
    * NEAREST right row with the same key at-or-before (`direction =
    * "backward"`, default) or at-or-after (`"forward"`) the left time,
    * optionally within `tolerance` time units. Spark has no native ASOF
    * JOIN; the scalable formulation is union + ONE window pass — shuffle is
    * one exchange on the key (vs a range-join's quadratic fallback). Ties
    * at equal time resolve to the right row ("at or before/after" includes
    * simultaneous rows); among same-timestamp right rows the MAX value wins
    * (deterministic).
    *
    * @param left      probe side; must contain `keyCol` and `timeCol`
    * @param right     reference side; must contain `keyCol`, `timeCol`, `valueCol`
    * @param leftId    a unique left-row id column name (deterministic window order)
    * @param direction "backward" (latest at-or-before) | "forward" (earliest at-or-after)
    * @param tolerance max |leftTime − rightTime| in the time column's own
    *                  units; requires a NUMERIC time column (pass
    *                  unix_micros(ts) for timestamps)
    * @return left rows + `asof_<valueCol>` (null when no match in range)
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String, valueCol: String, leftId: String,
      direction: String = "backward", tolerance: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got: $direction")
    val lCols = left.columns
    val asofType = new org.apache.spark.sql.types.StructType()
      .add("_t", left.schema(timeCol).dataType)
      .add("_v", right.schema(valueCol).dataType)
    val l = left.select(
      col(keyCol), col(timeCol), lit(1).as("_is_probe"),
      lit(null).cast(asofType).as("_asof_s"),
      struct(lCols.map(col): _*).as("_row"))
    val r = right.select(
      col(keyCol), col(timeCol), lit(0).as("_is_probe"),
      struct(col(timeCol).cast(left.schema(timeCol).dataType).as("_t"),
        col(valueCol).as("_v")).as("_asof_s"),
      lit(null).cast(l.schema("_row").dataType).as("_row"))
    // scan order: time toward the probe (asc for backward, desc for
    // forward), reference-before-probe at equal time (inclusive bound),
    // then value (last = max among same-timestamp references), probe id
    val timeOrd = if (direction == "backward") col(timeCol).asc else col(timeCol).desc
    val w = Window.partitionBy(col(keyCol))
      .orderBy(timeOrd, col("_is_probe"), col("_asof_s._v"), col(s"_row.$leftId"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("_asof", last(col("_asof_s"), ignoreNulls = true).over(w))
      .where(col("_is_probe") === 1)
    val inRange = tolerance match {
      case None => col("_asof._v")
      case Some(tol) =>
        val gap =
          if (direction == "backward") col(timeCol) - col("_asof._t")
          else col("_asof._t") - col(timeCol)
        when(gap <= tol, col("_asof._v"))
    }
    matched.select(
      lCols.map(c => col(s"_row.$c").as(c)) :+ inRange.as(s"asof_$valueCol"): _*)
  }

  /** Binned interval join — the SCALE path for "points inside windows"
    * (J6's theta-join semantics): a plain
    * `points.join(intervals, p >= lo && p <= hi)` has no equi-key, so
    * Catalyst can only plan BroadcastNestedLoopJoin — O(|P|·|I|) work and
    * a broadcast of a whole side, which stops working the day the interval
    * side outgrows the driver. This operator manufactures the equi-key:
    * quantize time into `binSize`-wide bins, explode each interval to the
    * bins it overlaps, equi-join on the bin (shuffle join — SMJ/SHJ, AQE
    * skew-splittable), then re-check the EXACT predicate. Each matching
    * (point, interval) pair appears exactly once — the interval emits the
    * point's bin exactly once — so no dedup pass is needed, and the result
    * set is provably identical to the theta join (spec-checked).
    *
    * Binning discipline (both engines agree because both sides use the
    * same `div`): `div` truncates toward zero, which is still MONOTONIC,
    * so bin(lo) ≤ bin(p) ≤ bin(hi) holds for any point p in [lo, hi] —
    * negative epochs included. Pick `binSize` near the typical interval
    * width: each interval then explodes to ~2 rows.
    *
    * Scale guard (the SemDeDup-cap discipline): a degenerate interval
    * spanning more than `maxBinsPerInterval` bins would explode one row
    * into millions; the build FAILS LOUDLY (raise_error) instead of
    * silently materializing it.
    */
  def binnedIntervalJoin(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binSize: Long, maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binSize > 0, s"binSize must be positive, got $binSize")
    require(maxBinsPerInterval > 0,
      s"maxBinsPerInterval must be positive, got $maxBinsPerInterval")
    val bsz = lit(binSize)
    val pb = points.withColumn("_graft_bin",
      call_function("div", col(pointCol), bsz))
    val binLo = call_function("div", col(loCol), bsz)
    val binHi = call_function("div", col(hiCol), bsz)
    val ib = intervals
      .where(col(loCol) <= col(hiCol)) // empty intervals match nothing
      .withColumn("_graft_bin", explode(
        when(binHi - binLo >= maxBinsPerInterval.toLong, expr(
          s"raise_error(concat('interval spans more than $maxBinsPerInterval " +
            s"bins of $binSize at $loCol=', $loCol, ' — raise binSize or cap " +
            "the interval'))").cast("array<long>"))
          .otherwise(sequence(binLo, binHi))))
    pb.join(ib,
        pb("_graft_bin") === ib("_graft_bin")
          && col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_graft_bin")
  }

  /** Binned interval-OVERLAP join — [[binnedIntervalJoin]]'s two-sided
    * sibling: pairs of intervals with `lLo ≤ rHi && rLo ≤ lHi` (the
    * standard overlap predicate), again as a bin equi-join instead of the
    * nested loop a raw theta join plans. Both sides explode to their
    * covered bins; a pair shares every bin in
    * [max(binLo_l, binLo_r), min(binHi_l, binHi_r)], so to emit EXACTLY
    * once without a distinct pass the join keeps only the FIRST shared
    * bin: joined bin == greatest(bin(lLo), bin(rLo)). The exact predicate
    * then re-checks on the raw bounds. Same monotonic-`div` binning and
    * the same loud maxBinsPerInterval guard on both sides.
    *
    * Column names across the two inputs must be disjoint (rename before
    * calling, as with any self-join).
    */
  def binnedOverlapJoin(left: DataFrame, lLo: String, lHi: String,
      right: DataFrame, rLo: String, rHi: String,
      binSize: Long, maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binSize > 0, s"binSize must be positive, got $binSize")
    require(maxBinsPerInterval > 0,
      s"maxBinsPerInterval must be positive, got $maxBinsPerInterval")
    val bsz = lit(binSize)
    def explodeBins(df: DataFrame, lo: String, hi: String): DataFrame = {
      val binLo = call_function("div", col(lo), bsz)
      val binHi = call_function("div", col(hi), bsz)
      df.where(col(lo) <= col(hi))
        .withColumn("_graft_bin", explode(
          when(binHi - binLo >= maxBinsPerInterval.toLong, expr(
            s"raise_error(concat('interval spans more than $maxBinsPerInterval " +
              s"bins of $binSize at $lo=', $lo, ' — raise binSize or cap " +
              "the interval'))").cast("array<long>"))
            .otherwise(sequence(binLo, binHi))))
    }
    val l = explodeBins(left, lLo, lHi)
    val r = explodeBins(right, rLo, rHi)
    l.join(r,
        l("_graft_bin") === r("_graft_bin")
          // first shared bin only — each overlapping pair emits exactly once
          && l("_graft_bin") === greatest(
               call_function("div", col(lLo), bsz),
               call_function("div", col(rLo), bsz))
          && col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .drop("_graft_bin")
  }

  /** Salted aggregation: two-phase groupBy for a skewed grouping key —
    * partial aggregate on (key, salt), then final on key. `partialAggs`
    * must be decomposable (sum/count/min/max); the caller re-aggregates the
    * partial columns in `finalAggs`.
    */
  def saltedGroupBy(df: DataFrame, key: Column, saltSource: Column, numSalts: Int)(
      partialAggs: Seq[Column])(finalAggs: Seq[Column]): DataFrame =
    df.withColumn("_salt", pmod(hash(saltSource), lit(numSalts)))
      .groupBy(key, col("_salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(key)
      .agg(finalAggs.head, finalAggs.tail: _*)

  /** The DIAGNOSIS that decides whether the salted shapes above are
    * needed: per-key occupancy of the would-be shuffle, top `topK` keys by
    * row count with their exact share in ppm. Run it on the join/group key
    * BEFORE a 100 TB job — a top key holding >1/numPartitions of the rows
    * is the one-straggler-task signature. One partial-aggregatable count
    * plus a driver-side top-k (`topK` rows, not the key space); the share
    * quotient is the repo's exact-integer ppm (no float drift, so the
    * probe hash-matches).
    *
    * @return (key, n, share_ppm) — top keys first, ties to the smaller key
    */
  def keySkewStats(df: DataFrame, key: Column, topK: Int): DataFrame = {
    require(topK > 0, "topK must be positive")
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("_t"))
    counts.crossJoin(broadcast(total))
      .withColumn("share_ppm",
        // Exact integral division (`div`, = DuckDB `//`): the scaled-minus-
        // remainder-over-double form loses ulps once n·10⁶ passes 2⁵³ —
        // i.e. exactly at the 100 TB key counts this diagnostic targets.
        call_function("div", col("n") * lit(1000000L), col("_t")))
      .drop("_t")
      .orderBy(col("n").desc, col("key").asc)
      .limit(topK)
  }

  /** BLOOM-PRUNED inner equi-join — explicit semi-join reduction for the
    * selective-join shape that dominates 100 TB scans: when the small
    * side's keys match only a sliver of the big side, the big side's
    * non-matching rows still pay the full shuffle under a plain SMJ. A
    * bloom of the small side's keys (Spark's OWN sketch —
    * BloomFilterAggregate, the runtime-filter machinery — built in one
    * aggregate and inlined as a literal) filters the big side BEFORE its
    * exchange: false positives just ride through to the real join (exact
    * result, oracle ≡ plain join — the q46 discipline: the bloom is
    * execution-only), false negatives are impossible.
    *
    * The sketch collects to the driver as ONE bounded binary row
    * (numBits/8 bytes — size it like a broadcast: default 8M bits = 1 MB
    * handles ~1M keys at ~3% fp) because catalyst requires the
    * might_contain bloom side foldable. Both sides hash with the same
    * seeded XxHash64 the built-in runtime filter uses. Sizing is capped
    * at the session's `spark.sql.optimizer.runtime.bloomFilter
    * .maxNumBits`/`maxNumItems` confs (defaults 2^26 bits = 8 MB / 4M
    * items) — BloomFilterAggregate clamps to them SILENTLY, so this
    * helper refuses params above the caps rather than hand back a
    * sketch with an unplanned fp rate (raise the confs for bigger keys
    * sets).
    *
    * When Catalyst would broadcast the small side anyway, the bloom is
    * redundant (BHJ never shuffles the big side) — this helper is for the
    * SMJ/SHJ regime, the same division of labor saltedEquiJoin documents.
    */
  def bloomPrunedJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      expectedItems: Long = 1000000L, numBits: Long = 8388608L): DataFrame = {
    import org.apache.spark.sql.graft.BloomFunctions
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    require(numBits > 0, s"numBits must be positive, got $numBits")
    // BloomFilterAggregate SILENTLY clamps both sizing params to the
    // session's runtime-bloom-filter caps (defaults 2^26 bits / 4M items)
    // — a sketch sized above them would quietly degrade to a far higher
    // fp rate than the caller computed for (result stays exact, pruning
    // does not; ADVICE r10). Fail loudly at the effective caps instead;
    // raise the confs to size bigger sketches.
    val conf = big.sparkSession.conf
    val maxBits = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    val maxItems = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    require(numBits <= maxBits,
      s"numBits $numBits exceeds spark.sql.optimizer.runtime.bloomFilter" +
        s".maxNumBits ($maxBits) — BloomFilterAggregate would silently clamp " +
        "the sketch and inflate its false-positive rate; raise the conf")
    require(expectedItems <= maxItems,
      s"expectedItems $expectedItems exceeds spark.sql.optimizer.runtime" +
        s".bloomFilter.maxNumItems ($maxItems) — BloomFilterAggregate would " +
        "silently clamp and inflate the false-positive rate; raise the conf")
    val bloomRow = small
      .agg(BloomFunctions.bloomAgg(BloomFunctions.keyHash(col(smallKey)),
        expectedItems, numBits).as("bloom"))
      .head() // bounded driver collect: ONE binary row of numBits/8 bytes
    if (bloomRow.isNullAt(0)) {
      // empty small side → empty inner join; keep the schema
      big.join(small, col(bigKey) === col(smallKey)).where(lit(false))
    } else {
      big.where(BloomFunctions.mightContain(bloomRow.getAs[Array[Byte]](0),
          BloomFunctions.keyHash(col(bigKey))))
        .join(small, col(bigKey) === col(smallKey))
    }
  }
}
