package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch (r19 optimization round): explain("formatted") of OPERATOR
  * INTERNALS that the probe-level plans hide behind localCheckpoint cuts —
  * the approxPairs join chain and one resolveClusters iteration body, as
  * of THIS tree (post-optimization). Deleted before the freeze; output
  * committed under plans/r19/.
  */
object LegPlans {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val prepared = emb.withColumn("_features",
      array_to_vector(col("embedding").cast("array<double>")))
    val model = new BucketedRandomProjectionLSH()
      .setBucketLength(0.5).setNumHashTables(3).setSeed(42L)
      .setInputCol("_features").setOutputCol("_hashes").fit(prepared)
    val hashed = model.transform(prepared)
    // THIS TREE's approxPairs inner join chain (pre-materialize): narrow
    // (table, bucket, id) candidates + distinct id pairs + fused l2
    val buckets = hashed.select(col("vec_id").as("_id"),
        posexplode(col("_hashes")).as(Seq("_t", "_h")))
      .select(col("_id"), col("_t"),
        vector_to_array(col("_h")).getItem(0).cast("long").as("_b"))
    val cand = buckets.select(col("_id").as("id1"), col("_t"), col("_b"))
      .join(buckets.select(col("_id").as("id2"), col("_t"), col("_b")),
        Seq("_t", "_b"))
      .where(col("id1") < col("id2"))
      .select(col("id1"), col("id2")).distinct()
    val inner = cand
      .join(hashed.select(col("vec_id").as("id1"), col("embedding").as("_v1")), "id1")
      .join(hashed.select(col("vec_id").as("id2"), col("embedding").as("_v2")), "id2")
      .withColumn("l2_dist",
        graft.functions.VectorFunctions.l2Distance(col("_v1"), col("_v2")))
      .where(col("l2_dist") < 1.18)
      .select(col("id1"), col("id2"), col("l2_dist"))
    println("===== approxPairs_inner formatted =====")
    println(inner.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))

    // one resolveClusters DISTRIBUTED-path iteration body as of this tree
    // (the small-graph union-find path has no Spark plan — it is one
    // collect of the edge cut); labels0 now folds the first neighbor-min,
    // `next` is cut pre-jump and carries `prev`
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 9L), (5L, 7L)).toDF("id1", "id2")
    val edges = pairs.select(col("id1").as("src"), col("id2").as("dst"))
      .union(pairs.select(col("id2").as("src"), col("id1").as("dst")))
      .localCheckpoint(true)
    val labels = edges.groupBy(col("src")).agg(min(col("dst")).as("_m"))
      .select(col("src").as("id"), least(col("src"), col("_m")).as("rep"))
      .localCheckpoint(true)
    val viaNeighbors = edges
      .join(labels.withColumnRenamed("id", "dst").withColumnRenamed("rep", "nrep"), "dst")
      .groupBy(col("src").as("id"))
      .agg(min(col("nrep")).as("nbr_rep"))
    val next = labels.join(viaNeighbors, Seq("id"), "left_outer")
      .select(col("id"),
        least(col("rep"), coalesce(col("nbr_rep"), col("rep"))).as("rep"),
        col("rep").as("prev"))
      .localCheckpoint(true)
    val jumped = next.as("a")
      .join(next.select(col("id").as("_rid"), col("rep").as("_rrep")),
        col("a.rep") === col("_rid"), "left")
      .select(col("a.id").as("id"),
        coalesce(col("_rrep"), col("a.rep")).as("rep"),
        col("a.prev").as("prev"))
    println("===== resolveClusters_iter0_jumped formatted =====")
    println(jumped.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    val converged = jumped.localCheckpoint(true)
      .where(col("rep") =!= col("prev"))
    println("===== resolveClusters_convergence formatted =====")
    println(converged.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
