package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] End-to-end curation disposition — the whole pretraining
  * intake decision as ONE composed Spark plan: every document gets
  * exactly one verdict, in gate order:
  *
  *   1. `rejected_quality`   — fails the Gopher rule bundle
  *      ([[TextStats.gopherRules]]);
  *   2. `rejected_duplicate` — a near-duplicate (MinHash-LSH pairs →
  *      connected components, [[Dedup.clusterPairs]]) that is NOT its
  *      cluster's min-id representative. The representative is min-id
  *      regardless of quality — the standard deterministic convention,
  *      so membership is re-derivable without the quality table;
  *   3. `train` / `val` / `test` — survivors split by the portable
  *      md5 hash gate ([[Sampling.splitAssign]]).
  *
  * This is the table a curation run writes next to its output shards:
  * the full audit trail of why every input document was kept or
  * dropped. Scale shape: nothing here is new — the gates compose the
  * operators' existing shuffle classes (projection-only rules,
  * banded minhash equi-joins + CC, a hash-gate projection), and the
  * verdict join is keyed on the doc id.
  */
object Curation {

  def disposition(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val rules = TextStats.gopherRules(docs, idCol, textCol)
      .select(col(idCol), col("pass"))
    val pairs = Dedup.portableMinHashNearDuplicates(
      docs, idCol, textCol,
      shingleN = 3, numHashes = 16, bands = 4, threshold = 0.5)
    val comp = Dedup.clusterPairs(pairs, "id_a", "id_b")
      .withColumnRenamed("id", "__cid")
    val keyed = rules
      .join(comp, rules(idCol) === comp("__cid"), "left")
      .drop("__cid")
      .withColumn("is_canonical",
        coalesce(col("cluster_rep"), col(idCol).cast("long")) ===
          col(idCol).cast("long"))
      .drop("cluster_rep")
    Sampling.splitAssign(keyed, idCol)
      .select(col(idCol), col("pass").as("quality_pass"), col("is_canonical"),
        when(!col("pass"), lit("rejected_quality"))
          .when(!col("is_canonical"), lit("rejected_duplicate"))
          .otherwise(col("split")).as("disposition"))
  }
}
