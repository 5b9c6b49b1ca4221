package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parallelism floor for compute-bound maps.
  *
  * A file scan splits by BYTES (`max(openCostInBytes,
  * totalSize/defaultParallelism)` per split), which sizes it for I/O —
  * not for the CPU behind it. A text corpus is small on disk relative
  * to the work its consumers do per byte (shingle/token/char-pair
  * generation, per-row hash lotteries), so at any SF where
  * `bytes / maxPartitionBytes < cores` the whole generate stage runs on
  * a fraction of the machine: the 818 MB sf100 documents table scans as
  * ~7 splits and left `llm_bpe_pairs` on 7 of 32 cores (3.1× measured
  * at the sf100 rung); the same disease cost `sample_weighted` 13 s at
  * sf0.1 (r11) and the brute-jaccard twin 23.6 s at sf1 (r13).
  *
  * The cure is one round-robin exchange of the RAW rows — cheap,
  * because the under-split case is by definition small-bytes — applied
  * only when the scan actually under-splits. At production scale a
  * corpus has ≥ cores splits and this is a no-op, so the branch never
  * costs an exchange where the scan is already parallel.
  */
object Spread {
  /** `df`, repartitioned to the core count iff it has fewer partitions
    * than cores. Use on the input of a CPU-bound map/generate stage. */
  def cpuBound(spark: SparkSession, df: DataFrame): DataFrame = {
    val cores = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores) else df
  }
}
