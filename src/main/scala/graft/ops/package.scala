package graft

import org.apache.spark.sql.DataFrame

package object ops {
  /** The session's configured shuffle parallelism, used as an EXPLICIT
    * partition count for compute-bound repartitions: with an explicit
    * count AQE won't coalesce the exchange away on byte-size grounds
    * (sketching 1 MB of text is hours of CPU at scale — row count, not
    * byte count, is the right sizing signal there). */
  private[ops] def shufflePartitions(df: DataFrame): Int =
    df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
}
