package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.Dataset

/** Bounded-memory frequency sketches: a per-partition pass whose state
  * never exceeds O(k), for the first stage of exact two-pass heavy-hitter
  * queries over corpora too large to group-by in one shot.
  */
object Sketches {

  /** Misra-Gries candidate pass. Per partition, maintains at most k-1
    * counters over the value stream; whenever a value arrives with no
    * counter and no slot is free, every counter is decremented (zeroed
    * counters drop out). Partition-local guarantee: any value with
    * partition frequency > n_p/k survives. Summing that over partitions
    * (an averaging argument: global frequency > N/k forces partition
    * frequency > n_p/k somewhere) makes the UNION of the partition
    * summaries a superset of every global N/k-heavy hitter.
    *
    * Memory is O(k) per partition no matter the input size, and at most
    * (k-1) x numPartitions candidates come back — so the expensive exact
    * count (pass 2) runs against a provably tiny candidate set instead
    * of the full value domain. This is the genuinely per-partition
    * imperative case the Dataset API can't express declaratively, hence
    * mapPartitions.
    */
  def misraGriesCandidates(values: Dataset[String], k: Int): Dataset[String] = {
    require(k >= 2, s"Misra-Gries needs k >= 2, got $k")
    import values.sparkSession.implicits._
    values.mapPartitions { it =>
      val counters = mutable.HashMap.empty[String, Long]
      it.foreach { v =>
        counters.get(v) match {
          case Some(c) => counters.update(v, c + 1)
          case None if counters.size < k - 1 => counters.update(v, 1L)
          case None =>
            // decrement-all on a snapshot — mutating a HashMap while
            // iterating it is undefined in scala.collection.mutable
            val snapshot = counters.toList
            counters.clear()
            snapshot.foreach { case (key, c) =>
              if (c > 1) counters.update(key, c - 1)
            }
        }
      }
      counters.keysIterator
    }.distinct()
  }
}
