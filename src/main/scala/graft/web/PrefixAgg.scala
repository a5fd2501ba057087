package graft.web

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, JoinedRow, UnaryExpression, UnsafeProjection}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{ColumnBridge, InternalBridge}
import org.apache.spark.sql.types._

/** Globally-ordered running (prefix) aggregates WITHOUT a whole-table
  * single-partition window.
  *
  * `sum(x) OVER (ORDER BY …)` with no partition keys funnels the entire table
  * through one task in Spark — the one construct that cannot survive a scale-up.
  * But a global running aggregate is a classic two-level prefix computation:
  *
  *  1. split the key space into contiguous RANGES and group rows by range id;
  *  2. one imperative prefix scan per range (`mapPartitions` — the single
  *     genuinely sequential-per-range computation in this engine, and the right
  *     physical shape for it);
  *  3. aggregate one total row per range (map-side partials + a tiny exchange),
  *     prefix those P rows with an ordinary window (P = range count, so the
  *     "single partition" there is a few KB), broadcast-join the per-range
  *     offsets back, and combine.
  *
  * DETERMINISM: the range id is a PURE FUNCTION of the row — a codegen'd binary
  * search over quantile bounds computed once up front — NOT `spark_partition_id()`
  * over `repartitionByRange`. That distinction is load-bearing: Spark's
  * `RangePartitioner` samples its bounds with an RDD-id-derived seed, so the two
  * plan branches that consume the sorted frame (the running scan and the totals
  * aggregate) can recompute the exchange with DIFFERENT bounds, silently
  * misaligning rows and offsets (observed: ~94% of rows wrong at sf0.01). A
  * column-derived range id is identical on every recomputation by construction.
  *
  * EAGER at plan time: one `approxQuantile` job over the (column-pruned) leading
  * order key computes the bounds — same contract as `Ann.assign`'s centroid
  * collect; pass a cached frame if the upstream is expensive.
  *
  * Semantics match `ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW` over the
  * total order `orderBy`: Count counts rows; Sum/Min/Max skip nulls and are null
  * until the first non-null value. `orderBy` must be a total order (include a
  * unique tie-breaker) — the engine-wide contract for running features. The
  * leading order column must be numeric or a timestamp (it defines the range
  * key; timestamps bucket at one-second granularity, which preserves contiguity
  * because truncation is monotone). Sum over doubles reassociates once per range
  * boundary (offset + local), so the last ulp can differ from a sequential fold —
  * the oracle gate compares at 6 dp like every float gate.
  */
object PrefixAgg {

  sealed trait Op
  object Op {
    case object Count extends Op
    case object Sum extends Op
    case object Min extends Op
    case object Max extends Op
  }

  /** One running output: `op` over `input` (ignored for Count), named `out`. */
  final case class RunningSpec(op: Op, input: String, out: String)

  def runningCount(out: String): RunningSpec = RunningSpec(Op.Count, "", out)

  /** Deterministic bucket of `v` among sorted `bounds`: the count of bounds
    * strictly below `v`, i.e. range r = (bounds(r-1), bounds(r)]. Monotone in `v`,
    * so concatenating buckets in id order is the global key order.
    */
  def bucketOf(v: Double, bounds: Array[Double]): Int = {
    val i = java.util.Arrays.binarySearch(bounds, v)
    if (i >= 0) i else -i - 1
  }

  /** Codegen'd binary-search range-bucket assignment over literal bounds. */
  private[web] case class RangeBucket(child: Expression, bounds: Array[Double])
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(v: Any): Any = bucketOf(v.asInstanceOf[Double], bounds)
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
      val ref = ctx.addReferenceObj("graftPrefixBounds", bounds, "double[]")
      defineCodeGen(ctx, ev, c => s"graft.web.PrefixAgg.bucketOf($c, $ref)")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def running(df: DataFrame, orderBy: Seq[String], specs: Seq[RunningSpec],
      numRanges: Int = 0): DataFrame = {
    require(orderBy.nonEmpty, "orderBy must be a (total) order — include a unique tie-breaker")
    require(specs.nonEmpty, "need at least one RunningSpec")
    require(specs.map(_.out).distinct.size == specs.size, "duplicate output names")
    require(numRanges >= 0, s"numRanges must be >= 0 (0 = derive from conf), got $numRanges")
    val spark = df.sparkSession
    val ranges =
      if (numRanges > 0) numRanges
      // the conf may be non-numeric on some platforms (e.g. "auto"): fall back to the
      // cluster's default parallelism rather than throwing NumberFormatException
      else spark.conf.get("spark.sql.shuffle.partitions").toIntOption
        .getOrElse(spark.sparkContext.defaultParallelism)

    // deterministic range id from quantile bounds of the leading order key
    val headField = df.schema(orderBy.head)
    val keyD: Column = headField.dataType match {
      case TimestampType | TimestampNTZType | DateType =>
        // one-second granularity; truncation is monotone so contiguity holds
        col(orderBy.head).cast("timestamp").cast("long").cast("double")
      case _: NumericType => col(orderBy.head).cast("double")
      case t => throw new IllegalArgumentException(
        s"leading order column must be numeric or timestamp for range bucketing, got $t")
    }
    val keyName = "__graft_prefix_key"
    val probs = (1 until ranges).map(_.toDouble / ranges).toArray
    val bounds: Array[Double] =
      if (probs.isEmpty) Array.empty
      else df.select(keyD.as(keyName)).stat
        .approxQuantile(keyName, probs, 1.0 / math.max(100, 10 * ranges))
        .distinct.sorted
    val rid = "__graft_prefix_rid"
    val ridCol =
      if (bounds.isEmpty) lit(0)
      else ColumnBridge.column(RangeBucket(ColumnBridge.expression(keyD), bounds))

    // numeric inputs pre-cast to double (Count needs no input column at all)
    val inName: Map[String, String] = specs.collect {
      case s if s.op != Op.Count => s.out -> s"__graft_prefix_in_${s.out}"
    }.toMap
    val grouped = df
      .withColumns(specs.collect { case s if s.op != Op.Count =>
        inName(s.out) -> col(s.input).cast("double")
      }.toMap)
      .withColumn(rid, ridCol)
      .repartition(ranges, col(rid))
      // several ranges may hash into one task: sort by (rid, order) and let the
      // fold reset its accumulators on every rid change
      .sortWithinPartitions(col(rid) +: orderBy.map(col): _*)

    // ---- 2) range-local running values, one pass, no further shuffle. The fold
    //      runs at the InternalRow level — rows stay in Tungsten format end-to-end.
    //      The previous formulation (`Dataset.mapPartitions` + `Encoders.row`)
    //      deserialized every row into a boxed external Row and re-encoded it, a
    //      pure codec tax on the one deliberately-sequential pass: 18.0s → 10.0s
    //      (1.11M → 2.00M rows/s) at 20M rows, local[32] (graft.PrefixBench,
    //      BENCH/BASELINE.md round 4). Pass-through columns ride along inside the
    //      UnsafeProjection; the fold reads only rid and the pre-cast input doubles.
    val localNames = specs.map(s => s"__graft_prefix_local_${s.out}")
    val outSchema = StructType(grouped.schema.fields ++ specs.zip(localNames).map {
      case (s, n) =>
        StructField(n, if (s.op == Op.Count) LongType else DoubleType, nullable = true)
    })
    val fieldIdx = grouped.schema.fieldNames.zipWithIndex.toMap
    val ridIdx = fieldIdx(rid)
    val ops: Array[Op] = specs.map(_.op).toArray
    val inputIdx: Array[Int] = specs.map { s =>
      if (s.op == Op.Count) -1 else fieldIdx(inName(s.out))
    }.toArray
    val localRdd = grouped.queryExecution.toRdd.mapPartitions { it =>
      val n = ops.length
      var curRid = 0
      var curRidNull = false
      var first = true
      var cnt = 0L
      val acc = new Array[Double](n)
      val seen = new Array[Boolean](n)
      val extra = new GenericInternalRow(n)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outSchema)
      it.map { row =>
        // a null leading key yields a null rid (its own range, globally first)
        val rNull = row.isNullAt(ridIdx)
        val r = if (rNull) 0 else row.getInt(ridIdx)
        if (first || rNull != curRidNull || r != curRid) {
          curRid = r; curRidNull = rNull; first = false
          cnt = 0L
          java.util.Arrays.fill(seen, false)
        }
        cnt += 1L
        var j = 0
        while (j < n) {
          ops(j) match {
            case Op.Count => extra.update(j, cnt)
            case op =>
              if (!row.isNullAt(inputIdx(j))) {
                val v = row.getDouble(inputIdx(j))
                if (!seen(j)) { acc(j) = v; seen(j) = true }
                else op match {
                  case Op.Sum => acc(j) += v
                  // Double.compare, not < / >: Spark's min/max (and the totals
                  // branch + least/greatest combine) order NaN as GREATEST and
                  // -0.0 < 0.0; raw comparisons would make a NaN's effect depend
                  // on which range it landed in
                  case Op.Min => if (java.lang.Double.compare(v, acc(j)) < 0) acc(j) = v
                  case Op.Max => if (java.lang.Double.compare(v, acc(j)) > 0) acc(j) = v
                  case Op.Count => ()
                }
              }
              extra.update(j, if (seen(j)) java.lang.Double.valueOf(acc(j)) else null)
          }
          j += 1
        }
        // the projection's output buffer is reused per row — the standard operator
        // output contract; downstream operators copy when they buffer
        proj(joined(row, extra)): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    val local = InternalBridge.internalCreateDataFrame(spark, localRdd, outSchema)

    // ---- 3) per-range totals → exclusive prefix offsets → broadcast back.
    //      Aggregated over `local`, i.e. the SAME shuffled-and-folded RDD lineage the
    //      probe side scans: Spark core runs the one data shuffle's map stage once
    //      and both consumers read its files (the fold itself re-runs on the
    //      aggregate's pass — a cheap streaming scan). Correctness doesn't depend on
    //      the reuse because rid is a pure row function — an independent
    //      recomputation buckets every row identically.
    val totalAggs = specs.map { s =>
      val a = s.op match {
        case Op.Count => count(lit(1)).cast("long")
        case Op.Sum   => sum(col(inName(s.out)))
        case Op.Min   => min(col(inName(s.out)))
        case Op.Max   => max(col(inName(s.out)))
      }
      a.as(s"__t_${s.out}")
    }
    val totals = local.groupBy(col(rid)).agg(totalAggs.head, totalAggs.tail: _*)
    // UNPARTITIONED window — deliberately: this frame has exactly numRanges rows
    // (64–1024), not corpus rows, so the single-partition WindowExec Spark WARNs
    // about is a micro-step; the corpus-sized data never passes through it
    val wPrev = Window.orderBy(col(rid)).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals.select(
      col(rid) +: specs.map { s =>
        val t = col(s"__t_${s.out}")
        val off = s.op match {
          case Op.Count => coalesce(sum(t).over(wPrev), lit(0L))
          case Op.Sum   => sum(t).over(wPrev)
          case Op.Min   => min(t).over(wPrev)
          case Op.Max   => max(t).over(wPrev)
        }
        off.as(s"__o_${s.out}")
      }: _*)

    // null-SAFE equality: a null leading key yields a null range id (globally
    // first, NULLS FIRST), and those rows must still find their offset row
    val rid2 = "__graft_prefix_rid2"
    val joined = local.join(
      broadcast(offsets.withColumnRenamed(rid, rid2)), col(rid) <=> col(rid2))
      .drop(rid2)
    val outCols = specs.zip(localNames).map { case (s, ln) =>
      val l = col(ln); val o = col(s"__o_${s.out}")
      val combined = s.op match {
        case Op.Count => o + l
        // null only while NO value has been seen anywhere in the prefix
        case Op.Sum => when(l.isNull && o.isNull, lit(null).cast("double"))
          .otherwise(coalesce(o, lit(0.0)) + coalesce(l, lit(0.0)))
        case Op.Min => least(o, l)    // least/greatest skip nulls, null iff both
        case Op.Max => greatest(o, l)
      }
      combined.as(s.out)
    }
    joined
      .withColumns(specs.map(_.out).zip(outCols).toMap)
      .drop(rid +: (inName.values.toSeq ++ localNames ++ specs.map(s => s"__o_${s.out}")): _*)
  }
}
