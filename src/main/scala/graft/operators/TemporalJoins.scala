package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of and range joins — temporal operators Spark lacks as
  * built-ins (driver north-star additions; no reference counterpart).
  * Both are expressed so the physical plan is a keyed shuffle, never a
  * theta/range join:
  *
  *   - [[asOf]] uses the union-and-tag formulation: quotes and probes
  *     are unioned, sorted once per key by (ts, tag, tie), and each
  *     probe picks up the running `last` quote payload. One exchange +
  *     one sort, state bounded per key partition — the 100 TB shape.
  *     A join-based formulation (`q.ts <= p.ts` + row_number) explodes
  *     to |probes|·|matching quotes| intermediate rows; this one is
  *     linear in |probes| + |quotes|.
  *   - [[recentPairs]] buckets the continuous key into window-sized
  *     cells and equi-joins on (key, cell), probing each probe's own
  *     cell and its predecessor, then applies the exact predicate.
  *     Shuffle is keyed by (key, cell); fan-out is bounded by cell
  *     population, never |A|×|B|. Skewed cells → AQE skew-join.
  */
object TemporalJoins {

  /** Left as-of join: every probe row, plus `payload` columns
    * (src → out name) from the latest quote with the same `key` and
    * `quote.ts <= probe.ts` (null when no such quote). Ties on quote
    * ts resolve to the greatest `quoteTieBreak` (must be integral,
    * e.g. an event id) so results are deterministic cross-engine.
    */
  def asOf(probes: DataFrame, quotes: DataFrame, key: String, ts: String,
      quoteTieBreak: String, payload: Seq[(String, String)]): DataFrame = {
    val carried = probes.columns.toSeq.filterNot(c => c == key || c == ts)
    // ALL payload columns ride in ONE struct: running `last` over the
    // struct picks the single latest quote atomically (its NULL fields
    // included). Per-column last(ignoreNulls) would "tear" — a NULL
    // field in the latest quote falling back to an older quote while
    // other fields come from the newer one, diverging from
    // [[graft.plans.AsOfJoinExec]].
    val payType = org.apache.spark.sql.types.StructType(payload.map {
      case (src, out) => org.apache.spark.sql.types.StructField(
        out, quotes.schema(src).dataType, nullable = true)
    })
    // a NULL-keyed or NULL-ts quote must never match (SQL join
    // semantics, and what AsOfJoinExec does): its payload struct is
    // nulled so the running last(ignoreNulls) skips it even inside
    // the NULL partition that Window.partitionBy groups together
    // (and even though a NULL ts sorts first under asc ordering)
    val qSide = quotes.select(
      Seq(col(key), col(ts), lit(0).as("__tag"),
        col(quoteTieBreak).cast("long").as("__tie")) ++
        carried.map(c => lit(null).cast(probes.schema(c).dataType).as(c)) :+
        when(col(key).isNotNull && col(ts).isNotNull,
          struct(payload.map { case (src, out) => col(src).as(out) }: _*)).as("__pay"): _*)
    val pSide = probes.select(
      Seq(col(key), col(ts), lit(1).as("__tag"),
        lit(null).cast("long").as("__tie")) ++
        carried.map(col) :+
        lit(null).cast(payType).as("__pay"): _*)
    // quotes sort before probes at equal ts (tag 0 < 1), so an
    // exactly-simultaneous quote IS visible to the probe ("at or
    // before"); running `last` with ignoreNulls skips probe rows (a
    // quote's struct is never null even when every field is).
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("__tag").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    qSide.unionByName(pSide)
      .select(Seq(col(key), col(ts), col("__tag")) ++ carried.map(col) :+
        last(col("__pay"), ignoreNulls = true).over(w).as("__pay"): _*)
      .where(col("__tag") === 1)
      .select(Seq(col(key), col(ts)) ++ carried.map(col) ++
        payload.map { case (_, out) => col(s"__pay.$out").as(out) }: _*)
  }

  /** Range self/cross join on a time window: pairs (probe, other) with
    * equal `key` and `other[oTs]` in `[probe[pTs] − windowUs, probe[pTs]]`
    * (microseconds, both ends inclusive). Probe and other frames must
    * have disjoint non-key column names. */
  def recentPairs(probes: DataFrame, pTs: String, others: DataFrame, oTs: String,
      key: String, windowUs: Long): DataFrame = {
    val pb = probes.withColumn("__cell", explode(array(
      expr(s"unix_micros($pTs) div ${windowUs}L"),
      expr(s"unix_micros($pTs) div ${windowUs}L - 1"))))
    val ob = others.withColumn("__cell", expr(s"unix_micros($oTs) div ${windowUs}L"))
    pb.join(ob, Seq(key, "__cell"))
      .where(expr(s"unix_micros($oTs) <= unix_micros($pTs)" +
        s" and unix_micros($pTs) - unix_micros($oTs) <= ${windowUs}L"))
      .drop("__cell")
  }
}
