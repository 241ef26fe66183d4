package graft.stream

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters: the incremental form of
  * [[graft.exts.TextAnalysis.heavyHitters]]. Terms flow through
  * `flatMapGroupsWithState` keyed by term; state per key is one
  * (runningDf, emitted) record and a term is emitted EXACTLY ONCE, in the
  * micro-batch where its running document frequency crosses the
  * threshold — the alerting shape ("this n-gram just became boilerplate")
  * rather than a recomputed snapshot.
  *
  * State size is bounded by the distinct-term count. On an open-vocabulary
  * corpus at ingest scale, gate this with the count-min-sketch pass
  * (AdvancedSpec proves CMS never under-counts) so only sketch-flagged
  * candidates reach the exact stateful tracker.
  */
object HeavyHitters {

  final case class TermState(df: Long, emitted: Boolean)

  final case class Crossing(term: String, df: Long)

  /** Per-group transition (shared by streaming and tests): accumulate the
    * batch's occurrences, emit on the first threshold crossing only. */
  def track(threshold: Long)(term: String, rows: Iterator[String],
      state: GroupState[TermState]): Iterator[Crossing] = {
    val prev = state.getOption.getOrElse(TermState(0L, emitted = false))
    val df = prev.df + rows.size
    val crossed = !prev.emitted && df >= threshold
    state.update(TermState(df, prev.emitted || crossed))
    if (crossed) Iterator(Crossing(term, df)) else Iterator.empty
  }

  /** Wire the tracker over a stream of term occurrences (one row per
    * term occurrence, pre-deduplicated per document upstream if the
    * df semantics are per-document). */
  def crossings(terms: Dataset[String], threshold: Long): Dataset[Crossing] = {
    import terms.sparkSession.implicits._
    terms.groupByKey(identity)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(track(threshold))
  }
}
