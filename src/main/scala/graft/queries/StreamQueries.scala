package graft.queries

import graft.QueryPack
import graft.model.EngineConfig
import graft.stream.EventPipeline

/** Driver-contract query for the streaming path: the flagship decision
  * computed through readStream → foreachBatch must equal the batch
  * formulation — so it shares the batch oracle (stream/batch parity is
  * itself the property under test). */
object StreamQueries {
  val pack: QueryPack = QueryPack(
    queries = Map(
      "stream_should_optimize" -> ((s, dir) =>
        EventPipeline.decisionsViaStream(s, dir, EngineConfig()))),
    oracles = Map(
      "stream_should_optimize" ->
        DecisionQueries.pack.oracles("should_optimize")))
}
