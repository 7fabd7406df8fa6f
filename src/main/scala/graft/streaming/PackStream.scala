package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental context-window packing — the streaming twin of
  * `Curation.qContextPack` (sequential fill into fixed token budgets,
  * one fill line per source stratum).
  *
  * Batch packing is a prefix-sum window; a continuously-ingesting
  * pipeline can't re-window the past, so the stream carries ONE number
  * per source in keyed state — the running token total — and assigns
  * each arriving doc the bin where its start offset lands, exactly the
  * batch formula. Per-source state is a single long: at 100 TB /
  * thousands of sources this is the smallest possible keyed-state
  * pattern (state partitioned by source, no driver involvement).
  *
  * Determinism caveat, stated honestly: batch-equality holds when docs
  * arrive in the batch's layout order within each source (the spec
  * feeds micro-batches that way). Out-of-order arrival packs in
  * arrival order — the semantics a live packer actually has.
  */
object PackStream {

  case class Doc(source: String, doc_id: Long, n_tokens: Long)
  case class Packed(source: String, doc_id: Long, n_tokens: Long,
                    bin_id: Long, bin_offset: Long)

  val DefaultBudget: Long = 2048L

  /** Pure per-source fill step shared by tests and the stream fn. */
  def assign(carried: Long, docs: Seq[Doc], budget: Long): (Long, Seq[Packed]) = {
    var cum = carried
    val out = docs.map { d =>
      val p = Packed(d.source, d.doc_id, d.n_tokens,
        cum / budget, cum % budget)
      cum += d.n_tokens
      p
    }
    (cum, out)
  }

  /** The per-group state-transition function. Object-level (not nested
    * in packStream) so the serialized closure captures only `budget`,
    * never the enclosing frame holding the SparkSession. */
  private def stepFn(budget: Long)(
      source: String, it: Iterator[Doc], state: GroupState[Long]): Iterator[Packed] = {
    val batch = it.toSeq.sortBy(_.doc_id)
    val (cum, packed) = assign(state.getOption.getOrElse(0L), batch, budget)
    state.update(cum)
    packed.iterator
  }

  /** Streaming form: the running token total per source persists in
    * GroupState across micro-batches; docs within a micro-batch pack
    * in doc_id order (the deterministic tie-break). */
  def packStream(docs: Dataset[Doc], budget: Long = DefaultBudget): Dataset[Packed] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(stepFn(budget))
  }
}
