package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator for grouped top-k by score: keeps a bounded k-entry
  * buffer per group (insertion + merge both O(k)), instead of sorting
  * every candidate row under a window — the partial-aggregation form of
  * top-k, which combines map-side before the shuffle.
  *
  * Ordering contract: score DESC, then id ASC on ties — identical to
  * `row_number over (order by score desc, id)`, so it is a drop-in for
  * the window formulation. Emits the final top-k sorted.
  *
  * Duplicate ids are kept once (a multi-table LSH candidate stream
  * yields the same (id, score) from every colliding table) — callers
  * need no distinct() exchange ahead of the aggregation; the buffer IS
  * the dedup, at map-side-combine cost.
  */
class TopKByScore(k: Int)
    extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {
  require(k > 0)

  private def best(xs: Seq[(Long, Double)]): Seq[(Long, Double)] =
    xs.sortBy { case (id, score) => (-score, id) }.distinctBy(_._1).take(k)

  override def zero: Seq[(Long, Double)] = Nil
  // `best` keeps the buffer sorted (score desc, id asc), so once it is
  // full the last entry is the worst kept — a row sorting at-or-after
  // it can never enter and rejects in O(1) instead of re-sorting the
  // buffer (the dominant case on long candidate streams). An equal-id
  // row sorting at-or-after the worst is also safely dropped: its
  // existing entry is at least as good.
  override def reduce(buf: Seq[(Long, Double)], x: (Long, Double)): Seq[(Long, Double)] =
    if (buf.size >= k) {
      val (lastId, lastScore) = buf.last
      if (x._2 < lastScore || (x._2 == lastScore && x._1 >= lastId)) buf
      else best(buf :+ x)
    } else best(buf :+ x)
  override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
    best(a ++ b)
  override def finish(buf: Seq[(Long, Double)]): Seq[(Long, Double)] = buf
  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] = bufferEncoder
}

/** String-keyed sibling of [[TopKByScore]] for bounded FIRST-k-by-sort-key
  * per group: keeps the k entries with the SMALLEST (sortKey, id) per
  * group in a bounded buffer (insertion + merge O(k log k)), combining
  * map-side before the shuffle — the scale shape for per-key caps where
  * a hot key would otherwise sort its entire extent under one window
  * reducer. Ids travel as strings so any id type can ride through
  * (callers cast and join back). Emits the surviving ids sorted by
  * (sortKey, id). Duplicate ids are kept once. */
class FirstKBySortKey(k: Int)
    extends Aggregator[(String, String), Seq[(String, String)], Seq[String]] {
  require(k > 0)

  private def best(xs: Seq[(String, String)]): Seq[(String, String)] =
    xs.sortBy { case (sortKey, id) => (sortKey, id) }.distinctBy(_._2).take(k)

  override def zero: Seq[(String, String)] = Nil
  // same O(1) full-buffer rejection as TopKByScore: the buffer stays
  // sorted ascending, so anything at-or-after the last kept entry can
  // never enter
  override def reduce(buf: Seq[(String, String)], x: (String, String)): Seq[(String, String)] =
    if (buf.size >= k && Ordering[(String, String)].gteq(x, buf.last)) buf
    else best(buf :+ x)
  override def merge(a: Seq[(String, String)], b: Seq[(String, String)]): Seq[(String, String)] =
    best(a ++ b)
  override def finish(buf: Seq[(String, String)]): Seq[String] = buf.map(_._2)
  override def bufferEncoder: Encoder[Seq[(String, String)]] =
    ExpressionEncoder[Seq[(String, String)]]()
  override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
}

/** Budgeted sibling of [[FirstKBySortKey]]: keeps the PREFIX of the
  * per-group (sortKey, id) order whose cumulative token cost fits
  * `budget` — the per-source TOKEN cap, where the unit of account is
  * what the model trains on rather than document count. Prefix
  * semantics: the first row to overflow the budget stops the group
  * (matching `sum(...) over (order by sortKey, id) <= budget`), so the
  * kept set is a pure function of the group's contents. A row costs
  * max(1, tokens): a zero-cost row would never consume budget, making
  * the cap meaningless and this buffer unbounded.
  *
  * Merge safety: the buffer holds the sorted budget-prefix PLUS the
  * first overflowing row as a SENTINEL. The sentinel is load-bearing:
  * dropping an overflowing row outright would erase its cost from the
  * running sum and let later rows ride in past the true stop point.
  * With it, the invariants hold pointwise: partial cumulative cost
  * never exceeds global cumulative cost, so (a) the global stop point
  * sorts at-or-before every partial's sentinel, (b) any row a partial
  * drops sorts after that partial's sentinel and is therefore globally
  * past the stop point, and (c) every row at-or-before the global stop
  * point — contributor or survivor — is retained by every partial that
  * saw it, so merged cumulative sums equal global ones exactly. State
  * stays bounded at `budget` tokens + one sentinel row. */
class FirstWithinTokenBudget(budget: Long)
    extends Aggregator[(String, String, Long), Seq[(String, String, Long)], Seq[String]] {
  require(budget > 0)

  private def cost(t: Long): Long = math.max(1L, t)

  // sorted budget-prefix + the first overflowing row (the sentinel)
  private def best(xs: Seq[(String, String, Long)]): Seq[(String, String, Long)] = {
    val sorted = xs.sortBy { case (sortKey, id, _) => (sortKey, id) }.distinctBy(_._2)
    var acc = 0L
    val prefix = sorted.takeWhile { case (_, _, t) => acc += cost(t); acc <= budget }
    prefix ++ sorted.drop(prefix.length).take(1)
  }

  override def zero: Seq[(String, String, Long)] = Nil
  // fast path: once a sentinel is present (total buffered cost exceeds
  // the budget), any row sorting at-or-after the buffer's last entry is
  // past the stop point — reject without re-sorting. The dominant case
  // on long per-key streams.
  override def reduce(buf: Seq[(String, String, Long)],
                      x: (String, String, Long)): Seq[(String, String, Long)] =
    if (buf.nonEmpty &&
        Ordering[(String, String)].gteq((x._1, x._2), (buf.last._1, buf.last._2)) &&
        buf.iterator.map(e => cost(e._3)).sum > budget) buf
    else best(buf :+ x)
  override def merge(a: Seq[(String, String, Long)],
                     b: Seq[(String, String, Long)]): Seq[(String, String, Long)] =
    best(a ++ b)
  // the sentinel is bookkeeping, not a survivor: re-truncate without it
  override def finish(buf: Seq[(String, String, Long)]): Seq[String] = {
    var acc = 0L
    buf.takeWhile { case (_, _, t) => acc += cost(t); acc <= budget }.map(_._2)
  }
  override def bufferEncoder: Encoder[Seq[(String, String, Long)]] =
    ExpressionEncoder[Seq[(String, String, Long)]]()
  override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
}
