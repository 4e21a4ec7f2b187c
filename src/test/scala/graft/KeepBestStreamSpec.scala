package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{KbEvent, KbState, KeepBestStream}

/** The survivorship fold's merge law — the algebra the twelfth
  * stream≡batch gate (dedup_keep_best_stream) rests on: folding a
  * component's members in ANY batch split and ANY order reaches the
  * batch twin's election (max q, tie → lowest doc_id) and the exact
  * counters. The gate itself proves the end-to-end equivalence against
  * the shared DuckDB oracle; this spec pins the law where the fixture
  * can't — adversarial splits, ties, single-member components.
  */
class KeepBestStreamSpec extends AnyFunSuite {

  private val ts = new Timestamp(1000000L * 1000)
  private def ev(c: Long, d: Long, q: Long, nc: Long) = KbEvent(c, d, q, nc, ts)

  private def batchElect(evs: Seq[KbEvent]): (Long, Long, Long, Long) = {
    val best = evs.minBy(e => (-e.q, e.doc_id))
    (evs.size.toLong, best.doc_id, best.q, evs.map(_.nc).sum - best.nc)
  }

  private def foldSplits(evs: Seq[KbEvent], splits: Seq[Seq[KbEvent]]): KbState =
    splits.foldLeft(Option.empty[KbState]) { (st, batch) =>
      Some(KeepBestStream.fold(st, batch.iterator))
    }.get

  test("any split and order reaches the batch election") {
    val members = Seq(ev(7, 10, 5, 100), ev(7, 3, 9, 250), ev(7, 12, 9, 40),
      ev(7, 1, 2, 999), ev(7, 8, 9, 70))
    val (n, keepDoc, keepQ, dropped) = batchElect(members)
    val splitsToTry = Seq(
      Seq(members),                                    // one batch
      members.map(Seq(_)),                             // one member per batch
      Seq(members.take(2), members.drop(2)),           // uneven halves
      Seq(members.reverse.take(3), members.reverse.drop(3))) // reordered
    splitsToTry.foreach { splits =>
      val st = foldSplits(members, splits)
      val row = KeepBestStream.row(7L, st)
      assert(row.n_docs == n && row.keep_doc == keepDoc &&
        row.keep_q == keepQ && row.dropped_chars == dropped,
        s"split shape ${splits.map(_.size)} diverged: $row")
    }
  }

  test("tie on q elects the lowest doc_id regardless of arrival order") {
    val a = ev(1, 20, 7, 10); val b = ev(1, 4, 7, 30); val c = ev(1, 9, 7, 5)
    Seq(Seq(a, b, c), Seq(c, b, a), Seq(b, a, c)).foreach { order =>
      val st = KeepBestStream.fold(None, order.iterator)
      assert(st.bestDoc == 4L && st.bestQ == 7L && st.bestNc == 30L)
      assert(st.nDocs == 3L && st.totChars == 45L)
    }
  }

  test("single-member component keeps itself with zero dropped mass") {
    val st = KeepBestStream.fold(None, Iterator(ev(2, 42, 1, 77)))
    val row = KeepBestStream.row(2L, st)
    assert(row == graft.streaming.KbRow(2L, 1L, 42L, 1L, 0L))
  }

  test("a later better member displaces the held representative") {
    val st1 = KeepBestStream.fold(None, Iterator(ev(3, 5, 4, 50)))
    val st2 = KeepBestStream.fold(Some(st1), Iterator(ev(3, 9, 8, 20)))
    assert(st2.bestDoc == 9L && st2.bestQ == 8L && st2.bestNc == 20L)
    // and a later WORSE member does not
    val st3 = KeepBestStream.fold(Some(st2), Iterator(ev(3, 1, 8, 60)))
    assert(st3.bestDoc == 1L, "equal q, lower doc_id must win")
    val st4 = KeepBestStream.fold(Some(st3), Iterator(ev(3, 0, 2, 10)))
    assert(st4.bestDoc == 1L && st4.nDocs == 4L)
  }
}
