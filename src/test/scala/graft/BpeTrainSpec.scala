package graft

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.BpeTrainAgg

/** Convergence + semantics pins for the multi-merge BPE trainer
  * (`bpe_train_steps`, [[graft.functions.BpeTrainAgg]]):
  *
  *  1. merged-pair frequency MONOTONICITY — the trainer's stopping-rule
  *     signal: any pair a merge creates occurs at most as often as the
  *     pair just merged (each new-symbol occurrence spawns ≤1 of any
  *     given new pair), and untouched pairs only lose occurrences, so
  *     step counts never increase;
  *  2. step 1 ≡ the single-step query's winner (`bpe_merge_step` counts
  *     the same frequency-weighted adjacent pairs at the character
  *     stage);
  *  3. the greedy rewrite itself, pinned in-JVM on a hand-computed
  *     vocabulary: overlapping occurrences collapse left-to-right
  *     non-overlapping, later steps merge EARLIER MERGED symbols, ties
  *     break to the lexicographically smallest pair, and the loop stops
  *     early once every word is a single symbol;
  *  4. the aggregation buffer round-trips through serialize/deserialize
  *     (the shuffle path a multi-partition corpus pays).
  */
class BpeTrainSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("merged-pair frequency is monotone non-increasing across steps") {
    val rows = graft.queries.ExtQueries.bpeTrainSteps(spark, sfDir)
      .orderBy("step").collect()
    assert(rows.length == 6)
    assert(rows.map(_.getAs[Long]("step")).toSeq == (1L to 6L))
    val cnts = rows.map(_.getAs[Long]("cnt")).toSeq
    cnts.sliding(2).foreach { w =>
      assert(w(0) >= w(1),
        s"merge frequency increased across steps: $cnts")
    }
    rows.foreach { r =>
      assert(r.getAs[String]("merged") ==
        r.getAs[String]("pair_a") + r.getAs[String]("pair_b"))
    }
  }

  test("step 1 equals the single-step query's winner") {
    val top = graft.queries.ExtQueries.bpeMergeStep(spark, sfDir)
      .collect().head
    val s1 = graft.queries.ExtQueries.bpeTrainSteps(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("step") === 1L)
      .collect().head
    assert(s1.getAs[String]("merged") == top.getAs[String]("pair"))
    assert(s1.getAs[Long]("cnt") == top.getAs[Long]("cnt"))
  }

  private def merges(agg: BpeTrainAgg,
      vocab: Map[String, Long]): Seq[(Long, String, String, Long)] = {
    val buf = mutable.HashMap.empty[String, Long] ++= vocab
    val arr = agg.eval(buf).asInstanceOf[ArrayData]
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 4)
      (r.getLong(0), r.getUTF8String(1).toString,
        r.getUTF8String(2).toString, r.getLong(3))
    }
  }

  test("greedy rewrite: non-overlap, merged-symbol reuse, lexicographic ties") {
    val agg = BpeTrainAgg(Literal("w"), Literal(1L), steps = 4)
    // "aaa" (freq 3): pairs (a,a) twice per word — counting sees BOTH
    // overlapping occurrences (6 total), but the rewrite is
    // left-to-right non-overlapping: aaa → [aa, a], never [aa, aa]
    val out = merges(agg, Map("aaa" -> 3L, "ab" -> 2L, "cd" -> 2L))
    assert(out == Seq(
      (1L, "a", "a", 6L),   // overlap counted, 2 per word x freq 3
      (2L, "aa", "a", 3L),  // merged symbol participates: [aa, a] → [aaa]
      (3L, "a", "b", 2L),   // tie with (c, d) breaks to smaller pair
      (4L, "c", "d", 2L)))
  }

  test("loop stops early once every word is a single symbol") {
    val agg = BpeTrainAgg(Literal("w"), Literal(1L), steps = 10)
    val out = merges(agg, Map("ab" -> 1L))
    assert(out == Seq((1L, "a", "b", 1L)))
  }

  test("buffer serialize/deserialize round-trips") {
    val agg = BpeTrainAgg(Literal("w"), Literal(1L), steps = 2)
    val buf = mutable.HashMap("hello" -> 7L, "wörld" -> 2L, "" -> 1L)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back == buf)
    // and partial-map merge is the same fold update() applies
    val m = agg.merge(mutable.HashMap("hello" -> 1L),
      mutable.HashMap("hello" -> 6L, "x" -> 2L))
    assert(m == mutable.HashMap("hello" -> 7L, "x" -> 2L))
  }

  /** Independent reference trainer using the ORACLE's mechanism — the
    * marker-delimited string encoding where one greedy merge is a plain
    * left-to-right non-overlapping `String.replace` — so the property
    * below pins the equivalence of two genuinely different greedy
    * implementations (array scan vs string replace), not one algorithm
    * against itself.
    */
  private def replaceTrainer(vocab: Map[String, Long],
      steps: Int): Seq[(Long, String, String, Long)] = {
    val S1 = "\u0001"; val S2 = "\u0002"
    var encs = vocab.toSeq.map { case (w, f) =>
      (w.map(c => s"$S1$c$S2").mkString, f)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var step = 1
    var done = false
    while (step <= steps && !done) {
      val cnts = mutable.HashMap.empty[(String, String), Long]
      encs.foreach { case (enc, f) =>
        val syms =
          if (enc.isEmpty) Array.empty[String]
          else enc.substring(1, enc.length - 1).split(s"$S2$S1", -1)
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          cnts.update(k, cnts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (cnts.isEmpty) done = true
      else {
        val ((a, b), c) = cnts.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((step.toLong, a, b, c))
        encs = encs.map { case (enc, f) =>
          (enc.replace(s"$S1$a$S2$S1$b$S2", s"$S1$a$b$S2"), f)
        }
        step += 1
      }
    }
    out.toSeq
  }

  test("property: aggregate trainer == marker-replace trainer on random vocabs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // tiny alphabet forces overlapping runs ("aaa"), merged-symbol
    // reuse, and count ties — the cases where greedy semantics diverge
    val word = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val vocabGen = for {
      nw <- Gen.choose(1, 12)
      ws <- Gen.listOfN(nw, word)
      fs <- Gen.listOfN(nw, Gen.choose(1L, 9L))
    } yield ws.zip(fs).groupBy(_._1).map { case (w, l) => w -> l.map(_._2).sum }
    val steps = Gen.choose(1, 5)
    val agg = (n: Int) => BpeTrainAgg(Literal("w"), Literal(1L), steps = n)
    val prop = Prop.forAll(vocabGen, steps) { (vocab, n) =>
      merges(agg(n), vocab) == replaceTrainer(vocab, n)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"aggregate != replace trainer: ${res.status}")
  }

  // ------------------------------------------------- round-14 pins:
  // the encoder round-trip contract and the NON-ASCII tie-break
  // (code-point order ≡ UTF-8 byte order ≡ the DuckDB oracle's binary
  // collation — NOT Java String order, which diverges above the BMP)

  /** Code-point split (the trainer's own symbol alphabet). */
  private def cps(w: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Reference BPE ENCODER: replay the trained merge table in merge
    * order, each merge rewriting left-to-right non-overlapping — the
    * published encode algorithm `bpe_encode_stats` applies in SQL.
    */
  private def encode(w: String, table: Seq[(String, String)]): Vector[String] = {
    var syms = cps(w)
    table.foreach { case (a, b) =>
      val nb = Vector.newBuilder[String]
      var j = 0
      while (j < syms.length) {
        if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
          nb += (a + b); j += 2
        } else { nb += syms(j); j += 1 }
      }
      syms = nb.result()
    }
    syms
  }

  /** No lone surrogates: every symbol is a sequence of COMPLETE code
    * points. Concatenation alone can't pin this (UTF-16 halves still
    * concatenate back), so it is asserted per symbol.
    */
  private def wellFormed(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isHighSurrogate(c)) {
        if (i + 1 >= s.length || !Character.isLowSurrogate(s.charAt(i + 1)))
          return false
        i += 2
      } else if (Character.isLowSurrogate(c)) return false
      else i += 1
    }
    true
  }

  test("tie-break is code-point order where Java String order diverges") {
    // U+FFFD (65533) vs U+10000 (65536): code points order FFFD first,
    // but UTF-16 code units order the surrogate lead \uD800 (55296)
    // first — a Java-String-order trainer picks the OTHER winner here
    val supp = new String(Character.toChars(0x10000))
    val agg = BpeTrainAgg(Literal("w"), Literal(1L), steps = 1)
    val out = merges(agg, Map("e�" -> 1L, ("e" + supp) -> 1L))
    assert(out.head == ((1L, "e", "�", 1L)),
      s"tie must break by code point (U+FFFD < U+10000), got ${out.head}")
  }

  test("property: unicode encode round-trip with surrogate-complete symbols") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // alphabet spans 1-byte, 2-byte, 3-byte UTF-8 and a supplementary
    // (surrogate-pair) code point
    val alpha = Seq("a", "b", "é", "�", "日",
      new String(Character.toChars(0x10437)))
    val word = Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(alpha)).map(_.mkString))
    val vocabGen = for {
      nw <- Gen.choose(1, 10)
      ws <- Gen.listOfN(nw, word)
      fs <- Gen.listOfN(nw, Gen.choose(1L, 9L))
    } yield ws.zip(fs).groupBy(_._1).map { case (w, l) => w -> l.map(_._2).sum }
    val prop = Prop.forAll(vocabGen, Gen.choose(1, 5)) { (vocab, n) =>
      val table = merges(BpeTrainAgg(Literal("w"), Literal(1L), steps = n),
        vocab).map(t => (t._2, t._3))
      vocab.keys.forall { w =>
        val toks = encode(w, table)
        toks.mkString == w && toks.forall(wellFormed) &&
          table.forall { case (a, b) => wellFormed(a) && wellFormed(b) }
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"encode round-trip failed: ${res.status}")
  }

  /** Independent reference trainer comparing ties by raw UTF-8 BYTES
    * (unsigned lexicographic) — the oracle's collation by a genuinely
    * different mechanism than the aggregate's code-point compare.
    */
  private def utf8Trainer(vocab: Map[String, Long],
      steps: Int): Seq[(Long, String, String, Long)] = {
    def less(a: String, b: String): Boolean = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      while (i < x.length && i < y.length) {
        val d = (x(i) & 0xff) - (y(i) & 0xff)
        if (d != 0) return d < 0
        i += 1
      }
      x.length < y.length
    }
    var words = vocab.toSeq.map { case (w, f) => (cps(w), f) }
    val out = mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var step = 1
    var done = false
    while (step <= steps && !done) {
      val cnts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          cnts.update(k, cnts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (cnts.isEmpty) done = true
      else {
        var best: ((String, String), Long) = null
        cnts.foreach { case e @ ((a, b), c) =>
          if (best == null || c > best._2 || (c == best._2 &&
              (less(a, best._1._1) ||
               (a == best._1._1 && less(b, best._1._2))))) best = e
        }
        val ((a, b), c) = best
        out += ((step.toLong, a, b, c))
        words = words.map { case (syms, f) =>
          val nb = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
              nb += (a + b); j += 2
            } else { nb += syms(j); j += 1 }
          }
          (nb.result(), f)
        }
        step += 1
      }
    }
    out.toSeq
  }

  test("property: aggregate trainer == UTF-8-byte-order reference on non-ASCII vocabs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // two symbols chosen to make Java String order and code-point order
    // DISAGREE (U+FFFD sorts before U+10000 by code point, after it by
    // UTF-16 code units), plus a tiny base alphabet to force ties
    val alpha = Seq("a", "�", new String(Character.toChars(0x10000)))
    val word = Gen.choose(1, 5).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(alpha)).map(_.mkString))
    val vocabGen = for {
      nw <- Gen.choose(1, 10)
      ws <- Gen.listOfN(nw, word)
      fs <- Gen.listOfN(nw, Gen.choose(1L, 4L))
    } yield ws.zip(fs).groupBy(_._1).map { case (w, l) => w -> l.map(_._2).sum }
    val prop = Prop.forAll(vocabGen, Gen.choose(1, 5)) { (vocab, n) =>
      merges(BpeTrainAgg(Literal("w"), Literal(1L), steps = n), vocab) ==
        utf8Trainer(vocab, n)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"aggregate != utf8-byte reference: ${res.status}")
  }

  test("builder rejects non-integer, null, and sub-1 steps cleanly") {
    import org.apache.spark.sql.catalyst.expressions.Expression
    def build(s: Expression) =
      BpeTrainAgg.builder(Seq(Literal("w"), Literal(1L), s))
    // long literal is accepted (Number.intValue, not a ClassCastException)
    build(Literal(3L))
    intercept[IllegalArgumentException](build(Literal(null,
      org.apache.spark.sql.types.IntegerType)))
    intercept[IllegalArgumentException](build(Literal("x")))
    intercept[IllegalArgumentException](build(Literal(0)))
    intercept[IllegalArgumentException](
      graft.functions.KCenterAgg.builder(
        Seq(Literal(1L), Literal(null,
          org.apache.spark.sql.types.IntegerType), Literal("k"))))
    // and the KCenter long-literal path
    graft.functions.KCenterAgg.builder(
      Seq(Literal(1L),
        Literal.create(Array(1L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = false)),
        Literal(8L)))
  }

  test("update folds UTF8String input rows into the word map") {
    val agg = BpeTrainAgg(Literal("w"), Literal(1L), steps = 1)
    val buf = agg.createAggregationBuffer()
    // children are Literals, so eval ignores the row content
    agg.update(buf, InternalRow(UTF8String.fromString("w"), 1L))
    agg.update(buf, InternalRow(UTF8String.fromString("w"), 1L))
    assert(buf == mutable.HashMap("w" -> 2L))
  }
}
