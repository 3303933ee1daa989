package graft.functions

import graft.SparkSpec
import graft.operators.{AsofJoin, SimilarityOps}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based differentials: every native Catalyst implementation must
  * agree with its composed built-ins reference on GENERATED inputs, not
  * just the fixed-seed fixtures — nulls, empties, unicode, duplicate keys
  * and timestamps included. Collected batches (one Spark job per property
  * instead of one per case) keep this fast.
  */
class NativeExprPropertySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // raw scalacheck (no scalatest bridge in this build): deterministic
  // multi-seed sampling stands in for forAll
  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.pureApply(Gen.Parameters.default, Seed(seed))

  private val token: Gen[String] = Gen.oneOf(
    Gen.oneOf(LangIdImpl.langMarkers.flatMap(_._2).toSeq),
    Gen.alphaNumStr.map(_.take(8)),
    Gen.oneOf("não", "l'est", "éos", "42os", "_os", "a_b", "x-y", "", " ",
      "ação", "øre", "日本語", "emoji🙂end"))

  test("property: lang_id native == composed on generated texts") {
    val texts = (1 to 4).flatMap(s => sample(Gen.listOfN(60,
      Gen.listOf(token).map(_.mkString(" "))), s)) ++
      Seq("", " ", "\t\n", "ÉOS Os oS", "a" * 500)
    val rows = texts.toDF("text").select(
      TextFns.langId(col("text")).as("fast"),
      TextFns.langIdComposed(col("text")).as("slow"), col("text")).collect()
    rows.foreach(r => assert(r.getString(0) === r.getString(1),
      s"text=<${r.getString(2)}>"))
  }

  test("property: word_shingles native == composed chain on generated texts") {
    val texts = (1 to 4).flatMap(s => sample(Gen.listOfN(60,
      Gen.listOf(token).map(_.mkString(" "))), s)) ++
      Seq("", " ", "a", "a b", "a b c", "a a a a", "x y x y x y", null)
    for (n <- Seq(2, 3, 5)) {
      val rows = texts.toDF("text").select(
        TextFns.wordShinglesFromTokens(TextFns.tokens(col("text")), n).as("fast"),
        TextFns.wordShinglesFromTokensComposed(TextFns.tokens(col("text")), n)
          .as("slow"), col("text")).collect()
      rows.foreach { r =>
        val clue = s"n=$n text=<${if (r.isNullAt(2)) null else r.getString(2)}>"
        if (r.isNullAt(1)) assert(r.isNullAt(0), clue)
        else assert(r.getSeq[String](0) === r.getSeq[String](1), clue)
      }
    }
  }

  test("property: repetition signals native == composed on generated texts") {
    val texts = (1 to 4).flatMap(s => sample(Gen.listOfN(60,
      Gen.listOf(token).map(_.mkString(" "))), s)) ++
      Seq(" ", "a", "a a", "a b a b", "z z z", "lone", null)
    val rows = texts.toDF("text").select(
      TextFns.repetitionSignals(col("text")).as("fast"),
      TextFns.repetitionSignalsComposed(col("text")).as("slow"),
      col("text")).collect()
    rows.foreach { r =>
      val clue = s"text=<${if (r.isNullAt(2)) null else r.getString(2)}>"
      if (r.isNullAt(1)) assert(r.isNullAt(0), clue)
      else {
        val (f, s) = (r.getStruct(0), r.getStruct(1))
        (0 until 3).foreach { i =>
          val (a, b) = (f.getDouble(i), s.getDouble(i))
          assert(a === b || (a.isNaN && b.isNaN), s"$clue field $i: $a vs $b")
        }
      }
    }
  }

  test("property: token_stats native == composed splits on generated texts") {
    val piece: Gen[String] = Gen.oneOf(token, Gen.oneOf(
      " ", "  ", "\t", "\n", "\u000B", "\f", "\r", ",", "a,b", "..", "🙂",
      "x🙂1", "é", "_", "-", "a1b2", "0", " \t ", ""))
    val texts = (1 to 4).flatMap(s => sample(Gen.listOfN(80,
      Gen.listOf(piece).map(_.mkString(""))), s)) ++
      Seq("", " ", "   ", "\t", " \t", "\t ", " a ", "\ta\t", "a  b",
        " ,a, ", "🙂", "a🙂b", "🙂🙂", "a🙂🙂b", null)
    val rows = texts.toDF("text").select(
      TextFns.tokenStats(col("text")).as("f"),
      TextFns.tokenCount(col("text")).as("nt"),
      size(array_distinct(TextFns.tokens(col("text")))).as("nd"),
      TextFns.subwordCount(col("text")).as("ns"), col("text")).collect()
    rows.foreach { r =>
      if (r.isNullAt(4)) assert(r.isNullAt(0) && r.isNullAt(1))
      else {
        val f = r.getStruct(0)
        val clue = s"text=<${r.getString(4)}>"
        assert(f.getInt(0) === r.getInt(1), s"$clue n_tokens")
        assert(f.getInt(1) === r.getInt(2), s"$clue n_distinct")
        assert(f.getInt(2) === r.getInt(3), s"$clue n_subwords")
      }
    }
  }

  test("property: simhash native == composed on generated token arrays") {
    val arrays = (1 to 4).flatMap(s => sample(Gen.listOfN(60, Gen.listOf(
      Gen.oneOf(token, Gen.const(null: String)))), s))
    val rows = arrays.map(Tuple1(_)).toDF("toks").select(
      TextFns.simhash64(col("toks")).as("slow"),
      TextFns.simhash64Fast(col("toks")).as("fast")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) === r.getLong(1))
    }
  }

  test("property: minhash_sig native == composed on generated shingle arrays") {
    val arrays = (1 to 4).flatMap(s => sample(Gen.listOfN(40, Gen.listOf(
      Gen.oneOf(token, Gen.const(null: String)))), s))
    val rows = arrays.map(Tuple1(_)).toDF("sh").select(
      TextFns.minhashSignature(col("sh"), 16).as("slow"),
      TextFns.minhashSignatureFast(col("sh"), 16).as("fast")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
  }

  test("property: dot_f64 native == composed incl. ragged/null/empty arrays") {
    val vec: Gen[Seq[java.lang.Double]] = Gen.choose(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(
        Gen.choose(-1e3, 1e3).map(java.lang.Double.valueOf),
        Gen.const(null: java.lang.Double))))
    val pairs = (1 to 4).flatMap(s =>
      sample(Gen.listOfN(80, Gen.zip(vec, vec)), s))
    val rows = pairs.toDF("a", "b").select(
      SimilarityOps.dot(col("a"), col("b")).as("fast"),
      SimilarityOps.dotComposed(col("a"), col("b")).as("slow")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("property: shingle_minhash fused == shingle-then-minhash composed chain") {
    val arr: Gen[Seq[String]] = Gen.choose(0, 15).flatMap(m =>
      Gen.listOfN(m, Gen.oneOf(token, Gen.const(null: String))))
    val arrays = (1 to 4).flatMap(s => sample(Gen.listOfN(60, arr), s)) ++
      Seq(Seq.empty[String], Seq("a"), Seq("a", "b"), Seq(null, null, null),
        Seq("x", null, "y", "x", null, "y"))
    for (n <- Seq(1, 3)) {
      val rows = arrays.map(Tuple1(_)).toDF("ts").select(
        TextFns.shingleMinhash(col("ts"), n, 16).as("fused"),
        TextFns.minhashSignatureFast(
          TextFns.wordShinglesFromTokens(col("ts"), n), 16).as("composed"))
        .collect()
      rows.foreach { r =>
        assert(r.isNullAt(0) === r.isNullAt(1), s"n=$n nullability")
        if (!r.isNullAt(0))
          assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"n=$n")
      }
    }
  }

  test("property: jaccard_sim native == composed on generated token arrays") {
    val arr: Gen[Seq[String]] = Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(token, Gen.const(null: String))))
    val pairs = (1 to 4).flatMap(s =>
      sample(Gen.listOfN(80, Gen.zip(arr, arr)), s)) ++
      Seq((Seq.empty[String], Seq.empty[String]),
        (Seq("a", "a", "b"), Seq("b", "b", "a")),
        (Seq(null, "x"), Seq(null, "y")),
        (null, Seq("x")), (Seq("x"), null), (null, null))
    val rows = pairs.toDF("a", "b").select(
      TextFns.jaccard(col("a"), col("b")).as("fast"),
      TextFns.jaccardComposed(col("a"), col("b")).as("slow")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("property: jaccard_sim long kernel == composed on generated long arrays") {
    // the r18 hashed-shingle representation: array<bigint> sides dispatch
    // to SetMath.jaccardLong — same distinct/null semantics as the string
    // kernel, checked bit-for-bit against the composed set-function form
    val arr: Gen[Seq[java.lang.Long]] = Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(
        Gen.choose(Long.MinValue, Long.MaxValue).map(java.lang.Long.valueOf),
        Gen.const(null: java.lang.Long),
        Gen.const(java.lang.Long.valueOf(0L))))) // 0 must not read as "empty slot"
    val pairs = (1 to 4).flatMap(s =>
      sample(Gen.listOfN(80, Gen.zip(arr, arr)), s)) ++
      Seq((Seq.empty[java.lang.Long], Seq.empty[java.lang.Long]),
        (Seq[java.lang.Long](1L, 1L, 2L), Seq[java.lang.Long](2L, 2L, 1L)),
        (Seq[java.lang.Long](null, 7L), Seq[java.lang.Long](null, 9L)),
        (Seq[java.lang.Long](0L), Seq[java.lang.Long](0L)),
        (null, Seq[java.lang.Long](3L)), (Seq[java.lang.Long](3L), null),
        (null, null))
    val rows = pairs.toDF("a", "b").select(
      TextFns.jaccard(col("a"), col("b")).as("fast"),
      TextFns.jaccardComposed(col("a"), col("b")).as("slow")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("property: native asof == composed on generated keyed series") {
    val gen = for {
      nKeys <- Gen.choose(1, 6)
      lRows <- Gen.listOfN(120, for {
        k <- Gen.choose(0, nKeys - 1)
        t <- Gen.choose(0L, 40L)
      } yield (k.toString, t))
      rRows <- Gen.listOfN(40, for {
        k <- Gen.choose(0, nKeys)   // incl. keys absent on the left
        t <- Gen.choose(0L, 40L)
      } yield (k.toString, t))
    } yield (lRows, rRows)
    (1 to 5).foreach { seed =>
      val (lRows, rRows) = sample(gen, seed)
      val l = lRows.zipWithIndex
        .map { case ((k, t), i) =>
          (i.toLong, k, new java.sql.Timestamp(1700000000000L + t * 1000)) }
        .toDF("id", "k", "ts")
      // unique (k, ts) on the right: duplicate tie-breaks legitimately
      // differ between the two forms (documented)
      val r = rRows.distinct.zipWithIndex
        .map { case ((k, t), i) =>
          (k, new java.sql.Timestamp(1700000000000L + t * 1000), i.toLong) }
        .groupBy(x => (x._1, x._2)).map(_._2.head).toSeq
        .toDF("k", "rts", "num")
      val native = graft.plans.AsofJoinPlan.asof(l, r, Seq("k"), "ts", "rts",
        Seq("num")).select(col("id"), col("asof_num")).collect()
        .map(x => x.getLong(0) -> Option(x.get(1)).map(_.toString).orNull).toMap
      val composed = AsofJoin.asof(l, r, Seq("k"), "ts", "rts", Seq("num"))
        .select(col("id"), col("asof_num")).collect()
        .map(x => x.getLong(0) -> x.getAs[String](1)).toMap
      assert(native === composed)
    }
  }

  test("property: hashed_bow native == composed on generated texts") {
    val texts = (1 to 4).flatMap(s => sample(Gen.listOfN(60,
      Gen.listOf(token).map(_.mkString(" "))), s)) ++
      Seq("", " ", "\t \n", "a", "a a b", "não 日本語 emoji🙂end", null)
    for (dim <- Seq(16, 8, 1)) {
      val rows = texts.toDF("text").select(
        TextFns.hashedBow(col("text"), dim).as("fast"),
        TextFns.hashedBowComposed(col("text"), dim).as("slow"),
        col("text")).collect()
      rows.foreach { r =>
        val clue = s"dim=$dim text=<${if (r.isNullAt(2)) null else r.getString(2)}>"
        assert(r.getSeq[Long](0) === r.getSeq[Long](1), clue)
      }
    }
  }

  test("property: winnow_fps native == composed gramHashes->winnowSelect on generated texts") {
    val texts = (1 to 4).flatMap(s => sample(Gen.listOfN(60,
      Gen.listOf(token).map(_.mkString(" "))), s)) ++
      Seq("", " ", "\t \n", "a", "a b", "a b c", "a b c d", "a a a a a a a",
        "x y z x y z x y z x y z", "não éos 日本語 a b c d e f", null)
    for ((k, w) <- Seq((3, 4), (2, 2), (1, 1), (4, 7))) {
      val rows = texts.toDF("text").select(
        TextFns.winnowingFast(col("text"), k, w).as("fast"),
        TextFns.winnowing(col("text"), k, w).as("slow"),
        col("text")).collect()
      rows.foreach { r =>
        val clue = s"k=$k w=$w text=<${if (r.isNullAt(2)) null else r.getString(2)}>"
        // composed form is never null (when/otherwise both yield arrays)
        val f = r.getSeq[org.apache.spark.sql.Row](0)
          .map(x => (x.getInt(0), x.getLong(1)))
        val s = r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getInt(0), x.getLong(1)))
        assert(f === s, clue)
      }
    }
  }
}
