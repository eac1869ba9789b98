package graft

import org.apache.spark.sql.functions._

import graft.ops.{BloomJoin, Sketches, TextAnalysis}

/** Round-4 additions: repeated-span substring dedup, count-min heavy
  * hitters, bloom-pruned join. */
class SketchOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  // ---- repeatedSpans -------------------------------------------------

  test("repeatedSpans: cross-doc spans only, occurrence counts, " +
      "canonical first occurrence, hash parity") {
    val d = docs(
      1L -> "a b c d e f g h x",
      2L -> "z a b c d e f g h",
      // doc 3 repeats the span three times WITHIN itself; doc 4 makes
      // it cross-doc. short doc 5 (< w tokens) emits no spans at all.
      3L -> "p q r s t u v w p q r s t u v w p q r s t u v w",
      4L -> "p q r s t u v w",
      5L -> "too short")
    val got = TextAnalysis.repeatedSpans(d, w = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val h = graft.functions.Hashing.hash60Local _
    assert(got == Set(
      (h("a b c d e f g h"), 2L, 2L, 1L, 1L),
      (h("p q r s t u v w"), 2L, 4L, 3L, 1L)),
      s"got $got")
  }

  test("repeatedSpans: a span shared by k docs is ONE row (no pair " +
      "blowup) and within-doc-only repetition is excluded") {
    val many = (1L to 30L).map(i => i -> "common words repeated across every doc here now")
    val d = docs(many :+ (99L -> "self self self self self self self self self self"): _*)
    val rows = TextAnalysis.repeatedSpans(d, w = 8).collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(1) == 30L && rows.head.getLong(2) == 30L)
  }

  // ---- count-min sketch ----------------------------------------------

  private val corpus = docs(
    1L -> "x x x x x y y y z w",
    2L -> "x x y y z z q q q q",
    3L -> "x y z q r r r r r r")

  private def occ = corpus
    .select(explode(graft.functions.Hashing.tokens(col("text"))).as("token"))

  test("countMin: estimates never undercount, and are exact when the " +
      "grid is collision-free") {
    val exact = occ.groupBy("token").agg(count(lit(1)).as("cnt"))
    val cells = Sketches.countMin(occ, "token", depth = 4, width = 1024)
    val est = Sketches.cmsEstimate(exact, "token", cells,
      depth = 4, width = 1024)
    val rows = est.select("token", "cnt", "est")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (t, cnt, e) =>
      assert(e >= cnt, s"undercount for $t: est $e < exact $cnt") }
    // 6 tokens in 1024 buckets × 4 rows: no collisions — est is exact
    rows.foreach { case (t, cnt, e) =>
      assert(e == cnt, s"collision-free grid should be exact for $t") }
  }

  test("countMin: tiny width forces collisions — estimates still never " +
      "undercount (the heavy-hitter superset property)") {
    val exact = occ.groupBy("token").agg(count(lit(1)).as("cnt"))
    val cells = Sketches.countMin(occ, "token", depth = 2, width = 2)
    val rows = Sketches.cmsEstimate(exact, "token", cells,
        depth = 2, width = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { case (t, cnt, e) =>
      assert(e >= cnt, s"undercount for $t: est $e < exact $cnt") }
    assert(rows.exists { case (_, cnt, e) => e > cnt },
      "width 2 over 6 tokens must collide somewhere")
  }

  test("countMin: sketches of disjoint halves merge to the full sketch " +
      "(mergeable partial aggregate)") {
    val a = corpus.filter(col("doc_id") % 2 === 0)
    val b = corpus.filter(col("doc_id") % 2 === 1)
    def cellsOf(df: org.apache.spark.sql.DataFrame) = Sketches.countMin(
      df.select(explode(graft.functions.Hashing.tokens(col("text"))).as("token")),
      "token", depth = 4, width = 64)
    val merged = Sketches.cmsMerge(cellsOf(a), cellsOf(b))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val full = Sketches.countMin(occ, "token", depth = 4, width = 64)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == full)
  }

  test("cmsHeavyHitters: exact result through the sketch prefilter, " +
      "even with a colliding grid") {
    val exact = occ.groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // width 2: nearly everything collides; the exact verify pass must
    // still cut the candidate superset down to the true heavy hitters
    val got = Sketches.cmsHeavyHitters(occ, "token", minCount = 5L,
        depth = 2, width = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == exact, s"got $got want $exact")
    assert(got == Set(("x", 8L), ("y", 6L), ("q", 5L), ("r", 6L)))
  }

  test("groupedHeavyHitters: per-group exact counts through one " +
      "composite-key sketch; groups never bleed into each other") {
    import spark.implicits._
    // token 'h' is heavy in group g1 only; 'x' heavy in both; a tiny
    // colliding grid must not let g1's mass promote g2's light keys
    val rows = Seq.fill(6)(("g1", "h")) ++ Seq(("g2", "h")) ++
      Seq.fill(5)(("g1", "x")) ++ Seq.fill(7)(("g2", "x")) ++
      Seq(("g1", "z"), ("g2", "z"))
    val df = rows.toDF("g", "k")
    val exact = df.groupBy("g", "k").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val got = Sketches.groupedHeavyHitters(df, "g", "k", minCount = 5L,
        depth = 2, width = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == exact, s"got $got want $exact")
    assert(got == Set(("g1", "h", 6L), ("g1", "x", 5L), ("g2", "x", 7L)))
  }

  // ---- bloom-pruned join ---------------------------------------------

  test("bloomPrunedJoin: result equals the plain join, prune filter " +
      "sits on the big side before the join") {
    val li = Tables.lineitem(spark, sfDir)
    val small = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 400000)
      .select(col("o_orderkey").as("l_orderkey"))
    val pruned = BloomJoin.bloomPrunedJoin(li, small, "l_orderkey")
      .select("l_orderkey", "l_linenumber")
    val plain = li.join(small, "l_orderkey")
      .select("l_orderkey", "l_linenumber")
    assert(pruned.count() > 0)
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
    // the membership test must appear as a big-side filter in the plan
    // (prune BEFORE the join, not a post-join residual)
    val plan = pruned.queryExecution.optimizedPlan.toString
    assert(plan.contains("element_at"), plan)
  }

  test("bloomPrunedJoin: an undersized bitmap (guaranteed false " +
      "positives) still yields the exact join; empty small side yields " +
      "an empty join") {
    val li = Tables.lineitem(spark, sfDir)
    val small = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 400000)
      .select(col("o_orderkey").as("l_orderkey"))
    // 128 bits for ~hundreds of keys: the bloom is saturated — prunes
    // nothing, changes nothing
    val pruned = BloomJoin.bloomPrunedJoin(li, small, "l_orderkey",
      numBits = 128, numHashes = 3)
    val plain = li.join(small, "l_orderkey")
    assert(pruned.count() == plain.count())
    val none = BloomJoin.bloomPrunedJoin(li, small.filter(lit(false)),
      "l_orderkey")
    assert(none.count() == 0)
  }

  // ---- exciseRepeatedSpans (round 5: the removal half) ---------------

  test("exciseRepeatedSpans: canonical copy survives, duplicates " +
      "excised, unique text untouched") {
    val d = docs(
      1L -> "a b c d e f g h x",
      2L -> "z a b c d e f g h",
      3L -> "p q r s t u v w p q r s t u v w p q r s t u v w",
      4L -> "p q r s t u v w",
      5L -> "too short")
    val got = graft.ops.TextAnalysis.exciseRepeatedSpans(d, w = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // doc 1 holds the canonical "a b c d e f g h" -> fully kept
    assert(got(1L) == ((9L, 0L, "a b c d e f g h x")))
    // doc 2's copy is non-canonical -> its 8 covered tokens go
    assert(got(2L) == ((9L, 8L, "z")))
    // doc 3: canonical first occurrence kept, 2 within-doc repeats of
    // the now-cross-doc span excised
    assert(got(3L) == ((24L, 16L, "p q r s t u v w")))
    // doc 4 is entirely a duplicate of doc 3's canonical span
    assert(got(4L) == ((8L, 8L, "")))
    // short doc: no spans, untouched
    assert(got(5L) == ((2L, 0L, "too short")))
  }

  test("exciseRepeatedSpans: overlap resolution is canonical-wins — a " +
      "token inside BOTH a non-canonical and a canonical occurrence stays") {
    val d = docs(
      5L -> "y1 y2 y3 y4 y5 y6 y7 y8",                // canonical Y=(5,1)
      6L -> "y1 y2 y3 y4 y5 y6 y7 y8 x1",             // Y non-canon at (6,1); canonical Z=(6,2)
      7L -> "q y1b y2 y3 y4 y5 y6 y7 y8 x1")
    // doc 7 shares Z = "y2..y8 x1" at (7,3) but NOT Y (no y1 prefix)
    val got = graft.ops.TextAnalysis.exciseRepeatedSpans(d, w = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(5L) == ((8L, 0L, "y1 y2 y3 y4 y5 y6 y7 y8")))
    // doc 6: pos 1 covered only by the non-canonical Y copy -> removed;
    // pos 2..9 also covered by doc 6's own canonical Z -> kept
    assert(got(6L) == ((9L, 1L, "y2 y3 y4 y5 y6 y7 y8 x1")))
    // doc 7: its Z copy is non-canonical -> 8 tokens out
    assert(got(7L) == ((10L, 8L, "q y1b")))
  }

  test("exciseRepeatedSpans: a span shared by k docs costs one " +
      "aggregation row and k-1 rewrites, never a pair join") {
    val many = (1L to 30L).map(i =>
      i -> s"common words repeated across every doc here now tail$i")
    val got = graft.ops.TextAnalysis.exciseRepeatedSpans(docs(many: _*), w = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    // doc 1 keeps the canonical span; every other doc keeps only its tail
    assert(got.forall { case (id, removed, txt) =>
      if (id == 1L) removed == 0L
      else removed == 8L && txt == s"tail$id" })
  }

  // ---- HyperLogLog (cross-engine registers) ---------------------------

  private def hllCorpus(n: Long) =
    spark.range(n).select(lit("g").as("grp"), col("id").cast("string").as("v"))

  test("hll: finalize columns agree with a BigInt replay of the " +
      "register table (the s_fp/est contract the oracle gates)") {
    val st = Sketches.hllState(hllCorpus(1000), Seq("grp"), "v")
    val regs = st.collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val rMax = regs.values.max
    val sFp = regs.values.map(r => BigInt(1) << (rMax - r).toInt).sum +
      BigInt(256 - regs.size) * (BigInt(1) << rMax.toInt)
    val row = Sketches.hllFinalize(st, Seq("grp")).collect().head
    assert(row.getLong(2) == regs.size.toLong)   // n_hit
    assert(row.getLong(3) == rMax)               // r_max
    assert(BigInt(row.getLong(4)) == sFp)        // s_fp exact
    val est = 0.7213 / (1.0 + 1.079 / 256.0) * (256.0 * 256) *
      math.pow(2.0, rMax.toDouble) / row.getLong(4)
    assert(math.abs(row.getDouble(5) - est) < 0.001)
  }

  test("hll: raw estimate within 20% of truth outside the small-range " +
      "regime, and the regime flag fires inside it") {
    val big = Sketches.hllFinalize(
      Sketches.hllState(hllCorpus(5000), Seq("grp"), "v"), Seq("grp"))
      .collect().head
    assert(!big.getBoolean(6), "5000 distinct must be past linear range")
    assert(math.abs(big.getDouble(5) - 5000.0) / 5000.0 < 0.20,
      s"est ${big.getDouble(5)}")
    val small = Sketches.hllFinalize(
      Sketches.hllState(hllCorpus(100), Seq("grp"), "v"), Seq("grp"))
      .collect().head
    assert(small.getBoolean(6), "100 distinct must flag linear counting")
  }

  test("hll: merge of disjoint halves == one-shot state, and an " +
      "at-least-once replayed batch is absorbed (idempotent max)") {
    val all = hllCorpus(2000)
    val a = all.filter(col("v").cast("long") % 2 === 0)
    val b = all.filter(col("v").cast("long") % 2 === 1)
    val oneShot = Sketches.hllState(all, Seq("grp"), "v")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val merged = Sketches.hllMerge(
      Seq(Sketches.hllState(a, Seq("grp"), "v"),
        Sketches.hllState(b, Seq("grp"), "v"),
        Sketches.hllState(b, Seq("grp"), "v")), Seq("grp"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(merged == oneShot)
  }
}
