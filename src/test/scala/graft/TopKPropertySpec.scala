package graft

import graft.index.{FileScanPlan, FileStats, RowGroupStat, StatsIndex}
import graft.prune.TopKPruning
import org.apache.spark.sql.types.{LongType, StructField, StructType, TimestampType}
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.immutable.SortedSet

/** ScalaCheck property for top-k pruning soundness, at the pure-function
  * level (no Spark jobs): for randomly generated row groups — nullable
  * values over a tiny domain to force heavy ties, including all-null and
  * empty-stats groups — the multiset of top-k values computable from the
  * KEPT row groups must equal the one computable from ALL rows, under
  * every (k, direction, null-order) and, for the filtered variant, every
  * random bound pair. Ties make the top-k ROW set ambiguous; the value
  * multiset is what every valid tiebreak agrees on, so equality of the
  * multisets is exactly "no pruning decision can change any answer".
  */
class TopKPropertySpec extends AnyFunSuite {

  private def check(prop: Prop, minSuccessful: Int): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(minSuccessful), prop)
    assert(res.passed, res.status.toString)
  }

  /** A generated corpus: per row group, a list of Option[Long] rows. */
  private val genGroups: Gen[List[List[Option[Long]]]] =
    Gen.nonEmptyListOf(
      Gen.listOf(Gen.frequency(
        8 -> Gen.choose(0L, 20L).map(Some(_)),
        2 -> Gen.const(None))))
      .map(_.take(40))

  private def fakeIndex(groups: List[List[Option[Long]]]): StatsIndex = {
    val schema = StructType(Seq(StructField("k", LongType)))
    val plans = groups.indices.map(i =>
      FileScanPlan(f"g$i%03d", 1024L, 1, SortedSet(0)))
    val stats = groups.zipWithIndex.map { case (rows, i) =>
      val defined = rows.flatten
      RowGroupStat(f"g$i%03d", 0,
        defined.minOption, defined.maxOption,
        rows.size.toLong, Some((rows.size - defined.size).toLong))
    }
    new StatsIndex {
      def initialize(s: StructType): Unit = ()
      def addFile(st: FileStats): Unit = ()
      def retainOnly(f: Set[String]): Unit = ()
      def removeFiles(f: Set[String]): Unit = ()
      def getFiles(p: org.apache.spark.sql.catalyst.expressions.Expression) =
        plans
      def allFiles() = plans
      def indexedSchema: StructType = schema
      override def rowGroupStats(c: String) = Some(stats)
      def close(): Unit = ()
    }
  }

  /** Top-k VALUE multiset under (descending, nullsFirst): nulls as None,
    * ordered per the flags, first k. */
  private def topValues(
      rows: Seq[Option[Long]], k: Int,
      descending: Boolean, nullsFirst: Boolean): Seq[Option[Long]] = {
    val ord = new Ordering[Option[Long]] {
      def compare(a: Option[Long], b: Option[Long]): Int = (a, b) match {
        case (None, None) => 0
        case (None, _)    => if (nullsFirst) -1 else 1
        case (_, None)    => if (nullsFirst) 1 else -1
        case (Some(x), Some(y)) =>
          if (descending) java.lang.Long.compare(y, x)
          else java.lang.Long.compare(x, y)
      }
    }
    rows.sorted(ord).take(k)
  }

  test("plain pruning never loses a top-k value (k × direction × null-order)") {
    val prop = Prop.forAll(
      genGroups, Gen.choose(1, 50), Gen.oneOf(true, false), Gen.oneOf(true, false)) {
      (groups, k, descending, nullsFirst) =>
        val index = fakeIndex(groups)
        val kept = TopKPruning.prune(index, "k", k.toLong, descending, nullsFirst)
          .map(_.fileName).toSet
        val all = groups.zipWithIndex.flatMap { case (rows, i) => rows.map((f"g$i%03d", _)) }
        val keptRows = all.filter(r => kept(r._1)).map(_._2)
        topValues(all.map(_._2), k, descending, nullsFirst) ==
          topValues(keptRows, k, descending, nullsFirst)
    }
    check(prop, 500)
  }

  test("filtered pruning never loses a top-k value (windows × k × direction)") {
    val genBound = Gen.option(Gen.zip(Gen.choose(0L, 20L), Gen.oneOf(true, false)))
    val prop = Prop.forAll(
      genGroups, Gen.choose(1, 50), Gen.oneOf(true, false), genBound, genBound) {
      (groups, k, descending, lo, hi) =>
        val index = fakeIndex(groups)
        val statsPlans = index.allFiles()
        val kept = TopKPruning.pruneFiltered(
            index, "k", k.toLong, descending,
            lo.map { case (v, i) => (v: Any, i) }, hi.map { case (v, i) => (v: Any, i) },
            statsPlans)
          .map(_.fileName).toSet
        def passes(v: Option[Long]): Boolean = v.exists { x =>
          lo.forall { case (b, inc) => if (inc) x >= b else x > b } &&
          hi.forall { case (b, inc) => if (inc) x <= b else x < b }
        }
        val all = groups.zipWithIndex.flatMap { case (rows, i) => rows.map((f"g$i%03d", _)) }
        val passing = all.filter(r => passes(r._2))
        val keptPassing = passing.filter(r => kept(r._1))
        // the filter drops nulls, so null ordering is moot — use nulls-last
        topValues(passing.map(_._2), k, descending, nullsFirst = false) ==
          topValues(keptPassing.map(_._2), k, descending, nullsFirst = false)
    }
    check(prop, 500)
  }

  /** Two-column corpus: per row (sort value k, filter value f), both
    * nullable over a tiny domain — heavy ties, all-null groups, empty
    * groups. */
  private val genGroups2: Gen[List[List[(Option[Long], Option[Long])]]] =
    Gen.nonEmptyListOf(
      Gen.listOf(Gen.zip(
        Gen.frequency(8 -> Gen.choose(0L, 20L).map(Some(_)), 2 -> Gen.const(None)),
        Gen.frequency(8 -> Gen.choose(0L, 20L).map(Some(_)), 2 -> Gen.const(None)))))
      .map(_.take(40))

  private def fakeIndex2(
      groups: List[List[(Option[Long], Option[Long])]]): StatsIndex = {
    val schema = StructType(Seq(StructField("k", LongType), StructField("f", LongType)))
    val plans = groups.indices.map(i =>
      FileScanPlan(f"g$i%03d", 1024L, 1, SortedSet(0)))
    def statsOf(sel: ((Option[Long], Option[Long])) => Option[Long]) =
      groups.zipWithIndex.map { case (rows, i) =>
        val defined = rows.map(sel).flatten
        // exact value frequencies: the lex walks' FreqShadow branch runs
        // on every generated case where the extremes exist
        RowGroupStat(f"g$i%03d", 0,
          defined.minOption, defined.maxOption,
          rows.size.toLong, Some((rows.size - defined.size).toLong),
          defined.minOption.map(m => defined.count(_ == m).toLong),
          defined.maxOption.map(m => defined.count(_ == m).toLong))
      }
    val kStats = statsOf(_._1)
    val fStats = statsOf(_._2)
    new StatsIndex {
      def initialize(s: StructType): Unit = ()
      def addFile(st: FileStats): Unit = ()
      def retainOnly(f: Set[String]): Unit = ()
      def removeFiles(f: Set[String]): Unit = ()
      def getFiles(p: org.apache.spark.sql.catalyst.expressions.Expression) =
        plans
      def allFiles() = plans
      def indexedSchema: StructType = schema
      override def rowGroupStats(c: String) =
        Some(if (c == "k") kStats else fStats)
      def close(): Unit = ()
    }
  }

  test("composite pruning never loses a top-k value (other-col bounds × k × direction × null order)") {
    val genBound = Gen.option(Gen.zip(Gen.choose(0L, 20L), Gen.oneOf(true, false)))
    val prop = Prop.forAll(
      genGroups2, Gen.choose(1, 50), Gen.oneOf(true, false),
      Gen.oneOf(true, false), Gen.zip(genBound, genBound, genBound, genBound)) {
      (groups, k, descending, nullsFirst, bounds) =>
        val (lo, hi, lo2, hi2) = bounds
        val index = fakeIndex2(groups)
        val others = Seq(TopKPruning.OtherColBounds("f",
          lo2.map { case (v, i) => (v: Any, i) },
          hi2.map { case (v, i) => (v: Any, i) }))
        val kept = TopKPruning.pruneComposite(
            index, "k", k.toLong, descending, nullsFirst,
            lo.map { case (v, i) => (v: Any, i) },
            hi.map { case (v, i) => (v: Any, i) },
            others, index.allFiles())
          .map(_.fileName).toSet
        val sortBounded = lo.isDefined || hi.isDefined
        def passesK(v: Option[Long]): Boolean =
          if (!sortBounded) true // no comparison on k — nulls compete
          else v.exists { x =>
            lo.forall { case (b, inc) => if (inc) x >= b else x > b } &&
            hi.forall { case (b, inc) => if (inc) x <= b else x < b }
          }
        // an OtherColBounds row models comparisons (or a bare IsNotNull):
        // null f never passes
        def passesF(v: Option[Long]): Boolean = v.exists { x =>
          lo2.forall { case (b, inc) => if (inc) x >= b else x > b } &&
          hi2.forall { case (b, inc) => if (inc) x <= b else x < b }
        }
        val all = groups.zipWithIndex.flatMap { case (rows, i) =>
          rows.map { case (kv, fv) => (f"g$i%03d", kv, fv) } }
        val passing = all.filter(r => passesK(r._2) && passesF(r._3))
        val keptPassing = passing.filter(r => kept(r._1))
        // with sort bounds the filter drops k-nulls, so null order is moot
        val nf = !sortBounded && nullsFirst
        topValues(passing.map(_._2), k, descending, nf) ==
          topValues(keptPassing.map(_._2), k, descending, nf)
    }
    check(prop, 500)
  }

  test("disjunctive pruning never loses a top-k value (2 disjuncts × k × direction × null order)") {
    val genBound = Gen.option(Gen.zip(Gen.choose(0L, 20L), Gen.oneOf(true, false)))
    // one disjunct: optional sort-column bounds + optionally a filter
    // column constraint (absent = that disjunct doesn't touch f)
    val genDisj = Gen.zip(genBound, genBound, Gen.oneOf(true, false), genBound, genBound)
    val prop = Prop.forAll(
      genGroups2, Gen.choose(1, 50), Gen.oneOf(true, false),
      Gen.oneOf(true, false), Gen.zip(genDisj, genDisj)) {
      (groups, k, descending, nullsFirst, ds) =>
        val index = fakeIndex2(groups)
        def mk(d: (Option[(Long, Boolean)], Option[(Long, Boolean)], Boolean,
            Option[(Long, Boolean)], Option[(Long, Boolean)])) = {
          val (kLo, kHi, hasF, fLo, fHi) = d
          TopKPruning.Disjunct(
            kLo.map { case (v, i) => (v: Any, i) },
            kHi.map { case (v, i) => (v: Any, i) },
            if (hasF) Seq(TopKPruning.OtherColBounds("f",
              fLo.map { case (v, i) => (v: Any, i) },
              fHi.map { case (v, i) => (v: Any, i) })) else Nil)
        }
        val disjuncts = Seq(mk(ds._1), mk(ds._2))
        val kept = TopKPruning.pruneDisjunctive(
            index, "k", k.toLong, descending, nullsFirst,
            disjuncts, index.allFiles())
          .map(_.fileName).toSet
        def passesOne(kv: Option[Long], fv: Option[Long],
            d: (Option[(Long, Boolean)], Option[(Long, Boolean)], Boolean,
                Option[(Long, Boolean)], Option[(Long, Boolean)])): Boolean = {
          val (kLo, kHi, hasF, fLo, fHi) = d
          val kPass =
            if (kLo.isEmpty && kHi.isEmpty) true // no comparison — nulls pass
            else kv.exists { x =>
              kLo.forall { case (b, inc) => if (inc) x >= b else x > b } &&
              kHi.forall { case (b, inc) => if (inc) x <= b else x < b }
            }
          val fPass = !hasF || fv.exists { x =>
            fLo.forall { case (b, inc) => if (inc) x >= b else x > b } &&
            fHi.forall { case (b, inc) => if (inc) x <= b else x < b }
          }
          kPass && fPass
        }
        val all = groups.zipWithIndex.flatMap { case (rows, i) =>
          rows.map { case (kv, fv) => (f"g$i%03d", kv, fv) } }
        val passing = all.filter(r =>
          passesOne(r._2, r._3, ds._1) || passesOne(r._2, r._3, ds._2))
        val keptPassing = passing.filter(r => kept(r._1))
        topValues(passing.map(_._2), k, descending, nullsFirst) ==
          topValues(keptPassing.map(_._2), k, descending, nullsFirst)
    }
    check(prop, 500)
  }

  /** Lexicographic pair ordering for the two-key property: leading per
    * (descA, nullsFirstA), second per (descB, nullsFirstB). */
  private def pairOrdering(descA: Boolean, nfA: Boolean,
      descB: Boolean, nfB: Boolean): Ordering[(Option[Long], Option[Long])] =
    new Ordering[(Option[Long], Option[Long])] {
      private def cmp(a: Option[Long], b: Option[Long],
          desc: Boolean, nf: Boolean): Int = (a, b) match {
        case (None, None) => 0
        case (None, _)    => if (nf) -1 else 1
        case (_, None)    => if (nf) 1 else -1
        case (Some(x), Some(y)) =>
          if (desc) java.lang.Long.compare(y, x)
          else java.lang.Long.compare(x, y)
      }
      def compare(p: (Option[Long], Option[Long]),
          q: (Option[Long], Option[Long])): Int = {
        val c = cmp(p._1, q._1, descA, nfA)
        if (c != 0) c else cmp(p._2, q._2, descB, nfB)
      }
    }

  /** Groups biased toward CONSTANT leading keys over a tiny domain (the
    * clustered-layout shape the pair certificate exists for), mixed with
    * fully random groups; second key random with nulls. */
  private val genLexGroups: Gen[List[List[(Option[Long], Option[Long])]]] = {
    val second = Gen.frequency(
      8 -> Gen.choose(0L, 20L).map(Some(_): Option[Long]),
      2 -> Gen.const(None: Option[Long]))
    val clustered = for {
      a <- Gen.choose(0L, 5L)
      rows <- Gen.listOf(second.map(b => (Some(a): Option[Long], b)))
    } yield rows
    val mixed = Gen.listOf(Gen.zip(
      Gen.frequency(8 -> Gen.choose(0L, 5L).map(Some(_): Option[Long]),
        2 -> Gen.const(None: Option[Long])),
      second))
    Gen.nonEmptyListOf(Gen.frequency(6 -> clustered, 4 -> mixed)).map(_.take(40))
  }

  test("two-key pruning never loses a top-k pair (directions × k × null orders)") {
    val prop = Prop.forAll(
      genLexGroups, Gen.choose(1, 50), Gen.oneOf(true, false),
      Gen.oneOf(true, false), Gen.oneOf(true, false), Gen.oneOf(true, false)) {
      (groups, k, descA, nfA, descB, nfB) =>
        val index = fakeIndex2(groups)
        val kept = TopKPruning.pruneLex2(
            index, "k", descA, nfA, "f", descB, nfB, k.toLong)
          .map(_.fileName).toSet
        val ord = pairOrdering(descA, nfA, descB, nfB)
        val all = groups.zipWithIndex.flatMap { case (rows, i) =>
          rows.map { case (kv, fv) => (f"g$i%03d", (kv, fv)) } }
        val keptRows = all.filter(r => kept(r._1)).map(_._2)
        all.map(_._2).sorted(ord).take(k) == keptRows.sorted(ord).take(k)
    }
    check(prop, 500)
  }

  /** Three-column corpus for the N-key property: leading keys biased
    * toward clustered (constant / near-constant within a group) shapes
    * over tiny domains — where the tuple certificate actually fires —
    * mixed with fully random groups; all keys nullable. */
  private val genLexGroups3
      : Gen[List[List[(Option[Long], Option[Long], Option[Long])]]] = {
    def keyGen(dom: Long) = Gen.frequency(
      8 -> Gen.choose(0L, dom).map(Some(_): Option[Long]),
      2 -> Gen.const(None: Option[Long]))
    val clustered = for {
      a <- Gen.choose(0L, 3L)
      b <- Gen.choose(0L, 3L)
      rows <- Gen.listOf(keyGen(20L).map(c => (Some(a): Option[Long],
        Some(b): Option[Long], c)))
    } yield rows
    val nearConst = for {
      a <- Gen.choose(0L, 3L)
      rows <- Gen.listOf(Gen.zip(
        Gen.frequency(9 -> Gen.const(Some(a): Option[Long]),
          1 -> Gen.choose(0L, 3L).map(Some(_): Option[Long])),
        keyGen(3L), keyGen(20L)))
    } yield rows
    val mixed = Gen.listOf(Gen.zip(keyGen(3L), keyGen(3L), keyGen(20L)))
    Gen.nonEmptyListOf(
      Gen.frequency(4 -> clustered, 3 -> nearConst, 3 -> mixed)).map(_.take(40))
  }

  private def fakeIndex3(
      groups: List[List[(Option[Long], Option[Long], Option[Long])]]): StatsIndex = {
    val schema = StructType(Seq(StructField("a", LongType),
      StructField("b", LongType), StructField("c", LongType)))
    val plans = groups.indices.map(i =>
      FileScanPlan(f"g$i%03d", 1024L, 1, SortedSet(0)))
    def statsOf(sel: ((Option[Long], Option[Long], Option[Long])) => Option[Long]) =
      groups.zipWithIndex.map { case (rows, i) =>
        val defined = rows.map(sel).flatten
        // exact value frequencies — exercises the dominant-slice branch
        RowGroupStat(f"g$i%03d", 0,
          defined.minOption, defined.maxOption,
          rows.size.toLong, Some((rows.size - defined.size).toLong),
          defined.minOption.map(m => defined.count(_ == m).toLong),
          defined.maxOption.map(m => defined.count(_ == m).toLong))
      }
    val byCol = Map("a" -> statsOf(_._1), "b" -> statsOf(_._2), "c" -> statsOf(_._3))
    new StatsIndex {
      def initialize(s: StructType): Unit = ()
      def addFile(st: FileStats): Unit = ()
      def retainOnly(f: Set[String]): Unit = ()
      def removeFiles(f: Set[String]): Unit = ()
      def getFiles(p: org.apache.spark.sql.catalyst.expressions.Expression) =
        plans
      def allFiles() = plans
      def indexedSchema: StructType = schema
      override def rowGroupStats(c: String) = Some(byCol(c))
      def close(): Unit = ()
    }
  }

  test("three-key pruning never loses a top-k tuple (directions × k × null orders)") {
    val genFlags = Gen.zip(Gen.oneOf(true, false), Gen.oneOf(true, false))
    val prop = Prop.forAll(
      genLexGroups3, Gen.choose(1, 50), genFlags, genFlags, genFlags) {
      (groups, k, fa, fb, fc) =>
        val index = fakeIndex3(groups)
        import graft.index.SortKeySpec
        val keys = Seq(SortKeySpec("a", fa._1, fa._2),
          SortKeySpec("b", fb._1, fb._2), SortKeySpec("c", fc._1, fc._2))
        val kept = TopKPruning.pruneLexN(index, keys, k.toLong)
          .map(_.fileName).toSet
        def cmp(a: Option[Long], b: Option[Long], desc: Boolean, nf: Boolean): Int =
          (a, b) match {
            case (None, None) => 0
            case (None, _)    => if (nf) -1 else 1
            case (_, None)    => if (nf) 1 else -1
            case (Some(x), Some(y)) =>
              if (desc) java.lang.Long.compare(y, x)
              else java.lang.Long.compare(x, y)
          }
        val ord = new Ordering[(Option[Long], Option[Long], Option[Long])] {
          def compare(p: (Option[Long], Option[Long], Option[Long]),
              q: (Option[Long], Option[Long], Option[Long])): Int = {
            val c1 = cmp(p._1, q._1, fa._1, fa._2)
            if (c1 != 0) return c1
            val c2 = cmp(p._2, q._2, fb._1, fb._2)
            if (c2 != 0) return c2
            cmp(p._3, q._3, fc._1, fc._2)
          }
        }
        val all = groups.zipWithIndex.flatMap { case (rows, i) =>
          rows.map(r => (f"g$i%03d", r)) }
        val keptRows = all.filter(r => kept(r._1)).map(_._2)
        all.map(_._2).sorted(ord).take(k) == keptRows.sorted(ord).take(k)
    }
    check(prop, 500)
  }

  /** Timestamp corpus for the IMAGE property (r11): micros clustered in
    * narrow windows (the time-clustered shape where image pruning fires)
    * mixed with fully random groups, nullable, spanning ~10 'days' so
    * the day image genuinely buckets; second key random over a tiny
    * domain. */
  private val genTsGroups: Gen[List[List[(Option[Long], Option[Long])]]] = {
    val DayU = 86400000000L
    val micros = Gen.choose(0L, 10L * DayU)
    val second = Gen.frequency(
      8 -> Gen.choose(0L, 20L).map(Some(_): Option[Long]),
      2 -> Gen.const(None: Option[Long]))
    val clustered = for {
      start <- micros
      rows <- Gen.listOf(Gen.zip(
        Gen.choose(0L, DayU / 2).map(o => Some(start + o): Option[Long]),
        second))
    } yield rows
    val mixed = Gen.listOf(Gen.zip(
      Gen.frequency(8 -> micros.map(Some(_): Option[Long]),
        2 -> Gen.const(None: Option[Long])),
      second))
    Gen.nonEmptyListOf(Gen.frequency(6 -> clustered, 4 -> mixed)).map(_.take(40))
  }

  private def fakeIndexTs(
      groups: List[List[(Option[Long], Option[Long])]]): StatsIndex = {
    val schema = StructType(Seq(StructField("ts", TimestampType),
      StructField("f", LongType)))
    val plans = groups.indices.map(i =>
      FileScanPlan(f"g$i%03d", 1024L, 1, SortedSet(0)))
    def statsOf(sel: ((Option[Long], Option[Long])) => Option[Long]) =
      groups.zipWithIndex.map { case (rows, i) =>
        val defined = rows.map(sel).flatten
        RowGroupStat(f"g$i%03d", 0,
          defined.minOption, defined.maxOption,
          rows.size.toLong, Some((rows.size - defined.size).toLong),
          defined.minOption.map(m => defined.count(_ == m).toLong),
          defined.maxOption.map(m => defined.count(_ == m).toLong))
      }
    val tsStats = statsOf(_._1)
    val fStats = statsOf(_._2)
    new StatsIndex {
      def initialize(s: StructType): Unit = ()
      def addFile(st: FileStats): Unit = ()
      def retainOnly(f: Set[String]): Unit = ()
      def removeFiles(f: Set[String]): Unit = ()
      def getFiles(p: org.apache.spark.sql.catalyst.expressions.Expression) =
        plans
      def allFiles() = plans
      def indexedSchema: StructType = schema
      override def rowGroupStats(c: String) =
        Some(if (c == "ts") tsStats else fStats)
      def close(): Unit = ()
    }
  }

  test("image-key pruning never loses a top-k (day bucket, id) tuple") {
    import graft.index.{SortKeySpec, TruncTimestampImage}
    val DayU = 86400000000L
    val img = TruncTimestampImage.forUnit("day").get
    val genFlags = Gen.zip(Gen.oneOf(true, false), Gen.oneOf(true, false))
    val prop = Prop.forAll(
      genTsGroups, Gen.choose(1, 50), genFlags, genFlags) {
      (groups, k, fa, fb) =>
        val index = fakeIndexTs(groups)
        val keys = Seq(SortKeySpec("ts", fa._1, fa._2, Some(img)),
          SortKeySpec("f", fb._1, fb._2))
        val kept = TopKPruning.pruneLexN(index, keys, k.toLong)
          .map(_.fileName).toSet
        // ground truth: rows ordered by (day bucket of ts, f) — the image
        // evaluated the way the data-space expression would
        val ord = pairOrdering(fa._1, fa._2, fb._1, fb._2)
        val all = groups.zipWithIndex.flatMap { case (rows, i) =>
          rows.map { case (ts, f) =>
            (f"g$i%03d", (ts.map(m => Math.floorDiv(m, DayU) * DayU), f)) } }
        val keptRows = all.filter(r => kept(r._1)).map(_._2)
        all.map(_._2).sorted(ord).take(k) == keptRows.sorted(ord).take(k)
    }
    check(prop, 500)
  }

  test("hex shadow encoding is order-preserving for arbitrary unicode strings") {
    // the string catalog fast path rests on this invariant: lexicographic
    // comparison of hex(s) — ASCII-only, so Derby's UTF-16-code-unit
    // collation, pad-space semantics included, equals plain compareTo —
    // must order exactly like UTF-8 bytes, i.e. Unicode code points, the
    // order Spark's UTF8String sort uses. Generator weights the
    // historically divergent bands: [U+E000, U+FFFF] vs supplementary
    // planes (where UTF-16 code-unit order inverts), plus empty strings
    // and shared prefixes.
    val genCp = org.scalacheck.Gen.frequency(
      5 -> org.scalacheck.Gen.choose(0x20, 0x7E),
      2 -> org.scalacheck.Gen.choose(0x80, 0xD7FF),
      2 -> org.scalacheck.Gen.choose(0xE000, 0xFFFF),
      2 -> org.scalacheck.Gen.choose(0x10000, 0x10FFFF))
    val genStr = org.scalacheck.Gen.listOf(genCp).map(cps =>
      cps.foldLeft(new java.lang.StringBuilder)(_.appendCodePoint(_)).toString)
    def byteCompare(a: Array[Byte], b: Array[Byte]): Int = {
      var i = 0
      while (i < a.length && i < b.length) {
        val c = java.lang.Integer.compare(a(i) & 0xFF, b(i) & 0xFF)
        if (c != 0) return c
        i += 1
      }
      java.lang.Integer.compare(a.length, b.length)
    }
    val prop = Prop.forAll(genStr, genStr) { (s1, s2) =>
      val viaHex = math.signum(
        graft.index.DerbyStatsIndex.hex(s1)
          .compareTo(graft.index.DerbyStatsIndex.hex(s2)))
      val viaBytes = math.signum(byteCompare(
        s1.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        s2.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      viaHex == viaBytes
    }
    check(prop, 1000)
  }

  test("truncMin never splits a surrogate pair and stays a lower bound") {
    // a MaxStringLen cut landing between a surrogate pair's halves would
    // leave an unpaired high surrogate in the VARCHAR while hex() encodes
    // it via getBytes as '?': sound as a bound but a DIFFERENT value than
    // the VARCHAR holds, breaking catalog==planner plan-set equivalence.
    // truncMin must emit a well-formed prefix whose hex is its exact byte
    // image. Generator forces supplementary code points around the cut.
    import graft.index.DerbyStatsIndex
    val max = DerbyStatsIndex.MaxStringLen
    val genCp = org.scalacheck.Gen.frequency(
      3 -> org.scalacheck.Gen.choose(0x20, 0x7E),
      3 -> org.scalacheck.Gen.choose(0x10000, 0x10FFFF))
    val genLong = for {
      cps  <- org.scalacheck.Gen.listOfN(max / 2 + 8, genCp)
      tail <- org.scalacheck.Gen.listOfN(4, genCp)
    } yield {
      val sb = new java.lang.StringBuilder
      cps.foreach(sb.appendCodePoint)
      // force at least one supplementary char to straddle index max-1
      while (sb.length < max + 1) sb.appendCodePoint(0x10400)
      tail.foreach(sb.appendCodePoint)
      sb.toString
    }
    val prop = Prop.forAll(genLong) { s =>
      val t = DerbyStatsIndex.truncMin(s)
      val wellFormed =
        !Character.isHighSurrogate(t.charAt(t.length - 1)) &&
          t.codePoints().toArray.forall(Character.isValidCodePoint)
      val isPrefix = s.startsWith(t) && t.length <= max
      // hex shadow is the exact byte image of the stored value: decoding
      // the hex back yields the identical string (no '?' substitution)
      val hexBytes = DerbyStatsIndex.hex(t).grouped(2)
        .map(h => java.lang.Integer.parseInt(h, 16).toByte).toArray
      val roundTrip = new String(hexBytes, java.nio.charset.StandardCharsets.UTF_8) == t
      wellFormed && isPrefix && roundTrip
    }
    check(prop, 200)
  }
}
