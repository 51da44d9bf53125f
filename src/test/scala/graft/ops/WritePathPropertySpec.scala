package graft.ops

import graft.SparkSpecBase
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks of the lakehouse write-path pair (MergeOps,
  * Scd2) against reference implementations on randomly generated
  * inputs. Generators run from fixed seeds so failures reproduce.
  */
class WritePathPropertySpec extends SparkSpecBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  // ---- MergeOps: random CDC batches vs a Map-based reference merge

  private val baseGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(60, for {
      k <- Gen.choose(0L, 30L)
      v <- Gen.choose(0L, 999L)
    } yield (k, v)).map(_.distinctBy(_._1))

  private val updGen: Gen[List[(Long, Long, Boolean)]] =
    Gen.listOfN(40, for {
      k <- Gen.choose(0L, 45L) // overlaps base keys AND fresh keys
      v <- Gen.choose(1000L, 1999L)
      del <- Gen.prob(0.3)
    } yield (k, v, del)).map(_.distinctBy(_._1))

  test("merge matches a Map-based reference on random batches") {
    for (seed <- 1L to 8L) {
      val base = sample(baseGen, seed)
      val upd = sample(updGen, seed + 100)
      val expected = upd.foldLeft(base.toMap) { case (m, (k, v, del)) =>
        if (del) m - k else m + (k -> v)
      }
      val got = MergeOps.merge(
          base.toDF("k", "v"), upd.toDF("k", "v", "del"), "k", "del")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"seed=$seed")
    }
  }

  // ---- Scd2: random change logs vs per-key interval invariants

  private val logGen: Gen[List[(Long, String, Long)]] =
    Gen.listOfN(80, for {
      k <- Gen.choose(0L, 8L)
      a <- Gen.oneOf("x", "y", "z")
      t <- Gen.choose(0L, 40L)
    } yield (k, a, t)).map(_.distinctBy(r => (r._1, r._3)))

  test("scd2 versions chain per key and reproduce the latest value") {
    for (seed <- 1L to 8L) {
      val log = sample(logGen, seed)
      val vs = Scd2.fromChangeLog(log.toDF("k", "attr", "t"), "k", "attr", "t")
        .select("k", "attr", "valid_from", "valid_to")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .groupBy(_._1)
      for ((k, rows) <- vs) {
        val sorted = rows.sortBy(_._3)
        // intervals chain: valid_to(i) == valid_from(i+1); last open
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(a._4 === Some(b._3), s"seed=$seed k=$k")
          case _ =>
        }
        assert(sorted.last._4.isEmpty, s"seed=$seed k=$k last not open")
        // adjacent versions always differ in value (runs compressed)
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(a._2 !== b._2, s"seed=$seed k=$k")
          case _ =>
        }
        // the open version carries the key's latest value in the log
        val latest = log.filter(_._1 == k).maxBy(_._3)._2
        assert(sorted.last._2 === latest, s"seed=$seed k=$k")
        // first version starts at the key's earliest change
        val earliest = log.filter(_._1 == k).map(_._3).min
        assert(sorted.head._3 === earliest, s"seed=$seed k=$k")
      }
    }
  }
}
