package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import java.nio.file.Files

/** MODEL-BASED property test of the table format: a random sequence of
  * table operations (append / overwrite / rename / drop / merge-on-read
  * delete / restore / compact / checkpoint) runs against BOTH the real
  * VersionedTable and a trivial in-memory reference model, then EVERY
  * historical snapshot is compared — columns and full row set — and
  * fsck must pass. This is the test shape that catches fold bugs no
  * hand-written case does (e.g. the replace-fold dropping the column
  * mapping found during round 6): the ops compose in orders nobody
  * writes by hand.
  *
  * Row values are DERIVED from the id (a = 7·id+1, b = 13·id+2) and
  * tracked per column IDENTITY, so renames move names while values
  * stay pinned to the right column — a mis-mapped read surfaces as a
  * value mismatch, not just a name mismatch. Fixed seeds; failures
  * print the op sequence for replay.
  */
class VersionedTablePropertySpec extends SparkSpecBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  // column identity -> derived value
  private def valueOf(which: String, id: Long): Long = which match {
    case "id" => id
    case "a" => 7 * id + 1
    case "b" => 13 * id + 2
  }

  /** The reference model of one snapshot: named columns (each pinned
    * to its identity) and the set of live ids. */
  private case class Model(cols: Vector[(String, String)], ids: Set[Long])

  private sealed trait Op
  private case class Append(fresh: Seq[Long]) extends Op
  private case class OverwriteT(fresh: Seq[Long]) extends Op
  private case class Rename(colPos: Int, to: String) extends Op
  private case class DropC(colPos: Int) extends Op
  private case class DeleteK(pick: Seq[Int]) extends Op
  private case class RestoreV(pick: Int) extends Op
  private case object Compact extends Op
  private case object Ckpt extends Op

  private val opGen: Gen[Op] = Gen.frequency(
    4 -> Gen.listOfN(4, Gen.choose(0, 999)).map(is =>
      Append(is.map(_.toLong).distinct)),
    2 -> Gen.listOfN(6, Gen.choose(0, 999)).map(is =>
      OverwriteT(is.map(_.toLong).distinct)),
    3 -> (for { p <- Gen.choose(0, 2); n <- Gen.choose(0, 9999) }
      yield Rename(p, s"c$n")),
    2 -> Gen.choose(1, 2).map(DropC(_)),
    3 -> Gen.listOfN(3, Gen.choose(0, 11)).map(DeleteK(_)),
    2 -> Gen.choose(0, 999).map(RestoreV(_)),
    1 -> Gen.const(Compact),
    1 -> Gen.const(Ckpt))

  private def df(m: Model, ids: Seq[Long]) = {
    def v(p: Int)(id: Long) = valueOf(m.cols(p)._2, id)
    val base = m.cols.length match {
      case 1 => ids.map(v(0)).toDF("x0")
      case 2 => ids.map(id => (v(0)(id), v(1)(id))).toDF("x0", "x1")
      case _ => ids.map(id => (v(0)(id), v(1)(id), v(2)(id)))
        .toDF("x0", "x1", "x2")
    }
    base.toDF(m.cols.map(_._1): _*)
  }

  test("random op sequences: every snapshot matches the reference model") {
    for (seed <- 1L to 10L) {
      val root = Files.createTempDirectory("vtprop").toString
      val ops = (0 until 9).map(i => sample(opGen, seed * 100 + i))
      var usedNames = Set("id", "a", "b")
      var m = Model(Vector("id" -> "id", "a" -> "a", "b" -> "b"),
        Set(1L, 2L, 3L))
      VersionedTable.commit(df(m, m.ids.toSeq.sorted), root) // v0
      val hist = scala.collection.mutable.ArrayBuffer(m)
      val applied = scala.collection.mutable.ArrayBuffer[String]("init")
      ops.foreach { op =>
        op match {
          case Append(fresh0) =>
            val fresh = fresh0.filterNot(m.ids)
            if (fresh.nonEmpty) {
              VersionedTable.commit(df(m, fresh), root)
              m = m.copy(ids = m.ids ++ fresh)
              hist += m; applied += s"append(${fresh.mkString(",")})"
            }
          case OverwriteT(fresh) if fresh.nonEmpty =>
            VersionedTable.commit(df(m, fresh), root, "overwrite")
            m = m.copy(ids = fresh.toSet)
            hist += m; applied += s"overwrite(${fresh.mkString(",")})"
          case OverwriteT(_) => ()
          case Rename(p0, to) if !usedNames.contains(to) =>
            val p = p0 % m.cols.length
            VersionedTable.renameColumn(root, m.cols(p)._1, to)
            usedNames += to
            m = m.copy(cols = m.cols.updated(p, to -> m.cols(p)._2))
            hist += m; applied += s"rename($p -> $to)"
          case Rename(_, _) => ()
          case DropC(p0) if m.cols.length > 1 =>
            val p = p0 % m.cols.length match {
              case 0 => m.cols.length - 1 // keep col 0 droppable too,
              case q => q                 // but bias away from it
            }
            VersionedTable.dropColumn(root, m.cols(p)._1)
            m = m.copy(cols =
              m.cols.patch(p, Nil, 1))
            hist += m; applied += s"drop($p)"
          case DropC(_) => ()
          case DeleteK(pick) if m.ids.nonEmpty =>
            val sorted = m.ids.toSeq.sorted
            val keys = pick.map(i => sorted(i % sorted.length)).distinct
            val keyCol = m.cols.head._1
            val basis = VersionedTable.latestVersion(root)
            val v = VersionedTable.deleteKeysMOR(spark, root, keyCol,
              keys.toDF(keyCol))
            if (v != basis) { // stats-disjoint no-op commits nothing
              m = m.copy(ids = m.ids -- keys)
              hist += m; applied += s"deleteMOR(${keys.mkString(",")})"
            }
          case DeleteK(_) => ()
          case RestoreV(pick) =>
            val v = pick % hist.length
            VersionedTable.restore(root, v.toLong)
            m = hist(v)
            hist += m; applied += s"restore($v)"
          case Compact =>
            VersionedTable.compact(spark, root, numFiles = 2)
            hist += m; applied += "compact"
          case Ckpt =>
            VersionedTable.checkpoint(root)
            // no new version, no model change
        }
      }
      val ctx = s"seed=$seed ops=${applied.mkString("; ")}"
      assert(VersionedTable.latestVersion(root) == hist.length - 1,
        s"version count diverged from model: $ctx")
      hist.zipWithIndex.foreach { case (mv, v) =>
        val got = VersionedTable.read(spark, root, Some(v.toLong))
        assert(got.columns.toSeq == mv.cols.map(_._1),
          s"columns@v$v: $ctx")
        val rows = got.collect()
          .map(r => (0 until r.length).map(r.getLong).toVector).toSet
        val want = mv.ids
          .map(id => mv.cols.map { case (_, w) => valueOf(w, id) }.toVector)
        assert(rows == want, s"rows@v$v: $ctx")
      }
      val f = VersionedTable.fsck(root)
      assert(f.ok, s"fsck: $f $ctx")
    }
  }
}
