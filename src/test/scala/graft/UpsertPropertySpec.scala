package graft

import graft.etl.Upsert
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property test (SURVEY §7.4 risk 1): the set-based upsert must match a
  * row-at-a-time oracle implementing the reference's sequential loop —
  * key fields tried in priority order (id → sku → name), first match by
  * (display_order, id), last-in-batch wins for duplicate keys, inserts
  * require a name. Incoming rows mutate only the payload column, so
  * resolution state is constant during the batch (the regime where the
  * reference's semantics are well-defined). Insert surrogates are
  * compared as content multisets (numbering order is an implementation
  * choice on both sides). */
case class UpsertPropSnap(id: Long, sku: String, name: String,
    display_order: Int, v: Double)
case class UpsertPropInc(id: java.lang.Long, sku: String, name: String,
    v: Double, __ord: Int)

class UpsertPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private type Snap = UpsertPropSnap
  private type Inc = UpsertPropInc
  private val Snap = UpsertPropSnap
  private val Inc = UpsertPropInc

  private def sequentialOracle(snap: Seq[Snap], inc: Seq[Inc]):
      (Map[Long, Double], Seq[(String, String, Double)]) = {
    val bySkuOrder = snap.filter(_.sku != null)
      .groupBy(_.sku).view.mapValues(_.minBy(r => (r.display_order, r.id)).id).toMap
    val byNameOrder = snap.filter(_.name != null)
      .groupBy(_.name).view.mapValues(_.minBy(r => (r.display_order, r.id)).id).toMap
    val ids = snap.map(_.id).toSet
    var vals = snap.map(r => r.id -> r.v).toMap
    var inserts = Vector.empty[(java.lang.Long, String, String, Double)]
    inc.sortBy(_.__ord).foreach { r =>
      val resolved: Option[Long] =
        Option(r.id).map(_.longValue).filter(ids.contains)
          .orElse(Option(r.sku).flatMap(bySkuOrder.get))
          .orElse(Option(r.name).flatMap(byNameOrder.get))
      resolved match {
        case Some(id) => vals = vals.updated(id, r.v)
        case None if r.name != null => inserts :+= ((r.id, r.sku, r.name, r.v))
        case None => () // insert without name: skipped
      }
    }
    // duplicate exact key tuples collapse to one insert, last wins —
    // mirroring the loader's batch dedup (step 1) for unresolved rows
    val deduped = inserts.groupBy(t => (t._1, t._2, t._3))
      .map(_._2.last).map(t => (t._2, t._3, t._4)).toSeq
    (vals, deduped)
  }

  test("set-based upsert == sequential row-at-a-time oracle (30 random cases)") {
    val genSnapRow = for {
      sku <- Gen.option(Gen.oneOf("A", "B", "C", "D"))
      name <- Gen.option(Gen.oneOf("n1", "n2", "n3", "n4", "n5"))
      dord <- Gen.choose(1, 3)
      v <- Gen.choose(0, 1000).map(_.toDouble)
    } yield (sku.orNull, name.orNull, dord, v)
    val genIncRow = for {
      useId <- Gen.frequency(1 -> true, 2 -> false)
      idVal <- Gen.choose(1L, 12L)
      sku <- Gen.option(Gen.oneOf("A", "B", "C", "E", "F"))
      name <- Gen.option(Gen.oneOf("n1", "n3", "n6", "n7"))
      v <- Gen.choose(2000, 3000).map(_.toDouble)
    } yield (if (useId) (idVal: java.lang.Long) else null, sku.orNull, name.orNull, v)

    (0 until 30).foreach { iter =>
      val seed = Seed(iter.toLong * 7919)
      val nSnap = 3 + iter % 6
      val nInc = 2 + iter % 7
      val snap = (1 to nSnap).map { i =>
        val (sku, name, dord, v) = Gen.listOfN(nSnap, genSnapRow)
          .pureApply(Gen.Parameters.default, seed.next)(i - 1)
        Snap(i.toLong, sku, name, dord, v)
      }
      val inc = (0 until nInc).map { i =>
        val (id, sku, name, v) = Gen.listOfN(nInc, genIncRow)
          .pureApply(Gen.Parameters.default, seed.reseed(i + 31L))(i)
        // avoid insert keys colliding with other incoming rows (the
        // reference's mid-batch visibility there is out of scope)
        Inc(id, sku, name, v, i)
      }
      val cfg = Upsert.Config(
        surrogate = "id", keyPriority = Seq("id", "sku", "name"),
        tiebreak = Seq("display_order"), requiredForInsert = Some("name"),
        incomingOrder = Seq("__ord"))
      val got = Upsert.upsert(snap.toDF(), inc.toDF(), cfg)
      val (expVals, expInserts) = sequentialOracle(snap, inc)
      val rows = got.collect()
      val maxId = snap.map(_.id).max
      val gotUpd = rows.filter(_.getLong(0) <= maxId)
        .map(r => r.getLong(0) -> r.getDouble(4)).toMap
      assert(gotUpd == expVals, s"iter=$iter updates mismatch")
      def insKey(t: (String, String, Double)) =
        (Option(t._1).getOrElse(""), Option(t._2).getOrElse(""), t._3)
      val gotIns = rows.filter(_.getLong(0) > maxId)
        .map(r => (r.getString(1), r.getString(2), r.getDouble(4)))
        .sortBy(insKey).toSeq
      assert(gotIns == expInserts.sortBy(insKey), s"iter=$iter inserts mismatch")
    }
  }
}
