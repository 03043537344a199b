package graft.relational

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.queries.RelationalQueries

/** ScalaCheck-generated CDC equivalence: for random bases and random VALID
  * mixed batches (deletes/updates drawn from base rows, inserts anywhere —
  * the contract every real CDC feed satisfies), the one-pass
  * [[RelationalQueries.mvApplyCdc]] delta apply must equal the plain
  * aggregate over the row-level corrected base, including drained groups
  * vanishing and brand-new keys appearing. Fixed seeds for determinism
  * (the ResamplePropsSpec pattern).
  */
class MvPropsSpec extends SparkSpec {

  private val types = Seq("click", "view", "error")

  // 2-decimal values: representative of money-like data and exactly
  // representable at the MvDec scale on every path
  private case class Ev(user: Long, tpe: String, value: Double)

  private def gen(seed: Long): (Seq[Ev], Seq[(Ev, String, Double)]) = {
    val rowGen = for {
      u <- Gen.choose(1L, 6L)
      t <- Gen.oneOf(types)
      c <- Gen.choose(0L, 99999L)
    } yield Ev(u, t, c / 100.0)
    val base = Gen.listOfN(120, rowGen)
      .apply(Gen.Parameters.default, Seed(seed)).get
    // partition base rows into keep / delete / update by index hash
    val tag = Gen.listOfN(base.size, Gen.choose(0, 9))
      .apply(Gen.Parameters.default, Seed(seed + 1)).get
    val newVals = Gen.listOfN(base.size, Gen.choose(0L, 99999L))
      .apply(Gen.Parameters.default, Seed(seed + 2)).get
    val deletes = base.lazyZip(tag).collect { case (e, 0) => (e, "delete", Double.NaN) }
    val updates = base.lazyZip(tag).lazyZip(newVals)
      .collect { case (e, 1, nv) => (e, "update", nv / 100.0) }
    // inserts may hit existing keys or brand-new users 7..9
    val insGen = for {
      u <- Gen.choose(1L, 9L)
      t <- Gen.oneOf(types)
      c <- Gen.choose(0L, 99999L)
    } yield (Ev(u, t, c / 100.0), "insert", Double.NaN)
    val inserts = Gen.listOfN(25, insGen)
      .apply(Gen.Parameters.default, Seed(seed + 3)).get
    (base, deletes.toSeq ++ updates.toSeq ++ inserts)
  }

  for (seed <- Seq(11L, 42L, 1337L)) {
    test(s"one-pass mixed CDC apply equals row-level recompute (seed $seed)") {
      import spark.implicits._
      val (base, batch) = gen(seed)

      val baseDf = base.map(e => (e.user, e.tpe, e.value))
        .toDF("user_id", "event_type", "value")
      val batchDf = batch.map { case (e, op, nv) => (e.user, e.tpe, op, e.value, nv) }
        .toDF("user_id", "event_type", "op", "value", "new_value")

      // row-level application of the same batch
      val deleted = batch.collect { case (e, "delete", _) => e }
      val updated = batch.collect { case (e, "update", nv) => (e, nv) }
      val inserted = batch.collect { case (e, "insert", _) => e }
      // remove each deleted/updated row ONCE (multiset semantics)
      var pool = base
      def removeOne(e: Ev): Unit = {
        val i = pool.indexOf(e); assert(i >= 0); pool = pool.patch(i, Nil, 1)
      }
      deleted.foreach(removeOne)
      updated.foreach { case (e, _) => removeOne(e) }
      val corrected = pool ++ updated.map { case (e, nv) => e.copy(value = nv) } ++ inserted
      val correctedDf = corrected.map(e => (e.user, e.tpe, e.value))
        .toDF("user_id", "event_type", "value")
      val noUpdates = Seq.empty[(Long, String, Double, Double)]
        .toDF("user_id", "event_type", "value", "new_value")

      val viaCdc = RelationalQueries.mvApplyCdc(baseDf, batchDf).collect().toSeq
      val recompute = RelationalQueries.mvApplyUpdates(correctedDf, noUpdates)
        .collect().toSeq
      assert(viaCdc.nonEmpty)
      assert(viaCdc === recompute)
    }
  }
}
