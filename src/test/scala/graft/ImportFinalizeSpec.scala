package graft

import graft.etl.{Deploy, ImportFinalize}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Import capstone v3 (etl.ImportFinalize): the store-mappings pass's
  * reconcile semantics, the completion email's recipient cascade +
  * queue side effect, and the rollup's severity split. */
class ImportFinalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val dir = TestSpark.sfDir

  test("store mappings: lone-zero clears the flag but keeps mappings; " +
      "invalid-only list keeps the flag and empties the set; valid ids " +
      "reconcile insert+delete") {
    val out = ImportFinalize.storeMappingImport(spark, dir)
      .collect().map(r => r.getAs[Long]("product_id") ->
        ((r.getAs[Int]("limited_to_stores"), Option(r.getAs[String]("store_ids")),
          r.getAs[Long]("n_inserted"), r.getAs[Long]("n_deleted")))).toMap
    out.foreach { case (pid, (flag, ids, nIns, nDel)) =>
      val inSnap = pid % 4 == 1
      val snapIds = if (inSnap) Set(pid % 5, (pid + 2) % 5) else Set.empty[Long]
      pid % 6 match {
        case 1 => // two valid + invalid 9
          val want = Set(pid % 5, (pid + 1) % 5)
          assert(flag == 1, s"$pid flag")
          assert(ids.get.split(',').map(_.toLong).toSet == want, s"$pid set")
          assert(nIns == (want -- snapIds).size && nDel == (snapIds -- want).size,
            s"$pid tallies")
        case 2 | 3 => // lone zero / empty: flag cleared, mappings untouched
          assert(flag == 0, s"$pid flag")
          assert(ids.map(_.split(',').map(_.toLong).toSet)
            .getOrElse(Set.empty) == snapIds, s"$pid mappings must be untouched")
          assert(nIns == 0 && nDel == 0, s"$pid tallies")
        case 4 => // only the invalid store 9: flag SET, set emptied
          assert(flag == 1, s"$pid flag")
          assert(ids.isEmpty, s"$pid set must be empty")
          assert(nIns == 0 && nDel == snapIds.size, s"$pid tallies")
        case _ => fail(s"unexpected sheet product $pid")
      }
    }
    assert(out.nonEmpty)
  }

  test("completion email: recipient cascade and queue side effect; " +
      "unconfigured host queues nothing (DataImporter.cs:238-242)") {
    import ImportFinalize.importCompletionRecipients
    assert(importCompletionRecipients(Some("w@x.io"), Some("c@x.io"), "a@x.io")
      == Seq("w@x.io"))
    assert(importCompletionRecipients(None, Some("c@x.io"), "a@x.io")
      == Seq("c@x.io"))
    assert(importCompletionRecipients(Some(""), None, "a@x.io") == Seq("a@x.io"))
    val before = ImportFinalize.completionQueue.queued.size()
    val row = ImportFinalize.completionEmail(spark, dir).head()
    assert(ImportFinalize.completionQueue.queued.size() == before + 1)
    val mail = {
      val it = ImportFinalize.completionQueue.queued.iterator()
      var last: Deploy.QueuedEmail = null
      while (it.hasNext) last = it.next()
      last
    }
    assert(mail.to == "webmaster@example.com")
    assert(mail.subject == "Import completed: products-batch")
    // body carries the tallies the frame reports
    assert(mail.body.contains(s"Total rows: ${row.getAs[Long]("total_records")}"))
    assert(mail.body.contains(s"Errors: ${row.getAs[Long]("n_errors")}"))
    assert(row.getAs[Long]("n_errors") > 0 &&
      mail.body.contains("Last error: "))
    // host unconfigured: early return, nothing queued, frame still built
    val mid = ImportFinalize.completionQueue.queued.size()
    val row2 = ImportFinalize.completionEmail(spark, dir, hostConfigured = false)
      .head()
    assert(ImportFinalize.completionQueue.queued.size() == mid)
    assert(row2.getAs[Long]("total_records") ==
      row.getAs[Long]("total_records"))
  }

  test("rollup: conversion failures are warnings, skips are errors, " +
      "grouped-parent drops are absent") {
    val roll = ImportFinalize.errorRollup(spark, dir)
      .groupBy(col("pass"), col("severity")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(roll.keys.map(_._1).toSet ==
      Set("product", "tierprice", "attributevalue", "attributecombination"))
    assert(roll.forall { case ((p, sev), _) =>
      if (p == "product") sev == "warning" else sev == "error" })
  }
}
