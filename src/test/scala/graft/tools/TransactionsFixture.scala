package graft.tools

import java.nio.file.{Files, Path}

/** Deterministic 4th-entity fixture: the reference checkout's
  * `data/transactions.csv` is a missing git blob, so its transactions
  * e2e path never actually executes (r8 VERDICT "what's missing").
  * This synthesizes one to the reference's own schema
  * (config/config.py TABLE_SCHEMAS['transactions']) with planted dirty
  * values exercising exactly the transform.py:430-463 semantics:
  * safe_num currency junk, safe_date invalid calendar days, the
  * fraud_flag truthy map, keep-last PK dedup, and empty-PK drops.
  *
  * Seeded and wall-clock-free: the same bytes every run, so staged /
  * transformed / loaded counts are assertable constants.
  */
object TransactionsFixture {

  /** Expected-outcome ledger, computed BY CONSTRUCTION (not by running
    * the pipeline): totalRows = csv data lines; invalidPk = planted
    * empty-PK lines; deduped = extra keep-last-shadowed lines; staged =
    * distinct valid keys surviving.
    */
  final case class Stats(totalRows: Long, invalidPk: Long, deduped: Long) {
    def staged: Long = totalRows - invalidPk - deduped
  }

  val header =
    "transaction_id,customer_id,transaction_date,transaction_type," +
      "amount,balance_after,fraud_flag"

  private def csvField(s: String): String =
    if (s.contains(",") || s.contains("\""))
      "\"" + s.replace("\"", "\"\"") + "\"" else s

  /** Planted rows with hand-assertable outcomes (ids 1-13). */
  val planted: Seq[(String, String, String, String, String, String, String)] = Seq(
    ("1", "101", "13-03-21", "deposit", "500.25", "500.25", "true"),
    ("2", "102", "05-03-21", "Withdrawal", "1500", "2000.00", "false"),
    ("3", "103", "2021-03-13", "TRANSFER", "15000.75", "17000", "1"),
    ("4", "104", "13/03/21", "payment", "999.99", "16000", "0"),
    ("5", "105", "13.03.99", "upi", "1000", "15000", "yes"),
    ("6", " 106 ", "28-02-21", "deposit", "1000.01", "16000", "y"),
    ("7", "107", "01-01-20", "deposit", "₹12,345.67", "20000", "no"),
    ("8", "108", "02-01-20", "withdrawal", "abc", "20000", "TRUE"),
    ("9", "109", "03-01-20", "deposit", "$ 2,500.00", "22500", "N"),
    ("10", "110", "31-04-21", "deposit", "50", "60", "maybe"),
    ("11", "111", "garbage", "DEPOSIT", "75.5", "135.5", "YES"),
    ("12", "", "04-01-20", "transfer", "-250.00", "-114.5", " "),
    ("13", "113", "05-01-20", "deposit", "1", "1", "true"))

  /** Write the fixture; `n` total unique ids (≥ 20). Appends
    * `dupCount` keep-last shadow rows and `emptyPkCount` invalid-PK
    * rows after the base block, mirroring how real dirty feeds arrive.
    */
  def write(path: Path, n: Int = 3000, dupCount: Int = 15,
            emptyPkCount: Int = 10): Stats = {
    require(n >= 20 + dupCount)
    val rnd = new scala.util.Random(9)
    val sb = new StringBuilder
    sb.append(header).append('\n')
    def row(f: (String, String, String, String, String, String, String)): Unit =
      sb.append(Seq(f._1, f._2, f._3, f._4, f._5, f._6, f._7)
        .map(csvField).mkString(",")).append('\n')
    planted.foreach(row)
    val types = Seq("deposit", "Withdrawal", "TRANSFER", "payment", "upi")
    val flags = Seq("true", "false", "1", "0", "yes", "y", "no", "TRUE", "N", "")
    (planted.size + 1 to n).foreach { i =>
      val day = 1 + rnd.nextInt(28)
      val mon = 1 + rnd.nextInt(12)
      val yy = 10 + rnd.nextInt(15)
      val date =
        if (i % 97 == 0) "31-04-21" // invalid calendar day → null
        else if (i % 89 == 0) "not-a-date"
        else if (i % 83 == 0) ""
        else f"$day%02d-$mon%02d-$yy%02d"
      val amtVal = rnd.nextInt(2000000) / 100.0 // 0..20000, 2dp
      val amt =
        if (i % 41 == 0) "junk" // safe_num default 0
        else if (i % 13 == 0) f"₹$amtVal%,.2f" // currency junk
        else f"$amtVal%.2f"
      val bal = f"${rnd.nextInt(5000000) / 100.0}%.2f"
      row((i.toString, (1 + rnd.nextInt(5022)).toString, date,
        types(rnd.nextInt(types.size)), amt, bal,
        flags(rnd.nextInt(flags.size))))
    }
    // keep-last shadows: ids 21..20+dupCount re-appear LAST with a
    // marker amount — staging must keep THESE rows (file-order
    // keep='last'; ids past the planted block so those stay intact)
    (21 to 20 + dupCount).foreach { i =>
      row((i.toString, s"${100 + i}", "15-06-22", "deposit",
        "77777.77", "88888.88", "true"))
    }
    (1 to emptyPkCount).foreach { i =>
      row((if (i % 2 == 0) "" else "  ", "200", "16-06-22", "deposit",
        "1.00", "2.00", "false"))
    }
    Files.writeString(path, sb.toString)
    Stats(totalRows = n + dupCount + emptyPkCount,
      invalidPk = emptyPkCount, deduped = dupCount)
  }
}
