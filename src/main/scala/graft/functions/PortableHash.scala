package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable 32-bit hash: positional hex-digit parse of the first 8
  * chars of md5. Used wherever a hash value itself is part of a query
  * contract (sampling buckets, SimHash tokens) so the DuckDB oracle can
  * reproduce it exactly — DuckDB lacks a hex→int conversion, both engines
  * share md5. Spark's own hash()/xxhash64 would be faster but
  * engine-private; at 100 TB swap in xxhash64 where no oracle is needed.
  */
object PortableHash {

  /** 32-bit hash of a string column (Spark side). */
  def hash32(c: Column): Column = {
    val md = md5(c.cast("string"))
    (1 to 8).foldLeft(lit(0L))((acc, i) =>
      acc * 16L + (instr(lit("0123456789abcdef"), substring(md, i, 1)) - 1).cast("long"))
  }

  /** Same hash in DuckDB SQL over expression `e`. list_sum widens to
    * HUGEINT; the outer CAST keeps the oracle at BIGINT to match Spark's
    * LongType (driver hash compare is dtype-sensitive). */
  def hash32Sql(e: String): String = {
    val powers = (0 until 8).map(i => 1L << (4 * (7 - i))).mkString("[", ", ", "]")
    s"""CAST(list_sum(list_transform(range(1, 9),
       |  i -> CAST(strpos('0123456789abcdef', substr(md5(CAST(($e) AS VARCHAR)), CAST(i AS INTEGER), 1)) - 1 AS BIGINT)
       |       * ($powers)[i])) AS BIGINT)""".stripMargin
  }
}
