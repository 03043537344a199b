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
  def hash32(c: Column): Column = hash32At(c, 1)

  /** 32-bit hash from the 8 hex digits of md5 starting at 1-based `off`
    * (off ∈ {1, 9, 17, 25} gives four disjoint spans of one digest — a
    * cheap independent hash family: one md5 per row serves all four, which
    * is what keeps d-row sketches like the CMS at one digest per key
    * instead of d).
    */
  def hash32At(c: Column, off: Int): Column = {
    require(off >= 1 && off + 8 <= 33, s"md5 span out of range: $off")
    val md = md5(c.cast("string"))
    // one conv() instead of the former 8× (substring + instr) positional
    // parse (r17): conv(hex, 16, 10) of the same 8-digit span is the
    // identical value (verified bit-equal over the hash range; hash32 <
    // 2^32 so the long cast never overflows) at 1/8th the per-row string
    // work — this expression sits on every hash-heavy hot path (walk
    // candidates, CMS/minhash/sampling buckets). The DuckDB mirror below
    // is unchanged: the VALUE is the contract, not the parse.
    conv(substring(md, off, 8), 16, 10).cast("long")
  }

  /** Same hash in DuckDB SQL over expression `e`. list_sum widens to
    * HUGEINT; the outer CAST keeps the oracle at BIGINT to match Spark's
    * LongType (driver hash compare is dtype-sensitive). */
  def hash32Sql(e: String): String = hash32AtSql(e, 1)

  /** DuckDB mirror of [[hash32At]]. */
  def hash32AtSql(e: String, off: Int): String = {
    require(off >= 1 && off + 8 <= 33, s"md5 span out of range: $off")
    val powers = (0 until 8).map(i => 1L << (4 * (7 - i))).mkString("[", ", ", "]")
    s"""CAST(list_sum(list_transform(range(${off}, ${off + 8}),
       |  i -> CAST(strpos('0123456789abcdef', substr(md5(CAST(($e) AS VARCHAR)), CAST(i AS INTEGER), 1)) - 1 AS BIGINT)
       |       * ($powers)[CAST(i AS INTEGER) - ${off - 1}])) AS BIGINT)""".stripMargin
  }
}
