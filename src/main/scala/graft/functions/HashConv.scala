package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine's cross-engine 56-bit hash convention — `md5(x)` hex, first
  * 14 hex digits parsed as a long — spelled in exactly ONE place. DuckDB
  * reproduces it as `('0x' || substring(md5(x), 1, 14))::BIGINT`, which
  * is what makes the shard writer, the group cap, and the dataset
  * checksum oracle-checkable. 56 bits keeps the value positive and
  * exactly representable everywhere; widening the convention means
  * changing THIS file and every stored artifact built on it.
  */
object HashConv {

  /** First 14 hex digits of an md5-hex column as a long. */
  def hexPrefixLong(hexCol: Column): Column =
    conv(substring(hexCol, 1, 14), 16, 10).cast("long")

  /** The full convention: md5 the (string) input, take the 56-bit prefix. */
  def md5Long56(c: Column): Column = hexPrefixLong(md5(c))
}
