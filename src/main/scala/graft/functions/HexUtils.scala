package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hex/address decoding — the classifier's byte-level log parsing.
  *
  * The reference strips the 12 zero-bytes prefix from 32-byte log topics to
  * recover 20-byte addresses (`Settings.AddressEmptyBytesPrefix`,
  * `TransactionClassifier.cs` `.Replace(prefix, "0x")`) and parses hex
  * quantities into big integers (`HexBigInteger`). Pure codegen'd column
  * expressions — no UDFs.
  */
object HexUtils {

  /** 0x-prefixed 64-hex-digit topic → 0x-prefixed 40-hex-digit address
    * (drop the 24 zero hex chars after "0x").
    */
  def topicToAddress(topic: Column): Column =
    concat(lit("0x"), substring(topic, 27, 40))

  /** 0x-prefixed hex quantity → bigint via conv (base 16 → base 10).
    * conv returns unsigned-64 semantics — fine for quantities < 2^63;
    * chain-scale uint256 amounts stay strings end-to-end in this engine
    * (same choice as the reference, which stores `value` as text).
    */
  def hexToLong(hexStr: Column): Column =
    conv(regexp_replace(hexStr, "^0x", ""), 16, 10).cast("long")

  /** Canonical lowercase 0x form (the reference lowercases all addresses). */
  def normalizeAddress(addr: Column): Column = lower(addr)

  /** Synthesize a 32-byte topic from a long id (test/demo helper — the
    * inverse of [[topicToAddress]]+[[hexToLong]]).
    */
  def longToTopic(id: Column): Column =
    concat(lit("0x"), lpad(lower(hex(id)), 64, "0"))
}
