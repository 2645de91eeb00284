package graft.queries

/** Spark's Murmur3_x86_32 (the engine behind `hash()`) replayed as
  * DuckDB SQL expression strings: 32-bit wrapping arithmetic via
  * hugeint mod 2^32, rotations as shift-and-add. Validated
  * value-exact against org.apache.spark.unsafe.hash.Murmur3_x86_32
  * and the end-to-end x03 output. Expressions reference their inputs
  * multiple times, so callers pass short column/lambda variable names.
  *
  * Shared by the x03 minhash oracle (string + int hashing) and the a23
  * HLL oracle (long hashing); `Murmur3SqlSpec` pins the staged-CTE
  * arithmetic against Spark's own `hash()` values.
  */
private[graft] object Murmur3Sql {
  private val M = "4294967296" // 2^32

  private def rotl(x: String, r: Int): String =
    s"((($x) * ${1L << r}) % $M + ($x) // ${1L << (32 - r)})"

  /** k1 = rotl(k1 * 0xcc9e2d51, 15) * 0x1b873593 */
  def mixK1(w: String): String = {
    val t = s"((($w) * 3432918353) % $M)"
    s"(((${rotl(t, 15)}) * 461845907) % $M)"
  }

  /** h1 = rotl(h1 ^ k1, 13) * 5 + 0xe6546b64 */
  def mixH1(h: String, k: String): String = {
    val x = s"xor(CAST(($h) AS HUGEINT), CAST(($k) AS HUGEINT))"
    s"(((${rotl(x, 13)}) * 5 + 3864292196) % $M)"
  }

  /** Avalanche finalizer. Inlined: each step references the previous
    * twice, so only feed short (staged-column) expressions.
    */
  def fmix(h: String, l: String): String = {
    var e = s"xor(CAST(($h) AS HUGEINT), CAST(($l) AS HUGEINT))"
    e = s"xor($e, ($e) // 65536)"
    e = s"((($e) * 2246822507) % $M)"
    e = s"xor($e, ($e) // 8192)"
    e = s"((($e) * 3266489909) % $M)"
    s"xor($e, ($e) // 65536)"
  }

  /** Murmur3_x86_32.hashInt(v, h) — `v` must already be the unsigned
    * 32-bit pattern of the int. This is how Spark's hash() threads
    * array<int> elements.
    */
  def hashInt(v: String, h: String): String =
    fmix(mixH1(h, mixK1(v)), "4")

  /** Murmur3_x86_32.hashLong(v, seed) as staged CTE SQL: Spark hashes a
    * long as its low 32-bit word then its high word, finalized with
    * length 8. Returns `(cteSql, hashCol)` where `cteSql` is a
    * comma-terminated chain of CTE definitions reading `(keepCols..., v)`
    * from `srcCte` and exposing `keepCols` plus the unsigned 32-bit hash
    * as `hashCol`. Staging one mix per CTE keeps the expression tree
    * linear (fmix alone would otherwise 32x its input text).
    *
    * `v` must be a non-negative integer (promoted to HUGEINT at entry,
    * so the full 63-bit id range is safe — the x103 60-bit sha-slice
    * ids overflowed the INT64 `lo · c1` product before the promotion);
    * negative longs would need the two's-complement split first.
    */
  def hashLongCtes(srcCte: String, keep: Seq[String], prefix: String,
                   seed: Long = 42L): (String, String) = {
    val ks = keep.mkString(", ")
    val kc = if (keep.isEmpty) "" else s"$ks, "
    (s"""${prefix}0 AS (SELECT $kc CAST(v AS HUGEINT) % $M AS lo,
           CAST(v AS HUGEINT) // $M AS hi FROM $srcCte),
       ${prefix}1 AS (SELECT $kc hi, ${mixK1("lo")} AS kl FROM ${prefix}0),
       ${prefix}2 AS (SELECT $kc hi, ${mixH1(seed.toString, "kl")} AS h1 FROM ${prefix}1),
       ${prefix}3 AS (SELECT $kc h1, ${mixK1("hi")} AS kh FROM ${prefix}2),
       ${prefix}4 AS (SELECT $kc ${mixH1("h1", "kh")} AS h FROM ${prefix}3),
       ${prefix}5 AS (SELECT $kc xor(CAST(h AS HUGEINT), CAST(8 AS HUGEINT)) AS h FROM ${prefix}4),
       ${prefix}6 AS (SELECT $kc xor(h, h // 65536) AS h FROM ${prefix}5),
       ${prefix}7 AS (SELECT $kc (h * 2246822507) % $M AS h FROM ${prefix}6),
       ${prefix}8 AS (SELECT $kc xor(h, h // 8192) AS h FROM ${prefix}7),
       ${prefix}9 AS (SELECT $kc (h * 3266489909) % $M AS h FROM ${prefix}8),
       ${prefix}u AS (SELECT $kc xor(h, h // 65536) AS hu FROM ${prefix}9),""",
      s"${prefix}u")
  }
}
