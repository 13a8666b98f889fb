package graft.queries

/** Shared engine-parity formatting helpers. The exact byte behavior
  * here is load-bearing for oracle parity — every user of a scaled
  * serialization or md5-parity sign MUST go through these so the Spark
  * side and the DuckDB twin can never drift apart independently.
  */
object OracleFmt {

  /** Serialize a float/double array to a CSV of 1e-8-granule scaled
    * bigints: the double multiply + half-away round is bit-identical in
    * every engine, and the driver's pandas harness cannot hash raw
    * array columns — so array-valued results are rendered as strings in
    * the final projection (list semantics unchanged upstream). */
  def csvScaled(arrExpr: String): String =
    s"""concat_ws(',', transform($arrExpr,
          x -> cast(cast(round(cast(x as double)
                               * cast(100000000 as double)) as bigint)
                    as string)))"""

  /** DuckDB twin of [[csvScaled]] — identical double scaling + round,
    * rendered with the same comma separator. */
  def dCsvScaled(arrExpr: String): String =
    s"""array_to_string(list_transform($arrExpr,
          x -> CAST(CAST(round(CAST(x AS DOUBLE)
                               * CAST(100000000 AS DOUBLE)) AS BIGINT)
                    AS VARCHAR)), ',')"""

  /** ±1 from the parity of the first md5 hex nibble of `tag` — the
    * deterministic, engine-portable pseudo-random sign used for LSH
    * planes ("t_p_d" tags) and IVF centroids ("c_<c>_<d>" tags). The
    * oracle recomputes the identical value with SQL md5 + strpos. */
  def mdParitySign(tag: String): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(tag.getBytes("UTF-8"))
    if ((((digest(0) >> 4) & 0xf) % 2) == 0) 1.0 else -1.0
  }
}
