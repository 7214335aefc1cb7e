package graft.analytics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The q157 discrete-Laplace (two-sided geometric) noise sampler —
  * THE shared definition for the batch release (q157) and the
  * streaming twin ([[graft.streaming.EventStreams.hourlyDpCounts]]),
  * so the two cannot drift and both stay cross-engine replayable.
  *
  * Mechanism (Ghosh–Roughgarden–Sundararajan's integer mechanism at
  * ε = ln 2): P(Z = z) = (1/3)·2^{−|z|}. Sampled by EXACT integer
  * arithmetic from a 60-bit md5 of the release key: u ∈ [0, 3·2⁴⁰);
  * u < 2⁴⁰ → 0 (mass exactly 1/3); else v = u − 2⁴⁰, parity of v is
  * the sign and the leading one-bits of v div 2 (in 40 bits) the
  * magnitude — P(k) = 2^{−k} exactly, leftover mass clamped to 40.
  * No floats, no transcendentals; both engines replay the same bits.
  *
  * Seeding is deliberate (see q157's doc): stable noise per release
  * key is the consistent-noise practice of production DP systems —
  * re-running a release must not hand an attacker fresh samples to
  * average; rotating the release epoch (fold it into the key)
  * re-seeds. */
object DpNoise {

  /** The noise column for a string release-key column. */
  def noiseFor(key: Column): Column = {
    val h = graft.text.TextQueries.md5Hash60(concat(lit("dp0|"), key))
    val u = pmod(h, lit(3L << 40))
    val v = u - lit(1L << 40)
    val t = lit((1L << 40) - 1) - shiftright(v, 1)
    val k = when(t === 0, lit(40))
      .otherwise(lit(41) - length(bin(t))).cast("long")
    when(u < lit(1L << 40), lit(0L))
      .otherwise(when(pmod(v, lit(2)) === 0, k).otherwise(-k))
  }

  /** The DuckDB twin of [[noiseFor]] over a key SQL expression. */
  def duckNoiseSql(keySql: String): String = s"""
    (CASE WHEN (('0x' || substring(md5('dp0|' || ($keySql)), 1, 15))::BIGINT
                 % 3298534883328) < 1099511627776 THEN 0
          ELSE (CASE WHEN ((('0x' || substring(md5('dp0|' || ($keySql)), 1, 15))::BIGINT
                            % 3298534883328) - 1099511627776) % 2 = 0
                     THEN 1 ELSE -1 END)
             * (CASE WHEN 1099511627775
                       - (((('0x' || substring(md5('dp0|' || ($keySql)), 1, 15))::BIGINT
                            % 3298534883328) - 1099511627776) // 2) = 0 THEN 40
                     ELSE 41 - length(bin(1099511627775
                       - (((('0x' || substring(md5('dp0|' || ($keySql)), 1, 15))::BIGINT
                            % 3298534883328) - 1099511627776) // 2)))
                END)
     END)"""
}
