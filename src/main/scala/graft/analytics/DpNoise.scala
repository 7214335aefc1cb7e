package graft.analytics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The q157 discrete-Laplace (two-sided geometric) noise sampler —
  * THE shared definition for the batch releases (q157/q159) and the
  * streaming twin ([[graft.streaming.EventStreams.hourlyDpCounts]]),
  * so the engines cannot drift and the mechanism stays cross-engine
  * replayable.
  *
  * Mechanism (Ghosh–Roughgarden–Sundararajan's integer mechanism at
  * ε = ln 2): P(Z = z) = (1/3)·2^{−|z|}. Sampled by pure integer
  * arithmetic from a 60-bit md5 of (secret | release key): u ∈
  * [0, 3·2⁴⁰); u < 2⁴⁰ → 0; else v = u − 2⁴⁰, parity of v is the
  * sign and the leading one-bits of v div 2 (in 40 bits) the
  * magnitude — P(k) = 2^{−k}, leftover mass clamped to 40. No
  * floats, no transcendentals; both engines replay the same bits.
  *
  * '''Secret keying (the r10 advisor's high finding).''' The sampler
  * is a PRF of (secret, key), NEVER of the public release key alone:
  * noise derived from public inputs only is not noise — anyone who
  * knows the mechanism recomputes it and subtracts it from the
  * released value, recovering the exact count. Production callers
  * MUST supply secret key material the release audience cannot know
  * (see [[secretFromConf]]); [[OracleSecret]] is a PUBLISHED constant
  * used ONLY by the DuckDB oracle twins (q157/q159) and the specs,
  * where the goal is verifying the mechanism's arithmetic
  * cross-engine, not an actual privacy guarantee.
  *
  * '''Exactness caveat.''' Reducing a 60-bit draw mod 3·2⁴⁰ is not
  * perfectly uniform: 2⁶⁰ = 349525·(3·2⁴⁰) + 2⁴⁰, so residues in
  * [0, 2⁴⁰) — the z = 0 bucket — occur 349 526 times against 349 525
  * for the rest: P(0) = 349526/(3·349525⅓) ≈ (1/3)(1 + 1.9·10⁻⁶), a
  * ~2⁻¹⁹ relative bias toward zero noise. The within-bucket sampling
  * IS exact; the documented bias is the price of a single md5 draw
  * (rejection resampling would break the static-SQL oracle twin) and
  * is orders of magnitude below any statistical test a release
  * consumer could run at these ε.
  *
  * Seeding remains deliberate (see q157's doc): stable noise per
  * (secret, release key) is the consistent-noise practice of
  * production DP systems — re-running a release must not hand an
  * attacker fresh samples to average; rotating the release epoch
  * (fold it into the key or the secret) re-seeds. */
object DpNoise {

  /** PUBLISHED verification secret — baked into the static DuckDB
    * oracle SQL of q157/q159 so the mechanism's arithmetic is
    * hash-checked cross-engine. By construction it provides NO
    * privacy (it is in the repo); it exists so the verification
    * queries are honest about that instead of pretending a
    * public-key-seeded release is private. */
  val OracleSecret = "graft-oracle-v1"

  /** Production secret resolution: `spark.graft.dp.secret` conf,
    * else the `GRAFT_DP_SECRET` environment variable. Throws rather
    * than silently falling back to the published [[OracleSecret]] —
    * a DP release with guessable key material is a leak, not a
    * default. */
  def secretFromConf(spark: org.apache.spark.sql.SparkSession): String =
    spark.conf.getOption("spark.graft.dp.secret")
      .orElse(sys.env.get("GRAFT_DP_SECRET"))
      .getOrElse(throw new IllegalArgumentException(
        "DP release requires secret key material: set spark.graft.dp.secret " +
          "or GRAFT_DP_SECRET (DpNoise.OracleSecret is for oracle tests only)"))

  /** The noise column for a string release-key column, keyed by
    * `secret` (see the object doc for why the secret is required). */
  def noiseFor(key: Column, secret: String): Column = {
    require(secret.nonEmpty, "DP noise requires non-empty secret key material")
    val h = graft.text.TextQueries.md5Hash60(
      concat(lit(secret + "|dp0|"), key))
    val u = pmod(h, lit(3L << 40))
    val v = u - lit(1L << 40)
    val t = lit((1L << 40) - 1) - shiftright(v, 1)
    val k = when(t === 0, lit(40))
      .otherwise(lit(41) - length(bin(t))).cast("long")
    when(u < lit(1L << 40), lit(0L))
      .otherwise(when(pmod(v, lit(2)) === 0, k).otherwise(-k))
  }

  /** Independent uniform draw on [0, n) for a string release-key
    * column — the LATTICE-SMOOTHING companion to [[noiseFor]] (the
    * r11 advisor's high finding, fixed in q164): a sensitivity-C sum
    * released as `s + C·G` with G the ε-unit draw has noise ≡ 0
    * (mod C), so the release leaks `s mod C` EXACTLY — neighboring
    * datasets whose sums differ by a non-multiple of C have disjoint
    * output supports and the real ε is ∞, not ε. Adding an
    * independent U ~ Uniform[0, C) (centered by the caller) fills the
    * residues: Z = C·G + U decomposes every integer z uniquely as
    * C·g + u with u ∈ [0, C), and a shift |δ| ≤ C moves g by at most
    * 1, so P(Z = z)/P(Z = z + δ) = P(G = g)/P(G = g′) ≤ 2 = e^(ln 2)
    * — the ε = ln 2 guarantee holds for sensitivity C with FULL
    * integer support. The draw is keyed under a distinct domain
    * separator ("dpu0") so it is independent of the [[noiseFor]] bits
    * for the same release key.
    *
    * Exactness caveat (same class as the object doc's): reducing the
    * 60-bit draw mod n is uniform only up to the 2⁶⁰ mod n remainder
    * — at n = 10⁴ the first 6 976 residues occur once extra in 2⁶⁰
    * draws, a ~10⁻¹³ relative bias, far below the [[noiseFor]] bias
    * already documented. */
  def uniformFor(key: Column, secret: String, n: Long): Column = {
    require(secret.nonEmpty, "DP noise requires non-empty secret key material")
    require(n >= 1, "uniform modulus must be positive")
    val h = graft.text.TextQueries.md5Hash60(
      concat(lit(secret + "|dpu0|"), key))
    pmod(h, lit(n))
  }

  /** [[uniformFor]] with a COLUMN modulus — the exponential-mechanism
    * draw (q169): selecting from a weighted candidate list needs
    * U ~ Uniform[0, total_weight) where the total is data-dependent
    * (a per-group column), so the fixed-modulus variant cannot serve.
    * Distinct domain separator ("dpq0") keeps the draw independent of
    * both [[noiseFor]] and [[uniformFor]] for the same release key.
    *
    * Exactness caveat: the mod-n reduction of the 60-bit draw is
    * uniform up to a 2⁶⁰ mod n remainder; q169's totals stay under
    * 2⁴⁷ (101 candidates × 2⁴⁰ max weight), so the relative bias is
    * ≤ 2⁻¹³ — same class as the [[noiseFor]] bias, documented not
    * hidden. Callers must keep n well under 2⁶⁰.
    *
    * Degenerate-modulus contract: `pmod(h, n)` is NULL when n is 0 or
    * NULL (and negative n would flip the range) — there is no column-
    * level guard here because the right behavior is caller-specific.
    * q169 satisfies it by construction: every candidate weight is
    * ≥ 1, so the total-weight modulus is ≥ |candidates| ≥ 1 whenever
    * a candidate row exists at all (and with zero candidates there is
    * no row to draw for). */
  def uniformModFor(key: Column, secret: String, n: Column): Column = {
    require(secret.nonEmpty, "DP noise requires non-empty secret key material")
    val h = graft.text.TextQueries.md5Hash60(
      concat(lit(secret + "|dpq0|"), key))
    pmod(h, n)
  }

  /** Driver-side twin of [[uniformModFor]] for the bounded
    * LocalRelation mechanisms (q169/q173 — candidate frames are ≤ a
    * few hundred rows by their PUBLIC domain, already collected): MD5
    * over the same `secret|dpq0|key` bytes, same 15-hex-char 60-bit
    * prefix, same mod — bit-identical to the Column path (the 60-bit
    * value is non-negative, so `%` ≡ `pmod`). OperatorSpec pins the
    * two equal over random keys/moduli. */
  def uniformModLocal(key: String, secret: String, n: Long): Long = {
    require(secret.nonEmpty, "DP noise requires non-empty secret key material")
    require(n >= 1, "uniform modulus must be positive")
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest((secret + "|dpq0|" + key).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % n
  }

  /** The DuckDB twin of [[uniformModFor]] — `nSql` is a SQL expression
    * for the (positive) modulus column. */
  def duckUniformModSql(keySql: String, nSql: String,
                        secret: String = OracleSecret): String = {
    require(secret.nonEmpty && !secret.contains("'"),
      "secret must be non-empty and quote-free in SQL")
    s"(('0x' || substring(md5('$secret|dpq0|' || ($keySql)), 1, 15))::BIGINT % ($nSql))"
  }

  /** The DuckDB twin of [[uniformFor]] — same published-secret-only
    * contract as [[duckNoiseSql]]. */
  def duckUniformSql(keySql: String, n: Long,
                     secret: String = OracleSecret): String = {
    require(secret.nonEmpty && !secret.contains("'"),
      "secret must be non-empty and quote-free in SQL")
    require(n >= 1, "uniform modulus must be positive")
    s"(('0x' || substring(md5('$secret|dpu0|' || ($keySql)), 1, 15))::BIGINT % $n)"
  }

  /** The DuckDB twin of [[noiseFor]] over a key SQL expression. Only
    * meaningful with a secret the SQL text may contain — i.e. the
    * published [[OracleSecret]] (the default); production releases
    * have no DuckDB twin BY DESIGN (their secret must not appear in
    * any query text an auditor can read back). */
  def duckNoiseSql(keySql: String, secret: String = OracleSecret): String = {
    require(secret.nonEmpty && !secret.contains("'"),
      "secret must be non-empty and quote-free in SQL")
    val seeded = s"md5('$secret|dp0|' || ($keySql))"
    s"""
    (CASE WHEN (('0x' || substring($seeded, 1, 15))::BIGINT
                 % 3298534883328) < 1099511627776 THEN 0
          ELSE (CASE WHEN ((('0x' || substring($seeded, 1, 15))::BIGINT
                            % 3298534883328) - 1099511627776) % 2 = 0
                     THEN 1 ELSE -1 END)
             * (CASE WHEN 1099511627775
                       - (((('0x' || substring($seeded, 1, 15))::BIGINT
                            % 3298534883328) - 1099511627776) // 2) = 0 THEN 40
                     ELSE 41 - length(bin(1099511627775
                       - (((('0x' || substring($seeded, 1, 15))::BIGINT
                            % 3298534883328) - 1099511627776) // 2)))
                END)
     END)"""
  }
}
