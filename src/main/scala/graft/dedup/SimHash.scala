package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate fingerprinting with banded Hamming joins.
  *
  * A document's simhash is a `bits`-wide signature: bit j is set iff the
  * majority of token hashes have bit j set (each token votes ±1 per bit).
  * Near-duplicates differ in few tokens → few flipped majority votes →
  * small Hamming distance.
  *
  * Candidate generation uses the pigeonhole chunk trick: split the
  * signature into `maxDist + 1` chunks; any pair within Hamming distance
  * `maxDist` must agree on at least one whole chunk, so an equi-join on
  * (chunk_idx, chunk_value) has perfect recall — no cross join. At 100 TB
  * use 64-bit signatures with 16-bit chunks so buckets stay small; here the
  * cross-engine-reproducible hash is 48-bit (12 md5 hex chars, positive in
  * both Spark's and DuckDB's signed BIGINT).
  */
object SimHash {

  val DefaultBits = 48

  /** 48-bit deterministic token hash: md5 hex prefix, cross-engine equal
    * to DuckDB `('0x' || substr(md5(t), 1, 12))::BIGINT`. */
  def tokenHash48(t: Column): Column =
    conv(substring(md5(t), 1, 12), 16, 10).cast("long")

  /** SimHash over a token array column (multiplicity-weighted votes). */
  def simhash(toks: Column, bits: Int = DefaultBits): Column = {
    val hs = transform(toks, t => tokenHash48(t))
    // one pass: fold token hashes into a per-bit vote vector
    val votes = aggregate(hs, array_repeat(lit(0L), bits),
      (acc, h) => zip_with(acc,
        array((0 until bits).map(j => shiftright(h, j).bitwiseAND(lit(1L)) * 2 - 1): _*),
        (a, b) => a + b))
    val powers = array((0 until bits).map(j => lit(1L << j)): _*)
    aggregate(zip_with(votes, powers, (v, p) => when(v > 0, p).otherwise(lit(0L))),
      lit(0L), (a, b) => a + b)
  }

  /** Hamming distance between two signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Bulk simhash as a DataFrame op: ONE scan-side kernel call per row
    * (`expressions.SimHash48` — bit-exact with the SQL formulation),
    * replacing the earlier explode + `bits` vote-sum aggregation whose
    * shuffle this eliminates (and which itself replaced the interpreted
    * per-row array fold, ~3× slower again). Docs with zero tokens get
    * signature 0 (every majority vote fails) — the aggregated form
    * dropped them entirely; token-producing pipelines never emit empty
    * arrays (`TextOps.tokens` of empty text is `[]` only for empty
    * docs, which exact-dedup removes first). */
  def simhashDF(docs: DataFrame, idCol: String, toksCol: Column,
                bits: Int = DefaultBits): DataFrame =
    docs.select(col(idCol),
      graft.expressions.SimHash48.simhash48(toksCol, bits).as("simhash"))

  /** Pairs (a < b) within `maxDist` Hamming distance, via chunk-banded
    * equi-join (exact recall by pigeonhole: chunks = maxDist + 1). */
  def hammingPairs(docs: DataFrame, idCol: String, simCol: String,
                   maxDist: Int, bits: Int = DefaultBits): DataFrame = {
    val chunks = maxDist + 1
    val chunkBits = bits / chunks
    val mask = (1L << chunkBits) - 1
    val chunkArr = array((0 until chunks).map { c =>
      struct(lit(c).as("chunk"),
        shiftright(col(simCol), c * chunkBits).bitwiseAND(lit(mask)).as("cv"))
    }: _*)
    // Materialize the (possibly expensive) simhash column behind an
    // exchange before exploding chunks: (a) projection collapse cannot
    // inline its computation into the per-chunk structs, and (b) the two
    // self-join branches below become identical subplans ending in the
    // same shuffle, which ReuseExchange evaluates once.
    val exploded = docs
      .select(col(idCol), col(simCol))
      .repartition(col(idCol))
      .select(col(idCol), col(simCol), explode(chunkArr).as("ck"))
      .select(col(idCol), col(simCol), col("ck.chunk").as("chunk"), col("ck.cv").as("cv"))
      .repartition(col("chunk"), col("cv"))
    val l = exploded.toDF("a", "sim_a", "chunk", "cv")
    val r = exploded.toDF("b", "sim_b", "chunk", "cv")
    l.join(r, Seq("chunk", "cv"))
      .filter(col("a") < col("b"))
      .select("a", "b", "sim_a", "sim_b")
      .distinct()
      .withColumn("hamming", hamming(col("sim_a"), col("sim_b")))
      .filter(col("hamming") <= maxDist)
  }
}
