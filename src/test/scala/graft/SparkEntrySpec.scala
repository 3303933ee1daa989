package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: the smoke entry returns rows, every oracle
  * key has a query, and names are unique across registries.
  */
class SparkEntrySpec extends AnyFunSuite with SparkSpec {

  test("entry() flagship returns rows at sf0.001 (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching queries entry") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("registry sizes: every query carries an oracle") {
    assert(SparkEntry.queries.size === 211)
    // r8: a09 gained a tolerance oracle (within_3sd boolean vs DuckDB's
    // literal TRUE + exact counts), closing the last rows-only entry.
    // r9: d17 incremental dedup, s16 prototypicality prune, t20 domain
    // blocklist, d18 incremental near-dup, t21 temperature mix, t22 bigram xent, d19 substring stats — all oracled on arrival
    // r10: d20 ingest triage (d17∘d18 composition), t23 interpolated-
    // backoff LM, t24 trigram LM, d16s sampled LSH sweep, s17 approx
    // prototype prune, d21 source cap, t25 CCNet buckets, t26 DSIR
    // resampling, s18 matryoshka recall, s19 PQ-ADC recall, m04 audio profile, d22 quality-canonical, t27 data card — all oracled on arrival
    // r10 session 3: d23 URL-canonicalization dedup, s20 sign-quant
    // Hamming recall, t28 BPE pair stats, m05 motion profile, s21 IVF-PQ
    // composed recall, t29 C4 line filters — all oracled on arrival
    // + d24 bloom-pruned incremental dedup (exact d17 answer, pruned plan)
    // r10 session 6: m11 audio duplicate clusters (banded print +
    // full-series verify + CC), t36 per-source leakage attribution, s27 IVF-PQ-with-refine recall, t37 4-gram LM, m12 audio dup histogram — oracled on arrival
    // r11: d29 substring cut, t40 full BPE train, t41 BPE tokenize,
    // t42 winnowing fingerprints, t43 strided chunk windows, d30 MOSS
    // winnow copy pairs, d31 winnow match spans, s28 chunk retrieval, s29 LSH recall, s30 multi-probe —
    // all oracled + fixture-gated on arrival
    // r13: s34 banded sign-LSH recall, s35 banded top-k executed, s36
    // band-geometry sweep, t46 blocked BPE apply at 32 rounds, t47
    // decontamination cut, s37 wide-key recall audit — oracled +
    // fixture-gated on arrival
    // r15: s43 bitext forward leg at the wide dial — oracled on arrival
    // r16: s40s/s41s sampled bitext audit rungs (the d16s move — cheap
    // per-session gate rows for the saturating 8-bit dials) — oracled
    // on arrival
    assert(SparkEntry.oracleSql.size === 211)
    assert(SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet ===
      Set.empty[String])
  }
}
