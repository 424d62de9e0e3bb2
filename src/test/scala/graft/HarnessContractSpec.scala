package graft

/**
 * Driver-contract drift guard: the correctness gate hash-compares every
 * `SparkEntry.queries` entry that has an `oracleSql` row and records a
 * weaker rows-only check otherwise. A query added without an oracle
 * silently downgrades its own verification — this spec makes that a
 * loud, reviewed decision instead.
 */
class HarnessContractSpec extends SparkTestBase {

  /** Queries that are rows-only BY NATURE, each with the reason. */
  private val rowsOnly: Map[String, String] = Map(
    // ml_train_predict and ml_train_dart moved OFF this list in r16:
    // their outputs are now 2-round depth-1 closed-form replays (full
    // DuckDB oracles — gbtree margin advancement and deterministic
    // rateDrop=1.0 DART drop+normalize respectively); the 10-round
    // depth-4 separation pins still run in-query
    // ml_softprob moved OFF this list in r16: output is a 2-round
    // softmax replay (full oracle); accuracy pin still runs in-query
    // ml_rank moved OFF this list in r16: output is a 2-round pairwise
    // ranker replay (full oracle); the AUC >= 0.95 pin runs in-query
    // sim_ivf_topk moved OFF this list in r17: the harness query now
    // runs the deterministic IVF-Flat (X60 — quantized-BIGINT k-means
    // cells + exact cosine in probed cells), which DuckDB replays
    // end-to-end; recall stays gated via sim_recall_check's ivfflat row
    // sim_pq_topk moved OFF this list in r18: the ADC tables are now
    // quantized BIGINTs (the same fixed-point sums the assignment
    // argmin uses), so the whole train → ADC shortlist → exact-cosine
    // re-rank pipeline replays in DuckDB (simPqTopkOracle); recall
    // stays gated via sim_recall_check's pq row
    // sim_lsh_topk moved OFF this list in r18: the plane normals are
    // dyadic rationals frozen into the SQL as literals, and both the
    // signature dots and the candidate cosine re-rank are the same
    // two-operand double sequences in both engines (simLshTopkOracle)
    // — no approximation gap remains to excuse
    // tx_bpe moved OFF this list in r20, renamed tx_bpe_encode: the
    // output is now the corpus encoded under the FIXED BpeFixedMerges
    // table, which DuckDB replays exactly (recursive CTE re-running
    // the greedy lowest-rank merge loop per distinct word) — full
    // rows+schema+hash oracle. The inherently-sequential merge
    // LEARNING keeps its in-query pins (non-empty table + decode∘
    // encode lossless round-trip over ALL docs under the learned
    // table) plus BpeSpec's worked-example goldens.
    "sim_recall_check" -> "the recall gate itself (self-referential)")

  test("every query is oracle-paired or on the declared rows-only list") {
    val queries = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    val unpaired = queries -- oracles -- rowsOnly.keySet
    assert(unpaired.isEmpty,
      s"queries without an oracle and without a declared rows-only " +
        s"reason: $unpaired — add oracleSql or document why not")
    val stale = (oracles -- queries) ++ (rowsOnly.keySet -- queries)
    assert(stale.isEmpty,
      s"oracle/rows-only entries with no matching query: $stale")
    val overlapped = oracles.intersect(rowsOnly.keySet)
    assert(overlapped.isEmpty,
      s"declared rows-only but an oracle exists: $overlapped")
  }

  test("oracle SQL only references the driver-provided tables") {
    // the driver registers exactly the testdata tables as DuckDB views;
    // a typo'd table name would fail only at gate time, rounds later
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val fromRe = "(?i)(?:from|join)\\s+([a-z_][a-z0-9_]*)".r
    for ((name, sql) <- SparkEntry.oracleSql) {
      val cteNames = "(?i)([a-z_][a-z0-9_]*)\\s+as\\s*\\(".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val refs = fromRe.findAllMatchIn(sql).map(_.group(1).toLowerCase)
        .filterNot(cteNames)
        .filterNot(Set("range", "unnest", "read_parquet", "values"))
        .toSet
      val unknown = refs -- tables
      assert(unknown.isEmpty,
        s"$name references unknown tables: $unknown")
    }
  }
}
