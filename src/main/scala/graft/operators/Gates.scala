package graft.operators

/** Shared byte-size gate for explicit `broadcast()` / `hint` decisions
  * (r18 verdict #9): a row-COUNT ceiling alone (e.g. 10M rows) can admit
  * a multi-GB broadcast on wide payloads, and a fixed constant ignores
  * the session's own `spark.sql.autoBroadcastJoinThreshold`. Every
  * operator that force-broadcasts a side it has an EXACT count for
  * derives the decision here: rows × estimated in-memory bytes/row must
  * fit the session threshold. `bytesPerRow` is the caller's estimate of
  * the built hash-relation row (data + object overhead), deliberately
  * coarse — the gate exists to bound the broadcast in BYTES at any
  * scale, not to win borderline cases.
  */
private[graft] object Gates {

  /** True iff `rows` rows at ~`bytesPerRow` bytes fit the session's
    * autoBroadcastJoinThreshold (false when broadcasting is disabled
    * with -1, or the threshold is 0).
    */
  def fitsAutoBroadcast(rows: Long, bytesPerRow: Long): Boolean = {
    val thr = org.apache.spark.sql.internal.SQLConf.get
      .autoBroadcastJoinThreshold
    thr > 0 && rows >= 0 && rows <= thr / math.max(1L, bytesPerRow)
  }
}
