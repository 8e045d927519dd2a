package graft.queries

/** Generated DuckDB oracle SQL for the unigram-LM tokenizer entries
  * (q95/q96) — the q65 unroll discipline applied to Viterbi-EM: seed
  * counts, then per EM iteration a POSITION-UNROLLED Viterbi DP (the
  * fixture's words are <= [[WordLenBound]] chars; the engine kernel is
  * general), backtrace, piece counts, and the add-one probability
  * update — every score an IEEE double product, never a log
  * (`+ * /` are correctly-rounded and bit-identical across engines;
  * ln/exp are libm-dependent).
  *
  * Tie-breaks mirror the kernel exactly: candidate j ascending, a
  * branch wins when its score is `>=` every other candidate — the
  * smallest j (longest last piece) takes ties. Lateral column aliases
  * are avoided (every derived column gets its own CTE) for maximum
  * dialect safety.
  */
private[queries] object UnigramSql {

  val MaxPieceLen = 4
  val SeedMulti = 40
  val EmIters = 2
  /** Fixture word-length bound the DP unroll covers (max observed 8). */
  val WordLenBound = 8

  private val duckToks =
    raw"""list_filter(string_split_regex(text, '\s+'), t -> t != '')"""

  /** w + seed + iteration-0 probability CTE chain. */
  private def header: String = {
    val multiSelects = (2 to MaxPieceLen).map { l =>
      s"""SELECT freq, unnest([substr(word, i, $l) for i in range(1, length(word) - ${l - 1} + 1)]) AS piece
         |   FROM w WHERE length(word) >= $l""".stripMargin
    }.mkString("\n   UNION ALL ")
    s"""WITH w AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
       |    SELECT unnest($duckToks) AS word FROM documents) GROUP BY 1),
       |chars AS (
       |  SELECT piece, CAST(sum(freq) AS BIGINT) AS c FROM (
       |    SELECT freq, unnest([substr(word, i, 1) for i in range(1, length(word) + 1)]) AS piece FROM w)
       |  GROUP BY 1),
       |multiraw AS (
       |  SELECT piece, CAST(sum(freq) AS BIGINT) AS c FROM (
       |   $multiSelects)
       |  GROUP BY 1),
       |topmulti AS (SELECT piece, c FROM multiraw ORDER BY c DESC, piece LIMIT $SeedMulti),
       |c0 AS MATERIALIZED (SELECT piece, c FROM chars UNION ALL SELECT piece, c FROM topmulti),
       |vocab AS MATERIALIZED (SELECT piece FROM c0),
       |t0 AS MATERIALIZED (SELECT sum(c) AS t, count(*) AS v FROM c0),
       |p0 AS MATERIALIZED (SELECT piece, CAST(c + 1 AS DOUBLE) / CAST(t + v AS DOUBLE) AS p FROM c0, t0),
       |u0 AS MATERIALIZED (SELECT CAST(1 AS DOUBLE) / CAST(t + v AS DOUBLE) AS unk FROM t0)""".stripMargin
  }

  /** One position-unrolled Viterbi pass `k` against p{k-1}/u{k-1},
    * ending in `bt$k` (dp scores s1..sW, backtrace columns t1..tW). */
  private def viterbi(k: Int): String = {
    val p = s"p${k - 1}"
    val u = s"u${k - 1}"
    val sb = new StringBuilder
    sb ++= s"v${k}z0 AS (SELECT word, freq, length(word) AS len, CAST(1.0 AS DOUBLE) AS s0 FROM w)"
    for (i <- 1 to WordLenBound) {
      val js = math.max(0, i - MaxPieceLen) until i
      val cands = js.map { j =>
        val fallback = if (i - j == 1) s"(SELECT unk FROM $u)" else "NULL"
        s"CASE WHEN len >= $i THEN s$j * coalesce((SELECT p FROM $p WHERE piece = substr(word, ${j + 1}, ${i - j})), $fallback) ELSE NULL END AS c${i}_$j"
      }
      sb ++= s",\nv${k}x$i AS (SELECT *, ${cands.mkString(", ")} FROM v${k}z${i - 1})"
      val branches = js.map { j =>
        val checks = (s"c${i}_$j IS NOT NULL" +:
          js.filter(_ != j).map(o => s"(c${i}_$o IS NULL OR c${i}_$j >= c${i}_$o)"))
        s"WHEN ${checks.mkString(" AND ")} THEN $j"
      }
      sb ++= s",\nv${k}y$i AS (SELECT *, CASE ${branches.mkString(" ")} END AS b$i FROM v${k}x$i)"
      val sCase = js.map(j => s"WHEN $j THEN c${i}_$j").mkString(" ")
      sb ++= s",\nv${k}z$i AS (SELECT *, CASE b$i $sCase END AS s$i FROM v${k}y$i)"
    }
    // Backtrace: t1 = bp[len], t_m = bp[t_{m-1}] (0 terminates -> NULL).
    def bAt(x: String): String =
      s"CASE $x ${(1 to WordLenBound).map(i => s"WHEN $i THEN b$i").mkString(" ")} END"
    sb ++= s",\nbt${k}_1 AS (SELECT *, ${bAt("len")} AS t1 FROM v${k}z$WordLenBound)"
    for (m <- 2 to WordLenBound)
      sb ++= s",\nbt${k}_$m AS (SELECT *, ${bAt(s"t${m - 1}")} AS t$m FROM bt${k}_${m - 1})"
    sb ++= s",\nbt$k AS MATERIALIZED (SELECT * FROM bt${k}_$WordLenBound)"
    // Piece rows: branch m covers (t_m, t_{m-1}] with t_0 = len.
    val branches = (1 to WordLenBound).map { m =>
      val prev = if (m == 1) "len" else s"t${m - 1}"
      val guard = if (m == 1) "" else s" WHERE t${m - 1} > 0"
      s"SELECT word, freq, t$m AS st, substr(word, t$m + 1, $prev - t$m) AS piece FROM bt$k$guard"
    }
    sb ++= s",\npieces$k AS (\n  ${branches.mkString("\n  UNION ALL ")})"
    sb.toString
  }

  /** E-step counts + M-step probabilities after pass `k`. */
  private def mStep(k: Int): String =
    s"""cnt$k AS MATERIALIZED (SELECT piece, sum(freq) AS fc FROM pieces$k GROUP BY 1),
       |c$k AS MATERIALIZED (SELECT vocab.piece, CAST(coalesce(fc, 0) AS BIGINT) AS c
       |        FROM vocab LEFT JOIN cnt$k USING (piece)),
       |t$k AS MATERIALIZED (SELECT sum(c) AS t, count(*) AS v FROM c$k),
       |p$k AS MATERIALIZED (SELECT piece, CAST(c + 1 AS DOUBLE) / CAST(t + v AS DOUBLE) AS p FROM c$k, t$k),
       |u$k AS MATERIALIZED (SELECT CAST(1 AS DOUBLE) / CAST(t + v AS DOUBLE) AS unk FROM t$k)""".stripMargin

  /** q95: the trained vocabulary artifact after [[EmIters]] EM
    * iterations — (piece, n_uses, prob). */
  def vocabSql: String = {
    val iters = (1 to EmIters).map(k => viterbi(k) + ",\n" + mStep(k))
    s"""$header,
       |${iters.mkString(",\n")}
       |SELECT c$EmIters.piece, c AS n_uses, p AS prob
       |FROM c$EmIters JOIN p$EmIters USING (piece)""".stripMargin
  }

  /** q96: the corpus word segmentation under the final model — one
    * extra Viterbi pass against p$EmIters. */
  def segmentSql: String = {
    val k = EmIters + 1
    val iters = (1 to EmIters).map(j => viterbi(j) + ",\n" + mStep(j))
    val sAt = s"CASE len ${(1 to WordLenBound).map(i => s"WHEN $i THEN s$i").mkString(" ")} END"
    s"""$header,
       |${iters.mkString(",\n")},
       |${viterbi(k)},
       |seg AS (
       |  SELECT word, freq, string_agg(piece, ' ' ORDER BY st) AS segmentation,
       |         CAST(count(*) AS INT) AS n_pieces
       |  FROM pieces$k GROUP BY word, freq),
       |sc AS (SELECT word, $sAt AS score FROM bt$k)
       |SELECT seg.word, seg.freq, seg.segmentation, seg.n_pieces, sc.score
       |FROM seg JOIN sc ON seg.word = sc.word""".stripMargin
  }
}
