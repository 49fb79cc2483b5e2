"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every oracle-checkable operator of the engine
(SURVEY.md §2 crawl operators expressed over a deterministic frontier
derived from the ``events`` table, plus the training-data pipeline ops over
``documents``/``embeddings``); ``oracle_sql()`` holds the equivalent DuckDB
SQL. Crawl semantics that need the simulated web (bit-for-bit ordering,
seen-set, shipped text) are golden-tested in tests/test_crawl_e2e.py
against the reference simulator and exposed here as rows-only checks.

Outputs of oracle-checked queries are integers/strings/booleans only —
cross-engine float summation order is never allowed to affect a value.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ideacrawler_spark.functions.urlnorm import canonicalize_udf
from ideacrawler_spark.operators.admission import admit_budget
from ideacrawler_spark.operators.dedup import anti_join_seen, first_occurrence
from ideacrawler_spark.operators.rank import global_rank
from ideacrawler_spark.textops.analysis import (
    fingerprint,
    langid_ngram,
    quality_score,
    token_count,
)
from ideacrawler_spark.textops.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from ideacrawler_spark.textops.hashing import MINHASH_A, MINHASH_B, P31, h60
from ideacrawler_spark.textops.similarity import (
    cosine_topk_bruteforce,
    lsh_buckets,
    lsh_topk,
)

# --------------------------------------------------------------------------
# shared derivations
# --------------------------------------------------------------------------


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic frontier derived from events: 7 hosts,
    depth = event_id % 4, discovery seq = event_id."""
    ev = _load(spark, sf_dir, "events")
    k = (F.col("user_id") % 7).cast("string")
    return ev.select(
        F.concat(F.lit("host"), k, F.lit(".example")).alias("host"),
        F.concat(
            F.lit("http://host"), k, F.lit(".example/p/"),
            F.col("event_id").cast("string"),
        ).alias("url"),
        (F.col("event_id") % 4).cast("int").alias("depth"),
        F.col("event_id").alias("seq"),
        "event_type", "props", "user_id", "event_id",
    )


_FRONTIER_SQL = """
SELECT 'host' || (user_id % 7) || '.example' AS host,
       'http://host' || (user_id % 7) || '.example/p/' || event_id AS url,
       CAST(event_id % 4 AS INT) AS depth,
       event_id AS seq,
       event_type, props, user_id, event_id
FROM events
"""

_H60 = "(('0x' || substring(md5({x}), 1, 15))::BIGINT)"


def _h60_sql(x: str) -> str:
    return _H60.format(x=x)


_SHINGLES_SQL = """
words AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
shingle_lists AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 3
              THEN list_transform(range(1, len(w) - 1),
                                  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
              ELSE [text] END AS shingles
  FROM words),
sh AS (
  SELECT DISTINCT doc_id,
         ({h} % 2147483647) AS sh
  FROM shingle_lists, unnest(shingles) AS t(s))
""".format(h=_h60_sql("s"))

_PERMS_SQL = "perms(j, a, b) AS (VALUES " + ", ".join(
    f"({j}, {a}, {b})" for j, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
) + ")"

_QUANT_SQL = (
    "emb AS (SELECT vec_id, list_transform(embedding, "
    "x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS q FROM embeddings)"
)

# DuckDB types bare list_sum over BIGINT[] as HUGEINT (int128); Spark emits
# BIGINT. Cast at the source so every dot_q output column hashes identically.
_DOTQ_SQL = (
    "(list_sum(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i])))"
    "::BIGINT"
)
_DISTQ_SQL = (
    "list_sum(list_transform(range(1, len({a}) + 1), "
    "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
)


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------


def q_crawl_order(spark, sf_dir):
    """Deterministic crawl-order linearization (SURVEY §2.5) via the
    scalable global_rank operator (no single-partition window)."""
    fr = _frontier(spark, sf_dir)
    return global_rank(fr, ["depth", "seq"], out_col="fetch_seq").select(
        "fetch_seq", "url", "host", "depth"
    )


def q_budget_admit(spark, sf_dir):
    """Politeness budget admission (P2): first 25 per host by (depth, seq)."""
    fr = _frontier(spark, sf_dir)
    admitted, _ = admit_budget(fr, F.lit(25), global_budget=1 << 40)
    return admitted.select("host", "url", "depth", "seq")


def q_budget_robots(spark, sf_dir):
    """Full politeness budget (P2+P3): per-host budget derived from a
    robots crawl-delay dim (host k ⇒ delay k%5, 0 ⇒ job delay 5s;
    round=30s, threads=2): budget = max(1, 30 // delay) * 2."""
    fr = _frontier(spark, sf_dir)
    delays = fr.select("host").distinct().withColumn(
        "crawl_delay",
        (F.substring(F.col("host"), 5, 1).cast("int") % 5).cast("double"),
    )
    joined = fr.join(F.broadcast(delays), "host")
    delay = F.when(F.col("crawl_delay") > 0, F.col("crawl_delay")).otherwise(F.lit(5.0))
    budget = F.greatest(F.lit(1), F.floor(F.lit(30.0) / delay)) * 2
    admitted, _ = admit_budget(joined, budget)  # crawl_delay rides along
    return admitted.select("host", "url", "depth", "seq")


def q_seen_antijoin(spark, sf_dir):
    """URL-seen dedup (D1 cross-round): anti-join against the seen table."""
    fr = _frontier(spark, sf_dir)
    seen = fr.filter(F.col("event_type") == "click").select(
        F.col("url").alias("key")
    )
    return anti_join_seen(fr, seen, key="url").select("url", "depth", "seq")


def q_first_occurrence(spark, sf_dir):
    """In-round first-occurrence dedup (D1 within-round)."""
    fr = _frontier(spark, sf_dir).select(
        F.concat(
            F.lit("http://h/p/"), (F.col("event_id") % 497).cast("string")
        ).alias("url_norm"),
        F.col("depth").alias("parent_depth"),
        F.col("seq").alias("parent_seq"),
        F.lit(0).alias("link_pos"),
    )
    return first_occurrence(fr).select(
        "url_norm",
        F.col("parent_depth").alias("depth"),
        F.col("parent_seq").alias("seq"),
    )


def q_crawl_metrics(spark, sf_dir):
    """Per-partition lineage metrics (D3)."""
    fr = _frontier(spark, sf_dir)
    return fr.groupBy("host").agg(
        F.count("*").alias("fetched"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("errors"),
        F.countDistinct("depth").alias("n_depths"),
        F.min("seq").alias("first_seq"),
        F.max("seq").alias("last_seq"),
    )


def q_eligibility(spark, sf_dir):
    """Enqueue eligibility boolean algebra (F3): (cb_url ∧ cb_anchor) ∨ follow."""
    fr = _frontier(spark, sf_dir)
    cb_url, cb_anchor, follow = r"p/[0-9]*[02468]$", r'"k": *1[0-9]', r"p/9"
    req = F.col("url").rlike(cb_url) & F.col("props").rlike(cb_anchor)
    fol = F.col("url").rlike(follow)
    return fr.filter(req | fol).select("url", "props")


def q_outlink_sets(spark, sf_dir):
    """Per-page outlink set (D2/S8): sorted distinct collect."""
    fr = _frontier(spark, sf_dir)
    return fr.groupBy("user_id").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias("types_csv"),
        F.countDistinct("event_type").alias("n_types"),
    )


def q_canonicalize(spark, sf_dir):
    """URL canonicalization UDF (F2) on four messy-URL shapes."""
    fr = _frontier(spark, sf_dir)
    k = (F.col("user_id") % 7).cast("string")
    i = F.col("event_id").cast("string")
    v = F.col("event_id") % 4
    messy = (
        F.when(v == 0, F.concat(F.lit("HTTP://Host"), k, F.lit(".Example:80/p/"), i))
        .when(v == 1, F.concat(F.lit("http://host"), k, F.lit(".example/p/"), i, F.lit("?")))
        .when(v == 2, F.concat(F.lit("http://host"), k, F.lit(".example/p/%34%32/"), i))
        .otherwise(F.concat(F.lit("http://host"), k, F.lit(".example/a/../p/"), i))
    )
    return fr.select("event_id", messy.alias("messy")).withColumn(
        "url_norm", canonicalize_udf()(F.col("messy"))
    ).select("event_id", "url_norm")


def q_resolve(spark, sf_dir):
    """href resolution against the page URL (F1, job.go:821 — RFC 3986):
    four href shapes resolved from a two-segment base."""
    from ideacrawler_spark.functions.urlnorm import resolve_canon_udf

    fr = _frontier(spark, sf_dir)
    i = F.col("event_id").cast("string")
    base = F.concat(F.lit("http://"), F.col("host"), F.lit("/a/b/c"))
    v = F.col("event_id") % 4
    href = (
        F.when(v == 0, F.concat(F.lit("../x/"), i))        # dot segments
        .when(v == 1, F.concat(F.lit("/y/"), i))           # absolute path
        .when(v == 2, F.concat(F.lit("z/"), i))            # relative
        .otherwise(F.concat(F.lit("//other.example/"), i)) # scheme-relative
    )
    res = fr.select(
        "event_id",
        resolve_canon_udf()(base, href).alias("_r"),
    )
    return res.select(
        "event_id",
        F.col("_r.url_norm").alias("url_norm"),
        F.col("_r.host").alias("host"),
    )


def q_host_shard(spark, sf_dir):
    """Host-hash partition assignment (P1) with the portable h60 hash."""
    fr = _frontier(spark, sf_dir)
    return fr.groupBy(
        "host", (h60(F.col("host")) % 32).alias("shard")
    ).agg(F.count("*").alias("n"))


# ---- training-data ops ----------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    return exact_dedup(_load(spark, sf_dir, "documents"))


def q_minhash_signatures(spark, sf_dir):
    return minhash_signatures(_load(spark, sf_dir, "documents"))


def q_minhash_lsh_pairs(spark, sf_dir):
    # bucket_cap bounds a boilerplate mega-bucket's self-join at C(64,2)
    return minhash_lsh_pairs(_load(spark, sf_dir, "documents"), bucket_cap=64)


def q_simhash(spark, sf_dir):
    return simhash(_load(spark, sf_dir, "documents"))


def q_ngram_jaccard(spark, sf_dir):
    return ngram_jaccard_pairs(_load(spark, sf_dir, "documents"))


def q_embedding_topk(spark, sf_dir):
    return cosine_topk_bruteforce(_load(spark, sf_dir, "embeddings"))


def q_ivf_train(spark, sf_dir):
    """Lloyd-iteration IVF training (2 iterations, all-integer) — the
    iterative-algorithm class, fully oracle-checked."""
    from ideacrawler_spark.textops.similarity import ivf_train

    return ivf_train(_load(spark, sf_dir, "embeddings"), iters=2)


def _ivf_train_oracle_sql(n_cells: int = 8, iters: int = 2,
                          dim: int = 64) -> str:
    dist = _DISTQ_SQL
    parts = [f"WITH {_QUANT_SQL},",
             f"c0 AS (SELECT vec_id AS cell, q AS cq FROM emb "
             f"WHERE vec_id < {n_cells})"]
    for it in range(1, iters + 1):
        prev = f"c{it - 1}"
        parts.append(f""",
            a{it} AS (
              SELECT vec_id, q, cell FROM (
                SELECT e.vec_id, e.q, c.cell,
                       {dist.format(a='e.q', b='c.cq')} AS d
                FROM emb e CROSS JOIN {prev} c)
              QUALIFY row_number() OVER (PARTITION BY vec_id
                                         ORDER BY d, cell) = 1),
            m{it} AS (
              -- Spark div() TRUNCATES toward zero; DuckDB // FLOORS —
              -- they differ on negative sums, so truncate explicitly
              SELECT a.cell, (i - 1)::INT AS dim,
                     (CASE WHEN sum(a.q[i]) < 0
                           THEN -((-sum(a.q[i])) // count(*))
                           ELSE sum(a.q[i]) // count(*) END)::BIGINT AS c
              FROM a{it} a, range(1, {dim + 1}) t(i)
              GROUP BY a.cell, i - 1),
            c{it} AS (
              SELECT cell, list(c ORDER BY dim) AS cq
              FROM m{it} GROUP BY cell)""")
    parts.append(f" SELECT cell, dim, c FROM m{iters}")
    return "".join(parts)


def _pagerank_ctes(n_iter: int = 6, scale: int = 1_000_000,
                   damping: tuple = (85, 100), seeds: tuple = None) -> str:
    """CTE chain (no WITH keyword) rebuilding the unrolled integer
    fixed-point PageRank (operators/graph.py), ending at r{n_iter}:
    r'(v) = base(v) + (d_num * sum in-contribs) // d_den, contrib =
    r(u) // outdeg(u). With ``seeds``, base and initial mass go only to
    the seed nodes (TrustRank). All values non-negative BIGINTs so
    DuckDB // equals Spark div; sums cast ::BIGINT to kill HUGEINT."""
    d_num, d_den = damping
    base = (d_den - d_num) * scale // d_den
    if seeds is None:
        nb = f"""nb AS (SELECT node, {base}::BIGINT AS b FROM nodes),
        r0 AS (SELECT node, {scale}::BIGINT AS pr FROM nodes)"""
    else:
        seed_rows = ", ".join(f"('{s}')" for s in seeds)
        nb = f"""seeds(node) AS (VALUES {seed_rows}),
        nb AS (SELECT n.node,
                      (CASE WHEN s.node IS NOT NULL THEN {base}
                            ELSE 0 END)::BIGINT AS b
               FROM nodes n LEFT JOIN seeds s ON n.node = s.node),
        r0 AS (SELECT node,
                      (CASE WHEN b > 0 THEN {scale} ELSE 0 END)::BIGINT
                        AS pr
               FROM nb)"""
    parts = [f"""{_EDGES_SQL},
        od AS (SELECT src, count(*)::BIGINT AS od FROM edges GROUP BY src),
        nodes AS (SELECT src AS node FROM edges
                  UNION SELECT dst FROM edges),
        {nb}"""]
    for it in range(1, n_iter + 1):
        parts.append(f""",
        r{it} AS (
          SELECT n.node,
                 (n.b + ({d_num} * coalesce(s.s, 0)) // {d_den})::BIGINT
                   AS pr
          FROM nb n LEFT JOIN (
            SELECT e.dst AS node, sum(r.pr // o.od)::BIGINT AS s
            FROM edges e
            JOIN r{it - 1} r ON e.src = r.node
            JOIN od o ON e.src = o.src
            GROUP BY e.dst) s ON n.node = s.node)""")
    return "".join(parts)


def _pagerank_oracle_sql(n_iter: int = 6) -> str:
    return (f"WITH {_pagerank_ctes(n_iter)} "
            f"SELECT node, pr FROM r{n_iter}")


def _hits_oracle_sql(n_iter: int = 4, scale: int = 1000) -> str:
    """Unrolled integer HITS (operators/graph.py:hits): per iteration
    an authority half-step then a hub half-step, each max-normalized by
    integer division (greatest(max,1) guard). Non-negative BIGINTs
    throughout, sums cast ::BIGINT."""
    parts = [f"""WITH {_EDGES_SQL},
        nodes AS (SELECT src AS node FROM edges
                  UNION SELECT dst FROM edges),
        h0 AS (SELECT node, {scale}::BIGINT AS h FROM nodes)"""]
    for it in range(1, n_iter + 1):
        parts.append(f""",
        a{it}raw AS (
          SELECT e.dst AS node, sum(h.h)::BIGINT AS r
          FROM edges e JOIN h{it - 1} h ON e.src = h.node
          GROUP BY e.dst),
        a{it}m AS (SELECT greatest(max(r), 1)::BIGINT AS m FROM a{it}raw),
        a{it} AS (
          SELECT n.node,
                 ((coalesce(r.r, 0) * {scale}) // m.m)::BIGINT AS a
          FROM nodes n LEFT JOIN a{it}raw r ON n.node = r.node
          CROSS JOIN a{it}m m),
        h{it}raw AS (
          SELECT e.src AS node, sum(a.a)::BIGINT AS r
          FROM edges e JOIN a{it} a ON e.dst = a.node
          GROUP BY e.src),
        h{it}m AS (SELECT greatest(max(r), 1)::BIGINT AS m FROM h{it}raw),
        h{it} AS (
          SELECT n.node,
                 ((coalesce(r.r, 0) * {scale}) // m.m)::BIGINT AS h
          FROM nodes n LEFT JOIN h{it}raw r ON n.node = r.node
          CROSS JOIN h{it}m m)""")
    parts.append(f"""
        SELECT n.node,
               coalesce(a.a, 0)::BIGINT AS auth,
               coalesce(h.h, 0)::BIGINT AS hub
        FROM nodes n
        LEFT JOIN a{n_iter} a ON n.node = a.node
        LEFT JOIN h{n_iter} h ON n.node = h.node""")
    return "".join(parts)


TRUST_SEEDS = tuple(f"host{i}.example" for i in range(0, 50, 10))


def _trustrank_oracle_sql(n_iter: int = 6) -> str:
    return (f"WITH {_pagerank_ctes(n_iter, seeds=TRUST_SEEDS)} "
            f"SELECT node, pr FROM r{n_iter}")


def _frontier_prioritized_oracle_sql(n_iter: int = 6,
                                     mult: int = 500) -> str:
    """Authority-weighted admission: per-host budget 1 + (pr*mult) //
    sum(pr), then the per-host (depth, seq) top-budget — the plain
    window form, which admit_budget's salted two-phase provably
    equals."""
    return f"""
        WITH {_pagerank_ctes(n_iter)},
        tot AS (SELECT sum(pr)::BIGINT AS t FROM r{n_iter}),
        bud AS (SELECT node AS host,
                       (1 + (pr * {mult}) // t)::BIGINT AS budget
                FROM r{n_iter} CROSS JOIN tot),
        frontier AS ({_FRONTIER_SQL}),
        f AS (SELECT f.host, f.url, f.depth, f.seq, b.budget
              FROM frontier f JOIN bud b ON f.host = b.host)
        SELECT host, url, depth, seq, budget FROM f
        QUALIFY row_number() OVER (PARTITION BY host
                                   ORDER BY depth, seq) <= budget
    """


def _bpe_ctes(n_merges: int = 4) -> str:
    """Shared CTE chain re-learning the BPE merges from scratch, unrolled
    per step (mirrors textops/bpe.py: doubled-unit-separator symbol
    strings, greedy left-to-right replace, count-then-lexicographic
    argmax). Yields win1..winN and the final vocab v{n_merges} carrying
    (word, s, cnt)."""
    sep = "chr(31)"
    sep2 = "(chr(31) || chr(31))"
    parts = [f"""WITH w AS (
          SELECT word, count(*)::BIGINT AS cnt FROM (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents)
          WHERE word <> '' GROUP BY word),
        v0 AS (SELECT word,
                      {sep2} || regexp_replace(word, '(.)',
                                               '\\1' || {sep2}, 'g') AS s,
                      cnt
               FROM w)"""]
    for i in range(1, n_merges + 1):
        prev = f"v{i - 1}"
        parts.append(f""",
        p{i} AS (
          SELECT syms[k] AS lhs, syms[k+1] AS rhs, sum(cnt) AS c
          FROM (SELECT list_filter(string_split(s, {sep2}),
                                   x -> x <> '') AS syms, cnt
                FROM {prev}),
               unnest(range(1, len(syms))) AS t(k)
          GROUP BY syms[k], syms[k+1]),
        win{i} AS (SELECT lhs, rhs, c FROM p{i}
                   ORDER BY c DESC, lhs, rhs LIMIT 1),
        v{i} AS (
          SELECT word,
                 replace(s,
                   {sep} || (SELECT lhs FROM win{i}) || {sep2}
                         || (SELECT rhs FROM win{i}) || {sep},
                   {sep} || (SELECT lhs || rhs FROM win{i}) || {sep}) AS s,
                 cnt
          FROM {prev})""")
    return "".join(parts)


def _bpe_oracle_sqls(n_merges: int = 4) -> dict[str, str]:
    ctes = _bpe_ctes(n_merges)
    steps = " UNION ALL ".join(
        f"SELECT {i - 1}::INT AS step, lhs, rhs, lhs || rhs AS merged, "
        f"c::BIGINT AS pair_count FROM win{i}"
        for i in range(1, n_merges + 1)
    )
    return {
        "bpe_train": f"{ctes} SELECT * FROM ({steps})",
        "bpe_token_count": f"""{ctes},
            final AS (
              SELECT word,
                     len(list_filter(string_split(s, chr(31) || chr(31)),
                                     x -> x <> ''))::INT AS n_sym
              FROM v{n_merges}),
            dw AS (
              SELECT doc_id, word FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS word
                FROM documents)
              WHERE word <> '')
            SELECT doc_id, count(*)::INT AS n_words,
                   sum(n_sym)::BIGINT AS n_bpe_tokens
            FROM dw JOIN final USING (word)
            GROUP BY doc_id
        """,
    }


def _pq_ctes(m: int = 8, ks: int = 16, iters: int = 2,
             dim: int = 64) -> str:
    """Shared CTE chain for the PQ oracles: quantize → subspace split →
    b0 (init codebooks) → Lloyd iterations → b{iters} (trained books).
    Mirrors textops/similarity.py pq_train: argmin ties → lowest code,
    truncating integer means (Spark div semantics)."""
    d_sub = dim // m
    dist = _DISTQ_SQL
    parts = [f"""{_QUANT_SQL},
        sv AS (
          SELECT vec_id, s.sub::INT AS sub,
                 list_slice(q, s.sub * {d_sub} + 1,
                            s.sub * {d_sub} + {d_sub}) AS sq
          FROM emb, range(0, {m}) s(sub)),
        b0 AS (SELECT sub, vec_id AS code, sq AS cq
               FROM sv WHERE vec_id < {ks})"""]
    for it in range(1, iters + 1):
        prev = f"b{it - 1}"
        parts.append(f""",
        a{it} AS (
          SELECT vec_id, sub, sq, code FROM (
            SELECT v.vec_id, v.sub, v.sq, b.code,
                   {dist.format(a='v.sq', b='b.cq')} AS d
            FROM sv v JOIN {prev} b USING (sub))
          QUALIFY row_number() OVER (PARTITION BY vec_id, sub
                                     ORDER BY d, code) = 1),
        m{it} AS (
          SELECT a.sub, a.code, (i - 1)::INT AS dim,
                 (CASE WHEN sum(a.sq[i]) < 0
                       THEN -((-sum(a.sq[i])) // count(*))
                       ELSE sum(a.sq[i]) // count(*) END)::BIGINT AS c
          FROM a{it} a, range(1, {d_sub + 1}) t(i)
          GROUP BY a.sub, a.code, i - 1),
        b{it} AS (
          SELECT sub, code, list(c ORDER BY dim) AS cq
          FROM m{it} GROUP BY sub, code)""")
    return "".join(parts)


def _pq_oracle_sqls(m: int = 8, ks: int = 16, iters: int = 2,
                    dim: int = 64, n_queries: int = 5, k: int = 5) -> dict:
    ctes = _pq_ctes(m, ks, iters, dim)
    dist = _DISTQ_SQL
    books = f"b{iters}"
    train = f"""
        WITH {ctes}
        SELECT sub, code, dim, c FROM m{iters}
    """
    codes_body = f"""
        enc AS (
          SELECT vec_id, sub, code FROM (
            SELECT v.vec_id, v.sub, b.code,
                   {dist.format(a='v.sq', b='b.cq')} AS d
            FROM sv v JOIN {books} b USING (sub))
          QUALIFY row_number() OVER (PARTITION BY vec_id, sub
                                     ORDER BY d, code) = 1)"""
    codes = f"""
        WITH {ctes}, {codes_body}
        SELECT vec_id, sub, code FROM enc
    """
    topk = f"""
        WITH {ctes}, {codes_body},
        lut AS (
          SELECT v.vec_id AS query_id, v.sub, b.code,
                 {dist.format(a='v.sq', b='b.cq')} AS d
          FROM sv v JOIN {books} b USING (sub)
          WHERE v.vec_id < {n_queries}),
        dists AS (
          SELECT l.query_id, e.vec_id, sum(l.d)::BIGINT AS adc_q
          FROM enc e JOIN lut l USING (sub, code)
          WHERE e.vec_id >= {n_queries}
          GROUP BY l.query_id, e.vec_id)
        SELECT query_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY adc_q, vec_id)::BIGINT AS rank,
               vec_id AS neighbor_id, adc_q
        FROM dists
        QUALIFY rank <= {k}
    """
    l2 = f"""
        WITH {_QUANT_SQL},
        qs AS (SELECT vec_id AS query_id, q AS qv FROM emb
               WHERE vec_id < {n_queries}),
        scored AS (
          SELECT qs.query_id, e.vec_id AS neighbor_id,
                 ({dist.format(a='e.q', b='qs.qv')})::BIGINT AS d2_q
          FROM emb e CROSS JOIN qs WHERE e.vec_id >= {n_queries})
        SELECT query_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY d2_q, neighbor_id)::BIGINT AS rank,
               neighbor_id, d2_q
        FROM scored
        QUALIFY rank <= {k}
    """
    recall = f"""
        WITH exact AS (SELECT query_id, neighbor_id FROM ({l2})),
        approx AS (SELECT query_id, neighbor_id FROM ({topk})),
        hits AS (
          SELECT query_id, count(*)::INT AS n_hits
          FROM (SELECT * FROM exact INTERSECT SELECT * FROM approx)
          GROUP BY query_id)
        SELECT q.query_id, q.k, coalesce(h.n_hits, 0)::INT AS n_hits
        FROM (SELECT query_id, count(*)::INT AS k
              FROM exact GROUP BY query_id) q
        LEFT JOIN hits h USING (query_id)
    """
    return {"pq_train": train, "pq_codes": codes, "pq_topk": topk,
            "embedding_l2_topk": l2, "pq_recall": recall}


def q_ivf_topk(spark, sf_dir):
    from ideacrawler_spark.textops.similarity import ivf_topk

    return ivf_topk(_load(spark, sf_dir, "embeddings"))


def q_ann_lsh_buckets(spark, sf_dir):
    return lsh_buckets(_load(spark, sf_dir, "embeddings"))


def q_embedding_near_dup(spark, sf_dir):
    from ideacrawler_spark.textops.similarity import near_dup_pairs

    # quantized dot > 10_000_000 ≈ cosine-similar for these unit-ish vecs
    return near_dup_pairs(_load(spark, sf_dir, "embeddings"), 10_000_000)


def q_ann_lsh_topk(spark, sf_dir):
    return lsh_topk(_load(spark, sf_dir, "embeddings"))


def q_ann_recall(spark, sf_dir):
    """ANN quality evaluation — recall@5 of the LSH-bucketed approximate
    top-k against the brute-force exact top-k, per query: the metric a
    production ANN deployment monitors. Both inputs are the same
    (individually oracled) operators; output is exact integers."""
    from ideacrawler_spark.textops.similarity import (
        cosine_topk_bruteforce,
        lsh_topk,
    )

    emb = _load(spark, sf_dir, "embeddings")
    exact = cosine_topk_bruteforce(emb, n_queries=5, k=5).select(
        "query_id", "neighbor_id")
    approx = lsh_topk(emb, k=5).select(
        F.col("vec_id").alias("query_id"), "neighbor_id")
    hits = (
        exact.join(approx, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").cast("int").alias("n_hits"))
    )
    return (
        exact.groupBy("query_id")
        .agg(F.count("*").cast("int").alias("k"))
        .join(hits, "query_id", "left")
        .select("query_id", "k",
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("int")
                .alias("n_hits"))
    )


def q_ivf_recall(spark, sf_dir):
    """ANN quality evaluation for the IVF family (VERDICT r04 next #9):
    recall@5 of the multi-probe IVF top-k against the brute-force exact
    top-k — so BOTH ANN families (sign-LSH via ann_recall, IVF here)
    carry a monitored quality metric. Exact integers only."""
    from ideacrawler_spark.textops.similarity import (
        cosine_topk_bruteforce,
        ivf_topk,
    )

    emb = _load(spark, sf_dir, "embeddings")
    exact = cosine_topk_bruteforce(emb, n_queries=5, k=5).select(
        "query_id", "neighbor_id")
    approx = ivf_topk(emb).select("query_id", "neighbor_id")
    hits = (
        exact.join(approx, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").cast("int").alias("n_hits"))
    )
    return (
        exact.groupBy("query_id")
        .agg(F.count("*").cast("int").alias("k"))
        .join(hits, "query_id", "left")
        .select("query_id", "k",
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("int")
                .alias("n_hits"))
    )


def _semdedup_input(spark, sf_dir):
    """embeddings (cast to array<double>) plus three deterministic plant
    families for every vec_id % 7 == 0: an exact copy (+1000, cos=1), a
    0.9-scaled copy (+2000, cos=1, different norm), and a negated copy
    (+3000, cos=-1, must be KEPT). Pure double arithmetic on both engines
    so the oracle reproduces the input bit-for-bit."""
    base = _load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("e"),
    )
    sel = base.filter(F.col("vec_id") % 7 == 0)
    plants = (
        sel.select((F.col("vec_id") + 1000).alias("vec_id"), "e")
        .unionAll(sel.select(
            (F.col("vec_id") + 2000).alias("vec_id"),
            F.transform(F.col("e"), lambda x: x * F.lit(0.9)).alias("e")))
        .unionAll(sel.select(
            (F.col("vec_id") + 3000).alias("vec_id"),
            F.transform(F.col("e"), lambda x: -x).alias("e")))
    )
    return base.unionAll(plants).select("vec_id", F.col("e").alias("embedding"))


def q_semdedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): cluster-then-cosine semantic dedup
    at tau=0.8 over the embeddings table with planted exact/scaled/negated
    duplicates. Exact integer fixed-point throughout, so kept/dup_of are
    oracle-verifiable values, not just counts."""
    from ideacrawler_spark.textops.similarity import semdedup

    return semdedup(_semdedup_input(spark, sf_dir))


def q_revalidate(spark, sf_dir):
    """Conditional-GET revalidation merge (operators/recrawl.py): a
    deterministic store (docs % 5 != 4) merged with a revalidation
    batch (docs % 3 != 2; statuses 304/404/500/200 by doc_id % 7).
    Exercises every action arm: insert/refresh/replace/drop/keep/ignore."""
    from ideacrawler_spark.operators.recrawl import revalidate_merge

    d = F.col("doc_id")
    docs = _load(spark, sf_dir, "documents")
    url = F.concat(F.lit("http://h"), (d % 20).cast("string"),
                   F.lit(".example/p"), d.cast("string"))
    store = docs.filter(d % 5 != 4).select(
        url.alias("url"),
        (d + 1000).cast("long").alias("fetch_ts"),
        F.lit(200).alias("status"),
        F.concat(F.lit("e"), d.cast("string")).alias("etag"),
        ((d * 7) % 1000).cast("long").alias("fp"),
        F.substring(F.col("text"), 1, 20).alias("text"),
    )
    fetched = docs.filter(d % 3 != 2).select(
        url.alias("url"),
        (d + 2000).cast("long").alias("fetch_ts"),
        F.when(d % 7 == 0, F.lit(304)).when(d % 7 == 1, F.lit(404))
        .when(d % 7 == 2, F.lit(500)).otherwise(F.lit(200)).alias("status"),
        F.concat(F.lit("n"), d.cast("string")).alias("etag"),
        ((d * 11) % 1000).cast("long").alias("fp"),
        F.concat(F.lit("N:"), F.substring(F.col("text"), 1, 20)).alias("text"),
    )
    return revalidate_merge(store, fetched)


def q_cdx_lookup(spark, sf_dir):
    """Common-Crawl CDXJ index round-trip (sources/cdx.py): deterministic
    captures derived from the documents table -> SURT keys + CDXJ lines
    (pure codegen) -> the real Arrow-batched line parser -> a prefix
    lookup. The oracle re-derives every field, including the SURT
    transform (host-reversal, www-strip, :80 drop, query-param sort,
    path lowercasing), from the same construction in SQL."""
    from ideacrawler_spark.sources.cdx import cdx_lookup, cdxj_lines, parse_cdxj

    d = F.col("doc_id")
    docs = _load(spark, sf_dir, "documents")
    captures = docs.select(
        F.concat(
            F.lit("http://"),
            F.when(d % 4 == 0, F.lit("www.")).when(d % 4 == 1, F.lit("CDN."))
            .otherwise(F.lit("")),
            F.col("source"), F.lit(".Example.org"),
            F.when(d % 5 == 0, F.lit(":8080")).when(d % 5 == 1, F.lit(":80"))
            .otherwise(F.lit("")),
            F.lit("/Docs/"), d.cast("string"), F.lit("/page.html"),
            F.when(d % 3 == 0, F.lit("?b=2&a=1")).otherwise(F.lit("")),
        ).alias("url"),
        (F.lit(20240000000000) + d).cast("long").alias("ts"),
        F.when(d % 10 == 0, F.lit(404)).otherwise(F.lit(200)).alias("status"),
        F.lit("text/html").alias("mime"),
        F.md5(F.col("text").cast("binary")).alias("digest"),
        F.col("n_chars").cast("long").alias("length"),
    )
    return cdx_lookup(parse_cdxj(cdxj_lines(captures)), "org,example,src1")


def q_dsir_select(spark, sf_dir):
    """DSIR-style importance resampling (Xie et al. 2023): hashed-unigram
    bucket distributions for raw corpus vs the lang='en' target slice,
    integer ratio weights, per-doc scores, top-100 selected."""
    from ideacrawler_spark.textops.dsir import dsir_select

    return dsir_select(_load(spark, sf_dir, "documents"))


def q_pq_train(spark, sf_dir):
    """Product-quantization codebook training (the IVF-PQ second stage —
    Jégou et al. TPAMI 2011): per-subspace Lloyd with truncating integer
    means, all m subspaces in one plan."""
    from ideacrawler_spark.textops.similarity import pq_train

    return pq_train(_load(spark, sf_dir, "embeddings"))


def q_pq_codes(spark, sf_dir):
    """PQ encoding: every vector reduced to m nearest-code ids — the
    stored index (16x smaller than the quantized vectors at m=8/ks=16;
    32-64x at production ks=256 over float32)."""
    from ideacrawler_spark.textops.similarity import pq_encode

    return pq_encode(_load(spark, sf_dir, "embeddings"))


def q_pq_topk(spark, sf_dir):
    """Asymmetric-distance top-k over the PQ codes: per-query m*ks exact
    subspace-distance LUT (broadcast), candidates cost m lookups each."""
    from ideacrawler_spark.textops.similarity import pq_adc_topk

    return pq_adc_topk(_load(spark, sf_dir, "embeddings"))


def q_embedding_l2_topk(spark, sf_dir):
    """Exact squared-L2 top-k — the ground truth pq_recall measures the
    ADC ranking against."""
    from ideacrawler_spark.textops.similarity import l2_topk_bruteforce

    return l2_topk_bruteforce(_load(spark, sf_dir, "embeddings"))


def q_pq_recall(spark, sf_dir):
    """Recall@5 of PQ/ADC against the exact L2 top-k — the third ANN
    family (sign-LSH, IVF, PQ) to carry a monitored quality metric."""
    from ideacrawler_spark.textops.similarity import (
        l2_topk_bruteforce,
        pq_adc_topk,
    )

    emb = _load(spark, sf_dir, "embeddings")
    exact = l2_topk_bruteforce(emb, n_queries=5, k=5).select(
        "query_id", "neighbor_id")
    approx = pq_adc_topk(emb).select("query_id", "neighbor_id")
    hits = (
        exact.join(approx, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").cast("int").alias("n_hits"))
    )
    return (
        exact.groupBy("query_id")
        .agg(F.count("*").cast("int").alias("k"))
        .join(hits, "query_id", "left")
        .select("query_id", "k",
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("int")
                .alias("n_hits"))
    )


def q_embedding_near_dup_banded(spark, sf_dir):
    from ideacrawler_spark.textops.similarity import near_dup_pairs_banded

    # multi-band OR-construction with a per-(band,bucket) size cap — the
    # skew-bounded scale path for near-dup candidate generation
    return near_dup_pairs_banded(
        _load(spark, sf_dir, "embeddings"), 10_000_000,
        n_bands=2, planes_per_band=6, bucket_cap=64,
    )


def q_curation(spark, sf_dir):
    """Composed training-data curation over documents: exact-dedup keepers
    ∧ quality gates (length, type-token ratio, stopword ceiling) — the
    end-to-end selection a pretraining pipeline runs, as ONE plan."""
    docs = _load(spark, sf_dir, "documents")
    d = exact_dedup(docs).filter(~F.col("is_dup")).select("doc_id")
    q = quality_score(docs).filter(
        (F.col("n_words") >= 8)
        & (F.col("ttr_x1000") >= 400)
        & (F.col("stop_x1000") <= 400)
    ).select("doc_id", "n_words", "ttr_x1000", "stop_x1000")
    return d.join(q, "doc_id")


def q_langid(spark, sf_dir):
    return langid_ngram(_load(spark, sf_dir, "documents"))


def q_quality(spark, sf_dir):
    return quality_score(_load(spark, sf_dir, "documents"))


def q_token_count(spark, sf_dir):
    return token_count(_load(spark, sf_dir, "documents"))


def q_fingerprint(spark, sf_dir):
    return fingerprint(_load(spark, sf_dir, "documents"))


def q_lm_surprisal(spark, sf_dir):
    from ideacrawler_spark.textops.analysis import lm_surprisal

    return lm_surprisal(_load(spark, sf_dir, "documents"))


def q_sequence_pack(spark, sf_dir):
    """Concat-and-chunk sequence packing into 256-token contexts via the
    distributed two-phase prefix sum (textops/packing.py) — the global
    token offset never runs through a single-partition window over the
    data."""
    from ideacrawler_spark.textops.packing import pack_sequences

    return pack_sequences(_load(spark, sf_dir, "documents"), ctx_len=256)


def q_chunk_documents(spark, sf_dir):
    """Per-document sliding token windows (chunk 32, overlap 8) — the
    RAG/long-doc shape; map-side explode, no shuffle."""
    from ideacrawler_spark.textops.packing import chunk_documents

    return chunk_documents(
        _load(spark, sf_dir, "documents"), chunk=32, overlap=8)


def q_duplicate_spans(spark, sf_dir):
    """Corpus-wide verbatim-span duplication (Lee et al. 2022 semantics at
    8-word-window granularity): one 8-byte-keyed shuffle, per-doc interval
    merge — see textops/spans.py."""
    from ideacrawler_spark.textops.spans import duplicate_spans

    return duplicate_spans(_load(spark, sf_dir, "documents"))


def q_contamination(spark, sf_dir):
    """Benchmark decontamination: docs containing any benchmark 8-gram
    verbatim. Benchmark side is broadcast — the corpus is never shuffled."""
    from ideacrawler_spark.textops.spans import bench_ngrams, contamination

    docs = _load(spark, sf_dir, "documents")
    return contamination(docs, bench_ngrams(docs))


def q_mixture_weights(spark, sf_dir):
    """Per-source √tokens sampling weights in exact integer ppm."""
    from ideacrawler_spark.textops.spans import mixture_weights

    return mixture_weights(_load(spark, sf_dir, "documents"))


def q_hll_registers(spark, sf_dir):
    """HyperLogLog registers (p=8) over events.user_id — the mergeable
    distinct sketch, every register an exact oracle-checkable integer."""
    from ideacrawler_spark.textops.spans import hll_registers

    return hll_registers(_load(spark, sf_dir, "events"), "user_id")


def q_bpe_train(spark, sf_dir):
    """Corpus-trained BPE merge table (4 merges) — the iterative
    tokenizer-training loop; the oracle RE-LEARNS the merges from scratch
    with unrolled SQL stages (same argmax tiebreak, same greedy replace
    semantics)."""
    from ideacrawler_spark.textops.bpe import bpe_train

    return bpe_train(_load(spark, sf_dir, "documents"))


def q_bpe_token_count(spark, sf_dir):
    """Per-doc token counts under the corpus-trained BPE — encode is a
    hash join of doc words against the vocab's per-word symbol counts."""
    from ideacrawler_spark.textops.bpe import bpe_token_count

    return bpe_token_count(_load(spark, sf_dir, "documents"))


def q_cms_registers(spark, sf_dir):
    """Count-min sketch registers (d=4, w=256) over the corpus token
    stream — the second mergeable integer sketch (with hll_registers)."""
    from ideacrawler_spark.textops.spans import cms_registers

    return cms_registers(_load(spark, sf_dir, "documents"))


def q_token_quantiles(spark, sf_dir):
    """Exact p25/50/75/90/99 of per-doc token counts via the bounded
    histogram cumsum — percentile_disc semantics, integer-exact."""
    from ideacrawler_spark.textops.analysis import token_quantiles

    return token_quantiles(_load(spark, sf_dir, "documents"))


def q_weighted_mix(spark, sf_dir):
    """Deterministic weighted source mix: three language slices hash-
    sampled at different exact-fraction rates and unioned with a
    mix_source tag — the final assembly step of a training-data mix."""
    from ideacrawler_spark.textops.sampling import weighted_mix

    docs = _load(spark, sf_dir, "documents")
    return weighted_mix({
        "web": (docs.filter(F.col("lang") == "en"), (2, 3)),
        "books": (docs.filter(F.col("lang") == "de"), (1, 2)),
        "tail": (docs.filter(~F.col("lang").isin("en", "de")), (1, 8)),
    })


def _host_edges(spark, sf_dir):
    """Deterministic synthetic host link graph derived from events:
    50 hosts, src = user_id mod 50, dst = (user_id + event_id) mod 50,
    self-loops dropped, distinct edges."""
    ev = _load(spark, sf_dir, "events")
    s = (F.col("user_id") % 50).cast("long")
    t = ((F.col("user_id") + F.col("event_id")) % 50).cast("long")
    return (
        ev.filter(s != t)
        .select(
            F.concat(F.lit("host"), s.cast("string"),
                     F.lit(".example")).alias("src"),
            F.concat(F.lit("host"), t.cast("string"),
                     F.lit(".example")).alias("dst"),
        )
        .distinct()
    )


_EDGES_SQL = """
edges AS (
  SELECT DISTINCT
         'host' || (user_id % 50) || '.example' AS src,
         'host' || ((user_id + event_id) % 50) || '.example' AS dst
  FROM events
  WHERE (user_id % 50) <> ((user_id + event_id) % 50))
"""


def q_host_degrees(spark, sf_dir):
    """Exact in/out degree per host over the synthetic link graph —
    the first-cut authority/hubness signal for host curation."""
    from ideacrawler_spark.operators.graph import host_degrees

    return host_degrees(_host_edges(spark, sf_dir))


def q_host_pagerank(spark, sf_dir):
    """Integer fixed-point PageRank (6 unrolled iterations) over the
    synthetic host graph — the host-authority score a curation
    pipeline weights sources by; bit-exact vs the unrolled SQL oracle."""
    from ideacrawler_spark.operators.graph import pagerank

    return pagerank(_host_edges(spark, sf_dir), n_iter=6,
                    shuffle_partitions=8)


def q_host_hits(spark, sf_dir):
    """HITS hubs & authorities over the synthetic host graph — the
    directory-page vs destination-page split PageRank can't see."""
    from ideacrawler_spark.operators.graph import hits

    return hits(_host_edges(spark, sf_dir), n_iter=4,
                shuffle_partitions=8)


def q_classifier_score(spark, sf_dir):
    """Hashed-feature linear quality classifier (fastText-inference
    shape): integer score over 4096 hashed token buckets with a fixed
    synthetic weight table, keep = score > 0."""
    from ideacrawler_spark.textops.classify import classifier_score

    return classifier_score(_load(spark, sf_dir, "documents"))


def q_tokenizer_fertility(spark, sf_dir):
    """Per-language BPE tokens per 1000 words — the multilingual
    tokenizer health metric, from the corpus-trained BPE."""
    from ideacrawler_spark.textops.bpe import tokenizer_fertility

    return tokenizer_fertility(_load(spark, sf_dir, "documents"))


def q_host_trustrank(spark, sf_dir):
    """TrustRank over the host graph: reset vector restricted to the 5
    curated seed hosts — the link-spam demotion score; hosts unreachable
    from seeds converge to 0."""
    from ideacrawler_spark.operators.graph import trustrank

    seeds = spark.createDataFrame(
        [(s,) for s in TRUST_SEEDS], "node string")
    return trustrank(_host_edges(spark, sf_dir), seeds, n_iter=6,
                     shuffle_partitions=8)


def q_url_templates(spark, sf_dir):
    """Crawler-trap mining: digit runs collapsed to N, URLs counted per
    pattern — the pattern-level view that surfaces calendar traps and
    pagination explosions before per-URL gating. The synthetic URL set
    mixes four shapes (plain pages, a calendar trap, lettered tag
    pagination, query-param items) so patterns genuinely differ."""
    from ideacrawler_spark.operators.urlfilter import url_templates

    ev = _load(spark, sf_dir, "events")
    urls = ev.select(
        F.expr("""
            concat('http://host', user_id % 7, '.example',
              CASE cast(event_id % 4 AS INT)
                WHEN 0 THEN concat('/p/', event_id)
                WHEN 1 THEN concat('/cal/2024/', event_id % 12, '/',
                                   event_id % 28)
                WHEN 2 THEN concat('/tag/',
                                   substr('abcdefghijklmnopqrstuvwxyz',
                                          cast(user_id % 26 AS INT) + 1,
                                          1),
                                   '/page/', event_id % 50)
                ELSE concat('/item?id=', event_id)
              END)
        """).alias("url"),
        F.concat(F.lit("host"), (F.col("user_id") % 7).cast("string"),
                 F.lit(".example")).alias("host"),
    )
    return url_templates(urls, min_urls=2)


def q_anchor_corpus(spark, sf_dir):
    """Anchor-text corpus: synthetic HTML pages (one per event, two
    anchors each — a relative topic link and an absolute hub link) go
    through the REAL tokenizer parse + resolve/canonicalize path; the
    oracle re-derives the resolved targets arithmetically."""
    from ideacrawler_spark.textops.anchors import anchor_corpus

    ev = _load(spark, sf_dir, "events")
    h = (F.col("user_id") % 7).cast("string")
    t = (F.col("user_id") % 20).cast("string")
    k = (F.col("event_id") % 5).cast("string")
    html = F.concat(
        F.lit('<html><body><a href="/t/'), t, F.lit('">topic '), t,
        F.lit('</a><a href="http://hub.example/h/'), k,
        F.lit('">hub '), k, F.lit("</a></body></html>"),
    )
    pages = ev.select(
        F.concat(F.lit("http://host"), h, F.lit(".example/p/"),
                 F.col("event_id").cast("string")).alias("url"),
        F.encode(html, "utf-8").alias("html"),
    )
    return anchor_corpus(pages)


def q_frontier_prioritized(spark, sf_dir):
    """Authority-weighted admission: per-host budget 1 + (pr*500) div
    sum(pr) from the host graph's PageRank, admitted through the same
    salted two-phase top-k as production admission (host_budget_max=501
    literal bound enables WindowGroupLimit) — crawl capacity follows
    host authority, the classic frontier prioritization."""
    from ideacrawler_spark.operators.admission import admit_budget
    from ideacrawler_spark.operators.graph import pagerank

    fr = _frontier(spark, sf_dir).select("host", "url", "depth", "seq")
    pr = pagerank(_host_edges(spark, sf_dir), n_iter=6,
                  shuffle_partitions=8)
    tot = pr.agg(F.sum("pr").alias("_tot"))
    bud = (
        pr.crossJoin(F.broadcast(tot))
        .select(
            F.col("node").alias("host"),
            (F.lit(1) + F.expr("(pr * 500) div _tot"))
            .cast("long").alias("budget"),
        )
    )
    fr2 = fr.join(F.broadcast(bud), "host")
    admitted, _carried = admit_budget(
        fr2, F.col("budget"), host_budget_max=501)
    return admitted.select("host", "url", "depth", "seq", "budget")


def _snapshots(spark, sf_dir):
    """Deterministic synthetic recrawl history from events: page id =
    event_id div 4 observed at snapshot event_id mod 4, content version
    fp = user_id mod 5, ~9% pseudo-random dropout so new/gone statuses
    exist."""
    ev = _load(spark, sf_dir, "events")
    pid = F.expr("event_id div 4")
    return ev.filter(F.col("user_id") % 11 != 0).select(
        F.concat(F.lit("http://host"), (pid % 7).cast("string"),
                 F.lit(".example/p/"), pid.cast("string")).alias("url"),
        (F.col("event_id") % 4).cast("int").alias("snap"),
        (F.col("user_id") % 5).cast("long").alias("fp"),
    )


_HIST_SQL = """
hist AS (
  SELECT 'http://host' || ((event_id // 4) % 7) || '.example/p/'
           || (event_id // 4) AS url,
         (event_id % 4)::INT AS snap,
         (user_id % 5)::BIGINT AS fp
  FROM events
  WHERE user_id % 11 <> 0)
"""


def q_snapshot_delta(spark, sf_dir):
    """Per-URL diff between two crawl snapshots (new/gone/changed/same)
    — one full-outer join keyed on url."""
    from ideacrawler_spark.operators.recrawl import snapshot_delta

    h = _snapshots(spark, sf_dir)
    return snapshot_delta(
        h.filter(F.col("snap") == 2).select("url", "fp"),
        h.filter(F.col("snap") == 3).select("url", "fp"),
    )


def q_recrawl_schedule(spark, sf_dir):
    """Change-driven exponential-backoff revisit schedule per URL from
    the 4-snapshot observation history — integer-exact."""
    from ideacrawler_spark.operators.recrawl import recrawl_schedule

    return recrawl_schedule(_snapshots(spark, sf_dir))


def _announcements(spark, sf_dir):
    """Deterministic synthetic feed announcements on the snapshot time
    scale: page id = event_id div 4 announced at pub = event_id mod 9
    for the user_id % 7 == 3 slice (some pubs beat the last observation
    at snap <= 3, some don't; some urls are never crawled)."""
    ev = _load(spark, sf_dir, "events")
    pid = F.expr("event_id div 4")
    return ev.filter(F.col("user_id") % 7 == 3).select(
        F.concat(F.lit("http://host"), (pid % 7).cast("string"),
                 F.lit(".example/p/"), pid.cast("string")).alias("url"),
        (F.col("event_id") % 9).cast("int").alias("pub"),
    )


def q_feed_refresh(spark, sf_dir):
    """Feed-driven recrawl override: announcements newer than the last
    observation reset the exponential backoff; never-crawled announced
    urls become discovery rows. Composes recrawl_schedule with the feed
    source's announcement shape."""
    from ideacrawler_spark.operators.recrawl import (
        feed_refresh,
        recrawl_schedule,
    )

    return feed_refresh(recrawl_schedule(_snapshots(spark, sf_dir)),
                        _announcements(spark, sf_dir))


RETRIEVAL_TERMS = ("spark", "hash", "window")


def q_term_retrieval(spark, sf_dir):
    """Top-10 docs for a 3-term query, integer tf-idf surrogate scoring
    (idf = N div df) with doc_id tiebreak — the corpus-inspection
    lookup; top-k is TakeOrderedAndProject, never a full sort."""
    from ideacrawler_spark.textops.retrieval import term_retrieval

    return term_retrieval(
        _load(spark, sf_dir, "documents"), RETRIEVAL_TERMS, k=10)


def q_token_postings(spark, sf_dir):
    """Full inverted index (tok, df, sorted postings) for tokens with
    df >= 5 — the searchable-corpus artifact itself."""
    from ideacrawler_spark.textops.retrieval import token_postings

    return token_postings(_load(spark, sf_dir, "documents"), min_df=5)


def q_surprisal_buckets(spark, sf_dir):
    """CCNet-style perplexity tertiles: corpus-percentile bucket per doc,
    boundaries computed on the bounded score histogram."""
    from ideacrawler_spark.textops.analysis import surprisal_buckets

    return surprisal_buckets(_load(spark, sf_dir, "documents"))


def q_per_source_cap(spark, sf_dir):
    """Max-10-docs-per-source curation rule via the salted two-phase
    top-k (same skew discipline as frontier admission)."""
    from ideacrawler_spark.textops.sampling import per_source_cap

    return per_source_cap(_load(spark, sf_dir, "documents"), cap=10)


# ---- relational sanity (windowed agg + broadcast join shapes) -------------


def q_events_hourly(spark, sf_dir):
    ev = _load(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd HH").alias("hour"),
        "event_type",
    ).agg(F.count("*").alias("n"), F.countDistinct("user_id").alias("users"))


def q_segment_orders(spark, sf_dir):
    o = _load(spark, sf_dir, "orders")
    c = _load(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


def q_lineitem_groups(spark, sf_dir):
    li = _load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("int")).alias("sum_qty"),
        F.min("l_orderkey").alias("min_ok"),
        F.max("l_orderkey").alias("max_ok"),
    )


# ---- non-SQL-expressible (rows-only checks; golden-tested in pytest) ------


def q_crawl_flagship(spark, sf_dir):
    """Full multi-round crawl on the deterministic synthetic web —
    bit-for-bit semantics are pytest-golden-verified vs the reference
    simulator AND oracled: the DuckDB side is the simulator's expected
    shipped table rendered as a VALUES literal (_flagship_oracle_sql)."""
    from ideacrawler_spark.plans.crawl import CrawlEngine
    from ideacrawler_spark.sources.fixtures import (
        PAGES_SCHEMA,
        ROBOTS_SCHEMA,
        synth_web,
    )

    pages, robots, seeds, pushes = synth_web(seed=42, scale=1)
    eng = CrawlEngine(
        spark, _flagship_spec(),
        spark.createDataFrame(pages, PAGES_SCHEMA),
        spark.createDataFrame(robots, ROBOTS_SCHEMA),
        pushes,
        shuffle_partitions=8,
    )
    out = eng.run()
    return out["shipped"].orderBy("fetch_seq").select(
        "fetch_seq", "url", "depth", "anchor_text", "meta", "status", "text"
    )


def q_crawl_gated(spark, sf_dir):
    """Multi-round crawl with frontier URL gating active (VERDICT r03 #1:
    host_blocklist + spam-signal JobSpec knobs applied at the eligibility
    stage, plans/round.py). The oracle is the reference simulator's
    shipped table under the SAME gated spec — the simulator implements
    the gating semantics independently (refsim.py url_blocked)."""
    from ideacrawler_spark.plans.crawl import CrawlEngine
    from ideacrawler_spark.sources.fixtures import (
        PAGES_SCHEMA,
        ROBOTS_SCHEMA,
        synth_web,
    )

    pages, robots, _, _ = synth_web(seed=42, scale=1)
    eng = CrawlEngine(
        spark, _gated_spec(),
        spark.createDataFrame(pages, PAGES_SCHEMA),
        spark.createDataFrame(robots, ROBOTS_SCHEMA),
        shuffle_partitions=8,
    )
    out = eng.run()
    return out["shipped"].orderBy("fetch_seq").select(
        "fetch_seq", "url", "depth", "anchor_text", "meta", "status", "text"
    )


def _feeds_crawl_spec():
    from ideacrawler_spark.config import JobSpec

    return JobSpec(job_id="feeds-oracle", seed_url="http://fs.example/",
                   follow_other_domains=True, impolite=True,
                   follow_feeds=True, min_delay_s=1, round_seconds=10,
                   max_concurrent=1 << 20)


def q_crawl_feeds(spark, sf_dir):
    """Multi-round crawl with follow_feeds active (sources/feeds.py wired
    into plans/round.py): RSS/Atom autodiscovery from HTML, feed pages
    followed for entry links but never shipped, entry titles as anchor
    text. The oracle is the reference simulator's shipped table under the
    SAME spec — the simulator implements the feed semantics independently
    (xml.etree + HTMLParser vs the engine's bounded regex scan)."""
    from ideacrawler_spark.plans.crawl import CrawlEngine
    from ideacrawler_spark.sources.fixtures import (
        PAGES_SCHEMA,
        ROBOTS_SCHEMA,
        synth_feed_web,
    )

    eng = CrawlEngine(
        spark, _feeds_crawl_spec(),
        spark.createDataFrame(synth_feed_web(), PAGES_SCHEMA),
        spark.createDataFrame([], ROBOTS_SCHEMA),
        shuffle_partitions=8,
    )
    out = eng.run()
    return out["shipped"].orderBy("fetch_seq").select(
        "fetch_seq", "url", "depth", "anchor_text", "meta", "status", "text"
    )


def _feeds_oracle_sql() -> str:
    """Shipped table of the feed-following crawl, generated by the
    simulator's INDEPENDENT feed implementation on the same fixture."""
    from ideacrawler_spark.refsim import simulate
    from ideacrawler_spark.sources.fixtures import synth_feed_web

    golden = simulate(_feeds_crawl_spec(), synth_feed_web(), [])

    def q(s: str) -> str:
        return "'" + str(s).replace("'", "''") + "'"

    rows = ", ".join(
        f"({s['fetch_seq']}::BIGINT, {q(s['url'])}, {s['depth']}::INT, "
        f"{q(s['anchor_text'])}, {q(s['meta'])}, {s['status']}::INT, "
        f"{q(s['text'])})"
        for s in sorted(golden.shipped, key=lambda s: s["fetch_seq"])
    )
    return (
        "SELECT * FROM (VALUES " + rows + ") AS t("
        "fetch_seq, url, depth, anchor_text, meta, status, text)"
    )


def q_warc_ingest(spark, sf_dir):
    """Common-Crawl-style WARC ingestion (sources/warc.py): the fixture
    web serialized to a WARC/1.0 archive and parsed back through the
    Spark mapInPandas path. The oracle re-derives the expected rows from
    the INPUT page dicts (not the parser), so a parser bug cannot
    self-certify."""
    from ideacrawler_spark.sources.fixtures import synth_web
    from ideacrawler_spark.sources.warc import build_warc, warc_to_pages

    pages, _, _, _ = synth_web(seed=42, scale=1)
    files = spark.createDataFrame(
        [("w.warc", bytearray(build_warc(pages)))],
        "path string, content binary",
    )
    return warc_to_pages(files).select(
        "url", "status", "content_type",
        F.length(F.col("html")).cast("int").alias("n_html"),
        F.md5(F.col("html")).alias("html_md5"),
    )


def q_warc_roundtrip(spark, sf_dir):
    """WARC WRITE path (sources/warc.py::pages_to_warc_shards): the
    fixture pages distributed over executors, sharded by xxhash64(url),
    serialized per-shard via applyInPandas, then re-ingested through the
    independent read path. The oracle is the same input-derived row set
    as warc_ingest — a writer bug (lost/duplicated/corrupted record in
    any shard) breaks the match."""
    from ideacrawler_spark.sources.fixtures import synth_web
    from ideacrawler_spark.sources.warc import (
        pages_to_warc_shards,
        warc_to_pages,
    )

    pages, _, _, _ = synth_web(seed=42, scale=1)
    pdf = spark.createDataFrame(
        [
            (p["url"], p["warc_ts"], bytearray(p["html"]), p["status"],
             p["content_type"])
            for p in pages
        ],
        "url string, warc_ts timestamp, html binary, status int, "
        "content_type string",
    ).repartition(8)
    shards = pages_to_warc_shards(pdf, n_shards=4)
    return warc_to_pages(shards).select(
        "url", "status", "content_type",
        F.length(F.col("html")).cast("int").alias("n_html"),
        F.md5(F.col("html")).alias("html_md5"),
    )


# Deterministic resource-tag pages for the S6 oracle: (url, assets) where
# assets are (kind, path) pairs rendered into HTML by q_outlinks_resources
# and re-derived as expected rows by the oracle WITHOUT running the
# extractor (validateLink semantics applied to the construction data).
_RESOURCE_PAGES = [
    ("http://rsrc0.example/dir/page.html",
     [("script", "/js/app.js"), ("link", "/css/site.css"),
      ("img", "img/pic.png"), ("img", "http://cdn.example/abs.gif"),
      ("link", "/feed.xml"), ("img", "/noext/raw")]),
    ("http://rsrc1.example/index.html",
     [("script", "lib/vendor.js"), ("img", "/a/b.jpg")]),
    ("http://rsrc2.example/p.html", []),
]


def q_outlinks_resources(spark, sf_dir):
    """S6 resource/prefetch extraction over a constructed page set; the
    oracle re-derives expectations from _RESOURCE_PAGES directly."""
    from ideacrawler_spark.functions.extract import resources_table

    rows = []
    for url, assets in _RESOURCE_PAGES:
        parts = ["<html><head>"]
        for kind, path in assets:
            if kind == "script":
                parts.append(f'<script src="{path}"></script>')
            elif kind == "link":
                parts.append(f'<link rel="stylesheet" href="{path}">')
        parts.append("</head><body>")
        for kind, path in assets:
            if kind == "img":
                parts.append(f'<img src="{path}">')
        parts.append('<a href="/not-a-resource.html">x</a></body></html>')
        rows.append((url, "".join(parts).encode()))
    pages = spark.createDataFrame(rows, "url string, html binary")
    return resources_table(pages)


# Sitemap fixture: (sitemap_url, index?, entries) with HAND-WRITTEN
# expected rows (kind, loc, canonical url, lastmod, changefreq,
# priority_x10, same_host) so the oracle is independent of both the
# parser and the normalizer. The third file is deliberately broken.
_SITEMAP_ROBOTS = (
    "http://smone.example/robots.txt",
    "User-agent: *\nDisallow: /tmp\n"
    "Sitemap: http://smone.example/sitemap.xml\n"
    "sitemap:   http://cdn.example/alt.xml\n",
)
_SITEMAP_FILES = [
    ("http://smone.example/sitemap.xml", False, [
        # (loc-in-xml, lastmod, changefreq, priority) → expected below
        ("http://smone.example/a.html", "2026-01-02", "daily", "0.8"),
        ("HTTP://SMONE.example/C.html", None, None, None),
        ("http://smone.example/p?q=a&b", None, "weekly", "0.5"),
        ("http://other.example/x.html", "2026-03-04", None, None),
    ]),
    ("http://smtwo.example/sm_index.xml", True, [
        ("http://smtwo.example/sitemaps/one.xml", "2026-02-03", None, None),
        ("http://cdn.example/sitemaps/two.xml", None, None, None),
    ]),
]
# expected (sitemap_url, kind, loc, url, lastmod, changefreq, prio_x10,
# same_host) — literals, not derived by running engine code.
_SITEMAP_EXPECT = [
    ("http://smone.example/robots.txt", "robots",
     "http://smone.example/sitemap.xml", "http://smone.example/sitemap.xml",
     None, None, None, 1),
    ("http://smone.example/robots.txt", "robots",
     "http://cdn.example/alt.xml", "http://cdn.example/alt.xml",
     None, None, None, 0),
    ("http://smone.example/sitemap.xml", "urlset",
     "http://smone.example/a.html", "http://smone.example/a.html",
     "2026-01-02", "daily", 8, 1),
    ("http://smone.example/sitemap.xml", "urlset",
     "HTTP://SMONE.example/C.html", "http://smone.example/C.html",
     None, None, None, 1),
    ("http://smone.example/sitemap.xml", "urlset",
     "http://smone.example/p?q=a&b", "http://smone.example/p?q=a&b",
     None, "weekly", 5, 1),
    ("http://smone.example/sitemap.xml", "urlset",
     "http://other.example/x.html", "http://other.example/x.html",
     "2026-03-04", None, None, 0),
    ("http://smtwo.example/sm_index.xml", "index",
     "http://smtwo.example/sitemaps/one.xml",
     "http://smtwo.example/sitemaps/one.xml", "2026-02-03", None, None, 1),
    ("http://smtwo.example/sm_index.xml", "index",
     "http://cdn.example/sitemaps/two.xml",
     "http://cdn.example/sitemaps/two.xml", None, None, None, 0),
]


def q_sitemap_ingest(spark, sf_dir):
    """Sitemap discovery + ingestion (sources/sitemap.py): robots.txt
    ``Sitemap:`` directives plus urlset/index XML parsed through the
    mapInPandas path, locs canonicalized by the engine normalizer, the
    protocol's cross-host rule applied. The reference has no sitemap
    surface (its robots parser drops Sitemap lines); this is the
    Common-Crawl-frontier seed source. Oracle = hand-written literals
    from the construction data."""
    from ideacrawler_spark.sources.sitemap import (
        build_sitemap,
        robots_sitemaps_udf,
        sitemap_to_entries,
    )
    from ideacrawler_spark.functions.urlnorm import host_of

    file_rows = []
    for smurl, is_index, entries in _SITEMAP_FILES:
        dicts = [
            {"loc": loc, "lastmod": lm, "changefreq": cf, "priority": pr}
            for loc, lm, cf, pr in entries
        ]
        file_rows.append((smurl, bytearray(build_sitemap(dicts, index=is_index))))
    file_rows.append(("http://bad.example/sitemap.xml", bytearray(b"not xml")))
    files = spark.createDataFrame(file_rows, "url string, content binary")
    parsed = sitemap_to_entries(files).select(
        "sitemap_url", "kind", "loc", "url", "lastmod", "changefreq",
        F.round(F.col("priority") * 10).cast("int").alias("prio_x10"),
        F.col("same_host").cast("int").alias("same_host"),
    )

    robots = spark.createDataFrame([_SITEMAP_ROBOTS], "url string, body string")
    host_udf = F.pandas_udf(
        lambda s: s.map(host_of), "string"
    )
    discovered = (
        robots.select(
            F.col("url").alias("sitemap_url"),
            F.explode(robots_sitemaps_udf()(F.col("body"))).alias("loc"),
        )
        .select(
            "sitemap_url",
            F.lit("robots").alias("kind"),
            "loc",
            F.col("loc").alias("url"),
            F.lit(None).cast("string").alias("lastmod"),
            F.lit(None).cast("string").alias("changefreq"),
            F.lit(None).cast("int").alias("prio_x10"),
            (host_udf(F.col("loc")) == host_udf(F.col("sitemap_url")))
            .cast("int").alias("same_host"),
        )
    )
    return discovered.unionByName(parsed)


# ---- RSS/Atom feed ingestion (sources/feeds.py) -------------------------
# Construction data for the fixture feeds; expected rows are hand-written
# literals below, not derived by running engine code.
_FEED_RSS = ("http://fone.example/feed.xml", [
    {"title": "A & B", "link": "http://fone.example/a", "guid": "g1",
     "pub": "Mon, 02 Feb 2026 03:04:05 GMT"},
    {"title": "Rel", "link": "/rel/path?x=1", "pub": "bogus date"},
    {"guid": "http://cdn.example/permalink"},   # permalink guid = link
    {"title": "NoLink"},                        # no link → dropped
])
_FEED_ATOM = ("http://atwo.example/blog/atom.xml", [
    {"title": "E1", "link": "http://atwo.example/e1", "guid": "id1",
     "pub": "2026-02-02T03:04:05Z"},
    {"title": "SelfOnly", "link": "http://atwo.example/self",
     "rel": "self"},                            # no alternate → dropped
    {"title": "E2", "link": "e2.html", "pub": "2026-02-02T03:04:05+02:00"},
])
_FEED_PAGE = ("http://page.example/p/index.html", (
    b'<html><head>'
    b'<link rel="alternate" type="application/rss+xml" href="/feed.xml">'
    b'<link type="application/atom+xml" rel="alternate" '
    b'href="http://x.example/atom">'
    b'<link rel="stylesheet" href="/s.css">'
    b'<link rel="alternate" type="text/html" href="/alt.html">'
    b'<link rel="alternate" type="application/rss+xml" href="/feed.xml">'
    b'</head></html>'
))
# (feed_url, kind, link, url, title, guid, pub_epoch, same_host)
_FEED_EXPECT = [
    ("http://page.example/p/index.html", "discovered_rss",
     "http://page.example/feed.xml", "http://page.example/feed.xml",
     None, None, None, 1),
    ("http://page.example/p/index.html", "discovered_atom",
     "http://x.example/atom", "http://x.example/atom", None, None, None, 0),
    ("http://fone.example/feed.xml", "rss", "http://fone.example/a",
     "http://fone.example/a", "A & B", "g1", 1770001445, 1),
    ("http://fone.example/feed.xml", "rss", "/rel/path?x=1",
     "http://fone.example/rel/path?x=1", "Rel", None, None, 1),
    ("http://fone.example/feed.xml", "rss", "http://cdn.example/permalink",
     "http://cdn.example/permalink", None, "http://cdn.example/permalink",
     None, 0),
    ("http://atwo.example/blog/atom.xml", "atom", "http://atwo.example/e1",
     "http://atwo.example/e1", "E1", "id1", 1770001445, 1),
    ("http://atwo.example/blog/atom.xml", "atom", "e2.html",
     "http://atwo.example/blog/e2.html", "E2", None, 1769994245, 1),
]


def q_feed_ingest(spark, sf_dir):
    """RSS/Atom ingestion + autodiscovery (sources/feeds.py): HTML
    ``<link rel=alternate type=application/(rss|atom)+xml>`` discovery
    rows unioned with parsed feed entries — links resolved against the
    feed URL through the engine normalizer, RFC 822 / RFC 3339 pub
    timestamps as integer epoch seconds, the cross-host flag the
    frontier gates on. The reference discovers URLs only from <a href>
    links (job.go link extraction); feeds are the standard freshness
    channel a Common-Crawl-style frontier adds. Oracle = hand-written
    literals from the construction data."""
    from ideacrawler_spark.sources.feeds import (
        build_atom,
        build_rss,
        discover_feeds,
        feed_to_entries,
    )

    files = spark.createDataFrame(
        [
            (_FEED_RSS[0], bytearray(build_rss("Blog", _FEED_RSS[1]))),
            (_FEED_ATOM[0], bytearray(build_atom("AFeed", _FEED_ATOM[1]))),
            ("http://bad.example/feed.xml", bytearray(b"<html>not a feed")),
        ],
        "url string, content binary",
    )
    parsed = feed_to_entries(files).select(
        "feed_url", "kind", "link", "url", "title", "guid", "pub_epoch",
        F.col("same_host").cast("int").alias("same_host"),
    )
    pages = spark.createDataFrame(
        [(_FEED_PAGE[0], bytearray(_FEED_PAGE[1]))],
        "url string, content binary",
    )
    discovered = discover_feeds(pages).select(
        F.col("page_url").alias("feed_url"),
        F.concat(F.lit("discovered_"), F.col("feed_type")).alias("kind"),
        F.col("feed_url").alias("link"),
        F.col("feed_url").alias("url"),
        F.lit(None).cast("string").alias("title"),
        F.lit(None).cast("string").alias("guid"),
        F.lit(None).cast("long").alias("pub_epoch"),
        _host_eq_int(F.col("feed_url"), F.col("page_url")),
    )
    return discovered.unionByName(parsed)


def _host_eq_int(a, b):
    from ideacrawler_spark.functions.urlnorm import host_of

    host_udf = F.pandas_udf(lambda s: s.map(host_of), "string")
    return (host_udf(a) == host_udf(b)).cast("int").alias("same_host")


def _feed_oracle_sql() -> str:
    rows = []
    for furl, kind, link, url, title, guid, pub, sh in _FEED_EXPECT:
        def q(v):
            return "NULL" if v is None else "'" + str(v).replace("'", "''") + "'"
        pub_s = "NULL::BIGINT" if pub is None else f"{pub}::BIGINT"
        rows.append(
            f"({q(furl)}, {q(kind)}, {q(link)}, {q(url)}, "
            f"{q(title)}::VARCHAR, {q(guid)}::VARCHAR, {pub_s}, {sh}::INT)"
        )
    return (
        "SELECT * FROM (VALUES " + ", ".join(rows)
        + ") AS t(feed_url, kind, link, url, title, guid, pub_epoch, "
        "same_host)"
    )


def _sitemap_oracle_sql() -> str:
    rows = []
    for smurl, kind, loc, url, lm, cf, px, sh in _SITEMAP_EXPECT:
        def q(v):
            return "NULL" if v is None else "'" + str(v).replace("'", "''") + "'"
        px_s = "NULL::INT" if px is None else f"{px}::INT"
        rows.append(
            f"({q(smurl)}, {q(kind)}, {q(loc)}, {q(url)}, "
            f"{q(lm)}::VARCHAR, {q(cf)}::VARCHAR, {px_s}, {sh}::INT)"
        )
    return (
        "SELECT * FROM (VALUES " + ", ".join(rows)
        + ") AS t(sitemap_url, kind, loc, url, lastmod, changefreq, "
        "prio_x10, same_host)"
    )


def _resources_oracle_sql() -> str:
    from urllib.parse import urljoin

    rows = []
    for url, assets in _RESOURCE_PAGES:
        # selector-group order: scripts, then links, then imgs
        ordered = [p for k, p in assets if k == "script"] + \
                  [p for k, p in assets if k == "link"] + \
                  [p for k, p in assets if k == "img"]
        import re as _re

        pos = 0
        for path in ordered:
            seg = path.split("/")[-1]
            # validateLink: last segment must contain '.<word>'; .xml skipped
            if _re.search(r"\.\w", seg) is None or path.endswith(".xml"):
                continue
            resolved = path if path.startswith("http") else urljoin(url, path)
            rows.append(f"('{url}', {pos}::INT, '{resolved}')")
            pos += 1
    return ("SELECT * FROM (VALUES " + ", ".join(rows)
            + ") AS t(url, pos, resource)")


# Constructed pages for the boilerplate oracle: the kept blocks are the
# long paragraphs BY CONSTRUCTION (nav/footer are pure link blocks with
# density 1; the short block is under min_chars), so the oracle derives
# main_text from this literal data without running the extractor.
_BOILER_PAGES = [
    ("http://bp0.example/a.html",
     ["This is the first real paragraph of the article body.",
      "A second substantive paragraph with enough characters to keep."]),
    ("http://bp1.example/b.html",
     ["Only one long content paragraph lives on this page here."]),
    ("http://bp2.example/c.html", []),
]


def q_main_text(spark, sf_dir):
    """Boilerplate removal (textops/boilerplate.py): link-dense nav and
    footer blocks drop, short blocks drop, article paragraphs stay."""
    from ideacrawler_spark.textops.boilerplate import extract_main_text

    rows = []
    for url, paras in _BOILER_PAGES:
        html = ['<html><body><div><a href="/">Home</a> <a href="/x">X</a>'
                ' <a href="/y">Y</a></div>']
        for p in paras:
            html.append(f"<p>{p}</p>")
        html.append("<p>tiny</p>")
        html.append('<div><a href="/about">About</a> <a href="/c">C</a></div>')
        html.append("</body></html>")
        rows.append((url, "".join(html).encode()))
    pages = spark.createDataFrame(rows, "url string, html binary")
    return extract_main_text(pages).select(
        "url", "main_text", "n_kept", "main_len")


def _main_text_oracle_sql() -> str:
    rows = []
    for url, paras in _BOILER_PAGES:
        main = "\n".join(paras)
        esc = main.replace("'", "''")
        rows.append(
            f"('{url}', '{esc}', {len(paras)}::INT, {len(main)}::INT)"
        )
    return ("SELECT * FROM (VALUES " + ", ".join(rows)
            + ") AS t(url, main_text, n_kept, main_len)")


# xpath-extraction fixture pages. The expectation columns in the oracle
# VALUES literal are derived BY HAND from these input literals (what a
# correct first-node evaluator must return), never from the evaluator.
_XPATH_PAGES = [
    ("http://x.example/a",
     "<html><head><title>Page A</title></head><body>"
     "<div class='hero'><span>hero <b>bold</b> A</span></div>"
     "<div class='foot'><span>foot A</span></div>"
     "<a class='l' href='/1'>  first A </a></body></html>",
     "Page A", "foot A", "hero bold A", "  first A "),
    ("http://x.example/b",
     "<html><head><title>B &amp; Co</title></head><body>"
     "<div class='foot'>plain foot</div>"
     "<a class='l' href='/2'>linkB</a><a class='l' href='/3'>other</a>"
     "</body></html>",
     "B & Co", "plain foot", "", "linkB"),
    ("http://x.example/c",
     "<html><head><title>C</title></head><body>"
     "<div><span>no-class span</span></div></body></html>",
     "C", "", "no-class span", ""),
    ("http://x.example/d",
     "<html><body><div class='foot'><div class='foot'>inner</div></div>"
     "<script><title>not a node</title></script></body></html>",
     "", "inner", "", ""),
]


def q_xpath_extract(spark, sf_dir):
    """Widened xpath subset (attribute predicates, child axis) as a
    first-class extraction query over constructed pages."""
    import pandas as pd

    from ideacrawler_spark.functions.extract import xpath_first_value

    pages = spark.createDataFrame(
        [(u, h.encode()) for (u, h, *_rest) in _XPATH_PAGES],
        "url string, html binary",
    )

    def batches(it):
        for pdf in it:
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "title": [xpath_first_value(b, "//title")
                              for b in pdf["html"]],
                    "foot": [xpath_first_value(b, "//div[@class='foot']")
                             for b in pdf["html"]],
                    "first_div_span": [xpath_first_value(b, "//div/span")
                                       for b in pdf["html"]],
                    "first_anchor": [xpath_first_value(b, "//a[@class='l']")
                                     for b in pdf["html"]],
                }
            )

    return pages.mapInPandas(
        batches,
        schema="url string, title string, foot string, "
               "first_div_span string, first_anchor string",
    )


def _xpath_oracle_sql() -> str:
    rows = []
    for url, _html, title, foot, div_span, anchor in _XPATH_PAGES:
        vals = ", ".join("'" + v.replace("'", "''") + "'"
                         for v in (url, title, foot, div_span, anchor))
        rows.append(f"({vals})")
    return ("SELECT * FROM (VALUES " + ", ".join(rows)
            + ") AS t(url, title, foot, first_div_span, first_anchor)")


# Directive fixture: (url, meta-name, meta-content, canonical-hrefs,
# x-robots-tag, expected noindex, nofollow, canonical literal). The
# expected canonical is HAND-WRITTEN (not derived by running the
# normalizer), keeping the oracle independent of engine code.
_DIRECTIVE_PAGES = [
    ("http://d0.example/a.html", "robots", "noindex, nofollow", [], None,
     1, 1, None),
    ("http://d0.example/b.html", "robots", "NOINDEX", ["/canon/b"], None,
     1, 0, "http://d0.example/canon/b"),
    ("http://d1.example/c.html", "googlebot", "noindex",
     ["HTTP://D1.example/Canon.html"], None,
     0, 0, "http://d1.example/Canon.html"),
    ("http://d1.example/d.html", None, None, [], "noindex",
     1, 0, None),
    ("http://d2.example/e.html", "ROBOTS", "none", [], None,
     1, 1, None),
    ("http://d2.example/f.html", "robots", " nofollow ",
     ["first.html", "second.html"], None,
     0, 1, "http://d2.example/first.html"),
    ("http://d2.example/g.html", None, None, [], None,
     0, 0, None),
]


def _directive_html(meta_name, meta_content, canonicals) -> bytes:
    parts = ["<html><head><title>t</title>"]
    if meta_name is not None:
        parts.append(f'<meta name="{meta_name}" content="{meta_content}">')
    for href in canonicals:
        parts.append(f'<link rel="canonical" href="{href}">')
    parts.append('</head><body><a href="/x.html">x</a></body></html>')
    return "".join(parts).encode()


def q_page_directives(spark, sf_dir):
    """Page-level robots directives (functions/directives.py): meta
    robots / X-Robots-Tag noindex+nofollow and first rel=canonical,
    resolved+canonicalized into the seen-set keyspace — the
    corpus-inclusion half of the robots contract the reference's
    fetch-time-only enforcement leaves open. Oracle = hand-written
    literals from the construction data."""
    from ideacrawler_spark.functions.directives import directives_table

    rows = [
        (url, bytearray(_directive_html(mn, mc, canon)), xrt)
        for url, mn, mc, canon, xrt, *_ in _DIRECTIVE_PAGES
    ]
    pages = spark.createDataFrame(
        rows, "url string, html binary, x_robots_tag string"
    )
    return directives_table(pages, xrt_col="x_robots_tag").select(
        "url",
        F.col("noindex").cast("int").alias("noindex"),
        F.col("nofollow").cast("int").alias("nofollow"),
        "canonical_url",
    )


def _page_directives_oracle_sql() -> str:
    rows = []
    for url, _mn, _mc, _c, _x, ni, nf, canon in _DIRECTIVE_PAGES:
        c = "NULL::VARCHAR" if canon is None else f"'{canon}'"
        rows.append(f"('{url}', {ni}::INT, {nf}::INT, {c})")
    return ("SELECT * FROM (VALUES " + ", ".join(rows)
            + ") AS t(url, noindex, nofollow, canonical_url)")


def q_canonical_groups(spark, sf_dir):
    """Canonical-cluster consolidation: indexable pages grouped by their
    elected representative coalesce(canonical_url, url) — the
    page-declared dedup pass that runs BEFORE content fingerprints.
    Composes directives_table with a count/min aggregation (map-side
    partial agg, one shuffle on the canonical key)."""
    from ideacrawler_spark.functions.directives import directives_table

    extra = [
        ("http://g.example/p1.html", ["/master"], None),
        ("http://g.example/p2.html", ["/master"], None),
        ("http://g.example/p3.html", ["/master"], None),
        ("http://g.example/master", [], None),
        ("http://g.example/hidden.html", ["/master"], "noindex"),
    ]
    rows = [
        (url, bytearray(_directive_html(None, None, canon)), xrt)
        for url, canon, xrt in extra
    ] + [
        (url, bytearray(_directive_html(mn, mc, canon)), xrt)
        for url, mn, mc, canon, xrt, *_ in _DIRECTIVE_PAGES
    ]
    pages = spark.createDataFrame(
        rows, "url string, html binary, x_robots_tag string"
    )
    d = directives_table(pages, xrt_col="x_robots_tag")
    return (
        d.filter(~F.col("noindex"))
        .groupBy(F.coalesce("canonical_url", "url").alias("canonical"))
        .agg(F.count("*").cast("int").alias("n_pages"),
             F.min("url").alias("representative"))
    )


def _canonical_groups_oracle_sql() -> str:
    # expected clusters, hand-derived from the construction data above:
    # indexable pages = p1,p2,p3,master (→ /master), plus the
    # non-noindex _DIRECTIVE_PAGES rows grouped by their canonical.
    expect = [
        ("http://g.example/master", 4, "http://g.example/master"),
        ("http://d1.example/Canon.html", 1, "http://d1.example/c.html"),
        ("http://d2.example/first.html", 1, "http://d2.example/f.html"),
        ("http://d2.example/g.html", 1, "http://d2.example/g.html"),
    ]
    rows = ", ".join(f"('{c}', {n}::INT, '{r}')" for c, n, r in expect)
    return ("SELECT * FROM (VALUES " + rows
            + ") AS t(canonical, n_pages, representative)")


def q_resolve_redirects(spark, sf_dir):
    """Redirect-chain resolution (operators/redirects.py): pointer
    doubling over (src → Location) edges — 4 joins resolve chains up to
    16 hops; cycles and over-budget chains surface as looped=1. Edge set
    = descending chains derived from documents doc_ids (terminals at
    multiples of 10) + a 31-hop literal chain (past the 16 budget) + a
    2-cycle. Oracle = recursive-CTE chase, an entirely different
    algorithm landing on the same fixpoint."""
    from ideacrawler_spark.operators.redirects import resolve_redirects

    docs = _load(spark, sf_dir, "documents")
    e1 = docs.filter((F.col("doc_id") % 10) != 0).select(
        F.concat(F.lit("http://r.example/u"),
                 F.col("doc_id").cast("string")).alias("src"),
        F.concat(F.lit("http://r.example/u"),
                 (F.col("doc_id") - 1).cast("string")).alias("dst"),
    )
    e2 = spark.range(31).select(
        F.concat(F.lit("http://r.example/c"),
                 F.col("id").cast("string")).alias("src"),
        F.concat(F.lit("http://r.example/c"),
                 (F.col("id") + 1).cast("string")).alias("dst"),
    )
    e3 = spark.createDataFrame(
        [("http://r.example/loopA", "http://r.example/loopB"),
         ("http://r.example/loopB", "http://r.example/loopA")],
        "src string, dst string",
    )
    out = resolve_redirects(e1.unionByName(e2).unionByName(e3), max_hops=16)
    return out.select("src", "final_url", "hops",
                      F.col("looped").cast("int").alias("looped"))


_REDIRECTS_ORACLE = """
    WITH RECURSIVE e AS (
      SELECT 'http://r.example/u' || doc_id AS src,
             'http://r.example/u' || (doc_id - 1) AS dst
      FROM documents WHERE doc_id % 10 <> 0
      UNION ALL
      SELECT 'http://r.example/c' || i, 'http://r.example/c' || (i + 1)
      FROM range(0, 31) t(i)
      UNION ALL
      SELECT * FROM (VALUES
        ('http://r.example/loopA', 'http://r.example/loopB'),
        ('http://r.example/loopB', 'http://r.example/loopA')) v(s, d)
    ),
    e1 AS (SELECT src, min(dst) AS dst FROM e GROUP BY src),
    chase(src, cur, hops) AS (
      SELECT src, dst, 1 FROM e1
      UNION ALL
      SELECT c.src, n.dst, c.hops + 1
      FROM chase c JOIN e1 n ON n.src = c.cur
      WHERE c.hops < 16
    ),
    last AS (
      SELECT src, cur, hops FROM chase
      QUALIFY row_number() OVER (PARTITION BY src ORDER BY hops DESC) = 1
    )
    SELECT l.src, l.cur AS final_url, l.hops::INT AS hops,
           (CASE WHEN o.src IS NULL THEN 0 ELSE 1 END)::INT AS looped
    FROM last l LEFT JOIN e1 o ON o.src = l.cur
"""


def q_dedup_components(spark, sf_dir):
    """Near-dup cluster consolidation: connected components (min-label
    propagation to fixpoint — the iterative-algorithm class) over the
    capped MinHash LSH candidate pairs."""
    from ideacrawler_spark.textops.dedup import dedup_components

    pairs = minhash_lsh_pairs(_load(spark, sf_dir, "documents"), bucket_cap=64)
    return dedup_components(pairs)


def q_dedup_cluster_sizes(spark, sf_dir):
    """Cluster-size histogram over the near-dup components — the dedup
    report's lead number."""
    from ideacrawler_spark.textops.dedup import (
        cluster_size_histogram,
        dedup_components,
    )

    pairs = minhash_lsh_pairs(_load(spark, sf_dir, "documents"), bucket_cap=64)
    return cluster_size_histogram(dedup_components(pairs))


def q_dedup_keep_best(spark, sf_dir):
    """Representative selection over the near-dup clusters: keep the
    LONGEST doc per cluster (ties → min doc_id), singletons keep
    themselves — the keep-list step after components. Oracle re-derives
    the components recursively, then applies the same argmax window."""
    from ideacrawler_spark.textops.dedup import (
        dedup_components,
        dedup_keep_best,
    )

    docs = _load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, bucket_cap=64)
    scored = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("score"))
    return dedup_keep_best(scored, dedup_components(pairs))


def q_shard_plan(spark, sf_dir):
    """Output-shard manifest: docs assigned to fixed-token-budget shards
    by global token offset (two-phase prefix sum, no corpus window)."""
    from ideacrawler_spark.textops.packing import shard_plan

    return shard_plan(_load(spark, sf_dir, "documents"),
                      shard_tokens=4096)


def q_incremental_near_dup(spark, sf_dir):
    """Incremental dedup: the doc_id >= 250 batch checked against the
    doc_id < 250 corpus via the band tables — no corpus self-join."""
    from ideacrawler_spark.textops.dedup import incremental_near_dup

    docs = _load(spark, sf_dir, "documents")
    return incremental_near_dup(
        docs.filter(F.col("doc_id") >= 250),
        docs.filter(F.col("doc_id") < 250),
    )


def q_stratified_sample(spark, sf_dir):
    """Deterministic hash-sampled training-data mix: per-language integer
    rates over the portable h60 hash (map-side filter, no shuffle)."""
    from ideacrawler_spark.textops.sampling import stratified_sample

    docs = _load(spark, sf_dir, "documents")
    return stratified_sample(
        docs,
        rates={"en": (2, 3), "de": (1, 2), "zh": (1, 4)},
        default_rate=(1, 8),
    ).select("doc_id", "lang", "source")


_SAMPLE_RATE_SQL = """
    CASE lang WHEN 'en' THEN {h} % 3 < 2
              WHEN 'de' THEN {h} % 2 < 1
              WHEN 'zh' THEN {h} % 4 < 1
              ELSE {h} % 8 < 1 END
""".format(h=_h60_sql("CAST(doc_id AS VARCHAR)"))


def q_repeated_lines(spark, sf_dir):
    """C4-style corpus-level repeated-line removal over deterministic
    4-word 'lines' derived from the documents text (the raw table is
    space-separated words; the chunking rule is re-derived identically
    by the oracle)."""
    from ideacrawler_spark.textops.dedup import remove_repeated_lines

    docs = _load(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    nlines = F.ceil(F.size(w) / F.lit(4)).cast("int")
    lines_arr = F.transform(
        F.sequence(F.lit(0), nlines - 1),
        lambda i: F.concat_ws(" ", F.slice(w, i * 4 + 1, 4)),
    )
    chunked = docs.select(
        "doc_id", F.concat_ws("\n", lines_arr).alias("text"))
    return remove_repeated_lines(chunked, max_occurrences=1)


def q_c4_filter(spark, sf_dir):
    """C4 heuristic cleaning (textops/c4.py): terminal-punctuation /
    min-words / 'javascript' line rules + lorem-ipsum / brace / min-kept
    document rules over deterministic 5-word lines rebuilt from the
    documents text, with rule-triggering lines injected at doc_id
    multiples of 97/101/103 so every rule fires in the oracle data.
    Zero-UDF, zero-shuffle map pass."""
    from ideacrawler_spark.textops.c4 import c4_document_filter

    docs = _load(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    nlines = F.ceil(F.size(w) / F.lit(5)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), nlines - 1),
        lambda i: F.concat(
            F.concat_ws(" ", F.slice(w, i * 5 + 1, 5)),
            F.when((F.col("doc_id") + i) % 3 == 0, F.lit("."))
            .when((F.col("doc_id") + i) % 3 == 1, F.lit("!"))
            .otherwise(F.lit("")),
        ),
    )
    t = F.array_join(chunks, "\n")
    t = F.when(F.col("doc_id") % 97 == 0,
               F.concat(t, F.lit("\nsee the javascript code now."))
               ).otherwise(t)
    t = F.when(F.col("doc_id") % 101 == 0,
               F.concat(t, F.lit("\nlorem ipsum dolor sit amet here."))
               ).otherwise(t)
    t = F.when(F.col("doc_id") % 103 == 0,
               F.concat(t, F.lit("\nvar x = { a closing line."))
               ).otherwise(t)
    return c4_document_filter(docs.select("doc_id", t.alias("text")))


_C4_ORACLE = """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    built AS (
      SELECT doc_id,
        array_to_string(list_transform(
          range(0, CAST(ceil(len(w) / 5.0) AS BIGINT)),
          i -> array_to_string(w[(i*5+1):(i*5+5)], ' ') ||
               CASE (doc_id + i) % 3 WHEN 0 THEN '.' WHEN 1 THEN '!'
                    ELSE '' END), chr(10))
        || CASE WHEN doc_id % 97 = 0
                THEN chr(10) || 'see the javascript code now.' ELSE '' END
        || CASE WHEN doc_id % 101 = 0
                THEN chr(10) || 'lorem ipsum dolor sit amet here.'
                ELSE '' END
        || CASE WHEN doc_id % 103 = 0
                THEN chr(10) || 'var x = { a closing line.' ELSE '' END
        AS text
      FROM w),
    ls AS (SELECT doc_id, text, string_split(text, chr(10)) AS ls
           FROM built),
    k AS (SELECT doc_id, text, ls,
            list_filter(ls, l ->
              regexp_matches(trim(l), '[.!?"]$')
              AND len(regexp_split_to_array(trim(l), ' +')) >= 5
              AND NOT contains(lower(trim(l)), 'javascript')) AS kept
          FROM ls)
    SELECT doc_id, len(ls)::INT AS n_lines, len(kept)::INT AS n_kept,
           (CASE WHEN len(kept) >= 3
                 AND NOT contains(lower(text), 'lorem ipsum')
                 AND NOT contains(text, '{')
                 THEN 1 ELSE 0 END)::INT AS keep_doc,
           md5(array_to_string(list_transform(kept, l -> trim(l)),
                               chr(10))) AS kept_md5
    FROM k
"""


def q_mirror_hosts(spark, sf_dir):
    """Mirror-site detection (textops/mirrors.py): host pairs sharing
    ≥3 content fingerprints, pair generation bucket-capped at 8 hosts
    per fingerprint and expanded array-side (no self-join shuffle).
    Fingerprints = doc_id mod 137 over the documents sources. The
    oracle reaches the same pairs by an equi-join on the capped
    exploded table — a different algorithm."""
    from ideacrawler_spark.textops.mirrors import mirror_host_pairs

    docs = _load(spark, sf_dir, "documents")
    rows = docs.select(
        F.col("source").alias("host"),
        (F.col("doc_id") % 137).alias("content_key"),
    )
    return mirror_host_pairs(rows, host_cap=8, min_shared=3)


_MIRRORS_ORACLE = """
    WITH r AS (SELECT DISTINCT source AS h, doc_id % 137 AS k
               FROM documents),
    hk AS (SELECT k, list_sort(list(DISTINCT h))[1:8] AS hs
           FROM r GROUP BY k),
    hkx AS (SELECT k, unnest(hs) AS h FROM hk WHERE len(hs) >= 2),
    pairs AS (SELECT a.h AS host_a, b.h AS host_b
              FROM hkx a JOIN hkx b ON a.k = b.k AND a.h < b.h)
    SELECT host_a, host_b, count(*)::INT AS n_shared
    FROM pairs GROUP BY host_a, host_b HAVING count(*) >= 3
"""


def q_ngram_repetition(spark, sf_dir):
    from ideacrawler_spark.textops.analysis import ngram_repetition

    return ngram_repetition(_load(spark, sf_dir, "documents"), n=2)


def q_source_stats(spark, sf_dir):
    """Host/source-level curation aggregates (domain filtering input)."""
    from ideacrawler_spark.textops.analysis import source_stats

    return source_stats(_load(spark, sf_dir, "documents"))


def q_url_quality(spark, sf_dir):
    """Frontier URL gating: suffix-blocklist verdict + integer spam
    signals over four deterministic URL shapes derived from events."""
    from ideacrawler_spark.operators.urlfilter import (
        blocklist_filter, url_signals,
    )

    ev = _load(spark, sf_dir, "events")
    k = (F.col("user_id") % 7).cast("string")
    i = F.col("event_id").cast("string")
    v = F.col("event_id") % 4
    host = (
        F.when(v == 0, F.concat(F.lit("host"), k, F.lit(".example")))
        .when(v == 1, F.concat(F.lit("spam"), k, F.lit("42.example")))
        .when(v == 2, F.concat(F.lit("ads.host"), k, F.lit(".example")))
        .otherwise(F.concat(F.lit("host"), k, F.lit(".example")))
    )
    url = (
        F.when(v == 0, F.concat(F.lit("http://"), host, F.lit("/p/"), i))
        .when(v == 1, F.concat(F.lit("http://"), host,
                               F.lit("/p/a/b/c/"), i,
                               F.lit("?x=1&y=2&z=3")))
        .when(v == 2, F.concat(F.lit("http://"), host, F.lit("/click/"), i,
                               F.lit("?id="), i))
        .otherwise(F.concat(F.lit("http://"), host, F.lit("/p/"), i,
                            F.lit("?ref=abc")))
    )
    fr = ev.select(F.col("event_id"), url.alias("url"), host.alias("host"))
    out = blocklist_filter(fr, ["host5.example", "spam242.example"])
    return url_signals(out).select(
        "event_id", "url", "host", "blocked",
        "n_host_digits", "path_depth", "n_params")


def q_pii_scrub(spark, sf_dir):
    """PII redaction over documents text with deterministic synthetic PII
    appended by doc_id class (the raw fixture text carries none) — the
    oracle re-derives the same suffixes and applies identical RE2/Java-
    safe patterns."""
    from ideacrawler_spark.textops.pii import scrub_pii

    docs = _load(spark, sf_dir, "documents")
    suffix = (
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.lit(" contact user"),
                        F.col("doc_id").cast("string"),
                        F.lit("@example.com now")))
        .when(F.col("doc_id") % 4 == 1,
              F.concat(F.lit(" server 10.0."),
                       (F.col("doc_id") % 256).cast("string"),
                       F.lit(".7 up")))
        .when(F.col("doc_id") % 4 == 2,
              F.concat(F.lit(" call +12125550"),
                       (F.col("doc_id") % 100).cast("string"),
                       F.lit(" today")))
        .otherwise(F.lit(""))
    )
    seeded = docs.select(
        "doc_id", F.concat(F.col("text"), suffix).alias("text"))
    return scrub_pii(seeded)


def q_pipeline_curation(spark, sf_dir):
    """The end-to-end training-data pipeline as ONE composed plan:
    corpus repeated-line removal (C4 rule, 4-word chunk lines) → exact
    dedup KEEPERS computed on the CLEANED text → quality gates on the
    cleaned text → deterministic per-language hash sampling. Every stage
    is the same operator the standalone oracled queries run; the oracle
    chains the same SQL logic end-to-end, so the whole composition is
    value-checked, not just its pieces."""
    from ideacrawler_spark.textops.analysis import quality_score
    from ideacrawler_spark.textops.dedup import (
        exact_dedup,
        remove_repeated_lines,
    )
    from ideacrawler_spark.textops.sampling import stratified_sample

    docs = _load(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    nlines = F.ceil(F.size(w) / F.lit(4)).cast("int")
    lines_arr = F.transform(
        F.sequence(F.lit(0), nlines - 1),
        lambda i: F.concat_ws(" ", F.slice(w, i * 4 + 1, 4)),
    )
    chunked = docs.select(
        "doc_id", F.concat_ws("\n", lines_arr).alias("text"))
    cleaned = remove_repeated_lines(chunked, max_occurrences=1)
    base = (
        cleaned.join(docs.select("doc_id", "lang", "source"), "doc_id")
        .select(
            "doc_id", "lang", "source",
            F.regexp_replace("clean_text", "\n", " ").alias("text"),
            "n_kept", "n_dropped",
        )
    )
    keepers = exact_dedup(base).filter(~F.col("is_dup")).select("doc_id")
    q = quality_score(base).select(
        "doc_id", "n_words", "ttr_x1000", "stop_x1000")
    gated = (
        base.join(keepers, "doc_id").join(q, "doc_id")
        .filter((F.col("n_words") >= 8) & (F.col("ttr_x1000") >= 400)
                & (F.col("stop_x1000") <= 400))
    )
    sampled = stratified_sample(
        gated, rates={"en": (2, 3), "de": (1, 2), "zh": (1, 4)},
        default_rate=(1, 8))
    return sampled.select(
        "doc_id", "lang", "source", "n_kept", "n_dropped",
        "n_words", "ttr_x1000", "stop_x1000")


def q_pipeline_pretrain(spark, sf_dir):
    """The r5 curation stages composed into ONE plan: benchmark
    decontamination (anti-join on broadcast bench 8-grams) → duplicated-
    span gate (docs more than half duplicated drop) → quality gates →
    per-source cap. Each stage is the standalone oracled operator; the
    oracle chains the same SQL, value-checking the COMPOSITION."""
    from ideacrawler_spark.textops.analysis import quality_score
    from ideacrawler_spark.textops.sampling import per_source_cap
    from ideacrawler_spark.textops.spans import (
        bench_ngrams,
        contamination,
        duplicate_spans,
    )

    docs = _load(spark, sf_dir, "documents")
    cont = contamination(docs, bench_ngrams(docs)).select("doc_id")
    spans = (
        duplicate_spans(docs)
        .filter(F.col("n_dup_tokens") * 2 < F.col("n_tokens"))
        .select("doc_id", "n_tokens")
    )
    q = quality_score(docs).filter(
        (F.col("n_words") >= 8)
        & (F.col("ttr_x1000") >= 400)
        & (F.col("stop_x1000") <= 400)
    ).select("doc_id")
    keep = (
        docs.join(cont, "doc_id", "left_anti")
        .join(spans, "doc_id")
        .join(q, "doc_id")
    )
    return per_source_cap(keep, cap=10).select(
        "doc_id", "source", "n_tokens", "src_rank")


def q_pipeline_v3(spark, sf_dir):
    """Pipeline v2 plus the classifier gate — every quality family
    (heuristic, span-dup, contamination, linear classifier) composed in
    one value-checked plan."""
    from ideacrawler_spark.textops.classify import classifier_score

    clf = (
        classifier_score(_load(spark, sf_dir, "documents"))
        .filter(F.col("keep")).select("doc_id")
    )
    return q_pipeline_pretrain(spark, sf_dir).join(clf, "doc_id")


def q_multimodal_features(spark, sf_dir):
    from ideacrawler_spark.textops.multimodal import extract_features, synth_media

    return extract_features(synth_media(spark, n_png=16, n_mp4=16)).select(
        "media_id", "kind", "n_bytes", "checksum",
        "dec_width", "dec_height", "dec_duration_ms", "dec_nsamples",
        "dec_status",
    )


def q_pjpeg_features(spark, sf_dir):
    """Progressive-JPEG (SOF2) decode through the Spark surface: the
    engine runs the full T.81 Annex G multi-scan path (DC first +
    refinement, AC spectral selection with EOB runs, two successive-
    approximation passes — textops/jpeg.py) on solid-gray fixtures
    chosen to decode bit-exactly, so the oracle re-derives dims, decode
    provenance, and per-channel means arithmetically."""
    from ideacrawler_spark.textops.multimodal import (
        extract_features, synth_media)

    feats = extract_features(synth_media(spark, n=0, n_pjpeg=12))
    return feats.select(
        "media_id", "kind", "dec_status", "dec_width", "dec_height",
        F.col("feat").getItem(2).cast("int").alias("mean_r"),
        F.col("feat").getItem(3).cast("int").alias("mean_g"),
        F.col("feat").getItem(4).cast("int").alias("mean_b"),
    )


def q_frame_features(spark, sf_dir):
    """Sampled-frame decode over MJPEG-in-MP4 videos: the engine parses
    stts/stsz/stco sample tables from the container BYTES, slices each
    sampled frame out of mdat and decodes it with the baseline-JPEG
    decoder; the oracle re-derives dims/channel-means arithmetically
    (solid-gray frames chosen to decode bit-exactly)."""
    from ideacrawler_spark.textops.multimodal import frame_sample, synth_media

    return frame_sample(
        synth_media(spark, n=0, n_mjpeg=16), every_ms=500
    ).select("media_id", "ts_ms", "frame_idx", "dec_status",
             "frame_w", "frame_h", "mean_r", "mean_g", "mean_b")


# --------------------------------------------------------------------------
# contract entry points
# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: deterministic crawl-order linearization at sf0.001."""
    return q_crawl_order(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "crawl_order": q_crawl_order,
        "budget_admit": q_budget_admit,
        "budget_robots": q_budget_robots,
        "seen_antijoin": q_seen_antijoin,
        "first_occurrence": q_first_occurrence,
        "crawl_metrics": q_crawl_metrics,
        "eligibility": q_eligibility,
        "outlink_sets": q_outlink_sets,
        "outlinks_resources": q_outlinks_resources,
        "canonicalize": q_canonicalize,
        "resolve": q_resolve,
        "host_shard": q_host_shard,
        "dedup_exact": q_dedup_exact,
        "minhash_signatures": q_minhash_signatures,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "simhash": q_simhash,
        "ngram_jaccard": q_ngram_jaccard,
        "embedding_topk": q_embedding_topk,
        "ivf_topk": q_ivf_topk,
        "ivf_train": q_ivf_train,
        "ann_lsh_buckets": q_ann_lsh_buckets,
        "embedding_near_dup": q_embedding_near_dup,
        "embedding_near_dup_banded": q_embedding_near_dup_banded,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_recall": q_ann_recall,
        "ivf_recall": q_ivf_recall,
        "semdedup": q_semdedup,
        "dsir_select": q_dsir_select,
        "cdx_lookup": q_cdx_lookup,
        "revalidate": q_revalidate,
        "pq_train": q_pq_train,
        "pq_codes": q_pq_codes,
        "pq_topk": q_pq_topk,
        "embedding_l2_topk": q_embedding_l2_topk,
        "pq_recall": q_pq_recall,
        "curation": q_curation,
        "langid": q_langid,
        "quality": q_quality,
        "token_count": q_token_count,
        "fingerprint": q_fingerprint,
        "lm_surprisal": q_lm_surprisal,
        "sequence_pack": q_sequence_pack,
        "chunk_documents": q_chunk_documents,
        "duplicate_spans": q_duplicate_spans,
        "contamination": q_contamination,
        "mixture_weights": q_mixture_weights,
        "hll_registers": q_hll_registers,
        "bpe_train": q_bpe_train,
        "bpe_token_count": q_bpe_token_count,
        "surprisal_buckets": q_surprisal_buckets,
        "per_source_cap": q_per_source_cap,
        "cms_registers": q_cms_registers,
        "token_quantiles": q_token_quantiles,
        "weighted_mix": q_weighted_mix,
        "host_degrees": q_host_degrees,
        "host_pagerank": q_host_pagerank,
        "term_retrieval": q_term_retrieval,
        "token_postings": q_token_postings,
        "snapshot_delta": q_snapshot_delta,
        "recrawl_schedule": q_recrawl_schedule,
        "feed_refresh": q_feed_refresh,
        "frontier_prioritized": q_frontier_prioritized,
        "anchor_corpus": q_anchor_corpus,
        "host_trustrank": q_host_trustrank,
        "url_templates": q_url_templates,
        "classifier_score": q_classifier_score,
        "host_hits": q_host_hits,
        "tokenizer_fertility": q_tokenizer_fertility,
        "dedup_cluster_sizes": q_dedup_cluster_sizes,
        "incremental_near_dup": q_incremental_near_dup,
        "shard_plan": q_shard_plan,
        "events_hourly": q_events_hourly,
        "segment_orders": q_segment_orders,
        "lineitem_groups": q_lineitem_groups,
        "crawl_flagship": q_crawl_flagship,
        "crawl_gated": q_crawl_gated,
        "crawl_feeds": q_crawl_feeds,
        "warc_ingest": q_warc_ingest,
        "warc_roundtrip": q_warc_roundtrip,
        "sitemap_ingest": q_sitemap_ingest,
        "feed_ingest": q_feed_ingest,
        "dedup_keep_best": q_dedup_keep_best,
        "main_text": q_main_text,
        "xpath_extract": q_xpath_extract,
        "dedup_components": q_dedup_components,
        "resolve_redirects": q_resolve_redirects,
        "page_directives": q_page_directives,
        "canonical_groups": q_canonical_groups,
        "stratified_sample": q_stratified_sample,
        "repeated_lines": q_repeated_lines,
        "c4_filter": q_c4_filter,
        "mirror_hosts": q_mirror_hosts,
        "ngram_repetition": q_ngram_repetition,
        "pii_scrub": q_pii_scrub,
        "url_quality": q_url_quality,
        "source_stats": q_source_stats,
        "multimodal_features": q_multimodal_features,
        "pjpeg_features": q_pjpeg_features,
        "frame_features": q_frame_features,
        "pipeline_curation": q_pipeline_curation,
        "pipeline_pretrain": q_pipeline_pretrain,
        "pipeline_v3": q_pipeline_v3,
    }


def oracle_sql() -> dict[str, str]:
    dotq = _DOTQ_SQL
    d = _oracle_sql_base(dotq)
    # ANN recall@5: composed from the two independently-oracled top-k
    # queries (the LSH one re-ranked to k=5), so the evaluation metric a
    # production ANN deployment monitors is itself value-checked.
    lsh5 = d["ann_lsh_topk"].replace("QUALIFY rank <= 3",
                                     "QUALIFY rank <= 5")
    d["ann_recall"] = f"""
        WITH exact AS (
          SELECT query_id, neighbor_id FROM ({d["embedding_topk"]})),
        approx AS (
          SELECT vec_id AS query_id, neighbor_id FROM ({lsh5})),
        hits AS (
          SELECT query_id, count(*)::INT AS n_hits
          FROM (SELECT * FROM exact INTERSECT SELECT * FROM approx)
          GROUP BY query_id)
        SELECT q.query_id, q.k, coalesce(h.n_hits, 0)::INT AS n_hits
        FROM (SELECT query_id, count(*)::INT AS k
              FROM exact GROUP BY query_id) q
        LEFT JOIN hits h USING (query_id)
    """
    d.update(_pq_oracle_sqls())
    d.update(_bpe_oracle_sqls())
    # r5 composed pipeline: decontaminate → span-dup gate → quality →
    # per-source cap, chained from the standalone oracled stage SQLs so
    # the composition itself is value-checked.
    d["pipeline_pretrain"] = f"""
        WITH spans AS ({d["duplicate_spans"]}),
        cont AS ({d["contamination"]}),
        q AS ({d["quality"]}),
        keep AS (
          SELECT d.doc_id, d.source, s.n_tokens
          FROM documents d
          JOIN spans s USING (doc_id)
          JOIN q USING (doc_id)
          WHERE s.n_dup_tokens * 2 < s.n_tokens
            AND q.n_words >= 8 AND q.ttr_x1000 >= 400
            AND q.stop_x1000 <= 400
            AND d.doc_id NOT IN (SELECT doc_id FROM cont))
        SELECT * FROM (
          SELECT doc_id, source, n_tokens,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY doc_id)::INT AS src_rank
          FROM keep)
        WHERE src_rank <= 10
    """
    # cluster-size histogram over the (oracled) component labels
    d["dedup_cluster_sizes"] = f"""
        WITH c AS ({d["dedup_components"]})
        SELECT cluster_size, count(*)::BIGINT AS n_clusters
        FROM (SELECT component, count(*)::BIGINT AS cluster_size
              FROM c GROUP BY component)
        GROUP BY cluster_size
    """
    # per-lang fertility over the (oracled) per-doc BPE counts
    d["tokenizer_fertility"] = f"""
        WITH btc AS ({d["bpe_token_count"]})
        SELECT d.lang,
               count(*)::BIGINT AS n_docs,
               sum(b.n_words)::BIGINT AS n_words,
               sum(b.n_bpe_tokens)::BIGINT AS n_bpe_tokens,
               ((sum(b.n_bpe_tokens) * 1000) // sum(b.n_words))::BIGINT
                 AS fert_x1000
        FROM btc b JOIN documents d USING (doc_id)
        GROUP BY d.lang
    """
    # pipeline v3 = v2 + the classifier gate, the full gate stack
    d["pipeline_v3"] = f"""
        WITH pp AS ({d["pipeline_pretrain"]}),
        clf AS ({d["classifier_score"]})
        SELECT pp.doc_id, pp.source, pp.n_tokens, pp.src_rank
        FROM pp JOIN clf USING (doc_id)
        WHERE clf.keep
    """
    # IVF recall@5: same composition over the (oracled) ivf_topk query.
    d["ivf_recall"] = f"""
        WITH exact AS (
          SELECT query_id, neighbor_id FROM ({d["embedding_topk"]})),
        approx AS (
          SELECT query_id, neighbor_id FROM ({d["ivf_topk"]})),
        hits AS (
          SELECT query_id, count(*)::INT AS n_hits
          FROM (SELECT * FROM exact INTERSECT SELECT * FROM approx)
          GROUP BY query_id)
        SELECT q.query_id, q.k, coalesce(h.n_hits, 0)::INT AS n_hits
        FROM (SELECT query_id, count(*)::INT AS k
              FROM exact GROUP BY query_id) q
        LEFT JOIN hits h USING (query_id)
    """
    # SemDeDup: mirror of textops/similarity.py::semdedup over the planted
    # input (_semdedup_input) — integer fixed-point at SEMQ=1000 and the
    # division-free cosine test d>0 AND d^2*25 >= 16*n2*rn2 (tau=4/5).
    d["semdedup"] = """
        WITH base AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
          FROM embeddings),
        allv AS (
          SELECT vec_id, e FROM base
          UNION ALL
          SELECT vec_id + 1000, e FROM base WHERE vec_id % 7 = 0
          UNION ALL
          SELECT vec_id + 2000, list_transform(e, x -> x * 0.9)
          FROM base WHERE vec_id % 7 = 0
          UNION ALL
          SELECT vec_id + 3000, list_transform(e, x -> -x)
          FROM base WHERE vec_id % 7 = 0),
        q AS (
          SELECT vec_id,
                 list_transform(e, x -> CAST(floor(x * 1000) AS BIGINT)) AS q
          FROM allv),
        cents AS (SELECT vec_id AS cell, q AS cq FROM q WHERE vec_id < 8),
        asg AS (
          SELECT vec_id, q, cell,
                 (list_sum(list_transform(range(1, len(q) + 1),
                                          i -> q[i] * q[i])))::BIGINT AS n2
          FROM (
            SELECT e.vec_id, e.q, c.cell,
                   list_sum(list_transform(range(1, len(e.q) + 1),
                            i -> (e.q[i] - c.cq[i]) * (e.q[i] - c.cq[i]))) AS dd
            FROM q e CROSS JOIN cents c)
          QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dd, cell) = 1),
        reps AS (
          SELECT cell, vec_id AS rep_id, q AS rq, n2 AS rn2
          FROM asg
          QUALIFY row_number() OVER (PARTITION BY cell ORDER BY vec_id) <= 128),
        pairs AS (
          SELECT a.vec_id, r.rep_id, a.n2, r.rn2,
                 (list_sum(list_transform(range(1, len(a.q) + 1),
                                          i -> a.q[i] * r.rq[i])))::BIGINT AS d
          FROM asg a JOIN reps r
            ON a.cell = r.cell AND r.rep_id < a.vec_id),
        dup AS (
          SELECT vec_id, min(rep_id) AS dup_of
          FROM pairs
          WHERE d > 0 AND d * d * 25 >= 16 * n2 * rn2
          GROUP BY vec_id)
        SELECT a.vec_id, a.cell,
               (CASE WHEN dup.dup_of IS NULL THEN 1 ELSE 0 END)::INT AS kept,
               coalesce(dup.dup_of, -1)::BIGINT AS dup_of
        FROM asg a LEFT JOIN dup USING (vec_id)
    """
    # DSIR importance resampling: mirror of textops/dsir.py::dsir_select
    # (hashed unigram buckets, add-one-smoothed integer ratio weights,
    # per-doc occurrence-weight sums, top-100 by (score desc, doc_id)).
    d["dsir_select"] = f"""
        WITH words AS (
          SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
          FROM documents),
        b AS (
          SELECT doc_id, lang, ({_h60_sql('w')} % 4096) AS b FROM words),
        raw AS (SELECT b, count(*) AS r FROM b GROUP BY b),
        tgt AS (SELECT b, count(*) AS t FROM b WHERE lang = 'en' GROUP BY b),
        wt AS (
          SELECT raw.b,
                 (1000000 * (coalesce(t, 0) + 1)) // (r + 1) AS wb
          FROM raw LEFT JOIN tgt USING (b)),
        sc AS (
          SELECT doc_id, (sum(wb))::BIGINT AS score
          FROM b JOIN wt USING (b) GROUP BY doc_id)
        SELECT doc_id, score,
               (CASE WHEN row_number() OVER (ORDER BY score DESC, doc_id)
                          <= 100 THEN 1 ELSE 0 END)::INT AS selected
        FROM sc
    """
    # Conditional-GET revalidation merge: mirror of
    # operators/recrawl.py::revalidate_merge over the deterministic
    # store/fetched construction in q_revalidate.
    d["revalidate"] = """
        WITH store AS (
          SELECT 'http://h' || (doc_id % 20) || '.example/p' || doc_id AS url,
                 (doc_id + 1000)::BIGINT AS fetch_ts, 200 AS status,
                 'e' || doc_id AS etag,
                 ((doc_id * 7) % 1000)::BIGINT AS fp,
                 substr(text, 1, 20) AS text
          FROM documents WHERE doc_id % 5 != 4),
        fetched AS (
          SELECT 'http://h' || (doc_id % 20) || '.example/p' || doc_id AS url,
                 (doc_id + 2000)::BIGINT AS fetch_ts,
                 (CASE WHEN doc_id % 7 = 0 THEN 304
                       WHEN doc_id % 7 = 1 THEN 404
                       WHEN doc_id % 7 = 2 THEN 500 ELSE 200 END) AS status,
                 'n' || doc_id AS etag,
                 ((doc_id * 11) % 1000)::BIGINT AS fp,
                 'N:' || substr(text, 1, 20) AS text
          FROM documents WHERE doc_id % 3 != 2),
        j AS (
          SELECT coalesce(s.url, f.url) AS url,
                 s.fetch_ts AS s_ts, s.status AS s_st, s.etag AS s_et,
                 s.fp AS s_fp, s.text AS s_tx,
                 f.fetch_ts AS f_ts, f.status AS f_st, f.etag AS f_et,
                 f.fp AS f_fp, f.text AS f_tx
          FROM store s FULL OUTER JOIN fetched f ON s.url = f.url),
        act AS (
          SELECT *,
                 (CASE WHEN s_ts IS NULL AND f_st = 200 THEN 'insert'
                       WHEN s_ts IS NULL THEN 'ignore'
                       WHEN f_ts IS NULL THEN 'keep'
                       WHEN f_st = 304 THEN 'refresh'
                       WHEN f_st = 200 THEN 'replace'
                       WHEN f_st IN (404, 410) THEN 'drop'
                       ELSE 'keep' END) AS action
          FROM j)
        SELECT url, action,
               (CASE WHEN action IN ('insert', 'replace', 'refresh')
                     THEN f_ts ELSE s_ts END)::BIGINT AS fetch_ts,
               (CASE WHEN action IN ('insert', 'replace')
                     THEN f_st ELSE s_st END)::INT AS status,
               CASE WHEN action IN ('insert', 'replace')
                    THEN f_et ELSE s_et END AS etag,
               (CASE WHEN action IN ('insert', 'replace')
                     THEN f_fp ELSE s_fp END)::BIGINT AS fp,
               CASE WHEN action IN ('insert', 'replace')
                    THEN f_tx ELSE s_tx END AS text
        FROM act
    """
    # CDXJ index lookup: mirror of sources/cdx.py — the capture
    # construction AND the SURT transform re-derived in SQL, so a parser
    # or surt bug cannot self-certify.
    d["cdx_lookup"] = """
        WITH caps AS (
          SELECT 'http://'
                 || (CASE WHEN doc_id % 4 = 0 THEN 'www.'
                          WHEN doc_id % 4 = 1 THEN 'CDN.' ELSE '' END)
                 || source || '.Example.org'
                 || (CASE WHEN doc_id % 5 = 0 THEN ':8080'
                          WHEN doc_id % 5 = 1 THEN ':80' ELSE '' END)
                 || '/Docs/' || doc_id || '/page.html'
                 || (CASE WHEN doc_id % 3 = 0 THEN '?b=2&a=1' ELSE '' END)
                   AS url,
                 (20240000000000 + doc_id)::BIGINT AS ts,
                 (CASE WHEN doc_id % 10 = 0 THEN 404 ELSE 200 END)::INT
                   AS status,
                 'text/html' AS mime,
                 md5(text) AS digest,
                 n_chars::BIGINT AS length
          FROM documents),
        parts AS (
          SELECT *, split_part(url, '://', 2) AS rem,
                 split_part(split_part(url, '://', 2), '/', 1) AS hostport
          FROM caps),
        comp AS (
          SELECT *,
                 substr(rem, length(hostport) + 1) AS rest,
                 (CASE WHEN starts_with(lower(split_part(hostport, ':', 1)),
                                        'www.')
                       THEN substr(lower(split_part(hostport, ':', 1)), 5)
                       ELSE lower(split_part(hostport, ':', 1)) END) AS host,
                 (CASE WHEN contains(hostport, ':')
                       THEN (CASE WHEN split_part(hostport, ':', 2) = '80'
                                  THEN '' ELSE split_part(hostport, ':', 2)
                             END)
                       ELSE '' END) AS port
          FROM parts),
        surted AS (
          SELECT *,
                 array_to_string(list_reverse(string_split(host, '.')), ',')
                 || (CASE WHEN port = '' THEN '' ELSE ':' || port END)
                 || ')'
                 || (CASE WHEN lower(split_part(rest, '?', 1)) = '' THEN '/'
                          ELSE lower(split_part(rest, '?', 1)) END)
                 || (CASE WHEN contains(rest, '?')
                          THEN '?' || array_to_string(
                                 list_sort(string_split(
                                   split_part(rest, '?', 2), '&')), '&')
                          ELSE '' END) AS surt
          FROM comp)
        SELECT surt, ts, url, status, mime, digest, length
        FROM surted
        WHERE starts_with(surt, 'org,example,src1')
    """
    return d


def _oracle_sql_base(dotq) -> dict[str, str]:
    return {
        "crawl_order": f"""
            WITH frontier AS ({_FRONTIER_SQL})
            SELECT row_number() OVER (ORDER BY depth, seq) - 1 AS fetch_seq,
                   url, host, depth
            FROM frontier
        """,
        "budget_admit": f"""
            WITH frontier AS ({_FRONTIER_SQL})
            SELECT host, url, depth, seq FROM frontier
            QUALIFY row_number() OVER (PARTITION BY host ORDER BY depth, seq) <= 25
        """,
        "budget_robots": f"""
            WITH frontier AS ({_FRONTIER_SQL}),
            delays AS (
              SELECT DISTINCT host,
                     CAST(CAST(substring(host, 5, 1) AS INT) % 5 AS DOUBLE)
                       AS crawl_delay
              FROM frontier)
            SELECT f.host, f.url, f.depth, f.seq
            FROM frontier f JOIN delays d ON f.host = d.host
            QUALIFY row_number() OVER (PARTITION BY f.host
                                       ORDER BY f.depth, f.seq)
              <= greatest(1, floor(30.0 / (CASE WHEN d.crawl_delay > 0
                                           THEN d.crawl_delay ELSE 5.0 END))) * 2
        """,
        "seen_antijoin": f"""
            WITH frontier AS ({_FRONTIER_SQL})
            SELECT url, depth, seq FROM frontier f
            WHERE NOT EXISTS (
              SELECT 1 FROM frontier s
              WHERE s.event_type = 'click' AND s.url = f.url)
        """,
        "first_occurrence": f"""
            WITH frontier AS ({_FRONTIER_SQL})
            SELECT 'http://h/p/' || (event_id % 497) AS url_norm, depth, seq
            FROM frontier
            QUALIFY row_number() OVER (
              PARTITION BY 'http://h/p/' || (event_id % 497)
              ORDER BY depth, seq, 0) = 1
        """,
        "crawl_metrics": f"""
            WITH frontier AS ({_FRONTIER_SQL})
            SELECT host, count(*) AS fetched,
                   sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS errors,
                   count(DISTINCT depth) AS n_depths,
                   min(seq) AS first_seq, max(seq) AS last_seq
            FROM frontier GROUP BY host
        """,
        "eligibility": f"""
            WITH frontier AS ({_FRONTIER_SQL})
            SELECT url, props FROM frontier
            WHERE (regexp_matches(url, 'p/[0-9]*[02468]$')
                   AND regexp_matches(props, '"k": *1[0-9]'))
               OR regexp_matches(url, 'p/9')
        """,
        "outlink_sets": f"""
            WITH frontier AS ({_FRONTIER_SQL})
            SELECT user_id,
                   array_to_string(list_sort(list(DISTINCT event_type)), ',')
                     AS types_csv,
                   count(DISTINCT event_type) AS n_types
            FROM frontier GROUP BY user_id
        """,
        "canonicalize": """
            SELECT event_id,
                   CASE CAST(event_id % 4 AS INT)
                     WHEN 0 THEN 'http://host' || (user_id % 7) || '.example/p/' || event_id
                     WHEN 1 THEN 'http://host' || (user_id % 7) || '.example/p/' || event_id
                     WHEN 2 THEN 'http://host' || (user_id % 7) || '.example/p/42/' || event_id
                     ELSE 'http://host' || (user_id % 7) || '.example/a/../p/' || event_id
                   END AS url_norm
            FROM events
        """,
        "resolve": """
            SELECT event_id,
                   CASE CAST(event_id % 4 AS INT)
                     WHEN 0 THEN 'http://host' || (user_id % 7) || '.example/a/x/' || event_id
                     WHEN 1 THEN 'http://host' || (user_id % 7) || '.example/y/' || event_id
                     WHEN 2 THEN 'http://host' || (user_id % 7) || '.example/a/b/z/' || event_id
                     ELSE 'http://other.example/' || event_id
                   END AS url_norm,
                   CASE WHEN event_id % 4 = 3 THEN 'other.example'
                        ELSE 'host' || (user_id % 7) || '.example' END AS host
            FROM events
        """,
        "host_shard": f"""
            WITH frontier AS ({_FRONTIER_SQL})
            SELECT host, {_h60_sql('host')} % 32 AS shard, count(*) AS n
            FROM frontier GROUP BY 1, 2
        """,
        "dedup_exact": """
            SELECT doc_id,
                   min(doc_id) OVER (PARTITION BY md5(text)) AS keeper,
                   doc_id != min(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
            FROM documents
        """,
        "minhash_signatures": f"""
            WITH {_SHINGLES_SQL}, {_PERMS_SQL}
            SELECT doc_id, j, min((a * sh + b) % 2147483647) AS mh
            FROM sh CROSS JOIN perms
            GROUP BY doc_id, j
        """,
        "minhash_lsh_pairs": f"""
            WITH {_SHINGLES_SQL}, {_PERMS_SQL},
            mh AS (
              SELECT doc_id, j, min((a * sh + b) % 2147483647) AS mh
              FROM sh CROSS JOIN perms GROUP BY doc_id, j),
            bands AS (
              SELECT doc_id, CAST(j // 2 AS INT) AS band,
                     md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY j)) AS band_sig
              FROM mh GROUP BY doc_id, CAST(j // 2 AS INT)),
            capped AS (
              SELECT doc_id, band, band_sig FROM bands
              QUALIFY row_number() OVER (PARTITION BY band, band_sig
                                         ORDER BY doc_id) <= 64)
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM capped a JOIN capped b
              ON a.band = b.band AND a.band_sig = b.band_sig
             AND a.doc_id < b.doc_id
        """,
        "shard_plan": """
            WITH t AS (
              SELECT doc_id,
                     len(string_split(text, ' '))::BIGINT AS n
              FROM documents),
            c AS (
              SELECT doc_id, n,
                     sum(n) OVER (ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - n
                       AS tok_start
              FROM t)
            SELECT (tok_start // 4096)::BIGINT AS shard,
                   count(*)::BIGINT AS n_docs,
                   sum(n)::BIGINT AS n_tokens,
                   min(doc_id) AS first_doc,
                   max(doc_id) AS last_doc
            FROM c GROUP BY shard
        """,
        "incremental_near_dup": f"""
            WITH {_SHINGLES_SQL}, {_PERMS_SQL},
            mh AS (
              SELECT doc_id, j, min((a * sh + b) % 2147483647) AS mh
              FROM sh CROSS JOIN perms GROUP BY doc_id, j),
            bands AS (
              SELECT doc_id, CAST(j // 2 AS INT) AS band,
                     md5(string_agg(CAST(mh AS VARCHAR), ','
                                    ORDER BY j)) AS band_sig
              FROM mh GROUP BY doc_id, CAST(j // 2 AS INT)),
            nb AS (SELECT * FROM bands WHERE doc_id >= 250),
            eb AS (
              SELECT doc_id, band, band_sig
              FROM (SELECT * FROM bands WHERE doc_id < 250)
              QUALIFY row_number() OVER (PARTITION BY band, band_sig
                                         ORDER BY doc_id) <= 64)
            SELECT DISTINCT n.doc_id AS new_id, e.doc_id AS old_id
            FROM nb n JOIN eb e
              ON n.band = e.band AND n.band_sig = e.band_sig
        """,
        "simhash": f"""
            WITH wrd AS (
              SELECT doc_id, ({_h60_sql('w')} % 2147483647) AS hw
              FROM documents, unnest(string_split(text, ' ')) AS t(w)),
            bits AS (
              SELECT doc_id, b,
                     sum(((hw >> b) & 1) * 2 - 1) AS v
              FROM wrd, unnest(range(0, 31)) AS r(b)
              GROUP BY doc_id, b)
            SELECT doc_id,
                   sum(CASE WHEN v > 0 THEN 1::BIGINT << b ELSE 0 END)::BIGINT AS simhash
            FROM bits GROUP BY doc_id
        """,
        "ngram_jaccard": f"""
            WITH {_SHINGLES_SQL},
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS doc_a, count(*) AS jaccard_num
              FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1 AND a.sh = b.sh
              GROUP BY a.doc_id)
            SELECT sa.doc_id AS doc_a, sa.doc_id + 1 AS doc_b,
                   coalesce(i.jaccard_num, 0) AS jaccard_num,
                   sa.n + sb.n - coalesce(i.jaccard_num, 0) AS jaccard_den
            FROM sizes sa
            JOIN sizes sb ON sb.doc_id = sa.doc_id + 1
            LEFT JOIN inter i ON i.doc_a = sa.doc_id
        """,
        "embedding_topk": f"""
            WITH {_QUANT_SQL},
            queries AS (SELECT vec_id AS query_id, q AS qv FROM emb WHERE vec_id < 5),
            scored AS (
              SELECT query_id, e.vec_id AS neighbor_id,
                     {dotq.format(a='qv', b='e.q')} AS dot_q
              FROM emb e CROSS JOIN queries
              WHERE e.vec_id != query_id)
            SELECT query_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY dot_q DESC, neighbor_id)::BIGINT AS rank,
                   neighbor_id, dot_q
            FROM scored
            QUALIFY rank <= 5
        """,
        "ivf_topk": f"""
            WITH {_QUANT_SQL},
            cents AS (SELECT vec_id AS cell, q AS cq FROM emb WHERE vec_id < 8),
            assigned AS (
              SELECT vec_id, q, cell FROM (
                SELECT e.vec_id, e.q, c.cell,
                       {_DISTQ_SQL.format(a='e.q', b='c.cq')} AS d
                FROM emb e CROSS JOIN cents c)
              QUALIFY row_number() OVER (PARTITION BY vec_id
                                         ORDER BY d, cell) = 1),
            queries AS (SELECT vec_id AS query_id, q AS qv FROM emb
                        WHERE vec_id < 5),
            probes AS (
              SELECT query_id, qv, cell FROM (
                SELECT qu.query_id, qu.qv, c.cell,
                       {_DISTQ_SQL.format(a='qu.qv', b='c.cq')} AS d
                FROM queries qu CROSS JOIN cents c)
              QUALIFY row_number() OVER (PARTITION BY query_id
                                         ORDER BY d, cell) <= 2),
            scored AS (
              SELECT p.query_id, a.vec_id AS neighbor_id,
                     {_DOTQ_SQL.format(a='p.qv', b='a.q')} AS dot_q
              FROM probes p JOIN assigned a ON a.cell = p.cell
              WHERE a.vec_id != p.query_id)
            SELECT query_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY dot_q DESC, neighbor_id)::BIGINT AS rank,
                   neighbor_id, dot_q
            FROM scored
            QUALIFY rank <= 5
        """,
        "ivf_train": _ivf_train_oracle_sql(),
        "host_pagerank": _pagerank_oracle_sql(),
        "frontier_prioritized": _frontier_prioritized_oracle_sql(),
        "host_trustrank": _trustrank_oracle_sql(),
        "host_hits": _hits_oracle_sql(),
        "classifier_score": f"""
            WITH tok AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents),
            f AS (
              SELECT doc_id,
                     ({_h60_sql('tok')} % 4096)::INT AS bucket
              FROM tok),
            w AS (
              SELECT t.b::INT AS bucket,
                     (({_h60_sql("'w' || t.b")} % 2001) - 1000)::BIGINT
                       AS w
              FROM range(0, 4096) t(b))
            SELECT f.doc_id,
                   sum(w.w)::BIGINT AS score,
                   (sum(w.w) > 0) AS keep
            FROM f JOIN w USING (bucket)
            GROUP BY f.doc_id
        """,
        "url_templates": """
            WITH u AS (
              SELECT 'http://host' || (user_id % 7) || '.example' ||
                     CASE (event_id % 4)::INT
                       WHEN 0 THEN '/p/' || event_id
                       WHEN 1 THEN '/cal/2024/' || (event_id % 12)
                                   || '/' || (event_id % 28)
                       WHEN 2 THEN '/tag/'
                                   || substr('abcdefghijklmnopqrstuvwxyz',
                                             (user_id % 26)::INT + 1, 1)
                                   || '/page/' || (event_id % 50)
                       ELSE '/item?id=' || event_id
                     END AS url,
                     'host' || (user_id % 7) || '.example' AS host
              FROM events)
            SELECT regexp_replace(url, '\\d+', 'N', 'g') AS pattern,
                   count(*)::BIGINT AS n_urls,
                   count(DISTINCT host)::BIGINT AS n_hosts
            FROM u
            GROUP BY pattern
            HAVING count(*) >= 2
        """,
        "ann_lsh_buckets": _ANN_BUCKETS_SQL,
        "embedding_near_dup": f"""
            WITH {_QUANT_SQL}, {_planes_values_sql()},
            proj AS (
              SELECT vec_id, j, {_DOTQ_SQL.format(a='q', b='p')} AS s
              FROM emb CROSS JOIN planes),
            buckets AS (
              SELECT vec_id,
                     sum(CASE WHEN s >= 0 THEN 1::BIGINT << j ELSE 0 END)::BIGINT AS bucket
              FROM proj GROUP BY vec_id),
            v AS (SELECT e.vec_id, e.q, b.bucket FROM emb e
                  JOIN buckets b USING (vec_id))
            SELECT a.vec_id AS vec_id_a, c.vec_id AS vec_id_b,
                   {_DOTQ_SQL.format(a='a.q', b='c.q')} AS dot_q
            FROM v a JOIN v c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
            WHERE {_DOTQ_SQL.format(a='a.q', b='c.q')} >= 10000000
        """,
        "ann_lsh_topk": _ANN_TOPK_SQL,
        "embedding_near_dup_banded": f"""
            WITH {_QUANT_SQL}, {_planes_values_sql(12)},
            proj AS (
              SELECT vec_id, j, {_DOTQ_SQL.format(a='q', b='p')} AS s
              FROM emb CROSS JOIN planes),
            bb AS (
              SELECT vec_id, CAST(j // 6 AS INT) AS band,
                     sum(CASE WHEN s >= 0 THEN 1::BIGINT << (j % 6)
                              ELSE 0 END)::BIGINT AS bucket
              FROM proj GROUP BY vec_id, CAST(j // 6 AS INT)),
            capped AS (
              SELECT vec_id, band, bucket FROM bb
              QUALIFY row_number() OVER (PARTITION BY band, bucket
                                         ORDER BY vec_id) <= 64),
            v AS (SELECT c.vec_id, c.band, c.bucket, e.q
                  FROM capped c JOIN emb e USING (vec_id))
            SELECT DISTINCT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
                   {_DOTQ_SQL.format(a='a.q', b='b.q')} AS dot_q
            FROM v a JOIN v b ON a.band = b.band AND a.bucket = b.bucket
                             AND a.vec_id < b.vec_id
            WHERE {_DOTQ_SQL.format(a='a.q', b='b.q')} >= 10000000
        """,
        "curation": """
            WITH keepers AS (
              SELECT doc_id FROM (
                SELECT doc_id,
                       doc_id = min(doc_id) OVER (PARTITION BY md5(text))
                         AS keep
                FROM documents) WHERE keep),
            w AS (SELECT doc_id, string_split(text, ' ') AS ws, text
                  FROM documents),
            stops AS (SELECT ['the','a','an','and','or','of','to','in','is',
                              'it','for','on','with','as','at','by','be',
                              'this','that','are'] AS sw),
            q AS (
              SELECT doc_id,
                     len(ws)::INT AS n_words,
                     (1000 * len(list_distinct(ws))) // len(ws) AS ttr_x1000,
                     (1000 * len(list_filter(ws, x -> list_contains(sw, lower(x)))))
                       // len(ws) AS stop_x1000
              FROM w, stops)
            SELECT k.doc_id, q.n_words, q.ttr_x1000, q.stop_x1000
            FROM keepers k JOIN q ON k.doc_id = q.doc_id
            WHERE q.n_words >= 8 AND q.ttr_x1000 >= 400
              AND q.stop_x1000 <= 400
        """,
        "langid": """
            WITH wrd AS (
              SELECT doc_id, lang, w
              FROM documents, unnest(string_split(text, ' ')) AS t(w)),
            freq AS (
              SELECT lang, w, count(*) AS n FROM wrd GROUP BY lang, w),
            profile AS (
              SELECT lang AS p_lang, w FROM freq
              QUALIFY row_number() OVER (PARTITION BY lang ORDER BY n DESC, w) <= 20),
            doc_words AS (
              SELECT DISTINCT doc_id, lang, w
              FROM documents, unnest(string_split(text, ' ')) AS t(w)),
            scored AS (
              SELECT d.doc_id, d.lang, p.p_lang, count(*) AS matched
              FROM doc_words d JOIN profile p ON d.w = p.w
              GROUP BY d.doc_id, d.lang, p.p_lang)
            SELECT doc_id, lang, p_lang AS pred_lang, matched FROM scored
            QUALIFY row_number() OVER (PARTITION BY doc_id
                                       ORDER BY matched DESC, p_lang) = 1
        """,
        "quality": """
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws, text
                       FROM documents),
            stops AS (SELECT ['the','a','an','and','or','of','to','in','is',
                              'it','for','on','with','as','at','by','be',
                              'this','that','are'] AS sw)
            SELECT doc_id,
                   len(ws)::INT AS n_words,
                   len(list_distinct(ws))::INT AS n_distinct,
                   (1000 * len(list_distinct(ws))) // len(ws) AS ttr_x1000,
                   list_max(list_transform(ws, x -> length(x)))::INT
                     AS max_word_len,
                   len(regexp_extract_all(text, '[.,!?;:]'))::INT AS n_punct,
                   len(list_filter(ws, x -> list_contains(sw, lower(x))))::INT
                     AS n_stop,
                   (1000 * len(list_filter(ws, x -> list_contains(sw, lower(x)))))
                     // len(ws) AS stop_x1000
            FROM w, stops
        """,
        "token_count": r"""
            SELECT doc_id,
                   len(string_split_regex(text, '\s+'))::INT AS ws_tokens,
                   len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))::INT
                     AS re_tokens,
                   length(text)::INT AS n_chars_computed
            FROM documents
        """,
        "lm_surprisal": """
            -- corpus-trained unigram-LM surprisal in whole bits:
            -- per token, bitlen(N) - bitlen(cnt(w)) where bitlen is the
            -- binary-string length (identical in Spark F.bin and DuckDB
            -- bin — no float log2 anywhere)
            WITH wrd AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents),
            counts AS (SELECT w, count(*)::BIGINT AS cnt FROM wrd GROUP BY w),
            tot AS (SELECT sum(cnt)::BIGINT AS N FROM counts),
            scored AS (
              SELECT wrd.doc_id,
                     (length(bin(tot.N)) - length(bin(counts.cnt)))::BIGINT
                       AS bits
              FROM wrd JOIN counts USING (w) CROSS JOIN tot)
            SELECT doc_id, count(*)::BIGINT AS n_tokens,
                   sum(bits)::BIGINT AS surprisal_bits,
                   ((100 * sum(bits)) // count(*))::BIGINT AS mean_bits_x100
            FROM scored GROUP BY doc_id
        """,
        "surprisal_buckets": """
            -- corpus-percentile bucket of mean unigram surprisal:
            -- bucket(v) = (3 * |docs with score < v|) DIV n — boundaries
            -- from the score histogram, equal scores share a bucket
            WITH wrd AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents),
            counts AS (SELECT w, count(*)::BIGINT AS cnt FROM wrd GROUP BY w),
            tot AS (SELECT sum(cnt)::BIGINT AS N FROM counts),
            scored AS (
              SELECT wrd.doc_id,
                     (length(bin(tot.N)) - length(bin(counts.cnt)))::BIGINT
                       AS bits
              FROM wrd JOIN counts USING (w) CROSS JOIN tot),
            perdoc AS (
              SELECT doc_id, count(*)::BIGINT AS n_tokens,
                     sum(bits)::BIGINT AS surprisal_bits,
                     ((100 * sum(bits)) // count(*))::BIGINT
                       AS mean_bits_x100
              FROM scored GROUP BY doc_id),
            hist AS (SELECT mean_bits_x100, count(*)::BIGINT AS cnt
                     FROM perdoc GROUP BY mean_bits_x100),
            b AS (
              SELECT mean_bits_x100,
                     coalesce(sum(cnt) OVER (ORDER BY mean_bits_x100
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS below,
                     sum(cnt) OVER () AS n
              FROM hist)
            SELECT p.doc_id, p.n_tokens, p.surprisal_bits,
                   p.mean_bits_x100,
                   ((3 * b.below) // b.n)::INT AS bucket
            FROM perdoc p JOIN b USING (mean_bits_x100)
        """,
        "per_source_cap": """
            SELECT * FROM (
              SELECT doc_id, text, lang, source, n_chars,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY doc_id)::INT AS src_rank
              FROM documents)
            WHERE src_rank <= 10
        """,
        "sequence_pack": """
            -- concat-and-chunk packing: global token prefix sum in doc_id
            -- order, each doc spans chunks [tok_start//256,(cum-1)//256]
            WITH t AS (SELECT doc_id::BIGINT AS doc_id,
                              len(string_split(text, ' '))::BIGINT AS n_tok
                       FROM documents),
            c AS (SELECT doc_id, n_tok,
                         (sum(n_tok) OVER (ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING))::BIGINT AS cum
                  FROM t),
            s AS (SELECT doc_id, n_tok, cum, cum - n_tok AS tok_start FROM c),
            x AS (SELECT doc_id, n_tok, cum, tok_start,
                         unnest(range(tok_start // 256, (cum-1) // 256 + 1))
                           AS chunk_id
                  FROM s)
            SELECT chunk_id::BIGINT AS chunk_id, count(*)::BIGINT AS n_docs,
                   sum(least(cum, (chunk_id+1) * 256)
                       - greatest(tok_start, chunk_id * 256))::BIGINT
                     AS n_tokens,
                   min(doc_id)::BIGINT AS first_doc,
                   max(doc_id)::BIGINT AS last_doc
            FROM x GROUP BY chunk_id
        """,
        "chunk_documents": """
            -- sliding windows: stride 24 (= 32 - 8), starts while < n_tok
            WITH t AS (SELECT doc_id::BIGINT AS doc_id,
                              string_split(text, ' ') AS w,
                              len(string_split(text, ' '))::BIGINT AS n
                       FROM documents),
            x AS (SELECT doc_id, w, n,
                         unnest(range(0, (n-1) // 24 + 1)) AS chunk_idx
                  FROM t),
            y AS (SELECT doc_id, w, n, chunk_idx::BIGINT AS chunk_idx,
                         (chunk_idx * 24)::BIGINT AS chunk_start
                  FROM x)
            SELECT doc_id, chunk_idx, chunk_start,
                   least(n - chunk_start, 32)::BIGINT AS chunk_tokens,
                   array_to_string(
                     list_slice(w, chunk_start + 1, chunk_start + 32), ' ')
                     AS chunk_text
            FROM y
        """,
        "fingerprint": f"""
            WITH words AS (SELECT doc_id, text, string_split(text, ' ') AS w
                           FROM documents),
            shingle_lists AS (
              SELECT doc_id,
                     CASE WHEN len(w) >= 4
                          THEN list_transform(range(1, len(w) - 2),
                               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])
                          ELSE [text] END AS shingles
              FROM words),
            sh AS (
              SELECT doc_id, ({_h60_sql('s')} % 2147483647) AS sh
              FROM shingle_lists, unnest(shingles) AS t(s))
            SELECT doc_id, min(sh) AS fp_min, max(sh) AS fp_max,
                   bit_xor(sh) AS fp_xor, count(*) AS n_shingles
            FROM sh GROUP BY doc_id
        """,
        "events_hourly": """
            SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type,
                   count(*) AS n, count(DISTINCT user_id) AS users
            FROM events GROUP BY 1, 2
        """,
        "segment_orders": """
            SELECT c_mktsegment, count(*) AS n_orders,
                   count(DISTINCT o_custkey) AS n_customers
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "lineitem_groups": """
            SELECT l_returnflag, l_linestatus, count(*) AS n,
                   sum(CAST(l_quantity AS INT))::BIGINT AS sum_qty,
                   min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        # The full multi-round crawl IS oracled: the expected shipped table
        # comes from the reference simulator (refsim.py — pytest-golden vs
        # the Go semantics, incl. the reference-published TestMultiSiteFilter
        # counts) rendered as a VALUES literal. The Spark engine must land
        # on the exact same rows after its distributed round loop.
        "crawl_flagship": _flagship_oracle_sql(),
        "crawl_gated": _gated_oracle_sql(),
        "crawl_feeds": _feeds_oracle_sql(),
        "warc_ingest": _warc_oracle_sql(),
        "warc_roundtrip": _warc_oracle_sql(),
        "sitemap_ingest": _sitemap_oracle_sql(),
        "feed_ingest": _feed_oracle_sql(),
        "outlinks_resources": _resources_oracle_sql(),
        "main_text": _main_text_oracle_sql(),
        "xpath_extract": _xpath_oracle_sql(),
        # Transitive closure of the capped LSH pairs via WITH RECURSIVE —
        # an entirely different algorithm (recursive SQL reachability)
        # than the engine's min-label propagation loop, landing on the
        # same (doc_id, min reachable id) fixpoint.
        "resolve_redirects": _REDIRECTS_ORACLE,
        "page_directives": _page_directives_oracle_sql(),
        "canonical_groups": _canonical_groups_oracle_sql(),
        "dedup_components": f"""
            WITH RECURSIVE {_SHINGLES_SQL}, {_PERMS_SQL},
            mh AS (
              SELECT doc_id, j, min((a * sh + b) % 2147483647) AS mh
              FROM sh CROSS JOIN perms GROUP BY doc_id, j),
            bands AS (
              SELECT doc_id, CAST(j // 2 AS INT) AS band,
                     md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY j)) AS band_sig
              FROM mh GROUP BY doc_id, CAST(j // 2 AS INT)),
            capped AS (
              SELECT doc_id, band, band_sig FROM bands
              QUALIFY row_number() OVER (PARTITION BY band, band_sig
                                         ORDER BY doc_id) <= 64),
            pairs AS (
              SELECT DISTINCT a.doc_id AS pa, b.doc_id AS pb
              FROM capped a JOIN capped b
                ON a.band = b.band AND a.band_sig = b.band_sig
               AND a.doc_id < b.doc_id),
            edges AS (SELECT pa AS ea, pb AS eb FROM pairs
                      UNION SELECT pb, pa FROM pairs),
            reach(src, dst) AS (
              SELECT ea, eb FROM edges
              UNION
              SELECT r.src, e.eb FROM reach r JOIN edges e ON e.ea = r.dst)
            SELECT src::BIGINT AS doc_id,
                   least(src, min(dst))::BIGINT AS component
            FROM reach GROUP BY src
        """,
        "dedup_keep_best": f"""
            WITH RECURSIVE {_SHINGLES_SQL}, {_PERMS_SQL},
            mh AS (
              SELECT doc_id, j, min((a * sh + b) % 2147483647) AS mh
              FROM sh CROSS JOIN perms GROUP BY doc_id, j),
            bands AS (
              SELECT doc_id, CAST(j // 2 AS INT) AS band,
                     md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY j)) AS band_sig
              FROM mh GROUP BY doc_id, CAST(j // 2 AS INT)),
            capped AS (
              SELECT doc_id, band, band_sig FROM bands
              QUALIFY row_number() OVER (PARTITION BY band, band_sig
                                         ORDER BY doc_id) <= 64),
            pairs AS (
              SELECT DISTINCT a.doc_id AS pa, b.doc_id AS pb
              FROM capped a JOIN capped b
                ON a.band = b.band AND a.band_sig = b.band_sig
               AND a.doc_id < b.doc_id),
            edges AS (SELECT pa AS ea, pb AS eb FROM pairs
                      UNION SELECT pb, pa FROM pairs),
            reach(src, dst) AS (
              SELECT ea, eb FROM edges
              UNION
              SELECT r.src, e.eb FROM reach r JOIN edges e ON e.ea = r.dst),
            comp AS (
              SELECT src AS doc_id, least(src, min(dst)) AS component
              FROM reach GROUP BY src),
            lab AS (
              SELECT d.doc_id,
                     coalesce(c.component, d.doc_id) AS component,
                     len(string_split(d.text, ' '))::BIGINT AS score
              FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
            rep AS (
              SELECT component, doc_id AS rep_id FROM lab
              QUALIFY row_number() OVER (PARTITION BY component
                                         ORDER BY score DESC, doc_id) = 1)
            SELECT l.doc_id::BIGINT AS doc_id,
                   l.component::BIGINT AS component,
                   l.score AS score,
                   (CASE WHEN l.doc_id = r.rep_id THEN 1 ELSE 0 END)::INT
                     AS kept
            FROM lab l JOIN rep r ON l.component = r.component
        """,
        "stratified_sample": f"""
            SELECT doc_id, lang, source FROM documents
            WHERE {_SAMPLE_RATE_SQL}
        """,
        "repeated_lines": """
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
                       FROM documents),
            chunk AS (
              SELECT doc_id,
                     list_transform(
                       range(0, CAST(ceil(len(w) / 4.0) AS BIGINT)),
                       i -> array_to_string(w[(i*4+1):(i*4+4)], ' ')
                     ) AS lines
              FROM w),
            lines AS (
              SELECT doc_id, CAST(pos AS INT) AS pos, lines[pos+1] AS line
              FROM chunk, unnest(range(0, len(lines))) AS t(pos)),
            counts AS (SELECT line, count(*) AS n FROM lines GROUP BY line),
            kept AS (
              SELECT l.doc_id, l.pos, l.line
              FROM lines l JOIN counts c USING (line) WHERE c.n <= 1),
            tot AS (SELECT doc_id, count(*) AS n_lines
                    FROM lines GROUP BY doc_id)
            SELECT t.doc_id,
                   coalesce(string_agg(k.line, chr(10) ORDER BY k.pos), '')
                     AS clean_text,
                   count(k.line)::INT AS n_kept,
                   (t.n_lines - count(k.line))::INT AS n_dropped
            FROM tot t LEFT JOIN kept k USING (doc_id)
            GROUP BY t.doc_id, t.n_lines
        """,
        "c4_filter": _C4_ORACLE,
        "mirror_hosts": _MIRRORS_ORACLE,
        "duplicate_spans": """
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
                       FROM documents),
            base AS (
              SELECT doc_id, len(w)::INT AS n_tokens,
                     CASE WHEN len(w) >= 8 THEN
                       list_transform(range(0, len(w) - 7),
                         i -> ('0x' || substring(md5(
                                array_to_string(w[(i+1):(i+8)], ' ')),
                                1, 15))::BIGINT)
                     ELSE []::BIGINT[] END AS hs
              FROM w),
            pos AS (SELECT doc_id, CAST(p AS INT) AS pos, hs[p+1] AS sh
                    FROM base, unnest(range(0, len(hs))) AS t(p)),
            dup_sh AS (SELECT sh FROM pos GROUP BY sh HAVING count(*) > 1),
            dup AS (SELECT doc_id, pos FROM pos JOIN dup_sh USING (sh)),
            isl AS (
              SELECT doc_id, pos,
                     CASE WHEN pos - lag(pos) OVER
                            (PARTITION BY doc_id ORDER BY pos) > 8
                          THEN 1 ELSE 0 END AS brk
              FROM dup),
            isl2 AS (
              SELECT doc_id, pos,
                     sum(brk) OVER (PARTITION BY doc_id ORDER BY pos)
                       AS island
              FROM isl),
            spans AS (SELECT doc_id, island, max(pos) - min(pos) + 8 AS len
                      FROM isl2 GROUP BY doc_id, island),
            per_doc AS (SELECT doc_id, count(*)::INT AS n_dup_spans,
                               sum(len)::BIGINT AS n_dup_tokens
                        FROM spans GROUP BY doc_id)
            SELECT b.doc_id, b.n_tokens,
                   coalesce(p.n_dup_spans, 0)::INT AS n_dup_spans,
                   coalesce(p.n_dup_tokens, 0)::BIGINT AS n_dup_tokens
            FROM base b LEFT JOIN per_doc p USING (doc_id)
        """,
        "contamination": """
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
                       FROM documents),
            bench AS (
              SELECT DISTINCT ('0x' || substring(md5(
                       array_to_string(w[1:8], ' ')), 1, 15))::BIGINT AS sh
              FROM w WHERE doc_id % 37 = 0 AND len(w) >= 8),
            pos AS (
              SELECT doc_id,
                     ('0x' || substring(md5(
                        array_to_string(w[(i+1):(i+8)], ' ')),
                        1, 15))::BIGINT AS sh
              FROM w, unnest(range(0, greatest(len(w) - 7, 0))) AS t(i))
            SELECT doc_id, count(DISTINCT sh)::INT AS n_bench_hits
            FROM pos JOIN bench USING (sh)
            GROUP BY doc_id
        """,
        "mixture_weights": """
            WITH stats AS (
              SELECT source, count(*)::INT AS n_docs,
                     sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
              FROM documents GROUP BY source),
            w AS (SELECT *, CAST(floor(sqrt(n_tokens)) AS BIGINT)
                              AS sqrt_tokens
                  FROM stats)
            SELECT source, n_docs, n_tokens, sqrt_tokens,
                   ((1000000 * sqrt_tokens) // sum(sqrt_tokens) OVER ())
                     ::BIGINT AS weight_ppm
            FROM w
        """,
        "cms_registers": """
            WITH tok AS (
              SELECT unnest(string_split(text, ' ')) AS tok
              FROM documents),
            c AS (
              SELECT t.r::INT AS hrow,
                     (('0x' || substring(md5('cms' || t.r || ':' || tok),
                       1, 15))::BIGINT % 256)::INT AS bucket
              FROM tok, range(0, 4) t(r))
            SELECT hrow, bucket, count(*)::BIGINT AS cnt
            FROM c GROUP BY hrow, bucket
        """,
        "token_quantiles": """
            WITH t AS (SELECT len(string_split(text, ' '))::INT AS v
                       FROM documents),
            hist AS (SELECT v, count(*)::BIGINT AS cnt FROM t GROUP BY v),
            cum AS (SELECT v,
                           sum(cnt) OVER (ORDER BY v
                             ROWS UNBOUNDED PRECEDING) AS c,
                           sum(cnt) OVER () AS n
                    FROM hist),
            p AS (SELECT unnest([25, 50, 75, 90, 99])::INT AS pct)
            SELECT pct, min(v)::INT AS value
            FROM p JOIN cum ON c >= (pct * n + 99) // 100
            GROUP BY pct
        """,
        "weighted_mix": """
            SELECT doc_id, text, lang, source, n_chars,
                   'books' AS mix_source
            FROM documents
            WHERE lang = 'de'
              AND ('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT
                  % 2 < 1
            UNION ALL
            SELECT doc_id, text, lang, source, n_chars, 'tail'
            FROM documents
            WHERE lang NOT IN ('en', 'de')
              AND ('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT
                  % 8 < 1
            UNION ALL
            SELECT doc_id, text, lang, source, n_chars, 'web'
            FROM documents
            WHERE lang = 'en'
              AND ('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT
                  % 3 < 2
        """,
        "term_retrieval": f"""
            WITH tok AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents),
            tf AS (
              SELECT doc_id, tok, count(*)::BIGINT AS tf
              FROM tok
              WHERE tok IN {repr(tuple(sorted(RETRIEVAL_TERMS)))}
              GROUP BY doc_id, tok),
            dfv AS (SELECT tok, count(*)::BIGINT AS df FROM tf GROUP BY tok),
            n AS (SELECT count(*)::BIGINT AS n FROM documents)
            SELECT tf.doc_id,
                   sum(tf.tf * (n.n // dfv.df))::BIGINT AS score,
                   count(*)::INT AS n_terms
            FROM tf JOIN dfv USING (tok) CROSS JOIN n
            GROUP BY tf.doc_id
            ORDER BY score DESC, tf.doc_id
            LIMIT 10
        """,
        "token_postings": """
            WITH tok AS (
              SELECT DISTINCT doc_id, tok FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents)
              WHERE tok <> '')
            SELECT tok, count(*)::BIGINT AS df,
                   array_to_string(list(doc_id ORDER BY doc_id), ',')
                     AS postings_csv
            FROM tok GROUP BY tok
            HAVING count(*) >= 5
        """,
        "anchor_corpus": """
            WITH u AS (
              SELECT 'http://host' || (user_id % 7) || '.example/t/'
                       || (user_id % 20) AS target,
                     'topic ' || (user_id % 20) AS atext
              FROM events
              UNION ALL
              SELECT 'http://hub.example/h/' || (event_id % 5),
                     'hub ' || (event_id % 5)
              FROM events)
            SELECT target, atext, count(*)::BIGINT AS n
            FROM u GROUP BY target, atext
        """,
        "snapshot_delta": f"""
            WITH {_HIST_SQL},
            o AS (SELECT url, fp FROM hist WHERE snap = 2),
            n AS (SELECT url, fp FROM hist WHERE snap = 3)
            SELECT coalesce(o.url, n.url) AS url,
                   CASE WHEN o.url IS NULL THEN 'new'
                        WHEN n.url IS NULL THEN 'gone'
                        WHEN o.fp <> n.fp THEN 'changed'
                        ELSE 'same' END AS status
            FROM o FULL OUTER JOIN n ON o.url = n.url
        """,
        "recrawl_schedule": f"""
            WITH {_HIST_SQL},
            x AS (SELECT url, snap, fp,
                         row_number() OVER (PARTITION BY url
                                            ORDER BY snap) AS idx,
                         lag(fp) OVER (PARTITION BY url
                                       ORDER BY snap) AS prev
                  FROM hist),
            a AS (SELECT url,
                         max(idx)::INT AS n_obs,
                         count(DISTINCT fp)::INT AS n_versions,
                         max(CASE WHEN prev IS NULL OR fp <> prev
                                  THEN idx END)::INT AS lc,
                         max(snap)::INT AS last_snap
                  FROM x GROUP BY url)
            SELECT url, n_obs, n_versions,
                   (n_obs - lc)::INT AS tail_stable,
                   (1 << least(n_obs - lc, 6))::INT AS next_interval,
                   (last_snap + (1 << least(n_obs - lc, 6)))::INT
                     AS next_due
            FROM a
        """,
        "feed_refresh": f"""
            WITH {_HIST_SQL},
            x AS (SELECT url, snap, fp,
                         row_number() OVER (PARTITION BY url
                                            ORDER BY snap) AS idx,
                         lag(fp) OVER (PARTITION BY url
                                       ORDER BY snap) AS prev
                  FROM hist),
            a AS (SELECT url,
                         max(idx)::INT AS n_obs,
                         count(DISTINCT fp)::INT AS n_versions,
                         max(CASE WHEN prev IS NULL OR fp <> prev
                                  THEN idx END)::INT AS lc,
                         max(snap)::INT AS last_snap
                  FROM x GROUP BY url),
            sched AS (
              SELECT url, n_obs, n_versions,
                     (n_obs - lc)::INT AS tail_stable,
                     (1 << least(n_obs - lc, 6))::INT AS next_interval,
                     (last_snap + (1 << least(n_obs - lc, 6)))::INT
                       AS next_due
              FROM a),
            ann AS (
              SELECT 'http://host' || ((event_id // 4) % 7)
                       || '.example/p/' || (event_id // 4) AS url,
                     max(event_id % 9)::INT AS pub_max,
                     count(*)::INT AS n_ann
              FROM events WHERE user_id % 7 = 3 GROUP BY 1)
            SELECT coalesce(s.url, ann.url) AS url,
                   coalesce(s.n_obs, 0)::INT AS n_obs,
                   coalesce(s.n_versions, 0)::INT AS n_versions,
                   coalesce(s.tail_stable, 0)::INT AS tail_stable,
                   (CASE WHEN pub_max IS NOT NULL AND (s.next_due IS NULL
                           OR pub_max > s.next_due - s.next_interval)
                         THEN 1 ELSE s.next_interval END)::INT
                     AS next_interval,
                   (CASE WHEN pub_max IS NOT NULL AND (s.next_due IS NULL
                           OR pub_max > s.next_due - s.next_interval)
                         THEN pub_max ELSE s.next_due END)::INT
                     AS next_due,
                   coalesce(n_ann, 0)::INT AS n_ann,
                   (CASE WHEN pub_max IS NOT NULL AND (s.next_due IS NULL
                           OR pub_max > s.next_due - s.next_interval)
                         THEN 1 ELSE 0 END)::INT AS feed_fresh
            FROM sched s FULL OUTER JOIN ann ON s.url = ann.url
        """,
        "host_degrees": f"""
            WITH {_EDGES_SQL},
            o AS (SELECT src AS node, count(*)::BIGINT AS out_deg
                  FROM edges GROUP BY src),
            i AS (SELECT dst AS node, count(*)::BIGINT AS in_deg
                  FROM edges GROUP BY dst)
            SELECT coalesce(o.node, i.node) AS node,
                   coalesce(out_deg, 0)::BIGINT AS out_deg,
                   coalesce(in_deg, 0)::BIGINT AS in_deg
            FROM o FULL OUTER JOIN i ON o.node = i.node
        """,
        "hll_registers": """
            WITH h AS (
              SELECT ('0x' || substring(md5(CAST(user_id AS VARCHAR)),
                       1, 15))::BIGINT AS h
              FROM events),
            r AS (SELECT CAST(h % 256 AS INT) AS bucket,
                         h // 256 AS rest
                  FROM h)
            SELECT bucket,
                   max(CASE WHEN rest > 0 THEN 53 - length(bin(rest))
                            ELSE 53 END)::INT AS max_rho
            FROM r GROUP BY bucket
        """,
        "source_stats": """
            WITH base AS (
              SELECT source, count(*)::INT AS n_docs,
                     sum(len(text))::BIGINT AS n_chars,
                     sum(len(string_split(text, ' ')))::BIGINT AS n_tokens,
                     count(DISTINCT lang)::INT AS n_langs
              FROM documents GROUP BY source),
            by_lang AS (
              SELECT source, lang, count(*) AS n
              FROM documents GROUP BY source, lang),
            top AS (
              SELECT source, lang AS top_lang, n::INT AS top_lang_docs
              FROM by_lang
              QUALIFY row_number() OVER (PARTITION BY source
                                         ORDER BY n DESC, lang) = 1)
            SELECT b.source, b.n_docs, b.n_chars, b.n_tokens, b.n_langs,
                   t.top_lang, t.top_lang_docs
            FROM base b JOIN top t USING (source)
        """,
        "url_quality": r"""
            WITH fr AS (
              SELECT event_id,
                     CASE CAST(event_id % 4 AS INT)
                       WHEN 1 THEN 'spam' || (user_id % 7) || '42.example'
                       WHEN 2 THEN 'ads.host' || (user_id % 7) || '.example'
                       ELSE 'host' || (user_id % 7) || '.example' END AS host,
                     CAST(event_id % 4 AS INT) AS v,
                     user_id % 7 AS k
              FROM events),
            u AS (
              SELECT event_id, host,
                     CASE v
                       WHEN 0 THEN 'http://' || host || '/p/' || event_id
                       WHEN 1 THEN 'http://' || host || '/p/a/b/c/'
                                   || event_id || '?x=1&y=2&z=3'
                       WHEN 2 THEN 'http://' || host || '/click/'
                                   || event_id || '?id=' || event_id
                       ELSE 'http://' || host || '/p/' || event_id
                            || '?ref=abc' END AS url
              FROM fr)
            SELECT event_id, url, host,
                   (host = 'host5.example' OR host LIKE '%.host5.example'
                    OR host = 'spam242.example'
                    OR host LIKE '%.spam242.example') AS blocked,
                   (len(host) - len(regexp_replace(host, '[0-9]', '', 'g')))::INT
                     AS n_host_digits,
                   (len(string_split(regexp_extract(url,
                       '^[a-z]+://[^/]+(/[^?#]*)', 1), '/')) - 1)::INT
                     AS path_depth,
                   CASE WHEN regexp_extract(url, '\?([^#]*)', 1) = '' THEN 0
                        ELSE len(string_split(
                          regexp_extract(url, '\?([^#]*)', 1), '&')) END::INT
                     AS n_params
            FROM u
        """,
        "pii_scrub": r"""
            WITH seeded AS (
              SELECT doc_id,
                     text || CASE CAST(doc_id % 4 AS INT)
                       WHEN 0 THEN ' contact user' || doc_id || '@example.com now'
                       WHEN 1 THEN ' server 10.0.' || (doc_id % 256) || '.7 up'
                       WHEN 2 THEN ' call +12125550' || (doc_id % 100) || ' today'
                       ELSE '' END AS text
              FROM documents),
            e AS (
              SELECT doc_id,
                     len(regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::INT
                       AS n_emails,
                     regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g') AS t
              FROM seeded),
            i AS (
              SELECT doc_id, n_emails,
                     len(regexp_extract_all(t,
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::INT AS n_ips,
                     regexp_replace(t,
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                       '<IP>', 'g') AS t
              FROM e)
            SELECT doc_id,
                   regexp_replace(t, '\+\d{7,15}', '<PHONE>', 'g') AS clean_text,
                   n_emails, n_ips,
                   len(regexp_extract_all(t, '\+\d{7,15}'))::INT AS n_phones
            FROM i
        """,
        "ngram_repetition": """
            WITH w AS (SELECT doc_id, string_split(text, ' ' ) AS w
                       FROM documents),
            grams AS (
              SELECT doc_id, w[i] || ' ' || w[i+1] AS gram
              FROM w, unnest(range(1, len(w))) AS t(i)
              WHERE len(w) >= 2),
            per AS (SELECT doc_id, gram, count(*) AS c
                    FROM grams GROUP BY doc_id, gram)
            SELECT d.doc_id,
                   coalesce(max(p.c), 0)::INT AS top_count,
                   coalesce(sum(p.c), 0)::INT AS n_grams
            FROM documents d LEFT JOIN per p USING (doc_id)
            GROUP BY d.doc_id
        """,
        # The composed pipeline: the SAME SQL logic as the standalone
        # repeated_lines / dedup_exact / quality / stratified_sample
        # oracles, chained over the CLEANED text end-to-end.
        "pipeline_curation": """
            WITH w0 AS (SELECT doc_id, string_split(text, ' ') AS w
                        FROM documents),
            chunk AS (
              SELECT doc_id,
                     list_transform(
                       range(0, CAST(ceil(len(w) / 4.0) AS BIGINT)),
                       i -> array_to_string(w[(i*4+1):(i*4+4)], ' ')
                     ) AS lines
              FROM w0),
            lines AS (
              SELECT doc_id, CAST(pos AS INT) AS pos, lines[pos+1] AS line
              FROM chunk, unnest(range(0, len(lines))) AS t(pos)),
            counts AS (SELECT line, count(*) AS n FROM lines GROUP BY line),
            kept AS (
              SELECT l.doc_id, l.pos, l.line
              FROM lines l JOIN counts c USING (line) WHERE c.n <= 1),
            tot AS (SELECT doc_id, count(*) AS n_lines
                    FROM lines GROUP BY doc_id),
            cleaned AS (
              SELECT t.doc_id,
                     coalesce(string_agg(k.line, chr(10) ORDER BY k.pos),
                              '') AS clean_text,
                     count(k.line)::INT AS n_kept,
                     (t.n_lines - count(k.line))::INT AS n_dropped
              FROM tot t LEFT JOIN kept k USING (doc_id)
              GROUP BY t.doc_id, t.n_lines),
            base AS (
              SELECT c.doc_id, d.lang, d.source,
                     replace(c.clean_text, chr(10), ' ') AS text,
                     c.n_kept, c.n_dropped
              FROM cleaned c JOIN documents d USING (doc_id)),
            keepers AS (
              SELECT doc_id FROM (
                SELECT doc_id,
                       doc_id = min(doc_id) OVER (PARTITION BY md5(text))
                         AS keep
                FROM base) WHERE keep),
            wq AS (SELECT doc_id, string_split(text, ' ') AS ws FROM base),
            stops AS (SELECT ['the','a','an','and','or','of','to','in','is',
                              'it','for','on','with','as','at','by','be',
                              'this','that','are'] AS sw),
            q AS (
              SELECT doc_id, len(ws)::INT AS n_words,
                     (1000 * len(list_distinct(ws))) // len(ws)
                       AS ttr_x1000,
                     (1000 * len(list_filter(ws,
                        x -> list_contains(sw, lower(x))))) // len(ws)
                       AS stop_x1000
              FROM wq, stops)
            SELECT b.doc_id, b.lang, b.source, b.n_kept, b.n_dropped,
                   q.n_words, q.ttr_x1000, q.stop_x1000
            FROM base b JOIN keepers USING (doc_id) JOIN q USING (doc_id)
            WHERE q.n_words >= 8 AND q.ttr_x1000 >= 400
              AND q.stop_x1000 <= 400
              AND CASE b.lang
                WHEN 'en' THEN (('0x' || substring(md5(CAST(b.doc_id AS VARCHAR)), 1, 15))::BIGINT) % 3 < 2
                WHEN 'de' THEN (('0x' || substring(md5(CAST(b.doc_id AS VARCHAR)), 1, 15))::BIGINT) % 2 < 1
                WHEN 'zh' THEN (('0x' || substring(md5(CAST(b.doc_id AS VARCHAR)), 1, 15))::BIGINT) % 4 < 1
                ELSE (('0x' || substring(md5(CAST(b.doc_id AS VARCHAR)), 1, 15))::BIGINT) % 8 < 1 END
        """,
        # Independent SQL recomputation of the deterministic synth-media
        # formulas (textops/multimodal.py synth_media): images are REAL
        # 24bpp BMPs and audio REAL PCM16 WAVs, so n_bytes, checksum
        # (header byte layout included, little-endian length fields
        # decomposed arithmetically), decoded dims and duration are all
        # pure arithmetic — DuckDB re-derives what the Python decoders
        # parse from actual bytes, without touching that code path.
        "multimodal_features": """
            WITH base AS (SELECT i FROM range(0, 64) t(i)),
            img AS (
              SELECT i, (4 + i % 5)::BIGINT AS w, (3 + i % 4)::BIGINT AS h,
                     ((3 * (4 + i % 5) + 3) // 4 * 4)::BIGINT AS stride
              FROM base WHERE i % 3 = 0),
            img_out AS (
              SELECT i::BIGINT AS media_id, 'image' AS kind,
                     (54 + stride * h)::INT AS n_bytes,
                     (143                                       -- 'BM'
                      + (54 + stride*h) % 256 + ((54 + stride*h) // 256) % 256
                        + ((54 + stride*h) // 65536) % 256
                        + ((54 + stride*h) // 16777216) % 256   -- file size LE4
                      + 54 + 40 + w + h + 1 + 24                -- offset, DIB, dims, planes, bpp
                      + (stride*h) % 256 + ((stride*h) // 256) % 256
                        + ((stride*h) // 65536) % 256
                        + ((stride*h) // 16777216) % 256        -- image size LE4
                      + 60                                      -- 2x 2835 ppm
                      + list_sum(flatten(list_transform(range(0, h), y ->
                          flatten(list_transform(range(0, w), x ->
                            list_transform(range(0, 3), c ->
                              (i*7 + x*3 + y*5 + c*11) % 256))))))
                     )::BIGINT AS checksum,
                     w::INT AS dec_width, h::INT AS dec_height,
                     NULL::INT AS dec_duration_ms, NULL::INT AS dec_nsamples,
                     'real' AS dec_status
              FROM img),
            aud AS (
              SELECT i, ((i % 7 + 1) * 40)::BIGINT AS n
              FROM base WHERE i % 3 = 1),
            aud_out AS (
              SELECT i::BIGINT AS media_id, 'audio' AS kind,
                     (44 + 2 * n)::INT AS n_bytes,
                     (1692                                      -- RIFF/WAVE/fmt body/data literals
                      + (36 + 2*n) % 256 + ((36 + 2*n) // 256) % 256
                        + ((36 + 2*n) // 65536) % 256
                        + ((36 + 2*n) // 16777216) % 256        -- riff size LE4
                      + (2*n) % 256 + ((2*n) // 256) % 256
                        + ((2*n) // 65536) % 256
                        + ((2*n) // 16777216) % 256             -- data len LE4
                      + list_sum(list_transform(range(0, n), j ->
                          ((i*31 + j*17) % 32768) % 256
                          + ((i*31 + j*17) % 32768) // 256))    -- PCM16 LE bytes
                     )::BIGINT AS checksum,
                     NULL::INT AS dec_width, NULL::INT AS dec_height,
                     (n * 1000 // 8000)::INT AS dec_duration_ms,
                     n::INT AS dec_nsamples,
                     'real' AS dec_status
              FROM aud),
            vid_out AS (
              SELECT i::BIGINT AS media_id, 'video' AS kind,
                     ((i % 7 + 1) * 32)::INT AS n_bytes,
                     (list_sum(list_transform(range(0, (i % 7 + 1) * 32),
                          j -> (i * 37 + j * 11) % 251)))::BIGINT AS checksum,
                     NULL::INT AS dec_width, NULL::INT AS dec_height,
                     NULL::INT AS dec_duration_ms, NULL::INT AS dec_nsamples,
                     'stub' AS dec_status
              FROM base WHERE i % 3 = 2)
            SELECT * FROM img_out
            UNION ALL SELECT * FROM aud_out
            UNION ALL SELECT * FROM vid_out
            UNION ALL
            -- media 64..79 are REAL 8-bit RGB PNGs serialized with
            -- stored (uncompressed) zlib blocks and zeroed CRCs, so the
            -- whole file — adler32 trailer included — is re-derived here
            -- arithmetically while decode_png inflates actual bytes.
            SELECT media_id, kind, n_bytes, checksum,
                   dec_width, dec_height, dec_duration_ms, dec_nsamples,
                   'real' AS dec_status
            FROM (
              WITH png AS (
                SELECT i, (3 + i % 4)::BIGINT AS w, (2 + i % 3)::BIGINT AS h
                FROM range(64, 80) t(i)),
              png_bytes AS (
                -- the IDAT scanline stream: per row a 0 filter byte then
                -- w RGB pixels, value (i*5 + x*7 + y*3 + c*13) % 256
                SELECT i, w, h, h * (1 + 3 * w) AS rawlen,
                  flatten(list_transform(range(0, h), y ->
                    [0::BIGINT] || flatten(list_transform(range(0, w), x ->
                      list_transform(range(0, 3), c ->
                        (i*5 + x*7 + y*3 + c*13) % 256))))) AS d
                FROM png),
              png_adler AS (
                SELECT i, w, h, rawlen, d,
                  (1 + list_sum(d)) % 65521 AS a_,
                  (rawlen + list_sum(list_transform(range(0, rawlen), j ->
                      (rawlen - j) * d[j+1]))) % 65521 AS b_
                FROM png_bytes)
              SELECT i::BIGINT AS media_id, 'image' AS kind,
                -- 8 sig + 25 IHDR chunk + (12 + rawlen + 11) IDAT + 12 IEND
                (68 + rawlen)::INT AS n_bytes,
                -- 1953 = sig(425) + IHDR len/type/fixed-fields(318)
                --      + IDAT type(290) + zlib hdr(121)
                --      + stored-block hdr(511: 1 + LEN/NLEN complements)
                --      + IEND(288); CRCs are zeroed by construction
                (1953 + w + h
                 + (rawlen + 11) % 256 + (rawlen + 11) // 256
                 + list_sum(d)
                 + a_ % 256 + a_ // 256 + b_ % 256 + b_ // 256
                )::BIGINT AS checksum,
                w::INT AS dec_width, h::INT AS dec_height,
                NULL::INT AS dec_duration_ms, NULL::INT AS dec_nsamples
              FROM png_adler)
            UNION ALL
            -- media 80..95 are REAL minimal mp4 containers (ftyp + moov/
            -- mvhd/trak/tkhd + mdat) whose dims/duration decode_mp4 parses
            -- from the box structure. Every dynamic field (w, h, duration
            -- x2, mdat size, data bytes) is < 256, so each contributes its
            -- value to the whole-file byte sum; 4410 is the byte sum of the
            -- fixed scaffolding (box sizes/types, matrix, timescale 1000,
            -- rate/volume/flags), independently pinned by
            -- test_mp4_decoder_roundtrip's first-principles check.
            SELECT i::BIGINT AS media_id, 'video' AS kind,
                   (244 + 16 * (i % 5 + 1))::INT AS n_bytes,
                   (4410 + (16 + i % 9) + (9 + i % 7)
                    + 2 * ((i % 20 + 1) * 10)
                    + 8 + 16 * (i % 5 + 1)
                    + list_sum(list_transform(
                        range(0, 16 * (i % 5 + 1)),
                        j -> (i * 13 + j * 7) % 251))
                   )::BIGINT AS checksum,
                   (16 + i % 9)::INT AS dec_width,
                   (9 + i % 7)::INT AS dec_height,
                   ((i % 20 + 1) * 10)::INT AS dec_duration_ms,
                   NULL::INT AS dec_nsamples,
                   'real' AS dec_status
            FROM range(80, 96) t(i)
        """,
        "pjpeg_features": """
            -- Progressive-JPEG fixtures: solid gray v = 128 + 3*((i*7 % 33)
            -- - 16) at quality 90 decodes bit-exactly (DC quant step 3
            -- divides v-128; chroma quantizes to 0), so every decoded
            -- channel mean equals v and the dims are the declared ones.
            SELECT i::BIGINT AS media_id, 'image' AS kind,
                   'real' AS dec_status,
                   (5 + i % 6)::INT AS dec_width,
                   (4 + i % 5)::INT AS dec_height,
                   (128 + 3 * ((i * 7) % 33 - 16))::INT AS mean_r,
                   (128 + 3 * ((i * 7) % 33 - 16))::INT AS mean_g,
                   (128 + 3 * ((i * 7) % 33 - 16))::INT AS mean_b
            FROM range(0, 12) t(i)
        """,
        "frame_features": """
            -- MJPEG-in-MP4 frame sampling (ids 0..15, synth_media
            -- n_mjpeg=16): every frame is a solid-gray baseline JPEG with
            -- v = 128 + 3*(((i*7 + k*11) % 33) - 16), which decodes
            -- BIT-EXACTLY (3 | v-128 makes the DC quantization lossless),
            -- so decoded channel means are re-derived arithmetically.
            -- Sampling grid: every 500 ms over duration (i%4+2)*250 ms;
            -- the covering frame is ts//250 (stts delta 250 ms).
            WITH vid AS (
              SELECT i, (i % 4 + 2) * 250 AS dur FROM range(0, 16) t(i)),
            ts AS (
              SELECT i, unnest(range(0, dur, 500)) AS t FROM vid)
            SELECT i::BIGINT AS media_id, t::INT AS ts_ms,
                   (t // 250)::INT AS frame_idx,
                   'real' AS dec_status,
                   (16 + i % 9)::INT AS frame_w,
                   (9 + i % 7)::INT AS frame_h,
                   (128 + 3 * (((i * 7 + (t // 250) * 11) % 33) - 16))::INT
                       AS mean_r,
                   (128 + 3 * (((i * 7 + (t // 250) * 11) % 33) - 16))::INT
                       AS mean_g,
                   (128 + 3 * (((i * 7 + (t // 250) * 11) % 33) - 16))::INT
                       AS mean_b
            FROM ts
        """,
    }


def _flagship_spec():
    from ideacrawler_spark.config import JobSpec

    return JobSpec(job_id="flagship", seed_url="http://hosta.example/p/0",
                   min_delay_s=1, round_seconds=30, max_concurrent=50)


def _gated_spec():
    from ideacrawler_spark.config import JobSpec

    return JobSpec(job_id="gated", seed_url="http://hosta.example/p/0",
                   follow_other_domains=True, depth=3, min_delay_s=1,
                   round_seconds=30, max_concurrent=50, max_rounds=10,
                   host_blocklist=("hostb.example",), max_query_params=0)


def _sim_shipped_oracle_sql(spec, with_pushes: bool) -> str:
    """Expected shipped table of a fixture-web crawl as a VALUES literal,
    generated by the reference simulator (ideacrawler_spark/refsim.py) on
    the same deterministic fixture web. refsim is the executable spec of
    the Go reference (cited per rule there) and is itself pytest-anchored
    to the reference's published TestMultiSiteFilter expectations."""
    from ideacrawler_spark.refsim import simulate
    from ideacrawler_spark.sources.fixtures import synth_web

    pages, robots, seeds, pushes = synth_web(seed=42, scale=1)
    golden = simulate(spec, pages, robots, pushes if with_pushes else None)

    def q(s: str) -> str:
        return "'" + str(s).replace("'", "''") + "'"

    rows = ", ".join(
        f"({s['fetch_seq']}::BIGINT, {q(s['url'])}, {s['depth']}::INT, "
        f"{q(s['anchor_text'])}, {q(s['meta'])}, {s['status']}::INT, "
        f"{q(s['text'])})"
        for s in sorted(golden.shipped, key=lambda s: s["fetch_seq"])
    )
    return (
        "SELECT * FROM (VALUES " + rows + ") AS t("
        "fetch_seq, url, depth, anchor_text, meta, status, text)"
    )


def _flagship_oracle_sql() -> str:
    return _sim_shipped_oracle_sql(_flagship_spec(), with_pushes=True)


def _gated_oracle_sql() -> str:
    """Shipped table of the URL-gated crawl (host_blocklist +
    max_query_params JobSpec knobs): the simulator implements the gating
    semantics independently (refsim.py url_blocked), so the oracle checks
    the engine's gated admission path end-to-end."""
    return _sim_shipped_oracle_sql(_gated_spec(), with_pushes=False)


def _warc_oracle_sql() -> str:
    """Expected WARC-ingest rows derived from the fixture page dicts
    themselves (url/status/content_type/html length+md5 are INPUT data) —
    independent of the parser under test."""
    import hashlib

    from ideacrawler_spark.sources.fixtures import synth_web

    pages, _, _, _ = synth_web(seed=42, scale=1)

    def q(s: str) -> str:
        return "'" + str(s).replace("'", "''") + "'"

    rows = ", ".join(
        f"({q(p['url'])}, {int(p['status'])}::INT, {q(p['content_type'])}, "
        f"{len(p['html'])}::INT, {q(hashlib.md5(p['html']).hexdigest())})"
        for p in pages
    )
    return (
        "SELECT * FROM (VALUES " + rows + ") AS t("
        "url, status, content_type, n_html, html_md5)"
    )


# ANN oracle SQL needs the ±1 plane literals; generate them once at import
# (same md5 math as ideacrawler_spark.textops.similarity.plane_sign).
def _planes_values_sql(n_planes: int = 8, dim: int = 64) -> str:
    from ideacrawler_spark.textops.similarity import plane_sign

    rows = []
    for j in range(n_planes):
        arr = ", ".join(str(plane_sign(j, i)) for i in range(dim))
        rows.append(f"({j}, [{arr}]::BIGINT[])")
    return "planes(j, p) AS (VALUES " + ", ".join(rows) + ")"


_ANN_BUCKETS_SQL = f"""
    WITH {_QUANT_SQL}, {_planes_values_sql()},
    proj AS (
      SELECT vec_id, j,
             {_DOTQ_SQL.format(a='q', b='p')} AS s
      FROM emb CROSS JOIN planes)
    SELECT vec_id,
           sum(CASE WHEN s >= 0 THEN 1::BIGINT << j ELSE 0 END)::BIGINT AS bucket
    FROM proj GROUP BY vec_id
"""

_ANN_TOPK_SQL = f"""
    WITH {_QUANT_SQL}, {_planes_values_sql()},
    proj AS (
      SELECT vec_id, j, {_DOTQ_SQL.format(a='q', b='p')} AS s
      FROM emb CROSS JOIN planes),
    buckets AS (
      SELECT vec_id, sum(CASE WHEN s >= 0 THEN 1::BIGINT << j ELSE 0 END)::BIGINT AS bucket
      FROM proj GROUP BY vec_id),
    v AS (SELECT e.vec_id, e.q, b.bucket FROM emb e JOIN buckets b USING (vec_id)),
    pairs AS (
      SELECT a.vec_id, c.vec_id AS neighbor_id,
             {_DOTQ_SQL.format(a='a.q', b='c.q')} AS dot_q
      FROM v a JOIN v c ON a.bucket = c.bucket AND a.vec_id != c.vec_id)
    SELECT vec_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dot_q DESC, neighbor_id)::BIGINT AS rank,
           neighbor_id, dot_q
    FROM pairs
    QUALIFY rank <= 3
"""
