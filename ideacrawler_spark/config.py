"""Job configuration — the DomainOpt subset this engine supports.

Mirrors the observable knobs of the reference's ``DomainOpt``
(/root/reference/protofiles/ideacrawler.proto:47-143) that affect crawl
ordering, the seen-set, shipped pages and politeness. Defaults follow the
reference Go client defaults (/root/reference/goclient/ideacrawlerclient.go:104-120):
MinDelay=5, Depth=-1, MaxConcurrentRequests=5, Mimetype="text/html".

Chrome/CDP, login sessions and prefetch side-effects are explicit
non-goals (SURVEY.md §7).
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict
from typing import Optional


@dataclass(frozen=True)
class JobSpec:
    job_id: str
    seed_url: str = ""                      # proto seedUrl; "" = seedless (pushes only)
    depth: int = -1                         # proto depth; -1 = unlimited (job.go:188)
    no_follow: bool = False                 # proto noFollow
    follow_other_domains: bool = False      # proto followOtherDomains (job.go:842-845)
    follow_url_regexp: Optional[str] = None     # proto followUrlRegexp
    callback_url_regexp: Optional[str] = None   # proto callbackUrlRegexp
    callback_anchor_regexp: Optional[str] = None  # proto callbackAnchorTextRegexp
    callback_seed_url: bool = False         # proto callbackSeedUrl (job.go:213-215)
    # repeated KVP xpath specs; tuple of (xpath, value) pairs. NOTE the
    # reference quirk: BOTH variants compare by string EQUALITY
    # (job.go:233-269) — "Regexp" in the name notwithstanding.
    callback_xpath_match: tuple = ()        # proto callbackXpathMatch
    callback_xpath_regexp: tuple = ()       # proto callbackXpathRegexp
    unsafe_normalize: bool = False          # proto unsafeNormalizeURL (job.go:826-832)
    check_content: bool = False             # proto checkContent → HEAD-first (job.go:811-814)
    # F11 (HTTP-side half): the per-page login-session guard
    # (job.go:157-185). The form-login itself is chrome/client-side and
    # stays a non-goal; the guard is pure HTTP logic: after each OK page,
    # the first-node value of the check xpath must equal the expected
    # value CASE-INSENSITIVELY, else an error page (status 1502
    # NolongerLoggedIn, statuscodes.go:8) ships with an EMPTY url and the
    # job cancels (cancelChan <- struct{}{}).
    login: bool = False                     # proto login
    check_login_after_each_page: bool = False  # proto checkLoginAfterEachPage
    login_success_check: Optional[tuple] = None  # proto loginSuccessCheck (xpath, value)
    min_delay_s: int = 5                    # proto minDelay (Doer floors at 1s, doer.go:62-71)
    max_delay_s: int = 0                    # proto maxDelay; 0 ⇒ fixed delay
    max_concurrent: int = 5                 # proto maxConcurrentRequests (doer.go:36-41)
    threads_per_site: int = 1               # proto threadsPerSite (fetch.go:364-366)
    impolite: bool = False                  # proto impolite ⇒ skip robots.txt
    # proto useragent (job.go:669 → fetchbot f.UserAgent): its observable
    # crawl effect is robots.txt GROUP SELECTION (FindGroup(f.UserAgent),
    # fetch.go:473); request-header plumbing has no analogue in the
    # simulated-web fetch join. Default = the Go client default
    # (goclient:109 "Fetchbot").
    useragent: str = "Fetchbot"
    mimetype: str = "text/html"             # proto mimetype (job.go:620-623)
    # Engine-only: follow RSS/Atom feeds (beyond the reference, which
    # discovers URLs solely from <a href>, job.go link extraction). When
    # on: pages whose content type is a feed type (sources/feeds.py
    # FEED_MIMETYPES — decided by content type, never sniffing) bypass
    # the mimetype mux for LINK FOLLOWING only — they never ship, never
    # run callbacks, never count as errors, and skip the login guard;
    # their entry links (title as anchor text) enter the frontier exactly
    # like <a href> links. HTML pages additionally contribute raw feed-
    # autodiscovery hrefs (<link rel=alternate type=…rss/atom…>) appended
    # after their <a> links in document order.
    follow_feeds: bool = False
    # Engine-only knob: the virtual wall-clock length of one frontier round.
    # The reference crawls continuously; the batch engine admits
    # floor(round_seconds / crawl_delay(host)) URLs per host per round.
    round_seconds: int = 30
    # Engine-only: hard cap on rounds (safety valve for cyclic graphs with
    # depth=-1; the reference would crawl forever too).
    max_rounds: int = 64
    # Engine-only frontier URL gating (beyond the reference): junk links
    # are dropped at the eligibility stage (operators/urlfilter.py) so a
    # 10^10-URL crawl spends zero seen-set space or politeness budget on
    # them. ``host_blocklist`` blocks hosts by dot-suffix ("tracker.example"
    # also blocks "cdn.tracker.example"); the three thresholds drop URLs
    # whose spam signal EXCEEDS the limit (None = signal off).
    host_blocklist: tuple = ()
    max_host_digits: Optional[int] = None
    max_path_depth: Optional[int] = None
    max_query_params: Optional[int] = None

    @property
    def url_gating(self) -> bool:
        return bool(self.host_blocklist) or any(
            v is not None for v in (self.max_host_digits,
                                    self.max_path_depth,
                                    self.max_query_params))

    def to_dict(self) -> dict:
        d = asdict(self)
        d["host_blocklist"] = list(self.host_blocklist or ())
        return d

    # -- deterministic politeness budget math (shared by the Spark engine
    #    and the pure-Python reference simulator so goldens line up) ------

    @property
    def effective_delay_s(self) -> int:
        """Job-level inter-fetch delay: MinDelay floored at 1s (doer.go:62-71)."""
        return max(int(self.min_delay_s), 1)

    def host_budget(self, robots_crawl_delay: float = 0.0) -> int:
        """URLs admitted for one host in one round.

        Reference: per-host worker waits `delay` between requests
        (fetch.go:356-454); delay = robots CrawlDelay if >0 (fetch.go:395-399)
        else the job delay; ThreadsPerSite>1 parallelizes one host
        (fetch.go:364-366,404-414).
        """
        delay = self.effective_delay_s
        if not self.impolite and robots_crawl_delay and robots_crawl_delay > 0:
            delay = robots_crawl_delay
        per_thread = max(1, int(self.round_seconds // delay))
        return per_thread * max(1, int(self.threads_per_site))

    def global_budget(self) -> int:
        """Round-global cap — the MaxConcurrentRequests semaphore analogue
        (doer.go:36-41): at most max_concurrent requests in flight, each
        taking ≥effective_delay seconds."""
        per_slot = max(1, int(self.round_seconds // self.effective_delay_s))
        return max(1, int(self.max_concurrent)) * per_slot

    def realized_global_budget(self, sampler: "DelaySampler") -> int:
        """Round-global cap under the RANDOMIZED delay (P4).

        When MaxDelay > MinDelay the reference draws each request's delay
        from the randChan sampler (doer.go:62-71); a request holds one of
        the max_concurrent semaphore slots for its sampled delay. The
        realized round budget is how many requests start before
        round_seconds across the slots — computed by greedy slot
        simulation over the SAME deterministic sampler in both the Spark
        engine and the reference simulator, so goldens line up. With
        MaxDelay <= MinDelay this degenerates to global_budget() exactly
        (and consumes no draws)."""
        if int(self.max_delay_s) <= self.effective_delay_s:
            return self.global_budget()
        import heapq

        slots = [0.0] * max(1, int(self.max_concurrent))
        heapq.heapify(slots)
        n = 0
        while True:
            t = heapq.heappop(slots)
            if t >= self.round_seconds:
                return max(1, n)
            heapq.heappush(slots, t + sampler.next())
            n += 1


class DelaySampler:
    """The reference's randomized-delay generator (doer.go:93-112).

    ``genRand(min, max)`` redraws int((N(0,1)+1)*(max-min)/2 + min) until
    the value is >= min (no upper clamp — the normal tail can exceed max).
    Every jj-th draw (jj itself resampled from genRand(5, 20)) emits a
    BURST delay from genRand(max, 3*max). The reference seeds its PRNG
    from wall-clock (main_test.go:23 rand.Seed(UnixNano)) so no bit-level
    parity is possible or meaningful; this sampler is seeded from the
    job id so the engine and the simulator draw the SAME sequence and the
    crawl stays deterministic and resumable (resume replays the per-round
    draw sequence from round 0)."""

    def __init__(self, min_delay: int, max_delay: int, seed: int):
        import numpy as np

        self._rng = np.random.Generator(np.random.PCG64(int(seed) & ((1 << 63) - 1)))
        self.min = max(int(min_delay), 1)
        self.max = int(max_delay)
        self._ii = 0
        self._jj = 5

    @classmethod
    def for_spec(cls, spec: "JobSpec") -> "DelaySampler":
        import hashlib

        seed = int.from_bytes(
            hashlib.md5(spec.job_id.encode("utf-8")).digest()[:8], "big"
        )
        return cls(spec.min_delay_s, spec.max_delay_s, seed)

    def _gen(self, lo: int, hi: int) -> int:
        v = 0
        while v < lo:
            v = int((self._rng.standard_normal() + 1.0) * (hi - lo) / 2.0 + lo)
        return v

    def next(self) -> int:
        """Next realized per-request delay in seconds."""
        if self.max <= self.min:
            return self.min  # degenerate fixed-delay mode (MaxDelay=0)
        if self._ii >= self._jj:
            # burst draw; Go's `continue` still runs the loop's ii++
            self._jj = self._gen(5, 20)
            self._ii = 1
            return self._gen(self.max, self.max * 3)
        self._ii += 1
        return self._gen(self.min, self.max)


def jobspec_from_row(row) -> JobSpec:
    """Build a JobSpec from a row of the fixture ``job_specs`` table."""
    d = row.asDict() if hasattr(row, "asDict") else dict(row)
    return JobSpec(
        job_id=d["job_id"],
        seed_url=d.get("seed_url", "") or "",
        depth=int(d.get("depth", -1)),
        no_follow=bool(d.get("no_follow", False)),
        follow_other_domains=not bool(d.get("seed_host_only", True)),
        follow_url_regexp=d.get("follow_url_regexp") or None,
        callback_url_regexp=d.get("callback_url_regexp") or None,
        callback_anchor_regexp=d.get("callback_anchor_regexp") or None,
        callback_seed_url=bool(d.get("callback_seed_url", False)),
        unsafe_normalize=bool(d.get("unsafe_normalize", False)),
        min_delay_s=int(d.get("min_delay_s", 5)),
        max_delay_s=int(d.get("max_delay_s", 0)),
        max_concurrent=int(d.get("max_concurrent", 5)),
        threads_per_site=int(d.get("threads_per_site", 1)),
        impolite=bool(d.get("impolite", False)),
        mimetype=d.get("mimetype", "text/html") or "text/html",
    )
