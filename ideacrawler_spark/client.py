"""Python client — the reference ``pyclient`` surface over the HTTP
front-end.

The reference ships a Python client (``pyclient/pyclient.py``) whose UX
is: configure a ``CrawlJob`` (attribute-style DomainOpt fields,
pyclient.py:88-117), ``Start()`` it on a background thread
(pyclient.py:190-194), receive every crawled page through a callback
running on its own worker thread (pyclient.py:42-58, 216-226), push
extra URLs into the live job with ``AddPage`` (pyclient.py:230-236), and
``Stop()`` to cancel (pyclient.py:238-239). This module re-creates that
surface from scratch against ``serving.py``'s JSON-lines HTTP endpoints
instead of gRPC (no grpc lib in this sandbox; the RPC semantics map
1:1 — POST /jobs streams what AddDomainAndListen streams).

Differences, on purpose:
- snake_case attributes; a ``job_id`` is explicit (the reference gets a
  server-assigned subscription id — GET /jobs/<id> is the analogue).
- pages arrive as :class:`PageHTML` dataclasses (the proto PageHTML
  fields that exist in this engine: url, status, success, meta, content,
  depth, anchor_text, fetch_seq).
- no SIGINT hook (library code shouldn't own process signals).
"""

from __future__ import annotations

import http.client
import json
import queue
import threading
import uuid
from dataclasses import dataclass, field
from typing import Callable, List, Optional


@dataclass
class PageHTML:
    """One crawled page as delivered to the callback (proto PageHTML,
    protofiles/ideacrawler.proto — the fields this engine carries)."""

    url: str
    success: bool
    status: int
    meta: str
    content: str
    depth: int
    anchor_text: str
    fetch_seq: int


@dataclass
class CrawlJob:
    """Configure-then-run crawl job (reference CrawlJob, pyclient.py:82+).

    Attribute defaults mirror the reference client defaults
    (pyclient.py:88-104 / goclient:104-120): min_delay=5, depth=-1,
    max_concurrent_requests=5, polite."""

    svr_host: str = "127.0.0.1"
    svr_port: int = 0
    seed_url: str = ""
    callback: Optional[Callable[[PageHTML, "CrawlJob"], None]] = None
    job_id: str = field(default_factory=lambda: f"pyc-{uuid.uuid4().hex[:12]}")

    # DomainOpt fields (the supported subset; config.py JobSpec)
    min_delay: int = 5
    max_delay: int = 0
    follow: bool = True
    depth: int = -1
    callback_url_regexp: str = ""
    follow_url_regexp: str = ""
    callback_anchor_regexp: str = ""
    callback_seed_url: bool = False
    callback_xpath_match: dict = field(default_factory=dict)
    callback_xpath_regexp: dict = field(default_factory=dict)
    max_concurrent_requests: int = 5
    impolite: bool = False
    unsafe_normalize: bool = False
    check_content: bool = False
    follow_other_domains: bool = False
    threads_per_site: int = 1
    useragent: str = "Fetchbot"
    mimetype: str = "text/html"
    login: bool = False
    check_login_after_each_page: bool = False
    login_success_check: Optional[tuple] = None
    # engine-only knobs passed through when set
    max_rounds: int = 64
    round_seconds: int = 30
    host_blocklist: tuple = ()
    max_host_digits: Optional[int] = None
    max_path_depth: Optional[int] = None
    max_query_params: Optional[int] = None
    # server-side checkpointing: set checkpoint_dir to make the job
    # resumable; a second CrawlJob with the same job_id + checkpoint_dir
    # and resume=True continues from the last committed round (the
    # reference analogue is reconnecting a subscription to a live job)
    checkpoint_dir: Optional[str] = None
    resume: bool = False

    def __post_init__(self):
        self._pushes: List[dict] = []
        self._thread: Optional[threading.Thread] = None
        self._cb_queue: "queue.Queue[Optional[PageHTML]]" = queue.Queue()
        self._cb_thread: Optional[threading.Thread] = None
        self._started = threading.Event()
        self.status_msg = ""
        self.rounds = 0
        self.truncated = False  # True if ANY round hit stream_row_cap
        self.pages: List[PageHTML] = []  # every shipped page, in order

    # -- DomainOpt assembly (PromptForDomain, pyclient.py:160-188) -------
    def _spec(self) -> dict:
        return dict(
            job_id=self.job_id,
            seed_url=self.seed_url,
            depth=self.depth,
            no_follow=not self.follow,
            follow_other_domains=self.follow_other_domains,
            follow_url_regexp=self.follow_url_regexp or None,
            callback_url_regexp=self.callback_url_regexp or None,
            callback_anchor_regexp=self.callback_anchor_regexp or None,
            callback_seed_url=self.callback_seed_url,
            callback_xpath_match=sorted(self.callback_xpath_match.items()),
            callback_xpath_regexp=sorted(self.callback_xpath_regexp.items()),
            unsafe_normalize=self.unsafe_normalize,
            check_content=self.check_content,
            min_delay_s=self.min_delay,
            max_delay_s=self.max_delay,
            max_concurrent=self.max_concurrent_requests,
            impolite=self.impolite,
            threads_per_site=self.threads_per_site,
            useragent=self.useragent,
            mimetype=self.mimetype,
            login=self.login,
            check_login_after_each_page=self.check_login_after_each_page,
            login_success_check=(list(self.login_success_check)
                                 if self.login_success_check else None),
            max_rounds=self.max_rounds,
            round_seconds=self.round_seconds,
            host_blocklist=list(self.host_blocklist or ()),
            max_host_digits=self.max_host_digits,
            max_path_depth=self.max_path_depth,
            max_query_params=self.max_query_params,
        )

    # -- lifecycle (Start/IsAlive/Run/Stop, pyclient.py:190-239) ---------
    def start(self, timeout: float = 30.0) -> "CrawlJob":
        """Run the job on a background thread; returns once the server
        has accepted it (the reference sleeps 2s instead)."""
        self._thread = threading.Thread(target=self.run, daemon=True)
        self._thread.start()
        self._started.wait(timeout)
        return self

    def is_alive(self) -> bool:
        return self._thread is not None and self._thread.is_alive()

    def join(self, timeout: Optional[float] = None):
        if self._thread is not None:
            self._thread.join(timeout)

    def run(self):
        """AddDomainAndListen: stream rounds, dispatch pages to the
        callback worker (CrawlerCallback thread, pyclient.py:42-58)."""
        if self.callback is not None:
            self._cb_thread = threading.Thread(target=self._cb_loop,
                                               daemon=True)
            self._cb_thread.start()
        conn = http.client.HTTPConnection(self.svr_host, self.svr_port,
                                          timeout=3600)
        try:
            body = {"spec": self._spec(), "pushes": self._pushes}
            if self.checkpoint_dir:
                body["checkpoint_dir"] = self.checkpoint_dir
            if self.resume:
                body["resume"] = True
            conn.request("POST", "/jobs", json.dumps(body),
                         {"Content-Type": "application/json"})
            resp = conn.getresponse()
            if resp.status != 200:
                self.status_msg = resp.read().decode("utf-8", "replace")
                self._started.set()
                return
            self._started.set()
            while True:
                raw = resp.readline()
                if not raw:
                    self.status_msg = "stream closed without done"
                    break
                line = json.loads(raw)
                if line.get("truncated"):
                    # The server capped this round's shipped rows
                    # (stream_row_cap): delivery is PARTIAL — surface it
                    # rather than silently diverging from the reference
                    # pyclient's deliver-every-page contract. The full set
                    # stays in the server-side checkpoint.
                    self.truncated = True
                if line.get("done"):
                    self.rounds = int(line.get("rounds", 0))
                    self.status_msg = ("done (truncated: some rounds "
                                       "exceeded stream_row_cap)"
                                       if self.truncated else "done")
                    break
                for s in line.get("shipped", []):
                    ph = PageHTML(
                        url=s["url"], success=bool(s["success"]),
                        status=int(s["status"]), meta=s.get("meta", ""),
                        content=s.get("text", ""),
                        depth=int(s.get("depth", 0)),
                        anchor_text=s.get("anchor_text", ""),
                        fetch_seq=int(s.get("fetch_seq", -1)),
                    )
                    self.pages.append(ph)
                    if self.callback is not None:
                        self._cb_queue.put(ph)
        except Exception as e:  # noqa: BLE001 — surfaced via status_msg
            self.status_msg = f"error: {e}"
            self._started.set()
        finally:
            conn.close()
            if self.callback is not None:
                self._cb_queue.put(None)  # drain sentinel
                self._cb_thread.join(timeout=60)

    def _cb_loop(self):
        while True:
            ph = self._cb_queue.get()
            if ph is None:
                return
            try:
                self.callback(ph, self)
            except Exception as e:  # noqa: BLE001 — a bad callback must
                self.status_msg = f"callback error: {e}"  # not kill the stream

    def _post(self, path: str, body: dict) -> dict:
        conn = http.client.HTTPConnection(self.svr_host, self.svr_port,
                                          timeout=60)
        try:
            conn.request("POST", path, json.dumps(body),
                         {"Content-Type": "application/json"})
            return json.loads(conn.getresponse().read() or b"{}")
        finally:
            conn.close()

    def add_page(self, url: str, meta_str: str = ""):
        """Push a URL into the job (AddPage, pyclient.py:230-236). Before
        start(): rides the job registration as a round-0 push. After:
        POSTs to the live job and lands at the next round boundary."""
        push = {"url": url, "meta": meta_str, "method": "GET"}
        if self._thread is None:
            push["round"] = 0
            push["seq"] = len(self._pushes)
            self._pushes.append(push)
            return {"queued": len(self._pushes)}
        return self._post(f"/jobs/{self.job_id}/pages", {"pushes": [push]})

    def stop(self) -> dict:
        """CancelJob (pyclient.py:238-239): takes effect at the next
        round boundary; committed rounds stay resumable server-side."""
        return self._post(f"/jobs/{self.job_id}/cancel", {})

    def status(self) -> dict:
        """GET /jobs/<id> — the subscription-status analogue."""
        conn = http.client.HTTPConnection(self.svr_host, self.svr_port,
                                          timeout=60)
        try:
            conn.request("GET", f"/jobs/{self.job_id}")
            return json.loads(conn.getresponse().read() or b"{}")
        finally:
            conn.close()


# ---------------------------------------------------------------------------
# Protobuf wire surface (wire.py): the reference's RPC byte format
# ---------------------------------------------------------------------------

def add_domain_and_listen_proto(host: str, port: int,
                                opt: dict) -> tuple[str, list, dict]:
    """AddDomainAndListen over the protobuf wire codec: POST one
    DomainOpt message (the reference's request type, proto :26) and read
    the framed PageHTML stream. Returns ``(job_id, pages, status)`` where
    ``pages`` are decoded PageHTML dicts (jobID carried in each message,
    as the reference streams it) and ``status`` is the trailing framed
    Status — this HTTP/1.1 surface's stand-in for gRPC's trailer block.

    The server assigns the job id (subscription model); it is echoed both
    in each PageHTML.jobID and in the X-Job-Id response header, so control
    calls (`add_pages_proto`, `cancel_job_proto`) can target the live job
    mid-stream.
    """
    from ideacrawler_spark import wire

    conn = http.client.HTTPConnection(host, port, timeout=3600)
    try:
        conn.request("POST", "/jobs", wire.DOMAIN_OPT.encode(opt),
                     {"Content-Type": "application/x-protobuf"})
        resp = conn.getresponse()
        if resp.status != 200:
            raise RuntimeError(f"HTTP {resp.status}: {resp.read()!r}")
        job_id = resp.getheader("X-Job-Id") or ""
        frames = []
        while True:
            f = wire.read_frame(resp)
            if f is None:
                break
            frames.append(f)
        if not frames:
            raise RuntimeError("stream ended without a Status frame")
        status = wire.STATUS.decode(frames[-1])
        pages = [wire.PAGE_HTML.decode(f) for f in frames[:-1]]
        return job_id, pages, status
    finally:
        conn.close()


def add_pages_proto(host: str, port: int, job_id: str,
                    urls: list, meta_str: str = "") -> dict:
    """AddPages RPC over the wire codec: a stream of framed PageRequest
    messages in one POST body; returns the decoded Status."""
    from ideacrawler_spark import wire

    body = b"".join(
        wire.frame(wire.PAGE_REQUEST.encode(
            {"jobID": {"ID": job_id}, "reqtype": wire.PAGE_REQ_GET,
             "url": u, "metaStr": meta_str}))
        for u in urls)
    conn = http.client.HTTPConnection(host, port, timeout=60)
    try:
        conn.request("POST", f"/jobs/{job_id}/pages", body,
                     {"Content-Type": "application/x-protobuf"})
        resp = conn.getresponse()
        from ideacrawler_spark.wire import STATUS, read_frame
        f = read_frame(resp)
        return STATUS.decode(f) if f is not None else {}
    finally:
        conn.close()


def cancel_job_proto(host: str, port: int, job_id: str) -> dict:
    """CancelJob RPC over the wire codec: framed JobID in, Status out."""
    from ideacrawler_spark import wire

    conn = http.client.HTTPConnection(host, port, timeout=60)
    try:
        conn.request("POST", f"/jobs/{job_id}/cancel",
                     wire.frame(wire.JOB_ID.encode({"ID": job_id})),
                     {"Content-Type": "application/x-protobuf"})
        resp = conn.getresponse()
        f = wire.read_frame(resp)
        return wire.STATUS.decode(f) if f is not None else {}
    finally:
        conn.close()


def get_worker_id_proto(host: str, port: int) -> str:
    """GetWorkerID RPC over the wire codec."""
    from ideacrawler_spark import wire

    conn = http.client.HTTPConnection(host, port, timeout=60)
    try:
        conn.request("GET", "/worker_id", None,
                     {"Accept": "application/x-protobuf"})
        resp = conn.getresponse()
        f = wire.read_frame(resp)
        return wire.WORKER_ID.decode(f)["ID"] if f is not None else ""
    finally:
        conn.close()
