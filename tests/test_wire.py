"""Protobuf wire-format parity (VERDICT r04 missing #4).

`wire.py` hand-rolls the proto3 wire codec for every message in the
reference's `protofiles/ideacrawler.proto` from the PUBLIC encoding spec
(https://protobuf.dev/programming-guides/encoding/). These tests pin the
byte format with hand-computed golden vectors (so the encodings are what
stock protobuf emits — tag = field<<3|wiretype, base-128 varints,
length-prefixed strings/messages, default omission, 10-byte negative
varints), exercise decoder robustness (unknown fields, truncation,
int32 truncation semantics), and drive a crawl end-to-end through the
protobuf HTTP surface, matching the reference-simulator golden.
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ideacrawler_spark import wire
from ideacrawler_spark.wire import (
    DOMAIN_OPT, JOB_ID, PAGE_HTML, PAGE_REQUEST, STATUS, URL_LIST,
    decode_varint, encode_varint,
)


# --------------------------------------------------------------------------
# varints
# --------------------------------------------------------------------------

def test_varint_golden():
    # spec examples: 1 -> 01, 150 -> 9601, 300 -> ac02
    assert encode_varint(1) == bytes.fromhex("01")
    assert encode_varint(150) == bytes.fromhex("9601")
    assert encode_varint(300) == bytes.fromhex("ac02")
    # negative ints take the two's-complement-64 route: ALWAYS 10 bytes
    assert encode_varint(-1) == bytes.fromhex("ffffffffffffffffff01")
    assert len(encode_varint(-5)) == 10
    for v in (0, 1, 127, 128, 300, 2**32, 2**63 - 1, -1, -2**31):
        got, pos = decode_varint(encode_varint(v), 0)
        want = v if v >= 0 else v + (1 << 64)
        assert got == want and pos == len(encode_varint(v))


def test_varint_malformed():
    with pytest.raises(ValueError):
        decode_varint(b"\x80\x80", 0)           # truncated continuation
    with pytest.raises(ValueError):
        decode_varint(b"\xff" * 11, 0)          # > 10 bytes


# --------------------------------------------------------------------------
# golden message encodings (hand-computed from the spec)
# --------------------------------------------------------------------------

def test_status_golden_bytes():
    assert STATUS.encode({"success": True, "error": "x"}) \
        == bytes.fromhex("0801120178")
    # proto3 default omission: all-default message is EMPTY
    assert STATUS.encode({"success": False, "error": ""}) == b""
    assert STATUS.decode(b"") == {"success": False, "error": ""}


def test_jobid_golden_bytes():
    enc = JOB_ID.encode({"ID": "job-1"})
    assert enc == bytes.fromhex("0a05") + b"job-1"
    assert JOB_ID.decode(enc) == {"ID": "job-1"}


def test_domainopt_golden_bytes():
    opt = {"seedUrl": "http://a/", "noFollow": True,
           "maxConcurrentRequests": 5, "depth": -1}
    want = (bytes.fromhex("0a09") + b"http://a/"
            + bytes.fromhex("2001")                    # field 4 bool
            + bytes.fromhex("3805")                    # field 7 int32=5
            + bytes.fromhex("50ffffffffffffffffff01"))  # field 10 int32=-1
    assert DOMAIN_OPT.encode(opt) == want
    back = DOMAIN_OPT.decode(want)
    assert back["seedUrl"] == "http://a/" and back["noFollow"] is True
    assert back["maxConcurrentRequests"] == 5 and back["depth"] == -1
    # absent fields decode to proto3 defaults
    assert back["useragent"] == "" and back["ThreadsPerSite"] == 0
    assert back["callbackXpathMatch"] == []


def test_domainopt_repeated_kvp_and_high_fields():
    opt = {"callbackXpathMatch": [{"key": "k", "value": "v"}],
           "callbackAnchorTextRegexp": "nav",   # field 39: 2-byte tag
           "callbackSeedUrl": True,             # field 40
           "mimetype": "text/html"}             # field 41
    enc = DOMAIN_OPT.encode(opt)
    kvp = bytes.fromhex("0a016b120176")
    assert enc == (bytes.fromhex("7206") + kvp
                   + bytes.fromhex("ba02" "03") + b"nav"
                   + bytes.fromhex("c00201")
                   + bytes.fromhex("ca02" "09") + b"text/html")
    assert DOMAIN_OPT.decode(enc)["callbackXpathMatch"] \
        == [{"key": "k", "value": "v"}]


def test_pagehtml_golden_bytes():
    msg = {"success": True, "jobID": {"ID": "j"}, "url": "u",
           "httpstatuscode": 200, "content": b"\x00\x01", "urlDepth": 3}
    want = bytes.fromhex("0801" "1a030a016a" "220175" "28c801"
                         "32020001" "4003")
    assert PAGE_HTML.encode(msg) == want
    back = PAGE_HTML.decode(want)
    assert back["content"] == b"\x00\x01" and back["jobID"] == {"ID": "j"}
    assert back["httpstatuscode"] == 200 and back["anchorText"] == ""


def test_urllist_repeated_string():
    enc = URL_LIST.encode({"url": ["a", "b"], "urlDepth": 1})
    assert enc == bytes.fromhex("0a0161" "0a0162" "1801")
    assert URL_LIST.decode(enc)["url"] == ["a", "b"]


# --------------------------------------------------------------------------
# decoder robustness
# --------------------------------------------------------------------------

def test_unknown_fields_skipped_every_wire_type():
    base = STATUS.encode({"success": True})
    # field 99 varint, field 50 fixed64, field 60 len-delim, field 70 fixed32
    extra = (encode_varint(99 << 3 | 0) + encode_varint(7)
             + encode_varint(50 << 3 | 1) + b"\x00" * 8
             + encode_varint(60 << 3 | 2) + encode_varint(3) + b"abc"
             + encode_varint(70 << 3 | 5) + b"\x00" * 4)
    assert STATUS.decode(base + extra) == {"success": True, "error": ""}
    # group wire types are malformed proto3
    with pytest.raises(ValueError):
        STATUS.decode(encode_varint(9 << 3 | 3))
    # truncated length-delimited payload
    with pytest.raises(ValueError):
        STATUS.decode(bytes.fromhex("12" "05") + b"ab")


def test_int32_truncation_and_duplicate_scalars():
    # int32 decodes by truncating the 64-bit varint to 32 bits
    raw = encode_varint(2 << 3 | 0) + encode_varint((1 << 32) + 7)
    assert DOMAIN_OPT.decode(raw)["minDelay"] == 7
    # duplicate scalar fields: last one wins (spec merge rule)
    raw = (encode_varint(2 << 3 | 0) + encode_varint(3)
           + encode_varint(2 << 3 | 0) + encode_varint(9))
    assert DOMAIN_OPT.decode(raw)["minDelay"] == 9
    # int32 overflow on ENCODE is rejected
    with pytest.raises(ValueError):
        DOMAIN_OPT.encode({"minDelay": 1 << 31})


_SAFE_TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40)


@settings(max_examples=60, deadline=None)
@given(st.builds(
    dict,
    seedUrl=_SAFE_TEXT,
    minDelay=st.integers(-(1 << 31), (1 << 31) - 1),
    ThreadsPerSite=st.integers(-(1 << 63), (1 << 63) - 1),
    noFollow=st.booleans(),
    useragent=_SAFE_TEXT,
    keepDomains=st.lists(_SAFE_TEXT, max_size=4),
    callbackXpathMatch=st.lists(
        st.builds(dict, key=_SAFE_TEXT, value=_SAFE_TEXT), max_size=3),
))
def test_domainopt_roundtrip_property(opt):
    back = DOMAIN_OPT.decode(DOMAIN_OPT.encode(opt))
    for k, v in opt.items():
        assert back[k] == v, k


def test_pagerequest_roundtrip_with_enum():
    msg = {"jobID": {"ID": "sub-1"}, "reqtype": wire.PAGE_REQ_HEAD,
           "url": "http://x/", "noCallback": True}
    back = PAGE_REQUEST.decode(PAGE_REQUEST.encode(msg))
    assert back["reqtype"] == 1 and back["jobID"]["ID"] == "sub-1"
    assert back["js"] == "" and back["metaStr"] == ""


# --------------------------------------------------------------------------
# gRPC framing
# --------------------------------------------------------------------------

def test_frame_roundtrip():
    msgs = [b"", b"a", b"x" * 300]
    buf = b"".join(wire.frame(m) for m in msgs)
    assert list(wire.unframe(buf)) == msgs
    assert buf[:5] == b"\x00\x00\x00\x00\x00"  # flag 0 + u32 BE len
    with pytest.raises(ValueError):
        list(wire.unframe(b"\x01\x00\x00\x00\x00"))  # compressed: refused
    with pytest.raises(ValueError):
        list(wire.unframe(b"\x00\x00\x00\x00\x05ab"))  # truncated body


# --------------------------------------------------------------------------
# DomainOpt <-> JobSpec mapping
# --------------------------------------------------------------------------

def test_spec_mapping_roundtrip_follows_parity_audit():
    from ideacrawler_spark.config import JobSpec

    opt = {"seedUrl": "http://h/", "minDelay": 2, "noFollow": True,
           "maxConcurrentRequests": 9, "useragent": "MyBot", "depth": 3,
           "callbackXpathMatch": [{"key": "//h1", "value": "T"}],
           "unsafeNormalizeURL": True, "checkContent": True,
           "callbackSeedUrl": True, "mimetype": "text/plain"}
    kw = wire.spec_kwargs_from_domainopt(opt)
    spec = JobSpec(job_id="t", **kw)
    assert (spec.seed_url, spec.min_delay_s, spec.no_follow) \
        == ("http://h/", 2, True)
    assert spec.max_concurrent == 9 and spec.useragent == "MyBot"
    assert spec.callback_xpath_match == (("//h1", "T"),)
    assert spec.unsafe_normalize and spec.check_content
    assert spec.mimetype == "text/plain"
    # absent wire fields fall through to JobSpec defaults (proto3 contract)
    assert JobSpec(job_id="t", **wire.spec_kwargs_from_domainopt(
        {})).useragent == "Fetchbot"
    # inverse: spec dict -> DomainOpt -> bytes -> back to the same kwargs
    back = wire.DOMAIN_OPT.decode(wire.DOMAIN_OPT.encode(
        wire.domainopt_from_spec({
            "seed_url": "http://h/", "min_delay_s": 2, "no_follow": True,
            "max_concurrent": 9, "useragent": "MyBot", "depth": 3,
            "callback_xpath_match": (("//h1", "T"),),
            "unsafe_normalize": True, "check_content": True,
            "callback_seed_url": True, "mimetype": "text/plain"})))
    assert wire.spec_kwargs_from_domainopt(back) == kw


# --------------------------------------------------------------------------
# end to end: a crawl over the protobuf surface matches the golden
# --------------------------------------------------------------------------

def test_proto_crawl_matches_golden(spark, web, web_dfs):
    """AddDomainAndListen as protobuf bytes: DomainOpt in, framed
    PageHTML stream + trailing Status out — shipped (url, text) multiset
    equals the reference simulator's."""
    from ideacrawler_spark.client import (
        add_domain_and_listen_proto, get_worker_id_proto)
    from ideacrawler_spark.config import JobSpec
    from ideacrawler_spark.refsim import simulate
    from ideacrawler_spark.serving import CrawlServer

    pages, robots, _, _ = web
    pages_df, robots_df, _, _ = web_dfs
    opt = {"seedUrl": "http://hosta.example/p/0", "minDelay": 1,
           "maxConcurrentRequests": 5}
    golden = simulate(
        JobSpec(job_id="g", **wire.spec_kwargs_from_domainopt(opt)),
        pages, robots, None)
    srv = CrawlServer(spark, pages_df, robots_df).start()
    try:
        wid = get_worker_id_proto("127.0.0.1", srv.port)
        assert wid.startswith("spark-worker-")
        job_id, got, status = add_domain_and_listen_proto(
            "127.0.0.1", srv.port, opt)
    finally:
        srv.stop()
    assert status == {"success": True, "error": ""}
    assert job_id.startswith("sub-")
    assert all(p["jobID"] == {"ID": job_id} for p in got)
    shipped = sorted((p["url"], p["content"].decode("utf-8")) for p in got)
    want = sorted((s["url"], s["text"]) for s in golden.shipped)
    assert shipped == want
    # depths ride the stream like the reference's PageHTML.urlDepth
    by_url = {s["url"]: s["depth"] for s in golden.shipped}
    assert all(p["urlDepth"] == by_url[p["url"]] for p in got)


def test_proto_addpages_and_cancel(spark, web_dfs):
    """AddPages + CancelJob over the wire codec against a live job."""
    import threading
    import time

    from ideacrawler_spark.client import (
        add_domain_and_listen_proto, add_pages_proto, cancel_job_proto)
    from ideacrawler_spark.serving import CrawlServer

    pages_df, robots_df, _, _ = web_dfs
    srv = CrawlServer(spark, pages_df, robots_df).start()
    out = {}

    def run():
        out["result"] = add_domain_and_listen_proto(
            "127.0.0.1", srv.port,
            {"seedUrl": "http://hosta.example/p/0", "minDelay": 1})

    t = threading.Thread(target=run, daemon=True)
    try:
        t.start()
        # wait for the server to register the subscription
        for _ in range(600):
            with srv._lock:
                live = [j for j in srv.jobs if j.startswith("sub-")]
            if live:
                break
            time.sleep(0.05)
        assert live, "job never registered"
        jid = live[0]
        st_push = add_pages_proto("127.0.0.1", srv.port, jid,
                                  ["http://hostb.example/p/1"])
        assert st_push["success"] is True
        st_cancel = cancel_job_proto("127.0.0.1", srv.port, jid)
        assert st_cancel["success"] is True
        t.join(timeout=600)
        assert not t.is_alive()
    finally:
        srv.stop()
    job_id, pages_got, status = out["result"]
    assert job_id == jid and status["success"] is True
    # unknown-job control calls get a Status error, not a JSON body
    srv2 = CrawlServer(spark, pages_df, robots_df).start()
    try:
        st404 = cancel_job_proto("127.0.0.1", srv2.port, "nope")
        assert st404["success"] is False and "no job" in st404["error"]
    finally:
        srv2.stop()
