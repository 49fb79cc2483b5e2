"""Link + resource extraction — the ``a[href]`` scan of the reference.

The reference uses goquery's CSS selector ``doc.Find("a[href]")`` in
document order, takes the raw ``href`` attribute and the whitespace-trimmed
text content of the anchor (/root/reference/job.go:816-825).

No HTML parser LIBRARY ships in this sandbox (lxml/selectolax/bs4 absent),
so extraction runs on the stdlib ``html.parser`` tokenizer — like Go's
net/html it handles single-quoted/unquoted attributes, entity references,
stray ``<``, unclosed tags and nested elements. Two net/html behaviors are
replicated explicitly: an ``<a>`` opening inside an open ``<a>`` implicitly
closes the previous one (anchors never nest in the HTML5 tree), and
``<script>`` content is raw text (so goquery's dead-code
``script ⊃ link`` branch in prefetchurl.go:63-66 matches nothing here
either).

``extract_resources`` mirrors the prefetch extractor
(/root/reference/prefetchurl/prefetchurl.go:34-157): script ``src``, then
``link href`` (rel != "prefetch"), then img ``data-img-src``/``src``; for
``*.css`` URLs the ``url(...)`` regex over the text instead. validateLink
parity: the last path segment must contain ``.<word>`` (the reference's
``^*\\.\\w`` compiles to an unanchored ``\\.\\w``), ``.xml`` is skipped,
links starting with "http" pass through VERBATIM (no resolution), others
resolve against the page URL — and no purell normalization anywhere.

Spark integration: Arrow-batched pandas UDFs returning
``array<struct<href:string, anchor:string>>`` (callers ``posexplode`` for
the per-page link index) and ``array<string>`` for resources.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import List, Optional, Tuple
from urllib.parse import urljoin

import pandas as pd

_RX_TAG = re.compile(rb"<[^>]+>")


class _DocScanner(HTMLParser):
    """One-pass scanner collecting a[href] anchors (document order, inner
    text, implicit close on nested <a>) and the prefetch resource
    attributes (script src / link href / img src|data-img-src)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.links: List[Tuple[str, str]] = []
        self._href: Optional[str] = None
        self._text: List[str] = []
        self.script_srcs: List[str] = []
        self.link_hrefs: List[str] = []
        self.img_srcs: List[str] = []

    def _close_anchor(self):
        if self._href is not None:
            self.links.append((self._href, "".join(self._text).strip()))
        self._href = None
        self._text = []

    def handle_starttag(self, tag, attrs):
        d = dict(attrs)
        if tag == "a":
            # net/html: a new <a> implicitly closes an open one
            self._close_anchor()
            if "href" in d and d["href"] is not None:
                self._href = d["href"]
                self._text = []
        elif tag == "script":
            src = (d.get("src") or "").strip()
            if src:
                self.script_srcs.append(src)
        elif tag == "link":
            if (d.get("rel") or "").strip() != "prefetch":
                href = (d.get("href") or "").strip()
                if href:
                    self.link_hrefs.append(href)
        elif tag == "img":
            data_src = (d.get("data-img-src") or "").strip()
            if data_src:
                self.img_srcs.append(data_src)
            src = (d.get("src") or "").strip()
            if src:
                self.img_srcs.append(src)

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag):
        if tag == "a":
            self._close_anchor()

    def handle_data(self, data):
        if self._href is not None:
            self._text.append(data)

    def close(self):
        super().close()
        self._close_anchor()


def _scan(html: bytes | str | None) -> _DocScanner:
    p = _DocScanner()
    if html is None:
        return p
    if isinstance(html, bytes):
        html = html.decode("utf-8", "replace")
    try:
        p.feed(html)
        p.close()
    except Exception:  # noqa: BLE001 — parser never takes down a batch
        p._close_anchor()
    return p


def extract_links(html: bytes | str | None) -> List[Tuple[str, str]]:
    """Return [(href, anchor_text), ...] in document order.

    href is the raw attribute value (resolution + normalization happen
    downstream, job.go:821-832); anchor text is the inner text with
    strings.TrimSpace semantics (job.go:818)."""
    return _scan(html).links


# ---- S6: resource/prefetch URL extraction (prefetchurl.go) ----------------

# last path segment must contain '.<word char>' — the reference compiles
# `^*\.\w` which RE2 treats as an unanchored `\.\w` (prefetchurl.go:35)
_RX_VALID_SEG = re.compile(r"\.\w")
_RX_CSS_URL = re.compile(r"url\(['\"]?([^\)\(]+?)['\"]?\)")


def _validate_link(page_url: str, link: str) -> Optional[str]:
    """validateLink (prefetchurl.go:34-53): extension-ish last segment,
    no .xml, http-prefixed links verbatim, others resolved (plain net/url
    resolution — no purell)."""
    seg = link.split("/")[-1]
    if _RX_VALID_SEG.search(seg) is None:
        return None
    if link.endswith(".xml"):
        return None
    if link.startswith("http"):
        return link
    try:
        return urljoin(page_url, link)
    except ValueError:
        return None


def extract_resources(html: bytes | str | None, page_url: str) -> List[str]:
    """GetPrefetchURLs (prefetchurl.go:131-157): css-embedded url(...) for
    *.css page URLs, else script/link/img sources in selector-group order."""
    if html is None:
        return []
    if page_url.endswith(".css"):
        if isinstance(html, bytes):
            text = html.decode("utf-8", "replace")
        else:
            text = html
        cands = [m.group(1) for m in _RX_CSS_URL.finditer(text)]
    else:
        p = _scan(html)
        cands = p.script_srcs + p.link_hrefs + p.img_srcs
    out = []
    for link in cands:
        v = _validate_link(page_url, link)
        if v:
            out.append(v)
    return out


# ---- xpath subset (callback decision F7) ----------------------------------
#
# The reference evaluates each CallbackXpathMatch/CallbackXpathRegexp key
# with antchfx/xpath on an html DOM and compares the FIRST node's string
# value for EQUALITY — even for the "Regexp" variant (job.go:233-269, the
# documented quirk). No xpath library ships in this sandbox, so the
# evaluator below builds a mini-DOM on the stdlib tokenizer and supports
# the location-path subset real callback specs use:
#   //tag   //tag[@attr='v']   //tag[n]   //tag[contains(@attr,'v')]
#   //tag[contains(text(),'v')]   //div/span   //div//span
#   /html/head/title   //meta[@name='x']/@content   //title/text()
#   //tag[starts-with(@attr,'v')]   //tag[starts-with(text(),'v')]
#   //tag[normalize-space()='v']    //tag[normalize-space(@a)='v']
#   //tag[@price>3]  (numeric >,<,>=,<=,=,!= with number() NaN semantics)
#   //h2/following-sibling::p   //dt[...]/following-sibling::dd[1]
#   //li/preceding-sibling::li[1]  ([1] = NEAREST preceding, XPath order)
#   //tag[@attr]  //tag[not(@attr)]  //tag[A and B]  //tag[A or B]
#   //tag[text()='v']  //tag[.='v']  //div[span[@id='s']/em]  (nested
#   child-path existence predicates)  //li[position()>2]  //li[last()-1]
#   //input[@name='q']/..  (parent step)
#   (* as a wildcard tag; child and descendant axes; chained predicates;
#   trailing @attr / text() node selection). String value =
#   concatenated descendant text of the first match in document order
#   (antchfx Value()); attribute and text nodes value to their own
#   content; no match or an unsupported expression → empty string
#   (antchfx: empty node value).

_VOID_TAGS = {"area", "base", "br", "col", "embed", "hr", "img", "input",
              "link", "meta", "param", "source", "track", "wbr"}


class _MiniNode:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # str (text) | _MiniNode


class _TreeBuilder(HTMLParser):
    """Tolerant DOM builder: nearest-open-tag end matching, void elements
    never nest, script/style are raw text (HTMLParser CDATA mode)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _MiniNode("#root", {})
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _MiniNode(tag, dict(attrs))
        self._stack[-1].children.append(node)
        if tag not in _VOID_TAGS:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self._stack[-1].children.append(_MiniNode(tag, dict(attrs)))

    def handle_endtag(self, tag):
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                break

    def handle_data(self, data):
        self._stack[-1].children.append(data)


def _build_tree(html: bytes | str) -> _MiniNode:
    if isinstance(html, bytes):
        html = html.decode("utf-8", "replace")
    b = _TreeBuilder()
    try:
        b.feed(html)
        b.close()
    except Exception:  # noqa: BLE001 — parser never takes down a batch
        pass
    return b.root


_RX_XPATH_TAG = re.compile(r"^([A-Za-z][\w-]*|\*)$")
# predicate leaf forms
_RX_PRED_ATTR_EQ = re.compile(r"^@([\w-]+)\s*=\s*(['\"])(.*?)\2$")
_RX_PRED_ATTR_PRESENT = re.compile(r"^@([\w-]+)$")
_RX_PRED_POS = re.compile(r"^(\d+)$")
_RX_PRED_POSITION_CMP = re.compile(
    r"^position\(\)\s*(>=|<=|!=|>|<|=)\s*(\d+)$")
_RX_PRED_LAST_OFF = re.compile(r"^last\(\)\s*-\s*(\d+)$")
_RX_PRED_CONTAINS = re.compile(
    r"^contains\(\s*(?:@([\w-]+)|text\(\)|\.)\s*,\s*(['\"])(.*?)\2\s*\)$")
_RX_PRED_STARTS = re.compile(
    r"^starts-with\(\s*(?:@([\w-]+)|text\(\)|\.)\s*,\s*(['\"])(.*?)\2\s*\)$")
# normalize-space(), normalize-space(text()), normalize-space(@attr),
# compared for equality against a string literal
_RX_PRED_NORMSPACE = re.compile(
    r"^normalize-space\(\s*(?:@([\w-]+)|(text\(\))|)\s*\)"
    r"\s*=\s*(['\"])(.*?)\3$")
# numeric attribute comparison: [@price>3] [@n>=2.5] [@n!=0] — XPath
# number() semantics: a missing/non-numeric attribute is NaN, every
# comparison with NaN is false
_RX_PRED_ATTR_CMP = re.compile(
    r"^@([\w-]+)\s*(>=|<=|!=|>|<|=)\s*(-?\d+(?:\.\d+)?)$")
_RX_PRED_TEXT_EQ = re.compile(r"^text\(\)\s*=\s*(['\"])(.*?)\1$")
_RX_PRED_DOT_EQ = re.compile(r"^\.\s*=\s*(['\"])(.*?)\1$")
# a relative child path used as an existence predicate: [span],
# [span[@class='x']], [a/img] — steps joined by '/', child axis only
_RX_PRED_RELPATH_HEAD = re.compile(r"^[A-Za-z*]")

# list-level predicate kinds (select by position within the candidate
# list) — these cannot appear inside and/or/not, which are node-wise
_LIST_PREDS = ("pos", "last", "pos_cmp", "last_off")


def _split_top(s: str, seps: tuple) -> list:
    """Split ``s`` on any of the word separators in ``seps`` at top level
    (outside quotes, parens, and brackets). Returns [part, sep, part, ...]
    — parts interleaved with the separators found."""
    out, cur, q, depth = [], [], None, 0
    i = 0
    while i < len(s):
        ch = s[i]
        if q:
            cur.append(ch)
            if ch == q:
                q = None
            i += 1
            continue
        if ch in "'\"":
            q = ch
            cur.append(ch)
            i += 1
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if depth == 0:
            matched = None
            for sep in seps:
                token = f" {sep} "
                if s.startswith(token, i):
                    matched = sep
                    break
            if matched:
                out.append("".join(cur))
                out.append(matched)
                cur = []
                i += len(matched) + 2
                continue
        cur.append(ch)
        i += 1
    out.append("".join(cur))
    return out


def _split_preds(predstr: str):
    """Split a run of ``[..][..]`` into predicate bodies, respecting
    nested brackets ([tr[td]] is ONE predicate) and quoted text. Returns
    None if the string is not a balanced bracket run."""
    preds, cur, q, depth = [], [], None, 0
    for ch in predstr:
        if q:
            cur.append(ch)
            if ch == q:
                q = None
            continue
        if ch in "'\"":
            q = ch
            cur.append(ch)
            continue
        if ch == "[":
            depth += 1
            if depth == 1:
                continue
        elif ch == "]":
            depth -= 1
            if depth < 0:
                return None
            if depth == 0:
                preds.append("".join(cur))
                cur = []
                continue
        elif depth == 0:
            return None  # text between predicate groups
        cur.append(ch)
    if depth != 0 or q is not None:
        return None
    return preds


def _split_step(p: str):
    """One path component → (tag, [pred bodies]) or None."""
    cut = p.find("[")
    tag, predstr = (p, "") if cut < 0 else (p[:cut], p[cut:])
    if not _RX_XPATH_TAG.match(tag):
        return None
    preds = _split_preds(predstr) if predstr else []
    if preds is None:
        return None
    return tag, preds


def _parse_rel_path(s: str):
    """A relative child path for existence predicates ([span/em],
    [td[@class='x']]): '/'-joined steps, child axis only. Returns
    [(tag, [parsed preds]), ...] or None."""
    segs, cur, q, depth = [], [], None, 0
    for ch in s:
        if q:
            cur.append(ch)
            if ch == q:
                q = None
        elif ch in "'\"":
            q = ch
            cur.append(ch)
        elif ch == "[":
            depth += 1
            cur.append(ch)
        elif ch == "]":
            depth -= 1
            cur.append(ch)
        elif ch == "/" and depth == 0:
            segs.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    segs.append("".join(cur))
    steps = []
    for seg in segs:
        if seg == "":
            return None  # leading/double slash — not a relative path
        parsed = _split_step(seg)
        if parsed is None:
            return None
        tag, raw_preds = parsed
        preds = []
        for raw in raw_preds:
            pr = _parse_pred(raw)
            if pr is None:
                return None
            preds.append(pr)
        steps.append((tag, preds))
    return steps or None


def _parse_leaf(pred: str):
    """One atomic predicate → tagged tuple or None (outside the subset)."""
    pred = pred.strip()
    m = _RX_PRED_ATTR_EQ.match(pred)
    if m:
        return ("attr_eq", m.group(1), m.group(3))
    m = _RX_PRED_POS.match(pred)
    if m:
        n = int(m.group(1))
        return ("pos", n) if n >= 1 else None  # XPath positions are 1-based
    m = _RX_PRED_POSITION_CMP.match(pred)
    if m:
        op, n = m.group(1), int(m.group(2))
        if op == "=":
            return ("pos", n) if n >= 1 else None
        return ("pos_cmp", op, n)
    m = _RX_PRED_LAST_OFF.match(pred)
    if m:
        return ("last_off", int(m.group(1)))
    m = _RX_PRED_ATTR_PRESENT.match(pred)
    if m:
        return ("attr_present", m.group(1))
    m = _RX_PRED_CONTAINS.match(pred)
    if m:
        if m.group(1) is not None:
            return ("contains_attr", m.group(1), m.group(3))
        return ("contains_text", m.group(3))
    m = _RX_PRED_STARTS.match(pred)
    if m:
        if m.group(1) is not None:
            return ("starts_attr", m.group(1), m.group(3))
        return ("starts_text", m.group(3))
    m = _RX_PRED_NORMSPACE.match(pred)
    if m:
        if m.group(1) is not None:
            return ("ns_eq", "attr", m.group(1), m.group(4))
        kind = "text" if m.group(2) else "self"
        return ("ns_eq", kind, None, m.group(4))
    m = _RX_PRED_ATTR_CMP.match(pred)
    if m:
        return ("attr_cmp", m.group(1), m.group(2), float(m.group(3)))
    m = _RX_PRED_TEXT_EQ.match(pred)
    if m:
        return ("text_eq", m.group(2))
    m = _RX_PRED_DOT_EQ.match(pred)
    if m:
        return ("dot_eq", m.group(2))
    if re.match(r"^(?:position\(\)\s*=\s*)?last\(\)$", pred):
        return ("last",)
    if _RX_PRED_RELPATH_HEAD.match(pred):
        steps = _parse_rel_path(pred)
        if steps is not None:
            return ("exists", steps)
    return None


def _parse_pred(pred: str):
    """One predicate, possibly a boolean expression:
    ``A and B``, ``A or B`` (or binds looser than and — standard XPath),
    ``not(X)``, parenthesized groups, or an atomic leaf. Positional/
    last() forms are list-selective, not boolean, so they may only appear
    as the WHOLE predicate. Returns a tagged tuple or None."""
    pred = pred.strip()
    parts = _split_top(pred, ("or",))
    if len(parts) > 1:
        terms = [_parse_pred(parts[i]) for i in range(0, len(parts), 2)]
        if any(t is None or t[0] in _LIST_PREDS for t in terms):
            return None
        return ("or", terms)
    parts = _split_top(pred, ("and",))
    if len(parts) > 1:
        terms = [_parse_pred(parts[i]) for i in range(0, len(parts), 2)]
        if any(t is None or t[0] in _LIST_PREDS for t in terms):
            return None
        return ("and", terms)
    if pred.startswith("not(") and pred.endswith(")"):
        inner = _parse_pred(pred[4:-1])
        if inner is None or inner[0] in _LIST_PREDS:
            return None
        return ("not", inner)
    if pred.startswith("(") and pred.endswith(")"):
        # a parenthesized boolean group; reject if the parens don't
        # actually match each other ("(a) or (b)" splits above first)
        inner = _parse_pred(pred[1:-1])
        if inner is not None and inner[0] not in _LIST_PREDS:
            return inner
    return _parse_leaf(pred)


def _xpath_normalize_space(s: str) -> str:
    """XPath normalize-space(): strip leading/trailing whitespace and
    collapse internal runs (space/tab/CR/LF) to one space."""
    return " ".join(s.split())


_CMP_OPS = {
    ">": lambda a, b: a > b,
    "<": lambda a, b: a < b,
    ">=": lambda a, b: a >= b,
    "<=": lambda a, b: a <= b,
    "=": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
}


def _parse_xpath(path: str):
    """Location path → (steps, terminal) or None outside the subset.

    steps = [(descendant_axis, tag, preds), ...] with preds a list from
    ``_parse_pred``, applied IN ORDER (so ``//a[@class='x'][2]`` filters
    by class, then takes the 2nd survivor per parent — standard XPath
    predicate chaining). terminal selects what the LAST path component
    extracts: None (element string value), ("text",) for a trailing
    ``text()``, or ("attr", name) for a trailing ``@name`` — the antchfx
    node kinds real callback specs use (job.go:233-269 evaluates
    arbitrary antchfx xpath)."""
    if not path.startswith("/"):
        return None
    # quote-aware component split: a '/' inside a quoted predicate
    # argument (starts-with(@href,'/c'), contains(@src,'http://…')) is
    # literal, not a step separator
    parts, cur, q = [], [], None
    for ch in path:
        if q:
            cur.append(ch)
            if ch == q:
                q = None
        elif ch in "'\"":
            q = ch
            cur.append(ch)
        elif ch == "/":
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    steps, descendant, idx = [], False, 1
    terminal = None
    while idx < len(parts):
        p = parts[idx]
        if p == "":
            if descendant:  # '///' — not a location path
                return None
            descendant = True
            idx += 1
            continue
        last = idx == len(parts) - 1
        if last and p == "text()":
            if descendant:
                return None  # //text() over elements is out of subset
            terminal = ("text",)
            break
        if last and p.startswith("@") and re.match(r"^@[\w-]+$", p):
            if descendant:
                return None
            terminal = ("attr", p[1:])
            break
        if p in ("..", "parent::node()", "parent::*"):
            if descendant:
                return None  # //.. is out of subset
            steps.append(("parent", "*", []))
            idx += 1
            continue
        axis = "descendant" if descendant else "child"
        for named in ("following-sibling", "preceding-sibling",
                      "ancestor-or-self", "ancestor"):
            if p.startswith(named + "::"):
                if descendant:
                    return None  # a//following-sibling::b is out of subset
                axis = named
                p = p[len(named) + 2:]
                break
        parsed = _split_step(p)
        if parsed is None:
            return None
        tag, raw_preds = parsed
        preds = []
        for raw in raw_preds:
            pred = _parse_pred(raw)
            if pred is None:
                return None
            preds.append(pred)
        steps.append((axis, tag.lower(), preds))
        descendant = False
        idx += 1
    if not steps:
        return None
    return steps, terminal


def _iter_descendants(node: _MiniNode):
    for c in node.children:
        if isinstance(c, _MiniNode):
            yield c
            yield from _iter_descendants(c)


def _eval_xpath(root: _MiniNode, steps) -> list:
    """Evaluate parsed steps. A positional predicate selects the n-th
    MATCHING CHILD PER PARENT (standard XPath: ``//p[2]`` abbreviates
    ``descendant-or-self::node()/child::p[position()=2]``); results are
    returned in document order (pre-order over the tree). The
    ``following-sibling`` axis filters per CONTEXT NODE (standard XPath:
    ``following-sibling::p[1]`` is the first following p-sibling of each
    context node), using a lazily-built parent map."""
    current = [root]
    parent_of = None

    def parents_map():
        nonlocal parent_of
        if parent_of is None:
            parent_of = {}

            def _walk(n):
                for c in n.children:
                    if isinstance(c, _MiniNode):
                        parent_of[id(c)] = n
                        _walk(c)

            _walk(root)
        return parent_of

    for axis, tag, preds in steps:
        descendant = axis == "descendant"
        selected = set()
        if axis in ("following-sibling", "preceding-sibling"):
            pm = parents_map()
            for n in current:
                par = pm.get(id(n))
                if par is None:
                    continue
                sibs = [c for c in par.children if isinstance(c, _MiniNode)]
                try:
                    at = next(k for k, c in enumerate(sibs) if c is n)
                except StopIteration:
                    continue
                if axis == "following-sibling":
                    kids = sibs[at + 1:]
                else:
                    # preceding-sibling positions count in REVERSE
                    # document order: [1] is the NEAREST preceding sibling
                    kids = sibs[:at][::-1]
                kids = [c for c in kids if tag == "*" or c.tag == tag]
                for pred in preds:  # per context node (XPath semantics)
                    kids = _filt(kids, pred)
                    if not kids:
                        break
                selected.update(id(c) for c in kids)
        elif axis in ("ancestor", "ancestor-or-self"):
            # reverse axis: positional predicates count NEAREST-first
            # (standard XPath: ancestor::div[1] is the closest div)
            pm = parents_map()
            for n in current:
                chain = [n] if axis == "ancestor-or-self" else []
                up = pm.get(id(n))
                while up is not None:
                    chain.append(up)
                    up = pm.get(id(up))
                cands = [c for c in chain if tag == "*" or c.tag == tag]
                for pred in preds:  # per context node (XPath semantics)
                    cands = _filt(cands, pred)
                    if not cands:
                        break
                selected.update(id(c) for c in cands)
        elif axis == "parent":
            pm = parents_map()
            for n in current:
                par = pm.get(id(n))
                if par is not None:
                    selected.add(id(par))
            if not selected:
                return []
            current = [c for c in _iter_descendants(root)
                       if id(c) in selected]
            continue
        else:
            for n in current:
                parents = [n] + (list(_iter_descendants(n)) if descendant
                                 else [])
                for parent in parents:
                    kids = [c for c in parent.children
                            if isinstance(c, _MiniNode)
                            and (tag == "*" or c.tag == tag)]
                    for pred in preds:  # chained, in order (XPath semantics)
                        kids = _filt(kids, pred)
                        if not kids:
                            break
                    selected.update(id(c) for c in kids)
        if not selected:
            return []
        current = [c for c in _iter_descendants(root) if id(c) in selected]
    return current


def _node_test(c: _MiniNode, pred) -> bool:
    """Node-wise boolean predicate evaluation (everything except the
    list-selective position/last forms)."""
    kind = pred[0]
    if kind == "and":
        return all(_node_test(c, t) for t in pred[1])
    if kind == "or":
        return any(_node_test(c, t) for t in pred[1])
    if kind == "not":
        return not _node_test(c, pred[1])
    if kind == "attr_eq":
        return (c.attrs.get(pred[1]) or "") == pred[2]
    if kind == "attr_present":
        return pred[1] in c.attrs
    if kind == "contains_attr":
        return pred[2] in (c.attrs.get(pred[1]) or "")
    if kind == "contains_text":
        return pred[1] in _node_string_value(c)
    if kind == "starts_attr":
        return (c.attrs.get(pred[1]) or "").startswith(pred[2])
    if kind == "starts_text":
        return _node_string_value(c).startswith(pred[1])
    if kind == "ns_eq":
        _, k, name, val = pred
        if k == "attr":
            s = c.attrs.get(name)
            if s is None:
                return False
        else:  # text() or bare normalize-space() — both take
            s = _node_string_value(c)  # the node string value
        return _xpath_normalize_space(s) == val
    if kind == "attr_cmp":
        _, name, op, rhs = pred
        raw = c.attrs.get(name)
        if raw is None:
            return False
        try:
            lhs = float(raw.strip())
        except ValueError:
            return False  # number() → NaN → comparison false
        return _CMP_OPS[op](lhs, rhs)
    if kind == "text_eq":
        # [text()='v']: true if ANY direct child text node equals v
        # (XPath node-set '=' is existential)
        return any(isinstance(ch, str) and ch == pred[1]
                   for ch in c.children)
    if kind == "dot_eq":
        return _node_string_value(c) == pred[1]
    if kind == "exists":
        # relative child-path existence: [span], [td[@class='x']/a]
        ctx = [c]
        for tag, preds in pred[1]:
            nxt = []
            for n in ctx:
                kids = [k for k in n.children if isinstance(k, _MiniNode)
                        and (tag == "*" or k.tag == tag)]
                for pr in preds:
                    kids = _filt(kids, pr)
                    if not kids:
                        break
                nxt.extend(kids)
            ctx = nxt
            if not ctx:
                return False
        return True
    return False


def _filt(kids: list, pred) -> list:
    """Apply one predicate to a candidate list: positional forms select
    by index, everything else filters node-wise via ``_node_test``."""
    kind = pred[0]
    if kind == "pos":
        return [kids[pred[1] - 1]] if len(kids) >= pred[1] else []
    if kind == "last":
        return kids[-1:]
    if kind == "last_off":
        i = len(kids) - 1 - pred[1]
        return [kids[i]] if i >= 0 else []
    if kind == "pos_cmp":
        _, op, n = pred
        return [c for i, c in enumerate(kids, 1) if _CMP_OPS[op](i, n)]
    return [c for c in kids if _node_test(c, pred)]


def _node_string_value(node: _MiniNode) -> str:
    out: list = []

    def rec(n: _MiniNode):
        for c in n.children:
            if isinstance(c, str):
                out.append(c)
            else:
                rec(c)

    rec(node)
    return "".join(out)


def _split_union(path: str) -> list:
    """Split a union expression on top-level ``|`` (quote-aware, so a
    ``contains(@x,'a|b')`` argument never splits)."""
    parts, cur, q = [], [], None
    for ch in path:
        if q:
            cur.append(ch)
            if ch == q:
                q = None
        elif ch in "'\"":
            q = ch
            cur.append(ch)
        elif ch == "|":
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def _branch_first(nodes, terminal):
    """(element, value) of the first node a branch selects, or None."""
    if terminal is None:
        return (nodes[0], _node_string_value(nodes[0])) if nodes else None
    if terminal[0] == "text":
        for n in nodes:
            for c in n.children:
                if isinstance(c, str):
                    return n, c
        return None
    for n in nodes:  # ("attr", name): first element carrying it
        v = n.attrs.get(terminal[1])
        if v is not None:
            return n, v
    return None


def xpath_first_value(html: bytes | str | None, path: str) -> str:
    """First-node string value of ``path`` over ``html`` (subset above).

    Trailing ``text()`` yields the first text-node child of the first
    matching element that has one; trailing ``@name`` yields the first
    matching element's ``name`` attribute (antchfx node-value semantics:
    attribute/text nodes value to their own content). A top-level union
    (``a | b``) takes the DOCUMENT-ORDER first node across branches; any
    unsupported branch makes the whole expression unsupported (antchfx
    compile-error behavior: empty value)."""
    if html is None:
        return ""
    branches = []
    for b in _split_union(path.strip()):
        parsed = _parse_xpath(b.strip())
        if parsed is None:
            return ""
        branches.append(parsed)
    root = _build_tree(html)
    if len(branches) == 1:
        steps, terminal = branches[0]
        hit = _branch_first(_eval_xpath(root, steps), terminal)
        return hit[1] if hit else ""
    order = {id(n): i for i, n in enumerate(_iter_descendants(root))}
    best = None
    for steps, terminal in branches:
        hit = _branch_first(_eval_xpath(root, steps), terminal)
        if hit is None:
            continue
        key = order.get(id(hit[0]), -1)  # root itself sorts first
        if best is None or key < best[0]:
            best = (key, hit[1])
    return best[1] if best else ""


def xpath_all_equal(html, pairs) -> bool:
    """ALL (path, value) pairs must match by string equality (job.go:233-269)."""
    return all(xpath_first_value(html, p) == v for p, v in pairs)


def xpath_value_udf(path):
    """pandas UDF html → first-node string value of ``path`` (used by the
    login-session guard, job.go:157-185)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _val(html: pd.Series) -> pd.Series:
        return html.map(lambda b: xpath_first_value(b, path))

    return _val


def xpath_match_udf(pairs):
    """pandas UDF html → bool: every xpath pair equals its value."""
    from pyspark.sql.functions import pandas_udf

    pairs = tuple(pairs)

    @pandas_udf("boolean")
    def _match(html: pd.Series) -> pd.Series:
        return html.map(lambda b: xpath_all_equal(b, pairs))

    return _match


LINKS_SCHEMA = "array<struct<href:string,anchor:string>>"


def extract_links_udf():
    """pandas UDF: html binary → array<struct<href,anchor>>."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(LINKS_SCHEMA)
    def _extract(html: pd.Series) -> pd.Series:
        return html.map(lambda b: extract_links(b))

    return _extract


def extract_links_feed_aware(html, is_feed: bool):
    """Link extraction for follow_feeds crawls: a FEED page (decided by
    content type upstream, never by sniffing) yields its entry links
    with the entry title as anchor text; an HTML page yields its normal
    <a href> links PLUS raw feed-autodiscovery hrefs appended in
    document order. Resolution/normalization stay downstream either way."""
    from ideacrawler_spark.sources.feeds import (
        autodiscovery_hrefs,
        feed_entry_links,
    )

    if isinstance(html, (bytes, bytearray)):
        b = bytes(html)
    else:
        b = ("" if html is None else str(html)).encode("utf-8", "replace")
    if is_feed:
        return feed_entry_links(b)
    return list(extract_links(html)) + [(h, "") for h in
                                        autodiscovery_hrefs(b)]


def extract_links_feeds_udf():
    """pandas UDF: (html binary, is_feed boolean) →
    array<struct<href,anchor>> — the follow_feeds extraction path."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(LINKS_SCHEMA)
    def _extract(html: pd.Series, is_feed: pd.Series) -> pd.Series:
        return pd.Series(
            [extract_links_feed_aware(b, bool(f))
             for b, f in zip(html, is_feed)],
            index=html.index,
        )

    return _extract


def extract_resources_udf():
    """pandas UDF: (html binary, page url) → array<string> of prefetch
    resource URLs (S6, prefetchurl.go — the fetch side-effect itself is a
    declared non-goal; this is its extraction surface)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _resources(html: pd.Series, url: pd.Series) -> pd.Series:
        return pd.Series(
            [extract_resources(b, u or "") for b, u in zip(html, url)],
            index=html.index,
        )

    return _resources


def resources_table(pages):
    """pages(url, html) → exploded (url, pos, resource) table — the
    ``outlinks_resources`` sink named in SURVEY §2.2."""
    from pyspark.sql import functions as F

    return pages.select(
        "url",
        F.posexplode(
            extract_resources_udf()(F.col("html"), F.col("url"))
        ).alias("pos", "resource"),
    )
