"""C4 heuristic cleaning (textops/c4.py) and mirror-host detection
(textops/mirrors.py) on hand-computed vectors."""
from ideacrawler_spark.textops.c4 import c4_document_filter
from ideacrawler_spark.textops.mirrors import mirror_host_pairs


def _c4(spark, text, **kw):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return c4_document_filter(df, **kw).collect()[0]


def test_c4_line_rules(spark):
    text = (
        "one two three four five.\n"      # kept
        "too short.\n"                     # < 5 words
        "no terminal punctuation here\n"   # no [.!?"] ending
        "the javascript menu needs it.\n"  # javascript mention
        "six seven eight nine ten!\n"      # kept
        'quoted line with five words."'    # kept (closing quote)
    )
    r = _c4(spark, text)
    assert (r["n_lines"], r["n_kept"], r["keep_doc"]) == (6, 3, 1)


def test_c4_document_rules(spark):
    good = "one two three four five.\n" * 3
    r = _c4(spark, good + "lorem ipsum dolor sit amet.")
    assert r["keep_doc"] == 0          # lorem ipsum
    r = _c4(spark, good + "function a() { return one two. }")
    assert r["keep_doc"] == 0          # brace
    r = _c4(spark, "one two three four five.\n" * 2)
    assert (r["n_kept"], r["keep_doc"]) == (2, 0)   # < 3 kept lines
    r = _c4(spark, good.strip())
    assert (r["n_kept"], r["keep_doc"]) == (3, 1)


def test_c4_md5_is_of_kept_lines(spark):
    import hashlib
    text = "one two three four five.\nbad line\nsix seven eight nine ten!"
    r = _c4(spark, text)
    expect = hashlib.md5(
        b"one two three four five.\nsix seven eight nine ten!"
    ).hexdigest()
    assert r["kept_md5"] == expect


def test_mirror_pairs_and_cap(spark):
    rows = []
    # hosts a,b share keys 1,2,3; host c shares only key 1
    for h, ks in (("a", [1, 2, 3]), ("b", [1, 2, 3]), ("c", [1])):
        rows += [(h, k) for k in ks]
    # key 9 on 5 hosts with cap 3: only d,e,f (sorted) pair up
    for h in "defgh":
        rows.append((h, 9))
    df = spark.createDataFrame(rows, "host string, content_key long")
    got = {
        (r["host_a"], r["host_b"]): r["n_shared"]
        for r in mirror_host_pairs(df, host_cap=3, min_shared=1).collect()
    }
    assert got[("a", "b")] == 3
    assert got[("a", "c")] == 1 and got[("b", "c")] == 1
    assert got[("d", "e")] == 1 and got[("d", "f")] == 1 \
        and got[("e", "f")] == 1
    assert ("d", "g") not in got and ("g", "h") not in got  # capped away
    # min_shared filters the singles
    got2 = {
        (r["host_a"], r["host_b"])
        for r in mirror_host_pairs(df, host_cap=3, min_shared=2).collect()
    }
    assert got2 == {("a", "b")}
