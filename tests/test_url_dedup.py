"""URL canonicalization + URL-keyed dedup (C4/CCNet web-pipeline op).

normalize_url is one native expression chain; these tests pin the
canonical form against hand-computed expectations and a pure-Python
restatement of the same rules, and check url_duplicates collapses
fetch variants of the same page.
"""
import re

from pyspark.sql import functions as F

from gliner_spark.operators.textstats import normalize_url, url_duplicates


def _py_normalize(u: str) -> str:
    """Pure-Python restatement of the documented canonical rules."""
    c = u.strip()
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", c)
    if not m:
        return c
    scheme = m.group(1).lower()
    after = c[m.end():]
    m2 = re.match(r"^([^/?#]*)", after)
    authority = m2.group(1)
    host = re.sub(r"^[^@]*@", "", authority).lower()
    if scheme == "http" and host.endswith(":80"):
        host = host[:-3]
    elif scheme == "https" and host.endswith(":443"):
        host = host[:-4]
    rest = after[len(authority):]
    path = re.match(r"^([^?#]*)", rest).group(1)
    if len(path) > 1 and path.endswith("/"):
        path = re.sub(r"/+$", "", path)
    qm = re.search(r"\?([^#]*)", rest)
    query = qm.group(1) if qm else ""
    kept = sorted(
        p
        for p in query.split("&")
        if p and not re.match(r"^(utm_[^=]*|fbclid|gclid|ref)(=|$)", p)
    )
    qnorm = "&".join(kept)
    return f"{scheme}://{host}{path}" + (f"?{qnorm}" if qnorm else "")


CASES = [
    # tracking params dropped, survivors sorted
    ("https://Example.COM/a?utm_source=x&b=2&a=1&fbclid=zz",
     "https://example.com/a?a=1&b=2"),
    # default port + fragment + trailing slash
    ("http://example.com:80/path/#frag", "http://example.com/path"),
    ("https://example.com:443/", "https://example.com/"),
    # non-default port kept
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    # userinfo stripped, scheme lowercased
    ("HTTPS://user:pw@Host.Org/A/B/", "https://host.org/A/B"),
    # ref param dropped only as whole key
    ("https://e.com/p?ref=tw&refresh=1", "https://e.com/p?refresh=1"),
    # bare ref (no =) dropped too
    ("https://e.com/p?ref&x=1", "https://e.com/p?x=1"),
    # all params dropped -> no '?'
    ("https://e.com/p?utm_campaign=a&gclid=b", "https://e.com/p"),
    # root path slash preserved
    ("https://e.com/?a=1", "https://e.com/?a=1"),
    # non-URL passthrough (trimmed, never null)
    ("  not a url  ", "not a url"),
    ("", ""),
]


def test_normalize_url_cases(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CASES)], "i int, url string"
    ).select("i", normalize_url(F.col("url")).alias("canon"))
    got = {r["i"]: r["canon"] for r in df.collect()}
    for i, (u, want) in enumerate(CASES):
        assert got[i] == want, f"{u!r}: {got[i]!r} != {want!r}"
        assert _py_normalize(u) == want, f"python restatement drift on {u!r}"


def test_url_duplicates_collapses_fetch_variants(spark):
    rows = [
        (1, "https://site.com/page?utm_source=feed"),
        (2, "https://site.com/page/"),
        (3, "HTTPS://SITE.COM:443/page#top"),
        (4, "https://site.com/other"),
        (5, "https://site.com/other?x=1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {
        r["canonical_url"]: (r["doc_ids"], r["keep_doc_id"])
        for r in url_duplicates(df).collect()
    }
    assert out["https://site.com/page"] == ([1, 2, 3], 1)
    assert out["https://site.com/other"] == ([4], 4)
    assert out["https://site.com/other?x=1"] == ([5], 5)


def test_url_duplicates_is_shuffle_once(spark):
    df = spark.createDataFrame(
        [(1, "https://a.com/x")], "doc_id long, url string"
    )
    plan = url_duplicates(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1  # one hash agg, map-side combine
