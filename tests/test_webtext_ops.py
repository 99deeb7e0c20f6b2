"""URL canonicalization + extraction-quality F1: known-answer cases and
DuckDB SQL-twin parity (the driver-oracle discipline applied locally —
the driver's testdata tables carry no URL column to gate these on)."""
from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from pdf_extractor_spark.operators import webtext

URLS = [
    ("HTTP://Example.COM:80/a/b/?z=1&a=2#frag", "http://example.com/a/b?a=2&z=1"),
    ("https://example.com:443/", "https://example.com/"),
    ("https://example.com", "https://example.com/"),
    ("https://example.com/path/", "https://example.com/path"),
    ("https://example.com/path", "https://example.com/path"),
    ("http://a.example/x?b=2&a=1", "http://a.example/x?a=1&b=2"),
    ("http://a.example/x?a=1&b=2", "http://a.example/x?a=1&b=2"),
    ("http://a.example/x?&&a=1", "http://a.example/x?a=1"),
    ("http://a.example:8080/x", "http://a.example:8080/x"),
    ("https://b.example/#only-frag", "https://b.example/"),
]

# the same canonicalization spec in DuckDB SQL — parity asserted below
CANON_SQL = r"""
WITH p AS (
  SELECT raw_url,
         translate(regexp_extract(trim(raw_url), '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') AS scheme,
         translate(regexp_extract(trim(raw_url), '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') AS auth,
         regexp_extract(trim(raw_url), '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS path,
         regexp_extract(regexp_extract(trim(raw_url), '^[^#]*', 0), '\?(.*)', 1) AS query
  FROM urls
), q AS (
  SELECT raw_url, scheme,
         CASE WHEN scheme = 'http' THEN regexp_replace(auth, ':80$', '')
              WHEN scheme = 'https' THEN regexp_replace(auth, ':443$', '')
              ELSE auth END AS auth,
         CASE WHEN path = '' THEN '/'
              WHEN path <> '/' AND path LIKE '%/'
                THEN substring(path, 1, length(path) - 1)
              ELSE path END AS path,
         array_to_string(list_sort(list_filter(string_split(query, '&'),
                                               x -> x <> '')), '&') AS qs
  FROM p
)
SELECT raw_url, scheme || '://' || auth || path ||
       CASE WHEN qs <> '' THEN '?' || qs ELSE '' END AS canonical_url
FROM q ORDER BY raw_url
"""


def test_canonical_url_known_answers(spark):
    df = spark.createDataFrame([(r,) for r, _ in URLS], "url string")
    got = {r["url"]: r["c"] for r in df.select(
        "url", webtext.canonical_url_expr(F.col("url")).alias("c")).collect()}
    for raw, want in URLS:
        assert got[raw] == want, (raw, got[raw], want)


def test_canonical_url_duckdb_twin_parity(spark):
    df = spark.createDataFrame([(r,) for r, _ in URLS], "url string")
    got = sorted(
        (r["url"], r["c"]) for r in df.select(
            "url",
            webtext.canonical_url_expr(F.col("url")).alias("c")).collect())
    con = duckdb.connect()
    con.register("urls", pd.DataFrame({"raw_url": [r for r, _ in URLS]}))
    want = sorted(map(tuple, con.execute(CANON_SQL).fetchall()))
    assert got == want


def test_url_dup_groups(spark):
    rows = [("HTTP://Example.COM:80/a?b=1&a=2",),
            ("http://example.com/a?a=2&b=1",),
            ("http://example.com/a/?a=2&b=1",),
            ("http://unique.example/only",)]
    df = spark.createDataFrame(rows, "url string")
    groups = webtext.url_dup_groups(df).collect()
    assert len(groups) == 1
    assert groups[0]["canonical_url"] == "http://example.com/a?a=2&b=1"
    assert groups[0]["n_urls"] == 3


def test_extraction_f1_known_answers(spark):
    rows = [
        (1, "the quick brown fox", "the quick brown fox"),   # exact: 1/1/1
        (2, "hello world", "goodbye moon"),                   # disjoint: 0
        (3, "a a b", "a b b"),                                # multiset partial
        (4, "", ""),                                          # both empty: 1
        (5, "something", ""),                                 # pred-only: 0
        (6, "", "gold text"),                                 # gold-only: 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, pred string, gold string")
    got = {r["doc_id"]: r for r in
           webtext.extraction_f1(df, "pred", "gold", "doc_id").collect()}
    assert (got[1]["precision"], got[1]["recall"], got[1]["f1"]) == (1.0, 1.0, 1.0)
    assert (got[2]["precision"], got[2]["recall"], got[2]["f1"]) == (0.0, 0.0, 0.0)
    # doc 3: inter = min(2,1)[a] + min(1,2)[b] = 2; np = ng = 3
    assert got[3]["precision"] == round(2 / 3, 6)
    assert got[3]["recall"] == round(2 / 3, 6)
    assert got[3]["f1"] == round(2 / 3, 6)
    assert got[4]["f1"] == 1.0
    assert got[5]["f1"] == 0.0 and got[5]["precision"] == 0.0
    assert got[6]["f1"] == 0.0 and got[6]["recall"] == 0.0


def test_extraction_f1_duckdb_twin_parity(spark):
    rows = [(i, f"tok{i % 3} shared word word", f"tok{i % 4} shared word")
            for i in range(30)] + [(99, "", "x")]
    df = spark.createDataFrame(rows, "doc_id long, pred string, gold string")
    got = sorted(
        (r["doc_id"], r["precision"], r["recall"], r["f1"])
        for r in webtext.extraction_f1(df, "pred", "gold", "doc_id").collect())
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "pred", "gold"]))
    want = sorted(map(tuple, con.execute(r"""
        WITH pt AS (
          SELECT doc_id, tok, count(*) AS pc FROM (
            SELECT doc_id, unnest(list_filter(string_split_regex(trim(pred), '\s+'),
                                              x -> x <> '')) AS tok FROM docs)
          GROUP BY doc_id, tok),
        gt AS (
          SELECT doc_id, tok, count(*) AS gc FROM (
            SELECT doc_id, unnest(list_filter(string_split_regex(trim(gold), '\s+'),
                                              x -> x <> '')) AS tok FROM docs)
          GROUP BY doc_id, tok),
        j AS (
          SELECT coalesce(pt.doc_id, gt.doc_id) AS doc_id,
                 coalesce(pc, 0) AS pc, coalesce(gc, 0) AS gc
          FROM pt FULL OUTER JOIN gt
            ON pt.doc_id = gt.doc_id AND pt.tok = gt.tok),
        s AS (
          SELECT d.doc_id,
                 coalesce(sum(least(pc, gc)), 0) AS inter,
                 coalesce(sum(pc), 0) AS np, coalesce(sum(gc), 0) AS ng
          FROM (SELECT DISTINCT doc_id FROM docs) d
          LEFT JOIN j ON j.doc_id = d.doc_id GROUP BY d.doc_id),
        m AS (
          SELECT doc_id,
                 CASE WHEN np > 0 THEN inter / np
                      WHEN ng = 0 THEN 1.0 ELSE 0.0 END AS p,
                 CASE WHEN ng > 0 THEN inter / ng
                      WHEN np = 0 THEN 1.0 ELSE 0.0 END AS r
          FROM s)
        SELECT doc_id, round(p, 6) + 0.0 AS precision, round(r, 6) + 0.0 AS recall,
               round(CASE WHEN p + r > 0 THEN 2 * p * r / (p + r) ELSE 0.0 END, 6)
                 + 0.0 AS f1
        FROM m ORDER BY doc_id
    """).fetchall()))
    assert got == want


RESOLVE_CASES = [
    # (base, href, resolved)
    ("https://ex.com/doc/5", "https://other.net/p/1", "https://other.net/p/1"),
    ("https://ex.com/doc/5", "//other.net/p/2", "https://other.net/p/2"),
    ("http://ex.com/doc/5", "//other.net/p/2", "http://other.net/p/2"),
    ("https://ex.com/doc/5", "/p/3", "https://ex.com/p/3"),
    ("https://ex.com/doc/5", "q/4", "https://ex.com/doc/q/4"),
    ("https://ex.com/doc/5", "q/4#frag", "https://ex.com/doc/q/4"),
    ("https://ex.com", "q/4", "https://ex.com/q/4"),
    ("https://ex.com/doc/5?x=1#top", "", "https://ex.com/doc/5"),
    ("https://ex.com/a/b/c", "d", "https://ex.com/a/b/d"),
]


def test_resolve_url_known_answers(spark):
    df = spark.createDataFrame(RESOLVE_CASES, "base string, href string, want string")
    rows = df.select(
        "base", "href", "want",
        webtext.resolve_url_expr(F.col("base"), F.col("href")).alias("got"),
    ).collect()
    for r in rows:
        assert r["got"] == r["want"], (r["base"], r["href"], r["got"], r["want"])


def test_extract_links_and_plan(spark):
    html = (
        '<html><body><nav>'
        '<a href="https://a.net/p/1">x</a>'
        '<A class="z" HREF="/p/2">y</a>'
        '<a data-k="v" href="//b.net/p/3#frag">z</a>'
        '<a href="rel/4">w</a>'
        '</nav></body></html>'
    ).encode()
    df = spark.createDataFrame(
        [("https://ex.com/doc/9", html)], "url string, html binary")
    out = webtext.extract_links(df)
    got = [r["link_url"] for r in out.collect()]
    assert got == [
        "https://a.net/p/1",
        "https://ex.com/p/2",
        "https://b.net/p/3",
        "https://ex.com/doc/rel/4",
    ]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan   # narrow: zero shuffles
    assert "Python" not in plan, plan     # zero Python


def _pr_duckdb(edges, iters=5):
    con = duckdb.connect()
    con.register("edges_t", pd.DataFrame(edges, columns=["src", "dst", "w"]))
    sql = ("WITH e AS (SELECT * FROM edges_t),\n"
           + webtext.pagerank_unrolled_sql("e", iters=iters)
           + "\nSELECT host, rank_scaled, pagerank FROM pr_final ORDER BY host")
    return sorted(map(tuple, con.execute(sql).fetchall()))


def test_pagerank_fixedpoint_duckdb_twin_parity(spark):
    # crafted graph: hub, spoke, self-loop, dangling target, weighted edge
    edges = [("a", "b", 3), ("a", "c", 1), ("b", "a", 1), ("b", "b", 2),
             ("c", "d", 5), ("d", "a", 1), ("e", "a", 4)]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = sorted(
        (r["host"], r["rank_scaled"], r["pagerank"])
        for r in webtext.pagerank_fixedpoint(df, iters=5).collect())
    assert got == _pr_duckdb(edges, iters=5)
    # rank mass is conserved up to truncation loss (teleport floor + per-
    # edge floor): total <= SCALE, and within n_nodes+n_edges+1 ulps of it
    total = sum(r[1] for r in got)
    assert total <= webtext.PAGERANK_SCALE
    assert total >= webtext.PAGERANK_SCALE - 10 * (len(edges) + 5 + 1)


def test_pagerank_fixedpoint_partitioning_invariant(spark):
    """Bit-identical result under different partitioning / join strategy —
    the run-to-run reproducibility property the fixed-point arithmetic
    buys on a real cluster."""
    edges = [(f"h{i % 7}", f"h{(i * 3 + 1) % 7}", 1 + i % 4)
             for i in range(40)]
    df1 = spark.createDataFrame(edges, "src string, dst string, w long")
    df32 = df1.repartition(32)
    a = sorted((r["host"], r["rank_scaled"]) for r in
               webtext.pagerank_fixedpoint(df1, broadcast_ranks=True).collect())
    b = sorted((r["host"], r["rank_scaled"]) for r in
               webtext.pagerank_fixedpoint(df32, broadcast_ranks=False).collect())
    assert a == b


def test_pagerank_empty_edges(spark):
    df = spark.createDataFrame([], "src string, dst string, w long")
    assert webtext.pagerank_fixedpoint(df).collect() == []


def test_centrality_store_matches_fresh_and_invalidates(spark, tmp_path):
    """The committed centrality store must serve bit-identical
    PageRank+HITS scores to fresh iteration (both fixed-points are exact
    integer arithmetic), reuse the snapshot on a hit instead of
    re-iterating, and invalidate when the edge set changes (added,
    dropped, or reweighted edges all change the checksum key)."""
    edges = [("a", "b", 3), ("a", "c", 1), ("b", "a", 1), ("b", "b", 2),
             ("c", "d", 5), ("d", "a", 1), ("e", "a", 4)]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    root = str(tmp_path / "cent")
    fresh_pr = {(r["host"], r["rank_scaled"]) for r in
                webtext.pagerank_fixedpoint(df, iters=3).collect()}
    fresh_ht = {(r["host"], r["hub_scaled"], r["auth_scaled"]) for r in
                webtext.hits_fixedpoint(df, iters=3).collect()}
    miss = webtext.centrality_stored(df, root, iters=3).collect()
    assert {(r["host"], r["rank_scaled"]) for r in miss} == fresh_pr
    assert ({(r["host"], r["hub_scaled"], r["auth_scaled"]) for r in miss}
            == fresh_ht)
    from pdf_extractor_spark.sources.table_format import SnapshotTable

    snap = SnapshotTable(root).current_manifest()["snapshot_id"]
    hit = webtext.centrality_stored(df, root, iters=3).collect()
    assert sorted(map(tuple, hit)) == sorted(map(tuple, miss))
    assert SnapshotTable(root).current_manifest()["snapshot_id"] == snap
    # reweighting ONE edge must retrain (key covers the w binding)
    rew = spark.createDataFrame(
        [(s, d, w + (1 if (s, d) == ("a", "b") else 0))
         for s, d, w in edges], "src string, dst string, w long")
    webtext.centrality_stored(rew, root, iters=3).collect()
    assert SnapshotTable(root).current_manifest()["snapshot_id"] != snap
    # iteration-count change must also miss
    webtext.centrality_stored(rew, root, iters=2).collect()


def test_centrality_refresh_warm_starts_from_previous_snapshot(
        spark, tmp_path):
    """The month-over-month refresh path: a changed edge set with a prior
    snapshot warm-starts PageRank from the stored ranks for 1 iteration;
    the result must equal the explicit warm-started iteration exactly,
    land closer to the new cold fixed point than a cold single iteration,
    be served (not recomputed) on a repeat call, and NEVER be served by
    the exact centrality_stored path."""
    from pdf_extractor_spark.sources.table_format import SnapshotTable

    def edges_df(bump):
        rows = [(f"h{i % 9}", f"h{(i * 4 + 1) % 9}",
                 1 + i % 3 + (bump if i == 0 else 0)) for i in range(40)]
        return spark.createDataFrame(rows, "src string, dst string, w long")

    root = str(tmp_path / "cent")
    old, new = edges_df(0), edges_df(5)
    webtext.centrality_stored(old, root, iters=5)
    prev = {r["host"]: r["rank_scaled"] for r in
            SnapshotTable(root).read(spark).collect()}
    got = {r["host"]: r["rank_scaled"] for r in
           webtext.centrality_refresh(new, root, iters=5,
                                      refresh_iters=1).collect()}
    init = spark.createDataFrame(list(prev.items()),
                                 "host string, rank_scaled long")
    want = {r["host"]: r["rank_scaled"] for r in
            webtext.pagerank_fixedpoint(new, iters=1,
                                        init_ranks=init).collect()}
    assert got == want  # warm start is deterministic, bit-exact
    cold5 = {r["host"]: r["rank_scaled"] for r in
             webtext.pagerank_fixedpoint(new, iters=5).collect()}
    cold1 = {r["host"]: r["rank_scaled"] for r in
             webtext.pagerank_fixedpoint(new, iters=1).collect()}
    warm_dev = max(abs(got[h] - cold5[h]) for h in cold5)
    cold_dev = max(abs(cold1[h] - cold5[h]) for h in cold5)
    assert warm_dev < cold_dev  # the ladder property at test scale
    # repeat call with the same edges serves the committed refresh
    snap = SnapshotTable(root).current_manifest()["snapshot_id"]
    webtext.centrality_refresh(new, root, iters=5).collect()
    assert SnapshotTable(root).current_manifest()["snapshot_id"] == snap
    # the EXACT path must recompute rather than serve the approximation
    exact = {r["host"]: r["rank_scaled"] for r in
             webtext.centrality_stored(new, root, iters=5).collect()}
    assert exact == cold5
    assert SnapshotTable(root).current_manifest()["snapshot_id"] != snap


def test_canonical_url_plan_is_codegen_only(spark):
    """The canonicalization must stay inside whole-stage codegen: no
    Python eval nodes, no exchange (narrow projection)."""
    df = spark.createDataFrame([(r,) for r, _ in URLS], "url string")
    out = df.select(webtext.canonical_url_expr(F.col("url")).alias("c"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan


def test_url_quality_filter_gates_and_parity(spark):
    """Each gate fires on its designed shape, first-failure precedence
    holds, and the DuckDB twin reproduces every verdict bit-exactly."""
    import duckdb
    import pandas as pd

    from pdf_extractor_spark.operators import webtext

    urls = [
        "https://www.clean.com/p/1",                       # ok
        "ftp://files.x.com/a",                             # scheme
        "gopher://old.net/",                               # scheme
        "https://www.x.com/casino/p",                      # blocklist
        "https://PoKeR.example.com/p",                     # blocklist (host, case)
        "https://12345678.net/p",                          # digit_host
        "https://:443/none",                               # digit_host (empty)
        "https://www.x.com/" + "z" * 300,                  # too_long
        "https://www.x.com/a/b/c/d/e/f/g/h/i/j",           # too_deep
        "https://www.x.com/p?a=1&b=2&c=3&d=4&e=5",         # too_many_params
        "https://www.x.com/p?a=1&b=2&c=3&d=4",             # ok (4 params)
        "ftp://www.x.com/casino",                          # scheme wins precedence
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r["url"]: (r["url_ok"], r["url_reason"])
           for r in webtext.url_quality_filter(df).collect()}
    assert got[urls[0]] == (True, "ok")
    assert got[urls[1]] == (False, "scheme")
    assert got[urls[2]] == (False, "scheme")
    assert got[urls[3]] == (False, "blocklist")
    assert got[urls[4]] == (False, "blocklist")
    assert got[urls[5]] == (False, "digit_host")
    assert got[urls[6]] == (False, "digit_host")
    assert got[urls[7]] == (False, "too_long")
    assert got[urls[8]] == (False, "too_deep")
    assert got[urls[9]] == (False, "too_many_params")
    assert got[urls[10]] == (True, "ok")
    assert got[urls[11]] == (False, "scheme")

    con = duckdb.connect()
    con.register("t", pd.DataFrame({"url": urls}))
    du = con.execute(
        "SELECT url, " + webtext.url_filter_sql("url") + " FROM t"
    ).fetchall()
    assert {u: (ok, r) for u, _h, ok, r in du} == got


def test_robots_match_longest_prefix_and_parity(spark):
    """RFC 9309 semantics: longest matching prefix wins, allow beats
    disallow on equal length, unmatched (including rule-bearing hosts
    whose rules simply don't match) → allowed; DuckDB twin bit-exact."""
    import duckdb
    import pandas as pd

    from pdf_extractor_spark.operators import webtext

    urls = [
        (1, "https://a.com/casino/p/5"),   # /casino deny vs /casino/p allow
        (2, "https://a.com/casino/x"),     # only /casino deny matches
        (3, "https://a.com/free/x"),       # host has rules, none match
        (4, "https://b.com/anything"),     # host has no rules at all
        (5, "https://a.com/tie"),          # equal-length allow+deny -> allow
    ]
    rules = [
        ("a.com", "/casino", False),
        ("a.com", "/casino/p", True),
        ("a.com", "/tie", False),
        ("a.com", "/tie", True),
    ]
    udf = spark.createDataFrame(urls, "doc_id long, url string")
    rdf = spark.createDataFrame(rules, "host string, prefix string, allow boolean")
    got = {r["doc_id"]: (r["robots_allowed"], r["robots_rule"])
           for r in webtext.robots_match(udf, rdf).collect()}
    assert got == {
        1: (True, "/casino/p"),
        2: (False, "/casino"),
        3: (True, ""),
        4: (True, ""),
        5: (True, "/tie"),
    }

    con = duckdb.connect()
    con.register("u", pd.DataFrame(urls, columns=["doc_id", "url"]))
    con.register("r", pd.DataFrame(rules, columns=["host", "prefix", "allow"]))
    du = con.execute(
        "WITH uu AS (SELECT * FROM u), rr AS (SELECT * FROM r) "
        + webtext.robots_match_sql("uu", "rr")
    ).fetchall()
    assert {d: (a, p) for d, a, p in du} == got


def test_meta_noindex_detection_shapes(spark):
    from pdf_extractor_spark.operators import webtext

    cases = [
        ('<head><meta name="robots" content="noindex"></head>', True),
        ("<meta name='robots' content='noindex, nofollow'>", True),
        ('<META NAME="ROBOTS" CONTENT="NOINDEX">', True),
        ('<meta name="robots" content="nofollow">', False),
        ('<meta name="description" content="noindex appears in prose">', False),
        ('<p>noindex</p>', False),
        ('', False),
        # round-2 advice: prefix-matched name values must NOT match
        ('<meta name="robots-news" content="noindex">', False),
        # 'noindex' outside the content attribute must NOT match
        ('<meta name="robots" data-x="noindex" content="all">', False),
        ('<meta name="robots" content="noindex-like-class">', True),
        # unquoted attribute values
        ("<meta name=robots content=noindex>", True),
        ("<meta name=robots content=nofollow>", False),
        # content before name
        ('<meta content="noindex" name="robots">', True),
        ('<meta content="noindex" name="robots-news">', False),
        # the match must not spill past the tag close into the NEXT tag
        ('<meta name=robots><meta name=description '
         'content="noindex policy explained">', False),
        ('<meta name=robots content=all><meta name=d content="noindex">',
         False),
    ]
    df = spark.createDataFrame([(i, h) for i, (h, _) in enumerate(cases)],
                               "i long, html string")
    got = {r["i"]: r["ni"] for r in df.select(
        "i", webtext.meta_noindex_expr(F.col("html")).alias("ni")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, cases[i])


def test_url_filter_cross_engine_fuzz(spark):
    """Seeded structured fuzz: 2000 adversarial URL shapes (weird schemes,
    repeated '://', '?' before the authority, unicode hosts/paths,
    percent-junk, control chars, empty) — Spark and DuckDB must produce
    the identical verdict for every one."""
    import random

    import duckdb
    import pandas as pd

    from pdf_extractor_spark.operators import webtext

    rng = random.Random(4242)
    schemes = ["https", "http", "ftp", "HTTPS", "a+b-c.d", "", "1bad"]
    hosts = ["www.ok.com", "12345678.net", "UP.com:443", "", ":80",
             "straße.de", "host.with.many.labels.example", "777",
             "a" * 80 + ".com"]
    paths = ["", "/", "/p/1", "/casino/x", "/a/b/c/d/e/f/g/h/i/j/k",
             "/İstanbul/page", "/x%20y/z", "/" + "q/" * 12, "/tab\there",
             "/" + "z" * 280]
    queries = ["", "?a=1", "?a=1&b=2&c=3&d=4&e=5", "?&&", "?x=%%",
               "?a=1#frag", "??double"]
    extras = ["", "#f", "#a#b", "://again"]
    urls = []
    for _ in range(2000):
        u = (rng.choice(schemes) + ("://" if rng.random() < 0.9 else ":/")
             + rng.choice(hosts) + rng.choice(paths) + rng.choice(queries)
             + rng.choice(extras))
        urls.append(u)
    urls += ["", "no-scheme-at-all", "://", "https://", "xxx"]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "i long, url string")
    sp = {r["i"]: (r["url_host"], r["url_ok"], r["url_reason"])
          for r in webtext.url_quality_filter(df).collect()}
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"i": range(len(urls)), "url": urls}))
    du = con.execute(
        "SELECT i, " + webtext.url_filter_sql("url") + " FROM t").fetchall()
    for i, h, ok, r in du:
        assert sp[i] == (h, ok, r), (i, urls[i], sp[i], (h, ok, r))


def test_robots_cross_engine_fuzz(spark):
    """Seeded fuzz of robots longest-prefix evaluation: random rule tables
    (overlapping prefixes, allow/deny ties, multi-host) against random
    URLs — verdicts must be engine-identical."""
    import random

    import duckdb
    import pandas as pd

    from pdf_extractor_spark.operators import webtext

    rng = random.Random(77)
    hosts = [f"h{k}.com" for k in range(8)]
    segs = ["a", "b", "casino", "p", "x"]
    rules = []
    for _ in range(60):
        depth = rng.randint(1, 3)
        prefix = "/" + "/".join(rng.choice(segs) for _ in range(depth))
        rules.append((rng.choice(hosts), prefix, rng.random() < 0.5))
    rules = sorted(set(rules))
    urls = []
    for i in range(800):
        depth = rng.randint(0, 5)
        path = "/" + "/".join(rng.choice(segs) for _ in range(depth))
        urls.append((i, f"https://{rng.choice(hosts + ['norules.org'])}{path}"))
    udf = spark.createDataFrame(urls, "doc_id long, url string")
    rdf = spark.createDataFrame(rules, "host string, prefix string, allow boolean")
    sp = {r["doc_id"]: (r["robots_allowed"], r["robots_rule"])
          for r in webtext.robots_match(udf, rdf).collect()}
    assert len(sp) == len(urls)
    con = duckdb.connect()
    con.register("u", pd.DataFrame(urls, columns=["doc_id", "url"]))
    con.register("r", pd.DataFrame(rules, columns=["host", "prefix", "allow"]))
    du = con.execute(
        "WITH uu AS (SELECT * FROM u), rr AS (SELECT * FROM r) "
        + webtext.robots_match_sql("uu", "rr")).fetchall()
    assert {d: (a, p) for d, a, p in du} == sp


def test_robots_empty_path_is_root(spark):
    """RFC 9309: a URL with no path evaluates as '/', so a full-site
    Disallow '/' matches https://host (no trailing slash)."""
    import duckdb
    import pandas as pd

    from pdf_extractor_spark.operators import webtext

    urls = [(1, "https://deny.com"), (2, "https://deny.com/"),
            (3, "https://free.com")]
    rules = [("deny.com", "/", False)]
    udf = spark.createDataFrame(urls, "doc_id long, url string")
    rdf = spark.createDataFrame(rules, "host string, prefix string, allow boolean")
    got = {r["doc_id"]: r["robots_allowed"]
           for r in webtext.robots_match(udf, rdf).collect()}
    assert got == {1: False, 2: False, 3: True}
    con = duckdb.connect()
    con.register("u", pd.DataFrame(urls, columns=["doc_id", "url"]))
    con.register("r", pd.DataFrame(rules, columns=["host", "prefix", "allow"]))
    du = {d: a for d, a, _p in con.execute(
        "WITH uu AS (SELECT * FROM u), rr AS (SELECT * FROM r) "
        + webtext.robots_match_sql("uu", "rr")).fetchall()}
    assert du == got


def test_canonical_url_cross_engine_fuzz(spark):
    """Seeded adversarial fuzz of the canonicalizer against its DuckDB
    twin (CANON_SQL) — messy ports, empty queries, repeated separators,
    unicode, case — every canonical form must be engine-identical."""
    import random

    rng = random.Random(99)
    schemes = ["http", "HTTP", "https", "HTTPS", "ftp"]
    hosts = ["Example.COM", "a.b.c", "WWW.Site7.com", "x", "straße.de",
             "İstanbul.DE"]  # uppercase-İ host: ASCII-only fold must hold
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/a", "/a/", "/a/b/", "//double", "/İ/x"]
    queries = ["", "?", "?a=1", "?z=2&a=1", "?b=&a=1&&", "?a=1&a=1"]
    frags = ["", "#f", "#a#b"]
    urls = []
    for _ in range(1500):
        urls.append(rng.choice(schemes) + "://" + rng.choice(hosts)
                    + rng.choice(ports) + rng.choice(paths)
                    + rng.choice(queries) + rng.choice(frags))
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [(r["url"], r["c"]) for r in df.select(
        "url", webtext.canonical_url_expr(F.col("url")).alias("c")).collect()]
    con = duckdb.connect()
    con.register("urls", pd.DataFrame({"raw_url": urls}))
    want = dict(con.execute(CANON_SQL).fetchall())
    for u, c in got:
        assert want[u] == c, (u, c, want[u])


def test_query_never_leaks_from_fragment(spark):
    """A '?' sitting after '#' is fragment content, not a query — the
    canonical form strips it and the URL gate counts zero params."""
    from pdf_extractor_spark.operators import webtext

    df = spark.createDataFrame(
        [("http://example.com/page#sec?ref=1",),
         ("http://example.com/p?a=1#frag?x=2&y=3&z=4&w=5&v=6",)],
        "url string")
    canon = [r["c"] for r in df.select(
        webtext.canonical_url_expr(F.col("url")).alias("c")).collect()]
    assert canon == ["http://example.com/page",
                     "http://example.com/p?a=1"]
    gate = [r["url_reason"] for r in
            webtext.url_quality_filter(df).orderBy("url").collect()]
    assert gate == ["ok", "ok"]  # phantom params from the fragment: none


def test_lang_id_cross_engine_fuzz(spark):
    """Seeded structured fuzz for the lang-ID twin pair (Python kernel in
    the Spark path vs the DuckDB stopword-SQL fragment): 600 adversarial
    texts mixing stopwords from several languages, ASCII punctuation glued
    to tokens (the round-3 PUNCT_STRIP surface), case-folding hazards
    ('İ', ß), exotic whitespace, quotes and empties — both engines must
    emit the identical detected_lang for every doc."""
    import random

    import duckdb
    import pandas as pd

    from pdf_extractor_spark.kernels.lang import STOPWORDS
    from pdf_extractor_spark.operators.text_analysis import lang_id

    rng = random.Random(20250818)
    pools = {lg: sorted(ws) for lg, ws in STOPWORDS.items()}
    fillers = ["data", "engine", "İstanbul", "straße", "corpus", "x1",
               "naïve", "Zürich", "word", "—", "“quoted”"]
    puncts = ["", ".", ",", "!", "?", '"', "'", "(", ")", "[", "]", "...",
              ".)", '?"']
    seps = [" ", "  ", "\t", "\n", "   "]  # NBSP inside a token run

    texts = []
    for _ in range(600):
        langs = rng.sample(sorted(pools), k=rng.randint(1, 3))
        toks = []
        for _ in range(rng.randint(1, 25)):
            src = rng.choice(langs)
            w = (rng.choice(pools[src]) if rng.random() < 0.7
                 else rng.choice(fillers))
            if rng.random() < 0.2:
                w = w.capitalize()
            toks.append(rng.choice(puncts) + w + rng.choice(puncts))
        texts.append(rng.choice(seps).join(toks))
    texts += ["", "   ", ".", "!!!", '"le" (de) [que].', "LE DE LA ET"]

    df = spark.createDataFrame(
        [(i, t, "xx") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string")
    sp = {r["doc_id"]: r["detected_lang"] for r in lang_id(df).collect()}

    import __spark_entry__ as entry

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(
        {"doc_id": range(len(texts)), "lang": "xx", "text": texts}))
    du = con.execute(entry._lang_id_sql()).fetchall()
    for doc_id, _lang, detected in du:
        assert sp[doc_id] == detected, (doc_id, repr(texts[doc_id]),
                                        sp[doc_id], detected)


def test_extract_anchor_texts_and_plan(spark):
    html = (
        '<html><body>'
        '<a href="https://a.net/p/1">Read More</a>'
        '<A class="z" HREF="/p/2">about us</a>'
        '<a href="//b.net/p/3#frag"></a>'
        '<a href="rel/4"><b>nested</b></a>'   # nested markup: out of subset
        '</body></html>'
    ).encode()
    df = spark.createDataFrame(
        [("https://ex.com/doc/9", html)], "url string, html binary")
    out = webtext.extract_anchor_texts(df)
    got = [(r["link_url"], r["anchor"]) for r in out.collect()]
    assert got == [
        ("https://a.net/p/1", "Read More"),
        ("https://ex.com/p/2", "about us"),
        ("https://b.net/p/3", ""),
    ]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan   # narrow: zero shuffles
    assert "Python" not in plan, plan     # zero Python


def test_inbound_host_signals(spark):
    rows = [
        ("https://s1.com/a", "h", "Read More", "https://t.com/p/1"),
        ("https://s2.com/b", "h", "read  more", "https://t.com/p/2"),
        ("https://s3.com/c", "h", "Docs", "https://T.com/p/3"),
        ("https://s1.com/a", "h", "x", "https://other.net/"),
        ("https://s1.com/a", "h", "y", "not-a-url"),
    ]
    df = spark.createDataFrame(rows, "url string, href string, anchor string, link_url string")
    got = {r["host"]: (r["in_degree"], r["inbound_anchor_terms"])
           for r in webtext.inbound_host_signals(df).collect()}
    # t.com: 3 inbound links; terms lowercase+trimmed -> {read more variants
    # stay distinct on inner whitespace, docs} = {'read more','read  more','docs'}
    assert got["t.com"] == (3, 3)
    assert got["other.net"] == (1, 1)
    assert "not-a-url" not in got and "" not in got


def _hits_duckdb(edges, iters=5):
    agg = {}
    for s, d, w in edges:
        agg[(s, d)] = agg.get((s, d), 0) + w
    vals = ", ".join(f"('{s}','{d}',{w})" for (s, d), w in sorted(agg.items()))
    sql = (f"WITH e(src,dst,w) AS (VALUES {vals}),\n"
           f"{webtext.hits_unrolled_sql('e', iters=iters)}\n"
           f"SELECT * FROM hits_final ORDER BY host")
    return duckdb.connect().execute(sql).fetchall()


def test_hits_fixedpoint_duckdb_twin_parity(spark):
    # star + chain + self-loop + weighted: exercises both score directions
    edges = [("a", "b", 3), ("c", "b", 1), ("d", "b", 2), ("b", "e", 1),
             ("e", "e", 2), ("a", "c", 1), ("f", "a", 1)]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = sorted(
        (r["host"], r["hub_scaled"], r["auth_scaled"], r["hub"],
         r["authority"])
        for r in webtext.hits_fixedpoint(df, iters=5).collect())
    assert got == [tuple(r) for r in _hits_duckdb(edges, iters=5)]
    # max-normalization invariants: all scores in [0, SCALE], and the
    # per-direction max IS SCALE (some host saturates each direction)
    assert all(0 <= h <= webtext.HITS_SCALE
               and 0 <= a <= webtext.HITS_SCALE for _, h, a, _, _ in got)
    assert max(h for _, h, _, _, _ in got) == webtext.HITS_SCALE
    assert max(a for _, _, a, _, _ in got) == webtext.HITS_SCALE
    # b is the star center: it must be the top authority
    top_auth = max(got, key=lambda r: r[2])
    assert top_auth[0] == "b"


def test_hits_fixedpoint_partitioning_invariant(spark):
    """Bit-identical under different partitioning / join strategy — the
    reproducibility property the fixed-point arithmetic buys (same
    contract as the pagerank twin test)."""
    edges = [(f"h{i % 9}", f"h{(i * 5 + 2) % 9}", 1 + i % 3)
             for i in range(50)]
    df1 = spark.createDataFrame(edges, "src string, dst string, w long")
    df32 = df1.repartition(32)
    a = sorted((r["host"], r["hub_scaled"], r["auth_scaled"]) for r in
               webtext.hits_fixedpoint(df1, broadcast_scores=True).collect())
    b = sorted((r["host"], r["hub_scaled"], r["auth_scaled"]) for r in
               webtext.hits_fixedpoint(df32, broadcast_scores=False).collect())
    assert a == b


def test_hits_empty_edges(spark):
    df = spark.createDataFrame([], "src string, dst string, w long")
    assert webtext.hits_fixedpoint(df).collect() == []


def test_parse_sitemap_known_answers(spark):
    urlset = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        '  <url><loc>https://ex.com/a</loc>'
        '<lastmod>2026-01-05</lastmod></url>\n'
        '  <URL>\n    <LOC>  https://ex.com/b  </LOC>\n  </URL>\n'
        '  <url><lastmod>2026-01-09</lastmod></url>\n'   # no loc -> dropped
        '  <url><loc>https://ex.com/c</loc>'
        '<lastmod>\n 2026-02-01 \n</lastmod></url>\n'
        '</urlset>')
    index = (
        '<sitemapindex>'
        '<sitemap><loc>https://ex.com/sitemap-1.xml</loc>'
        '<lastmod>2025-12-31</lastmod></sitemap>'
        '<sitemap><loc>https://ex.com/sitemap-2.xml</loc></sitemap>'
        '</sitemapindex>')
    df = spark.createDataFrame(
        [("https://ex.com/sitemap.xml", urlset),
         ("https://ex.com/sitemap_index.xml", index)],
        "url string, xml string")
    got = sorted(
        (r["url"], r["loc"], r["lastmod"], r["is_index"])
        for r in webtext.parse_sitemap(df).collect())
    assert got == [
        ("https://ex.com/sitemap.xml", "https://ex.com/a", "2026-01-05", False),
        ("https://ex.com/sitemap.xml", "https://ex.com/b", None, False),
        ("https://ex.com/sitemap.xml", "https://ex.com/c", "2026-02-01", False),
        ("https://ex.com/sitemap_index.xml", "https://ex.com/sitemap-1.xml",
         "2025-12-31", True),
        ("https://ex.com/sitemap_index.xml", "https://ex.com/sitemap-2.xml",
         None, True),
    ]


def test_parse_sitemap_plan_is_narrow(spark):
    """The frontier refresh must run inside the scan stage: no shuffle,
    no Python (same contract as extract_links)."""
    df = spark.createDataFrame(
        [("u", "<urlset><url><loc>x</loc></url></urlset>")],
        "url string, xml string")
    out = webtext.parse_sitemap(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan


def test_crawl_diff_known_answers_and_twin(spark):
    old = spark.createDataFrame(
        [("u1", "same"), ("u2", "before"), ("u3", "kept"), ("u4", None)],
        "url string, text string")
    new = spark.createDataFrame(
        [("u1", "same"), ("u2", "after"), ("u5", "fresh"), ("u4", "")],
        "url string, text string")
    got = sorted(map(tuple, webtext.crawl_diff(old, new).collect()))
    # u4: NULL old content hashes as '' == new '' -> unchanged
    assert got == [("u1", "unchanged"), ("u2", "changed"), ("u3", "gone"),
                   ("u4", "unchanged"), ("u5", "added")]
    con = duckdb.connect()
    con.register("o", old.toPandas())
    con.register("n", new.toPandas())
    want = sorted(map(tuple, con.execute("""
        SELECT coalesce(o.url, n.url) AS url,
               CASE WHEN o.url IS NULL THEN 'added'
                    WHEN n.url IS NULL THEN 'gone'
                    WHEN md5(coalesce(o.text, '')) <> md5(coalesce(n.text, ''))
                        THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM o FULL OUTER JOIN n ON o.url = n.url ORDER BY url
    """).fetchall()))
    assert got == want


def test_crawl_diff_across_snapshot_time_travel(spark, tmp_path):
    """The month-over-month shape: crawl A committed, crawl B overwrites,
    diff(read_snapshot(A), read(current)) classifies every url."""
    from pdf_extractor_spark.sources.table_format import SnapshotTable

    t = SnapshotTable(str(tmp_path / "crawl"))
    a = spark.createDataFrame(
        [("u1", "x"), ("u2", "y"), ("u3", "z")], "url string, text string")
    snap_a = t.append(a)
    b = spark.createDataFrame(
        [("u1", "x"), ("u2", "y2"), ("u4", "w")], "url string, text string")
    t.overwrite(b)
    diff = sorted(map(tuple, webtext.crawl_diff(
        t.read_snapshot(spark, snap_a), t.read(spark)).collect()))
    assert diff == [("u1", "unchanged"), ("u2", "changed"), ("u3", "gone"),
                    ("u4", "added")]


ROBOTS_A = """# global comment
User-agent: *
Disallow: /private/
Allow: /private/ok
Crawl-delay: 2

User-agent: fastbot
User-agent: megabot
Disallow: /
Crawl-delay: 0.5

Sitemap: https://a.com/sitemap.xml
Sitemap: https://a.com/sitemap-news.xml
"""

ROBOTS_B = """User-agent: *
Disallow:
Allow: /x  # trailing comment
bogus line without colon pattern !!
Crawl-delay: not-a-number
"""


def _robots_ref(body, agent="*"):
    """Independent pure-Python reference of the documented RFC 9309
    subset (group structure, exact-or-* agent match, specific-overrides-*)."""
    groups, cur, in_ua = [], None, False
    sitemaps, rules_out, delays = [], [], []
    for raw in body.split("\n"):
        line = raw.split("#", 1)[0]
        import re
        m = re.match(r"^\s*([A-Za-z-]+)\s*:(.*)$", line)
        if not m:
            continue
        k, v = m.group(1).lower(), m.group(2).strip()
        if k == "sitemap":
            if v:
                sitemaps.append(v)
            continue
        if k == "user-agent":
            if not in_ua:
                cur = {"agents": set(), "rules": [], "delay": []}
                groups.append(cur)
            cur["agents"].add(v.lower())
            in_ua = True
            continue
        in_ua = False
        if cur is None:
            continue
        if k in ("allow", "disallow") and v:
            cur["rules"].append((v, k == "allow"))
        elif k == "crawl-delay":
            try:
                cur["delay"].append(float(v))
            except ValueError:
                pass
    has_specific = any(agent.lower() in g["agents"] for g in groups)
    for g in groups:
        app = (agent.lower() in g["agents"]) if has_specific \
            else ("*" in g["agents"])
        if app:
            rules_out.extend(g["rules"])
            delays.extend(g["delay"])
    return sorted(set(rules_out)), sorted(set(sitemaps)), \
        (min(delays) if delays else None)


def test_parse_robots_txt_reference_parity(spark):
    df = spark.createDataFrame(
        [("A.com", ROBOTS_A), ("b.com", ROBOTS_B)], "host string, body string")
    for agent in ("*", "megabot", "unknownbot"):
        got = {}
        for r in webtext.parse_robots_txt(df, agent=agent).collect():
            got.setdefault(r["host"], []).append((r["prefix"], r["allow"]))
        gd = {r["host"]: r["crawl_delay"] for r in
              webtext.robots_crawl_delay(df, agent=agent).collect()}
        for host, body in [("a.com", ROBOTS_A), ("b.com", ROBOTS_B)]:
            rules, _, delay = _robots_ref(body, agent)
            assert sorted(got.get(host, [])) == rules, (agent, host)
            assert gd.get(host) == delay, (agent, host)
    sm = sorted(map(tuple, webtext.robots_sitemaps(df).collect()))
    assert sm == [("a.com", "https://a.com/sitemap-news.xml"),
                  ("a.com", "https://a.com/sitemap.xml")]


def test_parse_robots_specific_group_overrides_star(spark):
    df = spark.createDataFrame([("h.com", ROBOTS_A)], "host string, body string")
    # megabot has a specific group -> '*' rules ignored entirely
    rules = sorted((r["prefix"], r["allow"]) for r in
                   webtext.parse_robots_txt(df, agent="megabot").collect())
    assert rules == [("/", False)]
    d = webtext.robots_crawl_delay(df, agent="megabot").collect()
    assert d[0]["crawl_delay"] == 0.5
    # unknown agent falls back to the '*' group
    rules = sorted((r["prefix"], r["allow"]) for r in
                   webtext.parse_robots_txt(df, agent="slowbot").collect())
    assert rules == [("/private/", False), ("/private/ok", True)]


def test_parse_robots_chain_into_robots_match(spark):
    """bytes → parse_robots_txt → robots_match: the full decision chain."""
    df = spark.createDataFrame([("a.com", ROBOTS_A)], "host string, body string")
    rules = webtext.parse_robots_txt(df, agent="crawler9000")
    urls = spark.createDataFrame(
        [(1, "https://a.com/private/secret"),
         (2, "https://a.com/private/ok/page"),
         (3, "https://a.com/public")],
        "doc_id long, url string")
    got = {r["doc_id"]: r["robots_allowed"] for r in
           webtext.robots_match(urls, rules).collect()}
    assert got == {1: False, 2: True, 3: True}


def test_parse_robots_sitemap_does_not_split_ua_group(spark):
    """RFC 9309: non-group records must not interfere with group parsing —
    a Sitemap line between consecutive User-agent lines keeps them in ONE
    group (review-wave regression)."""
    body = ("User-agent: a\n"
            "Sitemap: https://h.com/s.xml\n"
            "User-agent: b\n"
            "Disallow: /x\n")
    df = spark.createDataFrame([("h.com", body)], "host string, body string")
    for agent in ("a", "b"):
        rules = sorted((r["prefix"], r["allow"]) for r in
                       webtext.parse_robots_txt(df, agent=agent).collect())
        assert rules == [("/x", False)], agent
        ref_rules, _, _ = _robots_ref(body, agent)
        assert rules == ref_rules, agent
    # the sitemap line itself still surfaces
    assert webtext.robots_sitemaps(df).collect()[0]["sitemap_url"] == \
        "https://h.com/s.xml"


def test_hits_rejects_iters_zero(spark):
    import pytest

    df = spark.createDataFrame([("a", "b", 1)], "src string, dst string, w long")
    with pytest.raises(ValueError):
        webtext.hits_fixedpoint(df, iters=0)
    with pytest.raises(ValueError):
        webtext.hits_unrolled_sql("e", iters=0)


def test_pagerank_warm_start_converges_in_one_iteration(spark):
    """Month-over-month shape: warm-starting from last crawl's converged
    ranks, ONE refresh iteration on a lightly perturbed graph lands far
    closer to the converged result than a cold iteration — the
    iteration-count saving that matters at 1e8 hosts. Needs a SKEWED
    graph: on a degree-regular graph the fixed point is ~uniform and
    warm-starting cannot help by construction (measured while designing
    this test — warm/cold ratio ~1.0 regular, ~0.09 hub-skewed)."""
    edges = [(f"leaf{i}", "hub.com", 1) for i in range(30)] + \
            [("hub.com", f"leaf{i}", 1) for i in range(3)]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    cold = webtext.pagerank_fixedpoint(df, iters=30)
    # next crawl: one new leaf appears
    edges2 = edges + [("leaf30", "hub.com", 1)]
    df2 = spark.createDataFrame(edges2, "src string, dst string, w long")
    ref = {r["host"]: r["rank_scaled"]
           for r in webtext.pagerank_fixedpoint(df2, iters=30).collect()}
    warm1 = {r["host"]: r["rank_scaled"]
             for r in webtext.pagerank_fixedpoint(
                 df2, iters=1, init_ranks=cold).collect()}
    cold1 = {r["host"]: r["rank_scaled"]
             for r in webtext.pagerank_fixedpoint(df2, iters=1).collect()}
    assert set(warm1) == set(ref)  # new host present, none lost
    err_warm = max(abs(warm1[h] - ref[h]) for h in ref)
    err_cold = max(abs(cold1[h] - ref[h]) for h in ref)
    # measured: ratio ~0.09; assert a conservative 5x improvement
    assert err_warm < err_cold / 5, (err_warm, err_cold)


def test_parse_robots_txt_fuzz_vs_reference(spark):
    """Seeded fuzz of the robots.txt TEXT parser: random bodies built
    from the directive grammar (UA runs of 1-3, interleaved sitemaps,
    comments, junk lines, empty disallows, weird case/whitespace, CRLF)
    must parse identically to the pure-Python reference for every
    agent tier."""
    import random

    rng = random.Random(1234)
    agents_pool = ["*", "megabot", "fastbot", "slowbot"]
    paths = ["/", "/a", "/a/b", "/casino", "/p/q", ""]
    bodies = []
    for h in range(25):
        lines = []
        for _ in range(rng.randint(2, 18)):
            roll = rng.random()
            if roll < 0.25:
                lines.append(
                    f"User-Agent: {rng.choice(agents_pool)}"
                    + (" # c" if rng.random() < 0.3 else ""))
            elif roll < 0.5:
                key = rng.choice(["Disallow", "Allow", "disallow", "ALLOW"])
                lines.append(f"{key}: {rng.choice(paths)}")
            elif roll < 0.62:
                lines.append(f"Crawl-delay: {rng.choice(['1', '2.5', 'x', ''])}")
            elif roll < 0.74:
                lines.append(f"Sitemap: https://h{h}.com/s{rng.randint(0,3)}.xml")
            elif roll < 0.85:
                lines.append("# full-line comment")
            else:
                lines.append(rng.choice(["junk without structure", "", "  "]))
        sep = "\r\n" if rng.random() < 0.3 else "\n"
        bodies.append((f"h{h}.com", sep.join(lines)))
    df = spark.createDataFrame(bodies, "host string, body string")
    for agent in ("*", "megabot", "neverseen"):
        got_rules: dict = {h: [] for h, _ in bodies}
        for r in webtext.parse_robots_txt(df, agent=agent).collect():
            got_rules[r["host"]].append((r["prefix"], r["allow"]))
        got_delay = {r["host"]: r["crawl_delay"] for r in
                     webtext.robots_crawl_delay(df, agent=agent).collect()}
        for h, body in bodies:
            # CRLF bodies: the reference splits on \n and strips \r via
            # the regex value-trim, same as the Spark split on \r?\n
            ref_rules, _, ref_delay = _robots_ref(
                body.replace("\r\n", "\n"), agent)
            assert sorted(set(got_rules[h])) == ref_rules, (agent, h, body)
            assert got_delay.get(h) == ref_delay, (agent, h, body)
    got_sm: dict = {}
    for r in webtext.robots_sitemaps(df).collect():
        got_sm.setdefault(r["host"], set()).add(r["sitemap_url"])
    for h, body in bodies:
        _, ref_sm, _ = _robots_ref(body.replace("\r\n", "\n"))
        assert got_sm.get(h, set()) == set(ref_sm), (h, body)


def _sitemap_ref(xml: str):
    """Independent pure-Python reference of the documented sitemap subset."""
    import re

    out = []
    for block_re, is_idx in ((r"(?is)<url[\s>].*?</url>", False),
                             (r"(?is)<sitemap[\s>].*?</sitemap>", True)):
        for b in re.findall(block_re, xml):
            loc = re.search(r"(?is)<loc>\s*([^<]*?)\s*</loc>", b)
            lm = re.search(r"(?is)<lastmod>\s*([^<]*?)\s*</lastmod>", b)
            if loc and loc.group(1):
                out.append((loc.group(1), lm.group(1) if lm and lm.group(1)
                            else None, is_idx))
    return sorted(out, key=lambda t: (t[2], t[0], t[1] or ""))


def test_parse_sitemap_fuzz_vs_reference(spark):
    """Seeded fuzz of the sitemap parser: random urlset/sitemapindex
    mixes with optional lastmod, attributes on <url>, whitespace/case
    noise, locless blocks, and truncated tails must parse identically
    to the pure-Python reference."""
    import random

    rng = random.Random(4321)
    docs = []
    for i in range(30):
        parts = ["<urlset>"]
        for j in range(rng.randint(0, 8)):
            tag = rng.choice(["url", "URL", 'url class="x"'])
            loc = rng.choice(
                [f"https://s{i}.com/p/{j}", f" https://s{i}.com/q/{j} ", ""])
            lm = rng.choice([None, "2026-01-05", " 2026-02-01 ", ""])
            b = f"<{tag}>"
            if loc or rng.random() < 0.5:
                b += f"<loc>{loc}</loc>"
            if lm is not None:
                b += f"<lastmod>{lm}</lastmod>"
            b += "</url>"
            parts.append(b)
        for j in range(rng.randint(0, 3)):
            parts.append(f"<sitemap><loc>https://s{i}.com/sm{j}.xml</loc>"
                         + (f"<lastmod>2025-12-{10+j}</lastmod>"
                            if rng.random() < 0.5 else "")
                         + "</sitemap>")
        parts.append("</urlset>")
        xml = rng.choice(["", '<?xml version="1.0"?>\n']) + "\n".join(parts)
        if rng.random() < 0.2:
            xml = xml[: rng.randint(len(xml) // 2, len(xml))]  # truncation
        docs.append((f"https://s{i}.com/sitemap.xml", xml))
    df = spark.createDataFrame(docs, "url string, xml string")
    got: dict = {u: [] for u, _ in docs}
    for r in webtext.parse_sitemap(df).collect():
        got[r["url"]].append((r["loc"], r["lastmod"], r["is_index"]))
    for u, xml in docs:
        assert sorted(got[u], key=lambda t: (t[2], t[0], t[1] or "")) == \
            _sitemap_ref(xml), (u, xml)


def test_frontier_schedule_end_to_end(spark, tmp_path):
    """The whole crawl-scheduling cycle from raw bytes: robots bodies ->
    rules + sitemap seeds + delays; sitemap XML -> candidate locs;
    month-over-month crawl tables -> changed/added keys; link graph ->
    warm-startable priorities; frontier_schedule composes the verdict."""
    from pdf_extractor_spark.sources.table_format import SnapshotTable

    robots = spark.createDataFrame(
        [("good.com",
          "User-agent: *\nDisallow: /private/\nCrawl-delay: 1.5\n"
          "Sitemap: https://good.com/sitemap.xml\n"),
         ("spam.com", "User-agent: *\nAllow: /\n")],
        "host string, body string")
    rules = webtext.parse_robots_txt(robots, agent="graftbot")
    delays = webtext.robots_crawl_delay(robots, agent="graftbot")
    seeds = webtext.robots_sitemaps(robots)
    assert seeds.collect()[0]["sitemap_url"] == "https://good.com/sitemap.xml"
    # the sitemap the seed points to (fetched bytes)
    sm = spark.createDataFrame(
        [("https://good.com/sitemap.xml",
          "<urlset>"
          "<url><loc>https://good.com/new-page</loc></url>"
          "<url><loc>https://good.com/private/x</loc></url>"
          "<url><loc>https://spam.com/win-casino-now</loc></url>"
          "</urlset>")], "url string, xml string")
    locs = webtext.parse_sitemap(sm).where(~F.col("is_index")) \
        .select(F.col("loc").alias("url"))
    # month-over-month: /changed re-crawled with new content
    t = SnapshotTable(str(tmp_path / "crawl"))
    snap_a = t.append(spark.createDataFrame(
        [("https://good.com/changed", "v1"), ("https://good.com/same", "s")],
        "url string, text string"))
    t.overwrite(spark.createDataFrame(
        [("https://good.com/changed", "v2"), ("https://good.com/same", "s")],
        "url string, text string"))
    diff = webtext.crawl_diff(t.read_snapshot(spark, snap_a), t.read(spark))
    refetch = diff.where(F.col("status").isin("added", "changed")) \
        .select("url")
    # link graph priorities
    ranks = spark.createDataFrame(
        [("good.com", 900), ("spam.com", 100)], "host string, rank_scaled long")
    sched = {r["url"]: r for r in webtext.frontier_schedule(
        locs.unionByName(refetch), rules, ranks, delays).collect()}
    assert set(sched) == {"https://good.com/new-page",
                          "https://good.com/private/x",
                          "https://spam.com/win-casino-now",
                          "https://good.com/changed"}
    ok = sched["https://good.com/new-page"]
    assert (ok["fetch"], ok["reason"], ok["priority"],
            ok["crawl_delay"]) == (True, "ok", 900, 1.5)
    assert (sched["https://good.com/changed"]["fetch"],
            sched["https://good.com/changed"]["priority"]) == (True, 900)
    priv = sched["https://good.com/private/x"]
    assert (priv["fetch"], priv["reason"]) == (False, "robots")
    spam = sched["https://spam.com/win-casino-now"]
    assert spam["fetch"] is False and spam["reason"].startswith("url:")
    assert spam["priority"] == 100 and spam["crawl_delay"] is None
    # the same cycle with priorities sourced from the committed
    # per-crawl-snapshot centrality store (the production wiring):
    # identical fetch verdicts, host-rank order preserved
    edges = spark.createDataFrame(
        [("a.com", "good.com", 5), ("b.com", "good.com", 3),
         ("c.com", "spam.com", 1)], "src string, dst string, w long")
    cent = webtext.centrality_stored(edges, str(tmp_path / "cent"))
    sched2 = {r["url"]: r for r in webtext.frontier_schedule(
        locs.unionByName(refetch), rules,
        cent.select("host", "rank_scaled"), delays).collect()}
    assert {u: s["fetch"] for u, s in sched2.items()} == {
        u: s["fetch"] for u, s in sched.items()}
    assert (sched2["https://good.com/new-page"]["priority"]
            > sched2["https://spam.com/win-casino-now"]["priority"])


def test_robots_match_wildcard_rules_and_parity(spark):
    """RFC 9309 §2.2.3 special characters: '*' matches any sequence,
    trailing '$' anchors, mid-rule '$' and regex metachars are literal;
    precedence stays rule-text octet length. Verdicts engine-identical."""
    rules = [
        ("h.com", "/*.php$", False),
        ("h.com", "/p/*/x", False),
        ("h.com", "/fish*", False),
        ("h.com", "/fish*.php", True),
        ("h.com", "/exact$", False),
        ("h.com", "/lit.dot", False),
        ("h.com", "/mid$dollar", False),
        ("h.com", "/a", True),
    ]
    cases = {
        "/index.php": (False, "/*.php$"),
        "/index.php?x=1": (False, "/*.php$"),   # query is not path
        "/index.phpx": (True, ""),              # '$' anchors
        "/p/a/b/x": (False, "/p/*/x"),
        "/p/x": (True, ""),                     # '*' needs >= 0 chars but
                                                # the /-structure must fit
        "/fish": (False, "/fish*"),
        "/fishing": (False, "/fish*"),
        "/fish.php": (True, "/fish*.php"),      # longer allow wins
        "/exact": (False, "/exact$"),
        "/exactx": (True, ""),
        "/lit.dot": (False, "/lit.dot"),
        "/litxdot": (True, ""),                 # '.' is literal
        "/mid$dollar": (False, "/mid$dollar"),  # mid-'$' is literal
        "/a/b": (True, "/a"),
    }
    urls = [(i, f"https://h.com{p}") for i, p in enumerate(cases)]
    udf = spark.createDataFrame(urls, "doc_id long, url string")
    rdf = spark.createDataFrame(rules, "host string, prefix string, allow boolean")
    got = {r["doc_id"]: (r["robots_allowed"], r["robots_rule"])
           for r in webtext.robots_match(udf, rdf).collect()}
    for i, (p, want) in enumerate(cases.items()):
        assert got[i] == want, (p, got[i], want)
    con = duckdb.connect()
    con.register("u", pd.DataFrame(urls, columns=["doc_id", "url"]))
    con.register("r", pd.DataFrame(rules, columns=["host", "prefix", "allow"]))
    du = {d: (a, p) for d, a, p in con.execute(
        "WITH uu AS (SELECT * FROM u), rr AS (SELECT * FROM r) "
        + webtext.robots_match_sql("uu", "rr")).fetchall()}
    assert du == got


def test_robots_wildcard_cross_engine_fuzz(spark):
    """Seeded fuzz with WILDCARD rules mixed in: random '*'/'$'-bearing
    patterns over random paths must verdict engine-identically."""
    import random

    rng = random.Random(991)
    hosts = [f"w{k}.com" for k in range(5)]
    segs = ["a", "bb", "php", "x", ".p"]
    rules = []
    for _ in range(50):
        depth = rng.randint(1, 3)
        parts = [rng.choice(segs + ["*"]) for _ in range(depth)]
        pat = "/" + "/".join(parts)
        if rng.random() < 0.2:
            pat = "/*" + pat[1:]     # leading-wildcard rule shape
        if rng.random() < 0.3:
            pat += "$"               # anchor LAST so it stays an anchor
        rules.append((rng.choice(hosts), pat, rng.random() < 0.5))
    rules = sorted(set(rules))
    urls = []
    for i in range(600):
        depth = rng.randint(0, 4)
        path = "/" + "/".join(rng.choice(segs) for _ in range(depth))
        urls.append((i, f"https://{rng.choice(hosts)}{path}"))
    udf = spark.createDataFrame(urls, "doc_id long, url string")
    rdf = spark.createDataFrame(rules, "host string, prefix string, allow boolean")
    sp = {r["doc_id"]: (r["robots_allowed"], r["robots_rule"])
          for r in webtext.robots_match(udf, rdf).collect()}
    con = duckdb.connect()
    con.register("u", pd.DataFrame(urls, columns=["doc_id", "url"]))
    con.register("r", pd.DataFrame(rules, columns=["host", "prefix", "allow"]))
    du = {d: (a, p) for d, a, p in con.execute(
        "WITH uu AS (SELECT * FROM u), rr AS (SELECT * FROM r) "
        + webtext.robots_match_sql("uu", "rr")).fetchall()}
    assert du == sp


def test_extract_links_base_href_and_nofollow(spark):
    html = (b'<html><head><base href="/root/"></head><body>'
            b'<a href="x">rel-to-base</a>'
            b'<a href="/abs">abs-path</a>'
            b'<a rel="nofollow ugc" href="https://spam.net/p">paid</a>'
            b'<a href="y" rel="NOFOLLOW">late-rel</a>'
            b'<a href="z" rel="noopener">other-rel</a>'
            b'</body></html>')
    df = spark.createDataFrame(
        [("https://ex.com/deep/page", html)], "url string, html binary")
    got = {r["href"]: (r["link_url"], r["nofollow"])
           for r in webtext.extract_links(df).collect()}
    # <base href="/root/"> re-points relative links away from /deep/
    assert got["x"] == ("https://ex.com/root/x", False)
    assert got["/abs"] == ("https://ex.com/abs", False)   # root-rel: base too
    assert got["https://spam.net/p"] == ("https://spam.net/p", True)
    assert got["y"] == ("https://ex.com/root/y", True)    # rel after href
    assert got["z"] == ("https://ex.com/root/z", False)   # other rel tokens
    # without <base>, relative resolves against the page dir as before
    df2 = spark.createDataFrame(
        [("https://ex.com/deep/page", b'<a href="x">t</a>')],
        "url string, html binary")
    assert webtext.extract_links(df2).collect()[0]["link_url"] == \
        "https://ex.com/deep/x"
    # nofollow edges are excluded from the host graph by default
    edges = {(r["src"], r["dst"]) for r in
             webtext.host_edges(webtext.extract_links(df)).collect()}
    assert ("ex.com", "spam.net") not in edges
    assert ("ex.com", "ex.com") in edges
    edges_all = {(r["src"], r["dst"]) for r in webtext.host_edges(
        webtext.extract_links(df), include_nofollow=True).collect()}
    assert ("ex.com", "spam.net") in edges_all


def test_extract_canonical_links(spark):
    rows = [
        ("https://ex.com/a?utm=1",
         b'<link rel="canonical" href="https://ex.com/a">'),
        ("https://ex.com/b",
         b'<link href="/b-canon" rel="canonical">'),       # href-first order
        ("https://ex.com/c", b'<link rel="stylesheet" href="/s.css">'),
        ("https://ex.com/d", b"<p>no links</p>"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["url"]: r["canonical_url"]
           for r in webtext.extract_canonical_links(df).collect()}
    assert got == {"https://ex.com/a?utm=1": "https://ex.com/a",
                   "https://ex.com/b": "https://ex.com/b-canon"}
    plan = webtext.extract_canonical_links(df) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_link_extraction_review_regressions(spark):
    """Third review wave regressions: data-rel is not rel; truncated
    final tags still yield links; canonical resolves against <base>;
    anchors carry nofollow and inbound signals exclude it; a NULL
    nofollow column keeps the edge."""
    html = (b'<html><head><base href="https://other.net/b/"></head><body>'
            b'<a href="/x" data-rel="nofollow">legit</a>'
            b'<link rel="canonical" href="/c">'
            b'<a rel="nofollow" href="https://paid.net/y">paid</a>'
            b'<a href="/trunc"')        # WARC truncation: no closing '>'
    df = spark.createDataFrame(
        [("https://ex.com/deep/b", html)], "url string, html binary")
    links = {r["href"]: (r["link_url"], r["nofollow"])
             for r in webtext.extract_links(df).collect()}
    assert links["/x"] == ("https://other.net/x", False)     # data-rel != rel
    assert links["/trunc"] == ("https://other.net/trunc", False)
    assert links["https://paid.net/y"][1] is True
    # canonical: base applies to link@href per the HTML spec
    canon = webtext.extract_canonical_links(df).collect()[0]
    assert canon["canonical_url"] == "https://other.net/c"
    # anchors: nofollow flag present; inbound signals exclude it
    anch = webtext.extract_anchor_texts(df)
    got = {r["href"]: r["nofollow"] for r in anch.collect()}
    assert got == {"/x": False, "https://paid.net/y": True}
    inb = {r["host"] for r in webtext.inbound_host_signals(anch).collect()}
    assert "paid.net" not in inb and "other.net" in inb
    inb_all = {r["host"] for r in webtext.inbound_host_signals(
        anch, include_nofollow=True).collect()}
    assert "paid.net" in inb_all
    # NULL nofollow (legacy 3-column shape unioned in) keeps the edge
    legacy = spark.createDataFrame(
        [("https://a.com/p", "h", "https://b.com/q", None)],
        "url string, href string, link_url string, nofollow boolean")
    edges = {(r["src"], r["dst"]) for r in
             webtext.host_edges(legacy).collect()}
    assert ("a.com", "b.com") in edges


def test_centrality_cross_engine_fuzz(spark):
    """Seeded fuzz of BOTH fixed-point centralities: random weighted
    graphs (dangling hosts, self-loops, multi-edges collapsed by
    host_edges' groupBy upstream, isolated-pair components) must be
    bit-identical between Spark and the unrolled DuckDB twins."""
    import random

    rng = random.Random(20260819)
    for trial in range(4):
        n_hosts = rng.randint(3, 15)
        hosts = [f"g{trial}h{k}" for k in range(n_hosts)]
        agg: dict = {}
        for _ in range(rng.randint(n_hosts, 4 * n_hosts)):
            s, d = rng.choice(hosts), rng.choice(hosts)
            agg[(s, d)] = agg.get((s, d), 0) + rng.randint(1, 5)
        edges = sorted((s, d, w) for (s, d), w in agg.items())
        df = spark.createDataFrame(edges, "src string, dst string, w long")
        vals = ", ".join(f"('{s}','{d}',{w})" for s, d, w in edges)
        pr = sorted(
            (r["host"], r["rank_scaled"], r["pagerank"])
            for r in webtext.pagerank_fixedpoint(df, iters=4).collect())
        want_pr = sorted(map(tuple, duckdb.connect().execute(
            f"WITH e(src,dst,w) AS (VALUES {vals}),\n"
            + webtext.pagerank_unrolled_sql("e", iters=4)
            + "\nSELECT * FROM pr_final ORDER BY host").fetchall()))
        assert pr == want_pr, (trial, edges)
        ht = sorted(
            (r["host"], r["hub_scaled"], r["auth_scaled"])
            for r in webtext.hits_fixedpoint(df, iters=4).collect())
        want_ht = sorted(
            (h, hs, as_) for h, hs, as_, _, _ in duckdb.connect().execute(
                f"WITH e(src,dst,w) AS (VALUES {vals}),\n"
                + webtext.hits_unrolled_sql("e", iters=4)
                + "\nSELECT * FROM hits_final ORDER BY host").fetchall())
        assert ht == want_ht, (trial, edges)


def test_unclosed_anchor_does_not_swallow_next_link(spark):
    """ADVICE round 3: a mid-document unclosed <a> must stop at the next
    tag's '<' instead of absorbing the following anchor — both links
    survive (the old [^>]* body yielded only the first)."""
    html = (b'<html><body>'
            b'<a href="https://a.net/x" '      # unclosed mid-document
            b'<a href="https://b.net/y">two</a>'
            b'<a href="https://c.net/z"')      # unclosed at EOF
    df = spark.createDataFrame(
        [("https://ex.com/p", html)], "url string, html binary")
    hrefs = {r["href"] for r in webtext.extract_links(df).collect()}
    assert hrefs == {"https://a.net/x", "https://b.net/y",
                     "https://c.net/z"}


def test_hits_overflow_precondition_raises(spark):
    """Per-host total edge weight past the 64-bit fixed-point bound must
    fail loudly (Spark long arithmetic would wrap silently while the
    DuckDB twin promotes to HUGEINT — a silent divergence otherwise)."""
    import pytest

    cap = (2 ** 63 - 1) // (webtext.HITS_SCALE ** 2)
    ok = spark.createDataFrame(
        [("a", "b", cap)], "src string, dst string, w long")
    webtext.hits_fixedpoint(ok, iters=1)  # at the bound: fine
    bad = spark.createDataFrame(
        [("a", "b", cap + 1)], "src string, dst string, w long")
    with pytest.raises(ValueError, match="fixed-point bound"):
        webtext.hits_fixedpoint(bad, iters=1)


def test_hits_releases_intermediate_checkpoints(spark):
    """Block-manager residency stays O(2 |hosts|): after hits_fixedpoint
    returns, only the final hubs/auths checkpoints (+ the nodes frame)
    remain pinned, not 2*iters of superseded half-iterations."""
    edges = spark.createDataFrame(
        [("a", "b", 2), ("b", "c", 1), ("c", "a", 3)],
        "src string, dst string, w long")
    jsc = spark._jsparkSession.sparkContext()
    before = jsc.getPersistentRDDs().size()
    res = webtext.hits_fixedpoint(edges, iters=5)
    res.collect()
    after = jsc.getPersistentRDDs().size()
    # nodes + final hubs + final auths = 3 new pinned RDDs at most
    assert after - before <= 3, (before, after)


def test_centrality_auto_broadcast_bit_identical(spark):
    """The auto knob (None) must produce bit-identical results to both
    explicit physical choices — it is a plan knob only."""
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "a", 2), ("b", "c", 1), ("c", "a", 1)],
        "src string, dst string, w long")

    def vals(df):
        return sorted(map(tuple, df.collect()))

    auto_pr = vals(webtext.pagerank_fixedpoint(edges, iters=3))
    assert auto_pr == vals(webtext.pagerank_fixedpoint(
        edges, iters=3, broadcast_ranks=True))
    assert auto_pr == vals(webtext.pagerank_fixedpoint(
        edges, iters=3, broadcast_ranks=False))
    auto_ht = vals(webtext.hits_fixedpoint(edges, iters=3))
    assert auto_ht == vals(webtext.hits_fixedpoint(
        edges, iters=3, broadcast_scores=True))
    assert auto_ht == vals(webtext.hits_fixedpoint(
        edges, iters=3, broadcast_scores=False))


def test_frontier_schedule_release_handle(spark):
    """frontier_schedule exposes its persisted gate frame for release
    (ADVICE round 3: one cached url-cardinality frame per crawl cycle
    otherwise leaks in a long-running driver)."""
    cands = spark.createDataFrame(
        [("https://ex.com/a",), ("https://ex.com/b.jpg",)], "url string")
    rules = webtext.parse_robots_txt(spark.createDataFrame(
        [("ex.com", "User-agent: *\nDisallow: /private")],
        "host string, body string"))
    ranks = spark.createDataFrame(
        [("ex.com", 123)], "host string, rank_scaled long")
    sched = webtext.frontier_schedule(cands, rules, ranks)
    sched.collect()
    gate = getattr(sched, "_persisted_gate", None)
    assert gate is not None and gate.storageLevel.useMemory
    webtext.frontier_release(sched)
    assert not gate.storageLevel.useMemory
    webtext.frontier_release(sched)  # idempotent / no-op second call


def test_link_extraction_attribute_quoting_forms(spark):
    """All three WHATWG attribute quoting forms (double- / single-quoted
    and unquoted, §13.1.2.3) extract identically across links, anchors,
    canonical and <base>, with spaced '=' accepted — real Common-Crawl
    markup mixes them freely, and the reference's DOM parser (lxml/
    HTMLParser semantics, mirrored by kernels/html_kernel.py) reads them
    all; data-href / data-rel remain different attributes and never
    match (left-boundary lookbehind)."""
    html = (b"<html><head><base href='/b/'>"
            b"<link rel=canonical href='/c'></head><body>"
            b"<a href=x1>u</a>"
            b"<a href='x2'>s</a>"
            b'<a href = "x3">d</a>'
            b'<a data-href="no">skip</a>'
            b"<a href=y rel=nofollow>n</a>"
            b"<a href='z' rel='NOFOLLOW ugc'>n2</a>"
            b"<a href=https://q.net/p>abs</a>"
            b"</body></html>")
    df = spark.createDataFrame(
        [("https://ex.com/deep/page", html)], "url string, html binary")
    got = {r["href"]: (r["link_url"], r["nofollow"])
           for r in webtext.extract_links(df).collect()}
    assert got == {
        "x1": ("https://ex.com/b/x1", False),
        "x2": ("https://ex.com/b/x2", False),
        "x3": ("https://ex.com/b/x3", False),
        "y": ("https://ex.com/b/y", True),
        "z": ("https://ex.com/b/z", True),
        "https://q.net/p": ("https://q.net/p", False),
    }
    anch = {r["href"]: (r["anchor"], r["nofollow"])
            for r in webtext.extract_anchor_texts(df).collect()}
    assert anch == {
        "x1": ("u", False), "x2": ("s", False), "x3": ("d", False),
        "y": ("n", True), "z": ("n2", True),
        "https://q.net/p": ("abs", False),
    }
    canon = webtext.extract_canonical_links(df).collect()
    assert [(r["url"], r["canonical_url"]) for r in canon] == [
        ("https://ex.com/deep/page", "https://ex.com/c")]
    # the widened grammar stays whole-stage-codegen'd: narrow, no Python
    plan = webtext.extract_links(df) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_page_metadata_known_answers(spark):
    """page_metadata: every field on a fully-tagged page (all three
    quoting forms across tags), the publish-date precedence chain
    og > ld > time > url exercised pairwise, real JSON unescaping in
    the JSON-LD fields, and all-NULL output on a bare page."""
    full = ("<html><head><title> My Page </title>"
            "<meta name='description' content='A desc'>"
            "<meta content=OGT property=og:title>"
            '<meta property="og:type" content="article">'
            '<meta property="article:published_time" '
            'content="2024-02-07 10:30:00">'
            '<script type="application/ld+json">{"@context":"s",'
            '"@type":"NewsArticle","headline":"HL \\"q\\"",'
            '"datePublished":"2024-03-05"}</script></head>'
            '<body><time datetime="2024-04-01">x</time></body></html>')
    rows = [
        ("http://ex.com/2023/07/09/post", full.encode()),
        # no og meta -> JSON-LD wins over <time> and the url date
        ("http://ex.com/2022/01/02/a",
         b'<html><script type=application/ld+json>'
         b'{"datePublished":"2021-06-01","@type":"Article"}</script>'
         b'<time datetime="2020-01-01">t</time></html>'),
        # only a <time> tag (single-quoted, date-time form)
        ("http://ex.com/b",
         b"<html><time datetime='2021-12-31 23:00:00'>y</time></html>"),
        # url-path date only
        ("http://ex.com/2022/01/03/", b"<html></html>"),
        ("http://ex.com/none", b"<html><body>bare</body></html>"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["url"]: r.asDict() for r in webtext.page_metadata(df).collect()}

    r = got["http://ex.com/2023/07/09/post"]
    assert r["title"] == "My Page"
    assert r["meta_description"] == "A desc"
    assert r["og_title"] == "OGT" and r["og_type"] == "article"
    assert r["ld_type"] == "NewsArticle" and r["ld_headline"] == 'HL "q"'
    assert str(r["published_ts"]) == "2024-02-07 10:30:00"
    assert r["date_source"] == "og"

    r = got["http://ex.com/2022/01/02/a"]
    assert r["ld_type"] == "Article" and r["ld_headline"] is None
    assert str(r["published_ts"]) == "2021-06-01 00:00:00"
    assert r["date_source"] == "ld"

    r = got["http://ex.com/b"]
    assert str(r["published_ts"]) == "2021-12-31 23:00:00"
    assert r["date_source"] == "time"

    r = got["http://ex.com/2022/01/03/"]
    assert str(r["published_ts"]) == "2022-01-03 00:00:00"
    assert r["date_source"] == "url"

    r = got["http://ex.com/none"]
    assert all(r[c] is None for c in r if c != "url")

    # narrow plan: zero shuffles, zero Python — scan-stage work only
    plan = webtext.page_metadata(df) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_page_metadata_malformed_inputs(spark):
    """Degraded markup must degrade field-local, never corrupt siblings:
    unclosed meta tags, a truncated JSON-LD block (NULL fields, no
    crash), a second <title>/<meta> ignored (first occurrence wins),
    and a non-ld script type never matching."""
    rows = [
        ("http://ex.com/m1",
         b"<html><title>A</title><title>B</title>"
         b"<meta name=description content=first>"
         b"<meta name='description' content='second'></html>"),
        # truncated JSON-LD: get_json_object returns NULL, no error
        ("http://ex.com/m2",
         b'<html><script type="application/ld+json">{"@type":"X",'
         b'</script><time datetime=2020-05-05>t</time></html>'),
        # unclosed meta: attrs bounded at the next '<', og:title survives
        ("http://ex.com/m3",
         b"<html><meta property=og:title content=kept"
         b"<meta property='og:type' content='article'></html>"),
        # script of another type is not JSON-LD
        ("http://ex.com/m4",
         b'<html><script type="text/javascript">'
         b'{"@type":"Nope"}</script></html>'),
        # UNPARSEABLE dates fall through the precedence chain (ANSI-safe
        # try_cast, never a cast error): og garbage -> the <time> wins
        ("http://ex.com/m5",
         b'<html><meta property="article:published_time" content="soon">'
         b'<time datetime="2024-06-01">t</time></html>'),
        # every signal malformed -> NULL ts, NULL source, no crash
        ("http://ex.com/9999/99/99/m6",
         b'<html><time datetime="tomorrow">t</time></html>'),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["url"]: r.asDict() for r in webtext.page_metadata(df).collect()}
    assert got["http://ex.com/m1"]["title"] == "A"
    assert got["http://ex.com/m1"]["meta_description"] == "first"
    r = got["http://ex.com/m2"]
    assert r["ld_type"] is None and r["ld_headline"] is None
    assert r["date_source"] == "time"
    assert str(r["published_ts"]) == "2020-05-05 00:00:00"
    r = got["http://ex.com/m3"]
    assert r["og_title"] == "kept" and r["og_type"] == "article"
    assert got["http://ex.com/m4"]["ld_type"] is None
    r = got["http://ex.com/m5"]
    assert str(r["published_ts"]) == "2024-06-01 00:00:00"
    assert r["date_source"] == "time"
    r = got["http://ex.com/9999/99/99/m6"]
    assert r["published_ts"] is None and r["date_source"] is None


def test_page_metadata_review_regressions(spark):
    """Round-4 review findings, pinned: (1) data-type/data-datetime are
    different attributes and must not select a script/time tag; (2) the
    url date's year must START a path segment (an ID like /item2024/...
    is not a date); (3) first-occurrence-wins holds ACROSS the two meta
    attribute orders (document position decides, not pattern order)."""
    rows = [
        # data-type script shadows nothing: the real ld+json block wins
        ("http://ex.com/r1",
         b'<html><script data-type="application/ld+json">var x=1</script>'
         b'<script type="application/ld+json">{"@type":"Article",'
         b'"datePublished":"2024-03-05"}</script></html>'),
        # data-datetime is not datetime
        ("http://ex.com/r2",
         b'<html><time data-datetime="2010-01-01" datetime="2024-06-01">'
         b"t</time></html>"),
        # ID segment /item2024/11/05 is NOT a url date
        ("http://ex.com/item2024/11/05/page", b"<html></html>"),
        # a real /2024/11/05 segment still is
        ("http://ex.com/blog/2024/11/05/page", b"<html></html>"),
        # content-first tag occurs FIRST in the document and must win
        ("http://ex.com/r5",
         b"<html><meta content='First' property='og:title'>"
         b'<meta property="og:title" content="Second"></html>'),
        # name-first tag first: unchanged behavior
        ("http://ex.com/r6",
         b'<html><meta property="og:title" content="Early">'
         b"<meta content='Late' property='og:title'></html>"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["url"]: r.asDict() for r in webtext.page_metadata(df).collect()}
    r = got["http://ex.com/r1"]
    assert r["ld_type"] == "Article"
    assert str(r["published_ts"]) == "2024-03-05 00:00:00"
    assert r["date_source"] == "ld"
    r = got["http://ex.com/r2"]
    assert str(r["published_ts"]) == "2024-06-01 00:00:00"
    assert got["http://ex.com/item2024/11/05/page"]["published_ts"] is None
    r = got["http://ex.com/blog/2024/11/05/page"]
    assert str(r["published_ts"]) == "2024-11-05 00:00:00"
    assert r["date_source"] == "url"
    assert got["http://ex.com/r5"]["og_title"] == "First"
    assert got["http://ex.com/r6"]["og_title"] == "Early"
