"""Every oracle must return rows on the gate's own data — a query
whose interesting predicate selects nothing passes the hash gate
vacuously (both engines agreeing on empty proves nothing).  Round 3
caught five such queries (an all-self-loop pagerank graph, an empty
anti-join, all-singleton dedup groups, an all-zero punct ratio, a
one-cohort retention) and this pins the fix.  DuckDB-only: fast, no
Spark session."""

import glob

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for p in sorted(glob.glob(f"{SF_DIR}/*.parquet")):
        name = p.split("/")[-1].replace(".parquet", "")
        con.execute(f"create view {name} as select * from read_parquet('{p}')")
    return con


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql()))
def test_oracle_returns_rows(con, name):
    n = len(con.execute(entry_mod.oracle_sql()[name]).df())
    assert n > 0, f"{name}: oracle returned 0 rows — vacuous gate entry"


def test_semdedup_oracle_actually_drops(con):
    """The planted near-dup copies must produce keep=0 rows — an
    all-keep output would pass the hash gate vacuously."""
    df = con.execute(entry_mod.oracle_sql()["semdedup_keep"]).df()
    assert (df["keep"] == 0).sum() > 0
    assert (df["keep"] == 1).sum() > 0


def test_gopher_dup_arms_nonzero(con):
    """The planted double-banner must make the dup-5/6-gram fractions
    nonzero for its subset (the raw testdata has no repeated 5-grams,
    which left these arms vacuously constant before planting)."""
    df = con.execute(entry_mod.oracle_sql()["gopher_ngram_metrics"]).df()
    for c in ("dup5_frac", "dup6_frac"):
        assert (df[c] > 0).sum() > 0, c
        assert (df[c] == 0).sum() > 0, c  # and only the planted subset


def test_c4_every_rule_fires(con):
    """Every C4 counter and both page verdicts must be exercised by
    the plant — a rule that never fires passes the gate vacuously."""
    df = con.execute(entry_mod.oracle_sql()["c4_line_filter"]).df()
    for c in ("n_kept", "n_short", "n_nopunct", "n_js"):
        assert (df[c] > 0).sum() > 0, c
    assert (df["page_keep"] == 0).sum() > 0
    assert (df["page_keep"] == 1).sum() > 0
    # both page-drop causes occur: boilerplate/code plants AND the
    # <3-kept-lines rule (pages with no plant but too few kept lines)
    kept_mask = df["page_keep"] == 1
    assert (df.loc[kept_mask, "kept_text"].str.len() > 0).all()
    assert (df.loc[~kept_mask, "kept_text"] == "").all()


def test_dsir_selection_generalizes_style(con):
    """DSIR must select by STYLE, not seed membership: curated-style
    docs outside the doc_id%30 seed must be selected at a much higher
    rate than spam-style docs — and both selected values must occur."""
    df = con.execute(entry_mod.oracle_sql()["dsir_selection"]).df()
    sel = dict(zip(df["doc_id"], df["selected"]))
    wiki = {k for k in sel if k % 3 == 0}
    nonseed_wiki = {k for k in wiki if k % 30 != 0}
    spam = {k for k in sel if k % 3 != 0}
    assert nonseed_wiki and spam
    wiki_rate = sum(sel[k] for k in nonseed_wiki) / len(nonseed_wiki)
    spam_rate = sum(sel[k] for k in spam) / len(spam)
    assert wiki_rate > 0.9, wiki_rate    # generalizes beyond the seed
    assert spam_rate < 0.5, spam_rate    # and rejects the other style
    assert 0 in sel.values() and 1 in sel.values()


def test_justext_every_class_and_transition_fires(con):
    """The planted markup must exercise every context-free class AND
    all four context-pass transitions (short->good, short->bad,
    near_good->good, near_good->bad) — otherwise the neighbour
    smoothing passes the hash gate vacuously."""
    df = con.execute(entry_mod.oracle_sql()["justext_extraction"]).df()
    for c in ("n_cf_good", "n_cf_neargood", "n_cf_short", "n_cf_bad"):
        assert (df[c] > 0).sum() > 0, c
    up = df["n_final_good"] - df["n_cf_good"]          # flips up
    cap = df["n_cf_neargood"] + df["n_cf_short"]       # flippable
    # short->good: a doc with NO near_goods still gained finals
    assert ((df["n_cf_neargood"] == 0) & (up > 0)).any()
    # short->bad: a doc with NO near_goods kept some shorts down
    assert ((df["n_cf_neargood"] == 0) & (df["n_cf_short"] > 0) & (up < df["n_cf_short"])).any()
    # near_good->good: a doc with NO shorts gained finals
    assert ((df["n_cf_short"] == 0) & (up > 0)).any()
    # near_good->bad: a doc with NO shorts lost some near_goods
    assert ((df["n_cf_short"] == 0) & (df["n_cf_neargood"] > 0) & (up < df["n_cf_neargood"])).any()
    assert (up <= cap).all() and (up >= 0).all()
    # the <nav>/<footer> wrapper must never leak into main_text
    assert not df["main_text"].str.contains("fine print").any()
    assert not df["main_text"].str.contains("about").any()
    assert (df.loc[df["n_final_good"] > 0, "main_text"].str.len() > 0).all()
    assert (df.loc[df["n_final_good"] == 0, "main_text"] == "").all()


def test_boilerpipe_every_leaf_fires(con):
    """The planted markup must reach ALL EIGHT leaves of the
    NumWordsRules tree — a plant that never enters the
    prev-link-density branch (leaves 6-8) would pass the hash gate
    without ever testing it."""
    df = con.execute(entry_mod.oracle_sql()["boilerpipe_extraction"]).df()
    for c in [f"n_l{i}" for i in range(1, 9)]:
        assert (df[c] > 0).sum() > 0, c
    assert (df["n_content"] + df["n_boiler"] == df["n_blocks"]).all()
    # the <nav>/<footer> wrapper must never leak into content_text
    assert not df["content_text"].str.contains("fine print").any()
    assert not df["content_text"].str.contains("about").any()
    assert (df.loc[df["n_content"] > 0, "content_text"].str.len() > 0).all()
    assert (df.loc[df["n_content"] == 0, "content_text"] == "").all()


def test_ccnet_all_three_buckets_fire_per_lang(con):
    """Every language must land docs in head AND middle AND tail —
    round-6 caught the 1/32-octave code collapsing middle to zero
    (cells too coarse for the narrow score band); this pins the
    12-bit refinement.  Also pins the cumulative-crossing contract:
    head >= n div 3 and head+middle >= (2n) div 3 per language."""
    df = con.execute(entry_mod.oracle_sql()["ccnet_perplexity_buckets"]).df()
    for lang, g in df.groupby("lang"):
        n = len(g)
        counts = g["bucket"].value_counts()
        for b in ("head", "middle", "tail"):
            assert counts.get(b, 0) > 0, f"{lang}: no {b}"
        assert counts["head"] >= n // 3, lang
        assert counts["head"] + counts["middle"] >= (2 * n) // 3, lang
        # buckets respect the monotone code ordering
        assert g.loc[g["bucket"] == "head", "qs_code"].max() < \
            g.loc[g["bucket"] == "middle", "qs_code"].min()
        assert g.loc[g["bucket"] == "middle", "qs_code"].max() < \
            g.loc[g["bucket"] == "tail", "qs_code"].min()


def test_surt_dedup_actually_collapses(con):
    """Cross-document dupes (shared 'dup' host pairs) AND multi-variant
    collapse (case/port/www/fragment/tracking/param-order noise) must
    both be present — without them the SURT gate never tests the
    canonicalization rules."""
    df = con.execute(entry_mod.oracle_sql()["surt_url_dedup"]).df()
    assert (df["n_docs"] == 2).sum() > 0          # cross-doc pairs
    assert (df["n_urls"] > df["n_docs"]).sum() > 0  # variant collapse
    assert (df["n_urls"] == 1).sum() > 0          # and genuine uniques
    # every SURT is in canonical shape: no scheme, no www label, no
    # fragment, no tracking params, sorted query
    s = df["surt"]
    assert not s.str.contains("://").any()
    assert not s.str.startswith("www").any()
    assert not s.str.contains("#").any()
    assert not s.str.contains("utm_|gclid", regex=True).any()
    assert s.str.contains(r"\)").all()


def test_link_graph_has_both_edge_kinds_and_no_skips(con):
    """Absolute AND root-relative edges must both exist, non-fetchable
    hrefs (#fragment / mailto:) must never become edges, and real
    aggregation (n_links > 1) must occur — otherwise the resolution
    rule and the SURT collapse pass vacuously."""
    df = con.execute(entry_mod.oracle_sql()["link_graph_extraction"]).df()
    assert df["dst_surt"].str.contains(r"org,example,dst\d").sum() > 0
    assert df["dst_surt"].str.contains("/local/").sum() > 0
    assert not df["dst_surt"].str.contains("top|mailto|x@y").any()
    assert (df["n_links"] > 1).sum() > 0
    # noisy absolute targets collapsed: every abs SURT is clean
    ab = df[df["dst_surt"].str.contains("dst")]["dst_surt"]
    assert ab.str.contains(r"\?a=1&b=2").all()  # params sorted
    assert not ab.str.contains("www|443|#").any()


def test_refinedweb_every_rule_and_both_verdicts_fire(con):
    """All four removal rules, both document verdicts, kept-docs-with-
    removals (the budget is a real threshold, not all-or-nothing), and
    both rule boundaries (half-uppercase kept, 6-word sign-in kept)
    must be present in the planted corpus."""
    df = con.execute(entry_mod.oracle_sql()["refinedweb_corrections"]).df()
    for c in ("n_counter", "n_numeric", "n_upper", "n_nav"):
        assert (df[c] > 0).sum() > 0, c
    assert (df["doc_keep"] == 0).sum() > 0
    kept = df[df["doc_keep"] == 1]
    assert len(kept) > 0
    assert ((kept["removed_chars"] > 0)).sum() > 0
    # boundaries survive in kept text
    assert kept["kept_text"].str.contains("AAbb CCdd").any()
    assert kept["kept_text"].str.contains("sign in now here more words").any()
    # removed classes never appear in kept text
    assert not kept["kept_text"].str.contains(r"\d+ likes", regex=True).any()
    assert not kept["kept_text"].str.contains("home menu").any()
    # dropped docs always emit '' text
    assert (df.loc[df["doc_keep"] == 0, "kept_text"] == "").all()


def test_page_directives_flags_and_canonicals_fire(con):
    """noindex-only, nofollow-only, both-flags, the decoy (token
    mismatch), absolute canonicals (SURT-collapsed) and rejected
    relative canonicals must all be present."""
    df = con.execute(entry_mod.oracle_sql()["page_directives"]).df()
    assert ((df["noindex"] == 1) & (df["nofollow"] == 0)).sum() > 0
    assert ((df["noindex"] == 0) & (df["nofollow"] == 1)).sum() > 0
    assert ((df["noindex"] == 1) & (df["nofollow"] == 1)).sum() > 0
    decoy = df[df["doc_id"] % 4 == 1]
    assert len(decoy) > 0
    assert (decoy[["noindex", "nofollow"]].to_numpy() == 0).all()
    canon = df[df["canonical_surt"] != ""]
    assert len(canon) > 0
    assert canon["canonical_surt"].str.startswith("org,example,").all()
    assert not canon["canonical_surt"].str.contains("www|443|WWW").any()
    rel = df[(df["doc_id"] % 3 == 1)]
    assert (rel["canonical_surt"] == "").all()  # relative ignored
