"""RefinedWeb line corrections (operators/refinedweb.py): each rule at
its boundary, rule order, the removal budget, and the zero-shuffle
plan shape."""

from google_vision_ocr_spark.operators.refinedweb import refinedweb_line_stats

LONG = "plain prose line with plenty of ordinary words to keep around here"


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    return {r["doc_id"]: r for r in refinedweb_line_stats(df, **kw).collect()}


def test_each_rule_classifies(spark):
    text = "\n".join(
        [LONG * 3, "42 likes", "123 45, 6%", "SHOUTY CAPS LINE", "home menu", LONG * 3]
    )
    got = _run(spark, [(1, text)])[1]
    assert (got["n_counter"], got["n_numeric"], got["n_upper"], got["n_nav"]) == (1, 1, 1, 1)
    assert got["n_kept"] == 2


def test_rule_order_counter_beats_upper(spark):
    # an uppercase counter is 1 (counter), not 3 — pins the order...
    # except the counter regex is lowercase-only, so '3 LIKES' falls
    # through to the uppercase rule; '3 likes' hits counter first
    got = _run(spark, [(1, "3 likes\n3 LIKES\n" + LONG * 4)])[1]
    assert got["n_counter"] == 1 and got["n_upper"] == 1


def test_uppercase_boundary_is_strict(spark):
    # exactly half uppercase letters -> kept (rule is strict >)
    got = _run(spark, [(1, "AAbb CCdd\n" + LONG * 4)])[1]
    assert got["n_upper"] == 0 and got["n_kept"] == 2
    assert "AAbb CCdd" in got["kept_text"]


def test_nav_needs_both_shortness_and_keyword(spark):
    got = _run(
        spark,
        [
            (1, "home menu\n" + LONG * 4),                      # 2 words + kw -> nav
            (2, "sign in now here more words\n" + LONG * 4),    # 6 words -> kept
            (3, "tiny line here\n" + LONG * 4),                 # short, no kw -> kept
        ],
    )
    assert got[1]["n_nav"] == 1
    assert got[2]["n_nav"] == 0 and got[2]["n_kept"] == 2
    assert got[3]["n_nav"] == 0 and got[3]["n_kept"] == 2


def test_removal_budget_drops_document(spark):
    # removed chars > 5% of total -> doc dropped, kept_text empty
    heavy = "SHOUTY CAPS EVERYWHERE IN THIS LONG LINE"
    got = _run(spark, [(1, heavy + "\n" + LONG), (2, "42 likes\n" + LONG * 8)])
    assert got[1]["doc_keep"] == 0 and got[1]["kept_text"] == ""
    assert got[2]["doc_keep"] == 1 and got[2]["kept_text"] != ""
    assert got[2]["removed_chars"] == len("42 likes")


def test_empty_doc_keeps_trivially(spark):
    got = _run(spark, [(1, "")])[1]
    assert got["n_lines"] == 0 and got["doc_keep"] == 1 and got["kept_text"] == ""


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, LONG)], "doc_id int, text string")
    plan = refinedweb_line_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan
