"""jusText-style block classification (operators/justext.py): known
values, every context-sensitive transition, boilerplate exclusion, and
the zero-shuffle plan shape."""

import pyspark.sql.functions as F

from google_vision_ocr_spark.operators.justext import justext_blocks

GOOD = ("<p>the of and to in a big long content block with many words "
        "here to cross the eighty char bar</p>")          # stop-high, >80 chars
NEAR = "<li>short list item the of and maybe near good band text here</li>"
SHORT = "<p>tiny one</p>"
LINKBAD = '<p><a href="#">spam link farm block here now</a></p>'
PLAIN = "<p>plain words without stop density at all here</p>"  # low stops -> bad


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id int, html string")
    return {r["doc_id"]: r for r in justext_blocks(df).collect()}


def test_context_free_classes(spark):
    got = _run(spark, [(1, "<nav><a href='#'>home</a></nav>"
                           + LINKBAD + SHORT + GOOD + NEAR + PLAIN
                           + "<footer>fine print</footer>")])[1]
    assert got["n_blocks"] == 5
    assert (got["n_cf_good"], got["n_cf_neargood"], got["n_cf_short"],
            got["n_cf_bad"]) == (1, 1, 1, 2)
    # nav/footer text never reaches the block list
    assert "home" not in got["main_text"] and "fine print" not in got["main_text"]


def test_every_context_transition(spark):
    got = _run(
        spark,
        [
            # short between two goods -> good (both decisive neighbours good)
            (1, GOOD + SHORT + GOOD),
            # short between bad and good -> bad (needs BOTH)
            (2, LINKBAD + SHORT + GOOD),
            # near_good with one good neighbour -> good (needs EITHER)
            (3, LINKBAD + NEAR + GOOD),
            # near_good at the edge next to bad -> bad (edges count bad)
            (4, NEAR + LINKBAD),
        ],
    )
    assert got[1]["n_final_good"] == 3
    assert got[1]["main_text"].count("\n") == 2  # all three blocks kept
    assert got[2]["n_final_good"] == 1
    assert "tiny one" not in got[2]["main_text"]
    assert got[3]["n_final_good"] == 2
    assert "near good band" in got[3]["main_text"]
    assert got[4]["n_final_good"] == 0 and got[4]["main_text"] == ""


def test_empty_and_blockless_html(spark):
    got = _run(spark, [(1, ""), (2, "<html><body><nav>x</nav></body></html>")])
    for i in (1, 2):
        assert got[i]["n_blocks"] == 0
        assert got[i]["n_final_good"] == 0
        assert got[i]["main_text"] == ""


def test_short_rescued_only_without_links(spark):
    # a short block CONTAINING a link is bad outright, never short
    got = _run(spark, [(1, GOOD + '<p><a href="#">x</a></p>' + GOOD)])[1]
    assert got["n_cf_short"] == 0 and got["n_cf_bad"] == 1
    assert got["n_final_good"] == 2


def test_justext_is_zero_shuffle(spark):
    df = spark.createDataFrame([(1, GOOD)], "doc_id int, html string")
    plan = justext_blocks(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # no Python evaluation anywhere — pure JVM expressions
    assert "EvalPython" not in plan and "MapInArrow" not in plan
