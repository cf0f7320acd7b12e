"""Boilerpipe NumWordsRules classification (operators/boilerpipe.py):
every leaf of the decision tree at its exact integer boundary, the
document-edge sentinel, and the zero-shuffle plan shape."""

from google_vision_ocr_spark.operators.boilerpipe import boilerpipe_blocks


def W(n, tag="p"):
    return f"<{tag}>" + " ".join(["w"] * n) + f"</{tag}>"


LINKFARM = '<p><a href="#">' + " ".join(["l"] * 6) + "</a></p>"  # LD = 1


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id int, html string")
    return {r["doc_id"]: r for r in boilerpipe_blocks(df).collect()}


def test_single_block_word_boundary(spark):
    # lone block: both neighbours are the 0-word sentinel
    got = _run(spark, [(1, W(17)), (2, W(16))])
    assert got[1]["n_l5"] == 1 and got[1]["n_content"] == 1  # 17 > 16
    assert got[2]["n_l2"] == 1 and got[2]["n_boiler"] == 1   # 16 <= 16


def test_link_density_boundary(spark):
    # 2 of 6 words linked = exactly 1/3 -> NOT leaf 1 (rule is > 1/3)
    at_third = '<p><a href="#">l l</a> w w w w</p>'
    got = _run(spark, [(1, LINKFARM), (2, at_third)])
    assert got[1]["n_l1"] == 1
    assert got[2]["n_l1"] == 0 and got[2]["n_l2"] == 1  # 6 words, lone


def test_prev_words_boundary(spark):
    # prev > 4 rescues a short block (leaf 3); prev = 4 does not (leaf 2)
    got = _run(spark, [(1, W(5) + W(10) + W(3)), (2, W(4) + W(16))])
    r1 = got[1]
    assert (r1["n_l2"], r1["n_l3"]) == (1, 2)  # blk1 edge; blk2/3 prev>4
    r2 = got[2]
    assert r2["n_l4"] == 1  # blk1: next 16 > 15 -> content
    assert r2["n_l2"] == 1  # blk2: prev 4 <= 4, next sentinel


def test_high_prev_link_density_branch(spark):
    got = _run(
        spark,
        [
            (1, LINKFARM + W(41)),          # curr 41 > 40 -> leaf 8
            (2, LINKFARM + W(40)),          # curr 40, next 0 -> leaf 6
            (3, LINKFARM + W(10) + W(18)),  # next 18 > 17 -> leaf 7
        ],
    )
    assert got[1]["n_l8"] == 1 and got[1]["n_l1"] == 1
    assert got[2]["n_l6"] == 1 and got[2]["n_content"] == 0
    r3 = got[3]
    assert r3["n_l7"] == 1
    assert r3["n_l5"] == 1  # the 18-word block itself (prev LD 0)
    assert r3["content_text"] == " ".join(["w"] * 10) + "\n" + " ".join(["w"] * 18)


def test_empty_anchor_counts_zero_linked_words(spark):
    # an anchor that strips to nothing must not make the block linked
    html = '<p><a href="#"> </a> ' + " ".join(["w"] * 17) + "</p>"
    got = _run(spark, [(1, html)])[1]
    assert got["n_l1"] == 0 and got["n_l5"] == 1


def test_empty_and_blockless_html(spark):
    got = _run(spark, [(1, ""), (2, "<html><body><nav>x y z</nav></body></html>")])
    for i in (1, 2):
        assert got[i]["n_blocks"] == 0
        assert got[i]["n_content"] == 0
        assert got[i]["content_text"] == ""


def test_boilerpipe_is_zero_shuffle(spark):
    df = spark.createDataFrame([(1, W(20))], "doc_id int, html string")
    plan = boilerpipe_blocks(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan and "MapInArrow" not in plan
