"""JL random projection: determinism and the property it exists for —
near-duplicate pairs stay near under 4x dimensionality reduction."""

import math
import random

from pyspark.sql import functions as F

from google_vision_ocr_spark.operators.similarity import random_projection


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))


def test_projection_preserves_planted_neighbors(spark):
    rng = random.Random(11)
    base = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(40)]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    # planted near-dups: tiny perturbation of the first 5 vectors
    rows += [
        (100 + i, [float(x + 0.01 * ((j * 7) % 3 - 1)) for j, x in enumerate(base[i])])
        for i in range(5)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    proj = {
        r.vec_id: r.proj for r in random_projection(df, out_dim=16).collect()
    }
    # planted pairs stay near-identical after projection
    for i in range(5):
        assert _cos(proj[i], proj[100 + i]) > 0.95
    # unrelated gaussian pairs stay scattered: mean |cos| well below
    others = [abs(_cos(proj[a], proj[b])) for a in range(10) for b in range(a + 1, 10)]
    assert sum(others) / len(others) < 0.5


def test_projection_is_partitioning_invariant_and_linear_in_scale(spark):
    rows = [(i, [float((i * 31 + j) % 7 - 3) for j in range(64)]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    a = {r.vec_id: r.proj for r in random_projection(df, out_dim=16).collect()}
    b = {
        r.vec_id: r.proj
        for r in random_projection(df.repartition(7), out_dim=16).collect()
    }
    assert a == b
    # doubling the input exactly doubles the projection (linearity)
    df2 = df.select(
        "vec_id", F.expr("transform(embedding, x -> x * 2.0F)").alias("embedding")
    )
    c = {r.vec_id: r.proj for r in random_projection(df2, out_dim=16).collect()}
    for k in a:
        assert all(abs(2 * x - y) < 1e-9 for x, y in zip(a[k], c[k]))
