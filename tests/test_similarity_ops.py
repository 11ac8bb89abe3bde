

def test_embedding_decontamination_empty_bench_keeps_everything(spark):
    """Round-7 review: an empty benchmark must flag nothing — the
    contaminated coalesce keeps boolean keep-filters from silently
    dropping the whole corpus on a NULL flag."""
    from pyspark.sql import functions as F

    from sumologic_aws_lambda_spark.operators.similarity import (
        embedding_decontamination,
    )

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id int, embedding array<double>")
    out = embedding_decontamination(
        corpus, corpus.filter(F.lit(False)), threshold=0.2)
    rows = out.select("vec_id", "contaminated").collect()
    assert all(r["contaminated"] is False for r in rows)
    assert (
        corpus.join(out.filter(~F.col("contaminated")), "vec_id").count()
        == 2
    )


def test_hard_negatives_only_cross_label(spark):
    from pyspark.sql import functions as F

    from sumologic_aws_lambda_spark.operators.similarity import (
        hard_negatives,
        hyperplanes,
    )

    emb = spark.createDataFrame(
        [(i, [float(i % 3 == 0), float(i % 2), 0.5], f"l{i % 2}")
         for i in range(12)],
        "vec_id int, embedding array<double>, label string")
    planes = hyperplanes(num_planes=4, dim=3)
    out = hard_negatives(emb, emb.filter(F.col("vec_id") < 4), planes,
                         k=3).collect()
    assert out    # bucket space non-degenerate for this fixture
    for r in out:
        assert r["anchor_label"] != r["neg_label"]
        assert r["rank"] <= 3
