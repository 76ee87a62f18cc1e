"""S13/S14 writers + S8 GloVe loader."""

import pytest


def test_conll_eval_lines_format(spark):
    from knowledgeextraction_spark.sinks import conll_eval_lines

    df = spark.createDataFrame(
        [
            (0, ["我", "们"], ["O", "O"], ["O", "disease-B"]),
            (1, ["好"], ["symptom-B"], ["symptom-B"]),
        ],
        "sent_id long, words array<string>, gold array<string>, pred array<string>",
    )
    lines = [r["value"] for r in conll_eval_lines(df).collect()]
    # '%d %s _ _ %s %s' per token, blank line per sentence
    assert lines == [
        "1 我 _ _ O O",
        "2 们 _ _ O disease-B",
        "",
        "1 好 _ _ symptom-B symptom-B",
        "",
    ]


def test_write_conll_eval_roundtrip(spark, tmp_path):
    from knowledgeextraction_spark.sinks import write_conll_eval

    df = spark.createDataFrame(
        [(0, ["字"], ["O"], ["O"])],
        "sent_id long, words array<string>, gold array<string>, pred array<string>",
    )
    out = str(tmp_path / "conll")
    write_conll_eval(df, out)
    import glob

    txt = open(glob.glob(f"{out}/part-*")[0], encoding="utf-8").read()
    assert txt == "1 字 _ _ O O\n\n"


def test_eval_writers_reject_oversized_frames(spark, tmp_path):
    """The coalesce(1) eval writers must FAIL LOUDLY on a frame above
    their row ceiling instead of funneling it through one task."""
    from knowledgeextraction_spark.sinks import write_conll_eval, write_predictions_tsv

    sent = spark.createDataFrame(
        [(i, ["字", "好"], ["O", "O"], ["O", "O"]) for i in range(8)],
        "sent_id long, words array<string>, gold array<string>, pred array<string>",
    )
    with pytest.raises(ValueError, match="single-file eval artifact"):
        write_conll_eval(sent, str(tmp_path / "conll"), max_rows=10)

    preds = spark.createDataFrame(
        [(f"guid-{i}", [0.5, 0.5], 1) for i in range(12)],
        "guid string, probabilities array<double>, prediction long",
    )
    with pytest.raises(ValueError, match="single-file eval artifact"):
        write_predictions_tsv(preds, str(tmp_path / "preds"), max_rows=10)
    # at/below the ceiling both writers still work
    write_predictions_tsv(preds, str(tmp_path / "preds_ok"), max_rows=12)


def test_write_predictions_tsv(spark, tmp_path):
    from knowledgeextraction_spark.sinks import write_predictions_tsv

    df = spark.createDataFrame(
        [("guid-0", [0.25, 0.75], 1), ("guid-1", [0.9, 0.1], 0)],
        "guid string, probabilities array<double>, prediction long",
    )
    out = str(tmp_path / "preds")
    write_predictions_tsv(df, out)
    import glob

    sub = open(glob.glob(f"{out}/submit_results.tsv/part-*")[0]).read().splitlines()
    assert sub == ["index\tprediction", "guid-0\t1", "guid-1\t0"]
    parts = glob.glob(f"{out}/test_results.tsv/part-*")
    assert len(parts) == 1  # single ordered file: row i == example i
    assert open(parts[0]).read().splitlines() == ["0.25\t0.75", "0.9\t0.1"]


def test_load_glove(spark, tmp_path):
    from knowledgeextraction_spark.sinks import load_glove

    p = tmp_path / "glove.txt"
    p.write_text(
        "hello 0.1 0.2 0.3\n"
        "\n"
        "word42 1.0 2.0 3.0\n"
        "hello 9.0 9.0 9.0\n",  # later duplicate wins (reference dict)
        encoding="utf-8",
    )
    got = {r["word"]: r["vec"] for r in load_glove(spark, str(p), 3).collect()}
    assert got["hello"] == [9.0, 9.0, 9.0]
    # digit-normalized key (chinese_CONLL.py:167)
    assert got["word00"] == [1.0, 2.0, 3.0]
    assert "word42" not in got


def test_load_glove_dim_mismatch_raises(spark, tmp_path):
    from knowledgeextraction_spark.sinks import load_glove

    p = tmp_path / "bad.txt"
    p.write_text("oops 0.1 0.2\n", encoding="utf-8")
    with pytest.raises(Exception, match="Inconsistent word vector sizes"):
        load_glove(spark, str(p), 3).collect()
