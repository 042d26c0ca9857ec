"""Eval-layer tests: metrics parity with the reference math, dataset
loaders, and an end-to-end harness run on the synthetic pair.

Reference behaviors under test: normalize/EM (utils.py:8-49), Spider
execution accuracy semantics (utils.py:51-93), get_score (evaluation.py:
109-132), and the harness block metrics (evaluation.py:421-594).
"""

import json
import os
import sqlite3
import sys

import numpy as np
import pytest

from llmspeculativesampling_tpu.evalx import (
    bleu,
    exact_match_references,
    execution_accuracy,
    load_eval_dataset,
    normalize_answer,
    rouge,
)


def test_normalize_answer_matches_reference_rules():
    # lowercase, strip punctuation, drop articles, collapse whitespace
    assert normalize_answer("The  Cat, sat!") == "cat sat"
    assert normalize_answer("An apple a day") == "apple day"


def test_exact_match_references():
    out = exact_match_references(
        ["a golden statue", "wrong"],
        [["A Golden Statue!", "other"], ["right"]],
    )
    assert out["exact_match"] == 50.0


def test_execution_accuracy(tmp_path):
    db = tmp_path / "t.sqlite"
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE head (age INT)")
    conn.executemany("INSERT INTO head VALUES (?)", [(60,), (50,), (70,)])
    conn.commit()
    conn.close()
    gold = "SELECT count(*) FROM head WHERE age > 56"
    assert execution_accuracy(str(db), "SELECT 2", gold) == 1.0  # same result set
    assert execution_accuracy(str(db), "SELECT 3", gold) == 0.0
    assert execution_accuracy(str(db), "bad sql", gold) == 0.0
    assert execution_accuracy(str(db), "SELECT 2", "bad gold") == -1.0


def test_rouge_and_bleu_sanity():
    r = rouge(["the cat sat on the mat"], ["the cat sat on the mat"])
    assert r["rouge1"] == r["rouge2"] == r["rougeL"] == 1.0
    assert rouge(["xyz"], ["abc def"])["rouge1"] == 0.0
    b = bleu(["the cat sat on the mat"], ["the cat sat on the mat"])
    assert b["bleu"] == pytest.approx(1.0)
    assert bleu(["zzz"], ["the cat"])["bleu"] == 0.0


def test_synthetic_dataset_loader():
    ds = load_eval_dataset("synthetic", limit=3, vocab_size=1000, synthetic_prompt_len=8)
    assert len(ds.prompt_ids) == 3
    assert all(p.shape == (8,) and p.dtype == np.int32 for p in ds.prompt_ids)
    assert (ds.prompt_ids[0] >= 10).all() and (ds.prompt_ids[0] < 990).all()


def test_chatalpaca_loader(tmp_path):
    path = tmp_path / "chatalpaca-10k.json"
    conv = {"conversations": [
        {"from": "human", "value": "hi"},
        {"from": "gpt", "value": "hello"},
        {"from": "human", "value": "more"},
        {"from": "gpt", "value": "sure"},
    ]}
    path.write_text(json.dumps(conv) + "\n")
    ds = load_eval_dataset("chatalpaca", data_root=str(tmp_path), limit=10)
    assert len(ds.prompts) == 2  # one prompt per assistant turn
    assert ds.references == ["hello", "sure"]
    assert ds.prompts[1].startswith("hi\nhello\nmore")


def test_spider_schema_prompt(tmp_path):
    from llmspeculativesampling_tpu.evalx.datasets import spider_schema_prompt

    tables = [{
        "db_id": "d",
        "table_names_original": ["head", "dept"],
        "column_names_original": [[-1, "*"], [0, "head_ID"], [0, "age"], [1, "dept_ID"]],
        "foreign_keys": [[3, 1]],
    }]
    tj = tmp_path / "tables.json"
    tj.write_text(json.dumps(tables))
    s = spider_schema_prompt(str(tj), "d")
    assert "Table head, columns = [*,head_ID,age]" in s
    assert "Foreign_keys = [dept.dept_ID = head.head_ID]" in s


def _tiny_pair(fam, dtype):
    from llmspeculativesampling_tpu.core.synthetic import synthetic_pair

    return synthetic_pair(
        fam, hidden_size=64, num_layers=4, draft_layers=2, num_heads=4,
        vocab_size=256, max_position=512, dtype="float32")


def test_harness_beam_v2_sweep(tmp_path):
    """The reference's headline experiment grid (evaluation.py:861-993):
    24 blocks of beam_v2 at width x extra_sample_cnt x expect_thres, with
    num_beams = width (:871) actually threaded to the engine."""
    import llmspeculativesampling_tpu.evalx.harness as H

    args = H.build_parser().parse_args([
        "--dataset", "synthetic", "--methods", "beam_v2", "--sweep",
        "--num_prompts", "1", "--max_tokens", "4", "--gamma", "2",
    ])
    orig = H.synthetic_pair
    H.synthetic_pair = _tiny_pair
    try:
        results = H.evaluate(args)
    finally:
        H.synthetic_pair = orig
    assert len(results) == 24
    assert sorted({r["num_beams"] for r in results}) == [2, 3, 4, 5]
    assert sorted({r["width"] for r in results}) == [2, 3, 4, 5]
    assert sorted({r["extra_sample_cnt"] for r in results}) == [1, 2]
    assert sorted({r["expect_thres"] for r in results}) == [0.5, 0.7, 0.9]
    for r in results:
        assert r["num_beams"] == r["width"]  # evaluation.py:871
        assert r["total_tokens"] >= 4
        assert r["tokens_per_s"] > 0


def test_harness_bild_sweep(tmp_path):
    """BiLD fallback/rollback threshold grid (experiment_multi.py:427-474)."""
    import llmspeculativesampling_tpu.evalx.harness as H

    args = H.build_parser().parse_args([
        "--dataset", "synthetic", "--methods", "bild", "--sweep_bild",
        "--num_prompts", "1", "--max_tokens", "4", "--gamma", "2",
    ])
    orig = H.synthetic_pair
    H.synthetic_pair = _tiny_pair
    try:
        results = H.evaluate(args)
    finally:
        H.synthetic_pair = orig
    assert len(results) == 12
    assert sorted({r["fallback_thres"] for r in results}) == [0.4, 0.6, 0.8, 0.9]
    assert sorted({r["rollback_thres"] for r in results}) == [1.0, 2.0, 5.0]
    for r in results:
        assert r["total_tokens"] >= 4


def test_harness_end_to_end(tmp_path):
    """Full harness block run on tiny synthetic models (CPU)."""
    from llmspeculativesampling_tpu.evalx.harness import build_parser, evaluate

    log = tmp_path / "run.log"
    args = build_parser().parse_args([
        "--dataset", "synthetic", "--methods", "autoregressive,speculative",
        "--num_prompts", "2", "--max_tokens", "8", "--log_file", str(log),
    ])
    # shrink the synthetic pair for test speed
    import llmspeculativesampling_tpu.evalx.harness as H
    from llmspeculativesampling_tpu.core.synthetic import synthetic_pair

    orig = H.synthetic_pair
    H.synthetic_pair = lambda fam, dtype: synthetic_pair(
        fam, hidden_size=64, num_layers=4, draft_layers=2, num_heads=4,
        vocab_size=256, max_position=512, dtype="float32")
    try:
        results = evaluate(args)
    finally:
        H.synthetic_pair = orig
    assert len(results) == 2
    ar, sp = results
    assert ar["method"] == "autoregressive" and ar["total_tokens"] == 16
    assert sp["method"] == "speculative" and sp["total_tokens"] >= 16
    assert sp["acc_rate"] is not None and 0 <= sp["acc_rate"] <= 1
    assert sp["mean_acc_len"] is not None
    assert log.exists() and "speculative" in log.read_text()


def test_harness_small_model_baseline(tmp_path):
    """autoregressive_small: the draft decodes alone (reference
    evaluate_chat.py:304 small-model-only baseline block)."""
    from llmspeculativesampling_tpu.evalx.harness import build_parser, evaluate

    log = tmp_path / "run.log"
    args = build_parser().parse_args([
        "--dataset", "synthetic", "--methods", "autoregressive_small",
        "--num_prompts", "2", "--max_tokens", "8", "--log_file", str(log),
    ])
    import llmspeculativesampling_tpu.evalx.harness as H
    from llmspeculativesampling_tpu.core.synthetic import synthetic_pair

    orig = H.synthetic_pair
    H.synthetic_pair = lambda fam, dtype: synthetic_pair(
        fam, hidden_size=64, num_layers=4, draft_layers=2, num_heads=4,
        vocab_size=256, max_position=512, dtype="float32")
    try:
        results = evaluate(args)
    finally:
        H.synthetic_pair = orig
    (r,) = results
    assert r["method"] == "autoregressive_small" and r["total_tokens"] == 16
