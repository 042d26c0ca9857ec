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


def test_rouge_golden_values():
    """Hand-verified against the canonical rouge_score definitions at its
    default use_stemmer=False (VERDICT r3 ask #5 — non-trivial goldens).

    pred 'the cat was found under the bed' (7 tok) vs ref 'the cat was
    under the bed' (6 tok): unigram overlap 6 (the x2, cat, was, under,
    bed) -> P=6/7, R=1, F1=12/13; bigram overlap 4 of pred-6/ref-5
    (the-cat, cat-was, under-the, the-bed) -> F1 = 2*(4/6)(4/5)/((4/6)+
    (4/5)) = 8/11; LCS = 'the cat was under the bed' (6) -> F1 = 12/13."""
    r = rouge(["the cat was found under the bed"], ["the cat was under the bed"])
    assert r["rouge1"] == pytest.approx(12 / 13)
    assert r["rouge2"] == pytest.approx(8 / 11)
    assert r["rougeL"] == pytest.approx(12 / 13)

    # reordering separates rougeL from rouge1: all 4 unigrams match
    # (F1=1) but the longest common subsequence is only 'the gunman' (2)
    # -> rougeL = 2/4 = 0.5; single shared bigram 'the gunman' of 3/3 ->
    # rouge2 = 1/3
    r = rouge(["the gunman killed police"], ["police killed the gunman"])
    assert r["rouge1"] == pytest.approx(1.0)
    assert r["rouge2"] == pytest.approx(1 / 3)
    assert r["rougeL"] == pytest.approx(0.5)

    # documented delta vs rouge_score's NON-default use_stemmer=True:
    # no Porter stemming here, so inflections do not match (stemmed
    # rouge1 would be 1.0)
    assert rouge(["cats sleeping"], ["cat sleep"])["rouge1"] == 0.0


def test_bleu_golden_values():
    """Hand-verified against the HF `bleu` metric's compute_bleu
    (smooth=False) semantics on lowercase punctuation-free text, where
    our tokenizer is equivalent to its tokenizer_13a input."""
    # 9-token pair differing in one verb: p1=8/9, p2=6/8, p3=4/7,
    # p4=2/6; equal lengths -> BP=1; bleu = (p1*p2*p3*p4)^(1/4)
    b = bleu(
        ["the quick brown fox jumps over the lazy dog"],
        ["the quick brown fox jumped over the lazy dog"],
    )
    assert b["bleu"] == pytest.approx((8 / 9 * 6 / 8 * 4 / 7 * 2 / 6) ** 0.25)

    # multi-reference corpus case from the HF bleu docs -> 1.0 (clip
    # counts merge with max over refs; BP uses min ref length 2+3=5 < 7)
    b = bleu(
        ["hello there general kenobi", "foo bar foobar"],
        [["hello there general kenobi", "hello there"], ["foo bar foobar"]],
    )
    assert b["bleu"] == pytest.approx(1.0)

    # Papineni clipping example: 'the'*7 vs 'the cat is on the mat' ->
    # clipped unigram precision 2/7 (at max_n=1; 4-gram bleu is 0)
    assert bleu(["the the the the the the the"], ["the cat is on the mat"],
                max_n=1)["bleu"] == pytest.approx(2 / 7)
    assert bleu(["the the the the the the the"],
                ["the cat is on the mat"])["bleu"] == 0.0

    # brevity penalty: 2-token pred vs 4-token ref, perfect unigrams ->
    # BP = exp(1 - 4/2) = e^-1
    import math

    assert bleu(["the cat"], ["the cat is here"], max_n=1)["bleu"] == (
        pytest.approx(math.exp(-1.0)))

    # documented tokenizer delta vs tokenizer_13a: we lowercase (case-
    # insensitive match -> 1.0); 13a preserves case and would score 0
    assert bleu(["The Cat Sat Down"], ["the cat sat down"])["bleu"] == (
        pytest.approx(1.0))


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
