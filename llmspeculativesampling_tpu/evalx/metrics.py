"""Evaluation metrics (L0/L4).

Behavioral parity with the reference:
  * SQuAD-style exact match — /root/reference/sampling/utils.py:8-49
    (lowercase, strip punctuation, drop articles, collapse whitespace; max
    over ground truths; percentage over examples).
  * Spider execution accuracy — utils.py:51-93 (run predicted vs gold SQL
    on the per-db sqlite file; compare result sets as order-insensitive
    sets of per-row sorted stringified tuples; gold errors count as
    exceptions excluded from the denominator).
  * quality "prob score" — evaluation.py:109-132 (mean target log-prob of
    the generated continuation) — computed with the JAX target model.
  * ROUGE-1/2/L and corpus BLEU — the reference shells out to HF
    ``evaluate`` (network-dependent, evaluation.py:377 / evaluate_
    translate.py:220); re-implemented locally so the harness runs with
    zero egress. Parity with the canonical implementations (pinned by
    hand-verified goldens in tests/test_evalx.py):

    ROUGE vs ``rouge_score`` (what ``evaluate.load('rouge')`` wraps, at
    its default ``use_stemmer=False``): per-example rouge1/rouge2
    F-measure and sentence-level rougeL are EXACT matches — the
    tokenizer (lowercase, keep [a-z0-9]+ runs) is the same function.
    Known deltas: (a) no Porter stemming (rouge_score applies it only
    under the non-default ``use_stemmer=True``); (b) corpus aggregation
    is the plain mean, where HF's default ``use_aggregator=True``
    reports a bootstrap-resampled mid estimate whose expectation is the
    same mean; (c) rougeLsum (newline-split summary-level LCS) is not
    implemented — the reference only consumes rouge1/2/L.

    BLEU vs HF ``evaluate.load('bleu')`` (the Google NMT
    ``compute_bleu``, smooth=False): same clipped modified n-gram
    precisions (counts clipped against the per-position MAX over
    references), same geometric mean over orders 1..4 with
    zero-on-any-zero-precision, same brevity penalty against the
    per-example MIN reference length. Known delta: tokenization — HF
    feeds ``tokenizer_13a`` output (case-preserving, punctuation split
    into standalone tokens), ours lowercases and drops punctuation, so
    scores differ on mixed-case or punctuation-bearing text (equal on
    lowercased text without punctuation; the case delta is covered by a
    test).
"""

from __future__ import annotations

import math
import re
import sqlite3
import string
from collections import Counter
from typing import Iterable, List, Sequence

import numpy as np

_ARTICLES = re.compile(r"\b(a|an|the)\b")
_PUNCT = set(string.punctuation)


def normalize_answer(s: str) -> str:
    s = s.lower()
    s = "".join(ch for ch in s if ch not in _PUNCT)
    s = _ARTICLES.sub(" ", s)
    return " ".join(s.split())


def exact_match_score(prediction: str, ground_truth: str) -> bool:
    return normalize_answer(prediction) == normalize_answer(ground_truth)


def exact_match_references(predictions: Sequence[str], references: Sequence[Iterable[str]]):
    em = sum(
        max(exact_match_score(pred, gt) for gt in refs)
        for pred, refs in zip(predictions, references)
    )
    return {"exact_match": 100.0 * em / len(predictions)}


def _result_set(rows):
    return {tuple(sorted(str(c) for c in row)) for row in rows}


def execution_accuracy(db_path: str, pred_sql: str, gold_sql: str) -> float:
    """-1: gold errored (exception); 0: prediction errored/mismatch; 1: match."""
    conn = sqlite3.connect(db_path)
    conn.text_factory = bytes
    cur = conn.cursor()
    try:
        gold = cur.execute(gold_sql).fetchall()
    except Exception:
        return -1.0
    try:
        pred = cur.execute(pred_sql).fetchall()
    except Exception:
        return 0.0
    return float(_result_set(pred) == _result_set(gold))


def execution_accuracy_references(
    predictions: Sequence[str], references: Sequence[str], db_root: str = "./spider/spider/database"
):
    """references entries are '<db>[SQL]<gold sql>' like the reference."""
    em, exceptions = 0.0, 0
    for pred, ref in zip(predictions, references):
        db, gold = ref.split("[SQL]", 1)
        acc = execution_accuracy(f"{db_root}/{db}/{db}.sqlite", pred, gold)
        if acc >= 0:
            em += acc
        else:
            exceptions += 1
    denom = max(len(predictions) - exceptions, 1)
    return {"execution accuracy": 100.0 * em / denom, "exception": exceptions}


# ------------------------------------------------------------------- ROUGE
def _lcs_len(a: List[str], b: List[str]) -> int:
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0] * (len(b) + 1)
        for j, y in enumerate(b, 1):
            cur[j] = prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1])
        prev = cur
    return prev[-1]


def _tokenize(text: str) -> List[str]:
    return re.findall(r"[a-z0-9]+", text.lower())


def _ngram_f1(pred: List[str], ref: List[str], n: int) -> float:
    pc = Counter(tuple(pred[i : i + n]) for i in range(len(pred) - n + 1))
    rc = Counter(tuple(ref[i : i + n]) for i in range(len(ref) - n + 1))
    overlap = sum((pc & rc).values())
    if overlap == 0:
        return 0.0
    p = overlap / max(sum(pc.values()), 1)
    r = overlap / max(sum(rc.values()), 1)
    return 2 * p * r / (p + r)


def rouge(predictions: Sequence[str], references: Sequence[str]):
    r1, r2, rl = [], [], []
    for pred, ref in zip(predictions, references):
        pt, rt = _tokenize(pred), _tokenize(ref)
        r1.append(_ngram_f1(pt, rt, 1))
        r2.append(_ngram_f1(pt, rt, 2))
        lcs = _lcs_len(pt, rt)
        if lcs == 0:
            rl.append(0.0)
        else:
            p, r = lcs / max(len(pt), 1), lcs / max(len(rt), 1)
            rl.append(2 * p * r / (p + r))
    return {
        "rouge1": float(np.mean(r1)) if r1 else 0.0,
        "rouge2": float(np.mean(r2)) if r2 else 0.0,
        "rougeL": float(np.mean(rl)) if rl else 0.0,
    }


# -------------------------------------------------------------------- BLEU
def bleu(predictions: Sequence[str], references: Sequence, max_n: int = 4):
    """Corpus BLEU (Papineni et al.), the HF ``bleu`` metric's semantics
    (Google NMT ``compute_bleu``, smooth=False): clipped n-gram counts
    merged with max over the example's references, geometric mean of the
    four modified precisions (zero if any order has zero matches), and a
    brevity penalty against the corpus sum of per-example MIN reference
    lengths. ``references[i]`` may be one string or a list of strings."""
    pred_toks = [_tokenize(p) for p in predictions]
    ref_toks = [
        [_tokenize(r)] if isinstance(r, str) else [_tokenize(x) for x in r]
        for r in references
    ]
    p_logs = []
    for n in range(1, max_n + 1):
        match, total = 0, 0
        for pt, rts in zip(pred_toks, ref_toks):
            pc = Counter(tuple(pt[i : i + n]) for i in range(len(pt) - n + 1))
            rc = Counter()
            for rt in rts:
                rc |= Counter(tuple(rt[i : i + n]) for i in range(len(rt) - n + 1))
            match += sum((pc & rc).values())
            total += max(sum(pc.values()), 0)
        if total == 0 or match == 0:
            return {"bleu": 0.0}
        p_logs.append(math.log(match / total))
    pred_len = sum(len(t) for t in pred_toks)
    ref_len = sum(min(len(rt) for rt in rts) for rts in ref_toks)
    bp = 1.0 if pred_len > ref_len else math.exp(1 - ref_len / max(pred_len, 1))
    return {"bleu": float(bp * math.exp(sum(p_logs) / max_n))}


# -------------------------------------------------------- target prob score
def get_score(bundle, params, output_ids: np.ndarray, prompt_len: int, max_len: int = 2048):
    """Mean target log-prob of the generated continuation
    (reference evaluation.py:109-132)."""
    import jax
    import jax.numpy as jnp

    from ..engine.types import pad_prompt

    ids, total = pad_prompt(output_ids, 64)
    cache = bundle.make_cache(1, ids.shape[1])
    logits, _ = bundle.forward(params, bundle.cfg, jnp.asarray(ids), cache)
    logp = jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1)
    nxt = jnp.asarray(ids[0])
    rows = jnp.arange(ids.shape[1] - 1)
    token_logp = logp[rows, nxt[1:]]
    mask = (rows >= prompt_len - 1) & (rows < total - 1)
    return float(jnp.sum(jnp.where(mask, token_logp, 0.0)) / jnp.maximum(jnp.sum(mask), 1))
