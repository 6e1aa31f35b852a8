"""Evaluation-task harness tests (mock models validate scoring/parsing;
a tiny real model validates the score_fn plumbing)."""

import re

import jax
import numpy as np
import pytest

from rsq_tpu.eval import tasks as T
from rsq_tpu.models import llama as M
from rsq_tpu.models.config import ModelConfig
from rsq_tpu.models.policy import FP16


def test_longeval_lines_generation_and_scoring():
    rng = np.random.default_rng(0)
    case = T.generate_lines_case(50, rng)
    assert case["prompt"].count("REGISTER_CONTENT is") == 50
    assert f"line {case['random_idx']}:" in case["prompt"]
    assert T.score_lines_response(case, f"it is <{case['expected_number']}>")
    assert not T.score_lines_response(case, "it is <1>")


def test_longeval_lines_oracle_model():
    """A perfect retriever scores 100%, a broken one 0%."""
    def oracle(prompt, max_new_tokens):
        ask = int(re.search(r"in line (\d+)\?", prompt).group(1))
        m = re.search(rf"line {ask}: REGISTER_CONTENT is <(\d+)>", prompt)
        return m.group(1)

    res = T.run_longeval_lines(oracle, num_lines=30, num_cases=5)
    assert res["accuracy"] == 1.0
    res = T.run_longeval_lines(lambda p, m: "no idea", num_lines=30,
                               num_cases=5)
    assert res["accuracy"] == 0.0


def test_litm_generation_and_oracle():
    rng = np.random.default_rng(1)
    case = T.generate_litm_case(10, 4, rng)
    assert case["answer"] in case["prompt"]
    assert case["prompt"].count("Document [") == 10

    def oracle(prompt, max_new_tokens):
        m = re.search(r"access code for the (\w+) project is (\d+)", prompt)
        return m.group(2)

    res = T.run_litm(oracle, num_docs=10, gold_position=9, num_cases=4)
    assert res["accuracy"] == 1.0


def test_exam_eval_match():
    assert T.exam_eval_match("The answer is B", "b")
    assert T.exam_eval_match(" C) because...", "C")
    assert not T.exam_eval_match("The answer is B", "A")


def test_chrf_properties():
    assert T.chrf("abcdef", "abcdef") == pytest.approx(1.0)
    assert T.chrf("abcdef", "zzzzzz") == 0.0
    good = T.chrf("def foo(): return 1", "def foo(): return 2")
    bad = T.chrf("def foo(): return 1", "class Bar: pass")
    assert good > bad


def test_multiple_choice_scoring_with_mock():
    exs = [T.MCExample(np.array([1, 2]), [np.array([3]), np.array([4, 5])], 0),
           T.MCExample(np.array([1]), [np.array([6]), np.array([7])], 1)]

    def score(ctx, cont):
        # favor continuation containing token 3 or 7
        return 1.0 if (3 in cont or 7 in cont) else -1.0

    res = T.eval_multiple_choice(score, exs)
    assert res["acc"] == 1.0


def test_aggregate_results():
    out = T.aggregate_results({
        "piqa": {"acc_norm,none": 0.7, "acc,none": 0.6},
        "gsm8k": {"exact_match,flexible-extract": 0.3},
    })
    assert out["piqa"] == 0.7
    assert out["gsm8k"] == 0.3
    assert out["acc_avg"] == pytest.approx(0.5)


def test_score_fn_on_tiny_model():
    cfg = ModelConfig.tiny(num_layers=1)
    params = M.init_params(cfg, jax.random.PRNGKey(0), scale=0.05)
    score = T.make_score_fn(params, cfg, FP16)
    ctx = np.array([1, 2, 3], dtype=np.int32)
    s1 = score(ctx, np.array([4], dtype=np.int32))
    s2 = score(ctx, np.array([4, 5], dtype=np.int32))
    assert np.isfinite(s1) and np.isfinite(s2)
    assert s2 < s1  # adding a token can only lower total logprob... ->
    # (strictly: logprob of 2 tokens <= logprob of 1st token alone)


def test_extract_final_number():
    assert T.extract_final_number("the answer is 42.") == "42"
    assert T.extract_final_number("costs $1,234.50 total") == "1234.50"
    assert T.extract_final_number("-7 then 12") == "12"
    assert T.extract_final_number("no digits") is None


def test_generative_exact_match():
    rows = [{"prompt": "2+2?", "answer": "4"},
            {"prompt": "3+3?", "answer": "6"}]

    def model(p, m):
        return "thinking... the answer is 4" if "2+2" in p else "5"

    res = T.run_generative_exact_match(model, rows)
    assert res["exact_match"] == 0.5
