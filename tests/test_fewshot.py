"""Few-shot generative eval: prompt assembly, extraction filters, task
runners against oracle score/generate functions (no network)."""

import numpy as np
import pytest

from rsq_tpu.eval import fewshot as F


class FakeTok:
    """Character-level tokenizer, lm-eval-adapter compatible."""
    chat_template = None

    def __call__(self, text, add_special_tokens=False, return_tensors=None):
        ids = np.asarray([ord(c) % 256 for c in text], np.int32)

        class R:
            input_ids = ids if return_tensors is None else ids[None]
        return R()


def test_format_chat_llama3_fallback():
    msgs = [{"role": "system", "content": "be brief"},
            {"role": "user", "content": "hi"}]
    out = F.format_chat(msgs, tokenizer=None)
    assert out.startswith("<|begin_of_text|>")
    assert "<|start_header_id|>system<|end_header_id|>" in out
    assert "be brief<|eot_id|>" in out
    # generation prompt opens an assistant turn at the end
    assert out.rstrip().endswith("<|start_header_id|>assistant<|end_header_id|>")


def test_format_chat_prefers_tokenizer_template():
    class Tok:
        chat_template = "x"

        def apply_chat_template(self, messages, tokenize,
                                add_generation_prompt):
            return "TEMPLATED:" + messages[-1]["content"]

    out = F.format_chat([{"role": "user", "content": "q"}], tokenizer=Tok())
    assert out == "TEMPLATED:q"


def test_build_fewshot_prompt_order_and_final_stub():
    shots = [{"question": "1+1?", "answer": "2"},
             {"question": "2+2?", "answer": "4"}]
    p = F.build_fewshot_prompt(shots, "3+3?")
    assert p.index("1+1?") < p.index("2+2?") < p.index("3+3?")
    assert p.endswith("Question: 3+3?\nAnswer:")


def test_build_fewshot_chat_multiturn():
    shots = [{"question": "q1", "answer": "a1"}]
    p = F.build_fewshot_chat(shots, "q2", tokenizer=None, system="sys")
    # one user/assistant exchange per shot, then the real question
    assert p.index("sys") < p.index("q1") < p.index("a1") < p.index("q2")


def test_extraction_filters():
    assert F.extract_strict("blah #### 42") == "42"
    assert F.extract_strict("#### 1,234") == "1234"
    assert F.extract_strict("no marker 42") is None
    assert F.extract_flexible("first 1 then 2 final 3.") == "3"


def test_mmlu_runner_oracle():
    # oracle scorer: continuation matching the gold letter scores highest
    rows = [{"question": "Q1", "choices": ["w", "x", "y", "z"], "answer": 2,
             "subject": "algebra"},
            {"question": "Q2", "choices": ["w", "x", "y", "z"], "answer": 0,
             "subject": "algebra"}]
    shots = {"algebra": [{"question": "S", "choices": list("abcd"),
                          "answer": 1}]}
    gold_by_q = {"Q1": " C", "Q2": " A"}
    tok = FakeTok()

    def score(ctx_ids, cont_ids):
        ctx = "".join(chr(i) for i in ctx_ids)
        cont = "".join(chr(i) for i in cont_ids)
        q = "Q1" if "Q1" in ctx else "Q2"
        # few-shot context must contain the shot and its gold letter
        assert "S" in ctx and "B" in ctx
        return 0.0 if cont == gold_by_q[q] else -10.0

    res = F.run_mmlu(score, tok, rows, shots)
    assert res["acc"] == 1.0
    assert res["per_subject"]["algebra"] == 1.0


def test_gsm8k_runner_strict_and_flexible():
    rows = [{"question": "What is 6*7?", "answer": "42"},
            {"question": "What is 10-1?", "answer": "9"}]

    def gen(prompt, max_new_tokens):
        # chat prompt contains built-in shots as multiturn exchanges
        assert "The answer is 6" in prompt
        if "6*7" in prompt:
            return "6*7 = 42. The answer is 42."
        return "10-1 = 8. The answer is 8."  # wrong

    res = F.run_gsm8k_cot(gen, rows, tokenizer=None)
    assert res["exact_match,strict-match"] == 0.5
    assert res["exact_match,flexible-extract"] == 0.5
    assert res["n"] == 2


def test_gsm8k_numeric_equality_not_string():
    rows = [{"question": "q", "answer": "42"}]
    res = F.run_gsm8k_cot(lambda p, m: "The answer is 42.0",
                          rows, tokenizer=None)
    assert res["exact_match,strict-match"] == 1.0


def test_truthfulqa_mc2_oracle():
    rows = [{"question": "Q", "true_answers": ["t1", "t2"],
             "false_answers": ["f1"]}]
    tok = FakeTok()

    def score(ctx_ids, cont_ids):
        cont = "".join(chr(i) for i in cont_ids)
        return 0.0 if "t" in cont else -np.inf

    res = F.run_truthfulqa_mc2(score, tok, rows)
    assert res["mc2"] == pytest.approx(1.0)

    def score_uniform(ctx_ids, cont_ids):
        return 0.0

    res = F.run_truthfulqa_mc2(score_uniform, tok, rows)
    assert res["mc2"] == pytest.approx(2.0 / 3.0)
