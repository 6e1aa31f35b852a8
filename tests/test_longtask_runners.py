"""Long-task runner tests with oracle/mock generate functions."""

import re

import numpy as np

from rsq_tpu.eval import longtask_runners as LR


def test_longeval_suite_oracle():
    def oracle(prompt, m):
        ask = int(re.search(r"in line (\d+)\?", prompt).group(1))
        return re.search(rf"line {ask}: REGISTER_CONTENT is <(\d+)>",
                         prompt).group(1)
    res = LR.run_longeval_suite(oracle, sub_tasks=(20, 40), num_cases=3)
    assert res["lines_20"]["accuracy"] == 1.0
    assert res["lines_40"]["accuracy"] == 1.0


def test_litm_suite_positions():
    def oracle(prompt, m):
        return re.search(r"access code for the \w+ project is (\d+)",
                         prompt).group(1)
    res = LR.run_litm_suite(oracle, positions=(0, 5, 9), num_docs=10,
                            num_cases=2)
    assert all(v["accuracy"] == 1.0 for v in res.values())


def test_leval_exam_runner():
    data = [{"input": "long document...",
             "instructions": ["Q1? A) x B) y", "Q2? A) x B) y"],
             "outputs": ["A", "B"]}]
    res = LR.run_leval_exam(lambda p, m: "A", data)
    assert res["exam_acc"] == 0.5 and res["n"] == 2


def test_icl_classification_runner():
    train = [{"text": "t1", "label": "alpha"}, {"text": "t2", "label": "beta"}]
    test = [{"text": "x1", "label": "alpha"}, {"text": "x2", "label": "beta"}]

    def model(prompt, m):
        return "alpha" if "x1" in prompt.split("sentence:")[-1] else "beta"

    res = LR.run_icl_classification(model, train, test, rounds=2)
    assert res["accuracy"] == 1.0
    assert res["num_labels"] == 2


def test_code_generation_runner():
    rows = [{"instruction": "write foo", "reference": "def foo(): return 1"}]
    res = LR.run_code_generation(lambda p, m: "def foo(): return 1", rows)
    assert res["chrf"] == 1.0
