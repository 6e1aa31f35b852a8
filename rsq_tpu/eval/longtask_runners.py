"""Long-context benchmark runners.

Thin task runners replacing the reference's vendored harness entry points
(SURVEY.md §2.3): each takes a `generate_fn(prompt, max_new_tokens) -> str`
(build one with `make_generate_fn`) and a dataset source. LongEval lines
and Lost-in-the-Middle are generated locally (eval/tasks.py); LEval,
LongICLBench (TACRED/Banking77) and LongCodeArena load their datasets from
the HF cache or a local JSONL path when available.
"""

from __future__ import annotations

import json
import logging
import os

import numpy as np

from rsq_tpu.eval import tasks as T

logger = logging.getLogger(__name__)


def make_generate_fn(sparams, sc, tokenizer, num_slots: int = 1):
    """Greedy text generation through the serving engine."""
    import jax.numpy as jnp
    from rsq_tpu.serving import model as S

    def generate(prompt: str, max_new_tokens: int) -> str:
        ids = tokenizer(prompt, return_tensors="np").input_ids[0]
        ids = ids[-(sc.max_seq - max_new_tokens):]
        toks = S.generate(sparams, jnp.asarray(ids[None]), sc,
                          max_new_tokens=max_new_tokens)
        return tokenizer.decode(np.asarray(toks)[0])

    return generate


def run_longeval_suite(generate_fn, sub_tasks=(300, 460, 620),
                       num_cases: int = 50, seed: int = 0) -> dict:
    """LongEval 'lines' at the reference's sub-task sizes
    (additional_long_eval.sh:24-32)."""
    return {f"lines_{n}": T.run_longeval_lines(generate_fn, n, num_cases,
                                               seed)
            for n in sub_tasks}


def run_litm_suite(generate_fn, positions=(0, 14, 29), num_docs: int = 30,
                   num_cases: int = 50, seed: int = 0) -> dict:
    """Lost-in-the-Middle at gold positions 0/14/29 of 30
    (additional_long_eval.sh:91-100)."""
    return {f"litm_pos{p}": T.run_litm(generate_fn, num_docs, p, num_cases,
                                       seed)
            for p in positions}


def _load_jsonl(path: str) -> list[dict]:
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def run_leval_exam(generate_fn, data, max_new_tokens: int = 16) -> dict:
    """LEval closed-ended exam tasks: rows need {"instructions": [...],
    "outputs": [...], "input": long_doc}; accuracy by option-letter match
    (LEval exam_eval; Baselines/llama3-instruct-test-new.py)."""
    correct = total = 0
    for row in data:
        doc = row.get("input", "")
        for instr, gold in zip(row["instructions"], row["outputs"]):
            prompt = (f"{doc}\n\n{instr}\n"
                      "Answer with the option letter (A, B, C or D).\nAnswer:")
            resp = generate_fn(prompt, max_new_tokens)
            correct += int(T.exam_eval_match(resp, str(gold)[:1]))
            total += 1
    return {"exam_acc": correct / max(total, 1), "n": total}


def run_icl_classification(generate_fn, train_rows, test_rows,
                           rounds: int = 1, max_new_tokens: int = 8) -> dict:
    """Many-shot in-context label classification (LongICLBench TACRED /
    Banking77 shape): rows are {"text", "label"}; `rounds` repeats the full
    label-covering demo set (my_tacred_infer_chat_new.py)."""
    labels = sorted({r["label"] for r in train_rows})
    demos = "".join(f"sentence: {r['text']}\nlabel: {r['label']}\n\n"
                    for _ in range(rounds) for r in train_rows)
    correct = 0
    for r in test_rows:
        prompt = demos + f"sentence: {r['text']}\nlabel:"
        resp = generate_fn(prompt, max_new_tokens).strip().lower()
        pred = next((l for l in labels if l.lower() in resp), None)
        correct += int(pred == r["label"])
    return {"accuracy": correct / max(len(test_rows), 1),
            "n": len(test_rows), "num_labels": len(labels)}


def run_code_generation(generate_fn, rows, max_new_tokens: int = 256) -> dict:
    """Library-based code generation scored by chrF (LongCodeArena
    evaluate_new.py): rows are {"instruction", "reference"}."""
    scores = []
    for r in rows:
        resp = generate_fn(r["instruction"], max_new_tokens)
        scores.append(T.chrf(r["reference"], resp))
    return {"chrf": float(np.mean(scores)) if scores else 0.0,
            "n": len(scores)}
