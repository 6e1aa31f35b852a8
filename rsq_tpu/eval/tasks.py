"""Evaluation task harness: zero-shot loglikelihood tasks + long-context
benchmarks + metrics.

Replaces the reference's external evaluation stack with native
implementations (SURVEY.md §2.3):
- lm-eval-style multiple-choice scoring (acc / acc_norm, the metric-key
  priority + acc_avg aggregation of fake_quant/main.py:196-227) without the
  lm-eval pip dependency; dataset adapters load HF datasets when available.
- LongEval "lines" — the synthetic long-range retrieval task, generated
  locally (qllm-eval longeval/utils.py:455-520 `generate_lines_testcases`)
  and scored like `test_lines_one_sample`.
- Lost-in-the-Middle — gold document at a controlled position among
  distractors (main_litm_new.py:72-78 document shuffling), synthesized
  locally.
- LEval-style exam_eval (option-letter matching) and the chrF metric used
  by LongCodeArena (evaluate_new.py ChrF), implemented directly.

Tasks talk to models through two callables:
  score_fn(context_ids, continuation_ids) -> float total logprob
  generate_fn(prompt_text, max_new_tokens) -> str
so they run against the fake-quant model, the serving engine, or any mock.
"""

from __future__ import annotations

import dataclasses
import re
from collections import Counter

import numpy as np


# ---------------------------------------------------------------------------
# Loglikelihood scoring against our models
# ---------------------------------------------------------------------------

def make_score_fn(params, cfg, policy):
    """Sum log p(continuation | context) using the fake-quant forward."""
    import jax
    import jax.numpy as jnp
    from rsq_tpu.models import llama as M

    @jax.jit
    def _logprobs(ids):
        logits = M.forward(params, ids[None], cfg, policy)[0]
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    def score(context_ids, continuation_ids):
        ids = np.concatenate([context_ids, continuation_ids]).astype(np.int32)
        lp = np.asarray(_logprobs(np.asarray(ids)))
        total = 0.0
        start = len(context_ids)
        for i, tok in enumerate(continuation_ids):
            total += float(lp[start + i - 1, tok])
        return total

    return score


@dataclasses.dataclass
class MCExample:
    context_ids: np.ndarray              # token ids
    choices_ids: list                     # list of token-id arrays
    gold: int
    choices_bytes: list | None = None    # utf-8 byte length per choice


def eval_multiple_choice(score_fn, examples) -> dict:
    """acc = argmax total logprob; acc_norm = argmax logprob normalized by
    the continuation's utf-8 BYTE length (lm-eval's byte_length convention,
    so numbers are comparable with published lm-eval results). Examples
    built without choice text fall back to token-count normalization."""
    correct = correct_norm = 0
    for ex in examples:
        scores = [score_fn(ex.context_ids, c) for c in ex.choices_ids]
        if ex.choices_bytes is not None:
            lens = ex.choices_bytes
        else:
            lens = [len(c) for c in ex.choices_ids]
        norm = [s / max(ln, 1) for s, ln in zip(scores, lens)]
        correct += int(int(np.argmax(scores)) == ex.gold)
        correct_norm += int(int(np.argmax(norm)) == ex.gold)
    n = len(examples)
    return {"acc": correct / n, "acc_norm": correct_norm / n, "n": n}


METRIC_KEY_ORDER = [
    "acc_norm,none", "acc,none", "exact_match,flexible-extract",
    "exact_match,none", "exact,none", "exact_match,get-answer",
    "exact_match,remove_whitespace",
]


def aggregate_results(results: dict) -> dict:
    """Metric-key priority + acc_avg (fake_quant/main.py:208-227)."""
    def get_number(res):
        for key in METRIC_KEY_ORDER:
            if key in res:
                return res[key]
        for key in ("acc_norm", "acc", "exact_match"):
            if key in res:
                return res[key]
        raise KeyError(f"no known metric in {sorted(res)}")

    vals = {task: round(get_number(r), 4) for task, r in results.items()}
    vals["acc_avg"] = round(sum(vals.values()) / len(vals), 4)
    return vals


# ---------------------------------------------------------------------------
# LongEval "lines"
# ---------------------------------------------------------------------------

LINES_HEADER = (
    "Below is a record of lines I want you to remember. "
    "Each line begins with 'line <line index>' and contains "
    "a '<REGISTER_CONTENT>' at the end of the line as a numerical value. "
    "For each line index, memorize its corresponding <REGISTER_CONTENT>. At "
    "the end of the record, I will ask you to retrieve the corresponding "
    "<REGISTER_CONTENT> of a certain line index. Now the record start:\n\n")


def generate_lines_case(num_lines: int, rng) -> dict:
    values = [int(rng.integers(1, 50000)) for _ in range(num_lines)]
    body = "".join(
        f"line {i + 1}: REGISTER_CONTENT is <{values[i]}>\n"
        for i in range(num_lines))
    ask = int(rng.integers(1, num_lines + 1))
    prompt = (LINES_HEADER + body +
              f"\nNow the record is over. Tell me what is the "
              f"<REGISTER_CONTENT> in line {ask}? I need the number.")
    return {"prompt": prompt, "expected_number": values[ask - 1],
            "random_idx": ask, "num_lines": num_lines}


def score_lines_response(case: dict, response: str) -> bool:
    """Correct iff the expected number appears in the response
    (test_lines_one_sample semantics)."""
    nums = re.findall(r"\d+", response)
    return str(case["expected_number"]) in nums


def run_longeval_lines(generate_fn, num_lines: int, num_cases: int = 10,
                       seed: int = 0, max_new_tokens: int = 32) -> dict:
    rng = np.random.default_rng(seed)
    cases = [generate_lines_case(num_lines, rng) for _ in range(num_cases)]
    correct = sum(
        score_lines_response(c, generate_fn(c["prompt"], max_new_tokens))
        for c in cases)
    return {"accuracy": correct / num_cases, "num_lines": num_lines,
            "n": num_cases}


# ---------------------------------------------------------------------------
# Lost in the Middle
# ---------------------------------------------------------------------------

_WORDS = ("system quantum ledger harbor velvet meadow copper lantern summit "
          "breeze anchor marble canyon ember willow frost").split()


def generate_litm_case(num_docs: int, gold_position: int, rng) -> dict:
    """Question answering over `num_docs` documents with the answer-bearing
    document placed at `gold_position` (0-based)."""
    secret = f"{int(rng.integers(10000, 99999))}"
    topic = _WORDS[int(rng.integers(0, len(_WORDS)))]
    docs = []
    for i in range(num_docs):
        words = rng.choice(_WORDS, size=24)
        docs.append(f"Document [{i + 1}](Title: note {i + 1}) "
                    + " ".join(words) + ".")
    gold = (f"Document [{gold_position + 1}](Title: {topic} registry) "
            f"The registered access code for the {topic} project is {secret}.")
    docs[gold_position] = gold
    question = f"What is the registered access code for the {topic} project?"
    prompt = ("Write a high-quality answer for the given question using only "
              "the provided search results.\n\n" + "\n".join(docs) +
              f"\n\nQuestion: {question}\nAnswer:")
    return {"prompt": prompt, "answer": secret,
            "gold_position": gold_position}


def run_litm(generate_fn, num_docs: int = 30, gold_position: int = 0,
             num_cases: int = 10, seed: int = 0,
             max_new_tokens: int = 24) -> dict:
    rng = np.random.default_rng(seed)
    correct = 0
    for _ in range(num_cases):
        case = generate_litm_case(num_docs, gold_position, rng)
        resp = generate_fn(case["prompt"], max_new_tokens)
        correct += int(case["answer"] in resp)
    return {"accuracy": correct / num_cases, "gold_position": gold_position,
            "num_docs": num_docs, "n": num_cases}


# ---------------------------------------------------------------------------
# Generative exact-match (gsm8k-style "flexible extract")
# ---------------------------------------------------------------------------

def extract_final_number(text: str) -> str | None:
    """Last number in the response (lm-eval's flexible-extract filter used
    by gsm8k_cot_llama; additional_short_eval.sh:39-77)."""
    nums = re.findall(r"-?\$?[\d,]*\.?\d+", text.replace(",", ""))
    if not nums:
        return None
    return nums[-1].lstrip("$")


def run_generative_exact_match(generate_fn, rows, max_new_tokens: int = 256,
                               extract=extract_final_number) -> dict:
    """rows: [{"prompt", "answer"}]. Accuracy by extracted-answer equality
    (exact_match,flexible-extract)."""
    correct = 0
    for r in rows:
        resp = generate_fn(r["prompt"], max_new_tokens)
        pred = extract(resp)
        correct += int(pred is not None
                       and str(pred) == str(r["answer"]).strip())
    return {"exact_match": correct / max(len(rows), 1), "n": len(rows)}


# ---------------------------------------------------------------------------
# LEval exam_eval + chrF
# ---------------------------------------------------------------------------

def exam_eval_match(response: str, gold_option: str) -> bool:
    """First option letter (A-D) found in the response vs gold (LEval
    exam_eval convention)."""
    m = re.search(r"\b([ABCD])\b", response.strip().upper())
    return bool(m and m.group(1) == gold_option.upper())


def chrf(reference: str, hypothesis: str, n: int = 6, beta: float = 2.0) -> float:
    """Character n-gram F-score (chrF), the LongCodeArena metric."""
    if not hypothesis or not reference:
        return 0.0
    precisions, recalls = [], []
    for order in range(1, n + 1):
        ref_grams = Counter(reference[i:i + order]
                            for i in range(len(reference) - order + 1))
        hyp_grams = Counter(hypothesis[i:i + order]
                            for i in range(len(hypothesis) - order + 1))
        if not ref_grams or not hyp_grams:
            continue
        overlap = sum((ref_grams & hyp_grams).values())
        precisions.append(overlap / max(sum(hyp_grams.values()), 1))
        recalls.append(overlap / max(sum(ref_grams.values()), 1))
    if not precisions:
        return 0.0
    p = float(np.mean(precisions))
    r = float(np.mean(recalls))
    if p + r == 0:
        return 0.0
    b2 = beta * beta
    return (1 + b2) * p * r / (b2 * p + r)


# ---------------------------------------------------------------------------
# HF dataset adapters (used when the datasets cache / network is available)
# ---------------------------------------------------------------------------

def _tok(tokenizer, text):
    return np.asarray(tokenizer(text, add_special_tokens=False).input_ids,
                      dtype=np.int32)


def load_mc_task(name: str, tokenizer, limit: int | None = None):
    """piqa / hellaswag / arc_easy / arc_challenge / winogrande ->
    list[MCExample]. Requires HF datasets availability."""
    import datasets as hfds
    if name == "piqa":
        ds = hfds.load_dataset("piqa", split="validation")
        rows = [(r["goal"] + " ", [r["sol1"], r["sol2"]], r["label"])
                for r in ds]
    elif name == "hellaswag":
        ds = hfds.load_dataset("hellaswag", split="validation")
        rows = [(r["ctx"] + " ", r["endings"], int(r["label"])) for r in ds]
    elif name in ("arc_easy", "arc_challenge"):
        sub = "ARC-Easy" if name == "arc_easy" else "ARC-Challenge"
        ds = hfds.load_dataset("ai2_arc", sub, split="validation")
        rows = []
        for r in ds:
            labels = r["choices"]["label"]
            if r["answerKey"] not in labels:
                continue
            rows.append((r["question"] + " ", r["choices"]["text"],
                         labels.index(r["answerKey"])))
    elif name == "winogrande":
        ds = hfds.load_dataset("winogrande", "winogrande_xl",
                               split="validation")
        rows = []
        for r in ds:
            ctx, _, tail = r["sentence"].partition("_")
            rows.append((ctx, [r["option1"] + tail, r["option2"] + tail],
                         int(r["answer"]) - 1))
    else:
        raise ValueError(f"unknown task {name}")
    if limit:
        rows = rows[:limit]
    return [MCExample(_tok(tokenizer, c),
                      [_tok(tokenizer, ch) for ch in chs], g,
                      choices_bytes=[len(ch.encode("utf-8")) for ch in chs])
            for c, chs, g in rows]
