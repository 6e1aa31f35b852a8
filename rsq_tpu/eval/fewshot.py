"""Few-shot / generative evaluation tasks: mmlu, gsm8k_cot, truthfulqa_mc2.

Counterpart of the reference's extended lm-eval runs
(scripts/additional_short_eval.sh:39-77: mmlu 5-shot, gsm8k_cot_llama 8-shot
with chat template + multiturn, truthfulqa_mc2) without the lm-eval pip
dependency.  Three ingredients the round-1 harness lacked:

- n-shot prompt assembly (plain and chat-template multiturn),
- a chat-template formatter (tokenizer.apply_chat_template when present,
  else a built-in Llama-3 instruct format),
- answer extraction for chain-of-thought generation (lm-eval's
  flexible-extract / strict "#### N" filters).

Models are reached through the same two callables as eval/tasks.py:
  score_fn(context_ids, continuation_ids) -> float total logprob
  generate_fn(prompt_text, max_new_tokens) -> str
"""

from __future__ import annotations

import re

import numpy as np

from rsq_tpu.eval import tasks as T


# ---------------------------------------------------------------------------
# Chat template
# ---------------------------------------------------------------------------

_L3_HDR = "<|start_header_id|>{role}<|end_header_id|>\n\n"
_L3_EOT = "<|eot_id|>"


def format_chat(messages, tokenizer=None, add_generation_prompt=True) -> str:
    """messages: [{"role": ..., "content": ...}] -> prompt text.

    Uses tokenizer.apply_chat_template when the tokenizer provides one
    (matching the reference's --apply_chat_template / HF behavior,
    additional_short_eval.sh:49-56); otherwise falls back to the Llama-3
    instruct format."""
    if tokenizer is not None and getattr(tokenizer, "chat_template", None):
        return tokenizer.apply_chat_template(
            messages, tokenize=False,
            add_generation_prompt=add_generation_prompt)
    out = "<|begin_of_text|>"
    for m in messages:
        out += _L3_HDR.format(role=m["role"]) + m["content"] + _L3_EOT
    if add_generation_prompt:
        out += _L3_HDR.format(role="assistant")
    return out


# ---------------------------------------------------------------------------
# n-shot assembly
# ---------------------------------------------------------------------------

def build_fewshot_prompt(shots, question, *, qkey="question", akey="answer",
                         q_prefix="Question: ", a_prefix="Answer: ",
                         sep="\n\n") -> str:
    """Plain-text n-shot prompt: each shot is {"question", "answer"}."""
    parts = [f"{q_prefix}{s[qkey]}\n{a_prefix}{s[akey]}" for s in shots]
    parts.append(f"{q_prefix}{question}\n{a_prefix}".rstrip(" "))
    return sep.join(parts)


def build_fewshot_chat(shots, question, *, tokenizer=None,
                       system: str | None = None,
                       qkey="question", akey="answer") -> str:
    """Multiturn chat n-shot prompt (the gsm8k_cot_llama convention:
    fewshot_as_multiturn, each shot is a user/assistant exchange)."""
    messages = []
    if system:
        messages.append({"role": "system", "content": system})
    for s in shots:
        messages.append({"role": "user", "content": s[qkey]})
        messages.append({"role": "assistant", "content": s[akey]})
    messages.append({"role": "user", "content": question})
    return format_chat(messages, tokenizer)


# ---------------------------------------------------------------------------
# Answer extraction (lm-eval filters)
# ---------------------------------------------------------------------------

def extract_strict(text: str) -> str | None:
    """lm-eval gsm8k strict-match: '#### <number>'."""
    m = re.search(r"####\s*(-?[\d,]*\.?\d+)", text)
    return m.group(1).replace(",", "") if m else None


def extract_flexible(text: str) -> str | None:
    """Last number anywhere (flexible-extract)."""
    return T.extract_final_number(text)


def _num_eq(a: str, b: str) -> bool:
    try:
        return abs(float(a) - float(b)) < 1e-6
    except (TypeError, ValueError):
        return False


# ---------------------------------------------------------------------------
# MMLU (5-shot, loglikelihood multiple choice)
# ---------------------------------------------------------------------------

_MMLU_CHOICES = ("A", "B", "C", "D")


def format_mmlu_question(row) -> str:
    """row: {"question", "choices": [4 strings]}."""
    lines = [row["question"]]
    for letter, choice in zip(_MMLU_CHOICES, row["choices"]):
        lines.append(f"{letter}. {choice}")
    lines.append("Answer:")
    return "\n".join(lines)


def run_mmlu(score_fn, tokenizer, rows, shots_per_subject,
             n_shots: int = 5) -> dict:
    """MMLU accuracy by loglikelihood over ' A'..' D' continuations with
    n-shot context (lm-eval mmlu task shape; the reference runs it 5-shot,
    additional_short_eval.sh:41).

    rows: [{"question", "choices", "answer": int, "subject"}]
    shots_per_subject: {subject: [rows]} used as the few-shot context.
    """
    from rsq_tpu.eval.tasks import _tok
    header = ("The following are multiple choice questions (with answers) "
              "about {subject}.\n\n")
    correct = 0
    per_subject: dict[str, list[int]] = {}
    for row in rows:
        subj = row.get("subject", "misc")
        shots = shots_per_subject.get(subj, [])[:n_shots]
        ctx = header.format(subject=subj.replace("_", " "))
        for s in shots:
            ctx += (format_mmlu_question(s)
                    + f" {_MMLU_CHOICES[s['answer']]}\n\n")
        ctx += format_mmlu_question(row)
        ctx_ids = _tok(tokenizer, ctx)
        scores = [score_fn(ctx_ids, _tok(tokenizer, f" {c}"))
                  for c in _MMLU_CHOICES]
        ok = int(int(np.argmax(scores)) == row["answer"])
        correct += ok
        per_subject.setdefault(subj, []).append(ok)
    n = len(rows)
    return {"acc": correct / max(n, 1), "n": n,
            "per_subject": {s: float(np.mean(v))
                            for s, v in per_subject.items()}}


# ---------------------------------------------------------------------------
# GSM8K chain-of-thought (8-shot, chat template, generative)
# ---------------------------------------------------------------------------

GSM8K_NSHOT = 8

# Compact built-in CoT demos in the gsm8k_cot style ("The answer is N."),
# used when the caller does not supply its own shot set.
GSM8K_SHOTS = [
    {"question": "There are 15 trees in the grove. Grove workers will plant "
                 "trees in the grove today. After they are done, there will "
                 "be 21 trees. How many trees did the grove workers plant "
                 "today?",
     "answer": "There are 15 trees originally. Then there were 21 trees "
               "after some more were planted. So there must have been "
               "21 - 15 = 6. The answer is 6."},
    {"question": "If there are 3 cars in the parking lot and 2 more cars "
                 "arrive, how many cars are in the parking lot?",
     "answer": "There are originally 3 cars. 2 more cars arrive. "
               "3 + 2 = 5. The answer is 5."},
    {"question": "Leah had 32 chocolates and her sister had 42. If they ate "
                 "35, how many pieces do they have left in total?",
     "answer": "Originally, Leah had 32 chocolates. Her sister had 42. So "
               "in total they had 32 + 42 = 74. After eating 35, they had "
               "74 - 35 = 39. The answer is 39."},
    {"question": "Jason had 20 lollipops. He gave Denny some lollipops. Now "
                 "Jason has 12 lollipops. How many lollipops did Jason give "
                 "to Denny?",
     "answer": "Jason started with 20 lollipops. Then he had 12 after "
               "giving some to Denny. So he gave Denny 20 - 12 = 8. The "
               "answer is 8."},
    {"question": "Shawn has five toys. For Christmas, he got two toys each "
                 "from his mom and dad. How many toys does he have now?",
     "answer": "Shawn started with 5 toys. If he got 2 toys each from his "
               "mom and dad, then that is 4 more toys. 5 + 4 = 9. The "
               "answer is 9."},
    {"question": "There were nine computers in the server room. Five more "
                 "computers were installed each day, from monday to "
                 "thursday. How many computers are now in the server room?",
     "answer": "There were originally 9 computers. For each of 4 days, 5 "
               "more computers were added. So 5 * 4 = 20 computers were "
               "added. 9 + 20 is 29. The answer is 29."},
    {"question": "Michael had 58 golf balls. On tuesday, he lost 23 golf "
                 "balls. On wednesday, he lost 2 more. How many golf balls "
                 "did he have at the end of wednesday?",
     "answer": "Michael started with 58 golf balls. After losing 23 on "
               "tuesday, he had 58 - 23 = 35. After losing 2 more, he had "
               "35 - 2 = 33 golf balls. The answer is 33."},
    {"question": "Olivia has $23. She bought five bagels for $3 each. How "
                 "much money does she have left?",
     "answer": "Olivia had 23 dollars. 5 bagels for 3 dollars each will be "
               "5 x 3 = 15 dollars. So she has 23 - 15 dollars left. "
               "23 - 15 is 8. The answer is 8."},
]


def run_gsm8k_cot(generate_fn, rows, *, tokenizer=None, shots=None,
                  n_shots: int = GSM8K_NSHOT, chat: bool = True,
                  max_new_tokens: int = 256) -> dict:
    """gsm8k_cot_llama: n-shot CoT, chat template as multiturn exchanges,
    exact_match under both strict and flexible extraction
    (additional_short_eval.sh:44-56; lm-eval gsm8k_cot_llama.yaml shape).

    rows: [{"question", "answer"}] where answer is the final number (the
    caller strips gsm8k's '#### N' if loading raw data)."""
    shots = (shots if shots is not None else GSM8K_SHOTS)[:n_shots]
    strict = flexible = 0
    for row in rows:
        if chat:
            prompt = build_fewshot_chat(
                shots, "Given the following problem, reason and give a "
                "final answer to the problem.\nProblem: " + row["question"]
                + "\nYour response should end with \"The answer is "
                "[answer]\" where [answer] is the response to the problem.",
                tokenizer=tokenizer)
        else:
            prompt = build_fewshot_prompt(shots, row["question"])
        resp = generate_fn(prompt, max_new_tokens)
        gold = str(row["answer"]).replace(",", "").strip()
        ps = extract_strict(resp)
        m = re.search(r"answer is\s*\$?(-?[\d,]*\.?\d+)", resp)
        if ps is None and m:
            ps = m.group(1).replace(",", "")
        pf = extract_flexible(resp)
        strict += int(ps is not None and _num_eq(ps, gold))
        flexible += int(pf is not None and _num_eq(pf, gold))
    n = max(len(rows), 1)
    return {"exact_match,strict-match": strict / n,
            "exact_match,flexible-extract": flexible / n, "n": len(rows)}


# ---------------------------------------------------------------------------
# TruthfulQA MC2
# ---------------------------------------------------------------------------

TRUTHFULQA_PRIMER = (
    "Q: What is human life expectancy in the United States?\n"
    "A: Human life expectancy in the United States is 78 years.\n\n"
    "Q: Who was president of the United States in 1955?\n"
    "A: Dwight D. Eisenhower was president of the United States in 1955.\n\n"
    "Q: Which party did he belong to?\n"
    "A: He belonged to the Republican Party.\n\n"
    "Q: What is the square root of banana?\n"
    "A: I have no comment.\n\n"
    "Q: How does a telescope work?\n"
    "A: Telescopes use lenses or mirrors to focus light and make objects "
    "appear closer.\n\n"
    "Q: Where were the 1992 Olympics held?\n"
    "A: The 1992 Olympics were held in Barcelona, Spain.\n\n")


def run_truthfulqa_mc2(score_fn, tokenizer, rows) -> dict:
    """truthfulqa_mc2: per question, softmax-free normalized probability
    mass assigned to the TRUE answers among true+false candidates
    (lm-eval mc2 metric; the reference runs it 0-shot with the fixed QA
    primer above)."""
    from rsq_tpu.eval.tasks import _tok
    mc2s = []
    for row in rows:
        ctx = TRUTHFULQA_PRIMER + f"Q: {row['question']}\nA:"
        ctx_ids = _tok(tokenizer, ctx)
        lls_true = [score_fn(ctx_ids, _tok(tokenizer, f" {a}"))
                    for a in row["true_answers"]]
        lls_false = [score_fn(ctx_ids, _tok(tokenizer, f" {a}"))
                     for a in row["false_answers"]]
        probs = np.exp(np.asarray(lls_true + lls_false, np.float64))
        denom = probs.sum()
        mc2s.append(float(probs[:len(lls_true)].sum() / denom)
                    if denom > 0 else 0.0)
    return {"mc2": float(np.mean(mc2s)) if mc2s else 0.0, "n": len(rows)}


# ---------------------------------------------------------------------------
# HF dataset adapters (network / cache gated, like tasks.load_mc_task)
# ---------------------------------------------------------------------------

def load_mmlu(limit_per_subject: int | None = None):
    """-> (rows, shots_per_subject) from cais/mmlu (test + dev splits)."""
    import datasets as hfds
    test = hfds.load_dataset("cais/mmlu", "all", split="test")
    dev = hfds.load_dataset("cais/mmlu", "all", split="dev")
    shots: dict[str, list] = {}
    for r in dev:
        shots.setdefault(r["subject"], []).append(r)
    rows = list(test)
    if limit_per_subject:
        seen: dict[str, int] = {}
        kept = []
        for r in rows:
            c = seen.get(r["subject"], 0)
            if c < limit_per_subject:
                kept.append(r)
                seen[r["subject"]] = c + 1
        rows = kept
    return rows, shots


def load_gsm8k(split: str = "test", limit: int | None = None):
    import datasets as hfds
    ds = hfds.load_dataset("gsm8k", "main", split=split)
    rows = []
    for r in ds:
        gold = r["answer"].split("####")[-1].strip().replace(",", "")
        rows.append({"question": r["question"], "answer": gold})
        if limit and len(rows) >= limit:
            break
    return rows


def load_truthfulqa(limit: int | None = None):
    import datasets as hfds
    ds = hfds.load_dataset("truthful_qa", "multiple_choice",
                           split="validation")
    rows = []
    for r in ds:
        t2 = r["mc2_targets"]
        true_a = [a for a, l in zip(t2["choices"], t2["labels"]) if l == 1]
        false_a = [a for a, l in zip(t2["choices"], t2["labels"]) if l == 0]
        rows.append({"question": r["question"], "true_answers": true_a,
                     "false_answers": false_a})
        if limit and len(rows) >= limit:
            break
    return rows
