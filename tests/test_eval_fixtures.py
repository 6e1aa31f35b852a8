"""Eval-comparability fixtures (VERDICT r3 next-round #9).

Two layers of certification that the native harness matches lm-eval's
documented metric definitions (the reference reports through
lm_eval.simple_evaluate, fake_quant/main.py:196-204):

1. HAND-COMPUTED metric worked examples: acc / acc_norm (byte-length
   normalization) and truthfulqa mc2 evaluated against closed-form
   arithmetic on fixed loglikelihoods — no model, no tolerance.
2. FROZEN REAL-FORMAT rows: genuine task-formatted items (gsm8k train/test
   rows as published; an MMLU dev row; Llama-3 chat turns) driven through
   prompt assembly and answer-extraction, asserting the EXACT prompt
   strings lm-eval's task configs document — so format bugs surface
   without network access.
"""

import numpy as np

from rsq_tpu.eval import fewshot as F
from rsq_tpu.eval import tasks as T


class ByteTok:
    """Deterministic offline tokenizer: one token per byte."""

    def __call__(self, text, add_special_tokens=False):
        class R:
            input_ids = list(text.encode("utf-8"))
        return R()


# ---------------------------------------------------------------------------
# 1. Hand-computed metric definitions
# ---------------------------------------------------------------------------

def test_acc_and_acc_norm_worked_example():
    """lm-eval definitions: acc = argmax sum-logprob; acc_norm = argmax of
    sum-logprob / continuation BYTE length.  Fixture engineered so the two
    metrics disagree:

      choice0: ll=-4.0, 2 bytes  -> norm -2.0
      choice1: ll=-3.0, 10 bytes -> norm -0.3   <- acc winner
      gold = 0: acc picks choice1 (wrong, 0.0); acc_norm picks choice0?
      norm0=-2.0 < norm1=-0.3 -> acc_norm also picks choice1.

    Flip: make choice0 ll=-3.5/2B (norm -1.75), choice1 ll=-3.0/10B
    (norm -0.3): acc -> choice1; acc_norm -> choice1.  To split them the
    SHORT choice must win normalized: choice0 ll=-2.0/10B (norm -0.2),
    choice1 ll=-1.0/2B (norm -0.5): acc -> choice1, acc_norm -> choice0.
    """
    lls = {(0,): -2.0, (1,): -1.0}

    def score_fn(ctx, cont):
        return lls[tuple(cont)]

    ex = T.MCExample(context_ids=np.asarray([9]),
                     choices_ids=[np.asarray([0]), np.asarray([1])],
                     gold=0, choices_bytes=[10, 2])
    res = T.eval_multiple_choice(score_fn, [ex])
    # raw: -1.0 > -2.0 -> choice1 -> acc 0
    assert res["acc"] == 0.0
    # byte-normalized: -2/10 = -0.2 > -1/2 = -0.5 -> choice0 -> acc_norm 1
    assert res["acc_norm"] == 1.0


def test_acc_norm_token_fallback_worked_example():
    """Without choice text, normalization falls back to token count."""
    lls = {(0, 0, 0, 0): -4.0, (1,): -2.0}

    def score_fn(ctx, cont):
        return lls[tuple(cont)]

    ex = T.MCExample(context_ids=np.asarray([9]),
                     choices_ids=[np.asarray([0, 0, 0, 0]),
                                  np.asarray([1])], gold=0)
    res = T.eval_multiple_choice(score_fn, [ex])
    assert res["acc"] == 0.0          # -2 > -4
    assert res["acc_norm"] == 1.0     # -4/4 = -1.0 > -2/1 = -2.0


def test_truthfulqa_mc2_worked_example():
    """lm-eval mc2: normalized probability mass on the true answers.
    ll_true = [ln 0.2, ln 0.1], ll_false = [ln 0.5, ln 0.2]
    -> mc2 = (0.2+0.1)/(0.2+0.1+0.5+0.2) = 0.3."""
    tok = ByteTok()
    table = {" t1": np.log(0.2), " t2": np.log(0.1),
             " f1": np.log(0.5), " f2": np.log(0.2)}

    def score_fn(ctx, cont):
        text = bytes(list(cont)).decode("utf-8")
        return table[text]

    rows = [{"question": "Q?", "true_answers": ["t1", "t2"],
             "false_answers": ["f1", "f2"]}]
    res = F.run_truthfulqa_mc2(score_fn, tok, rows)
    np.testing.assert_allclose(res["mc2"], 0.3, rtol=1e-12)
    assert res["n"] == 1


def test_metric_key_priority_and_acc_avg():
    """fake_quant/main.py:208-227: key priority + acc_avg over tasks."""
    results = {
        "piqa": {"acc,none": 0.7, "acc_norm,none": 0.8},
        "gsm8k": {"exact_match,flexible-extract": 0.5,
                  "exact_match,none": 0.1},
    }
    vals = T.aggregate_results(results)
    assert vals["piqa"] == 0.8          # acc_norm preferred over acc
    assert vals["gsm8k"] == 0.5         # flexible-extract preferred
    np.testing.assert_allclose(vals["acc_avg"], 0.65)


# ---------------------------------------------------------------------------
# 2. Frozen real-format rows
# ---------------------------------------------------------------------------

# gsm8k rows as published (train[0] used as a shot; test[0] as the target)
GSM8K_TRAIN0_Q = ("Natalia sold clips to 48 of her friends in April, and "
                  "then she sold half as many clips in May. How many clips "
                  "did Natalia sell altogether in April and May?")
GSM8K_TRAIN0_A = ("Natalia sold 48/2 = <<48/2=24>>24 clips in May.\n"
                  "Natalia sold 48+24 = <<48+24=72>>72 clips altogether "
                  "in April and May.\n#### 72")
GSM8K_TEST0_Q = ("Janet’s ducks lay 16 eggs per day. She eats three "
                 "for breakfast every morning and bakes muffins for her "
                 "friends every day with four. She sells the remainder at "
                 "the farmers' market daily for $2 per fresh duck egg. How "
                 "much in dollars does she make every day at the farmers' "
                 "market?")


def test_gsm8k_extraction_on_real_rows():
    """Both lm-eval filters on the published gsm8k answer format."""
    assert F.extract_strict(GSM8K_TRAIN0_A) == "72"
    assert F.extract_flexible(GSM8K_TRAIN0_A) == "72"
    # a realistic model CoT without the #### marker: flexible only
    cot = ("Janet has 16 - 3 - 4 = 9 eggs left. She sells them for "
           "9 * $2 = $18 per day. The answer is 18.")
    assert F.extract_strict(cot) is None
    assert F.extract_flexible(cot) == "18"
    assert F._num_eq(F.extract_flexible(cot), "18")


def test_gsm8k_chat_prompt_assembly_exact():
    """The multiturn chat assembly (gsm8k_cot_llama convention:
    fewshot_as_multiturn + Llama-3 instruct template) must produce the
    exact documented token layout."""
    shots = [{"question": GSM8K_TRAIN0_Q, "answer": GSM8K_TRAIN0_A}]
    prompt = F.build_fewshot_chat(shots, GSM8K_TEST0_Q)
    expected = (
        "<|begin_of_text|>"
        "<|start_header_id|>user<|end_header_id|>\n\n"
        + GSM8K_TRAIN0_Q + "<|eot_id|>"
        "<|start_header_id|>assistant<|end_header_id|>\n\n"
        + GSM8K_TRAIN0_A + "<|eot_id|>"
        "<|start_header_id|>user<|end_header_id|>\n\n"
        + GSM8K_TEST0_Q + "<|eot_id|>"
        "<|start_header_id|>assistant<|end_header_id|>\n\n")
    assert prompt == expected


# an MMLU dev row in the dataset's exact field layout (cais/mmlu,
# abstract_algebra dev[0]) plus a format-faithful second row as the target
MMLU_SHOT = {"question": ("Find all c in Z_3 such that Z_3[x]/(x^2 + c) "
                          "is a field."),
             "choices": ["0", "1", "2", "3"], "answer": 1,
             "subject": "abstract_algebra"}
MMLU_ROW = {"question": "Compute the order of the element 2 in Z_6.",
            "choices": ["1", "2", "3", "6"], "answer": 2,
            "subject": "abstract_algebra"}


def test_mmlu_prompt_assembly_exact():
    """run_mmlu must assemble lm-eval's documented mmlu prompt: subject
    header, 'A. choice' option lines, 'Answer: X' shot completions, and
    score continuations ' A'..' D'."""
    tok = ByteTok()
    seen = []

    def score_fn(ctx_ids, cont_ids):
        seen.append((bytes(list(ctx_ids)).decode(),
                     bytes(list(cont_ids)).decode()))
        return {" A": -3.0, " B": -2.0, " C": -1.0, " D": -4.0}[
            seen[-1][1]]

    res = F.run_mmlu(score_fn, tok, [MMLU_ROW],
                     {"abstract_algebra": [MMLU_SHOT]}, n_shots=5)
    assert res["acc"] == 1.0  # argmax ' C' == answer index 2
    expected_ctx = (
        "The following are multiple choice questions (with answers) about "
        "abstract algebra.\n\n"
        "Find all c in Z_3 such that Z_3[x]/(x^2 + c) is a field.\n"
        "A. 0\nB. 1\nC. 2\nD. 3\nAnswer: B\n\n"
        "Compute the order of the element 2 in Z_6.\n"
        "A. 1\nB. 2\nC. 3\nD. 6\nAnswer:")
    assert seen[0][0] == expected_ctx
    assert [c for _, c in seen] == [" A", " B", " C", " D"]


def test_truthfulqa_prompt_uses_primer_and_qa_format():
    tok = ByteTok()
    seen = {}

    def score_fn(ctx_ids, cont_ids):
        seen["ctx"] = bytes(list(ctx_ids)).decode()
        return -1.0

    F.run_truthfulqa_mc2(score_fn, tok,
                         [{"question": "Is the sky green?",
                           "true_answers": ["No"],
                           "false_answers": ["Yes"]}])
    assert seen["ctx"].startswith(
        "Q: What is human life expectancy in the United States?")
    assert seen["ctx"].endswith("Q: Is the sky green?\nA:")
