"""Calibration / evaluation data (fake_quant/data_utils.py counterpart).

Loaders return either a (nsamples, seqlen) int array of calibration
sequences or a long 1-D evaluation token stream.  HF `datasets`-backed
loaders (wikitext2 / ptb / c4) work when the dataset cache or network is
available; the `synthetic` loader generates Zipf-distributed tokens so
benchmarks and tests run hermetically.
"""

from __future__ import annotations

import logging

import numpy as np

logger = logging.getLogger(__name__)


def synthetic_tokens(vocab_size: int, n_tokens: int, seed: int = 0,
                     zipf_a: float = 1.2) -> np.ndarray:
    """Zipf-distributed token stream (natural-language-like frequencies)."""
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(zipf_a, size=n_tokens)
    return ((ranks - 1) % vocab_size).astype(np.int32)


def sample_sequences(stream: np.ndarray, nsamples: int, seqlen: int,
                     seed: int = 0) -> np.ndarray:
    """Random crops of length seqlen, the reference's calibration sampling
    (data_utils.py:92-101)."""
    rng = np.random.default_rng(seed)
    starts = rng.integers(0, stream.size - seqlen - 1, size=nsamples)
    return np.stack([stream[i: i + seqlen] for i in starts]).astype(np.int32)


def expand_dataset(seqs: np.ndarray, expand_factor: int) -> np.ndarray:
    """Roll-shift dataset expansion (data_utils.expand_dataset :184-196)."""
    if expand_factor <= 1:
        return seqs
    out = []
    shift = seqs.shape[1] // expand_factor
    for row in seqs:
        for f in range(expand_factor):
            out.append(np.roll(row, shift * f))
    return np.stack(out)


def _tokenizer(model_name: str):
    from transformers import AutoTokenizer
    return AutoTokenizer.from_pretrained(model_name, use_fast=True)


def load_text_dataset(name: str, split: str):
    import datasets
    if name == "wikitext2":
        ds = datasets.load_dataset("wikitext", "wikitext-2-raw-v1", split=split)
        return "\n\n".join(ds["text"])
    if name == "ptb":
        ds = datasets.load_dataset("ptb_text_only", "penn_treebank", split=split)
        return " ".join(ds["sentence"])
    if name == "c4":
        files = {"train": "en/c4-train.00000-of-01024.json.gz",
                 "validation": "en/c4-validation.00000-of-00008.json.gz"}
        ds = datasets.load_dataset("allenai/c4", data_files={split: files[split]},
                                   split=split)
        return " ".join(ds[:1100]["text"])
    raise ValueError(f"unknown dataset {name}")


def get_loaders(name: str, *, nsamples: int = 128, seed: int = 0,
                seqlen: int = 2048, model: str = "", vocab_size: int = 32000,
                eval_mode: bool = False):
    """Reference-shaped entry point (data_utils.get_loaders :169-181).

    eval_mode: returns a 1-D token stream; else (nsamples, seqlen) crops.
    `synthetic` needs no tokenizer/network.
    """
    if name == "synthetic":
        stream = synthetic_tokens(vocab_size, 2_000_000 if not eval_mode
                                  else 600_000, seed=seed + (1 if eval_mode else 0))
        if eval_mode:
            return stream
        return sample_sequences(stream, nsamples, seqlen, seed=seed)

    tok = _tokenizer(model)
    text = load_text_dataset(name, "test" if eval_mode and name != "c4"
                             else ("validation" if eval_mode else "train"))
    ids = np.asarray(tok(text, return_tensors="np").input_ids[0], dtype=np.int32)
    if eval_mode:
        return ids
    return sample_sequences(ids, nsamples, seqlen, seed=seed)
