"""Evaluation: perplexity, lm-eval bridge, long-context task runners."""
