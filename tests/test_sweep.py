"""Sweep runner: {config x seed x model} matrix + aggregation
(scripts/run_*.sh + read.py counterpart)."""

import json
import os

from rsq_tpu.utils.sweep import run_sweep, CONFIG_PRESETS
from rsq_tpu.utils.results import collect_results, tabulate


def test_sweep_matrix_and_aggregation(tmp_path):
    out = str(tmp_path / "sweep")
    rows = run_sweep(
        ["tiny"], ["gptq", "rsq"], [0, 1], out,
        extra_args=["--cal-dataset", "synthetic", "--nsamples", "2",
                    "--train-seqlen", "16", "--eval-dataset", "synthetic",
                    "--val-seqlen", "16", "--bsz", "2"],
        stop_on_error=True)
    assert len(rows) == 4
    assert all("ppl" in r and r["ppl"] > 0 for r in rows)
    assert all("quant_seconds" in r for r in rows)

    # rows land on disk and re-aggregate
    got = collect_results(out)
    assert len(got) == 4
    table = tabulate(got, group_by=("model", "config"), metrics=("ppl",))
    assert "gptq" in table and "rsq" in table and "n=2" in table


def test_presets_cover_reference_scripts():
    # one preset per run_*.sh variant (BASELINE.md configuration table)
    assert set(CONFIG_PRESETS) == {
        "fp16", "gptq", "quarot", "rsq", "rsq_expand", "rsq_heuristic",
        "rsq_e8p", "rsq_w4a4kv4"}
