"""Experiment sweep runner: the {config x seed x model} matrix driver.

Counterpart of the reference's shell-script experiment matrix
(`scripts/run_gptq.sh` / `run_quarot.sh` / `run_rsq.sh` /
`run_rsq_expand.sh` / `run_rsq_heuristic.sh` / `run_rsq_e8p.sh` /
`run_rsq_w4a4kv4.sh` / `run_16bit.sh`, each looping 3 seeds x a model
list) plus the post-hoc log scraper (`scripts/read.py:12-80`) — here one
in-process driver writes structured JSONL rows and tabulates mean±std.

Usage:
  python -m rsq_tpu.utils.sweep --models tiny --configs gptq rsq \
      --seeds 0 1 2 --out /tmp/sweep --nsamples 8 --train-seqlen 32 ...
(extra flags are forwarded verbatim to `rsq_tpu quantize`)
"""

from __future__ import annotations

import json
import os
import time

# Named presets = the reference's run_*.sh flag sets (BASELINE.md table).
# The reference quantizes at w3 for the main table (run_gptq.sh:27-49) and
# w4 in the w4a4kv4 variant.
CONFIG_PRESETS: dict[str, list[str]] = {
    "fp16": ["--w-bits", "16", "--rotate"],
    "gptq": ["--w-bits", "3", "--w-clip"],
    "quarot": ["--w-bits", "3", "--w-clip", "--rotate", "--add-until-fail"],
    "rsq": ["--w-bits", "3", "--w-clip", "--rotate", "--add-until-fail",
            "--weighting", "attncon", "--min-value", "0.005",
            "--max-value", "1"],
    "rsq_expand": ["--w-bits", "3", "--w-clip", "--rotate",
                   "--add-until-fail", "--weighting", "attncon",
                   "--min-value", "0.005", "--max-value", "1",
                   "--expand-factor", "8"],
    "rsq_heuristic": ["--w-bits", "3", "--w-clip", "--rotate",
                      "--add-until-fail", "--weighting", "heuristic",
                      "--method-type", "first_half"],
    "rsq_e8p": ["--w-bits", "2", "--rotate", "--add-until-fail", "--e8p",
                "--weighting", "attncon", "--min-value", "0.005",
                "--max-value", "1"],
    "rsq_w4a4kv4": ["--w-bits", "4", "--w-clip", "--rotate",
                    "--add-until-fail", "--weighting", "attncon",
                    "--min-value", "0.005", "--max-value", "1",
                    "--a-bits", "4", "--v-bits", "4", "--k-bits", "4"],
}


def run_sweep(models: list[str], configs: list[str], seeds: list[int],
              out_root: str, extra_args: list[str] | None = None,
              stop_on_error: bool = False) -> list[dict]:
    """Run every (model, config, seed) combo through the CLI pipeline,
    writing one JSONL row per run under out_root. Returns the rows."""
    from rsq_tpu.cli import cmd_quantize, _build_parser
    parser = _build_parser()
    extra = list(extra_args or [])
    if "--eval" not in extra:
        extra.append("--eval")
    rows = []
    for model in models:
        for config in configs:
            preset = CONFIG_PRESETS[config]
            for seed in seeds:
                argv = (["quantize", "--model", model, "--seed", str(seed)]
                        + preset + extra)
                t0 = time.time()
                try:
                    res = cmd_quantize(parser.parse_args(argv))
                except Exception as e:  # record failures, keep sweeping
                    if stop_on_error:
                        raise
                    res = {"error": repr(e)[:300]}
                row = {"model": model, "config": config, "seed": seed,
                       "wall_seconds": round(time.time() - t0, 1), **res}
                d = os.path.join(out_root, model, config)
                os.makedirs(d, exist_ok=True)
                with open(os.path.join(d, "results.jsonl"), "a") as fh:
                    fh.write(json.dumps(row) + "\n")
                rows.append(row)
    return rows


def main(argv=None):
    import argparse
    from rsq_tpu.utils.results import tabulate
    p = argparse.ArgumentParser(
        epilog="unrecognized flags are forwarded to `rsq_tpu quantize`")
    p.add_argument("--models", nargs="+", default=["tiny"])
    p.add_argument("--configs", nargs="+", default=["gptq", "quarot", "rsq"],
                   choices=sorted(CONFIG_PRESETS))
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    p.add_argument("--out", required=True)
    a, extra = p.parse_known_args(argv)
    rows = run_sweep(a.models, a.configs, a.seeds, a.out, extra)
    table = tabulate(rows, group_by=("model", "config"),
                     metrics=("ppl", "quant_seconds"))
    print(table)
    with open(os.path.join(a.out, "summary.txt"), "w") as fh:
        fh.write(table + "\n")


if __name__ == "__main__":
    main()
